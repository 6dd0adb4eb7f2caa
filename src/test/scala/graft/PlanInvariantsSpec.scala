package graft

/** Engine-wide plan hygiene, swept over the WHOLE registry: the
  * invariants that keep a 100 TB run from dying are checked on every
  * query, not just the ones a reviewer thought to look at.
  */
class PlanInvariantsSpec extends SparkSpec {

  // streaming run-once queries execute a real stream on invocation —
  // their batch-equivalent plans are asserted in their own specs
  private def planCheckable(name: String): Boolean = !name.startsWith("q_stream_")

  test("registry and oracle stay in lockstep (every query verified, no dead oracle)") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      s"mismatch: only-oracle=${SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet} " +
        s"only-query=${SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet}")
  }

  test("q_join_hints: the merge hint overrides the broadcast-eligible plan") {
    val dir = "/root/testdata/sf0.001"
    val plan = SparkEntry.queries("q_join_hints")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"expected the hinted SortMergeJoin in:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      "the merge hint should have suppressed the broadcast join")
  }

  test("no registry query plans a CartesianProduct (except the explicit cross join)") {
    val allowed = Set("q_cross_join")
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => planCheckable(name) && !allowed(name) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
    spark.catalog.clearCache()
    Caches.release()
  }
}
