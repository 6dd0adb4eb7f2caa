package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Declarative data-quality checks — the dbt generic-test surface
  * (unique / not_null / accepted_values, SURVEY.md §2.9) plus the range
  * test the reference's roadmap wanted, generalized so any table can
  * declare its contract as data:
  *
  *   val checks = Seq(Unique(Seq("id")), NotNull("city"),
  *                    AcceptedValues("cat", Seq("a", "b")), InRange("t", -50, 60))
  *   Checks.report(df, checks)     // one row per check with violation count
  *   Checks.assertAll(df, checks)  // throw on first failure (pipeline gate)
  *
  * Each check compiles to a violations DataFrame (the dbt "test query
  * returns 0 rows" contract) — fully distributed, nothing collects
  * besides the per-check limit-1 existence probe in assertAll and the
  * aggregated counts in report.
  */
object Checks {

  sealed trait Check { def name: String; def violations(df: DataFrame): DataFrame }

  /** dbt `unique` (composite keys allowed). */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique_${cols.mkString("_")}"
    def violations(df: DataFrame): DataFrame = Relational.duplicates(df, cols)
  }

  /** dbt `not_null`. */
  final case class NotNull(col0: String) extends Check {
    val name = s"not_null_$col0"
    def violations(df: DataFrame): DataFrame = Relational.nullViolations(df, col0)
  }

  /** dbt `accepted_values` (NULLs pass, like SQL NOT IN). */
  final case class AcceptedValues(col0: String, values: Seq[String]) extends Check {
    val name = s"accepted_values_$col0"
    def violations(df: DataFrame): DataFrame =
      Relational.acceptedValuesViolations(df, col0, values)
  }

  /** Closed-range test (the reference's unimplemented roadmap item,
    * README.md:126: temperature plausibility). NULLs pass — combine with
    * NotNull to reject them. */
  final case class InRange(col0: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range_$col0"
    def violations(df: DataFrame): DataFrame =
      df.filter(col(col0).isNotNull && !col(col0).between(lo, hi))
  }

  /** Arbitrary predicate that every row must satisfy. */
  final case class Satisfies(name: String, predicateSql: String) extends Check {
    def violations(df: DataFrame): DataFrame = df.filter(s"NOT ($predicateSql)")
  }

  /** One row per check: (check, n_violations, passed). Violation counts
    * run as one Spark job per check over the (ideally cached) input. */
  def report(df: DataFrame, checks: Seq[Check]): Seq[(String, Long, Boolean)] =
    checks.map { c =>
      val n = c.violations(df).count()
      (c.name, n, n == 0)
    }

  /** Pipeline gate: throws on the first failing check (mirrors the
    * reference DAG failing on dbt test, dags/weatherstack_full_pipeline
    * .py:147-151). Uses a limit-1 existence probe, not a full count. */
  def assertAll(df: DataFrame, checks: Seq[Check]): Unit =
    checks.foreach { c =>
      require(c.violations(df).limit(1).count() == 0,
        s"data-quality check failed: ${c.name}")
    }
}
