package graft

import org.apache.spark.sql.functions._

/** The re-aggregatable-sketch contract behind q_hll_distinct: HLL
  * sketch PARTIALS built per shard union to the same answer as one
  * sketch over everything, and in the coupon-list regime (cardinality
  * ≪ 2^lgK) the estimate is exactly the true distinct count. This is
  * the property that lets a 100 TB deployment keep per-day sketch
  * tables and answer "distinct over any day range" without rescanning
  * raw data.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1 to 1000)
    .map(i => (i % 7, i % 3, s"v${i % 23}"))
    .toDF("g", "shard", "v")

  test("sharded HLL sketches union to the exact distinct count (coupon regime)") {
    val viaUnion = df.groupBy($"g", $"shard")
      .agg(expr("hll_sketch_agg(v)").as("sk"))
      .groupBy($"g")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = df.groupBy($"g").agg(countDistinct($"v").as("n"))
    val joined = viaUnion.join(exact, "g")
      .select($"g", $"est", $"n".cast("long")).as[(Int, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (_, est, n) => assert(est == n) }
  }

  test("union of shard sketches equals the single-pass sketch (mergeability)") {
    val merged = df.groupBy($"g", $"shard")
      .agg(expr("hll_sketch_agg(v)").as("sk"))
      .groupBy($"g")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .orderBy($"g").as[(Int, Long)].collect().toSeq
    val single = df.groupBy($"g")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(v))").as("est"))
      .orderBy($"g").as[(Int, Long)].collect().toSeq
    assert(merged == single)
  }
}
