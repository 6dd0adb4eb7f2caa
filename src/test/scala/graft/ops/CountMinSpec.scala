package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The count-min contract behind q_cms_freq: one-sided error
  * (estimate >= exact, always), exactness when no bucket collides, and
  * SUM-mergeability of shard-built counter tables — the property that
  * lets a 100 TB deployment keep per-day d×w sketches and answer
  * frequency probes over any day range without rescanning raw data. */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def hits = (1 to 1000).map(i => (i.toLong % 50, i % 2)).toDF("k", "shard")

  test("estimates are one-sided: n_est >= exact count for every probed key") {
    val sk = CountMin.build(hits, $"k", depth = 4, width = 64)
    val probes = hits.select($"k").distinct()
    val est = CountMin.estimate(probes, $"k", sk, depth = 4, width = 64)
      .select($"k".cast("long"), $"n_est").as[(Long, Long)].collect().toMap
    val exact = hits.groupBy($"k").count().as[(Long, Long)].collect().toMap
    assert(est.keySet == exact.keySet.map(_.toString).map(_.toLong))
    exact.foreach { case (k, n) => assert(est(k) >= n, s"key $k: ${est(k)} < $n") }
  }

  test("wide sketch with few keys is exact (no collisions across any row)") {
    val few = (1 to 300).map(i => (i.toLong % 5, 0)).toDF("k", "shard")
    val sk = CountMin.build(few, $"k", depth = 4, width = 512)
    val est = CountMin.estimate(few.select($"k").distinct(), $"k", sk, 4, 512)
      .select($"k".cast("long"), $"n_est").as[(Long, Long)].collect().toMap
    // 5 keys x 4 rows into 512 buckets: expect zero collisions -> exact
    assert(est == Map(0L -> 60L, 1L -> 60L, 2L -> 60L, 3L -> 60L, 4L -> 60L))
  }

  test("shard-built sketches merge by SUM to the single-pass sketch") {
    val a = CountMin.build(hits.filter($"shard" === 0), $"k", 4, 64)
    val b = CountMin.build(hits.filter($"shard" === 1), $"k", 4, 64)
    val merged = CountMin.merge(a, b).orderBy($"depth", $"bucket")
      .as[(Int, Long, Long)].collect().toSeq
    val single = CountMin.build(hits, $"k", 4, 64).orderBy($"depth", $"bucket")
      .as[(Int, Long, Long)].collect().toSeq
    assert(merged == single)
  }

  test("widthFor: clamp(ceil(e*n/t), 2048, 2^24) — linear in n, fixed abs error") {
    assert(CountMin.widthFor(27165, 50) == 2048)           // gate corpus → floor
    assert(CountMin.widthFor(1, 50) == 2048)
    assert(CountMin.widthFor(271000, 50) ==                // sf0.1 → derived
      math.ceil(math.E * 271000 / 50).toInt)
    // ×10 data at the same target error → ~×10 width (the linear law)
    val (w1, w10) = (CountMin.widthFor(1000000, 50), CountMin.widthFor(10000000, 50))
    assert(w10.toDouble / w1 > 9.9 && w10.toDouble / w1 < 10.1)
    assert(CountMin.widthFor(Long.MaxValue / 4, 50) == (1 << 24)) // cap
    intercept[IllegalArgumentException](CountMin.widthFor(100, 0))
  }

  test("unseen probe keys estimate only their collision mass (0 when clean)") {
    val sk = CountMin.build((1 to 100).map(i => (i.toLong, 0)).toDF("k", "shard"),
      $"k", depth = 4, width = 2048)
    val est = CountMin.estimate(Seq(99999L).toDF("k"), $"k", sk, 4, 2048)
      .select($"n_est").as[Long].collect()
    assert(est.head <= 1, "an unseen key in a wide sketch should estimate ~0")
  }
}
