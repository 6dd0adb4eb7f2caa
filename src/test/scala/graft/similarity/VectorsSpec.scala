package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f))   // zero vector — must never rank
  ).toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine desc and excludes zero vectors") {
    val out = Vectors.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 4)
      .orderBy("rank").select($"match_id", $"cosine").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))      // 4 (zero) excluded entirely
    assert(out(0)._2 > 0.99)                            // ~parallel
    assert(math.abs(out(1)._2) < 1e-9)                  // orthogonal
    assert(out(2)._2 == -1.0)                           // antiparallel
  }

  test("zero-magnitude query yields no results instead of NaN ranks") {
    val out = Vectors.bruteForceTopK(vecs.filter($"vec_id" === 4), vecs, "vec_id", "embedding", 3)
    assert(out.count() == 0)
  }

  test("lshTopK only scores same-bucket candidates") {
    val out = Vectors.lshTopK(vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding",
      k = 4, bits = 3)
      .select($"match_id").as[Long].collect()
    // bucket of id0 = signs(1,0,0) = "111"; id1 "111", id2 "111", id4 "111"
    // (>=0 counts as positive) but id3 "011" differs → excluded; id4 zero-norm → excluded
    assert(out.toSet == Set(1L, 2L))
  }

  test("nearDupPairs finds high-cosine pairs without full cross product") {
    val pairs = Vectors.nearDupPairs(vecs, "vec_id", "embedding", threshold = 0.9, bits = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.toSet == Set((0L, 1L)))
  }

  test("ivfTopK probes only nearest centroid lists and never returns self or zero vectors") {
    val corpus = (0L until 40L).map { i =>
      val angle = (i % 8).toDouble / 8 * 2 * math.Pi
      (i, Array(math.cos(angle).toFloat, math.sin(angle).toFloat, 0f))
    }.toDF("vec_id", "embedding")
    val out = Vectors.ivfTopK(corpus.filter($"vec_id" === 0), corpus, "vec_id", "embedding",
      k = 3, nCentroids = 8, nProbe = 2)
      .orderBy("rank").select($"match_id", $"cosine").as[(Long, Double)].collect()
    assert(out.length == 3)
    assert(!out.map(_._1).contains(0L))
    // top matches must be same-direction vectors (cosine ~= 1)
    assert(out.head._2 > 0.99)
  }

  test("ivfLists assignment is narrow: no shuffle, no window over the corpus") {
    val corpus = (0L until 40L).map { i =>
      val angle = (i % 8).toDouble / 8 * 2 * math.Pi
      (i, Array(math.cos(angle).toFloat, math.sin(angle).toFloat, 0f))
    }.toDF("vec_id", "embedding")
    val lists = Vectors.ivfLists(corpus, "vec_id", "embedding", nCentroids = 8)
    lists.collect() // materialize so the executed plan is final
    val plan = lists.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"), s"unexpected shuffle in IVF build:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in IVF build:\n$plan")
    // every non-zero vector lands in exactly one list, ties to lowest id
    assert(lists.count() == 40)
    val own = lists.filter($"c_id" < 8).select($"c_id", $"cent_id")
      .as[(Long, Long)].collect().toMap
    assert(own.forall { case (id, cent) => id == cent }) // centroids self-assign
  }

  test("ivfLists with an empty centroid set emits no rows (not NULL cent_ids)") {
    // All id < nCentroids vectors are zero-norm, so the centroid array is
    // empty and array_max over it is NULL for EVERY corpus vector — those
    // rows must be dropped, not surfaced with cent_id NULL.
    val corpus = Seq(
      (0L, Array(0f, 0f, 0f)),     // would-be centroid, zero-norm → excluded
      (1L, Array(0f, 0f, 0f)),     // would-be centroid, zero-norm → excluded
      (5L, Array(1f, 0f, 0f)),
      (6L, Array(0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    val lists = Vectors.ivfLists(corpus, "vec_id", "embedding", nCentroids = 2)
    assert(lists.count() == 0)
    assert(lists.filter($"cent_id".isNull).count() == 0)
  }

  test("fixed-point dot is exact and order-independent") {
    val d = Seq((Array(0.5f, 0.25f), Array(0.5f, 0.25f))).toDF("a", "b")
      .select(Vectors.dotFp(Vectors.fixedPoint($"a"), Vectors.fixedPoint($"b")).as("d"))
      .as[Long].collect()
    assert(d.head == 500000L * 500000L + 250000L * 250000L)
  }
}
