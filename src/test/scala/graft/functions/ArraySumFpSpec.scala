package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class ArraySumFpSpec extends SparkSpec {
  import spark.implicits._

  test("array_sum_fp equals the posexplode+sum formulation") {
    val df = Seq(
      (1L, Seq(1L, 2L, 3L)),
      (1L, Seq(10L, -20L, 30L)),
      (2L, Seq(5L, 5L, 5L))).toDF("k", "v")
    val fused = df.groupBy($"k").agg(ArraySumFp($"v").as("s"))
      .orderBy($"k").as[(Long, Seq[Long])].collect().toSeq
    assert(fused == Seq((1L, Seq(11L, -18L, 33L)), (2L, Seq(5L, 5L, 5L))))
    val exploded = df.select($"k", posexplode($"v"))
      .groupBy($"k", $"pos").agg(sum($"col").as("s"))
      .groupBy($"k").agg(collect_list(struct($"pos", $"s")).as("ps"))
      .select($"k", expr("transform(array_sort(ps), x -> x.s)").as("s"))
      .orderBy($"k").as[(Long, Seq[Long])].collect().toSeq
    assert(fused == exploded)
  }

  test("NULL arrays are skipped; an all-null group evaluates to NULL") {
    val df = Seq((1L, Some(Seq(1L, 2L))), (1L, None), (2L, None))
      .toDF("k", "v")
    val out = df.groupBy($"k").agg(ArraySumFp($"v").as("s"))
      .orderBy($"k").collect()
    assert(out(0).getSeq[Long](1) == Seq(1L, 2L))
    assert(out(1).isNullAt(1))
  }

  test("property: partition-count invariant and equal to driver-side sums") {
    val gen = for {
      d <- Gen.choose(1, 8)
      rows <- Gen.listOfN(40, for {
        k <- Gen.choose(0L, 3L)
        v <- Gen.listOfN(d, Gen.choose(-1000000L, 1000000L))
      } yield (k, v))
    } yield rows
    (1L to 8L).foreach { seed =>
      val rows = gen(Gen.Parameters.default, Seed(seed)).get
      val expect = rows.groupBy(_._1).view.mapValues(g =>
        g.map(_._2).reduce((a, b) => a.zip(b).map { case (x, y) => x + y }).toList)
        .toMap
      Seq(1, 3, 7).foreach { parts =>
        val got = rows.toDF("k", "v").repartition(parts)
          .groupBy($"k").agg(ArraySumFp($"v").as("s"))
          .as[(Long, Seq[Long])].collect().toMap
        assert(got.view.mapValues(_.toList).toMap == expect, s"seed=$seed parts=$parts")
      }
    }
  }

  test("dimension mismatch throws loudly") {
    val df = Seq((1L, Seq(1L, 2L)), (1L, Seq(1L, 2L, 3L))).toDF("k", "v")
    val e = intercept[Exception] {
      df.groupBy($"k").agg(ArraySumFp($"v")).collect()
    }
    assert(e.getMessage != null)
  }
}
