package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class OuterProductSumFpSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: [n, Σq, upper-triangle Σqᵢqⱼ row-major]. */
  private def ref(vs: Seq[Seq[Long]]): Seq[Long] = {
    val d = vs.head.length
    val out = new Array[Long](1 + d + d * (d + 1) / 2)
    vs.foreach { q =>
      out(0) += 1
      var t = 1 + d
      for (i <- 0 until d) {
        out(1 + i) += q(i)
        for (j <- i until d) { out(t) += q(i) * q(j); t += 1 }
      }
    }
    out.toSeq
  }

  test("buffer layout matches the driver-side reference") {
    val vs = Seq(Seq(1L, 2L, 3L), Seq(-4L, 5L, 6L), Seq(0L, 0L, 7L))
    val got = vs.toDF("v").agg(OuterProductSumFp($"v").as("s"))
      .as[Seq[Long]].head()
    assert(got == ref(vs))
    // spot-read: n, Σq₀, Σq₀q₂ (triangle index 1+d+2), Σq₂q₂ (last)
    assert(got(0) == 3L && got(1) == -3L)
    assert(got(1 + 3 + 2) == 1L * 3 + (-4L) * 6 + 0L * 7)
    assert(got.last == 9L + 36L + 49L)
  }

  test("NULL arrays are skipped; an all-null input evaluates to NULL") {
    val df = Seq(Some(Seq(1L, 2L)), None, Some(Seq(3L, 4L))).toDF("v")
    val got = df.agg(OuterProductSumFp($"v").as("s")).as[Seq[Long]].head()
    assert(got == ref(Seq(Seq(1L, 2L), Seq(3L, 4L))))
    val allNull = Seq[Option[Seq[Long]]](None, None).toDF("v")
      .agg(OuterProductSumFp($"v").as("s")).head()
    assert(allNull.isNullAt(0))
  }

  test("null elements and dimension mismatches throw loudly") {
    val nullElem = Seq(Seq(Some(1L), None)).toDF("v")
    intercept[Exception] {
      nullElem.agg(OuterProductSumFp($"v")).collect()
    }
    intercept[Exception] {
      Seq(Seq(1L, 2L), Seq(1L, 2L, 3L)).toDF("v")
        .agg(OuterProductSumFp($"v")).collect()
    }
  }

  test("property: partition-count invariant and equal to the reference") {
    val gen = for {
      d <- Gen.choose(1, 6)
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, Gen.listOfN(d, Gen.choose(-1000L, 1000L)))
    } yield rows
    (1L to 6L).foreach { seed =>
      val rows = gen(Gen.Parameters.default, Seed(seed)).get
      val expect = ref(rows.map(_.toSeq))
      Seq(1, 3, 7).foreach { parts =>
        val got = rows.toDF("v").repartition(parts)
          .agg(OuterProductSumFp($"v").as("s")).as[Seq[Long]].head()
        assert(got == expect, s"seed=$seed parts=$parts")
      }
    }
  }
}
