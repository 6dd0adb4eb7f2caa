package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests promised in SURVEY.md §5: the CASE-band totality and
  * surrogate-key md5 contracts hold for arbitrary inputs, and the exact
  * cent arithmetic is partitioning-independent. ScalaCheck generators
  * with fixed seeds (scalatestplus bridge is not on the offline cache).
  */
class RelationalPropSpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val bandDefs = Seq(
    (Int.MinValue, -1, "Freezing"), (0, 10, "Cold"), (11, 20, "Mild"), (21, 30, "Warm"))

  test("bands is total over all integers: every non-null input gets exactly one label") {
    (1L to 20L).foreach { seed =>
      val xs = sample(Gen.listOfN(50, Gen.chooseNum(Int.MinValue, Int.MaxValue)), seed)
      val out = xs.toDF("t")
        .select(Relational.bands($"t", bandDefs, "Hot").as("b")).as[String].collect()
      assert(out.length == xs.length && out.forall(_ != null), s"seed=$seed")
    }
  }

  test("surrogateKey equals reference md5 of '-'-joined values for arbitrary strings") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    (1L to 20L).foreach { seed =>
      val pairs = sample(Gen.listOfN(10, Gen.zip(Gen.alphaNumStr, Gen.alphaNumStr)), seed)
      val out = pairs.toDF("a", "b")
        .select(Relational.surrogateKey($"a", $"b").as("k")).as[String].collect()
      val expect = pairs.map { case (a, b) => md5hex(s"$a-$b") }
      assert(out.toSeq == expect, s"seed=$seed")
    }
  }

  test("cent sums are identical under any repartitioning (exact integer money)") {
    (1L to 10L).foreach { seed =>
      val xs = sample(Gen.listOfN(100, Gen.chooseNum(-1e6, 1e6)), seed)
      val df = xs.toDF("x").select(Relational.cents($"x").as("c"))
      val s1 = df.agg(sum($"c")).as[Long].collect().head
      val s8 = df.repartition(8).agg(sum($"c")).as[Long].collect().head
      assert(s1 == s8, s"seed=$seed")
    }
  }
}
