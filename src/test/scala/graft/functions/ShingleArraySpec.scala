package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import graft.dedup.Dedup

class ShingleArraySpec extends SparkSpec {
  import spark.implicits._

  test("native shingle array is bit-identical to the builtin formulation") {
    val texts = Seq(
      "the quick brown fox jumps",
      "a  b c",              // consecutive spaces → empty tokens kept
      "short",               // < n tokens
      "",                    // empty text
      "dup dup dup dup",     // repeated shingles collapse
      "ünï寿司 ﬀ 😀 z y x" // non-ASCII incl. surrogate pair: byte-order sort
    )
    val df = texts.toDF("text")
    val nat = df.select(Dedup.shingleArray($"text", 3).as("a")).as[Seq[String]].collect()
    val ref = df.select(Dedup.shingleArrayBuiltins($"text", 3).as("a")).as[Seq[String]].collect()
    assert(nat.toSeq == ref.toSeq)
  }

  test("property: native equals builtins on random token soups") {
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(4)), Gen.const(""), Gen.const("字"))
    val textGen = Gen.listOfN(12, word).map(_.mkString(" "))
    (1L to 15L).foreach { seed =>
      val texts = Gen.listOfN(20, textGen)(Gen.Parameters.default, Seed(seed)).get
      val df = texts.toDF("text")
      val nat = df.select(Dedup.shingleArray($"text", 2).as("a")).as[Seq[String]].collect()
      val ref = df.select(Dedup.shingleArrayBuiltins($"text", 2).as("a")).as[Seq[String]].collect()
      assert(nat.toSeq == ref.toSeq, s"seed=$seed")
    }
  }
}
