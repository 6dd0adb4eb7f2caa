package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  private def builtinCount = (a: String, b: String) =>
    size(array_intersect(col(a), col(b))).cast("long")

  test("merge-count equals size(array_intersect) on sorted-distinct arrays") {
    val rows = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),          // partial overlap
      (Seq("a", "b"), Seq("a", "b")),                    // identical
      (Seq("a"), Seq("z")),                              // disjoint
      (Seq.empty[String], Seq("a")),                     // empty left
      (Seq.empty[String], Seq.empty[String]),            // both empty
      (Seq("ünï", "字", "😀"), Seq("字", "😀"))          // non-ASCII binary order
    ).toDF("a", "b")
    val nat = rows.select(SortedIntersectCount($"a", $"b").as("c")).as[Long].collect()
    val ref = rows.select(builtinCount("a", "b").as("c")).as[Long].collect()
    assert(nat.toSeq == ref.toSeq)
    assert(nat.toSeq == Seq(2L, 2L, 0L, 0L, 0L, 2L))
  }

  test("property: equals builtin on random sorted-distinct string sets (UTF8 order)") {
    val word = Gen.oneOf(Gen.alphaNumStr.map(_.take(3)), Gen.const("字"), Gen.const("ß"))
    val setGen = Gen.listOfN(12, word)
    (1L to 20L).foreach { seed =>
      val raw = Gen.listOfN(30, Gen.zip(setGen, setGen))(Gen.Parameters.default, Seed(seed)).get
      // sort via Spark itself so the order is UTF8-binary, the precondition
      val rows = raw.toDF("ra", "rb").select(
        sort_array(array_distinct(col("ra"))).as("a"),
        sort_array(array_distinct(col("rb"))).as("b"))
      val nat = rows.select(SortedIntersectCount($"a", $"b").as("c")).as[Long].collect()
      val ref = rows.select(builtinCount("a", "b").as("c")).as[Long].collect()
      assert(nat.toSeq == ref.toSeq, s"seed=$seed")
    }
  }

  test("NULL array propagates NULL") {
    val rows = Seq((Some(Seq("a")), None: Option[Seq[String]])).toDF("a", "b")
    val out = rows.select(SortedIntersectCount($"a", $"b").as("c")).collect()
    assert(out.head.isNullAt(0))
  }
}
