package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MinHashSigsFpSpec extends SparkSpec {
  import spark.implicits._

  test("native sigs are bit-identical to the portable conv(substring(md5)) formulation") {
    val docs = Seq(
      Seq("the quick brown", "quick brown fox", "brown fox jumps"),
      Seq("single shingle"),
      Seq("ünïcödé shingle", "another one")
    ).toDF("arr")
    val k = 6
    val native = docs.select(MinHashSigsFp($"arr", k).as("s")).as[Seq[Long]].collect()
    val m = transform($"arr", s => md5(s))
    val h1 = transform(m, x => conv(substring(x, 1, 15), 16, 10).cast("long"))
    val h2 = transform(m, x => conv(substring(x, 17, 15), 16, 10).cast("long"))
    val portable = docs.select(array((1 to k).map(i =>
      array_min(zip_with(h1, h2, (a, b) => a + lit(i.toLong) * b))): _*).as("s"))
      .as[Seq[Long]].collect()
    assert(native.toSeq == portable.toSeq)
  }

  test("empty shingle array yields NULL signatures") {
    val out = Seq(Seq.empty[String]).toDF("arr")
      .select(MinHashSigsFp($"arr", 4).as("s"))
      .collect()
    assert(out.head.isNullAt(0))
  }
}
