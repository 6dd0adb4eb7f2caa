package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import graft.SparkSpec

class MinHashSigsFpSpec extends SparkSpec {
  import spark.implicits._

  /** Arrays with containsNull = false, matching ShingleArray's output type
    * (the expression rejects nullable elements by contract). */
  private def arrDf(arrs: Seq[Seq[String]]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(arrs.map(Row(_)): _*),
      StructType(Seq(StructField("arr", ArrayType(StringType, containsNull = false)))))

  test("native sigs are bit-identical to the portable conv(substring(md5)) formulation") {
    val docs = arrDf(Seq(
      Seq("the quick brown", "quick brown fox", "brown fox jumps"),
      Seq("single shingle"),
      Seq("ünïcödé shingle", "another one")))
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
    val out = arrDf(Seq(Seq.empty[String]))
      .select(MinHashSigsFp($"arr", 4).as("s"))
      .collect()
    assert(out.head.isNullAt(0))
  }

  test("k = 8 is rejected: h1 + 8*h2 can exceed Long.MaxValue") {
    val err = intercept[Exception] {
      arrDf(Seq(Seq("a"))).select(MinHashSigsFp($"arr", 8)).collect()
    }
    assert(err.getMessage.contains("out of range") || err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("nullable array elements are rejected at type-check time") {
    val err = intercept[Exception] {
      Seq(Seq("a", "b")).toDF("arr").select(MinHashSigsFp($"arr", 4)).collect()
    }
    assert(err.getMessage.contains("non-null") || err.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
