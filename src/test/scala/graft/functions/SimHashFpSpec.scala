package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.dedup.Dedup

class SimHashFpSpec extends SparkSpec {
  import spark.implicits._

  test("native simhash is bit-identical to the explode+md5+groupBy formulation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with no overlap whatsoever here"),
      (4L, "short"),
      (5L, ""),                          // split("") = [""] → md5("") votes
      (6L, "a  b"),                      // double space → empty middle token
      (7L, "trailing space "),           // trailing empty token kept
      (8L, "ünïcödé tökens — multibyte") // UTF-8 multibyte safety
    ).toDF("doc_id", "text")
    val native = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    val builtin = Dedup.simhashBuiltins(docs, "doc_id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(native == builtin)
    assert(native.forall(_._2.matches("[01]{16}")))
  }

  test("bit-identical on the sf0.001 documents corpus") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val native = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    val builtin = Dedup.simhashBuiltins(docs, "doc_id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(native == builtin)
  }

  test("null text yields null (builtin drops the doc at the explode)") {
    val docs = Seq((1L, Option.empty[String]), (2L, Some("x y z")))
      .toDF("doc_id", "text")
    val out = Dedup.simhash(docs, "doc_id", "text").orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(out.map(_._1) == Seq(2L)) // null-text doc filtered, like builtin
  }
}
