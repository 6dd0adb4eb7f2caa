package graft.quality

import graft.SparkSpec
import Checks._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, "PARIS", "Mild", 18),
    (2L, "LONDON", "Freezing", -3),
    (3L, null, "Scorching", 75),
    (3L, "TOKYO", "Hot", 35)
  ).toDF("id", "city", "category", "temperature")

  private val contract = Seq(
    Unique(Seq("id")),
    NotNull("city"),
    AcceptedValues("category", Seq("Freezing", "Cold", "Mild", "Warm", "Hot")),
    InRange("temperature", -50, 60),
    Satisfies("temp_int_range", "temperature BETWEEN -273 AND 1000"))

  test("report counts violations per check") {
    val rep = Checks.report(df, contract).map { case (n, c, p) => (n, c, p) }
    assert(rep == Seq(
      ("unique_id", 1L, false),          // id 3 twice
      ("not_null_city", 1L, false),
      ("accepted_values_category", 1L, false), // Scorching
      ("in_range_temperature", 1L, false),     // 75
      ("temp_int_range", 0L, true)))
  }

  test("reportDf matches report row-for-row (fused + grouped branches)") {
    val fromDf = Checks.reportDf(df, contract).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSet
    val fromSeq = Checks.report(df, contract).toSet
    assert(fromDf == fromSeq)
    // every contract check is present exactly once
    assert(fromDf.map(_._1) == contract.map(_.name).toSet)
  }

  test("assertAll passes a clean frame and names the failing check") {
    Checks.assertAll(df.limit(2), contract) // first two rows are clean
    val e = intercept[IllegalArgumentException](Checks.assertAll(df, contract))
    assert(e.getMessage.contains("unique_id"))
  }

  test("profile reports rows, nulls, distincts, and stringified min/max per column") {
    import org.apache.spark.sql.functions.col
    val data = Seq((1L, Some("a")), (2L, None), (3L, Some("a")), (4L, Some("b")))
      .toDF("id", "v")
    val out = Checks.profile(data, Seq("id" -> col("id"), "v" -> col("v")))
      .orderBy("column")
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(out.toSeq == Seq(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("v", 4L, 1L, 2L, "a", "b")))
  }

  test("groupChecksum is partition-order-free and detects a one-row change") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val base = Seq((1L, "x", 10L), (1L, "y", 20L), (2L, "z", 30L))
      .toDF("g", "k", "v")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Checks.groupChecksum(df, "g", concat_ws("|", col("k"), col("v")))
        .orderBy("g").as[(Long, Long, Long)].collect().toSeq
    assert(sums(base) == sums(base.repartition(7)))
    val tweaked = Seq((1L, "x", 10L), (1L, "y", 21L), (2L, "z", 30L))
      .toDF("g", "k", "v")
    val (b, t) = (sums(base), sums(tweaked))
    assert(b.head != t.head)            // group 1 checksum moves
    assert(b.last == t.last)            // group 2 untouched
  }
}
