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

  test("assertAll passes a clean frame and names the failing check") {
    Checks.assertAll(df.limit(2), contract) // first two rows are clean
    val e = intercept[IllegalArgumentException](Checks.assertAll(df, contract))
    assert(e.getMessage.contains("unique_id"))
  }
}
