package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  /** Drop the table AND its warehouse location: the Derby metastore is
    * fresh per JVM but the warehouse directory outlives it, and
    * saveAsTable refuses a managed-table location that already exists. */
  private def resetTable(qualifiedName: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $qualifiedName")
    val Array(db, tbl) = qualifiedName.split("\\.")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), s"$db.db", tbl)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("namespaces register and tables round-trip through the catalog by name") {
    Catalog.ensureNamespaces(spark)
    resetTable("marts.dim_locations_spec")
    assert(Seq("raw", "staging", "marts")
      .forall(spark.catalog.databaseExists))
    val dim = Seq(("abc", "PARIS", "FRANCE", 3L)).toDF(
      "location_key", "city", "country", "total_observations")
    Catalog.save(dim, "marts.dim_locations_spec")
    val back = spark.table("marts.dim_locations_spec")
    assert(back.count() == 1)
    assert(back.select("city").head().getString(0) == "PARIS")
  }

  test("savePartitioned overwrites only the partitions present in the batch") {
    Catalog.ensureNamespaces(spark)
    resetTable("marts.fct_spec")
    val day1 = Seq((1L, "a", "2024-06-01"), (2L, "b", "2024-06-01"),
      (3L, "c", "2024-06-02")).toDF("id", "v", "extraction_date")
    Catalog.savePartitioned(day1, "marts.fct_spec", Seq("extraction_date"))
    // re-run day 2 only, with different content
    val day2fix = Seq((9L, "z", "2024-06-02")).toDF("id", "v", "extraction_date")
    Catalog.savePartitioned(day2fix, "marts.fct_spec", Seq("extraction_date"))
    val out = spark.table("marts.fct_spec")
      .orderBy("id").select($"id", $"extraction_date").as[(Long, String)].collect()
    // day 1 untouched, day 2 replaced
    assert(out.toSeq == Seq((1L, "2024-06-01"), (2L, "2024-06-01"), (9L, "2024-06-02")))
  }
}
