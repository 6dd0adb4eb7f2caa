package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class GraftExtensionsSpec extends AnyFunSuite {

  test("dot_fp is callable from SQL when the extension is installed") {
    SparkSpec.session // make sure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // builds a NEW session (extensions apply at creation) over the same
    // SparkContext — do not stop() it, the context is shared
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT dot_fp(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").collect()
      assert(r.head.getLong(0) == 32L)
      val n = spark.sql("SELECT dot_fp(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d").collect()
      assert(n.head.isNullAt(0))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
