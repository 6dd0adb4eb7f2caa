package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[T](f: SparkSession => T): T = {
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
    try f(spark)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("dot_fp is callable from SQL when the extension is installed") {
    withExtendedSession { spark =>
      val r = spark.sql(
        "SELECT dot_fp(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").collect()
      assert(r.head.getLong(0) == 32L)
      val n = spark.sql("SELECT dot_fp(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS d").collect()
      assert(n.head.isNullAt(0))
    }
  }

  test("shingle_array and sorted_intersect_count are callable from SQL") {
    withExtendedSession { spark =>
      val r = spark.sql(
        """SELECT sorted_intersect_count(
          |  shingle_array('a b c d', 3), shingle_array('a b c e', 3)) AS n""".stripMargin)
        .collect()
      assert(r.head.getLong(0) == 1L) // only 'a b c' shared
    }
  }

  test("quantize_int8 is callable from SQL when the extension is installed") {
    withExtendedSession { spark =>
      val r = spark.sql(
        """SELECT q.codes, q.q_min, q.q_max
          |FROM (SELECT quantize_int8(array(CAST(0 AS FLOAT), CAST(1 AS FLOAT),
          |                                 CAST(2 AS FLOAT))) AS q)""".stripMargin)
        .collect().head
      assert(r.getSeq[Int](0) == Seq(0, 128, 255))
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 2.0)
    }
  }

  test("simhash_fp, minhash_sigs_fp and array_sum_fp are callable from SQL") {
    withExtendedSession { spark =>
      // each SQL call must equal its Column-API twin
      val sh = spark.sql("SELECT simhash_fp('a b c') AS h").collect().head.getString(0)
      assert(sh == SimHashFp.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString("a b c")).toString)
      val sig = spark.sql(
        "SELECT minhash_sigs_fp(shingle_array('a b c d', 3), 4) AS s")
        .collect().head.getSeq[Long](0)
      assert(sig.length == 4 && sig.forall(_ >= 0))
      val agg = spark.sql(
        """SELECT array_sum_fp(v) AS s FROM
          |  (SELECT array(1L, 2L) AS v UNION ALL SELECT array(10L, 20L))""".stripMargin)
        .collect().head.getSeq[Long](0)
      assert(agg == Seq(11L, 22L))
    }
  }

  test("optimizer rewrites size(array_intersect) over provably sorted-distinct arrays") {
    withExtendedSession { spark =>
      // RDD-backed input — a local Seq relation would be folded away
      // (ConvertToLocalRelation) before any rule can see the expression
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val rdd = spark.sparkContext.parallelize(Seq(Row("a b c", "b c d")))
      val schema = StructType(Seq(StructField("x", StringType), StructField("y", StringType)))
      spark.createDataFrame(rdd, schema).createOrReplaceTempView("ext_t")
      val df = spark.sql(
        """SELECT size(array_intersect(
          |  sort_array(array_distinct(split(x, ' '))),
          |  sort_array(array_distinct(split(y, ' '))))) AS n FROM ext_t""".stripMargin)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("sorted_intersect_count"), s"rule did not fire:\n$opt")
      assert(df.collect().head.getInt(0) == 2)

      // unprovable ordering (plain split) must be left untouched
      val raw = spark.sql(
        "SELECT size(array_intersect(split(x, ' '), split(y, ' '))) AS n FROM ext_t")
      assert(!raw.queryExecution.optimizedPlan.toString.contains("sorted_intersect_count"))
      assert(raw.collect().head.getInt(0) == 2)
    }
  }
}
