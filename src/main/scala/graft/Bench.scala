package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.build(cpus, Map(
      "spark.sql.adaptive.enabled" -> sys.env.getOrElse("SPARK_GRAFT_AQE", "true")))
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state methodology: warm every plan shape on the smallest SF
    // (codegen compilation + classloading are 1-5 s per-shape constants),
    // then warm at the TARGET SF too — except for the queries that
    // persist() intermediate tables, whose second run would reuse the
    // cache (Spark's CacheManager matches identical plans) and report a
    // flattered number. Those two are timed from their small-SF-warmed
    // cold run; the timed pass itself is honest about their shared build:
    // whichever runs first pays the one-time persisted-table cost.
    val cachingQueries = Set("q_ngram_jaccard", "q_minhash_lsh",
      "q_simhash", "q_simhash_dedup")
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.toSeq.sortBy(_._1)
        .foreach { case (_, fn) => try { fn(spark, warmDir).count() }
          catch { case _: Throwable => () } }
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => cachingQueries(name) }
      .foreach { case (_, fn) => try { fn(spark, sfDir).count() }
        catch { case _: Throwable => () } }
    // Warm-up persists (and any stray cache) must not leak into the timed
    // pass — the timed run rebuilds its own caches from zero.
    spark.catalog.clearCache()
    val failed = scala.collection.mutable.ListBuffer[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.gc() // don't bill one query's garbage to the next
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}""")
    spark.stop()
  }
}
