package graft


/** Ad-hoc profiling: run selected queries twice and print both timings —
  * separates plan/codegen constants (first run) from execution (second). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_exact", "q_minhash_lsh", "q_ngram_jaccard")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $n%-22s ${t.map(x => f"$x%.2f").mkString("  ")}")
    }
    spark.stop()
  }
}
