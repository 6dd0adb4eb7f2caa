package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Round-7 dev harness: job-level decomposition of q_corpus_pipeline,
  * which the round-6 closing bench recorded at ~100 s (70% of the suite)
  * at sf0.1. Not part of the verified surface.
  */
object ProfileR7 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId,
          (System.nanoTime(), Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("?").take(80)))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          val sec = (System.nanoTime() - t0) / 1e9
          if (sec > 0.2)
            println(f"  job ${je.jobId}%3d ${sec}%7.2f s  $desc")
        }
      }
    })
    // codegen warm-up at the smallest SF, then cold-timed like Bench
    SparkEntry.queries("q_corpus_pipeline")(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache(); Caches.release()
    (1 to 2).foreach { pass =>
      spark.catalog.clearCache(); Caches.release()
      val t0 = System.nanoTime()
      SparkEntry.queries("q_corpus_pipeline")(spark, d).count()
      println(f"pass $pass corpus_pipeline cold ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    spark.stop()
  }
}
