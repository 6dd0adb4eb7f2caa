package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

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
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val run = si.taskMetrics.executorRunTime / 1e3
        val sec = (for { s <- si.submissionTime; c <- si.completionTime }
          yield (c - s) / 1e3).getOrElse(-1.0)
        if (sec > 0.2) {
          println(f"    stage ${si.stageId}%3d wall=$sec%6.2f cpuSum=$run%6.2f tasks=${si.numTasks}%3d  ${si.name.take(60)}")
          if (sec > 1.5)
            println(si.rddInfos.map(r => s"${r.id}:${r.name}").mkString("      rdds: ", " <- ", ""))
        }
      }
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
    val heavy = Seq("q_corpus_pipeline", "q_ngram_jaccard", "q_minhash_lsh",
      "q_stream_join", "q_bigram_fluency", "q_hybrid_search")
    heavy.foreach { q =>
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      SparkEntry.queries(q)(spark, d).count() // warm at target SF like Bench
      (1 to 2).foreach { pass =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, d).count()
        println(f"$q%-22s pass $pass warm ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    spark.stop()
  }
}
