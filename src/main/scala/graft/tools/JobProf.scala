package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

import graft.{Sessions, SparkEntry}

/** Per-JOB timeline of one registered query (r17 streaming-bucket work:
  * the near-dup drains are ~14 driver jobs per micro-batch of
  * scheduling constants — name them before shrinking them). Prints each
  * job's wall duration and the call site that submitted it.
  *
  * Usage: runMain graft.tools.JobProf <query> [sfDir]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, d).count() // warm shapes
    // listener callbacks fire on the listener-bus thread while main
    // reads after the run — all buffer access synchronizes on `jobs`
    // and the snapshot is taken under the same lock (review finding: an
    // unsynchronized read races late onJobEnd events on a loaded host,
    // dropping exactly the longest trailing jobs)
    val jobs = mutable.ArrayBuffer[(Int, Long, Long, String)]()
    val starts = mutable.Map[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // prefer an explicit phase tag (spark.job.description, set by
        // the code under profile) over the generic lambda call site
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))
            .orElse(Option(p.getProperty("callSite.short")))).getOrElse("?")
        jobs.synchronized { starts(js.jobId) = (js.time, site) }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          starts.remove(je.jobId).foreach { case (t0, site) =>
            jobs += ((je.jobId, t0, je.time - t0, site))
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, d).count()
    val total = (System.nanoTime() - t0) / 1e9
    // Drain the listener bus by POLLING for stability instead of one
    // fixed sleep (r17 advice: a loaded host can still be delivering
    // trailing onJobEnd events past any fixed bound, silently dropping
    // exactly the longest jobs): done when the buffer size is unchanged
    // across two consecutive 500 ms checks, capped at 10 s.
    var (stable, lastSize, waited) = (0, -1, 0)
    while (stable < 2 && waited < 10000) {
      Thread.sleep(500); waited += 500
      val size = jobs.synchronized { jobs.size }
      if (size == lastSize) stable += 1 else { stable = 0; lastSize = size }
    }
    val (sorted, unmatched) = jobs.synchronized {
      (jobs.toSeq.sortBy(_._2), starts.size)
    }
    if (unmatched > 0)
      println(s"[jobprof] WARNING: $unmatched job start(s) never saw an " +
        "end event — the timeline below is missing them")
    println(f"[jobprof] $name total=$total%.2f s, ${sorted.size} jobs, jobSum=${sorted.map(_._3).sum / 1e3}%.2f s")
    var prevEnd = 0L
    sorted.foreach { case (id, t, ms, site) =>
      val gap = if (prevEnd == 0) 0L else t - prevEnd
      prevEnd = t + ms
      println(f"[jobprof]   job=$id%-4d ${ms}%5d ms  gap=${gap}%5d ms  $site")
    }
    spark.stop()
  }
}
