package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

import graft.{Sessions, SparkEntry}

/** Attribution of the one-shot EventStream lifecycles' stream-START
  * constant (r19 verdict item 2: ~1.4 s per registered row before the
  * first micro-batch job). Runs a registered streaming row with a
  * StreamingQueryListener attached and prints, per micro-batch, the
  * engine's own durationMs breakdown (triggerExecution = the whole
  * batch; queryPlanning / getBatch / latestOffset / walCommit /
  * commitOffsets / addBatch are its parts) — the measurement the
  * verdict asked for before touching anything.
  *
  * Usage: runMain graft.tools.StreamStartProf <query> [sfDir] [passes]
  */
object StreamStartProf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t0 = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        events.add(f"[ssp]   query started +${(System.nanoTime() - t0.get) / 1e9}%.2f s")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        def g(k: String): Long = Option(dm.get(k)).map(_.longValue()).getOrElse(-1L)
        events.add(f"[ssp]   batch=${p.batchId}%-3d +${(System.nanoTime() - t0.get) / 1e9}%.2f s " +
          f"trigger=${g("triggerExecution")}%5d ms (latestOffset=${g("latestOffset")} " +
          f"queryPlanning=${g("queryPlanning")} getBatch=${g("getBatch")} " +
          f"addBatch=${g("addBatch")} walCommit=${g("walCommit")} " +
          f"commitOffsets=${g("commitOffsets")}) rows=${p.numInputRows}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        events.add(f"[ssp]   query terminated +${(System.nanoTime() - t0.get) / 1e9}%.2f s")
    }
    spark.streams.addListener(listener)
    SparkEntry.queries(name)(spark, d).count() // warm shapes
    events.clear()
    (1 to passes).foreach { pass =>
      t0.set(System.nanoTime())
      val tq0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      val total = (System.nanoTime() - tq0) / 1e9
      Thread.sleep(500) // listener bus drain
      println(f"[ssp] $name pass=$pass total=$total%.2f s")
      var ev = events.poll()
      while (ev != null) { println(ev); ev = events.poll() }
    }
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
