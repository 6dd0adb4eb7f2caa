package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions

/** Phase profile of the three streaming near-dup GATE rows (r16 verdict
  * item 3: the streaming bucket is the official artifact's regime
  * amplifier — find which fixed constant to shrink before shrinking).
  * For each row, replicates the gate harness phase by phase and times:
  *   stage  — stageParityLanding (docs read + 1-task parity write)
  *   drain  — the streaming lifecycle itself (checkpoint + per-batch
  *            foreachBatch admission, stage-and-swap commits)
  *   read   — the final admitted parquet read + collect
  * Also accepts a `rocksdb` flag to run the same drains under the
  * RocksDB state-store provider (`spark.graft.streaming.rocksdb=true`)
  * — the opt-in is spec-pinned for answer-equality but had no bench
  * measurement; these lifecycles are stateless foreachBatch, so the
  * expected reading is "no material delta" and the measurement is the
  * record of that.
  *
  * Usage: runMain graft.tools.StreamGateProf <sfDir> [passes] [rocksdb]
  */
object StreamGateProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val rocks = args.length > 2 && args(2).toBoolean
    val docsPath = sfDir + "/documents.parquet"
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    if (rocks) spark.conf.set("spark.graft.streaming.rocksdb", "true")
    val nDocs = spark.read.parquet(docsPath).count()

    def t[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    case class Gate(name: String, nBatches: Int,
                    run: (java.io.File, java.io.File) => Unit)
    val gates = Seq(
      Gate("neardup64", 2, (landing, root) =>
        graft.streaming.NearDupStream.runNearDup64StreamOnce(spark,
          landing.getAbsolutePath,
          new java.io.File(root, "admitted").getAbsolutePath,
          new java.io.File(root, "store").getAbsolutePath,
          new java.io.File(root, "ckpt").getAbsolutePath,
          maxDist = 3, capacity = 1L << 20)),
      Gate("neardup64_evict", 3, (landing, root) =>
        graft.streaming.NearDupStream.runNearDup64StreamOnce(spark,
          landing.getAbsolutePath,
          new java.io.File(root, "admitted").getAbsolutePath,
          new java.io.File(root, "store").getAbsolutePath,
          new java.io.File(root, "ckpt").getAbsolutePath,
          maxDist = 3, capacity = math.max(1L, nDocs / 4))),
      Gate("neardup16", 2, (landing, root) =>
        graft.streaming.NearDupStream.runNearDupStreamOnce(spark,
          landing.getAbsolutePath,
          new java.io.File(root, "admitted").getAbsolutePath,
          new java.io.File(root, "store").getAbsolutePath,
          new java.io.File(root, "ckpt").getAbsolutePath, maxDist = 2)))

    // warm plan shapes once (codegen/classloading constants);
    // passes=0 = REGISTERED-LEG-ONLY mode (the stressed A/B uses it —
    // under a writeback stressor every extra drain costs minutes)
    if (passes > 0) gates.foreach { g =>
      // probe roots ride the SAME ephemeral volume as the registered
      // rows (review finding: /tmp roots would bill the probe legs the
      // disk-writeback tax the registered path no longer pays); the
      // staging stays intentionally UNMEMOIZED — the stage_s column
      // measures the raw staging cost the memo removes
      val root = graft.Fs.ephemeralDir("sgp_warm_")
      try {
        val landing = graft.streaming.NearDupStream
          .stageParityLanding(spark, docsPath, root, g.nBatches)
        g.run(landing, root)
      } finally graft.Fs.deleteRecursively(root)
    }

    // regime context for every reading (these numbers swing ×2-10 with
    // host disk/CPU state — unpaired comparisons are meaningless);
    // graft.Canary is the SHARED definition, so these readings are
    // directly comparable with bench_full.json's io_canary_sec
    def regime(): String = {
      val load = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      f"loadavg=$load%.2f io_canary=${graft.Canary.io()}%.3f"
    }
    val probeDir = graft.Fs.ephemeralDir("sgp_probe_")
    println(s"[sgp] regime start: ${regime()} ephemeral_root=${probeDir.getParent}")
    graft.Fs.deleteRecursively(probeDir)
    // same-JVM reference leg: the REGISTERED gate rows (the exact path
    // Bench times), to separate probe-shape effects from host regime
    (1 to 2).foreach { pass =>
      Seq("q_stream_neardup64", "q_stream_neardup64_evict", "q_stream_neardup16")
        .foreach { name =>
          val (_, sec) = t(graft.SparkEntry.queries(name)(spark, sfDir).count())
          println(f"[sgp] registered $name%-28s pass=$pass $sec%7.2f s")
        }
    }
    println(s"[sgp] regime after registered leg: ${regime()}")
    println(s"[sgp] sf=$sfDir passes=$passes rocksdb=$rocks docs=$nDocs")
    println("[sgp] gate             pass  stage_s  drain_s  read_s  total_s")
    if (passes > 0) gates.foreach { g =>
      (1 to passes).foreach { p =>
        val root = graft.Fs.ephemeralDir("sgp_")
        try {
          val (landing, tStage) = t(graft.streaming.NearDupStream
            .stageParityLanding(spark, docsPath, root, g.nBatches))
          val (_, tDrain) = t(g.run(landing, root))
          val (_, tRead) = t {
            val out = spark.read.parquet(
              new java.io.File(root, "admitted").getAbsolutePath)
              .select(col("id"), col("simhash"))
            out.collect().length
          }
          println(f"[sgp] ${g.name}%-16s $p%4d  $tStage%7.2f  $tDrain%7.2f  $tRead%6.2f  ${tStage + tDrain + tRead}%7.2f")
        } finally graft.Fs.deleteRecursively(root)
      }
    }
    spark.stop()
  }
}
