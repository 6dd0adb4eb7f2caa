package graft.tools

import org.apache.spark.sql.functions._

import graft.Sessions

/** Before/after probe for the 16-bit streaming near-dup alignment
  * (round-15 item: measured-guard union-find clustering + AQE-off
  * foreachBatch, the X231 lessons back-ported): stages the documents
  * table as `nBatches` parity landing files and drains the REAL
  * [[graft.streaming.NearDupStream.runNearDupStreamOnce]] lifecycle
  * against a fresh checkpoint, timing the whole drain. Run against the
  * pre-change and post-change builds for the PERF.md row.
  *
  * Usage: runMain graft.tools.NearDup16Probe <docsDir> [nBatches] [passes]
  */
object NearDup16Probe {
  def main(args: Array[String]): Unit = {
    val docsPath = args.headOption.getOrElse("/root/testdata/sf0.1") + "/documents.parquet"
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val passes = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val times = (1 to passes).map { _ =>
      val root = java.nio.file.Files.createTempDirectory("nd16probe_").toFile
      try {
        // the gate harnesses' own staging — measurement and lifecycle
        // must stage batches identically
        val landing = graft.streaming.NearDupStream
          .stageParityLanding(spark, docsPath, root, nBatches)
        spark.catalog.clearCache(); graft.Caches.release(); System.gc()
        val t0 = System.nanoTime()
        graft.streaming.NearDupStream.runNearDupStreamOnce(spark,
          landing.getAbsolutePath,
          new java.io.File(root, "admitted").getAbsolutePath,
          new java.io.File(root, "store").getAbsolutePath,
          new java.io.File(root, "ckpt").getAbsolutePath, maxDist = 3)
        val sec = (System.nanoTime() - t0) / 1e9
        val admitted = spark.read
          .parquet(new java.io.File(root, "admitted").getAbsolutePath).count()
        println(f"[nd16] drain $nBatches%d batches: $sec%6.2f s (admitted $admitted%d)")
        sec
      } finally graft.Fs.deleteRecursively(root)
    }
    println(f"[nd16] min of $passes%d: ${times.min}%6.2f s")
    spark.stop()
  }
}
