package graft.tools

import graft.{Caches, Sessions, SparkEntry}

/** Core-ratio scaling study (r19 verdict item 5): time the same
  * registry queries over a LIST of data dirs at the JVM's core count
  * (`SPARK_GRAFT_CPUS` — one SparkContext per JVM, so the 8-vs-32
  * comparison is two invocations driven by the harness script), so the
  * low-core/high-core wall ratio per (query, scale) can be tabulated.
  * The 100 TB claim this study buys evidence for: at sf0.1 the suite
  * is scheduling-constant-bound (the r18 scaling block read 8 cores
  * FASTER than 32), so the ratio should move TOWARD the core ratio as
  * the corpus grows — that trend, not any single number, is the
  * measurement.
  *
  * Session confs for path pinning (e.g. the collect-cutover knobs set
  * to 0 so the DISTRIBUTED paths — the ones that matter at 100 TB —
  * are what scales) come as a +-separated k=v list (sbt eats ;).
  *
  * Methodology matches ScaleStudy: warm pass per (dir, query) for
  * codegen/classloading, every timed run cold w.r.t. caches
  * (clearCache + Caches.release), median-of-passes.
  *
  * Usage: runMain graft.tools.CoreScaleStudy <dir1,dir2,...> <passes>
  *          <q1,q2,...> [conf1=v1+conf2=v2]
  */
object CoreScaleStudy {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(",").toSeq
    val passes = args(1).toInt
    val names = args(2).split(",").toSeq
    val confs: Map[String, String] = args.lift(3)
      .map(_.split("[+]").map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap).getOrElse(Map.empty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(cpus, confs)
    spark.sparkContext.setLogLevel("WARN")
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    for (dir <- dirs; n <- names)
      try SparkEntry.queries(n)(spark, dir).count()
      catch { case e: Throwable => System.err.println(s"[corescale] warm $n@$dir: ${e.getMessage}") }
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"[corescale] cpus=$cpus passes=$passes loadavg=$load%.2f " +
      f"io_canary=${graft.Canary.io()}%.3f confs=${confs.mkString(";")}")
    println(f"[corescale] ${"query"}%-24s ${"dir"}%-16s ${"sec"}%8s")
    for (n <- names; dir <- dirs) {
      val sec = median((1 to passes).map { _ =>
        spark.catalog.clearCache(); Caches.release(); System.gc()
        val t0 = System.nanoTime()
        try SparkEntry.queries(n)(spark, dir).count()
        catch { case e: Throwable =>
          System.err.println(s"[corescale] $n@$dir FAILED: ${e.getMessage}") }
        (System.nanoTime() - t0) / 1e9
      })
      val label = new java.io.File(dir).getName
      println(f"[corescale] $n%-24s $label%-16s $sec%8.2f")
    }
    spark.stop()
  }
}
