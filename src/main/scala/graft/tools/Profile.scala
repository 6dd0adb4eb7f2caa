package graft.tools

import graft.{Caches, Sessions, SparkEntry}

/** Standalone per-query profiler — the focused form of [[graft.Bench]]
  * for regression hunts: same session shape, same warm-up discipline,
  * but only the named queries run, every pass is printed (not just the
  * median), and each query can be forced COLD (caches cleared before
  * every pass) to expose cache-reuse effects that the full bench's
  * alphabetical neighbor ordering otherwise hides.
  *
  * Usage: runMain graft.tools.Profile <sfDir> <passes> <cold|warm> q1[,q2,...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    require(args(2) == "cold" || args(2) == "warm",
      s"mode '${args(2)}' must be exactly 'cold' or 'warm' — a typo here " +
        "silently measures warm cache reuse where cold builds were intended")
    val cold = args(2) == "cold"
    val names = args(3).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    // Warm plan shapes (codegen + classloading constants) on the small SF.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      names.foreach(n => try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () })
    spark.catalog.clearCache()
    Caches.release()
    names.foreach { name =>
      val times = (1 to passes).map { _ =>
        if (cold) { spark.catalog.clearCache(); Caches.release() }
        System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val ts = times.map(t => f"$t%.2f").mkString(" ")
      println(f"[profile] $name%-28s passes: $ts")
    }
    spark.stop()
  }
}
