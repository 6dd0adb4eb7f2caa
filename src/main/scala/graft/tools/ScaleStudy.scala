package graft.tools

import graft.{Caches, Sessions, SparkEntry}

/** Empirical scale-up measurement for the PLANS.md complexity claims:
  * times the same registry queries at a base corpus and at a ScaleGen
  * ×N replica of it (duplicate/near-dup density preserved, so candidate
  * pair counts scale linearly — see [[ScaleGen]]), and reports the
  * wall-clock ratio per query. A query whose plan is scan-linear with
  * bounded exchanges should show ratio ≲ N on a fixed-resource host
  * (sub-N where per-query constants — planning, codegen, task launch —
  * still dominate at the base size); a super-linear ratio is the smell
  * the study exists to catch (a pair blow-up, an unbounded window, a
  * shuffle that stopped being model-sized).
  *
  * Methodology matches Bench where it matters: warm-up pass per dir for
  * codegen/classloading constants, then EVERY timed run is cold w.r.t.
  * caches (clearCache + Caches.release before each) so queries that
  * persist artifacts bill their build at both scales identically;
  * median-of-passes.
  *
  * Usage: runMain graft.tools.ScaleStudy <baseDir> <scaledDir> <passes> q1[,q2,...]
  */
object ScaleStudy {
  def main(args: Array[String]): Unit = {
    val (base, scaled, passes) = (args(0), args(1), args(2).toInt)
    val names = args(3).split(",").toSeq
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // warm both dirs (codegen + footer constants), then cold-time
    for (dir <- Seq(base, scaled); n <- names)
      try SparkEntry.queries(n)(spark, dir).count()
      catch { case e: Throwable => System.err.println(s"[scale] warm $n@$dir: ${e.getMessage}") }
    def timed(n: String, dir: String): Double = median((1 to passes).map { _ =>
      spark.catalog.clearCache(); Caches.release(); System.gc()
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, dir).count()
      catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    })
    println(f"${"query"}%-28s ${"base_s"}%8s ${"scaled_s"}%9s ${"ratio"}%6s")
    val rows = names.map { n =>
      val tb = timed(n, base); val ts = timed(n, scaled)
      println(f"$n%-28s $tb%8.2f $ts%9.2f ${ts / tb}%6.2f")
      (n, tb, ts)
    }
    val (sb, ss) = (rows.map(_._2).sum, rows.map(_._3).sum)
    println(f"${"TOTAL"}%-28s $sb%8.2f $ss%9.2f ${ss / sb}%6.2f")
    spark.stop()
  }
}
