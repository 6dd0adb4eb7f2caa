package graft.tools

import graft.{Sessions, SparkEntry}

/** Planning-vs-execution cost split for named queries — the harness-floor
  * audit: each Bench pass calls the registry fn fresh, so Catalyst
  * analysis/optimization/physical-planning re-runs every pass. This tool
  * times (a) DataFrame construction, (b) executedPlan derivation (full
  * Catalyst pipeline), (c) the action on the already-planned Dataset —
  * showing how much of a cheap query's wall time is driver-side planning
  * constant (which does NOT scale with data) vs actual execution.
  *
  * Usage: runMain graft.tools.PlanCost <sfDir> <passes> q1[,q2,...]
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      names.foreach(n => try SparkEntry.queries(n)(spark, warmDir).count()
      catch { case _: Throwable => () })
    names.foreach(n => try SparkEntry.queries(n)(spark, sfDir).count()
    catch { case _: Throwable => () })
    names.foreach { name =>
      val rows = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force full Catalyst pipeline
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      val (c, p, e) = rows.map(_._1).min -> rows.map(_._2).min -> rows.map(_._3).min match {
        case ((a, b), d) => (a, b, d)
      }
      println(f"[plancost] $name%-28s construct=${c}%.3f plan=${p}%.3f exec=${e}%.3f")
    }
    spark.stop()
  }
}
