package graft.tools

import graft.{Caches, Sessions, SparkEntry}

/** Dump `explain("formatted")` for named registry queries to files —
  * the r18 optimization round's before/after plan evidence
  * (plans/r18/<query>_<tag>.txt).
  *
  * Usage: runMain graft.tools.PlanDump <outDir> <tag> q1[,q2,...] [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args(0)); outDir.mkdirs()
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val d = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, d)
      // run once so AQE finalizes and cached artifacts exist (the plan a
      // bench pass actually executes), then capture the formatted plan
      df.count()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        new java.io.File(outDir, s"${name}_$tag.txt").toPath, plan)
      println(s"[plandump] wrote ${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
