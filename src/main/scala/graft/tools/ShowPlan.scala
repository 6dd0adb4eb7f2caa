package graft.tools
import graft.{Caches, Sessions, SparkEntry}
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, d)
    df.count() // let AQE finalize
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
