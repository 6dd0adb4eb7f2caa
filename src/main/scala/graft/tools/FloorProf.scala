package graft.tools
import graft.Sessions
import org.apache.spark.sql.SparkSession
object FloorProf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("32")
    spark.sparkContext.setLogLevel("WARN")
    def bench(tag: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      println(f"[fl] $tag%-34s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op")
    }
    val df = spark.range(10).toDF("x")
    bench("plan only (new df each)", 20) { spark.range(10).toDF("x").queryExecution.executedPlan }
    bench("count() same df", 20) { df.count() }
    bench("count() new df each", 20) { spark.range(10).toDF("x").count() }
    bench("rdd count", 20) { spark.sparkContext.parallelize(1 to 10, 1).count() }
    // a vanilla session without our extensions/confs, for comparison
    val v = SparkSession.builder().master("local[32]").getOrCreate()
    val vdf = v.range(10).toDF("x")
    bench("VANILLA count() same df", 20) { vdf.count() }
    spark.stop()
  }
}
