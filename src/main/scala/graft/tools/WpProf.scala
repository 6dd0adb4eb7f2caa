package graft.tools
import graft.{Caches, Sessions}
import graft.text.Unigram
object WpProf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val w = Unigram.wordCounts(docs, "doc_id", "text")
    w.count()
    println("[p] cached partitions: " + w.rdd.getNumPartitions)
    val t0 = System.nanoTime(); w.count()
    println(f"[p] cached count ${(System.nanoTime() - t0) / 1e9}%.3f")
    // bare floor: empty job
    val rdd1 = spark.sparkContext.parallelize(1 to 10, 1)
    rdd1.count()
    val t1 = System.nanoTime(); rdd1.count()
    println(f"[p] 1-partition rdd count ${(System.nanoTime() - t1) / 1e9}%.3f")
    val df1 = spark.range(10).toDF("x")
    df1.count()
    val t2 = System.nanoTime(); df1.count()
    println(f"[p] range df count ${(System.nanoTime() - t2) / 1e9}%.3f")
    spark.stop()
  }
}
