package graft.tools
import graft.{Par, Sessions}
import org.apache.spark.sql.functions._
object WidthDbg {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/tmp/scale10")
    val spark = Sessions.build("32")
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, d, "documents")
    val docs = t.repartition(Par.widthFor(t), col("doc_id"))
    println(s"[w] raw docs width=${Par.widthFor(t)} stats=${t.queryExecution.optimizedPlan.stats.sizeInBytes}")
    val sets = graft.dedup.Dedup.persistedSets(docs, "doc_id", "text", 3)
    println(s"[w] sets width=${Par.widthFor(sets)} stats=${sets.queryExecution.optimizedPlan.stats.sizeInBytes}")
    println(s"[w] sets plan head=${sets.queryExecution.optimizedPlan.getClass.getSimpleName}")
    spark.stop()
  }
}
