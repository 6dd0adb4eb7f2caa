package graft.tools
import graft.{Caches, Sessions}
object WpProf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/tmp/scale100/documents.parquet")
    val op = graft.dedup.Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8)
    val t0 = System.nanoTime(); op.count()
    println(f"[p] run ${(System.nanoTime()-t0)/1e9}%.2f s")
    val plan = op.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    println("[p] plan ops histogram:")
    lines.map(_.trim.dropWhile(c => !c.isLetter).takeWhile(_.isLetter)).groupBy(identity)
      .toSeq.sortBy(-_._2.size).take(18).foreach{case (k,v) => println(f"    $k%-30s ${v.size}")}
    println("[p] joins:")
    lines.filter(l => l.contains("Join")).map(_.trim.take(120)).foreach(l => println("    " + l))
  }
}
