package graft

import org.apache.spark.sql.functions._

/** Round-8 dev harness: stage decomposition of q_phrase_mining and
  * q_bpe_train (the two heaviest new model-build rows). Not part of the
  * verified surface.
  */
object ProfilePhrase {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(label: String)(f: => Long): Unit = {
      // warm once, then 3 timed runs
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s ${ts.sorted.apply(1)}%6.2f s (median of 3)  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    val docs = Tables(spark, d, "documents")
    time("full q_phrase_mining") {
      graft.text.Search.phraseMining(docs, "doc_id", "text",
        delta = 5, minCount = 10, topK = 20).count()
    }
    time("bigramCondProbs (pairs+join)") {
      graft.text.Search.bigramCondProbs(docs, "doc_id", "text", minCount = 10).count()
    }
    val toks = docs.select(explode(split(col("text"), " ")).as("w"))
    time("uni histogram only") { toks.groupBy("w").count().count() }
    time("full q_bpe_train") {
      graft.text.Search.bpeTrainMerges(docs, "doc_id", "text", nMerges = 3).count()
    }
    spark.stop()
  }
}
