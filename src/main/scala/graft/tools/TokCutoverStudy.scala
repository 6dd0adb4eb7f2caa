package graft.tools

import graft.{Caches, Sessions}
import graft.text.{Unigram, WordPiece}

/** Scale A/B of the r18 tokenizer train-loop cutover: cold wall time AND
  * output equality of the LOCAL (driver) vs DISTRIBUTED path for the
  * unigram and WordPiece chains at a given corpus dir. The equality leg
  * extends TokenizerLocalSpec's bit-identity pin from spec scale to
  * data scale (the corpus join-back runs over the full token stream).
  *
  * Usage: runMain graft.tools.TokCutoverStudy <sfDir> [tag]
  */
object TokCutoverStudy {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val tag = args.lift(1).getOrElse(d)
    val Knob = "spark.graft.text.maxCollectWords"
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    def chains(): Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "unigram_train" -> Unigram.unigramTrain(docs, "doc_id", "text"),
      "unigram_apply" -> Unigram.unigramApply(docs, "doc_id", "text"),
      "wordpiece_train" -> WordPiece.wordpieceTrain(docs, "doc_id", "text", nMerges = 10),
      "wordpiece_apply" -> WordPiece.wordpieceApply(docs, "doc_id", "text", nMerges = 10))
    def run(knob: Option[String]): (Double, Map[String, Seq[String]]) = {
      knob match {
        case Some(v) => spark.conf.set(Knob, v)
        case None    => spark.conf.unset(Knob)
      }
      spark.catalog.clearCache(); Caches.release(); System.gc()
      val t0 = System.nanoTime()
      val out = chains().map { case (n, df) =>
        n -> df.collect().map(_.toString).sorted.toSeq }.toMap
      ((System.nanoTime() - t0) / 1e9, out)
    }
    // warm plan shapes once (both paths) so the timed legs compare
    // steady-state chains, not first-shape codegen
    run(None); run(Some("0"))
    val (tLocal, oLocal) = run(None)
    val (tDist, oDist) = run(Some("0"))
    val nWords = Unigram.wordCounts(docs, "doc_id", "text").count()
    val equal = oLocal.keySet == oDist.keySet &&
      oLocal.forall { case (k, v) => oDist(k) == v }
    println(f"[tokcutover] $tag words=$nWords local=${tLocal}%.2f s distributed=${tDist}%.2f s equal=$equal")
    if (!equal) oLocal.keys.foreach { k =>
      if (oLocal(k) != oDist(k)) println(s"[tokcutover]   MISMATCH in $k")
    }
    spark.conf.unset(Knob)
    spark.stop()
    if (!equal) sys.exit(1)
  }
}
