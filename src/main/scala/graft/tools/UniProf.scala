package graft.tools

import graft.{Caches, Sessions}
import graft.text.Unigram
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase profiler for the unigram chain. Usage: runMain graft.tools.UniProf <sfDir> */
object UniProf {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[uniprof] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val words = t("wordCounts") {
      val w = Unigram.wordCounts(docs, "doc_id", "text").persist(StorageLevel.MEMORY_AND_DISK)
      w.count(); w
    }
    println("[uniprof] distinct words: " + words.count() +
      "  max len: " + words.agg(max(length(col("w")))).head.getInt(0))
    val seed = t("seedVocab") {
      val v = Unigram.seedVocab(words, 4, 2).persist(StorageLevel.MEMORY_AND_DISK)
      v.count(); v
    }
    println("[uniprof] seed pieces: " + seed.count())
    val seg1 = t("viterbi r1 (plan+exec)") {
      Unigram.viterbiSegments(words, seed, 4, 16)
    }
    t("viterbi r1 count")(seg1.count())
    val v1 = t("emRound1 rest") {
      val v = Unigram.emRound(words, seed, 4, 16, 2).persist(StorageLevel.MEMORY_AND_DISK)
      v.count(); v
    }
    val v2 = t("emRound2") {
      val v = Unigram.emRound(words, v1, 4, 16, 2).persist(StorageLevel.MEMORY_AND_DISK)
      v.count(); v
    }
    t("full train (memo)") {
      Unigram.unigramTrain(docs, "doc_id", "text").count()
    }
    Caches.release(); spark.catalog.clearCache()
    t("full apply COLD") {
      Unigram.unigramApply(docs, "doc_id", "text").count()
    }
    Caches.release(); spark.catalog.clearCache()
    t("apply: train part") {
      Unigram.unigramTrain(docs, "doc_id", "text").count()
    }
    val vocab2 = Unigram.unigramTrain(docs, "doc_id", "text")
      .withColumnRenamed("n_used", "c")
    val words2 = Unigram.wordCounts(docs, "doc_id", "text")
    val segLen = t("apply: segLen count") {
      val s = Unigram.viterbiSegments(words2, vocab2, 4, 16)
        .select(col("w"), size(col("pieces")).cast("long").as("n_p"))
      s.count(); s
    }
    t("apply: corpus join") {
      docs.select(col("doc_id").as("id"), explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) > 0)
        .join(broadcast(segLen), Seq("w"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_words"), sum(col("n_p")).as("n_pieces"))
        .count()
    }
    t("apply warm re-run") {
      Unigram.unigramApply(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
