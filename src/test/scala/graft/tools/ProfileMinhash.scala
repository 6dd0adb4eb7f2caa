package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev harness: where does the COLD q_minhash_lsh wall-time go?
  * Reproduces Bench's timed-pass conditions (cleared cache, warm codegen)
  * and times the pipeline's internal stages separately.
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mh] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def docs = Tables(spark, sfDir, "documents").repartition(col("doc_id"))

    // codegen warm on tiny SF
    Dedup.minhashLshPairs(Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 3, 6, 2, 0.7).count()
    spark.catalog.clearCache(); graft.Caches.release()

    (1 to 3).foreach { i =>
      time(s"cold full query (bench shape) $i") {
        Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 6, 2, 0.7)
          .orderBy(col("id_a"), col("id_b")).count()
      }
      spark.catalog.clearCache(); graft.Caches.release()
    }

    // stage split: sets build vs everything after
    val sets = time("sets build+persist") {
      val s = graft.Caches.track(
        Dedup.shingleSets(docs, "doc_id", "text", 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      s.count(); s
    }
    time("rest on warm sets") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 6, 2, 0.7)
        .orderBy(col("id_a"), col("id_b")).count()
    }
    spark.catalog.clearCache(); graft.Caches.release()

    // is it the persist write or the shingle compute?
    time("sets count NO persist") {
      Dedup.shingleSets(docs, "doc_id", "text", 3).count()
    }
    time("sets agg NO persist (force arrays)") {
      Dedup.shingleSets(docs, "doc_id", "text", 3)
        .select(sum(size(col("sh_arr")))).count()
    }
    spark.catalog.clearCache(); graft.Caches.release()

    // cold ngram-jaccard, bench shape, stage split
    (1 to 3).foreach { i =>
      time(s"cold ngram_jaccard (bench) $i") {
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
          .orderBy(col("id_a"), col("id_b")).count()
      }
      spark.catalog.clearCache(); graft.Caches.release()
    }
    val sets2 = time("nj: sets build+persist") {
      val s = graft.Caches.track(
        Dedup.shingleSets(docs, "doc_id", "text", 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      s.count(); s
    }
    time("nj: rest on warm sets") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
        .orderBy(col("id_a"), col("id_b")).count()
    }
    spark.stop()
  }
}
