package graft

import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger
import graft.dedup.Dedup

/** Dev harness (round 6): sub-stage decomposition of the two expensive
  * near-dup heads plus job/stage counts. ProfileMinhash showed the
  * persisted-set build is CHEAP (~0.3 s) — the wall time is downstream,
  * on a corpus so small (5000 docs / 260k grams) that per-stage
  * scheduling constants, not data, must dominate. This measures which
  * stages they are.
  */
object ProfileR6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    })
    def time[T](label: String)(f: => T): T = {
      val j0 = jobs.get(); val s0 = stages.get()
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      // listener is async; give it a beat
      Thread.sleep(200)
      println(f"[r6] $label%-40s $dt%6.2f s  jobs=${jobs.get() - j0}%-3d stages=${stages.get() - s0}%-3d")
      r
    }
    def docs = SparkEntry.spread(Tables(spark, sfDir, "documents"), "doc_id")

    // warm codegen on tiny SF
    Dedup.minhashLshPairs(Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 3, 6, 2, 0.7).count()
    Dedup.ngramJaccardPairs(Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 3, 0.8).count()
    spark.catalog.clearCache(); Caches.release()

    // ---- minhash decomposition (cold per step group) ----
    (1 to 2).foreach { i =>
      time(s"mh cold full $i") {
        Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 6, 2, 0.7).count()
      }
      spark.catalog.clearCache(); Caches.release()
    }
    // incremental: sets only
    time("mh sets persist+count") {
      val s = Caches.track(Dedup.shingleSets(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      s.count()
    }
    time("mh sigs on warm sets") {
      val sets = Caches.track(Dedup.shingleSets(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      sets.withColumn("__sigs", graft.functions.MinHashSigsFp(col("sh_arr"), 6))
        .select(sum(element_at(col("__sigs"), 1))).count()
    }
    time("mh full on warm sets") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 6, 2, 0.7).count()
    }
    spark.catalog.clearCache(); Caches.release()

    // ---- ngram decomposition ----
    (1 to 2).foreach { i =>
      time(s"nj cold full $i") {
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
      }
      spark.catalog.clearCache(); Caches.release()
    }
    time("nj sets persist+count") {
      val s = Caches.track(Dedup.shingleSets(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      s.count()
    }
    time("nj order index on warm sets") {
      val sets = Caches.track(Dedup.shingleSets(docs, "doc_id", "text", 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      Dedup.persistedOrderIndex(sets).count()
    }
    time("nj full on warm sets+index") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
    }
    spark.catalog.clearCache(); Caches.release()

    // ---- simhash family ----
    (1 to 2).foreach { i =>
      time(s"sh build $i (shared sig table)") {
        Caches.track(Dedup.simhash(docs, "doc_id", "text")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)).count()
      }
      spark.catalog.clearCache(); Caches.release()
    }
    time("sh pairs on warm sigs") {
      val sigs = Caches.track(Dedup.simhash(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      sigs.count()
      Dedup.simhashNearDupPairsFromSigs(sigs, 2).count()
    }
    spark.catalog.clearCache(); Caches.release()
    time("sh clusters on warm sigs") {
      val sigs = Caches.track(Dedup.simhash(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      sigs.count()
      Dedup.simhashClusters(sigs, 1).count()
    }
    spark.stop()
  }
}
