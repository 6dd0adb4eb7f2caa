package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev harness (round 6): is the per-stage constant task-launch (scales
  * with shuffle partition count) or AQE/job scheduling (scales with job
  * count)? Runs the same three dedup heads under config variants in
  * separate sessions.
  */
object ProfileR6b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val variants = Seq(
      ("p32 aqe=on", Map("spark.sql.shuffle.partitions" -> "32")),
      ("p8  aqe=on", Map("spark.sql.shuffle.partitions" -> "8")),
      ("p32 aqe=off", Map("spark.sql.shuffle.partitions" -> "32",
        "spark.sql.adaptive.enabled" -> "false")),
      ("p8  aqe=off", Map("spark.sql.shuffle.partitions" -> "8",
        "spark.sql.adaptive.enabled" -> "false")))
    variants.foreach { case (label, conf) =>
      val spark = Sessions.build("32", conf)
      spark.sparkContext.setLogLevel("WARN")
      def docs = SparkEntry.spread(Tables(spark, sfDir, "documents"), "doc_id")
      def time[T](l: String)(f: => T): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[r6b] $label | $l%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
      // warm codegen
      Dedup.minhashLshPairs(Tables(spark, "/root/testdata/sf0.001", "documents"),
        "doc_id", "text", 3, 6, 2, 0.7).count()
      Dedup.ngramJaccardPairs(Tables(spark, "/root/testdata/sf0.001", "documents"),
        "doc_id", "text", 3, 0.8).count()
      Dedup.simhashNearDupPairsFromSigs(
        Dedup.simhash(Tables(spark, "/root/testdata/sf0.001", "documents"), "doc_id", "text"), 2).count()
      spark.catalog.clearCache(); Caches.release()
      (1 to 2).foreach { i =>
        time(s"mh cold $i") {
          Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 6, 2, 0.7).count()
        }
        spark.catalog.clearCache(); Caches.release()
        time(s"nj cold $i") {
          Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8).count()
        }
        spark.catalog.clearCache(); Caches.release()
        time(s"sh pairs cold $i") {
          val sigs = Caches.track(Dedup.simhash(docs, "doc_id", "text")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
          Dedup.simhashNearDupPairsFromSigs(sigs, 2).count()
        }
        spark.catalog.clearCache(); Caches.release()
      }
      spark.stop()
      // a fresh session per variant needs the builder cache cleared
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
