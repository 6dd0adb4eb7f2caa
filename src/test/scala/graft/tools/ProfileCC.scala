package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Dev harness: where does cold q_dedup_clusters go at the bench SF? */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // codegen warm
    Dedup.simhashClusters(
      Dedup.simhash(Tables(spark, "/root/testdata/sf0.001", "documents"), "doc_id", "text"), 1).count()
    spark.catalog.clearCache(); Caches.release()

    val sim = Caches.track(
      Dedup.simhash(Tables(spark, sfDir, "documents").repartition(col("doc_id")), "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    time("simhash build+persist")(sim.count())
    val nodes = sim.select(col("simhash")).distinct()
      .select(col("simhash").as("id"), col("simhash"))
    val hashPairs = Dedup.simhashNearDupPairsFromSigs(nodes, 1).select(col("id_a"), col("id_b"))
    val nPairs = time("hash pairs (warm sigs)")(hashPairs.count())
    println(s"[cc] hash pairs = $nPairs")

    // instrumented copy of the connectedComponents loop
    time("cc loop total") {
      val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val edges = hashPairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(hashPairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .persist(lvl)
      var labels = time("  init labels")(
        edges.select(col("src").as("id")).distinct()
          .withColumn("cluster_id", col("id"))
          .localCheckpoint(true))
      var iter = 0
      var converged = false
      while (!converged && iter < 20) {
        time(f"  round $iter") {
          val nmin = edges.join(labels, col("dst") === col("id"))
            .groupBy(col("src")).agg(min(col("cluster_id")).as("nmin"))
          val stepped = labels.join(nmin, col("id") === col("src"), "left")
            .select(col("id"), col("cluster_id").as("prev"),
              least(col("cluster_id"), coalesce(col("nmin"), col("cluster_id"))).as("mid"))
          val next = stepped.as("s")
            .join(stepped.select(col("id").as("lid"), col("mid").as("lcl")).as("l"),
              col("s.mid") === col("l.lid"), "left")
            .select(col("s.id").as("id"),
              least(col("s.mid"), coalesce(col("l.lcl"), col("s.mid"))).as("cluster_id"),
              (least(col("s.mid"), coalesce(col("l.lcl"), col("s.mid"))) =!= col("s.prev")).as("chg"))
            .localCheckpoint(true)
          converged = next.filter(col("chg")).isEmpty
          labels = next.select(col("id"), col("cluster_id"))
          iter += 1
        }
      }
      println(s"[cc] rounds = $iter converged = $converged")
    }
    time("full simhashClusters warm") {
      Dedup.simhashClusters(sim, 1).count()
    }
    spark.stop()
  }
}
