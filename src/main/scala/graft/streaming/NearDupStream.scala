package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Dedup

/** STREAMING near-dup deduplication — the continuous-ingest form of the
  * simhash dedup tier: each micro-batch of documents is admitted against
  * a persisted SIGNATURE STORE, near-dups (within-batch or vs anything
  * ever admitted) are dropped, and the store grows by the admitted
  * signatures.
  *
  * Why foreachBatch and not a stateful operator: the near-dup decision
  * for one document spans its (maxDist+1) chunk buckets, so a
  * flatMapGroupsWithState keyed by bucket cannot decide locally and
  * would need a second stateful combine per doc; the batch formulation
  * reuses the verified cluster/match machinery, keeps the decision
  * deterministic given batch order (the streaming contract: earlier
  * batches win; within a batch, min doc id wins), and its state — the
  * signature store — is BOUNDED BY THE 16-BIT SIGNATURE SPACE (≤ 2^16
  * rows) no matter how many documents ever streamed, so every batch's
  * store check is one broadcast join. Both output tables commit by
  * stage-and-swap after full materialization (crash-safe), and the
  * admitted table is keyed by doc id, so a replayed batch is idempotent
  * on top of the checkpoint's exactly-once file offsets.
  */
object NearDupStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Pure batch core (also the foreachBatch body): near-dup admission of
    * one batch against a signature store. Within-batch clusters keep
    * their min doc id; survivors with any store signature within
    * `maxDist` are dropped. Returns the admitted (id, simhash) rows. */
  def admitBatch(batch: DataFrame, storeSigs: DataFrame, maxDist: Int): DataFrame = {
    val sigs = Dedup.simhash(batch, "doc_id", "text")
    val dropped = Dedup.simhashClusters(sigs, maxDist)
      .filter(col("id") =!= col("cluster_id")).select(col("id"))
    val survivors = sigs.join(dropped, Seq("id"), "left_anti")
    val matched = Dedup.simhashStoreMatches(survivors, storeSigs, maxDist)
    survivors.join(matched, Seq("id"), "left_anti")
  }

  /** Write `df` to the target's stage directory (an ACTION — the frame,
    * which may read the live directories, is fully on disk afterward). */
  private def writeStage(df: DataFrame, target: String): Unit =
    df.write.mode("overwrite").parquet(target + ".stage")

  /** Swap the previously written stage into place. Only called after ALL
    * stages of the batch are materialized, so no live read can race a
    * delete. */
  private def swapStage(target: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val live = new java.io.File(target)
    val stage = new java.io.File(target + ".stage")
    if (live.exists()) rm(live)
    if (!stage.renameTo(live))
      throw new IllegalStateException(s"swap failed: $stage -> $live")
  }

  /** Drain the landing zone once (AvailableNow, one file per micro-batch)
    * maintaining `admittedDir` (id, simhash — the clean corpus index) and
    * `storeDir` (distinct admitted signatures). Resumable: the checkpoint
    * skips committed batches on restart. */
  def runNearDupStreamOnce(spark: SparkSession, landingDir: String,
                           admittedDir: String, storeDir: String,
                           checkpoint: String, maxDist: Int): Unit = {
    // Stateless foreachBatch (no watermark state) — boundedLifecycleConfs
    // for uniformity; the no-data-batch skip is vacuous here.
    EventStream.withConf(spark, EventStream.lifecycleConfs(spark): _*) {
      val raw = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", 1).parquet(landingDir)
      val q = raw.writeStream
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          val s = b.sparkSession
          val store =
            if (new java.io.File(storeDir).isDirectory) s.read.parquet(storeDir)
            else s.createDataFrame(new java.util.ArrayList[Row](),
              StructType(Seq(StructField("simhash", StringType))))
          val admitted = admitBatch(b.toDF(), store, maxDist)
          val newAdmitted =
            if (new java.io.File(admittedDir).isDirectory)
              s.read.parquet(admittedDir).unionByName(admitted)
                .dropDuplicates("id")
            else admitted
          val newStore = store.select(col("simhash"))
            .unionByName(admitted.select(col("simhash"))).distinct()
          // materialize BOTH derived tables before either live dir moves
          writeStage(newAdmitted, admittedDir)
          writeStage(newStore, storeDir)
          swapStage(admittedDir)
          swapStage(storeDir)
        }
        .option("checkpointLocation", checkpoint)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
  }
}
