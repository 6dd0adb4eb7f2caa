package graft

import org.apache.spark.sql.DataFrame

/** Data-sized partition widths. A fixed 32-wide `repartition` is right
  * for a CPU-heavy pipeline over a big corpus, but on a small input it
  * turns EVERY downstream stage into 32 near-empty tasks whose launch
  * cost dwarfs their work — at sf0.1 the dedup heads were spending more
  * wall time launching empty tasks than hashing. Width here scales with
  * the input's optimizer size estimate (one partition per `bytesPerPart`)
  * between a parallelism floor and the session shuffle width — the same
  * sizing rule `spark.sql.files.maxPartitionBytes` applies to scans, so
  * at 100 TB this saturates the configured width and on a laptop-sized
  * corpus it stays proportionate.
  */
object Par {

  /** 256 KiB of ESTIMATED input per partition of CPU-heavy narrow work.
    * The optimizer's sizeInBytes for a parquet-rooted plan is the
    * compressed FILE size — snappy-compressed web text runs ~4-8× below
    * its in-memory string form, and the downstream per-row work here is
    * hashing (shingles, md5 chains), so each estimated 256 KiB is
    * millisecond-to-second scale of real CPU. The round-11 ×10 scale-up
    * study caught the old 4 MiB-of-estimate divisor capping the dedup
    * pipelines at the width-8 FLOOR even at 10× sf0.1 (a 7 MB compressed
    * estimate for ~100 MB of in-memory text) — a 4× parallelism loss on
    * every CPU-bound stage of a 32-core host; at sf0.1 and below the
    * floor still governs, so the small-corpus regime the round-6 sizing
    * tuned is unchanged. */
  private val BytesPerPart: Long = 256L << 10

  /** 2 MiB of ACCURATE (in-memory) bytes per partition — the divisor
    * for frames whose stats come from a materialized cache, where
    * sizeInBytes is real row bytes, not a compressed file size. */
  private val CachedBytesPerPart: Long = 2L << 20

  /** Width for repartitioning `df` ahead of CPU-bound narrow stages:
    * clamp(sizeInBytes / divisor, 8, spark.sql.shuffle.partitions),
    * with the divisor matched to what sizeInBytes MEANS for this frame —
    * a materialized InMemoryRelation reports accurate in-memory bytes
    * (2 MiB/part), anything parquet-rooted reports compressed file
    * bytes (256 KiB/part ≈ the same real data per task). Mixing the two
    * bases under one divisor is how the ×10 scale study found the dedup
    * pipelines pinned to the width-8 floor at 10× sf0.1. */
  def widthFor(df: DataFrame): Int = {
    val maxW = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val plan = df.queryExecution.optimizedPlan
    // For a loaded cache, ask computeStats directly: LogicalPlan.stats
    // is memoized per plan INSTANCE, and the CacheManager shares one
    // InMemoryRelation instance across consumers — whichever consumer
    // planned first (possibly before the buffers loaded) freezes the
    // child's compressed estimate into the memo for everyone after.
    val (bytes, divisor) = plan match {
      case m: org.apache.spark.sql.execution.columnar.InMemoryRelation
        if m.cacheBuilder.isCachedColumnBuffersLoaded =>
        (m.computeStats().sizeInBytes, CachedBytesPerPart)
      case p => (p.stats.sizeInBytes, BytesPerPart)
    }
    val byData = (bytes / divisor).min(BigInt(maxW)).toInt
    math.max(math.min(8, maxW), byData)
  }
}
