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

  /** 4 MiB of input per partition of CPU-heavy narrow work. */
  private val BytesPerPart: Long = 4L << 20

  /** Width for repartitioning `df` ahead of CPU-bound narrow stages:
    * clamp(sizeInBytes / 4 MiB, 8, spark.sql.shuffle.partitions). */
  def widthFor(df: DataFrame): Int = {
    val maxW = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byData = (bytes / BytesPerPart).min(BigInt(maxW)).toInt
    math.max(math.min(8, maxW), byData)
  }
}
