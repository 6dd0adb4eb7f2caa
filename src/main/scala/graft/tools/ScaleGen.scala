package graft.tools

import org.apache.spark.sql.functions._
import graft.Sessions

/** Synthetic ×N corpus generator for the scale-up study: replicates
  * `documents`/`embeddings` from a base SF dir with re-keyed ids while
  * PRESERVING duplicate/near-dup density instead of multiplying it —
  * the property that makes the scaling measurement honest. A plain
  * self-union would make every doc an exact duplicate of its N−1
  * replicas (an adversarial corpus where candidate pairs grow ~N² per
  * group); instead every replica k > 0 prefixes each TOKEN with a
  * replica salt, so all shingles differ across replicas, intra-replica
  * duplicate structure is identical, and total near-dup pairs scale
  * linearly with N — the natural model of "10× more crawl of the same
  * kind of web". Embeddings get a deterministic per-replica, per-dim
  * jitter (hash-derived, ±0.5%) so cross-replica vectors are close but
  * not identical — ANN/kNN neighborhood sizes stay ~constant per point.
  *
  * Usage: runMain graft.tools.ScaleGen <baseSfDir> <outDir> <factor>
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val (base, out, factor) = (args(0), args(1), args(2).toInt)
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$base/documents.parquet")
    val maxDoc = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val reps = spark.range(factor).toDF("k")
    docs.crossJoin(reps)
      .select(
        (col("doc_id") + col("k") * maxDoc).as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(
          array_join(
            transform(split(col("text"), " "),
              t => concat(lit("r"), col("k"), lit("x"), t)), " ")).as("text"),
        col("lang"), col("source"),
        length(when(col("k") === 0, col("text")).otherwise(
          array_join(
            transform(split(col("text"), " "),
              t => concat(lit("r"), col("k"), lit("x"), t)), " ")))
          .cast("long").as("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val maxVec = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    emb.crossJoin(reps)
      .select(
        (col("vec_id") + col("k") * maxVec).as("vec_id"),
        when(col("k") === 0, col("embedding")).otherwise(
          zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
            (x, i) => (x * (lit(1.0f) +
              (pmod(xxhash64(col("vec_id"), col("k"), i), lit(1000L))
                .cast("float") - 500f) / 100000f)).cast("float")))
          .as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"[scalegen] wrote $out at x$factor: docs=" +
      spark.read.parquet(s"$out/documents.parquet").count() +
      " embeddings=" + spark.read.parquet(s"$out/embeddings.parquet").count())
    spark.stop()
  }
}
