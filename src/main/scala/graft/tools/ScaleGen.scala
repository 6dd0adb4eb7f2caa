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
  * kind of web". Embeddings get a deterministic per-replica SIGNED
  * PERMUTATION of dimensions (an orthogonal transform — exact
  * intra-replica geometry, decorrelated cross-replica similarities) so
  * ANN/kNN neighborhood sizes stay ~constant per point as the store
  * grows.
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

    // Replica k > 0 applies a SIGNED PERMUTATION of the dimensions
    // (an orthogonal transform): intra-replica geometry — norms, dot
    // products, neighborhoods, cluster structure — is preserved
    // EXACTLY, while cross-replica similarities decorrelate, so each
    // point's near-neighborhood stays ~constant size as the store
    // grows (the honest "10× more independent content" model). The
    // first version multiplied each component by a ±0.5% jitter
    // instead, which kept every replica at cosine ≈ 0.9999 to its
    // original — neighborhoods densified ×N and the fixed-`bits`
    // LSH-bucket joins (Σ|bucket|² scoring work) measured 21× at ×10,
    // an artifact of the generator, not the operator. Permutation
    // i → (i·(2k+1) + k) mod d is a bijection for any k when d is a
    // power of two (2k+1 odd ⇒ coprime); signs come from xxhash64.
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val maxVec = emb.agg(max(col("vec_id"))).head.getLong(0) + 1
    emb.crossJoin(reps)
      .select(
        (col("vec_id") + col("k") * maxVec).as("vec_id"),
        when(col("k") === 0, col("embedding")).otherwise(
          transform(
            sequence(lit(0), size(col("embedding")) - 1),
            i => (element_at(col("embedding"),
              (pmod(i * (col("k") * 2 + 1) + col("k"),
                size(col("embedding"))) + 1).cast("int")) *
              when(pmod(xxhash64(col("k"), i), lit(2L)) === 0, 1f)
                .otherwise(-1f)).cast("float")))
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
