package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Caches, Sessions}
import graft.similarity.Vectors

/** ANN QUALITY at scale (r15 verdict item 4): the scale studies time
  * ×10/×100 but recall was only measured at base SF — wall time alone
  * cannot distinguish "fast because pruned" from "fast because
  * missing", so this tool measures recall@10 of the sign-LSH retriever
  * (single-bucket AND Hamming-1 multi-probe) against brute-force truth
  * at each corpus scale, across a bits sweep bracketing the
  * `bitsFor` = clamp(⌈log₂ n⌉ − 7, 4, 24) rule — the QUALITY number
  * that pins the rule: recall should be roughly scale-INVARIANT at the
  * auto width (each point's neighborhood stays ~constant under
  * ScaleGen's orthogonal-transform replicas) and the sweep shows what
  * a width one step off the rule costs in recall or wall time.
  *
  * Truth = exact cosine top-10 per query (total (cosine DESC, id)
  * order, so overlap counts are deterministic); queries = the
  * `nQueries` smallest vec_ids, the q_ann_recall convention.
  *
  * Usage: runMain graft.tools.RecallStudy <dir> [<dir> ...]
  *   (pass base, ×10, ×100 dirs; each must hold embeddings.parquet)
  */
object RecallStudy {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val nQueries = 20
    val k = 10
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    println(f"[recall] ${"corpus"}%-22s ${"n"}%9s ${"bits"}%5s ${"mode"}%-11s ${"recall@10"}%9s ${"wall_s"}%7s")
    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = emb.count()
      val qs = emb.filter(col("vec_id") < nQueries)
      val bf = Vectors.bruteForceTopK(qs, emb, "vec_id", "embedding", k)
        .select(col("query_id"), col("match_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nTruth = bf.count() // forces truth OUTSIDE every timed probe
      require(nTruth > 0,
        s"$dir: no brute-force truth rows (no vectors with vec_id < $nQueries?) " +
          "— recall would be 0/0; refusing to print a NaN study")
      def recallOf(cand: DataFrame): Double = {
        val hits = bf.join(cand.select(col("query_id"), col("match_id")),
          Seq("query_id", "match_id"), "left_semi").count()
        hits.toDouble / nTruth
      }
      val dim = emb.filter(col("embedding").isNotNull)
        .select(size(col("embedding"))).limit(1).collect()
        .headOption.map(_.getInt(0)).getOrElse(0)
      val auto = Vectors.bitsForCount(n)
      val sweep = Seq(auto - 2, auto, auto + 2).filter(b => b >= 1 && b <= 24).distinct
      for (bits <- sweep) {
        // the OTHER recall lever (r17): L independent tables at the
        // same width — the past-radius-3 deploy route; L clamped to
        // the corpus's REAL dimension budget (review finding: a
        // hardcoded 64 would crash the sweep on narrower embeddings),
        // and SKIPPED outright when even one table's bank exceeds the
        // dimension (r17 advice: dim/bits floors to tables=1 there, but
        // lshTopKMultiTable's require(tables*w <= dim) still refuses —
        // a crash that would take the whole sweep down with it)
        val nTables = math.max(1, math.min(4, dim / math.max(bits, 1)))
        val tablesVariant =
          if (bits <= dim) Seq(s"tables$nTables" -> (() =>
            Vectors.lshTopKMultiTable(qs, emb, "vec_id", "embedding", k, bits,
              tables = nTables)))
          else Seq.empty[(String, () => DataFrame)]
        for ((mode, f) <- Seq[(String, () => DataFrame)](
          "single" -> (() => Vectors.lshTopK(qs, emb, "vec_id", "embedding", k, bits)),
          "multiprobe" -> (() => Vectors.lshTopKMultiProbe(qs, emb, "vec_id", "embedding", k, bits)),
          // radius is the refined deploy rule's knob (grow the probe
          // ball, not the width) — measure it at every scale
          "radius2" -> (() => Vectors.lshTopKMultiProbe(qs, emb, "vec_id", "embedding", k, bits, radius = 2))
        ) ++ tablesVariant) {
          val t0 = System.nanoTime()
          val cand = f().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          cand.count()
          val wall = (System.nanoTime() - t0) / 1e9
          val rec = recallOf(cand)
          cand.unpersist(false)
          val mark = if (bits == auto) "*" else " "
          println(f"[recall] ${dir.split('/').last}%-22s $n%9d $bits%4d$mark $mode%-11s $rec%9.3f $wall%7.2f")
        }
      }
      bf.unpersist(false); emb.unpersist(false)
      Caches.release(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
