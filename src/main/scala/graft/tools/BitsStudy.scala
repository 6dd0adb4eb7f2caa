package graft.tools

import graft.{Caches, Sessions}
import graft.similarity.Vectors

/** Companion to [[ScaleStudy]] for the Σ|bucket|²-bound operators: the
  * registry rows fix the LSH width knob (`bits`), so a ×N corpus at
  * FIXED bits measures the documented quadratic bucket-pair growth —
  * this tool re-times kNN-graph construction at the base corpus with
  * its registry bits AND at the scaled corpus with bits + log₂(N),
  * the scaladoc'd operating rule, to show the growth returns to ~N.
  *
  * Usage: runMain graft.tools.BitsStudy <baseDir> <scaledDir> <factor>
  */
object BitsStudy {
  def main(args: Array[String]): Unit = {
    val (base, scaled, factor) = (args(0), args(1), args(2).toInt)
    val extraBits = (math.log(factor.toDouble) / math.log(2.0)).ceil.toInt
    val spark = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    def timed(tag: String, dir: String, bits: Int): Unit = {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      // warm once, then two cold passes
      Vectors.knnGraph(emb, "vec_id", "embedding", k = 3, bits = bits).count()
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); Caches.release(); System.gc()
        val t0 = System.nanoTime()
        Vectors.knnGraph(emb, "vec_id", "embedding", k = 3, bits = bits).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bits] $tag%-28s bits=$bits%2d  ${ts.min}%6.2f s")
    }
    timed("base", base, 4)
    timed(s"x$factor FIXED bits", scaled, 4)
    timed(s"x$factor bits+log2(N)", scaled, 4 + extraBits)
    spark.stop()
  }
}
