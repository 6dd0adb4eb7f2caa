package graft.tools

import org.apache.spark.sql.functions._

import graft.{Sessions, SparkEntry}
import graft.similarity.Vectors

/** One-shot wall-clock split of q_pq_trained: training iterations vs the
  * final code-assignment job. Run: Test/runMain graft.tools.ProfilePq */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = Sessions.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = s.read.parquet(s"$d/embeddings.parquet")
    emb.count()
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cb0 = time("train iters=0")(
      Vectors.trainPqCodebooks(emb, "vec_id", "embedding", m = 4, k = 16, iters = 0))
    val cb1 = time("train iters=1")(
      Vectors.trainPqCodebooks(emb, "vec_id", "embedding", m = 4, k = 16, iters = 1))
    val cb = time("train iters=2")(
      Vectors.trainPqCodebooks(emb, "vec_id", "embedding", m = 4, k = 16, iters = 2))
    time("codes job")(
      Vectors.pqCodesWith(emb, "vec_id", "embedding", m = 4, cb)
        .orderBy(col("id"), col("subspace")).count())
    time("codes job again")(
      Vectors.pqCodesWith(emb, "vec_id", "embedding", m = 4, cb1)
        .orderBy(col("id"), col("subspace")).count())
    time("full qPqTrained repeat")(
      SparkEntry.queries("q_pq_trained")(s, d).count())
    s.stop()
  }
}
