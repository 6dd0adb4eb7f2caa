package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Stage-by-stage timing of the ngram-jaccard pipeline at a given SF. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables(spark, sfDir, "documents")
    val n = 3; val threshold = 0.8
    val sh = time("shingles count") { val s = Dedup.shingles(docs, "doc_id", "text", n); s.count(); s }
    val df = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    time("df groupBy")(df.count())
    val sets = sh.join(df, "shingle")
      .groupBy("id")
      .agg(transform(sort_array(collect_list(struct(col("df"), col("shingle")))),
        s => s.getField("shingle")).as("sh_arr"), count(lit(1)).as("n_sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sets build+persist")(sets.count())
    val prefix = sets.select(col("id"), col("n_sh"),
      explode(slice(col("sh_arr"), lit(1),
        (col("n_sh") - ceil(lit(threshold) * col("n_sh")) + 1).cast("int"))).as("shingle"))
    time("prefix explode")(prefix.count())
    val candidates = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id") &&
          col("b.n_sh") >= lit(threshold) * col("a.n_sh") &&
          col("a.n_sh") >= lit(threshold) * col("b.n_sh"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val nCand = time("candidates self-join")(candidates.count())
    println(s"[stage] candidates = $nCand")
    time("full query fresh run") {
      Dedup.ngramJaccardPairs(Tables(spark, sfDir, "documents"), "doc_id", "text", n, threshold).count()
    }
    spark.stop()
  }
}
