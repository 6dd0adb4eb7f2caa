package graft

/** Cross-row invariants of the round-10 corpus-health diagnostics —
  * checks the COMPOSITION logic (histogram accounting, undirected
  * canonicalization, permille algebra) that the per-operator unit specs
  * cannot see, against the sf0.001 fixture the whole registry smokes on.
  */
class DiagnosticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_cluster_sizes: histogram accounts for every document exactly once") {
    val rows = run("q_cluster_sizes")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = run("q_scan").sparkSession.read
      .parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_._3).sum == total, "sum(n_docs) must equal corpus size")
    rows.foreach { case (size, nClusters, nDocs) =>
      assert(size * nClusters == nDocs, s"size $size row inconsistent")
      assert(size >= 1 && nClusters >= 0)
    }
    // sizes are unique (it is a histogram, not a list)
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("q_source_overlap: canonical undirected matrix, totals match the pair table") {
    val rows = run("q_source_overlap")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    rows.foreach { case (a, b, n) =>
      assert(a <= b, s"pair ($a, $b) not canonicalized")
      assert(n >= 1)
    }
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
    val nPairs = run("q_simhash_pairs").count()
    assert(rows.map(_._3).sum == nPairs,
      "matrix total must equal the near-dup pair count")
  }

  test("q_token_fertility: merges only shrink; permille algebra is the truncating div") {
    val rows = run("q_token_fertility").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, nChars, nWord, nBpe, fert, cpb) =>
      assert(nDocs > 0 && nChars > 0 && nWord > 0 && nBpe > 0, lang)
      assert(nBpe <= nWord, s"$lang: BPE merges can only reduce token count")
      assert(fert == nBpe * 1000 / nWord, s"$lang fertility_permille")
      assert(cpb == nChars * 1000 / nBpe, s"$lang chars_per_bpe_permille")
      assert(fert <= 1000, s"$lang fertility cannot exceed 1000 permille")
    }
  }

  test("q_embed_dispersion: stats satisfy Cauchy-Schwarz and n matches label counts") {
    val rows = run("q_embed_dispersion").collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byLabel = spark.read.parquet(s"$dir/embeddings.parquet")
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dims = rows.map(_._2).distinct.sorted.toList
    assert(dims == (0 until dims.length).toList, "dims must be dense 0..d-1")
    rows.foreach { case (label, dim, n, sx, sxx) =>
      assert(n == byLabel(label), s"label $label dim $dim count")
      assert(sxx >= 0 && n * sxx >= sx * sx, s"label $label dim $dim CS")
    }
  }

  test("q_vocab_growth: final checkpoint equals the whole corpus") {
    val rows = run("q_vocab_growth")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.functions._
    val nDocs = docs.count()
    val nTok = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    val nVocab = docs.select(explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    assert(rows.last == ((10L, nDocs, nTok, nVocab)))
  }
}
