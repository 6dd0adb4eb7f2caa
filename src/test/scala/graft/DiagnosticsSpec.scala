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

  test("q_lm_bucket: buckets are value-monotone and head/middle hold their tertile mass") {
    val rows = run("q_lm_bucket")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("head", "middle", "tail").contains(r._4)))
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val n = rs.length.toLong
      def scores(b: String) = rs.filter(_._4 == b).map(_._3)
      val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
      // value-monotone: every head score >= every middle >= every tail
      if (h.nonEmpty && m.nonEmpty) assert(h.min >= m.max, lang)
      if (m.nonEmpty && t.nonEmpty) assert(m.min >= t.max, lang)
      if (h.nonEmpty && t.nonEmpty) assert(h.min >= t.max, lang)
      // the k1-th/k2-th-highest boundary semantics: head holds at least
      // ceil(n/3) docs (ties inflate, never deflate), head+middle >= ceil(2n/3)
      assert(h.length >= (n + 2) / 3, s"$lang head ${h.length} of $n")
      assert(h.length + m.length >= (2 * n + 2) / 3, s"$lang head+middle")
    }
  }

  test("q_knn_triangles: counts bounded by degree choose 2; corner sum divisible by 3") {
    val rows = run("q_knn_triangles")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (v, deg, tri) =>
      assert(deg >= 1, s"vertex $v listed without an edge")
      assert(tri >= 0 && tri <= deg * (deg - 1) / 2,
        s"vertex $v: $tri triangles exceeds C($deg,2)")
    }
    assert(rows.map(_._3).sum % 3 == 0, "each triangle contributes 3 corners")
  }

  test("q_dataset_card: volumes tie out against direct corpus aggregates") {
    val row = run("q_dataset_card").head
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    import org.apache.spark.sql.functions._
    assert(row.getLong(0) == docs.count())
    assert(row.getLong(1) ==
      docs.select(sum(size(split(col("text"), " ")))).head.getLong(0))
    assert(row.getLong(3) == docs.select(col("lang")).distinct().count())
    assert(row.getLong(4) == docs.select(col("source")).distinct().count())
    val nFp = row.getLong(5)
    assert(nFp <= row.getLong(0))
    assert(row.getLong(6) == 1000L * (row.getLong(0) - nFp) / row.getLong(0))
  }

  test("q_vocab_coverage: lang totals tie out and OOV is exactly the non-top-32 mass") {
    val rows = run("q_vocab_coverage")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val totalTok = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(rows.map(_._2).sum == totalTok, "per-lang token counts must cover the corpus")
    val top32 = docs.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t")).limit(32)
      .collect().map(_.getString(0)).toSet
    val oovByLang = docs.select(col("lang"), explode(split(col("text"), " ")).as("t"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.count(r => !top32.contains(r.getString(1)))).toMap
    rows.foreach { case (lang, n, oov, pm) =>
      assert(oov == oovByLang(lang), s"$lang OOV count")
      assert(pm == 1000L * oov / n, s"$lang permille algebra")
    }
  }

  test("q_pack_efficiency: only last bins may be underfull; token mass conserved") {
    val rows = run("q_pack_efficiency")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6)))
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val totalTok = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(rows.map(_._5).sum == totalTok, "bin token mass must equal the corpus")
    val maxDocTok = docs.select(max(size(split(col("text"), " ")))).head.getInt(0).toLong
    rows.groupBy(r => (r._1, r._2)).foreach { case ((src, shard), rs) =>
      val bins = rs.map(_._3).sorted
      assert(bins.toList == (0L until bins.length).toList, s"$src/$shard bins dense")
      assert(rs.count(_._7) == 1, s"$src/$shard exactly one last bin")
      rs.filterNot(_._7).foreach { r =>
        assert(r._5 > 2048L - maxDocTok,
          s"$src/$shard bin ${r._3} underfull (${r._5}) but not last")
      }
    }
  }

  test("q_dsir_weights: selection flag marks exactly the top-K scores") {
    val rows = run("q_dsir_weights")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val sel = rows.filter(_._4).map(_._1).toSet
    assert(sel.size == math.min(40, rows.length))
    val expected = rows.sortBy(r => (-r._3, r._1)).take(sel.size).map(_._1).toSet
    assert(sel == expected)
    rows.foreach { case (id, nBg, score, _) =>
      assert(nBg >= 1, s"doc $id with no bigrams must be absent")
      assert(math.abs(score) <= nBg * 1000000000L, s"doc $id score out of range")
    }
  }
}
