package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed WordPiece contracts. The load-bearing case is the
  * likelihood-gain ranking: corpus frequency favors (a,b) but the
  * score c_ab·10¹²/(c_a·c_b) favors (x,y) — the exact property that
  * distinguishes WordPiece training from BPE's frequency argmax. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  // words: xy ×3, ab ×4, a ×5, b ×5, xyab ×1
  //   round-0 units: x:4, y:4, a:10, b:10
  //   pairs: (x,y) c_ab=4 score 4e12/16 = 250e9 ← wins (gain)
  //          (a,b) c_ab=5 score 5e12/100 = 50e9 (frequency loser)
  //          (y,a) c_ab=1 < minPairCount
  //   round-2 units: xy:4, a:10, b:10 → (a,b) 5e12/100 wins
  private def corpus = Seq(
    (1L, "xy xy xy ab ab ab ab a a"),
    (2L, "a a a b b b b b xyab")
  ).toDF("doc_id", "text")

  test("train ranks by likelihood gain, not pair frequency, with exact fp12 scores") {
    val m = WordPiece.wordpieceTrain(corpus, "doc_id", "text",
        nMerges = 2, maxPieceLen = 6, maxWordLen = 16,
        minPairCount = 2, charMinCount = 1)
      .orderBy($"merge_rank")
      .as[(Long, String, String, Long, Long)].collect()
    graft.Caches.release()
    assert(m.toSeq == Seq(
      (1L, "x", "y", 4L, 250000000000L),
      (2L, "a", "b", 5L, 50000000000L)))
  }

  test("train tie-breaks equal scores on (w1, w2) lexicographically") {
    // words: cd ×1, ce ×1 → units c:2, d:1, e:1
    // pairs: (c,d) 1e12/2, (c,e) 1e12/2 — tie → (c,d) first
    val docs = Seq((1L, "cd ce")).toDF("doc_id", "text")
    val m = WordPiece.wordpieceTrain(docs, "doc_id", "text",
        nMerges = 1, maxPieceLen = 6, maxWordLen = 16,
        minPairCount = 1, charMinCount = 1)
      .as[(Long, String, String, Long, Long)].collect()
    graft.Caches.release()
    assert(m.toSeq == Seq((1L, "c", "d", 1L, 500000000000L)))
  }

  test("train stops when no pair passes the filters (exhaustion)") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = WordPiece.wordpieceTrain(docs, "doc_id", "text",
        nMerges = 5, maxPieceLen = 6, maxWordLen = 16,
        minPairCount = 2, charMinCount = 1)
      .as[(Long, String, String, Long, Long)].collect()
    graft.Caches.release()
    // merge 1 fuses (a,b); the fused corpus has no adjacent pairs left
    assert(m.map(r => (r._1, r._2, r._3)).toSeq == Seq((1L, "a", "b")))
  }

  test("apply walks greedy longest-match-first; merged pieces halve the walk") {
    val out = WordPiece.wordpieceApply(corpus, "doc_id", "text",
        nMerges = 2, maxPieceLen = 6, maxWordLen = 16,
        minPairCount = 2, charMinCount = 1)
      .orderBy($"id")
      .as[(Long, Long, Long, Long, Long)].collect()
    graft.Caches.release()
    // vocab = {x,y,a,b} ∪ {xy, ab}
    // doc 1: xy→1 piece ×3, ab→1 ×4, a→1 ×2            = 9 words 9 pieces
    // doc 2: a ×3, b ×5 → 8; xyab → xy + ab = 2 pieces = 9 words 10 pieces
    assert(out.toSeq == Seq(
      (1L, 9L, 9L, 0L, 1000L),
      (2L, 9L, 10L, 0L, 1111L)))
  }

  test("apply maps a word with an unmatchable position to ONE [UNK] piece") {
    // charMinCount=2 drops 'q' (count 1): word "q" → 1 UNK piece;
    // "aa" merged → 1 piece each
    val docs = Seq((1L, "aa aa q")).toDF("doc_id", "text")
    val out = WordPiece.wordpieceApply(docs, "doc_id", "text",
        nMerges = 1, maxPieceLen = 6, maxWordLen = 16,
        minPairCount = 2, charMinCount = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    graft.Caches.release()
    assert(out.toSeq == Seq((1L, 3L, 3L, 1L, 1000L)))
  }

  test("guard-string and word-length fences reject bad corpora loudly") {
    val paren = Seq((1L, "ok (bad)")).toDF("doc_id", "text")
    val e1 = intercept[Exception] {
      WordPiece.wordpieceTrain(paren, "doc_id", "text",
        nMerges = 1, maxPieceLen = 6, maxWordLen = 16,
        minPairCount = 1, charMinCount = 1).collect()
    }
    assert(e1.getMessage.contains("guard-string") ||
      Option(e1.getCause).exists(_.getMessage.contains("guard-string")))
    graft.Caches.release()
    val long = Seq((1L, "a " + "x" * 17)).toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      WordPiece.wordpieceTrain(long, "doc_id", "text",
        nMerges = 1, maxPieceLen = 6, maxWordLen = 16,
        minPairCount = 1, charMinCount = 1).collect()
    }
    assert(e2.getMessage.contains("maxWordLen") ||
      Option(e2.getCause).exists(_.getMessage.contains("maxWordLen")))
    graft.Caches.release()
  }

  test("train and apply share one memoized loop per (plan, params) epoch") {
    val d = corpus
    val before = graft.Caches.size
    WordPiece.wordpieceTrain(d, "doc_id", "text", nMerges = 2,
      maxPieceLen = 6, maxWordLen = 16, minPairCount = 2, charMinCount = 1).count()
    val mid = graft.Caches.size
    WordPiece.wordpieceApply(d, "doc_id", "text", nMerges = 2,
      maxPieceLen = 6, maxWordLen = 16, minPairCount = 2, charMinCount = 1).count()
    // the apply adds NO new train-loop persists beyond the vocab already
    // built: the corpus-side frames it registers are the shared word
    // table it reuses — allow only non-loop growth (no second chain)
    assert(graft.Caches.size - mid < mid - before,
      s"apply rebuilt the train chain: $before -> $mid -> ${graft.Caches.size}")
    graft.Caches.release()
  }
}
