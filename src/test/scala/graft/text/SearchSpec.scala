package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hash join hash join hash"),
    (2L, "scan filter scan"),
    (3L, "hash scan merge sort"),
    (4L, "window window window window")
  ).toDF("doc_id", "text")

  test("termFreqs counts multiplicity per (doc, term)") {
    val tf = Search.termFreqs(docs, "doc_id", "text")
      .filter($"id" === 1L).orderBy($"term")
      .select($"term", $"tf").as[(String, Long)].collect()
    assert(tf.toSeq == Seq(("hash", 3L), ("join", 2L)))
  }

  test("tfidf ranks a doc's distinctive terms first") {
    val out = Search.tfidfTopTerms(docs, "doc_id", "text", 2)
    // doc 4: 'window' appears only there, 4 times → must be its top term
    val top4 = out.filter($"id" === 4L && $"term_rank" === 1)
      .select($"term").as[String].collect()
    assert(top4.toSeq == Seq("window"))
    // ranks are 1..k, deterministic
    assert(out.filter($"term_rank" < 1).count() == 0)
    assert(out.groupBy("id").count().filter($"count" > 2).count() == 0)
  }

  test("bm25 ranks docs containing more query terms higher; non-matching docs absent") {
    val out = Search.bm25TopDocs(docs, "doc_id", "text", Seq("hash", "scan"), 10)
      .orderBy($"doc_rank")
      .select($"id", $"doc_rank").as[(Long, Int)].collect()
    // doc 4 has neither term → absent; docs 1,2,3 present
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L))
    // doc 3 contains BOTH terms → idf sum ranks it first
    assert(out.head._1 == 3L)
  }

  test("bm25 is stable under repartitioning (quantized integer scores)") {
    val a = Search.bm25TopDocs(docs, "doc_id", "text", Seq("hash", "scan"), 10).collect()
    val b = Search.bm25TopDocs(docs.repartition(7), "doc_id", "text", Seq("hash", "scan"), 10).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("repetition metrics: repeated bigrams and tokens score high") {
    val m = docs.select($"doc_id",
      TextOps.topNgramFrac($"text", 2).as("t2"),
      TextOps.dupTokenFrac($"text").as("dup"))
      .orderBy($"doc_id")
      .as[(Long, Double, Double)].collect()
    // doc 4 "window x4": bigrams are 3x "window window" → frac 1.0; dup 3/4
    assert(m(3)._2 == 1.0)
    assert(m(3)._3 == 0.75)
    // doc 3 all-distinct tokens → dup 0.0
    assert(m(2)._3 == 0.0)
  }

  test("repetition metrics are NULL for docs below the n-gram size") {
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
      .select(TextOps.topNgramFrac($"text", 2).as("t2"))
      .collect()
    assert(one.head.isNullAt(0))
  }

  test("unigramScore: exact integer corpus-frequency means") {
    val corpus = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // hist: a→2, b→2, c→1
    val out = Search.unigramScore(corpus, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 3L, 6L, 2000L),   // (2+2+2), floor(6000/3)
      (2L, 2L, 3L, 1500L)))  // (2+1),   floor(3000/2)
  }

  test("unigramScore: shuffle-join fallback equals the broadcast plan") {
    val a = Search.unigramScore(docs, "doc_id", "text", broadcastStats = Some(true))
      .orderBy("id").collect().toSeq
    val b = Search.unigramScore(docs, "doc_id", "text", broadcastStats = Some(false))
      .orderBy("id").collect().toSeq
    assert(a == b)
    // the pinned fallback really is the shuffle plan — no broadcast join
    val plan = Search.unigramScore(docs, "doc_id", "text", broadcastStats = Some(false))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"))
  }

  test("buildVocab ranks by freq with lexicographic tie-break and dense ids") {
    val out = Search.buildVocab(docs, "doc_id", "text", 3)
      .select($"term", $"freq", $"token_id").as[(String, Long, Int)].collect()
    // hash×4, scan×3, window×4 → window/hash tie broken lexicographically
    assert(out.toSeq == Seq(("hash", 4L, 1), ("window", 4L, 2), ("scan", 3L, 3)))
  }

  test("bigramCondProbs: exact MLE permille over adjacent pairs") {
    val corpus = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    // bigrams: ab ba ab ba ac → c(a,b)=2 c(b,a)=2 c(a,c)=1; c_a: a→3, b→2
    val out = Search.bigramCondProbs(corpus, "doc_id", "text", minCount = 1L)
      .orderBy($"w1", $"w2")
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("a", "b", 2L, 3L, 666L),
      ("a", "c", 1L, 3L, 333L),
      ("b", "a", 2L, 2L, 1000L)))
  }

  test("bpeTrainMerges learns frequency-then-lexicographic merges, greedy apply") {
    val corpus = Seq((1L, "a b a b c"), (2L, "a b c c")).toDF("doc_id", "text")
    // r1: (a,b)=3 beats (b,c)=2 → docs become "(a b)(a b)(c)" / "(a b)(c)(c)"
    // r2: ("a b",c)=2 → "(a b)(a b c)" / "(a b c)(c)"
    // r3: all pairs count 1 → lexicographic tie-break picks ("a b","a b c")
    val out = Search.bpeTrainMerges(corpus, "doc_id", "text", nMerges = 3)
      .orderBy($"merge_rank").as[(Int, String, String, Long)].collect()
    assert(out.toSeq == Seq(
      (1, "a", "b", 3L),
      (2, "a b", "c", 2L),
      (3, "a b", "a b c", 1L)))
  }

  test("bpeTrainMerges merges runs left-to-right (leftmost non-overlapping)") {
    val corpus = Seq((1L, "a a a")).toDF("doc_id", "text")
    // "(a)(a)(a)" → merge (a,a) counts BOTH adjacent pairs but applies
    // leftmost-first: "(a a)(a)"; round 2 then sees ("a a", "a") once
    val out = Search.bpeTrainMerges(corpus, "doc_id", "text", nMerges = 2)
      .orderBy($"merge_rank").as[(Int, String, String, Long)].collect()
    assert(out.toSeq == Seq((1, "a", "a", 2L), (2, "a a", "a", 1L)))
  }

  test("bpeApply reports per-doc token compression from the learned merges") {
    val corpus = Seq((1L, "a b a b c"), (2L, "a b c c")).toDF("doc_id", "text")
    // merges (a,b) then ("a b", c):
    //   doc1 → "(a b)(a b c)"  5 tokens → 2
    //   doc2 → "(a b c)(c)"    4 tokens → 2
    val out = Search.bpeApply(corpus, "doc_id", "text", nMerges = 2)
      .orderBy($"id").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 5L, 2L), (2L, 4L, 2L)))
  }

  test("phraseMining surfaces a planted collocation with exact integer lift") {
    // "new york" always adjacent; "big" and "apple" frequent but never
    // adjacent to each other more than chance
    val corpus = Seq(
      (1L, "new york is big big apple town"),
      (2L, "the new york big apple skyline"),
      (3L, "big town apple new york streets")
    ).toDF("doc_id", "text")
    val out = Search.phraseMining(corpus, "doc_id", "text",
      delta = 1, minCount = 3, topK = 5)
      .as[(String, String, Long, Long, Long, Long)].collect()
    // c(new,york)=3, c_new=3, c_york=3, N=7+6+6=19 →
    // (3-1)*1000*19 div 9 = 4222; no other pair reaches minCount=3
    assert(out.map(p => (p._1, p._2)).toSeq == Seq(("new", "york")))
    assert(out.head._6 == 4222L)
  }

  test("bigramCondProbs minCount prunes the hapax tail; single-token docs ignored") {
    val corpus = Seq((1L, "a b a b"), (2L, "x")).toDF("doc_id", "text")
    val out = Search.bigramCondProbs(corpus, "doc_id", "text", minCount = 2L)
      .select($"w1", $"w2").as[(String, String)].collect()
    assert(out.toSeq == Seq(("a", "b")))   // "b a" ×1 pruned, "x" no pairs
  }

  test("bigramFluency: exact mean conditional permille; common transitions score higher") {
    val corpus = Seq((1L, "a b a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // pairs: doc1 ab ba ab ba ab, doc2 ac → c(a,b)=3 c(a,c)=1 c(b,a)=2
    // c_a: a→4, b→2 → cm(a,b)=750 cm(a,c)=250 cm(b,a)=1000
    val out = Search.bigramFluency(corpus, "doc_id", "text")
      .orderBy("id").as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (1L, 5L, 3 * 750L + 2 * 1000L, (3 * 750L + 2 * 1000L) / 5),
      (2L, 1L, 250L, 250L)))
    assert(out(0)._4 > out(1)._4)   // fluent repetition beats the rare transition
  }

  test("bigramFluency shuffle-join fallback equals the broadcast plan") {
    val a = Search.bigramFluency(docs, "doc_id", "text", broadcastModel = Some(true))
      .orderBy("id").collect().toSeq
    val b = Search.bigramFluency(docs, "doc_id", "text", broadcastModel = Some(false))
      .orderBy("id").collect().toSeq
    assert(a == b && a.nonEmpty)
    // the pinned fallback really shuffles the pairs⋈model join (the only
    // join on both w1 AND w2 — the model build's internal c_ab⋈c_a join
    // may still broadcast, that side is k-row bounded)
    val plan = Search.bigramFluency(docs, "doc_id", "text", broadcastModel = Some(false))
      .queryExecution.executedPlan.toString
    assert("ShuffledHashJoin \\[w1#\\d+, w2#\\d+\\]".r.findFirstIn(plan).isDefined,
      s"pairs-model join is not the pinned shuffle join:\n$plan")
  }

  test("bigramFluencyApply: OOV transitions take the backoff floor; n_oov counts them") {
    // model trained on doc 1 only; doc 2 contains an unseen transition
    val train = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val model = Search.bigramCondProbs(train, "doc_id", "text", minCount = 1L)
    // c(a,b)=2 c(b,a)=2 c(a,c)=1; c_a: a→3, b→2 → cm(a,b)=666 cm(a,c)=333 cm(b,a)=1000
    val held = Seq((10L, "a b a"), (11L, "z q z")).toDF("doc_id", "text")
    val out = Search.bigramFluencyApply(held, model, "doc_id", "text", backoffMilli = 1L)
      .orderBy("id").as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      (10L, 2L, 0L, (666L + 1000L) / 2),   // both transitions trained
      (11L, 2L, 2L, 1L)))                  // all OOV → backoff floor
  }

  test("bigramFluencyApply on the training corpus matches bigramFluency (no OOV)") {
    val model = Search.bigramCondProbs(docs, "doc_id", "text", minCount = 1L)
    val applied = Search.bigramFluencyApply(docs, model, "doc_id", "text")
      .orderBy("id")
      .select($"id", $"n_bigrams", $"mean_cond_milli", $"n_oov").collect().toSeq
    val trained = Search.bigramFluency(docs, "doc_id", "text")
      .orderBy("id")
      .select($"id", $"n_bigrams", $"mean_cond_milli", lit(0L).as("n_oov")).collect().toSeq
    assert(applied == trained && applied.nonEmpty)
  }

  test("trigramBackoffApply walks the full ladder with exact integer rungs") {
    // train: "a b c a b c" → trigrams (a,b,c)=2? no: positions (a,b,c),
    // (b,c,a), (c,a,b), (a,b,c) → c(abc)=2, c(bca)=1, c(cab)=1
    // bigrams: (a,b)=2 (b,c)=2 (c,a)=1; unigrams: a=2 b=2 c=2, N=6
    val train = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val held = Seq(
      (10L, "a b c"),   // trigram hit: 1000*2 div 2 = 1000
      (11L, "c b c"),   // tri (c,b,c) unseen; bigram (b,c)=2, c(b)=2 → 0.4·1000 = 400
      (12L, "b b a"),   // tri+bi (b,a) unseen; uni a → 0.4²·(1000·2 div 6=333) = (4·333) div 25 = 53
      (13L, "b b z")    // z true OOV → floor 1
    ).toDF("doc_id", "text")
    val out = Search.trigramBackoffApply(held, train, "doc_id", "text")
      .orderBy("id")
      .select($"id", $"n_positions", $"n_tri", $"n_big", $"n_uni", $"n_oov", $"mean_milli")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (10L, 1L, 1L, 0L, 0L, 0L, 1000L),
      (11L, 1L, 0L, 1L, 0L, 0L, 400L),
      (12L, 1L, 0L, 0L, 1L, 0L, 53L),
      (13L, 1L, 0L, 0L, 0L, 1L, 1L)))
  }

  test("rrfFuse: both-list ids outrank single-list ids; absent side adds 0") {
    val a = Seq((10L, 1), (11L, 2)).toDF("id", "rank")
    val b = Seq((11L, 1), (12L, 2)).toDF("id", "rank")
    val out = Search.rrfFuse(a, b, k0 = 60, topK = 10)
      .orderBy($"hybrid_rank")
      .as[(Long, Long, Int)].collect().toSeq
    // 11 is in both lists (ranks 2 and 1): floor(1e9/62)+floor(1e9/61)
    val s11 = 1000000000L / 62 + 1000000000L / 61
    val s10 = 1000000000L / 61
    val s12 = 1000000000L / 62
    assert(out == Seq((11L, s11, 1), (10L, s10, 2), (12L, s12, 3)))
  }

  test("rrfFuse ties break by ascending id (deterministic total order)") {
    val a = Seq((5L, 1)).toDF("id", "rank")
    val b = Seq((3L, 1)).toDF("id", "rank")
    val out = Search.rrfFuse(a, b, k0 = 60, topK = 10)
      .orderBy($"hybrid_rank").as[(Long, Long, Int)].collect().toSeq
    assert(out.map(_._1) == Seq(3L, 5L))
    assert(out.map(_._2).distinct.size == 1)
  }

  test("unigramScore ranks rare-token docs below common-token docs") {
    val corpus = Seq(
      (1L, "the the the the"),          // all stop-tokens
      (2L, "the zyx qwv jkl")           // mostly hapaxes
    ).toDF("doc_id", "text")
    val m = Search.unigramScore(corpus, "doc_id", "text")
      .select($"id", $"mean_freq_milli").as[(Long, Long)].collect().toMap
    assert(m(1L) > m(2L))
  }
}
