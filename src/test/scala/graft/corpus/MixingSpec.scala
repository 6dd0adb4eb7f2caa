package graft.corpus

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.TextOps

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private val en = TextOps.Stopwords.toMap.apply("en")

  private def corpus(nA: Int, nB: Int) = {
    val rows = (0 until nA).map(i => (i.toLong, s"the quick fox $i jumps", "en", "web")) ++
      (0 until nB).map(i => ((1000 + i).toLong, s"und der hund $i", "de", "books"))
    rows.toDF("doc_id", "text", "lang", "source")
  }

  test("domainStats: counts, token volume, langs, and exact fixed-point mean quality") {
    val docs = corpus(3, 2)
    val out = Mixing.domainStats(docs, "source", "text", "lang", en)
      .orderBy("source").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("books", "web"))
    val web = out(1)
    assert(web.getLong(1) == 3)           // n_docs
    assert(web.getLong(2) == 15)          // 5 tokens x 3 docs
    assert(web.getLong(3) == 1)           // one lang
    // mean quality must equal the exact mean of per-doc fixed-point scores
    val perDoc = docs.filter($"source" === "web")
      .select(round(TextOps.qualityScore($"text", en) * 1e6).cast("long"))
      .as[Long].collect()
    assert(web.getDouble(4) == perDoc.sum.toDouble / perDoc.length / 1e6)
  }

  test("domainDivergence: zero for an identical-distribution source, bounded, and exact on a closed-form split") {
    // one source IS the corpus → p = q for every term → H² = 0 exactly
    val single = corpus(3, 0)
    val only = Mixing.domainDivergence(single, "source", "text").collect()
    assert(only.length == 1 && only.head.getDouble(3) == 0.0)

    // two disjoint-vocabulary sources: matched q-mass for source s is
    // tot_s/tot_c, and each matched term has p = k·q, so H² stays in
    // (0, 1); check the exact closed form on a tiny hand corpus:
    // A = "x x", B = "y" → corpus dist {x: 2/3, y: 1/3}
    //   H²(A) = ½[(√1 − √(2/3))²] + ½(1 − 2/3)
    val tiny = Seq((1L, "x x", "en", "a"), (2L, "y", "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Mixing.domainDivergence(tiny, "source", "text")
      .orderBy("source").collect()
    val dA = math.sqrt(1.0) - math.sqrt(2.0 / 3.0)
    val expA = 0.5 * (math.rint(dA * dA * 1e12) / 1e12) + 0.5 * (1.0 - 2.0 / 3.0)
    assert(out(0).getString(0) == "a" && out(0).getInt(1) == 1 &&
      out(0).getLong(2) == 2)
    assert(math.abs(out(0).getDouble(3) - expA) < 1e-9)
    out.foreach(r => assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0))
  }

  test("budgetAllocation: exact integer shares, sums to the budget, flattens skew") {
    // skewed corpus: 100 web docs vs 4 books docs
    val docs = corpus(100, 4)
    val out = Mixing.budgetAllocation(docs, "source", budget = 37L)
      .orderBy("source").collect()
    // w = floor(sqrt(100)) = 10, floor(sqrt(4)) = 2, z = 12
    // base: books 2*37 div 12 = 6, web 10*37 div 12 = 30; rem 2, 10
    // leftover = 37 - 36 = 1 -> goes to web (larger remainder)
    assert(out.map(r => (r.getString(0), r.getLong(3))).toSeq ==
      Seq(("books", 6L), ("web", 31L)))
    // the share ratio (31/6) is far flatter than the doc ratio (100/4)
    assert(out.map(_.getLong(3)).sum == 37L)
  }

  // Hand-computed quality fp6 (qualityScore = lenOk·0.4 + min(4·stop,1)·0.4
  // + (1−punct)·0.2; all docs < 20 tokens ⇒ lenOk 0; no punctuation):
  //   hi: "the the the the the" → stopRatio 1 → 0.4 + 0.2 = 0.6 → 600000
  //   lo: "the b c d e"         → stopRatio 0.2 → 0.32 + 0.2 = 0.52 → 520000
  // Unit order by q·2^−(e−1) (okey = q_fp6·2^(E−e), E = 2):
  //   hi e1 (1.2e6) > lo e1 (1.04e6) > hi e2 (6e5) > lo e2 (5.2e5)
  // toks: 5 each; budget 13 → hi e1: 5, lo e1: 5, hi e2: min(5, 13−10)=3,
  // lo e2 starved. value_fp6 halves per epoch (600000 → 300000).
  test("epochMixPlan: greedy by quality-decayed density, partial boundary unit") {
    val docs = Seq(
      ("hi", "the the the the the"),
      ("lo", "the b c d e")
    ).toDF("source", "text")
    val en = graft.text.TextOps.Stopwords.toMap.apply("en")
    val out = Mixing.epochMixPlan(docs, "source", "text", en,
        budget = 13L, maxEpochs = 2)
      .orderBy($"source", $"epoch").as[(String, Int, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("hi", 1, 600000L, 5L), ("hi", 2, 300000L, 3L), ("lo", 1, 520000L, 5L)))
  }

  test("epochMixPlan: zero budget allocates nothing; ample budget fills every epoch") {
    val docs = Seq(("a", "x y z"), ("b", "p q r s")).toDF("source", "text")
    val en = graft.text.TextOps.Stopwords.toMap.apply("en")
    assert(Mixing.epochMixPlan(docs, "source", "text", en, 0L, 3).count() == 0)
    val full = Mixing.epochMixPlan(docs, "source", "text", en, 1000L, 3)
      .orderBy($"source", $"epoch").as[(String, Int, Long, Long)].collect()
    // 2 sources × 3 epochs, every unit fully allocated (3 and 4 tokens)
    assert(full.length == 6)
    assert(full.filter(_._1 == "a").forall(_._4 == 3L))
    assert(full.filter(_._1 == "b").forall(_._4 == 4L))
  }

  test("temperatureSample is deterministic, a subset, and flattens domain skew") {
    val docs = corpus(400, 50)
    val s1 = Mixing.temperatureSample(docs, "source", "doc_id", baseFrac = 0.5)
    val s2 = Mixing.temperatureSample(docs, "source", "doc_id", baseFrac = 0.5)
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == s2.select("doc_id").as[Long].collect().sorted.toSeq)
    assert(ids1.toSet.subsetOf(docs.select("doc_id").as[Long].collect().toSet))
    // sqrt temperature: the small domain keeps a larger FRACTION of itself
    val kept = s1.groupBy("source").count().as[(String, Long)].collect().toMap
    val fracSmall = kept.getOrElse("books", 0L).toDouble / 50
    val fracBig = kept.getOrElse("web", 0L).toDouble / 400
    assert(fracSmall > fracBig)
  }

  test("packSequences: contiguous non-decreasing bins that respect the budget arithmetic") {
    val docs = corpus(40, 10)
    val out = Mixing.packSequences(docs, "source", "doc_id", "text",
        budget = 17, nShards = 2)
      .orderBy("source", "shard", "doc_id")
      .select("source", "shard", "doc_id", "n_tok", "cum_tok", "bin")
      .as[(String, Int, Long, Long, Long, Long)].collect()
    out.groupBy(t => (t._1, t._2)).foreach { case (_, grp) =>
      var cum = 0L
      grp.sortBy(_._3).foreach { case (_, _, _, nTok, cumTok, bin) =>
        cum += nTok
        assert(cumTok == cum, "running sum mismatch")
        assert(bin == (cum - 1) / 17, "bin id mismatch")
      }
      // bins are contiguous and non-decreasing in id order
      val bins = grp.sortBy(_._3).map(_._6)
      assert(bins.zip(bins.tail).forall { case (a, b) => b == a || b == a + 1 },
        "bins must advance by at most one per doc")
    }
  }

  test("calibrateBySource: histogram formulation equals the naive percent_rank window") {
    val docs = ((1 to 60).map(i => (i.toLong, (i % 7).toLong, "web")) ++
      (1 to 9).map(i => ((100 + i).toLong, (i % 3).toLong, "books")) :+
      (200L, 5L, "solo"))
      .toDF("doc_id", "q", "source")
    val out = Mixing.calibrateBySource(docs, "source", "doc_id", $"q")
      .select($"doc_id", $"pctl").as[(Long, Double)].collect().toMap
    val naive = docs.select($"doc_id",
        percent_rank().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"source").orderBy($"q")).as("p"))
      .as[(Long, Double)].collect().toMap
    assert(out == naive, "histogram percent_rank must be bit-equal to the window form")
    // a single-doc source calibrates to 0 (no peers), not NaN
    assert(out(200L) == 0.0)
    // percentiles are within [0, 1] and each source's max is 1 (or 0 for solo)
    assert(out.values.forall(p => p >= 0.0 && p <= 1.0))
  }

  test("weightedSample: k smallest clocks, deterministic, weight-monotone in expectation") {
    val docs = (1 to 200).map(i => (i.toLong, if (i <= 100) 1.0 else 100.0))
      .toDF("doc_id", "w")
    val out = Mixing.weightedSample(docs, "doc_id", $"w", k = 40)
      .as[(Long, Double, Long)].collect()
    assert(out.length == 40)
    // deterministic: second run bit-identical
    val again = Mixing.weightedSample(docs, "doc_id", $"w", k = 40)
      .as[(Long, Double, Long)].collect()
    assert(out.toSeq == again.toSeq)
    // clocks are the global k smallest: max sampled clock <= min unsampled
    val all = Mixing.weightedSample(docs, "doc_id", $"w", k = 200)
      .as[(Long, Double, Long)].collect()
    val sampledMax = out.map(_._3).max
    val unsampled = all.map(_._3).sorted.drop(40)
    assert(unsampled.forall(_ >= sampledMax))
    // 100x-weighted half dominates the sample (exp-clock proportionality)
    val heavy = out.count(_._2 == 100.0)
    assert(heavy >= 30, s"heavy-weight docs got $heavy/40 slots")
    // zero/negative weights can never be sampled
    val withZero = (1 to 5).map(i => (i.toLong, 0.0)).toDF("doc_id", "w")
    assert(Mixing.weightedSample(withZero, "doc_id", $"w", 3).count() == 0)
  }

  test("dsirWeights: target-matched docs outrank, selection is exactly top-K, single-token docs drop") {
    // target slice speaks vocabulary A, the raw bulk vocabulary B; two
    // probe docs (one per vocabulary) must rank on opposite ends
    val rows =
      (0 until 5).map(i => (i.toLong, "alpha beta gamma alpha beta", true)) ++
        (10 until 30).map(i => (i.toLong, "delta epsilon zeta delta epsilon", false)) ++
        Seq((100L, "alpha beta gamma", false),   // matches target profile
          (101L, "delta epsilon zeta", false),   // matches raw bulk
          (102L, "solo", false))                 // < 2 tokens: no features
    val docs = rows.toDF("doc_id", "text", "is_t")
    val out = Mixing.dsirWeights(docs, "doc_id", "text", col("is_t"),
        nBuckets = 64, topK = 7)
      .as[(Long, Long, Long, Boolean)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(!byId.contains(102L), "featureless doc must be absent")
    assert(byId(100L)._3 > byId(101L)._3,
      "target-vocabulary probe must outscore raw-vocabulary probe")
    // exactly topK selected, and they are the score-ordered head
    val sel = out.filter(_._4).map(_._1).toSet
    assert(sel.size == 7)
    val expected = out.sortBy(r => (-r._3, r._1)).take(7).map(_._1).toSet
    assert(sel == expected, "selected flag must mark exactly the top-K")
    // target docs + the target-matched probe fill the selection head
    assert(sel.contains(100L) && (0L until 5L).forall(sel.contains))
  }

  test("dsirWeights: hostile inputs — empty corpus, no target docs, all-short docs") {
    val empty = Seq.empty[(Long, String, Boolean)].toDF("doc_id", "text", "is_t")
    assert(Mixing.dsirWeights(empty, "doc_id", "text", col("is_t"), 64, 5).count() == 0)
    graft.Caches.release()
    // no doc has >= 2 tokens: zero feature rows, empty output, no crash
    val short_ = Seq((1L, "solo", false), (2L, "", true)).toDF("doc_id", "text", "is_t")
    assert(Mixing.dsirWeights(short_, "doc_id", "text", col("is_t"), 64, 5).count() == 0)
    graft.Caches.release()
    // empty TARGET slice: weights degrade to the -raw contrast, all docs
    // still scored and the top-K flag still marks exactly K
    val noTgt = Seq((1L, "a b c", false), (2L, "d e f", false))
      .toDF("doc_id", "text", "is_t")
    val out = Mixing.dsirWeights(noTgt, "doc_id", "text", col("is_t"), 64, 1)
      .as[(Long, Long, Long, Boolean)].collect()
    graft.Caches.release()
    assert(out.length == 2 && out.count(_._4) == 1)
  }

  test("dsirWeights: score algebra ties out against hand-computed distributions") {
    // one target doc "a b", one raw-only doc "c d" → features f_ab, f_cd
    // (md5 buckets; collision-free with high probability at B = 64 for
    // these two literals — asserted via distinct scores below).
    // c_t(f_ab)=1, tot_t=1; c_r: each 1, tot_r=2.
    // w(f_ab) = (2*1e9) div (1+64) − (2*1e9) div (2+64)
    // w(f_cd) = (1*1e9) div 65     − (2*1e9) div 66
    val docs = Seq((1L, "a b", true), (2L, "c d", false))
      .toDF("doc_id", "text", "is_t")
    val out = Mixing.dsirWeights(docs, "doc_id", "text", col("is_t"), 64, 1)
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    val wAb = 2000000000L / 65L - 2000000000L / 66L
    val wCd = 1000000000L / 65L - 2000000000L / 66L
    assert(out(1L)._3 == wAb && out(2L)._3 == wCd)
    assert(out(1L)._2 == 1L && out(2L)._2 == 1L) // one bigram each
    assert(out(1L)._4 && !out(2L)._4)            // topK=1 → target doc wins
  }

  test("sourceBalance: uniform corpus scores eff=S, gini=0") {
    // 3 sources × 4 docs each
    val docs = (0 until 12).map(i => (i.toLong, s"s${i % 3}"))
      .toDF("doc_id", "source")
    val out = Mixing.sourceBalance(docs, "source")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(out == ((12L, 3L, 4L, 333L, 3000L, 0L)))
  }

  test("sourceBalance: single-source corpus scores eff=1, max=1000") {
    val docs = (0 until 7).map(i => (i.toLong, "only")).toDF("doc_id", "source")
    val out = Mixing.sourceBalance(docs, "source")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(out == ((7L, 1L, 7L, 1000L, 1000L, 0L)))
  }

  test("sourceBalance: skewed corpus matches the hand-computed indices") {
    // counts 1, 1, 8 → N=10, S=3, Σn²=66, sorted ranks (1,1),(2,1),(3,8)
    val docs = ((0 until 8).map(i => (i.toLong, "big")) ++
      Seq((100L, "a"), (101L, "b"))).toDF("doc_id", "source")
    val out = Mixing.sourceBalance(docs, "source")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val eff = 1000L * 100 / 66              // 1515 — between 1 and S
    val gini = 1000L * (2 * (1 + 2 + 24) - 4 * 10) / (3 * 10) // 466
    assert(out == ((10L, 3L, 8L, 800L, eff, gini)))
    // tie invariance: swapping the two singleton sources' names cannot
    // change any index (rank-sum is tie-order-invariant)
    val swapped = docs.withColumn("source",
      when($"source" === "a", "b").when($"source" === "b", "a")
        .otherwise($"source"))
    val out2 = Mixing.sourceBalance(swapped, "source")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(out2 == out)
  }
}
