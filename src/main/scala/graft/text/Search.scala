package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword search / term weighting over the document corpus: TF-IDF top
  * terms per document and BM25 ranking (Robertson & Spärck Jones — public
  * formulas). The engine-portability strategy mirrors similarity.Vectors:
  * every per-term weight is quantized to fixed-point BIGINT (×1e6)
  * BEFORE summation/ranking, so aggregation is exact integer arithmetic —
  * order-independent under any partitioning and bit-identical across
  * engines (the one transcendental, ln, is computed on identical inputs
  * in both engines; quantization absorbs its sub-ulp wobble).
  *
  * Scale shape: token explode → (id, term) group-by is the classic
  * map-side-combining aggregation; for BM25 the query-term filter is
  * pushed BELOW the aggregations so only matching postings shuffle —
  * per-query work is O(postings of query terms), not O(corpus tokens).
  */
object Search {

  val ScoreScale = 1000000.0

  private def fp(c: Column): Column = round(c * ScoreScale).cast("long")

  /** Broadcast-decision seam shared by the LM joins: `Some(true)` pins
    * the broadcast hint, `Some(false)` pins the shuffle join (a
    * SHUFFLE_HASH hint — the aggregated side is still far smaller than
    * the stream side, merge-sort would be waste), `None` leaves the plan
    * unhinted so Catalyst statistics + AQE's runtime size of the
    * aggregated side pick — the only safe default when the small side is
    * vocabulary-bounded rather than dimension-bounded. Shared by every
    * text op that joins a DISTINCT-WORD / vocabulary-keyed table back
    * onto the corpus (unigramScore, bigramFluency, lmBuckets, and the
    * tokenizer applies in [[Unigram]]/[[WordPiece]]): such tables grow
    * with corpus vocabulary (Heaps' law — ~10⁷-10⁸ rows at web scale),
    * so a hard-coded broadcast is a driver OOM waiting on the wrong
    * corpus; the default must let the engine measure. */
  private[text] def sizeGated(small: DataFrame, force: Option[Boolean]): DataFrame =
    force match {
      case Some(true)  => broadcast(small)
      case Some(false) => small.hint("shuffle_hash")
      case None        => small
    }

  /** (id, term, tf) term frequencies — one shuffle with partial combine. */
  def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  /** (id, dl) document lengths in tokens (docs with ≥ 1 token). */
  def docLengths(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextOps.tokenCount(col(textCol)).cast("long").as("dl"))
      .filter(col("dl") > 0)

  /** Corpus stats as a single broadcastable row: (n_docs, avgdl).
    * avgdl = exact long sum / count — order-free. */
  private def corpusStats(dl: DataFrame): DataFrame =
    dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

  /** Top-k terms per document by TF-IDF (idf = ln(N / df)), ranked by the
    * quantized score with term as tie-break. Returns
    * (id, term, score_fp, term_rank). */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = corpusStats(docLengths(docs, idCol, textCol))
    val scored = tf.join(dfT, "term").crossJoin(broadcast(stats))
      .withColumn("score_fp",
        fp(col("tf") * log(col("n_docs").cast("double") / col("df"))))
    val w = Window.partitionBy("id").orderBy(col("score_fp").desc, col("term").asc)
    scored.withColumn("term_rank", row_number().over(w))
      .filter(col("term_rank") <= k)
      .select(col("id"), col("term"), col("score_fp"), col("term_rank"))
  }

  /** BM25 top-k documents for a bag of query terms (k1/b are the classic
    * defaults). idf = ln((N − df + 0.5)/(df + 0.5) + 1); each term's
    * contribution is quantized then summed as exact integers. The query-
    * term filter runs BEFORE any shuffle, so only matching postings move.
    * Returns (id, score_fp, doc_rank). */
  def bm25TopDocs(docs: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), explode(TextOps.tokens(col(textCol))).as("term"))
    val tf = toks.filter(col("term").isin(terms.map(_.asInstanceOf[Any]): _*))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = docLengths(docs, idCol, textCol)
    val stats = corpusStats(dl)
    val idf = log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    // (1-b) + b·dl/avgdl, then ×k1 — written so each double op matches
    // the oracle SQL operation-for-operation (IEEE-deterministic)
    val lenNorm = lit(1 - b) + col("dl") * b / col("avgdl")
    val wTerm = idf * (col("tf") * (k1 + 1)) / (col("tf") + lenNorm * k1)
    val scored = tf.join(dfT, "term").join(dl, "id").crossJoin(broadcast(stats))
      .withColumn("w_fp", fp(wTerm))
      .groupBy("id").agg(sum(col("w_fp")).as("score_fp"))
    // global top-k via sort+limit (TakeOrderedAndProject — no single-
    // partition window over the full match set); the rank column is then
    // a window over at most k rows.
    val top = scored.orderBy(col("score_fp").desc, col("id").asc).limit(k)
    top.withColumn("doc_rank",
        row_number().over(Window.orderBy(col("score_fp").desc, col("id").asc)))
      .select(col("id"), col("score_fp"), col("doc_rank"))
  }

  /** Unigram language-model document scoring — the corpus-statistics
    * quality signal (a fluency surrogate: documents dominated by rare
    * tokens score low, the unigram form of the KenLM-perplexity filters
    * of CCNet/Gopher — public method; Wenzek et al. arXiv:1911.00359).
    * The "model" is the corpus's own unigram histogram; the score is the
    * mean corpus frequency of the document's tokens, reported as exact
    * integers:
    * {{{ (id, n_tokens, sum_freq, mean_freq_milli) }}}
    * with `mean_freq_milli = (1000·sum_freq) div n_tokens` — integer
    * floor division so the value is partition-order-independent and
    * engine-exact (a float mean would hash-drift; a log-prob would add a
    * transcendental — rank order is identical, which is all a threshold
    * filter consumes).
    *
    * Scale shape: the histogram is ONE map-side-combining aggregation to
    * O(vocab) rows — Zipf bounds real vocabularies in the millions, so
    * the frequency table BROADCASTS (set `broadcastStats = false` to
    * shuffle-join instead if the vocabulary is adversarially unbounded);
    * the corpus-side explode then joins without moving the corpus, and
    * the per-doc rollup is the only exchange carrying doc rows.
    *
    * `broadcastStats`: `Some(true)` forces the broadcast, `Some(false)`
    * forces the shuffle join, `None` (default) lets the engine size-gate
    * the choice — AQE sees the histogram's ACTUAL post-shuffle size and
    * broadcasts only under `spark.sql.autoBroadcastJoinThreshold`. A
    * hard-coded broadcast is a driver OOM on an adversarially unbounded
    * vocabulary; the default must not encode an assumption the data can
    * break.
    */
  def unigramScore(docs: DataFrame, idCol: String, textCol: String,
                   broadcastStats: Option[Boolean] = None): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val hist = toks.groupBy("term").agg(count(lit(1)).as("freq"))
    val joined = toks.join(sizeGated(hist, broadcastStats), "term")
    joined.groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("freq")).as("sum_freq"))
      .select(col("id"), col("n_tokens"), col("sum_freq"),
        expr("(1000 * sum_freq) div n_tokens").as("mean_freq_milli"))
  }

  /** CCNet-style per-language LM-score bucketing (Wenzek et al., LREC
    * 2020, arXiv:1911.00359): within each language, split documents into
    * head / middle / tail thirds by corpus-frequency LM score — the
    * pretraining-mix knob that keeps the fluent third of every language
    * rather than the fluent third of the corpus (which would be all
    * English).
    *
    * Contract is VALUE-TERTILE, not row-tertile: the boundaries are the
    * ⌈n/3⌉-th and ⌈2n/3⌉-th highest scores per language, computed from
    * the per-(lang, score) HISTOGRAM, and docs bucket by comparing
    * against them — so score ties never split across buckets (an
    * `ntile` would split them by an engine-private row order) and no
    * window ever partitions a whole language stratum: the only windows
    * here run over the score histogram, bounded by score cardinality
    * (the calibrateBySource reasoning), never by corpus size. All
    * arithmetic is exact integers (the unigram score is an integer
    * permille; boundary ranks are ceil via `(n+2) div 3`).
    *
    * Scale shape: the scored projection persists once
    * (`Caches.materialize`) and feeds both the histogram and the final
    * bucket join; boundaries are O(#langs) rows and broadcast. */
  def lmBuckets(docs: DataFrame, idCol: String, textCol: String,
                langCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), col(langCol).as("lang"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val hist = toks.groupBy("term").agg(count(lit(1)).as("freq"))
    val scored = graft.Caches.materialize(
      toks.join(sizeGated(hist, None), "term")
        .groupBy("id", "lang")
        .agg(expr("(1000 * sum(freq)) div count(1)").as("score"))
        .persist())
    val scoreHist = scored.groupBy(col("lang"), col("score"))
      .agg(count(lit(1)).as("c"))
    val cum = scoreHist.withColumn("c_ge",
      sum(col("c")).over(Window.partitionBy(col("lang"))
        .orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n",
        sum(col("c")).over(Window.partitionBy(col("lang"))))
    val bounds = cum.groupBy(col("lang")).agg(
      max(when(col("c_ge") >= expr("(n + 2) div 3"), col("score"))).as("b1"),
      max(when(col("c_ge") >= expr("(2 * n + 2) div 3"), col("score"))).as("b2"))
    scored.join(broadcast(bounds), "lang")
      .select(col("id"), col("lang"), col("score"),
        when(col("score") >= col("b1"), lit("head"))
          .when(col("score") >= col("b2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** Tokenizer VOCABULARY-COVERAGE per language — the OOV-rate
    * diagnostic that pairs with fertility (q_token_fertility): for a
    * top-V frequency vocabulary ([[buildVocab]]), what fraction of each
    * language's running text falls outside it. A language whose OOV
    * rate runs hot is under-served by the vocab (its text shatters into
    * fallback units) — the fairness signal vocab-size/allocation
    * decisions are made on (the analysis behind byte-fallback budgets
    * in multilingual tokenizers).
    *
    * Scale shape: ONE persisted (lang, term) token projection feeds
    * BOTH the vocab histogram (re-aggregated dropping lang) and the
    * coverage aggregate — the corpus is scanned and exploded once, not
    * once per consumer (the shared-artifact discipline of the dedup
    * tier). The vocab is V rows and BROADCASTS into the left join
    * (explicit — V is a fixed knob, bounded by construction, unlike
    * the unbounded histogram unigramScore size-gates); one hash
    * aggregate to #languages rows. Exact integer counts and one
    * floor-div permille. */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    langCol: String, vocabSize: Int): DataFrame = {
    val toks = graft.Caches.materialize(
      docs.select(col(langCol).as("lang"),
          explode(TextOps.tokens(col(textCol))).as("term"))
        .persist())
    val ord = Seq(col("freq").desc, col("term").asc)
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(ord: _*).limit(vocabSize)
      .select(col("term"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_permille", expr("(1000 * n_oov) div n_tokens"))
  }

  /** Frequency-ranked vocabulary build — the first stage of tokenizer
    * training (top-V types by corpus count, deterministic lexicographic
    * tie-break, dense ids in rank order). One map-side-combining
    * aggregation to O(types) rows, then top-V via sort+limit
    * (TakeOrderedAndProject — no global sort of the type table); the id
    * window runs over at most V rows. Returns (term, freq, token_id).
    */
  def buildVocab(docs: DataFrame, idCol: String, textCol: String,
                 vocabSize: Int): DataFrame = {
    val hist = docs
      .select(explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    val ord = Seq(col("freq").desc, col("term").asc)
    hist.orderBy(ord: _*).limit(vocabSize)
      .withColumn("token_id", row_number().over(Window.orderBy(ord: _*)))
  }

  /** Bigram conditional-probability counts — the KenLM-style count stage
    * of an n-gram LM build (public method; Heafield ACL'11 describes the
    * scaled pipeline): c(w1,w2) over adjacent token pairs, left-context
    * totals c(w1) = Σ_w2 c(w1,w2), and the MLE conditional as exact
    * integer permille `(1000·c_ab) div c_a` (floor division — order-free,
    * engine-exact; a float ratio or log would hash-drift).
    *
    * Scale shape: pair expansion is in-row (sequence→element_at — no
    * shuffle); ONE exchange aggregates pairs with map-side combine to
    * O(observed bigrams) rows; the context totals re-aggregate THAT table
    * (never the token stream) and join back on w1 — both sides
    * vocabulary-bounded, orders of magnitude below corpus size.
    * `minCount` prunes the hapax tail (the LM count-cutoff knob).
    */
  /** (id, w1, w2) adjacent-pair expansion — in-row, no shuffle. */
  /** (id, w1, w2) adjacent-pair expansion — in-row, no shuffle. The
    * position generator + two `element_at` lookups stay in WHOLE-STAGE
    * CODEGEN; the earlier `transform(sequence(...), i -> struct(...))`
    * formulation evaluated its lambda INTERPRETED per element (higher-
    * order functions have no doGenCode) and cost ~2.5 s of the corpus
    * scan at sf0.1 — the same landmine the PQ trainer hit. */
  private def bigramPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("id"), col("tk"),
        explode(sequence(lit(1), size(col("tk")) - 1)).as("i"))
      .select(col("id"), element_at(col("tk"), col("i")).as("w1"),
        element_at(col("tk"), col("i") + 1).as("w2"))

  /** Model build from an already-expanded pair stream — the seam that
    * lets [[bigramFluency]] train and apply off ONE persisted expansion
    * instead of scanning the corpus twice. */
  private def bigramModelFromPairs(pairs: DataFrame, minCount: Long): DataFrame = {
    val cab = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val ca = cab.groupBy("w1").agg(sum(col("c_ab")).as("c_a"))
    cab.join(ca, "w1")
      .filter(col("c_ab") >= minCount)
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"),
        expr("(1000 * c_ab) div c_a").as("cond_milli"))
  }

  def bigramCondProbs(docs: DataFrame, idCol: String, textCol: String,
                      minCount: Long): DataFrame =
    bigramModelFromPairs(bigramPairs(docs, idCol, textCol), minCount)

  /** BPE merge TRAINING (Sennrich et al. 2016, arXiv:1508.07909) at the
    * word level — the first `nMerges` merge rules learned from the
    * corpus, each round taking the most frequent adjacent symbol pair
    * (count DESC, then lexicographic — a total order, so the learned
    * table is deterministic) and fusing it corpus-wide before recounting.
    *
    * Representation is the whole trick: every document is ONE
    * guard-wrapped string `(a)(b)(c)`, so applying merge (a,b) is a
    * plain leftmost non-overlapping `replace` of `(a)(b)` with
    * `(a b)` — adjacent occurrences share no characters, and for a = b
    * runs ("(a)(a)(a)") leftmost-non-overlapping IS BPE's greedy
    * left-to-right apply. That keeps the apply step a scan-linear
    * codegen expression (zero UDFs, zero explode-regroup round trips:
    * re-tokenization happens in-row off the merged string).
    *
    * Scale shape per round: the pair histogram is ONE map-side-combining
    * exchange to observed-pair rows; the argmax is TakeOrderedAndProject
    * (1 row) — the single collected row IS the model artifact for the
    * round (same bounded-collect contract as the k-means centroids and
    * PQ codebooks). The corpus string column is re-derived lazily per
    * round — at petascale, checkpoint the merged corpus every few rounds
    * exactly as the CC loop truncates its lineage.
    */
  def bpeTrainMerges(docs: DataFrame, idCol: String, textCol: String,
                     nMerges: Int): DataFrame =
    bpeTrainLoop(docs, idCol, textCol, nMerges)._1

  /** The trained BPE tokenizer APPLIED corpus-wide — the production
    * tokenization step after [[bpeTrainMerges]]: every document's token
    * count before and after the learned merges fuse (the compression
    * the tokenizer buys, per doc). The merge chain rides the same
    * scan-linear guarded-string `replace`s as training; the final
    * re-tokenization is one in-row split. */
  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
               nMerges: Int): DataFrame =
    graft.Caches.memo(
      ("bpeApply", docs.queryExecution.logical.canonicalized,
        idCol, textCol, nMerges)) {
      val (_, merged) = bpeTrainLoop(docs, idCol, textCol, nMerges)
      // Persist the COUNTS (3 longs/doc), not the merged corpus (two
      // full text copies/doc): every downstream consumer (the apply
      // row, the fertility audit) reads only the counts, and the
      // merged string column is derived in the same single pass that
      // builds them.
      graft.Caches.materialize(
        merged.select(col("id"),
          size(TextOps.tokens(col("text0"))).cast("long").as("n_tok_before"),
          size(expr("split(substring(s, 2, length(s) - 2), '\\\\)\\\\(')"))
            .cast("long").as("n_tok_after"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }

  /** Shared train loop: returns (merge table, final merged corpus as
    * (id, text0, s) with `s` the guard-wrapped string after all learned
    * merges applied). Memoized per (input plan, params) release-epoch
    * and the merged corpus persisted (`Caches.memo` + `materialize`):
    * the loop is driver-side iterative — nMerges aggregate+collect
    * rounds — so every consumer re-running it (train row, corpus-wide
    * apply, fertility audit) would re-pay the whole chain; in
    * production the merge table and merged corpus are artifacts
    * written once and read by every downstream tokenization job, and
    * the memo is that artifact store's in-session analogue. */
  private def bpeTrainLoop(docs: DataFrame, idCol: String, textCol: String,
                           nMerges: Int): (DataFrame, DataFrame) =
    graft.Caches.memo(
      ("bpeTrainLoop", docs.queryExecution.logical.canonicalized,
        idCol, textCol, nMerges)) {
      // The merge table is local rows (nMerges argmax collects); the
      // merged corpus stays LAZY — its single consumer (bpeApply)
      // derives and persists the per-doc counts in one pass, so
      // persisting the heavy string column here would only double the
      // memory bill.
      bpeTrainLoopUncached(docs, idCol, textCol, nMerges)
    }

  private def bpeTrainLoopUncached(docs: DataFrame, idCol: String, textCol: String,
                           nMerges: Int): (DataFrame, DataFrame) = {
    val sess = docs.sparkSession
    require(nMerges >= 1, s"nMerges=$nMerges must be >= 1")
    // Guard-string precondition: the encoding delimits tokens with
    // parentheses, so a token CONTAINING '(' or ')' would silently
    // corrupt the boundaries (wrong merges, wrong n_tok_after). Reject
    // loudly up front — one filter scan against the corpus the loop is
    // about to scan nMerges more times. Quotes/backslashes are fine:
    // merge literals go through Column `lit`s, never SQL text.
    // Each merge round re-scans the corpus string: left lazy, round r
    // would re-read the raw corpus and re-apply all r−1 earlier
    // replaces (O(nMerges²) corpus derivations across the loop). So
    // every round's corpus is persisted and the PREDECESSOR unpersisted
    // as soon as the successor is materialized — the same
    // lineage-truncation the CC loop uses: live cache stays one corpus
    // copy, each round reads its cached predecessor once, and the raw
    // parquet is scanned exactly once (by the guard check, which warms
    // the round-0 cache instead of running as its own raw scan).
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var s = graft.Caches.track(
      docs.select(col(idCol).as("id"), col(textCol).as("text0"),
        concat(lit("("), regexp_replace(col(textCol), " ", ")("), lit(")")).as("s"))
        .persist(lvl))
    // Guard-string precondition: the encoding delimits tokens with
    // parentheses, so a token CONTAINING '(' or ')' would silently
    // corrupt the boundaries (wrong merges, wrong n_tok_after). Reject
    // loudly up front. Quotes/backslashes are fine: merge literals go
    // through Column `lit`s, never SQL text.
    val nBad = s.filter(col("text0").rlike("[()]")).limit(1).count()
    require(nBad == 0,
      "bpeTrainLoop: corpus contains '(' or ')' which collide with the " +
        "guard-string token delimiters; strip or remap them upstream " +
        "(e.g. TextOps.normalize) before BPE training")
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= nMerges && !exhausted) {
      val pairs = s
        .select(expr("split(substring(s, 2, length(s) - 2), '\\\\)\\\\(')").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("tk"), explode(sequence(lit(1), size(col("tk")) - 1)).as("i"))
        .select(element_at(col("tk"), col("i")).as("w1"),
          element_at(col("tk"), col("i") + 1).as("w2"))
      val top = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w1"), col("w2")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val w1 = top.head.getString(0)
        val w2 = top.head.getString(1)
        merges += ((r, w1, w2, top.head.getLong(2)))
        // Column-literal form (functions.replace), NOT string-interpolated
        // expr(...): corpus-derived tokens must never be spliced into SQL
        // text — an apostrophe or backslash in a token would throw a parse
        // error (or worse, let data rewrite the expression). `lit` carries
        // any byte sequence verbatim.
        val prev = s
        s = graft.Caches.track(
          prev.select(col("id"), col("text0"),
            org.apache.spark.sql.functions.replace(col("s"),
              lit(s"($w1)($w2)"), lit(s"($w1 $w2)")).as("s"))
            .persist(lvl))
        // Materialize the successor off the predecessor's cache, then
        // drop the predecessor — one live corpus copy at any time.
        s.count()
        prev.unpersist(false)
        r += 1
      }
    }
    import sess.implicits._
    (merges.result().toDF("merge_rank", "w1", "w2", "pair_count"), s)
  }

  /** word2phrase collocation mining (Mikolov et al. 2013,
    * arXiv:1310.4546 §4) — the phrase-vocabulary induction step before
    * tokenizer/embedding training: score(a,b) = (c_ab − δ)·N / (c_a·c_b)
    * surfaces token pairs that co-occur far above chance; the top-k
    * become single units. Exact integer permille (÷ via `div`) so the
    * ranking is partition-order-free and engine-exact. Scale shape: the
    * pair histogram is ONE map-side-combining exchange to O(observed
    * bigrams) rows (vocab²-bounded, Zipf-small in practice); the unigram
    * histogram re-aggregates the token stream to O(vocab) rows and joins
    * the PAIR table (model-sized, never the corpus); the corpus-total
    * join is a one-row broadcast; top-k is TakeOrderedAndProject (k rows
    * per partition → k global, no sort of the model table). The permille
    * numerator (c_ab−δ)·1000·N is BIGINT-safe while c_ab·N < 9·10^15 —
    * beyond that (petascale corpora) rescale N to millions or move the
    * RANKING to doubles and keep only the threshold integer. */
  def phraseMining(docs: DataFrame, idCol: String, textCol: String,
                   delta: Long = 5, minCount: Long = 10, topK: Int = 20): DataFrame = {
    val cab = bigramPairs(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    val uni = docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum(col("c")).as("n_tok"))
    cab
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        expr(s"((c_ab - $delta) * 1000 * n_tok) div (c_a * c_b)").as("score_permille"))
      .orderBy(col("score_permille").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Bigram-LM fluency scoring — the APPLY side of [[bigramCondProbs]]
    * (the CCNet LM-filter loop with the corpus as its own model: train
    * the n-gram model, score every document, threshold on the score —
    * Wenzek arXiv:1911.00359, unigram→bigram form). A document's score is
    * the mean conditional permille of its adjacent pairs — exact integer
    * arithmetic end to end (the model's permilles are floor-div ints, the
    * doc mean is a floor-div of their sum), so partition-order-free and
    * engine-exact; low mean ⇒ improbable token transitions ⇒ drop
    * candidate. Model trained with minCount=1 so every observed pair
    * scores (the out-of-corpus APPLY is [[bigramFluencyApply]]).
    *
    * Scale shape: train and apply share ONE persisted pair expansion
    * (`Caches.materialize` — without it each side re-scans the corpus:
    * two full corpus scans where one pair table serves both, the round-7
    * profile's dominant cost). The model is O(observed bigrams) rows —
    * vocabulary-bounded, orders below corpus size — and joins back over
    * the pair stream under the size-gated seam: `broadcastModel = None`
    * (default) lets AQE measure the model's actual size and broadcast
    * only when it fits (observed-bigrams is vocab²-bounded, NOT
    * dimension-sized — an unconditional broadcast is a driver OOM on a
    * web corpus); `Some(true)`/`Some(false)` pin either plan.
    */
  def bigramFluency(docs: DataFrame, idCol: String, textCol: String,
                    broadcastModel: Option[Boolean] = None): DataFrame = {
    val pairs = graft.Caches.materialize(
      bigramPairs(docs, idCol, textCol)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val model = bigramModelFromPairs(pairs, minCount = 1L)
      .select(col("w1"), col("w2"), col("cond_milli"))
    pairs.join(sizeGated(model, broadcastModel), Seq("w1", "w2"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("cond_milli")).as("sum_cond_milli"))
      .select(col("id"), col("n_bigrams"), col("sum_cond_milli"),
        expr("sum_cond_milli div n_bigrams").as("mean_cond_milli"))
  }

  /** Out-of-corpus bigram-LM apply — score documents against a model
    * table they did NOT train (the form a production quality-filter
    * fleet runs: train the reference LM once on curated text, score
    * every new crawl shard against it). Pairs LEFT-join the model;
    * transitions the model never saw take the `backoffMilli` floor (the
    * ε-backoff of the CCNet filter loop — a permille the caller sets
    * below any trained conditional, so OOV-dense documents sink).
    * Returns (id, n_bigrams, n_oov, mean_cond_milli) — n_oov exposes
    * the backoff count so a threshold can also gate on OOV rate
    * directly. Exact integer arithmetic end to end; same size-gated
    * model-join seam as [[bigramFluency]].
    */
  def bigramFluencyApply(docs: DataFrame, model: DataFrame, idCol: String,
                         textCol: String, backoffMilli: Long = 1L,
                         broadcastModel: Option[Boolean] = None): DataFrame = {
    val pairs = bigramPairs(docs, idCol, textCol)
    val m = model.select(col("w1"), col("w2"), col("cond_milli"))
    pairs.join(sizeGated(m, broadcastModel), Seq("w1", "w2"), "left")
      .select(col("id"),
        coalesce(col("cond_milli"), lit(backoffMilli)).as("cm"),
        col("cond_milli").isNull.cast("long").as("oov"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("oov")).as("n_oov"),
        sum(col("cm")).as("sum_cond_milli"))
      .select(col("id"), col("n_bigrams"), col("n_oov"),
        expr("sum_cond_milli div n_bigrams").as("mean_cond_milli"))
  }

  /** (id, w1, w2, w3) adjacent-triple expansion — in-row, no shuffle
    * (the trigram sibling of [[bigramPairs]]). */
  private def trigramTriples(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 3)
      .select(col("id"), col("tk"),
        explode(sequence(lit(1), size(col("tk")) - 2)).as("i"))
      .select(col("id"), element_at(col("tk"), col("i")).as("w1"),
        element_at(col("tk"), col("i") + 1).as("w2"),
        element_at(col("tk"), col("i") + 2).as("w3"))

  /** Trigram STUPID-BACKOFF scoring (Brants et al., EMNLP'07 — the
    * web-scale n-gram smoothing: no normalization, a fixed 0.4 penalty
    * per backoff level) against models trained on `trainDocs`:
    *
    *   S(w3|w1w2) = c123/c12           if the trigram was seen
    *              | 0.4 · c23/c2       else if the bigram was seen
    *              | 0.4² · c3/N        else if the unigram was seen
    *              | backoffMilli       else (true OOV)
    *
    * in exact integer permille — 0.4 = 2/5 and 0.4² = 4/25 stay integer
    * ((2·b) div 5, (4·u) div 25), so scores are order-free and
    * engine-exact. A document's score is the floor-div mean over its
    * triple positions; n_tri/n_big/n_uni/n_oov expose the backoff-level
    * histogram for direct thresholding (an OOV-dense crawl shard sinks
    * on n_oov before the mean moves).
    *
    * Scale shape: all model tables are observed-n-gram-bounded (re-
    * aggregations of in-row expansions of the TRAIN split, never joins
    * against the corpus); the scored triple stream is in-row expanded
    * and pays three size-gated joins (the price of three backoff
    * levels) before ONE per-doc aggregate. */
  def trigramBackoffApply(docs: DataFrame, trainDocs: DataFrame, idCol: String,
                          textCol: String, backoffMilli: Long = 1L,
                          broadcastModel: Option[Boolean] = None): DataFrame = {
    val c12 = bigramPairs(trainDocs, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val tm = trigramTriples(trainDocs, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("c123"))
      .join(c12, Seq("w1", "w2"))
      .select(col("w1"), col("w2"), col("w3"),
        expr("(1000 * c123) div c12").as("tri_milli"))
    val uni = trainDocs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val nTok = uni.agg(sum(col("c1")).as("n_tok"))
    val bm = c12.join(uni, c12("w1") === uni("w"))
      .select(c12("w1").as("w2"), c12("w2").as("w3"),
        expr("(1000 * c12) div c1").as("big_milli"))
    val um = uni.crossJoin(broadcast(nTok))
      .select(col("w").as("w3"), expr("(1000 * c1) div n_tok").as("uni_milli"))
    trigramTriples(docs, idCol, textCol)
      .join(sizeGated(tm, broadcastModel), Seq("w1", "w2", "w3"), "left")
      .join(sizeGated(bm, broadcastModel), Seq("w2", "w3"), "left")
      .join(sizeGated(um, broadcastModel), Seq("w3"), "left")
      .select(col("id"),
        coalesce(col("tri_milli"),
          expr("(2 * big_milli) div 5"),
          expr("(4 * uni_milli) div 25"),
          lit(backoffMilli)).as("s"),
        col("tri_milli").isNotNull.cast("long").as("h3"),
        (col("tri_milli").isNull && col("big_milli").isNotNull).cast("long").as("h2"),
        (col("tri_milli").isNull && col("big_milli").isNull &&
          col("uni_milli").isNotNull).cast("long").as("h1"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_positions"),
        sum(col("h3")).as("n_tri"), sum(col("h2")).as("n_big"),
        sum(col("h1")).as("n_uni"), sum(col("s")).as("sum_milli"))
      .select(col("id"), col("n_positions"), col("n_tri"), col("n_big"),
        col("n_uni"),
        (col("n_positions") - col("n_tri") - col("n_big") - col("n_uni")).as("n_oov"),
        expr("sum_milli div n_positions").as("mean_milli"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09 — public method) of
    * two ranked candidate lists: score(id) = Σ_lists ⌊10^9 / (k0 +
    * rank)⌋, absent-from-a-list contributes 0. Exact integers end to end
    * (the IEEE divide-then-floor is identical in any engine), total
    * (score DESC, id ASC) order so ties are deterministic. Inputs are
    * (id, rank) frames — each the top-`poolK` of its retriever, so the
    * fusion is a join of two k-row tables regardless of corpus size.
    * Returns (id, score_rrf, hybrid_rank), hybrid_rank ≤ topK. */
  def rrfFuse(a: DataFrame, b: DataFrame, k0: Int, topK: Int): DataFrame = {
    def contrib(df: DataFrame, out: String): DataFrame =
      df.select(col("id"),
        floor(lit(1000000000.0) / (lit(k0) + col("rank"))).cast("long").as(out))
    val fused = contrib(a, "sa").join(contrib(b, "sb"), Seq("id"), "full_outer")
      .select(col("id"),
        (coalesce(col("sa"), lit(0L)) + coalesce(col("sb"), lit(0L))).as("score_rrf"))
    fused.orderBy(col("score_rrf").desc, col("id").asc).limit(topK)
      .withColumn("hybrid_rank",
        row_number().over(Window.orderBy(col("score_rrf").desc, col("id").asc)))
  }

  /** HYBRID retrieval — the standard two-tower serving composition of an
    * LLM data platform: dense (cosine over the embedding store, anchored
    * at a query vector) and sparse (BM25 over the document store) ranked
    * lists fused by reciprocal rank. Both retrievers are the library's
    * verified operators; each contributes only its top-`poolK` rows to
    * the fusion join, so the fusion cost is independent of corpus size
    * and the heavy lifting stays in the retrievers (broadcast query
    * vector; pre-shuffle-filtered postings). */
  def hybridTopK(docs: DataFrame, embeds: DataFrame, idCol: String,
                 textCol: String, vecIdCol: String, vecCol: String,
                 queryId: Long, terms: Seq[String], poolK: Int, topK: Int,
                 k0: Int = 60): DataFrame = {
    val dense = graft.similarity.Vectors.bruteForceTopK(
        embeds.filter(col(vecIdCol) === queryId), embeds, vecIdCol, vecCol, poolK)
      .select(col("match_id").as("id"), col("rank"))
    val sparse = bm25TopDocs(docs, idCol, textCol, terms, poolK)
      .select(col("id"), col("doc_rank").as("rank"))
    rrfFuse(dense, sparse, k0, topK)
  }
}
