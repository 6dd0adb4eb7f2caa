package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Corpus-composition operators for assembling a pretraining mix:
  * per-domain reporting, temperature-based domain re-weighting (the
  * sampling scheme used to flatten source-size skew in LLM training
  * mixes), and token-budget sequence packing.
  *
  * Shapes are chosen for the 100 TB case:
  *   - stats and weights are hash-aggregates with map-side partials whose
  *     output is O(#domains) — tiny — so the re-weighting join back onto
  *     the corpus broadcasts under AQE and the corpus itself never
  *     shuffles;
  *   - packing is the one genuinely order-dependent operator, so it runs
  *     as a window per (domain, shard) — the deterministic md5 shard key
  *     bounds any single partition's sequential work regardless of how
  *     skewed the domain sizes are.
  *
  * Floating-point discipline (oracle hash-exactness): averages are
  * computed as exact integer sums of per-row fixed-point values (1e6)
  * and divided once at the end — a parallel double sum would be
  * partition-order-dependent. The temperature exponent is fixed at 0.5
  * because IEEE 754 requires sqrt to be correctly rounded (bit-identical
  * across engines), unlike pow(x, alpha).
  */
object Mixing {

  /** Per-row fixed-point quality used by both stats and its oracle. */
  private def qualityFp6(text: Column, stopwords: Seq[String]): Column =
    round(TextOps.qualityScore(text, stopwords) * 1e6).cast("long")

  /** Per-domain corpus report: doc count, token volume, distinct
    * languages, and mean quality (exact fixed-point mean — deterministic
    * under any partitioning). One hash-aggregate over the scan. */
  def domainStats(docs: DataFrame, sourceCol: String, textCol: String,
                  langCol: String, stopwords: Seq[String]): DataFrame = {
    val txt = col(textCol)
    docs
      .select(col(sourceCol), col(langCol),
        TextOps.tokenCount(txt).cast("long").as("n_tok"),
        qualityFp6(txt, stopwords).as("q_fp6"))
      .groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        countDistinct(col(langCol)).as("n_langs"),
        (sum(col("q_fp6")).cast("double") / count(lit(1)) / 1e6).as("avg_quality"))
  }

  /** Square-root temperature weights per domain: the TARGET output mix
    * w_s ∝ sqrt(c_s / N) (normalized to sum to 1), alongside each
    * domain's input share c_s / N. Output is O(#domains) rows; both
    * normalizing aggregates are 1-row broadcast crosses (the TF-IDF
    * corpus-stats pattern) — no second pass over the corpus. */
  def temperatureWeights(docs: DataFrame, sourceCol: String): DataFrame = {
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n"))
    val p = counts.crossJoin(broadcast(total))
      .select(col(sourceCol),
        (col("c").cast("double") / col("n").cast("double")).as("share"),
        sqrt(col("c").cast("double") / col("n").cast("double")).as("p"))
    val z = p.agg(sum(col("p")).as("z"))
    p.crossJoin(broadcast(z))
      .select(col(sourceCol), col("share"), (col("p") / col("z")).as("w"))
  }

  /** Per-domain HELLINGER² divergence between each source's unigram
    * distribution and the corpus-wide distribution — the domain-shift
    * signal a mixing pipeline thresholds to spot outlier sources (and the
    * weighting input for divergence-aware mixes). Hellinger, not KL/JS:
    * H² = ½ Σ_t (√p_t − √q_t)² needs only sqrt/div/mul — all correctly
    * rounded under IEEE 754, so both engines produce bit-identical
    * per-term doubles, where ln() (KL, JS) is implementation-defined and
    * hash-drifts.
    *
    * Scale shape: ONE shuffle aggregates (source, term) counts with
    * map-side combine to at most |S|·|V| rows; the corpus histogram and
    * the per-source totals RE-AGGREGATE that table (the token stream is
    * never re-read); the per-term join touches only terms PRESENT in the
    * source — tokens a source lacks contribute (√0 − √q)² = q, folded in
    * closed form as ½·(1 − Σ_matched q) from the exact matched-count sum,
    * so there is no |S|×|V| densification anywhere. Per-term doubles are
    * fixed-pointed (1e12) and summed as integers — partition-order-free.
    *
    * Returns (source, n_terms, tot_tokens, hellinger_sq). */
  def domainDivergence(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val counts = docs
      .select(col(sourceCol).as("source"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c_st"))
    val corpus = counts.groupBy(col("term")).agg(sum(col("c_st")).as("c_t"))
    val totC = corpus.agg(sum(col("c_t")).as("tot_c"))
    val totS = counts.groupBy(col("source")).agg(sum(col("c_st")).as("tot_s"))
    val d = sqrt(col("c_st").cast("double") / col("tot_s").cast("double")) -
      sqrt(col("c_t").cast("double") / col("tot_c").cast("double"))
    counts
      .join(corpus, Seq("term"))
      .join(broadcast(totS), Seq("source"))
      .crossJoin(broadcast(totC))
      .select(col("source"), col("tot_s"), col("tot_c"), col("c_t"),
        round(d * d * lit(1e12)).cast("long").as("h_fp12"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).cast("int").as("n_terms"),
        max(col("tot_s")).as("tot_tokens"),
        sum(col("h_fp12")).as("s_fp"),
        sum(col("c_t")).as("s_ct"),
        max(col("tot_c")).as("tot_c"))
      .select(col("source"), col("n_terms"), col("tot_tokens"),
        (lit(0.5) * (col("s_fp").cast("double") / lit(1e12)) +
          lit(0.5) * (lit(1.0) - col("s_ct").cast("double") / col("tot_c").cast("double")))
          .as("hellinger_sq"))
  }

  /** Deterministic temperature-sampled corpus. The per-doc keep
    * probability is baseFrac · w_s / share_s (capped at 1): dividing the
    * target mix weight by the input share is what actually FLATTENS the
    * corpus — small domains keep a larger fraction of themselves, and the
    * sampled output's composition converges to w_s. Expected overall
    * keep rate is exactly baseFrac (Σ share·(w/share) = Σ w = 1) until
    * the cap binds for very small domains. The keep decision is an
    * md5-derived percentile (0..9999) against the broadcast per-domain
    * threshold — the corpus is filtered in place, no shuffle. */
  def temperatureSample(docs: DataFrame, sourceCol: String, idCol: String,
                        baseFrac: Double): DataFrame = {
    val w = temperatureWeights(docs, sourceCol)
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val pct = pmod(h, lit(10000L)).cast("double")
    docs.join(broadcast(w), Seq(sourceCol))
      .filter(pct < least(lit(baseFrac) * col("w") / col("share"), lit(1.0)) * 10000d)
      .drop("w", "share")
  }

  /** Integer largest-remainder BUDGET ALLOCATION per domain — the mix
    * PLANNING step between weighting (temperatureWeights) and sampling
    * (temperatureSample): given a total document budget B, each source
    * gets base = ⌊B·w⌋ docs for integer weight w = ⌊√n_docs⌋ (the
    * sqrt-temperature shape), and the Σbase..B shortfall goes one doc
    * each to the largest remainders (ties → source name). Every step is
    * INTEGER arithmetic on exact counts — order-free, engine-exact, and
    * Σ alloc = B by construction (√ is IEEE-correctly-rounded and ⌊·⌋ is
    * exact, so even the weight is bit-identical across engines).
    *
    * Scale shape: one count shuffle to |S| rows; the total re-aggregates
    * that table and broadcasts back; the remainder rank is a window over
    * the |S|-row weight table (domain-bounded, the buildVocab reasoning —
    * never over the corpus). */
  def budgetAllocation(docs: DataFrame, sourceCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget=$budget must be >= 0")
    val w = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w_int", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val z = w.agg(sum(col("w_int")).as("z"))
    val a = w.crossJoin(broadcast(z))
      .withColumn("base", expr(s"w_int * ${budget}L div z"))
      .withColumn("rem", expr(s"w_int * ${budget}L % z"))
    val rk = Window.orderBy(col("rem").desc, col("source"))
    val leftover = Window.partitionBy()
    a.withColumn("rk", row_number().over(rk))
      .withColumn("leftover", lit(budget) - sum(col("base")).over(leftover))
      .select(col("source"), col("n_docs"), col("w_int"),
        (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L)).as("alloc"))
  }

  /** EPOCH-AWARE token-budget allocation under data constraints
    * (Muennighoff et al., NeurIPS 2023 "Scaling Data-Constrained
    * Language Models" — public result: repeating data has geometrically
    * decaying marginal value, ~worthless past a few epochs). Plans how
    * many epochs of EACH source to train on under a total token budget:
    * every (source, epoch ≤ maxEpochs) unit carries marginal value
    * density q_s · 2^−(e−1) — per-source mean quality (fp6 fixed-point,
    * the [[graft.text.TextOps.qualityScore]] scorer) halving per repeat
    * — and since a unit's density is constant per token, the greedy
    * optimum is exactly: sort ALL units by density and allocate the
    * budget prefix, the boundary unit partially. Integer-exact: the
    * ORDER key is q_fp6 · 2^(maxEpochs − e) (compares q·2^−(e−1)
    * without division), allocations are min/greatest on BIGINT counts;
    * ties break (source ASC, epoch ASC).
    *
    * Scale shape: ONE map-side-combining corpus scan aggregates
    * (Σ tokens, mean fp6 quality) per source; everything downstream is
    * MODEL-sized (#sources · maxEpochs rows) — the epoch explode, the
    * ordered cumulative-sum window (bounded by S·E, never by data), the
    * clamp. Returns (source, epoch, value_fp6, alloc_tokens) for units
    * with a positive allocation. */
  def epochMixPlan(docs: DataFrame, sourceCol: String, textCol: String,
                   stopwords: Seq[String], budget: Long,
                   maxEpochs: Int): DataFrame = {
    require(budget >= 0, s"budget=$budget must be >= 0")
    require(maxEpochs >= 1 && maxEpochs <= 16,
      s"maxEpochs=$maxEpochs out of range 1..16")
    val q6 = round(TextOps.qualityScore(col(textCol), stopwords) * 1e6)
      .cast("long")
    val src = docs
      .select(col(sourceCol).as("source"),
        TextOps.tokenCount(col(textCol)).cast("long").as("nt"), q6.as("q6"))
      .groupBy(col("source"))
      .agg(sum(col("nt")).as("toks"),
        expr("sum(q6) div count(1)").as("q_fp6"))
    val units = src
      .select(col("source"), col("toks"), col("q_fp6"),
        explode(sequence(lit(1), lit(maxEpochs))).as("epoch"))
      .withColumn("okey",
        expr(s"q_fp6 * shiftleft(CAST(1 AS BIGINT), $maxEpochs - epoch)"))
    val ord = Window.orderBy(col("okey").desc, col("source"), col("epoch"))
    units
      .withColumn("cum_before", coalesce(
        sum(col("toks")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("alloc_tokens",
        greatest(lit(0L), least(col("toks"), lit(budget) - col("cum_before"))))
      .filter(col("alloc_tokens") > 0)
      .select(col("source"), col("epoch").cast("int").as("epoch"),
        expr("q_fp6 div shiftleft(CAST(1 AS BIGINT), epoch - 1)").as("value_fp6"),
        col("alloc_tokens"))
  }

  /** Token-budget sequence packing: within each (domain, shard), walk
    * documents in id order accumulating token counts and assign each doc
    * to the bin where its cumulative count ends: bin = (cumsum − 1) ÷
    * budget. Contract: bins are contiguous id-ranges per shard and every
    * bin except the last holds ≥ budget − maxDocTokens tokens. The md5
    * shard key (`nShards`) bounds the sequential window per partition, so
    * a single giant domain cannot serialize onto one task. Integer
    * arithmetic end to end — deterministic and oracle-exact. */
  def packSequences(docs: DataFrame, sourceCol: String, idCol: String,
                    textCol: String, budget: Int, nShards: Int): DataFrame = {
    require(budget >= 1, s"budget=$budget must be >= 1")
    require(nShards >= 1, s"nShards=$nShards must be >= 1")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val shard = pmod(h, lit(nShards.toLong)).cast("int")
    val win = Window.partitionBy(col(sourceCol), col("shard"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col(sourceCol), col(idCol), shard.as("shard"),
        TextOps.tokenCount(col(textCol)).cast("long").as("n_tok"))
      .withColumn("cum_tok", sum(col("n_tok")).over(win))
      .withColumn("bin", ((col("cum_tok") - 1) / budget).cast("long"))
  }

  /** Cross-domain quality calibration: percent_rank of a (fixed-point)
    * score WITHIN each source, so one keep-threshold means the same
    * thing in every domain — raw quality scores are not comparable
    * across a code corpus and a forum corpus, their PERCENTILES are.
    *
    * Scale shape: the naive window formulation
    * (percent_rank over (partition by source)) sorts an ENTIRE source
    * in one task chain — a corpus-dominant domain serializes the job.
    * This computes the identical answer through the score HISTOGRAM:
    * one hash-aggregate to (source, score, count) rows — bounded by
    * score cardinality, never corpus size — a prefix-sum window over
    * that bounded table, and a hash join back to the corpus.
    * percent_rank = c_lt/(n−1) (ties share the rank of their first
    * peer), a single double division of exact integers — engine-exact.
    */
  def calibrateBySource(docs: DataFrame, sourceCol: String, idCol: String,
                        score: Column): DataFrame = {
    // NULL scores are EXCLUDED up front (a doc the scorer could not
    // score has no percentile) — without the explicit filter they would
    // be dropped silently by the histogram equi-join anyway, but null
    // ordering inside a percent_rank differs across engines, so the
    // operator's contract is: score first, calibrate non-null scores.
    // The scored projection is PERSISTED: it feeds both the histogram
    // aggregate and the join back, and the score expression is the
    // expensive part (the Gopher quality score runs an Aho-Corasick
    // pass over the text) — without materialization every consumer
    // re-scores the corpus. Three narrow columns per doc, the same
    // artifact a deployment writes before calibrating.
    val scored = graft.Caches.materialize(
      docs.select(col(sourceCol).as("source"), col(idCol),
          score.as("q_fp6"))
        .filter(col("q_fp6").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val hist = scored.groupBy(col("source"), col("q_fp6"))
      .agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy(col("source")).orderBy(col("q_fp6"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wtot = Window.partitionBy(col("source"))
    val cum = hist
      .withColumn("c_le", sum(col("c")).over(wcum))
      .withColumn("n", sum(col("c")).over(wtot))
      .select(col("source"), col("q_fp6"),
        (col("c_le") - col("c")).as("c_lt"), col("n"))
    scored.join(cum, Seq("source", "q_fp6"))
      .select(col(idCol), col("source"), col("q_fp6"),
        when(col("n") > 1L,
          col("c_lt").cast("double") / (col("n") - 1L).cast("double"))
          .otherwise(0.0).as("pctl"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis via
    * exponential clocks): each row draws clock t = −ln(u)/w from a
    * deterministic md5-derived uniform u ∈ (0,1], and the k SMALLEST
    * clocks are a weight-proportional sample without replacement —
    * e.g. w = token count makes every token equally likely to reach the
    * sample regardless of how documents chunk it.
    *
    * Scale shape: ONE corpus scan and NO shuffle — the global k-smallest
    * selection is TakeOrderedAndProject (per-partition bounded heaps,
    * driver merges k·P candidate rows), the same plan as q_topk. This is
    * the distributed one-pass weighted reservoir: at 100 TB there is no
    * per-key state, no window, no sort of the corpus.
    *
    * Determinism: u = (h+1)/2^60 from the 60-bit md5 prefix — a
    * power-of-two scaling, so the double rounding is identical IEEE in
    * any engine. ln() may drift by an ulp across libms, so clocks are
    * fixed-pointed at 1e9 and ties break by id: a selection flip would
    * need two clocks within both an ulp AND a rounding boundary. Rows
    * with w <= 0 are excluded (they can never be sampled). */
  def weightedSample(docs: DataFrame, idCol: String, weight: Column,
                     k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val u = (h + lit(1L)).cast("double") / lit(1152921504606846976.0) // 2^60
    val w = weight.cast("double")
    // the when() guard keeps the division off w <= 0 rows (ANSI divide-
    // by-zero) — those rows are unsampleable and filtered out anyway
    val clock = when(w > 0d, round(-log(u) / w * lit(1e9)).cast("long"))
    docs
      .select(col(idCol), w.as("w"), clock.as("clock_fp9"))
      .filter(col("w") > 0d)
      .orderBy(col("clock_fp9"), col(idCol))
      .limit(k)
  }

  /** DSIR-style importance weighting (Xie et al., NeurIPS 2023, "Data
    * Selection for Language Models via Importance Resampling",
    * arXiv:2302.03169): score every document by how much more its
    * hashed-bigram feature profile resembles a TARGET slice than the raw
    * corpus, then select the top-K — the data-selection step that builds
    * a domain-matched pretraining subset from a web-scale crawl. The
    * published estimator weights feature f by log p̂_t(f) − log p̂_r(f);
    * this operator uses the Laplace-smoothed PROBABILITY CONTRAST
    * p̂_t(f) − p̂_r(f) at fixed-point 1e9 — same selection signal shape,
    * but transcendental-free, so the whole contract is exact integer
    * arithmetic end to end and survives the cross-engine hash gate
    * (round-9 lesson: libm `ln` is not portable across oracle builds).
    *
    * Scale shape: features hash into a FIXED space of `nBuckets` ids
    * (md5 — engine-portable, unlike murmur3), so both distribution
    * tables are O(nBuckets) rows regardless of corpus size and ride as
    * broadcasts; the corpus token stream is expanded in-row (the
    * codegen'd sequence→element_at bigram pattern, no shuffle) and
    * aggregated ONCE to the doc×bucket profile, which feeds counting and
    * scoring off a single persisted artifact (`Caches.materialize`).
    * Selection is a TakeOrderedAndProject top-K (bounded partial top-k,
    * never a global window) whose K ids broadcast back for the flag.
    *
    * Numeric discipline: the ×1e9 numerators are promoted to
    * DECIMAL(38,0) before the multiply — exact base-10 arithmetic, no
    * BIGINT overflow even at 100 TB token totals (the oracle mirrors via
    * HUGEINT intermediates; both floor-divide nonnegative operands, so
    * `div` ≡ `//`). Per-doc scores are Σ n·w_fp with n ≤ doc tokens and
    * |w_fp| ≤ 1e9 — BIGINT-safe for any document under ~9e9 tokens. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, nBuckets: Int, topK: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets=$nBuckets must be >= 1")
    require(topK >= 1, s"topK=$topK must be >= 1")
    val feats = docs
      .select(col(idCol).as("id"), targetPred.as("is_target"),
        TextOps.tokens(col(textCol)).as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("id"), col("is_target"), col("tk"),
        explode(sequence(lit(1), size(col("tk")) - 1)).as("i"))
      .select(col("id"), col("is_target"),
        (conv(substring(md5(concat_ws(" ",
            element_at(col("tk"), col("i")),
            element_at(col("tk"), col("i") + 1))), 1, 15), 16, 10)
          .cast("long") % nBuckets).as("feat"))
    val docFeat = graft.Caches.materialize(
      feats.groupBy(col("id"), col("is_target"), col("feat"))
        .agg(count(lit(1)).as("n"))
        .persist())
    val dist = docFeat.groupBy(col("feat"))
      .agg(sum(col("n")).as("c_r"),
        sum(when(col("is_target"), col("n")).otherwise(0L)).as("c_t"))
    val tot = dist.agg(sum(col("c_r")).as("tot_r"), sum(col("c_t")).as("tot_t"))
    val w = dist.crossJoin(broadcast(tot))
      .select(col("feat"),
        (expr(s"CAST(c_t + 1 AS DECIMAL(38,0)) * ${Fp9}L div (tot_t + ${nBuckets}L)") -
          expr(s"CAST(c_r + 1 AS DECIMAL(38,0)) * ${Fp9}L div (tot_r + ${nBuckets}L)"))
          .as("w_fp"))
    val scored = docFeat.join(broadcast(w), "feat")
      .groupBy(col("id"))
      .agg(sum(col("n")).as("n_bigrams"),
        sum(col("n") * col("w_fp")).as("score_fp"))
    val top = scored.orderBy(col("score_fp").desc, col("id")).limit(topK)
      .select(col("id").as("sel_id"))
    scored.join(broadcast(top), scored("id") === top("sel_id"), "left")
      .select(col("id"), col("n_bigrams"), col("score_fp"),
        col("sel_id").isNotNull.as("selected"))
  }

  private val Fp9 = 1000000000L

  /** PACKING-EFFICIENCY report over [[packSequences]] output — the
    * acceptance check of the sequence-packing stage: per (domain,
    * shard, bin), document count, token fill, and fill permille against
    * the budget, with the per-(domain, shard) LAST bin flagged (the one
    * bin that is legitimately underfull; any OTHER underfull bin is a
    * packing bug — the invariant the operator's contract guarantees and
    * this report lets a pipeline assert in production).
    *
    * Scale shape: one aggregation collapses the per-doc packing table
    * to O(total_tokens / budget) bin rows; the last-bin flag is a max
    * window over THAT bin table partitioned by (domain, shard) —
    * bounded by bins per shard, never corpus size. Integer end to end. */
  def packingEfficiency(docs: DataFrame, sourceCol: String, idCol: String,
                        textCol: String, budget: Int, nShards: Int): DataFrame = {
    val packed = packSequences(docs, sourceCol, idCol, textCol, budget, nShards)
    val bins = packed.groupBy(col(sourceCol), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tokens"))
    bins
      .withColumn("max_bin",
        max(col("bin")).over(Window.partitionBy(col(sourceCol), col("shard"))))
      .select(col(sourceCol), col("shard"), col("bin"), col("n_docs"),
        col("bin_tokens"),
        expr(s"(1000 * bin_tokens) div ${budget}L").as("fill_permille"),
        (col("bin") === col("max_bin")).as("is_last"))
  }

  /** SOURCE-CONCENTRATION REPORT — the one-row diversity summary behind
    * "is this corpus one mirror site in a trench coat": max source share,
    * the effective number of sources 1/Σsᵢ² (inverse Herfindahl — the
    * participation-ratio form of diversity), and the Gini coefficient of
    * the source-size distribution, all in integer permille. A corpus
    * whose effective-source count collapses toward 1 or whose Gini runs
    * toward 1000 trains like a single-source corpus no matter how many
    * source labels it carries — the aggregate form of what the X157
    * overlap matrix shows pairwise.
    *
    * Engine-exact integer contracts (no doubles anywhere):
    *   - eff_sources_permille = 1000·N² div Σnᵢ², computed in
    *     DECIMAL(38,0) (oracle: HUGEINT) because N² wraps BIGINT past
    *     N ≈ 3·10⁹ documents — the X160 promotion discipline;
    *   - gini_permille via the sorted-rank identity
    *     G = (2·Σ i·n₍ᵢ₎ − (S+1)·N) / (S·N) with i = ascending rank —
    *     ties in n are rank-order-invariant for the sum, so any
    *     deterministic tiebreak yields the same value; the rank window
    *     runs over the O(#sources) count table, never the corpus.
    *
    * ONE corpus scan to the O(#sources) count table; everything after is
    * arithmetic on that table. Returns a single row (n_docs, n_sources,
    * max_n, max_share_permille, eff_sources_permille, gini_permille). */
  /** CURRICULUM PHASE ASSIGNMENT (Bengio et al. 2009 curriculum
    * learning, the data-ordering half): every document gets a training
    * phase 1..`phases` by EXACT population quantile of its difficulty
    * score (ties → smaller id) — phase = ⌊(rank−1)·phases/n⌋ + 1, the
    * easy-to-hard schedule a curriculum sampler consumes. The exact
    * global rank runs through [[graft.dedup.Dedup.globalRankByKey]]
    * (range exchange + per-partition row_number + width-bounded
    * offsets — never a single-partition window over the corpus), with
    * a broadcast 1-row total; the rfm-quintile pattern applied to the
    * corpus itself. Integer-exact, output corpus-sized. */
  def curriculumPhases(docs: DataFrame, idCol: String, scoreCol: String,
                       phases: Int): DataFrame = {
    require(phases >= 2 && phases <= 100, s"phases=$phases out of range 2..100")
    val ranked = graft.dedup.Dedup.globalRankByKey(
      docs.select(col(idCol).as("id"), col(scoreCol).as("k")))
    val total = docs.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(total))
      .select(col("id"), col("k").as("score"),
        (expr(s"((r - 1) * $phases) div n") + 1).cast("int").as("phase"))
  }

  def sourceBalance(docs: DataFrame, keyCol: String): DataFrame = {
    val per = docs.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("n"))
    val ranked = per.select(col("n"),
      row_number().over(Window.orderBy(col("n"), col("k"))).as("i"))
    ranked.agg(
        sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        max(col("n")).as("max_n"),
        sum(col("n").cast("decimal(38,0)") * col("n")).as("sum_n_sq"),
        sum(col("i").cast("decimal(38,0)") * col("n")).as("sum_rank_n"))
      .select(col("n_docs"), col("n_sources"), col("max_n"),
        expr("(1000 * max_n) div n_docs").as("max_share_permille"),
        expr("CAST((1000 * CAST(n_docs AS DECIMAL(38,0)) * n_docs) div sum_n_sq AS BIGINT)")
          .as("eff_sources_permille"),
        expr("""CAST((1000 * (2 * sum_rank_n - (n_sources + 1) * CAST(n_docs AS DECIMAL(38,0))))
               |     div (CAST(n_sources AS DECIMAL(38,0)) * n_docs) AS BIGINT)""".stripMargin)
          .as("gini_permille"))
  }
}
