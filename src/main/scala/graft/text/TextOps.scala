package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, n-gram heuristic language-ID, and
  * document fingerprinting. All pure Column expressions (whole-stage
  * codegen, no UDFs) — they scale linearly with the scan and never
  * shuffle on their own.
  */
object TextOps {

  /** Whitespace tokenization. `split` with an unbounded limit matches
    * DuckDB/Postgres `string_split` semantics (trailing empties kept). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of tokens that appear in `vocab` (higher-order `filter`, stays
    * in codegen — no UDF). */
  def vocabHits(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(vocab: _*)))

  /** Fixed-size overlapping token windows — the passage "chunking" every
    * RAG / pretraining pipeline runs before embedding or packing. One
    * chunk starts every `size - overlap` tokens; each holds up to `size`
    * tokens rejoined with single spaces. A pure in-row expression
    * (sequence → transform → slice): chunking parallelizes with the scan
    * and never shuffles. Returns array<struct<chunk_text, n_tok>> in
    * chunk order; empty-token docs yield a single chunk of their raw
    * text's tokens (consistent with whitespace-split semantics).
    */
  def chunks(text: Column, size: Int, overlap: Int): Column = {
    require(size >= 1, s"size=$size must be >= 1")
    require(overlap >= 0 && overlap < size, s"overlap=$overlap must be in [0, size)")
    val stride = size - overlap
    val toks = tokens(text)
    transform(
      sequence(lit(1), greatest(org.apache.spark.sql.functions.size(toks), lit(1)), lit(stride)),
      s => {
        val piece = slice(toks, s, lit(size))
        struct(
          concat_ws(" ", piece).as("chunk_text"),
          org.apache.spark.sql.functions.size(piece).as("n_tok"))
      })
  }

  /** LIX READABILITY report per group (Björnsson 1968 — the classic
    * transcendental-free readability index: LIX = words/sentences +
    * 100·longwords/words, longword = more than 6 characters): exact
    * per-document counts summed per group, with the index reported as
    * an integer ×100 derived from the sums by truncating division —
    * the aggregate readability of the group's corpus, order-free and
    * engine-exact. A document with no terminal punctuation counts as
    * ONE sentence (the max(1, terminator-runs) rule), so token-stream
    * corpora don't divide by zero.
    *
    * Scale shape: pure codegen per-row counts on the scan, ONE
    * map-side-combining aggregate to the #groups-sized report. */
  def lixReport(docs: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val toks = filter(tokens(col(textCol)), t => length(t) > 0)
    docs.select(col(groupCol),
        size(toks).cast("long").as("w"),
        greatest(regexp_count(col(textCol), lit("[.!?]+")), lit(1))
          .cast("long").as("s"),
        size(filter(tokens(col(textCol)), t => length(t) > 6))
          .cast("long").as("lw"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("s")).as("n_sentences"), sum(col("lw")).as("n_longwords"))
      .select(col(groupCol), col("n_docs"), col("n_words"),
        col("n_sentences"), col("n_longwords"),
        // a words-free group has no readability — NULL, never div-0
        when(col("n_words") > 0,
          expr("(100 * n_words) div n_sentences + (10000 * n_longwords) div n_words"))
          .as("lix_x100"))
  }

  /** RAKE keyword scoring (Rose et al. 2010 "Automatic Keyword
    * Extraction from Individual Documents"): candidate phrases are the
    * maximal runs between stopwords and punctuation; every word scores
    * freq (occurrences) and degree (summed length of its phrases —
    * co-occurrence mass including itself), and RAKE's keyword metric is
    * degree/freq — words living in long content phrases outrank evenly
    * scattered ones. Reported as exact integer permille.
    *
    * Portability: non-letter runs become the delimiter FIRST (so the
    * stopword pass sees only `[a-z ]`), then stopwords fall to the same
    * delimiter via an ASCII `\b` alternation — identical semantics in
    * Java regex and RE2 (both define `\b` on `[A-Za-z0-9_]`; the input
    * alphabet here is already reduced to letters). Scale shape: two
    * codegen regex passes + one explode on the scan, ONE word-keyed
    * map-side-combining aggregate; output is vocabulary-sized. */
  def rakeWordScores(docs: DataFrame, textCol: String,
                     stopwords: Seq[String]): DataFrame = {
    require(stopwords.nonEmpty && stopwords.forall(_.matches("[a-z]+")),
      "stopwords must be lowercase ASCII words (they enter a regex alternation)")
    val delim = regexp_replace(lower(col(textCol)), "[^a-z ]+", ".")
    val stopped = regexp_replace(delim,
      "\\b(" + stopwords.mkString("|") + ")\\b", ".")
    docs.select(explode(split(stopped, "\\.")).as("phrase"))
      .select(filter(split(col("phrase"), " +"), t => length(t) > 0).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(explode(col("ws")).as("word"),
        size(col("ws")).cast("long").as("plen"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("degree"))
      .select(col("word"), col("freq"), col("degree"),
        expr("(1000 * degree) div freq").as("score_permille"))
  }

  /** LUHN CHECKSUM validation (ISO/IEC 7812 mod-10 — the card-number
    * / account-id checksum every PII scrubbing fleet validates
    * candidates against before redacting): from the RIGHT, every
    * second digit doubles (minus 9 past 9), and the total must divide
    * by 10. Pure Column HOF over the digit string — the per-digit
    * lambda is interpreted (the HOF rule), but candidates are ≤19
    * chars so the work is bounded per row; no UDF, engine-portable
    * (same reverse/substring/aggregate semantics in DuckDB's
    * list_transform mirror). NULL-safe: a NULL candidate yields NULL;
    * a MALFORMED candidate (empty, or any non-digit char — whose digit
    * cast would otherwise null-poison the aggregate sum) reads as
    * false via an explicit all-digits guard, so a fleet can feed raw
    * extractor output without a pre-filter. */
  def luhnValid(num: Column): Column = {
    val rev = reverse(num)
    def digitAt(i: Column): Column =
      substring(rev, i, lit(1)).cast("int")
    def term(i: Column): Column = when(i % 2 === 0,
        when(digitAt(i) * 2 > 9, digitAt(i) * 2 - 9).otherwise(digitAt(i) * 2))
      .otherwise(digitAt(i))
    num.rlike("^[0-9]+$") &&
      aggregate(sequence(lit(1), length(num)), lit(0),
        (acc, i) => acc + term(i)) % 10 === 0
  }

  /** Normalization pass upstream of tokenization/dedup: control chars
    * become spaces, everything lowercases, space runs collapse, ends
    * trim. Control chars are mapped to spaces FIRST so the collapse step
    * only ever sees literal spaces — that keeps the regex engine-portable
    * (no \s class differences across engines). Pure codegen expressions,
    * scan-linear. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "\\p{Cntrl}", " "), " +", " "))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Mean token length (characters, excluding separators). */
  def avgTokenLen(text: Column): Column =
    when(tokenCount(text) > 0,
      length(regexp_replace(text, " ", "")).cast("double") / tokenCount(text))
      .otherwise(lit(0.0))

  /** Small multilingual stopword lists for the heuristic language scorer.
    * Deliberately tiny — the point is the distributed scoring shape
    * (per-language vocab-hit counts + deterministic argmax), not lexicon
    * quality; swap lists freely.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "pas"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "que", "por", "con", "para"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Heuristic language-ID: per-language stopword-hit counts, argmax with a
    * fixed priority order on ties, 'und' when nothing matches. One pass
    * over the token array per language — no shuffle, no UDF.
    */
  def langId(text: Column): Column = {
    val scores = Stopwords.map { case (lang, words) => lang -> vocabHits(text, words) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(best > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Composite quality score in [0,1]: length sweet-spot, stopword
    * presence, penalty for punctuation soup. Deterministic arithmetic only
    * (single divisions of exact counts) so it is oracle-safe.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text)
    val lenOk = when(nTok.between(20, 1000), lit(1.0)).otherwise(lit(0.0))
    val stopRatio = when(nTok > 0, vocabHits(text, stopwords).cast("double") / nTok).otherwise(lit(0.0))
    val punct = punctRatio(text)
    (lenOk * 0.4) + least(stopRatio * lit(4.0), lit(1.0)) * 0.4 + (lit(1.0) - punct) * 0.2
  }

  /** Document fingerprint: md5 of whitespace-normalized, lowercased text —
    * the exact-dedup / content-address key. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Composed quality FILTER decision (the Gopher-rules shape, Rae et al.
    * arXiv:2112.11446 §A1.1 — public method): rules fire in a fixed order
    * and the FIRST failure becomes the audit `reason`; NULL means keep.
    * This is the decision step the per-signal metrics feed — length
    * bounds, punctuation-soup bound, top-bigram repetition bound,
    * stopword presence — as one codegen when-chain, scan-linear, no
    * shuffle. Thresholds are knobs; a doc below `minTok` short-circuits
    * before the n-gram rule, so the NULL topNgramFrac of tiny docs never
    * reaches a comparison. */
  def gopherReason(text: Column, stopwords: Seq[String],
                   minTok: Int = 20, maxTok: Int = 1000,
                   maxPunct: Double = 0.2, maxTop2: Double = 0.08): Column = {
    val n = tokenCount(text)
    when(n < minTok, lit("too_short"))
      .when(n > maxTok, lit("too_long"))
      .when(punctRatio(text) > maxPunct, lit("punct_soup"))
      .when(topNgramFrac(text, 2) > maxTop2, lit("repetition"))
      .when(vocabHits(text, stopwords) === 0, lit("no_stopwords"))
  }

  /** BPE-ish regex tokenization: counts of maximal runs per character
    * class (letters / digits / other-non-space) — the pre-tokenizer split
    * most BPE vocabularies apply before merges. Pure regexp builtins,
    * whole-stage codegen. */
  def regexTokenCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit("[A-Za-z]+"), lit(0))),
    size(regexp_extract_all(text, lit("[0-9]+"), lit(0))),
    size(regexp_extract_all(text, lit("[^A-Za-z0-9 ]+"), lit(0))))

  /** Non-distinct word n-gram array (keeps duplicates — repetition
    * metrics need multiplicity, unlike the dedup shingle set). Docs with
    * < n tokens yield an empty array. */
  def ngramArray(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Fraction of the doc's n-grams taken by its single most frequent
    * n-gram — the "top n-gram fraction" repetition filter of large-corpus
    * quality pipelines (Rae et al., Gopher, arXiv:2112.11446 §A1.1 —
    * public method). NULL for docs with no n-grams.
    *
    * Computed as sort + one linear run-length fold, NOT the textbook
    * `transform(array_distinct(g), x -> size(filter(g, y -> y = x)))`:
    * Catalyst inlines `g`'s construction into the inner lambda, so the
    * nested form re-tokenizes the document PER DISTINCT N-GRAM —
    * O(distinct·total) with a large constant. ProjectExec's
    * subexpression elimination masks that in a projection, but the same
    * expression pushed down as a FILTER predicate (quality gates do
    * exactly this) re-evaluates in full — measured 25 ms/row vs 0.02 at
    * 300 tokens. The fold's max run over the sorted array is the same
    * integer max multiplicity, in O(n log n) once per row in ANY
    * operator context. */
  def topNgramFrac(text: Column, n: Int): Column = {
    val g = ngramArray(text, n)
    val folded = aggregate(
      array_sort(g),
      struct(lit(null).cast("string").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(acc("prev").isNotNull && acc("prev") === x, acc("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      })
    when(size(g) > 0, folded("best").cast("double") / size(g))
  }

  /** Fraction of tokens that are repeats of an earlier token
    * (1 − distinct/total) — the duplicate-token repetition signal. NULL
    * for empty docs. */
  def dupTokenFrac(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Rolling-hash document fingerprint (winnowing-style, Schleimer et al.
    * SIGMOD'03): hash every `w`-token window, keep the minimum — robust to
    * local edits, unlike the whole-document md5. Docs shorter than `w`
    * tokens fall back to the plain md5. */
  def winnowFingerprint(text: Column, w: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= w,
      array_min(transform(
        sequence(lit(1), size(toks) - (w - 1)),
        i => md5(concat_ws(" ", slice(toks, i, lit(w)))))))
      .otherwise(md5(text))
  }

  /** PII scrub patterns. Deliberately alternation-free so Java (Spark)
    * and RE2 (DuckDB, and most scrubbing fleets) agree on every match:
    * RE2 is leftmost-LONGEST across alternatives while Java backtracking
    * is leftmost-FIRST, so a portable scrubber avoids `|` inside a
    * pattern; plain greedy quantifiers agree between the engines. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Per-document PII hit counts (email, phone, IPv4) over the raw text —
    * the audit side of the scrub, counted before redaction. */
  def piiCounts(text: Column): (Column, Column, Column) = (
    regexp_count(text, lit(EmailRe)),
    regexp_count(text, lit(PhoneRe)),
    regexp_count(text, lit(Ipv4Re)))

  /** Redact PII in place: emails, then phones, then IPv4 literals (the
    * order is part of the contract — earlier passes cannot manufacture
    * later patterns because the replacement tokens contain no digits).
    * Pure codegen regexp over the scan; linear, never shuffles. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** HEAPS'-LAW vocabulary-growth curve — the companion diagnostic to
    * the Zipf slope (X153): distinct-vocabulary size as a function of
    * cumulative corpus size at `nCheckpoints` evenly spaced doc-id
    * checkpoints. Natural corpora grow V ≈ K·nᵝ with β ≈ 0.4–0.6; a
    * curve that flattens early means a TEMPLATED/boilerplate corpus
    * (new docs add no new words — generation or dedup failure
    * upstream), a near-linear curve means noise/IDs flooding the vocab.
    *
    * Scale shape: ONE exchange to the O(V) first-occurrence table
    * (`groupBy(token).min(docId)` — the same model-sized table as
    * q_vocab_build), then the checkpoint table (nCheckpoints rows,
    * derived from one max(id) scalar) broadcasts into both
    * checkpoint-assignment cross joins, whose map-side partials
    * collapse to nCheckpoints rows per partition before their
    * aggregates (the q_quality_pr shape). The corpus is scanned twice
    * (token explode + per-doc token counts), never shuffled whole.
    *
    * Contract: all columns are exact BIGINT counts — cumulative docs,
    * cumulative tokens, and cumulative vocab below each checkpoint
    * bound (checkpoint k covers doc_id < k·(max_id+1) div nCheckpoints,
    * so the last checkpoint covers the whole corpus). */
  def vocabGrowth(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String,
                  nCheckpoints: Int = 10): org.apache.spark.sql.DataFrame = {
    require(nCheckpoints >= 1, s"nCheckpoints=$nCheckpoints must be >= 1")
    val sess = docs.sparkSession
    val bound = docs.agg((max(col(idCol)) + 1L).as("bound"))
    val cps = sess.range(1, nCheckpoints + 1L).toDF("cp_idx")
      .crossJoin(bound)
      .select(col("cp_idx"),
        expr(s"cp_idx * bound div $nCheckpoints").as("cp_doc_bound"))
    val first = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
    val vocabAt = first.crossJoin(broadcast(cps))
      .filter(col("first_doc") < col("cp_doc_bound"))
      .groupBy(col("cp_idx")).agg(count(lit(1)).as("n_vocab"))
    val docsAt = docs
      .select(col(idCol).as("doc_id"), tokenCount(col(textCol)).cast("long").as("n_tok"))
      .crossJoin(broadcast(cps))
      .filter(col("doc_id") < col("cp_doc_bound"))
      .groupBy(col("cp_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    cps.join(docsAt, Seq("cp_idx"), "left")
      .join(vocabAt, Seq("cp_idx"), "left")
      .select(col("cp_idx"), col("cp_doc_bound"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_vocab"), lit(0L)).as("n_vocab"))
  }

  /** Per-document Shannon CHARACTER ENTROPY in fixed-point nano-nats —
    * the gibberish/low-diversity filter (keyboard mash has near-zero
    * entropy per char class; base64 blobs near-max): using
    * H = ln(n) − (Σ c·ln(c))/n over the per-char counts c, so the only
    * non-integer steps are ln of INTEGER arguments, each fixed-pointed
    * at 1e9, and one truncating `div` — deterministic WITHIN one engine
    * build, but NOT a cross-engine contract (see the return note).
    *
    * Scale shape: entirely IN-ROW, zero exchange — sort the doc's chars
    * (order is irrelevant to entropy; any total order groups equals),
    * run-starts via one `filter` pass, run lengths by adjacent
    * difference, Σ c·lnfp(c) via one `aggregate` pass. Every
    * intermediate array is STAGED as a column (the q_cdc_dedup lesson:
    * splicing trees into lambdas re-evaluates them per element).
    * Precondition: ASCII-ish text (split("") is per code unit).
    *
    * Returns (doc_id, n_chars, n_uniq, hist_fp, h_fp9); empty docs are
    * dropped. `hist_fp` = Σ cnt·h31(c) (h31 = md5-60-bit-prefix mod 2³¹)
    * is the order-free EXACT-INTEGER histogram checksum — the portable
    * oracle contract (any engine with md5 + integer ops reproduces it
    * bit-for-bit). `h_fp9` is the entropy itself and is a DERIVED DISPLAY
    * value: libm `ln` is not required to be correctly rounded by IEEE 754,
    * so round(ln(k)·1e9) can differ by a digit across engine builds — it
    * must never re-enter a cross-engine hash gate (round-9 lesson). */
  def charEntropyFp9(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String): org.apache.spark.sql.DataFrame = {
    def lnFp9(x: Column): Column = round(log(x.cast("double")) * 1e9).cast("long")
    def h31(c: Column): Column =
      conv(substring(md5(encode(c, "UTF-8")), 1, 15), 16, 10).cast("long") %
        2147483648L
    docs.filter(length(col(textCol)) > 0)
      .select(col(idCol).as("doc_id"),
        array_sort(split(col(textCol), "")).as("s"))
      .select(col("doc_id"), col("s"), size(col("s")).as("n"),
        // 1-based start position of every run of equal chars (the Or
        // short-circuits, so element_at never sees index 0)
        filter(sequence(lit(1), size(col("s"))), i =>
          i === 1 || element_at(col("s"), i) =!= element_at(col("s"), i - 1))
          .as("bpos"))
      .select(col("doc_id"), col("n"), size(col("bpos")).as("n_uniq"),
        transform(col("bpos"), (b, j) =>
          when(j === size(col("bpos")) - 1, col("n") + 1)
            .otherwise(element_at(col("bpos"), j + 2)) - b).as("counts"),
        transform(col("bpos"), b => element_at(col("s"), b)).as("chars"))
      .select(col("doc_id"), col("n"), col("n_uniq"),
        aggregate(zip_with(col("counts"), col("chars"),
            (c, ch) => c.cast("long") * h31(ch)),
          lit(0L), (acc, x) => acc + x).as("hist_fp"),
        aggregate(col("counts"), lit(0L),
          (acc, c) => acc + c.cast("long") * lnFp9(c)).as("sclnc"))
      .select(col("doc_id"), col("n").as("n_chars"), col("n_uniq"),
        col("hist_fp"), (lnFp9(col("n")) - expr("sclnc div n")).as("h_fp9"))
  }

  /** T5/UL2-style SPAN-CORRUPTION mask PLAN (Raffel et al., JMLR 2020
    * §3.1.4 "span corruption"): per document, deterministically select
    * corruption spans — a span starts at token position p iff
    * md5(id:p) ≡ 0 (mod `startMod`) (expected start rate 1/startMod)
    * with length 1 + md5(id:p:len) mod `maxLen` (uniform 1..maxLen) —
    * then merge overlaps into the interval UNION and report the mask
    * accounting the objective-preprocessing stage needs (span count,
    * masked-token count, mask permille). md5-derived, so the plan is
    * reproducible across runs/partitionings/engines — the same property
    * every sampling operator here leans on — and mirrored exactly by
    * the DuckDB oracle.
    *
    * Scale shape: position explode is scan-linear (one row per token,
    * the token-explode cost every text operator pays) and immediately
    * filtered to ~n/startMod span rows; the interval-union windows
    * partition by DOCUMENT — bounded by a single doc's span count
    * (maxDocTokens/startMod), never by the corpus. Docs with no
    * selected span still report (zeros). All integer arithmetic. */
  def spanCorruptionPlan(docs: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, startMod: Int = 20,
                         maxLen: Int = 5): org.apache.spark.sql.DataFrame = {
    require(startMod >= 1 && maxLen >= 1,
      s"startMod=$startMod and maxLen=$maxLen must be >= 1")
    import org.apache.spark.sql.expressions.Window
    def h(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val toks = docs.select(col(idCol).as("id"),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1)
    val key = concat(col("id").cast("string"), lit(":"), col("p").cast("string"))
    val starts = toks
      .select(col("id"), col("n_tokens"),
        explode(sequence(lit(1L), col("n_tokens"))).as("p"))
      .filter(h(key) % startMod === 0)
      .withColumn("len", lit(1L) + h(concat(key, lit(":len"))) % maxLen)
      .withColumn("e", least(col("p") + col("len") - 1L, col("n_tokens")))
    val wPrev = Window.partitionBy(col("id")).orderBy(col("p"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col("id")).orderBy(col("p"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDoc = starts
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("nf", when(col("pmax").isNull || col("p") > col("pmax"), 1L)
        .otherwise(0L))
      .withColumn("grp", sum(col("nf")).over(wCum))
      .groupBy(col("id"), col("grp"))
      .agg(min(col("p")).as("s"), max(col("e")).as("e2"),
        count(lit(1)).as("nraw"))
      .groupBy(col("id"))
      .agg(sum(col("nraw")).as("n_spans_raw"), count(lit(1)).as("n_spans"),
        sum(col("e2") - col("s") + 1L).as("n_masked"))
    toks.join(perDoc, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_spans_raw"), lit(0L)).as("n_spans_raw"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_masked"), lit(0L)).as("n_masked"))
      .withColumn("mask_permille", expr("(1000 * n_masked) div n_tokens"))
  }

  /** CHARACTER-CLASS MIX per language — the script-detection proxy
    * behind mojibake / wrong-alphabet / encoding-damage triage in a
    * multilingual corpus (a "French" shard whose letter share collapses
    * or whose 'other' share spikes is mislabeled or corrupted; in a
    * full-Unicode deployment the classes are per-script ranges —
    * Latin/Cyrillic/CJK — via the same regex seam). Each class is a
    * (name, regex) pair and classes may overlap (vowels ⊂ letters is a
    * legitimate probe); counts come from the codegen'd
    * `length − length(regexp_replace(class, ''))` identity — no explode
    * of characters, no UDF.
    *
    * Scale shape: the per-class counts are computed per document BEFORE
    * the explode (the explode multiplies rows by the constant #classes,
    * not by text length), and ONE hash-aggregate collapses to
    * #langs × #classes rows; per-language totals ride the same
    * aggregate (each doc contributes its length once per class, so
    * sum(len) within a (lang, class) group IS the language total).
    * All-integer — engine-exact.
    *
    * Returns (lang, char_class, n_docs, lang_chars, class_chars,
    * share_permille) ordered by (lang, char_class). */
  def scriptMix(docs: DataFrame, textCol: String, langCol: String,
                classes: Seq[(String, String)]): DataFrame = {
    require(classes.nonEmpty, "scriptMix: at least one character class")
    val len = length(col(textCol)).cast("long")
    val cls = classes.map { case (name, re) =>
      struct(lit(name).as("cname"),
        (len - length(regexp_replace(col(textCol), re, ""))).cast("long")
          .as("cnt"))
    }
    docs.select(col(langCol).as("lang"), len.as("len"),
        explode(array(cls: _*)).as("c"))
      .groupBy(col("lang"), col("c.cname").as("char_class"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("len")).as("lang_chars"),
        sum(col("c.cnt")).as("class_chars"))
      .select(col("lang"), col("char_class"), col("n_docs"),
        col("lang_chars"), col("class_chars"),
        expr("(1000 * class_chars) div lang_chars").as("share_permille"))
      .orderBy(col("lang"), col("char_class"))
  }

  /** FILTER-CHAIN ATTRITION FUNNEL — the acceptance report every
    * production cleaning pipeline publishes before a training run (the
    * C4/FineWeb "how many documents did each filter remove, in order"
    * table): five fixed-order stages (min token count, max char length,
    * chars-per-token band, allowed-language set, substring blocklist),
    * each row carrying docs-in, docs-kept, docs-removed and the
    * CUMULATIVE keep rate in integer permille. The ordering matters —
    * a document is charged to the FIRST stage that drops it, which is
    * how attrition is attributed when filters overlap.
    *
    * Scale shape: ONE corpus scan computes the five per-doc booleans;
    * the cumulative conjunction counts fuse into a single hash-aggregate
    * to ONE row (map-side partials collapse to one row per partition —
    * the X151 threshold-sweep reasoning), and the five-row funnel table
    * is unpacked from that row in-row (explode of a literal-shaped
    * array; no second scan, no joins). All-integer arithmetic —
    * engine-exact under any partitioning.
    *
    * Returns (stage, rule, docs_in, docs_kept, docs_removed,
    * keep_permille) ordered by stage. */
  def filterFunnel(docs: DataFrame, textCol: String, charsCol: String,
                   langCol: String, minTokens: Int, maxChars: Int,
                   cptLo: Int, cptHi: Int, allowedLangs: Seq[String],
                   blockTerm: String): DataFrame = {
    val ntok = tokenCount(col(textCol)).cast("long")
    val cpt = expr(s"(1000 * $charsCol) div __ntok")
    val base = docs
      .select(col(textCol), col(charsCol), col(langCol), ntok.as("__ntok"))
      .select(
        (col("__ntok") >= minTokens).as("b1"),
        (col(charsCol) <= maxChars).as("b2"),
        (cpt >= cptLo && cpt <= cptHi).as("b3"),
        col(langCol).isin(allowedLangs: _*).as("b4"),
        (!col(textCol).contains(blockTerm)).as("b5"))
    val one = base.agg(
      count(lit(1)).as("c0"),
      sum(when(col("b1"), 1L).otherwise(0L)).as("c1"),
      sum(when(col("b1") && col("b2"), 1L).otherwise(0L)).as("c2"),
      sum(when(col("b1") && col("b2") && col("b3"), 1L).otherwise(0L)).as("c3"),
      sum(when(col("b1") && col("b2") && col("b3") && col("b4"), 1L)
        .otherwise(0L)).as("c4"),
      sum(when(col("b1") && col("b2") && col("b3") && col("b4") && col("b5"), 1L)
        .otherwise(0L)).as("c5"))
    def st(i: Int, rule: String, in: String, kept: String) =
      struct(lit(i).as("stage"), lit(rule).as("rule"),
        col(in).as("docs_in"), col(kept).as("docs_kept"))
    one.select(col("c0"),
        explode(array(
          st(1, "min_tokens", "c0", "c1"),
          st(2, "max_chars", "c1", "c2"),
          st(3, "chars_per_token", "c2", "c3"),
          st(4, "lang_allowed", "c3", "c4"),
          st(5, "blocklist", "c4", "c5"))).as("r"))
      .select(col("r.stage").as("stage"), col("r.rule").as("rule"),
        col("r.docs_in").as("docs_in"), col("r.docs_kept").as("docs_kept"),
        (col("r.docs_in") - col("r.docs_kept")).as("docs_removed"),
        expr("(1000 * r.docs_kept) div c0").as("keep_permille"))
      .orderBy(col("stage"))
  }
}
