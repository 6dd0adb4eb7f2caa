package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Cross-engine portability pre-flight for the oracle hash gate.
  *
  * Round 9 shipped three rows that were rows+schema green locally and
  * hash-red on the driver. The classes of contract that break across
  * engine builds are known in advance:
  *   - transcendentals (libm `ln`/`exp` are NOT required to be correctly
  *     rounded by IEEE 754 — fixed-pointing after one turns an ulp into
  *     a flipped digit),
  *   - DuckDB HUGEINT outputs (uncast SUM(BIGINT) — int128 does not
  *     round-trip through arrow/pandas comparers; linted duckdb-side in
  *     tools/oracle_check.py),
  *   - double columns whose value depends on accumulation ORDER (a plain
  *     SUM of arbitrary doubles differs per partitioning).
  *
  * This spec enforces the surviving rule: every Double/Float column in a
  * GATED query's output must carry an explicit portability justification
  * from the approved-formula list below. A new double-bearing row fails
  * the suite until its formula is audited and tagged — the lint that
  * would have caught all three round-9 failures before the driver did.
  */
class PortabilitySpec extends SparkSpec {

  /** Approved (query, column) -> justification. Tags:
    *  - `passthrough`: raw source column (or per-row cast of one) — both
    *    engines read the identical parquet value.
    *  - `rowwise-ieee`: per-row arithmetic over source/exact values with
    *    a fixed expression tree — each op correctly rounded, no
    *    accumulation, so bit-equal in any IEEE 754 engine.
    *  - `exact-int-ratio`: one division (optionally over sqrts) of
    *    EXACT integers — correctly-rounded ops on identical operands.
    *  - `exact-sum-int-valued`: SUM over doubles that are all integer-
    *    valued and bounded far below 2^53 — every partial sum is exact,
    *    so the result is accumulation-order-free.
    *  - `interp-parity`: percentile interpolation, parity with DuckDB's
    *    quantile_cont proven by the row's own oracle since round 7.
    *  - `fixed-tree-exact-int`: a documented multi-op double tree whose
    *    INPUTS are exact integers and whose op order is pinned
    *    identically in both engines (audited in the row's docstring).
    */
  private val approved: Map[(String, String), String] = Map(
    // raw TPC-H / corpus source columns
    ("q_asof_join", "o_totalprice") -> "passthrough",
    ("q_compact_scan", "l_quantity") -> "passthrough",
    ("q_csv_scan", "o_totalprice") -> "passthrough",
    ("q_filter_null", "l_quantity") -> "passthrough",
    ("q_filter_range", "l_quantity") -> "passthrough",
    ("q_json_scan", "o_totalprice") -> "passthrough",
    ("q_orc_scan", "o_totalprice") -> "passthrough",
    ("q_posexplode", "component") -> "passthrough",
    ("q_project", "l_extendedprice") -> "passthrough",
    ("q_project", "l_discount") -> "passthrough",
    ("q_scan", "l_quantity") -> "passthrough",
    ("q_scan", "l_extendedprice") -> "passthrough",
    ("q_scan", "l_discount") -> "passthrough",
    ("q_scan", "l_tax") -> "passthrough",
    ("q_topk", "o_totalprice") -> "passthrough",
    ("q_topk_per_key", "o_totalprice") -> "passthrough",
    ("q_union", "acctbal") -> "passthrough",
    ("q_window_rank", "o_totalprice") -> "passthrough",
    ("q_zorder_scan", "l_quantity") -> "passthrough",
    ("q_weighted_sample", "w") -> "passthrough", // token count, cast
    // per-row fixed trees
    ("q_project", "net_price") -> "rowwise-ieee", // price*(1-disc)
    ("q_quantize_embed", "q_min") -> "rowwise-ieee", // list min, exact select
    ("q_quantize_embed", "q_max") -> "rowwise-ieee",
    // exact-integer ratios (dot/norm/count/rank integers, one division)
    ("q_ann_ivf", "cosine") -> "exact-int-ratio",
    ("q_ann_ivf_trained", "cosine") -> "exact-int-ratio",
    ("q_ann_lsh", "cosine") -> "exact-int-ratio",
    ("q_ann_lsh_mp", "cosine") -> "exact-int-ratio",
    ("q_ann_lsh_mp_r2", "cosine") -> "exact-int-ratio",
    ("q_ann_lsh_t4", "cosine") -> "exact-int-ratio",
    ("q_cosine_topk", "cosine") -> "exact-int-ratio",
    ("q_embed_neardup", "cosine") -> "exact-int-ratio",
    ("q_knn_graph", "cosine") -> "exact-int-ratio",
    ("q_hard_negatives", "cosine") -> "exact-int-ratio",
    ("q_minhash_lsh", "jaccard") -> "exact-int-ratio",
    ("q_ngram_jaccard", "jaccard") -> "exact-int-ratio",
    ("q_sorted_blocking", "jaccard") -> "exact-int-ratio", // same verify as q_ngram_jaccard
    ("q_incremental_neardup", "jaccard") -> "exact-int-ratio",
    ("q_containment", "c_ab") -> "exact-int-ratio",
    ("q_containment", "c_ba") -> "exact-int-ratio",
    ("q_quality_calibrated", "pctl") -> "exact-int-ratio", // c_lt/(n-1)
    ("q_window_stats", "pr") -> "exact-int-ratio", // percent_rank
    ("q_window_stats", "cd") -> "exact-int-ratio", // cume_dist
    ("q_dup_spans", "dup_frac") -> "exact-int-ratio",
    ("q_repetition", "top_2gram_frac") -> "exact-int-ratio",
    ("q_repetition", "dup_token_frac") -> "exact-int-ratio",
    ("q_text_quality", "avg_token_len") -> "exact-int-ratio",
    ("q_text_quality", "punct_ratio") -> "exact-int-ratio",
    ("q_text_quality", "stopword_ratio") -> "rowwise-ieee", // ratio+min+mix
    ("q_text_quality", "quality") -> "rowwise-ieee", // weighted fixed tree
    ("q_domain_stats", "avg_quality") -> "exact-int-ratio",
    // integer-valued double sums (l_quantity ∈ small ints; exact < 2^53)
    ("q_groupby_minmaxcount", "sum_qty") -> "exact-sum-int-valued",
    ("q_rollup", "sum_qty") -> "exact-sum-int-valued",
    ("q_pivot", "qty_f") -> "exact-sum-int-valued",
    ("q_pivot", "qty_o") -> "exact-sum-int-valued",
    // percentile interpolation parity (proven vs quantile_cont)
    ("q_percentiles", "p50") -> "interp-parity",
    ("q_percentiles", "p95") -> "interp-parity",
    ("q_winsorize", "clipped") -> "interp-parity",
    // audited fixed trees over exact integer inputs
    ("q_anomaly_zscore", "mean7") -> "fixed-tree-exact-int",
    ("q_anomaly_zscore", "z") -> "fixed-tree-exact-int",
    ("q_domain_divergence", "hellinger_sq") -> "fixed-tree-exact-int",
    // single IEEE divisions of exact integer window ranks over the
    // calendar-bounded day table: (r-1)/(n-1) and r/n, identical
    // expression tree both engines — correctly rounded, hash-stable
    ("q_window_distribution", "pct_rank") -> "fixed-tree-exact-int",
    ("q_window_distribution", "cume") -> "fixed-tree-exact-int")

  /** Queries whose OPTIMIZED plan legitimately contains a libm
    * transcendental, with the justification for why the gate still
    * holds. Everything else must be transcendental-free after column
    * pruning — e.g. q_char_entropy computes a fixed-point-ln display
    * column, but the gated projection drops it, so the optimizer must
    * prune the `log` out of the plan entirely (this lint proves the
    * drop is real, not cosmetic). */
  private val approvedTranscendental: Map[String, String] = Map(
    "q_weighted_sample" -> ("clock_fp9 = round(-ln(u)/w*1e9): a selection flip " +
      "needs two clocks within both a libm ulp AND a rounding boundary; " +
      "ties break by id (docstring-audited)"),
    "q_zipf_slope" -> ("x,y = round(ln(k)*1e3) of small integer ranks/freqs " +
      "feed integer sums; an ulp flip requires ln(k)*1e3 within 2^-40 of " +
      ".5 — no k below 10^12 hits it (swept)"),
    "q_tfidf_topterms" -> ("score_fp = round(tf*ln(N/df)*1e6): a flip needs " +
      "the product within a libm ulp of a .5 quantization boundary; ranks " +
      "tie-break by term"),
    "q_bm25_search" -> ("per-term w_fp quantized from the op-for-op-mirrored " +
      "BM25 tree (idf the only transcendental), summed as exact integers; " +
      "ranks tie-break by id"),
    "q_hybrid_search" -> ("fuses the q_bm25_search retriever (same idf " +
      "tree) with integer reciprocal ranks — transcendental exposure " +
      "identical to q_bm25_search"))

  test("no gated plan carries an unapproved transcendental after pruning") {
    import org.apache.spark.sql.catalyst.expressions.{Exp, Expression, Log, Log10, Log1p, Log2, Logarithm, Pow}
    val dir = "/root/testdata/sf0.001"
    def transcendental(e: Expression): Boolean = e match {
      case _: Log | _: Logarithm | _: Log10 | _: Log2 | _: Log1p | _: Exp |
           _: Pow => true
      case _ => false
    }
    val names = SparkEntry.queries.keys.filterNot(_.startsWith("q_stream_")).toSeq.sorted
    val found = names.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
      val hits = plan.collect { case node =>
        node.expressions.flatMap(_.collect { case e if transcendental(e) => e.prettyName })
      }.flatten.distinct
      if (hits.nonEmpty) Some(name -> hits.mkString(",")) else None
    }.toMap
    val unapproved = found.keys.filterNot(approvedTranscendental.contains)
    assert(unapproved.isEmpty,
      s"gated plans with unapproved transcendentals (libm is not a " +
        s"cross-engine contract — keep it out of hashed outputs or " +
        s"justify): ${unapproved.map(n => s"$n[${found(n)}]").mkString(", ")}")
    val stale = approvedTranscendental.keys.filterNot(found.contains)
    assert(stale.isEmpty,
      s"stale transcendental approvals (plan no longer carries one): " +
        stale.mkString(", "))
  }

  test("r9 portability rows keep their BIGINT-cast hashed outputs (HUGEINT fence)") {
    // Round 9's three driver-red rows were all the same defect: an
    // uncast SUM(BIGINT) output column is HUGEINT in DuckDB, and int128
    // does not round-trip through the driver's arrow/pandas comparer.
    // The duckdb-side lint (tools/oracle_check.py) catches this at
    // verify time; this fence catches it at TEST time — a future oracle
    // edit that drops the CAST fails the suite before any driver run.
    val fenced: Map[String, Seq[String]] = Map(
      "q_centroid_cosine" -> Seq("dot_fp", "norm_a_fp", "norm_b_fp"),
      "q_random_projection" -> Seq("comp_fp6"),
      "q_char_entropy" -> Seq("hist_fp"))
    fenced.foreach { case (q, cols) =>
      val sql = SparkEntry.oracleSql(q)
      cols.foreach { c =>
        val castRe = ("""CAST\(.*AS BIGINT\)\s+AS """ + c).r
        assert(castRe.findFirstIn(sql).isDefined,
          s"$q oracle: hashed output '$c' must be produced as " +
            s"CAST(... AS BIGINT) AS $c — an uncast SUM(BIGINT) is " +
            "HUGEINT in DuckDB and hash-mismatches on the driver")
      }
    }
    // Meta-guard: the duckdb-side lint itself must stay in place.
    val lint = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/oracle_check.py")), "UTF-8")
    assert(lint.contains("HUGEINT"),
      "tools/oracle_check.py lost its HUGEINT output-type lint")
  }

  test("every Double/Float column in a gated output carries a portability tag") {
    val dir = "/root/testdata/sf0.001"
    // streaming rows execute a real lifecycle on invocation; their
    // batch-twin columns are covered by their own specs
    val names = SparkEntry.queries.keys.filterNot(_.startsWith("q_stream_")).toSeq.sorted
    val found = names.flatMap { name =>
      SparkEntry.queries(name)(spark, dir).schema.fields.collect {
        case f if f.dataType == DoubleType || f.dataType == FloatType =>
          (name, f.name)
      }
    }
    val unapproved = found.filterNot(approved.contains)
    assert(unapproved.isEmpty,
      s"double/float gated columns without a portability justification " +
        s"(audit the formula, then tag it in PortabilitySpec.approved): " +
        unapproved.mkString(", "))
    val stale = approved.keys.filterNot(found.toSet)
    assert(stale.isEmpty,
      s"stale approved entries (column no longer in the gated output): " +
        stale.mkString(", "))
  }
}
