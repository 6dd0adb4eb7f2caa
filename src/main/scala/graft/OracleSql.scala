package graft

import graft.text.TextOps

/** DuckDB-runnable ANSI SQL oracle for every entry in `SparkEntry.queries`.
  *
  * Contract (driver): each SQL runs in DuckDB against views named after the
  * test tables (lineitem, orders, ...) over the same parquet the Spark side
  * reads; results are compared column-name-sorted and hashed. Rules applied
  * throughout (SURVEY.md §5):
  *   - aliases match the Spark output column names exactly;
  *   - integer-typed Spark outputs (size/length/year/row_number → INT) are
  *     CAST to INTEGER because DuckDB defaults to BIGINT;
  *   - double arithmetic mirrors the Spark expression tree operation-for-
  *     operation (IEEE doubles are deterministic given the same op order);
  *   - money sums go through round(x*100) → BIGINT (exact ints, order-free);
  *   - DuckDB date_part('dow') is already 0=Sunday like Postgres, matching
  *     the Spark side's dayofweek-1 adjustment;
  *   - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *     replace-all semantics.
  */
object OracleSql {

  /** IN-list literal from a vocab, e.g. ('the','a',...). */
  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")

  private val stop: Map[String, Seq[String]] = TextOps.Stopwords.toMap

  /** md5-of-normalized-text fingerprint (mirrors TextOps.fingerprint). */
  private val fpExpr =
    "md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))"

  private def vocabHits(words: Seq[String]): String =
    s"CAST(len(list_filter(string_split(text, ' '), x -> x IN ${inList(words)})) AS INTEGER)"

  // --- shared CTE bodies for the shingle/minhash pipelines (n = 3) -------

  /** Distinct word 3-gram shingles per doc (mirrors Dedup.shingles n=3). */
  private val shinglesCte =
    """sh AS (
      |  SELECT DISTINCT id, shingle FROM (
      |    SELECT doc_id AS id,
      |           unnest(list_transform(range(1, len(toks) - 1),
      |                                 i -> array_to_string(list_slice(toks, i, i + 2), ' '))) AS shingle
      |    FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      |    WHERE len(toks) >= 3))""".stripMargin

  private val shingleCountsCte =
    "counts AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id)"

  /** jaccard from an `inter(id_a, id_b, n_inter)` CTE joined to counts. */
  private def jaccardSelect(threshold: Double): String =
    s"""SELECT id_a, id_b,
       |       CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) AS jaccard
       |FROM inter
       |JOIN counts ca ON ca.id = id_a
       |JOIN counts cb ON cb.id = id_b
       |WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  /** 16-bit token-frequency simhash per doc → `sh16(id, simhash)`
    * (mirrors Dedup.simhash). */
  private val simhashCte: String = {
    val oddHex = Seq("1", "3", "5", "7", "9", "b", "d", "f")
      .map(h => s"'$h'").mkString("(", ",", ")")
    val bitSums = (1 to 16)
      .map(j => s"sum(CASE WHEN substring(h, $j, 1) IN $oddHex THEN 1 ELSE -1 END) AS b_$j")
      .mkString(",\n         ")
    val bitChars = (1 to 16)
      .map(j => s"CASE WHEN b_$j > 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")")
    s"""e AS (
       |  SELECT doc_id AS id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
       |s AS (
       |  SELECT id,
       |         $bitSums
       |  FROM e GROUP BY id),
       |sh16 AS (SELECT id, $bitChars AS simhash FROM s)""".stripMargin
  }

  // --- fixed-point embedding helpers (mirror similarity.Vectors) ---------

  /** embeddings → (vec_id, fv BIGINT[], nn) with ×1e6 fixed-point and the
    * exact integer squared norm. */
  private val fpVecCte =
    """fp AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fv
      |  FROM embeddings),
      |nv AS (
      |  SELECT vec_id, fv,
      |         list_sum(list_transform(range(1, len(fv) + 1), i -> fv[i] * fv[i])) AS nn
      |  FROM fp)""".stripMargin

  /** Exact int dot of q.fv and c.fv divided by the sqrt'd norms. */
  private def cosineExpr(q: String, c: String): String =
    s"CAST(list_sum(list_transform(range(1, len($q.fv) + 1), i -> $q.fv[i] * $c.fv[i])) AS DOUBLE)" +
      s" / (sqrt(CAST($q.nn AS DOUBLE)) * sqrt(CAST($c.nn AS DOUBLE)))"

  /** Shared CTE prefix for the kNN-graph diagnostics: the auto-bits
    * (4 at every gate corpus) k-nearest-neighbor DIRECTED edges as
    * `dedges` plus the deduped UNDIRECTED edge list as `und(a, b)`. */
  private def knnUndCte(k: Int): String =
    s"""b AS (
       |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
       |$fpVecCte,
       |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id
       |      WHERE nn > 0),
       |sc AS (
       |  SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
       |         ${cosineExpr("x", "y")} AS cosine
       |  FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
       |r AS (
       |  SELECT src_id, dst_id,
       |         CAST(row_number() OVER (PARTITION BY src_id
       |                                 ORDER BY cosine DESC, dst_id ASC) AS INTEGER) AS "rank"
       |  FROM sc),
       |dedges AS MATERIALIZED (
       |  SELECT src_id AS src, dst_id AS dst FROM r WHERE "rank" <= $k),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |  FROM dedges)""".stripMargin

  /** Exact integer squared L2 between two fixed-point list columns. */
  private def sqDistExpr(p: String, c: String): String =
    s"list_sum(list_transform(range(1, len($p.fv) + 1), " +
      s"i -> ($p.fv[i] - $c.fv[i]) * ($p.fv[i] - $c.fv[i])))"

  /** Sign-LSH bucket over the first 4 raw float components. The engine
    * self-sizes the width from the corpus cardinality
    * (Vectors.bitsFor: clamp(ceil(log2 n) - 7, 4, 24)); every gate/bench
    * corpus (500–2 000 vectors) resolves to the 4-bit FLOOR, which is
    * what this mirror pins — a corpus past 2^11 vectors would need the
    * oracle width raised in lockstep. */
  private val bucket4Expr =
    (1 to 4).map(i => s"CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")")

  val all: Map[String, String] = Map(

    "q_scan" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",

    "q_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
        |       l_extendedprice * (1.0 - l_discount) AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_null" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_filter_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 30 AND l_shipdate < TIMESTAMP '1998-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_string_norm" ->
      "SELECT p_partkey, trim(upper(p_name)) AS name_norm FROM part ORDER BY p_partkey",

    "q_case_ilike" ->
      """SELECT p_partkey, p_type,
        |       CASE WHEN lower(p_type) LIKE '%economy%' THEN 'Value'
        |            WHEN lower(p_type) LIKE '%standard%' THEN 'Mainstream'
        |            WHEN lower(p_type) LIKE '%promo%' THEN 'Promoted'
        |            ELSE trim(p_type) END AS type_category
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_case_bands" ->
      """SELECT p_partkey, p_size,
        |       CASE WHEN p_size <= 4 THEN 'Tiny'
        |            WHEN p_size BETWEEN 5 AND 14 THEN 'Small'
        |            WHEN p_size BETWEEN 15 AND 29 THEN 'Medium'
        |            WHEN p_size BETWEEN 30 AND 49 THEN 'Large'
        |            WHEN p_size IS NOT NULL THEN 'Huge' END AS size_band
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_trunc" ->
      "SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date FROM orders ORDER BY o_orderkey",

    "q_date_part" ->
      """SELECT o_orderkey,
        |       CAST(date_part('year', o_orderdate) AS INTEGER) AS order_year,
        |       CAST(date_part('month', o_orderdate) AS INTEGER) AS order_month,
        |       CAST(date_part('hour', o_orderdate) AS INTEGER) AS order_hour,
        |       CAST(date_part('dow', o_orderdate) AS INTEGER) AS order_dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_surrogate_key" ->
      """SELECT l_orderkey, l_linenumber,
        |       md5(concat_ws('-',
        |           COALESCE(CAST(l_orderkey AS VARCHAR), '_dbt_utils_surrogate_key_null_'),
        |           COALESCE(CAST(l_linenumber AS VARCHAR), '_dbt_utils_surrogate_key_null_'))) AS row_key
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus",

    "q_groupby_minmaxcount" ->
      """SELECT l_returnflag, l_linestatus,
        |       count(*) AS n_rows, sum(l_quantity) AS sum_qty,
        |       min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_count_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_suppkey) AS n_supp,
        |       count(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.95) AS p95
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_having" ->
      """SELECT o_custkey, count(*) AS order_count
        |FROM orders GROUP BY o_custkey HAVING count(*) > 1
        |ORDER BY o_custkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    // HLL++ sketch values are engine-specific, so the verified contract is
    // "each engine's OWN sketch is within 5% of the exact count" — both
    // engines emit (flag, exact, TRUE) rows, which hash-match.
    "q_approx_count_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS n_part_exact,
        |       abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
        |         <= 0.05 * count(DISTINCT l_partkey) AS within_tolerance
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_pivot" ->
      """SELECT l_returnflag,
        |       sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_f,
        |       sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_union" ->
      """SELECT name, acctbal, kind FROM (
        |  SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier)
        |ORDER BY kind, name""".stripMargin,

    "q_join_fact_dim" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |       count(*) AS n_lines,
        |       CAST(sum(CAST(round((l_extendedprice * (1.0 - l_discount)) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY region_name, nation_name""".stripMargin,

    "q_semi_join" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |ORDER BY o_orderkey""".stripMargin,

    "q_outer_join" ->
      """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
        |       c.c_name AS c_name,
        |       coalesce(o.cnt, 0) AS n_orders
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0) c
        |FULL OUTER JOIN (SELECT o_custkey, count(*) AS cnt FROM orders
        |                 WHERE o_custkey % 3 = 0 GROUP BY 1) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin,

    // the salted join must be result-transparent: oracle = the plain join
    "q_salted_join" ->
      """SELECT c_mktsegment,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    // DuckDB sum(BIGINT) yields HUGEINT (→ float64 in the driver's frame,
    // "123.0" vs "123" hash mismatch) — CAST the windowed sum back to BIGINT.
    "q_window_range" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |         OVER (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
        |               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS running_cents
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,

    "q_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS running_spend_cents
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(date_diff('day',
        |                      CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
        |                                                     ORDER BY o_orderdate, o_orderkey) AS DATE),
        |                      CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_anti_accepted_values" ->
      """SELECT event_id, event_type FROM events
        |WHERE event_type IS NOT NULL
        |  AND event_type NOT IN ('click', 'view', 'purchase', 'signup')
        |ORDER BY event_id""".stripMargin,

    "q_monthly_revenue" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,

    // q_partition_prune reads the year-partitioned copy of orders (same
    // rows, different layout), so the oracle is the equivalent predicate
    // over the base table; o_year is the INT partition-directory value.
    "q_partition_prune" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       CAST(month(o_orderdate) AS INTEGER) AS o_month,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders
        |WHERE year(o_orderdate) = 1996
        |GROUP BY 1, 2 ORDER BY o_month""".stripMargin,

    // q_dpp_scan joins the year-partitioned orders copy with a FILE-backed
    // year dim filtered on tag — the oracle is the same join over the base
    // table with the dim inlined as VALUES (identical content by
    // construction: keep = {1996, 1999}).
    "q_dpp_scan" ->
      """WITH dim AS (SELECT * FROM (VALUES (1995, 'dead'), (1996, 'keep'),
        |  (1997, 'dead'), (1998, 'dead'), (1999, 'keep'), (2000, 'dead'),
        |  (2001, 'dead')) d(yy, tag))
        |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders JOIN dim ON CAST(year(o_orderdate) AS INTEGER) = dim.yy
        |WHERE dim.tag = 'keep'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,

    // q_bloom_join runs the selective dim join as a SHUFFLE join with the
    // runtime bloom filter injected on the fact side; the filter is
    // advisory, so the oracle is the plain join — any false-negative
    // pruning would break the hash.
    "q_bloom_join" ->
      """SELECT p_size, count(*) AS n_lines,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 2
        |GROUP BY p_size ORDER BY p_size""".stripMargin,

    "q_range_join" ->
      """SELECT a.event_id AS id_a, b.event_id AS id_b,
        |       date_diff('microsecond', a.ts, b.ts) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND b.ts > a.ts
        | AND b.ts <= a.ts + INTERVAL 5 MINUTE
        |ORDER BY id_a, id_b""".stripMargin,

    "q_json_serialize" ->
      """SELECT o_orderkey,
        |       to_json(struct_pack(o_orderkey := o_orderkey,
        |                           o_orderstatus := o_orderstatus)) AS payload
        |FROM orders WHERE o_orderstatus IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, event_type,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    // The streaming windowed aggregate equals this batch SQL on bounded
    // input (complete mode, one AvailableNow pass). Spark's 1-hour
    // tumbling windows align to the epoch, so the bucket is integer
    // floor arithmetic on epoch-µs.
    "q_stream_window_counts" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
        |       event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start_us, event_type""".stripMargin,

    // deterministic array agg: the list is sorted INSIDE the aggregate,
    // then serialized (the driver's comparer cannot hash raw arrays)
    "q_array_agg" ->
      """SELECT o_custkey,
        |       string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS prio_csv,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    // melt: the oracle mirrors semantics with a UNION ALL (same rows)
    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'price_cents' AS measure,
        |       CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'disc_cents' AS measure,
        |       CAST(round(l_discount * 100) AS BIGINT) AS cents
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "q_array_hof" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |       CAST(len(list_filter(toks, t -> length(t) > 4)) AS INTEGER) AS n_long,
        |       len(list_filter(toks, t -> t = 'data')) > 0 AS has_data,
        |       CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS chars_sum,
        |       CAST(list_max(list_transform(toks, t -> length(t))) AS INTEGER) AS max_len
        |FROM t ORDER BY doc_id""".stripMargin,

    // JSON-lines round-trip: same base-table transparency as q_csv_scan
    "q_json_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice,
        |       CAST(o_orderdate AS DATE) AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // deterministic hash shuffle + sharding for training resume
    "q_shard_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, md5('shuf:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, h,
        |         CAST(CAST('0x' || substr(h, 1, 8) AS BIGINT) % 8 AS INTEGER) AS shard
        |  FROM h)
        |SELECT doc_id, shard,
        |       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1 AS INTEGER) AS pos
        |FROM s ORDER BY doc_id""".stripMargin,

    // compaction preserves rows exactly (base-table transparency)
    "q_compact_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // incremental merge must equal the full-table aggregate
    "q_incremental_agg" ->
      """SELECT o_orderpriority,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_snapshot_diff" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders),
        |a AS (SELECT * FROM o WHERE k % 11 <> 0),
        |b AS (SELECT k AS kb,
        |             cents + CASE WHEN k % 7 = 0 THEN 1 ELSE 0 END AS cents_b
        |      FROM o WHERE k % 13 <> 0)
        |SELECT status, CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT CASE WHEN a.k IS NULL THEN 'added'
        |              WHEN b.kb IS NULL THEN 'removed'
        |              WHEN a.cents <> b.cents_b THEN 'changed'
        |              ELSE 'unchanged' END AS status
        |  FROM a FULL OUTER JOIN b ON a.k = b.kb)
        |GROUP BY status ORDER BY status""".stripMargin,

    "q_pagination" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 20 OFFSET 40""".stripMargin,

    "q_intersect_all" ->
      """WITH i AS (
        |  SELECT o_orderpriority FROM orders WHERE o_totalprice > 100000
        |  INTERSECT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_totalprice <= 200000)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM i GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_except_all" ->
      """WITH e AS (
        |  SELECT o_orderpriority FROM orders
        |  EXCEPT ALL
        |  SELECT o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        |FROM e GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_try_cast" ->
      """WITH r AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'junk'
        |              ELSE CAST(doc_id AS VARCHAR) END AS raw
        |  FROM documents)
        |SELECT doc_id, raw,
        |       TRY_CAST(raw AS BIGINT) AS parsed,
        |       TRY_CAST(raw AS BIGINT) IS NULL AS malformed
        |FROM r ORDER BY doc_id""".stripMargin,

    // ORC round-trip: same base-table transparency as q_csv_scan
    "q_orc_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice,
        |       CAST(o_orderdate AS DATE) AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // binaryFile source: payload length vs the closed-form synthesis
    // contract (SynthImages: BMP for even ids, PPM P6 for odd)
    "q_binary_scan" ->
      """SELECT doc_id,
        |       CAST(CASE WHEN doc_id % 2 = 0
        |         THEN 54 + ((3 * (8 + doc_id % 25) + 3) // 4) * 4 * (8 + doc_id % 17)
        |         ELSE 9 + length(CAST(8 + doc_id % 25 AS VARCHAR))
        |                + length(CAST(8 + doc_id % 17 AS VARCHAR))
        |                + 3 * (8 + doc_id % 25) * (8 + doc_id % 17)
        |       END AS INTEGER) AS byte_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    // CSV round-trip: the oracle reads the parquet BASE table — any
    // text-serialization drift (doubles, dates) breaks the hash
    "q_csv_scan" ->
      """SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice,
        |       CAST(o_orderdate AS DATE) AS o_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // native session_window: an event at EXACTLY gap distance starts a
    // new session (brk on >=), end = last event + gap
    "q_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |m AS (SELECT user_id, us,
        |        CASE WHEN lag(us) OVER w IS NULL
        |               OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT user_id, us,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |                       ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM m)
        |SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
        |       CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,

    // in-stream dedup over a doubled landing: emitted set = distinct ids
    "q_stream_dedup" ->
      """SELECT event_id FROM events ORDER BY event_id""".stripMargin,

    // Bounded-store 64-bit streaming near-dup admission, replayed as
    // plain sequential batch admission (gate capacity = the
    // window=everything regime): batch b = doc_id % 2; within-batch
    // clusters = connected components of the exact Hamming<=3 pair graph
    // (the engine's banding is candidate pruning only — pigeonhole
    // makes its pair set exactly the brute-force set, so the oracle
    // skips the bands); batch-1 minima are then dropped against batch-0
    // admissions. 64-bit signature mirrors functions.SimHash64Fp (the
    // q_simhash64_pairs CTE machinery).
    "q_stream_neardup64" -> {
      val bitSums = (1 to 64).map { j =>
        val digit = (j - 1) / 4 + 1
        val bit = 3 - ((j - 1) % 4)
        s"sum(CASE WHEN ((strpos('0123456789abcdef', substring(h, $digit, 1)) - 1) >> $bit) & 1 = 1 THEN 1 ELSE -1 END) AS b_$j"
      }.mkString(",\n         ")
      val bitChars = (1 to 64)
        .map(j => s"CASE WHEN b_$j > 0 THEN '1' ELSE '0' END")
        .mkString("concat(", ", ", ")")
      s"""WITH RECURSIVE e AS (
         |  SELECT doc_id AS id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
         |s AS (
         |  SELECT id,
         |         $bitSums
         |  FROM e GROUP BY id),
         |sh64 AS (SELECT id, $bitChars AS simhash FROM s),
         |hl AS (
         |  SELECT id, id % 2 AS b, simhash,
         |         CAST(concat('0b', substring(simhash, 1, 32)) AS BIGINT) AS hi,
         |         CAST(concat('0b', substring(simhash, 33, 32)) AS BIGINT) AS lo
         |  FROM sh64),
         |p AS (
         |  SELECT x.id AS id_a, y.id AS id_b
         |  FROM hl x JOIN hl y ON x.b = y.b AND x.id < y.id
         |  WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) <= 3),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM p
         |       UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM eg
         |  UNION
         |  SELECT eg.dst AS id, reach.r AS r FROM reach JOIN eg ON eg.src = reach.id),
         |minima AS (
         |  SELECT hl.* FROM hl
         |  LEFT JOIN (SELECT id, min(r) AS m FROM reach GROUP BY id) c ON c.id = hl.id
         |  WHERE c.m IS NULL OR c.m = hl.id),
         |adm0 AS (SELECT * FROM minima WHERE b = 0),
         |adm1 AS (
         |  SELECT m.* FROM minima m WHERE m.b = 1 AND NOT EXISTS (
         |    SELECT 1 FROM adm0 a
         |    WHERE bit_count(xor(a.hi, m.hi)) + bit_count(xor(a.lo, m.lo)) <= 3))
         |SELECT id, simhash FROM adm0
         |UNION ALL SELECT id, simhash FROM adm1
         |ORDER BY id""".stripMargin
    },

    // 16-bit UNBOUNDED streaming near-dup admission (X233), replayed as
    // plain sequential batch admission: batch b = doc_id % 2;
    // within-batch clusters = connected components of the exact
    // Hamming<=2 pair graph (the engine's signature-contracted banding
    // is candidate pruning only — pigeonhole makes the pair set exactly
    // the brute-force set, and contracting by signature preserves
    // doc-level connectivity since identical signatures are distance 0);
    // batch-1 minima drop against ALL batch-0 admissions — the 16-bit
    // store is bounded by its signature SPACE, so there is no trim
    // conditional to replay (contrast q_stream_neardup64_evict).
    "q_stream_neardup16" ->
      s"""WITH RECURSIVE $simhashCte,
         |hl AS (
         |  SELECT id, id % 2 AS b, simhash,
         |         CAST(concat('0b', simhash) AS BIGINT) AS v
         |  FROM sh16),
         |p AS (
         |  SELECT x.id AS id_a, y.id AS id_b
         |  FROM hl x JOIN hl y ON x.b = y.b AND x.id < y.id
         |  WHERE bit_count(xor(x.v, y.v)) <= 2),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM p
         |       UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM eg
         |  UNION
         |  SELECT eg.dst AS id, reach.r AS r FROM reach JOIN eg ON eg.src = reach.id),
         |minima AS (
         |  SELECT hl.* FROM hl
         |  LEFT JOIN (SELECT id, min(r) AS m FROM reach GROUP BY id) c ON c.id = hl.id
         |  WHERE c.m IS NULL OR c.m = hl.id),
         |adm0 AS (SELECT * FROM minima WHERE b = 0),
         |adm1 AS (
         |  SELECT m.* FROM minima m WHERE m.b = 1 AND NOT EXISTS (
         |    SELECT 1 FROM adm0 a WHERE bit_count(xor(a.v, m.v)) <= 2))
         |SELECT id, simhash FROM adm0
         |UNION ALL SELECT id, simhash FROM adm1
         |ORDER BY id""".stripMargin,

    // FIFO eviction under the gate: three parity batches (b = doc_id % 3)
    // at capacity = n_docs // 4 (below one batch's admissions at every
    // test SF, so the trim actually fires). Batches 0 and 1 replay plain
    // admission (batch 1's window is always all of batch 0 — the trim
    // takes at least one older batch). Batch 2's window replays the trim
    // RULE itself: newest older batches until cumulative admissions first
    // reach capacity — i.e. batch-1 admissions, plus batch-0 admissions
    // ONLY IF |adm1| < capacity (the engine's trimToCapacity conditional,
    // not an assumed outcome). Same signature/CC machinery as
    // q_stream_neardup64.
    "q_stream_neardup64_evict" -> {
      val bitSums = (1 to 64).map { j =>
        val digit = (j - 1) / 4 + 1
        val bit = 3 - ((j - 1) % 4)
        s"sum(CASE WHEN ((strpos('0123456789abcdef', substring(h, $digit, 1)) - 1) >> $bit) & 1 = 1 THEN 1 ELSE -1 END) AS b_$j"
      }.mkString(",\n         ")
      val bitChars = (1 to 64)
        .map(j => s"CASE WHEN b_$j > 0 THEN '1' ELSE '0' END")
        .mkString("concat(", ", ", ")")
      s"""WITH RECURSIVE e AS (
         |  SELECT doc_id AS id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
         |s AS (
         |  SELECT id,
         |         $bitSums
         |  FROM e GROUP BY id),
         |sh64 AS (SELECT id, $bitChars AS simhash FROM s),
         |cap AS (SELECT GREATEST(1, count(*) // 4) AS c FROM documents),
         |hl AS (
         |  SELECT id, id % 3 AS b, simhash,
         |         CAST(concat('0b', substring(simhash, 1, 32)) AS BIGINT) AS hi,
         |         CAST(concat('0b', substring(simhash, 33, 32)) AS BIGINT) AS lo
         |  FROM sh64),
         |p AS (
         |  SELECT x.id AS id_a, y.id AS id_b
         |  FROM hl x JOIN hl y ON x.b = y.b AND x.id < y.id
         |  WHERE bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo)) <= 3),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM p
         |       UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM eg
         |  UNION
         |  SELECT eg.dst AS id, reach.r AS r FROM reach JOIN eg ON eg.src = reach.id),
         |minima AS (
         |  SELECT hl.* FROM hl
         |  LEFT JOIN (SELECT id, min(r) AS m FROM reach GROUP BY id) c ON c.id = hl.id
         |  WHERE c.m IS NULL OR c.m = hl.id),
         |adm0 AS (SELECT * FROM minima WHERE b = 0),
         |adm1 AS (
         |  SELECT m.* FROM minima m WHERE m.b = 1 AND NOT EXISTS (
         |    SELECT 1 FROM adm0 a
         |    WHERE bit_count(xor(a.hi, m.hi)) + bit_count(xor(a.lo, m.lo)) <= 3)),
         |w2 AS (
         |  SELECT hi, lo FROM adm1
         |  UNION ALL
         |  SELECT hi, lo FROM adm0
         |  WHERE (SELECT count(*) FROM adm1) < (SELECT c FROM cap)),
         |adm2 AS (
         |  SELECT m.* FROM minima m WHERE m.b = 2 AND NOT EXISTS (
         |    SELECT 1 FROM w2 a
         |    WHERE bit_count(xor(a.hi, m.hi)) + bit_count(xor(a.lo, m.lo)) <= 3))
         |SELECT id, simhash FROM adm0
         |UNION ALL SELECT id, simhash FROM adm1
         |UNION ALL SELECT id, simhash FROM adm2
         |ORDER BY id""".stripMargin
    },

    // stream-stream join: inner matches over bounded input equal the
    // batch self-join; µs arithmetic matches Spark's timestamp + interval
    "q_stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000
        |ORDER BY click_id, purchase_id""".stripMargin,

    // stream-static join + windowed agg: every user_id (0..149) has a
    // customer row, so the inner join is total; windows are epoch-aligned
    "q_stream_enrich" ->
      """SELECT (epoch_us(e.ts) // 3600000000) * 3600000000 AS window_start_us,
        |       c.c_mktsegment AS segment,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2
        |ORDER BY window_start_us, segment""".stripMargin,

    // same flag-and-running-sum formulation as Relational.sessionize;
    // epoch_us(ts) matches Spark's `ts div 1000` on the nanos-as-long read
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT user_id, event_id, us,
        |        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
        |                  OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
        |             THEN 1 ELSE 0 END AS ns
        |      FROM e),
        |g AS (SELECT user_id, us,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS session_idx
        |      FROM f)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       min(us) AS session_start_us, max(us) AS session_end_us,
        |       count(*) AS n_events
        |FROM g GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,

    // Exact per-group lower median: per-group rank (v, id), element at
    // (n+1)//2 — equals the engine's composite-key global-rank form.
    "q_grouped_median" ->
      """WITH o AS (SELECT o_orderpriority AS g,
        |                  CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |                  o_orderkey AS id
        |           FROM orders),
        |r AS (SELECT g, v,
        |             row_number() OVER (PARTITION BY g ORDER BY v, id) AS lr
        |      FROM o),
        |c AS (SELECT g, CAST(count(*) AS BIGINT) AS n_rows FROM o GROUP BY 1)
        |SELECT r.g AS o_orderpriority, c.n_rows,
        |       CAST(r.v AS BIGINT) AS median_cents
        |FROM r JOIN c ON r.g = c.g
        |WHERE r.lr = (c.n_rows + 1) // 2
        |ORDER BY o_orderpriority""".stripMargin,

    // Session basket affinity: gap-sessionized DISTINCT (session, type)
    // items, pair counts + exact lift·1000.
    "q_basket_affinity" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |           FROM events),
        |f AS (SELECT user_id, event_id, event_type, us,
        |        CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
        |                  OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
        |             THEN 1 ELSE 0 END AS ns
        |      FROM e),
        |g AS (SELECT user_id, event_type,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS sx
        |      FROM f),
        |it AS (SELECT DISTINCT user_id AS u, sx, event_type AS t FROM g),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sess
        |       FROM (SELECT DISTINCT u, sx FROM it)),
        |si AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM it GROUP BY 1),
        |pr AS (SELECT a.t AS type_a, b.t AS type_b, CAST(count(*) AS BIGINT) AS n_ab
        |       FROM it a JOIN it b ON a.u = b.u AND a.sx = b.sx AND a.t < b.t
        |       GROUP BY 1, 2)
        |SELECT pr.type_a, pr.type_b, pr.n_ab, sa.n AS n_a, sb.n AS n_b,
        |       CAST((1000 * pr.n_ab * ns.n_sess) // (sa.n * sb.n) AS BIGINT)
        |         AS lift_x1000
        |FROM pr JOIN si sa ON sa.t = pr.type_a
        |        JOIN si sb ON sb.t = pr.type_b, ns
        |ORDER BY type_a, type_b""".stripMargin,

    // Ordered conversion funnel: per-step state = (user, t1, t) with the
    // earliest qualifying event strictly after the previous step within
    // 24 h; per-step 1-row summaries unioned. sum(BIGINT) is HUGEINT in
    // DuckDB — cast back down.
    "q_funnel_steps" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us, event_type FROM events),
        |s1 AS MATERIALIZED (
        |  SELECT u, min(us) AS t1, min(us) AS t FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS MATERIALIZED (
        |  SELECT e.u, min(s1.t1) AS t1, min(e.us) AS t
        |  FROM e JOIN s1 ON e.u = s1.u
        |  WHERE e.event_type = 'click'
        |    AND e.us > s1.t AND e.us <= s1.t + 86400000000
        |  GROUP BY 1),
        |s3 AS MATERIALIZED (
        |  SELECT e.u, min(s2.t1) AS t1, min(e.us) AS t
        |  FROM e JOIN s2 ON e.u = s2.u
        |  WHERE e.event_type = 'purchase'
        |    AND e.us > s2.t AND e.us <= s2.t + 86400000000
        |  GROUP BY 1)
        |SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type,
        |       count(*) AS n_users, CAST(0 AS BIGINT) AS sum_latency_us
        |FROM s1
        |UNION ALL
        |SELECT CAST(2 AS INTEGER), 'click', count(*),
        |       CAST(COALESCE(sum(t - t1), 0) AS BIGINT) FROM s2
        |UNION ALL
        |SELECT CAST(3 AS INTEGER), 'purchase', count(*),
        |       CAST(COALESCE(sum(t - t1), 0) AS BIGINT) FROM s3
        |ORDER BY step""".stripMargin,

    // TPC-H Q1-shaped pricing summary: exact fixed-point money (cents /
    // fp4 / fp6), truncating integer means derived from the sums.
    "q_pricing_summary" ->
      """WITH l AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(round(l_quantity) AS BIGINT) AS qty,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS base_c,
        |         CAST(round(l_discount * 100) AS BIGINT) AS disc_c,
        |         CAST(round(l_tax * 100) AS BIGINT) AS tax_c
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
        |SELECT l_returnflag, l_linestatus,
        |       CAST(sum(qty) AS BIGINT) AS sum_qty,
        |       CAST(sum(base_c) AS BIGINT) AS sum_base_cents,
        |       CAST(sum(base_c * (100 - disc_c)) AS BIGINT) AS sum_disc_fp4,
        |       CAST(sum(base_c * (100 - disc_c) * (100 + tax_c)) AS BIGINT) AS sum_charge_fp6,
        |       count(*) AS count_order,
        |       CAST(sum(qty) // count(*) AS BIGINT) AS avg_qty,
        |       CAST(sum(base_c) // count(*) AS BIGINT) AS avg_price_cents,
        |       CAST(sum(disc_c) // count(*) AS BIGINT) AS avg_disc_c
        |FROM l GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // TPC-H Q3-shaped shipping priority: top-10 unshipped-revenue orders
    // for the BUILDING segment, revenue in exact fp4; ISO date string
    // (timestamps hash differently across engines).
    "q_shipping_priority" ->
      """SELECT l.l_orderkey,
        |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
        |       o.o_orderpriority,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
        |         AS revenue_fp4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l.l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_fp4 DESC, order_date, l_orderkey
        |LIMIT 10""".stripMargin,

    // TPC-H Q18-shaped large-volume customers: per-order quantity sum
    // HAVING > 300, exact integer quantities + cents, ISO dates,
    // deterministic top-100 (ties broken by orderkey).
    "q_big_orders" ->
      """WITH bq AS (
        |  SELECT l_orderkey,
        |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) > 300)
        |SELECT c.c_name, o.o_custkey, o.o_orderkey,
        |       strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
        |       CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
        |       bq.total_qty
        |FROM bq
        |JOIN orders o ON o.o_orderkey = bq.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY totalprice_cents DESC, o.o_orderkey
        |LIMIT 100""".stripMargin,

    // TPC-H Q5-shaped local-supplier revenue: ASIA customers served by
    // a same-nation supplier within one order year, exact fp4 revenue.
    "q_region_revenue" ->
      """SELECT n.n_name,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
        |         AS revenue_fp4
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |                AND s.s_nationkey = c.c_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY revenue_fp4 DESC, n_name""".stripMargin,

    // TPC-H Q6-shaped revenue band: full-pushdown 1-row aggregate,
    // exact fp4 (cents × discount-cents).
    "q_revenue_band" ->
      """SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |               * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
        |         AS revenue_fp4,
        |       count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    // TPC-H Q14-shaped promo share: one conditional aggregate over the
    // month × part join, exact permille.
    "q_promo_share" ->
      """WITH j AS (
        |  SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |         * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_fp4,
        |         p.p_type = 'PROMO' AS is_promo
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l.l_shipdate < TIMESTAMP '1996-10-01'),
        |a AS (SELECT CAST(COALESCE(sum(CASE WHEN is_promo THEN rev_fp4 END), 0)
        |                  AS BIGINT) AS promo_fp4,
        |             CAST(sum(rev_fp4) AS BIGINT) AS total_fp4
        |      FROM j)
        |SELECT promo_fp4, total_fp4,
        |       CAST((1000 * promo_fp4) // total_fp4 AS BIGINT) AS promo_permille
        |FROM a""".stripMargin,

    // TPC-H Q16-shaped supplier census: distinct suppliers per
    // (brand, size), promo type and one brand excluded.
    "q_supplier_parts" ->
      """SELECT p.p_brand, p.p_size,
        |       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_type <> 'PROMO' AND p.p_brand <> 'Brand#4'
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    // Benford first-digit audit: leading digit of exact cents, counts +
    // permille; the log-expected comparison stays outside the gate.
    "q_benford" ->
      """WITH c AS (
        |  SELECT substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |                     AS VARCHAR), 1, 1) AS digit
        |  FROM orders),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM g)
        |SELECT digit, n, CAST((1000 * n) // nt AS BIGINT) AS permille
        |FROM g, tot ORDER BY digit""".stripMargin,

    // Curriculum phases: exact global rank by (score, id), phase =
    // (rank−1)·4 // n + 1 (the rfm-quintile arithmetic).
    "q_curriculum" ->
      """WITH dsc AS (
        |  SELECT doc_id, CAST(len(list_filter(string_split(text, ' '),
        |                                      x -> length(x) > 0)) AS BIGINT)
        |           AS score
        |  FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dsc),
        |r AS (SELECT doc_id, score,
        |             row_number() OVER (ORDER BY score, doc_id) AS r FROM dsc)
        |SELECT doc_id, score,
        |       CAST(((r - 1) * 4) // n + 1 AS INTEGER) AS phase
        |FROM r, n ORDER BY doc_id""".stripMargin,

    // Luhn audit: synthesized 16-digit run per doc (the q_pii_redact
    // synthesis pattern), regexp extraction, mod-10 validation via the
    // list_transform mirror of the engine's aggregate HOF.
    "q_luhn_audit" ->
      """WITH tt AS (
        |  SELECT source, doc_id,
        |         text || ' card ' ||
        |         CAST(4000000000000000 + doc_id * 9973 AS VARCHAR) AS t
        |  FROM documents),
        |cand AS (
        |  SELECT source, doc_id,
        |         unnest(regexp_extract_all(t, '[0-9]{13,19}')) AS num
        |  FROM tt),
        |v AS (
        |  SELECT source, doc_id,
        |         list_sum(list_transform(range(1, length(num) + 1), i ->
        |           CASE WHEN i % 2 = 0
        |                THEN CASE WHEN 2 * CAST(substr(reverse(num), i, 1) AS INT) > 9
        |                          THEN 2 * CAST(substr(reverse(num), i, 1) AS INT) - 9
        |                          ELSE 2 * CAST(substr(reverse(num), i, 1) AS INT) END
        |                ELSE CAST(substr(reverse(num), i, 1) AS INT) END)) % 10 = 0
        |           AS ok
        |  FROM cand),
        |pd AS (SELECT source, doc_id, CAST(count(*) AS BIGINT) AS nc,
        |              CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS nv
        |       FROM v GROUP BY 1, 2)
        |SELECT source, CAST(sum(nc) AS BIGINT) AS n_candidates,
        |       CAST(sum(nv) AS BIGINT) AS n_valid,
        |       CAST(sum(CASE WHEN nv > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_docs_flagged
        |FROM pd GROUP BY 1 ORDER BY source""".stripMargin,

    // Vocabulary coverage curve: top-20 words, cumulative token share
    // in exact permille.
    "q_coverage_curve" ->
      """WITH w AS (
        |  SELECT unnest(list_filter(string_split(text, ' '),
        |                            x -> length(x) > 0)) AS word
        |  FROM documents),
        |c AS (SELECT word, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
        |top AS (SELECT word, n,
        |               CAST(row_number() OVER (ORDER BY n DESC, word)
        |                    AS INTEGER) AS "rank"
        |        FROM c ORDER BY n DESC, word LIMIT 20)
        |SELECT "rank", word, n,
        |       CAST((1000 * sum(n) OVER (ORDER BY "rank"
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) // nt
        |            AS BIGINT) AS cum_coverage_permille
        |FROM top, tot ORDER BY "rank"""".stripMargin,

    // Lexical diversity: (source, word) counts → TTR + hapax share in
    // exact permille.
    "q_lexical_diversity" ->
      """WITH w AS (
        |  SELECT source, unnest(list_filter(string_split(text, ' '),
        |                                    x -> length(x) > 0)) AS word
        |  FROM documents),
        |c AS (SELECT source, word, CAST(count(*) AS BIGINT) AS n
        |      FROM w GROUP BY 1, 2),
        |g AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
        |             CAST(count(*) AS BIGINT) AS n_types,
        |             CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |               AS n_hapax
        |      FROM c GROUP BY 1)
        |SELECT source, n_tokens, n_types, n_hapax,
        |       CAST((1000 * n_types) // n_tokens AS BIGINT) AS ttr_permille,
        |       CAST((1000 * n_hapax) // n_types AS BIGINT) AS hapax_permille
        |FROM g ORDER BY source""".stripMargin,

    // Embedding squared-norm spectrum: exact fixed-point norms in
    // ⌊log₂⌋ buckets (bin()-length), zero vectors → bucket −1.
    "q_norm_histogram" ->
      s"""WITH $fpVecCte,
         |h AS (SELECT CASE WHEN nn = 0 THEN -1
         |                  ELSE length(bin(nn)) - 1 END AS log2_bucket, nn
         |      FROM nv WHERE fv IS NOT NULL)
         |SELECT CAST(log2_bucket AS INTEGER) AS log2_bucket,
         |       CAST(count(*) AS BIGINT) AS n_vectors,
         |       CAST(min(nn) AS BIGINT) AS min_normsq_fp,
         |       CAST(max(nn) AS BIGINT) AS max_normsq_fp
         |FROM h GROUP BY 1 ORDER BY log2_bucket""".stripMargin,

    // LIX readability per source: exact per-doc counts (words,
    // max(1, terminator-runs) sentences, >6-char longwords) summed,
    // index = 100W//S + 10000LW//W from the sums.
    "q_readability" ->
      """WITH d AS (
        |  SELECT source,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              x -> length(x) > 0)) AS BIGINT) AS w,
        |         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |              AS BIGINT) AS s,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              x -> length(x) > 6)) AS BIGINT) AS lw
        |  FROM documents),
        |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |             CAST(sum(w) AS BIGINT) AS n_words,
        |             CAST(sum(s) AS BIGINT) AS n_sentences,
        |             CAST(sum(lw) AS BIGINT) AS n_longwords
        |      FROM d GROUP BY 1)
        |SELECT source, n_docs, n_words, n_sentences, n_longwords,
        |       CAST((100 * n_words) // n_sentences
        |            + (10000 * n_longwords) // n_words AS BIGINT) AS lix_x100
        |FROM g ORDER BY source""".stripMargin,

    // RAKE: non-letters then stopwords become the phrase delimiter
    // (regexp_replace needs the 'g' flag here — DuckDB replaces only
    // the first match by default, Spark replaces all), word
    // freq/degree over the phrase explode, top-20 by permille score.
    "q_rake_keywords" ->
      """WITH s AS (
        |  SELECT regexp_replace(
        |           regexp_replace(lower(text), '[^a-z ]+', '.', 'g'),
        |           '\b(the|a|of|and|to|in|is|it|that|for)\b', '.', 'g') AS t
        |  FROM documents),
        |p AS (SELECT unnest(string_split(t, '.')) AS phrase FROM s),
        |w AS (SELECT list_filter(string_split_regex(phrase, ' +'),
        |                         x -> length(x) > 0) AS ws FROM p),
        |x AS (SELECT unnest(ws) AS word, CAST(len(ws) AS BIGINT) AS plen
        |      FROM w WHERE len(ws) > 0),
        |g AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
        |             CAST(sum(plen) AS BIGINT) AS degree
        |      FROM x GROUP BY 1)
        |SELECT word, freq, degree,
        |       CAST((1000 * degree) // freq AS BIGINT) AS score_permille
        |FROM g ORDER BY score_permille DESC, word LIMIT 20""".stripMargin,

    // RFM quintiles: exact global rank by (metric ASC, user ASC) per
    // axis, quint = (rank-1)*5 // n + 1; monetary in exact integer
    // cents (round-half-away matches Spark's HALF_UP on both signs).
    "q_rfm_segments" ->
      """WITH u AS (
        |  SELECT user_id AS u, max(epoch_us(ts)) AS rec,
        |         CAST(count(*) AS BIGINT) AS freq,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS mon
        |  FROM events GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nu FROM u),
        |r AS (SELECT u, row_number() OVER (ORDER BY rec, u) AS rk FROM u),
        |f AS (SELECT u, row_number() OVER (ORDER BY freq, u) AS rk FROM u),
        |m AS (SELECT u, row_number() OVER (ORDER BY mon, u) AS rk FROM u),
        |q AS (
        |  SELECT r.u,
        |         CAST((r.rk - 1) * 5 // nu + 1 AS INTEGER) AS r_quint,
        |         CAST((f.rk - 1) * 5 // nu + 1 AS INTEGER) AS f_quint,
        |         CAST((m.rk - 1) * 5 // nu + 1 AS INTEGER) AS m_quint
        |  FROM r JOIN f USING (u) JOIN m USING (u), n)
        |SELECT u AS user_id, r_quint, f_quint, m_quint,
        |       CAST(r_quint * 100 + f_quint * 10 + m_quint AS INTEGER) AS rfm_code
        |FROM q ORDER BY user_id""".stripMargin,

    // Per-label centroid drift between id-parity halves: exact integer
    // centroids (fp6 sums, truncating mean), L1 + dot/norm statistics.
    "q_embedding_drift" ->
      """WITH f AS (
        |  SELECT label, vec_id % 2 AS half, u.i AS ord,
        |         CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |  WHERE embedding IS NOT NULL),
        |s AS (SELECT label, half, ord, SUM(x) AS sx FROM f GROUP BY 1, 2, 3),
        |nn AS (SELECT label, vec_id % 2 AS half, count(*) AS n FROM embeddings
        |       WHERE embedding IS NOT NULL GROUP BY 1, 2),
        |c AS (SELECT s.label, s.half, ord, sx // n AS cx, n
        |      FROM s JOIN nn ON nn.label = s.label AND nn.half = s.half)
        |SELECT e.label,
        |       CAST(e.n AS BIGINT) AS n_even, CAST(o.n AS BIGINT) AS n_odd,
        |       CAST(SUM(abs(e.cx - o.cx)) AS BIGINT) AS l1_fp,
        |       CAST(SUM(e.cx * o.cx) AS BIGINT) AS dot_fp,
        |       CAST(SUM(e.cx * e.cx) AS BIGINT) AS norm_e_fp,
        |       CAST(SUM(o.cx * o.cx) AS BIGINT) AS norm_o_fp
        |FROM c e JOIN c o ON e.label = o.label AND e.ord = o.ord
        |WHERE e.half = 0 AND o.half = 1
        |GROUP BY e.label, e.n, o.n
        |ORDER BY e.label""".stripMargin,

    // Cohort retention: epoch-week = integer µs division (no calendar
    // semantics to diverge across engines).
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us FROM events),
        |c AS (SELECT u, min(us) // 604800000000 AS cohort_week FROM e GROUP BY 1),
        |a AS (SELECT DISTINCT u, us // 604800000000 AS week FROM e)
        |SELECT cohort_week, CAST(week - cohort_week AS INTEGER) AS week_offset,
        |       count(*) AS n_users
        |FROM c JOIN a USING (u)
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    // First-order Markov transitions: per-user lead() pairs, counts +
    // exact out-share permille (sum(BIGINT) is HUGEINT — cast down).
    "q_event_transitions" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us, event_id, event_type
        |           FROM events),
        |p AS (SELECT event_type AS from_type,
        |             lead(event_type) OVER (PARTITION BY u ORDER BY us, event_id)
        |               AS to_type
        |      FROM e),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |      FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_out FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |       CAST((1000 * c.n) // t.n_out AS BIGINT) AS permille
        |FROM c JOIN tot t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    // Last-touch attribution: running last non-purchase type per user
    // (IGNORE NULLS over the strictly-preceding frame), 'direct' when
    // none; integer cents, share permille.
    "q_attribution" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS us, event_id,
        |                  event_type, value FROM events),
        |t AS (SELECT event_type, value,
        |             last_value(CASE WHEN event_type <> 'purchase'
        |                             THEN event_type END IGNORE NULLS)
        |               OVER (PARTITION BY u ORDER BY us, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |               AS touch
        |      FROM e),
        |c AS (SELECT COALESCE(touch, 'direct') AS touch_type,
        |             CAST(count(*) AS BIGINT) AS n_conversions,
        |             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |               AS revenue_cents
        |      FROM t WHERE event_type = 'purchase' GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_conversions) AS BIGINT) AS nt FROM c)
        |SELECT touch_type, n_conversions, revenue_cents,
        |       CAST((1000 * n_conversions) // nt AS BIGINT) AS share_permille
        |FROM c, tot ORDER BY touch_type""".stripMargin,

    // DAU/WAU stickiness: epoch-day and epoch-week integer division,
    // two distinct aggregates, permille ratio.
    "q_stickiness" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id AS u
        |           FROM events),
        |dau AS (SELECT day, CAST(count(DISTINCT u) AS BIGINT) AS dau
        |        FROM e GROUP BY 1),
        |wau AS (SELECT day // 7 AS week, CAST(count(DISTINCT u) AS BIGINT) AS wau
        |        FROM e GROUP BY 1)
        |SELECT d.day, d.dau, w.wau,
        |       CAST((1000 * d.dau) // w.wau AS BIGINT) AS stickiness_permille
        |FROM dau d JOIN wau w ON d.day // 7 = w.week
        |ORDER BY d.day""".stripMargin,

    "q_asof_join" ->
      """WITH o1 AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                                 ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id, o1.o_orderkey, o1.o_totalprice
        |FROM events e ASOF LEFT JOIN o1
        |  ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate
        |ORDER BY e.event_id""".stripMargin,

    "q_dedup_exact" ->
      s"""SELECT $fpExpr AS fp, min(doc_id) AS keep_id, count(*) AS dup_count
         |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      s"SELECT doc_id, $fpExpr AS fp FROM documents ORDER BY doc_id",

    "q_text_quality" -> {
      val hits = vocabHits(stop("en"))
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |         $hits AS hits,
         |         CASE WHEN length(text) > 0
         |              THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
         |              ELSE 0.0 END AS punct_ratio
         |  FROM documents)
         |SELECT doc_id, n_tokens,
         |       CASE WHEN n_tokens > 0
         |            THEN CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE) / n_tokens
         |            ELSE 0.0 END AS avg_token_len,
         |       punct_ratio,
         |       CAST(hits AS DOUBLE) / n_tokens AS stopword_ratio,
         |       (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) * 0.4
         |         + least((CASE WHEN n_tokens > 0 THEN CAST(hits AS DOUBLE) / n_tokens ELSE 0.0 END) * 4.0, 1.0) * 0.4
         |         + (1.0 - punct_ratio) * 0.2 AS quality
         |FROM t ORDER BY doc_id""".stripMargin
    },

    // Linear classifier margin over exact integer features; weights
    // inlined closed-form (the engine side carries them as a broadcast
    // model row — same numbers, so the margins are integer-equal).
    "q_quality_margin" -> {
      val hits = vocabHits(stop("en"))
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |         CAST($hits AS BIGINT) AS n_stop,
         |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_cns
         |  FROM documents),
         |f AS (SELECT doc_id, n_tok, n_stop,
         |             n_cns * 1000 // n_tok AS mean_tok_len_milli FROM t)
         |SELECT doc_id, n_tok, n_stop, mean_tok_len_milli,
         |       CAST(-30000 + 400 * n_tok + 2000 * n_stop
         |            - mean_tok_len_milli AS BIGINT) AS margin,
         |       (-30000 + 400 * n_tok + 2000 * n_stop - mean_tok_len_milli) > 0 AS keep
         |FROM f ORDER BY doc_id""".stripMargin
    },

    "q_lang_id" -> {
      val hitCols = TextOps.Stopwords
        .map { case (lang, words) => s"${vocabHits(words)} AS h_$lang" }
        .mkString(",\n         ")
      val langs = TextOps.Stopwords.map(_._1)
      val best = langs.map(l => s"h_$l").mkString("greatest(", ", ", ")")
      val cases = langs
        .map(l => s"WHEN best > 0 AND h_$l = best THEN '$l'")
        .mkString("\n            ")
      s"""WITH h AS (
         |  SELECT doc_id,
         |         $hitCols
         |  FROM documents),
         |g AS (SELECT doc_id, h.*, $best AS best FROM h)
         |SELECT doc_id,
         |       CASE $cases
         |            ELSE 'und' END AS lang_pred,
         |       best AS best_hits
         |FROM g ORDER BY doc_id""".stripMargin
    },

    "q_regex_tokens" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS INTEGER) AS n_words,
        |       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_nums,
        |       CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]+')) AS INTEGER) AS n_other
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      """SELECT doc_id,
        |       CASE WHEN len(g) > 0
        |            THEN CAST(list_max(list_transform(list_distinct(g),
        |                   x -> len(list_filter(g, y -> y = x)))) AS DOUBLE) / len(g)
        |       END AS top_2gram_frac,
        |       CASE WHEN len(toks) > 0
        |            THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
        |       END AS dup_token_frac
        |FROM (SELECT doc_id, toks,
        |             CASE WHEN len(toks) >= 2
        |                  THEN list_transform(range(1, len(toks)),
        |                         i -> array_to_string(list_slice(toks, i, i + 1), ' '))
        |                  ELSE [] END AS g
        |      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "q_stratified_sample" -> {
      val hitCols = TextOps.Stopwords
        .map { case (lang, words) => s"${vocabHits(words)} AS h_$lang" }
        .mkString(",\n         ")
      val langs = TextOps.Stopwords.map(_._1)
      val best = langs.map(l => s"h_$l").mkString("greatest(", ", ", ")")
      val cases = langs
        .map(l => s"WHEN best > 0 AND h_$l = best THEN '$l'")
        .mkString("\n            ")
      s"""WITH h AS (
         |  SELECT doc_id,
         |         $hitCols
         |  FROM documents),
         |g AS (SELECT doc_id, h.*, $best AS best FROM h),
         |l AS (
         |  SELECT doc_id,
         |         CASE $cases
         |              ELSE 'und' END AS lang
         |  FROM g),
         |r AS (
         |  SELECT doc_id, lang,
         |         CAST(row_number() OVER (
         |           PARTITION BY lang
         |           ORDER BY md5(concat('strat|', CAST(doc_id AS VARCHAR))), doc_id)
         |         AS INTEGER) AS sample_rank
         |  FROM l)
         |SELECT doc_id, lang, sample_rank FROM r WHERE sample_rank <= 50
         |ORDER BY lang, sample_rank""".stripMargin
    },

    "q_tfidf_topterms" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id FROM documents WHERE len(string_split(text, ' ')) > 0),
        |st AS (SELECT count(*) AS n_docs FROM dl),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |         CAST(round(tf.tf * ln(CAST(st.n_docs AS DOUBLE) / dfx.df) * 1000000.0)
        |              AS BIGINT) AS score_fp
        |  FROM tf JOIN dfx ON tf.term = dfx.term, st),
        |r AS (
        |  SELECT doc_id, term, score_fp,
        |         CAST(row_number() OVER (PARTITION BY doc_id
        |                                 ORDER BY score_fp DESC, term ASC) AS INTEGER) AS term_rank
        |  FROM sc)
        |SELECT doc_id, term, score_fp, term_rank FROM r WHERE term_rank <= 3
        |ORDER BY doc_id, term_rank""".stripMargin,

    "q_bm25_search" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |       WHERE term IN ('hash', 'join', 'scan') GROUP BY 1, 2),
        |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |       FROM documents WHERE len(string_split(text, ' ')) > 0),
        |st AS (SELECT count(*) AS n_docs,
        |              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |sc AS (
        |  SELECT tf.doc_id,
        |         CAST(round(
        |           ln((st.n_docs - dfx.df + 0.5) / (dfx.df + 0.5) + 1.0)
        |             * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))
        |             * 1000000.0) AS BIGINT) AS w_fp
        |  FROM tf JOIN dfx ON tf.term = dfx.term JOIN dl ON tf.doc_id = dl.doc_id, st),
        |agg AS (SELECT doc_id, CAST(sum(w_fp) AS BIGINT) AS score_fp FROM sc GROUP BY 1),
        |r AS (
        |  SELECT doc_id, score_fp,
        |         CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id ASC) AS INTEGER) AS doc_rank
        |  FROM agg)
        |SELECT doc_id, score_fp, doc_rank FROM r WHERE doc_rank <= 10
        |ORDER BY doc_rank""".stripMargin,

    "q_winnow_fingerprint" ->
      """SELECT doc_id,
        |       CASE WHEN len(toks) >= 4
        |            THEN list_min(list_transform(range(1, len(toks) - 2),
        |                                         i -> md5(array_to_string(list_slice(toks, i, i + 3), ' '))))
        |            ELSE md5(text) END AS winnow_fp
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_train_test_split" ->
      """SELECT doc_id,
        |       CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS pct,
        |       CASE WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
        |            WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'valid'
        |            ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_length_buckets" ->
      """SELECT CAST((len(string_split(text, ' ')) // 64) * 64 AS INTEGER) AS bucket_start,
        |       count(*) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
        |FROM documents GROUP BY 1 ORDER BY bucket_start""".stripMargin,

    // Synthetic-image decode (graft.multimodal.SynthImages → ImageDecoder):
    // dimensions are closed-form over doc_id; byte_len is the exact format
    // arithmetic — BMP: 54-byte header + 4-byte-padded rows; PPM P6:
    // "P6\n{w} {h}\n255\n" header + raw RGB. The phash column is excluded
    // (average-hash is not oracle-SQL-expressible; golden-pinned in spec).
    "q_image_decode" ->
      """WITH dims AS (
        |  SELECT doc_id, 8 + doc_id % 25 AS w, 8 + doc_id % 17 AS h
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(CASE WHEN doc_id % 2 = 0
        |                 THEN 54 + ((3 * w + 3) // 4) * 4 * h
        |                 ELSE 9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + 3 * w * h
        |            END AS INTEGER) AS byte_len,
        |       CAST(w AS INTEGER) AS width,
        |       CAST(h AS INTEGER) AS height
        |FROM dims ORDER BY doc_id""".stripMargin,

    // Image hash-equality dedup: the oracle states the fixture's SPEC
    // closed-form — identical pixels per 3-doc group (through BMP and
    // PPM alike) must collapse to ONE hash, and distinct groups must
    // stay distinct corpus-wide. The engine has to get there through
    // the real byte-level decode.
    "q_image_dedup" ->
      """WITH g AS (SELECT doc_id // 3 AS img_group, doc_id FROM documents)
        |SELECT img_group, min(doc_id) AS keep_id,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(1 AS BIGINT) AS n_hashes,
        |       CAST(count(DISTINCT doc_id % 2) AS BIGINT) AS n_formats
        |FROM g GROUP BY img_group ORDER BY img_group""".stripMargin,

    "q_multimodal_decode" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
        |       CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
        |       CAST(octet_length(encode(text)) % 480 AS INTEGER) AS height,
        |       substring(md5(text), 1, 16) AS phash
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_frame_sample" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |       CAST(least(64, len - i * 64) AS INTEGER) AS frame_len
        |FROM (SELECT doc_id, len, unnest(range(0, CAST(ceil(len / 64.0) AS BIGINT))) AS i
        |      FROM (SELECT doc_id, octet_length(encode(text)) AS len FROM documents))
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "q_simhash" ->
      s"""WITH $simhashCte
         |SELECT id AS doc_id, simhash FROM sh16 ORDER BY doc_id""".stripMargin,

    "q_simhash_dedup" ->
      s"""WITH $simhashCte
         |SELECT simhash, min(id) AS keep_id, count(*) AS dup_count
         |FROM sh16 GROUP BY simhash ORDER BY keep_id""".stripMargin,

    "q_simhash_pairs" -> {
      // chunk layout mirrors Dedup.chunkBounds(16, 3) = (1,6),(7,5),(12,5);
      // '0b…' binary-literal CAST turns the portable 0/1 hash string into
      // the integer whose XOR popcount is the Hamming distance
      val chunks = Seq((0, 1, 6), (1, 7, 5), (2, 12, 5))
        .map { case (i, start, len) =>
          s"SELECT id, v, $i AS chunk, substring(simhash, $start, $len) AS bits FROM v" }
        .mkString("\n  UNION ALL\n  ")
      s"""WITH $simhashCte,
         |v AS (SELECT id, simhash, CAST(concat('0b', simhash) AS BIGINT) AS v FROM sh16),
         |chunks AS (
         |  $chunks)
         |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |       CAST(bit_count(xor(a.v, b.v)) AS INTEGER) AS hamming
         |FROM chunks a JOIN chunks b
         |  ON a.chunk = b.chunk AND a.bits = b.bits AND a.id < b.id
         |WHERE bit_count(xor(a.v, b.v)) <= 2
         |ORDER BY id_a, id_b""".stripMargin
    },

    "q_simhash64_pairs" -> {
      // 64-bit signature (mirrors functions.SimHash64Fp): vote for bit j
      // (1-based, MSB-first) is bit (3 − (j−1)%4) of md5 hex digit
      // ⌈j/4⌉. Banding mirrors Dedup.simhash64BandWidth(500, 3) = 14 →
      // chunkBounds(64, 5) = (1,13),(14,13),(27,13),(40,13),(53,12);
      // Hamming runs on hi/lo 32-bit halves (a sign-bit-set 64-bit value
      // does not survive a decimal round-trip).
      val bitSums = (1 to 64).map { j =>
        val digit = (j - 1) / 4 + 1
        val bit = 3 - ((j - 1) % 4)
        s"sum(CASE WHEN ((strpos('0123456789abcdef', substring(h, $digit, 1)) - 1) >> $bit) & 1 = 1 THEN 1 ELSE -1 END) AS b_$j"
      }.mkString(",\n         ")
      val bitChars = (1 to 64)
        .map(j => s"CASE WHEN b_$j > 0 THEN '1' ELSE '0' END")
        .mkString("concat(", ", ", ")")
      val chunks = Seq((0, 1, 13), (1, 14, 13), (2, 27, 13), (3, 40, 13), (4, 53, 12))
        .map { case (i, start, len) =>
          s"SELECT id, hi, lo, $i AS chunk, substring(simhash, $start, $len) AS bits FROM hl" }
        .mkString("\n  UNION ALL\n  ")
      s"""WITH e AS (
         |  SELECT doc_id AS id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
         |s AS (
         |  SELECT id,
         |         $bitSums
         |  FROM e GROUP BY id),
         |sh64 AS (SELECT id, $bitChars AS simhash FROM s),
         |hl AS (
         |  SELECT id, simhash,
         |         CAST(concat('0b', substring(simhash, 1, 32)) AS BIGINT) AS hi,
         |         CAST(concat('0b', substring(simhash, 33, 32)) AS BIGINT) AS lo
         |  FROM sh64),
         |chunks AS (
         |  $chunks)
         |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |       CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INTEGER) AS hamming
         |FROM chunks a JOIN chunks b
         |  ON a.chunk = b.chunk AND a.bits = b.bits AND a.id < b.id
         |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
         |ORDER BY id_a, id_b""".stripMargin
    },

    // Dedup ensemble: the three text-method dup sets (exact fingerprint,
    // minhash jaccard >= 0.7, simhash hamming <= 2) rebuilt from their
    // own oracle CTEs, merged as (doc, bit) rows into one aggregate.
    "q_dedup_ensemble" -> {
      val sigs = (1 to 6)
        .map(i => s"min(h1 + $i * h2) AS sig_$i")
        .mkString(",\n         ")
      val bands = (0 until 3)
        .map(b => s"SELECT id, $b AS band, concat_ws('|', CAST(sig_${2 * b + 1} AS VARCHAR), CAST(sig_${2 * b + 2} AS VARCHAR)) AS bucket FROM sigs")
        .mkString("\n  UNION ALL\n  ")
      val chunks = Seq((0, 1, 6), (1, 7, 5), (2, 12, 5))
        .map { case (i, start, len) =>
          s"SELECT id, v2, $i AS chunk, substring(simhash, $start, $len) AS bits FROM vv" }
        .mkString("\n  UNION ALL\n  ")
      s"""WITH $shinglesCte,
         |$shingleCountsCte,
         |sigs AS (
         |  SELECT id,
         |         $sigs
         |  FROM (SELECT id,
         |               CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h1,
         |               CAST(concat('0x', substring(md5(shingle), 17, 15)) AS BIGINT) AS h2
         |        FROM sh) GROUP BY id),
         |buckets AS (
         |  $bands),
         |mcand AS (
         |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |  FROM buckets x JOIN buckets y
         |    ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id),
         |minter AS (
         |  SELECT mcand.id_a, mcand.id_b, count(*) AS n_inter
         |  FROM mcand
         |  JOIN sh sa ON sa.id = mcand.id_a
         |  JOIN sh sb ON sb.id = mcand.id_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2),
         |mj AS (
         |  SELECT id_a, id_b FROM minter
         |  JOIN counts ca ON ca.id = id_a
         |  JOIN counts cb ON cb.id = id_b
         |  WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.7),
         |$simhashCte,
         |vv AS (SELECT id, simhash, CAST(concat('0b', simhash) AS BIGINT) AS v2 FROM sh16),
         |chunks AS (
         |  $chunks),
         |sp AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk = b.chunk AND a.bits = b.bits AND a.id < b.id
         |  WHERE bit_count(xor(a.v2, b.v2)) <= 2),
         |fpg AS (SELECT doc_id, $fpExpr AS fp FROM documents),
         |fk AS (SELECT fp, min(doc_id) AS keep FROM fpg GROUP BY 1),
         |ex AS (SELECT fpg.doc_id, 1 AS bit FROM fpg JOIN fk USING (fp)
         |       WHERE doc_id <> keep),
         |mh AS (SELECT DISTINCT id_b AS doc_id, 2 AS bit FROM mj),
         |shd AS (SELECT DISTINCT id_b AS doc_id, 4 AS bit FROM sp),
         |u AS (SELECT * FROM ex UNION ALL SELECT * FROM mh
         |      UNION ALL SELECT * FROM shd)
         |SELECT doc_id, CAST(sum(bit) AS BIGINT) AS method_mask,
         |       CAST(count(*) AS BIGINT) AS n_methods
         |FROM u GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "q_dedup_clusters" -> {
      // chunk layout mirrors Dedup.chunkBounds(16, 2) = (1,8),(9,8);
      // transitive closure via a recursive CTE (UNION dedups → fixpoint),
      // component id = min reachable node over the undirected edge set
      val chunks = Seq((0, 1, 8), (1, 9, 8))
        .map { case (i, start, len) =>
          s"SELECT id, v, $i AS chunk, substring(simhash, $start, $len) AS bits FROM v" }
        .mkString("\n  UNION ALL\n  ")
      s"""WITH RECURSIVE $simhashCte,
         |v AS (SELECT id, simhash, CAST(concat('0b', simhash) AS BIGINT) AS v FROM sh16),
         |chunks AS (
         |  $chunks),
         |p AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk = b.chunk AND a.bits = b.bits AND a.id < b.id
         |  WHERE bit_count(xor(a.v, b.v)) <= 1),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM p
         |       UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM eg
         |  UNION
         |  SELECT eg.dst AS id, reach.r AS r FROM reach JOIN eg ON eg.src = reach.id)
         |SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
         |ORDER BY doc_id""".stripMargin
    },

    // same cluster CTEs as q_dedup_clusters; apply = keep docs that are
    // not a non-minimum member of any cluster
    "q_dedup_apply" -> {
      val chunks = Seq((0, 1, 8), (1, 9, 8))
        .map { case (i, start, len) =>
          s"SELECT id, v, $i AS chunk, substring(simhash, $start, $len) AS bits FROM v" }
        .mkString("\n  UNION ALL\n  ")
      s"""WITH RECURSIVE $simhashCte,
         |v AS (SELECT id, simhash, CAST(concat('0b', simhash) AS BIGINT) AS v FROM sh16),
         |chunks AS (
         |  $chunks),
         |p AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk = b.chunk AND a.bits = b.bits AND a.id < b.id
         |  WHERE bit_count(xor(a.v, b.v)) <= 1),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM p
         |       UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM eg
         |  UNION
         |  SELECT eg.dst AS id, reach.r AS r FROM reach JOIN eg ON eg.src = reach.id),
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
         |SELECT d.doc_id FROM documents d
         |WHERE NOT EXISTS (SELECT 1 FROM cl
         |                  WHERE cl.id = d.doc_id AND cl.cluster_id <> d.doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    "q_normalize" ->
      """SELECT doc_id,
        |       trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
        |       CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[[:cntrl:]]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS INTEGER) AS n_tok
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks,
        |             unnest(range(1, greatest(len(toks), 1) + 1, 48)) AS st
        |      FROM t)
        |SELECT doc_id,
        |       CAST((st - 1) // 48 AS INTEGER) AS chunk_idx,
        |       array_to_string(list_slice(toks, st, st + 63), ' ') AS chunk_text,
        |       CAST(len(list_slice(toks, st, st + 63)) AS INTEGER) AS n_tok
        |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_contamination" ->
      s"""WITH $shinglesCte,
         |bench AS (SELECT DISTINCT shingle FROM sh WHERE id % 50 = 0)
         |SELECT c.id AS doc_id, count(*) AS n_shared
         |FROM sh c JOIN bench b ON c.shingle = b.shingle
         |WHERE c.id % 50 <> 0
         |GROUP BY c.id
         |ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" ->
      s"""WITH $shinglesCte,
         |$shingleCountsCte,
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2)
         |${jaccardSelect(0.8)}""".stripMargin,

    // Quality-vs-length Pareto front: the naive NOT-EXISTS dominance
    // check (quadratic — fine at oracle scale; the engine runs the
    // sorted-scan skyline instead).
    "q_pareto_front" -> {
      val hits = vocabHits(stop("en"))
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |         $hits AS hits,
         |         CASE WHEN length(text) > 0
         |              THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
         |              ELSE 0.0 END AS punct_ratio
         |  FROM documents),
         |p AS (
         |  SELECT doc_id,
         |         CAST(round(((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) * 0.4
         |           + least((CASE WHEN n_tokens > 0 THEN CAST(hits AS DOUBLE) / n_tokens ELSE 0.0 END) * 4.0, 1.0) * 0.4
         |           + (1.0 - punct_ratio) * 0.2) * 1000000.0) AS BIGINT) AS q_fp6,
         |         CAST(n_tokens AS BIGINT) AS n_tokens
         |  FROM t)
         |SELECT doc_id, q_fp6, n_tokens FROM p
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM p d
         |  WHERE d.q_fp6 >= p.q_fp6 AND d.n_tokens >= p.n_tokens
         |    AND (d.q_fp6 > p.q_fp6 OR d.n_tokens > p.n_tokens))
         |ORDER BY doc_id""".stripMargin
    },

    // Sorted-neighborhood blocking: two global ranks (normalized-prefix
    // key, reversed-prefix key; ties broken by doc_id — mirrors the
    // engine's range-partitioned exact rank), rank-window candidates
    // (y.r in (x.r, x.r + 5]), cross-pass dedup, exact-Jaccard verify.
    "q_sorted_blocking" -> {
      val normE = "trim(regexp_replace(regexp_replace(lower(text), " +
        "'[[:cntrl:]]', ' ', 'g'), ' +', ' ', 'g'))"
      s"""WITH $shinglesCte,
         |$shingleCountsCte,
         |nrm AS (SELECT doc_id, $normE AS nt FROM documents
         |        WHERE doc_id IN (SELECT id FROM sh)),
         |r1 AS (SELECT doc_id, row_number() OVER (
         |          ORDER BY substring(nt, 1, 12), doc_id) AS r FROM nrm),
         |r2 AS (SELECT doc_id, row_number() OVER (
         |          ORDER BY substring(reverse(nt), 1, 12), doc_id) AS r FROM nrm),
         |cand AS (
         |  SELECT DISTINCT least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b
         |  FROM (
         |    SELECT x.doc_id AS id_a, y.doc_id AS id_b
         |    FROM r1 x JOIN r1 y ON y.r > x.r AND y.r <= x.r + 5
         |    UNION ALL
         |    SELECT x.doc_id AS id_a, y.doc_id AS id_b
         |    FROM r2 x JOIN r2 y ON y.r > x.r AND y.r <= x.r + 5)),
         |inter AS (
         |  SELECT cand.id_a, cand.id_b, count(*) AS n_inter
         |  FROM cand
         |  JOIN sh sa ON sa.id = cand.id_a
         |  JOIN sh sb ON sb.id = cand.id_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2)
         |${jaccardSelect(0.8)}""".stripMargin
    },

    "q_minhash_lsh" -> {
      // double-hash permutations: one md5 per shingle, 60-bit halves
      val sigs = (1 to 6)
        .map(i => s"min(h1 + $i * h2) AS sig_$i")
        .mkString(",\n         ")
      val bands = (0 until 3)
        .map(b => s"SELECT id, $b AS band, concat_ws('|', CAST(sig_${2 * b + 1} AS VARCHAR), CAST(sig_${2 * b + 2} AS VARCHAR)) AS bucket FROM sigs")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH $shinglesCte,
         |$shingleCountsCte,
         |sigs AS (
         |  SELECT id,
         |         $sigs
         |  FROM (SELECT id,
         |               CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h1,
         |               CAST(concat('0x', substring(md5(shingle), 17, 15)) AS BIGINT) AS h2
         |        FROM sh) GROUP BY id),
         |buckets AS (
         |  $bands),
         |cand AS (
         |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |  FROM buckets x JOIN buckets y
         |    ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id),
         |inter AS (
         |  SELECT cand.id_a, cand.id_b, count(*) AS n_inter
         |  FROM cand
         |  JOIN sh sa ON sa.id = cand.id_a
         |  JOIN sh sb ON sb.id = cand.id_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2)
         |${jaccardSelect(0.7)}""".stripMargin
    },

    // MinHash estimator calibration: per match-count bucket the exact
    // true-Jaccard mean/min/max permille over the candidate pairs.
    "q_minhash_calibration" -> {
      val sigs = (1 to 6)
        .map(i => s"min(h1 + $i * h2) AS sig_$i")
        .mkString(",\n         ")
      val bands = (0 until 3)
        .map(b => s"SELECT id, $b AS band, concat_ws('|', CAST(sig_${2 * b + 1} AS VARCHAR), CAST(sig_${2 * b + 2} AS VARCHAR)) AS bucket FROM sigs")
        .mkString("\n  UNION ALL\n  ")
      val matches = (1 to 6)
        .map(i => s"CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $shinglesCte,
         |$shingleCountsCte,
         |sigs AS (
         |  SELECT id,
         |         $sigs
         |  FROM (SELECT id,
         |               CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h1,
         |               CAST(concat('0x', substring(md5(shingle), 17, 15)) AS BIGINT) AS h2
         |        FROM sh) GROUP BY id),
         |buckets AS (
         |  $bands),
         |cand AS (
         |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |  FROM buckets x JOIN buckets y
         |    ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id),
         |m AS (
         |  SELECT cand.id_a, cand.id_b, CAST($matches AS INTEGER) AS n_matches
         |  FROM cand JOIN sigs a ON a.id = cand.id_a
         |            JOIN sigs b ON b.id = cand.id_b),
         |inter AS (
         |  SELECT cand.id_a, cand.id_b, count(*) AS n_inter
         |  FROM cand
         |  JOIN sh sa ON sa.id = cand.id_a
         |  JOIN sh sb ON sb.id = cand.id_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2),
         |pj AS (
         |  SELECT m.n_matches,
         |         CAST((1000 * COALESCE(i.n_inter, 0))
         |              // (ca.n_sh + cb.n_sh - COALESCE(i.n_inter, 0)) AS BIGINT)
         |           AS jp
         |  FROM m
         |  LEFT JOIN inter i ON i.id_a = m.id_a AND i.id_b = m.id_b
         |  JOIN counts ca ON ca.id = m.id_a
         |  JOIN counts cb ON cb.id = m.id_b)
         |SELECT n_matches, CAST(count(*) AS BIGINT) AS n_pairs,
         |       CAST(sum(jp) // count(*) AS BIGINT) AS mean_true_permille,
         |       CAST(min(jp) AS BIGINT) AS min_true_permille,
         |       CAST(max(jp) AS BIGINT) AS max_true_permille
         |FROM pj GROUP BY 1 ORDER BY n_matches""".stripMargin
    },

    // Banding-quality eval: q_minhash_lsh's sigs/buckets CTEs generate
    // the DISTINCT candidate set; truth = the full quadratic
    // exact-Jaccard >= 0.7 pairs; integer-permille precision/recall.
    "q_dedup_eval" -> {
      val sigs = (1 to 6)
        .map(i => s"min(h1 + $i * h2) AS sig_$i")
        .mkString(",\n         ")
      val bands = (0 until 3)
        .map(b => s"SELECT id, $b AS band, concat_ws('|', CAST(sig_${2 * b + 1} AS VARCHAR), CAST(sig_${2 * b + 2} AS VARCHAR)) AS bucket FROM sigs")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH $shinglesCte,
         |$shingleCountsCte,
         |sigs AS (
         |  SELECT id,
         |         $sigs
         |  FROM (SELECT id,
         |               CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h1,
         |               CAST(concat('0x', substring(md5(shingle), 17, 15)) AS BIGINT) AS h2
         |        FROM sh) GROUP BY id),
         |buckets AS (
         |  $bands),
         |cand AS (
         |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |  FROM buckets x JOIN buckets y
         |    ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN counts ca ON ca.id = id_a
         |  JOIN counts cb ON cb.id = id_b
         |  WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.7),
         |tp AS (SELECT 1 FROM cand JOIN truth USING (id_a, id_b)),
         |s AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
         |             (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
         |             (SELECT CAST(count(*) AS BIGINT) FROM tp) AS n_tp)
         |SELECT n_truth, n_cand, n_tp,
         |       CAST(n_tp * 1000 // n_cand AS BIGINT) AS precision_permille,
         |       CAST(n_tp * 1000 // n_truth AS BIGINT) AS recall_permille
         |FROM s""".stripMargin
    },

    // Incremental near-dup: same sigs/banding CTEs, but candidates are
    // batch (id%10==0) × store (id%10<>0) only; exact-Jaccard verify.
    "q_incremental_neardup" -> {
      val sigs = (1 to 6)
        .map(i => s"min(h1 + $i * h2) AS sig_$i")
        .mkString(",\n         ")
      val bands = (0 until 3)
        .map(b => s"SELECT id, $b AS band, concat_ws('|', CAST(sig_${2 * b + 1} AS VARCHAR), CAST(sig_${2 * b + 2} AS VARCHAR)) AS bucket FROM sigs")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH $shinglesCte,
         |$shingleCountsCte,
         |sigs AS (
         |  SELECT id,
         |         $sigs
         |  FROM (SELECT id,
         |               CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h1,
         |               CAST(concat('0x', substring(md5(shingle), 17, 15)) AS BIGINT) AS h2
         |        FROM sh) GROUP BY id),
         |buckets AS (
         |  $bands),
         |cand AS (
         |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
         |  FROM buckets x JOIN buckets y
         |    ON x.band = y.band AND x.bucket = y.bucket
         |  WHERE x.id % 10 = 0 AND y.id % 10 <> 0),
         |inter AS (
         |  SELECT cand.id_a, cand.id_b, count(*) AS n_inter
         |  FROM cand
         |  JOIN sh sa ON sa.id = cand.id_a
         |  JOIN sh sb ON sb.id = cand.id_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2)
         |${jaccardSelect(0.5)}""".stripMargin
    },

    // BPE training, three rounds unrolled CTE-for-CTE: the guard-wrapped
    // string makes the merge apply a plain leftmost non-overlapping
    // replace (identical greedy semantics on both engines).
    "q_bpe_train" -> {
      def round(t: Int) =
        s"""p$t AS (
           |  SELECT toks, unnest(range(1, len(toks))) AS i
           |  FROM (SELECT string_split(substr(s, 2, length(s) - 2), ')(') AS toks
           |        FROM s${t - 1})
           |  WHERE len(toks) >= 2),
           |c$t AS (SELECT toks[i] AS w1, toks[i + 1] AS w2,
           |               CAST(count(*) AS BIGINT) AS c FROM p$t GROUP BY 1, 2),
           |m$t AS (SELECT w1, w2, c FROM c$t ORDER BY c DESC, w1, w2 LIMIT 1),
           |s$t AS (SELECT replace(s${t - 1}.s, '(' || m$t.w1 || ')(' || m$t.w2 || ')',
           |                       '(' || m$t.w1 || ' ' || m$t.w2 || ')') AS s
           |        FROM s${t - 1}, m$t)""".stripMargin
      s"""WITH s0 AS (SELECT '(' || replace(text, ' ', ')(') || ')' AS s FROM documents),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT CAST(1 AS INTEGER) AS merge_rank, w1, w2, c AS pair_count FROM m1
         |UNION ALL SELECT CAST(2 AS INTEGER), w1, w2, c FROM m2
         |UNION ALL SELECT CAST(3 AS INTEGER), w1, w2, c FROM m3
         |ORDER BY merge_rank""".stripMargin
    },

    // BPE apply: same unrolled merge chain, with doc_id carried through
    // the per-round replace; before/after token counts per document.
    "q_bpe_apply" -> {
      def round(t: Int) =
        s"""p$t AS (
           |  SELECT toks, unnest(range(1, len(toks))) AS i
           |  FROM (SELECT string_split(substr(s, 2, length(s) - 2), ')(') AS toks
           |        FROM s${t - 1})
           |  WHERE len(toks) >= 2),
           |c$t AS (SELECT toks[i] AS w1, toks[i + 1] AS w2,
           |               CAST(count(*) AS BIGINT) AS c FROM p$t GROUP BY 1, 2),
           |m$t AS (SELECT w1, w2, c FROM c$t ORDER BY c DESC, w1, w2 LIMIT 1),
           |s$t AS (SELECT s${t - 1}.doc_id, s${t - 1}.text,
           |               replace(s${t - 1}.s, '(' || m$t.w1 || ')(' || m$t.w2 || ')',
           |                       '(' || m$t.w1 || ' ' || m$t.w2 || ')') AS s
           |        FROM s${t - 1}, m$t)""".stripMargin
      s"""WITH s0 AS (SELECT doc_id, text,
         |                   '(' || replace(text, ' ', ')(') || ')' AS s
         |            FROM documents),
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT doc_id,
         |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok_before,
         |       CAST(len(string_split(substr(s, 2, length(s) - 2), ')(')) AS BIGINT) AS n_tok_after
         |FROM s3 ORDER BY doc_id""".stripMargin
    },

    // word2phrase lift in integer permille over the pair + unigram
    // histograms; top-20 with (w1, w2) tie-break (unique per row, so the
    // cut is deterministic).
    "q_phrase_mining" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |pr AS (
        |  SELECT toks, unnest(range(1, len(toks))) AS i FROM tk
        |  WHERE len(toks) >= 2),
        |cab AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2,
        |         CAST(count(*) AS BIGINT) AS c_ab
        |  FROM pr GROUP BY 1, 2
        |  HAVING count(*) >= 10),
        |uni AS (SELECT unnest(toks) AS w FROM tk),
        |cu AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM uni)
        |SELECT w1, w2, c_ab, ca.c AS c_a, cb.c AS c_b,
        |       CAST((c_ab - 5) * 1000 * n.n_tok // (ca.c * cb.c) AS BIGINT) AS score_permille
        |FROM cab JOIN cu ca ON ca.w = cab.w1
        |         JOIN cu cb ON cb.w = cab.w2, n
        |ORDER BY score_permille DESC, w1, w2 LIMIT 20""".stripMargin,

    "q_posexplode" ->
      """SELECT vec_id, CAST(t.i - 1 AS INTEGER) AS pos, embedding[t.i] AS component
        |FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
        |ORDER BY vec_id, pos""".stripMargin,

    "q_cosine_topk" ->
      s"""WITH $fpVecCte,
         |sc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         |         ${cosineExpr("q", "c")} AS cosine
         |  FROM nv q, nv c
         |  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id AND q.nn > 0 AND c.nn > 0),
         |r AS (
         |  SELECT query_id, match_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cosine DESC, match_id ASC) AS INTEGER) AS "rank"
         |  FROM sc)
         |SELECT query_id, match_id, cosine, "rank" FROM r WHERE "rank" <= 10
         |ORDER BY query_id, "rank"""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id),
         |sc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         |         ${cosineExpr("q", "c")} AS cosine
         |  FROM v q JOIN v c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 5 AND q.nn > 0 AND c.nn > 0),
         |r AS (
         |  SELECT query_id, match_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cosine DESC, match_id ASC) AS INTEGER) AS "rank"
         |  FROM sc)
         |SELECT query_id, match_id, cosine, "rank" FROM r WHERE "rank" <= 5
         |ORDER BY query_id, "rank"""".stripMargin,

    // multi-probe: the query's own bucket plus each Hamming-1 neighbor
    // (one bit flipped); the corpus keeps one bucket per vector
    "q_ann_lsh_mp" -> {
      val flips = (1 to 4).map { i =>
        val flipped = s"CASE substring(bucket, $i, 1) WHEN '1' THEN '0' ELSE '1' END"
        s"SELECT vec_id, concat(substring(bucket, 1, ${i - 1}), $flipped, substring(bucket, ${i + 1})) AS bucket FROM b WHERE vec_id < 5"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |probes AS (
         |  SELECT vec_id, bucket FROM b WHERE vec_id < 5
         |  UNION ALL
         |  $flips),
         |$fpVecCte,
         |q AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN probes ON nv.vec_id = probes.vec_id),
         |c AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id),
         |sc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         |         ${cosineExpr("q", "c")} AS cosine
         |  FROM q JOIN c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.nn > 0 AND c.nn > 0),
         |r AS (
         |  SELECT query_id, match_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cosine DESC, match_id ASC) AS INTEGER) AS "rank"
         |  FROM sc)
         |SELECT query_id, match_id, cosine, "rank" FROM r WHERE "rank" <= 5
         |ORDER BY query_id, "rank"""".stripMargin
    },

    // radius-2 multi-probe: the query's own bucket plus every key within
    // TWO bit flips (4 singles + 6 pairs at the pinned 4-bit gate width =
    // 11 probe keys) — the mirror of the engine's plan-time Hamming-ball
    // expansion exactly as q_ann_lsh_mp mirrors radius 1; corpus side
    // unchanged (one bucket per vector), probe keys distinct so each
    // (query, corpus) pair joins at most once
    "q_ann_lsh_mp_r2" -> {
      // flip the (sorted, 1-based) positions of `bucket` in one concat
      def flipExpr(pos: Seq[Int]): String = {
        def flip(i: Int) = s"CASE substring(bucket, $i, 1) WHEN '1' THEN '0' ELSE '1' END"
        val parts = scala.collection.mutable.ListBuffer[String]()
        var prev = 0
        pos.foreach { i =>
          if (i - 1 > prev) parts += s"substring(bucket, ${prev + 1}, ${i - 1 - prev})"
          parts += flip(i)
          prev = i
        }
        if (prev < 4) parts += s"substring(bucket, ${prev + 1})"
        parts.mkString("concat(", ", ", ")")
      }
      val flips = ((1 to 4).map(i => Seq(i)) ++
        (1 to 4).combinations(2).map(_.toSeq)).map { pos =>
        s"SELECT vec_id, ${flipExpr(pos)} AS bucket FROM b WHERE vec_id < 5"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |probes AS (
         |  SELECT vec_id, bucket FROM b WHERE vec_id < 5
         |  UNION ALL
         |  $flips),
         |$fpVecCte,
         |q AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN probes ON nv.vec_id = probes.vec_id),
         |c AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id),
         |sc AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         |         ${cosineExpr("q", "c")} AS cosine
         |  FROM q JOIN c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.nn > 0 AND c.nn > 0),
         |r AS (
         |  SELECT query_id, match_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cosine DESC, match_id ASC) AS INTEGER) AS "rank"
         |  FROM sc)
         |SELECT query_id, match_id, cosine, "rank" FROM r WHERE "rank" <= 5
         |ORDER BY query_id, "rank"""".stripMargin
    },

    // L = 4 independent tables: table l buckets on components
    // [l*4 + 1, l*4 + 4] (axis-disjoint banks — the mirror of the
    // engine's signBucketAt offsets), candidates are the (tbl, bucket)
    // equi-join unioned across banks, deduped per (query, match) pair
    // (cosine is a pure function of the pair, so DISTINCT over the
    // triple is the exact pair dedup) before the shared
    // (cosine DESC, match_id ASC) top-5 — the independent mirror of
    // lshTopKMultiTable, not a hash back-feed
    "q_ann_lsh_t4" -> {
      def bucketAtExpr(off: Int): String =
        (1 to 4).map(i => s"CASE WHEN embedding[${off + i}] >= 0 THEN '1' ELSE '0' END")
          .mkString("concat(", ", ", ")")
      val banks = (0 until 4).map(l =>
        s"SELECT vec_id, $l AS tbl, ${bucketAtExpr(l * 4)} AS bucket FROM embeddings")
        .mkString("\n  UNION ALL\n  ")
      s"""WITH b AS (
         |  $banks),
         |$fpVecCte,
         |q AS (SELECT nv.vec_id, fv, nn, tbl, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id
         |      WHERE nv.vec_id < 5),
         |c AS (SELECT nv.vec_id, fv, nn, tbl, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id),
         |sc AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS match_id,
         |         ${cosineExpr("q", "c")} AS cosine
         |  FROM q JOIN c ON q.tbl = c.tbl AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.nn > 0 AND c.nn > 0),
         |r AS (
         |  SELECT query_id, match_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cosine DESC, match_id ASC) AS INTEGER) AS "rank"
         |  FROM sc)
         |SELECT query_id, match_id, cosine, "rank" FROM r WHERE "rank" <= 5
         |ORDER BY query_id, "rank"""".stripMargin
    },

    "q_ann_ivf" -> {
      val cosQC =
        "CAST(list_sum(list_transform(range(1, len(q_v) + 1), i -> q_v[i] * c_v[i])) AS DOUBLE)" +
          " / (sqrt(CAST(q_n AS DOUBLE)) * sqrt(CAST(c_n AS DOUBLE)))"
      val centCos =
        "CAST(list_sum(list_transform(range(1, len(v.fv) + 1), i -> v.fv[i] * cents.cent_v[i])) AS DOUBLE)" +
          " / (sqrt(CAST(v.nn AS DOUBLE)) * sqrt(CAST(cents.cent_n AS DOUBLE)))"
      s"""WITH $fpVecCte,
         |cents AS (SELECT vec_id AS cent_id, fv AS cent_v, nn AS cent_n
         |          FROM nv WHERE vec_id < 16 AND nn > 0),
         |casgn AS (
         |  SELECT c_id, c_v, c_n, cent_id FROM (
         |    SELECT v.vec_id AS c_id, v.fv AS c_v, v.nn AS c_n, cents.cent_id,
         |           row_number() OVER (PARTITION BY v.vec_id
         |                              ORDER BY $centCos DESC, cents.cent_id ASC) AS r
         |    FROM nv v, cents WHERE v.nn > 0)
         |  WHERE r = 1),
         |qasgn AS (
         |  SELECT q_id, q_v, q_n, cent_id FROM (
         |    SELECT v.vec_id AS q_id, v.fv AS q_v, v.nn AS q_n, cents.cent_id,
         |           row_number() OVER (PARTITION BY v.vec_id
         |                              ORDER BY $centCos DESC, cents.cent_id ASC) AS r
         |    FROM nv v, cents WHERE v.nn > 0 AND v.vec_id < 5)
         |  WHERE r <= 4),
         |sc AS (
         |  SELECT DISTINCT q_id AS query_id, c_id AS match_id, $cosQC AS cosine
         |  FROM qasgn JOIN casgn USING (cent_id) WHERE c_id <> q_id),
         |r AS (
         |  SELECT query_id, match_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cosine DESC, match_id ASC) AS INTEGER) AS "rank"
         |  FROM sc)
         |SELECT query_id, match_id, cosine, "rank" FROM r WHERE "rank" <= 5
         |ORDER BY query_id, "rank"""".stripMargin
    },

    // Trained-IVF mirror: two unrolled Lloyd iterations of the
    // deterministic integer-mean spherical k-means (init = 8 smallest-id
    // non-zero vectors, assignment = (cosine DESC, cent_id ASC) argmax,
    // update = truncating integer mean — DuckDB's `//` truncates toward
    // zero exactly like the engine's Long division — empty clusters keep
    // their previous centroid), then the IVF probe/scan of q_ann_ivf
    // against the trained centroids.
    "q_ann_ivf_trained" -> {
      def vcCos(v: String, c: String) =
        s"CAST(list_sum(list_transform(range(1, len($v.fv) + 1), i -> $v.fv[i] * $c.cent_v[i])) AS DOUBLE)" +
          s" / (sqrt(CAST($v.nn AS DOUBLE)) * sqrt(CAST($c.cent_n AS DOUBLE)))"
      val cosQC =
        "CAST(list_sum(list_transform(range(1, len(q_v) + 1), i -> q_v[i] * c_v[i])) AS DOUBLE)" +
          " / (sqrt(CAST(q_n AS DOUBLE)) * sqrt(CAST(c_n AS DOUBLE)))"
      // one Lloyd iteration: assign to prev centroids, integer-mean update
      def iter(i: Int, prev: String): String =
        s"""a$i AS (
           |  SELECT c_id, c_v, cent_id FROM (
           |    SELECT v.vec_id AS c_id, v.fv AS c_v, c.cent_id,
           |           row_number() OVER (PARTITION BY v.vec_id
           |                              ORDER BY ${vcCos("v", "c")} DESC,
           |                                       c.cent_id ASC) AS r
           |    FROM nv v, $prev c WHERE v.nn > 0)
           |  WHERE r = 1),
           |e$i AS (SELECT cent_id, unnest(range(1, len(c_v) + 1)) AS pos,
           |               unnest(c_v) AS val FROM a$i),
           |s$i AS (SELECT cent_id, pos, CAST(sum(val) AS BIGINT) AS s,
           |               count(*) AS n FROM e$i GROUP BY cent_id, pos),
           |m$i AS (SELECT cent_id, list(CAST(s // n AS BIGINT) ORDER BY pos) AS cent_v
           |        FROM s$i GROUP BY cent_id),
           |c$i AS (
           |  SELECT p.cent_id, coalesce(m.cent_v, p.cent_v) AS cent_v,
           |         CAST(list_sum(list_transform(coalesce(m.cent_v, p.cent_v),
           |                                      x -> x * x)) AS BIGINT) AS cent_n
           |  FROM $prev p LEFT JOIN m$i m USING (cent_id))""".stripMargin
      s"""WITH $fpVecCte,
         |c0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cent_id,
         |         fv AS cent_v, nn AS cent_n
         |  FROM (SELECT vec_id, fv, nn FROM nv WHERE nn > 0 ORDER BY vec_id LIMIT 8)),
         |${iter(1, "c0")},
         |${iter(2, "c1")},
         |cents AS (SELECT cent_id, cent_v, cent_n FROM c2 WHERE cent_n > 0),
         |casgn AS (
         |  SELECT c_id, c_v, c_n, cent_id FROM (
         |    SELECT v.vec_id AS c_id, v.fv AS c_v, v.nn AS c_n, cents.cent_id,
         |           row_number() OVER (PARTITION BY v.vec_id
         |                              ORDER BY ${vcCos("v", "cents")} DESC,
         |                                       cents.cent_id ASC) AS r
         |    FROM nv v, cents WHERE v.nn > 0)
         |  WHERE r = 1),
         |qasgn AS (
         |  SELECT q_id, q_v, q_n, cent_id FROM (
         |    SELECT v.vec_id AS q_id, v.fv AS q_v, v.nn AS q_n, cents.cent_id,
         |           row_number() OVER (PARTITION BY v.vec_id
         |                              ORDER BY ${vcCos("v", "cents")} DESC,
         |                                       cents.cent_id ASC) AS r
         |    FROM nv v, cents WHERE v.nn > 0 AND v.vec_id < 5)
         |  WHERE r <= 4),
         |sc AS (
         |  SELECT DISTINCT q_id AS query_id, c_id AS match_id, $cosQC AS cosine
         |  FROM qasgn JOIN casgn USING (cent_id) WHERE c_id <> q_id),
         |r AS (
         |  SELECT query_id, match_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cosine DESC, match_id ASC) AS INTEGER) AS "rank"
         |  FROM sc)
         |SELECT query_id, match_id, cosine, "rank" FROM r WHERE "rank" <= 5
         |ORDER BY query_id, "rank"""".stripMargin
    },

    "q_embed_neardup" ->
      s"""WITH b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id)
         |SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         |       ${cosineExpr("x", "y")} AS cosine
         |FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE x.nn > 0 AND y.nn > 0
         |  AND ${cosineExpr("x", "y")} >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    // kNN graph: bucket-mate scoring mirrored, per-source row_number
    // with the (cosine DESC, id ASC) contract of TopKByScore.
    "q_knn_graph" ->
      s"""WITH b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id
         |      WHERE nn > 0),
         |sc AS (
         |  SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
         |         ${cosineExpr("x", "y")} AS cosine
         |  FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |r AS (
         |  SELECT src_id, dst_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY src_id
         |                                 ORDER BY cosine DESC, dst_id ASC) AS INTEGER) AS "rank"
         |  FROM sc)
         |SELECT src_id, dst_id, cosine, "rank" FROM r WHERE "rank" <= 3
         |ORDER BY src_id, "rank"""".stripMargin,

    // kNN-graph label propagation: the q_knn_graph edge CTE (rank <= 3)
    // + 2 unrolled hard-majority rounds; the majority argmax mirrors
    // the engine's max(struct(c, -label)) as row_number ORDER BY
    // (c DESC, lab ASC). Integer-exact end to end.
    "q_label_prop" -> {
      def round(r: Int): String =
        s"""v$r AS MATERIALIZED (
           |  SELECT e.src, c.lab, CAST(count(*) AS BIGINT) AS c
           |  FROM edges e JOIN lp${r - 1} c ON c.id = e.dst
           |  WHERE c.lab IS NOT NULL GROUP BY 1, 2),
           |w$r AS MATERIALIZED (
           |  SELECT src AS id, lab AS wlab FROM (
           |    SELECT src, lab,
           |           row_number() OVER (PARTITION BY src ORDER BY c DESC, lab ASC) AS rn
           |    FROM v$r)
           |  WHERE rn = 1),
           |lp$r AS MATERIALIZED (
           |  SELECT p.id, COALESCE(p.lab, w.wlab) AS lab,
           |         CASE WHEN p.lab IS NOT NULL THEN p.rnd
           |              WHEN w.wlab IS NOT NULL THEN $r ELSE -1 END AS rnd
           |  FROM lp${r - 1} p LEFT JOIN w$r w ON w.id = p.id)""".stripMargin
      s"""WITH b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id
         |      WHERE nn > 0),
         |sc AS (
         |  SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
         |         ${cosineExpr("x", "y")} AS cosine
         |  FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |r AS (
         |  SELECT src_id, dst_id,
         |         CAST(row_number() OVER (PARTITION BY src_id
         |                                 ORDER BY cosine DESC, dst_id ASC) AS INTEGER) AS "rank"
         |  FROM sc),
         |edges AS MATERIALIZED (SELECT src_id AS src, dst_id AS dst FROM r WHERE "rank" <= 3),
         |lp0 AS MATERIALIZED (
         |  SELECT vec_id AS id,
         |         CASE WHEN vec_id % 17 = 0 THEN label END AS lab,
         |         CASE WHEN vec_id % 17 = 0 THEN 0 ELSE -1 END AS rnd
         |  FROM embeddings),
         |${round(1)},
         |${round(2)}
         |SELECT id AS vec_id,
         |       CAST(COALESCE(lab, -1) AS INTEGER) AS prop_label,
         |       CAST(rnd AS INTEGER) AS round_labeled
         |FROM lp2 ORDER BY vec_id""".stripMargin
    },

    // kNN-graph k-core peel: the q_knn_graph edge CTE canonicalized
    // undirected + 3 unrolled peel rounds at k=4; per round, degrees are
    // recomputed over the surviving subgraph and deg<4 vertices peel.
    // Survivors report their round-3 degree (the engine's uniform
    // "degree at the last round the vertex participated in" contract).
    "q_kcore" -> {
      def round(r: Int): String =
        s"""e$r AS MATERIALIZED (
           |  SELECT und.a, und.b FROM und
           |  JOIN s${r - 1} sa ON und.a = sa.id
           |  JOIN s${r - 1} sb ON und.b = sb.id),
           |d$r AS MATERIALIZED (
           |  SELECT s.id, CAST(COALESCE(c.c, 0) AS BIGINT) AS deg
           |  FROM s${r - 1} s LEFT JOIN (
           |    SELECT id, count(*) AS c FROM (
           |      SELECT a AS id FROM e$r UNION ALL SELECT b AS id FROM e$r)
           |    GROUP BY 1) c ON c.id = s.id),
           |p$r AS MATERIALIZED (
           |  SELECT id, $r AS peel_round, deg AS last_deg FROM d$r WHERE deg < 4),
           |s$r AS MATERIALIZED (SELECT id, deg FROM d$r WHERE deg >= 4)""".stripMargin
      s"""WITH b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id
         |      WHERE nn > 0),
         |sc AS (
         |  SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
         |         ${cosineExpr("x", "y")} AS cosine
         |  FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |r AS (
         |  SELECT src_id, dst_id,
         |         CAST(row_number() OVER (PARTITION BY src_id
         |                                 ORDER BY cosine DESC, dst_id ASC) AS INTEGER) AS "rank"
         |  FROM sc),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT least(src_id, dst_id) AS a, greatest(src_id, dst_id) AS b
         |  FROM r WHERE "rank" <= 3 AND src_id <> dst_id),
         |s0 AS MATERIALIZED (SELECT DISTINCT vec_id AS id FROM embeddings),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT id AS vec_id, CAST(peel_round AS INTEGER) AS peel_round,
         |       CAST(last_deg AS BIGINT) AS last_deg
         |FROM (
         |  SELECT id, -1 AS peel_round, deg AS last_deg FROM s3
         |  UNION ALL SELECT id, peel_round, last_deg FROM p1
         |  UNION ALL SELECT id, peel_round, last_deg FROM p2
         |  UNION ALL SELECT id, peel_round, last_deg FROM p3)
         |ORDER BY vec_id""".stripMargin
    },

    // Skew diagnostics: per-key histogram, top-5 heavy hitters, shape
    // stats; skew divides by the integer mean to stay BIGINT-safe.
    "q_skew_report" ->
      """WITH c AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |             CAST(sum(c) AS BIGINT) AS n_rows,
        |             CAST(max(c) AS BIGINT) AS max_c FROM c),
        |t5 AS (SELECT user_id, c FROM c ORDER BY c DESC, user_id LIMIT 5)
        |SELECT t5.user_id, t5.c AS n_events,
        |       CAST(t5.c * 1000 // s.n_rows AS BIGINT) AS share_permille,
        |       s.n_keys, s.n_rows, s.max_c,
        |       CAST(s.max_c * 1000 // (s.n_rows // s.n_keys) AS BIGINT) AS skew_milli
        |FROM t5, s ORDER BY n_events DESC, user_id""".stripMargin,

    // SemDeDup apply: the q_embed_neardup pair CTE feeds a recursive
    // transitive closure (component id = min reachable vector over the
    // undirected near-dup edge set), then every vector left-joins its
    // cluster; keep = cluster minimum (vectors in no cluster keep
    // themselves).
    "q_semdedup" ->
      s"""WITH RECURSIVE b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id),
         |p AS (
         |  SELECT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |  WHERE x.nn > 0 AND y.nn > 0 AND ${cosineExpr("x", "y")} >= 0.4),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM p
         |       UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM eg
         |  UNION
         |  SELECT eg.dst AS id, reach.r AS r FROM reach JOIN eg ON eg.src = reach.id),
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
         |SELECT e.vec_id,
         |       COALESCE(cl.cluster_id, e.vec_id) AS cluster_id,
         |       COALESCE(cl.cluster_id, e.vec_id) = e.vec_id AS keep
         |FROM embeddings e LEFT JOIN cl ON cl.id = e.vec_id
         |ORDER BY e.vec_id""".stripMargin,

    // ---- corpus-mixing / serving tier (round 7) -------------------------

    // Largest-remainder allocation: all-integer after the IEEE-exact
    // ⌊√count⌋ weight, so both engines agree bit-for-bit and Σalloc = B.
    "q_budget_alloc" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |w AS (SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
        |             CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS w_int FROM c),
        |z AS (SELECT CAST(sum(w_int) AS BIGINT) AS z FROM w),
        |a AS (SELECT source, n_docs, w_int,
        |             w_int * 12345 // z AS base,
        |             w_int * 12345 % z AS rem
        |      FROM w, z),
        |t AS (SELECT CAST(sum(base) AS BIGINT) AS sb FROM a),
        |r AS (SELECT a.*, row_number() OVER (ORDER BY rem DESC, source) AS rk, t.sb
        |      FROM a, t)
        |SELECT source, n_docs, w_int,
        |       CAST(base + CASE WHEN rk <= 12345 - sb THEN 1 ELSE 0 END AS BIGINT) AS alloc
        |FROM r ORDER BY source""".stripMargin,

    // Epoch-aware data-constrained mix plan: per-source (Σ tokens, mean
    // fp6 quality) → epochs 1..4 exploded, greedily ordered by the
    // integer key q_fp6·2^(4−e) (= q·2^−(e−1) compared without
    // division), budget-prefix allocation with a partial boundary unit.
    "q_epoch_mix" -> {
      val hits = vocabHits(stop("en"))
      s"""WITH t AS (
         |  SELECT source,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |         $hits AS hits,
         |         CASE WHEN length(text) > 0
         |              THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
         |              ELSE 0.0 END AS punct_ratio
         |  FROM documents),
         |q AS (
         |  SELECT source, nt,
         |         CAST(round(((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) * 0.4
         |           + least((CASE WHEN n_tokens > 0 THEN CAST(hits AS DOUBLE) / n_tokens ELSE 0.0 END) * 4.0, 1.0) * 0.4
         |           + (1.0 - punct_ratio) * 0.2) * 1000000.0) AS BIGINT) AS q6
         |  FROM t),
         |s AS (
         |  SELECT source, CAST(sum(nt) AS BIGINT) AS toks,
         |         CAST(sum(q6) // count(*) AS BIGINT) AS q_fp6
         |  FROM q GROUP BY 1),
         |u AS (
         |  SELECT source, toks, q_fp6, unnest(range(1, 5)) AS epoch FROM s),
         |o AS (
         |  SELECT source, toks, q_fp6, epoch,
         |         q_fp6 * (CAST(1 AS BIGINT) << (4 - epoch)) AS okey FROM u),
         |c AS (
         |  SELECT source, toks, q_fp6, epoch,
         |         COALESCE(sum(toks) OVER (ORDER BY okey DESC, source, epoch
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM o)
         |SELECT source, CAST(epoch AS INTEGER) AS epoch,
         |       CAST(q_fp6 // (CAST(1 AS BIGINT) << (epoch - 1)) AS BIGINT) AS value_fp6,
         |       CAST(greatest(0, least(toks, 60000 - cb)) AS BIGINT) AS alloc_tokens
         |FROM c
         |WHERE greatest(0, least(toks, 60000 - cb)) > 0
         |ORDER BY source, epoch""".stripMargin
    },

    // Hellinger² needs only sqrt/div/mul — all correctly rounded under
    // IEEE 754, so per-term doubles are bit-identical across engines;
    // they are fixed-pointed (1e12) and summed as integers, and the
    // unmatched corpus mass enters in closed form from the exact
    // matched-count sum. Expression shape mirrors Mixing.domainDivergence
    // operation-for-operation (same associativity).
    "q_domain_divergence" -> {
      val dExpr =
        """(sqrt(CAST(c.c_st AS DOUBLE) / CAST(ts.tot_s AS DOUBLE))
          |                   - sqrt(CAST(ct.c_t AS DOUBLE) / CAST(tc.tot_c AS DOUBLE)))""".stripMargin
      s"""WITH st AS (
         |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
         |c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c_st FROM st GROUP BY 1, 2),
         |ct AS (SELECT term, CAST(sum(c_st) AS BIGINT) AS c_t FROM c GROUP BY 1),
         |tc AS (SELECT CAST(sum(c_t) AS BIGINT) AS tot_c FROM ct),
         |ts AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS tot_s FROM c GROUP BY 1),
         |j AS (
         |  SELECT c.source, ts.tot_s, tc.tot_c, ct.c_t,
         |         CAST(round($dExpr
         |                  * $dExpr
         |                  * 1e12) AS BIGINT) AS h_fp12
         |  FROM c JOIN ct USING (term) JOIN ts USING (source), tc),
         |a AS (
         |  SELECT source, CAST(count(*) AS INTEGER) AS n_terms,
         |         max(tot_s) AS tot_tokens,
         |         CAST(sum(h_fp12) AS BIGINT) AS s_fp,
         |         CAST(sum(c_t) AS BIGINT) AS s_ct,
         |         max(tot_c) AS tot_c
         |  FROM j GROUP BY source)
         |SELECT source, n_terms, tot_tokens,
         |       0.5 * (CAST(s_fp AS DOUBLE) / 1e12)
         |     + 0.5 * (1.0 - CAST(s_ct AS DOUBLE) / CAST(tot_c AS DOUBLE)) AS hellinger_sq
         |FROM a ORDER BY source""".stripMargin
    },

    // Mean quality is an exact integer sum of per-doc fixed-point (1e6)
    // scores divided once at the end — partition-order-independent on the
    // Spark side, so it hash-matches any engine that mirrors the per-doc
    // expression (which q_text_quality already proves bit-equal).
    "q_domain_stats" -> {
      val hits = vocabHits(stop("en"))
      s"""WITH t AS (
         |  SELECT source, lang,
         |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |         $hits AS hits,
         |         CASE WHEN length(text) > 0
         |              THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
         |              ELSE 0.0 END AS punct_ratio
         |  FROM documents),
         |q AS (
         |  SELECT source, lang, n_tokens,
         |         CAST(round(((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) * 0.4
         |           + least((CASE WHEN n_tokens > 0 THEN CAST(hits AS DOUBLE) / n_tokens ELSE 0.0 END) * 4.0, 1.0) * 0.4
         |           + (1.0 - punct_ratio) * 0.2) * 1000000.0) AS BIGINT) AS q_fp6
         |  FROM t)
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |       count(DISTINCT lang) AS n_langs,
         |       CAST(sum(q_fp6) AS DOUBLE) / count(*) / 1000000.0 AS avg_quality
         |FROM q GROUP BY source ORDER BY source""".stripMargin
    },

    // Calibration oracle uses the NAIVE percent_rank window — the
    // engine computes the identical answer through the bounded score
    // histogram (Mixing.calibrateBySource); c_lt/(n-1) is a single
    // double division of exact integers, so the two forms are
    // bit-equal.
    "q_quality_calibrated" -> {
      val hits = vocabHits(stop("en"))
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |         $hits AS hits,
         |         CASE WHEN length(text) > 0
         |              THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
         |              ELSE 0.0 END AS punct_ratio
         |  FROM documents),
         |q AS (
         |  SELECT doc_id, source,
         |         CAST(round(((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) * 0.4
         |           + least((CASE WHEN n_tokens > 0 THEN CAST(hits AS DOUBLE) / n_tokens ELSE 0.0 END) * 4.0, 1.0) * 0.4
         |           + (1.0 - punct_ratio) * 0.2) * 1000000.0) AS BIGINT) AS q_fp6
         |  FROM t)
         |SELECT doc_id, source, q_fp6,
         |       percent_rank() OVER (PARTITION BY source ORDER BY q_fp6) AS pctl
         |FROM q ORDER BY doc_id""".stripMargin
    },

    // Per-label centroid map: exact fp6 element sums, truncating integer
    // mean (DuckDB // ≡ Spark div, both toward zero), BIGINT-exact
    // dot/norms. The HASHED contract is integer-only — dot_fp and the two
    // squared norms as explicit BIGINTs (r9 lesson: an uncast SUM(BIGINT)
    // is HUGEINT in DuckDB, which the driver's comparer converts through a
    // non-int path and hash-mismatches; cosine is derivable downstream and
    // stays out of the gate).
    "q_centroid_cosine" ->
      """WITH f AS (
        |  SELECT label, u.i AS ord,
        |         CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT) AS x
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |  WHERE embedding IS NOT NULL),
        |s AS (SELECT label, ord, SUM(x) AS sx FROM f GROUP BY label, ord),
        |nn AS (SELECT label, count(*) AS n FROM embeddings
        |       WHERE embedding IS NOT NULL GROUP BY label),
        |c AS (SELECT s.label, ord, sx // n AS cx, n FROM s JOIN nn USING (label))
        |SELECT a.label AS group_a, b.label AS group_b,
        |       a.n AS n_a, b.n AS n_b,
        |       CAST(SUM(a.cx * b.cx) AS BIGINT) AS dot_fp,
        |       CAST(SUM(a.cx * a.cx) AS BIGINT) AS norm_a_fp,
        |       CAST(SUM(b.cx * b.cx) AS BIGINT) AS norm_b_fp
        |FROM c a JOIN c b ON a.ord = b.ord AND a.label < b.label
        |GROUP BY a.label, b.label, a.n, b.n
        |ORDER BY group_a, group_b""".stripMargin,

    // Best-duplicate selection: same recursive-CTE cluster closure as
    // q_dedup_clusters, quality fp6 from the q_quality_calibrated CTEs,
    // argmax via the packed key q*2^32 + (2^32-1-id) — plain integer
    // max, totally ordered, engine-exact.
    "q_dedup_best" -> {
      val hits = vocabHits(stop("en"))
      val chunks = Seq((0, 1, 8), (1, 9, 8))
        .map { case (i, start, len) =>
          s"SELECT id, v, $i AS chunk, substring(simhash, $start, $len) AS bits FROM v" }
        .mkString("\n  UNION ALL\n  ")
      s"""WITH RECURSIVE $simhashCte,
         |v AS (SELECT id, simhash, CAST(concat('0b', simhash) AS BIGINT) AS v FROM sh16),
         |chunks AS (
         |  $chunks),
         |p AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk = b.chunk AND a.bits = b.bits AND a.id < b.id
         |  WHERE bit_count(xor(a.v, b.v)) <= 1),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM p
         |       UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM eg
         |  UNION
         |  SELECT eg.dst AS id, reach.r AS r FROM reach JOIN eg ON eg.src = reach.id),
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |t AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |         $hits AS hits,
         |         CASE WHEN length(text) > 0
         |              THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
         |              ELSE 0.0 END AS punct_ratio
         |  FROM documents),
         |q AS (
         |  SELECT doc_id,
         |         CAST(round(((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) * 0.4
         |           + least((CASE WHEN n_tokens > 0 THEN CAST(hits AS DOUBLE) / n_tokens ELSE 0.0 END) * 4.0, 1.0) * 0.4
         |           + (1.0 - punct_ratio) * 0.2) * 1000000.0) AS BIGINT) AS q_fp6
         |  FROM t),
         |m AS (
         |  SELECT cl.cluster_id,
         |         q.q_fp6 * 4294967296 + (4294967295 - cl.id) AS pk
         |  FROM cl JOIN q ON q.doc_id = cl.id)
         |SELECT cluster_id,
         |       4294967295 - (max(pk) % 4294967296) AS best_id,
         |       max(pk) // 4294967296 AS best_q_fp6,
         |       count(*) AS n_docs
         |FROM m GROUP BY cluster_id ORDER BY cluster_id""".stripMargin
    },

    // ANN recall eval: both retrievers are deterministic total orders,
    // so recall@10 is an exact integer ratio.
    "q_ann_recall" ->
      s"""WITH b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id),
         |bf AS (
         |  SELECT query_id, match_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |                              ORDER BY ${cosineExpr("q", "c")} DESC, c.vec_id ASC) AS rk
         |    FROM nv q, nv c
         |    WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id AND q.nn > 0 AND c.nn > 0)
         |  WHERE rk <= 10),
         |ls AS (
         |  SELECT query_id, match_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |                              ORDER BY ${cosineExpr("q", "c")} DESC, c.vec_id ASC) AS rk
         |    FROM v q JOIN v c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |    WHERE q.vec_id < 5 AND q.nn > 0 AND c.nn > 0)
         |  WHERE rk <= 10),
         |nb AS (SELECT query_id, count(*) AS n_bf FROM bf GROUP BY query_id),
         |ht AS (SELECT bf.query_id, count(*) AS n_hit
         |       FROM bf JOIN ls ON bf.query_id = ls.query_id AND bf.match_id = ls.match_id
         |       GROUP BY bf.query_id)
         |SELECT nb.query_id, nb.n_bf, COALESCE(ht.n_hit, 0) AS n_hit,
         |       COALESCE(ht.n_hit, 0) * 1000 // nb.n_bf AS recall_permille
         |FROM nb LEFT JOIN ht ON nb.query_id = ht.query_id
         |ORDER BY nb.query_id""".stripMargin,

    // IVF recall gate: brute-force truth vs the seeded-IVF candidate
    // top-10 (q_ann_ivf's CTEs at k=10), integer-permille recall.
    "q_ivf_recall" -> {
      val cosQC =
        "CAST(list_sum(list_transform(range(1, len(q_v) + 1), i -> q_v[i] * c_v[i])) AS DOUBLE)" +
          " / (sqrt(CAST(q_n AS DOUBLE)) * sqrt(CAST(c_n AS DOUBLE)))"
      val centCos =
        "CAST(list_sum(list_transform(range(1, len(v.fv) + 1), i -> v.fv[i] * cents.cent_v[i])) AS DOUBLE)" +
          " / (sqrt(CAST(v.nn AS DOUBLE)) * sqrt(CAST(cents.cent_n AS DOUBLE)))"
      s"""WITH $fpVecCte,
         |bf AS (
         |  SELECT query_id, match_id FROM (
         |    SELECT q.vec_id AS query_id, c.vec_id AS match_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |                              ORDER BY ${cosineExpr("q", "c")} DESC, c.vec_id ASC) AS rk
         |    FROM nv q, nv c
         |    WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id AND q.nn > 0 AND c.nn > 0)
         |  WHERE rk <= 10),
         |cents AS (SELECT vec_id AS cent_id, fv AS cent_v, nn AS cent_n
         |          FROM nv WHERE vec_id < 16 AND nn > 0),
         |casgn AS (
         |  SELECT c_id, c_v, c_n, cent_id FROM (
         |    SELECT v.vec_id AS c_id, v.fv AS c_v, v.nn AS c_n, cents.cent_id,
         |           row_number() OVER (PARTITION BY v.vec_id
         |                              ORDER BY $centCos DESC, cents.cent_id ASC) AS r
         |    FROM nv v, cents WHERE v.nn > 0)
         |  WHERE r = 1),
         |qasgn AS (
         |  SELECT q_id, q_v, q_n, cent_id FROM (
         |    SELECT v.vec_id AS q_id, v.fv AS q_v, v.nn AS q_n, cents.cent_id,
         |           row_number() OVER (PARTITION BY v.vec_id
         |                              ORDER BY $centCos DESC, cents.cent_id ASC) AS r
         |    FROM nv v, cents WHERE v.nn > 0 AND v.vec_id < 5)
         |  WHERE r <= 4),
         |sc AS (
         |  SELECT DISTINCT q_id AS query_id, c_id AS match_id, $cosQC AS cosine
         |  FROM qasgn JOIN casgn USING (cent_id) WHERE c_id <> q_id),
         |iv AS (
         |  SELECT query_id, match_id FROM (
         |    SELECT query_id, match_id,
         |           row_number() OVER (PARTITION BY query_id
         |                              ORDER BY cosine DESC, match_id ASC) AS rk
         |    FROM sc)
         |  WHERE rk <= 10),
         |nb AS (SELECT query_id, count(*) AS n_bf FROM bf GROUP BY query_id),
         |ht AS (SELECT bf.query_id, count(*) AS n_hit
         |       FROM bf JOIN iv ON bf.query_id = iv.query_id AND bf.match_id = iv.match_id
         |       GROUP BY bf.query_id)
         |SELECT nb.query_id, nb.n_bf, COALESCE(ht.n_hit, 0) AS n_hit,
         |       COALESCE(ht.n_hit, 0) * 1000 // nb.n_bf AS recall_permille
         |FROM nb LEFT JOIN ht ON nb.query_id = ht.query_id
         |ORDER BY nb.query_id""".stripMargin
    },

    // JL projection: the ±1 matrix regenerates from md5("j:i") parity in
    // any engine; components are exact integer dots of fp6 vectors.
    "q_random_projection" ->
      """WITH fp AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fv
        |  FROM embeddings),
        |m AS (
        |  SELECT j.j AS j, i.i AS i,
        |         CASE WHEN CAST(concat('0x', substring(md5(j.j || ':' || i.i), 1, 15)) AS BIGINT) % 2 = 0
        |              THEN 1 ELSE -1 END AS s
        |  FROM range(16) j(j), range(64) i(i)),
        |e AS (SELECT vec_id, i.i AS i, fv[i.i + 1] AS v FROM fp, range(64) i(i))
        |SELECT e.vec_id, CAST(m.j AS INTEGER) AS out_dim,
        |       CAST(SUM(e.v * m.s) AS BIGINT) AS comp_fp6
        |FROM e JOIN m ON m.i = e.i
        |GROUP BY e.vec_id, m.j
        |ORDER BY vec_id, out_dim""".stripMargin,

    // Character histogram stats: the HASHED contract is the exact integer
    // sufficient statistics of the per-char histogram — counts plus an
    // order-free md5 checksum Σ cnt·h31(c) — from which entropy is a
    // derived display value (TextOps.charEntropyFp9 keeps the fixed-point
    // ln form OUTSIDE the gate: libm `ln` is not required to be correctly
    // rounded, so round(ln(k)·1e9) is not a portable hash contract; the
    // r9 driver run also proved uncast SUM(BIGINT) = HUGEINT mismatches).
    // The oracle uses the exploded GROUP BY histogram, the engine the
    // in-row run-length form — identical integers.
    "q_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS c
        |  FROM documents WHERE length(text) > 0),
        |h AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c),
        |a AS (
        |  SELECT doc_id, SUM(cnt) AS n, count(*) AS n_uniq,
        |         SUM(cnt * (CAST(concat('0x', substring(md5(c), 1, 15)) AS BIGINT)
        |                    % 2147483648)) AS hist_fp
        |  FROM h GROUP BY doc_id)
        |SELECT doc_id, CAST(n AS INTEGER) AS n_chars, CAST(n_uniq AS INTEGER) AS n_uniq,
        |       CAST(hist_fp AS BIGINT) AS hist_fp
        |FROM a ORDER BY doc_id""".stripMargin,

    // Heavy hitters: the engine's Misra–Gries candidate pass is only an
    // optimization — the verified OUTPUT is the exact count set, which
    // plain GROUP BY/HAVING reproduces.
    "q_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT tok, count(*) AS n_exact
        |FROM tok GROUP BY tok
        |HAVING count(*) * 200 > (SELECT count(*) FROM tok)
        |ORDER BY n_exact DESC, tok""".stripMargin,

    // CDC chunk dedup: boundary after every token whose md5-60-bit ≡ 0
    // (mod 16); ends = cut positions plus the tail boundary at n (DISTINCT
    // dedups the case where n is itself a cut); chunk j = tokens
    // (prev_end, end], reassembled with list_slice (inclusive 1-based,
    // mirrors Spark slice(toks, prev+1, e-prev)).
    "q_cdc_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tok AS (
        |  SELECT doc_id, u.i AS i, toks[u.i] AS w
        |  FROM t, unnest(range(1, len(toks) + 1)) AS u(i)),
        |ends AS (
        |  SELECT DISTINCT doc_id, e FROM (
        |    SELECT doc_id, i AS e FROM tok
        |    WHERE CAST(concat('0x', substring(md5(w), 1, 15)) AS BIGINT) % 16 = 0
        |    UNION ALL
        |    SELECT doc_id, len(toks) AS e FROM t WHERE len(toks) >= 1)),
        |seq AS (
        |  SELECT doc_id, e,
        |         COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS prev
        |  FROM ends),
        |ch AS (
        |  SELECT s.doc_id, CAST(s.e - s.prev AS INTEGER) AS n_tok,
        |         array_to_string(list_slice(t.toks, s.prev + 1, s.e), ' ') AS chunk_text
        |  FROM seq s JOIN t USING (doc_id))
        |SELECT md5(chunk_text) AS chunk_hash, min(n_tok) AS n_tok,
        |       count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
        |FROM ch GROUP BY chunk_hash HAVING count(*) > 1
        |ORDER BY chunk_hash""".stripMargin,

    // N-gram novelty: test-split grams against the distinct train gram
    // set; same md5-percent split as q_train_test_split.
    "q_ngram_novelty" -> {
      val pct = "CAST(concat('0x', substring(md5(CAST(id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"
      s"""WITH $shinglesCte,
         |tr AS (SELECT DISTINCT shingle FROM sh WHERE $pct < 80),
         |te AS (SELECT id, shingle FROM sh WHERE $pct >= 80),
         |tot AS (SELECT id, count(*) AS n_grams FROM te GROUP BY id),
         |seen AS (SELECT te.id, count(*) AS n_seen
         |         FROM te JOIN tr ON te.shingle = tr.shingle GROUP BY te.id)
         |SELECT tot.id AS doc_id, tot.n_grams,
         |       COALESCE(seen.n_seen, 0) AS n_seen,
         |       (tot.n_grams - COALESCE(seen.n_seen, 0)) * 1000 // tot.n_grams AS novel_permille
         |FROM tot LEFT JOIN seen ON tot.id = seen.id
         |ORDER BY doc_id""".stripMargin
    },

    // Zipf slope: logs fixed-pointed at 1e3, exact integer sums, slope
    // and R² as correctly-rounded double ops on exactly-representable
    // inputs — identical bits in any IEEE 754 engine.
    "q_zipf_slope" ->
      """WITH vocab AS (
        |  SELECT tok, count(*) AS freq FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY tok),
        |xy AS (
        |  SELECT CAST(round(ln(row_number() OVER (ORDER BY freq DESC, tok ASC)) * 1000) AS BIGINT) AS x,
        |         CAST(round(ln(freq) * 1000) AS BIGINT) AS y
        |  FROM vocab),
        |s AS (
        |  SELECT count(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM xy)
        |, d AS (
        |  SELECT n,
        |         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS dn,
        |         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dd,
        |         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS de
        |  FROM s)
        |SELECT n,
        |       CAST(round(dn / dd * 1000000) AS BIGINT) AS slope_fp6,
        |       CAST(round(dn * dn / (dd * de) * 1000) AS BIGINT) AS r2_permille
        |FROM d""".stripMargin,

    // Heaps'-law growth: first-occurrence doc per token, decile doc-id
    // checkpoints off one max(id) scalar; LEFT JOIN + COALESCE mirrors
    // the Spark side's empty-checkpoint handling.
    "q_vocab_growth" ->
      """WITH b AS (SELECT max(doc_id) + 1 AS bound FROM documents),
        |cps AS (
        |  SELECT CAST(u.k AS BIGINT) AS cp_idx,
        |         CAST(u.k * b.bound // 10 AS BIGINT) AS cp_doc_bound
        |  FROM b, unnest(range(1, 11)) AS u(k)),
        |tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |first AS (SELECT tok, min(doc_id) AS first_doc FROM tk GROUP BY tok),
        |v AS (
        |  SELECT c.cp_idx, CAST(count(*) AS BIGINT) AS n_vocab
        |  FROM cps c JOIN first f ON f.first_doc < c.cp_doc_bound
        |  GROUP BY c.cp_idx),
        |dd AS (
        |  SELECT c.cp_idx, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM cps c JOIN documents ON doc_id < c.cp_doc_bound
        |  GROUP BY c.cp_idx)
        |SELECT c.cp_idx, c.cp_doc_bound,
        |       COALESCE(dd.n_docs, 0) AS n_docs,
        |       COALESCE(dd.n_tokens, 0) AS n_tokens,
        |       COALESCE(v.n_vocab, 0) AS n_vocab
        |FROM cps c LEFT JOIN dd ON dd.cp_idx = c.cp_idx
        |           LEFT JOIN v ON v.cp_idx = c.cp_idx
        |ORDER BY c.cp_idx""".stripMargin,

    // Cluster-size histogram off the q_dedup_clusters recursive closure
    // (Hamming <= 1 → 2 chunks of 8 bits), plus the singleton row from
    // the two scalar counts.
    "q_cluster_sizes" -> {
      val chunks = Seq((0, 1, 8), (1, 9, 8))
        .map { case (i, start, len) =>
          s"SELECT id, v, $i AS chunk, substring(simhash, $start, $len) AS bits FROM v" }
        .mkString("\n  UNION ALL\n  ")
      s"""WITH RECURSIVE $simhashCte,
         |v AS (SELECT id, simhash, CAST(concat('0b', simhash) AS BIGINT) AS v FROM sh16),
         |chunks AS (
         |  $chunks),
         |p AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk = b.chunk AND a.bits = b.bits AND a.id < b.id
         |  WHERE bit_count(xor(a.v, b.v)) <= 1),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM p
         |       UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM eg
         |  UNION
         |  SELECT eg.dst AS id, reach.r AS r FROM reach JOIN eg ON eg.src = reach.id),
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS size FROM cl GROUP BY cluster_id),
         |h AS (SELECT size, CAST(count(*) AS BIGINT) AS n_clusters FROM sz GROUP BY size),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
         |clu AS (SELECT CAST(count(*) AS BIGINT) AS n_clustered FROM cl)
         |SELECT size, n_clusters, CAST(size * n_clusters AS BIGINT) AS n_docs FROM h
         |UNION ALL
         |SELECT CAST(1 AS BIGINT) AS size, n_total - n_clustered AS n_clusters,
         |       n_total - n_clustered AS n_docs
         |FROM tot, clu
         |ORDER BY size""".stripMargin
    },

    // Cross-source overlap matrix: the q_split_leakage pair closure
    // (Hamming <= 2 → 3 chunks) joined to sources, canonicalized
    // undirected via least/greatest.
    "q_source_overlap" -> {
      val chunks = Seq((0, 1, 6), (1, 7, 5), (2, 12, 5))
        .map { case (i, start, len) =>
          s"SELECT id, v, $i AS chunk, substring(simhash, $start, $len) AS bits FROM v" }
        .mkString("\n  UNION ALL\n  ")
      s"""WITH $simhashCte,
         |v AS (SELECT id, simhash, CAST(concat('0b', simhash) AS BIGINT) AS v FROM sh16),
         |chunks AS (
         |  $chunks),
         |p AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk = b.chunk AND a.bits = b.bits AND a.id < b.id
         |  WHERE bit_count(xor(a.v, b.v)) <= 2)
         |SELECT least(sa.source, sb.source) AS source_a,
         |       greatest(sa.source, sb.source) AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs
         |FROM p JOIN documents sa ON sa.doc_id = p.id_a
         |       JOIN documents sb ON sb.doc_id = p.id_b
         |GROUP BY 1, 2
         |ORDER BY source_a, source_b""".stripMargin
    },

    // Per-(label, dim) scatter sufficient statistics: fp6 HALF_UP round
    // then one truncating // 1000 (both toward zero in both engines);
    // n/Σq/Σq² exact BIGINTs.
    "q_embed_dispersion" ->
      """WITH q AS (
        |  SELECT label, CAST(u.i - 1 AS INTEGER) AS dim,
        |         CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT) // 1000 AS qv
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |  WHERE embedding IS NOT NULL)
        |SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(qv) AS BIGINT) AS sx,
        |       CAST(sum(qv * qv) AS BIGINT) AS sxx
        |FROM q GROUP BY label, dim
        |ORDER BY label, dim""".stripMargin,

    // Tokenizer fertility per language: the q_bpe_apply 3-round merge
    // CTEs grouped by lang; ratios via truncating // on BIGINT-cast
    // sums (HUGEINT never reaches the output).
    "q_token_fertility" -> {
      def round(t: Int) =
        s"""p$t AS (
           |  SELECT toks, unnest(range(1, len(toks))) AS i
           |  FROM (SELECT string_split(substr(s, 2, length(s) - 2), ')(') AS toks
           |        FROM s${t - 1})
           |  WHERE len(toks) >= 2),
           |c$t AS (SELECT toks[i] AS w1, toks[i + 1] AS w2,
           |               CAST(count(*) AS BIGINT) AS c FROM p$t GROUP BY 1, 2),
           |m$t AS (SELECT w1, w2, c FROM c$t ORDER BY c DESC, w1, w2 LIMIT 1),
           |s$t AS (SELECT s${t - 1}.doc_id, s${t - 1}.text,
           |               replace(s${t - 1}.s, '(' || m$t.w1 || ')(' || m$t.w2 || ')',
           |                       '(' || m$t.w1 || ' ' || m$t.w2 || ')') AS s
           |        FROM s${t - 1}, m$t)""".stripMargin
      s"""WITH s0 AS (SELECT doc_id, text,
         |                   '(' || replace(text, ' ', ')(') || ')' AS s
         |            FROM documents),
         |${(1 to 3).map(round).mkString(",\n")},
         |agg AS (
         |  SELECT d.lang,
         |         CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(length(s3.text)) AS BIGINT) AS n_chars,
         |         CAST(sum(len(string_split(s3.text, ' '))) AS BIGINT) AS n_tok_word,
         |         CAST(sum(len(string_split(substr(s3.s, 2, length(s3.s) - 2), ')('))) AS BIGINT) AS n_tok_bpe
         |  FROM s3 JOIN documents d ON d.doc_id = s3.doc_id
         |  GROUP BY d.lang)
         |SELECT lang, n_docs, n_chars, n_tok_word, n_tok_bpe,
         |       CAST(n_tok_bpe * 1000 // n_tok_word AS BIGINT) AS fertility_permille,
         |       CAST(n_chars * 1000 // n_tok_bpe AS BIGINT) AS chars_per_bpe_permille
         |FROM agg ORDER BY lang""".stripMargin
    },

    // Split-leakage audit: the q_simhash_pairs closure joined to the
    // q_train_test_split md5-percent sides; pairs straddling the split
    // are the leaks.
    "q_split_leakage" -> {
      val chunks = Seq((0, 1, 6), (1, 7, 5), (2, 12, 5))
        .map { case (i, start, len) =>
          s"SELECT id, v, $i AS chunk, substring(simhash, $start, $len) AS bits FROM v" }
        .mkString("\n  UNION ALL\n  ")
      val pct = "CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"
      s"""WITH $simhashCte,
         |v AS (SELECT id, simhash, CAST(concat('0b', simhash) AS BIGINT) AS v FROM sh16),
         |chunks AS (
         |  $chunks),
         |p AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |         CAST(bit_count(xor(a.v, b.v)) AS INTEGER) AS hamming
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk = b.chunk AND a.bits = b.bits AND a.id < b.id
         |  WHERE bit_count(xor(a.v, b.v)) <= 2),
         |sides AS (
         |  SELECT doc_id,
         |         CASE WHEN $pct < 80 THEN 'train'
         |              WHEN $pct < 90 THEN 'valid'
         |              ELSE 'test' END AS side
         |  FROM documents)
         |SELECT p.id_a, p.id_b, sa.side AS side_a, sb.side AS side_b, p.hamming
         |FROM p JOIN sides sa ON sa.doc_id = p.id_a
         |       JOIN sides sb ON sb.doc_id = p.id_b
         |WHERE sa.side <> sb.side
         |ORDER BY p.id_a, p.id_b""".stripMargin
    },

    // PR sweep: margin from the q_quality_margin CTEs, truth from the
    // q_quality_filter Gopher CASE, counts per threshold exact.
    "q_quality_pr" -> {
      val hits = vocabHits(stop("en"))
      s"""WITH t AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS toks,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |         CAST($hits AS BIGINT) AS n_stop,
         |         CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_cns
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |         -30000 + 400 * n_tok + 2000 * n_stop
         |           - (n_cns * 1000 // n_tok) AS margin,
         |         CAST(n_tok AS INTEGER) AS n_tokens,
         |         CASE WHEN length(text) > 0
         |              THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
         |              ELSE 0.0 END AS punct,
         |         CASE WHEN len(toks) >= 2
         |              THEN list_transform(range(1, len(toks)),
         |                     i -> array_to_string(list_slice(toks, i, i + 1), ' '))
         |              ELSE [] END AS bg,
         |         CAST($hits AS BIGINT) AS hits
         |  FROM t),
         |r AS (
         |  SELECT margin,
         |         (CASE WHEN n_tokens < 20 THEN 'too_short'
         |               WHEN n_tokens > 1000 THEN 'too_long'
         |               WHEN punct > 0.2 THEN 'punct_soup'
         |               WHEN len(bg) > 0 AND
         |                    CAST(list_max(list_transform(list_distinct(bg),
         |                      x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)
         |                      / len(bg) > 0.08 THEN 'repetition'
         |               WHEN hits = 0 THEN 'no_stopwords'
         |          END) IS NULL AS truth
         |  FROM m),
         |th AS (SELECT unnest(range(-20000, 30000, 5000)) AS thr),
         |agg AS (
         |  SELECT thr,
         |         count(*) FILTER (WHERE margin >= thr AND truth) AS n_tp,
         |         count(*) FILTER (WHERE margin >= thr AND NOT truth) AS n_fp,
         |         count(*) FILTER (WHERE margin < thr AND truth) AS n_fn
         |  FROM r, th GROUP BY thr)
         |SELECT thr, n_tp, n_fp, n_fn,
         |       CASE WHEN n_tp + n_fp > 0 THEN n_tp * 1000 // (n_tp + n_fp) END AS precision_permille,
         |       CASE WHEN n_tp + n_fn > 0 THEN n_tp * 1000 // (n_tp + n_fn) END AS recall_permille
         |FROM agg ORDER BY thr""".stripMargin
    },

    // Incremental CDC admission: the same chunk pipeline as q_cdc_dedup,
    // run for the standing corpus (store) and the batch; novel fraction
    // in integer permille.
    "q_incremental_cdc" ->
      """WITH ts AS (SELECT doc_id, string_split(text, ' ') AS toks
        |            FROM documents WHERE doc_id % 10 <> 0),
        |tok_s AS (SELECT doc_id, u.i AS i, toks[u.i] AS w
        |          FROM ts, unnest(range(1, len(toks) + 1)) AS u(i)),
        |ends_s AS (SELECT DISTINCT doc_id, e FROM (
        |  SELECT doc_id, i AS e FROM tok_s
        |  WHERE CAST(concat('0x', substring(md5(w), 1, 15)) AS BIGINT) % 16 = 0
        |  UNION ALL SELECT doc_id, len(toks) AS e FROM ts WHERE len(toks) >= 1)),
        |seq_s AS (SELECT doc_id, e,
        |                 COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS prev
        |          FROM ends_s),
        |store AS (SELECT DISTINCT
        |            md5(array_to_string(list_slice(t.toks, s.prev + 1, s.e), ' ')) AS chunk_hash
        |          FROM seq_s s JOIN ts t USING (doc_id)),
        |tb AS (SELECT doc_id, string_split(text, ' ') AS toks
        |       FROM documents WHERE doc_id % 10 = 0),
        |tok_b AS (SELECT doc_id, u.i AS i, toks[u.i] AS w
        |          FROM tb, unnest(range(1, len(toks) + 1)) AS u(i)),
        |ends_b AS (SELECT DISTINCT doc_id, e FROM (
        |  SELECT doc_id, i AS e FROM tok_b
        |  WHERE CAST(concat('0x', substring(md5(w), 1, 15)) AS BIGINT) % 16 = 0
        |  UNION ALL SELECT doc_id, len(toks) AS e FROM tb WHERE len(toks) >= 1)),
        |seq_b AS (SELECT doc_id, e,
        |                 COALESCE(LAG(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS prev
        |          FROM ends_b),
        |ch_b AS (SELECT s.doc_id,
        |                md5(array_to_string(list_slice(t.toks, s.prev + 1, s.e), ' ')) AS chunk_hash
        |         FROM seq_b s JOIN tb t USING (doc_id)),
        |agg AS (SELECT doc_id, count(*) AS n_chunks,
        |               count(*) FILTER (WHERE chunk_hash IN (SELECT chunk_hash FROM store)) AS n_dup
        |        FROM ch_b GROUP BY doc_id)
        |SELECT doc_id, n_chunks, n_dup,
        |       (n_chunks - n_dup) * 1000 // n_chunks AS novel_permille,
        |       (n_chunks - n_dup) * 1000 // n_chunks >= 500 AS admit
        |FROM agg ORDER BY doc_id""".stripMargin,

    // Exponential-clock weighted sample: u = (md5-60-bit + 1) / 2^60 is
    // a power-of-two scaling (identical IEEE rounding everywhere); the
    // clock −ln(u)/w is fixed-pointed at 1e9 with id tie-break so a
    // libm-ulp drift cannot flip the k-smallest selection.
    "q_weighted_sample" ->
      """WITH x AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS DOUBLE) AS w,
        |         (CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
        |           / 1152921504606846976.0 AS u
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) > 0)
        |SELECT doc_id, w,
        |       CAST(round(-ln(u) / w * 1e9) AS BIGINT) AS clock_fp9
        |FROM x
        |ORDER BY clock_fp9, doc_id
        |LIMIT 50""".stripMargin,

    // Count-min sketch: bucket_j(key) = 60-bit md5 prefix of "j:key"
    // mod width — integer end to end; the estimate is min over the d
    // counter rows. Mirrors CountMin.build/estimate exactly.
    "q_cms_freq" ->
      """WITH ds AS (SELECT unnest(range(4)) AS depth),
        |h AS (
        |  SELECT d.depth,
        |         CAST(concat('0x', substring(md5(concat(CAST(d.depth AS VARCHAR), ':', CAST(e.user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 512 AS bucket
        |  FROM events e, ds d),
        |counters AS (SELECT depth, bucket, count(*) AS c FROM h GROUP BY 1, 2),
        |probe AS (SELECT DISTINCT user_id FROM events WHERE user_id <= 25),
        |pb AS (
        |  SELECT p.user_id, d.depth,
        |         CAST(concat('0x', substring(md5(concat(CAST(d.depth AS VARCHAR), ':', CAST(p.user_id AS VARCHAR))), 1, 15)) AS BIGINT) % 512 AS bucket
        |  FROM probe p, ds d),
        |est AS (
        |  SELECT pb.user_id, min(coalesce(c.c, 0)) AS n_est
        |  FROM pb LEFT JOIN counters c USING (depth, bucket)
        |  GROUP BY 1),
        |ex AS (SELECT user_id, count(*) AS n_exact FROM events
        |       WHERE user_id <= 25 GROUP BY 1)
        |SELECT ex.user_id, ex.n_exact, est.n_est
        |FROM ex JOIN est USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "q_cms_auto" ->
      // The width is DERIVED in SQL — clamp(⌈e·n/50⌉, 2048, 2²⁴), the
      // exact CountMin.widthFor rule (exp(1) and the product/division
      // order are the same IEEE doubles both engines) — so the oracle
      // follows the engine's data-sized geometry at ANY SF instead of
      // pinning the gate corpus's 2048 floor (the r15 sf0.1 cross-check
      // caught the pinned form: sf0.1 derives 14717, and a width
      // mismatch changes every bucket and estimate).
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |wd AS (SELECT LEAST(16777216, GREATEST(2048,
        |         CAST(ceil(exp(1) * count(*) / 50) AS BIGINT))) AS w FROM tok),
        |ds AS (SELECT unnest(range(4)) AS depth),
        |h AS (
        |  SELECT d.depth,
        |         CAST(concat('0x', substring(md5(concat(CAST(d.depth AS VARCHAR), ':', t.tok)), 1, 15)) AS BIGINT) % (SELECT w FROM wd) AS bucket
        |  FROM tok t, ds d),
        |counters AS (SELECT depth, bucket, count(*) AS c FROM h GROUP BY 1, 2),
        |probe AS (SELECT tok, count(*) AS n_exact FROM tok GROUP BY tok
        |          ORDER BY n_exact DESC, tok LIMIT 20),
        |pb AS (
        |  SELECT p.tok, d.depth,
        |         CAST(concat('0x', substring(md5(concat(CAST(d.depth AS VARCHAR), ':', p.tok)), 1, 15)) AS BIGINT) % (SELECT w FROM wd) AS bucket
        |  FROM probe p, ds d),
        |est AS (
        |  SELECT pb.tok, min(coalesce(c.c, 0)) AS n_est
        |  FROM pb LEFT JOIN counters c USING (depth, bucket)
        |  GROUP BY 1)
        |SELECT probe.tok, probe.n_exact, est.n_est,
        |       CAST((SELECT w FROM wd) AS INTEGER) AS width
        |FROM probe JOIN est USING (tok)
        |ORDER BY tok""".stripMargin,

    // Temperature weights use sqrt (IEEE-correctly-rounded in every
    // engine) rather than pow(x, alpha); the md5 percentile is the same
    // portable hash as q_train_test_split. Keep probability = baseFrac ·
    // w/share capped at 1 — the mix-flattening form.
    "q_temperature_sample" ->
      """WITH c AS (SELECT source, count(*) AS c FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
        |p AS (SELECT source, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS share,
        |             sqrt(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS p FROM c, tot),
        |z AS (SELECT sum(p) AS z FROM p),
        |w AS (SELECT source, share, p.p / z.z AS w FROM p, z)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN w ON d.source = w.source
        |WHERE CAST(CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS DOUBLE)
        |      < least(0.5 * w.w / w.share, 1.0) * 10000.0
        |ORDER BY doc_id""".stripMargin,

    "q_pack_sequences" ->
      """WITH x AS (
        |  SELECT source, doc_id,
        |         CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 4 AS INTEGER) AS shard,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT source, shard, doc_id, n_tok,
        |         CAST(sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        |  FROM x)
        |SELECT source, shard, doc_id, n_tok, cum_tok,
        |       (cum_tok - 1) // 2048 AS bin
        |FROM c ORDER BY source, shard, doc_id""".stripMargin,

    "q_upsert" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |  FROM orders),
        |b AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, price_cents FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM o WHERE o_orderdate < TIMESTAMP '1997-01-01')
        |  WHERE rn = 1),
        |u AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate, price_cents FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM o WHERE o_orderdate >= TIMESTAMP '1997-01-01')
        |  WHERE rn = 1)
        |SELECT o_custkey, o_orderkey, o_orderdate, price_cents FROM u
        |UNION ALL
        |SELECT o_custkey, o_orderkey, o_orderdate, price_cents FROM b
        |WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.o_custkey = b.o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    // Every arithmetic step mirrors Vectors.quantizeInt8 op-for-op
    // (float→double promotion, one multiply, one divide, round); both
    // engines round positive halves away from zero.
    "q_quantize_embed" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |         CAST(list_min(embedding) AS DOUBLE) AS mn,
        |         CAST(list_max(embedding) AS DOUBLE) AS mx
        |  FROM embeddings)
        |SELECT vec_id, CAST(u.i - 1 AS INTEGER) AS pos,
        |       CAST(CASE WHEN mx = mn THEN 0
        |                 ELSE round((CAST(embedding[u.i] AS DOUBLE) - mn) * 255.0 / (mx - mn))
        |            END AS INTEGER) AS code,
        |       mn AS q_min, mx AS q_max
        |FROM q, unnest(range(1, len(embedding) + 1)) AS u(i)
        |ORDER BY vec_id, pos""".stripMargin,

    "q_scd2" ->
      """SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
        |       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |       lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |       lead(o_orderdate) OVER (PARTITION BY o_custkey
        |                               ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin,

    // Hour totals are exact integer cents, so the forward-fill carries a
    // partition-order-independent value; leading empty hours stay NULL in
    // both engines.
    "q_resample_ffill" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS h,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |hv AS (SELECT user_id, h, CAST(sum(cents) AS BIGINT) AS v, count(*) AS n
        |       FROM e GROUP BY 1, 2),
        |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e GROUP BY 1),
        |spine AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM span),
        |j AS (SELECT s.user_id, s.h, hv.v, coalesce(hv.n, 0) AS n
        |      FROM spine s LEFT JOIN hv ON s.user_id = hv.user_id AND s.h = hv.h)
        |SELECT user_id, h, n, v,
        |       last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
        |FROM j ORDER BY user_id, h""".stripMargin,

    // percentile ↔ quantile_cont interpolation parity is already proven by
    // q_percentiles; the clip keeps exact-integer cents except at the
    // interpolated bounds.
    // Streaming sessionize contract: ms-domain gap sessionization (the
    // state kernel works on Timestamp.getTime), every non-final session
    // (closed in-batch by its successor) plus final sessions whose
    // timeout end_ms + gap falls strictly under the final watermark
    // max_ms − delay. Cents are integral so the state's sequential sums
    // are exact.
    "q_stream_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) // 1000 AS ms,
        |                  CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |mx AS (SELECT max(ms) AS mx FROM e),
        |f AS (SELECT user_id, ms, cents, event_id,
        |        CASE WHEN lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) IS NULL
        |                  OR ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) > 1800000
        |             THEN 1 ELSE 0 END AS ns
        |      FROM e),
        |g AS (SELECT user_id, ms, cents,
        |        sum(ns) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM f),
        |s AS (SELECT user_id, sid, min(ms) AS start_ms, max(ms) AS end_ms,
        |             count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS total_cents
        |      FROM g GROUP BY 1, 2),
        |t AS (SELECT user_id, sid, start_ms, end_ms, n_events, total_cents,
        |             max(sid) OVER (PARTITION BY user_id) AS last_sid FROM s)
        |SELECT user_id, start_ms, end_ms, n_events, total_cents
        |FROM t, mx
        |WHERE sid < last_sid OR end_ms + 1800000 < mx - 600000
        |ORDER BY user_id, start_ms""".stripMargin,

    // PQ codes: same fixed-point scale as every vector oracle; exact
    // integer squared-L2 argmin per (vector, subspace), tie → lowest cid.
    "q_pq_codes" ->
      """WITH fp AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fv
        |  FROM embeddings),
        |cb AS (SELECT vec_id AS cid, fv AS cfv FROM fp WHERE vec_id < 16),
        |js AS (SELECT unnest(range(0, 4)) AS j),
        |pairs AS (
        |  SELECT v.vec_id, js.j, cb.cid,
        |         list_sum(list_transform(range(1, 17), i ->
        |           (v.fv[js.j*16 + i] - cb.cfv[js.j*16 + i])
        |           * (v.fv[js.j*16 + i] - cb.cfv[js.j*16 + i]))) AS dist
        |  FROM fp v, js, cb),
        |r AS (SELECT vec_id, j, cid,
        |        row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
        |      FROM pairs)
        |SELECT vec_id, CAST(j AS INTEGER) AS subspace, CAST(cid AS INTEGER) AS code
        |FROM r WHERE rn = 1 ORDER BY vec_id, subspace""".stripMargin,

    // Trained-PQ mirror: two unrolled per-subspace L2 Lloyd iterations
    // (seed = first 16 vectors' subvectors, assignment = (sq-L2 ASC,
    // code ASC) argmin, update = truncating integer mean per (subspace,
    // code, position) — DuckDB `//` truncates toward zero exactly like
    // the engine's Long division; empty (subspace, code) cells keep the
    // previous entry), then the q_pq_codes assignment against the
    // trained book.
    "q_pq_trained" -> {
      val sqL2 =
        "list_sum(list_transform(range(1, 17), i -> " +
          "(v.fv[s.j*16 + i] - s.csv[i]) * (v.fv[s.j*16 + i] - s.csv[i])))"
      // one Lloyd iteration: argmin vs prev book, integer-mean update
      def iter(i: Int, prev: String): String =
        s"""a$i AS (
           |  SELECT vec_id, j, cid FROM (
           |    SELECT v.vec_id, s.j, s.cid,
           |           row_number() OVER (PARTITION BY v.vec_id, s.j
           |                              ORDER BY $sqL2, s.cid) AS rn
           |    FROM fp v, $prev s)
           |  WHERE rn = 1),
           |e$i AS (SELECT a.j, a.cid, u.i AS pos, v.fv[a.j*16 + u.i] AS val
           |        FROM a$i a JOIN fp v USING (vec_id), unnest(range(1, 17)) AS u(i)),
           |m$i AS (SELECT j, cid, list(CAST(s // n AS BIGINT) ORDER BY pos) AS csv
           |        FROM (SELECT j, cid, pos, CAST(sum(val) AS BIGINT) AS s,
           |                     count(*) AS n
           |              FROM e$i GROUP BY j, cid, pos)
           |        GROUP BY j, cid),
           |cbs$i AS (SELECT p.cid, p.j, coalesce(m.csv, p.csv) AS csv
           |          FROM cbs${i - 1} p LEFT JOIN m$i m
           |            ON p.cid = m.cid AND p.j = m.j)""".stripMargin
      s"""WITH fp AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fv
         |  FROM embeddings),
         |js AS (SELECT unnest(range(0, 4)) AS j),
         |cb0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid, fv
         |  FROM (SELECT vec_id, fv FROM fp WHERE vec_id < 16 ORDER BY vec_id)),
         |cbs0 AS (
         |  SELECT cid, j, list_transform(range(1, 17), i -> fv[j*16 + i]) AS csv
         |  FROM cb0, js),
         |${iter(1, "cbs0")},
         |${iter(2, "cbs1")},
         |r AS (
         |  SELECT v.vec_id, s.j, s.cid,
         |         row_number() OVER (PARTITION BY v.vec_id, s.j
         |                            ORDER BY $sqL2, s.cid) AS rn
         |  FROM fp v, cbs2 s)
         |SELECT vec_id, CAST(j AS INTEGER) AS subspace, CAST(cid AS INTEGER) AS code
         |FROM r WHERE rn = 1 ORDER BY vec_id, subspace""".stripMargin
    },

    // Audio decode: the WAV payload is synthesized closed-form from
    // (doc_id, text) — the oracle recomputes every decoded feature from
    // the text column (ASCII ⇒ byte = code point), no binary parsing
    "q_audio_decode" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
        |         CAST(800 + doc_id % 400 AS INTEGER) AS n_samples,
        |         length(text) AS len
        |  FROM documents),
        |s AS (
        |  SELECT d.doc_id,
        |         CAST(sum(abs((ord(substr(d.text, CAST(u.i % d.len AS INTEGER) + 1, 1)) - 128) * 256)) AS BIGINT) AS sum_abs
        |  FROM d, unnest(range(0, d.n_samples)) AS u(i)
        |  GROUP BY d.doc_id)
        |SELECT d.doc_id,
        |       CAST(44 + 2 * d.n_samples AS INTEGER) AS byte_len,
        |       d.sample_rate, d.n_samples,
        |       CAST((CAST(d.n_samples AS BIGINT) * 1000) // d.sample_rate AS INTEGER) AS duration_ms,
        |       CAST(s.sum_abs // d.n_samples AS BIGINT) AS mean_abs
        |FROM d JOIN s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Frame-level audio energy: 256-sample frame Σs² recomputed from
    // the SynthAudio closed form; peak = row_number over (energy DESC,
    // frame ASC).
    "q_audio_frames" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |         CAST(800 + doc_id % 400 AS INTEGER) AS n_samples,
        |         length(text) AS len
        |  FROM documents),
        |e AS (
        |  SELECT d.doc_id, CAST(u.i // 256 AS INTEGER) AS f,
        |         CAST(sum(
        |           CAST((ord(substr(d.text, CAST(u.i % d.len AS INTEGER) + 1, 1))
        |                 - 128) * 256 AS BIGINT)
        |           * CAST((ord(substr(d.text, CAST(u.i % d.len AS INTEGER) + 1, 1))
        |                   - 128) * 256 AS BIGINT)) AS BIGINT) AS en
        |  FROM d, unnest(range(0, d.n_samples)) AS u(i)
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_frames,
        |         CAST(sum(en) AS BIGINT) AS total_energy
        |  FROM e GROUP BY 1),
        |p AS (
        |  SELECT doc_id, f AS peak_frame, en AS peak_energy
        |  FROM (SELECT doc_id, f, en,
        |               row_number() OVER (PARTITION BY doc_id
        |                                  ORDER BY en DESC, f) AS rn
        |        FROM e) WHERE rn = 1)
        |SELECT a.doc_id, a.n_frames, p.peak_frame, p.peak_energy, a.total_energy
        |FROM a JOIN p USING (doc_id) ORDER BY doc_id""".stripMargin,

    // PII scrub: synthesized payloads (closed-form from doc_id), RE2-side
    // of the alternation-free patterns; counts over raw text, md5 over the
    // redacted string; DuckDB regexp_replace needs the 'g' flag.
    "q_pii_redact" ->
      """WITH pii AS (
        |  SELECT doc_id,
        |         text || ' Contact u' || CAST(doc_id AS VARCHAR)
        |           || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.com'
        |           || CASE WHEN doc_id % 3 = 0 THEN ' cc admin@corp.org' ELSE '' END
        |           || ' or +1-555-867-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
        |           || ' node 10.' || CAST(doc_id % 256 AS VARCHAR)
        |           || '.3.' || CAST(doc_id % 250 AS VARCHAR) AS t
        |  FROM documents),
        |red AS (
        |  SELECT doc_id,
        |         CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
        |         CAST(len(regexp_extract_all(t, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phone,
        |         CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INTEGER) AS n_ip,
        |         regexp_replace(regexp_replace(regexp_replace(t,
        |           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |           '\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS r
        |  FROM pii)
        |SELECT doc_id, n_email, n_phone, n_ip,
        |       CAST(length(r) AS INTEGER) AS red_len, md5(r) AS red_md5
        |FROM red ORDER BY doc_id""".stripMargin,

    // own-sketch/own-rank-check: DuckDB's t-digest vs Spark's GK sketch,
    // each asserted within rank tolerance of the true median
    "q_approx_percentile" ->
      """WITH p AS (
        |  SELECT l_returnflag AS rf,
        |         approx_quantile(l_extendedprice, 0.5) AS ap,
        |         count(*) AS n
        |  FROM lineitem GROUP BY 1)
        |SELECT p.rf, CAST(p.n AS BIGINT) AS n,
        |       abs(sum(CASE WHEN l.l_extendedprice <= p.ap THEN 1 ELSE 0 END)
        |           - p.n / 2.0) <= p.n / 100.0 + 1 AS within_tolerance
        |FROM lineitem l JOIN p ON l.l_returnflag = p.rf
        |GROUP BY p.rf, p.n
        |ORDER BY p.rf""".stripMargin,

    "q_map_ops" ->
      """SELECT event_id,
        |       array_to_string(json_keys(props), ',') AS ks,
        |       CAST(json_extract(props, '$.k') AS INTEGER) AS kv
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "q_window_stats" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(ntile(4) OVER w AS INTEGER) AS nt,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd,
        |       first_value(o_orderkey) OVER wf AS fv,
        |       last_value(o_orderkey) OVER wf AS lv
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
        |       wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,

    // deterministic arg-min/arg-max: the extreme of an ordered (value,
    // tie-break key) struct — DuckDB compares named structs field-by-field
    // exactly like Spark's lexicographic struct ordering
    "q_arg_extreme" ->
      """SELECT o_orderpriority,
        |       (min({'c': CAST(round(o_totalprice * 100) AS BIGINT), 'k': o_orderkey})).k AS cheapest_key,
        |       (min({'c': CAST(round(o_totalprice * 100) AS BIGINT), 'k': o_orderkey})).c AS cheapest_cents,
        |       (max({'c': CAST(round(o_totalprice * 100) AS BIGINT), 'k': o_orderkey})).k AS priciest_key,
        |       (max({'c': CAST(round(o_totalprice * 100) AS BIGINT), 'k': o_orderkey})).c AS priciest_cents,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_bitwise_agg" ->
      """SELECT l_returnflag,
        |       bit_and(l_orderkey) AS and_keys,
        |       bit_or(l_orderkey) AS or_keys,
        |       bit_xor(l_orderkey) AS xor_keys,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // explode_outer: an empty collected list still yields one NULL row —
    // mirrored by substituting [NULL] for the empty list before unnest
    "q_explode_outer" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |         list_sort(list(o_orderkey) FILTER (WHERE o_totalprice > 450000.0)) AS big
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT o_custkey, u.big_orderkey
        |FROM g, LATERAL unnest(
        |  CASE WHEN big IS NULL OR len(big) = 0 THEN [NULL] ELSE big END)
        |  AS u(big_orderkey)
        |ORDER BY o_custkey, big_orderkey""".stripMargin,

    // hybrid retrieval: dense (cosine around vector 42) and sparse (BM25)
    // top-20 lists fused by reciprocal rank — floor(1e9/(60+rank)) exact
    // integers, absent list contributes 0, (score DESC, id ASC) total order
    "q_hybrid_search" ->
      s"""WITH $fpVecCte,
         |dsc AS (
         |  SELECT c.vec_id AS id, ${cosineExpr("q", "c")} AS cosine
         |  FROM nv q, nv c
         |  WHERE q.vec_id = 42 AND c.vec_id <> 42 AND q.nn > 0 AND c.nn > 0),
         |dr AS (
         |  SELECT id, row_number() OVER (ORDER BY cosine DESC, id ASC) AS r
         |  FROM dsc QUALIFY r <= 20),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
         |       WHERE term IN ('hash', 'join', 'scan') GROUP BY 1, 2),
         |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
         |       FROM documents WHERE len(string_split(text, ' ')) > 0),
         |st AS (SELECT count(*) AS n_docs,
         |              CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
         |ssc AS (
         |  SELECT tf.doc_id,
         |         CAST(round(
         |           ln((st.n_docs - dfx.df + 0.5) / (dfx.df + 0.5) + 1.0)
         |             * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))
         |             * 1000000.0) AS BIGINT) AS w_fp
         |  FROM tf JOIN dfx ON tf.term = dfx.term JOIN dl ON tf.doc_id = dl.doc_id, st),
         |sagg AS (SELECT doc_id, CAST(sum(w_fp) AS BIGINT) AS score_fp FROM ssc GROUP BY 1),
         |sr AS (
         |  SELECT doc_id AS id, row_number() OVER (ORDER BY score_fp DESC, doc_id ASC) AS r
         |  FROM sagg QUALIFY r <= 20),
         |fused AS (
         |  SELECT coalesce(dr.id, sr.id) AS doc_id,
         |         coalesce(CAST(floor(1000000000.0 / (60 + dr.r)) AS BIGINT), 0)
         |           + coalesce(CAST(floor(1000000000.0 / (60 + sr.r)) AS BIGINT), 0) AS score_rrf
         |  FROM dr FULL OUTER JOIN sr ON dr.id = sr.id)
         |SELECT doc_id, score_rrf,
         |       CAST(row_number() OVER (ORDER BY score_rrf DESC, doc_id ASC) AS INTEGER) AS hybrid_rank
         |FROM fused QUALIFY hybrid_rank <= 10
         |ORDER BY hybrid_rank""".stripMargin,

    // the text-lines round trip must preserve every document: the oracle
    // recomputes the (chars, tokens) projection from the base table
    // through the identical line-break sanitization
    "q_text_scan" ->
      """SELECT doc_id,
        |       CAST(len(regexp_replace(text, '[\t\n\r]', ' ', 'g')) AS INTEGER) AS n_chars,
        |       CAST(len(string_split(regexp_replace(text, '[\t\n\r]', ' ', 'g'), ' ')) AS INTEGER) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the hinted sort-merge join must equal the plain join
    "q_join_hints" ->
      """SELECT c_mktsegment,
        |       min(o_orderkey) AS first_key,
        |       max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_cross_join" ->
      """SELECT r.r_name, n.n_name
        |FROM region r CROSS JOIN nation n
        |ORDER BY r.r_name, n.n_name""".stripMargin,

    // NULL key matches exactly the NULL key under IS NOT DISTINCT FROM
    "q_nullsafe_join" ->
      """WITH a AS (
        |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
        |              ELSE o_orderpriority END AS k,
        |         count(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT a.k, a.n AS n_a, b.n AS n_b
        |FROM a JOIN a b ON a.k IS NOT DISTINCT FROM b.k
        |ORDER BY a.k NULLS FIRST""".stripMargin,

    "q_date_arith" ->
      """SELECT o_orderkey,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
        |       last_day(CAST(o_orderdate AS DATE)) AS eom,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1995-01-01') AS INTEGER) AS dd,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    // Correlated scalar subqueries — portable SQL, run VERBATIM by both
    // engines (SparkEntry registers the view and executes this string):
    // 1.5x-average predicate as exact integers so no float drift exists
    "q_scalar_subquery" ->
      """SELECT o_orderkey, cents
        |FROM (SELECT o_orderkey, o_custkey,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |      FROM orders) o
        |WHERE 2 * cents * (SELECT count(*) FROM orders o2
        |                   WHERE o2.o_custkey = o.o_custkey)
        |    > 3 * (SELECT CAST(sum(CAST(round(o3.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |           FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    // URL decomposition mirror: every component rebuilt from the same
    // closed-form arithmetic the Spark side embedded into the URL, so the
    // compare proves parse_url extracts exactly what was put in.
    // Containment mirror: ALL shared-shingle pairs (no pruning — the
    // oracle is the naive quadratic form the prefix filter must equal),
    // both directed containments from exact integer counts.
    "q_containment" ->
      s"""WITH $shinglesCte,
         |$shingleCountsCte,
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |       CAST(n_inter AS DOUBLE) / ca.n_sh AS c_ab,
         |       CAST(n_inter AS DOUBLE) / cb.n_sh AS c_ba
         |FROM inter
         |JOIN counts ca ON ca.id = id_a
         |JOIN counts cb ON cb.id = id_b
         |WHERE greatest(CAST(n_inter AS DOUBLE) / ca.n_sh,
         |               CAST(n_inter AS DOUBLE) / cb.n_sh) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin,

    // Robots longest-prefix policy: rules rebuilt closed-form per
    // domain; the winner per URL is arg_max over the (unique) matched
    // prefix length — most-specific-wins, the robots.txt evaluation
    // order.
    "q_robots_filter" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         (['example','sample','data','corp','site'])[CAST(doc_id % 5 AS INTEGER) + 1] || '.' ||
        |         (['com','org','net'])[CAST(doc_id % 3 AS INTEGER) + 1] AS reg_domain,
        |         (CASE WHEN doc_id % 3 = 1 THEN '/img/' ELSE '/p/' END)
        |           || CAST(doc_id // 3 AS VARCHAR) AS path
        |  FROM documents),
        |d AS (SELECT DISTINCT reg_domain FROM u),
        |r AS (
        |  SELECT reg_domain, '/' AS rule_path, TRUE AS allow FROM d
        |  UNION ALL SELECT reg_domain, '/img/', FALSE FROM d
        |  UNION ALL SELECT reg_domain, '/p/', ord(substr(reg_domain, 1, 1)) % 2 = 0 FROM d
        |  UNION ALL SELECT reg_domain, '/p/3', TRUE FROM d),
        |mt AS (
        |  SELECT u.doc_id, u.reg_domain, u.path, r.rule_path, r.allow,
        |         length(r.rule_path) AS rlen
        |  FROM u JOIN r ON r.reg_domain = u.reg_domain
        |              AND starts_with(u.path, r.rule_path))
        |SELECT doc_id, reg_domain, path,
        |       arg_max(rule_path, rlen) AS rule_path,
        |       arg_max(allow, rlen) AS allowed
        |FROM mt GROUP BY 1, 2, 3 ORDER BY doc_id""".stripMargin,

    // Canonical-URL dedup: the oracle recomputes the expected canonical
    // form and group size straight from the doc_id arithmetic that
    // synthesized the variants — Spark must get there by actually
    // parsing and normalizing the messy URL.
    "q_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id, doc_id // 3 AS b FROM documents)
        |SELECT 'https://' ||
        |         (['www','api','cdn','blog'])[CAST(b % 4 AS INTEGER) + 1] || '.' ||
        |         (['example','sample','data','corp','site'])[CAST(b % 5 AS INTEGER) + 1] || '.' ||
        |         (['com','org','net'])[CAST(b % 3 AS INTEGER) + 1] ||
        |         '/p/' || CAST(b AS VARCHAR) ||
        |         '?page=' || CAST(b % 7 AS VARCHAR) AS canonical_url,
        |       min(doc_id) AS keep_id,
        |       count(*) AS n_variants
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    // Integer-exact PageRank, three rounds unrolled CTE-for-CTE;
    // sum(BIGINT) is HUGEINT in DuckDB, so every contribution sum casts
    // back down before the damping arithmetic.
    "q_domain_rank" -> {
      val rounds = (1 to 3).map { t =>
        s"""c$t AS (
           |  SELECT ed.dst, CAST(sum(r${t - 1}.r // ed.deg) AS BIGINT) AS s
           |  FROM ed JOIN r${t - 1} ON r${t - 1}.v = ed.src GROUP BY 1),
           |r$t AS (
           |  SELECT n.v,
           |         CAST(150000000000 + (17 * COALESCE(c$t.s, 0)) // 20 AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN c$t ON c$t.dst = n.v)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT doc_id % 20 AS src, (doc_id * 7 + 3) % 20 AS dst
         |  FROM documents WHERE doc_id % 20 <> (doc_id * 7 + 3) % 20),
         |od AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, od.deg FROM e JOIN od USING (src)),
         |nodes AS (SELECT DISTINCT v FROM
         |  (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         |r0 AS (SELECT v, CAST(1000000000000 AS BIGINT) AS r FROM nodes),
         |$rounds
         |SELECT v AS domain, r AS rank FROM r3 ORDER BY domain""".stripMargin
    },

    // TrustRank: the q_domain_rank graph, but teleport mass only on the
    // seed set (v % 5 = 0) — r0 = scale·seed, per-round base =
    // (1−d)·scale·seed; propagation rounds mirror pageRankInt verbatim.
    "q_trust_rank" -> {
      val rounds = (1 to 3).map { t =>
        s"""c$t AS (
           |  SELECT ed.dst, CAST(sum(r${t - 1}.r // ed.deg) AS BIGINT) AS s
           |  FROM ed JOIN r${t - 1} ON r${t - 1}.v = ed.src GROUP BY 1),
           |r$t AS (
           |  SELECT n.v,
           |         CAST(n.is_seed * 150000000000 + (17 * COALESCE(c$t.s, 0)) // 20 AS BIGINT) AS r
           |  FROM nodes n LEFT JOIN c$t ON c$t.dst = n.v)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT doc_id % 20 AS src, (doc_id * 7 + 3) % 20 AS dst
         |  FROM documents WHERE doc_id % 20 <> (doc_id * 7 + 3) % 20),
         |od AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |ed AS (SELECT e.src, e.dst, od.deg FROM e JOIN od USING (src)),
         |nodes AS (SELECT v, CASE WHEN v % 5 = 0 THEN 1 ELSE 0 END AS is_seed FROM
         |  (SELECT DISTINCT v FROM
         |    (SELECT src AS v FROM e UNION ALL SELECT dst FROM e))),
         |r0 AS (SELECT v, CAST(is_seed * 1000000000000 AS BIGINT) AS r FROM nodes),
         |$rounds
         |SELECT v AS domain, r AS trust FROM r3 ORDER BY domain""".stripMargin
    },

    // Blocklist audit: each pattern count recomputed portably as the
    // replace-delta — equal to the Aho-Corasick all-occurrence count
    // because the phrases are border-free (occurrences cannot
    // self-overlap).
    "q_blocklist" ->
      """WITH c AS (
        |  SELECT source,
        |         (length(text) - length(replace(text, 'scan query', ''))) // 10 AS c1,
        |         (length(text) - length(replace(text, 'fast join', ''))) // 9 AS c2,
        |         (length(text) - length(replace(text, 'table scan', ''))) // 10 AS c3,
        |         (length(text) - length(replace(text, 'slow query', ''))) // 10 AS c4,
        |         (length(text) - length(replace(text, 'big data', ''))) // 8 AS c5
        |  FROM documents)
        |SELECT source,
        |       count(*) AS n_docs,
        |       CAST(sum(CASE WHEN c1 + c2 + c3 + c4 + c5 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
        |       CAST(sum(c1 + c2 + c3 + c4 + c5) AS BIGINT) AS total_hits,
        |       CAST(CAST(sum(c1) AS BIGINT) AS VARCHAR) || ',' ||
        |       CAST(CAST(sum(c2) AS BIGINT) AS VARCHAR) || ',' ||
        |       CAST(CAST(sum(c3) AS BIGINT) AS VARCHAR) || ',' ||
        |       CAST(CAST(sum(c4) AS BIGINT) AS VARCHAR) || ',' ||
        |       CAST(CAST(sum(c5) AS BIGINT) AS VARCHAR) AS pattern_totals_csv
        |FROM c GROUP BY source ORDER BY source""".stripMargin,

    // MAD robust outliers: lower median = element at rank (D+1)//2
    // ordering (value, day); MAD = lower median of |n − med|; all
    // integer.
    "q_mad_outliers" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |dd AS (SELECT CAST(count(*) AS BIGINT) AS d FROM daily),
        |med AS (
        |  SELECT n AS m FROM (
        |    SELECT n, row_number() OVER (ORDER BY n, day) AS r FROM daily), dd
        |  WHERE r = (d + 1) // 2),
        |dev AS (SELECT day, n, abs(n - m) AS dev FROM daily, med),
        |mad AS (
        |  SELECT dev AS mad FROM (
        |    SELECT dev, day, row_number() OVER (ORDER BY dev, day) AS r FROM dev), dd
        |  WHERE r = (d + 1) // 2)
        |SELECT day, n, m AS med, dev, mad, dev > 3 * mad AS is_outlier
        |FROM dev, med, mad ORDER BY day""".stripMargin,

    // kNN-graph degree histogram + reciprocity permille: the q_knn_graph
    // edge CTE, undirected census + reversed-key existence count.
    "q_graph_degree_stats" ->
      s"""WITH b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id
         |      WHERE nn > 0),
         |sc AS (
         |  SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
         |         ${cosineExpr("x", "y")} AS cosine
         |  FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |r AS (
         |  SELECT src_id, dst_id,
         |         CAST(row_number() OVER (PARTITION BY src_id
         |                                 ORDER BY cosine DESC, dst_id ASC) AS INTEGER) AS "rank"
         |  FROM sc),
         |dedges AS MATERIALIZED (
         |  SELECT src_id AS src, dst_id AS dst FROM r WHERE "rank" <= 3),
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |        FROM dedges),
         |deg AS (SELECT vtx, CAST(count(*) AS BIGINT) AS deg FROM (
         |          SELECT a AS vtx FROM und UNION ALL SELECT b AS vtx FROM und)
         |        GROUP BY 1),
         |rec AS (SELECT CAST(count(*) AS BIGINT) AS n_recip FROM dedges x
         |        WHERE EXISTS (SELECT 1 FROM dedges y
         |                      WHERE y.src = x.dst AND y.dst = x.src)),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_dir FROM dedges)
         |SELECT deg, CAST(count(*) AS BIGINT) AS n_vertices,
         |       CAST((1000 * n_recip) // n_dir AS BIGINT) AS recip_permille
         |FROM deg, rec, ne
         |GROUP BY deg, n_recip, n_dir
         |ORDER BY deg""".stripMargin,

    // Link prediction by common neighbors over the kNN graph: wedge
    // self-join of the symmetric edge list, adjacency anti-check,
    // Jaccard of neighbor sets in exact permille.
    "q_common_neighbors" ->
      s"""WITH b AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN b ON nv.vec_id = b.vec_id
         |      WHERE nn > 0),
         |sc AS (
         |  SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
         |         ${cosineExpr("x", "y")} AS cosine
         |  FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |r AS (
         |  SELECT src_id, dst_id,
         |         CAST(row_number() OVER (PARTITION BY src_id
         |                                 ORDER BY cosine DESC, dst_id ASC) AS INTEGER) AS "rank"
         |  FROM sc),
         |dedges AS MATERIALIZED (
         |  SELECT src_id AS src, dst_id AS dst FROM r WHERE "rank" <= 3),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
         |  FROM dedges),
         |sym AS (SELECT a AS uu, b AS vv FROM und
         |        UNION ALL SELECT b AS uu, a AS vv FROM und),
         |deg AS (SELECT uu, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1),
         |cn AS (
         |  SELECT l.vv AS a, r2.vv AS b, CAST(count(*) AS BIGINT) AS cn
         |  FROM sym l JOIN sym r2 ON l.uu = r2.uu AND l.vv < r2.vv
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |na AS (SELECT cn.a, cn.b, cn.cn FROM cn
         |       WHERE NOT EXISTS (SELECT 1 FROM und
         |                         WHERE und.a = cn.a AND und.b = cn.b))
         |SELECT na.a, na.b, na.cn,
         |       CAST((1000 * na.cn) // (da.deg + db.deg - na.cn) AS BIGINT)
         |         AS jaccard_permille
         |FROM na JOIN deg da ON na.a = da.uu JOIN deg db ON na.b = db.uu
         |ORDER BY a, b""".stripMargin,

    // Gonzalez farthest-point k-center, k=4 unrolled: seed = smallest
    // id, each round argmax over the running min squared-L2 (exact
    // integers, ties → smallest id).
    "q_kcenter_seeds" ->
      s"""WITH $fpVecCte,
         |p AS (SELECT vec_id, fv FROM fp WHERE fv IS NOT NULL),
         |c0 AS (SELECT vec_id AS id, fv FROM p
         |       WHERE vec_id = (SELECT min(vec_id) FROM p)),
         |d1 AS (SELECT p.vec_id, CAST(${sqDistExpr("p", "c0")} AS BIGINT) AS mind
         |       FROM p, c0),
         |s1 AS (SELECT vec_id, mind FROM d1 ORDER BY mind DESC, vec_id LIMIT 1),
         |c1 AS (SELECT p.vec_id AS id, p.fv FROM p JOIN s1 ON p.vec_id = s1.vec_id),
         |d2 AS (SELECT p.vec_id,
         |              least(d1.mind, CAST(${sqDistExpr("p", "c1")} AS BIGINT)) AS mind
         |       FROM p JOIN d1 ON p.vec_id = d1.vec_id, c1),
         |s2 AS (SELECT vec_id, mind FROM d2 ORDER BY mind DESC, vec_id LIMIT 1),
         |c2 AS (SELECT p.vec_id AS id, p.fv FROM p JOIN s2 ON p.vec_id = s2.vec_id),
         |d3 AS (SELECT p.vec_id,
         |              least(d2.mind, CAST(${sqDistExpr("p", "c2")} AS BIGINT)) AS mind
         |       FROM p JOIN d2 ON p.vec_id = d2.vec_id, c2),
         |s3 AS (SELECT vec_id, mind FROM d3 ORDER BY mind DESC, vec_id LIMIT 1)
         |SELECT CAST(0 AS INTEGER) AS seed_idx, id AS vec_id,
         |       CAST(0 AS BIGINT) AS dist_fp FROM c0
         |UNION ALL SELECT CAST(1 AS INTEGER), vec_id, mind FROM s1
         |UNION ALL SELECT CAST(2 AS INTEGER), vec_id, mind FROM s2
         |UNION ALL SELECT CAST(3 AS INTEGER), vec_id, mind FROM s3
         |ORDER BY seed_idx""".stripMargin,

    // Top user journeys: per-user lead² trigram paths, top-20 by
    // (count DESC, path).
    "q_user_journeys" ->
      """WITH e AS (SELECT user_id AS u, event_id, event_type,
        |                  epoch_us(ts) AS us FROM events),
        |t AS (SELECT event_type AS t1,
        |             lead(event_type, 1) OVER (PARTITION BY u ORDER BY us, event_id) AS t2,
        |             lead(event_type, 2) OVER (PARTITION BY u ORDER BY us, event_id) AS t3
        |      FROM e)
        |SELECT t1 || '>' || t2 || '>' || t3 AS path,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM t WHERE t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,

    // Window distribution functions over the calendar-bounded day
    // table; percent_rank/cume_dist are exact-integer-rank divisions.
    "q_window_distribution" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1)
        |SELECT day, n,
        |       percent_rank() OVER (ORDER BY n, day) AS pct_rank,
        |       cume_dist() OVER (ORDER BY n, day) AS cume,
        |       CAST(ntile(4) OVER (ORDER BY n, day) AS INTEGER) AS quartile
        |FROM daily ORDER BY day""".stripMargin,

    // Salted count-distinct: the oracle is the PLAIN distinct count —
    // any salt-routing error in the two-level form hash-mismatches.
    "q_salted_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    // NOT IN with a NULL in the subquery vs NOT EXISTS — the SAME text
    // runs on both engines; the NOT IN branch must return 0.
    "q_null_semantics" ->
      """WITH s AS (
        |  SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_custkey END
        |           AS nullable_key
        |  FROM customer WHERE c_custkey < 50)
        |SELECT
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey NOT IN (SELECT nullable_key FROM s))
        |    AS not_in_count,
        |  (SELECT count(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM s
        |                     WHERE s.nullable_key = o.o_custkey))
        |    AS not_exists_count""".stripMargin,

    // Growth accounting: per-user active-day lag classifies new /
    // retained (≤14d) / resurrected (>14d); cumulative new-user sum
    // over the calendar-bounded day table.
    "q_growth_accounting" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id AS u, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |st AS (
        |  SELECT day,
        |         CASE WHEN lag(day) OVER (PARTITION BY u ORDER BY day) IS NULL
        |              THEN 'new'
        |              WHEN day - lag(day) OVER (PARTITION BY u ORDER BY day) <= 14
        |              THEN 'retained'
        |              ELSE 'resurrected' END AS status
        |  FROM ud),
        |daily AS (
        |  SELECT day, count(*) AS n_active,
        |         CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_new,
        |         CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_retained,
        |         CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_resurrected
        |  FROM st GROUP BY 1)
        |SELECT day, n_active, n_new, n_retained, n_resurrected,
        |       CAST(sum(n_new) OVER (ORDER BY day
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS cum_users
        |FROM daily ORDER BY day""".stripMargin,

    // Day-of-week profile: epoch-day mod 7 phase, truncating mean from
    // the sums.
    "q_dow_profile" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |p AS (SELECT day % 7 AS dow, CAST(count(*) AS BIGINT) AS n_days,
        |             CAST(sum(n) AS BIGINT) AS total_events,
        |             CAST(min(n) AS BIGINT) AS min_day,
        |             CAST(max(n) AS BIGINT) AS max_day
        |      FROM daily GROUP BY 1)
        |SELECT dow, n_days, total_events,
        |       CAST(total_events // n_days AS BIGINT) AS mean_per_day,
        |       min_day, max_day
        |FROM p ORDER BY dow""".stripMargin,

    // Inter-event gap spectrum: per-(user, type) lag gaps bucketed by
    // binary digit count − 1 (⌊log₂⌋, transcendental-free; bin() is
    // unpadded in both engines, bin(0)='0' → bucket 0).
    "q_interevent_gaps" ->
      """WITH e AS (SELECT user_id AS u, event_type, event_id,
        |                  epoch_us(ts) AS us FROM events),
        |g AS (SELECT event_type,
        |             us - lag(us) OVER (PARTITION BY u, event_type
        |                                ORDER BY us, event_id) AS gap
        |      FROM e)
        |SELECT event_type,
        |       CAST(length(bin(gap)) - 1 AS INTEGER) AS log2_bucket,
        |       CAST(count(*) AS BIGINT) AS n_gaps,
        |       CAST(min(gap) AS BIGINT) AS min_gap_us,
        |       CAST(max(gap) AS BIGINT) AS max_gap_us
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY 1, 2 ORDER BY event_type, log2_bucket""".stripMargin,

    // Per-vertex local clustering coefficient: oriented a<b<c triangle
    // enumeration credits each corner, coeff = 2000·tri // deg(deg−1)
    // in permille, NULL for deg < 2.
    "q_clustering_coeff" ->
      s"""WITH ${knnUndCte(3)},
         |deg AS (SELECT vtx, CAST(count(*) AS BIGINT) AS deg FROM (
         |          SELECT a AS vtx FROM und UNION ALL SELECT b AS vtx FROM und)
         |        GROUP BY 1),
         |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |        FROM und e1 JOIN und e2 ON e1.b = e2.a
         |        WHERE EXISTS (SELECT 1 FROM und e3
         |                      WHERE e3.a = e1.a AND e3.b = e2.b)),
         |tv AS (SELECT vtx, CAST(count(*) AS BIGINT) AS tri FROM (
         |         SELECT x AS vtx FROM tri
         |         UNION ALL SELECT y FROM tri
         |         UNION ALL SELECT z FROM tri) GROUP BY 1)
         |SELECT deg.vtx AS v, deg.deg,
         |       COALESCE(tv.tri, CAST(0 AS BIGINT)) AS tri,
         |       CASE WHEN deg.deg >= 2
         |            THEN CAST((2000 * COALESCE(tv.tri, 0))
         |                      // (deg.deg * (deg.deg - 1)) AS BIGINT)
         |       END AS coeff_permille
         |FROM deg LEFT JOIN tv ON deg.vtx = tv.vtx
         |ORDER BY v""".stripMargin,

    // Degree assortativity sufficient statistics: symmetric endpoint-
    // degree sums (n, Σx, Σx², Σxy) — Pearson's r derives outside the
    // hash gate.
    "q_degree_assortativity" ->
      s"""WITH ${knnUndCte(3)},
         |sym AS (SELECT a AS uu, b AS vv FROM und
         |        UNION ALL SELECT b AS uu, a AS vv FROM und),
         |deg AS (SELECT uu, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY 1)
         |SELECT CAST(count(*) AS BIGINT) AS n_endpoints,
         |       CAST(sum(dx.deg) AS BIGINT) AS sum_x,
         |       CAST(sum(dx.deg * dx.deg) AS BIGINT) AS sum_x2,
         |       CAST(sum(dx.deg * dy.deg) AS BIGINT) AS sum_xy
         |FROM sym JOIN deg dx ON sym.uu = dx.uu
         |         JOIN deg dy ON sym.vv = dy.uu""".stripMargin,

    // SQL-surface parity: the SAME text runs on both engines. Bounded
    // recursion (depth < 5 fences cycles), 40-row edge table.
    "q_recursive_cte" ->
      """WITH RECURSIVE r(start, v, d) AS (
        |  SELECT n, n, 0 FROM (SELECT DISTINCT doc_id % 20 AS n FROM documents)
        |  UNION ALL
        |  SELECT r.start, e.dst, r.d + 1
        |  FROM r JOIN (SELECT DISTINCT doc_id % 20 AS src,
        |                      (7 * doc_id + 3) % 20 AS dst FROM documents
        |               UNION
        |               SELECT DISTINCT doc_id % 20, (3 * doc_id + 11) % 20
        |               FROM documents) e
        |    ON e.src = r.v
        |  WHERE r.d < 5)
        |SELECT start, v, CAST(min(d) AS INTEGER) AS hops
        |FROM r GROUP BY start, v ORDER BY start, v""".stripMargin,

    // SQL-surface parity: correlated LATERAL with per-group LIMIT, the
    // SAME text on both engines; ties inside the LIMIT break on
    // orderkey so the selected set is deterministic.
    "q_lateral_topn" ->
      """SELECT s.c_mktsegment, l.o_orderkey, l.price_cents
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) s,
        |LATERAL (SELECT o.o_orderkey,
        |                CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents
        |         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |         WHERE c.c_mktsegment = s.c_mktsegment
        |         ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 2) l
        |ORDER BY s.c_mktsegment, l.price_cents DESC""".stripMargin,

    // Rolling z-score over exact-integer power sums; the double
    // arithmetic repeats Spark's expression tree verbatim (sum/div/sqrt
    // are correctly-rounded IEEE ⇒ bit-equal).
    "q_anomaly_zscore" ->
      """WITH daily AS (
        |  SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT day, n,
        |         sum(n) OVER w AS s7,
        |         sum(n * n) OVER w AS ss7,
        |         count(n) OVER w AS c7
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT day, n,
        |         CAST(s7 AS DOUBLE) / c7 AS mean7,
        |         CASE WHEN (CAST(ss7 AS DOUBLE)
        |                    - CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE) / c7) / (c7 - 1) > 0
        |              THEN (CAST(n AS DOUBLE) - CAST(s7 AS DOUBLE) / c7)
        |                   / sqrt((CAST(ss7 AS DOUBLE)
        |                           - CAST(s7 AS DOUBLE) * CAST(s7 AS DOUBLE) / c7) / (c7 - 1))
        |         END AS z
        |  FROM st WHERE c7 = 7)
        |SELECT day, n, mean7, z,
        |       COALESCE(abs(z) >= 2.0, FALSE) AS is_anomaly
        |FROM z ORDER BY day""".stripMargin,

    "q_url_parse" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         (['www','api','cdn','blog'])[CAST(doc_id % 4 AS INTEGER) + 1] AS sub,
        |         (['example','sample','data','corp','site'])[CAST(doc_id % 5 AS INTEGER) + 1] AS dom,
        |         (['com','org','net'])[CAST(doc_id % 3 AS INTEGER) + 1] AS tld
        |  FROM documents)
        |SELECT doc_id,
        |       sub || '.' || dom || '.' || tld AS host,
        |       dom || '.' || tld AS reg_domain,
        |       tld,
        |       '/p/' || CAST(doc_id AS VARCHAR) AS path,
        |       CAST(doc_id % 7 AS INTEGER) AS page
        |FROM u ORDER BY doc_id""".stripMargin,

    // Reference-core ingest + staging mirror: every staged column
    // recomputed from the closed-form doc_id arithmetic that synthesized
    // the JSON payload — parsing, error/malformed routing, plausibility
    // filter, ILIKE categories, bands, 12-hour time parse all verified.
    "q_weather_stg" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(doc_id % 120 - 55 AS INTEGER) AS temperature,
        |         (['sunny spells','light rain','cloudy sky','mist'])[CAST(doc_id % 4 AS INTEGER) + 1] AS descr,
        |         (['N','NE','E','SE','S','SW','W','NW'])[CAST(doc_id % 8 AS INTEGER) + 1] AS wdir
        |  FROM documents
        |  WHERE doc_id % 9 <> 0 AND doc_id % 11 <> 1),
        |f AS (SELECT * FROM d WHERE temperature BETWEEN -50 AND 60)
        |SELECT trim(upper('City ' || CAST(doc_id AS VARCHAR))) AS city_clean,
        |       trim(upper('Country ' || CAST(doc_id % 7 AS VARCHAR))) AS country_clean,
        |       temperature,
        |       CASE WHEN lower(descr) LIKE '%sunny%' THEN 'Clear'
        |            WHEN lower(descr) LIKE '%rain%' THEN 'Rain'
        |            WHEN lower(descr) LIKE '%cloud%' THEN 'Cloudy'
        |            ELSE trim(descr) END AS weather_category,
        |       CAST(doc_id % 101 AS INTEGER) AS humidity,
        |       CAST(doc_id % 40 AS INTEGER) AS wind_speed,
        |       wdir AS wind_direction,
        |       CAST(980 + doc_id % 60 AS INTEGER) AS pressure,
        |       CAST(doc_id % 16 AS INTEGER) AS visibility,
        |       CAST(doc_id % 12 AS INTEGER) AS uv_index,
        |       make_timestamp(1970, 1, 1,
        |         CASE WHEN doc_id % 2 = 0
        |              THEN CASE WHEN doc_id % 12 + 1 = 12 THEN 0 ELSE doc_id % 12 + 1 END
        |              ELSE CASE WHEN doc_id % 12 + 1 = 12 THEN 12 ELSE doc_id % 12 + 13 END
        |         END,
        |         doc_id % 60, 0) AS observation_time,
        |       TIMESTAMP '2026-03-01 10:30:00' AS extracted_at,
        |       TIMESTAMP '2026-03-01 09:00:00' AS data_interval_start,
        |       CASE WHEN temperature <= -1 THEN 'Freezing'
        |            WHEN temperature BETWEEN 0 AND 10 THEN 'Cold'
        |            WHEN temperature BETWEEN 11 AND 20 THEN 'Mild'
        |            WHEN temperature BETWEEN 21 AND 30 THEN 'Warm'
        |            ELSE 'Hot' END AS temperature_category,
        |       DATE '2026-03-01' AS extraction_date
        |FROM f
        |ORDER BY city_clean""".stripMargin,

    // SQL-registered kernel surface: every native function's output
    // recomputed from portable SQL — shingle_array = sorted distinct
    // n-gram strings, sorted_intersect_count = |set intersection|,
    // dot_fp = fixed-point list dot, quantize_int8 = the q_quantize_embed
    // formula (proven engine-equal there), CSV-joined.
    "q_sql_kernels" -> {
      def sh(t: String) =
        s"""list_sort(list_distinct(list_transform(
           |    range(1, greatest(len(string_split($t, ' ')) - 1, 1)),
           |    i -> array_to_string(list_slice(string_split($t, ' '), i, i + 2), ' '))))""".stripMargin
      val sigs = (1 to 4).map(i => s"min(h1 + $i * h2) AS sig_$i").mkString(", ")
      val sigsCsv = (1 to 4).map(i => s"CAST(sig_$i AS VARCHAR)").mkString("concat_ws(',', ", ", ", ")")
      s"""WITH $shinglesCte,
         |$simhashCte,
         |pair AS (
         |  SELECT a.doc_id, a.text AS ta, ${sh("a.text")} AS sa, ${sh("b.text")} AS sb
         |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
         |  WHERE a.doc_id < 50),
         |emb AS (
         |  SELECT ea.vec_id,
         |         list_transform(ea.embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fa,
         |         list_transform(eb.embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fb,
         |         CAST(list_min(ea.embedding) AS DOUBLE) AS mn,
         |         CAST(list_max(ea.embedding) AS DOUBLE) AS mx,
         |         ea.embedding AS va
         |  FROM embeddings ea JOIN embeddings eb ON eb.vec_id = ea.vec_id + 1
         |  WHERE ea.vec_id < 50),
         |sigs AS (
         |  SELECT id, $sigsCsv AS sigs_csv FROM (
         |    SELECT id,
         |           $sigs
         |    FROM (SELECT id,
         |                 CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h1,
         |                 CAST(concat('0x', substring(md5(shingle), 17, 15)) AS BIGINT) AS h2
         |          FROM sh WHERE id < 50) GROUP BY id)),
         |gse AS (
         |  SELECT vec_id % 5 AS g, unnest(fv) AS v, unnest(range(1, len(fv) + 1)) AS pos
         |  FROM (SELECT vec_id,
         |               list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fv
         |        FROM embeddings WHERE vec_id < 50)),
         |gs AS (
         |  SELECT g, array_to_string(list(CAST(s AS VARCHAR) ORDER BY pos), ',') AS gsum_csv FROM (
         |    SELECT g, pos, CAST(sum(v) AS BIGINT) AS s FROM gse GROUP BY g, pos)
         |  GROUP BY g)
         |SELECT p.doc_id,
         |       CAST(len(p.sa) AS INTEGER) AS n_shingles,
         |       CAST(len(list_intersect(p.sa, p.sb)) AS BIGINT) AS n_common,
         |       CAST(list_sum(list_transform(range(1, len(e.fa) + 1),
         |              i -> e.fa[i] * e.fb[i])) AS BIGINT) AS dot,
         |       array_to_string(list_transform(range(1, len(e.va) + 1),
         |         i -> CAST(CASE WHEN e.mx = e.mn THEN 0
         |                        ELSE round((CAST(e.va[i] AS DOUBLE) - e.mn) * 255.0 / (e.mx - e.mn))
         |                   END AS INTEGER)), ',') AS codes_csv,
         |       sh16.simhash AS simhash,
         |       sigs.sigs_csv AS sigs_csv,
         |       CAST((length(p.ta) - length(replace(p.ta, 'scan query', ''))) // 10 AS VARCHAR)
         |         || ',' ||
         |       CAST((length(p.ta) - length(replace(p.ta, 'big data', ''))) // 8 AS VARCHAR) AS mpc_csv,
         |       gs.gsum_csv AS gsum_csv
         |FROM pair p
         |JOIN emb e ON e.vec_id = p.doc_id
         |JOIN sh16 ON sh16.id = p.doc_id
         |JOIN sigs ON sigs.id = p.doc_id
         |JOIN gs ON gs.g = p.doc_id % 5
         |ORDER BY p.doc_id""".stripMargin
    },

    // IVF-PQ two-stage serving: probe lists by the double-cosine rule
    // (exact integer inputs + correctly-rounded IEEE ops = engine-equal),
    // PQ-ADC re-rank within the probed lists only
    "q_ivfpq_topk" ->
      s"""WITH $fpVecCte,
         |cb AS (SELECT vec_id AS cid, fv AS cfv FROM fp WHERE vec_id < 16),
         |js AS (SELECT unnest(range(0, 4)) AS j),
         |q AS (SELECT fv AS qfv, nn AS qn FROM nv WHERE vec_id = 42),
         |cents AS (SELECT vec_id AS cent_id, fv AS cent_v, nn AS cent_n
         |          FROM nv WHERE vec_id < 16 AND nn > 0),
         |probe AS (
         |  SELECT cent_id FROM (
         |    SELECT cents.cent_id,
         |           row_number() OVER (ORDER BY
         |             CAST(list_sum(list_transform(range(1, len(q.qfv) + 1), i -> q.qfv[i] * cents.cent_v[i])) AS DOUBLE)
         |             / (sqrt(CAST(q.qn AS DOUBLE)) * sqrt(CAST(cents.cent_n AS DOUBLE))) DESC,
         |             cents.cent_id ASC) AS r
         |    FROM q, cents)
         |  WHERE r <= 2),
         |casgn AS (
         |  SELECT c_id, cent_id FROM (
         |    SELECT v.vec_id AS c_id, cents.cent_id,
         |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
         |             CAST(list_sum(list_transform(range(1, len(v.fv) + 1), i -> v.fv[i] * cents.cent_v[i])) AS DOUBLE)
         |             / (sqrt(CAST(v.nn AS DOUBLE)) * sqrt(CAST(cents.cent_n AS DOUBLE))) DESC,
         |             cents.cent_id ASC) AS r
         |    FROM nv v, cents WHERE v.nn > 0)
         |  WHERE r = 1),
         |cand AS (SELECT c_id FROM casgn JOIN probe USING (cent_id)),
         |pairs AS (
         |  SELECT v.vec_id, js.j, cb.cid,
         |         list_sum(list_transform(range(1, 17), i ->
         |           (v.fv[js.j*16 + i] - cb.cfv[js.j*16 + i])
         |           * (v.fv[js.j*16 + i] - cb.cfv[js.j*16 + i]))) AS dist
         |  FROM fp v, js, cb WHERE v.vec_id IN (SELECT c_id FROM cand)),
         |codes AS (
         |  SELECT vec_id, j, cid FROM (
         |    SELECT vec_id, j, cid,
         |           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
         |    FROM pairs) WHERE rn = 1),
         |lut AS (
         |  SELECT js.j, cb.cid,
         |         list_sum(list_transform(range(1, 17), i ->
         |           (q.qfv[js.j*16 + i] - cb.cfv[js.j*16 + i])
         |           * (q.qfv[js.j*16 + i] - cb.cfv[js.j*16 + i]))) AS d
         |  FROM q, js, cb)
         |SELECT c.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
         |FROM codes c JOIN lut l ON c.j = l.j AND c.cid = l.cid
         |GROUP BY c.vec_id
         |ORDER BY adc_dist, c.vec_id LIMIT 10""".stripMargin,

    // PQ ADC serving: codes as in q_pq_codes; LUT = exact integer sq-L2
    // between the query (vec_id 42) subvectors and each codebook entry;
    // score = sum of per-subspace LUT hits; total order (dist, id).
    "q_pq_topk" ->
      """WITH fp AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS fv
        |  FROM embeddings),
        |cb AS (SELECT vec_id AS cid, fv AS cfv FROM fp WHERE vec_id < 16),
        |js AS (SELECT unnest(range(0, 4)) AS j),
        |pairs AS (
        |  SELECT v.vec_id, js.j, cb.cid,
        |         list_sum(list_transform(range(1, 17), i ->
        |           (v.fv[js.j*16 + i] - cb.cfv[js.j*16 + i])
        |           * (v.fv[js.j*16 + i] - cb.cfv[js.j*16 + i]))) AS dist
        |  FROM fp v, js, cb),
        |codes AS (
        |  SELECT vec_id, j, cid FROM (
        |    SELECT vec_id, j, cid,
        |           row_number() OVER (PARTITION BY vec_id, j ORDER BY dist, cid) AS rn
        |    FROM pairs) WHERE rn = 1),
        |q AS (SELECT fv AS qfv FROM fp WHERE vec_id = 42),
        |lut AS (
        |  SELECT js.j, cb.cid,
        |         list_sum(list_transform(range(1, 17), i ->
        |           (q.qfv[js.j*16 + i] - cb.cfv[js.j*16 + i])
        |           * (q.qfv[js.j*16 + i] - cb.cfv[js.j*16 + i]))) AS d
        |  FROM q, js, cb)
        |SELECT c.vec_id, CAST(sum(l.d) AS BIGINT) AS adc_dist
        |FROM codes c JOIN lut l ON c.j = l.j AND c.cid = l.cid
        |GROUP BY c.vec_id
        |ORDER BY adc_dist, c.vec_id LIMIT 10""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
        |       CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin,

    "q_fuzzy_match" ->
      """WITH s AS (SELECT DISTINCT source FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b,
        |       CAST(levenshtein(a.source, b.source) AS INTEGER) AS dist
        |FROM s a JOIN s b ON a.source < b.source
        |WHERE levenshtein(a.source, b.source) <= 2
        |ORDER BY src_a, src_b""".stripMargin,

    // q_zorder_scan reads the Morton-clustered copy of lineitem (same
    // rows, different layout) — the oracle is the equivalent predicate
    // over the base table (result transparency).
    "q_zorder_scan" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_partkey % 1024 AS INTEGER) AS zx,
        |       CAST(l_suppkey % 1024 AS INTEGER) AS zy,
        |       l_quantity
        |FROM lineitem WHERE l_suppkey % 1024 < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_winsorize" ->
      """WITH b AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |  FROM lineitem),
        |st AS (SELECT quantile_cont(price_cents, 0.01) AS p_lo,
        |              quantile_cont(price_cents, 0.99) AS p_hi FROM b)
        |SELECT l_orderkey, l_linenumber, price_cents,
        |       CASE WHEN price_cents < p_lo THEN p_lo
        |            WHEN price_cents > p_hi THEN p_hi
        |            ELSE CAST(price_cents AS DOUBLE) END AS clipped
        |FROM b, st ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // The oracle groups duplicated 5-grams by their STRING content where
    // the engine groups by xxhash64 of the same string — identical
    // equivalence classes modulo 64-bit collisions (none on this corpus,
    // vanishing at 2^-64/pair in general).
    "q_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(range(1, len(toks) - 5 + 2)) AS p, toks
        |      FROM t WHERE len(toks) >= 5),
        |gr AS (SELECT doc_id, p,
        |              array_to_string(list_slice(toks, p, p + 4), ' ') AS gram
        |       FROM g),
        |d AS (SELECT doc_id, p, count(*) OVER (PARTITION BY gram) AS n_occ FROM gr),
        |m AS (SELECT doc_id, p,
        |             lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS nxt,
        |             lag(p)  OVER (PARTITION BY doc_id ORDER BY p) AS prv
        |      FROM d WHERE n_occ > 1),
        |a AS (SELECT doc_id,
        |             count(*) AS n_dup_grams,
        |             sum(CASE WHEN prv IS NULL OR p - prv > 5 THEN 1 ELSE 0 END) AS n_spans,
        |             sum(CASE WHEN nxt IS NULL THEN 5 ELSE least(5, nxt - p) END) AS dup_tokens
        |      FROM m GROUP BY doc_id)
        |SELECT a.doc_id,
        |       CAST(n_dup_grams AS BIGINT) AS n_dup_grams,
        |       CAST(n_spans AS BIGINT) AS n_spans,
        |       CAST(dup_tokens AS BIGINT) AS dup_tokens,
        |       CAST(len(t.toks) AS BIGINT) AS n_tokens,
        |       CAST(dup_tokens AS DOUBLE) / len(t.toks) AS dup_frac
        |FROM a JOIN t ON a.doc_id = t.doc_id
        |ORDER BY a.doc_id""".stripMargin,

    "q_unigram_score" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |hist AS (SELECT term, count(*) AS freq FROM tok GROUP BY term)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(freq) AS BIGINT) AS sum_freq,
        |       CAST((1000 * sum(freq)) // count(*) AS BIGINT) AS mean_freq_milli
        |FROM tok JOIN hist USING (term)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Sketch estimates verified EXACTLY: per-nation segment cardinality
    // (≤ 5) is deep inside the HLL coupon-list regime where the
    // DataSketches estimator is exact — so the unioned-sketch estimate
    // equals DuckDB's exact DISTINCT count (contract documented at the
    // query; at real cardinalities this row becomes an estimate).
    "q_hll_distinct" ->
      """SELECT c_nationkey,
        |       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_vocab_build" ->
      """WITH hist AS (
        |  SELECT term, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term)
        |SELECT term, CAST(freq AS BIGINT) AS freq,
        |       CAST(row_number() OVER (ORDER BY freq DESC, term) AS INTEGER)
        |         AS token_id
        |FROM hist ORDER BY freq DESC, term LIMIT 32""".stripMargin,

    "q_bigram_lm" ->
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |p AS (SELECT unnest(range(1, len(toks))) AS i, toks FROM t),
        |bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM p),
        |cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY w1, w2),
        |ca AS (SELECT w1, sum(c_ab) AS c_a FROM cab GROUP BY w1)
        |SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab, CAST(c_a AS BIGINT) AS c_a,
        |       CAST((1000 * c_ab) // c_a AS BIGINT) AS cond_milli
        |FROM cab JOIN ca USING (w1)
        |WHERE c_ab >= 5 ORDER BY w1, w2""".stripMargin,

    // Mirrors TextOps.gopherReason rule-for-rule (punct/bigram exprs are
    // the q_text_quality / q_repetition mirrors already proven bit-equal).
    "q_quality_filter" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
         |           FROM documents),
         |m AS (SELECT doc_id, text, toks,
         |             CAST(len(toks) AS INTEGER) AS n_tokens,
         |             CASE WHEN length(text) > 0
         |                  THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
         |                  ELSE 0.0 END AS punct,
         |             CASE WHEN len(toks) >= 2
         |                  THEN list_transform(range(1, len(toks)),
         |                         i -> array_to_string(list_slice(toks, i, i + 1), ' '))
         |                  ELSE [] END AS bg,
         |             ${vocabHits(stop("en"))} AS hits
         |      FROM t),
         |r AS (SELECT doc_id, n_tokens,
         |             CASE WHEN n_tokens < 20 THEN 'too_short'
         |                  WHEN n_tokens > 1000 THEN 'too_long'
         |                  WHEN punct > 0.2 THEN 'punct_soup'
         |                  WHEN len(bg) > 0 AND
         |                       CAST(list_max(list_transform(list_distinct(bg),
         |                         x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE)
         |                         / len(bg) > 0.08 THEN 'repetition'
         |                  WHEN hits = 0 THEN 'no_stopwords'
         |             END AS reason
         |      FROM m)
         |SELECT doc_id, n_tokens, reason, reason IS NULL AS keep
         |FROM r ORDER BY doc_id""".stripMargin,

    "q_incremental_dedup" ->
      s"""WITH f AS (SELECT doc_id, $fpExpr AS fp FROM documents),
         |base AS (SELECT DISTINCT fp FROM f WHERE doc_id % 10 <> 0),
         |batch AS (SELECT doc_id, fp FROM f WHERE doc_id % 10 = 0
         |          UNION ALL
         |          SELECT doc_id + 10000, fp FROM f WHERE doc_id % 7 = 0),
         |novel AS (SELECT * FROM batch
         |          WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.fp = batch.fp))
         |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, fp,
         |       CAST(count(*) AS BIGINT) AS batch_dups
         |FROM novel GROUP BY fp ORDER BY doc_id""".stripMargin,

    // Sliding windows: size 2h / slide 1h ⇒ every event belongs to the
    // two hour-aligned windows covering it (epoch-aligned, same as
    // Spark's window() contract).
    "q_sliding_window" ->
      """WITH e AS (SELECT event_type, value,
        |                  (epoch_us(ts) // 3600000000) * 3600000000 AS h
        |           FROM events),
        |x AS (SELECT event_type, value, h - s * 3600000000 AS ws
        |      FROM e, (SELECT unnest([0, 1]) AS s))
        |SELECT ws AS window_start_us, ws + 7200000000 AS window_end_us,
        |       event_type,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM x GROUP BY ws, event_type
        |ORDER BY window_start_us, event_type""".stripMargin,

    "q_bigram_fluency" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |p AS (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks FROM t),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM p),
        |cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY w1, w2),
        |ca AS (SELECT w1, sum(c_ab) AS c_a FROM cab GROUP BY w1),
        |m AS (SELECT w1, w2, (1000 * c_ab) // c_a AS cm
        |      FROM cab JOIN ca USING (w1))
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(sum(cm) AS BIGINT) AS sum_cond_milli,
        |       CAST(sum(cm) // count(*) AS BIGINT) AS mean_cond_milli
        |FROM bg JOIN m USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Out-of-corpus LM apply: model trained on doc_id % 10 <> 0, held-out
    // 10% scored via LEFT join; unseen transitions take the backoff floor
    // of 1 permille and are counted in n_oov.
    "q_bigram_fluency_oov" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |           WHERE len(string_split(text, ' ')) >= 2),
        |p AS (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks FROM t),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM p),
        |cab AS (SELECT w1, w2, count(*) AS c_ab FROM bg
        |        WHERE doc_id % 10 <> 0 GROUP BY w1, w2),
        |ca AS (SELECT w1, sum(c_ab) AS c_a FROM cab GROUP BY w1),
        |m AS (SELECT w1, w2, (1000 * c_ab) // c_a AS cm
        |      FROM cab JOIN ca USING (w1)),
        |h AS (SELECT doc_id, w1, w2 FROM bg WHERE doc_id % 10 = 0)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(sum(CASE WHEN m.cm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |       CAST(CAST(sum(coalesce(m.cm, 1)) AS BIGINT) // count(*) AS BIGINT)
        |         AS mean_cond_milli
        |FROM h LEFT JOIN m USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Trigram stupid-backoff mirror: same train-split models (trigram
    // permille over full-bigram contexts, 0.4 and 0.4² as exact 2/5 and
    // 4/25 integer ladders), same three left joins over the held-out
    // triple stream.
    "q_trigram_backoff" ->
      """WITH t AS (SELECT doc_id,
        |              string_split(text || ' tail' || CAST(doc_id % 7 AS VARCHAR)
        |                || ' uq' || CAST(doc_id AS VARCHAR), ' ') AS toks
        |            FROM documents),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |       FROM (SELECT doc_id, unnest(range(1, len(toks))) AS i, toks
        |             FROM t WHERE len(toks) >= 2)),
        |tg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
        |       FROM (SELECT doc_id, unnest(range(1, len(toks) - 1)) AS i, toks
        |             FROM t WHERE len(toks) >= 3)),
        |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg
        |        WHERE doc_id % 10 <> 0 GROUP BY 1, 2),
        |tm AS (SELECT w1, w2, w3, (1000 * c123) // c12 AS tri_milli
        |       FROM (SELECT w1, w2, w3, count(*) AS c123 FROM tg
        |             WHERE doc_id % 10 <> 0 GROUP BY 1, 2, 3)
        |       JOIN c12 USING (w1, w2)),
        |uni AS (SELECT w, count(*) AS c1
        |        FROM (SELECT doc_id, unnest(toks) AS w FROM t)
        |        WHERE doc_id % 10 <> 0 GROUP BY w),
        |bm AS (SELECT c12.w1 AS w2, c12.w2 AS w3,
        |              (1000 * c12.c12) // uni.c1 AS big_milli
        |       FROM c12 JOIN uni ON uni.w = c12.w1),
        |um AS (SELECT w AS w3,
        |              (1000 * c1) // (SELECT CAST(sum(c1) AS BIGINT) FROM uni) AS uni_milli
        |       FROM uni),
        |h AS (SELECT doc_id, w1, w2, w3 FROM tg WHERE doc_id % 10 = 0),
        |s AS (SELECT h.doc_id,
        |             coalesce(tm.tri_milli, (2 * bm.big_milli) // 5,
        |                      (4 * um.uni_milli) // 25, 1) AS s,
        |             CASE WHEN tm.tri_milli IS NOT NULL THEN 1 ELSE 0 END AS h3,
        |             CASE WHEN tm.tri_milli IS NULL AND bm.big_milli IS NOT NULL
        |                  THEN 1 ELSE 0 END AS h2,
        |             CASE WHEN tm.tri_milli IS NULL AND bm.big_milli IS NULL
        |                       AND um.uni_milli IS NOT NULL THEN 1 ELSE 0 END AS h1
        |      FROM h LEFT JOIN tm USING (w1, w2, w3)
        |             LEFT JOIN bm USING (w2, w3)
        |             LEFT JOIN um USING (w3))
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_positions,
        |       CAST(sum(h3) AS BIGINT) AS n_tri,
        |       CAST(sum(h2) AS BIGINT) AS n_big,
        |       CAST(sum(h1) AS BIGINT) AS n_uni,
        |       CAST(count(*) - sum(h3) - sum(h2) - sum(h1) AS BIGINT) AS n_oov,
        |       CAST(CAST(sum(s) AS BIGINT) // count(*) AS BIGINT) AS mean_milli
        |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // The full prep pipeline: dedup survivors (recursive-CTE clusters,
    // the q_dedup_apply machinery) → quality keep (q_quality_filter's
    // rule chain) → hash split (q_train_test_split's percentile).
    "q_corpus_pipeline" -> {
      val chunks = Seq((0, 1, 8), (1, 9, 8))
        .map { case (i, start, len) =>
          s"SELECT id, v, $i AS chunk, substring(simhash, $start, $len) AS bits FROM v" }
        .mkString("\n  UNION ALL\n  ")
      s"""WITH RECURSIVE $simhashCte,
         |v AS (SELECT id, simhash, CAST(concat('0b', simhash) AS BIGINT) AS v FROM sh16),
         |chunks AS (
         |  $chunks),
         |p AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk = b.chunk AND a.bits = b.bits AND a.id < b.id
         |  WHERE bit_count(xor(a.v, b.v)) <= 1),
         |eg AS (SELECT id_a AS src, id_b AS dst FROM p
         |       UNION ALL SELECT id_b AS src, id_a AS dst FROM p),
         |reach AS (
         |  SELECT src AS id, src AS r FROM eg
         |  UNION
         |  SELECT eg.dst AS id, reach.r AS r FROM reach JOIN eg ON eg.src = reach.id),
         |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
         |surv AS (SELECT d.doc_id, d.text FROM documents d
         |         WHERE NOT EXISTS (SELECT 1 FROM cl
         |                           WHERE cl.id = d.doc_id AND cl.cluster_id <> d.doc_id)),
         |m AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM surv),
         |q AS (SELECT doc_id, len(toks) AS n_tokens,
         |             CASE WHEN len(toks) < 20 THEN 'too_short'
         |                  WHEN len(toks) > 1000 THEN 'too_long'
         |                  WHEN (CASE WHEN length(text) > 0
         |                        THEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text)
         |                        ELSE 0.0 END) > 0.2 THEN 'punct_soup'
         |                  WHEN len(toks) >= 2 AND
         |                       CAST(list_max(list_transform(
         |                         list_distinct(list_transform(range(1, len(toks)),
         |                           i -> array_to_string(list_slice(toks, i, i + 1), ' '))),
         |                         x -> len(list_filter(list_transform(range(1, len(toks)),
         |                           i -> array_to_string(list_slice(toks, i, i + 1), ' ')),
         |                           y -> y = x)))) AS DOUBLE)
         |                         / len(list_transform(range(1, len(toks)),
         |                             i -> array_to_string(list_slice(toks, i, i + 1), ' '))) > 0.08
         |                       THEN 'repetition'
         |                  WHEN ${vocabHits(stop("en"))} = 0 THEN 'no_stopwords'
         |             END AS reason
         |      FROM m)
         |SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
         |       CASE WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
         |            WHEN CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'valid'
         |            ELSE 'test' END AS split
         |FROM q WHERE reason IS NULL ORDER BY doc_id""".stripMargin
    },

    // Declarative contract report: each check's violation count as a
    // scalar subquery, unioned — check names must match Checks.Check.name
    // exactly (the report is keyed on them).
    "q_quality_report" ->
      """WITH c AS (
        |  SELECT 'not_null_o_orderkey' AS chk,
        |         CAST((SELECT count(*) FROM orders WHERE o_orderkey IS NULL) AS BIGINT) AS n
        |  UNION ALL
        |  SELECT 'unique_o_orderkey',
        |         CAST((SELECT count(*) FROM (SELECT o_orderkey FROM orders
        |               GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'accepted_values_o_orderstatus',
        |         CAST((SELECT count(*) FROM orders WHERE o_orderstatus IS NOT NULL
        |               AND o_orderstatus NOT IN ('O', 'F')) AS BIGINT)
        |  UNION ALL
        |  SELECT 'in_range_o_totalprice',
        |         CAST((SELECT count(*) FROM orders WHERE o_totalprice IS NOT NULL
        |               AND o_totalprice NOT BETWEEN 0 AND 200000) AS BIGINT)
        |  UNION ALL
        |  SELECT 'positive_price',
        |         CAST((SELECT count(*) FROM orders WHERE NOT (o_totalprice > 0)) AS BIGINT)
        |  UNION ALL
        |  SELECT 'unique_o_custkey_o_orderdate',
        |         CAST((SELECT count(*) FROM (SELECT o_custkey, o_orderdate FROM orders
        |               GROUP BY 1, 2 HAVING count(*) > 1)) AS BIGINT))
        |SELECT chk AS "check", n AS n_violations, n = 0 AS passed
        |FROM c ORDER BY "check"""".stripMargin,

    "q_profile" -> {
      def branch(name: String, c: String) =
        s"""SELECT '$name' AS "column", count(*) AS n_rows,
           |       count(*) - count($c) AS n_null,
           |       CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |       CAST(min($c) AS VARCHAR) AS min_value,
           |       CAST(max($c) AS VARCHAR) AS max_value
           |FROM o""".stripMargin
      s"""WITH o AS (SELECT *, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
         |           FROM orders)
         |${Seq("o_orderkey" -> "o_orderkey", "o_custkey" -> "o_custkey",
                "price_cents" -> "price_cents",
                "o_orderpriority" -> "o_orderpriority",
                "o_orderdate" -> "o_orderdate")
             .map { case (n, c) => branch(n, c) }.mkString("\nUNION ALL\n")}
         |ORDER BY "column"""".stripMargin
    },

    "q_checksum" ->
      """SELECT l_returnflag,
        |       count(*) AS n_rows,
        |       CAST(sum(CAST(concat('0x', substring(md5(
        |         concat_ws('|', l_orderkey, l_linenumber,
        |                   CAST(round(l_extendedprice * 100) AS BIGINT))), 1, 10))
        |         AS BIGINT)) AS BIGINT) AS checksum
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_union_evolve" ->
      """SELECT o_orderkey, o_custkey, CAST(NULL AS BIGINT) AS price_cents
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, o_custkey,
        |       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
        |FROM orders WHERE o_orderkey % 2 <> 0
        |ORDER BY o_orderkey""".stripMargin,

    // q_bucketed_join reads the bucketed saves of orders/customer — the
    // oracle is the plain join over the base tables (result transparency
    // of the bucketed layout; the no-exchange plan is IOSpec-asserted).
    "q_bucketed_join" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
        |       c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    // DSIR importance selection: hashed-bigram (md5 mod 64) smoothed
    // probability contrast of the src0 target slice vs the raw corpus;
    // HUGEINT intermediates mirror the engine's DECIMAL(38,0) promotion,
    // every output aggregate cast to BIGINT. Floor-div on nonnegative
    // operands, so // ≡ Spark div.
    "q_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id AS id, source = 'src0' AS is_target,
        |         string_split(text, ' ') AS tk
        |  FROM documents WHERE len(string_split(text, ' ')) >= 2),
        |pos AS (SELECT id, is_target, tk, unnest(range(1, len(tk))) AS i FROM tok),
        |bg AS (
        |  SELECT id, is_target,
        |         CAST(concat('0x', substring(md5(concat(tk[i], ' ', tk[i + 1])), 1, 15)) AS BIGINT) % 64 AS feat
        |  FROM pos),
        |df AS (SELECT id, is_target, feat, count(*) AS n FROM bg GROUP BY 1, 2, 3),
        |dist AS (
        |  SELECT feat, sum(n) AS c_r,
        |         sum(CASE WHEN is_target THEN n ELSE 0 END) AS c_t
        |  FROM df GROUP BY feat),
        |tot AS (SELECT sum(c_r) AS tot_r, sum(c_t) AS tot_t FROM dist),
        |w AS (
        |  SELECT feat,
        |         CAST(CAST(c_t + 1 AS HUGEINT) * 1000000000 // (tot_t + 64) AS BIGINT)
        |         - CAST(CAST(c_r + 1 AS HUGEINT) * 1000000000 // (tot_r + 64) AS BIGINT) AS w_fp
        |  FROM dist, tot),
        |scored AS (
        |  SELECT id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |         CAST(sum(n * w_fp) AS BIGINT) AS score_fp
        |  FROM df JOIN w USING (feat) GROUP BY id),
        |top AS (SELECT id FROM scored ORDER BY score_fp DESC, id LIMIT 40)
        |SELECT scored.id AS doc_id, n_bigrams, score_fp,
        |       top.id IS NOT NULL AS selected
        |FROM scored LEFT JOIN top ON scored.id = top.id
        |ORDER BY doc_id""".stripMargin,

    // CCNet-style per-language LM buckets: value-tertile boundaries from
    // the per-(lang, score) histogram — ties never split, windows only
    // over the histogram.
    "q_lm_bucket" ->
      """WITH tok AS (
        |  SELECT doc_id AS id, lang, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |hist AS (SELECT term, count(*) AS freq FROM tok GROUP BY term),
        |scored AS (
        |  SELECT id, lang, CAST((1000 * sum(freq)) // count(*) AS BIGINT) AS score
        |  FROM tok JOIN hist USING (term) GROUP BY id, lang),
        |sh AS (SELECT lang, score, count(*) AS c FROM scored GROUP BY lang, score),
        |cum AS (
        |  SELECT lang, score,
        |         sum(c) OVER (PARTITION BY lang ORDER BY score DESC
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_ge,
        |         sum(c) OVER (PARTITION BY lang) AS n
        |  FROM sh),
        |bnd AS (
        |  SELECT lang,
        |         max(CASE WHEN c_ge >= (n + 2) // 3 THEN score END) AS b1,
        |         max(CASE WHEN c_ge >= (2 * n + 2) // 3 THEN score END) AS b2
        |  FROM cum GROUP BY lang)
        |SELECT id AS doc_id, lang, score,
        |       CASE WHEN score >= b1 THEN 'head'
        |            WHEN score >= b2 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM scored JOIN bnd USING (lang)
        |ORDER BY doc_id""".stripMargin,

    // MMR diversified rerank, greedy selection UNROLLED (k = 4 picks from
    // the 8-candidate cosine pool of query 42, λ = 0.5 ⇒ order by
    // rel − maxSim). Comparisons run on doubles built from exact
    // integers by correctly-rounded ops with the engine's expression
    // tree; the hashed output is integer-only.
    "q_mmr_rerank" -> {
      def pick(sel: String, rem: String) =
        s"""  SELECT vec_id, rel_dot, nnb, rel FROM (
           |    SELECT r.vec_id, r.rel_dot, r.nnb, r.rel, r.rel - max(s.cs) AS mmr
           |    FROM $rem r JOIN sims s ON s.ia = r.vec_id
           |                JOIN $sel ss ON s.ib = ss.vec_id
           |    GROUP BY r.vec_id, r.rel_dot, r.nnb, r.rel)
           |  ORDER BY mmr DESC, vec_id LIMIT 1""".stripMargin
      s"""WITH $fpVecCte,
         |q AS (SELECT fv, nn FROM nv WHERE vec_id = 42 AND nn > 0),
         |pool AS (
         |  SELECT c.vec_id, c.fv, CAST(c.nn AS BIGINT) AS nnb,
         |         CAST(list_sum(list_transform(range(1, len(c.fv) + 1), i -> c.fv[i] * q.fv[i])) AS BIGINT) AS rel_dot,
         |         CAST(list_sum(list_transform(range(1, len(c.fv) + 1), i -> c.fv[i] * q.fv[i])) AS DOUBLE)
         |           / (sqrt(CAST(q.nn AS DOUBLE)) * sqrt(CAST(c.nn AS DOUBLE))) AS rel
         |  FROM nv c, q WHERE c.vec_id <> 42 AND c.nn > 0
         |  ORDER BY rel DESC, c.vec_id LIMIT 8),
         |sims AS (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib,
         |         CAST(list_sum(list_transform(range(1, len(a.fv) + 1), i -> a.fv[i] * b.fv[i])) AS DOUBLE)
         |           / (sqrt(CAST(a.nnb AS DOUBLE)) * sqrt(CAST(b.nnb AS DOUBLE))) AS cs
         |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
         |s1 AS (SELECT vec_id, rel_dot, nnb, rel FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
         |s2 AS (
         |${pick("s1", "(SELECT * FROM pool WHERE vec_id NOT IN (SELECT vec_id FROM s1))")}),
         |sel12 AS (SELECT vec_id FROM s1 UNION ALL SELECT vec_id FROM s2),
         |s3 AS (
         |${pick("sel12", "(SELECT * FROM pool WHERE vec_id NOT IN (SELECT vec_id FROM sel12))")}),
         |sel123 AS (SELECT vec_id FROM sel12 UNION ALL SELECT vec_id FROM s3),
         |s4 AS (
         |${pick("sel123", "(SELECT * FROM pool WHERE vec_id NOT IN (SELECT vec_id FROM sel123))")}),
         |sel AS MATERIALIZED (
         |  SELECT 1 AS mmr_rank, vec_id, rel_dot, nnb FROM s1
         |  UNION ALL SELECT 2, vec_id, rel_dot, nnb FROM s2
         |  UNION ALL SELECT 3, vec_id, rel_dot, nnb FROM s3
         |  UNION ALL SELECT 4, vec_id, rel_dot, nnb FROM s4)
         |SELECT CAST(mmr_rank AS INTEGER) AS mmr_rank, vec_id,
         |       rel_dot AS rel_dot_fp, nnb AS norm_fp
         |FROM sel ORDER BY mmr_rank""".stripMargin
    },

    // kNN-graph triangle census: the q_knn_graph edge set (rank <= 3)
    // canonicalized to distinct low<high pairs, triangles via the
    // ordered two-join enumeration, per-vertex corner counts.
    "q_knn_triangles" ->
      s"""WITH bk AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN bk ON nv.vec_id = bk.vec_id
         |      WHERE nn > 0),
         |sc AS (
         |  SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
         |         ${cosineExpr("x", "y")} AS cosine
         |  FROM v x JOIN v y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
         |r AS (
         |  SELECT src_id, dst_id,
         |         CAST(row_number() OVER (PARTITION BY src_id
         |                                 ORDER BY cosine DESC, dst_id ASC) AS INTEGER) AS "rank"
         |  FROM sc),
         |ed AS (
         |  SELECT DISTINCT least(src_id, dst_id) AS a, greatest(src_id, dst_id) AS z
         |  FROM r WHERE "rank" <= 3),
         |deg AS (
         |  SELECT v, CAST(count(*) AS BIGINT) AS degree
         |  FROM (SELECT a AS v FROM ed UNION ALL SELECT z AS v FROM ed)
         |  GROUP BY v),
         |tri AS (
         |  SELECT e1.a AS x, e1.z AS y, e2.z AS w
         |  FROM ed e1 JOIN ed e2 ON e1.z = e2.a
         |             JOIN ed e3 ON e3.a = e1.a AND e3.z = e2.z),
         |pv AS (
         |  SELECT v, CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM (SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
         |        UNION ALL SELECT w AS v FROM tri)
         |  GROUP BY v)
         |SELECT deg.v AS vec_id, degree,
         |       CAST(COALESCE(pv.n_triangles, 0) AS BIGINT) AS n_triangles
         |FROM deg LEFT JOIN pv ON deg.v = pv.v
         |ORDER BY vec_id""".stripMargin,

    // Tokenizer vocabulary coverage: OOV permille per language against
    // the top-32 frequency vocab (freq DESC, term tie-break — the
    // q_vocab_build ordering).
    "q_vocab_coverage" ->
      """WITH hist AS (
        |  SELECT term, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY term),
        |voc AS (SELECT term FROM hist ORDER BY freq DESC, term LIMIT 32),
        |tok AS (SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents)
        |SELECT lang,
        |       CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN voc.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |       CAST((1000 * sum(CASE WHEN voc.term IS NULL THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS oov_permille
        |FROM tok LEFT JOIN voc ON tok.term = voc.term
        |GROUP BY lang ORDER BY lang""".stripMargin,

    // Packing-efficiency report over the q_pack_sequences layout: per
    // (source, shard, bin) fill accounting, last bin flagged.
    "q_pack_efficiency" ->
      """WITH x AS (
        |  SELECT source, doc_id,
        |         CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 4 AS INTEGER) AS shard,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT source, shard, doc_id, n_tok,
        |         CAST(sum(n_tok) OVER (PARTITION BY source, shard ORDER BY doc_id
        |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        |  FROM x),
        |b AS (
        |  SELECT source, shard, (cum_tok - 1) // 2048 AS bin,
        |         CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(n_tok) AS BIGINT) AS bin_tokens
        |  FROM c GROUP BY 1, 2, 3)
        |SELECT source, shard, bin, n_docs, bin_tokens,
        |       CAST((1000 * bin_tokens) // 2048 AS BIGINT) AS fill_permille,
        |       bin = max(bin) OVER (PARTITION BY source, shard) AS is_last
        |FROM b ORDER BY source, shard, bin""".stripMargin,

    // Span-corruption mask plan: md5-deterministic span starts (mod 20)
    // and lengths (1..5), interval-UNION merge via running-max windows —
    // identical formulation both engines, exact integers end to end.
    "q_span_corruption" ->
      """WITH t AS (
        |  SELECT doc_id AS id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents WHERE len(string_split(text, ' ')) >= 1),
        |pos AS (SELECT id, n_tokens, unnest(range(1, n_tokens + 1)) AS p FROM t),
        |st AS (
        |  SELECT id, n_tokens, p,
        |         1 + CAST(concat('0x', substring(md5(concat(CAST(id AS VARCHAR), ':', CAST(p AS VARCHAR), ':len')), 1, 15)) AS BIGINT) % 5 AS len
        |  FROM pos
        |  WHERE CAST(concat('0x', substring(md5(concat(CAST(id AS VARCHAR), ':', CAST(p AS VARCHAR))), 1, 15)) AS BIGINT) % 20 = 0),
        |sp AS (SELECT id, p, least(p + len - 1, n_tokens) AS e FROM st),
        |m AS (
        |  SELECT id, p, e,
        |         max(e) OVER (PARTITION BY id ORDER BY p, e
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM sp),
        |f AS (
        |  SELECT id, p, e,
        |         sum(CASE WHEN pmax IS NULL OR p > pmax THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY id ORDER BY p, e
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM m),
        |mg AS (SELECT id, grp, min(p) AS s, max(e) AS e2, count(*) AS nraw
        |       FROM f GROUP BY id, grp),
        |pd AS (SELECT id, CAST(sum(nraw) AS BIGINT) AS n_spans_raw,
        |              CAST(count(*) AS BIGINT) AS n_spans,
        |              CAST(sum(e2 - s + 1) AS BIGINT) AS n_masked
        |       FROM mg GROUP BY id)
        |SELECT t.id AS doc_id, t.n_tokens,
        |       COALESCE(pd.n_spans_raw, 0) AS n_spans_raw,
        |       COALESCE(pd.n_spans, 0) AS n_spans,
        |       COALESCE(pd.n_masked, 0) AS n_masked,
        |       CAST((1000 * COALESCE(pd.n_masked, 0)) // t.n_tokens AS BIGINT)
        |         AS mask_permille
        |FROM t LEFT JOIN pd ON t.id = pd.id
        |ORDER BY doc_id""".stripMargin,

    // Contrastive triplet mining: in-bucket candidates, positive = top-1,
    // hard negatives = top-3 below cosine 0.9 (exact-int-ratio doubles).
    "q_hard_negatives" ->
      s"""WITH bk AS (
         |  SELECT vec_id, $bucket4Expr AS bucket FROM embeddings),
         |$fpVecCte,
         |v AS (SELECT nv.vec_id, fv, nn, bucket FROM nv JOIN bk ON nv.vec_id = bk.vec_id
         |      WHERE nn > 0),
         |sc AS (
         |  SELECT q.vec_id AS anchor_id, c.vec_id AS match_id,
         |         ${cosineExpr("q", "c")} AS cosine
         |  FROM v q JOIN v c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 5),
         |pos AS (
         |  SELECT anchor_id, 'pos' AS role, match_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY anchor_id
         |                                 ORDER BY cosine DESC, match_id ASC) AS INTEGER) AS "rank"
         |  FROM sc),
         |p1 AS (SELECT anchor_id, match_id FROM pos WHERE "rank" = 1),
         |neg AS (
         |  SELECT sc.anchor_id, 'neg' AS role, sc.match_id, cosine,
         |         CAST(row_number() OVER (PARTITION BY sc.anchor_id
         |                                 ORDER BY cosine DESC, sc.match_id ASC) AS INTEGER) AS "rank"
         |  FROM sc ANTI JOIN p1
         |    ON sc.anchor_id = p1.anchor_id AND sc.match_id = p1.match_id
         |  WHERE cosine < 0.9)
         |SELECT anchor_id, role, match_id, cosine, "rank"
         |FROM (SELECT * FROM pos WHERE "rank" <= 1
         |      UNION ALL SELECT * FROM neg WHERE "rank" <= 3)
         |ORDER BY anchor_id, role, "rank"""".stripMargin,

    // Streaming corpus-quality drift monitor: the batch twin of the real
    // windowed-aggregation lifecycle — event time derives from doc_id
    // (1 doc/s), so window(100s).start = (doc_id // 100) * 100.
    "q_stream_quality" ->
      """SELECT (doc_id // 100) * 100 AS window_start_s, lang,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST((1000 * sum(n_chars)) // sum(len(string_split(text, ' '))) AS BIGINT)
        |         AS chars_per_tok_permille
        |FROM documents
        |GROUP BY 1, 2
        |ORDER BY window_start_s, lang""".stripMargin,

    // Character-class mix per language: length − length(replace) counts,
    // one UNION ALL branch per class (the engine computes all classes in
    // one scan; 4 scans are fine for the oracle). 'g' flag: DuckDB
    // regexp_replace is first-match-only by default.
    "q_script_mix" -> {
      def branch(name: String, re: String) =
        s"""SELECT lang, '$name' AS char_class,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(length(text)) AS BIGINT) AS lang_chars,
           |       CAST(sum(length(text) - length(regexp_replace(text, '$re', '', 'g'))) AS BIGINT)
           |         AS class_chars
           |FROM documents GROUP BY lang""".stripMargin
      s"""WITH u AS (
         |${branch("letters", "[a-z]")}
         |UNION ALL
         |${branch("vowels", "[aeiou]")}
         |UNION ALL
         |${branch("digits", "[0-9]")}
         |UNION ALL
         |${branch("spaces", " ")})
         |SELECT lang, char_class, n_docs, lang_chars, class_chars,
         |       (1000 * class_chars) // lang_chars AS share_permille
         |FROM u ORDER BY lang, char_class""".stripMargin
    },

    // Source-concentration report: HUGEINT-promoted N² and rank sums
    // (the X160 promotion), BIGINT-cast outputs.
    "q_source_balance" ->
      """WITH per AS (
        |  SELECT source AS k, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |r AS (
        |  SELECT n, CAST(row_number() OVER (ORDER BY n, k) AS BIGINT) AS i
        |  FROM per),
        |s AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_docs,
        |         CAST(count(*) AS BIGINT) AS n_sources,
        |         CAST(max(n) AS BIGINT) AS max_n,
        |         sum(CAST(n AS HUGEINT) * n) AS sum_n_sq,
        |         sum(CAST(i AS HUGEINT) * n) AS sum_rank_n
        |  FROM r)
        |SELECT n_docs, n_sources, max_n,
        |       (1000 * max_n) // n_docs AS max_share_permille,
        |       CAST((1000 * CAST(n_docs AS HUGEINT) * n_docs) // sum_n_sq AS BIGINT)
        |         AS eff_sources_permille,
        |       CAST((1000 * (2 * sum_rank_n - (n_sources + 1) * CAST(n_docs AS HUGEINT)))
        |            // (CAST(n_sources AS HUGEINT) * n_docs) AS BIGINT) AS gini_permille
        |FROM s""".stripMargin,

    // Filter-chain attrition funnel: cumulative-conjunction counts in one
    // aggregate, unpacked to the five-row funnel via UNION ALL. Stage
    // predicates mirror SparkEntry.qFilterFunnel verbatim.
    "q_filter_funnel" ->
      """WITH b AS (
        |  SELECT len(string_split(text, ' ')) >= 15 AS b1,
        |         n_chars <= 450 AS b2,
        |         (1000 * n_chars) // len(string_split(text, ' '))
        |           BETWEEN 4800 AND 6100 AS b3,
        |         lang IN ('en', 'es', 'de', 'fr') AS b4,
        |         NOT contains(text, 'dup') AS b5
        |  FROM documents),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS c0,
        |         CAST(sum(CASE WHEN b1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |         CAST(sum(CASE WHEN b1 AND b2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
        |         CAST(sum(CASE WHEN b1 AND b2 AND b3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
        |         CAST(sum(CASE WHEN b1 AND b2 AND b3 AND b4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
        |         CAST(sum(CASE WHEN b1 AND b2 AND b3 AND b4 AND b5 THEN 1 ELSE 0 END) AS BIGINT) AS c5
        |  FROM b),
        |f AS (
        |  SELECT 1 AS stage, 'min_tokens' AS rule, c0 AS docs_in, c1 AS docs_kept, c0 FROM s
        |  UNION ALL SELECT 2, 'max_chars', c1, c2, c0 FROM s
        |  UNION ALL SELECT 3, 'chars_per_token', c2, c3, c0 FROM s
        |  UNION ALL SELECT 4, 'lang_allowed', c3, c4, c0 FROM s
        |  UNION ALL SELECT 5, 'blocklist', c4, c5, c0 FROM s)
        |SELECT CAST(stage AS INTEGER) AS stage, rule, docs_in, docs_kept,
        |       docs_in - docs_kept AS docs_removed,
        |       (1000 * docs_kept) // c0 AS keep_permille
        |FROM f ORDER BY stage""".stripMargin,

    // Cross-dimension covariance sufficient stats: the oracle takes the
    // naive unnest²+self-join road (n·d(d+1)/2 rows — fine at sf0.01;
    // the engine's one-pass OuterProductSumFp is the scale path). The
    // quantizer is the proven X158 formula verbatim.
    "q_embed_covariance" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(u.i - 1 AS INTEGER) AS dim,
        |         CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT) // 1000 AS qv
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
        |  WHERE embedding IS NOT NULL)
        |SELECT a.dim AS i, b.dim AS j,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(a.qv) AS BIGINT) AS sum_qi,
        |       CAST(sum(b.qv) AS BIGINT) AS sum_qj,
        |       CAST(sum(a.qv * b.qv) AS BIGINT) AS sum_qq
        |FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        |GROUP BY 1, 2
        |ORDER BY i, j""".stripMargin,

    // One-row corpus dataset card: volumes, diversity, exact-dup rate.
    "q_dataset_card" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |       CAST(count(DISTINCT $fpExpr) AS BIGINT) AS n_distinct_fp,
         |       CAST((1000 * (count(*) - count(DISTINCT $fpExpr))) // count(*) AS BIGINT) AS dup_permille
         |FROM documents""".stripMargin,

    // PCA power iteration (X176/X177): the engine collects the O(d^2)
    // covariance triangle and iterates driver-side in exact BigInt;
    // the oracle mirrors the IDENTICAL integer arithmetic as 8
    // unrolled matvec CTE rounds (AS MATERIALIZED -- the unigram
    // lesson) with sign-split renormalizing division so floor == trunc
    // on nonnegatives in both engines. HUGEINT intermediates, BIGINT
    // outputs.
    "q_pca_power" -> pcaSql(projectMode = false),
    "q_pca_project" -> pcaSql(projectMode = true),

    // Unigram-LM tokenizer (Kudo 2018, hard-EM): costs are
    // fp6-quantized −ln (the audited q_tfidf transcendental pattern);
    // every DP comparison after quantization is exact BIGINT
    // arithmetic. See unigramSql below for the segmentation mirror.
    "q_unigram_train" -> unigramSql(applyMode = false),
    "q_unigram_apply" -> unigramSql(applyMode = true),

    // WordPiece tokenizer (Schuster & Nakajima 2012, likelihood-gain
    // greedy merges): exact fixed-point integer scores (HUGEINT
    // intermediates, BIGINT outputs — zero transcendentals), unrolled
    // merge rounds + greedy longest-match walk. See wordpieceSql.
    "q_wordpiece_train" -> wordpieceSql(applyMode = false),
    "q_wordpiece_apply" -> wordpieceSql(applyMode = true),

    // Three-family tokenizer comparison (BPE / unigram-LM / WordPiece):
    // the three apply pipelines' corpus totals in ONE statement —
    // each family's CTE block is the same generator its own gated row
    // uses (uni*/wp* helpers; the BPE block mirrors q_bpe_apply's
    // 3-round merge with bp-prefixed CTE names).
    "q_tokenizer_families" -> tokenizerFamiliesSql)

  /** Shared generator for the unigram-LM train/apply oracles — mirrors
    * graft.text.Unigram with maxPieceLen=4, maxWordLen=16, rounds=2,
    * minCount=2, vocabSize=64 (the registry rows' parameters).
    *
    * Segmentation is mirrored as a fully UNROLLED, NON-RECURSIVE
    * Viterbi DP + greedy backtrace (maxWordLen chained CTEs each):
    * dp_p = min over piece length l of dp_(p-l) + cost(piece at
    * (p, l)); the backtrace takes at each landed position the SMALLEST
    * l that reproduces dp — exactly the engine's tie-break, which
    * UnigramSpec proves equal to the lexicographic minimum over
    * min-cost paths by brute-force path enumeration. (An earlier
    * path-enumeration oracle — recursive CTE, <= 2^(len-1) paths per
    * word — validated this DP form value-exactly at sf0.001/sf0.01 but
    * cost ~65 s of DuckDB gate time at sf0.01 and ~500 s at sf0.1; the
    * DP form is linear in word length and keeps both rows in the
    * non-recursive yardstick set.) Single-character pieces always stay
    * in the vocabulary, so every dp state is reachable and the joins
    * are total. */
  private def unigramSql(applyMode: Boolean): String =
    if (!applyMode)
      s"""WITH
$wrdCte,
$uniModelCtes
SELECT piece, c AS n_used, cost AS cost_fp6 FROM sel
ORDER BY n_used DESC, piece"""
    else
      s"""WITH
$wrdCte,
$uniModelCtes,
$uniNpsCtes
SELECT t.id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(SUM(b.np) AS BIGINT) AS n_pieces,
       CAST(SUM(b.np) * 1000 // count(*) AS BIGINT) AS pieces_per_word_permille
FROM (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w FROM documents) t
JOIN nps b USING (w)
WHERE length(t.w) > 0
GROUP BY t.id
ORDER BY doc_id"""

  /** Distinct words with corpus counts — shared by the unigram,
    * WordPiece, and three-family oracles (mirrors Unigram.wordCounts). */
  private def wrdCte: String =
    """wrd AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS c_w
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE length(w) > 0 GROUP BY w)"""

  private final val uniMpl = 4; private final val uniMwl = 16
  private final val uniMinCount = 2; private final val uniVocabSize = 64

  /** sub → seed → v0 → two EM rounds → sel: the unigram model CTEs
    * (everything between `wrd` and the final select), reused verbatim
    * by the three-family oracle. */
  private def uniModelCtes: String =
    s"""sub AS MATERIALIZED (
  SELECT wrd.w, wrd.c_w,
         substring(wrd.w, CAST(p.p AS INT) - CAST(l.l AS INT) + 1, CAST(l.l AS INT)) AS piece
  FROM wrd, range(1, ${uniMwl + 1}) p(p), range(1, ${uniMpl + 1}) l(l)
  WHERE p.p <= length(wrd.w) AND l.l <= p.p),
seed AS MATERIALIZED (
  SELECT piece, CAST(SUM(c_w) AS BIGINT) AS c FROM sub GROUP BY piece
  HAVING length(piece) = 1 OR SUM(c_w) >= $uniMinCount),
v0 AS MATERIALIZED (
  SELECT piece, c,
         CAST(round(-ln(CAST(c AS DOUBLE) / CAST((SELECT SUM(c) FROM seed) AS DOUBLE)) * 1000000) AS BIGINT) AS cost
  FROM seed),
${uniRoundBlock(1)},
${uniRoundBlock(2)},
sel AS MATERIALIZED (
  SELECT piece, c, cost FROM v2 WHERE length(piece) = 1
  UNION ALL
  SELECT piece, c, cost FROM (
    SELECT piece, c, cost, row_number() OVER (ORDER BY c DESC, piece) AS rn
    FROM v2 WHERE length(piece) > 1)
  WHERE rn <= $uniVocabSize - (SELECT count(*) FROM v2 WHERE length(piece) = 1))"""

  /** Final-vocabulary segmentation of every distinct word + the
    * per-word piece counts `nps` — the unigram apply CTEs. */
  private def uniNpsCtes: String =
    s"""${uniSegBlock("A", "sel")},
nps AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS np FROM segA GROUP BY w)"""

  private def uniRoundBlock(rr: Int): String =
    s"""${uniSegBlock(rr.toString, s"v${rr - 1}")},
usage$rr AS MATERIALIZED (
  SELECT piece, CAST(SUM(c_w) AS BIGINT) AS u
  FROM seg$rr JOIN wrd USING (w) GROUP BY piece),
vv$rr AS MATERIALIZED (
  SELECT s.piece, GREATEST(COALESCE(u.u, 0), 1) AS c
  FROM (SELECT piece FROM v${rr - 1} WHERE length(piece) = 1) s
  LEFT JOIN usage$rr u USING (piece)
  UNION ALL
  SELECT piece, u AS c FROM usage$rr WHERE length(piece) > 1 AND u >= $uniMinCount),
v$rr AS MATERIALIZED (
  SELECT piece, c,
         CAST(round(-ln(CAST(c AS DOUBLE) / CAST((SELECT SUM(c) FROM vv$rr) AS DOUBLE)) * 1000000) AS BIGINT) AS cost
  FROM vv$rr)"""

  /** Unrolled Viterbi DP + greedy backtrace over vocabulary CTE
    * `vocabCte` (piece, ..., cost): emits seg$r = one row per
    * (w, chosen-piece occurrence). */
  private def uniSegBlock(r: String, vocabCte: String): String = {
    val mpl = uniMpl; val mwl = uniMwl
      val cand =
        s"""cand$r AS MATERIALIZED (
  SELECT wrd.w, CAST(p.p AS INT) AS p, CAST(l.l AS INT) AS l, v.cost
  FROM wrd, range(1, ${mwl + 1}) p(p), range(1, ${mpl + 1}) l(l), $vocabCte v
  WHERE p.p <= length(wrd.w) AND l.l <= p.p
    AND v.piece = substring(wrd.w, CAST(p.p AS INT) - CAST(l.l AS INT) + 1, CAST(l.l AS INT)))"""
      val dp0 = s"dp${r}_0 AS MATERIALIZED (SELECT w, CAST(0 AS BIGINT) AS c FROM wrd)"
      val dps = (1 to mwl).map { p =>
        val arms = (1 to math.min(mpl, p)).map { l =>
          s"    SELECT d.w, d.c + cd.cost AS c FROM dp${r}_${p - l} d" +
            s" JOIN cand$r cd ON cd.w = d.w AND cd.p = $p AND cd.l = $l"
        }.mkString("\n    UNION ALL\n")
        s"dp${r}_$p AS MATERIALIZED (\n  SELECT w, MIN(c) AS c FROM (\n$arms) GROUP BY w)"
      }
      val dpall = s"dpall$r AS MATERIALIZED (\n  " +
        (0 to mwl).map(p => s"SELECT w, $p AS p, c FROM dp${r}_$p")
          .mkString("\n  UNION ALL\n  ") + ")"
      val step =
        s"""step$r AS MATERIALIZED (
  SELECT c.w, c.p, CAST(MIN(c.l) AS INT) AS lstar
  FROM cand$r c
  JOIN dpall$r a ON a.w = c.w AND a.p = c.p - c.l
  JOIN dpall$r b ON b.w = c.w AND b.p = c.p
  WHERE a.c + c.cost = b.c
  GROUP BY c.w, c.p)"""
      val wk0 = s"wk${r}_0 AS MATERIALIZED (SELECT w, CAST(length(w) AS INT) AS pos FROM wrd)"
      val wks = (1 until mwl).map { k =>
        s"wk${r}_$k AS MATERIALIZED (SELECT k.w, k.pos - s.lstar AS pos" +
          s" FROM wk${r}_${k - 1} k JOIN step$r s ON s.w = k.w AND s.p = k.pos" +
          s" WHERE k.pos - s.lstar > 0)"
      }
      val visited = (0 until mwl).map(k => s"SELECT w, pos FROM wk${r}_$k")
        .mkString("\n    ", "\n    UNION ALL\n    ", "")
      val seg =
        s"""seg$r AS MATERIALIZED (
  SELECT u.w, substring(u.w, u.pos - s.lstar + 1, s.lstar) AS piece
  FROM ($visited) u
  JOIN step$r s ON s.w = u.w AND s.p = u.pos)"""
      (Seq(cand, dp0) ++ dps ++ Seq(dpall, step, wk0) ++ wks ++ Seq(seg))
        .mkString(",\n")
    }

  private final val wpMerges = 10; private final val wpMpl = 6
  private final val wpMwl = 16; private final val wpMinPair = 2
  private final val wpCharMin = 2

  /** Shared generator for the WordPiece train/apply oracles — mirrors
    * graft.text.WordPiece with nMerges=10, maxPieceLen=6, maxWordLen=16,
    * minPairCount=2, charMinCount=2 (the registry rows' parameters).
    *
    * Each merge round is one CTE block: tokenize the guard-string corpus,
    * corpus-mass-weighted unit and adjacent-pair histograms, the exact
    * fixed-point likelihood-gain argmax score_fp12 = c_ab·10¹² //
    * (c_a·c_b) in HUGEINT (ties (w1, w2) lexicographic — the engine's
    * orderBy), then the guard-string `replace` fusion with the winners as
    * SCALAR SUBQUERIES (COALESCE to a chr(1) sentinel that can never
    * match, so an exhausted round leaves the corpus unchanged — exactly
    * the engine's early stop, since every later round then re-derives the
    * same empty argmax). The apply is the greedy longest-match walk,
    * unrolled maxWordLen steps over a per-(word, position)
    * longest-vocab-match table; a position with no match sends the whole
    * word to ONE [UNK] piece (word-level UNK). All CTEs MATERIALIZED
    * (un-hinted chains inline exponentially — the unigram lesson). */
  private def wordpieceSql(applyMode: Boolean): String =
    if (!applyMode)
      s"""WITH
$wrdCte,
$wpModelCtes
SELECT merge_rank, w1, w2, pair_count, score_fp12 FROM wpmall
ORDER BY merge_rank"""
    else
      s"""WITH
$wrdCte,
$wpModelCtes,
$wpApplyCtes
SELECT t.id AS doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(SUM(b.np) AS BIGINT) AS n_pieces,
       CAST(SUM(b.unk) AS BIGINT) AS n_unk_words,
       CAST(SUM(b.np) * 1000 // count(*) AS BIGINT) AS pieces_per_word_permille
FROM (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w FROM documents) t
JOIN wpres b USING (w)
WHERE length(t.w) > 0
GROUP BY t.id
ORDER BY doc_id"""

  /** Round-0 guard-string corpus, wpMerges merge rounds, the collected
    * merge table `wpmall`, and the apply vocabulary `wpvocab`. */
  private def wpModelCtes: String = {
    def mergeRound(r: Int): String =
      s"""wptk$r AS MATERIALIZED (
  SELECT w, c_w, string_split(substring(s, 2, length(s) - 2), ')(') AS tk FROM wpc${r - 1}),
wpu$r AS MATERIALIZED (
  SELECT unit, CAST(SUM(c_w) AS BIGINT) AS c
  FROM (SELECT c_w, unnest(tk) AS unit FROM wptk$r) GROUP BY unit),
wpp$r AS MATERIALIZED (
  SELECT toks[i] AS w1, toks[i + 1] AS w2, CAST(SUM(c_w) AS BIGINT) AS c_ab
  FROM (SELECT c_w, tk AS toks, unnest(range(1, len(tk))) AS i
        FROM wptk$r WHERE len(tk) >= 2)
  GROUP BY 1, 2
  HAVING length(w1) + length(w2) <= $wpMpl AND SUM(c_w) >= $wpMinPair),
wpm$r AS MATERIALIZED (
  SELECT p.w1, p.w2, p.c_ab,
         CAST(CAST(p.c_ab AS HUGEINT) * 1000000000000 //
              (CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT)) AS BIGINT) AS score_fp12
  FROM wpp$r p JOIN wpu$r a ON a.unit = p.w1 JOIN wpu$r b ON b.unit = p.w2
  ORDER BY score_fp12 DESC, p.w1, p.w2 LIMIT 1),
wpc$r AS MATERIALIZED (
  SELECT w, c_w,
         replace(s, '(' || COALESCE((SELECT w1 FROM wpm$r), chr(1)) || ')(' ||
                    COALESCE((SELECT w2 FROM wpm$r), chr(1)) || ')',
                 '(' || COALESCE((SELECT w1 FROM wpm$r), chr(1)) ||
                        COALESCE((SELECT w2 FROM wpm$r), chr(1)) || ')') AS s
  FROM wpc${r - 1})"""
    val mergesUnion = (1 to wpMerges)
      .map(r => s"  SELECT CAST($r AS BIGINT) AS merge_rank, w1, w2," +
        s" CAST(c_ab AS BIGINT) AS pair_count, score_fp12 FROM wpm$r")
      .mkString("\n  UNION ALL\n")
    s"""wpc0 AS MATERIALIZED (
  SELECT w, c_w,
         '(' || array_to_string(list_transform(range(1, length(w) + 1),
                  i -> substring(w, CAST(i AS INT), 1)), ')(') || ')' AS s
  FROM wrd),
${(1 to wpMerges).map(mergeRound).mkString(",\n")},
wpmall AS MATERIALIZED (
$mergesUnion),
wpvocab AS MATERIALIZED (
  SELECT unit AS piece FROM wpu1 WHERE c >= $wpCharMin
  UNION
  SELECT DISTINCT w1 || w2 AS piece FROM wpmall)"""
  }

  /** Longest-vocab-match table + the unrolled greedy walk → per-word
    * (np, unk) in `wpres`. */
  private def wpApplyCtes: String = {
    val steps = (1 to wpMwl).map { k =>
      s"""wpwk$k AS MATERIALIZED (
  SELECT k.w,
         CASE WHEN k.pos > length(k.w) THEN k.pos
              WHEN m.lmax IS NULL THEN CAST(length(k.w) + 1 AS INT)
              ELSE k.pos + m.lmax END AS pos,
         CASE WHEN k.pos > length(k.w) THEN k.np
              WHEN m.lmax IS NULL THEN CAST(1 AS BIGINT)
              ELSE k.np + 1 END AS np,
         CASE WHEN k.pos > length(k.w) THEN k.unk
              WHEN m.lmax IS NULL THEN CAST(1 AS BIGINT)
              ELSE k.unk END AS unk
  FROM wpwk${k - 1} k LEFT JOIN wplmax m ON m.w = k.w AND m.p = k.pos)"""
    }.mkString(",\n")
    s"""wplmax AS MATERIALIZED (
  SELECT wrd.w, CAST(p.p AS INT) AS p, CAST(MAX(l.l) AS INT) AS lmax
  FROM wrd, range(1, ${wpMwl + 1}) p(p), range(1, ${wpMpl + 1}) l(l)
  WHERE p.p <= length(wrd.w)
    AND l.l <= length(wrd.w) - p.p + 1
    AND substring(wrd.w, CAST(p.p AS INT), CAST(l.l AS INT)) IN (SELECT piece FROM wpvocab)
  GROUP BY wrd.w, p.p),
wpwk0 AS MATERIALIZED (
  SELECT w, CAST(1 AS INT) AS pos, CAST(0 AS BIGINT) AS np, CAST(0 AS BIGINT) AS unk
  FROM wrd),
$steps,
wpres AS MATERIALIZED (SELECT w, np, unk FROM wpwk$wpMwl)"""
  }

  /** Three-family tokenizer comparison oracle: the unigram and WordPiece
    * CTE blocks verbatim (shared `wrd`), plus a bp-prefixed mirror of
    * the q_bpe_apply 3-round doc-level merge, reduced to per-family
    * corpus totals. */
  private def tokenizerFamiliesSql: String = {
    def bpeRound(t: Int): String =
      s"""bpp$t AS MATERIALIZED (
  SELECT toks, unnest(range(1, len(toks))) AS i
  FROM (SELECT string_split(substr(s, 2, length(s) - 2), ')(') AS toks FROM bps${t - 1})
  WHERE len(toks) >= 2),
bpc$t AS MATERIALIZED (
  SELECT toks[i] AS w1, toks[i + 1] AS w2, CAST(count(*) AS BIGINT) AS c
  FROM bpp$t GROUP BY 1, 2),
bpm$t AS MATERIALIZED (SELECT w1, w2, c FROM bpc$t ORDER BY c DESC, w1, w2 LIMIT 1),
bps$t AS MATERIALIZED (
  SELECT bps${t - 1}.doc_id, bps${t - 1}.text,
         replace(bps${t - 1}.s, '(' || bpm$t.w1 || ')(' || bpm$t.w2 || ')',
                 '(' || bpm$t.w1 || ' ' || bpm$t.w2 || ')') AS s
  FROM bps${t - 1}, bpm$t)"""
    s"""WITH
$wrdCte,
$uniModelCtes,
$uniNpsCtes,
$wpModelCtes,
$wpApplyCtes,
bps0 AS MATERIALIZED (
  SELECT doc_id, text, '(' || replace(text, ' ', ')(') || ')' AS s FROM documents),
${(1 to 3).map(bpeRound).mkString(",\n")},
fam AS (
  SELECT 'bpe' AS family,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
         CAST(SUM(len(string_split(substr(s, 2, length(s) - 2), ')('))) AS BIGINT) AS n_tokens
  FROM bps3
  UNION ALL
  SELECT 'unigram' AS family,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(SUM(b.np) AS BIGINT) AS n_tokens
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
  JOIN nps b USING (w)
  WHERE length(t.w) > 0
  UNION ALL
  SELECT 'wordpiece' AS family,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(SUM(b.np) AS BIGINT) AS n_tokens
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
  JOIN wpres b USING (w)
  WHERE length(t.w) > 0)
SELECT family, n_words, n_tokens,
       CAST(n_tokens * 1000 // n_words AS BIGINT) AS fertility_permille
FROM fam ORDER BY family"""
  }

  /** Shared generator for the PCA power-iteration oracles — mirrors
    * graft.similarity.Vectors.pcaPower/pcaProject with iters=8:
    * C(i,j) = n*sum_qq - s_i*s_j off the q_embed_covariance triangle,
    * v0(i) = 1e6 + i (the symmetry-breaking start both engines use —
    * an all-equal v0 can sit in a reflection-invariant subspace), each
    * round u = C*v then v = sgn(u)*(|u|*1e6 // max|u|) -- exact HUGEINT
    * arithmetic, identical to the engine's BigInt loop. */
  private def pcaSql(projectMode: Boolean): String = {
    val iters = 8
    val rounds = (1 to iters).map { k =>
      s"""u$k AS MATERIALIZED (
  SELECT cm.i AS dim, SUM(cm.c * p.v) AS u
  FROM cm JOIN v${k - 1} p ON p.dim = cm.j GROUP BY cm.i),
m$k AS MATERIALIZED (SELECT GREATEST(MAX(ABS(u)), 1) AS m FROM u$k),
v$k AS MATERIALIZED (
  SELECT dim, CASE WHEN u < 0 THEN -((-u) * 1000000 // (SELECT m FROM m$k))
              ELSE u * 1000000 // (SELECT m FROM m$k) END AS v FROM u$k)"""
    }.mkString(",\n")
    val header =
      s"""WITH
q AS MATERIALIZED (
  SELECT vec_id, CAST(u.i - 1 AS INTEGER) AS dim,
         CAST(round(CAST(embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT) // 1000 AS qv
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
  WHERE embedding IS NOT NULL),
tri AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a.qv) AS BIGINT) AS si,
         CAST(sum(b.qv) AS BIGINT) AS sj,
         CAST(sum(a.qv * b.qv) AS BIGINT) AS sqq
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY 1, 2),
cm AS MATERIALIZED (
  SELECT i, j, CAST(n AS HUGEINT) * sqq - CAST(si AS HUGEINT) * sj AS c FROM tri
  UNION ALL
  SELECT j AS i, i AS j, CAST(n AS HUGEINT) * sqq - CAST(si AS HUGEINT) * sj AS c
  FROM tri WHERE i < j),
v0 AS MATERIALIZED (SELECT DISTINCT i AS dim, CAST(1000000 + i AS HUGEINT) AS v FROM tri),
$rounds"""
    if (!projectMode)
      s"""$header,
cv AS MATERIALIZED (
  SELECT cm.i AS dim, SUM(cm.c * p.v) AS u
  FROM cm JOIN v$iters p ON p.dim = cm.j GROUP BY cm.i),
sc AS MATERIALIZED (
  SELECT (SELECT SUM(v$iters.v * cv.u) FROM v$iters JOIN cv USING (dim)) AS num,
         (SELECT SUM(v * v) FROM v$iters) * (SELECT SUM(c) FROM cm WHERE i = j) AS den)
SELECT v$iters.dim AS dim, CAST(v$iters.v AS BIGINT) AS v_fp6,
       CAST(CASE WHEN (SELECT den FROM sc) = 0 THEN 0
            ELSE (SELECT num FROM sc) * 1000 // (SELECT den FROM sc) END AS BIGINT)
         AS ev_permille
FROM v$iters ORDER BY dim"""
    else
      s"""$header,
dotp AS MATERIALIZED (
  SELECT q.vec_id, SUM(CAST(q.qv AS HUGEINT) * v$iters.v) AS dp
  FROM q JOIN v$iters ON v$iters.dim = q.dim GROUP BY q.vec_id),
kk AS MATERIALIZED (
  SELECT SUM(CAST(tri.si AS HUGEINT) * v$iters.v) AS k,
         MAX(tri.n) AS n
  FROM tri JOIN v$iters ON v$iters.dim = tri.i WHERE tri.i = tri.j),
mt AS MATERIALIZED (
  SELECT CASE WHEN k < 0 THEN -((-k) // n) ELSE k // n END AS m FROM kk)
SELECT vec_id, CAST(dp - (SELECT m FROM mt) AS BIGINT) AS pc1
FROM dotp ORDER BY vec_id"""
  }
}
