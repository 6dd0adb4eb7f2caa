package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = Sessions.build(cpus, Map(
      "spark.sql.adaptive.enabled" -> sys.env.getOrElse("SPARK_GRAFT_AQE", "true")))
    spark.sparkContext.setLogLevel("WARN")
    // REGIME CANARY (r12 judge protocol): the round-12 driver bench read
    // 2× its quiet-host figure because the host disk was busy digesting
    // the correctness dump — and the first casualties were fsync-bound
    // rows (streaming state-store commits). Probe that exact cost BEFORE
    // the suite: write 8 MiB + force() to a temp file, 3×, median. Quiet
    // hosts read ~0.01–0.05 s; a busy-writeback regime reads 10–100×
    // that. The value is printed in the headline JSON so every BENCH_rN
    // artifact carries its own comparability evidence.
    // The probe is re-run AFTER the suite too (r13 bracket lesson: three
    // runs with QUIET start canaries still spread ±12% because the
    // regime shifted mid-run — a start-only canary is necessary, not
    // sufficient; start≠finish in the artifact localizes that).
    // r13 advice: channel + temp file are closed/deleted in finally (a
    // disk-full regime — exactly what the canary probes — must not leak
    // them), and a canary FAILURE records the sentinel -1.0 instead of
    // aborting the whole suite before any query ran.
    def ioCanary(): Double = Canary.io() // the shared definition — see graft.Canary
    // CPU CANARY (r14 lesson): the round's second same-protocol window
    // read 174 s vs 104 s quiet with ALL FIVE I/O canaries quiet
    // (0.019-0.036 s) and loadavg 0.61 — pure-CPU rows slowed 2-3×
    // (q_unigram_apply 3.4→9.4 s), so the regime shifter was host-side
    // CPU contention/steal, which neither an fsync probe nor loadavg
    // (which only sees THIS guest's runnable queue) can detect. Probe
    // it directly: a fixed 20M-iteration FNV mixing loop (~15-40 ms
    // nominal), median of 3, at the same five points as the I/O canary.
    // A quiet host reads a stable baseline; a contended/throttled one
    // reads a multiple of it. The sink comparison keeps JIT from
    // eliding the loop.
    def cpuCanary(): Double = Canary.cpu()
    val ioCanarySec: Double = ioCanary()
    val cpuCanarySec: Double = cpuCanary()
    val loadStart = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // Steady-state methodology: warm every plan shape on the smallest SF
    // (codegen compilation + classloading are 1-5 s per-shape constants),
    // then warm at the TARGET SF too — except for the queries that
    // persist() intermediate tables, whose warm re-run would reuse the
    // cache (Spark's CacheManager matches identical plans) and report a
    // flattered number. Each of those is timed COLD on every pass:
    // caches (and the Caches registry) are cleared before each of its
    // runs, so the reported time always includes the persisted-table
    // build it would pay first in a fresh session.
    val cachingQueries = Set("q_ngram_jaccard", "q_minhash_lsh",
      "q_simhash", "q_simhash_dedup", "q_simhash_pairs", "q_dedup_clusters",
      "q_dedup_apply", "q_corpus_pipeline",
      "q_bigram_fluency", // persists the shared pair expansion since r8
      // r10: these persist private artifacts (LSH bucket table, scored
      // projections, doc×feature profile, canonical edge set) — warm
      // reuse would flatter them, so they are cold-timed like the rest.
      // Incremental-admission rows stay warm-timed ON PURPOSE: their
      // persisted store EXISTING is the operator's semantic (a
      // deployment amortizes it), not a cache artifact of the harness.
      "q_dedup_eval", "q_quality_calibrated", "q_dsir_weights",
      "q_lm_bucket", "q_knn_triangles", "q_hard_negatives",
      "q_vocab_coverage",
      // r11: the BPE merge chain (train loop + merged corpus) is one
      // memoized persisted artifact (Caches.memo) shared by
      // q_bpe_train / q_bpe_apply / q_token_fertility. q_bpe_apply
      // cold-bills the build and the ADJACENT q_bpe_train reuses it —
      // but q_token_fertility runs far later, after many caching
      // queries whose per-pass release() cleared the memo, so its
      // pass-1 rebuilt the chain silently and the median hid that
      // cost (the r11 advice finding). It is cold-timed too now:
      // its reported number honestly includes the chain build a fresh
      // session would pay.
      "q_bpe_apply", "q_token_fertility",
      // r12: every tokenizer chain is cold-billed exactly once, on its
      // own family's apply row — q_bpe_apply (BPE), q_unigram_apply
      // (unigram EM), q_wordpiece_apply (WordPiece merges). The
      // three-family comparison row q_tokenizer_families is NOT in this
      // set ON PURPOSE: its pass-1 rebuilds the unigram+WordPiece memos
      // (cleared by q_token_fertility's release just before it) and the
      // median excludes that build — but the build cost is NOT lost from
      // the report, it is exactly what the in-set apply rows above bill;
      // the families median is the row's marginal cost (three aggregates
      // over the memoized chains), which is what a session that already
      // trained the tokenizers pays for the comparison.
      "q_unigram_apply", "q_wordpiece_apply",
      // r11: the PCA pair (X176/X177) shares the memoized covariance
      // collect — cold-bill it on q_pca_power, q_pca_project reuses.
      "q_pca_power",
      // r12: graph-loop rows persist per-round state frames and the
      // canonical edge set (CacheManager reuses same-plan persisted
      // buffers across passes, which would flatter passes 2–3), and
      // q_sorted_blocking persists its two rank tables + the shared
      // shingle-set table — all cold-timed like their family peers.
      "q_label_prop", "q_kcore", "q_sorted_blocking",
      // r12: per-step funnel state frames are persisted
      "q_funnel_steps",
      // r12: both PageRank-family rows materialize the degree-annotated
      // edge table + node set (q_domain_rank predates the cold-billing
      // sweep — brought in for consistency)
      "q_domain_rank", "q_trust_rank",
      // r12: rfm persists the per-user aggregate for its 3 rank passes
      "q_rfm_segments",
      // r12: k-center seeding persists the projected fixed-point table
      // its k argmax rounds re-read
      "q_kcenter_seeds",
      // r12: the kNN edge table is one memoized persisted artifact
      // (Vectors.knnGraph) shared by the whole graph-diagnostics family
      // (triangles, census, label-prop, k-core, link prediction,
      // clustering coeff, assortativity). The alphabetically-FIRST
      // consumer cold-bills the build each pass (the q_bpe_apply
      // precedent); the family's other non-caching rows are warm-timed
      // ON PURPOSE — the artifact existing is the deployment semantic
      // (a production pipeline materializes the graph once).
      "q_clustering_coeff",
      // r13: groupedLowerMedian materializes its ranked frame (the r12
      // advice fix — stats aggregate + join probe read it twice)
      "q_grouped_median",
      // r16 (r15 advice): globalRankByKey / skyline2d persist their
      // partition-id frame since the r15 flake fix (Caches.materialize at
      // Relational.scala / Dedup.scala) — a private artifact, so the rows
      // that ride those paths are cold-timed like every other
      // private-artifact biller; warm reuse flattered them 2–3×.
      "q_curriculum", "q_pareto_front")
    // HARNESS-FLOOR FUSION (r15 verdict item 1, pre-built behind a flag):
    // the registry floor (rows × ~0.1 s of per-action engine constants)
    // read 24.0% of the r15 close total and rises with every row; the
    // PLANS.md floor audit maps three families whose rows share one scan
    // or one persisted artifact. SPARK_GRAFT_BENCH_FUSE=true replaces
    // those rows with ONE timed unit per family: the union of every
    // member's (count, content-hash) aggregate, collected as a single
    // Spark action — the member plans still run in full (fusion changes
    // the HARNESS shape, never a query's contract; Verify/CORRECTNESS
    // are untouched), but the per-row job-submit/collect floor is paid
    // once per family instead of once per member.
    // DEFAULT = ON since r17 (the r16 verdict's item 1: the floor
    // fraction crossed the agreed 25% trigger at the r16 close — 26.2%
    // — and the A/B was measured in SCALE_r16 study 4). The headline
    // `queries` object carries the three fused keys in place of their
    // member rows; member-level visibility moves to bench_full.json
    // (`fused_families` = the unit→members mapping, `fused_member_sec` =
    // one untimed-headline individual pass per member, recorded AFTER
    // the timed suite so per-row tuning stays possible). Export
    // SPARK_GRAFT_BENCH_FUSE=false for the historical per-row shape.
    val fuseMode = sys.env.getOrElse("SPARK_GRAFT_BENCH_FUSE", "true").toBoolean
    val fusedFamilies: Map[String, Seq[String]] = Map(
      // calendar-bounded day-table profiles: one events → (day, n)
      // aggregate feeds all four readouts
      "fused:day_profile" -> Seq("q_anomaly_zscore", "q_mad_outliers",
        "q_dow_profile", "q_growth_accounting"),
      // the ANSI window family over its two bounded homes
      "fused:window" -> Seq("q_window_rank", "q_window_running",
        "q_window_lag", "q_window_range", "q_window_stats",
        "q_window_distribution"),
      // ANN rows share the persisted index artifacts (Caches.memo)
      "fused:ann" -> Seq("q_ann_lsh", "q_ann_lsh_mp", "q_ann_lsh_mp_r2",
        "q_ann_ivf", "q_ann_ivf_trained", "q_ann_recall"))
    val fusedMembers: Set[String] =
      if (fuseMode) fusedFamilies.values.flatten.toSet else Set.empty
    // One action per family: each member reduces to one row
    // (name, n_rows, order-insensitive content hash) — the same two
    // quantities the correctness gate compares — and the rows union into
    // a single collect. Cast-to-string inside the hash keeps the column
    // set type-uniform across members.
    def fusedUnit(members: Seq[String]): org.apache.spark.sql.DataFrame =
      members.map { m =>
        val df = SparkEntry.queries(m)(spark, sfDir)
        df.agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.xxhash64(df.columns.map(c =>
              org.apache.spark.sql.functions.col(c).cast("string")): _*)).as("h"))
          .select(org.apache.spark.sql.functions.lit(m).as("q"),
            org.apache.spark.sql.functions.col("n"),
            org.apache.spark.sql.functions.col("h"))
      }.reduce(_.union(_))
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      SparkEntry.queries.toSeq.sortBy(_._1)
        .foreach { case (_, fn) => try { fn(spark, warmDir).count() }
          catch { case _: Throwable => () } }
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => cachingQueries(name) }
      .foreach { case (_, fn) => try { fn(spark, sfDir).count() }
        catch { case _: Throwable => () } }
    // Warm-up persists (and any stray cache) must not leak into the timed
    // passes — the timed runs rebuild their own caches from zero.
    spark.catalog.clearCache()
    Caches.release()
    // MEDIAN-OF-N timing (default 3): single-run numbers on a shared host
    // carry ±30% noise (BENCH_r03 vs r04 swung q_join_fact_dim +71% on
    // identical binaries); the per-query median is what's reported and
    // summed.
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    val failed = scala.collection.mutable.ListBuffer[String]()
    // r16 (r15 advice): prewarm failures carry tag-formatted provenance
    // ("prewarm:<producer>:for:<consumer>"), not registered query names —
    // downstream tooling reads `failed` entries AS query names, so the
    // prewarm tags live in their own array.
    val prewarmFailed = scala.collection.mutable.ListBuffer[String]()
    // MID-RUN REGIME TELEMETRY (r13 lesson, promoted by the judge): the
    // three-run r13 bracket had QUIET start canaries while totals spread
    // ±12% and I/O rows moved 2× mid-run — a start-only (even a
    // start+finish) probe cannot LOCALIZE a shift that happens and
    // recovers inside the suite. Probe the canary + loadavg at each
    // quartile boundary of the sorted row list; the segments go to
    // bench_full.json (with the row name each probe preceded) and the
    // mid-run canary triple to the headline regime object, so one
    // artifact can answer "which quarter of the run was the regime bad
    // in" instead of bracketing with re-runs.
    // FAMILY-ARTIFACT PRE-WARM (r14): a cold row is cold to re-bill its
    // PRIVATE artifacts — not to re-bill the shared FAMILY artifact its
    // family already cold-bills once per pass on a designated row
    // (q_clustering_coeff is the kNN graph's biller, the q_bpe_apply
    // precedent; "the artifact existing is the deployment semantic — a
    // production pipeline materializes the graph once"). The graph-loop
    // rows below were rebuilding the cleared kNN memo INSIDE their timed
    // runs, billing the same ~1.3 s / 7-job build up to four times per
    // pass set and burying the loop costs the r13 verdict asked to tune.
    // After each of their cache clears, the named producer rebuilds the
    // family artifact OUTSIDE the timer; the build still appears in the
    // total exactly once, in its designated row.
    val familyPrewarm: Map[String, String] = Map(
      "q_kcore" -> "q_knn_graph",
      "q_label_prop" -> "q_knn_graph",
      "q_knn_triangles" -> "q_knn_graph")
    val regimeSegments = scala.collection.mutable.ListBuffer[(String, Double, Double, Double)]()
    val sortedQueries: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      if (!fuseMode) SparkEntry.queries.toSeq.sortBy(_._1)
      else (SparkEntry.queries.toSeq.filterNot { case (n, _) => fusedMembers(n) } ++
        fusedFamilies.toSeq.map { case (fam, members) =>
          fam -> ((_: org.apache.spark.sql.SparkSession, _: String) => fusedUnit(members))
        }).sortBy(_._1)
    // ONE boundary list feeds both the mid-run probes and the
    // segment_row_sec sums below — they must stay aligned or the four
    // sums attribute drift to the wrong quarter of the run
    val segBoundsOrdered = Seq(1, 2, 3).map(q => q * sortedQueries.size / 4)
    val quartiles = segBoundsOrdered.toSet
    val results = sortedQueries.zipWithIndex.map { case ((name, fn), idx) =>
      if (quartiles(idx)) {
        val load = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean.getSystemLoadAverage
        regimeSegments += ((name, ioCanary(), cpuCanary(), load))
      }
      val times = (1 to passes).map { _ =>
        if (cachingQueries(name)) {
          spark.catalog.clearCache(); Caches.release()
          familyPrewarm.get(name).foreach { producer =>
            // a swallowed prewarm failure would silently re-bill the
            // shared family artifact inside the consumer's timer —
            // record it so a re-billed row is distinguishable from a
            // clean run (the producer's own timed row will fail loudly)
            try SparkEntry.queries(producer)(spark, sfDir).count()
            catch { case e: Throwable =>
              val tag = s"prewarm:$producer:for:$name"
              if (!prewarmFailed.contains(tag)) {
                prewarmFailed += tag
                System.err.println(s"[bench] $tag FAILED: ${e.getMessage}")
              }
            }
          }
        }
        System.gc() // don't bill one run's garbage to the next
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          // the elapsed time is captured HERE, before any attribution
          // re-run below executes (r16 advice: the member re-runs used
          // to sit inside the timed region, so a fused row's failure
          // path billed up to N extra member executions to its median)
          val elapsed = (System.nanoTime() - t0) / 1e9
          // `failed` holds REGISTERED QUERY NAMES only (the prewarm-tag
          // lesson). A fused unit's single action can't attribute its
          // own failure, so re-run the members individually OUTSIDE the
          // timed region and record the real culprits; if every member
          // passes alone (a harness-shape bug), the family tag goes to
          // the provenance list instead.
          fusedFamilies.get(name) match {
            case Some(members) if fuseMode =>
              val culprits = members.filter { m =>
                try { SparkEntry.queries(m)(spark, sfDir).count(); false }
                catch { case _: Throwable => true }
              }
              culprits.foreach { m =>
                if (!failed.contains(m)) {
                  failed += m
                  System.err.println(s"[bench] $m FAILED (inside $name): ${e.getMessage}")
                }
              }
              if (culprits.isEmpty && !prewarmFailed.contains(name)) {
                prewarmFailed += name
                System.err.println(s"[bench] $name FAILED with all members green: ${e.getMessage}")
              }
            case _ =>
              if (!failed.contains(name)) {
                failed += name
                System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
              }
          }
          elapsed
        }
      }
      name -> median(times)
    }
    // FINISH-side regime probes are captured HERE — immediately after
    // the timed suite and BEFORE the fused-member pass below — so the
    // start/finish bracket brackets exactly the timed rows (review
    // finding: 16 extra member executions between the suite and the
    // finish canary would let the member pass's own load masquerade as
    // suite-window regime).
    val ioCanaryFinishSec = ioCanary()
    val cpuCanaryFinishSec = cpuCanary()
    val loadFinish = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // MEMBER VISIBILITY under fusion (r16 verdict requirement): the
    // fused keys hide per-member drift, so after the timed suite each
    // member runs once more, individually timed, into bench_full's
    // `fused_member_sec`. These single-pass numbers are for per-row
    // tuning/attribution only — they are NOT in the headline total and
    // carry single-run noise (±30% on this host) the timed medians don't.
    // A member that FAILS here (while its fused unit passed — a flake)
    // records the -1.0 sentinel rather than an elapsed-until-throw time
    // masquerading as a clean run.
    val fusedMemberSec: Seq[(String, Double)] =
      if (!fuseMode) Seq.empty
      else fusedFamilies.toSeq.sortBy(_._1).flatMap(_._2).map { m =>
        System.gc()
        val t0 = System.nanoTime()
        try { SparkEntry.queries(m)(spark, sfDir).count()
          m -> (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] fused-member pass $m FAILED: ${e.getMessage}")
          m -> -1.0 }
      }
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val pwf = prewarmFailed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // The harness that records this line keeps only the LAST ~2000 chars of
    // output (round 6 lost its headline metric when the 73-query line at
    // full double precision overflowed that window). Render per-query times
    // at the highest precision that keeps the whole line ≤ 1800 chars; the
    // noise band on this host is ±25%, so even 0.1 s resolution loses
    // nothing a reader should trust. Full precision goes to bench_full.json.
    def fmt(v: Double, decimals: Int): String =
      s"%.${decimals}f".formatLocal(java.util.Locale.ROOT, v)
    // The q_stream_* rows (8 as of X232) each run a REAL streaming lifecycle
    // (checkpoint dir + state-store setup ×cold passes) — fixed engine
    // constants that amortize in any long-lived stream, not operator
    // cost. Report that bucket separately so the headline tracks plans.
    val streamingSec = results.collect {
      case (n, v) if n.startsWith("q_stream_") => v
    }.sum
    val midCanaries = regimeSegments.map(s => fmt(s._2, 3)).mkString("[", ",", "]")
    val midCpu = regimeSegments.map(s => fmt(s._3, 3)).mkString("[", ",", "]")
    // PER-SEGMENT ROW-TIME SUMS (r14 forward-plan item 5, triggered by
    // this round's drift concentrating in a few I/O rows under quiet
    // canaries): the four sums of row medians between quartile probes.
    // A regime shift that the canaries miss still shows as ONE shifted
    // segment here, attributable without diffing bench_full per row.
    val segmentRowSums = (0 +: segBoundsOrdered :+ sortedQueries.size)
      .sliding(2).map { case Seq(a, b) => results.slice(a, b).map(_._2).sum }
      .toSeq
    val segSumsJson = segmentRowSums.map(fmt(_, 1)).mkString("[", ",", "]")
    val buckets =
      s""""buckets":{"streaming_lifecycle":${fmt(streamingSec, 2)},"batch":${fmt(total - streamingSec, 2)}},""" +
        s""""regime":{"io_canary_sec":${fmt(ioCanarySec, 3)},"io_canary_mid_sec":$midCanaries,"io_canary_finish_sec":${fmt(ioCanaryFinishSec, 3)},""" +
        s""""cpu_canary_sec":${fmt(cpuCanarySec, 3)},"cpu_canary_mid_sec":$midCpu,"cpu_canary_finish_sec":${fmt(cpuCanaryFinishSec, 3)},""" +
        s""""segment_row_sec":$segSumsJson,"loadavg_start":${fmt(loadStart, 2)}}"""
    def render(entries: Seq[(String, Double)], decimals: Int): String = {
      val qs = entries.map { case (k, v) =>
        "\"" + k + "\":" + fmt(v, decimals)
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec",$buckets,"queries":$qs,"failed":$fl,"prewarm_failed":$pwf,"sf":"$sfDir"}"""
    }
    // Last resort if the registry outgrows even 1-decimal rendering:
    // keep the slowest 40 entries (the ones anyone tunes against) and
    // fold the rest into one bucket, so the headline total still parses.
    def folded: String = {
      val sorted = results.sortBy(-_._2)
      val (top, rest) = sorted.splitAt(40)
      render(top :+ (s"__others_${rest.size}" -> rest.map(_._2).sum), 1)
    }
    val out = Seq(3, 2, 1).map(render(results, _)).find(_.length <= 1800)
      .getOrElse(folded)
    try {
      val full = results.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      // Provenance: bench_full.json is overwritten by every run — driver
      // and builder hosts alike — and a number is only comparable to the
      // yardstick under similar load (round 10's quiet-host 53.6s vs
      // driver 73.6s on identical binaries). Record hostname, cores,
      // 1-min load at finish, and wall time so a reader can tell which
      // regime produced the figure instead of guessing from git history.
      val host = try java.net.InetAddress.getLocalHost.getHostName
        catch { case _: Throwable => "unknown" }
      val segs = regimeSegments.map { case (name, c, cc, l) =>
        s"""{"before":"$name","io_canary_sec":$c,"cpu_canary_sec":$cc,"loadavg":$l}"""
      }.mkString("[", ",", "]")
      val fusedProv =
        if (!fuseMode) ""
        else {
          val fams = fusedFamilies.toSeq.sortBy(_._1).map { case (fam, ms) =>
            "\"" + fam + "\":" + ms.map("\"" + _ + "\"").mkString("[", ",", "]")
          }.mkString("{", ",", "}")
          val members = fusedMemberSec.map { case (m, v) =>
            "\"" + m + "\":" + v
          }.mkString("{", ",", "}")
          s""""fused_families":$fams,"fused_member_sec":$members,""" +
            // the label travels IN the artifact (r17 verdict nit): these
            // are attribution numbers, not medians — say so where they
            // are read, not only in the source
            s""""fused_member_sec_note":"single pass, +/-30% noise; """ +
            s"""attribution only, not a median; -1.0 = member flake","""
        }
      val prov = s""""provenance":{"host":"$host","cpus":"$cpus",$fusedProv""" +
        s""""io_canary_sec":$ioCanarySec,"io_canary_finish_sec":$ioCanaryFinishSec,""" +
        s""""cpu_canary_sec":$cpuCanarySec,"cpu_canary_finish_sec":$cpuCanaryFinishSec,""" +
        s""""regime_segments":$segs,"segment_row_sec":$segSumsJson,"loadavg_start":$loadStart,""" +
        s""""loadavg_finish":$loadFinish,"recorded_at":"${java.time.Instant.now()}"}"""
      java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_full.json"),
        s"""{"total":$total,"passes":$passes,"agg":"median",$prov,"queries":$full,"failed":$fl,"prewarm_failed":$pwf,"sf":"$sfDir"}""")
    } catch { case _: Throwable => () }
    println(out)
    spark.stop()
  }
}
