package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("normString trims and uppercases, propagates NULL") {
    val out = Seq("  paris ", "London", null).toDF("c")
      .select(Relational.normString($"c").as("n")).as[String].collect()
    assert(out.toSeq == Seq("PARIS", "LONDON", null))
  }

  test("categorize matches substrings case-insensitively in rule order, else trims") {
    val rules = Seq("sunny" -> "Clear", "rain" -> "Rain", "cloud" -> "Cloudy")
    val out = Seq("Partly SUNNY", "light rain", "Overcast Clouds", " other  ", null)
      .toDF("c").select(Relational.categorize($"c", rules).as("k")).as[String].collect()
    assert(out.toSeq == Seq("Clear", "Rain", "Cloudy", "other", null))
  }

  test("bands covers boundaries gap-free for integers; NULL stays NULL") {
    val bs = Seq((Int.MinValue, -1, "Freezing"), (0, 10, "Cold"), (11, 20, "Mild"), (21, 30, "Warm"))
    val in = Seq[Integer](-51, -1, 0, 10, 11, 20, 21, 30, 31, null).toDF("t")
    val out = in.select(Relational.bands($"t", bs, "Hot").as("b")).as[String].collect()
    assert(out.toSeq == Seq("Freezing", "Freezing", "Cold", "Cold", "Mild", "Mild",
      "Warm", "Warm", "Hot", null))
  }

  test("surrogateKey matches dbt_utils generate_surrogate_key incl. null placeholder") {
    // md5('PARIS-FRANCE') and md5('PARIS-_dbt_utils_surrogate_key_null_')
    val out = Seq(("PARIS", "FRANCE"), ("PARIS", null))
      .toDF("city", "country")
      .select(Relational.surrogateKey($"city", $"country").as("k")).as[String].collect()
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(out(0) == md5hex("PARIS-FRANCE"))
    assert(out(1) == md5hex("PARIS-_dbt_utils_surrogate_key_null_"))
  }

  test("cents rounds half away from zero to exact long cents") {
    // 0.375*100 = 37.5 exactly in binary → the half-away-from-zero case
    val out = Seq(0.375, -0.375, 1.0, 0.0).toDF("x")
      .select(Relational.cents($"x").as("c")).as[Long].collect()
    assert(out.toSeq == Seq(38L, -38L, 100L, 0L))
  }

  test("duplicates finds only keys with count > 1") {
    val df = Seq(1, 1, 2, 3, 3, 3).toDF("k")
    val dup = Relational.duplicates(df, Seq("k")).orderBy("k")
      .select($"k", $"n").as[(Int, Long)].collect()
    assert(dup.toSeq == Seq((1, 2L), (3, 3L)))
  }

  test("acceptedValuesViolations excludes NULLs and accepted values") {
    val df = Seq("click", "view", "BAD", null).toDF("event_type")
    val v = Relational.acceptedValuesViolations(df, "event_type", Seq("click", "view"))
      .as[String].collect()
    assert(v.toSeq == Seq("BAD"))
  }

  test("topK returns k rows in total order") {
    val df = (1 to 100).map(i => (i.toLong, (i % 10).toDouble)).toDF("id", "v")
    val top = Relational.topK(df, 5, $"v".desc, $"id".asc).select($"id").as[Long].collect()
    assert(top.toSeq == Seq(9L, 19L, 29L, 39L, 49L))
  }

  test("saltedJoin equals the plain join on skewed data") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "cold")).toDF("k", "tag")
    val salted = Relational.saltedJoin(big, small, Seq("k"), 8)
      .orderBy("v").select($"v", $"tag").as[(Int, String)].collect()
    val plain = big.join(small, "k")
      .orderBy("v").select($"v", $"tag").as[(Int, String)].collect()
    assert(salted.toSeq == plain.toSeq)
  }

  test("asOfJoin attaches the most recent right row at or before each left ts") {
    val trades = Seq((1L, 10L, "t1"), (1L, 25L, "t2"), (2L, 5L, "t3"))
      .toDF("k", "ts", "trade")
    val quotes = Seq((1L, 10L, 100.0), (1L, 20L, 110.0), (3L, 1L, 999.0))
      .toDF("k", "qts", "px")
    val out = Relational.asOfJoin(trades, quotes, "k", "ts", "qts", Seq("px"))
      .orderBy("k", "ts")
      .select($"trade", $"px").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getDouble(1)))
    // equal timestamps match (<=); keys with no prior quote get null
    assert(out.toSeq == Seq(("t1", 100.0), ("t2", 110.0), ("t3", null)))
  }

  test("asOfJoin edge cases: right-only keys ignored, right ties resolved, stable under repartitioning") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2")).toDF("k", "ts", "trade")
    val quotes = Seq(
      (1L, 10L, 1.0), (1L, 10L, 2.0),   // tie at ts=10
      (2L, 5L, 9.0)                     // key never on the left
    ).toDF("k", "qts", "px")
    // deterministic tie-break: pre-dedupe the right side as documented
    val dedup = Relational.latestPerKey(quotes, Seq("k", "qts"), Seq($"px".desc))
    val out = Relational.asOfJoin(trades, dedup, "k", "ts", "qts", Seq("px"))
      .orderBy("ts").select($"trade", $"px").as[(String, Double)].collect()
    assert(out.toSeq == Seq(("t1", 2.0), ("t2", 2.0)))
    val out2 = Relational.asOfJoin(trades.repartition(5), dedup.repartition(3),
      "k", "ts", "qts", Seq("px"))
      .orderBy("ts").select($"trade", $"px").as[(String, Double)].collect()
    assert(out2.toSeq == out.toSeq)
  }

  test("latestPerKey keeps exactly one deterministic row per key") {
    val df = Seq((1, "2024-01-01", 10), (1, "2024-01-02", 20), (2, "2024-01-01", 30))
      .toDF("k", "d", "v")
    val out = Relational.latestPerKey(df, Seq("k"), Seq($"d".desc, $"v".desc))
      .orderBy("k").select($"k", $"v").as[(Int, Int)].collect()
    assert(out.toSeq == Seq((1, 20), (2, 30)))
  }

  // u1 completes the funnel (and a later click must not shift the
  // earliest-qualifying time); u2's click precedes its view (strictly-
  // after fails); u3 never views (misses step 1 entirely); u4's click
  // falls outside the 1000-µs step window; u5 clicks but its purchase
  // precedes the click. Window 1000.
  test("funnelSteps: strict order, step window, earliest-qualifying event") {
    val e = Seq(
      (1L, 100L, "view"), (1L, 200L, "click"), (1L, 250L, "click"), (1L, 300L, "purchase"),
      (2L, 100L, "view"), (2L, 50L, "click"),
      (3L, 100L, "click"), (3L, 200L, "purchase"),
      (4L, 100L, "view"), (4L, 1200L, "click"),
      (5L, 100L, "view"), (5L, 150L, "click"), (5L, 140L, "purchase")
    ).toDF("u", "us", "et")
    val out = Relational.funnelSteps(e, "u", "us", "et",
        Seq("view", "click", "purchase"), stepWindow = 1000L)
      .orderBy($"step").as[(Int, String, Long, Long)].collect()
    graft.Caches.release()
    assert(out.toSeq == Seq(
      (1, "view", 4L, 0L),       // u1, u2, u4, u5
      (2, "click", 2L, 150L),    // u1 (200−100) + u5 (150−100)
      (3, "purchase", 1L, 200L)))// u1 only (300−100)
  }

  test("funnelSteps: empty step still reports a zero row") {
    val e = Seq((1L, 10L, "view")).toDF("u", "us", "et")
    val out = Relational.funnelSteps(e, "u", "us", "et",
        Seq("view", "click"), stepWindow = 10L)
      .orderBy($"step").as[(Int, String, Long, Long)].collect()
    graft.Caches.release()
    assert(out.toSeq == Seq((1, "view", 1L, 0L), (2, "click", 0L, 0L)))
  }

  // g1 = [10, 20, 30] → lower median 20 (rank (3+1) div 2 = 2);
  // g2 = [5, 7] → rank (2+1) div 2 = 1 → 5 (LOWER median);
  // g3 = [9] → 9. Value ties (g4 = [4, 4]) break by id, still 4.
  test("groupedLowerMedian: exact per-group rank selection, lower-median rule") {
    val df = Seq(
      (1L, "g1", 30L), (2L, "g1", 10L), (3L, "g1", 20L),
      (4L, "g2", 7L), (5L, "g2", 5L),
      (6L, "g3", 9L),
      (7L, "g4", 4L), (8L, "g4", 4L)
    ).toDF("id", "g", "v")
    val out = Relational.groupedLowerMedian(df, "id", "g", "v")
      .orderBy($"g").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("g1", 3L, 20L), ("g2", 2L, 5L),
      ("g3", 1L, 9L), ("g4", 2L, 4L)))
  }

  // u1: A@1→B@2→A@3→C@4 gives A→B, B→A, A→C; u2: B@1→B@2 gives B→B.
  // Out-totals: A=2, B=2 → every transition is 500‰. The two equal-ts
  // events of u3 order by the event-id tie-break (id 1 before id 2),
  // so C→A — not A→C — is the u3 transition.
  test("eventTransitions: per-user lead pairs, out-share permille, tie-break") {
    val e = Seq(
      (10L, 1L, 1L, "A"), (11L, 1L, 2L, "B"), (12L, 1L, 3L, "A"), (13L, 1L, 4L, "C"),
      (20L, 2L, 1L, "B"), (21L, 2L, 2L, "B"),
      (1L, 3L, 5L, "C"), (2L, 3L, 5L, "A")
    ).toDF("event_id", "u", "us", "et")
    val out = Relational.eventTransitions(e, "u", "us", "et", tieBreak = $"event_id")
      .orderBy($"from_type", $"to_type")
      .as[(String, String, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("A", "B", 1L, 500L), ("A", "C", 1L, 500L),
      ("B", "A", 1L, 500L), ("B", "B", 1L, 500L),
      ("C", "A", 1L, 1000L))) // C's only out-transition → 1000‰ of C
  }

  // u1's two purchases both credit the click (the latest non-purchase
  // before EACH of them — the view@1 is superseded, and purchase@3
  // itself must not become a touch for purchase@4); u2 converts with
  // no preceding touch → 'direct'. Shares: 2/3 → 666‰, 1/3 → 333‰.
  test("lastTouchAttribution: latest preceding non-conversion touch, direct fallback") {
    val e = Seq(
      (1L, 1L, 1L, "view", 0.0), (2L, 1L, 2L, "click", 0.0),
      (3L, 1L, 3L, "purchase", 1.0), (4L, 1L, 4L, "purchase", 2.0),
      (5L, 2L, 1L, "purchase", 0.5)
    ).toDF("event_id", "u", "us", "et", "v")
    val out = Relational.lastTouchAttribution(e, "u", "us", "et", "v",
        convType = "purchase", tieBreak = $"event_id")
      .orderBy($"touch_type")
      .as[(String, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(
      ("click", 2L, 300L, 666L),
      ("direct", 1L, 50L, 333L)))
  }

  test("cohortRetention: cohort by first-event week, distinct weekly activity") {
    val wk = 7L * 86400L * 1000000L
    val e = Seq(
      (1L, 0L), (1L, wk + 5L), (1L, 3 * wk),           // cohort 0, weeks 0/1/3
      (2L, wk + 2L), (2L, wk + 9L), (2L, 2 * wk + 1L)  // cohort 1, weeks 1/1/2
    ).toDF("u", "us")
    val out = Relational.cohortRetention(e, "u", "us")
      .orderBy($"cohort_week", $"week_offset")
      .as[(Long, Int, Long)].collect()
    assert(out.toSeq == Seq(
      (0L, 0, 1L), (0L, 1, 1L), (0L, 3, 1L),
      (1L, 0, 1L), (1L, 1, 1L)))
  }

  // 5 users ⇒ quint = rank exactly. Ranks per axis (metric ASC, user
  // ASC tie-break): recency u3(5) u1(10) u2(30) u4(42) u5(50);
  // frequency ties 1,1,1 break by id → u1 u3 u5 then u2(2) u4(3);
  // monetary u5(−100) u4(30) u1(100) u2(100 tie→after u1) u3(1000).
  test("rfmSegments: exact quintiles with deterministic tie-breaks, packed code") {
    val e = Seq(
      (1L, 10L, 1.00), (2L, 20L, 0.50), (2L, 30L, 0.50), (3L, 5L, 10.00),
      (4L, 40L, 0.10), (4L, 41L, 0.10), (4L, 42L, 0.10), (5L, 50L, -1.00)
    ).toDF("u", "us", "value")
    val out = Relational.rfmSegments(e, "u", "us", "value")
      .orderBy($"u").as[(Long, Int, Int, Int, Int)].collect()
    graft.Caches.release()
    assert(out.toSeq == Seq(
      (1L, 2, 1, 3, 213), (2L, 3, 4, 4, 344), (3L, 1, 2, 5, 125),
      (4L, 4, 5, 2, 452), (5L, 5, 3, 1, 531)))
  }

  // Hand-computed dominance: (5,10) fronts; (5,4) loses to it on y at
  // equal x; (4,10) loses to (5,10) on x at equal y; the (3,12) TWINS
  // both survive (neither dominates the other); (2,12) loses to (3,12);
  // (1,15) fronts (beats every larger-x ymax); (0,1) loses to everything.
  test("skyline2d: exact pareto front incl. ties, partition-count invariant") {
    val pts = Seq(
      (1L, 5L, 10L), (2L, 5L, 4L), (3L, 3L, 12L), (4L, 3L, 12L),
      (5L, 4L, 10L), (6L, 2L, 12L), (7L, 1L, 15L), (8L, 0L, 1L))
    val expect = Set(1L, 3L, 4L, 7L)
    Seq(1, 3, 32).foreach { p =>
      val got = Relational.skyline2d(
          pts.toDF("id", "x", "y").repartition(p), "x", "y")
        .select($"id").as[Long].collect().toSet
      assert(got == expect, s"parts=$p")
    }
  }

  test("skyline2d: single point and all-identical points are their own front") {
    val one = Relational.skyline2d(Seq((1L, 2L, 3L)).toDF("id", "x", "y"), "x", "y")
    assert(one.select($"id").as[Long].collect().toSeq == Seq(1L))
    val same = Relational.skyline2d(
      Seq((1L, 2L, 3L), (2L, 2L, 3L), (3L, 2L, 3L)).toDF("id", "x", "y"), "x", "y")
    assert(same.select($"id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("sessionize: gap splits sessions, equal-ts events share one, numbering is per-key") {
    // user 1: two events 10 apart, a 100 gap, one more;
    // user 2: equal timestamps, then a wide gap
    val e = Seq(
      (1L, 1L, 100L), (2L, 1L, 110L), (3L, 1L, 210L),
      (4L, 2L, 50L), (5L, 2L, 50L), (6L, 2L, 500L)
    ).toDF("event_id", "k", "ts")
    val out = Relational.sessionize(e, "k", "ts", gap = 50L, tieBreak = $"event_id")
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(out(1L) == 0L && out(2L) == 0L) // 10 apart, same session
    assert(out(3L) == 1L)                  // 100 > gap, new session
    assert(out(4L) == 0L && out(5L) == 0L) // equal ts share a session
    assert(out(6L) == 1L)                  // numbering restarts per key
    // stable under repartitioning (window owns the ordering)
    val out2 = Relational.sessionize(e.repartition(5), "k", "ts", gap = 50L,
      tieBreak = $"event_id")
      .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
    assert(out2 == out)
  }

  test("upsert: updates win on collision, inserts land, multi-version batches apply latest") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "v", "ver")
    val updates = Seq(
      (2L, "b2", 21L), (2L, "b3", 25L), // two versions of key 2 — latest wins
      (4L, "d", 40L)                    // brand-new key
    ).toDF("k", "v", "ver")
    val out = Relational.upsert(base, updates, Seq("k"), Seq($"ver".desc))
      .select($"k", $"v", $"ver").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", 10L),  // untouched base row survives
      (2L, "b3", 25L), // updated, and by the LATEST version in the batch
      (3L, "c", 30L),
      (4L, "d", 40L))) // inserted
  }

  test("historize: validity intervals chain per key, last row is current") {
    val log = Seq((1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"), (2L, 5L, "x"))
      .toDF("k", "ts", "v")
    val out = Relational.historize(log, Seq("k"), "ts", $"v")
      .select($"k", $"ts", $"v", $"valid_to", $"is_current")
      .as[(Long, Long, String, Option[Long], Boolean)].collect()
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 10L, "a", Some(20L), false),
      (1L, 20L, "b", Some(30L), false),
      (1L, 30L, "c", None, true),   // open interval = current version
      (2L, 5L, "x", None, true)))   // single-version key is current
    // intervals tile the timeline: valid_to(i) == valid_from(i+1)
    val k1 = out.filter(_._1 == 1L)
    k1.sliding(2).foreach { case Array(a, b) => assert(a._4.contains(b._2)) }
  }

  test("resampleHourlyFfill: dense spine, zero-count gap hours, carried totals") {
    val hourUs = 3600000000L
    // key 1: events in hours 100 and 103 — 102 must appear with n=0 and
    // the hour-100 total carried through; key 2: single hour
    val e = Seq(
      (1L, 100 * hourUs + 5L, 7L), (1L, 100 * hourUs + 6L, 3L),
      (1L, 103 * hourUs + 1L, 20L),
      (2L, 50 * hourUs, 4L)
    ).toDF("user_id", "us", "cents")
    val out = Relational.resampleHourlyFfill(e, "user_id", "us", $"cents")
      .select($"user_id", $"h", $"n", $"v", $"v_ffill")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 100L, 2L, Some(10L), Some(10L)),
      (1L, 101L, 0L, None, Some(10L)),  // gap hour, forward-filled
      (1L, 102L, 0L, None, Some(10L)),
      (1L, 103L, 1L, Some(20L), Some(20L)),
      (2L, 50L, 1L, Some(4L), Some(4L))))
  }
}
