package graft.ops

import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  // A→B, A→C, B→A, C→A at scale = 100, one round, hand-computed:
  // base = 3·100/20 = 15; contrib(B) = contrib(C) = 100 div 2 = 50,
  // contrib(A) = 100 + 100 = 200; r1 = base + (17·s) div 20
  test("pageRankInt matches the hand-computed round on a tiny graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val r1 = Graphs.pageRankInt(edges, "src", "dst", iters = 1, scale = 100L)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 185L, 2L -> 57L, 3L -> 57L))
  }

  test("dangling sinks keep receiving mass; sources drain to the base term") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val r1 = Graphs.pageRankInt(edges, "src", "dst", iters = 1, scale = 100L)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 15L, 2L -> 100L)) // 15 + (17·100) div 20 = 100
  }

  test("result is partition-count invariant and self-loops/dup edges are dropped") {
    val raw = Seq((1L, 2L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val expect = Graphs.pageRankInt(raw.toDF("src", "dst"), "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    Seq(1, 3, 7).foreach { p =>
      val got = Graphs.pageRankInt(raw.toDF("src", "dst").repartition(p),
        "src", "dst", iters = 3).as[(Long, Long)].collect().toMap
      assert(got == expect, s"parts=$p")
    }
    // self-loop (2,2) dropped: node 2's out-degree is 1 (to 3 only)
    val clean = Graphs.pageRankInt(
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst"),
      "src", "dst", iters = 3).as[(Long, Long)].collect().toMap
    assert(expect == clean)
  }

  // K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus pendant 4—5:
  // degrees 3,3,3,4,1; triangle counts 3,3,3,3,0. Direction, duplicate
  // edges, and self-loops must not change the undirected census.
  test("triangleCounts: K4 + pendant, direction/dup/self-loop invariant") {
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 3L), (4L, 5L), (5L, 5L)).toDF("src", "dst")
    val got = Graphs.triangleCounts(edges, "src", "dst")
      .as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == Map(
      1L -> ((3L, 3L)), 2L -> ((3L, 3L)), 3L -> ((3L, 3L)),
      4L -> ((4L, 3L)), 5L -> ((1L, 0L))))
  }

  test("triangleCounts: empty and all-self-loop edge lists yield empty output") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Graphs.triangleCounts(empty, "src", "dst").count() == 0)
    graft.Caches.release()
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    assert(Graphs.triangleCounts(loops, "src", "dst").count() == 0)
    graft.Caches.release()
  }

  test("triangleCounts: triangle-free graph reports zero everywhere") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graphs.triangleCounts(path, "src", "dst")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 4 && got.forall(_._3 == 0L))
  }

  test("labelPropagation: majority vote, tie to smaller label, multi-round reach, -1 unreached") {
    // seeds: 0→7, 1→3. Edges (directed out-neighborhoods):
    //   2 → {0, 1}    round 1: votes 7:1, 3:1 → TIE → smaller label 3
    //   3 → {0}       round 1: 7
    //   4 → {3, 3'}?  4 → {3} only: round 2 via 3's round-1 label 7
    //   5 → {6}       6 unlabeled forever → 5 stays -1
    val vertices = Seq(
      (0L, 7, true), (1L, 3, true), (2L, 9, false), (3L, 9, false),
      (4L, 9, false), (5L, 9, false), (6L, 9, false)
    ).toDF("id", "label", "is_seed")
    val edges = Seq((2L, 0L), (2L, 1L), (3L, 0L), (4L, 3L), (5L, 6L))
      .toDF("src", "dst")
    val out = Graphs.labelPropagation(vertices, edges, "src", "dst", rounds = 2)
      .orderBy($"id").as[(Long, Int, Int)].collect()
    graft.Caches.release()
    assert(out.toSeq == Seq(
      (0L, 7, 0),   // seed keeps label, round 0
      (1L, 3, 0),
      (2L, 3, 1),   // tie 7 vs 3 → smaller label
      (3L, 7, 1),
      (4L, 7, 2),   // reached through 3's round-1 label
      (5L, -1, -1), // only neighbor never labeled
      (6L, -1, -1)))
  }

  // Cycle 1→2→3→1 plus unlinked spammer 4→2; seed {1}, scale 100.
  // r0: (100, 0, 0, 0). Round 1: contrib(2) = 100; seeds get base
  // 3·100/20 = 15 → (15, 85, 0, 0). Round 2: contribs 15→2, 85→3 →
  // (15, (17·15) div 20 = 12, (17·85) div 20 = 72, 0) — trust decays
  // with link distance from the seed and the spammer never earns any.
  test("personalizedPageRankInt: hand-computed trust rounds, spam node stays 0") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("v")
    val r1 = Graphs.personalizedPageRankInt(edges, "src", "dst", seeds,
      iters = 1, scale = 100L).as[(Long, Long)].collect().toMap
    graft.Caches.release()
    assert(r1 == Map(1L -> 15L, 2L -> 85L, 3L -> 0L, 4L -> 0L))
    val r2 = Graphs.personalizedPageRankInt(edges, "src", "dst", seeds,
      iters = 2, scale = 100L).as[(Long, Long)].collect().toMap
    graft.Caches.release()
    assert(r2 == Map(1L -> 15L, 2L -> 12L, 3L -> 72L, 4L -> 0L))
  }

  // K4 {1,2,3,4} + path 4—5—6, isolated 7. Round-1 degrees:
  // 1:3 2:3 3:3 4:4 5:2 6:1 7:0.
  // k=2: r1 peels 6 (deg 1) and 7 (deg 0); r2 recomputes over
  // {1..5} (K4 + 4—5): 5's degree drops to 1 → peeled; r3 over K4:
  // everyone at degree 3 survives (4's degree fell 4→3 after losing 5).
  test("kcorePeel: cascading peel with hand-computed rounds at k=2") {
    val vertices = (1L to 7L).toDF("id")
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val out = Graphs.kcorePeel(vertices, edges, "src", "dst", k = 2, rounds = 3)
      .orderBy($"id").as[(Long, Int, Long)].collect()
    graft.Caches.release()
    assert(out.toSeq == Seq(
      (1L, -1, 3L), (2L, -1, 3L), (3L, -1, 3L), (4L, -1, 3L),
      (5L, 2, 1L), (6L, 1, 1L), (7L, 1, 0L)))
  }

  // Same graph at k=4: only hub 4 (deg 4) survives round 1, then finds
  // itself isolated in round 2 — the fringe-collapse cascade.
  test("kcorePeel: k=4 cascade empties the core; direction/dup edges invariant") {
    val vertices = (1L to 5L).toDF("id")
    val canon = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val expect = Seq(
      (1L, 1, 3L), (2L, 1, 3L), (3L, 1, 3L), (4L, 2, 0L), (5L, 1, 1L))
    val out = Graphs.kcorePeel(vertices, canon.toDF("src", "dst"),
        "src", "dst", k = 4, rounds = 3)
      .orderBy($"id").as[(Long, Int, Long)].collect()
    graft.Caches.release()
    assert(out.toSeq == expect)
    // reversed + duplicated edges and a self-loop canonicalize away
    val messy = (canon.map(_.swap) ++ canon ++ Seq((3L, 3L))).toDF("src", "dst")
    val out2 = Graphs.kcorePeel(vertices, messy, "src", "dst", k = 4, rounds = 3)
      .orderBy($"id").as[(Long, Int, Long)].collect()
    graft.Caches.release()
    assert(out2.toSeq == expect)
  }

  test("labelPropagation: clear majority beats the tie-break") {
    val vertices = Seq(
      (0L, 5, true), (1L, 5, true), (2L, 1, true), (3L, 9, false)
    ).toDF("id", "label", "is_seed")
    val edges = Seq((3L, 0L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val out = Graphs.labelPropagation(vertices, edges, "src", "dst", rounds = 1)
      .filter($"id" === 3L).as[(Long, Int, Int)].collect()
    graft.Caches.release()
    assert(out.toSeq == Seq((3L, 5, 1)), "2×label-5 must beat 1×label-1 despite 1 < 5")
  }
}
