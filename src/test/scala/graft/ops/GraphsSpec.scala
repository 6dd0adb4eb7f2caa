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
}
