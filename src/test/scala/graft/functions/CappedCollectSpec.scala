package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CappedCollectSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int) =
    (1 to n).map(i => (1L, i.toLong, i.toLong * 10, i)).toDF("g", "id", "n_sh", "pos")

  test("groups at or under the cap collect every element") {
    val out = rows(5)
      .groupBy($"g")
      .agg(CappedCollect($"id", $"n_sh", $"pos", 5).as("cc"))
      .select($"cc.overflow", size($"cc.xs"))
      .as[(Boolean, Int)].collect().head
    assert(out == ((false, 5)))
  }

  test("one element past the cap flips overflow and drops the payload") {
    val out = rows(6)
      .groupBy($"g")
      .agg(CappedCollect($"id", $"n_sh", $"pos", 5).as("cc"))
      .select($"cc.overflow", size($"cc.xs"))
      .as[(Boolean, Int)].collect().head
    assert(out == ((true, 0)))
  }

  test("overflow detection survives partial aggregation across partitions") {
    // force many partitions so map-side partials must merge buffers
    val out = rows(40).repartition(8)
      .groupBy($"g")
      .agg(CappedCollect($"id", $"n_sh", $"pos", 10).as("cc"))
      .select($"cc.overflow").as[Boolean].collect().head
    assert(out)
    val under = rows(8).repartition(8)
      .groupBy($"g")
      .agg(CappedCollect($"id", $"n_sh", $"pos", 10).as("cc"))
      .select($"cc.overflow", size($"cc.xs")).as[(Boolean, Int)].collect().head
    assert(under == ((false, 8)))
  }

  test("string ids collect, overflow, and survive the partial-merge serde") {
    val sdf = (1 to 12).map(i => (1L, s"doc-$i", i.toLong, i)).toDF("g", "id", "n_sh", "pos")
    val got = sdf.repartition(5)
      .groupBy($"g")
      .agg(CappedCollect($"id", $"n_sh", $"pos", 20).as("cc"))
      .select(explode($"cc.xs.id")).as[String].collect().toSet
    assert(got == (1 to 12).map(i => s"doc-$i").toSet)
    val over = sdf.repartition(5)
      .groupBy($"g")
      .agg(CappedCollect($"id", $"n_sh", $"pos", 4).as("cc"))
      .select($"cc.overflow", size($"cc.xs")).as[(Boolean, Int)].collect().head
    assert(over == ((true, 0)))
  }

  test("collected elements carry all three fields (order-insensitive)") {
    val got = rows(4).repartition(3)
      .groupBy($"g")
      .agg(CappedCollect($"id", $"n_sh", $"pos", 10).as("cc"))
      .select(explode($"cc.xs").as("x"))
      .select($"x.id", $"x.n_sh", $"x.pos")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == (1 to 4).map(i => (i.toLong, i.toLong * 10, i)).toSet)
  }
}
