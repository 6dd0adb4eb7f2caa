package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

class TopKByScoreSpec extends SparkSpec {
  import spark.implicits._

  test("top_k_by_score equals the window row_number formulation") {
    val df = Seq(
      (1L, 3.0, 10L), (1L, 5.0, 11L), (1L, 4.0, 12L), (1L, 5.0, 9L),
      (2L, 1.0, 20L), (3L, 7.0, 30L), (3L, 7.0, 31L), (3L, 6.0, 32L)
    ).toDF("key", "score", "id")
    val agg = df.groupBy("key")
      .agg(TopKByScore($"score", $"id", 2).as("top"))
      .select($"key", explode($"top").as("p"))
      .select($"key", $"p.score", $"p.id")
      .orderBy("key", "id")
      .as[(Long, Double, Long)].collect()
    val w = Window.partitionBy("key").orderBy($"score".desc, $"id".asc)
    val win = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select($"key", $"score", $"id").orderBy("key", "id")
      .as[(Long, Double, Long)].collect()
    assert(agg.toSeq == win.toSeq)
  }

  test("property: agg matches window top-k under arbitrary data and partitioning") {
    val rowGen = Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(-100.0, 100.0), Gen.chooseNum(0L, 1000L))
    (1L to 10L).foreach { seed =>
      val rows = Gen.listOfN(200, rowGen)(Gen.Parameters.default, Seed(seed)).get
      val df = rows.toDF("key", "score", "id").repartition(7)
      val agg = df.groupBy("key").agg(TopKByScore($"score", $"id", 3).as("top"))
        .select($"key", explode($"top").as("p"))
        .select($"key", $"p.score", $"p.id")
        .orderBy("key", "score", "id").as[(Long, Double, Long)].collect()
      val w = Window.partitionBy("key").orderBy($"score".desc, $"id".asc)
      val win = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
        .select($"key", $"score", $"id")
        .orderBy("key", "score", "id").as[(Long, Double, Long)].collect()
      assert(agg.toSeq == win.toSeq, s"seed=$seed")
    }
  }

  test("partial aggregation appears in the plan (map-side reduction before the shuffle)") {
    val df = (1 to 100).map(i => (i % 5, i.toDouble, i.toLong)).toDF("key", "score", "id")
    val plan = df.groupBy("key").agg(TopKByScore($"score", $"id", 2).as("top"))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate runs in partial + final mode around the exchange
    assert(plan.contains("ObjectHashAggregate"), plan)
  }
}
