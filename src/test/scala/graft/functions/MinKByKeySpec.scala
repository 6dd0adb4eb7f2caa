package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

class MinKByKeySpec extends SparkSpec {
  import spark.implicits._

  test("min_k_by_key equals the window row_number formulation") {
    val df = Seq(
      ("en", "0b", 10L), ("en", "aa", 11L), ("en", "03", 12L), ("en", "0b", 9L),
      ("de", "ff", 20L), ("fr", "01", 30L), ("fr", "01", 31L), ("fr", "02", 32L)
    ).toDF("lang", "h", "id")
    val agg = df.groupBy("lang")
      .agg(MinKByKey($"h", $"id", 2).as("take"))
      .select($"lang", posexplode($"take").as(Seq("i", "p")))
      .select($"lang", $"p.key", $"p.id", ($"i" + 1).cast("int").as("rn"))
      .orderBy("lang", "rn")
      .as[(String, String, Long, Int)].collect()
    val w = Window.partitionBy("lang").orderBy($"h".asc, $"id".asc)
    val win = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select($"lang", $"h", $"id", $"rn").orderBy("lang", "rn")
      .as[(String, String, Long, Int)].collect()
    assert(agg.toSeq == win.toSeq)
  }

  test("property: agg matches window min-k under arbitrary data and partitioning") {
    val keyGen = Gen.oneOf("en", "de", "fr", "ja")
    val hexGen = Gen.listOfN(6, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString)
    val rowGen = Gen.zip(keyGen, hexGen, Gen.chooseNum(0L, 1000L))
    (1L to 10L).foreach { seed =>
      val rows = Gen.listOfN(200, rowGen)(Gen.Parameters.default, Seed(seed)).get
      val df = rows.toDF("lang", "h", "id").repartition(7)
      val agg = df.groupBy("lang").agg(MinKByKey($"h", $"id", 3).as("take"))
        .select($"lang", explode($"take").as("p"))
        .select($"lang", $"p.key", $"p.id")
        .orderBy("lang", "key", "id").as[(String, String, Long)].collect()
      val w = Window.partitionBy("lang").orderBy($"h".asc, $"id".asc)
      val win = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
        .select($"lang", $"h", $"id").orderBy("lang", "h", "id")
        .as[(String, String, Long)].collect()
      assert(agg.toSeq == win.toSeq, s"seed=$seed")
    }
  }

  test("buffer caps at k and survives serialize/deserialize round-trip") {
    import org.apache.spark.unsafe.types.UTF8String
    val buf = new MinKBuffer(3)
    Seq("ff" -> 1L, "aa" -> 2L, "cc" -> 3L, "bb" -> 4L, "01" -> 5L)
      .foreach { case (k, i) => buf.add(UTF8String.fromString(k), i) }
    val rt = MinKBuffer.fromBytes(3, buf.toBytes)
    assert(rt.sortedPairs.map { case (k, i) => (k.toString, i) } ==
      Seq(("01", 5L), ("aa", 2L), ("bb", 4L)))
  }
}
