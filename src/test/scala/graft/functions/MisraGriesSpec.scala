package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("misra_gries: every key above n/(k+1) survives, n exact, size bounded") {
    // 1000 rows: "hot" 400×, "warm" 150×, 450 singletons
    val rows = Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++
      (1 to 450).map(i => s"cold_$i")
    val df = rows.toDF("tok").repartition(7) // force partial/merge paths
    val out = df.agg(MisraGries($"tok", 8).as("m"))
      .select($"m.n", $"m.keys").as[(Long, Seq[String])].collect().head
    assert(out._1 == 1000L)
    assert(out._2.length <= 8)
    // guarantee: freq > n/(k+1) = 1000/9 ≈ 111 ⇒ hot and warm must survive
    assert(out._2.contains("hot") && out._2.contains("warm"))
    // output keys are sorted and deduped
    assert(out._2 == out._2.sorted && out._2.distinct == out._2)
  }

  test("misra_gries two-pass exact heavy hitters equal the full groupBy") {
    val rows = (1 to 2000).map { i =>
      if (i % 3 == 0) "alpha" else if (i % 7 == 0) "beta" else s"tail_$i"
    }
    val toks = rows.toDF("tok").repartition(5)
    val mg = toks.agg(MisraGries($"tok", 64).as("m"))
      .select($"m.n".as("n_tot"), explode($"m.keys").as("tok"))
    val twoPass = toks.join(broadcast(mg), Seq("tok"))
      .groupBy($"tok", $"n_tot").agg(count(lit(1)).as("c"))
      .filter($"c" * 20L > $"n_tot")
      .select($"tok", $"c").as[(String, Long)].collect().toSet
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
      .filter($"c" * 20L > lit(2000L))
      .as[(String, Long)].collect().toSet
    assert(twoPass == exact && exact.nonEmpty)
  }

  test("misra_gries: serialization round-trip preserves counters and total") {
    val buf = new MgBuffer(4)
    Seq("a", "a", "b", "c", "a", "b").foreach(buf.add)
    val back = MgBuffer.fromBytes(4, buf.toBytes)
    assert(back.total == buf.total && back.keys.sorted == buf.keys.sorted)
  }

  test("misra_gries is valid STREAMING state: complete-mode sketch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = mem.toDF().toDF("tok")
      .agg(MisraGries($"tok", 8).as("m"))
      .select($"m.n".as("n"), $"m.keys".as("keys"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    // the hot key arrives spread over three micro-batches — the sketch
    // state must merge through the state store, not within one batch
    mem.addData(Seq.fill(50)("hot") ++ (1 to 60).map(i => s"a$i"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(50)("hot") ++ (1 to 60).map(i => s"b$i"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(50)("hot") ++ (1 to 60).map(i => s"c$i"): _*)
    q.processAllAvailable()
    q.stop()
    val (n, keys) = spark.table("mg_stream")
      .as[(Long, Seq[String])].collect().head
    spark.catalog.dropTempView("mg_stream")
    // n exact over all batches; freq(hot)=150 > 330/9 ⇒ must survive
    assert(n == 330L)
    assert(keys.contains("hot"))
    assert(keys.length <= 8)
  }

  test("misra_gries rejects non-string keys") {
    val e = intercept[Exception] {
      Seq(1L, 2L).toDF("k").agg(MisraGries($"k", 4)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
