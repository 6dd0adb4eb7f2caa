package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultiPatternCountSpec extends SparkSpec {
  import spark.implicits._

  private val pats = Seq("scan", "scan query", "he", "she", "hers")

  test("counts every occurrence of every pattern, including nested matches") {
    // "ushers" contains he, she, hers — the classic AC output-link case;
    // "scan query" must also count its embedded "scan"
    val df = Seq(
      (1L, "ushers"),
      (2L, "scan query scan"),
      (3L, "no hits here at all"), // "he" hits inside "here"!
      (4L, "")
    ).toDF("id", "t")
    val out = df.select($"id", MultiPatternCount($"t", pats).as("c"))
      .orderBy($"id").as[(Long, Seq[Long])].collect().toSeq
    assert(out(0) == ((1L, Seq(0L, 0L, 1L, 1L, 1L))))
    assert(out(1) == ((2L, Seq(2L, 1L, 0L, 0L, 0L))))
    assert(out(2) == ((3L, Seq(0L, 0L, 1L, 0L, 0L)))) // "here" embeds "he"
    assert(out(3) == ((4L, Seq(0L, 0L, 0L, 0L, 0L))))
  }

  test("matches the per-pattern naive count on random word-salad text") {
    val vocab = Seq("scan", "query", "fast", "sort", "merge", "the")
    val rnd = new scala.util.Random(7)
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(30)(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val ps = Seq("scan query", "fast sort", "the merge", "sort")
    def naive(t: String, p: String): Long = {
      var n = 0L; var i = t.indexOf(p)
      while (i >= 0) { n += 1; i = t.indexOf(p, i + 1) } // all occurrences
      n
    }
    val got = docs.toDF("id", "t")
      .select($"id", MultiPatternCount($"t", ps).as("c"))
      .as[(Long, Seq[Long])].collect().toMap
    docs.foreach { case (i, t) =>
      assert(got(i) == ps.map(naive(t, _)), s"doc $i")
    }
  }

  test("null text yields null; empty pattern list is rejected at analysis") {
    val out = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(MultiPatternCount($"t", pats).as("c")).collect()
    assert(out.head.isNullAt(0))
    val e = intercept[Exception] {
      Seq((1L, "x")).toDF("id", "t")
        .select(MultiPatternCount($"t", Seq.empty).as("c")).collect()
    }
    assert(e.getMessage != null)
  }

  test("interpreted eval equals the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val expr = MultiPatternCount(Literal("she sells seashells, hers"), pats)
    val interp = expr.eval(null).asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    // the Column path above runs through whole-stage codegen; spot-check
    // the same string through the DataFrame route
    val viaDf = Seq(1).toDF("x")
      .select(MultiPatternCount(lit("she sells seashells, hers"), pats).as("c"))
      .as[Seq[Long]].collect().head
    assert(interp == viaDf)
  }
}
