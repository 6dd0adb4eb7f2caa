package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusMonitorSpec extends SparkSpec {

  private val docs = "/root/testdata/sf0.001/documents.parquet"

  test("streamed quality drift equals the batch twin (unified semantics)") {
    val streamed = CorpusMonitor.runQualityDriftOnce(spark, docs)
      .orderBy(col("window_start_s"), col("lang")).collect().toSeq
    val batch = CorpusMonitor.qualityDrift(spark.read.parquet(docs))
      .orderBy(col("window_start_s"), col("lang")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("window algebra: start = (doc_id div 100)*100 and stats are exact sums") {
    val rows = CorpusMonitor.qualityDrift(spark.read.parquet(docs))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.forall(_._1 % 100 == 0), "window starts on the 100s grid")
    rows.foreach { case (_, lang, nDocs, nTok, nChars, permille) =>
      assert(nDocs >= 1 && nTok >= 1 && nChars >= 1, lang)
      assert(permille == 1000L * nChars / nTok, "final ratio is the integer div")
    }
    // every document lands in exactly one (window, lang) cell
    val total = spark.read.parquet(docs).count()
    assert(rows.map(_._3).sum == total)
  }
}
