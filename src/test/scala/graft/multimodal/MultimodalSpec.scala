package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import Multimodal._
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"),
    (2L, ""),                      // empty payload → 0 frames
    (3L, "x" * 200)
  ).toDF("doc_id", "text")

  test("packText produces binary payload rows with mime metadata") {
    val rows = packText(docs, "doc_id", "text").collect().sortBy(_.doc_id)
    assert(rows.forall(_.mime == "text/plain"))
    assert(new String(rows(0).bytes, "UTF-8") == "hello world")
  }

  test("extractFeatures runs the stub decode per partition and is deterministic") {
    val f1 = extractFeatures(packText(docs, "doc_id", "text")).collect().sortBy(_.doc_id)
    val f2 = extractFeatures(packText(docs.repartition(3), "doc_id", "text"))
      .collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq)
    assert(f1(0).byte_len == 11 && f1(0).width == 11 && f1(0).height == 11)
    assert(f1(2).byte_len == 200)
    assert(f1(0).phash.length == 16)
  }

  test("sampleFrames emits ceil(len/frame) fixed-size frames, none for empty payloads") {
    val fr = sampleFrames(packText(docs, "doc_id", "text"), 64)
      .collect().groupBy(_.doc_id)
    assert(!fr.contains(2L))
    assert(fr(1L).map(_.frame_len).toSeq == Seq(11))
    assert(fr(3L).sortBy(_.frame_idx).map(_.frame_len).toSeq == Seq(64, 64, 64, 8))
  }

  test("a custom decoder slots into the same plumbing") {
    val fixed = new MediaDecoder {
      def decode(bytes: Array[Byte]): (Int, Int, String) = (1, 2, "feedfacefeedface")
    }
    val f = extractFeatures(packText(docs, "doc_id", "text"), fixed).collect()
    assert(f.forall(r => r.width == 1 && r.height == 2 && r.phash == "feedfacefeedface"))
  }
}
