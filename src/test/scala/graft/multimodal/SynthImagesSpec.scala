package graft.multimodal

import graft.SparkSpec

class SynthImagesSpec extends SparkSpec {
  import spark.implicits._

  test("BMP and PPM containers of the same pixels decode to identical features") {
    val w = 19; val h = 11 // non-multiple-of-4 row → exercises BMP padding
    val rgb = SynthImages.pixels(w, h, "the quick brown fox".getBytes("UTF-8"))
    val (wb, hb, pb) = ImageDecoder.decode(SynthImages.bmp(w, h, rgb))
    val (wp, hp, pp) = ImageDecoder.decode(SynthImages.ppm(w, h, rgb))
    assert((wb, hb) == (w, h) && (wp, hp) == (w, h))
    assert(pb == pp) // container must not affect the perceptual hash
    // and the decode round-trips the exact pixels we packed
    val (_, _, back) = ImageDecoder.decodeRgb(SynthImages.bmp(w, h, rgb))
    assert(back.toSeq == rgb.toSeq)
  }

  test("constant-content doc → all-zero average hash (every cell equals the mean)") {
    val w = SynthImages.widthOf(2L); val h = SynthImages.heightOf(2L)
    val rgb = SynthImages.pixels(w, h, "aaaaaaaa".getBytes("UTF-8"))
    val (_, _, phash) = ImageDecoder.decode(SynthImages.bmp(w, h, rgb))
    assert(phash == "0000000000000000")
  }

  test("packSynth + extractFeatures(ImageDecoder): dims and byte_len match the closed form") {
    val docs = Seq(
      (0L, "even doc becomes a bmp"),
      (1L, "odd doc becomes a ppm"),
      (2L, ""),                        // blank text still decodes
      (37L, "wider than tall and odd") // 2-digit dims in the ppm header
    ).toDF("doc_id", "text")
    val feats = Multimodal.extractFeatures(
      SynthImages.packSynth(docs, "doc_id", "text"), ImageDecoder)
      .collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(0L, 1L, 2L, 37L)) {
      val w = SynthImages.widthOf(id); val h = SynthImages.heightOf(id)
      val expectedLen =
        if (id % 2 == 0) 54 + ((3 * w + 3) / 4) * 4 * h
        else 9 + w.toString.length + h.toString.length + 3 * w * h
      assert(feats(id).width == w, s"doc $id width")
      assert(feats(id).height == h, s"doc $id height")
      assert(feats(id).byte_len == expectedLen, s"doc $id byte_len")
      assert(feats(id).phash.matches("[0-9a-f]{16}"), s"doc $id phash format")
    }
  }

  test("features are deterministic across evaluations") {
    val docs = Seq((7L, "determinism check payload")).toDF("doc_id", "text")
    def run() = Multimodal.extractFeatures(
      SynthImages.packSynth(docs, "doc_id", "text"), ImageDecoder).collect().head
    assert(run() == run())
  }
}
