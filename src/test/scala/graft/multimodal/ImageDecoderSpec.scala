package graft.multimodal

import graft.SparkSpec

class ImageDecoderSpec extends SparkSpec {
  import Multimodal._
  import spark.implicits._

  /** 24-bit uncompressed BMP, bottom-up, rows padded to 4 bytes.
    * `px(x, y)` returns (r, g, b) with y = 0 the TOP row. */
  private def makeBmp(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val dataOff = 54
    val size = dataOff + stride * h
    val b = new Array[Byte](size)
    def le32(off: Int, v: Int): Unit = (0 until 4).foreach(i => b(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    b(0) = 'B'; b(1) = 'M'
    le32(2, size); le32(10, dataOff)
    le32(14, 40)                    // BITMAPINFOHEADER
    le32(18, w); le32(22, h)        // positive height → bottom-up
    b(26) = 1                       // planes
    b(28) = 24                      // bpp
    le32(30, 0)                     // BI_RGB (uncompressed)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, bl) = px(x, y)
      val p = dataOff + (h - 1 - y) * stride + x * 3  // bottom-up, BGR
      b(p) = bl.toByte; b(p + 1) = g.toByte; b(p + 2) = r.toByte
    }
    b
  }

  /** PPM P6 with a header comment, 1-byte samples, y = 0 the top row. */
  private def makePpm(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val header = s"P6\n# test image\n$w $h\n255\n".getBytes("US-ASCII")
    val data = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val p = (y * w + x) * 3
      data(p) = r.toByte; data(p + 1) = g.toByte; data(p + 2) = b.toByte
    }
    header ++ data
  }

  // left half black, right half white — aHash must set exactly the
  // right-half bits of every row: 0x0f per row byte
  private def halfAndHalf(x: Int, y: Int): (Int, Int, Int) =
    if (x < 8) (0, 0, 0) else (255, 255, 255)

  test("BMP: parses header dims and computes the block-average phash") {
    val (w, h, phash) = ImageDecoder.decode(makeBmp(16, 16, halfAndHalf))
    assert(w == 16 && h == 16)
    assert(phash == "0f0f0f0f0f0f0f0f")
  }

  test("PPM P6: same image bytes-for-bytes different container, same phash") {
    val (w, h, phash) = ImageDecoder.decode(makePpm(16, 16, halfAndHalf))
    assert(w == 16 && h == 16)
    assert(phash == "0f0f0f0f0f0f0f0f")
  }

  test("BMP row padding: odd widths decode the same pixels as PPM") {
    def grad(x: Int, y: Int): (Int, Int, Int) = { val v = (x * 17 + y * 31) % 256; (v, v, v) }
    // width 5 → stride 16 with 1 pad byte; both containers must agree
    val bmp = ImageDecoder.decode(makeBmp(5, 9, grad))
    val ppm = ImageDecoder.decode(makePpm(5, 9, grad))
    assert(bmp == ppm)
    assert(bmp._1 == 5 && bmp._2 == 9)
  }

  test("flat images hash to all-zero bits (no cell exceeds the mean)") {
    val (_, _, phash) = ImageDecoder.decode(makeBmp(8, 8, (_, _) => (80, 80, 80)))
    assert(phash == "0000000000000000")
  }

  test("tiny images (smaller than the 8x8 grid) still decode deterministically") {
    val a = ImageDecoder.decode(makePpm(3, 2, halfAndHalf))
    val b = ImageDecoder.decode(makePpm(3, 2, halfAndHalf))
    assert(a == b && a._1 == 3 && a._2 == 2)
  }

  test("non-image payloads are rejected, truncated images are rejected") {
    intercept[IllegalArgumentException](ImageDecoder.decode("not an image".getBytes))
    intercept[IllegalArgumentException](
      ImageDecoder.decode(makeBmp(16, 16, halfAndHalf).take(40)))
  }

  test("ImageDecoder slots into the extractFeatures mapPartitions path") {
    val rows = Seq(
      MediaRow(1L, makeBmp(16, 16, halfAndHalf), "image/bmp"),
      MediaRow(2L, makePpm(16, 16, halfAndHalf), "image/x-portable-pixmap")
    ).toDS()
    val feats = extractFeatures(rows, ImageDecoder).collect().sortBy(_.doc_id)
    assert(feats.length == 2)
    assert(feats.forall(f => f.width == 16 && f.height == 16 && f.phash == "0f0f0f0f0f0f0f0f"))
  }
}
