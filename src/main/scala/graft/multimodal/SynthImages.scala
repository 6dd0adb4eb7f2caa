package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic synthetic image payloads over a text corpus — the
  * fixture generator that puts the REAL byte-level [[ImageDecoder]] under
  * the oracle-verified registry (the container ships no compressed image
  * corpora, so the verified query synthesizes uncompressed ones from the
  * corpus itself). Even doc_ids become 24-bit BMPs (padded bottom-up
  * rows), odd doc_ids become PPM P6 — both real formats the decoder
  * parses byte-for-byte.
  *
  * Every quantity the oracle checks is closed-form over (doc_id):
  *   width  = 8 + doc_id % 25
  *   height = 8 + doc_id % 17
  *   BMP byte_len = 54 + ((3·width + 3) / 4) · 4 · height
  *   PPM byte_len = 9 + digits(width) + digits(height) + 3·width·height
  * Pixels cycle through the document's UTF-8 text bytes (offset per
  * channel), so the decoded phash is content-derived; phash golden values
  * are pinned by spec (an average-hash is not expressible in oracle SQL).
  */
object SynthImages {

  def widthOf(docId: Long): Int = (8 + docId % 25).toInt
  def heightOf(docId: Long): Int = (8 + docId % 17).toInt

  /** Row-major RGB pixels from the text bytes: channel c of pixel i is
    * text byte (3·i + c) mod len; blank docs fall back to a coordinate
    * pattern so every image still decodes. */
  def pixels(w: Int, h: Int, text: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](w * h * 3)
    var i = 0
    while (i < out.length) {
      out(i) = if (text.length > 0) text(i % text.length) else ((i * 31 + 7) % 256).toByte
      i += 1
    }
    out
  }

  /** Minimal 24-bit uncompressed BMP (54-byte header, bottom-up rows
    * padded to 4 bytes) around row-major RGB pixels. */
  def bmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val b = new Array[Byte](size)
    def le32(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    le32(2, size); le32(10, 54)          // file size, pixel-data offset
    le32(14, 40); le32(18, w); le32(22, h) // BITMAPINFOHEADER, positive = bottom-up
    b(26) = 1                             // planes
    b(28) = 24                            // bits per pixel
    le32(34, stride * h)                  // image size
    var y = 0
    while (y < h) {
      val srcRow = h - 1 - y              // bottom-up storage
      var x = 0
      while (x < w) {
        val s = (srcRow * w + x) * 3
        val d = 54 + y * stride + x * 3
        b(d) = rgb(s + 2); b(d + 1) = rgb(s + 1); b(d + 2) = rgb(s) // BGR
        x += 1
      }
      y += 1
    }
    b
  }

  /** PPM P6 ("P6\nW H\n255\n" + raw RGB). */
  def ppm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val b = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, b, 0, header.length)
    System.arraycopy(rgb, 0, b, header.length, rgb.length)
    b
  }

  /** Grouped fixture: every doc in a run of `groupDiv` consecutive
    * doc_ids carries the SAME image content — dimensions and pixels
    * derive from g = doc_id div groupDiv (pixels g-seeded, text-free) —
    * while the container format still alternates per doc (even → BMP,
    * odd → PPM). Identical pixels through two DIFFERENT byte formats
    * must reach the same perceptual hash, which is exactly what the
    * hash-equality dedup row verifies. */
  def packSynthGrouped(docs: DataFrame, idCol: String,
                       groupDiv: Long): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id")).as[Long]
      .mapPartitions { rows =>
        rows.map { docId =>
          val g = docId / groupDiv
          val w = widthOf(g); val h = heightOf(g)
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < rgb.length) {
            rgb(i) = (((i * 31L + 7L) * (2L * g + 1L)) % 256L).toByte
            i += 1
          }
          if (docId % 2 == 0) Multimodal.MediaRow(docId, bmp(w, h, rgb), "image/bmp")
          else Multimodal.MediaRow(docId, ppm(w, h, rgb), "image/x-portable-pixmap")
        }
      }
  }

  /** One synthetic image payload per document row — a narrow
    * per-partition transform (no shuffle), mirroring how a real corpus
    * lands: binary payload + mime sidecar. */
  def packSynth(docs: DataFrame, idCol: String, textCol: String): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("text_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, text) =>
          val w = widthOf(docId); val h = heightOf(docId)
          val rgb = pixels(w, h, text)
          if (docId % 2 == 0)
            Multimodal.MediaRow(docId, bmp(w, h, rgb), "image/bmp")
          else
            Multimodal.MediaRow(docId, ppm(w, h, rgb), "image/x-portable-pixmap")
        }
      }
  }
}
