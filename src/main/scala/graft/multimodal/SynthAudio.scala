package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic synthetic WAV payloads over the text corpus — the audio
  * sibling of [[SynthImages]]: puts the REAL byte-level [[AudioDecoder]]
  * under the oracle-verified registry. Every checked quantity is
  * closed-form over (doc_id, text):
  *
  *   sample_rate = 8000 + (doc_id % 3) · 4000
  *   n_samples   = 800 + doc_id % 400
  *   byte_len    = 44 + 2 · n_samples            (44-byte canonical header)
  *   sample i    = (text_byte(i mod len) − 128) · 256   (16-bit PCM, mono)
  *
  * so the decoded mean absolute amplitude is recomputable in plain SQL
  * from the text column (the corpus is ASCII, so byte = code point), with
  * no binary parsing on the oracle side.
  */
object SynthAudio {

  def rateOf(docId: Long): Int = (8000 + (docId % 3) * 4000).toInt
  def nSamplesOf(docId: Long): Int = (800 + docId % 400).toInt

  /** 16-bit PCM samples cycling the document's UTF-8 bytes, centered at
    * 128 and scaled to use the 16-bit range; blank docs fall back to a
    * coordinate pattern so every payload still decodes. */
  def samples(n: Int, text: Array[Byte]): Array[Short] = {
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val b = if (text.length > 0) text(i % text.length) & 0xff
              else (i * 31 + 7) % 256
      out(i) = ((b - 128) * 256).toShort
      i += 1
    }
    out
  }

  /** Canonical 44-byte-header RIFF/WAVE around mono 16-bit PCM samples. */
  def wav(rate: Int, pcm: Array[Short]): Array[Byte] = {
    val dataLen = pcm.length * 2
    val b = new Array[Byte](44 + dataLen)
    def tag(off: Int, s: String): Unit = {
      val a = s.getBytes("US-ASCII")
      System.arraycopy(a, 0, b, off, 4)
    }
    def le32(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1)            // PCM
    le16(22, 1)            // mono
    le32(24, rate)
    le32(28, rate * 2)     // byte rate
    le16(32, 2)            // block align
    le16(34, 16)           // bits per sample
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < pcm.length) {
      le16(44 + 2 * i, pcm(i) & 0xffff)
      i += 1
    }
    b
  }

  /** One synthetic WAV payload per document row — a narrow per-partition
    * transform (no shuffle), the same landing shape as [[SynthImages]]. */
  def packSynth(docs: DataFrame, idCol: String, textCol: String): Dataset[Multimodal.MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("text_bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, text) =>
          val pcm = samples(nSamplesOf(docId), text)
          Multimodal.MediaRow(docId, wav(rateOf(docId), pcm), "audio/wav")
        }
      }
  }
}
