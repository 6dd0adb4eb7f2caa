package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support for a training-data pipeline: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction / frame-sampling run as per-partition batch
  * transforms.
  *
  * Two decoder implementations ship behind the seam:
  *   - [[ImageDecoder]] — a REAL pure-JVM byte-level decode of BMP
  *     (24-bit) and PPM P6 payloads with a genuine 8×8 average
  *     perceptual hash; use it for actual image corpora.
  *   - [[StubDecoder]] — a deterministic fake keyed on the payload
  *     bytes, used by the oracle-verified demo query over text
  *     payloads (the container ships no compressed-codec libraries,
  *     and text/plain is not an image).
  * Everything around the seam — the media schema, the typed Dataset
  * plumbing, the mapPartitions batch shape with one decoder instance per
  * partition (decoder init is the expensive part in real pipelines), the
  * frame explosion — is identical for both; swapping decoders changes no
  * plan shape.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, bytes: Array[Byte], mime: String)
  case class MediaFeatures(doc_id: Long, byte_len: Int, width: Int,
                           height: Int, phash: String)
  case class Frame(doc_id: Long, frame_idx: Int, frame_len: Int)

  /** The decode seam. A production implementation wraps an actual codec;
    * it is instantiated once per PARTITION, never per row. */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): (Int, Int, String) // (width, height, phash)
  }

  /** STUB: deterministic fake decode — dimensions derived from payload
    * length, "perceptual hash" from the md5 of the bytes. Stands in for
    * the image library this container does not ship. */
  object StubDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val hex = md.map("%02x".format(_)).mkString.substring(0, 16)
      (bytes.length % 640, bytes.length % 480, hex)
    }
  }

  /** Wrap a text corpus as media rows — the plumbing demo used by the
    * verified query (UTF-8 payload, text/plain mime). Real corpora land
    * with image payloads in exactly this shape. */
  def packText(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("bytes"),
      lit("text/plain").as("mime")).as[MediaRow]
  }

  /** Batch feature extraction: one decoder per partition, tight loop over
    * the partition's rows — the shape a vectorized/native decoder needs.
    * No shuffle: features are narrow per-row derivations. */
  def extractFeatures(media: Dataset[MediaRow],
                      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val d = decoder // single instance per partition
      rows.map { r =>
        val (w, h, p) = d.decode(r.bytes)
        MediaFeatures(r.doc_id, r.bytes.length, w, h, p)
      }
    }
  }

  case class AudioFeatures(doc_id: Long, byte_len: Int, sample_rate: Int,
                           n_samples: Int, duration_ms: Int, mean_abs: Long)

  /** Batch audio feature extraction through the REAL [[AudioDecoder]] —
    * the same one-decoder-per-partition, no-shuffle shape as
    * [[extractFeatures]]. duration_ms is integer floor (exact, so the
    * oracle can mirror it). */
  def extractAudioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val m = AudioDecoder.decode(r.bytes)
        AudioFeatures(r.doc_id, r.bytes.length, m.sampleRate, m.nSamples,
          ((m.nSamples.toLong * 1000L) / m.sampleRate).toInt, m.meanAbs)
      }
    }
  }

  case class AudioFrameFeatures(doc_id: Long, n_frames: Int, peak_frame: Int,
                                peak_energy: Long, total_energy: Long)

  /** Frame-level audio features through the REAL decoder: per-doc frame
    * count, the peak-energy frame (exact integer Σs², ties → lowest
    * frame index) and the total energy — the VAD/silence-trim/loudness
    * readout that follows decode in a real audio pipeline. Same
    * mapPartitions batch shape as every decoder pass: narrow, one
    * decoder walk per row, parallelizes with the scan. */
  def extractAudioFrames(media: Dataset[MediaRow],
                         frameLen: Int): Dataset[AudioFrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val e = AudioDecoder.frameEnergies(r.bytes, frameLen)
        var peak = 0
        var total = 0L
        var i = 0
        while (i < e.length) {
          total += e(i)
          if (e(i) > e(peak)) peak = i // strict > keeps the LOWEST index on ties
          i += 1
        }
        AudioFrameFeatures(r.doc_id, e.length, if (e.isEmpty) -1 else peak,
          if (e.isEmpty) 0L else e(peak), total)
      }
    }
  }

  /** Deterministic frame sampling for video-ish payloads: fixed-size
    * frames with ceil(len/frameBytes) frames per doc, exploded via
    * flatMap — a narrow transform, so frame extraction parallelizes with
    * the scan and never shuffles. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.bytes.length
      val n = (len + frameBytes - 1) / frameBytes
      (0 until n).map { i =>
        Frame(r.doc_id, i, math.min(frameBytes, len - i * frameBytes))
      }
    }
  }
}
