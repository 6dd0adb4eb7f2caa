package graft.multimodal

/** Real byte-level RIFF/WAVE PCM decoder (pure JVM — no audio libs in the
  * container, none needed for uncompressed WAV): validates the RIFF/WAVE
  * preamble, then walks the chunk list (skipping unknown chunks such as
  * LIST/INFO, honoring the odd-size pad byte) to find `fmt ` and `data`.
  * Supports PCM (format 1), 16-bit, mono — the synthesis contract; anything
  * else fails loudly rather than mis-decoding.
  *
  * Features returned are the audio analog of the image decoder's
  * (width, height, phash): sample rate, sample count, and integer mean
  * absolute amplitude (a loudness proxy that needs no floating point, so
  * it is exact and oracle-checkable).
  */
object AudioDecoder {

  final case class AudioMeta(sampleRate: Int, nSamples: Int, meanAbs: Long)

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** The shared chunk walk: validates the container and returns
    * (sampleRate, dataOffset, nSamples). Every decode path goes through
    * here so the validation semantics cannot drift between features. */
  private def locate(bytes: Array[Byte]): (Int, Int, Int) = {
    require(bytes.length >= 12, s"not a RIFF file: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF", "missing RIFF magic")
    require(tag(bytes, 8) == "WAVE", "missing WAVE form type")
    var off = 12
    var rate = -1
    var channels = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataOff < 0)) {
      val id = tag(bytes, off)
      val size = le32(bytes, off + 4)
      require(size >= 0 && off + 8 + size <= bytes.length,
        s"chunk '$id' overruns the file")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too short")
          val fmt = le16(bytes, off + 8)
          require(fmt == 1, s"unsupported (non-PCM) format code $fmt")
          channels = le16(bytes, off + 10)
          rate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
        case "data" =>
          dataOff = off + 8
          dataLen = size
        case _ => () // LIST, fact, cue, ... — skip
      }
      off += 8 + size + (size & 1) // chunks pad to even offsets
    }
    require(rate > 0, "no fmt chunk")
    require(dataOff >= 0, "no data chunk")
    require(channels == 1, s"unsupported channel count $channels")
    require(bits == 16, s"unsupported bit depth $bits")
    (rate, dataOff, dataLen / 2)
  }

  def decode(bytes: Array[Byte]): AudioMeta = {
    val (rate, dataOff, n) = locate(bytes)
    var sum = 0L
    var i = 0
    while (i < n) {
      val s = (le16(bytes, dataOff + 2 * i).toShort).toInt
      sum += math.abs(s.toLong)
      i += 1
    }
    AudioMeta(rate, n, if (n == 0) 0L else sum / n)
  }

  /** Per-frame ENERGY (exact integer sum of squared samples over
    * consecutive `frameLen`-sample frames, last frame ragged) — the
    * frame-level feature pass (VAD gating, silence trimming, loudness
    * normalization) that follows decode in a real audio pipeline.
    * Exact by construction: s² ≤ 2³⁰ and a frame sums ≤ frameLen of
    * them — no floating point anywhere. */
  def frameEnergies(bytes: Array[Byte], frameLen: Int): Array[Long] = {
    require(frameLen >= 1, s"frameLen=$frameLen must be >= 1")
    val (_, dataOff, n) = locate(bytes)
    val out = new Array[Long]((n + frameLen - 1) / frameLen)
    var i = 0
    while (i < n) {
      val s = (le16(bytes, dataOff + 2 * i).toShort).toLong
      out(i / frameLen) += s * s
      i += 1
    }
    out
  }
}
