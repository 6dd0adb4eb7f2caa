package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class AudioDecoderSpec extends AnyFunSuite {

  test("round-trips a synthesized WAV: rate, count, exact integer mean |amp|") {
    val pcm = Array[Short](0, 256, -256, 512, -1024, 32767, -32768, 0)
    val m = AudioDecoder.decode(SynthAudio.wav(12000, pcm))
    assert(m.sampleRate == 12000)
    assert(m.nSamples == 8)
    // (0+256+256+512+1024+32767+32768+0) / 8 = 67583 / 8 = 8447
    assert(m.meanAbs == 8447L)
  }

  test("frameEnergies: exact per-frame sums of squares, ragged last frame") {
    val pcm = Array[Short](1, -2, 3, 0, 10)       // frames of 2: [1,-2] [3,0] [10]
    val e = AudioDecoder.frameEnergies(SynthAudio.wav(8000, pcm), frameLen = 2)
    assert(e.toSeq == Seq(5L, 9L, 100L))          // 1+4, 9+0, 100
    val whole = AudioDecoder.frameEnergies(SynthAudio.wav(8000, pcm), frameLen = 5)
    assert(whole.toSeq == Seq(114L))
    assert(AudioDecoder
      .frameEnergies(SynthAudio.wav(8000, Array.empty[Short]), 4).isEmpty)
  }

  test("empty data chunk decodes to zero samples, zero loudness") {
    val m = AudioDecoder.decode(SynthAudio.wav(8000, Array.empty[Short]))
    assert(m.nSamples == 0 && m.meanAbs == 0L)
  }

  test("chunk walk skips unknown chunks (odd-size pad byte honored)") {
    val base = SynthAudio.wav(16000, Array[Short](100, -100))
    // splice a 3-byte LIST chunk (odd size => 1 pad byte) between fmt and data
    val insertAt = 36 // start of the data chunk in the canonical layout
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = new Array[Byte](base.length + extra.length)
    System.arraycopy(base, 0, spliced, 0, insertAt)
    System.arraycopy(extra, 0, spliced, insertAt, extra.length)
    System.arraycopy(base, insertAt, spliced, insertAt + extra.length, base.length - insertAt)
    // fix the RIFF size field (bytes 4..7, little-endian)
    val riffSize = spliced.length - 8
    spliced(4) = riffSize.toByte; spliced(5) = (riffSize >> 8).toByte
    spliced(6) = (riffSize >> 16).toByte; spliced(7) = (riffSize >> 24).toByte
    val m = AudioDecoder.decode(spliced)
    assert(m.sampleRate == 16000 && m.nSamples == 2 && m.meanAbs == 100L)
  }

  test("rejects non-WAV payloads and truncated chunks loudly") {
    intercept[IllegalArgumentException](AudioDecoder.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      AudioDecoder.decode("RIFFxxxxJUNK".getBytes("US-ASCII")))
    val ok = SynthAudio.wav(8000, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](AudioDecoder.decode(ok.take(48))) // data chunk overruns
  }

  test("synthesis formulas match the oracle contract") {
    assert(SynthAudio.rateOf(0) == 8000 && SynthAudio.rateOf(1) == 12000 &&
      SynthAudio.rateOf(2) == 16000 && SynthAudio.rateOf(3) == 8000)
    assert(SynthAudio.nSamplesOf(5) == 805 && SynthAudio.nSamplesOf(400) == 800)
    val s = SynthAudio.samples(4, "ab".getBytes("UTF-8"))
    // 'a' = 97 -> (97-128)*256 = -7936; 'b' = 98 -> -7680; cycle
    assert(s.toSeq == Seq[Short](-7936, -7680, -7936, -7680))
    assert(SynthAudio.wav(8000, s).length == 44 + 8)
  }
}
