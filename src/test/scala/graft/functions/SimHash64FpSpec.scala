package graft.functions

import java.security.MessageDigest

import graft.SparkSpec
import graft.dedup.Dedup

class SimHash64FpSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: split on single spaces keeping trailing
    * empties, vote per token = first 64 bits of md5 (MSB-first). */
  private def reference(text: String): String = {
    val votes = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    text.split(" ", -1).foreach { tok =>
      val digest = md.digest(tok.getBytes("UTF-8"))
      for (j <- 0 until 64) {
        val bit = (digest(j / 8) >> (7 - (j % 8))) & 1
        votes(j) += (if (bit == 1) 1 else -1)
      }
    }
    votes.map(v => if (v > 0) '1' else '0').mkString
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "completely different text with no overlap whatsoever here"),
    (4L, "short"),
    (5L, ""),
    (6L, "a  b"),
    (7L, "trailing space "),
    (8L, "ünïcödé tökens — multibyte")
  ).toDF("doc_id", "text")

  test("native simhash64 matches an independent reference implementation") {
    val native = Dedup.simhash64(docs, "doc_id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    val expect = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different text with no overlap whatsoever here"),
      (4L, "short"), (5L, ""), (6L, "a  b"), (7L, "trailing space "),
      (8L, "ünïcödé tökens — multibyte")
    ).map { case (id, t) => (id, reference(t)) }
    assert(native == expect)
    assert(native.forall(_._2.matches("[01]{64}")))
  }

  test("16-bit signature is the nibble-parity projection of the 64-bit one") {
    // sh16 bit j = parity (last bit) of md5 hex digit j = sh64 bit 4j —
    // the two expressions share vote arithmetic, so this must hold on
    // any corpus, including the gate one.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
    val s16 = Dedup.simhash(corpus, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    val s64 = Dedup.simhash64(corpus, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(s16.keySet == s64.keySet)
    s64.foreach { case (id, h64) =>
      val projected = (1 to 16).map(j => h64(4 * j - 1)).mkString
      assert(projected == s16(id), s"doc $id")
    }
  }

  test("band width rule: clamp(ceil(log2 n), 14, 64/(maxDist+1))") {
    assert(Dedup.simhash64BandWidth(500, 3) == 14)   // gate corpus → floor
    assert(Dedup.simhash64BandWidth(1, 3) == 14)
    assert(Dedup.simhash64BandWidth(1 << 14, 3) == 14)
    assert(Dedup.simhash64BandWidth((1 << 14) + 1, 3) == 15)
    assert(Dedup.simhash64BandWidth(1L << 40, 3) == 16)  // pigeonhole cap
    assert(Dedup.simhash64BandWidth(1L << 40, 0) == 40)  // d=0 → width log2 n
    assert(Dedup.simhash64BandWidth(1L << 40, 7) == 8)   // 8 chunks of 8
  }

  test("near-dup pairs finds identical and 1-token-off docs, not unrelated ones") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup of 1
      (3L, "totally unrelated content about weather pipelines and parquet files"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota lambda") // near dup of 1
    ).toDF("doc_id", "text")
    val sigs = Dedup.simhash64(corpus, "doc_id", "text")
    val pairs = Dedup.simhash64NearDupPairsFromSigs(sigs, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSeq.sorted
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
    assert(pairs.forall { case (a, b, _) => Set(a, b).subsetOf(Set(1L, 2L, 4L)) })
    // exact-Hamming verify: every reported distance matches the strings
    val sigMap = sigs.as[(Long, String)].collect().toMap
    pairs.foreach { case (a, b, h) =>
      val exact = sigMap(a).zip(sigMap(b)).count { case (x, y) => x != y }
      assert(exact == h, s"pair ($a,$b)")
    }
  }
}
