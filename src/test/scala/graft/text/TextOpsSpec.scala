package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount counts whitespace-separated tokens (empty string → 1 empty token)") {
    val out = Seq("a b c", "one", "", "a  b").toDF("text")
      .select(TextOps.tokenCount($"text").as("n")).as[Int].collect()
    // "a  b" splits to [a, "", b] — faithful to split semantics
    assert(out.toSeq == Seq(3, 1, 1, 3))
  }

  test("chunks emits overlapping fixed-size token windows in order") {
    val df = Seq("a b c d e f g h i j").toDF("text") // 10 tokens
    val out = df.select(posexplode(TextOps.chunks($"text", size = 4, overlap = 2)))
      .select($"pos", $"col.chunk_text", $"col.n_tok")
      .as[(Int, String, Int)].collect().toSeq
    // stride 2 → starts 1,3,5,7,9; tail chunks shrink
    assert(out == Seq(
      (0, "a b c d", 4), (1, "c d e f", 4), (2, "e f g h", 4),
      (3, "g h i j", 4), (4, "i j", 2)))
  }

  test("chunks of a short or empty doc yield exactly one chunk") {
    val out = Seq("x y", "").toDF("text")
      .select(size(TextOps.chunks($"text", size = 64, overlap = 16)).as("n"))
      .as[Int].collect().toSeq
    assert(out == Seq(1, 1))
  }

  test("vocabHits counts only tokens present in the vocab") {
    val out = Seq("the cat of the hat").toDF("text")
      .select(TextOps.vocabHits($"text", Seq("the", "of")).as("n")).as[Int].collect()
    assert(out.head == 3)
  }

  test("punctRatio is punctuation chars over total chars, 0 for empty") {
    val out = Seq("ab..", "").toDF("text")
      .select(TextOps.punctRatio($"text").as("r")).as[Double].collect()
    assert(out(0) == 0.5)
    assert(out(1) == 0.0)
  }

  test("langId picks the language with most stopword hits, 'und' when none") {
    val out = Seq("the cat is in the hat", "der hund ist nicht da", "xyzzy qwerty")
      .toDF("text").select(TextOps.langId($"text").as("l")).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("fingerprint is whitespace/case insensitive") {
    val fps = Seq("Hello  World", "hello world", "different").toDF("text")
      .select(TextOps.fingerprint($"text").as("fp")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("qualityScore stays in [0,1]") {
    val texts = Seq("", "a.b.c...", ("the word " * 50).trim, "no stop words here at all")
    val out = texts.toDF("text")
      .select(TextOps.qualityScore($"text", TextOps.Stopwords.toMap.apply("en")).as("q"))
      .as[Double].collect()
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("normalizeText: control chars to spaces, lowercase, collapsed runs, trimmed") {
    val rows = Seq(
      "  Hello\tWORLD  ",
      "a\u0000b",          // NUL becomes a space
      "multi   space\r\n runs",
      ""
    ).toDF("text")
    val out = rows.select(TextOps.normalizeText($"text").as("t")).as[String].collect().toSeq
    assert(out == Seq("hello world", "a b", "multi space runs", ""))
  }

  test("piiCounts/redactPii: emails, phones, IPv4 found and replaced; near-misses left alone") {
    val rows = Seq(
      "mail a.b+c@sub.ex.com and x@y.io now",       // two emails
      "call +1-555-867-5309 or +44-207-946-0958",   // two phones
      "host 10.0.3.250 gw 192.168.1.1",             // two IPs
      "not pii: a@b (no tld), 1-555-867-5309 (no +), 1.2.3 (three octets), v1.2.3.4beta",
      ""
    ).toDF("text")
    val (ne, np, ni) = TextOps.piiCounts($"text")
    val out = rows.select(ne, np, ni, TextOps.redactPii($"text"))
      .as[(Int, Int, Int, String)].collect().toSeq
    assert(out(0) == ((2, 0, 0, "mail <EMAIL> and <EMAIL> now")))
    assert(out(1) == ((0, 2, 0, "call <PHONE> or <PHONE>")))
    assert(out(2) == ((0, 0, 2, "host <IP> gw <IP>")))
    // v1.2.3.4beta: \b holds between 'v' and '1' (letter|digit are both word
    // chars — no boundary), so the version string is NOT an IP hit.
    assert(out(3) == ((0, 0, 0,
      "not pii: a@b (no tld), 1-555-867-5309 (no +), 1.2.3 (three octets), v1.2.3.4beta")))
    assert(out(4) == ((0, 0, 0, "")))
  }

  test("gopherReason fires the FIRST failing rule; clean docs keep (NULL)") {
    val stop = Seq("the", "a")
    val rows = Seq(
      "tiny doc",                                               // too_short
      ("w " * 1200).trim,                                       // too_long (and repetitive — length wins)
      "the " + (1 to 19).map(i => s".,!?;: t$i").mkString(" "), // punct_soup
      "the quick " + ("go go " * 15).trim,                      // repetition (top bigram)
      (1 to 25).map(i => s"u$i").mkString(" "),                 // no_stopwords
      "the " + (1 to 24).map(i => s"ok$i").mkString(" ")        // keep
    ).toDF("text")
    val out = rows.select(
      TextOps.gopherReason($"text", stop, minTok = 10, maxTok = 1000,
        maxPunct = 0.2, maxTop2 = 0.3).as("r")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    assert(out.toSeq == Seq("too_short", "too_long", "punct_soup",
      "repetition", "no_stopwords", null))
  }

  test("vocabGrowth: closed-form curve, empty checkpoints zero-filled, final row = whole corpus") {
    // ids 0..3, 2 checkpoints → bounds 2 and 4
    val docs = Seq(
      (0L, "a b a"), (1L, "b c"), (2L, "c d d"), (3L, "e")
    ).toDF("doc_id", "text")
    val out = TextOps.vocabGrowth(docs, "doc_id", "text", nCheckpoints = 2)
      .orderBy($"cp_idx")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 2L, 5L, 3L),   // docs 0,1: 5 tokens, vocab {a,b,c}
      (2L, 4L, 4L, 9L, 5L)))  // whole corpus: vocab {a,b,c,d,e}
    // sparse ids: first checkpoint covers no docs → zero-filled row
    val sparse = Seq((8L, "x y"), (9L, "y z")).toDF("doc_id", "text")
    val out2 = TextOps.vocabGrowth(sparse, "doc_id", "text", nCheckpoints = 2)
      .orderBy($"cp_idx")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out2 == Seq((1L, 5L, 0L, 0L, 0L), (2L, 10L, 2L, 4L, 3L)))
    // growth is monotone in every cumulative column
    Seq(out, out2).foreach { rows =>
      rows.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._3 <= b._3 && a._4 <= b._4 && a._5 <= b._5)
        case _ =>
      }
    }
  }

  test("charEntropyFp9: closed-form values, empty docs dropped, matches exploded histogram") {
    def lnFp9(x: Long): Long = math.round(math.log(x.toDouble) * 1e9)
    // driver-side mirror of the portable checksum: md5-60-bit-prefix mod 2^31
    def h31(c: Char): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(c.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 2147483648L
    }
    def histFp(t: String): Long =
      t.groupBy(identity).map { case (c, run) => run.length * h31(c) }.sum
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, ""), (4L, "abcd"),
      (5L, "mississippi river basin")).toDF("doc_id", "text")
    val out = TextOps.charEntropyFp9(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Int, Int, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 4L, 5L)) // empty doc 3 dropped
    // uniform "aaaa": H = 0 exactly
    assert(out(0) == ((1L, 4, 1, histFp("aaaa"), 0L)))
    // "abab": H = ln(4) − (2·lnfp(2)·2) div 4 nano-nats
    assert(out(1) == ((2L, 4, 2, histFp("abab"),
      lnFp9(4L) - (4L * lnFp9(2L)) / 4L)))
    // "abcd": max entropy ln(4) (each count 1, ln(1)=0)
    assert(out(2) == ((4L, 4, 4, histFp("abcd"), lnFp9(4L))))
    // general doc: checksum + entropy equal the exploded-histogram form
    assert(out(3)._4 == histFp("mississippi river basin"))
    val hist = docs.filter(length($"text") > 0)
      .select($"doc_id", explode(split($"text", "")).as("c"))
      .groupBy($"doc_id", $"c").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id").agg(sum($"cnt").as("n"),
        sum($"cnt" * round(log($"cnt".cast("double")) * 1e9).cast("long")).as("s"))
      .select($"doc_id",
        (round(log($"n".cast("double")) * 1e9).cast("long") - expr("s div n")).as("h"))
      .as[(Long, Long)].collect().toMap
    out.foreach { case (id, _, _, _, h) => assert(hist(id) == h, s"doc $id") }
  }

  test("filterFunnel charges each doc to the FIRST dropping stage") {
    // one doc per stage outcome; n_chars = text length as in the corpus
    val docs = Seq(
      ("a b c", "en"),                   // survives all five stages
      ("a", "en"),                       // stage 1: too few tokens
      ("aaaaaaaaaaaaaaaaaaaaa b", "en"), // stage 2: too many chars
      ("aaaaaaaa bb", "en"),             // stage 3: cpt 5500 out of band
      ("a b", "fr"),                     // stage 4: lang not allowed
      ("a xx", "en"))                    // stage 5: blocklisted term
      .map { case (t, l) => (t, t.length.toLong, l) }
      .toDF("text", "n_chars", "lang")
    val out = TextOps.filterFunnel(docs, "text", "n_chars", "lang",
        minTokens = 2, maxChars = 20, cptLo = 1000, cptHi = 3000,
        allowedLangs = Seq("en", "de"), blockTerm = "xx")
      .as[(Int, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1, "min_tokens", 6L, 5L, 1L, 833L),
      (2, "max_chars", 5L, 4L, 1L, 666L),
      (3, "chars_per_token", 4L, 3L, 1L, 500L),
      (4, "lang_allowed", 3L, 2L, 1L, 333L),
      (5, "blocklist", 2L, 1L, 1L, 166L)))
    // conservation: next stage's docs_in is this stage's docs_kept
    out.sliding(2).foreach { case Seq(a, b) => assert(b._3 == a._4) }
  }

  test("scriptMix counts overlapping and empty classes exactly") {
    val docs = Seq(
      ("abc de", "en"),   // 5 letters, 2 vowels, 1 space
      ("aeiou", "en"),    // 5 letters, 5 vowels, 0 spaces
      ("xyz 9", "fr"))    // 3 letters, 0 vowels, 1 space, 1 digit
      .toDF("text", "lang")
    val out = TextOps.scriptMix(docs, "text", "lang", Seq(
        "letters" -> "[a-z]", "vowels" -> "[aeiou]",
        "digits" -> "[0-9]", "spaces" -> " "))
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("en", "digits", 2L, 11L, 0L, 0L),
      ("en", "letters", 2L, 11L, 10L, 909L),
      ("en", "spaces", 2L, 11L, 1L, 90L),
      ("en", "vowels", 2L, 11L, 7L, 636L),
      ("fr", "digits", 1L, 5L, 1L, 200L),
      ("fr", "letters", 1L, 5L, 3L, 600L),
      ("fr", "spaces", 1L, 5L, 1L, 200L),
      ("fr", "vowels", 1L, 5L, 0L, 0L)))
    // per-language totals are identical across that language's classes
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(r => (r._3, r._4)).distinct.size == 1)
    }
  }

  // Doc 1: 4 words ("ccccccc." is 8 chars → longword), 2 terminator
  // runs; doc 2: 3 words, NO terminators → the max(1, runs) rule makes
  // it one sentence. Totals W=7 S=3 LW=1 →
  // lix_x100 = 700 div 3 + 10000 div 7 = 233 + 1428 = 1661.
  test("lixReport: exact counts, one-sentence fallback, words-free group is NULL") {
    val docs = Seq(("aa bb ccccccc. dd!", "s1"), ("x y z", "s1"), ("", "s2"))
      .toDF("text", "source")
    val out = TextOps.lixReport(docs, "text", "source").orderBy($"source")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      ("s1", 2L, 7L, 3L, 1L, Some(1661L)),
      ("s2", 1L, 0L, 1L, 0L, None)))
  }

  // "of" delimits doc 1 into [deep learning] and [deep graphs]; doc 2
  // is the 1-word phrase [deep]. deep: freq 3, degree 2+2+1=5 → 1666‰;
  // learning/graphs: freq 1, degree 2 → 2000‰. The \b fence must not
  // let the stopword "is" split "this".
  test("rakeWordScores: phrase delimiting, degree/freq permille, \\b stopword fence") {
    val docs = Seq("deep learning of deep graphs!", "deep").toDF("text")
    val out = TextOps.rakeWordScores(docs, "text",
        TextOps.Stopwords.toMap.apply("en"))
      .orderBy($"score_permille".desc, $"word")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("graphs", 1L, 2L, 2000L),
      ("learning", 1L, 2L, 2000L),
      ("deep", 3L, 5L, 1666L)))
    val fence = TextOps.rakeWordScores(Seq("this is fine").toDF("text"),
        "text", TextOps.Stopwords.toMap.apply("en"))
      .orderBy($"word").as[(String, Long, Long, Long)].collect().toSeq
    assert(fence == Seq(("fine", 1L, 1L, 1000L), ("this", 1L, 1L, 1000L)))
  }

  // Canonical mod-10 vectors: 79927398713 is the textbook Luhn example,
  // 4111111111111111 the classic valid test PAN; a last-digit bump and
  // an adjacent transposition (the two error classes Luhn exists to
  // catch) must both fail.
  test("luhnValid: textbook vectors, last-digit bump, transposition") {
    val out = Seq("79927398713", "4111111111111111", "4111111111111112",
        "79927398714", "79927398731", null)
      .toDF("num").select(TextOps.luhnValid($"num").as("ok"))
      .as[Option[Boolean]].collect().toSeq
    assert(out == Seq(Some(true), Some(true), Some(false),
      Some(false), Some(false), None))
  }

  test("filterFunnel: a doc violating several rules is counted once") {
    // violates min_tokens AND blocklist — must be charged to stage 1 only
    val docs = Seq(("xx", 2L, "fr"), ("a b", 3L, "en"))
      .toDF("text", "n_chars", "lang")
    val out = TextOps.filterFunnel(docs, "text", "n_chars", "lang",
        minTokens = 2, maxChars = 20, cptLo = 500, cptHi = 3000,
        allowedLangs = Seq("en"), blockTerm = "xx")
      .as[(Int, String, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(r => (r._1, r._5)) ==
      Seq((1, 1L), (2, 0L), (3, 0L), (4, 0L), (5, 0L)))
    assert(out.last._4 == 1L, "the clean doc survives to the end")
  }
}
