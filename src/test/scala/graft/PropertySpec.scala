package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.dedup.Dedup
import graft.ops.Relational

/** Randomized properties for the hand-written kernels, each checked
  * against an obviously-correct reference formulation (builtin Spark
  * expressions or plain Scala). Targeted adversarial cases live in the
  * per-module specs; these sweep the input space.
  */
class PropertySpec extends SparkSpec {

  /** Run a ScalaCheck property inside a funsuite test (the scalatestplus
    * bridge is not on the classpath; scalacheck itself is). */
  private def checkProp(min: Int)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(min).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }
  import spark.implicits._

  private val MIN = 25

  private val word = Gen.oneOf("the", "a", "fox", "dog", "über", "", "x y", "42")
  private val doc = Gen.listOf(word).map(_.mkString(" "))

  test("SimHashFp equals the builtin formulation on random docs") {
    checkProp(MIN)(Prop.forAll(Gen.listOfN(20, doc)) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val native = Dedup.simhash(df, "doc_id", "text")
        .orderBy("id").as[(Long, String)].collect().toSeq
      val builtin = Dedup.simhashBuiltins(df, "doc_id", "text")
        .orderBy("id").as[(Long, String)].collect().toSeq
      native == builtin
    })
  }

  test("ShingleArray equals the builtin formulation on random docs") {
    checkProp(MIN)(Prop.forAll(Gen.listOfN(15, doc), Gen.choose(1, 4)) { (docs, n) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val native = df.select(Dedup.shingleArray($"text", n)).as[Seq[String]].collect().toSeq
      val builtin = df.select(Dedup.shingleArrayBuiltins($"text", n)).as[Seq[String]].collect().toSeq
      native == builtin
    })
  }

  test("SortedIntersectCount equals size(array_intersect) on random sorted-distinct arrays") {
    // the kernel's contract is sorted-distinct in STRING (UTF8) order —
    // sort after stringifying, exactly like ShingleArray's output
    val arr = Gen.listOf(Gen.choose(-50L, 50L)).map(_.map(_.toString).distinct.sorted)
    checkProp(MIN)(Prop.forAll(arr, arr) { (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
        .select(col("a").cast("array<string>").as("a"), col("b").cast("array<string>").as("b"))
      val native = df.select(graft.functions.SortedIntersectCount($"a", $"b"))
        .as[Long].collect().head
      native == a.toSet.intersect(b.toSet).size
    })
  }

  test("sessionize matches a straightforward per-key scan on random event sets") {
    val eventsGen = Gen.listOf(for {
      k <- Gen.choose(0L, 3L)
      ts <- Gen.choose(0L, 300L)
    } yield (k, ts)).map(_.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) })
    checkProp(MIN)(Prop.forAll(eventsGen, Gen.choose(1L, 60L)) { (events, gap) =>
      val df = events.toDF("event_id", "k", "ts")
      val got = Relational.sessionize(df, "k", "ts", gap, $"event_id")
        .select($"event_id", $"session_idx").as[(Long, Long)].collect().toMap
      // reference: sort each key's events by (ts, event_id), walk once
      val expect = events.groupBy(_._2).flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e._3, e._1))
        var idx = -1L; var prev = Long.MinValue
        sorted.map { case (id, _, ts) =>
          if (prev == Long.MinValue || ts - prev > gap) idx += 1
          prev = ts
          id -> idx
        }
      }.toMap
      got == expect
    })
  }

  test("AudioDecoder round-trips arbitrary PCM through SynthAudio.wav exactly") {
    val pcmGen = Gen.listOf(Gen.chooseNum(Short.MinValue, Short.MaxValue))
    val rateGen = Gen.chooseNum(1, 192000)
    checkProp(MIN)(Prop.forAll(pcmGen, rateGen) { (pcm, rate) =>
      val arr = pcm.map(_.toShort).toArray
      val m = graft.multimodal.AudioDecoder.decode(
        graft.multimodal.SynthAudio.wav(rate, arr))
      val expMean =
        if (arr.isEmpty) 0L
        else arr.map(s => math.abs(s.toLong)).sum / arr.length
      m.sampleRate == rate && m.nSamples == arr.length && m.meanAbs == expMean
    })
  }

  test("AudioDecoder never mis-decodes corrupted payloads (throws or truthful)") {
    // Flip one byte anywhere in a valid WAV: the decoder must either
    // reject loudly or still report a meta consistent with SOME parse —
    // never crash with an unexpected error type.
    val pcm = Array[Short](5, -5, 100, -100, 32767, -32768)
    val base = graft.multimodal.SynthAudio.wav(8000, pcm)
    val idxGen = Gen.chooseNum(0, base.length - 1)
    val byteGen = Gen.chooseNum(Byte.MinValue.toInt, Byte.MaxValue.toInt)
    checkProp(50)(Prop.forAll(idxGen, byteGen) { (i, b) =>
      val mut = base.clone(); mut(i) = b.toByte
      try { graft.multimodal.AudioDecoder.decode(mut); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    })
  }

  test("pqTopK with one codebook entry per vector equals exact L2 ranking") {
    // k = n: every vector IS a codebook entry, so quantization is lossless
    // and the ADC distance equals the exact squared-L2 distance.
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-1.0f, 1.0f))
    checkProp(10)(Prop.forAll(Gen.listOfN(6, vecGen), Gen.chooseNum(0, 5)) { (vs, qi) =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val got = graft.similarity.Vectors
        .pqTopK(df, "vec_id", "embedding", queryId = qi.toLong, m = 2, k = 6, topK = 6)
        .as[(Long, Long)].collect().toSeq
      def fp(x: Float): Long = BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val exact = vs.zipWithIndex.map { case (v, i) =>
        val d = v.zip(vs(qi)).map { case (a, b) =>
          val diff = fp(a) - fp(b); diff * diff }.sum
        (i.toLong, d)
      }.sortBy { case (i, d) => (d, i) }
      got == exact
    })
  }

  test("CappedCollect: overflow iff group exceeds cap, under any partitioning") {
    checkProp(MIN)(Prop.forAll(Gen.choose(0, 30), Gen.choose(1, 12), Gen.choose(1, 6)) { (n, cap, parts) =>
      n == 0 || {
        val df = (1 to n).map(i => (1L, i.toLong, i.toLong, i)).toDF("g", "id", "n_sh", "pos")
        val out = df.repartition(parts)
          .groupBy($"g")
          .agg(graft.functions.CappedCollect($"id", $"n_sh", $"pos", cap).as("cc"))
          .select($"cc.overflow", size($"cc.xs")).as[(Boolean, Int)].collect().head
        if (n > cap) out == ((true, 0)) else out == ((false, n))
      }
    })
  }

  test("topNgramFrac (sort+fold) equals the brute-force max multiplicity on random docs") {
    checkProp(MIN)(Prop.forAll(Gen.listOfN(12, doc), Gen.choose(1, 3)) { (docs, n) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = df.select(graft.text.TextOps.topNgramFrac($"text", n))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
      val expected = docs.map { t =>
        val toks = t.split(" ", -1).toSeq
        val grams = (0 to toks.length - n).map(i => toks.slice(i, i + n))
        if (grams.isEmpty) None
        else Some(grams.groupBy(identity).values.map(_.size).max.toDouble / grams.size)
      }
      got == expected
    })
  }

  test("dupNgramSpans equals a brute-force interval-union reference on random corpora") {
    // tiny vocabulary forces heavy cross- and within-doc gram collisions
    val tinyWord = Gen.oneOf("a", "b", "c")
    val tinyDoc = Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, tinyWord)).map(_.mkString(" "))
    checkProp(MIN)(Prop.forAll(Gen.listOfN(6, tinyDoc), Gen.choose(1, 3)) { (docs, k) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.dupNgramSpans(df, "doc_id", "text", k)
        .orderBy("id").as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
      // reference: count every k-gram across the corpus, mark positions
      // whose gram occurs >1 times, merge covered intervals per doc
      val toks = docs.map(_.split(" ", -1).toSeq)
      val gramCount = scala.collection.mutable.Map.empty[Seq[String], Int]
      for (ts <- toks; i <- 0 to ts.length - k)
        gramCount.updateWith(ts.slice(i, i + k))(c => Some(c.getOrElse(0) + 1))
      val expected = toks.zipWithIndex.flatMap { case (ts, id) =>
        val ps = (0 to ts.length - k).filter(i => gramCount(ts.slice(i, i + k)) > 1)
        if (ps.isEmpty) None else {
          val covered = ps.flatMap(p => p until p + k).toSet.size.toLong
          val spans = ps.zip(-1L +: ps.map(_.toLong).dropRight(1))
            .count { case (p, prv) => prv < 0 || p - prv > k }
          Some((id.toLong, ps.size.toLong, spans.toLong, covered,
            ts.length.toLong, covered.toDouble / ts.length))
        }
      }
      got == expected
    })
  }

  test("cdcChunks: lossless reassembly and dense chunk ids on random docs") {
    checkProp(MIN)(Prop.forAll(Gen.listOfN(8, doc), Gen.oneOf(2, 4, 16)) { (docs, m) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val ch = Dedup.cdcChunks(df, "doc_id", "text", m)
        .select($"doc_id", $"chunk_id", $"chunk_text", $"n_tok")
        .as[(Long, Long, String, Int)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      docs.zipWithIndex.forall { case (t, i) =>
        val cs = ch.getOrElse(i.toLong, Array.empty[(Long, Long, String, Int)])
        // every non-null doc reassembles exactly; ids are 0..n-1 dense;
        // token counts are consistent and positive
        cs.map(_._3).mkString(" ") == t &&
          cs.map(_._2).toSeq == cs.indices.map(_.toLong) &&
          cs.forall(c => c._4 >= 1 && c._3.split(" ", -1).length == c._4)
      }
    })
  }

  test("charEntropyFp9: bounds 0 <= H <= ln(n), extremes only at uniform/distinct") {
    val chars = Gen.oneOf("aaaa", "abcd", "aabb", "zzzy", "m", "mn", "q w e q")
    checkProp(MIN)(Prop.forAll(Gen.listOfN(6, chars)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.text.TextOps.charEntropyFp9(df, "doc_id", "text")
        .select($"doc_id", $"n_chars", $"n_uniq", $"h_fp9")
        .as[(Long, Int, Int, Long)].collect()
      out.forall { case (id, n, u, h) =>
        val lnN = math.round(math.log(n.toDouble) * 1e9)
        // h in [0, ln n] (up to div truncation); 0 iff single distinct char
        h >= 0 && h <= lnN && ((u == 1) == (h == 0L)) && u >= 1 && u <= n
      }
    })
  }

  test("charEntropyFp9: stats are order-free and the checksum separates histograms") {
    val chars = Gen.oneOf("aabbcc", "abcdef", "zzzzzz", "m n m n", "qqqwe")
    checkProp(MIN)(Prop.forAll(Gen.listOfN(4, chars), Gen.choose(1L, 1e9.toLong)) {
      (texts, seed) =>
        // permute each doc's characters deterministically from the seed:
        // every column of the gated contract must be invariant (entropy
        // and the histogram are order-free by definition)
        val rnd = new scala.util.Random(seed)
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val perm = docs.map { case (i, t) => (i, rnd.shuffle(t.toList).mkString) }
        def run(rows: Seq[(Long, String)]) =
          graft.text.TextOps.charEntropyFp9(
              rows.toDF("doc_id", "text"), "doc_id", "text")
            .orderBy($"doc_id")
            .as[(Long, Int, Int, Long, Long)].collect().toSeq
        val (a, b) = (run(docs), run(perm))
        // different histograms must get different checksums (md5-backed;
        // a collision here would be a 2^-31-class accident); the sorted
        // char string IS the canonical histogram key
        val nHist = texts.map(_.toSeq.sorted.mkString).distinct.size
        a == b && a.map(_._4).distinct.size == nHist
    })
  }

  test("qDedupEval full-outer counters equal the naive three-aggregate form") {
    // the r10 single-pass rewrite must be COUNT-identical to the three
    // independent aggregates it replaced, on corpora with real dups
    val base = Gen.oneOf("spark table scan", "fast join row", "slow query plan")
    checkProp(10)(Prop.forAll(Gen.listOfN(12, base), Gen.choose(0, 5)) {
      (texts, nDup) =>
        val docs = (texts ++ texts.take(nDup)).zipWithIndex
          .map { case (t, i) => (i.toLong, t + " tail" + (i % 3)) }
          .toDF("doc_id", "text")
        val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.7)
          .select($"id_a", $"id_b")
        val cand = Dedup.minhashCandidatePairs(docs, "doc_id", "text", 3, 6, 2)
          .distinct()
        val nTruth = truth.count()
        val nCand = cand.count()
        val nTp = cand.join(truth, Seq("id_a", "id_b"), "left_semi").count()
        val fused = cand.select($"id_a", $"id_b", lit(1L).as("c"))
          .join(truth.withColumn("t", lit(1L)), Seq("id_a", "id_b"), "full_outer")
          .agg(count($"t").as("nt"), count($"c").as("nc"),
            count(when($"t".isNotNull && $"c".isNotNull, lit(1))).as("ntp"))
          .as[(Long, Long, Long)].collect().head
        fused == ((nTruth, nCand, nTp))
    })
  }

  test("MisraGries survival guarantee under random streams and partitionings") {
    val key = Gen.frequency(5 -> Gen.const("hot"), 2 -> Gen.const("warm"),
      3 -> Gen.alphaLowerStr.map(s => "t" + s.take(4)))
    checkProp(MIN)(Prop.forAll(Gen.listOfN(300, key), Gen.choose(1, 6), Gen.choose(4, 12)) {
      (keys, parts, k) =>
        val (n, cands) = keys.toDF("tok").repartition(parts)
          .agg(graft.functions.MisraGries($"tok", k).as("m"))
          .select($"m.n", $"m.keys").as[(Long, Seq[String])].collect().head
        val freq = keys.groupBy(identity).view.mapValues(_.size).toMap
        val mustSurvive = freq.filter { case (_, c) => c.toLong * (k + 1) > n }.keySet
        n == keys.size.toLong && cands.size <= k &&
          mustSurvive.subsetOf(cands.toSet)
    })
  }

  test("dsirWeights is partitioning-invariant and equals a plain-Scala reference") {
    import java.security.MessageDigest
    def feat(bg: String): Long = {
      val h = MessageDigest.getInstance("MD5").digest(bg.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(h, 16) % 64
    }
    val token = Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff")
    val docGen = Gen.listOfN(6, token).map(_.mkString(" "))
    checkProp(MIN)(Prop.forAll(Gen.listOfN(12, docGen), Gen.choose(1, 5)) {
      (texts, parts) =>
        val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, i % 3 == 0) }
        val df = rows.toDF("doc_id", "text", "is_t").repartition(parts)
        val got = graft.corpus.Mixing
          .dsirWeights(df, "doc_id", "text", $"is_t", 64, 4)
          .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toList
        Caches.release()
        // plain-Scala reference of the whole estimator
        val docFeats = rows.map { case (id, t, tgt) =>
          val tk = t.split(" ", -1)
          (id, tgt, tk.sliding(2).filter(_.length == 2)
            .map(p => feat(p.mkString(" "))).toList)
        }.filter(_._3.nonEmpty)
        val cr = docFeats.flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
        val ct = docFeats.filter(_._2).flatMap(_._3).groupBy(identity).view.mapValues(_.size.toLong).toMap
        val (totR, totT) = (cr.values.sum, ct.values.sum)
        def w(f: Long): Long =
          (BigInt(ct.getOrElse(f, 0L) + 1) * 1000000000L / (totT + 64)).toLong -
            (BigInt(cr.getOrElse(f, 0L) + 1) * 1000000000L / (totR + 64)).toLong
        val scored = docFeats.map { case (id, _, fs) =>
          (id, fs.size.toLong, fs.map(w).sum)
        }
        val sel = scored.sortBy(r => (-r._3, r._1)).take(4).map(_._1).toSet
        val want = scored.map { case (id, n, s) => (id, n, s, sel(id)) }.sortBy(_._1)
        got == want
    })
  }

  test("spanCorruptionPlan equals a plain-Scala interval-union reference") {
    import java.security.MessageDigest
    def h(s: String): Long = {
      val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(d, 16)
    }
    val token = Gen.oneOf("u", "v", "w")
    val docGen = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, token)).map(_.mkString(" "))
    checkProp(MIN)(Prop.forAll(Gen.listOfN(8, docGen), Gen.choose(1, 4)) {
      (texts, parts) =>
        val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        val got = graft.text.TextOps
          .spanCorruptionPlan(rows.toDF("doc_id", "text").repartition(parts),
            "doc_id", "text", startMod = 3, maxLen = 4)
          .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
        val want = rows.map { case (id, t) =>
          val n = t.split(" ", -1).length.toLong
          val spans = (1L to n).filter(p => h(s"$id:$p") % 3 == 0)
            .map { p =>
              val len = 1L + h(s"$id:$p:len") % 4
              (p, math.min(p + len - 1, n))
            }
          // interval union over (start, end) pairs
          var merged = List.empty[(Long, Long)]
          spans.sortBy(x => (x._1, x._2)).foreach { case (s0, e0) =>
            merged match {
              case (ms, me) :: rest if s0 <= me =>
                merged = (ms, math.max(me, e0)) :: rest
              case _ => merged = (s0, e0) :: merged
            }
          }
          val masked = merged.map { case (s0, e0) => e0 - s0 + 1 }.sum
          (id, n, spans.length.toLong, merged.length.toLong, masked,
            1000L * masked / n)
        }.sortBy(_._1).toList
        got == want
    })
  }

  test("lmBuckets: bucket assignment is a pure function of the score multiset per lang") {
    val token = Gen.oneOf("t1", "t2", "t3", "t4")
    val docGen = Gen.listOfN(4, token).map(_.mkString(" "))
    val langGen = Gen.oneOf("en", "de")
    checkProp(MIN)(Prop.forAll(
      Gen.listOfN(10, Gen.zip(docGen, langGen)), Gen.choose(1, 5)) {
      (rows0, parts) =>
        val rows = rows0.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }
        val df = rows.toDF("doc_id", "text", "lang").repartition(parts)
        val got = graft.text.Search.lmBuckets(df, "doc_id", "text", "lang")
          .as[(Long, String, Long, String)].collect().sortBy(_._1).toList
        Caches.release()
        // reference: per-lang k-th-highest value boundaries over the
        // engine-reported scores (score algebra itself is covered by the
        // q_unigram_score oracle; this sweeps the BUCKETING contract)
        val byLang = got.groupBy(_._2)
        val want = got.map { case (id, lang, score, _) =>
          val scores = byLang(lang).map(_._3).sortBy(-_)
          val n = scores.length
          val b1 = scores((n + 2) / 3 - 1)
          val b2 = scores((2 * n + 2) / 3 - 1)
          val bucket = if (score >= b1) "head"
            else if (score >= b2) "middle" else "tail"
          (id, lang, score, bucket)
        }
        got == want
    })
  }
}
