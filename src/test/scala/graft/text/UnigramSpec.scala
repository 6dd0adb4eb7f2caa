package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def ln(x: Double) = math.log(x)
  private def fp6(p: Double) = math.round(-ln(p) * 1e6)

  test("unigramTrain matches the hand-computed one-round example") {
    graft.Caches.release()
    val docs = Seq((1L, "ab ab cd"), (2L, "ab cd cd")).toDF("doc_id", "text")
    // words: ab×3, cd×3. Seed pieces (maxPieceLen=2): a,b,ab,c,d,cd each
    // count 3, total 18, cost = fp6(3/18) each. Viterbi: [ab] (1 piece)
    // beats [a,b] (2 pieces at equal piece cost) — usage ab=3, cd=3;
    // singles floor at 1. Round-1 vocab: {a,b,c,d}=1, {ab,cd}=3,
    // total 10.
    val out = Unigram.unigramTrain(docs, "doc_id", "text",
      maxPieceLen = 2, maxWordLen = 8, rounds = 1, minCount = 2,
      vocabSize = 10)
      .orderBy(col("n_used").desc, col("piece"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val cMulti = fp6(3.0 / 10)
    val cSingle = fp6(1.0 / 10)
    assert(out.toSeq == Seq(
      ("ab", 3L, cMulti), ("cd", 3L, cMulti),
      ("a", 1L, cSingle), ("b", 1L, cSingle),
      ("c", 1L, cSingle), ("d", 1L, cSingle)))
    graft.Caches.release()
  }

  test("unigramApply per-doc stats on the example corpus") {
    graft.Caches.release()
    val docs = Seq((1L, "ab ab cd"), (2L, "ab cd cd")).toDF("doc_id", "text")
    val out = Unigram.unigramApply(docs, "doc_id", "text",
      maxPieceLen = 2, maxWordLen = 8, rounds = 1, minCount = 2,
      vocabSize = 10)
      .orderBy(col("id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every word segments to one piece under the trained vocab
    assert(out.toSeq == Seq((1L, 3L, 3L, 1000L), (2L, 3L, 3L, 1000L)))
    graft.Caches.release()
  }

  test("viterbiSegments equals brute-force (min cost, then lex length list from end)") {
    graft.Caches.release()
    val rng = new scala.util.Random(7)
    val alphabet = "abc"
    val maxPieceLen = 3
    // random small vocab: all singles + random multis with random costs
    val multis = (1 to 12).map { _ =>
      val len = 2 + rng.nextInt(maxPieceLen - 1)
      (1 to len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }.distinct
    val vocab = (alphabet.map(_.toString) ++ multis).distinct
      .map(p => (p, 1L + rng.nextInt(20).toLong, 100000L + rng.nextInt(5000000).toLong))
    val vocabMap = vocab.map { case (p, _, c) => p -> c }.toMap
    val words = (1 to 25).map { _ =>
      val len = 1 + rng.nextInt(8)
      (1 to len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }.distinct.map(w => (w, 1L))

    def brute(w: String): Seq[String] = {
      // enumerate segmentations from the END so the length-list order
      // matches the backtrace's tie-break
      def go(pos: Int): Seq[(Long, List[Int], List[String])] =
        if (pos == 0) Seq((0L, Nil, Nil))
        else for {
          l <- (1 to math.min(maxPieceLen, pos)).toSeq
          piece = w.substring(pos - l, pos)
          c <- vocabMap.get(piece).toSeq
          (cost, ls, ps) <- go(pos - l)
        } yield (cost + c, l :: ls, piece :: ps)
      // `ls` is already in FROM-THE-END order (go prepends the length
      // of the piece ending at `pos`), which is exactly the greedy
      // backtrace's preference order — the sort key must NOT reverse it
      val minPath = go(w.length).minBy { case (c, ls, _) =>
        (c, ls.map(i => ('a' + i).toChar).mkString)
      }
      // ps is likewise built end→start (piece :: prefix-pieces with the
      // END piece at the head); present it start→end like the engine
      minPath._3.reverse
    }

    val wordsDf = words.toDF("w", "c_w")
    val vocabDf = vocab.toDF("piece", "n", "cost_fp6").select(col("piece"), col("cost_fp6"))
    val got = Unigram.viterbiSegments(wordsDf, vocabDf, maxPieceLen, 8)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    words.foreach { case (w, _) =>
      assert(got(w) == brute(w).toList, s"word $w")
    }
    graft.Caches.release()
  }
}
