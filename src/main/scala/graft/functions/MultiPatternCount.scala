package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring counting in ONE pass over the document —
  * the blocklist/phrase-filter kernel of a crawl pipeline. Per input
  * row, returns `array<bigint>` of ALL-occurrence counts aligned with
  * the compiled pattern list.
  *
  * Why a kernel: the portable formulation is P chained
  * `contains`/`replace` passes — P full scans of every document, and a
  * real blocklist is thousands of phrases. An Aho-Corasick automaton
  * (Aho & Corasick, CACM 1975) matches every pattern simultaneously in
  * one byte-level walk: O(len + matches) per document regardless of P.
  * The automaton compiles once per executor from the expression's
  * pattern literals (@transient lazy) and is shared across all rows a
  * task processes; matching runs byte-level, which is exact for UTF-8
  * (a multi-byte sequence never contains an ASCII byte, and pattern
  * bytes align only on codepoint boundaries).
  *
  * Counts are ALL (including self-overlapping) occurrences. For
  * patterns with no self-border — any phrase that does not start and
  * end with the same substring, which real blocklist phrases satisfy —
  * this equals the leftmost non-overlapping `replace`-count the SQL
  * oracle computes.
  *
  * Memory: per-node dense byte fan-out (256 ints) keeps the hot loop
  * branchless at ~1 KiB per trie node — right for phrase lists up to
  * ~10^5 nodes; beyond that a sparse-transition build is the variant
  * to reach for (same automaton, different node layout).
  */
case class MultiPatternCount(child: Expression, patterns: Seq[String])
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_pattern_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if patterns.nonEmpty && patterns.forall(_.nonEmpty) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a non-empty list of non-empty patterns")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${dt.catalogString}")
  }

  @transient private lazy val ac = AhoCorasick.compile(patterns)

  /** Called from both interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val counts = new Array[Long](patterns.length)
    ac.countsInto(text.getBytes, counts)
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ref = ctx.addReferenceObj("mpc", this, classOf[MultiPatternCount].getName)
      s"${ev.value} = $ref.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): MultiPatternCount =
    copy(child = newChild)
}

object MultiPatternCount {
  def apply(text: Column, patterns: Seq[String]): Column =
    bridge.column(MultiPatternCount(bridge.expression(text), patterns))
}

/** Byte-level Aho-Corasick automaton: trie + BFS failure links, with
  * each node's output list pre-merged through its failure chain so the
  * match loop never walks suffix links. */
final class AhoCorasick private (goto256: Array[Array[Int]],
                                 outputs: Array[Array[Int]]) extends Serializable {

  /** Adds each pattern's occurrence count to `counts` (aligned with the
    * compiled pattern order). */
  def countsInto(bytes: Array[Byte], counts: Array[Long]): Unit = {
    var state = 0
    var i = 0
    while (i < bytes.length) {
      state = goto256(state)(bytes(i) & 0xff)
      val out = outputs(state)
      var j = 0
      while (j < out.length) { counts(out(j)) += 1L; j += 1 }
      i += 1
    }
  }
}

object AhoCorasick {
  def compile(patterns: Seq[String]): AhoCorasick = {
    val goto = ArrayBuffer(Array.fill(256)(-1))
    val ends = ArrayBuffer(ArrayBuffer.empty[Int])
    patterns.zipWithIndex.foreach { case (p, id) =>
      var node = 0
      p.getBytes("UTF-8").foreach { b =>
        val c = b & 0xff
        if (goto(node)(c) == -1) {
          goto(node)(c) = goto.length
          goto += Array.fill(256)(-1)
          ends += ArrayBuffer.empty[Int]
        }
        node = goto(node)(c)
      }
      ends(node) += id
    }
    // BFS: failure links; goto completed in place (absent transition →
    // follow the failure state's transition) so matching is one array
    // read per byte; outputs merged through the failure chain
    val fail = new Array[Int](goto.length)
    val queue = new java.util.ArrayDeque[Int]()
    (0 until 256).foreach { c =>
      val nxt = goto(0)(c)
      if (nxt == -1) goto(0)(c) = 0
      else { fail(nxt) = 0; queue.add(nxt) }
    }
    while (!queue.isEmpty) {
      val u = queue.poll()
      ends(u) ++= ends(fail(u))
      (0 until 256).foreach { c =>
        val nxt = goto(u)(c)
        if (nxt == -1) goto(u)(c) = goto(fail(u))(c)
        else { fail(nxt) = goto(fail(u))(c); queue.add(nxt) }
      }
    }
    new AhoCorasick(goto.toArray, ends.map(_.toArray).toArray)
  }
}
