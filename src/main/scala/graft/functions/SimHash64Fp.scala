package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash — the PRODUCTION signature width (Manku, Jain &
  * Sarma, "Detecting Near-Duplicates for Web Crawling", WWW'07 use
  * 64-bit simhash at multi-billion-page scale; the r12 knobs audit
  * named this form the deploy rule and [[SimHashFp]]'s 16-bit form the
  * oracle-teaching shape — this class closes that gap in code).
  *
  * Same one-in-row-pass structure as [[SimHashFp]]: tokens = split on
  * the raw 0x20 byte with trailing empties kept, and the vote vector of
  * a token is the FIRST 64 BITS of md5(token), MSB first — bit j of the
  * result is '1' iff Σ_tokens (bit_j(md5) ? +1 : −1) is positive. The
  * 16-bit form's per-hex-digit PARITY vote is exactly the last bit of
  * each nibble; here every bit of the first 16 nibbles votes, so the
  * signature space is 2^64 and the Hamming radius carries ~4× more
  * resolution per unit distance. Output is a portable 64-char '0'/'1'
  * string (callers derive hi/lo longs for XOR/popcount Hamming — a
  * 64-bit value with the sign bit set does not survive a decimal
  * round-trip, two 32-bit halves always do).
  *
  * NULL text → NULL (matches the explode-formulation dropping
  * null-text docs; callers filter).
  */
case class SimHash64Fp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64Fp.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = SimHash64Fp.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Fp =
    copy(child = newChild)
}

object SimHash64Fp {
  private val digestPool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** One pass over the document bytes; called from both interpreted eval
    * and generated code. Bit j (0-based, MSB-first) of token vote = bit
    * (7 − j%8) of digest byte j/8 — i.e. the md5 hex string read left to
    * right, each nibble high-bit first, which is what the SQL oracle
    * reproduces from `md5()`'s hex output. */
  def compute(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val votes = new Array[Int](64)
    val md = digestPool.get()
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val digest = md.digest()
        var j = 0
        while (j < 8) {
          val b = digest(j)
          var k = 0
          while (k < 8) {
            votes(8 * j + k) += (if (((b >> (7 - k)) & 1) == 1) 1 else -1)
            k += 1
          }
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var k = 0
    while (k < 64) {
      out(k) = if (votes(k) > 0) '1' else '0'
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  def apply(text: Column): Column =
    bridge.column(SimHash64Fp(bridge.expression(text)))
}
