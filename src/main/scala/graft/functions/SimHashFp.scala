package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 16-bit SimHash of a document in ONE in-row pass — a native codegen
  * expression replacing the explode → md5 → 16-conditional-sum group-by
  * formulation (`Dedup.simhashBuiltins`), which shuffles the corpus's
  * whole TOKEN table just to re-group rows that started out co-located in
  * their document. Semantics are bit-identical to that formulation (the
  * one the DuckDB oracle mirrors): tokens = split on single spaces with
  * trailing empties kept, vote for bit j is the parity of the j-th hex
  * digit of md5(token), bit j of the result is '1' iff the vote sum is
  * positive. Output is the same portable 16-char '0'/'1' string. NULL
  * text → NULL (the builtin drops such docs at the explode; callers
  * filter).
  *
  * At scale this turns the signature build from scan + full-token-table
  * shuffle into a pure narrow map — the signature table materializes at
  * scan speed.
  */
case class SimHashFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashFp.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val cls = SimHashFp.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}

object SimHashFp {
  private val digestPool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** One pass over the document bytes; called from both interpreted eval
    * and generated code. Splitting on the raw 0x20 byte is exact for
    * UTF-8 (the space byte never occurs inside a multi-byte sequence),
    * and md5 over the token's UTF-8 bytes is exactly Spark's
    * `md5(split(text, " ")[i])`. Keeping limit = -1 semantics means
    * consecutive/trailing spaces yield empty tokens whose md5("")
    * digits vote too — same as the builtin chain.
    */
  def compute(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val votes = new Array[Int](16)
    val md = digestPool.get()
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val digest = md.digest()
        // first 16 hex digits = first 8 digest bytes, high nibble first;
        // vote +1 when the nibble is odd, -1 otherwise
        var j = 0
        while (j < 8) {
          val b = digest(j)
          votes(2 * j) += (if (((b >> 4) & 1) == 1) 1 else -1)
          votes(2 * j + 1) += (if ((b & 1) == 1) 1 else -1)
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Byte](16)
    var k = 0
    while (k < 16) {
      out(k) = if (votes(k) > 0) '1' else '0'
      k += 1
    }
    UTF8String.fromBytes(out)
  }

  def apply(text: Column): Column =
    bridge.column(SimHashFp(bridge.expression(text)))
}
