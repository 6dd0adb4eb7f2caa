package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All `k` MinHash signature components of a shingle array in ONE pass —
  * a native codegen expression replacing the interpreted chain
  * `transform(md5) → transform(conv) ×2 → zip_with + array_min ×k`
  * (6k+3 array materializations per document).
  *
  * Semantics are bit-identical to the SQL/Column formulation the DuckDB
  * oracle mirrors: per shingle, h1 = first 15 hex digits of md5 (= the
  * top 60 bits of the big-endian digest), h2 = hex digits 17..31, and
  * sig_i = min over shingles of h1 + i·h2 (Kirsch-Mitzenmacher double
  * hashing; 60-bit halves keep h1 + k·h2 < 2^63 only for k ≤ 7 — max
  * h1 + 7·h2 = 8·(2^60−1) = 2^63−8 — so k = 8 is rejected). Empty array →
  * NULL (min over an empty set). Arrays with nullable elements are
  * rejected at type-check time: the builtin transform(md5) chain this is
  * bit-identical to propagates null per element, which a min-tracking
  * single pass cannot mirror.
  */
case class MinHashSigsFp(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) if k >= 1 && k <= 7 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, false) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName: k=$k out of range 1..7")
    case ArrayType(StringType, true) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires non-nullable array elements (null shingles have no md5)")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> with non-null elements, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSigsFp.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = MinHashSigsFp.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.compute($a, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  // compute() may return null (empty input array) → stay nullable
  override def nullable: Boolean = true

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsFp =
    copy(child = newChild)
}

object MinHashSigsFp {
  private val digestPool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** One pass over the shingle array; called from both interpreted eval
    * and generated code. */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digestPool.get()
    var idx = 0
    while (idx < n) {
      md.reset()
      val digest = md.digest(arr.getUTF8String(idx).getBytes)
      val bb = ByteBuffer.wrap(digest)
      val h1 = bb.getLong(0) >>> 4 // hex digits 1..15  (60 bits)
      val h2 = bb.getLong(8) >>> 4 // hex digits 17..31 (60 bits)
      var i = 1
      while (i <= k) {
        val v = h1 + i * h2
        if (v < mins(i - 1)) mins(i - 1) = v
        i += 1
      }
      idx += 1
    }
    new GenericArrayData(mins)
  }

  def apply(arr: Column, k: Int): Column =
    bridge.column(MinHashSigsFp(bridge.expression(arr), k))
}
