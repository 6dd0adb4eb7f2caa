package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** `array<float>` → `array<bigint>` ×10⁶ fixed-point conversion as a
  * native expression — the entry gate of every ANN/near-dup pipeline
  * (both sides of every bucket self-join convert before the integer
  * kernels take over). The Column formulation
  * `transform(v, x => round(x.cast("double") * 1e6).cast("long"))` is
  * a higher-order function, so its lambda runs INTERPRETED per element
  * (d evaluator round trips per vector, per join side); this kernel is
  * one static call that keeps the scan in whole-stage codegen.
  *
  * Bit-identity with the builtin (spec-enforced on random vectors):
  * Spark's `round` is BigDecimal HALF_UP — half away from zero — which
  * the kernel computes as the exact floor + fraction compare on |x|
  * with the sign re-applied (exact for these magnitudes; ties round
  * away from zero in both). Null elements stay null, like `transform`.
  */
case class FixedPointFp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "fixed_point"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    FixedPointFp.fix(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FixedPointFp.fix($a);")

  override protected def withNewChildInternal(newChild: Expression): FixedPointFp =
    copy(child = newChild)
}

object FixedPointFp {

  /** Row kernel — also the codegen target. */
  def fix(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = arr.getFloat(i).toDouble * 1000000.0
        val ax = math.abs(x)
        val f = math.floor(ax)
        val r = if (ax - f >= 0.5) f + 1.0 else f
        out(i) = (if (x < 0) -r else r).toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(vec: Column): Column =
    bridge.column(FixedPointFp(bridge.expression(vec)))
}
