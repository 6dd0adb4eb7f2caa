package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** One-pass int8 scalar quantization of an `array<float>` vector as a
  * native expression: struct(codes array<int>, q_min double, q_max
  * double).
  *
  * The builtin formulation (`transform` whose lambda references
  * `array_min`/`array_max` of the SAME column) is correct but Catalyst
  * inlines the min/max subtrees into every element's lambda after
  * CollapseProject, so each of the d codes re-scans the d-element array —
  * O(d²) reads per vector where one pass suffices. This expression does
  * the min/max sweep and the code emission in two tight primitive loops.
  *
  * Bit-identity with the builtin formulation (spec-enforced):
  *   - min/max follow Spark's total ordering via Double.compare
  *     (−0.0 < 0.0; NaN greatest), not the IEEE `<` operator;
  *   - rounding is HALF-UP computed as floor + exact-fraction compare
  *     (v − floor(v) is exact for our magnitudes) — `Math.round`'s
  *     floor(x + 0.5) drifts on values a hair under .5 and Spark's
  *     BigDecimal(Double.toString) rounding agrees with the exact
  *     comparison for every non-negative double that is not an exact
  *     .5 tie (ties round up in both);
  *   - constant vectors (max = min) emit all-zero codes; empty arrays
  *     emit (empty, NULL, NULL) like array_min/array_max on empty input.
  */
case class QuantizeInt8Fp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QuantizeInt8Fp.OutType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_int8"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${dt.catalogString}")
  }

  override def nullSafeEval(a: Any): Any =
    QuantizeInt8Fp.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.QuantizeInt8Fp.quantize($a);")

  override protected def withNewChildInternal(newChild: Expression): QuantizeInt8Fp =
    copy(child = newChild)
}

object QuantizeInt8Fp {

  private[functions] val OutType: StructType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = true), nullable = false),
    StructField("q_min", DoubleType, nullable = true),
    StructField("q_max", DoubleType, nullable = true)))

  /** Row kernel — also the codegen target (one static call per row keeps
    * the surrounding operator in whole-stage codegen with no interpreted
    * lambda per element). Null-element semantics mirror the builtin
    * exactly: array_min/array_max SKIP nulls; a null element's code is
    * null — except in the constant-vector branch, whose `when(mx = mn, 0)`
    * does not look at the element, so every slot gets 0 there. */
  def quantize(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var mn = 0.0
    var mx = 0.0
    var found = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = arr.getFloat(i).toDouble
        if (!found) { mn = v; mx = v; found = true }
        else {
          if (java.lang.Double.compare(v, mn) < 0) mn = v
          if (java.lang.Double.compare(v, mx) > 0) mx = v
        }
      }
      i += 1
    }
    val codes = new Array[Any](n)
    if (found && mx == mn) {
      i = 0
      while (i < n) { codes(i) = 0; i += 1 }
    } else if (found) {
      i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          // (v - mn) * 255.0 / (mx - mn) in the builtin's exact op order —
          // no hoisted reciprocal, so every double matches the Column form
          val x = (arr.getFloat(i).toDouble - mn) * 255.0 / (mx - mn)
          val f = math.floor(x)
          codes(i) = (if (x - f >= 0.5) f + 1.0 else f).toInt
        }
        i += 1
      }
    } // !found: every element is null (or the array is empty) → null codes
    new GenericInternalRow(Array[Any](new GenericArrayData(codes),
      if (found) Double.box(mn) else null, if (found) Double.box(mx) else null))
  }

  def apply(vec: Column): Column =
    bridge.column(QuantizeInt8Fp(bridge.expression(vec)))
}
