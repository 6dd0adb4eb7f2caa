package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct word n-gram shingles of a document in ONE codegen
  * pass — replaces the interpreted chain `split → when/sequence →
  * transform(concat_ws(slice)) → array_distinct → sort_array` that
  * dominates the near-dup pipelines' narrow stage.
  *
  * Bit-identical to the builtin formulation (and therefore to the DuckDB
  * oracle): whitespace split on a single space KEEPING empty tokens
  * (Java split semantics with -1 limit), n-grams joined with a single
  * space, distinct by exact bytes, sorted in UTF8 binary order (what
  * `sort_array` / DuckDB's default VARCHAR collation use — NOT Java
  * String UTF-16 order). Docs with < n tokens yield an EMPTY array.
  */
case class ShingleArray(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_array"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(s"$prettyName: n=$n must be >= 1")
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleArray.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = ShingleArray.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.compute($a, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}

object ShingleArray {
  def compute(text: UTF8String, n: Int): GenericArrayData = {
    // split(" ", -1): single-space separator, trailing empties kept —
    // identical to Spark's split(text, " ") builtin
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val set = new java.util.TreeSet[UTF8String]() // UTF8String orders by bytes
    val sb = new java.lang.StringBuilder()
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    var idx = 0
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out)
  }

  def apply(text: Column, n: Int): Column =
    bridge.column(ShingleArray(bridge.expression(text), n))
}
