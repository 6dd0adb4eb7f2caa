package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** ELEMENTWISE SUM aggregate over `array<bigint>` — the vector-accumulator
  * every centroid-style update needs (k-means means, PQ codebook means,
  * elementwise count/histogram merges).
  *
  * Why not `posexplode` + `sum` grouped by (key, pos): that shape pushes
  * d× the rows through the partial aggregate's hash map (one row per
  * vector ELEMENT) and shuffles a d×-larger group space. This aggregate
  * keeps each vector IN ROW — the partial phase adds d longs into one
  * buffer per group with no per-element hashing, and the exchange moves
  * exactly one d-length array per (group, map task). Exact integer
  * addition is commutative and associative, so the result is
  * partition-order-free and engine-exact — the same determinism contract
  * as every fixed-point kernel here.
  *
  * NULL semantics mirror `sum` at the ARRAY level: NULL arrays are
  * skipped; a group with no non-null input evaluates to NULL. NULL
  * ELEMENTS inside an array have no sane sum semantics for a centroid
  * accumulator, so they throw loudly (toLongArray would silently
  * zero-fill them — corrupting a centroid is exactly the failure this
  * kernel exists to prevent). Mismatched lengths throw for the same
  * reason.
  */
case class ArraySumFp(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArraySumBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "array_sum_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): ArraySumBuffer = new ArraySumBuffer

  override def update(buf: ArraySumBuffer, input: InternalRow): ArraySumBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val xs = new Array[Long](n)
      var i = 0
      while (i < n) {
        // explicit per-element walk instead of toLongArray(): that
        // helper ZERO-FILLS null slots, silently summing NULL as 0
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"$prettyName: null element at index $i — null vector " +
              "elements have no defined elementwise-sum semantics")
        xs(i) = arr.getLong(i)
        i += 1
      }
      buf.add(xs)
    }
    buf
  }

  override def merge(buf: ArraySumBuffer, other: ArraySumBuffer): ArraySumBuffer = {
    if (other.sums != null) buf.add(other.sums)
    buf
  }

  override def eval(buf: ArraySumBuffer): Any =
    if (buf.sums == null) null else new GenericArrayData(buf.sums)

  override def serialize(buf: ArraySumBuffer): Array[Byte] = {
    val s = buf.sums
    if (s == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(8 * s.length)
    var i = 0
    while (i < s.length) { bb.putLong(s(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArraySumBuffer = {
    val buf = new ArraySumBuffer
    if (bytes.nonEmpty) {
      val bb = ByteBuffer.wrap(bytes)
      val s = new Array[Long](bytes.length / 8)
      var i = 0
      while (i < s.length) { s(i) = bb.getLong(); i += 1 }
      buf.sums = s
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArraySumFp =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArraySumFp =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ArraySumFp =
    copy(child = newChildren.head)
}

/** Mutable elementwise accumulator; `sums == null` until the first
  * non-null input fixes the dimension. */
final class ArraySumBuffer {
  var sums: Array[Long] = _

  def add(v: Array[Long]): Unit = {
    if (sums == null) sums = v.clone()
    else {
      require(v.length == sums.length,
        s"array_sum_fp: dimension mismatch (${v.length} vs ${sums.length})")
      var i = 0
      while (i < v.length) { sums(i) += v(i); i += 1 }
    }
  }
}

object ArraySumFp {
  /** `array_sum_fp(arr)` as a Column aggregate. */
  def apply(arr: Column): Column =
    bridge.column(ArraySumFp(bridge.expression(arr)).toAggregateExpression())
}
