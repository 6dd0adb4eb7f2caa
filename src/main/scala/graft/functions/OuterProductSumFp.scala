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

/** OUTER-PRODUCT SUM aggregate over `array<bigint>` — the one-pass
  * sufficient-statistics kernel behind covariance / PCA-whitening prep:
  * for quantized vectors q it accumulates, in a single buffer,
  *
  *   [ n , Σq(0) … Σq(d−1) , Σ q(i)·q(j) for the upper triangle i ≤ j ]
  *
  * laid out as one `array<bigint>` of length `1 + d + d(d+1)/2`.
  *
  * Why not posexplode twice + self-join on the row id (the oracle's
  * formulation): that shape shuffles n·d(d+1)/2 rows — at d = 64 that is
  * 2,080× the corpus — where this aggregate's partial phase folds each
  * vector into one buffer per map task and the exchange moves exactly
  * ONE (1 + d + d(d+1)/2)-length array per partition. Why not build the
  * flattened triangle per row and feed [[ArraySumFp]]: that materializes
  * a d(d+1)/2-long array allocation per input row; here the double loop
  * writes straight into the shared buffer.
  *
  * Exact integer addition is commutative/associative, so the result is
  * partition-order-free and engine-exact (the [[ArraySumFp]] contract).
  * NULL arrays are skipped (`sum` semantics at the array level); NULL
  * elements and dimension mismatches throw loudly — silently zero-filled
  * covariance is exactly the corruption this kernel exists to prevent.
  * BIGINT headroom: with |q| ≤ 1e3 (fp3 components), each product is
  * ≤ 1e6, so Σ wraps only past ~9·10¹² vectors — documented at the call
  * site, far beyond a 100 TB embedding store.
  */
case class OuterProductSumFp(child: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[OuterProductBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "outer_product_sum_fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.catalogString}")
  }

  override def createAggregationBuffer(): OuterProductBuffer = new OuterProductBuffer

  override def update(buf: OuterProductBuffer, input: InternalRow): OuterProductBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      val q = new Array[Long](d)
      var i = 0
      while (i < d) {
        if (arr.isNullAt(i))
          throw new IllegalArgumentException(
            s"$prettyName: null element at index $i — null vector " +
              "elements have no defined outer-product semantics")
        q(i) = arr.getLong(i)
        i += 1
      }
      buf.addVector(q)
    }
    buf
  }

  override def merge(buf: OuterProductBuffer, other: OuterProductBuffer): OuterProductBuffer = {
    if (other.stats != null) buf.addBuffer(other.stats, other.dim)
    buf
  }

  override def eval(buf: OuterProductBuffer): Any =
    if (buf.stats == null) null else new GenericArrayData(buf.stats)

  override def serialize(buf: OuterProductBuffer): Array[Byte] = {
    val s = buf.stats
    if (s == null) return Array.emptyByteArray
    val bb = ByteBuffer.allocate(4 + 8 * s.length)
    bb.putInt(buf.dim)
    var i = 0
    while (i < s.length) { bb.putLong(s(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): OuterProductBuffer = {
    val buf = new OuterProductBuffer
    if (bytes.nonEmpty) {
      val bb = ByteBuffer.wrap(bytes)
      buf.dim = bb.getInt()
      val s = new Array[Long]((bytes.length - 4) / 8)
      var i = 0
      while (i < s.length) { s(i) = bb.getLong(); i += 1 }
      buf.stats = s
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductSumFp =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductSumFp =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): OuterProductSumFp =
    copy(child = newChildren.head)
}

/** Mutable accumulator; `stats == null` until the first non-null vector
  * fixes the dimension. Layout: [n, Σq(0..d−1), upper-triangle Σqᵢqⱼ
  * row-major]. */
final class OuterProductBuffer {
  var dim: Int = -1
  var stats: Array[Long] = _

  private def alloc(d: Int): Unit = {
    dim = d
    stats = new Array[Long](1 + d + d * (d + 1) / 2)
  }

  def addVector(q: Array[Long]): Unit = {
    if (stats == null) alloc(q.length)
    else require(q.length == dim,
      s"outer_product_sum_fp: dimension mismatch (${q.length} vs $dim)")
    stats(0) += 1L
    var i = 0
    var t = 1 + dim
    while (i < dim) {
      stats(1 + i) += q(i)
      val qi = q(i)
      var j = i
      while (j < dim) { stats(t) += qi * q(j); j += 1; t += 1 }
      i += 1
    }
  }

  def addBuffer(other: Array[Long], otherDim: Int): Unit = {
    if (stats == null) { alloc(otherDim); }
    else require(otherDim == dim,
      s"outer_product_sum_fp: dimension mismatch in merge ($otherDim vs $dim)")
    var i = 0
    while (i < other.length) { stats(i) += other(i); i += 1 }
  }
}

object OuterProductSumFp {
  /** `outer_product_sum_fp(arr)` as a Column aggregate. */
  def apply(arr: Column): Column =
    bridge.column(OuterProductSumFp(bridge.expression(arr)).toAggregateExpression())
}
