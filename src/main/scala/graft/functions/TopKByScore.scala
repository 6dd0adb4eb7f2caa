package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (score DESC, id ASC-tiebreak)
  * best (score, id) pairs per group in a size-k buffer.
  *
  * This is the aggregation shape a window `row_number() <= k` cannot
  * give you at scale: as a TypedImperativeAggregate it participates in
  * PARTIAL aggregation, so each map task reduces its rows to at most k
  * per group BEFORE the shuffle — the exchange moves O(groups·k) rows
  * instead of every input row. For "latest/top N per key" over 100 TB
  * that is the difference between shuffling terabytes and megabytes.
  *
  * Input: struct(score double, id long). Output: array<struct<score
  * double, id long>> sorted by (score DESC, id ASC), length ≤ k.
  */
case class TopKByScore(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private val pairType = StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType)))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(pairType, containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b)) if a.dataType == DoubleType && b.dataType == LongType
      && k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<score:double,id:bigint> and k >= 1")
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1)) buf.add(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedPairs
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(child = newChildren.head)
}

/** Size-bounded buffer ordered by (score DESC, id ASC): the worst kept
  * element is evicted when a better one arrives. Simple sorted insertion
  * over parallel arrays — k is small, and the hot path (reject a row
  * worse than the current floor) is O(1). */
final class TopKBuffer(k: Int) {
  private var scores = new Array[Double](math.min(k, 16))
  private var ids = new Array[Long](math.min(k, 16))
  private var n = 0

  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def add(s: Double, id: Long): Unit = {
    if (n == k && !better(s, id, scores(n - 1), ids(n - 1))) return
    if (n < k && n == scores.length) {
      scores = java.util.Arrays.copyOf(scores, math.min(k, scores.length * 2))
      ids = java.util.Arrays.copyOf(ids, math.min(k, ids.length * 2))
    }
    // find insertion point (from the back — new rows are usually worse)
    var pos = if (n == k) n - 1 else n
    while (pos > 0 && better(s, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    val lastIdx = math.min(n, k - 1)
    var j = lastIdx
    while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
    scores(pos) = s
    ids(pos) = id
    if (n < k) n += 1
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  def sortedPairs: Seq[(Double, Long)] = (0 until n).map(i => (scores(i), ids(i)))

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + n * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(scores(i)); out.writeLong(ids(i)); i += 1 }
    bos.toByteArray
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong); i += 1 }
    buf
  }
}

object TopKByScore {
  /** `top_k_by_score(struct(score, id), k)` as a Column aggregate. */
  def apply(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.struct
    bridge.column(
      TopKByScore(bridge.expression(struct(score, id)), k).toAggregateExpression())
  }
}
