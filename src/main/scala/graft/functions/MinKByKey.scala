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
import org.apache.spark.unsafe.types.UTF8String

/** Bounded MIN-k aggregate over a (string key, bigint id) pair: keeps
  * the k smallest (key ASC, id ASC-tiebreak) pairs per group in a size-k
  * buffer — the string-keyed sibling of [[TopKByScore]].
  *
  * Purpose-built for deterministic hash-quota sampling: "the first k
  * docs of each stratum in md5 order" ranked by a window buffers the
  * WHOLE stratum (a dominant language ≈ the corpus) in one task, while
  * this aggregate's partial phase trims every map task to k pairs per
  * stratum before the shuffle — O(strata·k) rows move at any corpus
  * size. UTF8String's binary comparison equals lexicographic ORDER BY on
  * the lowercase-hex digests it is fed, so results match the window
  * formulation (and any SQL oracle) exactly.
  *
  * Input: struct(key string, id bigint). Output: array<struct<key, id>>
  * sorted (key ASC, id ASC), length ≤ k.
  */
case class MinKByKey(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MinKBuffer] {

  private val pairType = StructType(Seq(
    StructField("key", StringType), StructField("id", LongType)))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(pairType, containsNull = false)
  override def prettyName: String = "min_k_by_key"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b)) if a.dataType == StringType && b.dataType == LongType
      && k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<key:string,id:bigint> and k >= 1")
  }

  override def createAggregationBuffer(): MinKBuffer = new MinKBuffer(k)

  override def update(buf: MinKBuffer, input: InternalRow): MinKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        // UTF8String from an unsafe row aliases a reused buffer — copy it
        buf.add(row.getUTF8String(0).clone(), row.getLong(1))
    }
    buf
  }

  override def merge(buf: MinKBuffer, other: MinKBuffer): MinKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MinKBuffer): Any =
    new GenericArrayData(buf.sortedPairs.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])

  override def serialize(buf: MinKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MinKBuffer = MinKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinKByKey =
    copy(child = newChildren.head)
}

/** Size-bounded sorted buffer of (UTF8String key, Long id) pairs,
  * smallest-first; the worst element is evicted when a smaller one
  * arrives. Hot path (reject a pair above the current ceiling) is O(1).
  */
final class MinKBuffer(k: Int) {
  private var keys = new Array[UTF8String](math.min(k, 16))
  private var ids = new Array[Long](math.min(k, 16))
  private var n = 0

  private def smaller(k1: UTF8String, i1: Long, k2: UTF8String, i2: Long): Boolean = {
    val c = k1.compareTo(k2)
    c < 0 || (c == 0 && i1 < i2)
  }

  def add(key: UTF8String, id: Long): Unit = {
    if (n == k && !smaller(key, id, keys(n - 1), ids(n - 1))) return
    if (n < k && n == keys.length) {
      keys = java.util.Arrays.copyOf(keys, math.min(k, keys.length * 2))
      ids = java.util.Arrays.copyOf(ids, math.min(k, ids.length * 2))
    }
    var pos = if (n == k) n - 1 else n
    while (pos > 0 && smaller(key, id, keys(pos - 1), ids(pos - 1))) pos -= 1
    val lastIdx = math.min(n, k - 1)
    var j = lastIdx
    while (j > pos) { keys(j) = keys(j - 1); ids(j) = ids(j - 1); j -= 1 }
    keys(pos) = key
    ids(pos) = id
    if (n < k) n += 1
  }

  def mergeFrom(other: MinKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.keys(i), other.ids(i)); i += 1 }
  }

  def sortedPairs: Seq[(UTF8String, Long)] = (0 until n).map(i => (keys(i), ids(i)))

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + n * 24)
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    var i = 0
    while (i < n) {
      val b = keys(i).getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(ids(i)); i += 1
    }
    bos.toByteArray
  }
}

object MinKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): MinKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MinKBuffer(k)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      buf.add(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }
}

object MinKByKey {
  /** `min_k_by_key(struct(key, id), k)` as a Column aggregate. */
  def apply(key: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.struct
    bridge.column(
      MinKByKey(bridge.expression(struct(key, id)), k).toAggregateExpression())
  }
}
