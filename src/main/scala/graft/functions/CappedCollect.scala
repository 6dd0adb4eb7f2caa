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

/** Size-CAPPED collect for the dedup candidate-group expansions: gathers
  * up to `cap` struct<id, n_sh:bigint, pos:int> elements per group and
  * reports `overflow = true` (with the elements dropped) the moment a
  * group exceeds the cap. The id field may be int, bigint, or string —
  * whatever the caller's document key is; the output element type mirrors
  * the input's.
  *
  * This is the skew guard fused INTO the aggregation: a plain
  * collect_list materializes a giant bucket as one row (single-task OOM
  * on adversarial corpora), and a separate window count pays an extra
  * sort of the whole prefix/bucket table just to measure sizes. Here the
  * buffer is bounded at `cap` elements by construction — partial
  * aggregation trims map output before the shuffle, overflowed groups
  * ship as a single flag byte — and the caller routes `overflow` groups
  * to the streaming equi-self-join path.
  *
  * Output: struct<overflow:boolean, xs:array<struct<id,n_sh,pos>>>;
  * `xs` is empty when overflow is true. Element order is partition-
  * dependent — callers must not depend on it (pair expansion with an
  * `id_a < id_b` filter does not).
  */
case class CappedCollect(child: Expression, cap: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedBuffer] {

  private lazy val idType: DataType = child.dataType match {
    case StructType(fs) if fs.nonEmpty => fs(0).dataType
    case _ => LongType
  }

  private lazy val elemType = StructType(Seq(
    StructField("id", idType), StructField("n_sh", LongType),
    StructField("pos", IntegerType)))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("overflow", BooleanType),
    StructField("xs", ArrayType(elemType, containsNull = false))))
  override def prettyName: String = "capped_collect"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b, c))
      if (a.dataType == LongType || a.dataType == IntegerType || a.dataType == StringType) &&
        b.dataType == LongType && c.dataType == IntegerType && cap >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires struct<id:int|bigint|string,n_sh:bigint,pos:int> and cap >= 1")
  }

  override def createAggregationBuffer(): CappedBuffer = new CappedBuffer(cap)

  override def update(buf: CappedBuffer, input: InternalRow): CappedBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      // UTF8String from an unsafe row aliases a reused buffer — copy it
      val id = row.get(0, idType) match {
        case s: UTF8String => s.clone()
        case other => other
      }
      buf.add(id, row.getLong(1), row.getInt(2))
    }
    buf
  }

  override def merge(buf: CappedBuffer, other: CappedBuffer): CappedBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: CappedBuffer): Any =
    InternalRow(buf.overflowed,
      new GenericArrayData(buf.elems.map { case (a, b, c) =>
        InternalRow(a, b, c)
      }.toArray[Any]))

  override def serialize(buf: CappedBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): CappedBuffer =
    CappedBuffer.fromBytes(cap, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CappedCollect =
    copy(child = newChildren.head)
}

/** Bounded triple buffer: stores up to `cap` elements; one element past
  * the cap flips `overflowed` and drops the payload (the caller re-derives
  * oversized groups from the raw rows, so nothing is lost). Ids are held
  * boxed (Long / Integer / UTF8String) — the buffer never exceeds `cap`
  * elements, so boxing cost is bounded by construction. */
final class CappedBuffer(cap: Int) {
  private var ids = new Array[AnyRef](math.min(cap, 16))
  private var nshs = new Array[Long](math.min(cap, 16))
  private var poss = new Array[Int](math.min(cap, 16))
  private var n = 0
  var overflowed = false

  def add(id: Any, nsh: Long, pos: Int): Unit = {
    if (overflowed) return
    if (n == cap) { overflowed = true; n = 0; return }
    if (n == ids.length) {
      val sz = math.min(cap, ids.length * 2)
      ids = java.util.Arrays.copyOf(ids, sz)
      nshs = java.util.Arrays.copyOf(nshs, sz)
      poss = java.util.Arrays.copyOf(poss, sz)
    }
    ids(n) = id.asInstanceOf[AnyRef]; nshs(n) = nsh; poss(n) = pos; n += 1
  }

  def mergeFrom(other: CappedBuffer): Unit = {
    if (other.overflowed) { overflowed = true; n = 0; return }
    var i = 0
    while (i < other.n && !overflowed) {
      add(other.ids(i), other.nshs(i), other.poss(i)); i += 1
    }
  }

  def elems: Seq[(Any, Long, Int)] =
    if (overflowed) Seq.empty else (0 until n).map(i => (ids(i), nshs(i), poss(i)))

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(5 + n * 20)
    val out = new DataOutputStream(bos)
    out.writeBoolean(overflowed)
    out.writeInt(n)
    var i = 0
    while (i < n) {
      // self-describing element tag: the buffer is type-agnostic and the
      // per-element byte is noise next to the payload
      ids(i) match {
        case l: java.lang.Long => out.writeByte(0); out.writeLong(l)
        case j: java.lang.Integer => out.writeByte(1); out.writeInt(j)
        case s: UTF8String =>
          val b = s.getBytes
          out.writeByte(2); out.writeInt(b.length); out.write(b)
        case other => throw new IllegalStateException(
          s"capped_collect: unsupported id ${other.getClass}")
      }
      out.writeLong(nshs(i)); out.writeInt(poss(i)); i += 1
    }
    bos.toByteArray
  }
}

object CappedBuffer {
  def fromBytes(cap: Int, bytes: Array[Byte]): CappedBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CappedBuffer(cap)
    buf.overflowed = bb.get() != 0
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val id: Any = bb.get() match {
        case 0 => bb.getLong
        case 1 => bb.getInt
        case 2 =>
          val len = bb.getInt
          val b = new Array[Byte](len); bb.get(b)
          UTF8String.fromBytes(b)
        case t => throw new IllegalStateException(s"capped_collect: bad id tag $t")
      }
      buf.add(id, bb.getLong, bb.getInt); i += 1
    }
    buf
  }
}

object CappedCollect {
  /** `capped_collect(struct(id, n_sh, pos), cap)` as a Column aggregate. */
  def apply(id: Column, nSh: Column, pos: Column, cap: Int): Column = {
    import org.apache.spark.sql.functions.struct
    bridge.column(
      CappedCollect(bridge.expression(struct(id, nSh, pos)), cap).toAggregateExpression())
  }
}
