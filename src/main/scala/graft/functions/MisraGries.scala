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

/** MISRA–GRIES heavy-hitters sketch (Misra & Gries '82; mergeable-summary
  * merge from Agarwal et al., PODS '12 — both public): an O(k) counter
  * summary of a string stream with the guarantee that EVERY key of true
  * frequency > n/(k+1) survives in the summary. This is the candidate
  * generator for exact heavy hitters when the key space itself is too
  * large to shuffle: a full `groupBy(key).count` moves |distinct keys|
  * rows; the sketch moves at most k+1 counters per map task, and the
  * exact second pass then aggregates ONLY candidate-matching rows
  * (`HeavyHitters` in SparkEntry wires the two passes).
  *
  * Update is the classic algorithm: hit → +1; room → insert; else
  * decrement ALL counters and evict zeros (amortized O(1): each
  * decrement-all pays back k prior inserts). Merge is counter-sum
  * followed by subtracting the (k+1)-th largest counter and dropping
  * ≤ 0 — the mergeable-summaries form, preserving the n/(k+1) bound
  * under Spark's arbitrary partial-aggregate tree. The summary content
  * may depend on partitioning; ONLY the guarantee is deterministic,
  * which is why the registry row verifies through the exact second
  * pass, never through the sketch itself.
  *
  * Returns struct<n:bigint, keys:array<string>> — total stream count
  * and the surviving candidate keys (sorted, deduped).
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType),
    StructField("keys", ArrayType(StringType, containsNull = false))))
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key and k >= 1, got ${child.dataType.catalogString} k=$k")
  }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    // UTF8String from an unsafe row aliases a reused buffer — toString
    // copies into a JVM String key
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MgBuffer): Any = {
    val keys = buf.keys.sorted
    InternalRow(buf.total,
      new GenericArrayData(keys.map(UTF8String.fromString).toArray[Any]))
  }

  override def serialize(buf: MgBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MisraGries =
    copy(child = newChildren.head)
}

object MisraGries {
  /** `misra_gries(key, k)` as a Column aggregate. */
  def apply(key: Column, k: Int): Column =
    bridge.column(
      MisraGries(bridge.expression(key), k).toAggregateExpression())
}

/** O(k) Misra–Gries counter table plus the exact stream length. */
final class MgBuffer(k: Int) {
  private val counts = new java.util.HashMap[String, Long](k * 2)
  var total = 0L

  def add(key: String): Unit = {
    total += 1L
    val c = counts.get(key)
    if (c != 0L) counts.put(key, c + 1L)
    else if (counts.size < k) counts.put(key, 1L)
    else {
      // decrement-all, evicting zeros (the O(k) cost amortizes against
      // the k inserts that filled the table)
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  /** Direct counter install (deserialization only). */
  private[functions] def addCounter(key: String, c: Long): Unit =
    counts.put(key, c)

  def mergeFrom(other: MgBuffer): Unit = {
    total += other.total
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // absent key unboxes to 0L — live counters are never 0
      counts.put(e.getKey, counts.get(e.getKey) + e.getValue)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest counter from all, drop <= 0 —
      // the mergeable-summaries reduction back to k counters
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  def keys: Seq[String] = {
    import scala.jdk.CollectionConverters._
    counts.keySet().asScala.toSeq
  }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + counts.size * 24)
    val out = new DataOutputStream(bos)
    out.writeLong(total)
    out.writeInt(counts.size)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(e.getValue)
    }
    bos.toByteArray
  }
}

object MgBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(k)
    buf.total = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      buf.addCounter(new String(b, "UTF-8"), bb.getLong)
      i += 1
    }
    buf
  }
}
