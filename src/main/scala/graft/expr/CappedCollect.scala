package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** collect_list with a hard element cap: groups that exceed `cap`
  * evaluate to NULL and their buffers are dropped immediately.
  *
  * Scale rationale (the df-capped dedup path, Dedup.jaccardPairsCapped):
  * `collect_list(id) ... where size(ids) <= cap` materializes the FULL
  * posting list of every group before the filter runs — a corpus-wide
  * hot shingle ("of the and" at 100 TB) builds an array of millions of
  * ids in a single aggregation buffer row (2 GB row limit / OOM), which
  * is exactly the skew the cap exists to neutralize. This aggregate
  * trips at cap+1: once a partial buffer sees more than `cap` elements
  * it empties itself and only carries the tripped flag, so per-group
  * buffer memory is O(cap) regardless of group size, map-side combine
  * still applies, and the single-pass plan shape (no second
  * count+semi-join scan of the exploded rows) is preserved.
  *
  * Semantics: eval = array of the group's values (unordered, like
  * collect_list) when the group has <= cap elements, NULL otherwise.
  * Null inputs are skipped (collect_list discipline).
  */
object CappedCollect {
  def cappedCollect(child: Column, cap: Int): Column =
    ColumnBridge.column(
      CappedCollectList(ColumnBridge.expression(child), cap)
        .toAggregateExpression())
}

/** Buffer: (tripped, values). tripped ⟹ values is empty forever. */
final class CappedBuffer(var tripped: Boolean,
    val values: mutable.ArrayBuffer[Any])

case class CappedCollectList(child: Expression, cap: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedBuffer] {

  require(cap > 0, "cap must be positive")

  override def createAggregationBuffer(): CappedBuffer =
    new CappedBuffer(false, mutable.ArrayBuffer.empty[Any])

  private def trip(buf: CappedBuffer): Unit = {
    buf.tripped = true
    buf.values.clear()
  }

  override def update(buf: CappedBuffer, input: InternalRow): CappedBuffer = {
    if (!buf.tripped) {
      val v = child.eval(input)
      if (v != null) {
        // copy: UTF8String / array values from eval may be backed by
        // reused row memory
        buf.values += InternalRow.copyValue(v)
        if (buf.values.length > cap) trip(buf)
      }
    }
    buf
  }

  override def merge(buf: CappedBuffer, other: CappedBuffer): CappedBuffer = {
    if (other.tripped) trip(buf)
    else if (!buf.tripped) {
      buf.values ++= other.values
      if (buf.values.length > cap) trip(buf)
    }
    buf
  }

  override def eval(buf: CappedBuffer): Any =
    if (buf.tripped) null
    else new GenericArrayData(buf.values.toArray)

  @transient private lazy val elemStruct =
    StructType(Seq(StructField("v", child.dataType, nullable = false)))
  @transient private lazy val toUnsafe = UnsafeProjection.create(elemStruct)

  override def serialize(buf: CappedBuffer): Array[Byte] = {
    if (buf.tripped) Array[Byte](1)
    else {
      val rows = buf.values.map(v =>
        toUnsafe(InternalRow(v)).copy().getBytes).toArray
      val total = 5 + rows.map(4 + _.length).sum
      val bb = java.nio.ByteBuffer.allocate(total)
      bb.put(0: Byte)
      bb.putInt(rows.length)
      rows.foreach { b => bb.putInt(b.length); bb.put(b) }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): CappedBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    if (bb.get() != 0) new CappedBuffer(true, mutable.ArrayBuffer.empty)
    else {
      val buf = createAggregationBuffer()
      val n = bb.getInt
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val arr = new Array[Byte](len)
        bb.get(arr)
        val row = new UnsafeRow(1)
        row.pointTo(arr, len)
        buf.values += InternalRow.copyValue(row.get(0, child.dataType))
        i += 1
      }
      buf
    }
  }

  override def checkInputDataTypes(): TypeCheckResult =
    TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CappedCollectList =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "capped_collect_list"
}
