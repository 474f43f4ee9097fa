package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregation (SURVEY §2.11's "optional
  * TypedImperativeAggregate"): keep the k best rows of a struct per
  * group in a size-k heap, with per-field sort directions.
  *
  * Scale rationale: the window formulation of top-k-per-group
  * (`row_number().over(partitionBy(g).orderBy(...)) <= k`) shuffles and
  * SORTS every row of every group; this aggregate does partial (map-side)
  * top-k per partition — each partition contributes at most k rows per
  * group to the shuffle — and merges heaps on the reduce side. At 100 TB
  * with millions of rows per group and k in the tens, the shuffle volume
  * drops by orders of magnitude. (Same plan shape Spark gives
  * max_by/min_by, generalized to k > 1 with composite directional
  * ordering.)
  *
  * Determinism: ties rank by the struct's remaining fields — callers
  * include a unique tie-break field (reference discipline, FIXTURES.md).
  */
object TopK {

  /** `topKBy(struct(a, b, ...), k, descending)` → array of the k
    * first-ranked structs, in rank order. `descending(i)` flips field i
    * (true = larger-first). */
  def topKBy(sortStruct: Column, k: Int,
      descending: Seq[Boolean]): Column =
    ColumnBridge.column(
      TopKStructs(ColumnBridge.expression(sortStruct), k, descending)
        .toAggregateExpression())
}

case class TopKStructs(child: Expression, k: Int,
    descending: Seq[Boolean],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k > 0, "k must be positive")

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  /** negative ⟺ a ranks before b (composite, per-field direction;
    * nulls rank last). */
  @transient private lazy val rankOrdering: Ordering[InternalRow] =
    new Ordering[InternalRow] {
      private val fields = structType.fields
      private val dirs =
        Array.tabulate(fields.length)(i =>
          if (i < descending.length && descending(i)) -1 else 1)
      private val orderings = fields.map(f =>
        TypeUtils.getInterpretedOrdering(f.dataType))
      override def compare(a: InternalRow, b: InternalRow): Int = {
        var i = 0
        while (i < fields.length) {
          val an = a.isNullAt(i); val bn = b.isNullAt(i)
          if (an || bn) {
            if (!an) return -1
            if (!bn) return 1
          } else {
            val av = a.get(i, fields(i).dataType)
            val bv = b.get(i, fields(i).dataType)
            val c = orderings(i).asInstanceOf[Ordering[Any]].compare(av, bv)
            if (c != 0) return c * dirs(i)
          }
          i += 1
        }
        0
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    // head = worst kept row (PriorityQueue dequeues the LARGEST by its
    // ordering; under rankOrdering, largest = last-ranked)
    new mutable.PriorityQueue[InternalRow]()(rankOrdering)

  private def offer(buf: mutable.PriorityQueue[InternalRow],
      row: InternalRow): Unit = {
    if (buf.size < k) buf.enqueue(row.copy())
    else if (rankOrdering.compare(row, buf.head) < 0) {
      buf.dequeue()
      buf.enqueue(row.copy())
    }
  }

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow])
      : mutable.PriorityQueue[InternalRow] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(
      buf.toArray.sorted(rankOrdering).map(_.asInstanceOf[Any]))

  @transient private lazy val toUnsafe = UnsafeProjection.create(structType)

  override def serialize(buf: mutable.PriorityQueue[InternalRow])
      : Array[Byte] = {
    val rows = buf.toArray.map(r => toUnsafe(r).copy().getBytes)
    val total = 4 + rows.map(4 + _.length).sum
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(rows.length)
    rows.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.PriorityQueue[InternalRow] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StructType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topKBy requires a struct input, got $other")
    }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructs =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructs =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "top_k_by"
}
