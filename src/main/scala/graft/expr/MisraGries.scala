package graft.expr

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a partial-aggregatable
  * TypedImperativeAggregate: `misra_gries(item, k)` returns a candidate
  * SUPERSET of every item whose true count exceeds n/k, using at most
  * `k` counters per aggregation buffer.
  *
  * Scale rationale: the naive frequent-items plan (`GROUP BY item
  * HAVING count(*) > n/k`) shuffles the ENTIRE item census — at 100 TB
  * of exploded tokens that shuffle dwarfs everything else in the job.
  * This aggregate keeps a bounded k-counter summary per map task,
  * merges summaries on the reduce side (Agarwal et al., "Mergeable
  * Summaries", PODS 2012: merged MG summaries keep the n/(k+1)
  * undercount bound, so the superset guarantee survives partial
  * aggregation in ANY merge order), and ships k items per partition
  * instead of the census. A second, candidate-filtered exact count
  * turns the superset into the exact answer — see
  * [[graft.operators.HeavyHitters]].
  *
  * Determinism: the OUTPUT SET is deterministic for a fixed input
  * multiset — an item survives iff its MG estimate can stay positive,
  * and the estimate's lower bound count(x) - n/(k+1) does not depend
  * on arrival order. (Estimates themselves may vary with merge order;
  * only membership is exposed, and membership of true-frequent items
  * is guaranteed. Near-threshold items may flap — which is why the
  * operator recounts exactly before filtering.)
  *
  * Buffer: open-address-free mutable.HashMap[String, Long], capped at
  * k entries; the decrement step subtracts the minimum surviving count
  * lazily (counter-subtraction form, O(k) amortized per eviction).
  */
object MisraGries {
  def candidates(item: Column, k: Int): Column =
    ColumnBridge.column(
      MisraGriesAgg(ColumnBridge.expression(item), k)
        .toAggregateExpression())
}

case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries needs a string item column, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Classic MG step with counter subtraction: on a miss with a full
    * table, subtract the minimum count from every counter and drop the
    * zeros — equivalent to repeated decrement-all, O(k) per eviction
    * burst instead of O(k) per miss. */
  private def offer(buf: mutable.HashMap[String, Long], item: String,
      weight: Long): Unit = {
    val cur = buf.getOrElse(item, 0L)
    if (cur > 0L || buf.size < k) buf.update(item, cur + weight)
    else {
      val dec = math.min(weight, buf.valuesIterator.min)
      val dead = buf.iterator.filter(_._2 <= dec).map(_._1).toArray
      buf.mapValuesInPlace((_, c) => c - dec)
      dead.foreach(buf.remove)
      val rest = weight - dec
      if (rest > 0L) offer(buf, item, rest)
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (item, c) => offer(buf, item, c) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted
        .map(s => UTF8String.fromString(s).asInstanceOf[Any]))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, c) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "misra_gries"
}
