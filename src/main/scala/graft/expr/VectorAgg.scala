package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Element-wise fixed-point sum of an `array<float>` column, in ONE
  * aggregation buffer.
  *
  * Built for k-means centroid recompute (Similarity.kMeansCentroids):
  * the per-coordinate formulation — `2 x dim` named agg expressions
  * (`sum(round(element_at(v, i) * scale))`, `count(element_at(v, i))`)
  * — re-evaluates `element_at` per coordinate and blows past codegen's
  * comfort zone at real dims (dim=768 => 1,536 aggregate expressions:
  * wholestage fallback, 64KB method limits, splitAggregateExpressions).
  * This aggregate walks the raw `ArrayData` once per row into a single
  * (sums, counts) long-array buffer, merges partials element-wise, and
  * plans as one ObjectHashAggregate expression at ANY dim.
  *
  * Numerics match the column formulation exactly: each element is
  * quantized `math.round(x * scale)` to a long and summed with integer
  * addition — associative and commutative, so shuffle order, partition
  * count, and AQE re-plans cannot change the result (the bitwise
  * run-to-run determinism contract of kMeansCentroids).
  *
  * Null / ragged handling = the `sum`/`count` column semantics it
  * replaces: a null array contributes nothing; a null element or an
  * index past a short vector's end contributes to neither `sums(i)` nor
  * `counts(i)` (the buffer grows to the longest vector seen; `counts`
  * carries the per-coordinate non-null count, so the caller divides
  * each coordinate by its own support, exactly like avg()).
  *
  * Output: `struct(sums: array<bigint>, counts: array<bigint>)`.
  */
object VectorAgg {

  def quantizedSumCount(vec: Column, scale: Double): Column =
    ColumnBridge.column(
      QuantizedVectorSum(ColumnBridge.expression(vec), scale)
        .toAggregateExpression())

  /** Weighted form: each row contributes `w × quantize(x_i)` to
    * `sums(i)` and `w` to `counts(i)` — BIT-IDENTICAL to summing `w`
    * copies of the row, because the per-row quantization is computed
    * FIRST and long multiplication/addition are exact (the
    * duplication-contraction lemma kMeansCentroids' round-16 adaptive
    * path rests on). A null or non-positive weight contributes
    * nothing. */
  def quantizedSumCountWeighted(vec: Column, scale: Double,
      weight: Column): Column =
    ColumnBridge.column(
      QuantizedVectorSum(ColumnBridge.expression(vec), scale,
        weight = ColumnBridge.expression(weight))
        .toAggregateExpression())

  /** HALF_UP away from zero — the rounding of Spark's `round()` that
    * the 2xdim column form used (`sum(round(x * scale).cast("long"))`).
    * `math.round` is half-up toward +infinity, which differs on
    * negative exact halves (round(-0.5): Spark -1, math.round 0) —
    * matching matters because the module's contract is BITWISE
    * equivalence with the formulation it replaced. */
  def roundHalfAwayFromZero(x: Double): Long =
    if (x >= 0) math.round(x) else -math.round(-x)

  /** Mutable (sums, counts) pair; grows to the longest vector seen. */
  final class Buf(var sums: Array[Long], var counts: Array[Long]) {
    def ensure(n: Int): Unit = if (sums.length < n) {
      sums = java.util.Arrays.copyOf(sums, n)
      counts = java.util.Arrays.copyOf(counts, n)
    }
  }
}

case class QuantizedVectorSum(child: Expression, scale: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0,
    weight: Expression =
      org.apache.spark.sql.catalyst.expressions.Literal(1L))
    extends TypedImperativeAggregate[VectorAgg.Buf] {

  override def createAggregationBuffer(): VectorAgg.Buf =
    new VectorAgg.Buf(Array.emptyLongArray, Array.emptyLongArray)

  override def update(buf: VectorAgg.Buf, input: InternalRow)
      : VectorAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      // weight multiplies AFTER per-row quantization (w × q exact in
      // long arithmetic) so a weight-w row is bit-identical to w
      // unweighted copies; the unweighted default (literal 1) makes
      // this path byte-equal to the pre-round-16 form
      val wv = weight.eval(input)
      val w = wv match {
        case null       => 0L
        case x: Long    => x
        case x: Int     => x.toLong
        case other      => throw new IllegalStateException(
          s"quantized_vector_sum weight must be integral, got $other")
      }
      if (w > 0L) {
        val arr = v.asInstanceOf[ArrayData]
        val n = arr.numElements()
        buf.ensure(n)
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) {
            buf.sums(i) += w * VectorAgg.roundHalfAwayFromZero(
              arr.getFloat(i).toDouble * scale)
            buf.counts(i) += w
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: VectorAgg.Buf, other: VectorAgg.Buf)
      : VectorAgg.Buf = {
    buf.ensure(other.sums.length)
    var i = 0
    while (i < other.sums.length) {
      buf.sums(i) += other.sums(i)
      buf.counts(i) += other.counts(i)
      i += 1
    }
    buf
  }

  override def eval(buf: VectorAgg.Buf): Any =
    InternalRow(new GenericArrayData(buf.sums.map(_.asInstanceOf[Any])),
      new GenericArrayData(buf.counts.map(_.asInstanceOf[Any])))

  override def serialize(buf: VectorAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.sums.length)
    bb.putInt(buf.sums.length)
    buf.sums.foreach(bb.putLong)
    buf.counts.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val sums = Array.fill(n)(bb.getLong)
    val counts = Array.fill(n)(bb.getLong)
    new VectorAgg.Buf(sums, counts)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, weight.dataType) match {
      case (ArrayType(FloatType, _), LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantizedSumCount requires (array<float>, integral weight), " +
          s"got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("counts", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, weight)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantizedVectorSum =
    copy(child = newChildren(0), weight = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int)
      : QuantizedVectorSum = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : QuantizedVectorSum = copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "quantized_vector_sum"
}
