package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd vector math over ArrayType(FloatType) columns.
  *
  * Spark's higher-order functions (zip_with/aggregate) evaluate their
  * lambda per element through the interpreter — at 100 TB with per-slice
  * vectors in every hot path (ANN scoring, centroid assignment, MMR) that
  * interpretation overhead dominates. These expressions loop over the
  * primitive float arrays in generated Java, accumulating in double, in
  * ascending index order (the same sequential order as the DuckDB
  * oracle's list_sum(list_transform(...)) — keeps cross-engine doubles
  * bit-identical).
  */
object VectorOps {

  def cosineF32(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimF32(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def dotF32(a: Column, b: Column): Column =
    ColumnBridge.column(DotF32(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** L2 norm, codegen'd. Same accumulation (double, ascending index
    * order) as the zip_with/aggregate HOF it replaces in
    * VectorFunctions.norm — HOF lambdas evaluate interpreted per
    * element, which dominated q26/q57 (see class doc). */
  def normF32(a: Column): Column =
    ColumnBridge.column(NormF32(ColumnBridge.expression(a)))

  /** Intersection size of two ASCENDING-sorted long arrays (merge
    * scan). Codegen'd: the ScalaUDF form paid a per-call ArrayData ->
    * boxed-Seq conversion that dominated jaccard verification (~45us
    * per 100-element pair vs sub-us here). */
  def intersectSortedLongs(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersect(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Integer dot product of two long arrays — the codegen'd form of
    * `aggregate(zip_with(a, b, (x, y) => x * y), 0L, (acc, x) => acc + x)`
    * on the q44/q121 portable embedding verify path (HOF lambdas
    * evaluate interpreted per element — the class-doc rationale, here
    * over 64-long vectors per CANDIDATE PAIR). Exact integer sum,
    * identical value to the HOF on equal-length null-free arrays (the
    * signer emits fixed-width primitive arrays). */
  def dotLongs(a: Column, b: Column): Column =
    ColumnBridge.column(DotLongs(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Count of positions where two long arrays hold EQUAL values — the
    * codegen'd form of the q22/q93 matching-minhash count
    * (`size(filter(zip_with(a, b, _ === _), identity))` / the
    * relational `count(when(ma === mb, 1))`): both sides are j-ordered
    * fixed-width signatures, so positional equality IS the match
    * count. */
  def countEqualLongs(a: Column, b: Column): Column =
    ColumnBridge.column(CountEqualLongs(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def intersectSorted(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  // runtime kernels (also called from generated code)
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def normSq(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    acc
  }

  /** L2 norm with the aggregate()-HOF null semantics NormF32 replaces:
    * a null ELEMENT null-propagates the whole norm (boxed null return)
    * instead of being read as 0 or NPEing — `acc + null * null` made
    * the HOF's accumulator null. */
  def normOrNull(a: ArrayData): java.lang.Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val denom = math.sqrt(normSq(a)) * math.sqrt(normSq(b))
    if (denom == 0.0) 0.0 else dot(a, b) / denom
  }

  def dotLongsKernel(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  def countEqualLongsKernel(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"requires two array<float> inputs, got $other")
    }
}

case class CosineSimF32(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.VectorOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimF32 =
    copy(left = newLeft, right = newRight)
}

case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"requires two array<bigint> inputs, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.intersectSorted(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.VectorOps.intersectSorted($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedLongIntersect =
    copy(left = newLeft, right = newRight)
}

case class NormF32(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  // nullable even over a non-null array column: a null ELEMENT
  // null-propagates (the aggregate()-HOF semantics this replaces)
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"requires an array<float> input, got $other")
    }
  override def nullSafeEval(a: Any): Any =
    VectorOps.normOrNull(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""java.lang.Double ${ev.value}_r = graft.expr.VectorOps.normOrNull($a);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin
    })
  override protected def withNewChildInternal(
      newChild: Expression): NormF32 = copy(child = newChild)
}

case class DotF32(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.VectorOps.dot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

abstract class LongArrayBinaryExpression extends BinaryExpression {
  // containsNull=false REQUIRED (ADVICE r18): the kernels read every
  // slot with ArrayData.getLong, which silently yields 0 for a null
  // element where the HOF forms these expressions replaced would have
  // null-propagated. All intended producers (the fixed-width signer
  // UDFs) emit primitive Array[Long] = containsNull=false; reject the
  // rest at analysis time instead of mis-evaluating at runtime.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("requires two array<bigint> inputs with " +
            s"non-nullable elements, got $other")
    }
}

case class DotLongs(left: Expression, right: Expression)
    extends LongArrayBinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotLongsKernel(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.VectorOps.dotLongsKernel($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotLongs =
    copy(left = newLeft, right = newRight)
}

case class CountEqualLongs(left: Expression, right: Expression)
    extends LongArrayBinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.countEqualLongsKernel(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.VectorOps.countEqualLongsKernel($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CountEqualLongs =
    copy(left = newLeft, right = newRight)
}
