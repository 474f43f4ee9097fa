package graft.expr

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the float32 little-endian byte codec
  * (reference F33: embeddings are stored as numpy float32 `tobytes()` —
  * embedding_model_helpers.py:114 — and read back with
  * `numpy.frombuffer(dtype=float32)` — sdgs_classifiers.py:39-41,
  * qdrant_handler.py:114-138). Byte-compatible round-trip is required for
  * storage parity (SURVEY §7.5.2).
  *
  * Implemented with `doGenCode` so the codec participates in whole-stage
  * codegen — these sit in the per-slice hot path at 100 TB scale.
  */
object VectorCodec {

  /** bytes (float32-LE) -> array<float> */
  def bytesToFloatVector(c: Column): Column =
    ColumnBridge.column(BytesToFloatVector(ColumnBridge.expression(c)))

  /** array<float> -> bytes (float32-LE) */
  def floatVectorToBytes(c: Column): Column =
    ColumnBridge.column(FloatVectorToBytes(ColumnBridge.expression(c)))

  // Shared runtime kernels (also called from generated code).
  def decode(bytes: Array[Byte]): ArrayData = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bytes.length / 4
    val out = new Array[Float](n)
    buf.asFloatBuffer().get(out)
    new GenericArrayData(out)
  }

  def encode(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val buf = ByteBuffer.allocate(n * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { buf.putFloat(arr.getFloat(i)); i += 1 }
    buf.array()
  }
}

case class BytesToFloatVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"requires binary input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    VectorCodec.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.VectorCodec.decode($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BytesToFloatVector = copy(child = newChild)
}

case class FloatVectorToBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"requires array<float> input, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    VectorCodec.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.VectorCodec.encode($c)")

  override protected def withNewChildInternal(
      newChild: Expression): FloatVectorToBytes = copy(child = newChild)
}
