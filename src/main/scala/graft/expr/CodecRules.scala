package graft.expr

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.ArrayType

/** Optimizer rule: eliminate float-vector codec round-trips.
  *
  * `bytes_to_vec(vec_to_bytes(x))` decodes exactly the bytes it just
  * encoded, so the pair is the identity — both kernels disappear from
  * the plan. The typical composition that produces it: one pipeline
  * stage declares the STORAGE schema (embeddings as float32-LE bytes,
  * q63 / the reference's pgvector wire format) while the next stage
  * immediately decodes for scoring; composing the two stages
  * declaratively should not pay two per-row codec kernels at 100 TB.
  *
  * Scope guards (both directions matter):
  *  - fires only when x's element type is provably non-null
  *    (`containsNull = false`) — a null element silently encodes as
  *    0.0f, so the round-trip is NOT the identity on nullable arrays;
  *  - the reverse direction (`vec_to_bytes(bytes_to_vec(b))`) is NOT
  *    rewritten: decode truncates trailing bytes when b.length % 4 != 0,
  *    so encode∘decode is not the identity on arbitrary binary.
  *
  * Registered via GraftExtensions.injectOptimizerRule — the (c)-tier
  * Catalyst integration (custom Rule[LogicalPlan]) from the build
  * guidelines, applied to EVERY query in the session including plain
  * SQL text. */
object EliminateVectorCodecRoundTrip extends Rule[LogicalPlan] {

  private def nonNullFloatArray(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.dataType match {
      case ArrayType(_, containsNull) => !containsNull
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case BytesToFloatVector(FloatVectorToBytes(inner))
          if nonNullFloatArray(inner) => inner
    }
}
