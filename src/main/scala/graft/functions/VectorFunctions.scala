package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ArrayType(FloatType) embedding columns as pure Column
  * expressions (codegen'd higher-order functions — no UDF, no shuffle).
  * Reference semantics: embeddings are L2-normalized float32 vectors
  * (embedding_model_helpers.py:58-64); cosine/dot feeds keyword-MMR and
  * the vector-search surface.
  *
  * All arithmetic is promoted to double to keep results stable across
  * engines (float32 inputs, float64 accumulation — same as numpy's default
  * pairwise-sum dtype promotion in the reference).
  */
object VectorFunctions {

  /** Dot product via zip_with + aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** L2 norm — delegates to the codegen'd NormF32 expression (identical
    * numerics to sqrt(normSq(a)): double accumulation in index order).
    * The HOF form paid interpreted per-element lambda evaluation in
    * every row of q26/q57. */
  def norm(a: Column): Column = graft.expr.VectorOps.normF32(a)

  /** Cosine similarity; 0.0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** L2-normalize (reference F36: embedding_model_helpers.py:58-64). */
  def l2Normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0.0, a)
      .otherwise(transform(a, v => (v.cast("double") / n).cast("float")))
  }

  /** Mean of an array of vectors (centroid), elementwise. */
  def centroid(vecs: Column): Column = {
    val n = size(vecs).cast("double")
    val summed = aggregate(vecs,
      transform(element_at(vecs, 1), _ => lit(0.0)),
      (acc, v) => zip_with(acc, v, (x, y) => x + y.cast("double")))
    transform(summed, x => x / n)
  }
}
