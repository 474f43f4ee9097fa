package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.VectorOps.cosineF32

/** Semantic deduplication (Abbas et al. 2023, "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication"): documents
  * whose EMBEDDINGS nearly coincide are semantic re-phrasings that
  * n-gram dedup cannot see (translations, templated rewrites, syndicated
  * copy) — the paper clusters the embedding space with k-means and
  * drops, within each cluster, all but one member of every epsilon-ball.
  *
  * The clustering is what makes the quadratic pair search tractable:
  * candidate pairs are confined to a cluster, so the per-cluster cost is
  * |cluster|^2 and the global cost Σ|c|^2 — the operator's scale knob is
  * the centroid count (paper: 110k clusters for LAION). This composes
  * the engine's existing deterministic pieces: [[Similarity.kMeansCentroids]]
  * (bitwise-deterministic fixed-point Lloyd) for the clusters, the
  * codegen'd [[graft.expr.VectorOps.cosineF32]] for the in-ball test.
  *
  * Survivor rule (deterministic, embarrassingly parallel): a vector is
  * DROPPED iff some LOWER-ID vector in the same cluster sits within
  * cosine eps — the engine's keep-first (min-id) discipline. This is
  * the one-shot parallel form of the paper's greedy: a chain a~b~c with
  * a!~c keeps a AND c (b's drop does not resurrect c's comparison —
  * no sequential dependency, so the decision is a pure pairwise
  * function and the plan is one self-join). Exactly reproducible across
  * partitionings and engines.
  *
  * 100-TB notes: both join sides shuffle once on centroid_id; a skewed
  * (hot) cluster concentrates quadratic work in one task — the fix is
  * MORE centroids (raise `maxCentroids`, the paper's 110k-cluster
  * knob; k stays a constant independent of n, see
  * [[Similarity.MaxCentroids]]), which is also what recall wants;
  * [[Skew]]'s salted patterns do not apply because the predicate needs
  * the full cluster co-located. Null embeddings carry no semantic
  * evidence and are excluded from the output (callers union them back
  * under their own policy).
  */
object SemDedup {

  /** (idCol, centroid_id, keep) for every row with a non-null
    * embedding. `eps` is the cosine duplicate threshold (paper sweeps
    * 0.9-0.99); `stride`/`iters` parameterize the k-means exactly as
    * [[Similarity.kMeansCentroids]]. */
  def semDedup(corpus: DataFrame, eps: Double, stride: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCentroids: Int = Similarity.MaxCentroids): DataFrame = {
    require(eps > 0.0 && eps <= 1.0, s"eps must be in (0, 1], got $eps")
    val cents = Similarity.kMeansCentroids(corpus, stride, iters,
      idCol, vecCol, maxCentroids)
    // assigned twice below (join left side + survivor base) — persist
    // so the centroid-nearest expression (dim × centroids work per
    // row) runs once per row, not three times
    val assigned = Similarity.assignToCentroids(corpus, cents,
        idCol, vecCol)
      .where(col("centroid_id").isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col("centroid_id"))
    // release-BEFORE-persist (the pageRankFixed ordering)
    lastRelease.swap(assigned.sparkSession,
      () => { assigned.unpersist(); () })
    assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val right = assigned.select(col("centroid_id"),
      col("id").as("rid"), col("vec").as("rvec"))
    val dropped = assigned.join(right, "centroid_id")
      .where(col("rid") < col("id") &&
        cosineF32(col("vec"), col("rvec")) >= lit(eps))
      .select("id").distinct()
    assigned
      .join(dropped.withColumn("__dup", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("centroid_id"),
        col("__dup").isNull.as("keep"))
  }

  /** The consuming form: `corpus` minus the dropped epsilon-duplicates.
    * Rows with a NULL embedding are duplicates of nothing and pass
    * through untouched (semDedup excludes them from its keep frame, so
    * a bare semi-join would silently delete them — `keepNullVectors =
    * false` opts into that stricter "must have semantic evidence"
    * reading). */
  def dedupSemantic(corpus: DataFrame, eps: Double, stride: Int,
      iters: Int, idCol: String = "vec_id",
      vecCol: String = "embedding",
      keepNullVectors: Boolean = true,
      maxCentroids: Int = Similarity.MaxCentroids): DataFrame = {
    val keep = semDedup(corpus, eps, stride, iters, idCol, vecCol,
        maxCentroids)
      .where(col("keep")).select(col(idCol))
    val survivors = corpus.join(keep, Seq(idCol), "left_semi")
    if (keepNullVectors)
      survivors.unionByName(corpus.where(col(vecCol).isNull))
    else survivors
  }

  private val lastRelease = ReleaseSlot()
}
