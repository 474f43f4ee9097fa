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
  * DUPLICATION-ADAPTIVE (round 16, the q44/q68 census discipline):
  * byte-identical embeddings are equidistant to every centroid and land
  * whole in ONE cluster at ANY centroid count — raising `maxCentroids`
  * (the skew knob for merely-dense regions) provably cannot split an
  * exact-duplicate clique, so without contraction a d-member clique
  * pays d² candidate rows in the pair join (measured at the 100×
  * mass-dup tier: 1.81B candidates, max clique 13,200). Identical
  * vectors have a provably in-ball cosine, so every non-min-id member
  * of a duplicate class drops for any eps and only the min-id
  * representative needs to compete in the |c|² term. A one-scan census
  * over the persisted assignment (xxhash64 of the vector — routing
  * only; the contraction groups by the FULL vector, so a digest
  * collision costs a wasted groupBy, never correctness) decides the
  * path: a dup-free corpus keeps the original plan verbatim, a
  * duplicated one contracts classes to representatives and re-expands
  * non-reps as keep=false through an id-keyed anti join (no per-class
  * arrays — clique size never materializes in a single row or task).
  *
  * 100-TB notes: both join sides shuffle once on centroid_id; a merely
  * DENSE (non-identical) hot cluster's fix is MORE centroids (raise
  * `maxCentroids`, the paper's 110k-cluster knob; k stays a constant
  * independent of n, see [[Similarity.MaxCentroids]]), which is also
  * what recall wants — while an exact-DUPLICATE hot cluster is immune
  * to k by construction and is exactly what the census contraction
  * absorbs (the class groupBy shuffles the vector payload once; its
  * key cardinality is the distinct-vector count, and the pair join's
  * Σ|c|² term runs over representatives, i.e. distinct vectors, not
  * raw rows). [[Skew]]'s salted patterns do not apply because the
  * in-ball predicate needs the full cluster co-located. Null
  * embeddings carry no semantic evidence and are excluded from the
  * output (callers union them back under their own policy).
  */
object SemDedup {

  /** Corpus size (non-null vectors) at or below which [[semDedup]]
    * skips its exact contraction-gate job and runs the original
    * cluster-confined pair join directly. The bound is read from the
    * k-means build's free-rider observation (EXACT count, zero extra
    * jobs), so the skip costs nothing to decide; the worst case it
    * admits is bounded by construction at floor² ≈ 6.7×10⁷ candidate
    * rows (a sub-floor corpus that is one giant byte-identical
    * clique — the measured 100× tier ran 27× that, uncontracted, in
    * 47 s, so the boundary is single-digit seconds). Any corpus
    * larger than the floor gets the exact gate: the quadratic pair
    * term it guards cannot ride an approximate sketch at scale —
    * a relative-error estimate leaves room for a hidden Θ(εn) clique
    * whose ε²n² pair mass grows without bound. */
  val GateFloor: Long = 1L << 13

  /** (idCol, centroid_id, keep) for every row with a non-null
    * embedding. `eps` is the cosine duplicate threshold (paper sweeps
    * 0.9-0.99); `stride`/`iters` parameterize the k-means exactly as
    * [[Similarity.kMeansCentroids]]. */
  def semDedup(corpus: DataFrame, eps: Double, stride: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCentroids: Int = Similarity.MaxCentroids): DataFrame =
    semDedupGated(corpus, eps, stride, iters, idCol, vecCol,
      maxCentroids, GateFloor)

  /** [[semDedup]] with the gate floor injectable — specs force the
    * contraction machinery on toy corpora with `gateFloor = 0`. The
    * floor is ROUTING-ONLY: both paths produce identical keep bits
    * (the parity spec pins contracted vs uncontracted vs floored). */
  private[graft] def semDedupGated(corpus: DataFrame, eps: Double,
      stride: Int, iters: Int, idCol: String, vecCol: String,
      maxCentroids: Int, gateFloor: Long): DataFrame = {
    require(eps > 0.0 && eps <= 1.0, s"eps must be in (0, 1], got $eps")
    val sess = corpus.sparkSession
    // Census placement (round-16 verdict item 4 / advice, final
    // round-17 form): NO standalone census job anywhere in the call
    // chain. The k-means build self-censuses as a free-rider
    // observation on its own init sampling scan (see
    // kMeansCentroidsCensused — approximate, safe there because a
    // missed k-means contraction costs linear iteration time), and
    // THIS operator's exact gate — which guards a QUADRATIC pair term
    // and therefore cannot ride an approximate sketch — runs below as
    // one aggregate over the persisted assignment (where it doubles
    // as the persist's materializing action instead of re-scanning
    // the corpus parquet), and ONLY for corpora past [[GateFloor]],
    // whose exact size the observation already measured. Sub-floor
    // corpora (every driver sf tier) pay ZERO census/gate jobs where
    // round 16 paid two — the round-15 action chain exactly.
    val (cents, census) = Similarity.kMeansCentroidsObserved(corpus,
      stride, iters, idCol, vecCol, maxCentroids, knownDupRows = None)
    // assigned is read several times below (both join sides, survivor
    // base) — persist so the centroid-nearest expression (dim ×
    // centroids work per row) runs once per row
    val assigned = Similarity.assignToCentroids(corpus, cents,
        idCol, vecCol)
      .where(col("centroid_id").isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("vec"),
        col("centroid_id"))
    // release-BEFORE-persist (the pageRankFixed ordering); the hook is
    // registered immediately — any later action can throw
    lastRelease.releasePrevious(sess)
    assigned.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lastRelease.set(sess, () => { assigned.unpersist(); () })
    // Sub-floor corpora skip the gate job entirely (see [[GateFloor]]
    // — the worst case this admits is floor²-bounded); a missing
    // census (knownDupRows callers) conservatively runs the gate.
    if (census.exists(_._1 <= gateFloor)) {
      return pairKeep(assigned, eps).select(col("id").as(idCol),
        col("centroid_id"), col("keep"))
    }
    // Exact contraction gate over the assignment (its row domain IS
    // the raw corpus's non-null vectors — a non-null vector always
    // gets a centroid): any duplicated vector class engages the
    // contraction, EXCEPT when ids repeat — the anti-join
    // re-expansion collapses a repeated id's rows where the original
    // plan emits one output row per input row (same degenerate
    // boundary adaptiveSelfPairs documents), so repeated ids keep the
    // uncontracted plan. xxhash64 stands in for the full vector on
    // the dup-detection side only (a collision can engage the
    // contraction spuriously — the contraction itself groups by the
    // FULL vector, so the result is identical either way).
    val tot = assigned.agg(count(lit(1)).as("nb"),
      count_distinct(col("id")).as("nids"),
      count_distinct(xxhash64(col("vec"))).as("ndg")).head()
    val contractable =
      tot.getLong(0) > tot.getLong(2) && tot.getLong(0) == tot.getLong(1)
    if (!contractable) {
      return pairKeep(assigned, eps).select(col("id").as(idCol),
        col("centroid_id"), col("keep"))
    }
    // Contraction pre-pass. Eligibility is the row-local predicate the
    // original plan would evaluate for an identical pair — cosineF32
    // is a deterministic function of its operands, so computing it on
    // (vec, vec) decides EXACTLY whether the uncontracted plan drops a
    // class's non-rep members: eps at the float boundary of 1.0 and
    // degenerate zero vectors (cosine 0.0 < eps) route to the
    // uncontracted side; NaN-bearing vectors have cosineF32(v,v) = NaN,
    // which under Spark's NaN-as-largest ordering satisfies NaN >= eps
    // and takes the CONTRACTED side — still exact, because the pair
    // join's predicate applies the same NaN semantics to every pair a
    // class member participates in, so dropping non-reps and competing
    // via the rep reproduces the uncontracted keep bits (spec-pinned
    // NaN case, round 17). Null-cosine rows — null vec elements —
    // route uncontracted via the coalesce.
    val sd = coalesce(cosineF32(col("vec"), col("vec")) >= lit(eps),
      lit(false))
    val reps = assigned.where(sd)
      .groupBy("vec")
      .agg(min(col("id")).as("id"), min(col("centroid_id"))
        .as("centroid_id"))
      .select(col("id"), col("vec"), col("centroid_id"))
    // base = class representatives + rows contraction must not touch.
    // Read three times by pairKeep and once by the re-expansion —
    // persist, and widen the release hook to cover it.
    val base = reps.unionByName(assigned.where(!sd))
    base.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lastRelease.set(sess,
      () => { assigned.unpersist(); base.unpersist(); () })
    // Why this is exact: all members of a vec class share every cosine
    // (to centroids and to any third vector), hence share centroid_id
    // — so (1) a non-rep member m is dropped by the original plan (its
    // rep is a lower-id cluster-mate within eps, by the sd gate) and
    // is emitted keep=false here; (2) a base row x is dropped by the
    // original plan iff some lower-id row y in its cluster is in-ball,
    // and y's class rep — with rep.id <= y.id < x.id and the same
    // cosine to x — witnesses the same drop among representatives, so
    // the contracted pair join computes the identical keep bit.
    val repKeep = pairKeep(base, eps)
    // id-keyed anti join, deliberately NOT a per-class member array:
    // a collect_list re-expansion puts the largest clique in one
    // aggregation buffer, exactly the skew contraction neutralizes.
    val others = assigned.select(col("id"), col("centroid_id"))
      .join(base.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("centroid_id"), lit(false).as("keep"))
    repKeep.unionByName(others)
      .select(col("id").as(idCol), col("centroid_id"), col("keep"))
  }

  /** The cluster-confined epsilon-ball keep computation over a
    * prepared (id, vec, centroid_id) frame — the operator's original
    * plan, factored so the dup-free and contracted paths share it.
    * Returns (id, centroid_id, keep). */
  private def pairKeep(frame: DataFrame, eps: Double): DataFrame = {
    val right = frame.select(col("centroid_id"),
      col("id").as("rid"), col("vec").as("rvec"))
    val dropped = frame.join(right, "centroid_id")
      .where(col("rid") < col("id") &&
        cosineF32(col("vec"), col("rvec")) >= lit(eps))
      .select("id").distinct()
    frame
      .join(dropped.withColumn("__dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("centroid_id"),
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
