package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star: similarity search as a first-class
  * operator). Three tiers:
  *
  *  - bruteForceTopK: exact; broadcast the (small) query set and scan the
  *    corpus once — at 100 TB the corpus side stays partitioned and is
  *    read exactly once, no shuffle of the big side.
  *  - ivfTopK: IVF-style — assign corpus vectors to nearest centroid
  *    (small broadcast), probe only nProbe centroid buckets per query;
  *    corpus scan is pruned by the bucket partition filter.
  *  - hyperplane LSH signature (used by Dedup.embeddingNearDupPairs) for
  *    bucketed pair generation.
  *
  * All vector math is codegen'd Column expressions (zip_with/aggregate).
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (broadcast); corpus is scanned once
    * and only (query x corpus) scores within the same partition are
    * materialized before the per-query top-k window. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    // rank on the ROUNDED score (4 dp) with id tie-break: float-sum noise
    // across engines/partitionings is ~1e-12, far below the rounding
    // granularity, so ranks are reproducible bit-for-bit.
    val scored = c.crossJoin(broadcast(q))
      .where(col("c_id") =!= col("q_id"))
      .withColumn("score", round(cosine(col("q_vec"), col("c_vec")) + 1e-9, 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("score"), col("rank"))
  }

  /** Deterministic centroid pick: every `stride`-th vector by id. (A real
    * deployment would k-means; for a deterministic, oracle-checkable
    * engine the sampled-centroid IVF preserves the plan shape — broadcast
    * centroids, bucket pruning — which is what matters at scale.) */
  def sampleCentroids(corpus: DataFrame, stride: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.where(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))

  /** Assign each corpus vector to its nearest centroid (broadcast join +
    * per-vector argmax window). Output: corpus columns + centroid_id. */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(centroids))
      .withColumn("c_score", cosine(col(vecCol), col("centroid_vec")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("c_score").desc, col("centroid_id").asc)
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .drop("rn", "c_score", "centroid_vec")
  }

  /** IVF top-k: probe the `nProbe` nearest centroid buckets per query,
    * scoring only vectors in those buckets. Approximate (recall < 1 when
    * the true neighbor lives in an unprobed bucket) but the scan is pruned
    * by bucket — the 100-TB-scale path. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, stride: Int,
      nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centroids = sampleCentroids(corpus, stride, idCol, vecCol)
    val assigned = assignToCentroids(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
        col("centroid_id"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    // which buckets does each query probe?
    val qScored = q.crossJoin(broadcast(centroids))
      .withColumn("c_score", cosine(col("q_vec"), col("centroid_vec")))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("c_score").desc, col("centroid_id").asc)
    val probes = qScored.withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nProbe)
      .select(col("q_id"), col("q_vec"), col("centroid_id"))
    val scored = probes.join(assigned, "centroid_id")
      .where(col("c_id") =!= col("q_id"))
      .withColumn("score", cosine(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("c_id"),
        round(col("score") + 1e-9, 4).as("score"), col("rank"))
  }

  /** Random-hyperplane LSH signature: sign bit of the dot product against
    * `planes` deterministic pseudo-random hyperplanes, packed into a long.
    * Hyperplane components are derived from xxhash64(seed, dim) — fixed
    * and reproducible, no stored model. */
  def hyperplaneSignature(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      // pseudo-random +-1 component per (plane, dimension): sign of
      // xxhash64(p, i). aggregate over zip of (value, index).
      val dotp = aggregate(
        zip_with(vec, transform(vec, (_, i) => i),
          (v, i) => v.cast("double") *
            when(xxhash64(lit(p), i) % 2 === 0, 1.0).otherwise(-1.0)),
        lit(0.0), (acc, x) => acc + x)
      when(dotp >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }
}
