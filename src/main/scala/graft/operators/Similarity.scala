package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.VectorOps.cosineF32

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star: similarity search as a first-class
  * operator). Three tiers:
  *
  *  - bruteForceTopK: exact; broadcast the (small) query set and scan the
  *    corpus once — at 100 TB the corpus side stays partitioned and is
  *    read exactly once, no shuffle of the big side.
  *  - ivfTopK: IVF-style — centroid assignment happens MAP-SIDE (the
  *    small centroid set is inlined into a codegen'd argmax expression,
  *    no crossJoin/window shuffle); queries probe only nProbe buckets,
  *    so the pair join touches a pruned slice of the corpus.
  *  - hyperplane LSH signature (used by Dedup.embeddingNearDupPairs) for
  *    bucketed pair generation.
  *
  * All scoring goes through the codegen'd CosineSimF32 expression
  * (graft.expr.VectorOps) — higher-order-function lambdas are interpreted
  * per element and were 3-10x slower in the sf0.1 bench.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    * `queries` is expected to be small (broadcast); corpus is scanned
    * once. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    // rank on the ROUNDED score (4 dp) with id tie-break: float-sum noise
    // across engines/partitionings is ~1e-12, far below the rounding
    // granularity, so ranks are reproducible bit-for-bit.
    val scored = c.crossJoin(broadcast(q))
      .where(col("c_id") =!= col("q_id"))
      .withColumn("score", round(cosineF32(col("q_vec"), col("c_vec")) + 1e-9, 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("score"), col("rank"))
  }

  /** Deterministic centroid pick: every `stride`-th vector by id. (A real
    * deployment would k-means; for a deterministic, oracle-checkable
    * engine the sampled-centroid IVF preserves the plan shape — map-side
    * assignment, bucket pruning — which is what matters at scale.) */
  def sampleCentroids(corpus: DataFrame, stride: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.where(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))

  /** Lloyd refinement of the stride-sampled centroids: fixed iteration
    * count, cosine assignment (map-side, zero-shuffle), mean recompute
    * as one groupBy per iteration. Each Spark job is bounded: iters x
    * (scan + one shuffle on centroid_id). Empty clusters keep their
    * previous centroid (stable ids). The structure (sample, assignment,
    * iteration count) is deterministic, but avg() accumulates floats in
    * shuffle-partition order, so refined centroids are reproducible only
    * to float tolerance, not bitwise (ADVICE r2) — queries that need
    * hash-stable output should use the unrefined sampleCentroids tier.
    * Better-fitting centroids raise IVF recall at the same nProbe
    * (pinned by ApproxQualitySpec). */
  def kMeansCentroids(corpus: DataFrame, stride: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    var cents = collectCentroids(
      sampleCentroids(corpus, stride, idCol, vecCol))
    require(cents.nonEmpty,
      s"kMeansCentroids: no centroids sampled — corpus is empty or no " +
        s"$idCol is divisible by stride=$stride")
    val dim = cents.headOption.map(_._2.length).getOrElse(0)
    (0 until iters).foreach { _ =>
      val assigned = corpus.withColumn("centroid_id",
        array_max(centroidStructs(col(vecCol), cents)).getField("cid"))
      val meanCols = (0 until dim).map(i =>
        avg(element_at(col(vecCol), i + 1)).as(s"m$i"))
      val means = assigned.groupBy("centroid_id")
        .agg(meanCols.head, meanCols.tail: _*)
        .collect()
        .map { r =>
          (r.getLong(0), (0 until dim).map(i =>
            r.getDouble(i + 1).toFloat): Seq[Float])
        }.toMap
      cents = cents.map { case (cid, old) =>
        (cid, means.getOrElse(cid, old))
      }
    }
    val rows = cents.map { case (cid, v) => (cid, v) }.toSeq
    val spark = corpus.sparkSession
    import spark.implicits._
    rows.toDF("centroid_id", "centroid_vec")
      .select(col("centroid_id"),
        col("centroid_vec").cast(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)).as("centroid_vec"))
  }

  /** ivfTopK over k-means-refined centroids (same probe/prune plan
    * shape; only the centroid table differs). */
  def ivfTopKRefined(corpus: DataFrame, queries: DataFrame, k: Int,
      stride: Int, nProbe: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val cents = collectCentroids(
      kMeansCentroids(corpus, stride, iters, idCol, vecCol))
    ivfTopKWith(corpus, queries, k, nProbe, cents, idCol, vecCol)
  }

  /** Inline the (small) centroid set into a per-row scored-struct array:
    * struct(score, -id, id) so array_max/sort_array break ties toward the
    * smaller centroid id. Pure codegen'd expression — assignment costs
    * zero shuffles. Suitable up to a few thousand centroids (beyond that,
    * switch to a broadcast join + max_by aggregation). */
  private def centroidStructs(vec: Column,
      cents: Array[(Long, Seq[Float])]): Column =
    array(cents.map { case (cid, cvec) =>
      struct(cosineF32(vec, typedlit(cvec)).as("s"),
        lit(-cid).as("negid"), lit(cid).as("cid"))
    }: _*)

  /** Assign each corpus vector to its nearest centroid, map-side. */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = collectCentroids(centroids)
    corpus.withColumn("centroid_id",
      array_max(centroidStructs(col(vecCol), cents)).getField("cid"))
  }

  private def collectCentroids(centroids: DataFrame)
      : Array[(Long, Seq[Float])] =
    centroids.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toIndexedSeq))

  /** IVF top-k: probe the `nProbe` nearest centroid buckets per query,
    * scoring only vectors in those buckets. Approximate (recall < 1 when
    * the true neighbor lives in an unprobed bucket) but the corpus scan
    * is pruned by bucket — the 100-TB-scale path. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, stride: Int,
      nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = collectCentroids(
      sampleCentroids(corpus, stride, idCol, vecCol))
    ivfTopKWith(corpus, queries, k, nProbe, cents, idCol, vecCol)
  }

  private def ivfTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int, cents: Array[(Long, Seq[Float])], idCol: String,
      vecCol: String): DataFrame = {
    val assigned = corpus
      .withColumn("centroid_id",
        array_max(centroidStructs(col(vecCol), cents)).getField("cid"))
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
        col("centroid_id"))
    // nProbe nearest centroids per query: sort the same scored-struct
    // array descending, slice, project ids — still map-side
    val probeIds = transform(
      slice(reverse(array_sort(centroidStructs(col("q_vec"), cents))),
        1, nProbe),
      s => s.getField("cid"))
    val probes = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("centroid_id", explode(probeIds))
    val scored = probes.join(assigned, "centroid_id")
      .where(col("c_id") =!= col("q_id"))
      .withColumn("score", cosineF32(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("c_id"),
        round(col("score") + 1e-9, 4).as("score"), col("rank"))
  }

  /** Random-hyperplane LSH signature: sign bit of the dot product against
    * `planes` deterministic pseudo-random +-1 hyperplanes, packed into a
    * long. Components derive from a seeded murmur of (plane, dim) —
    * fixed and reproducible, no stored model. Single JVM pass per row:
    * the higher-order-function formulation (zip_with + aggregate per
    * plane) paid interpreted per-element overhead x planes x join sides
    * (see ARCHITECTURE "HOF lambda trap"). */
  private def hyperplaneUdf(planes: Int) =
    org.apache.spark.sql.functions.udf { (vec: Seq[Float]) =>
      var sig = 0L
      var p = 0
      while (p < planes) {
        var dotp = 0.0
        var i = 0
        val n = vec.length
        while (i < n) {
          val h = scala.util.hashing.MurmurHash3
            .productHash((p, i), 0x9e3779b9)
          dotp += vec(i).toDouble * (if ((h & 1) == 0) 1.0 else -1.0)
          i += 1
        }
        if (dotp >= 0) sig |= (1L << p)
        p += 1
      }
      sig
    }

  def hyperplaneSignature(vec: Column, planes: Int): Column =
    hyperplaneUdf(planes)(vec)
}
