package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

import graft.expr.VectorOps.cosineF32

/** Approximate-nearest-neighbor search over an embedding column
  * (BASELINE.json north star: similarity search as a first-class
  * operator). Three tiers:
  *
  *  - bruteForceTopK: exact; broadcast the (small) query set and scan the
  *    corpus once — at 100 TB the corpus side stays partitioned and is
  *    read exactly once, no shuffle of the big side.
  *  - ivfTopK: IVF-style — centroid assignment happens MAP-SIDE (one
  *    tight-loop pass per row against the closure-captured centroid
  *    matrix, no crossJoin/window shuffle); queries probe only nProbe
  *    buckets, so the pair join touches a pruned slice of the corpus.
  *  - hyperplane LSH signature (used by Dedup.embeddingNearDupPairs) for
  *    bucketed pair generation.
  *
  * All scoring goes through the codegen'd CosineSimF32 expression
  * (graft.expr.VectorOps) — higher-order-function lambdas are interpreted
  * per element and were 3-10x slower in the sf0.1 bench.
  */
object Similarity {

  /** Default cap on the centroid count (round-15 verdict item 1). The
    * pre-cap design sampled every stride-th vector, so the centroid
    * count grew as n/stride — an O(n²·dim/stride) assignment term and
    * an O(n/stride) driver-collected centroid matrix, measured at 100×
    * as the suite's two slowest queries (q76 86.2 s, q91 66.2 s; the
    * k-means+assign stages were 64 of q91's 66 s). With the cap, k is
    * INDEPENDENT of the corpus: index-build cost is O(n·k·dim) and the
    * driver/broadcast state is O(k·dim) no matter how large the corpus
    * grows — the FAISS discipline (nlist is a tuning constant, not a
    * function of n). 1000 centroids ≈ FAISS's sqrt(n) guidance for
    * corpora around 10⁶; production callers size it per corpus. */
  val MaxCentroids = 1000

  /** The stride that [[sampleCentroids]] ACTUALLY applies: wide enough
    * that at most ~maxCentroids ids satisfy `id % effStride == 0` on a
    * dense id domain [0, n). Pure integer arithmetic — ceil(n/maxC) via
    * (n + maxC - 1) / maxC — so DuckDB replays it exactly (the oracle
    * CTE computes greatest(stride, (count(*) + maxC - 1) // maxC));
    * no float rounding can diverge between engines. */
  def effectiveStride(n: Long, stride: Int, maxCentroids: Int): Long = {
    require(stride >= 1, s"stride must be >=1, got $stride")
    require(maxCentroids >= 1,
      s"maxCentroids must be >=1, got $maxCentroids")
    math.max(stride.toLong, (n + maxCentroids - 1) / maxCentroids)
  }

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

  /** Deterministic centroid pick: every effective-stride-th vector by
    * id, where the effective stride widens past `stride` whenever the
    * plain stride would exceed `maxCentroids` centroids (see
    * [[effectiveStride]]). (A real deployment would k-means; for a
    * deterministic, oracle-checkable engine the sampled-centroid IVF
    * preserves the plan shape — map-side assignment, bucket pruning —
    * which is what matters at scale.) Costs one count() of the corpus
    * — a metadata-cheap parquet count next to the assignment pass the
    * centroids exist for. */
  def sampleCentroids(corpus: DataFrame, stride: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCentroids: Int = MaxCentroids): DataFrame =
    sampleCentroidsOver(corpus, corpus, stride, idCol, vecCol,
      maxCentroids)

  /** [[sampleCentroids]] whose stride FILTER reads `scanFrame` — the
    * corpus possibly wrapped in an `observe()` census (see
    * [[kMeansCentroidsCensused]]) — while the stride-widening count
    * reads the bare `countFrame`. The split matters: an Observation
    * completes with the FIRST action on its plan, so the count (a
    * metadata-cheap parquet job) must not consume the observation
    * that belongs to the full sampling scan. The stride filter stays
    * ABOVE the CollectMetrics barrier (Catalyst does not push
    * predicates through it — behavior-asserted in ApproxQualitySpec:
    * the observed count equals the full corpus, not the sample), so
    * the observation sees every corpus row. */
  private[graft] def sampleCentroidsOver(scanFrame: DataFrame,
      countFrame: DataFrame, stride: Int, idCol: String,
      vecCol: String, maxCentroids: Int): DataFrame = {
    val es = effectiveStride(countFrame.count(), stride, maxCentroids)
    scanFrame.where(pmod(col(idCol), lit(es)) === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
  }

  /** Lloyd refinement of the stride-sampled centroids: fixed iteration
    * count, cosine assignment (map-side, zero-shuffle), mean recompute
    * as one groupBy per iteration. Each Spark job is bounded: iters x
    * (scan + one shuffle on centroid_id). Empty clusters keep their
    * previous centroid (stable ids).
    *
    * BITWISE RUN-TO-RUN DETERMINISTIC (closes ADVICE r2): the per-
    * cluster mean is computed by quantizing each coordinate to 24-bit
    * fixed point and summing LONGS — integer addition is associative
    * and commutative, so no shuffle order, partition count, or AQE
    * re-plan can change the result, unlike float avg() whose
    * accumulation order leaks into the low mantissa bits. Quantization
    * error is <=2^-25 per element — orders below any centroid-movement
    * tolerance (ApproxQualitySpec's recall floor pins quality). The
    * long sum saturates only past 2^38 rows per cluster per unit
    * coordinate range — far beyond a realistic cluster (weighted or
    * not: the contracted path's w×q mass equals the raw rows' total).
    *
    * DUPLICATION-ADAPTIVE (round 16): Lloyd's per-row contribution is
    * exactly linear — a row contributes quantize(x_i) to its cluster's
    * sums and 1 to its counts, so m byte-identical rows contribute
    * m × quantize(x_i) and m, both EXACT in long arithmetic — and the
    * assignment is a pure function of the vector, so identical rows
    * always land in the same cluster. A ZERO-JOB census (round 17:
    * an observe() riding the init sampling scan — xxhash64 +
    * approx_count_distinct, routing-only; the contraction groups by
    * the FULL vector) therefore lets a duplicated corpus run every
    * iteration
    * over (distinct vector, multiplicity) pairs with the weighted
    * aggregate, producing BIT-IDENTICAL centroids to the raw-row plan
    * the DuckDB oracle replays, while the per-iteration scan drops
    * from n rows to the distinct-vector count (100× mass-dup tier:
    * 200k → 2k rows per iteration). Dup-free corpora keep the raw
    * plan with nothing persisted. The stride-sampled INIT always
    * reads raw rows — the sampled set is id-determined, not
    * vector-determined. */
  def kMeansCentroids(corpus: DataFrame, stride: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCentroids: Int = MaxCentroids): DataFrame =
    kMeansCentroidsCensused(corpus, stride, iters, idCol, vecCol,
      maxCentroids, knownDupRows = None)

  /** Relative-error target for the free-rider duplication census:
    * `approx_count_distinct`'s HLL++ rsd. 2% keeps the sketch tiny
    * while the contraction verdict only asks "is a MATERIAL fraction
    * of the corpus duplicated" — see [[kMeansCentroidsCensused]]. */
  private val CensusRsd = 0.02

  /** [[kMeansCentroids]] with the duplication census decision
    * exposed. `knownDupRows = Some(d)` is a caller's own verdict
    * (contract iff d > 0 — SemDedup's spec pins both forced paths);
    * `None` self-censuses at ZERO extra jobs (round-16 verdict item
    * 4 / advice, closing the "every call pays a census scan even
    * dup-free" waste): an `observe()` on the init sampling scan —
    * which already reads every corpus row, the stride filter being
    * un-pushable — collects exact non-null count and an HLL++
    * distinct-hash estimate as free-rider metrics, and the build
    * contracts iff the estimated duplicated-row mass clears a noise
    * floor (nb − approx_distinct > nb/10 + 64, i.e. ~10% of the
    * corpus, far above the 3×rsd HLL band). The approximate verdict
    * is SAFE here in a way it would not be for SemDedup's pair join:
    * a missed contraction costs at most `iters` raw-row scans
    * (linear, the pre-round-16 plan), never a quadratic pair term —
    * and a spurious contraction only reshapes the iteration input,
    * because either path produces BIT-IDENTICAL centroids (the
    * weighted-sum lemma + forced-path equality, ApproxQualitySpec).
    * Mass-duplication shapes (the 100× replica tier: 200k rows, 2k
    * distinct) clear the floor by orders of magnitude; dup-free and
    * trace-duplication corpora (every driver sf tier) route raw with
    * no census job at all. */
  private[graft] def kMeansCentroidsCensused(corpus: DataFrame,
      stride: Int, iters: Int, idCol: String, vecCol: String,
      maxCentroids: Int, knownDupRows: Option[Long]): DataFrame =
    kMeansCentroidsObserved(corpus, stride, iters, idCol, vecCol,
      maxCentroids, knownDupRows)._1

  /** [[kMeansCentroidsCensused]] that ALSO hands the caller the
    * free-rider census it collected — `Some((nb, approxDistinct))`
    * over non-null vectors when self-censusing, `None` when the
    * caller supplied the verdict. SemDedup uses the EXACT `nb` to
    * size its own contraction-gate decision without any extra job. */
  private[graft] def kMeansCentroidsObserved(corpus: DataFrame,
      stride: Int, iters: Int, idCol: String, vecCol: String,
      maxCentroids: Int, knownDupRows: Option[Long])
      : (DataFrame, Option[(Long, Long)]) = {
    // census over NON-NULL vectors only (round 17): null embeddings
    // assign to no cluster, so their duplication cannot make the
    // contracted iteration any smaller.
    val obs = knownDupRows match {
      case Some(_) => None
      case None => Some(org.apache.spark.sql.Observation())
    }
    val scan = obs.map(o => corpus.observe(o,
        count(when(col(vecCol).isNotNull, lit(1))).as("nb"),
        approx_count_distinct(when(col(vecCol).isNotNull,
          xxhash64(col(vecCol))), CensusRsd).as("andg")))
      .getOrElse(corpus)
    var cents = collectCentroids(sampleCentroidsOver(scan, corpus,
      stride, idCol, vecCol, maxCentroids))
    require(cents.nonEmpty,
      s"kMeansCentroids: no centroids sampled — corpus is empty or no " +
        s"$idCol is divisible by stride=$stride")
    val dim = cents.headOption.map(_._2.length).getOrElse(0)
    val scale = (1L << 24).toDouble
    // the sampling collect above completed the observation
    val census: Option[(Long, Long)] = obs.map { o =>
      val m = o.get
      (m("nb").asInstanceOf[Long], m("andg").asInstanceOf[Long])
    }
    val shouldContract = knownDupRows match {
      case Some(d) => d > 0L
      case None =>
        census.exists { case (nb, andg) => nb - andg > nb / 10L + 64L }
    }
    // contracted iteration input, persisted across the iters loop and
    // released synchronously before return (every loop action fully
    // materializes, so no lazy reader can outlive the call)
    val contracted: Option[DataFrame] =
      if (!shouldContract) None
      else {
        val d = corpus.select(col(vecCol)).groupBy(vecCol)
          .agg(count(lit(1)).as("__w"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        d.count()
        Some(d)
      }
    val iterFrame = contracted.getOrElse(corpus)
    try {
    (0 until iters).foreach { _ =>
      val assigned = iterFrame.withColumn("centroid_id",
        nearestCol(iterFrame, cents, col(vecCol)))
      // O(1) per-cluster lookup for the mean recompute below — the
      // earlier cents.find(_._1 == cid) was O(k) per cluster, O(k²)
      // per iteration of pure driver time
      val centMap: Map[Long, Seq[Float]] = cents.toMap
      // ONE aggregate expression regardless of dim: the earlier
      // per-coordinate form (2 x dim sum/count columns) fell out of
      // whole-stage codegen at real dims (dim=768 => 1,536 agg
      // expressions, 64KB method limits) and re-evaluated element_at
      // per coordinate. QuantizedVectorSum walks each vector once and
      // keeps the same numerics (fixed-point long sums) and the same
      // ragged/null semantics (per-coordinate non-null counts, so a
      // cluster containing short vectors divides each coordinate by
      // its own support instead of dragging it toward 0).
      // null embeddings assign to NO bucket (null centroid_id): drop
      // that group before collecting — getLong on a null key would NPE
      // the driver
      val sumAgg =
        if (contracted.isDefined)
          graft.expr.VectorAgg
            .quantizedSumCountWeighted(col(vecCol), scale, col("__w"))
        else graft.expr.VectorAgg.quantizedSumCount(col(vecCol), scale)
      val means = assigned
        .where(col("centroid_id").isNotNull)
        .groupBy("centroid_id")
        .agg(sumAgg.as("sc"))
        .select(col("centroid_id"), col("sc.sums"), col("sc.counts"))
        .collect()
        .map { r =>
          val cid = r.getLong(0)
          val sums = r.getSeq[Long](1)
          val counts = r.getSeq[Long](2)
          val old = centMap.getOrElse(cid, Seq.fill(dim)(0.0f))
          (cid, (0 until dim).map { i =>
            // coordinate with no support in this cluster (all-null or
            // past every member's length): keep the previous centroid
            // value (matches empty-cluster handling)
            if (i >= counts.length || counts(i) == 0L) old(i)
            else (sums(i) / scale / counts(i)).toFloat
          }: Seq[Float])
        }.toMap
      cents = cents.map { case (cid, old) =>
        (cid, means.getOrElse(cid, old))
      }
    }
    } finally contracted.foreach(_.unpersist())
    val rows = cents.map { case (cid, v) => (cid, v) }.toSeq
    val spark = corpus.sparkSession
    import spark.implicits._
    val df = rows.toDF("centroid_id", "centroid_vec")
      .select(col("centroid_id"),
        col("centroid_vec").cast(
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)).as("centroid_vec"))
    (df, census)
  }

  /** IVF-PQ top-k: bucket pruning (IVF) over PQ-coded vectors with ADC
    * scoring — the memory-bounded 100-TB composite: the corpus index
    * carries centroid_id + m code bytes per row (32x smaller than
    * float32 at m=16, dim=64/128), queries probe nProbe buckets and
    * score candidates against the broadcast codebooks without ever
    * touching full-precision corpus vectors. FAISS's IVFPQ layout,
    * re-expressed as a pruned join + codegen-friendly scoring. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      stride: Int, nProbe: Int,
      pq: ProductQuantizer.PqModel, idCol: String = "vec_id",
      vecCol: String = "embedding",
      maxCentroids: Int = MaxCentroids): DataFrame = {
    val cents = collectCentroids(
      sampleCentroids(corpus, stride, idCol, vecCol, maxCentroids))
    val coded = corpus
      .withColumn("centroid_id", nearestCol(corpus, cents, col(vecCol)))
      .select(col(idCol).as("c_id"),
        ProductQuantizer.encode(pq)(col(vecCol)).as("codes"),
        col("centroid_id"))
    val probes = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("centroid_id",
        explode(probesCol(queries, cents, nProbe, col("q_vec"))))
    val scored = probes.join(coded, "centroid_id")
      .where(col("c_id") =!= col("q_id"))
      .withColumn("score", round(
        ProductQuantizer.adcScore(pq)(col("codes"), col("q_vec"))
          + 1e-9, 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("q_id", "c_id", "score", "rank")
  }

  /** ivfTopK over k-means-refined centroids (same probe/prune plan
    * shape; only the centroid table differs). */
  def ivfTopKRefined(corpus: DataFrame, queries: DataFrame, k: Int,
      stride: Int, nProbe: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxCentroids: Int = MaxCentroids): DataFrame = {
    val cents = collectCentroids(
      kMeansCentroids(corpus, stride, iters, idCol, vecCol, maxCentroids))
    ivfTopKWith(corpus, queries, k, nProbe, cents, idCol, vecCol)
  }

  /** Oracle-SQL generator: the DuckDB replay of [[kMeansCentroids]] —
    * kept NEXT to the Spark algebra it mirrors so they can't drift.
    * Replayable because every numeric step is contract-pinned:
    * stride-sampled init, RAW-double cosine assignment with the
    * (score DESC, cid ASC) tie-break (index-ordered sums — the q24
    * numeric precedent), per-coordinate 24-bit symmetric-half-up
    * quantized LONG sums (exact integers, associative), and the mean
    * descale `(sum / 2^24) / count` cast to float in the same
    * operation order. Empty clusters / unsupported coordinates keep
    * the previous value via the per-coordinate COALESCE. Empty-corpus
    * init mirrors [[effectiveStride]]: cents0 filters on
    * greatest(stride, ceil-div(count, maxCentroids)) computed in exact
    * integer arithmetic, so the capped selection replays too. Produces
    * CTEs `base`, `coords`, `cents0..cents{iters}`; callers append
    * their consuming SQL against `cents{iters}`. */
  def kMeansOracleCtes(stride: Int, iters: Int, dim: Int = 64,
      maxCentroids: Int = MaxCentroids): String = {
    def cos(a: String, b: String): String =
      s"""list_sum(list_transform(list_zip($a, $b),
         x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
         / (sqrt(list_sum(list_transform($a,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
            * sqrt(list_sum(list_transform($b,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"""
    val sb = new StringBuilder
    sb ++= s"""base AS (SELECT vec_id, embedding FROM embeddings),
       coords AS (
         SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
         FROM base CROSS JOIN range(1, ${dim + 1}) r(i)),
       estride AS (
         SELECT greatest($stride,
           (count(*) + ${maxCentroids - 1}) // $maxCentroids) AS es
         FROM embeddings),
       cents0 AS (
         SELECT vec_id AS cid, embedding AS cvec FROM embeddings
         WHERE vec_id % (SELECT es FROM estride) = 0)"""
    for (t <- 0 until iters) {
      sb ++= s""",
       asg$t AS (
         SELECT vec_id, cid FROM (
           SELECT b.vec_id, c.cid, row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY ${cos("b.embedding", "c.cvec")} DESC, c.cid ASC)
             AS rn
           FROM base b CROSS JOIN cents$t c) t WHERE rn = 1),
       upd$t AS (
         SELECT a.cid, co.i,
           sum(CASE WHEN co.x * 16777216.0 >= 0
               THEN CAST(floor(co.x * 16777216.0 + 0.5) AS BIGINT)
               ELSE -CAST(floor(-(co.x * 16777216.0) + 0.5) AS BIGINT)
               END) AS sq,
           count(*) AS cnt
         FROM asg$t a JOIN coords co ON co.vec_id = a.vec_id
         GROUP BY a.cid, co.i),
       cents${t + 1} AS (
         SELECT c.cid, list(CAST(COALESCE(u.sq / 16777216.0 / u.cnt,
             CAST(c.cvec[r.i] AS DOUBLE)) AS FLOAT) ORDER BY r.i)
           AS cvec
         FROM cents$t c CROSS JOIN range(1, ${dim + 1}) r(i)
         LEFT JOIN upd$t u ON u.cid = c.cid AND u.i = r.i
         GROUP BY c.cid)"""
    }
    sb.toString
  }

  // Centroid assignment / probing as codegen'd null-safe expressions:
  // null embeddings assign to no bucket (null centroid_id; explode of a
  // null probe array emits no rows) via UnaryExpression's null-safe
  // contract. The r4 ScalaUDF interlude added the same null guard but
  // paid an ArrayData -> boxed-Seq[Float] conversion per row AND broke
  // the wholestage codegen span around the corpus scan — the q25
  // 0.38 s -> 0.87 s regression. These expressions read the primitive
  // floats straight off ArrayData inside generated code.
  //
  // The scorer ships as a BROADCAST VARIABLE, not a closure capture
  // (round-15 verdict item 1): a closure-captured matrix serializes
  // into EVERY task of every stage that references the expression —
  // at k=1000 × dim=768 that is 3 MB × tasks of redundant wire+heap —
  // while a broadcast moves it to each executor once (torrent,
  // peer-to-peer) and every task reads the same deserialized object.
  // The generated code pays one Broadcast.value() indirection per row
  // against a k × dim dot-product loop — noise.
  private def nearestCol(df: DataFrame, cents: Array[(Long, Seq[Float])],
      vec: Column): Column = {
    val bc = df.sparkSession.sparkContext
      .broadcast(new CentroidScorer(cents))
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), bc))
  }

  private def probesCol(df: DataFrame, cents: Array[(Long, Seq[Float])],
      nProbe: Int, vec: Column): Column = {
    val bc = df.sparkSession.sparkContext
      .broadcast(new CentroidScorer(cents))
    ColumnBridge.column(CentroidProbes(ColumnBridge.expression(vec), bc,
      nProbe))
  }

  /** Assign each corpus vector to its nearest centroid, map-side. */
  def assignToCentroids(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = collectCentroids(centroids)
    corpus.withColumn("centroid_id", nearestCol(corpus, cents, col(vecCol)))
  }

  /** Explode each query row to its `nProbe` nearest centroid buckets
    * (map-side; one output row per probed bucket). The probe side of
    * IvfIndex.topK's DPP join. */
  def probeCentroids(queries: DataFrame, centroids: DataFrame,
      nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = collectCentroids(centroids)
    queries.withColumn("centroid_id",
      explode(probesCol(queries, cents, nProbe, col(vecCol))))
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
      vecCol: String = "embedding",
      maxCentroids: Int = MaxCentroids): DataFrame = {
    val cents = collectCentroids(
      sampleCentroids(corpus, stride, idCol, vecCol, maxCentroids))
    ivfTopKWith(corpus, queries, k, nProbe, cents, idCol, vecCol)
  }

  private def ivfTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
      nProbe: Int, cents: Array[(Long, Seq[Float])], idCol: String,
      vecCol: String): DataFrame = {
    val assigned = corpus
      .withColumn("centroid_id", nearestCol(corpus, cents, col(vecCol)))
      .select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
        col("centroid_id"))
    // nProbe nearest centroids per query — still map-side
    val probes = queries
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
      .withColumn("centroid_id",
        explode(probesCol(queries, cents, nProbe, col("q_vec"))))
    // rank on the ROUNDED score (4 dp) with id tie-break — the
    // bruteForceTopK contract, NOT the raw double: under tight
    // clusters many candidates share a 4-dp score at the rank-k
    // boundary, and raw-double ordering there made full-probe IVF
    // disagree with brute force (round-14 clustered-fixture finding:
    // nProbe = all buckets read recall 0.84, not 1.0). With one
    // contract, nProbe = centroid count recovers brute force exactly
    // on ANY corpus.
    val scored = probes.join(assigned, "centroid_id")
      .where(col("c_id") =!= col("q_id"))
      .withColumn("score",
        round(cosineF32(col("q_vec"), col("c_vec")) + 1e-9, 4))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("score"), col("rank"))
  }

  /** Random-hyperplane LSH signature: sign bit of the dot product against
    * `planes` deterministic pseudo-random +-1 hyperplanes, packed into a
    * long. Components derive from a seeded murmur of (plane, dim) —
    * fixed and reproducible, no stored model. Single JVM pass per row:
    * the higher-order-function formulation (zip_with + aggregate per
    * plane) paid interpreted per-element overhead x planes x join sides
    * (see ARCHITECTURE "HOF lambda trap"). */
  private class HyperplaneSigner(planes: Int) extends Serializable {
    // sign matrix built lazily from the first row's dim (and regrown if
    // dims vary): the murmur-per-(plane,dim) derivation runs once per
    // task instead of once per row x element
    @transient private var signs: Array[Array[Double]] = _

    private def signsFor(n: Int): Array[Array[Double]] = {
      if (signs == null || signs(0).length < n)
        signs = Array.tabulate(planes)(p => Array.tabulate(n) { i =>
          val h = scala.util.hashing.MurmurHash3
            .productHash((p, i), 0x9e3779b9)
          if ((h & 1) == 0) 1.0 else -1.0
        })
      signs
    }

    def sign(vec: Seq[Float]): Long = {
      val v = vec.toArray
      val s = signsFor(v.length)
      var sig = 0L
      var p = 0
      while (p < planes) {
        val sp = s(p)
        var dotp = 0.0
        var i = 0
        while (i < v.length) { dotp += v(i).toDouble * sp(i); i += 1 }
        if (dotp >= 0) sig |= (1L << p)
        p += 1
      }
      sig
    }
  }

  private def hyperplaneUdf(planes: Int) = {
    val signer = new HyperplaneSigner(planes)
    org.apache.spark.sql.functions.udf { (vec: Seq[Float]) =>
      signer.sign(vec)
    }
  }

  def hyperplaneSignature(vec: Column, planes: Int): Column =
    hyperplaneUdf(planes)(vec)
}

/** One-JVM-pass centroid scoring against a captured matrix. The earlier
  * formulation inlined the centroid set as an array(struct(cosine, -id,
  * id)) expression — its codegen arity grew with the centroid count
  * (compile cost, per-row giant-method eval), while this loop is a tiny
  * object whose cost is the raw flops. Same numerics as CosineSimF32
  * (double accumulation in index order; zero-norm => score 0) and the
  * same tie-break (equal score => smaller centroid id). The scorer
  * ships as a broadcast variable (once per executor, not per task) and
  * [[Similarity.MaxCentroids]] caps its size at O(k × dim) independent
  * of the corpus.
  *
  * Reads floats straight off ArrayData (null elements contribute 0) so
  * the NearestCentroid/CentroidProbes expressions never box a Seq. */
private[operators] class CentroidScorer(cents: Array[(Long, Seq[Float])])
    extends Serializable {
  private val ids: Array[Long] = cents.map(_._1)
  private val mat: Array[Array[Float]] = cents.map(_._2.toArray)
  private val norms: Array[Double] = mat.map { c =>
    var acc = 0.0; var i = 0
    while (i < c.length) { val v = c(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  private def scoreAll(vec: ArrayData): Array[Double] = {
    val n0 = vec.numElements()
    var nv = 0.0
    var i = 0
    while (i < n0) {
      if (!vec.isNullAt(i)) { val x = vec.getFloat(i).toDouble; nv += x * x }
      i += 1
    }
    val vnorm = math.sqrt(nv)
    Array.tabulate(ids.length) { c =>
      val cv = mat(c)
      val n = math.min(n0, cv.length)
      var dot = 0.0; var j = 0
      while (j < n) {
        if (!vec.isNullAt(j)) dot += vec.getFloat(j).toDouble * cv(j).toDouble
        j += 1
      }
      val denom = vnorm * norms(c)
      if (denom == 0.0) 0.0 else dot / denom
    }
  }

  def nearest(vec: ArrayData): Long = {
    val s = scoreAll(vec)
    var best = 0; var c = 1
    while (c < s.length) {
      if (s(c) > s(best) ||
        (s(c) == s(best) && ids(c) < ids(best))) best = c
      c += 1
    }
    ids(best)
  }

  /** Top-`nProbe` centroid ids, score desc then id asc. */
  def probes(vec: ArrayData, nProbe: Int): ArrayData = {
    val s = scoreAll(vec)
    val order = Array.range(0, s.length).sortBy(c => (-s(c), ids(c)))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      order.take(nProbe).map(c => ids(c).asInstanceOf[Any]))
  }
}

/** Nearest-centroid id (LongType), codegen'd; null vec => null id.
  * Holds the scorer through a Broadcast so the plan/task closure
  * carries an 8-byte handle, not the k × dim matrix; executors fetch
  * the matrix once (torrent) and every task shares the deserialized
  * object. */
case class NearestCentroid(child: Expression,
    scorerBc: org.apache.spark.broadcast.Broadcast[CentroidScorer])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"requires an array<float> input, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    scorerBc.value.nearest(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scorerBc", scorerBc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    // Broadcast.value is a lazy-val getter after the first read — the
    // per-row cost is one virtual call + cast around the k×dim loop
    defineCodeGen(ctx, ev, v =>
      s"((${classOf[CentroidScorer].getName}) $ref.value()).nearest($v)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}

/** Top-nProbe centroid ids (ArrayType(LongType)), codegen'd; null vec
  * => null array (explode emits no rows — probe of a null embedding).
  * Broadcast-held scorer, same rationale as [[NearestCentroid]]. */
case class CentroidProbes(child: Expression,
    scorerBc: org.apache.spark.broadcast.Broadcast[CentroidScorer],
    nProbe: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"requires an array<float> input, got $other")
    }
  override def nullSafeEval(v: Any): Any =
    scorerBc.value.probes(v.asInstanceOf[ArrayData], nProbe)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("scorerBc", scorerBc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    defineCodeGen(ctx, ev, v =>
      s"((${classOf[CentroidScorer].getName}) $ref.value()).probes(" +
        s"$v, $nProbe)")
  }
  override protected def withNewChildInternal(
      newChild: Expression): CentroidProbes = copy(child = newChild)
  override def prettyName: String = "centroid_probes"
}
