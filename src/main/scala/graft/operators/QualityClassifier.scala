package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trainable quality classifier for data selection — the DISCRIMINATIVE
  * complement to DSIR's generative log-ratio (q84): a logistic
  * regression over hashed unigram+bigram features, the GPT-3/WebText
  * recipe ("documents scored by a classifier trained to distinguish the
  * reference corpus from raw CommonCrawl"). Train on labeled rows
  * (reference = 1, raw background = 0), score the corpus, keep the
  * top-weighted (or Pareto-sample on the score, as GPT-3 did).
  *
  * Feature space is IDENTICAL to ImportanceSampling's (same
  * gramBuckets hashing), so DSIR scores and classifier scores are
  * directly comparable per document. Features are tf-normalized bucket
  * counts (each doc's features sum to 1 — bounded, scale-free), plus an
  * intercept pseudo-feature at bucket -1 carried by EVERY doc: the bias
  * trains and applies through the same join/aggregate as the weights,
  * which also means one Spark action per training iteration, not two,
  * and tokenless docs still get a margin row (the no-evidence prior).
  *
  * Distributed training that is BITWISE deterministic: full-batch
  * gradient descent where every floating sum that crosses partitions is
  * a fixed-point LONG sum (contributions quantized at 2^30 — the
  * QuantizedVectorSum / k-means discipline, ARCHITECTURE.md
  * "Determinism"): margins and gradients are exact integer arithmetic
  * until the final descale, so weights are identical across
  * partitionings, AQE re-plans, and reruns. Driver state per iteration:
  * ONE (buckets+1)-row gradient collect — bounded model state
  * (centroid-collect precedent), never corpus-scaled.
  *
  * Scale: features are packed ONCE into one cached row per document
  * (label + parallel bucket/tf arrays) by a row-local gram walk —
  * since round 19 training is shuffle-free END TO END (the packing
  * used to be relational: four exchanges of the gram stream);
  * each iteration is then a single shuffle-FREE job: weights broadcast
  * as a plain array, margins and per-bucket gradient contributions
  * computed in one pass per partition into a local (buckets+1) long
  * array, partials combined by treeAggregate (the MLlib gradient-
  * descent shape — per-partition imperative accumulation is the one
  * place RDD code beats a DataFrame plan, because the alternative is
  * two aggregations and a join per iteration). Driver state per
  * iteration: ONE (buckets+1)-long array — bounded model state,
  * never corpus-scaled. Train on a labeled SAMPLE (the recipe's
  * shape — classifier training sets are sample-sized); scoring is the
  * corpus-scale declarative path.
  */
object QualityClassifier {

  /** Fixed-point scale: products of tf (<=1), weights, and errors
    * (<=1) stay far inside long range at corpus scale. */
  private val Q = 1L << 30
  private val QD = Q.toDouble

  final case class Model(weights: Array[Double], bias: Double,
      buckets: Int) {
    require(weights.length == buckets)
  }

  /** tf-normalized hashed-gram features + the intercept pseudo-feature
    * (b = -1, tf = 1) for every id in `allIds`. */
  private def features(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    val grams = ImportanceSampling.gramBuckets(df, idCol, textCol,
      buckets)
    val counts = grams.groupBy("id", "b").agg(count(lit(1)).as("cnt"))
    // totals derive from the already-reduced counts frame — a second
    // groupBy over the raw gram stream would re-parse and re-shuffle
    // the whole corpus on the scoring path
    val totals = counts.groupBy("id").agg(sum(col("cnt")).as("tot"))
    counts.join(totals, "id")
      .select(col("id"), col("b"),
        (col("cnt").cast("double") / col("tot").cast("double")).as("tf"))
      .union(df.select(col(idCol).as("id"), lit(-1L).as("b"),
        lit(1.0).as("tf")))
  }

  /** Train by deterministic full-batch gradient descent.
    * `labeled` must carry a 0/1 `labelCol`. */
  def train(labeled: DataFrame, idCol: String, textCol: String,
      labelCol: String, buckets: Int = 4096, iters: Int = 30,
      lr: Double = 2.0): Model = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val sc = spark.sparkContext
    // pack features to ONE row per doc: (y, bucket slots, tfs) — and
    // do it ROW-LOCALLY (round 19, guide §2.4/§1.2): the per-doc tf
    // vector is a pure function of the doc's own text, so the former
    // relational packing (gram explode -> counts groupBy -> totals
    // groupBy -> two joins -> collect_list groupBy: four exchanges of
    // the gram stream on the TRAINING path) is replaced by one pass of
    // the SAME row-local gram walk the scorer uses
    // (ImportanceSampling.foreachGramBucket — the shared feature-space
    // replay, spec-pinned against the relational form). Numerics are
    // bitwise unchanged: identical md5 bucket ids, identical
    // cnt.toDouble/tot.toDouble tf division, and the per-doc SLOT
    // ORDER remains free to vary — every consumer below is a
    // commutative fixed-point long sum, so order cannot reach the
    // result (the determinism argument, unchanged from the
    // collect_list form). The intercept pseudo-feature (b = -1) maps
    // to slot `buckets`, so a single (buckets+1)-wide array carries
    // weights AND bias through every iteration; tokenless docs pack
    // as intercept-only, exactly the relational union's row.
    val packed = labeled
      .select(col(labelCol).cast("double").as("y"),
        col(textCol).as("t"))
      .as[(Double, String)]
      .rdd
      .map { case (y, text) =>
        val counts = new java.util.HashMap[Integer, Integer]()
        val tot = ImportanceSampling.foreachGramBucket(text, buckets) {
          b =>
            val prev = counts.get(b)
            counts.put(b, if (prev == null) 1 else prev + 1)
        }
        val m = counts.size()
        val bs = new Array[Int](m + 1)
        val tfs = new Array[Double](m + 1)
        var i = 0
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          bs(i) = e.getKey
          tfs(i) = e.getValue.toDouble / tot.toDouble
          i += 1
        }
        bs(m) = buckets // the intercept pseudo-feature, every doc
        tfs(m) = 1.0
        (y, bs, tfs)
      }
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = packed.count()
      require(n > 0, "empty training set")
      val w = new Array[Double](buckets)
      var bias = 0.0
      var it = 0
      while (it < iters) {
        val wAll = java.util.Arrays.copyOf(w, buckets + 1)
        wAll(buckets) = bias
        val bcW = sc.broadcast(wAll)
        // ONE shuffle-free job per iteration: margin (fixed-point
        // long sum of quantized terms, the exact numeric contract of
        // the previous DataFrame form: (tf * w * QD).toLong per term)
        // -> sigmoid error -> per-bucket gradient contributions
        // accumulated into a per-partition long array; treeAggregate
        // combines partials with commutative integer addition
        val grad = packed.treeAggregate(new Array[Long](buckets + 1))(
          seqOp = (acc, doc) => {
            val (y, bs, tfs) = doc
            val wv = bcW.value
            var mq = 0L
            var i = 0
            while (i < bs.length) {
              mq += (tfs(i) * wv(bs(i)) * QD).toLong
              i += 1
            }
            val margin = mq.toDouble / QD
            val err = 1.0 / (1.0 + math.exp(-margin)) - y
            i = 0
            while (i < bs.length) {
              acc(bs(i)) += (err * tfs(i) * QD).toLong
              i += 1
            }
            acc
          },
          combOp = (a, b) => {
            var i = 0
            while (i < a.length) { a(i) += b(i); i += 1 }
            a
          })
        bcW.unpersist(blocking = false)
        val scale = lr / n
        var i = 0
        while (i < buckets) {
          w(i) -= scale * (grad(i).toDouble / QD)
          i += 1
        }
        bias -= scale * (grad(buckets).toDouble / QD)
        it += 1
      }
      Model(w, bias, buckets)
    } finally {
      // deterministic release even when an iteration throws (task
      // failure, a diverging lr) — a leaked cached sample would
      // otherwise wait on the ContextCleaner
      packed.unpersist(blocking = false)
    }
  }

  /** Score documents: (id, quality_score 4-dp sigmoid probability).
    * Every doc gets a row (the intercept term guarantees a margin —
    * tokenless docs score sigmoid(bias), the no-evidence prior).
    *
    * SHUFFLE-FREE: the margin is a pure function of one document's
    * grams and the (broadcast) weight vector, so scoring is one
    * row-local pass — the earlier relational form exploded the gram
    * stream and shuffled it twice (counts groupBy + margin groupBy),
    * which at corpus scale moved ~2 grams per token over the wire to
    * compute something each row already knew. Numerics are the exact
    * per-term contract of the relational form (same md5 bucket, same
    * cnt/tot double division, same (tf*w*QD).toLong quantization,
    * commutative long sum, StrictMath.exp as Spark's Exp expression),
    * so scores are bitwise unchanged — spec-pinned against the
    * relational formulation. Per-ROW contract: each input row scores
    * independently; the relational form grouped by id, so duplicate
    * ids pooled there — feed one row per document. */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val bcW = sc.broadcast(model.weights)
    val bias = model.bias
    val buckets = model.buckets
    val scoreUdf = udf { (text: String) =>
      // the gram walk is the SHARED row-local feature-space replay
      // (ImportanceSampling.foreachGramBucket) — one definition for
      // every shuffle-free scorer; per-ROW contract documented there
      val counts = new java.util.HashMap[Integer, Integer]()
      val tot = graft.operators.ImportanceSampling
        .foreachGramBucket(text, buckets) { b =>
          val prev = counts.get(b)
          counts.put(b, if (prev == null) 1 else prev + 1)
        }
      val w = bcW.value
      var mq = (1.0 * bias * QD).toLong // the intercept pseudo-feature
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val tf = e.getValue.toDouble / tot.toDouble
        mq += (tf * w(e.getKey) * QD).toLong
      }
      // StrictMath.exp, matching Spark's Exp expression exactly —
      // Math.exp is an intrinsic allowed to differ by 1 ulp, enough to
      // flip a 4-dp HALF_UP boundary against scoreRelational
      val p = 1.0 / (1.0 + StrictMath.exp(-(mq.toDouble / QD)))
      BigDecimal(p + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    df.select(col(idCol), scoreUdf(col(textCol)).as("quality_score"))
  }

  /** The relational scoring formulation — retained as the PARITY
    * REFERENCE the spec checks the row-local path against (and as
    * documentation of the algebra both forms implement). */
  private[graft] def scoreRelational(df: DataFrame, idCol: String,
      textCol: String, model: Model): DataFrame = {
    val wDf = weightsFrame(df.sparkSession, model.weights, model.bias)
    features(df, idCol, textCol, model.buckets)
      .join(wDf, "b")
      .groupBy("id")
      .agg(sum((col("tf") * col("w") * QD).cast("long")).as("mq"))
      .select(col("id").as(idCol),
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("mq").cast("double") / QD))) + 1e-9, 4)
          .as("quality_score"))
  }

  private def weightsFrame(spark: SparkSession, w: Array[Double],
      bias: Double): DataFrame = {
    import spark.implicits._
    (w.toIndexedSeq.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      :+ (-1L, bias)).toDF("b", "w")
  }

  /** Oracle-SQL generator: the DuckDB replay of `train` + `score` for
    * the q87 workload (labeled = doc_id % 5 = 0, label = source='src0')
    * — kept NEXT to the trainer so the two can't drift. Replayable
    * because every numeric step is contract-pinned: the md5 gram-bucket
    * feature space (the q84 CTE pattern), tf as one exact long/long
    * double division, margins and gradients as sums of TRUNC-quantized
    * 2^30 fixed-point longs (commutative — list/shuffle order can't
    * reach the result), the weight update in the engine's exact
    * `w - (lr/n) * (grad/Q)` operation order, and sigmoid+HALF_UP-4dp
    * only at the very end. The GD loop unrolls to `iters` CTE stages.
    * The lone cross-engine float risk is exp() (StrictMath vs libm,
    * <= 1 ulp) feeding a TRUNC boundary — flip probability ~1e-9 per
    * term, and a flipped quantum moves weights by lr/(n*2^30), orders
    * below the 4-dp output rounding. */
  def oracleSql(buckets: Int = 1024, iters: Int = 4,
      lr: Double = 2.0): String = {
    val Qs = "1073741824.0" // 2^30, the fixed-point scale
    val sb = new StringBuilder
    sb ++= s"""lab AS (
         SELECT doc_id,
           CAST(CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS DOUBLE)
             AS y, text
         FROM documents WHERE doc_id % 5 = 0),
       tws AS (
         SELECT doc_id, y,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
             x -> x <> '') AS ws
         FROM lab),
       tg AS (
         SELECT doc_id, y, unnest(list_concat(ws,
           list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
             i -> ws[i] || ' ' || ws[i + 1]))) AS g
         FROM tws),
       tb AS (
         SELECT doc_id, y,
           CAST(CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT)
             % $buckets AS BIGINT) AS slot
         FROM tg),
       tf AS (
         SELECT doc_id, y, slot,
           CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS tf
         FROM (
           SELECT doc_id, y, slot, count(*) AS cnt,
             sum(count(*)) OVER (PARTITION BY doc_id) AS tot
           FROM tb GROUP BY doc_id, y, slot)
         UNION ALL
         SELECT doc_id, y, $buckets AS slot, 1.0 AS tf FROM lab),
       nn AS (SELECT count(*) AS n FROM lab),
       wt0 AS (SELECT i AS slot, 0.0 AS wv FROM range(0, ${buckets + 1}) r(i))"""
    for (t <- 0 until iters) {
      sb ++= s""",
       mg$t AS (
         SELECT f.doc_id, f.y,
           sum(CAST(trunc(f.tf * w.wv * $Qs) AS BIGINT)) AS mq
         FROM tf f JOIN wt$t w ON w.slot = f.slot
         GROUP BY f.doc_id, f.y),
       er$t AS (
         SELECT doc_id,
           1.0 / (1.0 + exp(-(CAST(mq AS DOUBLE) / $Qs))) - y AS err
         FROM mg$t),
       gr$t AS (
         SELECT f.slot,
           sum(CAST(trunc(e.err * f.tf * $Qs) AS BIGINT)) AS gq
         FROM tf f JOIN er$t e USING (doc_id)
         GROUP BY f.slot),
       wt${t + 1} AS (
         SELECT w.slot,
           w.wv - ($lr / n.n) * (CAST(COALESCE(g.gq, 0) AS DOUBLE) / $Qs)
             AS wv
         FROM wt$t w
         LEFT JOIN gr$t g ON g.slot = w.slot
         CROSS JOIN nn n)"""
    }
    sb ++= s""",
       aws AS (
         SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
             x -> x <> '') AS ws
         FROM documents),
       ag AS (
         SELECT doc_id, unnest(list_concat(ws,
           list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
             i -> ws[i] || ' ' || ws[i + 1]))) AS g
         FROM aws),
       ab AS (
         SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(g), 1, 8)) AS UBIGINT)
             % $buckets AS BIGINT) AS slot
         FROM ag),
       atf AS (
         SELECT doc_id, slot,
           CAST(cnt AS DOUBLE) / CAST(tot AS DOUBLE) AS tf
         FROM (
           SELECT doc_id, slot, count(*) AS cnt,
             sum(count(*)) OVER (PARTITION BY doc_id) AS tot
           FROM ab GROUP BY doc_id, slot)),
       contrib AS (
         SELECT f.doc_id,
           sum(CAST(trunc(f.tf * w.wv * $Qs) AS BIGINT)) AS s
         FROM atf f JOIN wt$iters w ON w.slot = f.slot
         GROUP BY f.doc_id),
       biasq AS (
         SELECT CAST(trunc(1.0 * wv * $Qs) AS BIGINT) AS bq
         FROM wt$iters WHERE slot = $buckets)
       SELECT d.doc_id,
         round(1.0 / (1.0 + exp(-(CAST(b.bq + COALESCE(c.s, 0) AS DOUBLE)
           / $Qs))) + 1e-9, 4) AS quality_score
       FROM documents d
       LEFT JOIN contrib c ON c.doc_id = d.doc_id
       CROSS JOIN biasq b"""
    sb.toString
  }
}
