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
  * Scale: the gram-feature frame is computed ONCE and persisted; each
  * iteration is one chained job (margin groupBy(id) → error join →
  * gradient groupBy(bucket)) with the weights riding as a
  * broadcast-sized `buckets+1`-row frame. Train on a labeled SAMPLE
  * (the recipe's shape — classifier training sets are sample-sized);
  * scoring is the corpus-scale path.
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
    val feats = features(labeled, idCol, textCol, buckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // labels persisted too: every iteration's chained job reads it,
    // and its lineage is a source scan + filter per call otherwise
    val labels = labeled.select(col(idCol).as("id"),
        col(labelCol).cast("double").as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val n = labels.count()
    require(n > 0, "empty training set")
    val w = new Array[Double](buckets)
    var bias = 0.0
    var it = 0
    while (it < iters) {
      val wDf = weightsFrame(spark, w, bias)
      // ONE action per iteration: margins (fixed-point sum incl. the
      // intercept row) → per-doc error → gradient per bucket (bucket
      // -1 = the bias gradient), all in a single chained job
      val margins = feats.join(wDf, "b")
        .groupBy("id")
        .agg(sum((col("tf") * col("w") * QD).cast("long")).as("mq"))
        .select(col("id"), (col("mq").cast("double") / QD).as("margin"))
      val errs = labels.join(margins, "id")
        .select(col("id"),
          (lit(1.0) / (lit(1.0) + exp(-col("margin"))) - col("y"))
            .as("err"))
      val gradRows = feats.join(errs, "id")
        .groupBy("b")
        .agg(sum((col("err") * col("tf") * QD).cast("long")).as("gq"))
        .collect()
      val scale = lr / n
      var i = 0
      while (i < gradRows.length) {
        val r = gradRows(i)
        val g = scale * (r.getLong(1).toDouble / QD)
        val b = r.getLong(0)
        if (b < 0) bias -= g else w(b.toInt) -= g
        i += 1
      }
      it += 1
    }
    Model(w, bias, buckets)
    } finally {
      // deterministic release even when an iteration throws (task
      // failure, ANSI cast overflow under a diverging lr) — a leaked
      // cached sample would otherwise wait on the ContextCleaner
      feats.unpersist()
      labels.unpersist()
    }
  }

  /** Score documents: (id, quality_score 4-dp sigmoid probability).
    * Every doc gets a row (the intercept feature guarantees a margin —
    * tokenless docs score sigmoid(bias), the no-evidence prior). */
  def score(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
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
}
