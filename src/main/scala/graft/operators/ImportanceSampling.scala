package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting for data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score each raw document by how much more likely its hashed n-gram
  * features are under a small TARGET corpus (the quality reference —
  * Wikipedia/books in the paper) than under the raw corpus itself.
  * Selecting top-scored (or bucket-sampling proportional to the weight)
  * shifts the mixture toward the target distribution without training a
  * classifier.
  *
  * Features are unigrams + bigrams hashed into a fixed bucket space
  * (the paper's hashed n-gram trick): the model is two count tables of
  * exactly `buckets` rows regardless of corpus size — the property that
  * makes this 100-TB-safe. Hashing is md5-based (Mixing.hashBucket) so
  * any engine agrees byte-for-byte, and both distributions are add-1
  * smoothed over the bucket space.
  *
  * Scale: one shuffle to count each corpus's buckets (both tables are
  * `buckets` rows — broadcast-sized by construction, a stronger bound
  * than LanguageModel's minCount cap); scoring is a broadcast join over
  * the exploded gram stream + one groupBy(id). Driver state: two longs
  * (the gram totals).
  */
object ImportanceSampling {

  /** (id, bucket) rows: every unigram and bigram of `textCol`, hashed
    * into [0, buckets). `__ws` is materialized before the bigram
    * zip_with so the lambda references a bound array column (the
    * shingles O(words^2) re-evaluation trap). Shared with
    * QualityClassifier — DSIR and the trained filter score the SAME
    * feature space, so their selections are directly comparable. */
  private[operators] def gramBuckets(df: DataFrame, idCol: String,
      textCol: String, buckets: Int): DataFrame =
    df.select(col(idCol).as("id"),
        filter(split(lower(trim(col(textCol))), "\\s+"),
          w => length(w) > 0).as("__ws"))
      // zip_with pads the shorter side with null, so the last element
      // pairs (w_n, null) and concat_ws collapses it to the bare
      // unigram — filter the bigram list to entries with a space
      // (words never contain whitespace after the \s+ split) before
      // concatenating with the unigram list
      .select(col("id"), explode(concat(col("__ws"),
        filter(zip_with(col("__ws"),
          slice(col("__ws"), lit(2),
            greatest(size(col("__ws")) - 1, lit(0))),
          (a, b) => concat_ws(" ", a, b)),
          g => g.contains(" ")))).as("g"))
      .select(col("id"), Mixing.hashBucket(col("g"), buckets).as("b"))

  /** Per-document mean hashed-n-gram log2 importance ratio:
    *   score(d) = avg over grams g of
    *     log2 p_target(bucket(g)) - log2 p_raw(bucket(g))
    * with p(b) = (count(b) + 1) / (total + buckets) in each corpus.
    * Positive = looks more like the target than the raw background.
    * Output: (id, dsir_score 4-dp, n_grams) — one row per raw doc with
    * at least one token (tokenless docs have no feature evidence).
    */
  def dsirScore(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 10000): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val rawGrams = gramBuckets(raw, idCol, textCol, buckets)
    val targetGrams = gramBuckets(target, idCol, textCol, buckets)
    val rawCt = rawGrams.groupBy("b").agg(count(lit(1)).as("raw_ct"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tgtCt = targetGrams.groupBy("b").agg(count(lit(1)).as("tgt_ct"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rawTotal = totalOf(rawCt, "raw_ct")
    val tgtTotal = totalOf(tgtCt, "tgt_ct")
    val scored = rawGrams
      .join(rawCt, Seq("b"), "left")
      .join(tgtCt, Seq("b"), "left")
      .withColumn("__lr",
        log2((coalesce(col("tgt_ct"), lit(0L)).cast("double") + 1.0) /
          lit((tgtTotal + buckets).toDouble)) -
        log2((coalesce(col("raw_ct"), lit(0L)).cast("double") + 1.0) /
          lit((rawTotal + buckets).toDouble)))
      .groupBy("id")
      .agg(round(avg(col("__lr")) + 1e-9, 4).as("dsir_score"),
        count(lit(1)).as("n_grams"))
    val release = () => { rawCt.unpersist(); tgtCt.unpersist(); () }
    val prev = lastRelease.getAndSet(release)
    if (prev != null) prev()
    scored
  }

  private def totalOf(counts: DataFrame, cntCol: String): Long = {
    val row = counts.agg(sum(col(cntCol))).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** Previous invocation's persisted count tables, released on the next
    * call (LanguageModel precedent). */
  private val lastRelease =
    new java.util.concurrent.atomic.AtomicReference[() => Unit]()
}
