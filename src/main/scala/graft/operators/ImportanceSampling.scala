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
    val spark = raw.sparkSession
    import spark.implicits._
    val rawGrams = gramBuckets(raw, idCol, textCol, buckets)
    val targetGrams = gramBuckets(target, idCol, textCol, buckets)
    // The count tables are at most `buckets` rows BY CONSTRUCTION, so
    // collect them into local relations instead of persist + deferred
    // unpersist. The cache lifecycle was actively harmful under
    // repeated invocation: Spark's cache manager keys on the analyzed
    // plan, so a later call would first REUSE the previous call's
    // cached blocks and then release() would nuke them mid-flight —
    // bench reps alternated cache hits and full recomputes (spread
    // 2.6x). Local relations also make both count-table joins
    // broadcast by construction and drop the extra totalOf jobs (the
    // totals fall out of the collected rows).
    val rawRows = rawGrams.groupBy("b")
      .agg(count(lit(1)).as("raw_ct")).collect()
    val tgtRows = targetGrams.groupBy("b")
      .agg(count(lit(1)).as("tgt_ct")).collect()
    val rawTotal = rawRows.iterator.map(_.getLong(1)).sum
    val tgtTotal = tgtRows.iterator.map(_.getLong(1)).sum
    val rawCt = rawRows.map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("b", "raw_ct")
    val tgtCt = tgtRows.map(r => (r.getLong(0), r.getLong(1))).toSeq
      .toDF("b", "tgt_ct")
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
    scored
  }

  /** The SCORING-side shuffle-free form of [[dsirScore]] — identical
    * count-table training (the two bucket-count shuffles are the
    * trained model and unavoidable), but the per-document score is
    * computed in one row-local pass against a broadcast log-ratio
    * TABLE (buckets doubles ≈ 80 KB at the default 10k): the
    * relational form exploded the raw corpus's gram stream and
    * shuffled it twice (ratio joins + per-doc groupBy) to average
    * numbers each row could compute alone — the QualityClassifier
    * scoring argument, applied to DSIR. Per-gram log ratios are the
    * identical doubles (same smoothing, same divisions, precomputed
    * per bucket); only the ADDITION ORDER within a document differs
    * from the relational avg's partial-sum order, which the 4-dp
    * round absorbs — spec-pinned equal to the oracled relational
    * form. */
  def dsirScoreFast(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 10000): DataFrame = {
    def countArr(df: DataFrame): Array[Long] = {
      // ONE action: totals are just the array's sum (every groupBy
      // row lands at a distinct index), so no persist and no separate
      // total-aggregation job
      val a = new Array[Long](buckets)
      gramBuckets(df, idCol, textCol, buckets)
        .groupBy("b").agg(count(lit(1)).as("ct"))
        .collect().foreach(r => a(r.getLong(0).toInt) = r.getLong(1))
      a
    }
    val rawArr = countArr(raw)
    val tgtArr = countArr(target)
    val rawDen = (rawArr.sum + buckets).toDouble
    val tgtDen = (tgtArr.sum + buckets).toDouble
    // log2 exactly as Spark's Log2 expression computes it:
    // StrictMath.log(x) / StrictMath.log(2) — Math.log is a HotSpot
    // intrinsic allowed to differ by 1 ulp, which the parity claim
    // against the oracled relational form cannot tolerate
    val ln2 = StrictMath.log(2.0)
    val lr = Array.tabulate(buckets) { b =>
      StrictMath.log((tgtArr(b).toDouble + 1.0) / tgtDen) / ln2 -
        StrictMath.log((rawArr(b).toDouble + 1.0) / rawDen) / ln2
    }
    val bcLr = raw.sparkSession.sparkContext.broadcast(lr)
    val scoreUdf = udf { (text: String) =>
      val table = bcLr.value
      var sum = 0.0
      val n = foreachGramBucket(text, buckets)(b => sum += table(b))
      if (n == 0L) null
      else {
        val s = BigDecimal(sum / n.toDouble + 1e-9)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (s, n)
      }
    }
    raw.select(col(idCol).as("id"), scoreUdf(col(textCol)).as("__s"))
      .where(col("__s").isNotNull)
      .select(col("id"), col("__s._1").as("dsir_score"),
        col("__s._2").as("n_grams"))
  }

  /** Row-local replay of the [[gramBuckets]] feature space — ONE
    * definition shared by every shuffle-free scorer (QualityClassifier
    * margins, DSIR ratios), so the "same feature space" guarantee
    * cannot desynchronize by parallel edits: trim -> lowercase
    * (Locale.ROOT, matching Spark's locale-independent `lower`) ->
    * \s+ split; unigrams plus adjacent bigrams; bucket =
    * Mixing.hashBucket replayed on bytes (first 4 md5 digest bytes as
    * an unsigned 32-bit value, mod buckets = the first-8-hex-chars
    * conv). Calls `f` once per gram OCCURRENCE and returns the gram
    * count (0 for null/tokenless text).
    *
    * NOTE the per-ROW contract: callers score each input row
    * independently; the relational forms group by id first, so inputs
    * carrying duplicate ids pool grams there but not here — feed
    * one row per document (the schema contract everywhere else). */
  private[operators] def foreachGramBucket(text: String, buckets: Int)(
      f: Int => Unit): Long = {
    if (text == null) return 0L
    val ws = text.trim.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (ws.isEmpty) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    var n = 0L
    def add(g: String): Unit = {
      md.reset()
      val d = md.digest(g.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      f((v % buckets).toInt)
      n += 1
    }
    var i = 0
    while (i < ws.length) {
      add(ws(i))
      if (i + 1 < ws.length) add(ws(i) + " " + ws(i + 1))
      i += 1
    }
    n
  }

}
