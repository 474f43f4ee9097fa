package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perplexity-style quality scoring from a corpus-trained unigram
  * language model — the CCNet-family filter (score documents by how
  * surprising their tokens are under a background LM; very high
  * surprisal = gibberish/OCR noise, very low = boilerplate). A full
  * KenLM is a model artifact; the unigram form is the engine-native
  * tier: trained IN the same job by one aggregation over the corpus,
  * no external file, exact and oracle-checkable.
  *
  * Scale: token explode -> one shuffle to count the vocabulary ->
  * broadcast the (word, count) table back over the token stream ->
  * per-document mean. The vocabulary of a 100 TB corpus may exceed
  * broadcast limits — cap it with `minCount` (rare words collapse to
  * the floor probability, which is also the right smoothing for
  * singleton noise) or let AQE pick a shuffled join when the vocab
  * side outgrows the threshold.
  */
object LanguageModel {

  /** Per-document mean unigram surprisal in bits:
    * avg(-log2(count(w) / totalTokens)) over the document's tokens,
    * under the unigram distribution of `docs` itself. Deterministic;
    * 4-dp rounded for the cross-engine oracle.
    *
    * `minCount` drops sub-threshold vocabulary from BOTH the model and
    * the scored tokens (singleton-noise smoothing, and the cap that
    * keeps a 100 TB corpus's vocab table join-able; the total is
    * computed over the capped vocab so probabilities stay a
    * distribution over it). No broadcast directive on the join: the
    * vocab side is usually dimension-sized and AQE will broadcast it
    * from runtime stats, but when it outgrows the threshold AQE can
    * fall back to a shuffled join — a forced hint would OOM instead.
    * Training materializes once (persisted vocab + one driver-side
    * scalar for the total — bounded model state, centroid-collect
    * precedent); call the returned release hook from the Scoped
    * variant after the last action in long-lived sessions. */
  /** Fire-and-forget wrappers release the PREVIOUS invocation's
    * persisted count tables (the Scoped variants are caller-managed
    * instead): without this, every call pinned MEMORY_AND_DISK tables
    * for the JVM's lifetime — in a bench/verify suite that is dozens of
    * leaked caches crowding out other queries' memory. Unpersisting a
    * table another in-flight query still references only forces a
    * recompute, never a wrong result. */
  private val lastRelease =
    new java.util.concurrent.atomic.AtomicReference[() => Unit]()

  private def swapRelease(release: () => Unit): Unit = {
    val prev = lastRelease.getAndSet(release)
    if (prev != null) prev()
  }

  def unigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String, minCount: Long = 1L): DataFrame = {
    val (df, release) =
      unigramSurprisalScoped(docs, idCol, textCol, minCount)
    swapRelease(release)
    df
  }

  def unigramSurprisalScoped(docs: DataFrame, idCol: String,
      textCol: String, minCount: Long = 1L)
      : (DataFrame, () => Unit) = {
    val words = docs.select(col(idCol).as("id"),
      explode(filter(split(lower(col(textCol)), "\\s+"),
        w => length(w) > 0)).as("w"))
    val counts = words.groupBy("w")
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one action trains the LM: without it, total would re-tokenize
    // the whole corpus a second time (and the join a third).
    // sum() over zero rows is NULL (empty corpus, or minCount filtered
    // out every word) — treat as 0 and short-circuit to an empty result
    // below rather than NPE on getLong
    val totalRow = counts.agg(sum(col("cnt"))).head()
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    if (total == 0L) {
      val empty = docs.sparkSession.createDataFrame(
        docs.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            docs.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("avg_surprisal",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("n_tokens",
            org.apache.spark.sql.types.LongType, nullable = false))))
      return (empty, () => { counts.unpersist(); () })
    }
    val scored = words
      .join(counts, "w")
      .withColumn("surprisal",
        -log2(col("cnt").cast("double") / lit(total.toDouble)))
      .groupBy("id")
      .agg(round(avg(col("surprisal")) + 1e-9, 4).as("avg_surprisal"),
        count(lit(1)).as("n_tokens"))
    (scored, () => { counts.unpersist(); () })
  }

  /** Per-document mean BIGRAM surprisal with stupid backoff (Brants et
    * al. 2007, "Large Language Models in Machine Translation" — the
    * web-scale scheme: no discounting arithmetic, just a fixed backoff
    * factor, designed precisely for corpus-sized count tables):
    *
    *   score(w2 | w1) = count(w1 w2) / count(w1)      if bigram kept
    *                  = backoff * count(w2) / total    otherwise
    *   surprisal      = -log2(score), averaged over a document's
    *                    consecutive-token transitions.
    *
    * The next CCNet-fidelity tier above [[unigramSurprisal]]: boilerplate
    * scores low (its transitions are common), shuffled/gibberish word
    * salad scores high even when each word is individually common —
    * exactly what the unigram tier cannot see.
    *
    * Scale: bigram generation is ROW-LOCAL (single-pass UDF over the
    * token array — same rationale as Dedup's shingle UDF: the
    * declarative HOF form pays interpreted per-element lambda eval);
    * training is two count shuffles (bigram vocab, unigram vocab);
    * `minCount` caps the bigram table exactly like the unigram cap —
    * at 100 TB the sub-threshold tail (the vast majority of distinct
    * bigrams, by Zipf) collapses into the backoff branch, which is the
    * model's own smoothing, not an approximation of it. Scoring joins
    * are AQE-chosen (no forced broadcast, same reasoning as unigram).
    * Docs with fewer than 2 tokens have no transitions and drop out.
    *
    * Determinism/oracle: integer counts + -log2 double arithmetic,
    * 4-dp rounded — the q75 discipline. */
  def bigramSurprisalBackoff(docs: DataFrame, idCol: String,
      textCol: String, minCount: Long = 2L, backoff: Double = 0.4)
      : DataFrame = {
    val (df, release) = bigramSurprisalBackoffScoped(docs, idCol,
      textCol, minCount, backoff)
    swapRelease(release)
    df
  }

  /** Tokens -> space-joined consecutive pairs ("w1 w2"); tokens are
    * whitespace-split so the single space is an unambiguous separator. */
  private val bigramsUdf = udf { (ws: Seq[String]) =>
    if (ws == null || ws.length < 2) Array.empty[String]
    else {
      val out = new Array[String](ws.length - 1)
      var i = 0
      while (i < ws.length - 1) {
        out(i) = ws(i) + " " + ws(i + 1)
        i += 1
      }
      out
    }
  }

  def bigramSurprisalBackoffScoped(docs: DataFrame, idCol: String,
      textCol: String, minCount: Long = 2L, backoff: Double = 0.4)
      : (DataFrame, () => Unit) = {
    require(backoff > 0.0 && backoff <= 1.0,
      s"backoff factor must be in (0, 1], got $backoff")
    val ws = filter(split(lower(col(textCol)), "\\s+"),
      w => length(w) > 0)
    val tokenized = docs.select(col(idCol).as("id"), ws.as("ws"))
    val pairs = tokenized
      .select(col("id"), explode(bigramsUdf(col("ws"))).as("bg"))
    val tokens = tokenized
      .select(col("id"), explode(col("ws")).as("w"))
    val bgCounts = pairs.groupBy("bg")
      .agg(count(lit(1)).as("c2"))
      .where(col("c2") >= minCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uniCounts = tokens.groupBy("w")
      .agg(count(lit(1)).as("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one action trains both tables; null sum = empty/degenerate corpus
    val totalRow = uniCounts.agg(sum(col("c1"))).head()
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val release = () => { bgCounts.unpersist(); uniCounts.unpersist(); () }
    if (total == 0L) {
      val spark = docs.sparkSession
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            docs.schema(idCol).dataType),
          org.apache.spark.sql.types.StructField("avg_surprisal",
            org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.types.StructField("n_transitions",
            org.apache.spark.sql.types.LongType, nullable = false))))
      return (empty, release)
    }
    val w1 = split(col("bg"), " ").getItem(0)
    val w2 = split(col("bg"), " ").getItem(1)
    val scored = pairs
      .withColumn("w1", w1).withColumn("w2", w2)
      .join(bgCounts, Seq("bg"), "left")
      .join(uniCounts.select(col("w").as("w1"), col("c1").as("c1_w1")),
        Seq("w1"))
      .join(uniCounts.select(col("w").as("w2"), col("c1").as("c1_w2")),
        Seq("w2"))
      .withColumn("s",
        when(col("c2").isNotNull,
          -log2(col("c2").cast("double") / col("c1_w1").cast("double")))
        .otherwise(-log2(lit(backoff) * col("c1_w2").cast("double") /
          lit(total.toDouble))))
      .groupBy("id")
      .agg(round(avg(col("s")) + 1e-9, 4).as("avg_surprisal"),
        count(lit(1)).as("n_transitions"))
    (scored, release)
  }
}
