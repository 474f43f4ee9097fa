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
  def unigramSurprisal(docs: DataFrame, idCol: String,
      textCol: String, minCount: Long = 1L): DataFrame =
    unigramSurprisalScoped(docs, idCol, textCol, minCount)._1

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
}
