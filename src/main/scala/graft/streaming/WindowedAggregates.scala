package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming windowed aggregation (SURVEY T2/T6): the reference's hourly
  * cron micro-batches become event-time tumbling windows with a
  * watermark; its bytes-weighted admission (T6,
  * `maxBytesPerTrigger` analogue) maps to per-trigger source limits plus
  * the batch byteCapAdmit.
  *
  * Works identically over readStream or batch frames (Spark unifies the
  * API) — tests drive it with MemoryStream, production with a file/
  * Kafka source.
  */
object WindowedAggregates {

  /** Tumbling event-time counts/sums per key with late-data tolerance.
    * Append mode emits a window only once its watermark passes — exactly
    *-once per window downstream (T5 pairs this with idempotent sinks). */
  def tumbling(events: DataFrame, tsCol: String, keyCol: String,
      valueCol: String, windowDuration: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col(keyCol),
        col("n"), col("total"))

  /** Streaming exact dedup by content fingerprint (the streaming form of
    * Dedup.exact / the reference's unique-url admission S16): keep the
    * first-seen row per fingerprint. The watermark BOUNDS the dedup
    * state — `dropDuplicatesWithinWatermark` evicts fingerprints once
    * the event-time watermark passes, so state is O(arrival rate x
    * watermark), not O(corpus) — the only formulation that survives an
    * unbounded 100-TB ingest stream. Upstream-of-watermark duplicates
    * are impossible by the watermark contract; re-deliveries older than
    * the delay are handled by the idempotent sink (T5). */
  def dedupByFingerprint(docs: DataFrame, tsCol: String,
      fingerprint: Column, watermarkDelay: String): DataFrame =
    docs
      .withColumn("__fp", fingerprint)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")
}
