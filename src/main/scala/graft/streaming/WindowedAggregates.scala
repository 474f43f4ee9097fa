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
}
