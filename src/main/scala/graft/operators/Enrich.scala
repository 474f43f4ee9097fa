package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextMetrics

/** Metadata enrichment over the `details` JSON pocket with the
  * reference's skip-if-present semantics (R12 early-exit:
  * modules/computed_metadata.py:240-277 — `if not strict and key in
  * details: return`): the expensive metric only evaluates for rows that
  * are missing the key, and `strict = true` forces recompute. At scale
  * this is partial invalidation as a filter — re-enrichment scans touch
  * only the rows that need work. Values are stored as STRINGS inside
  * details (the reference keeps str(duration)/str(readability);
  * FIXTURES.md details keys). */
object Enrich {

  /** Set `key` inside the `details` JSON-string column to `value`
    * (stringified) when missing — or always, when strict. */
  def withDetailsKey(df: DataFrame, detailsCol: String, key: String,
      value: Column, strict: Boolean = false): DataFrame = {
    val details = coalesce(col(detailsCol), lit("{}"))
    val present = get_json_object(details, s"$$.$key").isNotNull
    val parsed = from_json(details, org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType,
      org.apache.spark.sql.types.StringType))
    // drop any existing entry first: map_concat rejects duplicate keys
    val updated = to_json(map_concat(
      map_filter(parsed, (k, _) => k =!= key),
      map(lit(key), value.cast("string"))))
    df.withColumn(detailsCol,
      if (strict) updated
      else when(present, details).otherwise(updated))
  }

  /** Reading duration into details.duration (reference
    * compute_duration). */
  def withDuration(df: DataFrame, textCol: String, langCol: String,
      detailsCol: String = "details", strict: Boolean = false)
      : DataFrame =
    withDetailsKey(df, detailsCol, "duration",
      TextMetrics.readingDurationSeconds(col(textCol),
        TextMetrics.readingSpeedFor(col(langCol))),
      strict)

  /** Flesch readability into details.readability (reference
    * compute_readability). */
  def withReadability(df: DataFrame, textCol: String,
      detailsCol: String = "details", strict: Boolean = false)
      : DataFrame =
    withDetailsKey(df, detailsCol, "readability",
      TextMetrics.fleschReadingEase(col(textCol)), strict)
}
