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

  /** Splice one string-valued key into a JSON document, leaving every
    * other key's TYPE intact (numbers stay numbers, arrays stay arrays —
    * a Map[String,String] round-trip would re-quote them as strings).
    * Jackson tree edit: set/replace the single key, serialize back.
    * Floats parse as BigDecimal so "1.10" round-trips as 1.10. */
  private val spliceKey = udf { (details: String, key: String,
      value: String) =>
    val mapper = Enrich.mapper
    val root =
      try mapper.readTree(
        if (details == null || details.trim.isEmpty) "{}" else details)
      catch {
        // malformed upstream JSON degrades to a fresh object (the old
        // from_json path nulled out and rebuilt; a throwing UDF would
        // abort the whole job on one bad row)
        case _: com.fasterxml.jackson.core.JacksonException => null
      }
    root match {
      case obj: com.fasterxml.jackson.databind.node.ObjectNode =>
        obj.put(key, value); mapper.writeValueAsString(obj)
      case _ => // non-object or unparseable details: fresh object
        val o = mapper.createObjectNode(); o.put(key, value)
        mapper.writeValueAsString(o)
    }
  }

  @transient private lazy val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.enable(com.fasterxml.jackson.databind.DeserializationFeature
      .USE_BIG_DECIMAL_FOR_FLOATS)
    m.configure(com.fasterxml.jackson.databind.cfg.JsonNodeFeature
      .STRIP_TRAILING_BIGDECIMAL_ZEROES, false)
    m
  }

  /** Set `key` inside the `details` JSON-string column to `value`
    * (stringified) when missing — or always, when strict. Unrelated
    * keys are never rewritten (ADVICE r2: the old MapType(String,String)
    * round-trip re-encoded e.g. external_sdg [1,2] as "[1,2]"). */
  def withDetailsKey(df: DataFrame, detailsCol: String, key: String,
      value: Column, strict: Boolean = false): DataFrame = {
    val details = coalesce(col(detailsCol), lit("{}"))
    val present = get_json_object(details, s"$$.$key").isNotNull
    val updated = spliceKey(details, lit(key), value.cast("string"))
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
