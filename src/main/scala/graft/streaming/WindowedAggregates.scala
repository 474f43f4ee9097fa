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

  /** Event-time SESSION windows on an unbounded stream — the streaming
    * form of the batch lag-cumsum sessionization (q29): consecutive
    * events of a key belong to one session while the inter-event gap
    * stays under `gap`; Spark's `session_window` merges windows as
    * events arrive and the WATERMARK is what closes a session (no new
    * event can extend it once the watermark clears its end), which
    * bounds the state exactly like the dedup/interval-join forms.
    * Semantics note vs the batch form: `session_window` starts a new
    * session when the gap is >= `gap` (window end is exclusive), the
    * lag formulation when it is > — boundary-exact events are the one
    * divergence (documented, inherent to the built-in).
    * Works unchanged on a BATCH frame (no watermark applied there —
    * Spark ignores withWatermark on batch), which is what the parity
    * spec exploits. */
  def sessionWindows(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, watermarkDelay: String): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))

  /** Watermarked stream-stream INTERVAL join — the two-stream
    * Structured Streaming primitive: enrich a fact stream with context
    * rows that share a key AND arrive within a bounded event-time
    * interval (impression ⋈ click, request ⋈ response, doc ⋈ its
    * crawl-status update). Both sides carry watermarks and the join
    * condition bounds the right side's event time to
    * [leftTs - lowerBound, leftTs + upperBound]; together those let
    * Spark EVICT buffered rows once the watermark clears the interval —
    * the only join formulation whose state stays bounded on an
    * unbounded ingest stream (an unconstrained stream-stream join
    * buffers both streams forever). Inner join; matches emit as soon as
    * both sides have arrived. The right-side key column is dropped from
    * the output (it equals the left's). */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, watermarkDelay: String,
      lowerBound: String, upperBound: String): DataFrame = {
    // key/ts names are spliced into dotted `l.<name>` references below,
    // so they must be plain identifiers (dots/backtick-needing names
    // would silently resolve wrong or fail with an obscure parse error)
    val ident = "[A-Za-z_][A-Za-z0-9_]*".r
    Seq("keyCol" -> keyCol, "leftTs" -> leftTs, "rightTs" -> rightTs)
      .foreach { case (arg, v) =>
        require(ident.pattern.matcher(v).matches(),
          s"$arg '$v' is not a plain identifier — intervalJoin builds " +
            "alias-qualified references and cannot address dotted or " +
            "special-character column names; rename the column first")
      }
    // fail bound typos HERE with the caller's string in the message,
    // not later as a bare INTERVAL parse error deep in analysis
    Seq("lowerBound" -> lowerBound, "upperBound" -> upperBound)
      .foreach { case (arg, v) =>
        try expr(s"INTERVAL $v")
        catch {
          case e: org.apache.spark.sql.catalyst.parser.ParseException =>
            throw new IllegalArgumentException(
              s"$arg '$v' is not a valid interval (want e.g. " +
                s"'10 seconds', '5 minutes'): ${e.getMessage}")
        }
      }
    // every column shared by both sides except the join key would be
    // ambiguous downstream (the key itself is deduplicated below)
    val overlap = (left.columns.toSet intersect right.columns.toSet) -
      keyCol
    require(overlap.isEmpty,
      s"column names ${overlap.mkString(", ")} appear on BOTH streams — " +
        "rename one side (only the join key may be shared)")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    l.join(r, col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >=
          col(s"l.$leftTs") - expr(s"INTERVAL $lowerBound") &&
        col(s"r.$rightTs") <=
          col(s"l.$leftTs") + expr(s"INTERVAL $upperBound"))
      .drop(col(s"r.$keyCol"))
  }
}
