package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextClean
import graft.sinks.ShardedExport
import graft.sources.Warc

/** Crawl segments → training shards, END TO END — the chain a corpus
  * team actually operates, assembled purely from this engine's
  * oracled/spec'd pieces so every stage's semantics are already
  * pinned:
  *
  *   WARC segments (sources/Warc: 200 + text/html predicate)
  *     -> text extraction (TextClean.stripHtml + whitespace normalize)
  *     -> host stratum + content-stable doc id (md5 of the target URI)
  *     -> Curation.curate (PII scrub, Gopher gates, repetition
  *        thresholds, exact dedup keep-first, per-host mixture rates,
  *        train/val/test split — ONE declarative plan, quality
  *        predicates below the dedup exchange)
  *     -> ShardedExport.exportJsonl (deterministic shards + manifest)
  *
  * Determinism composes: every stage is a pure function of content
  * (md5 ids, hash-bucket sampling/splits, sorted shard files), so the
  * whole chain re-runs byte-identically over the same segments — the
  * property the export manifest certifies at the end.
  *
  * 100-TB plan: segment files are the scan parallelism (one task per
  * ~1 GB WARC), the curation plan's only corpus shuffle is the dedup
  * window, mixing/split are row-local hash decisions, and the export
  * shuffle is the shard repartition — three corpus-wide data movements
  * total, none of them driver-bound.
  */
object CorpusBuild {

  /** Run the chain; returns the export manifest (shard, files, rows,
    * bytes, md5). `rates` are per-HOST mixture weights (hosts absent
    * from the map are dropped — explicit mixing config, the
    * stratifiedSample contract). */
  def fromWarc(spark: SparkSession, warcGlob: String, outDir: String,
      rates: Map[String, Double], numShards: Int,
      trainPct: Double = 0.8, valPct: Double = 0.1): DataFrame = {
    val docs = documentsFromWarc(spark, warcGlob)
    val curated = Curation.curate(docs, "doc_id", "text", "source",
      rates, trainPct, valPct)
    ShardedExport.exportJsonl(curated, "doc_id", outDir, numShards)
  }

  /** The extraction stage alone: (doc_id, source, url, text) from the
    * crawl's 200+text responses. doc_id is the md5-prefix of the
    * target URI (content-stable across reruns and engines — the
    * Mixing discipline); source is the URI host, the natural crawl
    * stratum. */
  def documentsFromWarc(spark: SparkSession,
      warcGlob: String): DataFrame =
    Warc.htmlResponses(spark, warcGlob)
      .select(
        conv(substring(md5(col("target_uri")), 1, 15), 16, 10)
          .cast("long").as("doc_id"),
        expr("parse_url(target_uri, 'HOST')").as("source"),
        col("target_uri").as("url"),
        TextClean.normalizeWhitespace(
          TextClean.stripHtml(col("body"))).as("text"))
}
