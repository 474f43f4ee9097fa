package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV scans (reference S3/S4):
  *
  *  - S4 seed-URL extraction: `collectors/csv_collector.py:11-44` reads a
  *    quoted CSV, projects the configured url column, and keeps only
  *    https urls. Here: `spark.read.csv` with quote handling, a column
  *    projection Catalyst prunes to at the scan, and the same https
  *    predicate.
  *  - S3 id-artifact read: `modules/retrieve_data_from_files.py:12-26`
  *    reads the Argo batch file of UUIDs. In a single-job Spark design
  *    the artifact hop disappears (SURVEY §1.1 "batch artifacts"), but
  *    the scan is kept for interop with externally-produced id lists —
  *    at scale an id list joins as a broadcast against the warehouse
  *    rather than driving per-id point lookups.
  */
object CsvSource {

  /** S4: seed URLs from a quoted CSV. Header-aware; keeps only
    * `https://` urls (reference filter), de-duplicated. */
  def seedUrls(spark: SparkSession, path: String,
      urlCol: String = "url"): DataFrame =
    spark.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(path)
      .select(col(urlCol).as("url"))
      .where(col("url").startsWith("https://"))
      .dropDuplicates("url")

  /** S3: one-column id artifact (no header, one id per line). */
  def idArtifact(spark: SparkSession, path: String,
      idName: String = "id"): DataFrame =
    spark.read.csv(path).select(col("_c0").as(idName))

  /** The scale path for an id artifact: broadcast semi-join against the
    * warehouse instead of `id IN (...)` point lookups (reference S1
    * `WHERE id IN :ids` breaks down past ~1k ids; a join is robust at
    * any cardinality — SURVEY §2.1 S1 mapping). */
  def selectByIds(table: DataFrame, ids: DataFrame,
      keyCol: String): DataFrame =
    table.join(broadcast(ids.select(col(ids.columns.head).as(keyCol))),
      Seq(keyCol), "left_semi")
}
