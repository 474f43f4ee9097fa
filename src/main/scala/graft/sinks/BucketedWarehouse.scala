package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed warehouse tables (SURVEY R15; BASELINE north star
  * "bucketing for co-located joins"): the ledger and slice tables are
  * both keyed by document_id in every pipeline stage — bucketing them
  * identically lets Spark plan those joins WITHOUT an exchange on
  * either side, which at 100 TB removes the dominant shuffle of every
  * stage (slices ⋈ docs, ledger ⋈ docs, sdgs ⋈ slices).
  *
  * Spark bucketing requires the session catalog (saveAsTable) — tables
  * live under spark.sql.warehouse.dir; `bucketed join` plan shape is
  * pinned by PlanSpec.
  */
object BucketedWarehouse {

  /** Write `df` as a bucketed, sorted table. Same (bucket count, key)
    * across tables = co-located joins. `path` makes the table external
    * (files live there instead of spark.sql.warehouse.dir — bucketing
    * metadata stays in the session catalog either way).
    *
    * `distribute` (round 18, default on — the Iceberg
    * write.distribution-mode=hash discipline from the optimization
    * guide §6): pre-partition the input by the bucket hash so each
    * write task holds exactly one bucket and writes exactly one file.
    * Without it every input task writes a file per bucket it touches —
    * tasks x buckets files at corpus scale (the many-small-files
    * failure), and on the one-row-group bench corpus the whole
    * sort-and-write ran inside a single task. repartition(buckets, key)
    * uses the same murmur3 HashPartitioning as the bucket spec, so the
    * file CONTENTS are identical to the undistributed write. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 64, mode: SaveMode = SaveMode.Overwrite,
      path: Option[String] = None, distribute: Boolean = true): Unit = {
    val src =
      if (distribute)
        df.repartition(buckets, org.apache.spark.sql.functions.col(key))
      else df
    val w = src.write
      .mode(mode)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    path.foreach(w.option("path", _))
    w.saveAsTable(table)
  }

  /** Join two identically-bucketed tables on their bucket key — planned
    * shuffle-free (SortMergeJoin over pre-bucketed scans). */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Range-clustered parquet layout for min/max data skipping: range-
    * partition on `clusterCol` then sort within partitions, so each
    * file's parquet row-group statistics cover a narrow key range and
    * point/range predicates skip whole files/row groups at the scan.
    * The complement to bucketing: bucketing co-locates JOINS, range
    * clustering prunes SCANS (e.g. the ledger by created_at, events by
    * ts) — at 100 TB the difference between reading one file and one
    * thousand. */
  def writeRangeClustered(df: DataFrame, dir: String, clusterCol: String,
      partitions: Int): Unit =
    df.repartitionByRange(partitions,
        org.apache.spark.sql.functions.col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode(SaveMode.Overwrite).parquet(dir)
}
