package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse writers with the reference's idempotency semantics
  * (SURVEY R9/S16-S18), re-expressed as set operations + partitioned
  * parquet instead of per-row IntegrityError handling:
  *
  *  - S16 insert-new-urls: the reference inserts row-by-row and rolls
  *    back on unique-violation (nodes_helpers/collect.py:11-34). Here:
  *    dropDuplicates on the key + left_anti against existing, then
  *    append — one shuffle, no per-row round trips, same end state.
  *  - S18 delete-then-insert: the reference deletes a document's slices/
  *    sdgs/keyword-links then bulk-inserts replacements
  *    (document_vectorizer.py:91-95 etc.). Here: overwrite-by-key =
  *    anti-join the old table against the incoming keys, union the new
  *    rows, rewrite — or with partitioned layout, dynamic partition
  *    overwrite so only touched partitions rewrite.
  *
  * All functions also come in a pure DataFrame form (suffix `Df`) so the
  * merge semantics are testable without filesystem I/O.
  */
object Merge {

  /** S16 semantics, pure form: rows from `incoming` whose `key` is not
    * already in `existing`, de-duplicated within the batch (first by
    * `orderCol` wins, deterministic). */
  def insertIfAbsentDf(existing: DataFrame, incoming: DataFrame,
      key: String, orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(orderCol))
    incoming
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .join(existing.select(key).distinct(), Seq(key), "left_anti")
  }

  /** S18 semantics, pure form: `table` with every row whose `key` appears
    * in `replacement` swapped out for the replacement rows. */
  def replaceByKeyDf(table: DataFrame, replacement: DataFrame,
      key: String): DataFrame = {
    val keys = replacement.select(key).distinct()
    table.join(keys, Seq(key), "left_anti")
      .unionByName(replacement)
  }

  /** Disk form of insert-if-absent against a parquet table dir. Creates
    * the table if missing. Returns the number of appended rows. */
  def insertIfAbsent(spark: SparkSession, tableDir: String,
      incoming: DataFrame, key: String, orderCol: String): Long = {
    val exists = new java.io.File(tableDir).exists()
    val toWrite = if (exists) {
      insertIfAbsentDf(spark.read.parquet(tableDir), incoming, key, orderCol)
    } else incoming
    val n = toWrite.count()
    if (n > 0) toWrite.write.mode(SaveMode.Append).parquet(tableDir)
    n
  }

  /** Disk form of delete-then-insert, keyed overwrite. The table is
    * partitioned by `bucketExpr(key)` (default: 64 buckets) so only the
    * partitions containing replaced keys rewrite — at 100 TB a full-table
    * rewrite per micro-batch is not viable, dynamic partition overwrite
    * is. */
  def replaceByKey(spark: SparkSession, tableDir: String,
      replacement: DataFrame, key: String, numBuckets: Int = 64): Unit = {
    val withBucket = replacement
      .withColumn("__bucket", pmod(xxhash64(col(key)), lit(numBuckets)))
    val exists = new java.io.File(tableDir).exists()
    if (!exists) {
      withBucket.write.partitionBy("__bucket").parquet(tableDir)
    } else {
      val old = spark.read.parquet(tableDir)
      val touched = withBucket.select("__bucket").distinct()
        .collect().map(_.getLong(0)).toSet
      val keep = old
        .where(col("__bucket").isin(touched.toSeq.map(x => x: Any): _*))
        .join(replacement.select(key).distinct(), Seq(key), "left_anti")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      keep.unionByName(withBucket)
        .write.mode(SaveMode.Overwrite).partitionBy("__bucket")
        .parquet(tableDir)
    }
  }
}
