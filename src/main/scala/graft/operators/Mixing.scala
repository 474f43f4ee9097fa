package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-mixing operators for training-corpus assembly: deterministic
  * CONTENT-HASH sampling and split assignment. `rand()`-based sampling
  * is seed- and partitioning-dependent and unreproducible across
  * engines; hashing the ID into a bucket makes the decision a pure
  * function of the row — the same document lands in the same
  * sample/split on every engine, every rerun, every cluster size, and
  * survives incremental reprocessing (a re-crawled doc keeps its split,
  * so train/test contamination cannot creep in across pipeline runs).
  * md5 is used (not xxhash64/murmur) because every engine agrees on it
  * byte-for-byte — the oracle checks these queries hash-exactly.
  */
object Mixing {

  /** Stable bucket in [0, buckets): first 8 hex chars of md5(id) as an
    * integer, mod buckets. Engine-portable (md5 + hex parse + mod). */
  def hashBucket(id: Column, buckets: Int = 10000): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Per-stratum deterministic sampling: keep a row iff its hash
    * bucket falls under its stratum's rate. Rates ride as a broadcast
    * dimension (stratum, rate-per-mille); strata absent from `rates`
    * are DROPPED (explicit mixing weights, like a data-mixture config).
    * One broadcast join + a row-local predicate — no shuffle of the
    * corpus, no rand(). */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      rates: Map[String, Double], idCol: String, buckets: Int = 1000,
      keepBucketCol: Option[String] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF(stratumCol, "__rate")
    // bucket computed ONCE as a column (Catalyst does not CSE an
    // expression repeated across Filter and Project, and callers often
    // want the bucket in the output — md5 per row is not free)
    val bucketed = df.join(broadcast(rateDf), stratumCol)
      .withColumn("__bucket", hashBucket(col(idCol), buckets))
      .where(col("__bucket") < (col("__rate") * buckets).cast("long"))
      .drop("__rate")
    keepBucketCol match {
      case Some(name) => bucketed.withColumnRenamed("__bucket", name)
      case None => bucketed.drop("__bucket")
    }
  }

  /** Deterministic train/val/test assignment by hash bucket:
    * [0, train) -> "train", [train, train+val) -> "val", rest "test".
    * Percentages in [0,1]; content-stable across reruns. */
  def assignSplit(id: Column, trainPct: Double, valPct: Double,
      buckets: Int = 1000): Column = {
    val b = hashBucket(id, buckets)
    val trainHi = math.round(trainPct * buckets)
    val valHi = math.round((trainPct + valPct) * buckets)
    when(b < trainHi, "train")
      .when(b < valHi, "val")
      .otherwise("test")
  }
}
