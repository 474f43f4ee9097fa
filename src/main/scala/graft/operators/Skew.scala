package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY scale notes; BASELINE north star:
  * "salting for skew, AQE for runtime re-plan"). AQE's skew-join handles
  * sort-merge cases automatically; these helpers cover the two patterns
  * AQE can't fix: skewed aggregation keys and skewed broadcast-side
  * replication joins.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial-aggregate on (key, salt),
    * then final-aggregate on key. A hot key's rows spread over
    * `saltBuckets` reducers in phase 1 instead of hammering one.
    * `partialAggs`/`finalAggs` must compose (sum/sum, count/sum,
    * min/min, max/max...). */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
      partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted replicate join for a skewed LARGE side against a SMALL side
    * too big to broadcast whole but small enough to replicate
    * `saltBuckets` times: large rows get a random-ish salt; small rows
    * are exploded once per salt value; the join key becomes
    * (key, salt) — hot keys split across `saltBuckets` tasks. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLarge.join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Key-frequency profile: the diagnostic that decides whether to salt
    * (top-k heaviest keys + their share of rows). */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 10)
      : DataFrame = {
    val total = df.count()
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc)
      .limit(topK)
      .withColumn("share",
        round(col("cnt").cast("double") / total, 4))
  }
}
