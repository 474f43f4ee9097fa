package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-log analytics: ordered funnels and cohort retention.
  *
  * The reference's event surface is its API request log
  * (`user_related` tables, `welearn_database/models/user_related.py`) —
  * it records per-key activity but ships no funnel/cohort queries. These
  * are the two standard questions a product team asks of exactly that
  * log, so the engine provides them as first-class operators over any
  * `(user, time, type)` event frame.
  *
  * Both operators are pure integer arithmetic end to end (epoch-second
  * longs, counts) — zero float surface, so the DuckDB oracles replay
  * them exactly.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, the deepest prefix of `steps`
    * reachable by a time-ordered event subsequence (step i's event at
    * time >= step i-1's chosen event). Uses the greedy earliest-match
    * construction: t1 = min time of step 1, t_i = min time of step i
    * with t >= t_{i-1}. Greedy-earliest is optimal (exchange argument:
    * any witness subsequence can only be delayed by replacing its
    * prefix with earlier matches), so this IS the max depth.
    *
    * Plan shape — a join chain that mirrors the construction: one
    * filtered aggregate per step, each joined to the previous step's
    * per-user frontier on the user key. All joins co-partition on
    * `userCol`, so after the first shuffle the rest reuse the exchange;
    * the event scan is re-read once per step with the step's type
    * predicate PUSHED into the scan (at 100 TB a type-pruned column
    * scan per step beats materializing per-user sorted event arrays,
    * which would put the whole log through one skew-prone shuffle and
    * cap a user's events in executor memory). Funnel depth is bounded
    * by `steps.length` (3-5 in practice), so the chain is short.
    *
    * Returns one row per step: (step 1-based, step_name, users reaching
    * that depth). Counts are non-increasing by construction.
    *
    * Hot-key skew: a user with millions of step-i events lands all of
    * them in one shuffle partition of the step join. Two defenses:
    * AQE's OptimizeSkewedJoin splits oversized partitions of exactly
    * this join shape at runtime (the engine runs with AQE on), and
    * `salts > 1` hardens the plan DETERMINISTICALLY — step events
    * spread across `salts` sub-keys (hash of the event time), the
    * 1-row-per-user frontier replicates `salts`×, the join runs on
    * (user, salt), and the per-user min reduces in two phases
    * (per-salt, then per-user over <= salts rows). Any partition's
    * share of a hot user is bounded by ~1/salts of its events, at the
    * cost of a frontier `salts`× its (tiny) size. Identical results by
    * construction — min is associative over the salt partition —
    * pinned by the skew spec.
    */
  def funnel(events: DataFrame, userCol: String, timeCol: String,
      typeCol: String, steps: Seq[String], salts: Int = 1): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(salts >= 1, "salts must be >= 1")
    val user = col(userCol)
    // frontier: per-user earliest completion time of the step prefix
    var frontier: DataFrame = events
      .where(col(typeCol) === steps.head)
      .groupBy(user).agg(min(col(timeCol)).as("t"))
    var out = frontier.agg(count(lit(1)).as("users"))
      .select(lit(1).as("step"), lit(steps.head).as("step_name"),
        col("users"))
    steps.zipWithIndex.drop(1).foreach { case (st, i) =>
      val stepEvents = events.where(col(typeCol) === st)
      val prev = frontier.withColumnRenamed("t", "t_prev")
      frontier =
        if (salts == 1)
          stepEvents.join(prev, Seq(userCol))
            .where(col(timeCol) >= col("t_prev"))
            .groupBy(user).agg(min(col(timeCol)).as("t"))
        else
          stepEvents
            .withColumn("__salt", pmod(hash(col(timeCol)), lit(salts)))
            .join(prev.withColumn("__salt",
              explode(sequence(lit(0), lit(salts - 1)))),
              Seq(userCol, "__salt"))
            .where(col(timeCol) >= col("t_prev"))
            .groupBy(user, col("__salt")).agg(min(col(timeCol)).as("t"))
            .groupBy(user).agg(min(col("t")).as("t"))
      out = out.unionAll(frontier.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(st).as("step_name"),
          col("users")))
    }
    out
  }

  /** Cohort retention: users bucketed by the period of their FIRST
    * event (the cohort), then for every (cohort, periods-since-cohort)
    * cell, how many distinct cohort members were active. `periodSec`
    * is the bucket width (86400*7 for weekly cohorts).
    *
    * Plan shape: one aggregate for the per-user cohort assignment (one
    * shuffle on the user key), joined back to the event stream on the
    * same key (co-partitioned — AQE reuses the exchange), then a
    * distinct-count over (cohort, offset). The per-user first-event
    * aggregate is exactly the J1 greatest-per-group shape, reused here
    * as a dimension. Offsets are integer period indices, never
    * timestamps, so the output is dense-comparable across engines.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      timeCol: String, periodSec: Long): DataFrame = {
    // DIV = integer floor division on longs — same operator DuckDB's
    // `//` applies; no float division anywhere in the bucketing.
    val firstSeen = events.groupBy(col(userCol))
      .agg(min(col(timeCol)).cast("long").as("first_t"))
      .select(col(userCol), expr(s"first_t DIV ${periodSec}L")
        .as("cohort_period"))
    events.select(col(userCol), col(timeCol).cast("long").as("t"))
      .withColumn("active_period", expr(s"t DIV ${periodSec}L"))
      .drop("t")
      .join(firstSeen, Seq(userCol))
      .groupBy(col("cohort_period"),
        (col("active_period") - col("cohort_period")).as("period_offset"))
      .agg(countDistinct(col(userCol)).as("active_users"))
  }
}
