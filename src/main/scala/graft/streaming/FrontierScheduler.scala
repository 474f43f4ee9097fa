package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming politeness scheduler — the continuous form of
  * [[graft.operators.Retrieval.politenessSchedule]]: frontier URLs
  * arrive in micro-batches, and each host's fetch queue must stay
  * sequential and delay-spaced ACROSS batches, which a per-batch
  * window cannot do (batch N would restart every host at slot 1).
  *
  * State per host is two longs (last assigned sequence number + last
  * assigned fetch time) — the smallest state that makes the schedule
  * a continuation; memory is O(distinct hosts), not O(urls). Within a
  * micro-batch, a host's arrivals sort by URL so the assignment is
  * deterministic under Spark's unordered group iterator (the same
  * url-total-order contract as the batch operator's `order`).
  *
  * Parity contract (spec-pinned): feeding the same rows through one
  * batch of this scheduler equals the batch operator with
  * `order = url`; feeding them across several micro-batches continues
  * seq/time instead of restarting — the property the batch form
  * cannot express. */
object FrontierScheduler {

  /** One frontier arrival: `delay_ms` is the host's politeness delay,
    * already joined from the robots/crawl-delay dimension (the
    * [[graft.sources.Robots.crawlDelay]] feed). */
  final case class FrontierUrl(host: String, url: String,
      delay_ms: Long)

  final case class ScheduledFetch(host: String, url: String,
      fetch_seq: Long, fetch_at_ms: Long)

  /** (last assigned seq, last assigned fetch time). `ver` is the
    * [[StateVersion]] stamp (round 18 — a schedule restored under
    * changed `last_at_ms` semantics would silently produce wrong
    * fetch times; the stamp makes that a named error instead).
    * CHECKPOINT BREAK: adding the stamp changed this state schema —
    * restart pre-round-18 frontier queries from a fresh checkpoint. */
  final case class HostSched(ver: Int, seq: Long, last_at_ms: Long)

  /** Fold one host's micro-batch arrivals into its schedule: first
    * fetch ever is at t=0, each subsequent fetch is the previous
    * assignment plus the CURRENT url's delay (a delay change applies
    * from the next fetch — the robots refresh semantics). */
  def scheduleHost(host: String, urls: Iterator[FrontierUrl],
      state: GroupState[HostSched]): Iterator[ScheduledFetch] = {
    val st = state.getOption
    st.foreach(s => StateVersion.check("FrontierScheduler", s.ver))
    var seq = st.map(_.seq).getOrElse(0L)
    var last = st.map(_.last_at_ms).getOrElse(0L)
    val out = Seq.newBuilder[ScheduledFetch]
    urls.toSeq.sortBy(_.url).foreach { u =>
      val at = if (seq == 0L) 0L else last + u.delay_ms
      seq += 1
      out += ScheduledFetch(host, u.url, seq, at)
      last = at
    }
    if (seq > 0L)
      state.update(HostSched(StateVersion.Current, seq, last))
    out.result().iterator
  }

  /** Wire a streaming frontier into the per-host scheduler. */
  def schedule(frontier: Dataset[FrontierUrl])(
      implicit spark: SparkSession): Dataset[ScheduledFetch] = {
    import spark.implicits._
    frontier.groupByKey(_.host)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(scheduleHost)
  }
}
