package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.operators.Dedup

/** Streaming incremental near-dup — the continuous form of
  * [[graft.operators.Dedup.minhashLshIncremental]]: documents arrive
  * in micro-batches and each new document must be checked against
  * EVERYTHING seen so far, which a per-batch join cannot do (batch N
  * would only pair within itself). The LSH band buckets ARE the
  * state: a document's signature lands in `bands` buckets, and two
  * documents are candidates iff they share a bucket — so keying the
  * stateful operator by band key makes the state lookup the candidate
  * search.
  *
  * State per band bucket is the (id, signature) list of its members,
  * capped at `maxBucket` (first-seen kept — the dedup-keep-first
  * convention; an overflowing bucket is a degenerate band — think
  * boilerplate-identical docs — and every overflow doc was already
  * checked against the survivors before being dropped from state).
  * Memory is O(buckets × maxBucket × 16 longs), independent of stream
  * length for non-degenerate corpora.
  *
  * Emission: a pair is scored ONCE per shared band (same micro-batch
  * or later); cross-band repeats of the same pair are emitted per
  * band with identical scores — consumers are idempotent-upsert sinks
  * (the q107/S18 convention), or dedup on (id_new, id_old) with the
  * batch `distinct`. Within a micro-batch a bucket's arrivals sort by
  * id, so pairing is deterministic under Spark's unordered group
  * iterator.
  *
  * Parity contract (spec-pinned): the distinct (id_new, id_old,
  * est_jaccard) set over any prefix of the stream equals the batch
  * portable-LSH pass over the same documents — same signer
  * ([[Dedup.portableSignature]], one implementation), same
  * matching-fraction estimate, same HALF_UP rounding as Spark's
  * `round(x + 1e-9, 4)`. */
object NearDupStream {

  final case class StreamDoc(id: Long, text: String)

  /** One signed document in one of its band buckets. */
  final case class BandedDoc(bkey: String, id: Long, sig: Seq[Long])

  final case class NearDupPair(id_new: Long, id_old: Long,
    est_jaccard: Double)

  /** Bucket membership: ids + signatures of the first-seen docs. */
  final case class BucketState(ids: Seq[Long], sigs: Seq[Seq[Long]])

  private def estJaccard(a: Seq[Long], b: Seq[Long]): Double = {
    var m = 0
    var j = 0
    while (j < a.length) { if (a(j) == b(j)) m += 1; j += 1 }
    BigDecimal(m.toDouble / a.length + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Fold one bucket's micro-batch arrivals: each new doc pairs with
    * every doc already in the bucket (state ∪ earlier-in-batch), then
    * joins the bucket if it has room. A doc id already present is a
    * replay (at-least-once source) and is skipped — exactly-once
    * pairing on top of at-least-once delivery. */
  def pairBucket(bkey: String, docs: Iterator[BandedDoc],
      state: GroupState[BucketState]): Iterator[NearDupPair] = {
    // index into ARRAYS, never the state's Seq (a restored Seq is a
    // List with O(i) apply — the SimHashStream round-14 lesson;
    // bounded here by MaxBucket, fixed for the shared shape anyway)
    val st = state.getOption
    val ids = new scala.collection.mutable.ArrayBuffer[Long]()
    val sigs = new scala.collection.mutable.ArrayBuffer[Seq[Long]]()
    st.foreach { s => ids ++= s.ids; sigs ++= s.sigs }
    val seen = scala.collection.mutable.HashSet[Long](ids.toSeq: _*)
    val out = Seq.newBuilder[NearDupPair]
    var grew = false
    docs.toSeq.sortBy(_.id).foreach { d =>
      if (!seen(d.id)) {
        var i = 0
        while (i < ids.length) {
          out += NearDupPair(d.id, ids(i), estJaccard(d.sig, sigs(i)))
          i += 1
        }
        if (ids.length < MaxBucket) {
          ids += d.id
          sigs += d.sig
          grew = true
        }
        seen += d.id
      }
    }
    if (grew) state.update(BucketState(ids.toSeq, sigs.toSeq))
    out.result().iterator
  }

  /** First-seen bucket membership cap (see scaladoc above). */
  val MaxBucket = 64

  /** Wire a document stream into the banded stateful pairer. */
  def nearDupPairs(docs: Dataset[StreamDoc], n: Int = 3,
      bands: Int = 4)(implicit spark: SparkSession)
      : Dataset[NearDupPair] = {
    import spark.implicits._
    val rows = 16 / bands
    val banded = docs.flatMap { d =>
      val sig = Dedup.portableSignature(d.text, n)
      if (sig.isEmpty) Seq.empty[BandedDoc]
      else (0 until bands).map { b =>
        val band = sig.slice(b * rows, (b + 1) * rows)
        BandedDoc(s"$b:" + band.mkString(","), d.id, sig.toSeq)
      }
    }
    banded.groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(pairBucket)
  }
}
