package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.operators.EditDistanceJoin

/** Streaming fuzzy (edit-distance) self-match — the continuous form
  * of [[graft.operators.EditDistanceJoin.selfJoin]], completing the
  * streaming parity story for the similarity family (exact dedup and
  * LSH near-dup stream since rounds 10-11; this adds the PassJoin
  * tier). Documents arrive in micro-batches and each new string must
  * match against EVERYTHING seen so far within edit distance `tau`,
  * which a per-batch join cannot do — so the PassJoin BLOCK KEY
  * (slot, source length, segment bytes) becomes the state key,
  * exactly the NearDupStream band-bucket move: the partition lemma
  * says two strings within tau share at least one block key in the
  * index/probe discipline, so keying state by block makes the state
  * lookup the candidate search, with NO quadratic pass anywhere.
  *
  * Per arriving string the flatMap emits the same rows the batch
  * operator's two sides generate — tau+1 INDEX segments of its own
  * partition layout, and the multi-match-aware PROBE substrings
  * against every candidate source length in [m-tau, m+tau] (ONE
  * enumeration implementation, [[entriesFor]], mirroring
  * selfJoin's pairsAmong line for line). Strings of length <= tau
  * ride a dedicated degenerate key as both roles, the streaming twin
  * of the batch short-bucket cross join.
  *
  * State per block key holds the (id, string) lists of its first
  * `maxBlock` index members and probe members (first-seen kept, the
  * NearDupStream convention). Memory is O(blocks x maxBlock x string
  * length), independent of stream length for non-degenerate corpora.
  * THE CAP IS A RECALL BOUNDARY, stated plainly: an overflow arrival
  * is verified against the stored survivors but not stored, so a pair
  * between TWO post-overflow arrivals of the same block is found only
  * if they share some OTHER non-overflowed block key — the batch
  * parity contract below holds unconditionally only while no block
  * exceeds the cap. Size the cap to the corpus's hottest segment
  * class (StreamProof's sf0.1 proof raises it to 65536 and records
  * the bound the run actually needed); the default suits streams
  * whose boilerplate segments are pre-deduplicated upstream.
  *
  * Candidates verify INSIDE the fold with
  * [[EditDistanceJoin.boundedLevenshtein]] (the local twin of the
  * engine's 3-arg levenshtein — parity spec-pinned), so a pair costs
  * O(tau * len) exactly like the batch verify. A pair reachable
  * through several block keys is emitted once per key with identical
  * distances; the parity contract is therefore on the DISTINCT
  * (id_a, id_b, dist) set over any stream prefix, which must equal
  * the batch selfJoin over the same strings whenever no block
  * overflows its cap — the same contract NearDupStream pins for the
  * LSH tier. Replayed ids (at-least-once
  * sources) are skipped per key and role: exactly-once pairing on
  * top of at-least-once delivery. */
object EditDistanceStream {

  final case class StreamStr(id: Long, s: String)

  /** One keyed row: a string acting as block `bkey`'s index segment
    * (isIndex) or probe substring. */
  final case class BlockEntry(bkey: String, isIndex: Boolean,
    id: Long, s: String)

  final case class EditPair(id_a: Long, id_b: Long, dist: Int)

  /** Block membership, both roles (ids aligned with strings). */
  final case class BlockState(idxIds: Seq[Long], idxStrs: Seq[String],
    prbIds: Seq[Long], prbStrs: Seq[String])

  /** First-seen per-role membership cap (see scaladoc above). */
  val MaxBlock = 256

  /** The batch operator's block-key enumeration, verbatim:
    * [[EditDistanceJoin.blockEntries]] IS the single implementation
    * (segment layout, probe window, shift/delta budget, short key) —
    * the parity contract depends on the two sides enumerating
    * identically, so the stream only re-shapes the shared tuples. */
  private[graft] def entriesFor(d: StreamStr, tau: Int): Seq[BlockEntry] =
    EditDistanceJoin.blockEntries(d.id, d.s, tau).map {
      case (bkey, isIdx, id, s) => BlockEntry(bkey, isIdx, id, s)
    }

  /** Fold one block's micro-batch arrivals: each new entry verifies
    * against every OPPOSITE-role member already present (state ∪
    * earlier-in-batch), then joins its role's list if it has room.
    * Arrivals fold in (id, role) order so pairing is deterministic
    * under Spark's unordered group iterator. */
  def pairBlock(tau: Int, maxBlock: Int)(bkey: String,
      entries: Iterator[BlockEntry],
      state: GroupState[BlockState]): Iterator[EditPair] = {
    val st = state.getOption.getOrElse(
      BlockState(Seq.empty, Seq.empty, Seq.empty, Seq.empty))
    var idxIds = st.idxIds; var idxStrs = st.idxStrs
    var prbIds = st.prbIds; var prbStrs = st.prbStrs
    val seenIdx = scala.collection.mutable.HashSet[Long](idxIds: _*)
    val seenPrb = scala.collection.mutable.HashSet[Long](prbIds: _*)
    val out = Seq.newBuilder[EditPair]
    var grew = false
    entries.toSeq.sortBy(e => (e.id, !e.isIndex)).foreach { e =>
      val seen = if (e.isIndex) seenIdx else seenPrb
      if (!seen(e.id)) {
        val (oIds, oStrs) =
          if (e.isIndex) (prbIds, prbStrs) else (idxIds, idxStrs)
        var i = 0
        while (i < oIds.length) {
          if (oIds(i) != e.id) {
            val d = EditDistanceJoin.boundedLevenshtein(e.s, oStrs(i), tau)
            if (d >= 0)
              out += EditPair(math.min(e.id, oIds(i)),
                math.max(e.id, oIds(i)), d)
          }
          i += 1
        }
        val roomIn = if (e.isIndex) idxIds else prbIds
        if (roomIn.length < maxBlock) {
          if (e.isIndex) { idxIds = idxIds :+ e.id; idxStrs = idxStrs :+ e.s }
          else { prbIds = prbIds :+ e.id; prbStrs = prbStrs :+ e.s }
          grew = true
        }
        seen += e.id
      }
    }
    if (grew) state.update(BlockState(idxIds, idxStrs, prbIds, prbStrs))
    out.result().iterator
  }

  /** Wire a string stream into the block-keyed stateful matcher. */
  def editPairs(docs: Dataset[StreamStr], tau: Int,
      maxBlock: Int = MaxBlock)(
      implicit spark: SparkSession): Dataset[EditPair] = {
    import spark.implicits._
    require(tau >= 1, "tau must be >= 1")
    require(maxBlock >= 1, "maxBlock must be >= 1")
    docs.flatMap(entriesFor(_, tau))
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(pairBlock(tau, maxBlock))
  }
}
