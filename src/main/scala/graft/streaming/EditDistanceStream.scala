package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
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
  * State per block key holds its index and probe members GROUPED BY
  * DISTINCT STRING (round 17 — the banded family's contraction
  * discipline): one [[StrClass]] per distinct string per role, so a
  * mass-duplication clique occupies one class, an arriving duplicate
  * joins its class past any cap, and the per-arrival verify is one
  * boundedLevenshtein per opposite-role CLASS — the distance is a
  * pure function of the two strings, so contraction is EXACT for
  * this operator's semantics outright. THE CAP — `maxBlock` distinct
  * string classes per role, first-seen kept — IS A RECALL BOUNDARY,
  * stated plainly: an overflow arrival is verified against the
  * stored classes but not stored, and since round 17 it emits an
  * [[OverflowId]] MARKER row (dist -1) so truncation is an
  * observable stream fact; the batch parity contract below holds
  * unconditionally only while no (block, role)'s distinct-string
  * diversity exceeds the cap. Since round 18 the production entry
  * point [[editPairsFor]] DERIVES the cap from stated corpus scale
  * via [[maxBlockFor]] (classes ≤ distinct strings ≤ docs — the
  * SimHashStream theorem verbatim, so the derived cap never
  * truncates within stated scale; the pre-round-18 default
  * `MaxBlock = 256` was a headroom constant of exactly the species
  * the round-17 skew measurements discredited, and survives only as
  * the floor); a deployment that must bound per-block state below
  * the corpus's real diversity states that through
  * [[editPairsCapped]], and the proofs record the bound each run
  * actually needed.
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

  /** `id_b` of an overflow MARKER row: `(id, OverflowId, -1)` means
    * `id` arrived with a NEW string at a (block, role) already
    * holding `maxBlock` string classes and was verified against the
    * opposite role's retained classes but NOT retained — recall
    * against later opposite-role arrivals is lost for that id in
    * that block. Round 17: truncation used to be silent here. Real
    * pairs always carry `dist >= 0` — filter on it to consume pairs
    * only. */
  val OverflowId: Long = -1L

  /** One distinct string's members within a (block, role): `ids`
    * holds every retained entry bearing `s`, in arrival order. */
  final case class StrClass(s: String, ids: Seq[Long])

  /** Block membership, both roles, grouped by DISTINCT STRING
    * (round 17 — the banded family's contraction discipline):
    * byte-identical strings produce identical block entries and
    * identical edit distances, so a mass-duplication clique occupies
    * ONE class per role; an arriving duplicate joins its class past
    * any cap, the per-arrival verify runs ONE boundedLevenshtein per
    * opposite-role CLASS (the distance is a pure function of the two
    * strings — re-expanding the verdict over a class's ids is output
    * volume, not verify cost), and the cap bounds distinct-string
    * classes per role.
    * `ver` is the [[StateVersion]] stamp (round 18): checked on
    * restore, named error on mismatch. CHECKPOINT BREAK: adding the
    * stamp changed the state schema (as the round-17 contraction did
    * before it) — restart pre-round-18 queries from a fresh
    * checkpoint (replay reproduces the output exactly; pairs are
    * idempotent-upsert). */
  final case class BlockState(ver: Int, idx: Seq[StrClass],
    prb: Seq[StrClass])

  /** FLOOR of the derived per-role string-class cap (round 18: a
    * headroom constant survives only as a floor, never a default). */
  val MaxBlock = 256

  /** Cap sized from an expected corpus: `expectedDocs` itself
    * (floored at [[MaxBlock]], clamped to Int) — the classes-≤-docs
    * theorem at the PassJoin tier: a (block, role)'s class count is
    * its distinct-string count, and distinct strings cannot exceed
    * the documents that produced them, so the derived cap never
    * truncates within stated scale regardless of how hot a shared
    * segment class runs (the proofs' worst case — a common 8-char
    * prefix × replicas — is exactly the shape that outgrew any
    * constant). Cost stays bounded by the contraction, not the cap:
    * per-arrival verify is one boundedLevenshtein per opposite-role
    * CLASS, and state carries one string per class plus the
    * output-necessitated member ids. */
  def maxBlockFor(expectedDocs: Long): Int = {
    require(expectedDocs >= 0, s"expectedDocs: $expectedDocs")
    math.max(MaxBlock.toLong, expectedDocs)
      .min(Int.MaxValue.toLong).toInt
  }

  /** The batch operator's block-key enumeration, verbatim:
    * [[EditDistanceJoin.blockEntries]] IS the single implementation
    * (segment layout, probe window, shift/delta budget, short key) —
    * the parity contract depends on the two sides enumerating
    * identically, so the stream only re-shapes the shared tuples. */
  private[graft] def entriesFor(d: StreamStr, tau: Int): Seq[BlockEntry] =
    EditDistanceJoin.blockEntries(d.id, d.s, tau).map {
      case (bkey, isIdx, id, s) => BlockEntry(bkey, isIdx, id, s)
    }

  /** Fold one block's micro-batch arrivals: each new entry runs ONE
    * boundedLevenshtein per OPPOSITE-role string class already
    * present (state ∪ earlier-in-batch) and emits the verdict against
    * every member of in-distance classes (skipping its own id — a
    * doc's index and probe entries meet in its own blocks), then
    * joins its role's matching class (duplication never spends cap)
    * or claims a new class slot; a new string at a full role emits an
    * overflow marker and is dropped from state. Arrivals fold in
    * (id, role) order so pairing is deterministic under Spark's
    * unordered group iterator; replayed (id, role) entries are
    * skipped — exactly-once pairing over at-least-once delivery. */
  def pairBlock(tau: Int, maxBlock: Int)(bkey: String,
      entries: Iterator[BlockEntry],
      state: GroupState[BlockState]): Iterator[EditPair] = {
    // per-role parallel arrays of (string, member ids); index into
    // ArrayBuffers, never a restored Seq (the round-14 lesson)
    final class Role {
      val strs = new scala.collection.mutable.ArrayBuffer[String]()
      val members = new scala.collection.mutable.ArrayBuffer[
        scala.collection.mutable.ArrayBuffer[Long]]()
      val seen = scala.collection.mutable.HashSet[Long]()
      // O(1) own-class lookup for the duplicate-join decision — a
      // linear string-equality scan per arrival would be O(classes ×
      // strlen) of pure added work on top of the opposite-role verify
      val index = scala.collection.mutable.HashMap[String, Int]()
      def add(s: String, id: Long): Unit = {
        index(s) = strs.length
        strs += s
        members += scala.collection.mutable.ArrayBuffer(id)
      }
      def load(cs: Seq[StrClass]): Unit = cs.foreach { c =>
        index(c.s) = strs.length
        strs += c.s
        val m = new scala.collection.mutable.ArrayBuffer[Long](c.ids.size)
        c.ids.foreach { id => m += id; seen += id }
        members += m
      }
      def classes: Seq[StrClass] =
        strs.indices.map(i => StrClass(strs(i), members(i).toSeq))
    }
    val idx = new Role; val prb = new Role
    state.getOption.foreach { s =>
      StateVersion.check("EditDistanceStream", s.ver)
      idx.load(s.idx); prb.load(s.prb)
    }
    val out = Seq.newBuilder[EditPair]
    var grew = false
    entries.toSeq.sortBy(e => (e.id, !e.isIndex)).foreach { e =>
      val (mine, other) = if (e.isIndex) (idx, prb) else (prb, idx)
      if (!mine.seen(e.id)) {
        var matched = -1
        var i = 0
        while (i < other.strs.length) {
          val d = EditDistanceJoin.boundedLevenshtein(e.s,
            other.strs(i), tau)
          if (d >= 0) {
            val ms = other.members(i)
            var j = 0
            while (j < ms.length) {
              if (ms(j) != e.id)
                out += EditPair(math.min(e.id, ms(j)),
                  math.max(e.id, ms(j)), d)
              j += 1
            }
          }
          i += 1
        }
        // class membership in OUR role needs exact string equality —
        // O(1) via the role's hash index
        matched = mine.index.getOrElse(e.s, -1)
        if (matched >= 0) {
          // duplicate string: joins its class — never spends cap
          mine.members(matched) += e.id
          grew = true
        } else if (mine.strs.length < maxBlock) {
          mine.add(e.s, e.id)
          grew = true
        } else {
          // cap truncation must be visible at runtime (round 17 —
          // it used to be silent here)
          out += EditPair(e.id, OverflowId, -1)
        }
        mine.seen += e.id
      }
    }
    if (grew) state.update(BlockState(StateVersion.Current,
      idx.classes, prb.classes))
    out.result().iterator
  }

  /** Wire a string stream into the block-keyed stateful matcher —
    * the PRODUCTION entry point (round 18): callers state the corpus
    * scale they expect and the per-role class cap derives via
    * [[maxBlockFor]] (never truncates within stated scale — the
    * classes-≤-docs theorem), replacing the pre-round-18 defaulted
    * constant. Named `editPairsFor` (not `editPairs`) so the
    * migration is compile-breaking for every external caller — the
    * hammingPairsFor convention.
    *
    * CONSUMER CONTRACT: the output is pairs PLUS in-band
    * [[OverflowId]] marker rows (dist -1) — filter `dist >= 0` to
    * consume pairs; alert on anything else. Marker counts are
    * at-least-once EVENT counts (a replayed overflow arrival
    * re-marks — overflowed arrivals are deliberately not persisted),
    * so count distinct ids where exact truncated-doc counts
    * matter. */
  def editPairsFor(docs: Dataset[StreamStr], tau: Int,
      expectedDocs: Long)(
      implicit spark: SparkSession): Dataset[EditPair] =
    editPairsCapped(docs, tau, maxBlockFor(expectedDocs))

  /** [[editPairsFor]] with an EXPLICIT per-role class cap — for
    * memory-bounded deployments and proof harnesses; the cap is a
    * stated decision, never a default. */
  def editPairsCapped(docs: Dataset[StreamStr], tau: Int,
      maxBlock: Int)(
      implicit spark: SparkSession): Dataset[EditPair] = {
    import spark.implicits._
    require(tau >= 1, "tau must be >= 1")
    require(maxBlock >= 1, "maxBlock must be >= 1")
    docs.flatMap(entriesFor(_, tau))
      .groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(pairBlock(tau, maxBlock))
  }

  /** Pairs-only view of an [[editPairsFor]] output: drops the
    * [[OverflowId]] marker rows so downstream aggregates can't ingest
    * a sentinel as a pair. Column-predicate filter (not a typed
    * lambda) so the stream plan stays in codegen. */
  def pairsOnly(out: Dataset[EditPair]): Dataset[EditPair] =
    out.filter(col("dist") >= 0)

  /** Marker-only view: the overflow EVENTS (at-least-once — a
    * replayed overflow arrival re-marks; count distinct `id_a` where
    * exact truncated-doc counts matter). Alert on any row. */
  def markersOnly(out: Dataset[EditPair]): Dataset[EditPair] =
    out.filter(col("dist") < 0)
}
