package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.operators.Dedup

/** Streaming SimHash near-dup matcher — the continuous form of
  * [[graft.operators.Dedup.simhashPairs]], completing the streaming
  * surface's banded family (exact = Curation, MinHash-LSH =
  * NearDupStream, edit distance = EditDistanceStream). The batch
  * operator's band buckets ARE the state, exactly the NearDupStream
  * pattern: a 64-bit signature splits into equal-width bands
  * (4×16-bit at maxHamming ≤ 3, 8×8-bit at 4..7 — the same pigeonhole
  * radii as batch), a doc lands in one bucket per band, and two docs
  * are candidates iff they share a bucket; verify is the exact
  * popcount of the XOR, kept iff ≤ maxHamming.
  *
  * One signer implementation: [[Dedup.simhashSignature]], the batch
  * UDF's body — null/word-free docs sign 0L and DO pair with each
  * other at hamming 0, matching the batch plan's semantics.
  *
  * State per band bucket is the (id, simhash) list of its first-seen
  * members, capped at [[maxBucketFor]](expectedDocs, maxHamming) — a
  * cap DERIVED from the caller's stated corpus scale (the
  * NearDupStream overflow semantics: an overflow doc is checked
  * against the survivors, then dropped from state — recall against
  * later arrivals is lost only for degenerate boilerplate buckets,
  * stated plainly rather than hidden). Memory is
  * O(buckets × cap × (8B id + 8B sig)), independent of stream length
  * for non-degenerate corpora — a SMALLER footprint than
  * NearDupStream's (one long per sig, not 16).
  *
  * Emission: a pair is scored once per SHARED band; cross-band
  * repeats carry identical hammings — consumers dedup on
  * (id_new, id_old) with a batch `distinct`, the idempotent-upsert
  * convention shared by the whole streaming family. A doc arriving at
  * a FULL bucket additionally emits an [[SimHashStream.OverflowId]]
  * marker row (hamming -1), so cap truncation is observable in the
  * output stream itself.
  *
  * Parity contract (spec-pinned): the distinct canonicalized
  * (min id, max id, hamming) set over any stream prefix equals batch
  * [[Dedup.simhashPairs]] over the same documents. */
object SimHashStream {

  final case class StreamDoc(id: Long, text: String)

  /** One signed document in one of its band buckets. */
  final case class BandedSig(bkey: String, id: Long, simhash: Long)

  final case class HammingPair(id_new: Long, id_old: Long, hamming: Int)

  /** `id_old` of an overflow MARKER row: `(id, OverflowId, -1)` means
    * doc `id` arrived at a full bucket and was verified against the
    * survivors but NOT retained — recall against later arrivals is
    * lost for that doc in that band. Emitted (once per overflowing
    * band) so cap truncation is an observable stream fact, not a
    * scaladoc footnote (round-14 advice): a consumer alerts on ANY
    * marker, or counts them to size `maxBucket`. Real pairs always
    * carry `hamming >= 0` and `id_old >= 0` — filter
    * `hamming >= 0` to consume pairs only. */
  val OverflowId: Long = -1L

  /** Bucket membership: ids + signatures of the first-seen docs. */
  final case class BucketState(ids: Seq[Long], sigs: Seq[Long])

  /** FLOOR of the derived bucket cap (no longer a caller-facing
    * default — round-16 fix of the round-15 finding that a constant 64
    * sat ~250× under the proof corpus's measured occupancy). UNLIKE
    * NearDupStream's minhash band keys (a huge keyspace where only
    * near-dups collide), SimHash bands have only 2^width buckets (256
    * at the 8×8-bit geometry), so expected occupancy is corpus/256 per
    * band and the cap must scale with the corpus: [[hammingPairs]] now
    * REQUIRES `expectedDocs` and derives the cap via [[maxBucketFor]];
    * an explicit cap (memory-constrained deployments, proof harnesses)
    * goes through [[hammingPairsCapped]], stated rather than
    * defaulted. The cap trades memory for recall against later
    * arrivals, and a truncated bucket breaks batch parity by design
    * (the StreamProof run records the bound it actually needed AND the
    * max per-bucket occupancy it observed, the EditDistanceStream cap
    * convention). Truncation stays observable at runtime via
    * [[OverflowId]] marker rows. */
  val MaxBucket = 64

  /** Cap sized from an expected corpus: uniform signatures spread
    * ~expectedDocs / 2^bandWidth docs into each of a band's buckets,
    * so the cap is that occupancy with 8x headroom for skew (floored
    * at [[MaxBucket]]) — boilerplate-heavy corpora concentrate far
    * past uniform, and the [[OverflowId]] markers report when even
    * this bound truncates. Use as `hammingPairs(docs, r,
    * maxBucketFor(expected, r))`. */
  def maxBucketFor(expectedDocs: Long, maxHamming: Int): Int = {
    require(expectedDocs >= 0, s"expectedDocs: $expectedDocs")
    val nBands = if (maxHamming <= 3) 4 else 8
    val buckets = 1L << (64 / nBands).min(31)
    val uniform = (expectedDocs + buckets - 1) / buckets
    math.max(MaxBucket.toLong, uniform * 8L)
      .min(Int.MaxValue.toLong).toInt
  }

  /** Fold one bucket's micro-batch arrivals: each new doc verifies
    * against every doc already in the bucket (state ∪
    * earlier-in-batch), then joins the bucket if it has room. A doc
    * id already present is an at-least-once replay and is skipped —
    * exactly-once pairing on top of at-least-once delivery. Arrivals
    * sort by id so pairing is deterministic under Spark's unordered
    * group iterator. */
  def pairBucket(maxHamming: Int, maxBucket: Int)(bkey: String,
      docs: Iterator[BandedSig], state: GroupState[BucketState])
      : Iterator[HammingPair] = {
    // index into ARRAYS, never the state's Seq: a restored Seq is a
    // List, whose apply is O(i) — with SimHash's 256-buckets-a-band
    // occupancy (thousands of members per bucket at proof scale) the
    // linear-seq indexing turned the per-bucket fold cubic and
    // stalled the round-14 proof chain for an hour before it was
    // caught in a thread dump
    val st = state.getOption
    val ids = new scala.collection.mutable.ArrayBuffer[Long]()
    val sigs = new scala.collection.mutable.ArrayBuffer[Long]()
    st.foreach { s => ids ++= s.ids; sigs ++= s.sigs }
    val seen = scala.collection.mutable.HashSet[Long](ids.toSeq: _*)
    val out = Seq.newBuilder[HammingPair]
    var grew = false
    docs.toSeq.sortBy(_.id).foreach { d =>
      if (!seen(d.id)) {
        var i = 0
        while (i < ids.length) {
          val h = java.lang.Long.bitCount(d.simhash ^ sigs(i))
          if (h <= maxHamming) out += HammingPair(d.id, ids(i), h)
          i += 1
        }
        if (ids.length < maxBucket) {
          ids += d.id
          sigs += d.simhash
          grew = true
        } else {
          // cap truncation must be visible at runtime, not only in
          // the scaladoc: one marker row per overflowing band
          out += HammingPair(d.id, OverflowId, -1)
        }
        seen += d.id
      }
    }
    if (grew) state.update(BucketState(ids.toSeq, sigs.toSeq))
    out.result().iterator
  }

  /** The radius-dependent band keys of one signature — ONE
    * enumeration shared by the stream wiring, the StreamProof state
    * bound, and the spec (the EditDistanceStream.entriesFor
    * precedent: a proof bound that re-implements the geometry inline
    * silently desyncs when the radius changes the band width).
    * Geometry matches batch [[Dedup.simhashPairs]] exactly: 4×16-bit
    * bands at maxHamming ≤ 3, 8×8-bit at 4..7. */
  def bandKeys(sig: Long, maxHamming: Int): Seq[String] = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"simhash banding guarantees recall only to hamming 0..7; " +
        s"got maxHamming=$maxHamming")
    val nBands = if (maxHamming <= 3) 4 else 8
    val width = 64 / nBands
    val mask = (1L << width) - 1
    (0 until nBands).map(b => s"$b:${(sig >>> (b * width)) & mask}")
  }

  /** Wire a document stream into the banded stateful verifier. Band
    * geometry matches batch [[Dedup.simhashPairs]] exactly, so the
    * pigeonhole recall guarantee (complete up to hamming bands-1, and
    * in practice to the verify radius via multi-band agreement) is
    * the batch one.
    *
    * The bucket cap is DERIVED from `expectedDocs` (see
    * [[maxBucketFor]]): callers state the corpus scale they expect
    * instead of inheriting a constant that silently truncates on real
    * corpora; [[OverflowId]] markers still report when even the
    * derived bound is exceeded. An explicit cap goes through
    * [[hammingPairsCapped]]. */
  def hammingPairs(docs: Dataset[StreamDoc], expectedDocs: Long,
      maxHamming: Int = 7)(
      implicit spark: SparkSession): Dataset[HammingPair] =
    hammingPairsCapped(docs, maxHamming,
      maxBucketFor(expectedDocs, maxHamming))

  /** [[hammingPairs]] with an EXPLICIT bucket cap — for memory-bounded
    * deployments and proof harnesses; the cap is a stated decision,
    * never a default. */
  def hammingPairsCapped(docs: Dataset[StreamDoc], maxHamming: Int,
      maxBucket: Int)(
      implicit spark: SparkSession): Dataset[HammingPair] = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"simhash banding guarantees recall only to hamming 0..7; " +
        s"got maxHamming=$maxHamming")
    import spark.implicits._
    val banded = docs.flatMap { d =>
      val sig = Dedup.simhashSignature(d.text)
      bandKeys(sig, maxHamming).map(k => BandedSig(k, d.id, sig))
    }
    banded.groupByKey(_.bkey)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(pairBucket(maxHamming, maxBucket))
  }
}
