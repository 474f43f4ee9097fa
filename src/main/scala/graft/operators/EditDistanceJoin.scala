package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) self-join with PassJoin segment
  * blocking — all pairs within distance `tau`, without the O(n²)
  * cross join.
  *
  * Pigeonhole (Li, Deng & Feng, "PASS-JOIN: A Partition-based Method
  * for Similarity Joins", PVLDB 2011): partition a string s into
  * tau+1 contiguous segments; if ed(s, t) <= tau, an optimal alignment
  * has at most tau edit operations, so at least one segment of s is
  * untouched — it appears EXACTLY in t, shifted by at most tau
  * positions. Blocking on (segment index, source length, segment text)
  * therefore finds every qualifying pair.
  *
  * Plan shape (the 100-TB design):
  *   - INDEX side: strings of length >= tau+1 emit their tau+1
  *     segments — O(tau) rows per string, each a short key.
  *   - PROBE side: every string t emits, for each segment slot i and
  *     each plausible source length l in [len(t)-tau, len(t)+tau], the
  *     substrings of t at positions within tau of the slot's position
  *     — O(tau³) short rows per string, a CONSTANT per-row factor.
  *   - One equality shuffle join on (slot, source length, text) —
  *     bucket-local work, never all-pairs — then the codegen'd
  *     `levenshtein() <= tau` verify and a (least, greatest) distinct.
  *   - Strings shorter than tau+1 can only match strings of length
  *     <= 2*tau (ed >= length gap), so they pair inside one dedicated
  *     near-empty bucket (all-pairs over degenerate sub-tau-length
  *     strings; bounded by the alphabet, not the corpus).
  *
  * Length filtering is implicit: the probe only generates source
  * lengths within tau of its own, so |len(s)-len(t)| <= tau holds for
  * every candidate by construction.
  *
  * Determinism: output is the exact pair set with the exact distance —
  * integer-valued, engine-independent (both engines implement the
  * standard unit-cost Levenshtein DP) — so the oracle is a brute-force
  * SQL cross join.
  */
object EditDistanceJoin {

  /** PassJoin segment layout for length l with tau+1 slots: the first
    * `(tau+1) - l % (tau+1)` slots get floor(l/(tau+1)) chars, the
    * rest one more — (start 1-based, length) per slot. */
  private[graft] def segments(l: Int, tau: Int): Array[(Int, Int)] = {
    val k = tau + 1
    val base = l / k
    val longer = l % k
    val out = new Array[(Int, Int)](k)
    var start = 1
    var i = 0
    while (i < k) {
      val len = if (i < k - longer) base else base + 1
      out(i) = (start, len)
      start += len
      i += 1
    }
    out
  }

  private val selfJoinSlot = ReleaseSlot()

  /** Banded unit-cost Levenshtein with early abandon — the LOCAL twin
    * of Spark's 3-arg `levenshtein(l, r, tau)` expression (same
    * contract: the distance when <= tau, -1 past it; parity pinned by
    * spec against the engine expression, boundary values included).
    * Exists for executors that verify candidates OUTSIDE a Column
    * context — the streaming PassJoin matcher's per-group fold —
    * where constructing a one-row DataFrame per candidate would cost
    * a plan per pair. O(tau * max(n, m)) via a 2tau+1 diagonal band. */
  private[graft] def boundedLevenshtein(a: String, b: String,
      tau: Int): Int = {
    val n = a.length; val m = b.length
    if (math.abs(n - m) > tau) return -1
    if (n == 0) return m // <= tau via the guard above
    if (m == 0) return n
    val inf = tau + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    while (j <= math.min(m, tau)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      // first column is a genuine cell only while it sits in the band
      if (i <= tau) cur(0) = i
      var rowMin = cur(0)
      val lo = math.max(1, i - tau)
      val hi = math.min(m, i + tau)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > inf) v = inf // clamp: keeps the band's sentinels finite
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > tau) return -1 // early abandon: band exhausted
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) <= tau) prev(m) else -1
  }

  /** All pairs (id_a < id_b) with levenshtein(str_a, str_b) <= tau.
    * Output: (id_a, id_b, dist).
    *
    * Duplication-adaptive (the q68 pattern, specialized to edit
    * distance): an exact census routes corpora with byte-identical
    * strings through exact-class contraction — PassJoin runs among
    * min-id representatives only, intra-class pairs are dist=0 by
    * construction, and cross-class pairs lift from representative
    * pairs via membership joins (ed(X,Y) = ed(rep(X),rep(Y)) when
    * X,Y equal their reps byte-for-byte, so the emitted set is
    * bit-identical to the uncontracted plan's). Without the
    * contraction, c-member duplicate cliques make the segment-block
    * candidate set — and the Levenshtein verify — quadratic per
    * clique: the 100× scale tier's c=100 cliques meant ~25M verify
    * calls and a watchdog kill. Duplicate-free corpora keep the
    * original single-pass unpersisted plan — their only overhead is
    * ONE single-distinct census agg over the slim (id, s) projection.
    *
    * The contraction's bit-identity proof assumes ids identify rows;
    * if the census finds REPEATED ids (a degenerate input — every
    * real caller keys by document id), the class membership joins
    * would re-emit self-pairs and multiplicities that pairsAmong's
    * `id_l =!= id_r` + dropDuplicates guards remove, so such inputs
    * keep the original uncontracted plan verbatim instead — identical
    * behavior to the pre-adaptive operator, with its documented
    * quadratic-per-clique boundary.
    *
    * Input contract: `df` must be DETERMINISTIC under re-execution —
    * the census, the index side, and the probe side each re-read the
    * caller's lineage on the dup-free path (a persist pins a snapshot
    * only on the contraction path, where it pays for itself). A
    * caller whose frame derives from sampling / rand / shuffle-order-
    * dependent expressions, or whose lineage is expensive enough that
    * ~4 column-pruned re-reads beat a cache, should persist `df`
    * itself before calling. */
  def selfJoin(df: DataFrame, idCol: String, strCol: String, tau: Int)
      : DataFrame = {
    require(tau >= 1, "tau must be >= 1")

    // release the PREVIOUS invocation's caches before persisting this
    // one's (ReleaseSlot ordering contract — persist-then-swap would
    // let the cache-manager dedupe drop the entry we rely on).
    selfJoinSlot.releasePrevious()
    val slim = df.select(col(idCol).cast("long").as("id"),
        col(strCol).as("s"))
      .where(col("s").isNotNull)

    // EXACT census, staged so the dup-free common case pays the least:
    // a SINGLE-distinct agg (two-stage partial aggregate — no Expand
    // row doubling) over the unpersisted slim projection. Strings
    // never shuffle — only their xxhash64 does. Exact beats the
    // earlier HLL here twice over: a dup-free corpus can never flip
    // into paying the contraction shuffle on estimator noise, and a
    // sub-noise duplication level (1e6 dups in 1e9 rows hides inside
    // HLL rsd) can never route a clique-bearing corpus into the
    // quadratic plan.
    val c = slim.agg(count(lit(1)).as("n"),
      count_distinct(xxhash64(col("s"))).as("nd")).head()
    val n = c.getLong(0)
    val hasDups = c.getLong(1) < n

    if (!hasDups) {
      // Duplicate-free: the original single-pass plan over the
      // UNPERSISTED base — pairsAmong's three reads are three
      // column-pruned scans of a cheap projection, cheaper than a
      // persist round-trip at toy scale and a wash at 100× (the
      // contraction branch below is where a cache earns its keep).
      // No cache registered: releasePrevious() already cleared the
      // slot, and this path pins nothing.
      return pairsAmong(slim, tau)
    }

    val base = slim
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // hook registered before the gate action can throw — an exception
    // between persist and a branch's set() would orphan the cache;
    // the contraction branch overwrites with the fuller hook
    selfJoinSlot.set(() => { base.unpersist(false); () })
    // ids-unique gate, checked only once contraction is actually on
    // the table (dup-free corpora skip this job entirely); the agg
    // also materializes the base cache the branches below ride —
    // pairsAmong alone reads base three times. Both sides of the
    // uniqueness comparison come from THIS one job over the pinned
    // snapshot (never the earlier census job's n), so a row-count
    // drift between the two executions can't slip repeated-id data
    // past the gate.
    val g = base.agg(count(lit(1)).as("nb"),
      count_distinct(col("id")).as("nids")).head()
    val idsUnique = g.getLong(1) == g.getLong(0)

    if (!idsUnique) {
      selfJoinSlot.set(() => { base.unpersist(false); () })
      pairsAmong(base, tau)
    } else {
      import org.apache.spark.sql.types.LongType
      val classes = base.groupBy("s")
        .agg(min(col("id")).as("rep"),
          sort_array(collect_list(col("id"))).as("members"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      selfJoinSlot.set(() => {
        base.unpersist(false); classes.unpersist(false); ()
      })
      val reps = classes.select(col("rep").as("id"), col("s"))
      val repPairs = pairsAmong(reps, tau)
      val members = classes.select(col("rep"),
        explode(col("members")).as("m"))
      // both endpoints of every rep pair ARE reps, and every rep is
      // in its own members list — inner joins lift totally. merge
      // hints: members is slim but behind a wide groupBy lineage,
      // and a static broadcast pick cannot be demoted by AQE.
      val cross = repPairs
        .join(members.select(col("rep").as("id_a"), col("m").as("xa"))
          .hint("merge"), Seq("id_a"))
        .join(members.select(col("rep").as("id_b"), col("m").as("xb"))
          .hint("merge"), Seq("id_b"))
        .select(least(col("xa"), col("xb")).as("id_a"),
          greatest(col("xa"), col("xb")).as("id_b"), col("dist"))
      // intra-class dist=0 pairs, size-gated exactly like Dedup's
      // re-expansion: explode for ordinary classes, a rep-keyed
      // self-join past the cap so no mega-clique OOMs a task
      val smallIntra = classes.where(size(col("members")) > 1 &&
          size(col("members")) <= Dedup.IntraExplodeCap)
        .select(explode(
          Dedup.classPairUdf(LongType)(col("members"))).as("p"))
        .select(col("p.id_a"), col("p.id_b"), lit(0).as("dist"))
      val bigMembers = classes
        .where(size(col("members")) > Dedup.IntraExplodeCap)
        .select(col("rep"), explode(col("members")).as("m"))
      val bigIntra = bigMembers.select(col("rep"), col("m").as("id_a"))
        .join(bigMembers.select(col("rep"), col("m").as("id_b"))
          .hint("merge"), Seq("rep"))
        .where(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), lit(0).as("dist"))
      cross.unionByName(smallIntra).unionByName(bigIntra)
    }
  }

  /** The PassJoin pipeline proper, over a (id, s) frame assumed
    * duplicate-free (or whose duplicates the caller accepts paying
    * for): segment index ⋈ probe substrings, candidate dedup, banded
    * Levenshtein verify. */
  private def pairsAmong(base: DataFrame, tau: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._

    // ---- main path: indexed segments ⋈ probe substrings ----
    val indexSide = base.as[(Long, String)].flatMap { case (id, s) =>
      val l = s.length
      if (l < tau + 1) Iterator.empty
      else segments(l, tau).iterator.zipWithIndex.map {
        case ((start, len), slot) =>
          (slot, l, s.substring(start - 1, start - 1 + len), id, s)
      }
    }.toDF("slot", "src_len", "seg", "id_l", "s_l")

    val probeSide = base.as[(Long, String)].flatMap { case (id, t) =>
      val m = t.length
      for {
        l <- (math.max(tau + 1, m - tau) to (m + tau)).iterator
        ((start, len), slot) <- segments(l, tau).iterator.zipWithIndex
        q <- math.max(1, start - tau) to
          math.min(m - len + 1, start + tau)
        // multi-match-aware window: with shift = q-start and
        // delta = m-l, the edits BEFORE the segment must absorb
        // |shift| alignment drift and the edits AFTER must absorb
        // |delta-shift| — both from the same budget of tau ops, so
        // |shift| + |delta-shift| <= tau or the candidate can't verify
        if math.abs(q - start) + math.abs((m - l) - (q - start)) <= tau
      } yield (slot, l, t.substring(q - 1, q - 1 + len), id, t)
    }.toDF("slot", "src_len", "seg", "id_r", "s_r")

    val main = indexSide.join(probeSide, Seq("slot", "src_len", "seg"))
      .where(col("id_l") =!= col("id_r"))
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"),
        col("s_l"), col("s_r"))

    // ---- degenerate bucket: both sides shorter than tau+1 ----
    val shorts = base.where(length(col("s")) <= tau)
    val shortPairs = shorts.select(col("id").as("id_a"),
        col("s").as("s_l"))
      .crossJoin(shorts.select(col("id").as("id_b"), col("s").as("s_r")))
      .where(col("id_a") < col("id_b"))

    // dedup BEFORE the DP verify: a pair found via several segment
    // slots (or both discovery directions) would otherwise pay the
    // Levenshtein once per candidate row. Which row survives is
    // immaterial — levenshtein is symmetric, so every row of a
    // (id_a, id_b) group verifies to the same distance.
    main
      .unionByName(shortPairs)
      .dropDuplicates("id_a", "id_b")
      // 3-arg levenshtein = banded DP with early abandon at tau
      // (O(tau*n) per pair instead of O(n^2)); -1 marks "past tau"
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_l"), col("s_r"), tau).as("dist"))
      .where(col("dist") >= 0)
  }
}
