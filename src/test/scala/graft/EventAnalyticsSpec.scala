package graft

import org.apache.spark.sql.functions._

import graft.operators.{EditDistanceJoin, EventAnalytics, HeavyHitters}

/** Specs for the round-7 analytics operators: ordered funnel, cohort
  * retention, PassJoin edit-distance self-join, Misra-Gries exact heavy
  * hitters, and the Zipf fit. Each is checked against a hand-computable
  * fixture or a brute-force twin built from Spark's own primitives.
  */
class EventAnalyticsSpec extends SparkSuite {
  private lazy val s = initSpark()
  import s.implicits._

  // (user, sec, type)
  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "sec", "event_type")

  test("funnel counts deepest ordered prefix per user") {
    val events = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // out of order: purchase BEFORE any view -> depth stops at click
      (2L, 5L, "purchase"), (2L, 10L, "view"), (2L, 20L, "click"),
      // view only
      (3L, 10L, "view"),
      // never viewed -> depth 0 despite click+purchase
      (4L, 10L, "click"), (4L, 20L, "purchase"),
      // tie: click at the SAME second as view counts (>=, not >)
      (5L, 10L, "view"), (5L, 10L, "click"), (5L, 11L, "purchase"))
    val got = EventAnalytics
      .funnel(events, "user_id", "sec", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1, "view", 4L), (2, "click", 3L), (3, "purchase", 2L)))
  }

  test("funnel greedy-earliest finds delayed witnesses") {
    // click@15 is after view@10 but before the SECOND view@20; the
    // greedy t1=min(view)=10 must use it (a last-view formulation
    // would miss the pair)
    val events = ev((1L, 10L, "view"), (1L, 15L, "click"),
      (1L, 20L, "view"))
    val got = EventAnalytics
      .funnel(events, "user_id", "sec", "event_type",
        Seq("view", "click"))
      .orderBy("step").collect().map(_.getLong(2))
    assert(got.toSeq === Seq(1L, 1L))
  }

  test("salted funnel equals the unsalted form under hot-key skew") {
    // one user owns ~99% of the step-2 events (the 100-TB hot-key
    // shape); min over salt sub-partitions is associative, so every
    // salt width must reproduce the exact unsalted counts
    val hot = (0 until 3000).map(i => (7L, 100L + i, "click"))
    val rows = Seq(
      (7L, 50L, "view"), (7L, 5000L, "purchase"),
      (8L, 10L, "view"), (8L, 20L, "click"),
      (9L, 10L, "view")) ++ hot
    val events = rows.toDF("user_id", "sec", "event_type")
    def counts(salts: Int) = EventAnalytics
      .funnel(events, "user_id", "sec", "event_type",
        Seq("view", "click", "purchase"), salts = salts)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    val unsalted = counts(1)
    assert(unsalted === Seq((1, 3L), (2, 2L), (3, 1L)))
    for (ss <- Seq(4, 16, 64)) // incl. salts > distinct times per user
      assert(counts(ss) === unsalted, s"salts=$ss diverged")
  }

  test("cohort retention buckets by first-event period") {
    // period = 100s. u1 first at 50 (cohort 0), active periods 0,2;
    // u2 first at 250 (cohort 2), active periods 2,3.
    val events = ev((1L, 50L, "a"), (1L, 250L, "b"), (1L, 260L, "c"),
      (2L, 250L, "a"), (2L, 399L, "b"))
    val got = EventAnalytics
      .cohortRetention(events, "user_id", "sec", periodSec = 100L)
      .orderBy("cohort_period", "period_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (0L, 0L, 1L), (0L, 2L, 1L), (2L, 0L, 1L), (2L, 1L, 1L)))
  }

  test("edit-distance PassJoin matches brute force incl short strings") {
    // deterministic corpus over a 3-letter alphabet, lengths 0..12 —
    // short strings (< tau+1) exercise the degenerate bucket, and the
    // tight alphabet forces many near-miss candidates
    val rnd = new scala.util.Random(42)
    val strs = (0L until 60L).map { id =>
      val l = rnd.nextInt(13)
      (id, (0 until l).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val df = strs.toDF("id", "s")
    val tau = 2
    val got = EditDistanceJoin.selfJoin(df, "id", "s", tau)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val brute = df.select(col("id").as("id_a"), col("s").as("sa"))
      .crossJoin(df.select(col("id").as("id_b"), col("s").as("sb")))
      .where(col("id_a") < col("id_b") &&
        levenshtein(col("sa"), col("sb")) <= tau)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).as("d"))
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(brute.nonEmpty, "fixture must produce pairs")
    assert(got.toSeq === brute.toSeq)
  }

  test("edit-distance PassJoin is duplication-adaptive: clique-heavy " +
      "and dup-free corpora both match brute force exactly") {
    val tau = 2
    def parity(strs: Seq[(Long, String)]): Unit = {
      val df = strs.toDF("id", "s")
      val got = EditDistanceJoin.selfJoin(df, "id", "s", tau)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val brute = df.select(col("id").as("id_a"), col("s").as("sa"))
        .crossJoin(df.select(col("id").as("id_b"), col("s").as("sb")))
        .where(col("id_a") < col("id_b") &&
          levenshtein(col("sa"), col("sb")) <= tau)
        .select(col("id_a"), col("id_b"),
          levenshtein(col("sa"), col("sb")).as("d"))
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(brute.nonEmpty, "fixture must produce pairs")
      assert(got.toSeq === brute.toSeq)
    }
    // clique-heavy: three byte-identical classes (5/3/2 members),
    // near-strings at ed 1-2 of a clique, a short-string dup pair
    // (degenerate bucket), and distinct fillers — the census routes
    // this through contraction; intra pairs must come out dist=0 and
    // cross pairs must lift to every member combination
    parity(
      (0L until 5L).map(i => (i, "abcabcabcabc")) ++
        (10L until 13L).map(i => (i, "xyzxyzxyzxyz")) ++
        Seq(20L -> "pq", 21L -> "pq", 22L -> "pr") ++
        Seq(30L -> "abcabcabcabd", // ed 1 of the first clique
          31L -> "abcabcabcadd", // ed 2
          32L -> "xyzxyzxyzxy", // ed 1 of the second
          40L -> "completely unrelated", 41L -> "another different"))
    // dup-free: same shapes, ids baked into the strings so the
    // census keeps the uncontracted single-pass plan
    parity((0L until 30L).map(i =>
      (i, s"str$i-" + ("ab" * ((i % 5) + 2).toInt))))
  }

  test("edit-distance PassJoin with REPEATED ids keeps the uncontracted " +
      "plan: distinct pairs, no self-pairs (review r12 probe)") {
    // dup strings AND dup ids: the census sees hasDups but NOT
    // ids-unique, so contraction must NOT fire (its membership-join
    // lift would emit (1,1) self-pairs and duplicated rows). Each
    // id's rows are byte-identical so every candidate row-pair for a
    // given (id_a,id_b) verifies to the same distance — the expected
    // set is the distinct brute-force answer.
    val tau = 1
    val strs = Seq(1L -> "aaaa", 1L -> "aaaa", 2L -> "aaaa",
      3L -> "aaab", 3L -> "aaab")
    val df = strs.toDF("id", "s")
    val got = EditDistanceJoin.selfJoin(df, "id", "s", tau)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)),
      "repeated-id input must yield the distinct no-self-pair set")
  }

  test("heavy hitters is exact under forced MG evictions") {
    // vocab of 200 distinct tokens >> k=8 counters, zipf-skewed so
    // the threshold bites: answer == the census answer exactly
    val words = (1 to 200).flatMap(i =>
      Seq.fill(2000 / i)(s"w$i")) // harmonic counts: 2000, 1000, 666...
    val docs = words.grouped(37).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val k = 8
    val got = HeavyHitters.frequentTokens(docs, "text", k)
      .orderBy("token").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val toks = docs.select(explode(split(lower(trim(col("text"))),
      "\\s+")).as("t")).where(col("t") =!= "")
    val n = toks.count()
    val census = toks.groupBy("t").agg(count(lit(1)).as("c"))
      .where(col("c") * k > n)
      .orderBy("t").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(census.nonEmpty, "threshold must bite")
    assert(census.length < 200, "threshold must exclude most tokens")
    assert(got.toSeq === census.toSeq)
  }

  test("zipf fit is partitioning-invariant and negative on skewed text") {
    val words = (1 to 50).flatMap(i => Seq.fill(500 / i)(s"w$i"))
    val docs = words.grouped(29).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val a = graft.operators.LanguageModel.zipfFit(docs, "text").collect()
    val b = graft.operators.LanguageModel
      .zipfFit(docs.repartition(7), "text").collect()
    assert(a.toSeq === b.toSeq) // integer moment sums: order-immune
    val slope = a.head.getDouble(1)
    assert(slope < -0.5 && slope > -2.0,
      s"harmonic counts should fit a Zipf-ish slope, got $slope")
  }
}
