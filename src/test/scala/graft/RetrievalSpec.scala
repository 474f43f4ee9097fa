package graft

import org.apache.spark.sql.functions._

import graft.operators.Retrieval

class RetrievalSpec extends SparkSuite {

  test("bm25 matches a hand-computed score and only emits matching " +
      "docs") {
    val s = initSpark()
    import s.implicits._
    // corpus: 4 docs, avgdl = (4+2+3+1)/4 = 2.5
    val docs = Seq(
      (1L, "apple banana apple cherry"), // apple tf=2, dl=4
      (2L, "banana cherry"),             // no query term
      (3L, "apple date date"),           // apple tf=1, dl=3
      (4L, "date")                       // date tf=1, dl=1
    ).toDF("doc_id", "text")
    val out = Retrieval.bm25(docs, "doc_id", "text",
        Seq("apple", "date"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    // hand computation, k1=1.2 b=0.75, idf = ln((N-df+.5)/(df+.5)+1):
    //   idf(apple) = ln((4-2+.5)/(2+.5)+1) = ln(2)
    //   idf(date)  = ln((4-2+.5)/(2+.5)+1) = ln(2)
    def term(tf: Long, dl: Long, df: Long): Long = {
      val idf = math.log((4 - df + 0.5) / (df + 0.5) + 1.0)
      val t = idf * (tf * (1.2 + 1)) /
        (tf + 1.2 * ((1 - 0.75) + 0.75 * dl / 2.5))
      math.floor(t * 1e6 + 0.5).toLong
    }
    assert(out.keySet === Set(1L, 3L, 4L))
    assert(out(1L) === ((1L, term(2, 4, 2))))
    // doc 3: apple tf=1, date tf=2, both at dl=3
    assert(out(3L) === ((2L, term(1, 3, 2) + term(2, 3, 2))))
    assert(out(4L) === ((1L, term(1, 1, 2))))
    // doc 3 contains both query terms; doc 1 scores higher on apple
    // than doc 3 does (higher tf, longer doc penalized less than x2)
    assert(out(3L)._1 === 2L)
  }

  test("tfIdfTopTerms: hand-computed smooth-idf scores, term " +
      "tie-break, empty-token docs counted in n but emit no rows") {
    val s = initSpark()
    import s.implicits._
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "  "), // tokenless but text IS NOT NULL: counts toward n=3
      (4L, null.asInstanceOf[String])) // null text: excluded from n
      .toDF("doc_id", "text")
    val out = Retrieval.tfIdfTopTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5)))
      .sortBy(t => (t._1, t._6))
    def fp6(tf: Long, df: Long): Long =
      math.floor(tf * (math.log((3 + 1.0) / (df + 1.0)) + 1.0)
        * 1e6 + 0.5).toLong
    assert(out === Seq(
      // doc 1: apple tf=2 df=1 beats banana tf=1 df=2
      (1L, "apple", 2L, 1L, fp6(2, 1), 1),
      (1L, "banana", 1L, 2L, fp6(1, 2), 2),
      // doc 2: banana and cherry tie on tf=1 when df were equal —
      // but df differ (banana 2, cherry 1), so cherry outranks
      (2L, "cherry", 1L, 1L, fp6(1, 1), 1),
      (2L, "banana", 1L, 2L, fp6(1, 2), 2)))
    // doc 3 emitted nothing (no tokens), doc 4 excluded entirely
    assert(!out.exists(t => t._1 == 3L || t._1 == 4L))
  }

  test("tfIdfTopTerms costs exactly 4 shuffles (tf agg, df window, " +
      "bounded top-k agg, one-row corpus count)") {
    val s = initSpark()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val df = Retrieval.tfIdfTopTerms(docs, "doc_id", "text", k = 3)
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange
          .ShuffleExchangeExec => e
      }.size
      // the 4th is the SinglePartition exchange under the one-row
      // corpus-count aggregate — constant-sized at any corpus scale
      assert(shuffles === 4,
        "expected tf agg + df window + top-k agg + corpus count:\n"
        + df.queryExecution.executedPlan.toString().take(3000))
    } finally s.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("rankBy assigns 1-based ranks under the given total order and " +
      "truncates to topN") {
    val s = initSpark()
    import s.implicits._
    val df = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 30L))
      .toDF("id", "score")
    val ranked = Retrieval.rankBy(df,
        Seq(col("score").desc, col("id").asc), topN = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(ranked === Map(2L -> 1, 4L -> 2, 3L -> 3))
  }

  test("rrfFuse: integer contributions, absent ids contribute zero, " +
      "present-in-both sums both") {
    val s = initSpark()
    import s.implicits._
    val a = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val b = Seq((20L, 1), (30L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val c1 = 1000000000L / 61; val c2 = 1000000000L / 62
    assert(out === Map(10L -> c1, 20L -> (c2 + c1), 30L -> c2))
  }

  test("rankingMetrics: hand-computed hits/recall/MRR/nDCG, no-hit " +
      "queries zero out, zero-relevant queries emit no row") {
    val s = initSpark()
    import s.implicits._
    val ranking = Seq(
      // q1: relevant docs at ranks 2 and 4 (of 5)
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4),
      (1L, 14L, 5),
      // q2: no relevant doc ranked
      (2L, 20L, 1), (2L, 21L, 2)
    ).toDF("q_id", "id", "rank")
    val relevant = Seq(
      (1L, 11L), (1L, 13L), (1L, 99L), // 3 relevant, 2 ranked
      (2L, 77L) // relevant but unranked
    ).toDF("q_id", "id")
    val out = Retrieval.rankingMetrics(ranking, relevant, "q_id", "id",
        k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5))).toMap
    // q1: hits=2, recall=2/3, mrr=1e9/2, dcg=1/log2(3)+1/log2(5),
    //     idcg=1/log2(2)+1/log2(3)+1/log2(4)
    val dcg = 1.0 / (math.log(3) / math.log(2)) +
      1.0 / (math.log(5) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(out(1L)._1 === 3L && out(1L)._2 === 2L)
    assert(out(1L)._3 === 500000000L)
    assert(math.abs(out(1L)._4 - 0.6667) < 1e-9)
    assert(math.abs(out(1L)._5 -
      BigDecimal(dcg / idcg + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // q2: one relevant, zero hits -> zeros
    assert(out(2L) === ((1L, 0L, 0L, 0.0, 0.0)))
    assert(out.size === 2)
  }

  test("politenessSchedule spaces fetches per host by its delay, " +
      "default for hosts without a delay row") {
    val s = initSpark()
    import s.implicits._
    val frontier = Seq(
      ("a.org", "u1"), ("a.org", "u2"), ("a.org", "u3"),
      ("b.org", "v1"), ("b.org", "v2")
    ).toDF("host", "url")
    val delays = Seq(("a.org", 2000L)).toDF("host", "delay_ms")
    val out = Retrieval.politenessSchedule(frontier, "host",
        Seq(col("url").asc), delays, "delay_ms", defaultDelayMs = 100L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getInt(2), r.getLong(3))).toMap
    assert(out(("a.org", "u1")) === ((1, 0L)))
    assert(out(("a.org", "u2")) === ((2, 2000L)))
    assert(out(("a.org", "u3")) === ((3, 4000L)))
    assert(out(("b.org", "v1")) === ((1, 0L)))
    assert(out(("b.org", "v2")) === ((2, 100L)))
  }
}
