package graft

import org.apache.spark.sql.functions._

import graft.ledger.Ledger

class LedgerSpec extends SparkSuite {
  import scala.jdk.CollectionConverters._

  private def ledgerDf = {
    val s = initSpark()
    import s.implicits._
    Seq(
      // (document_id, title, operation_order)
      ("d1", "url_retrieved", 1L),
      ("d1", "document_scraped", 2L),
      ("d1", "document_vectorized", 3L),
      ("d2", "url_retrieved", 4L),
      ("d2", "document_scraped", 5L),
      ("d3", "url_retrieved", 6L)
    ).toDF("document_id", "title", "operation_order")
  }

  test("latestState picks the max-operation_order row per document") {
    val last = Ledger.latestState(ledgerDf, Seq("document_id"),
      "operation_order", "operation_order")
    val m = last.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m === Map("d1" -> "document_vectorized",
      "d2" -> "document_scraped", "d3" -> "url_retrieved"))
  }

  test("selectByLastStep filters on the LATEST state only") {
    val sel = Ledger.selectByLastStep(ledgerDf, Seq("document_scraped"))
    // d1's latest is vectorized (even though it passed through scraped) —
    // must NOT be selected; reference semantics retrieve_data_from_database
    // .py:166-200
    assert(sel.select("document_id").collect().map(_.getString(0)).toSet
      === Set("d2"))
  }

  test("byteCapAdmit admits the ordered prefix within cap") {
    val s = initSpark()
    import s.implicits._
    val df = Seq((1, 40L), (2, 40L), (3, 40L), (4, 5L))
      .toDF("id", "sz")
    val admitted = Ledger.byteCapAdmit(df, Seq(col("id")), "sz", cap = 100L)
    // 40+40 = 80 <= 100; +40 = 120 > 100 stops; id=4 (5 bytes) would fit
    // but is AFTER the first overflow -> dropped (reference break at
    // retrieve_data_from_database.py:236-237)
    assert(admitted.select("id").collect().map(_.getInt(0)).sorted
      === Array(1, 2))
  }

  test("byteCapAdmit drops zero-size rows after first overflow") {
    val s = initSpark()
    import s.implicits._
    val df = Seq((1, 60L), (2, 60L), (3, 0L)).toDF("id", "sz")
    val admitted = Ledger.byteCapAdmit(df, Seq(col("id")), "sz", cap = 100L)
    // id=2 overflows (120>100); id=3 has cum=120>100 anyway — but even a
    // zero-size row with cum<=cap after an overflow must not be admitted
    assert(admitted.select("id").collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("byteCapAdmit zero-size row sharing the cap boundary") {
    val s = initSpark()
    import s.implicits._
    // cum stays at exactly cap for the zero-size row AFTER an overflow row
    val df = Seq((1, 100L), (2, 50L), (3, 0L)).toDF("id", "sz")
    val admitted = Ledger.byteCapAdmit(df, Seq(col("id")), "sz", cap = 100L)
    assert(admitted.select("id").collect().map(_.getInt(0)).toSeq === Seq(1))
  }

  test("asOfLatest resolves the newest row at-or-before cutoff per key") {
    val s = initSpark()
    import s.implicits._
    val models = Seq(
      ("c1", "m1", "2020-01-01"),
      ("c1", "m2", "2021-01-01"),
      ("c1", "m3", "2023-01-01"), // after cutoff
      ("c2", "m4", "2019-06-01")
    ).toDF("corpus_id", "model_id", "used_since")
      .withColumn("used_since", col("used_since").cast("timestamp"))
    val asof = Ledger.asOfLatest(models, Seq("corpus_id"), "used_since",
      lit("2022-01-01").cast("timestamp"), "model_id")
    val m = asof.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m === Map("c1" -> "m2", "c2" -> "m4"))
  }

  test("withNextOperationOrder continues per-document sequences") {
    val s = initSpark()
    import s.implicits._
    val newStates = Seq(("d1", "document_classified_sdg"),
      ("d3", "document_scraped"), ("d9", "url_retrieved"))
      .toDF("document_id", "title")
    val next = Ledger.withNextOperationOrder(newStates, ledgerDf)
    val m = next.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    // d1 had max 3 -> 4; d3 had max 6 -> 7; d9 unseen -> 1
    assert(m === Map("d1" -> 4L, "d3" -> 7L, "d9" -> 1L))
  }

  test("deterministicSample is a pure modulus filter") {
    val s = initSpark()
    import s.implicits._
    val df = (0 until 100).toDF("id")
    val sample = Ledger.deterministicSample(df, "id", 10)
    assert(sample.count() === 10)
    assert(sample.collect().forall(_.getInt(0) % 10 === 0))
  }

  test("mergeLatestState(snapshot, delta) == latestState(full history)") {
    val s = initSpark()
    import s.implicits._
    val history = Seq(
      ("d1", "url_retrieved", 1L), ("d1", "document_scraped", 2L),
      ("d2", "url_retrieved", 3L))
      .toDF("document_id", "title", "operation_order")
    val delta = Seq(
      ("d1", "document_vectorized", 4L), // advances d1
      ("d2", "url_retrieved", 1L),       // stale replay, must lose
      ("d3", "url_retrieved", 5L))       // new key
      .toDF("document_id", "title", "operation_order")
    val snapshot = Ledger.latestState(history, Seq("document_id"),
      "operation_order", "operation_order")
    val incremental = Ledger.mergeLatestState(snapshot, delta,
        Seq("document_id"), "operation_order", "operation_order")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val full = Ledger.latestState(history.unionByName(delta),
        Seq("document_id"), "operation_order", "operation_order")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(incremental === full)
    assert(incremental === Set(("d1", "document_vectorized"),
      ("d2", "url_retrieved"), ("d3", "url_retrieved")))
  }
}
