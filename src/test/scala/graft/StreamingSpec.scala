package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.schema.Warehouse.Step
import graft.streaming.StateMachine
import graft.streaming.StateMachine.{DocState, LedgerEvent}

class StreamingSpec extends SparkSuite {

  test("transition legality matrix (T1)") {
    assert(StateMachine.isLegal(None, Step.UrlRetrieved))
    assert(!StateMachine.isLegal(None, Step.DocumentVectorized))
    assert(StateMachine.isLegal(Some(Step.UrlRetrieved),
      Step.DocumentScraped))
    assert(!StateMachine.isLegal(Some(Step.UrlRetrieved),
      Step.DocumentInQdrant))
    // error/terminal steps reachable from anywhere
    assert(StateMachine.isLegal(Some(Step.DocumentVectorized),
      Step.DocumentIsInvalid))
    // re-ingest loop
    assert(StateMachine.isLegal(Some(Step.DocumentInQdrant),
      Step.UrlRetrieved))
  }

  test("streaming ledger folds to current state incrementally") {
    val s = initSpark()
    import s.implicits._
    implicit val spark: org.apache.spark.sql.SparkSession = s
    val input = MemoryStream[LedgerEvent](s)
    val query = StateMachine.currentStates(input.toDS())
      .writeStream.format("memory").queryName("doc_states")
      .outputMode("append").start()
    try {
      input.addData(
        LedgerEvent("d1", Step.UrlRetrieved, 1L),
        LedgerEvent("d2", Step.UrlRetrieved, 2L))
      query.processAllAvailable()
      input.addData(LedgerEvent("d1", Step.DocumentScraped, 3L))
      query.processAllAvailable()
      // stale replay (at-least-once, T5): must be ignored
      input.addData(LedgerEvent("d1", Step.UrlRetrieved, 1L))
      query.processAllAvailable()
      val rows = s.sql(
        "SELECT document_id, current_step, operation_order FROM doc_states")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // d1 emitted twice (two applied transitions), replay emitted nothing
      assert(rows.toSet === Set(
        ("d1", Step.UrlRetrieved, 1L),
        ("d1", Step.DocumentScraped, 3L),
        ("d2", Step.UrlRetrieved, 2L)))
    } finally query.stop()
  }

  test("out-of-order events within a batch apply in operation order") {
    val s = initSpark()
    import s.implicits._
    implicit val spark: org.apache.spark.sql.SparkSession = s
    val input = MemoryStream[LedgerEvent](s)
    val query = StateMachine.currentStates(input.toDS())
      .writeStream.format("memory").queryName("doc_states_ooo")
      .outputMode("append").start()
    try {
      input.addData(
        LedgerEvent("d9", Step.DocumentScraped, 2L),
        LedgerEvent("d9", Step.UrlRetrieved, 1L))
      query.processAllAvailable()
      val steps = s.sql("SELECT current_step FROM doc_states_ooo " +
        "ORDER BY operation_order").collect().map(_.getString(0)).toSeq
      assert(steps === Seq(Step.UrlRetrieved, Step.DocumentScraped))
    } finally query.stop()
  }
}
