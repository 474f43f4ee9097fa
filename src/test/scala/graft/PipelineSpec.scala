package graft

import org.apache.spark.sql.functions._

import graft.jobs.Pipeline
import graft.ledger.Ledger
import graft.ml.SdgClassifier
import graft.schema.Warehouse.Step

/** SURVEY §7.3 minimum end-to-end slice: select → admit → chunk+embed →
  * classify → sync, asserting the ledger advances documents through the
  * state machine exactly like the reference workflow. */
class PipelineSpec extends SparkSuite {

  private def documents = {
    val s = initSpark()
    import s.implicits._
    Seq(
      ("d1", "https://x/1", "Doc One", "en",
        "Climate action matters. Poverty reduction is key. " * 5),
      ("d2", "https://x/2", "Doc Two", "fr",
        "Energy systems and health outcomes. Education for all. " * 5),
      ("d3", "https://x/3", "Doc Three", "xx",
        "Unrouteable language document content here. " * 5)
    ).toDF("id", "url", "title", "lang", "full_content")
  }

  private def ledger0 = {
    val s = initSpark()
    import s.implicits._
    Seq(
      ("d1@1", "d1", Step.UrlRetrieved, 1L),
      ("d1@2", "d1", Step.DocumentScraped, 2L),
      ("d2@1", "d2", Step.UrlRetrieved, 3L),
      ("d2@2", "d2", Step.DocumentScraped, 4L),
      ("d3@1", "d3", Step.UrlRetrieved, 5L) // not scraped -> not selected
    ).toDF("id", "document_id", "title", "operation_order")
      .withColumn("created_at", lit(null).cast("timestamp"))
      .select("id", "document_id", "title", "created_at", "operation_order")
  }

  test("vectorize selects only scraped docs, emits ordered slices + states") {
    val (slices, states) = Pipeline.vectorize(documents, ledger0,
      maxWordsPerSlice = 12)
    val docIds = slices.select("document_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(docIds === Set("d1", "d2")) // d3 never scraped
    // order_sequence dense from 0 per doc
    val seqs = slices.where(col("document_id") === "d1")
      .select("order_sequence").collect().map(_.getInt(0)).sorted
    assert(seqs.head === 0 && seqs.toSeq === (0 until seqs.length))
    // embedding round-trips through the byte codec
    val emb = slices.select(
      graft.expr.VectorCodec.bytesToFloatVector(col("embedding")).as("v"))
      .head().getSeq[Float](0)
    assert(emb.length === 64)
    val m = states.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m === Map("d1" -> Step.DocumentVectorized,
      "d2" -> Step.DocumentVectorized))
  }

  test("full flow advances the ledger state machine end-to-end") {
    val s = initSpark()
    val (slices, vStates) = Pipeline.vectorize(documents, ledger0,
      maxWordsPerSlice = 12)
    val ledger1 = Pipeline.appendStates(ledger0, vStates)

    // latest state moved to vectorized
    val latest1 = Ledger.latestState(ledger1, Seq("document_id"),
      "operation_order", "operation_order")
    val m1 = latest1.collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(m1("d1") === Step.DocumentVectorized)
    assert(m1("d3") === Step.UrlRetrieved)

    import s.implicits._
    val biModel = Seq(("bi-1",
      graft.ml.StubEmbedder.embed("climate action matters", 64), 0.0, 0.5))
      .toDF("model_id", "weights", "bias", "threshold")
    val nModel = SdgClassifier.stubModelTable(s, "n-1", 64, threshold = 0.4)
    val (sliceSdgs, cStates) = Pipeline.classify(slices, ledger1,
      biModel, nModel)
    val ledger2 = Pipeline.appendStates(ledger1, cStates)
    val m2 = Ledger.latestState(ledger2, Seq("document_id"),
      "operation_order", "operation_order")
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(Set(Step.DocumentClassifiedSdg, Step.DocumentClassifiedNonSdg)
      .contains(m2("d1")))

    val (routable, errors, qStates) = Pipeline.sync(slices, documents,
      ledger2, sliceSdgs)
    // d1 (en) and d2 (fr) route; nothing from d3 (never vectorized)
    val routedDocs = routable.select("document_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(routedDocs === Set("d1", "d2"))
    assert(errors.count() === 0)
    val ledger3 = Pipeline.appendStates(ledger2, qStates)
    val m3 = Ledger.latestState(ledger3, Seq("document_id"),
      "operation_order", "operation_order")
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(m3("d1") === Step.DocumentInQdrant)
    assert(m3("d2") === Step.DocumentInQdrant)
    assert(m3("d3") === Step.UrlRetrieved)
  }
}
