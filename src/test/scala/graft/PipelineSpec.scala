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

  test("vectorize runs the stub AND the safetensors real-inference " +
      "backend through the same call (M2 seam: only modelName changes)") {
    val dir = java.nio.file.Files.createTempDirectory("st").toString
    val path = s"$dir/model.safetensors"
    graft.ml.TensorFileEmbedder.writeTinyModel(path, vocab = 197,
      dModel = 24, outDim = 64)
    val (stubSlices, _) = Pipeline.vectorize(documents, ledger0,
      maxWordsPerSlice = 12, modelName = "stub-64")
    val (realSlices, _) = Pipeline.vectorize(documents, ledger0,
      maxWordsPerSlice = 12, modelName = s"safetensors:$path")
    val stubRows = stubSlices.select("id", "embedding_vec")
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val realRows = realSlices.select("id", "embedding_vec")
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(stubRows.keySet === realRows.keySet) // same admission+chunking
    assert(stubRows.nonEmpty)
    stubRows.keySet.foreach { id =>
      assert(realRows(id).length === 64)
      assert(stubRows(id) !== realRows(id),
        s"backends must actually differ for slice $id")
    }
    val names = realSlices.select("embedding_model_name").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(names === Seq(s"safetensors:$path"))
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

    // keywords stage: only classified-SDG docs get keywords (reference
    // flow: sdg -> keywords -> sync; non-sdg -> sync directly)
    val sdgDocs = m2.filter(_._2 == Step.DocumentClassifiedSdg).keys.toSet
    val emptyKw = s.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("keyword",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType))))
    val (kwDim, kwLinks, kStates) = Pipeline.keywords(documents, ledger2,
      emptyKw)
    val kwDocs = kwLinks.select("document_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(kwDocs === sdgDocs)
    assert(kwDim.count() > 0)
    val ledger3 = Pipeline.appendStates(ledger2, kStates)

    val (routable, errors, qStates) = Pipeline.sync(slices, documents,
      ledger3, sliceSdgs)
    // d1 (en) and d2 (fr) route; nothing from d3 (never vectorized)
    val routedDocs = routable.select("document_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(routedDocs === Set("d1", "d2"))
    assert(errors.count() === 0)
    val ledger4 = Pipeline.appendStates(ledger3, qStates)
    val m4 = Ledger.latestState(ledger4, Seq("document_id"),
      "operation_order", "operation_order")
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(m4("d1") === Step.DocumentInQdrant)
    assert(m4("d2") === Step.DocumentInQdrant)
    assert(m4("d3") === Step.UrlRetrieved)
  }

  test("model resolution: as-of latest, language-consistent (J4/J5/M7)") {
    val s = initSpark()
    import s.implicits._
    val docs = Seq(
      ("d1", "c1", "en"), ("d2", "c1", "fr"), ("d3", "c2", "de"))
      .toDF("id", "corpus_id", "lang")
    val corpusModels = Seq(
      ("c1", "m-old", "2020-01-01"), ("c1", "m-new", "2022-01-01"),
      ("c1", "m-future", "2030-01-01"), ("c2", "m-mul", "2021-01-01"))
      .toDF("corpus_id", "model_id", "used_since")
      .withColumn("used_since", col("used_since").cast("timestamp"))
    val models = Seq(
      ("m-old", "stub-old-en", "en"), ("m-new", "stub-new-en", "en"),
      ("m-future", "stub-future-en", "en"), ("m-mul", "stub-mul", "mul"))
      .toDF("id", "title", "lang")
    val resolved = Pipeline.resolveEmbeddingModel(docs, corpusModels,
      models, lit("2024-01-01").cast("timestamp"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    // d1(en): latest non-future en model; d2(fr): no fr model in c1 ->
    // unresolved; d3(de): multilingual model matches any lang
    assert(resolved === Map("d1" -> "stub-new-en", "d3" -> "stub-mul"))
  }

  test("urlCollect dedups, inserts-if-absent, appends url_retrieved (S16)") {
    val s = initSpark()
    import s.implicits._
    val feedA = Seq("https://x/1", "https://x/new", "http://insecure")
      .toDF("url")
    val feedB = Seq("https://x/new", "https://y/other").toDF("url")
    val existing = Seq(("doc-e1", "https://x/1")).toDF("id", "url")
    val (fresh, states) = Pipeline.urlCollect(Seq(feedA, feedB),
      existing, ledger0)
    val urls = fresh.select("url").collect().map(_.getString(0)).toSet
    // https-only, batch-deduped, minus already-known
    assert(urls === Set("https://x/new", "https://y/other"))
    val titles = states.select("title").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(titles === Seq(Step.UrlRetrieved))
    assert(states.count() === 2)
  }

  test("sanitaryCrawl: 3xx re-queues, 4xx irretrievable, errors logged " +
      "(P12/T4)") {
    val s = initSpark()
    import s.implicits._
    val docs = Seq(
      ("d1", "https://x/1", 0L), ("d2", "https://x/2", 0L),
      ("d4", "https://x/4", 0L),
      ("d3", "https://x/3", 1L)) // d3 not in sample residue
      .toDF("id", "url", "trace")
    val ledger = Seq(
      ("d1@1", "d1", Step.DocumentInQdrant, 1L),
      ("d2@1", "d2", Step.DocumentInQdrant, 2L),
      ("d4@1", "d4", Step.DocumentInQdrant, 3L),
      ("d3@1", "d3", Step.DocumentInQdrant, 4L))
      .toDF("id", "document_id", "title", "operation_order")
      .withColumn("created_at", lit(null).cast("timestamp"))
    // stub prober: d1 alive, d2 dead, d4 redirected
    val status = when(col("url") === "https://x/1", 200)
      .when(col("url") === "https://x/4", 301).otherwise(404)
    val (report, states, errors) = Pipeline.sanitaryCrawl(docs, ledger,
      status, sampleModulus = 2)
    val classes = report.collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(classes === Map("d1" -> "VALID", "d2" -> "TO_DELETE",
      "d4" -> "TO_UPDATE"))
    val st = states.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // reference: 3xx -> url_retrieved re-queue; 4xx -> irretrievable
    assert(st === Map("d2" -> Step.DocumentIsIrretrievable,
      "d4" -> Step.UrlRetrieved))
    val err = errors.collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(err === Set(("d2", 404), ("d4", 301)))
  }

  test("wikipediaUpdate: redirection invalid, drift re-queued, error logged") {
    val s = initSpark()
    import s.implicits._
    val docs = Seq(
      ("d1", "x" * 100), // grows to 120: > 5% -> re-queued
      ("d2", "y" * 100), // redirection
      ("d3", "z" * 100), // http error
      ("d4", "w" * 100), // online 102: within 5%, untouched
      ("d5", "v" * 100)) // SHRINKS to 50: reference never re-queues
      .toDF("id", "full_content")
    val probe = Seq(
      ("d1", false, Some(120L), None: Option[Int]),
      ("d2", true, None: Option[Long], None: Option[Int]),
      ("d3", false, None: Option[Long], Some(503)),
      ("d4", false, Some(102L), None: Option[Int]),
      ("d5", false, Some(50L), None: Option[Int]))
      .toDF("document_id", "is_redirection", "online_size",
        "http_error_code")
    val (states, errors) = Pipeline.wikipediaUpdate(docs, ledger0, probe)
    val st = states.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(st === Map("d2" -> Step.DocumentIsInvalid,
      "d1" -> Step.UrlRetrieved))
    val err = errors.collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(err === Map("d3" -> 503, "d2" -> 307))
  }
}
