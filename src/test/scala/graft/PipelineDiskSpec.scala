package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.Pipeline
import graft.schema.Warehouse.Step
import graft.sinks.Merge

/** Disk-level idempotency of a pipeline stage (T5 at-least-once):
  * running the vectorize stage twice against parquet tables must
  * converge — the second run selects nothing (the ledger already
  * advanced) and the insert-if-absent ledger append adds nothing. This
  * is the reference's crash-retry story: a re-submitted Argo pod
  * re-executes the whole stage and must not duplicate slices/states. */
class PipelineDiskSpec extends SparkSuite {

  test("vectorize stage is idempotent across disk round-trips") {
    val s = initSpark()
    import s.implicits._
    val base = Files.createTempDirectory("graft_disk").toString
    val docsDir = s"$base/documents"
    val ledgerDir = s"$base/ledger"
    val slicesDir = s"$base/slices"

    Seq(
      ("d1", "https://x/1", "One", "en", "Words to chunk and embed. " * 8),
      ("d2", "https://x/2", "Two", "fr", "Plus de texte ici pour les tranches. " * 8))
      .toDF("id", "url", "title", "lang", "full_content")
      .write.parquet(docsDir)
    Seq(
      ("d1@1", "d1", Step.UrlRetrieved, 1L),
      ("d1@2", "d1", Step.DocumentScraped, 2L),
      ("d2@1", "d2", Step.UrlRetrieved, 3L),
      ("d2@2", "d2", Step.DocumentScraped, 4L))
      .toDF("id", "document_id", "title", "operation_order")
      .withColumn("created_at", lit(null).cast("timestamp"))
      .select("id", "document_id", "title", "created_at",
        "operation_order")
      .write.parquet(ledgerDir)

    def runStage(): Unit = {
      val docs = s.read.parquet(docsDir)
      val ledger = s.read.parquet(ledgerDir)
      val (slices, newStates) = Pipeline.vectorize(docs, ledger,
        maxWordsPerSlice = 16)
      // slices: keyed replace (S18); ledger: insert-if-absent (S16/T5)
      Merge.replaceByKey(s, slicesDir,
        slices.select("id", "document_id", "order_sequence", "body",
          "embedding"),
        "document_id", numBuckets = 4)
      val stateRows = newStates.select(
        concat(col("document_id"), lit("@"), col("operation_order"))
          .as("id"),
        col("document_id"), col("title"),
        lit(null).cast("timestamp").as("created_at"),
        col("operation_order"))
      Merge.insertIfAbsent(s, ledgerDir, stateRows, "id", "id")
    }

    runStage()
    val ledgerAfter1 = s.read.parquet(ledgerDir).count()
    val slicesAfter1 = s.read.parquet(slicesDir).count()
    assert(ledgerAfter1 === 6) // 4 original + 2 document_vectorized
    assert(slicesAfter1 > 0)

    runStage() // crash-retry: whole stage re-executes
    val ledgerAfter2 = s.read.parquet(ledgerDir).count()
    val slicesAfter2 = s.read.parquet(slicesDir).count()
    assert(ledgerAfter2 === ledgerAfter1,
      "second run duplicated ledger states")
    assert(slicesAfter2 === slicesAfter1,
      "second run duplicated slices")

    // and both docs now sit at document_vectorized
    val current = graft.ledger.Ledger
      .selectByLastStep(s.read.parquet(ledgerDir),
        Seq(Step.DocumentVectorized))
      .select("document_id").collect().map(_.getString(0)).sorted
    assert(current === Array("d1", "d2"))
  }

  test("vectorize stage over the TxnLog sink: idempotent, snapshot-" +
      "isolated, old versions readable after the retry") {
    val s = initSpark()
    import s.implicits._
    val base = Files.createTempDirectory("graft_txn").toString
    val docsDir = s"$base/documents"
    val slicesTable = s"$base/slices_txn"

    Seq(
      ("d1", "https://x/1", "One", "en", "Words to chunk and embed. " * 8),
      ("d2", "https://x/2", "Two", "fr", "Plus de texte ici pour les tranches. " * 8))
      .toDF("id", "url", "title", "lang", "full_content")
      .write.parquet(docsDir)
    val ledger = Seq(
      ("d1@2", "d1", Step.DocumentScraped, 2L),
      ("d2@2", "d2", Step.DocumentScraped, 4L))
      .toDF("id", "document_id", "title", "operation_order")
      .withColumn("created_at", lit(null).cast("timestamp"))
      .select("id", "document_id", "title", "created_at",
        "operation_order")

    def writeSlices(): Long = {
      val docs = s.read.parquet(docsDir)
      val (slices, _) = Pipeline.vectorize(docs, ledger,
        maxWordsPerSlice = 16)
      graft.sinks.TxnLog.replaceByKey(s, slicesTable,
        slices.select("id", "document_id", "order_sequence", "body",
          "embedding"),
        "document_id")
    }

    val v0 = writeSlices()
    val n1 = graft.sinks.TxnLog.read(s, slicesTable).get.count()
    val v1 = writeSlices() // crash-retry: keyed replace converges
    val n2 = graft.sinks.TxnLog.read(s, slicesTable).get.count()
    assert(n1 === n2, "retry duplicated slices")
    assert(v1 > v0)
    // the pre-retry snapshot stays readable (time travel)
    assert(graft.sinks.TxnLog.read(s, slicesTable, asOf = Some(v0)).get
      .count() === n1)
  }
}
