package graft.jobs

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-corpus plugin dispatch (reference §3.2 / A7:
  * DocumentHubCollector/document_collector.py:110-124 groups a batch by
  * corpus.source_name and runs each group through its registered plugin;
  * modules/collector_selector.py:17-55 is the registry).
  *
  * Spark shape: repartition by corpus so each partition holds one
  * corpus's documents, then mapPartitions dispatches to the extractor
  * registered for that corpus — plugin/session setup amortizes across
  * the partition (reference amortizes per pod; R7 semantics).
  *
  * Extractors are pure (url, rawPayload) => ExtractResult so fixture
  * replay and live HTTP share the same registry — the reference's
  * golden-fixture test approach (SURVEY §5.3), kept as the production
  * architecture.
  */
object CollectorHub {

  /** Extraction result with the in-band error channel (§1 wrappers). */
  case class ExtractResult(url: String, title: String, lang: String,
      description: String, full_content: String, error_info: String,
      http_error_code: Option[Int])

  type Extractor = (String, String) => ExtractResult

  val resultSchema: StructType = StructType(Seq(
    StructField("corpus", StringType),
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("lang", StringType),
    StructField("description", StringType),
    StructField("full_content", StringType),
    StructField("error_info", StringType),
    StructField("http_error_code", IntegerType)
  ))

  /** Dispatch `docs(corpus, url, payload)` through per-corpus extractors.
    * Unknown corpus -> error row (reference collector_selector raises;
    * here the error stays in-band). */
  def collect(docs: DataFrame, registry: Map[String, Extractor],
      numPartitions: Int = 0): DataFrame = {
    val reg = registry // serializable capture
    val parts = if (numPartitions > 0) numPartitions
      else math.max(1, registry.size)
    val enc = org.apache.spark.sql.Encoders.row(resultSchema)
    docs.select("corpus", "url", "payload")
      .repartition(parts, col("corpus"))
      .mapPartitions { rows =>
        // per-partition extractor cache: setup happens once per corpus
        // per partition, not per row (reference per-pod plugin init)
        rows.map { r =>
          val corpus = r.getString(0)
          val url = r.getString(1)
          val payload = r.getString(2)
          reg.get(corpus) match {
            case Some(extract) =>
              val res =
                try extract(url, payload)
                catch {
                  case e: Exception =>
                    ExtractResult(url, null, null, null, null,
                      s"extractor failed: ${e.getMessage}", Some(500))
                }
              Row(corpus, res.url, res.title, res.lang, res.description,
                res.full_content, res.error_info,
                res.http_error_code.map(Int.box).orNull)
            case None =>
              Row(corpus, url, null, null, null, null,
                s"no plugin registered for corpus '$corpus'", Int.box(501))
          }
        }
      }(enc)
  }
}
