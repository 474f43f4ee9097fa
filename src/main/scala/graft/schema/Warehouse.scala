package graft.schema

import org.apache.spark.sql.types._

/** Warehouse schemas mirroring the reference's PostgreSQL data model
  * (reference: alembic/versions/821173cf9c5d_initial_migration.py:25-441).
  * UUIDs are canonical strings; `details` stays an open-schema JSON string
  * (reference keeps a JSON pocket column, migration :187).
  */
object Warehouse {

  /** reference: migration 821173cf9c5d:175-204 */
  val welearnDocument: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("title", StringType),
    StructField("lang", StringType),
    StructField("description", StringType),
    StructField("full_content", StringType),
    StructField("details", StringType), // JSON string, open schema
    StructField("trace", LongType),
    StructField("corpus_id", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)
  ))

  /** Workflow ledger; a document's current state is the row with max
    * operation_order (reference: migration :284-321;
    * modules/retrieve_data_from_database.py:46-60). */
  val processState: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("document_id", StringType, nullable = false),
    StructField("title", StringType, nullable = false), // step enum as string
    StructField("created_at", TimestampType),
    StructField("operation_order", LongType, nullable = false)
  ))

  /** The 10 workflow steps (reference: migration :290-305). */
  object Step {
    val UrlRetrieved = "url_retrieved"
    val DocumentScraped = "document_scraped"
    val DocumentVectorized = "document_vectorized"
    val DocumentClassifiedSdg = "document_classified_sdg"
    val DocumentClassifiedNonSdg = "document_classified_non_sdg"
    val DocumentWithKeywords = "document_with_keywords"
    val DocumentInQdrant = "document_in_qdrant"
    val DocumentIsInvalid = "document_is_invalid"
    val KeptForTrace = "kept_for_trace"
    val DocumentIsIrretrievable = "document_is_irretrievable"
    val all: Seq[String] = Seq(UrlRetrieved, DocumentScraped,
      DocumentVectorized, DocumentClassifiedSdg, DocumentClassifiedNonSdg,
      DocumentWithKeywords, DocumentInQdrant, DocumentIsInvalid,
      KeptForTrace, DocumentIsIrretrievable)
  }

  /** reference: migration :238-258. Embedding stored as float32-LE bytes
    * (embedding_model_helpers.py:114 numpy.tobytes); we keep BOTH a binary
    * codec (byte-compatible, graft.expr.VectorCodec) and the native
    * ArrayType(FloatType) representation. */
  val documentSlice: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("document_id", StringType, nullable = false),
    StructField("embedding", BinaryType),
    StructField("body", StringType),
    StructField("order_sequence", IntegerType),
    StructField("embedding_model_name", StringType),
    StructField("embedding_model_id", StringType)
  ))

  /** reference: migration :384-410 */
  val sdg: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("sdg_number", IntegerType, nullable = false),
    StructField("slice_id", StringType, nullable = false),
    StructField("created_at", TimestampType),
    StructField("bi_classifier_model_id", StringType),
    StructField("n_classifier_model_id", StringType)
  ))

  /** reference: migration :37-45 + 89920abb7ff8_add_category.py */
  val corpus: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("source_name", StringType, nullable = false),
    StructField("is_fix", BooleanType),
    StructField("binary_treshold", DoubleType),
    StructField("is_active", BooleanType),
    StructField("category_id", StringType)
  ))

  /** Model dims share one shape: id, title, lang, used_since
    * (reference: migration :25-35, :46-83, :110-173). */
  val embeddingModel: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("lang", StringType),
    StructField("used_since", TimestampType)
  ))

  /** corpus_*_model association (reference: migration a50a1db3ca2a:22-29). */
  val corpusModel: StructType = StructType(Seq(
    StructField("corpus_id", StringType, nullable = false),
    StructField("model_id", StringType, nullable = false),
    StructField("used_since", TimestampType, nullable = false)
  ))

  /** reference: migration :259-284; the in-band error channel
    * (data/db_wrapper.py:15-47). */
  val errorRetrieval: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("document_id", StringType),
    StructField("http_error_code", IntegerType),
    StructField("error_info", StringType),
    StructField("created_at", TimestampType)
  ))

  val keyword: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("keyword", StringType, nullable = false),
    StructField("created_at", TimestampType)
  ))

  // ---- user_related schema (the product-API side of the reference
  // data model; they back auth + usage analytics, not the pipeline) ----

  /** reference: migration 4fcbfb7f3145 (api_key_management). `digest`
    * is the stored hash of the api key — plaintext keys never land in
    * the warehouse. */
  val apiKeyManagement: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("title", StringType),
    StructField("is_active", BooleanType, nullable = false),
    StructField("register_email", StringType, nullable = false),
    StructField("digest", BinaryType, nullable = false),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType)
  ))

  /** reference: migration e354666f951d (inferred_user). */
  val inferredUser: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("created_at", TimestampType)
  ))

  /** reference: migration e354666f951d (session). */
  val userSession: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("inferred_user_id", StringType, nullable = false),
    StructField("created_at", TimestampType),
    StructField("end_at", TimestampType, nullable = false),
    StructField("host", StringType)
  ))

  /** reference: migration e354666f951d (endpoint_request). */
  val endpointRequest: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("session_id", StringType, nullable = false),
    StructField("endpoint_name", StringType, nullable = false),
    StructField("http_code", IntegerType, nullable = false),
    StructField("message", StringType),
    StructField("created_at", TimestampType)
  ))
}

/** Typed views of the warehouse rows for Dataset[T] use. */
case class ProcessStateRow(id: String, document_id: String, title: String,
    created_at: java.sql.Timestamp, operation_order: Long)
case class WeLearnDocumentRow(id: String, url: String, title: Option[String],
    lang: Option[String], description: Option[String],
    full_content: Option[String], details: Option[String], trace: Option[Long],
    corpus_id: Option[String], created_at: java.sql.Timestamp,
    updated_at: java.sql.Timestamp)
case class DocumentSliceRow(id: String, document_id: String,
    embedding: Array[Byte], body: String, order_sequence: Int,
    embedding_model_name: String, embedding_model_id: String)
