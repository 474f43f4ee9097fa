package graft.sinks

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.sources.RestCursor.HttpError

/** Vector-store WIRE protocol client + Spark sync operator — the live
  * half of S19 (reference: modules/qdrant_handler.py:68-138 +
  * nodes_workflow/QdrantSyncronizer/qdrant_syncronizer.py:95-205).
  * [[CollectionRouter]] stays the routing/column layer; this module
  * speaks the actual HTTP protocol a vector store exposes (the
  * qdrant-style REST surface — public API shape):
  *
  *   - `GET  /collections` -> existing collection names
  *     (classify_documents_per_collection's get_collections())
  *   - `POST /collections/{c}/points/delete` with a
  *     `{"filter":{"must":[{"key":"document_id","match":{"any":[..]}}]}}`
  *     selector (delete_points_related_to_document — the reference's
  *     delete-then-insert upsert, dedup by construction)
  *   - `PUT  /collections/{c}/points?wait=..` with chunked point
  *     batches (qdrant_syncronizer's QDRANT_CHUNK_SIZE=1000 batching;
  *     status gates the process-state append — a failed upsert must
  *     NOT advance the ledger, qdrant_syncronizer.py:185-205)
  *
  * Scale split: deletes run driver-side per collection over the BATCH's
  * doc ids (the reference's unit of work is a CSV id artifact — batch-
  * bounded by contract, not corpus-sized); upserts run EXECUTOR-side
  * via mapPartitions — each partition opens its own client, ships its
  * chunks, and emits per-(doc, chunk) status rows, so point traffic
  * never funnels through the driver. Only statuses (one row per
  * doc×chunk) come back.
  */
object VectorStore {

  /** One point upsert: id + float32 vector + JSON payload
    * (convert_slice_in_qdrant_point, qdrant_handler.py:113-138). */
  final case class Point(id: String, vector: Array[Float],
      payload: Seq[(String, Any)])

  /** Minimal JSON-over-HTTP transport (GET + body-carrying verbs).
    * Same HttpURLConnection stack as RestCursor.HttpTransport; non-2xx
    * raises HttpError so retry policy can wrap it uniformly. */
  class HttpJsonTransport(connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000) extends Serializable {
    def get(url: String): String = send("GET", url, None)

    def send(method: String, url: String, body: Option[String]): String = {
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestMethod(method)
      conn.setRequestProperty("Accept", "application/json")
      body.foreach { b =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        val bytes = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        conn.setFixedLengthStreamingMode(bytes.length)
        val os = conn.getOutputStream
        try os.write(bytes) finally os.close()
      }
      val code = conn.getResponseCode
      val stream =
        if (code >= 200 && code < 300) conn.getInputStream
        else conn.getErrorStream
      val text =
        if (stream == null) ""
        else try scala.io.Source.fromInputStream(stream, "UTF-8").mkString
        finally stream.close()
      if (code < 200 || code >= 300) throw HttpError(code, text)
      text
    }
  }

  /** Client over one store endpoint. Cheap to construct (no pooled
    * state) — executor code builds one per partition from the base
    * URL, the per-executor-singleton discipline being unnecessary for
    * a keep-alive-capable HttpURLConnection stack. */
  final class Client(baseUrl: String,
      transport: HttpJsonTransport = new HttpJsonTransport(),
      chunkSize: Int = 1000, wait: Boolean = true) extends Serializable {
    require(chunkSize >= 1, "chunkSize must be >= 1")
    @transient private lazy val mapper = new ObjectMapper()

    private def waitQ = s"?wait=$wait"

    /** Existing collection names (`GET /collections`). */
    def listCollections(): Seq[String] = {
      val root = mapper.readTree(transport.get(s"$baseUrl/collections"))
      val arr = root.path("result").path("collections")
      val out = mutable.ArrayBuffer.empty[String]
      val it = arr.elements()
      while (it.hasNext) {
        val n = it.next().path("name")
        if (n.isTextual) out += n.asText()
      }
      out.toSeq
    }

    private def statusOk(responseBody: String): Boolean = {
      val root = mapper.readTree(responseBody)
      val st = root.path("result").path("status").asText("")
      st == "acknowledged" || st == "completed"
    }

    /** Delete every point whose payload `document_id` is in `docIds`
      * (`POST /collections/{c}/points/delete`, FilterSelector shape).
      * Ids ship in `chunkSize` batches; false on the FIRST failed or
      * unacknowledged chunk (the reference aborts the collection's
      * insert phase on delete failure, qdrant_syncronizer.py:143-147). */
    def deleteByDocumentIds(collection: String,
        docIds: Seq[String]): Boolean =
      docIds.grouped(chunkSize).forall { chunk =>
        val body = mapper.createObjectNode()
        val anyArr = mapper.createArrayNode()
        chunk.foreach(anyArr.add)
        body.set[ObjectNode]("filter",
          mapper.createObjectNode().set[ObjectNode]("must",
            mapper.createArrayNode().add(
              mapper.createObjectNode()
                .put("key", "document_id")
                .set[ObjectNode]("match",
                  mapper.createObjectNode().set[ObjectNode]("any", anyArr)))))
        try statusOk(transport.send("POST",
          s"$baseUrl/collections/$collection/points/delete$waitQ",
          Some(mapper.writeValueAsString(body))))
        catch { case _: HttpError | _: java.io.IOException => false }
      }

    /** Upsert points in `chunkSize` batches
      * (`PUT /collections/{c}/points`); returns one success flag per
      * chunk, in order. A thrown transport error marks the chunk
      * failed rather than aborting the iterator — later chunks still
      * ship (at-least-once posture; the caller's ledger gate holds
      * back any doc touching a failed chunk). */
    def upsertPoints(collection: String,
        points: Iterator[Point]): Seq[Boolean] =
      points.grouped(chunkSize).map { chunk =>
        val body = mapper.createObjectNode()
        val arr = mapper.createArrayNode()
        chunk.foreach { p =>
          val node = mapper.createObjectNode().put("id", p.id)
          val vec = mapper.createArrayNode()
          p.vector.foreach(vec.add)
          node.set[ObjectNode]("vector", vec)
          val payload = mapper.createObjectNode()
          p.payload.foreach { case (k, v) => putAny(payload, k, v) }
          node.set[ObjectNode]("payload", payload)
          arr.add(node)
        }
        body.set[ArrayNode]("points", arr)
        try statusOk(transport.send("PUT",
          s"$baseUrl/collections/$collection/points$waitQ",
          Some(mapper.writeValueAsString(body))))
        catch { case _: HttpError | _: java.io.IOException => false }
      }.toSeq

    private def putAny(node: ObjectNode, k: String, v: Any): Unit =
      v match {
        case null => node.putNull(k)
        case s: String => node.put(k, s)
        case i: Int => node.put(k, i)
        case l: Long => node.put(k, l)
        case d: Double => node.put(k, d)
        case f: Float => node.put(k, f.toDouble)
        case b: Boolean => node.put(k, b)
        case ts: java.sql.Timestamp => node.put(k, ts.toString)
        case other => node.put(k, other.toString)
      }
  }

  /** Sync a ROUTED slice frame (CollectionRouter.route's routable
    * half: a `collection` column + slice id/doc id/embedding/payload
    * columns) into the store at `baseUrl`, delete-then-insert per
    * document. Returns (collection, document_id, synced) — one row
    * per routed document; `synced = false` when the collection's
    * delete failed OR any upsert chunk containing one of the doc's
    * points failed. The caller advances its process-state ledger ONLY
    * for synced docs (the reference's UpdateStatus gate).
    *
    * Collections are few by construction (#langs x #models); per-
    * collection doc-id lists are batch-bounded (the reference's CSV
    * id artifact is the unit of work), so the driver-side delete
    * phase holds one batch of ids, never a corpus. */
  def sync(routable: DataFrame, idCol: String, docCol: String,
      vecCol: String, payloadCols: Seq[String], baseUrl: String,
      chunkSize: Int = 1000, waitForCommit: Boolean = true): DataFrame = {
    val spark = routable.sparkSession
    import spark.implicits._
    val client = new Client(baseUrl, chunkSize = chunkSize,
      wait = waitForCommit)
    val existing = client.listCollections().toSet
    val collections = routable.select("collection").distinct()
      .collect().map(_.getString(0)).toSeq.sorted

    val statusFrames = collections.map { coll =>
      val slices = routable.where(col("collection") === coll)
      val docIds = slices.select(col(docCol).cast("string")).distinct()
        .collect().map(_.getString(0)).toSeq.sorted
      val deleted = existing.contains(coll) &&
        client.deleteByDocumentIds(coll, docIds)
      if (!deleted) {
        // reference behavior: failed delete (or unknown collection)
        // aborts the collection's insert phase; nothing advances
        docIds.toDF("document_id")
          .select(lit(coll).as("collection"), col("document_id"),
            lit(false).as("synced"))
      } else {
        val payloadFields = payloadCols
        val statusRows = slices
          .select(col(idCol).cast("string").as("__id"),
            col(docCol).cast("string").as("__doc"),
            col(vecCol).as("__vec"),
            struct(payloadFields.map(col): _*).as("__payload"))
          .mapPartitions { rows =>
            val c = new Client(baseUrl, chunkSize = chunkSize,
              wait = waitForCommit)
            val buf = rows.toArray
            val points = buf.iterator.map { r =>
              val pr = r.getAs[Row]("__payload")
              Point(r.getAs[String]("__id"),
                r.getSeq[Float](r.fieldIndex("__vec")).toArray,
                payloadFields.map(f => f -> pr.getAs[Any](f)))
            }
            val chunkOk = c.upsertPoints(coll, points)
            buf.iterator.zipWithIndex.map { case (r, i) =>
              (r.getAs[String]("__doc"), chunkOk(i / chunkSize))
            }
          }
          .toDF("document_id", "__ok")
        statusRows.groupBy("document_id")
          .agg(min(col("__ok")).as("synced"))
          .select(lit(coll).as("collection"), col("document_id"),
            col("synced"))
      }
    }
    statusFrames.reduceOption(_ unionByName _).getOrElse(
      Seq.empty[(String, String, Boolean)]
        .toDF("collection", "document_id", "synced"))
  }
}
