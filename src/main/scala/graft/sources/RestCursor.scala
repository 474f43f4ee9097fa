package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** REST source adapters (reference S9-S12, R1, R10) with the transport
  * abstracted so tests replay golden fixtures and production plugs an
  * HTTP client (this container has zero egress — the reference's own
  * tests mock `requests` the same way, SURVEY §5.3).
  *
  * Design: cursor pagination is inherently sequential, so the cursor walk
  * runs driver-side (exactly like the reference's collector loop,
  * open_alex_collector.py:138-145) and lands pages into a DataFrame;
  * everything after that — payload parsing, filtering, joins — is
  * distributed. Batched lookups (S12/J8) run executor-side via
  * mapPartitions with `grouped(batchSize)` so one API round trip serves
  * a whole batch (reference R4).
  */
object RestCursor {

  /** Pluggable transport; implement with an HTTP client in production or
    * a fixture map in tests. Retry/backoff (reference R10:
    * utils_/http_client_utils.py:13-28 — total=10, backoff x2 on
    * {429,5xx}) wraps the transport uniformly. */
  trait Transport extends Serializable {
    def get(url: String): String
  }

  final case class HttpError(code: Int, message: String)
      extends RuntimeException(s"HTTP $code: $message")

  /** Live HTTP transport — the production Transport (reference R10:
    * utils_/http_client_utils.py builds a requests.Session; here the
    * JDK's HttpURLConnection, so executors need no extra dependency).
    * Non-2xx responses raise HttpError with the status code, which is
    * exactly what `withRetry`'s retryable predicate dispatches on —
    * wrap as `withRetry(new HttpTransport())` for the reference's
    * total=10 / backoff-x2 behavior. Serializable: instances carry only
    * timeouts/headers, connections open per call executor-side. */
  final class HttpTransport(connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000,
      headers: Map[String, String] = Map.empty) extends Transport {
    def get(url: String): String = {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      try {
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setRequestProperty("Accept", "application/json")
        headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        val code = conn.getResponseCode
        val is = if (code >= 200 && code < 300) conn.getInputStream
          else conn.getErrorStream
        val body = if (is == null) ""
          else try new String(is.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8)
          finally is.close()
        if (code >= 200 && code < 300) body
        else throw HttpError(code, body.take(200))
      } finally conn.disconnect()
    }
  }

  /** Retrying transport decorator: `retryable` decides from the error
    * code; delays are injectable for tests. */
  def withRetry(inner: Transport, maxAttempts: Int = 10,
      backoffFactor: Double = 2.0,
      retryable: Int => Boolean = c => c == 429 || (c >= 500 && c < 600),
      sleep: Long => Unit = Thread.sleep): Transport = new Transport {
    def get(url: String): String = {
      var attempt = 0
      while (true) {
        try return inner.get(url)
        catch {
          case e: HttpError if retryable(e.code) && attempt < maxAttempts =>
            sleep((math.pow(backoffFactor, attempt) * 100).toLong)
            attempt += 1
          // transient transport failures (connect refused, read timeout,
          // reset) retry like 5xx — urllib3's Retry covers connect/read
          // errors too, and a live HttpTransport surfaces them as
          // IOExceptions, not status codes
          case _: java.io.IOException if attempt < maxAttempts =>
            sleep((math.pow(backoffFactor, attempt) * 100).toLong)
            attempt += 1
          case e: Throwable => throw e
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Query-pushdown parameters serialized into the API query string
    * (reference R1: the only pushdown a REST source supports —
    * open_alex_collector.py:99-116 filter/sort/select/per_page). */
  case class Pushdown(filters: Map[String, String] = Map.empty,
      select: Seq[String] = Seq.empty, sort: Option[String] = None,
      perPage: Int = 200) {
    def queryString: String = {
      val parts = mutable.ArrayBuffer[String](s"per-page=$perPage")
      if (filters.nonEmpty)
        parts += "filter=" + filters.map { case (k, v) => s"$k:$v" }
          .mkString(",")
      if (select.nonEmpty) parts += "select=" + select.mkString(",")
      sort.foreach(s => parts += s"sort=$s")
      parts.mkString("&")
    }
  }

  /** Cursor-paginated scan: walk `nextCursor` until exhausted (driver
    * side), return one row per page body. `maxPages` bounds runaway
    * cursors (reference caps via parallelism limits, O9). */
  def cursorScan(spark: SparkSession, transport: Transport, baseUrl: String,
      pushdown: Pushdown, nextCursor: String => Option[String],
      maxPages: Int = 1000): DataFrame = {
    import spark.implicits._
    val pages = mutable.ArrayBuffer.empty[String]
    var cursor: Option[String] = Some("*")
    while (cursor.isDefined && pages.length < maxPages) {
      val url =
        s"$baseUrl?${pushdown.queryString}&cursor=${cursor.get}"
      val body = transport.get(url)
      pages += body
      cursor = nextCursor(body)
    }
    pages.toSeq.toDF("page_body")
  }

  /** Batched lookup join (reference S12/J8/R4): for each batch of
    * `batchSize` keys, one `fetchBatch` call returning key->payload;
    * unmatched keys come back with a null payload (the error channel —
    * reference open_alex.py:416-427 not-returned detection). Executor-
    * side, no driver round trips. */
  def batchedLookupJoin(keys: Dataset[String], batchSize: Int,
      fetchBatch: Seq[String] => Map[String, String]): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val got = fetchBatch(batch)
        batch.map(k => (k, got.get(k).orNull))
      }
    }.toDF("key", "payload")
  }
}
