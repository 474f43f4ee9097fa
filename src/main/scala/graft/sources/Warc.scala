package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingestion — the container format every web-scale
  * training corpus starts from (Common Crawl ships WARC/WAT/WET): a
  * concatenation of records, each a `WARC/x.y` version line, CRLF
  * headers, a Content-Length-delimited payload, and a blank-line
  * trailer. `response` records carry a full HTTP response (status
  * line + headers + body) as their payload.
  *
  * Spark-first layout: one task per WARC FILE (`binaryFile` source,
  * records exploded row-locally) — the Common Crawl convention of
  * ~1 GB segment files IS the parallelism unit, so a 100 TB crawl is
  * ~100k files spread across the cluster without a custom FileFormat;
  * a record-splitting DataSource V2 would only matter for single
  * multi-TB files, which the ecosystem deliberately avoids. Gzip
  * members are handled transparently (Common Crawl gzips each record
  * as its own member; JDK GZIPInputStream walks concatenated members).
  *
  * The 2 GB `binaryFile` ceiling is a real bound and REJECTED loudly
  * (not silently truncated): files beyond it are outside the
  * convention and need pre-splitting.
  */
object Warc {

  /** One row per WARC record: (warc_file, warc_type, record_id,
    * target_uri, warc_date, content_type, content_length,
    * http_status, http_content_type, body). `body` is the payload
    * for non-HTTP records and the entity body (after the HTTP header
    * block) for request/response records; bytes are decoded UTF-8
    * lossy — byte-exact consumers read the source file at the offset
    * instead of round-tripping through strings. */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
    files.select(col("path").as("warc_file"),
        explode(parseUdf(col("content"))).as("r"))
      .select(col("warc_file"), col("r.*"))
  }

  /** `read` narrowed to HTTP 200 responses with a text/html or
    * text/plain payload — the crawl-ingestion predicate. */
  def htmlResponses(spark: SparkSession, pathGlob: String): DataFrame =
    read(spark, pathGlob)
      .where(col("warc_type") === "response" &&
        col("http_status") === 200 &&
        // MIME types are case-insensitive (RFC 2045) and real crawls
        // contain TEXT/HTML servers — match case-folded
        (lower(col("http_content_type")).startsWith("text/html") ||
          lower(col("http_content_type")).startsWith("text/plain")))

  /** WET segments (Common Crawl's pre-extracted text sidecar): the
    * `conversion` records, whose payload is already plain text — the
    * cheapest ingestion path when the crawl provider ships them
    * (no HTML parse at all). Same record walk; the predicate is the
    * only difference. */
  def wetDocuments(spark: SparkSession, pathGlob: String): DataFrame =
    read(spark, pathGlob)
      .where(col("warc_type") === "conversion")
      .select(col("warc_file"), col("target_uri"), col("warc_date"),
        col("body").as("text"))

  private[sources] case class Rec(warc_type: String, record_id: String,
      target_uri: String, warc_date: String, content_type: String,
      content_length: Long, http_status: Integer,
      http_content_type: String, body: String)

  private val parseUdf = udf { (content: Array[Byte]) =>
    if (content == null) Array.empty[Rec]
    else parseRecords(maybeGunzip(content)).toArray
  }

  private[graft] def maybeGunzip(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 ||
      (bytes(0) & 0xff) != 0x1f || (bytes(1) & 0xff) != 0x8b) bytes
    else {
      // GZIPInputStream consumes CONCATENATED members (the per-record
      // gzip convention) in one pass. Initial buffer sized in LONG
      // arithmetic (an Int `length * 4` wraps negative past 512 MB —
      // exactly the ~1 GB segment class this source targets); the
      // decompressed side shares the JVM's 2 GB array ceiling with
      // binaryFile's compressed side, both rejected by the runtime,
      // never silently truncated.
      val initial = math.min(bytes.length.toLong * 4L,
        (Int.MaxValue - 8).toLong).toInt
      val out = new java.io.ByteArrayOutputStream(initial)
      val buf = new Array[Byte](1 << 16)
      try {
        // the CONSTRUCTOR parses the member header and throws
        // ZipException on a corrupt one (gzip magic + junk) — it must
        // sit inside the same guard as the read loop
        val in = new java.util.zip.GZIPInputStream(
          new java.io.ByteArrayInputStream(bytes), 1 << 16)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        in.close()
      } catch {
        // a crash-truncated or corrupt member: keep the intact
        // prefix — the same drop-the-tail contract as parseRecords
        // (an unconditional throw here would fail the whole job on
        // one torn segment)
        case _: java.io.EOFException | _: java.util.zip.ZipException =>
          ()
      }
      out.toByteArray
    }
  }

  /** Sequential record walk: version line, headers, Content-Length
    * payload, blank trailer. Malformed tails stop the walk (partial
    * final records are a crash-truncation reality of crawl files —
    * records parsed so far are returned, the tail is dropped, and the
    * error channel is the caller's record-count reconciliation). */
  private[graft] def parseRecords(bytes: Array[Byte]): Seq[Rec] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Rec]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      // skip inter-record blank lines
      while (pos < bytes.length &&
        (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) ok = false
      else {
        val (version, p1) = readLine(bytes, pos)
        if (!version.startsWith("WARC/")) ok = false
        else {
          val (headers, p2) = readHeaders(bytes, p1)
          // corrupted length header (torn write) = malformed record:
          // stop the walk like every other malformation, don't throw
          val len = scala.util.Try(
            headers.getOrElse("content-length", "-1").trim.toLong)
            .getOrElse(-1L)
          if (len < 0 || p2 + len > bytes.length) ok = false
          else {
            val payload = java.util.Arrays.copyOfRange(bytes, p2,
              p2 + len.toInt)
            out += toRec(headers, payload)
            pos = p2 + len.toInt
          }
        }
      }
    }
    out.toSeq
  }

  private def toRec(headers: Map[String, String],
      payload: Array[Byte]): Rec = {
    val wtype = headers.getOrElse("warc-type", "")
    val (status, httpCt, body) =
      if (wtype == "response" || wtype == "request") {
        val (httpHeaders, bodyStart, statusLine) = httpBlock(payload)
        val st = statusLine.split("\\s+") match {
          case a if a.length >= 2 && a(0).startsWith("HTTP/") =>
            scala.util.Try(a(1).toInt).toOption
          case _ => None
        }
        (st.map(Integer.valueOf).orNull,
          httpHeaders.getOrElse("content-type", null),
          new String(payload, bodyStart, payload.length - bodyStart,
            java.nio.charset.StandardCharsets.UTF_8))
      } else (null, null,
        new String(payload, java.nio.charset.StandardCharsets.UTF_8))
    Rec(wtype,
      headers.getOrElse("warc-record-id", null),
      headers.getOrElse("warc-target-uri", null),
      headers.getOrElse("warc-date", null),
      headers.getOrElse("content-type", null),
      payload.length.toLong, status, httpCt, body)
  }

  /** (headers lowercased, body offset, status line) of an HTTP
    * message payload. */
  private def httpBlock(payload: Array[Byte])
      : (Map[String, String], Int, String) = {
    val (statusLine, p1) = readLine(payload, 0)
    val (headers, p2) = readHeaders(payload, p1)
    (headers, p2, statusLine)
  }

  private def readLine(bytes: Array[Byte], from: Int): (String, Int) = {
    var i = from
    while (i < bytes.length && bytes(i) != '\n') i += 1
    val end = if (i > from && bytes(i - 1) == '\r') i - 1 else i
    (new String(bytes, from, end - from,
      java.nio.charset.StandardCharsets.UTF_8),
      math.min(i + 1, bytes.length))
  }

  private def readHeaders(bytes: Array[Byte],
      from: Int): (Map[String, String], Int) = {
    val m = scala.collection.mutable.HashMap.empty[String, String]
    var pos = from
    var done = false
    while (!done) {
      val (line, next) = readLine(bytes, pos)
      pos = next
      if (line.isEmpty) done = true
      else line.indexOf(':') match {
        case -1 => () // tolerate malformed header lines
        case i => m.update(line.substring(0, i).trim.toLowerCase,
          line.substring(i + 1).trim)
      }
      if (pos >= bytes.length) done = true
    }
    (m.toMap, pos)
  }
}
