package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.sources.Warc

class WarcSpec extends SparkSuite {

  private def record(wtype: String, uri: String,
      payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h.append("WARC/1.0\r\n")
    h.append(s"WARC-Type: $wtype\r\n")
    h.append(s"WARC-Record-ID: <urn:uuid:$wtype-${uri.hashCode}>\r\n")
    if (uri.nonEmpty) h.append(s"WARC-Target-URI: $uri\r\n")
    h.append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
    h.append(s"Content-Length: ${payload.length}\r\n")
    if (wtype == "response")
      h.append("Content-Type: application/http; msgtype=response\r\n")
    h.append("\r\n")
    h.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def httpResponse(status: Int, contentType: String,
      body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.getBytes(UTF_8).length}\r\n\r\n" + body)
      .getBytes(UTF_8)

  private def fixture: Array[Byte] =
    record("warcinfo", "", "software: graft-test\r\n".getBytes(UTF_8)) ++
      record("response", "https://example.org/a",
        httpResponse(200, "text/html; charset=utf-8",
          "<html><body>hello warc</body></html>")) ++
      record("response", "https://example.org/missing",
        httpResponse(404, "text/html", "<html>nope</html>")) ++
      record("response", "https://example.org/img",
        httpResponse(200, "image/png", "PNGBYTES")) ++
      record("metadata", "https://example.org/a",
        "fetchTimeMs: 12\r\n".getBytes(UTF_8))

  private def writeTmp(name: String, bytes: Array[Byte]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc")
    val p = dir.resolve(name)
    java.nio.file.Files.write(p, bytes)
    p.toString
  }

  test("WARC records parse: types, headers, HTTP status + body split") {
    val s = initSpark()
    val path = writeTmp("seg.warc", fixture)
    val df = Warc.read(s, path)
    val rows = df.collect()
    assert(rows.length === 5)
    val byType = rows.groupBy(_.getAs[String]("warc_type"))
    assert(byType("warcinfo").head.getAs[String]("body")
      .contains("graft-test"))
    val ok = byType("response")
      .find(_.getAs[String]("target_uri").endsWith("/a")).get
    assert(ok.getAs[Int]("http_status") === 200)
    assert(ok.getAs[String]("http_content_type")
      .startsWith("text/html"))
    assert(ok.getAs[String]("body") ===
      "<html><body>hello warc</body></html>")
    // content_length covers the FULL http payload, not just the body
    assert(ok.getAs[Long]("content_length") >
      ok.getAs[String]("body").length)
  }

  test("per-record gzip members decode transparently; htmlResponses " +
      "filters to 200 + text") {
    val s = initSpark()
    // gzip each record as its own member and concatenate (the Common
    // Crawl layout)
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val members =
      gz(record("warcinfo", "", "software: t\r\n".getBytes(UTF_8))) ++
        gz(record("response", "https://example.org/a",
          httpResponse(200, "text/html", "<p>zipped</p>"))) ++
        gz(record("response", "https://example.org/img",
          httpResponse(200, "image/png", "PNG")))
    val path = writeTmp("seg.warc.gz", members)
    val html = Warc.htmlResponses(s, path).collect()
    assert(html.length === 1)
    assert(html.head.getAs[String]("body") === "<p>zipped</p>")
  }

  test("WET conversion records surface as plain-text documents") {
    val s = initSpark()
    val wet =
      record("warcinfo", "", "software: t\r\n".getBytes(UTF_8)) ++
        record("conversion", "https://example.org/a",
          "already extracted text body".getBytes(UTF_8)) ++
        record("conversion", "https://example.org/b",
          "second page text".getBytes(UTF_8))
    val path = writeTmp("seg.warc.wet", wet)
    val docs = Warc.wetDocuments(s, path).collect()
    assert(docs.length === 2)
    assert(docs.map(_.getAs[String]("text")).toSet ===
      Set("already extracted text body", "second page text"))
    assert(docs.forall(_.getAs[String]("target_uri")
      .startsWith("https://example.org/")))
  }

  test("a crash-truncated tail drops cleanly: intact records survive") {
    val s = initSpark()
    val truncated = fixture.dropRight(60) // cut into the last record
    val path = writeTmp("seg_trunc.warc", truncated)
    val rows = Warc.read(s, path).collect()
    assert(rows.length === 4, "intact prefix records must parse")
  }

  test("a gzip member cut mid-stream keeps the intact prefix instead " +
      "of failing the task") {
    val s = initSpark()
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close(); bo.toByteArray
    }
    val full =
      gz(record("warcinfo", "", "software: t\r\n".getBytes(UTF_8))) ++
        gz(record("response", "https://example.org/a",
          httpResponse(200, "text/html", "<p>ok</p>")))
    val torn = full.dropRight(10) // cut inside the second member
    val path = writeTmp("seg_torn.warc.gz", torn)
    val rows = Warc.read(s, path).collect()
    assert(rows.map(_.getAs[String]("warc_type")).contains("warcinfo"),
      "the intact first member must survive a torn second member")
  }
}
