package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.jobs.CorpusBuild

/** End-to-end: WARC segments -> extraction -> curation -> sharded
  * export, asserting the stages COMPOSE (each stage's own semantics
  * are pinned by its dedicated spec/oracle). */
class CorpusBuildSpec extends SparkSuite {

  // ~60 words, stopword-bearing, varied bigrams: passes the Gopher
  // gates without tripping the repetition thresholds
  private def para(seed: Int): String =
    (0 until 5).map { k =>
      s"paragraph $seed section $k tells the story of a survey that " +
        s"many people have answered with care and the results were " +
        s"shared widely across region r${seed}_$k"
    }.mkString(" ")

  private def page(uri: String, text: String): Array[Byte] = {
    val body = s"<html><head><title>t</title></head><body><p>$text</p>" +
      "</body></html>"
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      body).getBytes(UTF_8)
    val h = new StringBuilder
    h.append("WARC/1.0\r\n")
    h.append("WARC-Type: response\r\n")
    h.append(s"WARC-Record-ID: <urn:uuid:${uri.hashCode}>\r\n")
    h.append(s"WARC-Target-URI: $uri\r\n")
    h.append("WARC-Date: 2024-01-01T00:00:00Z\r\n")
    h.append(s"Content-Length: ${http.length}\r\n")
    h.append("Content-Type: application/http; msgtype=response\r\n")
    h.append("\r\n")
    h.toString.getBytes(UTF_8) ++ http ++ "\r\n\r\n".getBytes(UTF_8)
  }

  test("WARC segments flow through curation into shards: dedup bites, " +
      "unlisted hosts drop, tags are stripped, manifest reconciles") {
    val s = initSpark()
    val seg =
      page("https://host-a.org/p1", para(1)) ++
        page("https://host-a.org/p2", para(2)) ++
        page("https://host-a.org/p3", para(3)) ++
        page("https://host-a.org/p1-copy", para(1)) ++ // exact dup text
        page("https://host-b.org/q1", para(4)) ++
        page("https://host-b.org/q2", para(5)) ++
        page("https://host-c.org/x", para(6)) // host absent from rates
    val dir = java.nio.file.Files
      .createTempDirectory("graft_corpus").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg.warc"), seg)
    val out = java.nio.file.Files
      .createTempDirectory("graft_corpus_out").toString
    val manifest = CorpusBuild.fromWarc(s, s"$dir/seg.warc", out,
      rates = Map("host-a.org" -> 1.0, "host-b.org" -> 1.0),
      numShards = 4).collect()
    val back = s.read.json(s"$out/data")
    val rows = back.collect()
    // 3 unique host-a texts (dup collapsed) + 2 host-b; host-c dropped
    assert(rows.length === 5)
    assert(manifest.map(_.getAs[Long]("rows")).sum === 5L)
    val hosts = rows.map(_.getAs[String]("source")).toSet
    assert(hosts === Set("host-a.org", "host-b.org"))
    // dedup kept exactly one carrier of para(1)
    assert(rows.count(_.getAs[String]("text").contains(
      "paragraph 1 section 0")) === 1)
    // extraction stripped the markup
    assert(rows.forall(!_.getAs[String]("text").contains("<")))
    // split assignment rode through
    assert(rows.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val", "test")))
  }
}
