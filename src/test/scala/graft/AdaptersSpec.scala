package graft

import org.apache.spark.sql.functions._

import graft.functions.PdfText
import graft.jobs.SqlRunner
import graft.operators.{ErrorChannel, UrlChecker}
import graft.sources.RestCursor
import graft.sources.RestCursor.{HttpError, Pushdown, Transport}

class AdaptersSpec extends SparkSuite {

  // ---- REST cursor scan (S9/S10/R1) with replay transport ----

  test("cursor scan walks pages until the cursor runs out") {
    val s = initSpark()
    val served = scala.collection.mutable.ArrayBuffer.empty[String]
    val transport = new Transport {
      def get(url: String): String = {
        served += url
        if (url.contains("cursor=*")) """{"next":"c2","items":[1,2]}"""
        else if (url.contains("cursor=c2")) """{"next":null,"items":[3]}"""
        else fail(s"unexpected url $url")
      }
    }
    val next = (body: String) =>
      if (body.contains("\"next\":\"c2\"")) Some("c2") else None
    val pages = RestCursor.cursorScan(s, transport,
      "https://api.example.org/works",
      Pushdown(filters = Map("is_oa" -> "true"), select = Seq("id", "title"),
        perPage = 200),
      next)
    assert(pages.count() === 2)
    // pushdown reached the query string (R1)
    assert(served.head.contains("per-page=200"))
    assert(served.head.contains("filter=is_oa:true"))
    assert(served.head.contains("select=id,title"))
  }

  test("LIVE SOCKET: HttpTransport + withRetry survive real 503/429 " +
      "responses from a loopback server, then cursorScan completes " +
      "(reference R10 retry/backoff against an actual HTTP stack)") {
    val s = initSpark()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/api", { exchange =>
      val n = hits.incrementAndGet()
      val (code, body) = n match {
        case 1 => (503, """{"error":"warming up"}""")
        case 2 => (429, """{"error":"rate limited"}""")
        case _ =>
          val q = Option(exchange.getRequestURI.getQuery).getOrElse("")
          if (q.contains("cursor=*"))
            (200, """{"next":"c2","items":[1,2]}""")
          else (200, """{"next":null,"items":[3]}""")
      }
      val bytes = body.getBytes("UTF-8")
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(code, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
      val t = RestCursor.withRetry(new RestCursor.HttpTransport(),
        maxAttempts = 5, sleep = delays.append(_))
      val next = (body: String) =>
        if (body.contains("\"next\":\"c2\"")) Some("c2") else None
      val pages = RestCursor.cursorScan(s, t,
        s"http://127.0.0.1:$port/api", Pushdown(), next, maxPages = 5)
      val bodies = pages.collect().map(_.getAs[String]("page_body"))
      assert(bodies.length === 2)
      assert(bodies(0).contains("\"items\":[1,2]"))
      assert(bodies(1).contains("\"items\":[3]"))
      assert(hits.get() === 4, "503 + 429 + two successful pages")
      assert(delays.toSeq === Seq(100L, 200L),
        "backoff doubles per attempt (reference x2 schedule)")
      // a hard 404 from a real socket is NOT retried
      val err = intercept[HttpError] {
        RestCursor.withRetry(new RestCursor.HttpTransport(),
          sleep = _ => ()).get(s"http://127.0.0.1:$port/nope")
      }
      assert(err.code === 404)
    } finally server.stop(0)
  }

  test("retry transport also retries transient IOExceptions (connect " +
      "refused / read timeout), not just HTTP status codes") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky = new Transport {
      def get(url: String): String =
        if (calls.incrementAndGet() <= 2)
          throw new java.net.SocketTimeoutException("read timed out")
        else "ok"
    }
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(RestCursor.withRetry(flaky, maxAttempts = 5,
      sleep = delays.append(_)).get("http://x") === "ok")
    assert(calls.get() === 3)
    assert(delays.toSeq === Seq(100L, 200L))
    // a non-IO, non-HTTP error still propagates immediately
    val broken = new Transport {
      def get(url: String): String =
        throw new IllegalStateException("bug")
    }
    intercept[IllegalStateException] {
      RestCursor.withRetry(broken, sleep = _ => ()).get("http://x")
    }
  }

  test("PDF lexer edge cases: dictionary tokens and inline-image " +
      "islands do not pollute extracted text; last-wins on duplicate " +
      "backfill sources") {
    import graft.functions.PdfExtract
    def content(ops: String) = PdfExtract.textFromContent(
      ops.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    // '<<' is a dict open, not a hex string — the marked-content dict
    // must not leak '/ActualText (x)' garbage into the output
    assert(content(
      "BT /Span << /ActualText (x) >> BDC (real) Tj EMC ET") === "real")
    // inline image binary with an unbalanced '(' inside ID..EI
    assert(content(
      "BT (before) Tj ET BI /W 2 /H 2 ID (ÿþ EI BT (after) Tj ET")
      === "before\nafter")
    // duplicate source in two backfill statements: last statement wins
    val s = initSpark()
    import s.implicits._
    val stmts = Seq(
      SqlRunner.CategoryBackfill("first", Seq("dup", "only-first")),
      SqlRunner.CategoryBackfill("second", Seq("dup")))
    val corpus = Seq((1L, "dup", "t"), (2L, "only-first", "t"))
      .toDF("id", "source_name", "title")
    val (_, updated) = SqlRunner.applyCategoryBackfill(s, corpus, stmts)
    assert(updated.count() === 2, "no row duplication on dup sources")
    val got = updated.select("source_name", "category_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("dup") === 2L) // sequential-UPDATE last-wins
    assert(got("only-first") === 1L)
  }

  test("retry transport: backs off on 429/5xx, gives up past budget") {
    var calls = 0
    val flaky = new Transport {
      def get(url: String): String = {
        calls += 1
        if (calls < 3) throw HttpError(503, "unavailable") else "ok"
      }
    }
    val t = RestCursor.withRetry(flaky, maxAttempts = 10, sleep = _ => ())
    assert(t.get("https://x") === "ok")
    assert(calls === 3)
    calls = 0
    val always404 = new Transport {
      def get(url: String): String = { calls += 1; throw HttpError(404, "no") }
    }
    intercept[HttpError] {
      RestCursor.withRetry(always404, sleep = _ => ()).get("https://x")
    }
    assert(calls === 1) // 404 is not retryable
  }

  test("batched lookup join: one fetch per batch, misses -> null (S12/J8)") {
    val s = initSpark()
    import s.implicits._
    // batch size observed through the payload (closure vars don't
    // round-trip through task serialization)
    val out = RestCursor.batchedLookupJoin(
      (1 to 10).map(i => s"id$i").toDS().repartition(1),
      batchSize = 4,
      batch => batch.filter(_ != "id7")
        .map(k => k -> s"payload-$k-batch${batch.size}").toMap)
    val rows = out.collect().map(r => r.getString(0) ->
      Option(r.getString(1))).toMap
    assert(rows("id1") === Some("payload-id1-batch4"))
    assert(rows("id7") === None) // unmatched -> error channel
    // ceil(10/4) batches: sizes 4,4,2
    assert(rows("id10") === Some("payload-id10-batch2"))
  }

  // ---- Wikipedia category BFS (S11) ----

  test("wiki category scan: depth-budgeted BFS with cmcontinue pages") {
    val s = initSpark()
    import graft.sources.WikiCategoryScan
    // fixture API: root has 2 pages (one via continuation) + subcat;
    // subcat has 1 page + a deeper subcat that must NOT be visited at
    // maxDepth=1; a cycle back to root must not loop
    val transport = new Transport {
      def get(url: String): String = url match {
        case u if u.contains("cmtitle=Category:Root") &&
            !u.contains("cmcontinue") =>
          """{"query":{"categorymembers":[
            {"ns":0,"title":"Page A"},
            {"ns":14,"title":"Category:Sub"}]},
            "continue":{"cmcontinue":"tok1"}}"""
        case u if u.contains("cmtitle=Category:Root") &&
            u.contains("cmcontinue=tok1") =>
          """{"query":{"categorymembers":[{"ns":0,"title":"Page B"}]}}"""
        case u if u.contains("cmtitle=Category:Sub") =>
          """{"query":{"categorymembers":[
            {"ns":0,"title":"Page C"},
            {"ns":14,"title":"Category:Deep"},
            {"ns":14,"title":"Category:Root"}]}}"""
        case u => fail(s"unexpected fetch: $u")
      }
    }
    val got = WikiCategoryScan.scan(s, transport, "https://wiki/api.php",
      "Category:Root", maxDepth = 1, WikiCategoryScan.mediaWikiParser)
      .collect().map(r => (r.getString(0), r.getInt(2))).toSet
    assert(got === Set(("Page A", 0), ("Page B", 0), ("Page C", 1)))
  }

  // ---- URL checker (P12/F20/F26/F27) ----

  private def one(c: org.apache.spark.sql.Column, v: String): Any = {
    val s = initSpark()
    import s.implicits._
    Seq(Tuple1(v)).toDF("x").select(c.as("r")).head().get(0)
  }

  test("status class mapping") {
    val s = initSpark()
    import s.implicits._
    val got = Seq(200, 204, 301, 404, 500).toDF("c")
      .select(UrlChecker.statusClass(col("c"))).collect().map(_.getString(0))
    assert(got.toSeq === Seq("VALID", "VALID", "TO_UPDATE", "TO_DELETE",
      "UNKNOWN"))
  }

  test("url sanitation truncates illegal chars and upgrades scheme") {
    assert(one(UrlChecker.sanitizeUrl(col("x")),
      "http://ex.org/a b") === "https://ex.org/a")
  }

  test("domain predicate matches host and subdomains") {
    val s = initSpark()
    import s.implicits._
    val df = Seq("https://ex.org/p", "https://sub.ex.org/p",
      "https://notex.org/p").toDF("x")
    val got = df.select(UrlChecker.isOnDomain(col("x"), "ex.org"))
      .collect().map(_.getBoolean(0))
    assert(got.toSeq === Seq(true, true, false))
  }

  test("date and duration parsing (F26/F27)") {
    assert(one(UrlChecker.isoDateToEpoch(col("x")), "2024-01-01") ===
      1704067200L)
    assert(one(UrlChecker.compactDateToEpoch(col("x")), "20240101") ===
      1704067200L)
    assert(one(UrlChecker.durationToSeconds(col("x")),
      "2 hours 30 minutes") === 9000L)
    assert(one(UrlChecker.durationToSeconds(col("x")), "1h 5m") === 3900L)
    assert(one(UrlChecker.durationToSeconds(col("x")), "45") === 2700L)
  }

  // ---- SQL runner (S20/S21/F32) ----

  test("param validation fails fast on unbound or unused params") {
    SqlRunner.validateParams("SELECT * FROM t WHERE a = :x",
      Map("x" -> 1))
    intercept[IllegalArgumentException] {
      SqlRunner.validateParams("SELECT :a, :b", Map("a" -> 1))
    }
    intercept[IllegalArgumentException] {
      SqlRunner.validateParams("SELECT 1", Map("ghost" -> 1))
    }
  }

  test("identifier sanitation rejects injection attempts (S20)") {
    SqlRunner.validateIdentifier("schema.my_view")
    intercept[IllegalArgumentException] {
      SqlRunner.validateIdentifier("v; DROP TABLE x")
    }
  }

  test("named-param SQL executes with bound values (S21)") {
    val s = initSpark()
    import s.implicits._
    Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")
      .createOrReplaceTempView("sqlrunner_t")
    val out = SqlRunner.runSql(s,
      "SELECT v FROM sqlrunner_t WHERE id >= :minId ORDER BY id",
      Map("minId" -> 2))
    assert(out.collect().map(_.getString(0)).toSeq === Seq("b", "c"))
  }

  test("GOLDEN: the reference corpus-category backfill migration runs " +
      "end-to-end (parse the real file -> dim build + broadcast join; " +
      "sql/89920abb7ff8_populate_corpus_category.sql)") {
    val s = initSpark()
    import s.implicits._
    val path =
      "/root/reference/sql/89920abb7ff8_populate_corpus_category.sql"
    assume(new java.io.File(path).exists(), "reference checkout absent")
    val parsed = SqlRunner.parseCategoryBackfill(path)
    // golden: the five statements, in file order, with their IN-lists
    assert(parsed.map(_.title) === Seq(
      "academic scientific publications", "teaching resources",
      "expert reports", "science communication and outreach",
      "collaborative and encyclopedic knowledge"))
    assert(parsed.head.sources === Seq("hal", "plos", "peerj", "oapen",
      "openalex", "open-edition-books"))
    assert(parsed(2).sources === Seq("ipcc", "ipbes"))
    val corpus = Seq(
      (1L, "hal", "c1"), (2L, "ted", "c2"), (3L, "wikipedia", "c3"),
      (4L, "uved", "c4"), (5L, "unknown-source", "c5"))
      .toDF("id", "source_name", "title")
    val (categories, updated) =
      SqlRunner.applyCategoryBackfill(s, corpus, parsed)
    assert(categories.count() === 5)
    val got = updated.select("source_name", "category_id").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got("hal") === 1L) // academic scientific publications
    assert(got("ted") === 4L) // science communication and outreach
    assert(got("wikipedia") === 5L) // collaborative and encyclopedic
    assert(got("uved") === 2L) // teaching resources
    assert(got("unknown-source") === null) // untouched by every UPDATE
  }

  test("materialized-view refresh re-runs registered query (S20)") {
    val s = initSpark()
    import s.implicits._
    val reg = new SqlRunner.ViewRegistry
    val base = java.nio.file.Files.createTempDirectory("graft_mv").toString
    Seq(1, 2, 3).toDF("n").createOrReplaceTempView("mv_src")
    reg.register("mv_sum", "SELECT sum(n) AS total FROM mv_src")
    reg.refresh(s, "mv_sum", base)
    assert(s.read.parquet(s"$base/mv_sum").head().getLong(0) === 6L)
    Seq(10, 20).toDF("n").createOrReplaceTempView("mv_src")
    reg.refresh(s, "mv_sum", base)
    assert(s.read.parquet(s"$base/mv_sum").head().getLong(0) === 30L)
  }

  // ---- PDF refinement (S15/F13-F15) ----

  test("repeated headers/footers removed across pages (RefineDoc)") {
    val s = initSpark()
    import s.implicits._
    val pages = Seq(
      "Journal of X\npage one content\n17",
      "Journal of X\npage two content\n18",
      "Journal of X\npage three content\n19")
    // footers differ (page numbers) -> kept; header repeats -> removed
    val got = Seq(Tuple1(pages)).toDF("pages")
      .select(PdfText.removeRepeatedHeadersFooters(col("pages")).as("r"))
      .head().getSeq[String](0)
    assert(got === Seq("page one content\n17", "page two content\n18",
      "page three content\n19"))
  }

  test("full refine chain: ligatures + dehyphenation + controls") {
    val s = initSpark()
    import s.implicits._
    val pages = Seq("Head\nThe ﬁrst exam-\nple text\nHead2",
      "Head\nmore ﬂow here\nHead2")
    val got = Seq(Tuple1(pages)).toDF("pages")
      .select(PdfText.refinePages(col("pages")).as("r")).head().getString(0)
    assert(got.contains("first example text"))
    assert(got.contains("flow"))
    assert(!got.contains(""))
  }

  test("REAL PDF: FlateDecode content streams extract per-page text, " +
      "and the full S15 chain strips the repeated header (in-engine " +
      "replacement for the reference's Tika sidecar)") {
    val s = initSpark()
    import s.implicits._
    val pdf = PdfFixtures.pdf(Seq(
      Seq("Corporate Header", "First page body text."),
      Seq("Corporate Header", "Second page body text."),
      Seq("Corporate Header", "Third page, hy-", "phenated word.")))
    val pages = graft.functions.PdfExtract.pages(pdf)
    assert(pages.length === 3)
    assert(pages(0) === "Corporate Header\nFirst page body text.")
    assert(pages(2).contains("hy-\nphenated"))
    // full binary -> clean-text column path
    val out = Seq(Tuple1(pdf)).toDF("pdf")
      .select(PdfText.extractRefined(col("pdf")).as("text"))
      .head().getString(0)
    assert(!out.contains("Corporate Header"),
      s"repeated header must be stripped, got: $out")
    assert(out.contains("First page body text."))
    assert(out.contains("hyphenated word."), // dehyphenation repaired it
      s"dehyphenation failed: $out")
    // uncompressed streams and non-PDF bytes
    val plain = PdfFixtures.pdf(Seq(Seq("No filter here.")),
      compress = false)
    assert(graft.functions.PdfExtract.pages(plain) ===
      Seq("No filter here."))
    assert(graft.functions.PdfExtract.pages("not a pdf".getBytes) ===
      Seq.empty)
    assert(graft.functions.PdfExtract.pages(null) === Seq.empty)
  }

  test("PDF content-stream operators: TJ kerning gaps become spaces, " +
      "hex strings and escapes decode, encryption is detected") {
    import graft.functions.PdfExtract
    def content(ops: String) = PdfExtract.textFromContent(
      ops.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    // -80 is sub-word kerning (joined); -300 is a word gap (space)
    assert(content("BT [(Hel)-80(lo)-300(world)] TJ ET") === "Hello world")
    assert(content("BT <48656C6C6F> Tj ET") === "Hello")
    assert(content("BT (a\\(b\\)c \\134 \\101) Tj ET") === "a(b)c \\ A")
    assert(content("BT (line one) Tj 0 -14 Td (line two) Tj ET") ===
      "line one\nline two")
    val enc = ("%PDF-1.4\n1 0 obj << /Encrypt 2 0 R >> endobj\n")
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(PdfExtract.isEncrypted(enc))
  }

  test("pdf size admission guard (R11)") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(Some(100L), Some(3000000L), None).toDF("sz")
    val got = df.select(PdfText.admitBySize(col("sz")))
      .collect().map(_.getBoolean(0))
    assert(got.toSeq === Seq(true, false, false))
  }

  // ---- Error channel (P7/P8/§1 wrappers) ----

  test("mandatory-field validation routes 422 errors in-band (P7)") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(("d1", "desc", "content"), ("d2", "  ", "content"),
      ("d3", "desc", null)).toDF("id", "description", "full_content")
    val validated = ErrorChannel.validateMandatory(df,
      Seq("description", "full_content"))
    val (clean, errored) = ErrorChannel.split(validated)
    assert(clean.select("id").collect().map(_.getString(0)).toSeq ===
      Seq("d1"))
    val errs = errored.collect().map(r => r.getAs[String]("id") ->
      r.getAs[Int]("http_error_code")).toMap
    assert(errs === Map("d2" -> 422, "d3" -> 422))
  }

  test("license allow-list gate (P8)") {
    val s = initSpark()
    import s.implicits._
    val df = ErrorChannel.withErrorChannel(
      Seq(("d1", "CC-BY"), ("d2", "proprietary")).toDF("id", "license"))
    val (clean, errored) = ErrorChannel.split(
      ErrorChannel.gateLicense(df, "license"))
    assert(clean.select("id").collect().map(_.getString(0)).toSeq ===
      Seq("d1"))
    assert(errored.select("http_error_code").head().getInt(0) === 403)
  }

  test("publisher deny-list gate (P9)") {
    val s = initSpark()
    import s.implicits._
    val df = ErrorChannel.withErrorChannel(Seq(
      ("d1", Seq("P100", "P200")), ("d2", Seq("P666"))
    ).toDF("id", "lineage"))
    val (clean, errored) = ErrorChannel.split(
      ErrorChannel.gatePublisher(df, "lineage", Seq("P666", "P667")))
    assert(clean.select("id").collect().map(_.getString(0)).toSeq ===
      Seq("d1"))
    assert(errored.select("id").collect().map(_.getString(0)).toSeq ===
      Seq("d2"))
  }
}
