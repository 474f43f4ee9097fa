package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{JsonSearch, Xml}

/** Golden-fixture tests for the source extraction operators, using the
  * reference repo's own recorded payloads (FIXTURES.md §A2). */
class SourcesSpec extends SparkSuite {

  private def fixture(name: String): String =
    new String(Files.readAllBytes(Paths.get(
      getClass.getResource(s"/fixtures/$name").toURI)), "UTF-8")

  private def asDf(content: String) = {
    val s = initSpark()
    import s.implicits._
    Seq(Tuple1(content)).toDF("xml")
  }

  test("atom fixture: entry alternate links extracted (S6)") {
    val got = asDf(fixture("atom_file.xml"))
      .select(Xml.atomEntryLinks(col("xml")).as("links"))
      .head().getSeq[String](0)
    assert(got === Seq("https://www.example.com/entry1",
      "https://www.example.com/entry2", "https://www.example.com/entry3"))
  }

  test("rss fixture: item links extracted (S7)") {
    val got = asDf(fixture("rss_file.rss"))
      .select(Xml.rssItemLinks(col("xml")).as("links"))
      .head().getSeq[String](0)
    assert(got === Seq("https://www.example.com/article1",
      "https://www.example.com/article2",
      "https://www.example.com/article3"))
  }

  test("sitemap index detection and loc fan-out (S8)") {
    val index =
      """<sitemapindex><sitemap><loc> https://x.org/s1.xml </loc></sitemap>
        |<sitemap><loc>https://x.org/s2.xml</loc></sitemap></sitemapindex>"""
        .stripMargin
    val df = asDf(index)
    assert(df.select(Xml.isSitemapIndex(col("xml"))).head().getBoolean(0))
    assert(df.select(Xml.sitemapLocs(col("xml")).as("l"))
      .head().getSeq[String](0)
      === Seq("https://x.org/s1.xml", "https://x.org/s2.xml"))
    val plain = asDf("<urlset><url><loc>https://x.org/p1</loc></url></urlset>")
    assert(!plain.select(Xml.isSitemapIndex(col("xml"))).head().getBoolean(0))
  }

  test("OAI-PMH fixture: record + deleted-status predicate (S13/P13)") {
    val xml = fixture("world_bank_okr_example.xml")
    val df = asDf(xml)
    val records = df.select(Xml.oaiRecords(col("xml")).as("r"))
      .head().getSeq[String](0)
    assert(records.nonEmpty)
    assert(!df.select(Xml.oaiRecordIsDeleted(col("xml"))).head.getBoolean(0))
    val deleted = asDf(
      """<record><header status="deleted"><identifier>x</identifier>
        |</header></record>""".stripMargin)
    assert(deleted.select(Xml.oaiRecordIsDeleted(col("xml")))
      .head.getBoolean(0))
  }

  test("xml attribute extraction with filter (F29)") {
    val xml = """<feed><link rel="self" href="https://a"/>
      |<link rel="alternate" href="https://b"/></feed>""".stripMargin
    val got = asDf(xml).select(Xml.tagAttributeValuesFiltered(
      col("xml"), "link", "href", "rel", "alternate").as("v"))
      .head().getSeq[String](0)
    assert(got === Seq("https://b"))
  }

  test("recursive JSON url search finds fields at any depth (S5/F31)") {
    val s = initSpark()
    import s.implicits._
    val json =
      """{"a": {"url": "https://one", "b": [{"url": "https://two"},
        |{"c": {"url": "http://insecure"}}]}, "url": "https://three"}"""
        .stripMargin
    val all = Seq(Tuple1(json)).toDF("j")
      .select(JsonSearch.findFieldValues(col("j"), lit("url")).as("v"))
      .head().getSeq[String](0)
    assert(all.toSet === Set("https://one", "https://two",
      "http://insecure", "https://three"))
    val https = Seq(Tuple1(json)).toDF("j")
      .select(JsonSearch.findUrls(col("j"), "url").as("v"))
      .head().getSeq[String](0)
    assert(https.toSet === Set("https://one", "https://two", "https://three"))
  }

  test("recursive JSON search on the reference scraped-page fixture") {
    val s = initSpark()
    import s.implicits._
    val got = Seq(Tuple1(fixture("example.json"))).toDF("j")
      .select(JsonSearch.findFieldValues(col("j"), lit("url")).as("v"))
      .head().getSeq[String](0)
    assert(got.contains("https://example.org/1"))
  }

  test("invalid JSON -> empty result, no exception") {
    val s = initSpark()
    import s.implicits._
    val got = Seq(Tuple1("{not json")).toDF("j")
      .select(JsonSearch.findFieldValues(col("j"), lit("url")).as("v"))
      .head().getSeq[String](0)
    assert(got.isEmpty)
  }

  test("CSV seed scan: url column + https filter (S4)") {
    val s = initSpark()
    val path = getClass.getResource("/fixtures/example_1.csv").getPath
    val urls = s.read.option("header", "true").option("quote", "\"")
      .csv(path)
      .select(col("url"))
      .where(col("url").startsWith("https://"))
      .collect().map(_.getString(0))
    assert(urls.length === 7)
    assert(urls.forall(_.startsWith("https://example.com/")))
  }

  test("conversation page scrape: headline/og:description/articleBody " +
      "from the reference's real fixture") {
    val s = initSpark()
    import s.implicits._
    val html = fixture("page_conversation.html")
    val doc = Seq(Tuple1(html)).toDF("html")
      .select(graft.sources.HtmlArticle.conversationDocument(col("html"))
        .as("d"))
      .select("d.*").head()
    val title = doc.getAs[String]("title")
    val desc = doc.getAs[String]("description")
    val content = doc.getAs[String]("full_content")
    assert(title != null && title.nonEmpty && !title.contains("<"))
    assert(desc != null &&
      desc.startsWith("Plus il fait chaud"))
    assert(content != null && content.length > 1000 &&
      !content.contains("<div"))
  }

  test("openedition mets: openaccess+licensed book emits chapter urls " +
      "(reference fixture)") {
    val s = initSpark()
    import s.implicits._
    val xml = fixture("oe_mets_test.xml")
    val urls = Seq(Tuple1(xml)).toDF("xml")
      .select(explode(graft.sources.Mets.openEditionUrls(col("xml")))
        .as("url"))
      .collect().map(_.getString(0))
    // fixture: 1 book (openAccess, CC-BY-4.0) + 7 chapters + 1
    // bibliography -> the 7 chapter urls, nothing else
    assert(urls.length === 7)
    assert(urls.forall(_.startsWith(
      "https://books.openedition.org/ariadnaediciones/")))
    assert(!urls.contains("https://books.openedition.org/ariadnaediciones/8043"))
  }

  test("elementByAttr respects nested same-name tags (balanced scan)") {
    val html = """<div itemprop="articleBody">outer <div>inner</div>
      tail</div><div>after</div>"""
    val got = graft.sources.HtmlArticle.elementByAttr(
      html, "div", "itemprop", "articleBody")
    assert(got.contains("outer") && got.contains("inner") &&
      got.contains("tail") && !got.contains("after"))
  }
}
