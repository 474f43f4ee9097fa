package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{HtmlArticle, Plos}

/** Golden-fixture tests for the IRD le Mag' and PLOS page scrapers,
  * pinned to the reference's OWN test expectations
  * (tests/document_collector_hub/plugins_test/test_irl_le_mag.py,
  * test_scraping_plos.py). */
class ScrapersSpec extends SparkSuite {

  private def fixture(name: String): String =
    new String(Files.readAllBytes(Paths.get(
      getClass.getResource(s"/fixtures/$name").toURI)), "UTF-8")

  test("IRD le Mag': title/description/author/date/content match the " +
      "reference plugin's golden values") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(fixture("page_ird_le_mag.html")).toDF("html")
      .select(HtmlArticle.irdLeMagDocument(col("html")).as("doc"))
      .select("doc.*")
    val r = df.head()
    assert(r.getAs[String]("title") ===
      "Le second métier des femmes pauvres : faire fonctionner " +
        "l’économie et l’Etat social | IRD le Mag'")
    assert(r.getAs[String]("description") ===
      "Accéder à une aide sociale, un logement ou des soins exige un " +
        "travail invisible, surtout assumé par les femmes. Une " +
        "inégalité méconnue.")
    assert(r.getAs[String]("author") === "Olivier Blot")
    // reference test__extract_publication_date: 2026-02-26T13:55:01Z
    assert(r.getAs[Long]("publication_date") === 1772114101L)
    val content = r.getAs[String]("full_content")
    assert(content.startsWith("Le second métier des femmes pauvres : " +
      "faire fonctionner l’économie et l’Etat social"))
    // correct_text_syntax: space landed between "2021." and "Isabelle"
    assert(content.contains("Cambridge University Press, 2021. Isabelle"))
    assert(content.endsWith("La Découverte, 2026."))
  }

  test("IRD le Mag': missing script/key degrades to null content, " +
      "absent author yields empty") {
    val s = initSpark()
    import s.implicits._
    val page = fixture("page_ird_le_mag.html")
    val broken = Seq(
      page.replace("application/json", "application/xml"),
      page.replace("speakeasy", "toto")).toDF("html")
      .select(HtmlArticle.irdLeMagDocument(col("html")).as("doc"))
    val rows = broken.select("doc.full_content").collect()
    assert(rows.forall(r => r.isNullAt(0) || r.getString(0).isEmpty))
  }

  test("PLOS JATS: title/doi/license/type match the reference plugin's " +
      "golden values; description skips the Abstract heading") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(fixture("page_plos1.xml")).toDF("xml")
      .select(Plos.plosDocument(col("xml")).as("doc"))
      .select("doc.*")
    val r = df.head()
    assert(r.getAs[String]("title") ===
      "The stress sigma factor σS/RpoS counteracts Fur repression of " +
        "genes involved in iron and manganese metabolism and modulates " +
        "the ionome of Salmonella enterica serovar Typhimurium")
    assert(r.getAs[String]("external_id") === "10.1371/journal.pone.0265511")
    assert(r.getAs[String]("license_url") ===
      "http://creativecommons.org/licenses/by/4.0/")
    assert(r.getAs[Boolean]("license_authorized"))
    assert(r.getAs[String]("article_type") === "Research Article")
    val desc = r.getAs[String]("description")
    assert(desc.nonEmpty && !desc.startsWith("Abstract"))
    val content = r.getAs[String]("full_content")
    assert(content.nonEmpty)
    // body <title> headings are decomposed, not inlined
    assert(!content.contains("Introduction Materials"))
    val cats = r.getAs[scala.collection.Seq[String]]("categories")
    assert(cats.contains("Research Article"))
  }

  test("PeerJ: title/doi/license/authors/date match the fixture; " +
      "figures become table sentences; supplemental sections vanish") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(fixture("page_peerj1.html")).toDF("html")
      .select(graft.sources.PeerJ.peerjDocument(col("html")).as("doc"))
      .select("doc.*")
    val r = df.head()
    assert(r.getAs[String]("title") ===
      "An integrative taxonomic revision of slug-eating snakes " +
        "(Squamata: Pareidae: Pareineae) reveals unprecedented " +
        "diversity in Indochina")
    assert(r.getAs[String]("external_id") === "10.7717/peerj.12713")
    assert(r.getAs[String]("license_url") ===
      "https://creativecommons.org/licenses/by/4.0/")
    assert(r.getAs[Boolean]("license_authorized"))
    assert(r.getAs[String]("journal") === "PeerJ")
    assert(r.getAs[String]("issn") === "2167-8359")
    assert(r.getAs[String]("publisher") === "PeerJ Inc.")
    // citation_date 2022-01-10 UTC midnight
    assert(r.getAs[Long]("publication_date") === 1641772800L)
    val authors = r.getAs[scala.collection.Seq[
      org.apache.spark.sql.Row]]("authors")
    assert(authors.size === 10)
    assert(authors.head.getAs[String]("name") === "Nikolay A. Poyarkov")
    assert(authors.head.getAs[String]("misc")
      .startsWith("Laboratory of Tropical Ecology"))
    val tags = r.getAs[scala.collection.Seq[String]]("tags")
    assert(tags.contains("Molecular phylogeny") && tags.size === 10)
    val content = r.getAs[String]("full_content")
    assert(content != null && content.length > 10000)
    val desc = r.getAs[String]("description")
    assert(desc.startsWith("Slug-eating snakes of the subfamily Pareinae"))
  }

  test("notre-environnement: DC metadata matches the reference test's " +
      "values; ~ separators become spaces") {
    val s = initSpark()
    import s.implicits._
    // synthetic page mirroring the reference's own mocked DC values
    // (test_notre_environnement.py:23-33)
    val page =
      """<html><head>
        |<meta name="DC.title" content="Title~ipsum">
        |<meta name="description" content="lorem ipsum">
        |<meta name="DC.date" content="2026-01-01">
        |<meta name="DC.data.modified" content="2026-01-15">
        |</head><body><main><p>full content lorem ipsum ipsum</p>
        |</main></body></html>""".stripMargin
    val r = Seq(page).toDF("html")
      .select(HtmlArticle.notreEnvironnementDocument(col("html"))
        .as("doc"))
      .select("doc.*").head()
    assert(r.getAs[String]("title") === "Title ipsum")
    assert(r.getAs[String]("description") === "lorem ipsum")
    assert(r.getAs[String]("full_content") ===
      "full content lorem ipsum ipsum")
    assert(r.getAs[Long]("publication_date") ===
      java.time.LocalDate.of(2026, 1, 1)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond)
    assert(r.getAs[Long]("update_date") ===
      java.time.LocalDate.of(2026, 1, 15)
        .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond)
  }

  test("UNCC:eLearn: course panel matches the reference test's golden " +
      "values; duration ranges take the midpoint") {
    val s = initSpark()
    import s.implicits._
    val r = Seq(fixture("unccelearn_course.html")).toDF("html")
      .select(graft.sources.Unccelearn.courseDetails(col("html"))
        .as("d"))
      .select("d.*").head()
    // reference test_unccelearn.py:103-106
    assert(r.getAs[String]("theme") === "climate change")
    assert(r.getAs[Int]("duration") === 4 * 3600)
    assert(r.getAs[Boolean]("certifying"))
    assert(r.getAs[String]("course_type") === "self-paced courses")
    // duration arithmetic (unccelearn.py:65-87)
    import graft.sources.Unccelearn.courseDurationSeconds
    assert(courseDurationSeconds("3 hours") === Some(10800))
    assert(courseDurationSeconds("3,5 hours") === Some(12600))
    assert(courseDurationSeconds("3-4 hours") === Some(12600))
    assert(courseDurationSeconds("n/a") === None)
  }

  test("OE Books: urn doi/isbn split, author normalization, license, " +
      "lang-scoped abstract, open-access predicate (reference values)") {
    val s = initSpark()
    import s.implicits._
    val xml =
      """<mets:dmdSec>
        |<dcterms:identifier scheme="URN">urn:doi:10.1000/xyz123</dcterms:identifier>
        |<dcterms:identifier scheme="URN">urn:isbn:978-3-16-148410-0</dcterms:identifier>
        |<dcterms:creator>Doe, John</dcterms:creator>
        |<dcterms:creator>Smith, Jane</dcterms:creator>
        |<dcterms:rights>https://creativecommons.org/licenses/by/4.0/</dcterms:rights>
        |<dcterms:abstract xml:lang="en">This is an abstract in English.</dcterms:abstract>
        |<dcterms:abstract xml:lang="fr">Ceci est un résumé.</dcterms:abstract>
        |<dcterms:description>Fallback description.</dcterms:description>
        |<dcterms:accessRights>info:eu-repo/semantics/openAccess</dcterms:accessRights>
        |</mets:dmdSec>""".stripMargin
    val r = Seq(xml).toDF("xml").select(
      graft.sources.OeBooks.doiAndIsbn(col("xml")).as("ids"),
      graft.sources.OeBooks.authors(col("xml")).as("authors"),
      graft.sources.OeBooks.currentLicense(col("xml")).as("lic"),
      graft.sources.OeBooks.description(col("xml"), lit("en")).as("desc"),
      graft.sources.OeBooks.description(col("xml"), lit("de")).as("fallback"),
      graft.sources.OeBooks.isOpenAccess(col("xml")).as("oa")).head()
    assert(r.getStruct(0).getString(0) === "10.1000/xyz123")
    assert(r.getStruct(0).getString(1) === "978-3-16-148410-0")
    val names = r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))
    assert(names === Seq("John Doe", "Jane Smith"))
    assert(r.getString(2) ===
      "https://creativecommons.org/licenses/by/4.0/")
    assert(r.getString(3) === "This is an abstract in English.")
    assert(r.getString(4) === "Fallback description.")
    assert(r.getBoolean(5))
  }

  test("OE Books chapter content: span/a decomposed, anchor-fulltext " +
      "text extracted from the real fixture") {
    val s = initSpark()
    import s.implicits._
    val content = Seq(fixture("oe_book_chapter.html")).toDF("html")
      .select(graft.sources.OeBooks.chapterContent(col("html")).as("c"))
      .head().getString(0)
    assert(content != null && content.length > 1000)
    assert(content.contains("Question everything and everyone."))
    // navigation anchors (a elements) are decomposed, not inlined
    assert(!content.contains("Texte intégral"))
  }

  test("PLOS: unauthorized or missing license is flagged, not kept") {
    val s = initSpark()
    import s.implicits._
    val page = fixture("page_plos1.xml")
    val df = Seq(
      page.replace("licenses/by/4.0/", "licenses/by-nc/4.0/"),
      page.replace("xlink:href", "nope")).toDF("xml")
      .select(Plos.licenseAuthorized(col("xml")).as("ok"))
    assert(df.collect().forall(!_.getBoolean(0)))
  }
}
