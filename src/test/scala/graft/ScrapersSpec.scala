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
