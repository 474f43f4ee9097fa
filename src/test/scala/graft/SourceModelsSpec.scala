package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.SourceModels

/** Golden-fixture extraction parity for the schema-on-read source models
  * (reference fixtures; SURVEY §5.3 plugin-test analogue). */
class SourceModelsSpec extends SparkSuite {

  private def fixture(name: String): String =
    new String(Files.readAllBytes(Paths.get(
      getClass.getResource(s"/fixtures/$name").toURI)), "UTF-8")

  private def asDf(content: String) = {
    val s = initSpark()
    import s.implicits._
    Seq(Tuple1(content)).toDF("body")
  }

  test("openalex: parse page, invert abstract, extract document fields") {
    val works = asDf(fixture("open_alex_response.json"))
      .select(explode(SourceModels.parseOpenAlexWorks(col("body")))
        .as("work"))
    val docs = works.select(SourceModels.openAlexToDocument(col("work"))
      .as("d")).select("d.*")
    val first = docs.head()
    assert(first.getAs[String]("title")
      .startsWith("Template switching during DNA replication"))
    assert(first.getAs[String]("lang") === "en")
    assert(first.getAs[Boolean]("is_oa") === true)
    // abstract inversion reconstructs running text from the index (F21)
    val desc = first.getAs[String]("description")
    assert(desc.startsWith("Copy number variants"))
    assert(first.getAs[Long]("publication_epoch") > 0)
  }

  test("openalex: topic hierarchy flattens to 4 depths with parents (F34)") {
    val rows = asDf(fixture("open_alex_response.json"))
      .select(explode(SourceModels.parseOpenAlexWorks(col("body")))
        .as("work"))
      .select(explode(SourceModels.openAlexTopicRows(col("work")))
        .as("t")).select("t.*")
      .where(col("external_id").isNotNull)
    val depths = rows.select("external_depth_name").distinct()
      .collect().map(_.getString(0)).toSet
    assert(depths === Set("domain", "field", "subfield", "topic"))
    // every non-domain row points at its parent
    assert(rows.where(col("depth") > 0 &&
      col("directly_contained_in").isNull).count() === 0)
  }

  test("hal: first title, first-sentence description, T-split date (F23/F26)") {
    val docs = asDf(fixture("hal_test.json"))
      .select(explode(SourceModels.parseHalDocs(col("body"))).as("doc"))
      .select(SourceModels.halToDocument(col("doc")).as("d")).select("d.*")
    assert(docs.count() === 2)
    val first = docs.head()
    assert(first.getAs[String]("title").nonEmpty)
    val desc = first.getAs[String]("description")
    assert(desc.endsWith(".") &&
      desc.length < first.getAs[String]("full_content").length)
  }

  test("hal: version strip applies to uri (F19)") {
    val s = initSpark()
    import s.implicits._
    val doc = Seq(Tuple1("""{"response":{"numFound":1,"docs":[
      {"docid":"1","title_s":["T"],"abstract_s":["A. B."],
       "uri_s":"https://hal.science/hal-01057493v2",
       "language_s":["fr"],"authFullName_s":["X"],
       "producedDate_tdate":"2014-01-01T00:00:00Z"}]}}""")).toDF("body")
    val url = doc.select(explode(SourceModels.parseHalDocs(col("body")))
      .as("d"))
      .select(SourceModels.halToDocument(col("d")).getField("url"))
      .head().getString(0)
    assert(url === "https://hal.science/hal-01057493")
  }

  test("ted: transcript concat drops stage-direction cues (F24)") {
    val page = asDf(fixture("ted_page.json"))
      .select(SourceModels.parseTed(col("body")).as("page"))
    val doc = page.select(SourceModels.tedToDocument(col("page")).as("d"))
      .select("d.*").head()
    assert(doc.getAs[String]("title")
      === "You owe it to yourself to experience a total solar eclipse")
    assert(doc.getAs[Int]("duration_sec") === 727)
    val transcript = doc.getAs[String]("full_content")
    assert(transcript.nonEmpty)
    assert(!transcript.contains("(Music)"))
    assert(!transcript.contains("(Applause)"))
    assert(!transcript.contains("(Laughter)"))
  }

  test("wiki sections flatten recursively with blacklist (F25)") {
    val s = initSpark()
    import s.implicits._
    val json = """{"title":"","text":"intro text","sections":[
      {"title":"History","text":"history text","sections":[
        {"title":"Early","text":"early text","sections":[]}]},
      {"title":"References","text":"ref junk","sections":[
        {"title":"Deep","text":"hidden junk","sections":[]}]}]}"""
    val got = Seq(Tuple1(json)).toDF("j")
      .select(SourceModels.flattenWikiSections()(col("j")).as("t"))
      .head().getString(0)
    assert(got === "intro text\nhistory text\nearly text")
  }

  test("unparseable payload -> null struct (error-channel input, F30)") {
    val got = asDf("{broken json")
      .select(SourceModels.parseOpenAlexWorks(col("body")).as("works"))
      .head()
    assert(got.isNullAt(0))
  }

  test("pressbooks: html-stripped content, 3-sentence description (S14/F23)") {
    val s = initSpark()
    import s.implicits._
    val page = """{"content":{"raw":"r","protected":false,
      "rendered":"<p>One sentence. Two here! Three now? Four extra.</p>"}}"""
      .replaceAll("\n\\s*", "")
    val meta = """{"name":"My Book","datePublished":"2021-03-01",
      "license":{"url":"https://creativecommons.org/licenses/by/4.0/",
      "name":"CC BY"},"author":[{"name":"A. Writer","slug":"aw"}]}"""
      .replaceAll("\n\\s*", "")
    val doc = Seq((page, meta)).toDF("p", "m")
      .select(SourceModels.pressbooksToDocument(
        SourceModels.parsePressbooks(col("p")),
        SourceModels.parsePressbooksMetadata(col("m"))).as("d"))
      .select("d.*").head()
    assert(doc.getAs[String]("title") === "My Book")
    assert(doc.getAs[String]("full_content") ===
      "One sentence. Two here! Three now? Four extra.")
    assert(doc.getAs[String]("description") ===
      "One sentence. Two here! Three now?")
    assert(doc.getAs[String]("license_url").endsWith("by/4.0/"))
    assert(doc.getSeq[String](4) === Seq("A. Writer"))
  }

  test("oapen: TEXT bundle preferred, license from ORIGINAL code (S14)") {
    val s = initSpark()
    import s.implicits._
    val json = """{"name":"Open Book","handle":"20.500.12657/1234",
      "bitstreams":[
        {"bundleName":"ORIGINAL","retrieveLink":"/rest/bitstreams/9/retrieve",
         "code":"CC-BY-NC-4.0","mimeType":"application/pdf","sizeBytes":100},
        {"bundleName":"TEXT","retrieveLink":"/rest/bitstreams/7/retrieve",
         "code":null,"mimeType":"text/plain","sizeBytes":50}],
      "metadata":[
        {"key":"dc.description.abstract","value":"An abstract.","language":"en"},
        {"key":"dc.language","value":"English","language":null}]}"""
      .replaceAll("\n\\s*", "")
    val doc = Seq(Tuple1(json)).toDF("b")
      .select(SourceModels.oapenToDocument(
        SourceModels.parseOapen(col("b"))).as("d"))
      .select("d.*").head()
    assert(doc.getAs[String]("title") === "Open Book")
    assert(doc.getAs[String]("url").endsWith("/handle/20.500.12657/1234"))
    assert(doc.getAs[String]("description") === "An abstract.")
    assert(doc.getAs[String]("content_link") === "/rest/bitstreams/7/retrieve")
    assert(doc.getAs[String]("license_url") ===
      "https://creativecommons.org/licenses/by-nc-4.0/4.0/")
  }

  test("fao: dspace7 metadata map extraction, availability flag (S14)") {
    val s = initSpark()
    import s.implicits._
    val json = """{"id":"x","uuid":"u","name":"FAO Report",
      "handle":"h/99","inArchive":true,"withdrawn":false,
      "lastModified":"2023-01-01",
      "metadata":{
        "dc.description.abstract":[{"value":"Food systems."}],
        "dc.language.iso":[{"value":"en"}],
        "dc.rights.uri":[{"value":"https://creativecommons.org/licenses/by/3.0/igo/"}]}}"""
      .replaceAll("\n\\s*", "")
    val doc = Seq(Tuple1(json)).toDF("b")
      .select(SourceModels.faoToDocument(
        SourceModels.parseFao(col("b"))).as("d"))
      .select("d.*").head()
    assert(doc.getAs[String]("title") === "FAO Report")
    assert(doc.getAs[String]("description") === "Food systems.")
    assert(doc.getAs[String]("lang") === "en")
    assert(doc.getAs[Boolean]("is_available"))
  }

  test("uved: category titles, merged description+contexte (S14)") {
    val s = initSpark()
    import s.implicits._
    val json = """{"title":"Course","url":"https://uved.example/c1",
      "date":"2020-01-01","duration":360,
      "description":"About energy.","contexte":"For students.",
      "slug":"course","type":{"title":"video","uid":1},
      "categories":[{"title":"Climate","uid":2},{"title":"Energy","uid":3}],
      "keywords":[{"title":"solar","dewey":"333.79"}]}"""
      .replaceAll("\n\\s*", "")
    val doc = Seq(Tuple1(json)).toDF("b")
      .select(SourceModels.uvedToDocument(
        SourceModels.parseUved(col("b"))).as("d"))
      .select("d.*").head()
    assert(doc.getAs[String]("title") === "Course")
    assert(doc.getAs[String]("description") ===
      "About energy. For students.")
    assert(doc.getAs[Int]("duration_sec") === 360)
    assert(doc.getSeq[String](4) === Seq("Climate", "Energy"))
    assert(doc.getAs[String]("resource_type") === "video")
  }

  test("unesdoc: per-result explode, first-listed lang/year (S14)") {
    val s = initSpark()
    import s.implicits._
    val json = """{"total_count":2,"results":[
      {"url":"https://unesdoc.example/ark:/1","year":["2019"],
       "language":["eng","fre"],"title":"Report A","type":["book"],
       "description":"About oceans.","subject":["oceans"],
       "creator":"UNESCO","rights":"CC BY-SA 3.0 IGO"},
      {"url":"https://unesdoc.example/ark:/2","year":["2021"],
       "language":["fre"],"title":"Report B","type":["book"],
       "description":null,"subject":[],"creator":"UNESCO",
       "rights":"CC BY-SA 3.0 IGO"}]}""".replaceAll("\n\\s*", "")
    val docs = Seq(Tuple1(json)).toDF("b")
      .select(explode(SourceModels.parseUnesdoc(col("b"))
        .getField("results")).as("r"))
      .select(SourceModels.unesdocToDocument(col("r")).as("d"))
      .select("d.*").collect()
    assert(docs.length === 2)
    assert(docs(0).getAs[String]("lang") === "eng")
    assert(docs(1).getAs[String]("year") === "2021")
  }
}
