package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextClean

/** Schema-on-read models for the REST source payloads (SURVEY §1.3, F30:
  * the reference validates payloads with Pydantic models,
  * data/source_models; here each source gets a strict StructType +
  * `from_json` — rows that fail to parse carry a null struct and fall to
  * the error channel, reference's ValidationError path).
  *
  * Only the fields the reference actually extracts are modeled — the
  * parquet/JSON readers prune everything else (R2 column pruning).
  */
object SourceModels {

  // ---------- OpenAlex (reference plugins/rest_requesters/open_alex.py,
  // source_models/open_alex.py) ----------

  val openAlexWork: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("doi", StringType),
    StructField("title", StringType),
    StructField("language", StringType),
    StructField("publication_date", StringType),
    StructField("type", StringType),
    StructField("abstract_inverted_index",
      MapType(StringType, ArrayType(IntegerType))),
    StructField("open_access", StructType(Seq(
      StructField("is_oa", BooleanType),
      StructField("oa_status", StringType)))),
    StructField("best_oa_location", StructType(Seq(
      StructField("pdf_url", StringType),
      StructField("license", StringType),
      StructField("source", StructType(Seq(
        StructField("issn_l", StringType),
        StructField("host_organization_name", StringType),
        StructField("host_organization_lineage",
          ArrayType(StringType)))))))),
    StructField("authorships", ArrayType(StructType(Seq(
      StructField("author", StructType(Seq(
        StructField("display_name", StringType)))),
      StructField("raw_affiliation_strings", ArrayType(StringType)))))),
    StructField("topics", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("display_name", StringType),
      StructField("score", DoubleType),
      StructField("subfield", StructType(Seq(
        StructField("id", StringType),
        StructField("display_name", StringType)))),
      StructField("field", StructType(Seq(
        StructField("id", StringType),
        StructField("display_name", StringType)))),
      StructField("domain", StructType(Seq(
        StructField("id", StringType),
        StructField("display_name", StringType)))))))),
    StructField("referenced_works", ArrayType(StringType)),
    StructField("related_works", ArrayType(StringType))
  ))

  val openAlexPage: StructType = StructType(Seq(
    StructField("meta", StructType(Seq(
      StructField("count", LongType),
      StructField("next_cursor", StringType)))),
    StructField("results", ArrayType(openAlexWork))
  ))

  /** Page body -> one row per work (strict parse; unparseable page ->
    * zero rows with a non-null corrupt marker upstream if needed). */
  def parseOpenAlexWorks(pageBody: Column): Column =
    from_json(pageBody, openAlexPage).getField("results")

  /** Work struct -> flat document columns, reproducing the reference's
    * extraction: inverted-abstract inversion (F21), leading-boilerplate
    * strip (F22), OA predicate (P10), license (P8 input), publisher
    * lineage (P9 input), author names. */
  def openAlexToDocument(work: Column): Column = struct(
    work.getField("id").as("source_id"),
    TextClean.cleanDoi(work.getField("doi")).as("doi"),
    work.getField("title").as("title"),
    work.getField("language").as("lang"),
    TextClean.stripLeadingBoilerplate(
      TextClean.invertAbstractIndex(
        work.getField("abstract_inverted_index"))).as("description"),
    work.getField("open_access").getField("is_oa").as("is_oa"),
    work.getField("best_oa_location").getField("license").as("license"),
    work.getField("best_oa_location").getField("pdf_url").as("pdf_url"),
    work.getField("best_oa_location").getField("source")
      .getField("host_organization_lineage").as("publisher_lineage"),
    transform(work.getField("authorships"),
      a => a.getField("author").getField("display_name")).as("authors"),
    to_timestamp(work.getField("publication_date"), "yyyy-MM-dd")
      .cast("long").as("publication_epoch"),
    work.getField("referenced_works").as("referenced_works"),
    work.getField("related_works").as("related_works")
  )

  /** Topic-hierarchy flatten with per-level external ids (reference F34:
    * open_alex.py:99-142 — domain/field/subfield/topic rows with parent
    * links; global dedup happens downstream with dropDuplicates). */
  def openAlexTopicRows(work: Column): Column = {
    val t = work.getField("topics")
    flatten(transform(t, topic => array(
      struct(topic.getField("domain").getField("id").as("external_id"),
        topic.getField("domain").getField("display_name").as("name"),
        lit(0).as("depth"), lit("domain").as("external_depth_name"),
        lit(null).cast("string").as("directly_contained_in")),
      struct(topic.getField("field").getField("id").as("external_id"),
        topic.getField("field").getField("display_name").as("name"),
        lit(1).as("depth"), lit("field").as("external_depth_name"),
        topic.getField("domain").getField("id")
          .as("directly_contained_in")),
      struct(topic.getField("subfield").getField("id").as("external_id"),
        topic.getField("subfield").getField("display_name").as("name"),
        lit(2).as("depth"), lit("subfield").as("external_depth_name"),
        topic.getField("field").getField("id").as("directly_contained_in")),
      struct(topic.getField("id").as("external_id"),
        topic.getField("display_name").as("name"),
        lit(3).as("depth"), lit("topic").as("external_depth_name"),
        topic.getField("subfield").getField("id")
          .as("directly_contained_in"))
    )))
  }

  // ---------- HAL (reference plugins/rest_requesters/hal.py,
  // source_models/hal.py) ----------

  val halDoc: StructType = StructType(Seq(
    StructField("docid", StringType),
    StructField("halId_s", StringType),
    StructField("title_s", ArrayType(StringType)),
    StructField("abstract_s", ArrayType(StringType)),
    StructField("licence_s", StringType),
    StructField("fileMain_s", StringType),
    StructField("docType_s", StringType),
    StructField("publicationDate_tdate", StringType),
    StructField("producedDate_tdate", StringType),
    StructField("authFullName_s", ArrayType(StringType)),
    StructField("uri_s", StringType),
    StructField("language_s", ArrayType(StringType))
  ))

  val halResponse: StructType = StructType(Seq(
    StructField("response", StructType(Seq(
      StructField("numFound", LongType),
      StructField("docs", ArrayType(halDoc)))))
  ))

  def parseHalDocs(body: Column): Column =
    from_json(body, halResponse).getField("response").getField("docs")

  /** HAL doc struct -> flat document: first title, first-sentence
    * description (F23), version-stripped uri (F19), T-split UTC date to
    * epoch (F26: hal.py:86-100). */
  def halToDocument(doc: Column): Column = struct(
    doc.getField("docid").as("source_id"),
    element_at(doc.getField("title_s"), 1).as("title"),
    TextClean.firstSentence(
      element_at(doc.getField("abstract_s"), 1)).as("description"),
    element_at(doc.getField("abstract_s"), 1).as("full_content"),
    doc.getField("licence_s").as("license"),
    doc.getField("fileMain_s").as("pdf_url"),
    TextClean.stripHalVersion(doc.getField("uri_s")).as("url"),
    element_at(doc.getField("language_s"), 1).as("lang"),
    transform(doc.getField("authFullName_s"),
      a => struct(a.as("name"), lit("").as("misc"))).as("authors"),
    to_timestamp(
      element_at(split(doc.getField("producedDate_tdate"), "T"), 1),
      "yyyy-MM-dd").cast("long").as("produced_epoch")
  )

  // ---------- TED (reference plugins/rest_requesters/ted.py,
  // source_models/ted.py) ----------

  val tedPage: StructType = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("video", StructType(Seq(
        StructField("description", StringType),
        StructField("internalLanguageCode", StringType),
        StructField("presenterDisplayName", StringType),
        StructField("duration", IntegerType),
        StructField("title", StringType),
        StructField("publishedAt", StringType),
        StructField("canonicalUrl", StringType),
        StructField("type", StructType(Seq(
          StructField("name", StringType))))))),
      StructField("translation", StructType(Seq(
        StructField("paragraphs", ArrayType(StructType(Seq(
          StructField("cues", ArrayType(StructType(Seq(
            StructField("text", StringType)))))))))))))))
  ))

  def parseTed(body: Column): Column = from_json(body, tedPage)

  /** Transcript concat with prohibited-cue filter (reference F24:
    * ted.py:23,68-85 — stage directions like "(Music)"/"(Applause)" are
    * dropped before the join). */
  def tedTranscript(page: Column): Column = {
    val paragraphs = page.getField("data").getField("translation")
      .getField("paragraphs")
    val texts = flatten(transform(paragraphs,
      p => transform(p.getField("cues"), c => c.getField("text"))))
    val kept = filter(texts,
      t => !t.rlike("^\\s*\\([A-Za-z ]+\\)\\s*$"))
    TextClean.normalizeWhitespace(concat_ws(" ", kept))
  }

  def tedToDocument(page: Column): Column = {
    val v = page.getField("data").getField("video")
    struct(
      v.getField("canonicalUrl").as("url"),
      v.getField("title").as("title"),
      v.getField("internalLanguageCode").as("lang"),
      v.getField("description").as("description"),
      tedTranscript(page).as("full_content"),
      v.getField("duration").as("duration_sec"),
      v.getField("presenterDisplayName").as("presenter"),
      v.getField("type").getField("name").as("talk_type"),
      to_timestamp(v.getField("publishedAt"),
        "yyyy-MM-dd'T'HH:mm:ss'Z'").cast("long").as("published_epoch"))
  }

  // ---------- Wikipedia section flatten (reference F25:
  // plugins/rest_requesters/wikipedia.py:16-57 — recursive section walk
  // with per-language blacklist) ----------

  val defaultSectionBlacklist: Set[String] = Set(
    "references", "external links", "see also", "notes", "bibliography",
    "further reading", "sources", "références", "voir aussi",
    "liens externes", "notes et références", "bibliographie", "annexes")

  /** Recursive flatten of a wiki sections JSON tree (arbitrary depth —
    * a UDF over the parsed JSON, since static schemas can't recurse).
    * Node shape: {"title": ..., "text": ..., "sections": [...]}. */
  def flattenWikiSections(blacklist: Set[String] = defaultSectionBlacklist)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (json: String) =>
      import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
      val mapper = new ObjectMapper()
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      def walk(node: JsonNode): Unit = {
        if (node == null) return
        if (node.isArray) { node.elements().forEachRemaining(walk(_)) }
        else if (node.isObject) {
          val title = Option(node.get("title")).map(_.asText("")).getOrElse("")
          if (!blacklist.contains(title.toLowerCase.trim)) {
            Option(node.get("text")).foreach(t => if (t.isTextual &&
              t.asText().nonEmpty) out += t.asText())
            walk(node.get("sections"))
          }
        }
      }
      try { walk(mapper.readTree(json)); out.mkString("\n") }
      catch { case _: Exception => "" }
    }

  // ---------- Pressbooks (reference source_models/pressbooks.py +
  // plugins/rest_requesters/pressbooks.py) ----------

  val pressbooksPage: StructType = StructType(Seq(
    StructField("content", StructType(Seq(
      StructField("raw", StringType),
      StructField("rendered", StringType),
      StructField("protected", BooleanType))))
  ))

  val pressbooksMetadata: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("datePublished", StringType),
    StructField("license", StructType(Seq(
      StructField("url", StringType),
      StructField("name", StringType)))),
    StructField("author", ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("slug", StringType)))))
  ))

  def parsePressbooks(body: Column): Column = from_json(body, pressbooksPage)
  def parsePressbooksMetadata(body: Column): Column =
    from_json(body, pressbooksMetadata)

  /** Pressbooks extraction: HTML-stripped rendered content, description
    * = first three sentences (reference
    * pressbooks.py:_extract_three_first_sentences — spaCy there, the
    * F23 sentence-split spec here), license URL from metadata. */
  def pressbooksToDocument(page: Column, meta: Column): Column = {
    val content = TextClean.normalizeWhitespace(
      TextClean.stripHtml(page.getField("content").getField("rendered")))
    struct(
      meta.getField("name").as("title"),
      content.as("full_content"),
      TextClean.firstSentences(content, 3).as("description"),
      meta.getField("license").getField("url").as("license_url"),
      transform(coalesce(meta.getField("author"),
          array().cast(ArrayType(StructType(Seq(
            StructField("name", StringType),
            StructField("slug", StringType)))))),
        a => a.getField("name")).as("authors"),
      meta.getField("datePublished").as("date_published"))
  }

  // ---------- OAPen (reference source_models/oapen.py — DSpace 6 item
  // with key/value metadata list and bundle bitstreams) ----------

  val oapenItem: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("handle", StringType),
    StructField("bitstreams", ArrayType(StructType(Seq(
      StructField("bundleName", StringType),
      StructField("retrieveLink", StringType),
      StructField("code", StringType),
      StructField("mimeType", StringType),
      StructField("sizeBytes", LongType))))),
    StructField("metadata", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", StringType),
      StructField("language", StringType)))))
  ))

  def parseOapen(body: Column): Column = from_json(body, oapenItem)

  /** All values of one metadata key (the reference folds the key/value
    * list into a dict, oapen.py:_format_metadata). */
  def oapenMetadataValues(item: Column, key: String): Column =
    transform(
      filter(item.getField("metadata"), m => m.getField("key") === key),
      m => m.getField("value"))

  /** Content link preference: TEXT bundle wins over ORIGINAL (reference
    * oapen.py:157-180 — is_txt switches the retrieval path). */
  def oapenContentLink(item: Column): Column = {
    val txt = filter(item.getField("bitstreams"),
      b => lower(b.getField("bundleName")) === "text")
    val orig = filter(item.getField("bitstreams"),
      b => lower(b.getField("bundleName")) === "original")
    coalesce(element_at(txt, 1).getField("retrieveLink"),
      element_at(orig, 1).getField("retrieveLink"))
  }

  /** License canonicalization from the ORIGINAL bundle's code:
    * CC-BY-4.0 -> https://creativecommons.org/licenses/by-4.0/4.0/
    * shape (reference oapen.py:162-174). */
  def oapenLicenseUrl(item: Column): Column = {
    val orig = filter(item.getField("bitstreams"),
      b => lower(b.getField("bundleName")) === "original")
    val code = regexp_replace(
      lower(element_at(orig, 1).getField("code")), "^cc-", "")
    concat(lit("https://creativecommons.org/licenses/"), code, lit("/4.0/"))
  }

  def oapenToDocument(item: Column): Column = struct(
    item.getField("name").as("title"),
    concat(lit("https://library.oapen.org/handle/"),
      item.getField("handle")).as("url"),
    element_at(oapenMetadataValues(item, "dc.description.abstract"), 1)
      .as("description"),
    element_at(oapenMetadataValues(item, "dc.language"), 1).as("lang"),
    oapenContentLink(item).as("content_link"),
    oapenLicenseUrl(item).as("license_url"))

  // ---------- FAO Open Knowledge (reference
  // source_models/fao_open_knowledge.py — DSpace 7 item, metadata as a
  // map of key -> [{value}] ) ----------

  val faoItem: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("uuid", StringType),
    StructField("name", StringType),
    StructField("handle", StringType),
    StructField("inArchive", BooleanType),
    StructField("withdrawn", BooleanType),
    StructField("lastModified", StringType),
    StructField("metadata", MapType(StringType, ArrayType(StructType(Seq(
      StructField("value", StringType))))))
  ))

  def parseFao(body: Column): Column = from_json(body, faoItem)

  /** First value of a DSpace-7 metadata key. */
  def faoMetadataFirst(item: Column, key: String): Column =
    element_at(element_at(item.getField("metadata"), key), 1)
      .getField("value")

  def faoToDocument(item: Column): Column = struct(
    item.getField("name").as("title"),
    concat(lit("https://openknowledge.fao.org/handle/"),
      item.getField("handle")).as("url"),
    faoMetadataFirst(item, "dc.description.abstract").as("description"),
    faoMetadataFirst(item, "dc.language.iso").as("lang"),
    faoMetadataFirst(item, "dc.rights.uri").as("license_url"),
    (item.getField("inArchive") && !item.getField("withdrawn"))
      .as("is_available"))

  // ---------- UVED (reference source_models/uved.py — category tree
  // with parent links, duration, keyword dewey codes) ----------

  val uvedMember: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("url", StringType),
    StructField("date", StringType),
    StructField("duration", IntegerType),
    StructField("description", StringType),
    StructField("contexte", StringType),
    StructField("slug", StringType),
    StructField("type", StructType(Seq(
      StructField("title", StringType),
      StructField("uid", IntegerType)))),
    StructField("categories", ArrayType(StructType(Seq(
      StructField("title", StringType),
      StructField("uid", IntegerType))))),
    StructField("keywords", ArrayType(StructType(Seq(
      StructField("title", StringType),
      StructField("dewey", StringType)))))
  ))

  def parseUved(body: Column): Column = from_json(body, uvedMember)

  def uvedToDocument(item: Column): Column = struct(
    item.getField("title").as("title"),
    item.getField("url").as("url"),
    TextClean.normalizeWhitespace(concat_ws(" ",
      item.getField("description"),
      coalesce(item.getField("contexte"), lit("")))).as("description"),
    item.getField("duration").as("duration_sec"),
    transform(coalesce(item.getField("categories"),
        array().cast(ArrayType(StructType(Seq(
          StructField("title", StringType),
          StructField("uid", IntegerType)))))),
      c => c.getField("title")).as("categories"),
    item.getField("type").getField("title").as("resource_type"))

  // ---------- UNESDOC (reference source_models/unesdoc.py — ark-id
  // records with list-valued year/language fields) ----------

  val unesdocRoot: StructType = StructType(Seq(
    StructField("total_count", IntegerType),
    StructField("results", ArrayType(StructType(Seq(
      StructField("url", StringType),
      StructField("year", ArrayType(StringType)),
      StructField("language", ArrayType(StringType)),
      StructField("title", StringType),
      StructField("type", ArrayType(StringType)),
      StructField("description", StringType),
      StructField("subject", ArrayType(StringType)),
      StructField("creator", StringType),
      StructField("rights", StringType)))))
  ))

  def parseUnesdoc(body: Column): Column = from_json(body, unesdocRoot)

  /** One document struct per result row (explode upstream). */
  def unesdocToDocument(result: Column): Column = struct(
    result.getField("title").as("title"),
    result.getField("url").as("url"),
    result.getField("description").as("description"),
    element_at(result.getField("language"), 1).as("lang"),
    element_at(result.getField("year"), 1).as("year"),
    result.getField("creator").as("creator"),
    result.getField("rights").as("license"),
    result.getField("subject").as("subjects"))
}
