package graft.sources

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextClean

/** PeerJ article scraper (reference plugins/scrapers/peerj.py):
  *
  *  - full_content: the `<main>` element with supplemental sections
  *    dropped, every `<figure>` containing a table rewritten as
  *    "Title: header: cell, header: cell." sentences
  *    (_figure_to_paragraph, :110-186), then headings/tables dropped and
  *    the text flattened (BeautifulSoup-tight) with backlines removed;
  *  - title: `<h1 class="article-title">` text (:224-229);
  *  - description: `<meta name="description">` (:231-236);
  *  - details: the `citation_*` meta tags — authors paired with their
  *    following citation_author_institution tags (stateful cursor,
  *    :48-108), keywords split on ";", journal/issn/doi/publisher,
  *    citation_date (%Y-%m-%d) as UTC epoch;
  *  - license: `<span class="license-p"><a href=…>` checked against the
  *    CC allow-list (:30-46, P8).
  *
  * The DOM-lite pass is a row-local UDF (one pass per page, no shuffle —
  * scrape parsing scales linearly with pages exactly like the
  * reference's per-pod loop, minus the pod).
  */
object PeerJ {

  // ---- DOM-lite: balanced element spans over the raw HTML ----

  private[sources] case class Span(start: Int, end: Int, inner: String)

  /** First `<tag ...>` element at-or-after `from` whose `attr` contains
    * `value` as a whitespace-separated token (or any, when attr null),
    * with its balanced extent. */
  private[sources] def findElement(html: String, tag: String, attr: String,
      value: String, from: Int): Option[Span] = {
    val open = Pattern.compile(
      "(?is)<" + Pattern.quote(tag) + "\\b[^>]*>").matcher(html)
    var searchFrom = from
    while (open.find(searchFrom)) {
      val tagText = open.group()
      val matches = attr == null || {
        val m = Pattern.compile(
          "(?i)" + Pattern.quote(attr) + "\\s*=\\s*\"([^\"]*)\"")
          .matcher(tagText)
        m.find() && m.group(1).split("\\s+").contains(value)
      }
      if (matches) {
        if (tagText.endsWith("/>"))
          return Some(Span(open.start(), open.end(), ""))
        val bodyStart = open.end()
        val tokens = Pattern.compile(
          "(?is)<" + Pattern.quote(tag) + "\\b[^>]*>|</" +
            Pattern.quote(tag) + "\\s*>").matcher(html)
        tokens.region(bodyStart, html.length)
        var depth = 1
        while (depth > 0 && tokens.find()) {
          if (tokens.group().startsWith("</")) {
            depth -= 1
            if (depth == 0) return Some(Span(open.start(), tokens.end(),
              html.substring(bodyStart, tokens.start())))
          } else if (!tokens.group().endsWith("/>")) depth += 1
        }
        return Some(Span(open.start(), html.length,
          html.substring(bodyStart)))
      }
      searchFrom = open.end()
    }
    None
  }

  private def removeElements(html: String, tag: String, attr: String,
      value: String): String = {
    val sb = new StringBuilder(html)
    var found = findElement(sb.toString, tag, attr, value, 0)
    while (found.isDefined) {
      val s = found.get
      sb.delete(s.start, s.end)
      found = findElement(sb.toString, tag, attr, value, s.start)
    }
    sb.toString
  }

  private def allInner(html: String, tag: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    var found = findElement(html, tag, null, null, pos)
    while (found.isDefined) {
      out += found.get.inner
      pos = found.get.end
      found = findElement(html, tag, null, null, pos)
    }
    out.result()
  }

  private def tightText(html: String): String = {
    val noTags = html.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", "")
      .replaceAll("(?s)<[^>]+>", "")
    // shared table; &amp; sits last so nested entities don't
    // double-unescape
    TextClean.htmlEntities
      .foldLeft(noTags) { case (t, (e, r)) => t.replace(e, r) }
  }

  /** reference _delete_start_or_end_of_sentences_markers: strip
    * `.,!? \n\t` from both ends. */
  private def stripMarkers(s: String): String = {
    val bad = ".,!? \n\t"
    var a = 0; var b = s.length
    while (a < b && bad.indexOf(s.charAt(a)) >= 0) a += 1
    while (b > a && bad.indexOf(s.charAt(b - 1)) >= 0) b -= 1
    s.substring(a, b)
  }

  /** reference _figure_to_paragraph (:136-186): a figure whose table has
    * headers and data rows becomes per-row "Title: h: v, h: v." lines;
    * anything else vanishes (decompose). */
  private def figureToParagraph(fig: String): String = {
    val title = findElement(fig, "div", "class", "title", 0)
      .map(s => tightText(s.inner)).getOrElse("")
    val rows = allInner(fig, "tr")
    if (rows.isEmpty) return ""
    val headers = allInner(rows.head, "th").map(h => stripMarkers(tightText(h)))
    if (headers.isEmpty) return ""
    val data = rows.tail.map(r =>
      allInner(r, "td").map(c => stripMarkers(tightText(c))))
    if (data.isEmpty || data.exists(_.length < headers.length)) return ""
    val titleClean = stripMarkers(title)
    data.map { row =>
      val pairs = headers.zipWithIndex
        .map { case (h, i) => s"$h: ${row(i)}" }.mkString(", ")
      s"$titleClean: $pairs.\n"
    }.mkString
  }

  private[sources] def extractContent(html: String): String = {
    if (html == null) return null
    val mainEl = findElement(html, "main", null, null, 0)
    if (mainEl.isEmpty) return null
    var dom = mainEl.get.inner
    Seq("supplemental-information", "supplementary-material").foreach {
      id => dom = removeElements(dom, "section", "id", id)
    }
    // replace figures with their table sentences
    val sb = new StringBuilder(dom)
    var fig = findElement(sb.toString, "figure", null, null, 0)
    while (fig.isDefined) {
      val s = fig.get
      val para = figureToParagraph(
        sb.substring(s.start, s.end))
      sb.replace(s.start, s.end, para)
      fig = findElement(sb.toString, "figure", null, null,
        s.start + para.length)
    }
    dom = sb.toString
    Seq("h1", "h2", "h3", "h4", "h5", "h6", "table").foreach { t =>
      dom = removeElements(dom, t, null, null)
    }
    // clean_return_to_line on the flattened text
    tightText(dom).replaceAll("[\\n\\t\\r]", "").trim
  }

  private val contentUdf = udf { (html: String) => extractContent(html) }

  def fullContent(html: Column): Column = contentUdf(html)

  // ---- citation_* meta details (stateful author/institution cursor) ----

  case class Author(name: String, misc: String)
  case class CitationDetails(authors: Seq[Author], tags: Seq[String],
      journal: String, issn: String, doi: String, publisher: String,
      publication_date: Option[Long])

  private val MetaPat = Pattern.compile("(?is)<meta\\b[^>]*>")
  private val AttrPat = Pattern.compile("([\\w:-]+)\\s*=\\s*\"([^\"]*)\"")

  private[sources] def extractCitation(html: String): CitationDetails = {
    if (html == null) return CitationDetails(Seq.empty, Seq.empty,
      null, null, null, null, None)
    val authors = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[String]]
    var cursor: String = null
    var tags = Seq.empty[String]
    var journal: String = null; var issn: String = null
    var doi: String = null; var publisher: String = null
    var pubDate: Option[Long] = None
    val m = MetaPat.matcher(html)
    while (m.find()) {
      val attrs = {
        val a = AttrPat.matcher(m.group())
        val b = Map.newBuilder[String, String]
        while (a.find()) b += (a.group(1).toLowerCase -> a.group(2))
        b.result()
      }
      val content = attrs.getOrElse("content", null)
      attrs.get("name") match {
        case Some("citation_author") if content != null =>
          cursor = content
          authors.getOrElseUpdate(content, Vector.empty)
        case Some("citation_author_institution")
            if content != null && cursor != null =>
          authors(cursor) = authors(cursor) :+ content
        case Some("citation_keywords") if content != null =>
          tags = content.split(";").map(_.trim).toSeq
        case Some("citation_journal_title") => journal = content
        case Some("citation_issn") => issn = content
        case Some("citation_doi") => doi = content
        case Some("citation_publisher") => publisher = content
        case Some("citation_date") if content != null =>
          pubDate = try {
            Some(java.time.LocalDate.parse(content)
              .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond)
          } catch { case _: Exception => None }
        case _ => ()
      }
    }
    CitationDetails(
      authors.map { case (n, insts) =>
        Author(n, insts.mkString(", ")) }.toSeq,
      tags, journal, issn, doi, publisher, pubDate)
  }

  private val citationUdf = udf { (html: String) => extractCitation(html) }

  def citationDetails(html: Column): Column = citationUdf(html)

  // ---- license (span.license-p > a[href] vs CC allow-list) ----

  private val licenseUdf = udf { (html: String) =>
    if (html == null) null
    else findElement(html, "span", "class", "license-p", 0)
      .flatMap { s =>
        val a = Pattern.compile("(?is)<a\\b[^>]*href=\"([^\"]*)\"")
          .matcher(s.inner)
        if (a.find()) Some(a.group(1)) else None
      }.orNull
  }

  def licenseUrl(html: Column): Column = licenseUdf(html)

  def licenseAuthorized(html: Column): Column =
    coalesce(licenseUrl(html)
      .isin(Mets.authorizedLicenseUrls.map(x => x: Any): _*), lit(false))

  /** The scraped document struct (title whitespace-collapsed — the
    * reference keeps raw .text.strip(); collapsing is our single
    * documented divergence, titles render identically). */
  def peerjDocument(html: Column): Column = {
    val cite = citationDetails(html)
    struct(
      TextClean.normalizeWhitespace(TextClean.stripHtmlTight(
        HtmlArticle.elementContent(html, "h1", "class", "article-title")))
        .as("title"),
      HtmlArticle.metaContent(html, "description").as("description"),
      fullContent(html).as("full_content"),
      cite.getField("doi").as("external_id"),
      licenseUrl(html).as("license_url"),
      licenseAuthorized(html).as("license_authorized"),
      cite.getField("authors").as("authors"),
      cite.getField("tags").as("tags"),
      cite.getField("journal").as("journal"),
      cite.getField("issn").as("issn"),
      cite.getField("publisher").as("publisher"),
      cite.getField("publication_date").as("publication_date"))
  }
}

/** UNCC:eLearn course-page details (reference
  * plugins/scrapers/unccelearn.py:88-118 `_get_details` — the PDF
  * content/Tika paths are environment-stubbed like S15, but the course
  * panel extraction and duration arithmetic are reference-exact):
  * `div.details` holds p.thematic-areas / p.time / p.certification /
  * p.type; durations like "3 hours", "3,5 hours", "3-4 hours" become
  * seconds (range = midpoint, :65-87). */
object Unccelearn {

  /** reference _convert_duration_to_seconds: strip "hours", comma
    * decimal, "-" range midpoint, hours * 3600. Null on unparseable. */
  private[graft] def courseDurationSeconds(s: String): Option[Int] = {
    if (s == null) return None
    val d = s.replace("hours", "").trim.replace(",", ".")
    try {
      val hours =
        if (d.contains("-")) {
          val parts = d.split("-")
          (parts(0).trim.toDouble + parts(1).trim.toDouble) / 2
        } else d.toDouble
      Some((hours * 3600).toInt)
    } catch { case _: Exception => None }
  }

  private def pText(details: String, cls: String): Option[String] =
    PeerJ.findElement(details, "p", "class", cls, 0)
      .map(s => s.inner.replaceAll("(?s)<[^>]+>", "").trim)
      .filter(_.nonEmpty)

  case class CourseDetails(theme: String, duration: Option[Int],
      certifying: Option[Boolean], course_type: String)

  private[sources] def extractDetails(html: String): CourseDetails = {
    val panel = if (html == null) None
      else PeerJ.findElement(html, "div", "class", "details", 0)
    panel match {
      case None => CourseDetails(null, None, None, null)
      case Some(p) =>
        CourseDetails(
          pText(p.inner, "thematic-areas").map(_.toLowerCase).orNull,
          pText(p.inner, "time").flatMap(courseDurationSeconds),
          pText(p.inner, "certification")
            .map(_.toLowerCase.startsWith("with certification")),
          pText(p.inner, "type").map(_.toLowerCase).orNull)
    }
  }

  private val detailsUdf = udf { (html: String) => extractDetails(html) }

  def courseDetails(html: Column): Column = detailsUdf(html)
}
