package graft.sources

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextClean

/** Attribute-targeted HTML article extraction (reference page scrapers:
  * plugins/scrapers/conversation.py:109-149 — BeautifulSoup lookups of
  * `<h1 itemprop="headline">`, `<meta property="og:description">`,
  * `<div itemprop="articleBody">`). BeautifulSoup's tree walk becomes a
  * balanced-tag scan UDF (a non-greedy regex would break on nested
  * same-name tags inside the article body); meta tags are self-closing
  * so a per-tag attribute parse suffices. Row-local, no shuffle. */
object HtmlArticle {

  private val AttrPat =
    Pattern.compile("([\\w:-]+)\\s*=\\s*\"([^\"]*)\"")

  private def attrsOf(tag: String): Map[String, String] = {
    val m = AttrPat.matcher(tag)
    val out = Map.newBuilder[String, String]
    while (m.find()) out += (m.group(1).toLowerCase -> m.group(2))
    out.result()
  }

  /** content attribute of the first meta tag whose property/name equals
    * `prop`. */
  def metaContentOf(html: String, prop: String): String = {
    if (html == null) return null
    val metas = Pattern.compile("(?is)<meta\\b[^>]*>").matcher(html)
    while (metas.find()) {
      val attrs = attrsOf(metas.group())
      if (attrs.get("property").contains(prop) ||
          attrs.get("name").contains(prop))
        return attrs.getOrElse("content", null)
    }
    null
  }

  /** Inner HTML of the first `<tag ... attr="value" ...>` element,
    * respecting nested same-name tags (balanced scan — BeautifulSoup
    * semantics, not non-greedy-regex semantics). */
  def elementByAttr(html: String, tag: String, attr: String,
      value: String): String = {
    if (html == null) return null
    val open = Pattern.compile(
      "(?is)<" + Pattern.quote(tag) + "\\b[^>]*>").matcher(html)
    while (open.find()) {
      if (attrsOf(open.group()).get(attr).contains(value)) {
        val bodyStart = open.end()
        val tokens = Pattern.compile(
          "(?is)<" + Pattern.quote(tag) + "\\b[^>]*>|</" +
            Pattern.quote(tag) + "\\s*>").matcher(html)
        var depth = 1
        var pos = bodyStart
        tokens.region(bodyStart, html.length)
        while (depth > 0 && tokens.find()) {
          if (tokens.group().startsWith("</")) {
            depth -= 1
            if (depth == 0) return html.substring(bodyStart, tokens.start())
          } else if (!tokens.group().endsWith("/>")) depth += 1
          pos = tokens.end()
        }
        return html.substring(bodyStart) // unterminated: rest of doc
      }
    }
    null
  }

  private val metaUdf = udf { (html: String, prop: String) =>
    metaContentOf(html, prop) }
  private val elementUdf = udf {
    (html: String, tag: String, attr: String, value: String) =>
      elementByAttr(html, tag, attr, value) }

  def metaContent(html: Column, prop: String): Column =
    metaUdf(html, lit(prop))

  def elementContent(html: Column, tag: String, attr: String,
      value: String): Column =
    elementUdf(html, lit(tag), lit(attr), lit(value))

  /** The Conversation scraper's document shape: headline h1,
    * og:description meta, articleBody div — cleaned like the reference
    * (tag strip + whitespace collapse). */
  def conversationDocument(html: Column): Column = struct(
    TextClean.normalizeWhitespace(TextClean.stripHtml(
      elementContent(html, "h1", "itemprop", "headline"))).as("title"),
    metaContent(html, "og:description").as("description"),
    TextClean.normalizeWhitespace(TextClean.stripHtml(
      elementContent(html, "div", "itemprop", "articleBody")))
      .as("full_content"))

  /** IRD le Mag' scraper (reference plugins/scrapers/ird_le_mag.py):
    * the article text lives in a drupal-settings JSON script tag under
    * speakeasy.content; title/description come from og: meta tags and
    * get the reference's correct_text_syntax repair chain
    * (ird_le_mag.py:137-147 — clean_text, clean_return_to_line, space
    * after closing sign, space before capital); the author is the
    * `<li class="info-item name">` text minus its "Auteur :" prefix
    * (:101-112); publication date parses the `<time class="datetime">`
    * datetime attr as UTC epoch seconds (:114-125). */
  def irdLeMagDocument(html: Column): Column = {
    def correctSyntax(c: Column): Column =
      TextClean.spaceBeforeCapital(TextClean.spaceAfterClosingSign(
        trim(TextClean.stripBacklines(
          TextClean.normalizeWhitespace(TextClean.stripHtml(c))))))
    val settingsJson = regexp_extract(html,
      "(?s)<script type=\"application/json\" " +
        "data-drupal-selector=\"drupal-settings-json\">(.*?)</script>", 1)
    val content = get_json_object(trim(settingsJson),
      "$.speakeasy.content")
    val authorRaw = TextClean.normalizeWhitespace(TextClean.stripHtml(
      elementContent(html, "li", "class", "info-item name")))
    val author = trim(regexp_replace(authorRaw, "^Auteur :", ""))
    val timeTag = regexp_extract(html,
      "(?is)<time\\b[^>]*class=\"datetime\"[^>]*>", 0)
    // Instant.parse, not to_timestamp with a quoted 'Z': the latter
    // parses in the SESSION timezone, silently shifting the epoch on
    // non-UTC sessions (the reference pins tzinfo=utc)
    val pubDate = isoZuluEpoch(
      regexp_extract(timeTag, "datetime=\"([^\"]*)\"", 1))
    struct(
      trim(TextClean.stripBacklines(metaContent(html, "og:title")))
        .as("title"),
      correctSyntax(metaContent(html, "og:description")).as("description"),
      correctSyntax(content).as("full_content"),
      author.as("author"),
      pubDate.as("publication_date"))
  }

  /** First meta tag whose name/property matches `name`
    * CASE-INSENSITIVELY (Dublin Core pages mix `DC.title`/`dc.title`;
    * the reference lowercases before matching,
    * notre_environnement.py:85-97). */
  def metaContentIgnoreCase(html: String, name: String): String = {
    if (html == null) return null
    val want = name.toLowerCase
    val metas = Pattern.compile("(?is)<meta\\b[^>]*>").matcher(html)
    while (metas.find()) {
      val attrs = attrsOf(metas.group())
      val key = attrs.get("name").orElse(attrs.get("property"))
      if (key.exists(_.toLowerCase == want))
        return attrs.getOrElse("content", null)
    }
    null
  }

  private val metaIcUdf = udf { (html: String, name: String) =>
    metaContentIgnoreCase(html, name) }

  /** "2026-02-26T13:55:01Z" -> UTC epoch seconds (null if unparseable).
    * Session-timezone-independent, unlike to_timestamp with a quoted
    * literal 'Z'. */
  private val isoZuluEpoch = udf { (s: String) =>
    if (s == null) null
    else try java.lang.Long.valueOf(java.time.Instant.parse(s).getEpochSecond)
    catch { case _: Exception => null.asInstanceOf[java.lang.Long] }
  }

  /** "2026-01-01" -> UTC midnight epoch seconds (null if unparseable). */
  private val isoDateEpoch = udf { (s: String) =>
    if (s == null) null
    else try java.lang.Long.valueOf(java.time.LocalDate.parse(s)
      .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond)
    catch { case _: Exception => null.asInstanceOf[java.lang.Long] }
  }

  /** notre-environnement.gouv.fr scraper (reference
    * plugins/scrapers/notre_environnement.py): metadata comes from
    * Dublin Core meta tags (description / dc.title / dc.date /
    * dc.data.modified, matched case-insensitively, :75-97); the title's
    * `~` separators become spaces (:98); dates parse as %Y-%m-%d UTC
    * epoch. The reference extracts full_content with trafilatura — a
    * generic article extractor we stand in for with the main/article
    * element's cleaned text (documented divergence; the DC metadata
    * semantics are reference-exact). */
  def notreEnvironnementDocument(html: Column): Column = {
    val mainText = udf { (h: String) =>
      if (h == null) null
      else PeerJ.findElement(h, "main", null, null, 0)
        .orElse(PeerJ.findElement(h, "article", null, null, 0))
        .orElse(PeerJ.findElement(h, "body", null, null, 0))
        .map(_.inner).orNull
    }
    // UTC-pinned parse — see isoDateEpoch (to_timestamp would read the
    // date in the session timezone)
    def dcDate(name: String): Column =
      isoDateEpoch(metaIcUdf(html, lit(name)))
    struct(
      regexp_replace(metaIcUdf(html, lit("dc.title")), "~", " ")
        .as("title"),
      metaIcUdf(html, lit("description")).as("description"),
      trim(TextClean.stripBacklines(TextClean.normalizeWhitespace(
        TextClean.stripHtml(mainText(html))))).as("full_content"),
      dcDate("dc.date").as("publication_date"),
      dcDate("dc.data.modified").as("update_date"))
  }
}
