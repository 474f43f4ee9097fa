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
}
