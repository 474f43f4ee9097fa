package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.RestCursor.Transport

/** Wikipedia category scan (reference S11:
  * collectors/wikipedia_collector.py:41-111): walk categorymembers with
  * `cmcontinue` pagination, descend into subcategories breadth-first
  * with a depth budget, collect page titles; de-dup across the whole
  * traversal (reference U2 set union).
  *
  * The BFS frontier is inherently sequential per category (cursor +
  * parent-child discovery), so like the reference it runs driver-side;
  * results land in a DataFrame and the expensive per-page work
  * (fetch/extract, S12 langlink batches) is distributed downstream.
  * `maxPagesPerCategory` bounds runaway categories (reference O9 cap
  * semantics).
  */
object WikiCategoryScan {

  /** One categorymembers response page, already parsed: member titles
    * (ns=0 pages), subcategory titles (ns=14), continuation token. */
  case class MemberPage(pages: Seq[String], subcategories: Seq[String],
      continueToken: Option[String])

  type Parser = String => MemberPage

  def memberUrl(apiBase: String, category: String,
      continueToken: Option[String], sinceIso: Option[String] = None)
      : String = {
    val cont = continueToken.map(t => s"&cmcontinue=$t").getOrElse("")
    // lookback window (reference wikipedia_collector.py:44-64: cmstart =
    // now - 10 days, timestamp-sorted ascending — incremental discovery
    // of recently-added members only)
    val since = sinceIso
      .map(t => s"&cmsort=timestamp&cmdir=newer&cmstart=$t")
      .getOrElse("")
    s"$apiBase?action=query&list=categorymembers&cmtitle=$category" +
      s"&cmlimit=500&format=json$cont$since"
  }

  /** BFS with depth budget. Returns (page_title, found_via_category,
    * depth) rows. */
  def scan(spark: SparkSession, transport: Transport, apiBase: String,
      rootCategory: String, maxDepth: Int, parse: Parser,
      maxPagesPerCategory: Int = 100,
      sinceIso: Option[String] = None): DataFrame = {
    import spark.implicits._
    val seenPages = mutable.LinkedHashSet.empty[(String, String, Int)]
    val seenCategories = mutable.Set(rootCategory)
    var frontier = List((rootCategory, 0))
    while (frontier.nonEmpty) {
      val (category, depth) = frontier.head
      frontier = frontier.tail
      var cont: Option[String] = None
      var pagesFetched = 0
      var done = false
      while (!done && pagesFetched < maxPagesPerCategory) {
        val body = transport.get(
          memberUrl(apiBase, category, cont, sinceIso))
        val page = parse(body)
        pagesFetched += 1
        page.pages.foreach(p => seenPages += ((p, category, depth)))
        if (depth < maxDepth) {
          page.subcategories.filter(seenCategories.add).foreach { sub =>
            frontier = frontier :+ ((sub, depth + 1))
          }
        }
        cont = page.continueToken
        done = cont.isEmpty
      }
    }
    seenPages.toSeq.toDF("page_title", "category", "depth")
  }

  /** Default parser for the MediaWiki JSON shape. */
  val mediaWikiParser: Parser = { body =>
    import com.fasterxml.jackson.databind.ObjectMapper
    val root = new ObjectMapper().readTree(body)
    val members = Option(root.at("/query/categorymembers"))
      .filter(_.isArray).map(_.elements())
    val pages = mutable.ArrayBuffer.empty[String]
    val subs = mutable.ArrayBuffer.empty[String]
    members.foreach(_.forEachRemaining { m =>
      val title = Option(m.get("title")).map(_.asText("")).getOrElse("")
      val ns = Option(m.get("ns")).map(_.asInt(0)).getOrElse(0)
      if (ns == 14) subs += title else if (title.nonEmpty) pages += title
    })
    val contNode = root.at("/continue/cmcontinue")
    MemberPage(pages.toSeq, subs.toSeq,
      if (contNode.isMissingNode || contNode.isNull) None
      else Some(contNode.asText()))
  }
}
