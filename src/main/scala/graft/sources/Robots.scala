package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309) — the governance side of crawl
  * ingestion: a corpus pipeline that reads WARC segments it crawled
  * itself needs the frontier filtered by each host's robots rules,
  * and the evaluation must match what the crawler did or recrawl
  * deltas lie.
  *
  * Semantics:
  *   - group selection: the group whose user-agent token is the
  *     LONGEST case-insensitive SUBSTRING of the crawler's product
  *     token — the deployed-crawler convention (Googlebot et al.);
  *     RFC-strict exact token equality differs for hyphenated tokens
  *     and is stricter than any major crawler actually is. Groups for
  *     `*` apply when no specific group matches; multiple groups for
  *     the same agent merge; empty user-agent values are ignored as
  *     malformed (they would otherwise substring-match everything);
  *   - rule matching (RFC 9309 §2.2.2): the longest-matching rule
  *     wins (octet count of the pattern); on equal length, Allow wins;
  *   - patterns: `*` matches any char sequence, `$` anchors the end;
  *     both pattern and path+query are PERCENT-DECODED before
  *     comparison (the RFC's encoding normalization);
  *   - no matching rule, no group, or an EMPTY Disallow => allowed;
  *     hosts are compared case-folded (DNS is case-insensitive).
  *
  * Plan shape: the frontier LEFT-joins the robots dimension on the
  * case-folded host with NO driver-side collect — Spark broadcasts the
  * dim while it is small and falls back to a hash-partitioned join at
  * web scale (one dim row per host ≈ tens of millions of rows, which a
  * collect-and-broadcast would OOM the driver on). Rule compilation
  * happens executor-side behind a per-JVM cache keyed by
  * (host, user-agent, bodies-hash), so a hot host's bodies parse once
  * per executor and the match itself stays row-local. */
object Robots {

  final case class Rule(allow: Boolean, pattern: String) {
    /** decoded once at compile time; precedence length stays the
      * ORIGINAL pattern's octet count (the RFC measures the rule as
      * written) */
    private val decoded = Robots.percentDecode(pattern)
    def matches(path: String): Boolean = Robots.globMatch(decoded, path)
  }

  /** %XX normalization for encoding-normalized comparison (RFC 9309
    * §2.2.2 via RFC 3986 §6.2.2): decodes UTF-8 text octets (>= 0x80)
    * and non-reserved ASCII, but KEEPS reserved-range octets encoded —
    * decoding %2F would conflate an encoded slash with a path
    * separator, so a rule like `Disallow: /a/b$` would also block the
    * distinct resource /a%2Fb. Kept escapes are hex-UPPERCASED so
    * pattern and path agree regardless of source hex case. Keeping
    * %24 (`$`) and %2A (`*`) encoded also prevents decoding from
    * SYNTHESIZING glob metacharacters out of literal data. '+' is NOT
    * a space in paths; malformed escapes (including non-ASCII "hex
    * digits") pass through. One scanner for the whole engine:
    * [[graft.operators.UrlChecker.normalizeEscapes]]. */
  private[graft] def percentDecode(s: String): String =
    graft.operators.UrlChecker.normalizeEscapes(s,
      b => b >= 0x80 || !reservedByte(b))

  /** Reserved = gen-delims / sub-delims (RFC 3986 §2.2) plus '%'
    * itself (decoding it would un-anchor later escapes). */
  private def reservedByte(b: Int): Boolean = b match {
    case ':' | '/' | '?' | '#' | '[' | ']' | '@' |
         '!' | '$' | '&' | '\'' | '(' | ')' | '*' |
         '+' | ',' | ';' | '=' | '%' => true
    case _ => false
  }

  private final case class Group(agents: Seq[String], rules: Seq[Rule],
      delay: Option[Double])

  /** ONE parse shared by rule and crawl-delay selection: runs of
    * user-agent lines introduce a group that the following
    * allow/disallow/crawl-delay lines populate. */
  private def parseGroups(body: String): Seq[Group] = {
    if (body == null) return Seq.empty
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var agents = scala.collection.mutable.ArrayBuffer.empty[String]
    var rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var delay: Option[Double] = None
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents.toSeq, rules.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer.empty[String]
      rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
      delay = None
    }
    body.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) line.split(":", 2) match {
        case Array(k, v) =>
          val key = k.trim.toLowerCase(java.util.Locale.ROOT)
          val value = v.trim
          key match {
            case "user-agent" =>
              if (inRules) { flush(); inRules = false }
              // empty tokens are malformed and would substring-match
              // EVERY crawler, hijacking group selection from `*`
              if (value.nonEmpty)
                agents += value.toLowerCase(java.util.Locale.ROOT)
            case "allow" =>
              inRules = true
              if (value.nonEmpty) rules += Rule(allow = true, value)
            case "disallow" =>
              inRules = true
              // empty Disallow = allow everything (no rule)
              if (value.nonEmpty) rules += Rule(allow = false, value)
            case "crawl-delay" =>
              inRules = true
              if (delay.isEmpty)
                delay = scala.util.Try(value.toDouble).toOption
            case _ => () // sitemap etc.: not group content
          }
        case _ => ()
      }
    }
    flush()
    groups.toSeq
  }

  /** The groups selected for `userAgent`: longest agent-token match,
    * `*` fallback, same-agent groups merged (all groups at the best
    * match length). */
  private def selectGroups(groups: Seq[Group],
      userAgent: String): Seq[Group] = {
    val ua = userAgent.toLowerCase(java.util.Locale.ROOT)
    val specific = groups.filter(g =>
      g.agents.exists(a => a != "*" && ua.contains(a)))
    if (specific.nonEmpty) {
      val bestLen = specific.iterator.flatMap(_.agents)
        .filter(a => a != "*" && ua.contains(a)).map(_.length).max
      specific.filter(_.agents.exists(a =>
        a != "*" && ua.contains(a) && a.length == bestLen))
    } else groups.filter(_.agents.contains("*"))
  }

  /** Parse one robots.txt body into the rule list applying to
    * `userAgent` (group selection above; merged, original order kept —
    * order is irrelevant under longest-match precedence). */
  def rulesFor(body: String, userAgent: String): Seq[Rule] =
    selectGroups(parseGroups(body), userAgent).flatMap(_.rules)

  /** Per-host Crawl-delay seconds for the scheduler's politeness dim —
    * the SAME group selection as the access rules (the delay a crawler
    * honoring this file would apply); first delay of the selected
    * groups wins; non-numeric or absent => None. */
  def crawlDelay(body: String, userAgent: String): Option[Double] =
    selectGroups(parseGroups(body), userAgent)
      .flatMap(_.delay).headOption

  /** RFC 9309 §2.2.2 longest-match decision over compiled rules. */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (r.matches(path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }

  /** `*`/`$` glob match, anchored at the path start (RFC semantics:
    * patterns match from the first path octet). Iterative two-pointer
    * with backtracking — no regex compilation per row. */
  private[sources] def globMatch(pattern: String, path: String)
      : Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    var pi = 0; var si = 0
    var starP = -1; var starS = -1
    while (si < path.length) {
      if (pi < p.length &&
        (p.charAt(pi) == path.charAt(si))) { pi += 1; si += 1 }
      else if (pi < p.length && p.charAt(pi) == '*') {
        starP = pi; starS = si; pi += 1
      } else if (starP >= 0) { starS += 1; si = starS; pi = starP + 1 }
      else return false
      // non-anchored patterns may end mid-path
      if (pi == p.length && !anchored) return true
    }
    while (pi < p.length && p.charAt(pi) == '*') pi += 1
    pi == p.length && (!anchored || si == path.length)
  }

  /** Filter a frontier to robots-allowed URLs: `robots` is the
    * (hostCol, bodyCol) dimension. NO driver collect anywhere: the
    * frontier LEFT-joins the dimension on the case-folded host (Spark
    * broadcasts the dim when it is small, hash-partitions both sides
    * when it is not — at web scale the dim is one row per HOST, tens of
    * millions of rows, which a driver-side collect-and-broadcast would
    * OOM on), and rules compile EXECUTOR-side behind a per-JVM cache
    * keyed by (host, userAgent, bodies-hash) — the ModelRegistry
    * pattern — so each host's bodies parse once per executor, not once
    * per frontier row. Hosts with no robots row are allowed (the RFC's
    * unavailable = allow); duplicate dimension rows for one host merge
    * by parsing EACH body independently and unioning the selected rule
    * sets (longest-match precedence is order-free) — text concatenation
    * would fuse one body's trailing user-agent run with the next body's
    * first group and change decisions; null host/body rows are malformed
    * dimension rows and are dropped before the join. */
  def filterAllowed(frontier: DataFrame, urlCol: String,
      robots: DataFrame, hostCol: String, bodyCol: String,
      userAgent: String): DataFrame = {
    val dim = robots
      .select(col(hostCol).as("__r_host_raw"), col(bodyCol).as("__r_body"))
      .where(col("__r_host_raw").isNotNull && col("__r_body").isNotNull)
      .groupBy(lower(col("__r_host_raw")).as("__r_host"))
      .agg(collect_list(col("__r_body")).as("__r_bodies"))
    // case-folded host (DNS is case-insensitive — an exact match would
    // silently bypass every rule for "A.org"); a URL whose host the URI
    // parser cannot produce is REJECTED, not waved through — those rows
    // carry a null struct and fail the final decision
    val hostPath = udf { (url: String) =>
      if (url == null) None
      else {
        try {
          val u = new java.net.URI(url)
          val host = u.getHost
          if (host == null) None
          else Some((host.toLowerCase(java.util.Locale.ROOT),
            percentDecode(
              (if (u.getRawPath == null || u.getRawPath.isEmpty) "/"
              else u.getRawPath) +
                (if (u.getRawQuery != null) "?" + u.getRawQuery
                else ""))))
        } catch { case _: java.net.URISyntaxException => None }
      }
    }
    val decide = udf { (host: String, path: String, bodies: Seq[String]) =>
      if (host == null || path == null) false
      else if (bodies == null) true // unjoined host: robots unavailable
      else isAllowed(cachedRules(host, userAgent, bodies), path)
    }
    val withHp = frontier.withColumn("__hp", hostPath(col(urlCol)))
    withHp
      .join(dim, col("__hp._1") === col("__r_host"), "left")
      .where(decide(col("__hp._1"), col("__hp._2"), col("__r_bodies")))
      .drop("__hp", "__r_host", "__r_bodies")
  }

  /** Executor-side compiled-rule cache: robots bodies for a hot host
    * parse once per JVM instead of once per frontier row. Size-capped
    * with whole-cache reset (simplicity over LRU: the cap is far above
    * any real per-executor distinct-host working set; a reset costs one
    * re-parse per host, not correctness). */
  @transient private lazy val ruleCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String), Seq[Rule]]()
  private val RuleCacheMax = 20000

  /** Strong, order-independent digest of the robots bodies: md5 over the
    * SORTED bodies, each length-prefixed so concatenation can't alias
    * ("a","bc" vs "ab","c"). collect_list order is nondeterministic, so
    * sorting makes identical content hit one cache slot; md5 (vs the
    * former 32-bit Seq hashCode) makes a same-host collision returning
    * the WRONG compiled rules cryptographically implausible — this is a
    * crawl-policy safety surface, not just a perf cache. */
  private def bodiesDigest(bodies: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    bodies.sorted.foreach { b =>
      val bytes = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      md.update(java.nio.ByteBuffer.allocate(4).putInt(bytes.length).array())
      md.update(bytes)
    }
    java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  private def cachedRules(host: String, userAgent: String,
      bodies: Seq[String]): Seq[Rule] = {
    val key = (host, userAgent, bodiesDigest(bodies))
    val hit = ruleCache.get(key)
    if (hit != null) hit
    else {
      val rules = bodies.flatMap(b => rulesFor(b, userAgent))
      if (ruleCache.size >= RuleCacheMax) ruleCache.clear()
      ruleCache.put(key, rules)
      rules
    }
  }
}
