package graft

import graft.sources.Robots
import graft.sources.Robots.Rule

/** RFC 9309 robots evaluation — examples lifted from the RFC's own
  * §2.2.2/§5 match tables. */
class RobotsSpec extends SparkSuite {

  private def allowed(body: String, path: String,
      ua: String = "graftbot"): Boolean =
    Robots.isAllowed(Robots.rulesFor(body, ua), path)

  test("longest-match precedence, allow-wins ties, $ anchors, * globs " +
      "(RFC match tables)") {
    // allow /p vs disallow / : longest match wins
    val b1 = "User-agent: *\nAllow: /p\nDisallow: /"
    assert(allowed(b1, "/page"))
    assert(!allowed(b1, "/"))
    // RFC §5.2: allow /folder/ vs disallow /folder — the LONGER
    // pattern wins even though it is the Allow
    val b2 = "User-agent: *\nAllow: /folder/\nDisallow: /folder"
    assert(allowed(b2, "/folder/page"))
    assert(!allowed(b2, "/folder"))
    // allow /page vs disallow /*.ph : equal octet count -> allow
    val b3 = "User-agent: *\nAllow: /page\nDisallow: /*.ph"
    assert(allowed(b3, "/page.php5"))
    // disallow /*.php matches anywhere
    val b4 = "User-agent: *\nDisallow: /*.php"
    assert(!allowed(b4, "/index.php"))
    assert(!allowed(b4, "/folder/any.php?x=1&y=2".takeWhile(_ != '?')))
    assert(allowed(b4, "/php/file.html"))
    // $ anchors the end
    val b5 = "User-agent: *\nAllow: /$\nDisallow: /"
    assert(allowed(b5, "/"))
    assert(!allowed(b5, "/index.html"))
  }

  test("group selection: longest agent token wins, * is the fallback, " +
      "same-agent groups merge, empty Disallow allows") {
    val body =
      """User-agent: graftbot-news
        |Disallow: /news-only/
        |
        |User-agent: graftbot
        |Disallow: /general/
        |
        |User-agent: *
        |Disallow: /
        |
        |User-agent: graftbot
        |Disallow: /more/
        |""".stripMargin
    // the most specific token wins for the news variant
    assert(!allowed(body, "/news-only/a", ua = "graftbot-news"))
    assert(allowed(body, "/general/a", ua = "graftbot-news"))
    // plain graftbot merges BOTH its groups and ignores *'s blanket ban
    assert(!allowed(body, "/general/a", ua = "graftbot"))
    assert(!allowed(body, "/more/a", ua = "graftbot"))
    assert(allowed(body, "/anything-else", ua = "graftbot"))
    // unknown agents get the * group
    assert(!allowed(body, "/anything", ua = "otherbot"))
    // empty Disallow = no rule = everything allowed
    assert(allowed("User-agent: *\nDisallow:", "/x"))
    // no robots at all = allowed
    assert(allowed("", "/x"))
    // a malformed EMPTY user-agent token must not hijack group
    // selection from * (it would substring-match every crawler)
    val malformed = "User-agent:\nDisallow:\n\nUser-agent: *\nDisallow: /"
    assert(!allowed(malformed, "/x"))
  }

  test("percent-encoding normalizes before matching, in both the " +
      "pattern and the path") {
    val b = "User-agent: *\nDisallow: /caf%C3%A9/"
    assert(!allowed(b, "/café/menu")) // decoded path form
    assert(!allowed(b, Robots.percentDecode("/caf%C3%A9/menu")))
    assert(allowed(b, "/cafe/menu"))
  }

  test("reserved octets stay percent-encoded for comparison (RFC 9309 " +
      "via RFC 3986): %2F is not a path separator, hex case folds") {
    // paths normalize through the SAME percentDecode filterAllowed
    // applies before matching
    def norm(p: String) = Robots.percentDecode(p)
    // an encoded slash is DATA — /a%2Fb is a distinct resource from
    // /a/b, so a rule anchored at /a/b must not block it
    val b1 = "User-agent: *\nDisallow: /a/b$"
    assert(!allowed(b1, norm("/a/b")))
    assert(allowed(b1, norm("/a%2Fb")))
    // and a rule written against the encoded form matches it, in
    // either hex case, without leaking onto the decoded path
    val b2 = "User-agent: *\nDisallow: /a%2Fb"
    assert(!allowed(b2, norm("/a%2Fb")))
    assert(!allowed(b2, norm("/a%2fb"))) // hex case normalizes
    assert(allowed(b2, norm("/a/b")))
    // decoding must not SYNTHESIZE glob metacharacters: %2A is a
    // literal asterisk, not a wildcard
    val b3 = "User-agent: *\nDisallow: /x%2Ay$"
    assert(!allowed(b3, norm("/x%2Ay")))
    assert(allowed(b3, norm("/xZZZy")))
    // normalization is idempotent (no double-decode through %25)
    assert(Robots.percentDecode(Robots.percentDecode("/p%252Fq")) ===
      "/p%252Fq")
    // malformed escapes pass through — including Unicode "digits"
    // (Character.digit('４',16)=4 would decode %４1 to 'A'): HEXDIG is
    // ASCII-only per RFC 3986
    assert(Robots.percentDecode("/a%４" + "1") === "/a%４" + "1")
    assert(Robots.percentDecode("/a%zz") === "/a%zz")
  }

  test("crawlDelay follows the same group selection as the access " +
      "rules") {
    val body =
      """User-agent: graftbot
        |Crawl-delay: 2.5
        |Disallow: /x/
        |
        |User-agent: *
        |Crawl-delay: 10
        |""".stripMargin
    assert(Robots.crawlDelay(body, "graftbot") === Some(2.5))
    assert(Robots.crawlDelay(body, "otherbot") === Some(10.0))
    assert(Robots.crawlDelay("User-agent: *\nDisallow: /", "b") === None)
    assert(Robots.crawlDelay(
      "User-agent: *\nCrawl-delay: soon", "b") === None)
  }

  test("canonicalizeUrl: RFC 3986 normalization + sorted query params " +
      "collapse frontier duplicates") {
    val s = initSpark()
    import s.implicits._
    import graft.operators.UrlChecker
    val urls = Seq(
      "HTTPS://Example.ORG:443/a/../b?z=1&a=2#frag",
      "https://example.org/b?a=2&z=1",
      "https://example.org:8080/b",
      "https://example.org",
      "not a url",
      "mailto:x@example.org" // no host -> null
    ).toDF("url")
    val out = urls.select(
        UrlChecker.canonicalizeUrl(org.apache.spark.sql.functions
          .col("url")).as("c"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) === "https://example.org/b?a=2&z=1")
    assert(out(1) === out(0)) // param order + dot segments collapse
    assert(out(2) === "https://example.org:8080/b") // non-default port
    assert(out(3) === "https://example.org/")
    assert(out(4) == null)
    assert(out(5) == null)
  }

  test("canonicalizeUrl: selective percent normalization — reserved " +
      "octets survive, unreserved decode, output is idempotent") {
    val s = initSpark()
    import s.implicits._
    import graft.operators.UrlChecker
    val urls = Seq(
      "https://example.org/a%2Fb", // encoded slash: DISTINCT resource
      "https://example.org/a/b",
      "https://example.org/%7Euser/%41%2e", // unreserved: decode
      "https://example.org/p%3fq", // reserved: keep, hex uppercased
      "https://example.org/x%25y" // %25 kept: idempotence anchor
    ).toDF("url")
    val out = urls.select(UrlChecker.canonicalizeUrl(
        org.apache.spark.sql.functions.col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(out(0) === "https://example.org/a%2Fb")
    assert(out(1) === "https://example.org/a/b")
    assert(out(0) !== out(1)) // frontier dedup must keep both
    assert(out(2) === "https://example.org/~user/A.")
    assert(out(3) === "https://example.org/p%3Fq")
    assert(out(4) === "https://example.org/x%25y")
    // idempotent: canonicalizing the canonical form is a fixpoint
    val again = out.toSeq.toDF("url").select(UrlChecker.canonicalizeUrl(
        org.apache.spark.sql.functions.col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(again.toSeq === out.toSeq)
    // RFC 6.2.2 step ORDER: a dot segment hidden behind %2E escapes
    // resolves after decoding — the canonical form is a true fixpoint
    val hidden = Seq("https://example.org/a/%2e%2e/b",
        "https://example.org/a/../b", "https://example.org/x/%2e/y")
      .toDF("url")
      .select(UrlChecker.canonicalizeUrl(
        org.apache.spark.sql.functions.col("url")).as("c"))
      .collect().map(_.getString(0))
    assert(hidden(0) === "https://example.org/b")
    assert(hidden(1) === "https://example.org/b")
    assert(hidden(2) === "https://example.org/x/y")
  }

  test("filterAllowed: frontier filters row-local against broadcast " +
      "per-host rules; hosts without robots pass") {
    val s = initSpark()
    import s.implicits._
    val robots = Seq(
      ("a.org", "User-agent: *\nDisallow: /private/"),
      ("b.org", "User-agent: *\nDisallow: /")
    ).toDF("host", "body")
    val frontier = Seq(
      "https://a.org/public/x",
      "https://a.org/private/y",
      "https://A.ORG/private/z", // DNS case must not bypass the rules
      "https://a.org/priv%61te/w", // encoding must not bypass either
      "https://b.org/anything",
      "https://c.org/no-robots-here",
      "not a url"
    ).toDF("url")
    val kept = Robots.filterAllowed(frontier, "url", robots,
        "host", "body", "graftbot")
      .collect().map(_.getString(0)).toSet
    assert(kept === Set("https://a.org/public/x",
      "https://c.org/no-robots-here"))
  }

  test("filterAllowed: null dimension rows are skipped, duplicate " +
      "host rows merge their rule sets") {
    val s = initSpark()
    import s.implicits._
    val robots = Seq(
      ("a.org", "User-agent: *\nDisallow: /x/"),
      ("a.org", "User-agent: *\nDisallow: /y/"), // duplicate host
      (null, "User-agent: *\nDisallow: /"), // malformed: null host
      ("b.org", null) // malformed: null body
    ).toDF("host", "body")
    val frontier = Seq(
      "https://a.org/x/1", // blocked by the first row's rules
      "https://a.org/y/2", // blocked by the SECOND row's rules
      "https://a.org/z/3",
      "https://b.org/anything" // null body = no rules = allowed
    ).toDF("url")
    val kept = Robots.filterAllowed(frontier, "url", robots,
        "host", "body", "graftbot")
      .collect().map(_.getString(0)).toSet
    assert(kept === Set("https://a.org/z/3", "https://b.org/anything"))
  }

  test("filterAllowed: duplicate-host bodies parse INDEPENDENTLY — " +
      "orphan rules at the start of one body must not attach to the " +
      "previous body's trailing group") {
    val s = initSpark()
    import s.implicits._
    // body2 opens with an orphan rule (no user-agent line above it): a
    // standalone parse DROPS it (RFC: rules outside a group are
    // ignored), but text concatenation would attach it to body1's
    // trailing graftbot group and block graftbot from /orphan/
    val robots = Seq(
      ("a.org", "User-agent: graftbot\nDisallow: /g1/"),
      ("a.org", "Disallow: /orphan/\n\nUser-agent: *\nDisallow: /star/")
    ).toDF("host", "body")
    val frontier = Seq(
      "https://a.org/orphan/x", // fusion casualty — must stay allowed
      "https://a.org/g1/x", // body1's real graftbot rule
      "https://a.org/star/x", // body2's * rule also applies per-file
      "https://a.org/free"
    ).toDF("url")
    val kept = Robots.filterAllowed(frontier, "url", robots,
        "host", "body", "graftbot")
      .collect().map(_.getString(0)).toSet
    assert(kept === Set("https://a.org/orphan/x", "https://a.org/free"))
  }

  test("filterAllowed: the robots dim is JOINED, never collected to " +
      "the driver — web-scale dims can't fit a collect-and-broadcast") {
    val s = initSpark()
    import s.implicits._
    // a dim orders of magnitude past what a driver map should hold;
    // with the old collect() path this materializes every body on the
    // driver before the query even starts — the join path streams it
    val robots = s.range(0, 50000)
      .selectExpr("concat('h', id, '.org') AS host",
        "concat('User-agent: *\nDisallow: /blocked', id, '/') AS body")
    val frontier = Seq(
      "https://h7.org/blocked7/page",    // per-host rule applies
      "https://h7.org/blocked8/page",    // other hosts' rules must NOT
      "https://h49999.org/blocked49999/x",
      "https://h49999.org/open/x",
      "https://unlisted.org/anything"    // robots unavailable = allow
    ).toDF("url")
    val result = Robots.filterAllowed(frontier, "url", robots,
      "host", "body", "graftbot")
    // the plan must contain a real join against the dim (left outer on
    // the host key), and NO stage of it may be fed by a driver-side
    // local relation of the dim's size
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("join"),
      s"robots dim must join, not collect:\n$plan")
    val kept = result.collect().map(_.getString(0)).toSet
    assert(kept === Set("https://h7.org/blocked8/page",
      "https://h49999.org/open/x", "https://unlisted.org/anything"))
  }
}
