package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{TextClean, TextMetrics}

class TextFunctionsSpec extends SparkSuite {

  private def one(colExpr: org.apache.spark.sql.Column, text: String): Any = {
    val s = initSpark()
    import s.implicits._
    Seq(Tuple1(text)).toDF("text").select(colExpr.as("r")).head().get(0)
  }

  test("gopher rules: each flag trips on its own pathology") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    def flags(text: String): Map[String, Any] = {
      val r = one(graft.functions.TextMetrics.gopherStruct(col("text")),
        text).asInstanceOf[Row]
      r.schema.fieldNames.zip(r.toSeq).toMap
    }
    val goodBody = ("the quick brown fox jumps over the lazy dog and " +
      "that is just fine to have with everything else here today ") * 3
    val good = flags(goodBody)
    assert(good("keep") === true, s"healthy doc must pass: $good")
    // too short
    assert(flags("the of and")("wc_ok") === false)
    // hash spam: > 1 '#' per 10 words
    assert(flags(goodBody + " # # # # # # # # # # # # #")("hash_ok")
      === false)
    // bullet-only document
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    assert(flags(bullets)("bullet_ok") === false)
    // ellipsis-heavy lines
    val ell = (1 to 10).map(i => s"line $i trails off...").mkString("\n")
    assert(flags(ell)("ellipsis_ok") === false)
    // numeric soup: < 80% words contain a letter
    val nums = ("the of 12 34 56 78 90 11 22 33 " * 10)
    assert(flags(nums)("alpha_ok") === false)
    // no stopword diversity
    val noStops = ("lorem ipsum dolor sit amet consectetur adipiscing " +
      "elit sed do eiusmod tempor ") * 5
    assert(flags(noStops)("stop_ok") === false)
    // mean word length out of bounds (all 1-char words)
    assert(flags(("a b c d e f g h i j " * 10))("mwl_ok") === false)
  }

  test("wordCount counts \\w+ tokens") {
    assert(one(TextMetrics.wordCount(col("text")),
      "Hello, world! it's 42") === 5) // Hello world it s 42
  }

  test("sentenceCount splits on .!? and floors at 1") {
    assert(one(TextMetrics.sentenceCount(col("text")),
      "One. Two! Three?") === 3)
    assert(one(TextMetrics.sentenceCount(col("text")), "fragment") === 1)
  }

  test("fleschReadingEase clamps to [0,100]") {
    val v = one(TextMetrics.fleschReadingEase(col("text")),
      "The cat sat on the mat.").asInstanceOf[java.lang.Double]
    assert(v >= 0.0 && v <= 100.0)
  }

  test("langIdHeuristic spots obvious languages") {
    assert(one(TextMetrics.langIdHeuristic(col("text")),
      "the dog and the cat of the house") === "en")
    assert(one(TextMetrics.langIdHeuristic(col("text")),
      "le chien et la maison des amis") === "fr")
    assert(one(TextMetrics.langIdHeuristic(col("text")),
      "xyzzy plugh") === "und")
  }

  test("langConsistency: per-side detection, are_different flag, " +
      "confidence ratios (F12 cross-check shape)") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(
      ("the cat and the dog is here", "le chat et la porte"), // en vs fr
      ("the cat and the dog", "the dog and the cat"))          // en vs en
      .toDF("content", "description")
      .select(TextMetrics.langConsistency(col("content"),
        col("description")).as("lc"))
      .select("lc.*")
    val rows = df.collect()
    assert(rows(0).getBoolean(0)) // different languages flagged
    assert(rows(0).getStruct(2).getString(0) === "en") // content side
    assert(rows(0).getStruct(1).getString(0) === "fr") // description side
    assert(rows(0).getStruct(2).getDouble(1) > 0.0)
    assert(!rows(1).getBoolean(0))
  }

  test("normalizeWhitespace collapses runs and trims") {
    assert(one(TextClean.normalizeWhitespace(col("text")),
      "  a \t b\n\nc  ") === "a b c")
  }

  test("normalizeWhitespace is idempotent (property)") {
    val s = initSpark()
    import s.implicits._
    // one batched pass over 200 generated strings (driving Spark per
    // sample would be slow); idempotence: normalize(normalize(x)) ==
    // normalize(x)
    val samples = Gen.listOfN(200, Gen.asciiStr)
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L)).get
    val df = samples.map(Tuple1(_)).toDF("text")
    val bad = df.select(
        TextClean.normalizeWhitespace(col("text")).as("once"))
      .select(col("once"),
        TextClean.normalizeWhitespace(col("once")).as("twice"))
      .where(col("once") =!= col("twice"))
    assert(bad.count() === 0)
  }

  test("stripHtml removes tags and unescapes entities") {
    assert(one(TextClean.stripHtml(col("text")),
      "<p>Hello <b>bold</b> &amp; <script>x=1;</script>world</p>")
      === "Hello bold & world")
  }

  test("dehyphenate joins words wrapped across lines") {
    assert(one(TextClean.dehyphenate(col("text")),
      "exam-\nple and hy- \n phen") === "example and hyphen")
  }

  test("cleanDoi strips resolver prefixes") {
    assert(one(TextClean.cleanDoi(col("text")),
      "https://doi.org/10.1000/xyz") === "10.1000/xyz")
    assert(one(TextClean.cleanDoi(col("text")),
      "10.1000/abc") === "10.1000/abc")
  }

  test("stripHalVersion removes trailing vN") {
    assert(one(TextClean.stripHalVersion(col("text")),
      "hal-012345v3") === "hal-012345")
  }

  test("invertAbstractIndex reconstructs text from inverted index") {
    val s = initSpark()
    import s.implicits._
    // reference open_alex.py:62-67: {word: [positions]} -> ordered text
    val df = Seq(Tuple1(Map("world" -> Seq(1), "hello" -> Seq(0),
      "again" -> Seq(2)))).toDF("inv")
    val got = df.select(
      TextClean.invertAbstractIndex(col("inv")).as("r")).head.getString(0)
    assert(got === "hello world again")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = one(TextMetrics.fingerprint(col("text")), "Hello   World")
    val b = one(TextMetrics.fingerprint(col("text")), "hello world ")
    assert(a === b)
  }

  test("nfcNormalize composes combining marks and replaces nbsp (F5)") {
    // "e" + combining acute -> precomposed é
    assert(one(TextClean.nfcNormalize(col("text")),
      "café a b") === "café a b")
  }

  test("stripPunctKeepContractions preserves apostrophes/decimals (F6)") {
    assert(one(TextClean.stripPunctKeepContractions(col("text")),
      "don't stop, 3.14 wins!") === "don't stop 3.14 wins ")
  }

  test("ligature replacement (F14)") {
    assert(one(TextClean.replaceLigatures(col("text")),
      "ﬁne ﬂow œuvre") === "fine flow oeuvre")
  }

  test("repairSpacing inserts missing spaces after punctuation (F16)") {
    assert(one(TextClean.repairSpacing(col("text")),
      "End.Start nextWord") === "End. Start next Word")
  }

  test("ccLicenseToUrl canonicalizes license codes (F17)") {
    assert(one(TextClean.ccLicenseToUrl(col("text")), "CC BY-SA")
      === "https://creativecommons.org/licenses/by-sa/4.0/")
    assert(one(TextClean.ccLicenseToUrl(col("text")), "CC0")
      === "https://creativecommons.org/publicdomain/zero/1.0/")
    assert(one(TextClean.ccLicenseToUrl(col("text")), "proprietary")
      === "proprietary")
  }

  test("repetitionStats: dup lines, top-2-gram mass, code-point chars") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.functions.col
    def stats(text: String): Row =
      one(graft.functions.TextMetrics.repetitionStats(col("text")), text)
        .asInstanceOf[Row]
    val r = stats("a b\na b\nc d")
    assert(r.getAs[Int]("n_lines") === 3)
    assert(r.getAs[Int]("dup_lines") === 1) // "a b" repeats
    // 2-grams: "a b","b a","b a","a b","b c","c d" -> "a b" x2 ties
    // "b a" x2; tie resolves to longest (both len 3) -> 3
    assert(r.getAs[Int]("top2_count") === 2)
    assert(r.getAs[Int]("top2_len") === 3)
    // spammy repetition: one gram dominates
    val spam = stats(("buy now " * 50).trim)
    assert(spam.getAs[Int]("top2_count") >= 49)
    // code points, not UTF-16 units: 𝄞 is one char
    assert(stats("𝄞").getAs[Int]("text_chars") === 1)
  }

  test("C4 line cleaning keeps prose lines, drops boilerplate " +
      "(Raffel et al. 2020 §2.2; not a declared query — the synthetic " +
      "corpus has no newlines/punctuation for the rules to bind on)") {
    import org.apache.spark.sql.functions.col
    val doc = Seq(
      "This is a good sentence with plenty of words.",
      "short line",                         // < 3 words... has 2
      "no terminal punctuation here at all",
      "Enable javascript to view this page.", // marker
      "if (x) { return y; }",                // code
      "Another keeper, it would seem!",
      "He said \"this ends with a quote\"").mkString("\n")
    val out = one(graft.functions.TextClean.c4CleanLines(col("text")),
      doc).asInstanceOf[String]
    assert(out === Seq(
      "This is a good sentence with plenty of words.",
      "Another keeper, it would seem!",
      "He said \"this ends with a quote\"").mkString("\n"))
    // nothing survives -> empty string, not null
    assert(one(graft.functions.TextClean.c4CleanLines(col("text")),
      "just words no punct").asInstanceOf[String] === "")
  }

  test("PII redaction scrubs e-mails and IPv4s with typed tokens") {
    import org.apache.spark.sql.functions.col
    val doc = "Contact jane.doe+x@example.co.uk or 192.168.1.254 " +
      "(backup: bob@sub.domain.org, 10.0.0.1). Version 1.2 stays."
    val out = one(graft.functions.TextClean.redactPii(col("text")), doc)
      .asInstanceOf[String]
    assert(out === "Contact <EMAIL> or <IP> (backup: <EMAIL>, <IP>). " +
      "Version 1.2 stays.")
    val (e, i) = graft.functions.TextClean.piiCounts(col("text"))
    assert(one(e, doc) === 2)
    assert(one(i, doc) === 2)
    // an e-mail with a bare-IPv4 host is fully redacted (review fix:
    // the alphabetic-TLD-only regex left 'bob@<IP>' — identifying
    // local part survived the scrub)
    assert(one(graft.functions.TextClean.redactPii(col("text")),
      "ping bob.smith@192.168.1.10 now").asInstanceOf[String] ===
      "ping <EMAIL> now")
  }

  test("duplicateLineFraction and charEntropy quality signals") {
    assert(one(TextMetrics.duplicateLineFraction(col("text")),
      "a\nb\na\nb\nc") === 0.4) // 2 of 5 lines repeat
    assert(one(TextMetrics.duplicateLineFraction(col("text")),
      "x\ny\nz") === 0.0)
    assert(one(TextMetrics.charEntropy(col("text")), "aaaa") === 0.0)
    val h = one(TextMetrics.charEntropy(col("text")), "abcd")
      .asInstanceOf[Double]
    assert(h === 2.0) // 4 equiprobable chars = 2 bits
  }

  test("removeUrls drops urls like the reference ANTI_URL_REGEX") {
    // cases ported from the reference's own
    // tests/test_regular_expressions.py (TestAntiUrlRegex)
    assert(one(TextClean.removeUrls(col("text")),
      "Visit https://example.com for more info.")
      .asInstanceOf[String].contains("https://") === false)
    assert(one(TextClean.removeUrls(col("text")),
      "see (https://example.com) here") === "see  here")
    assert(one(TextClean.removeUrls(col("text")),
      "go to www.example.com now") === "go to  now")
    assert(one(TextClean.removeUrls(col("text")),
      "get ftp://files.example.com/file.txt today") === "get  today")
    assert(one(TextClean.removeUrls(col("text")),
      "just some text") === "just some text")
  }

  test("softLineBreaksToSpace joins wrapped lines, keeps paragraph ends") {
    // cases ported from the reference's TestSoftLineBreakRegex
    assert(one(TextClean.softLineBreaksToSpace(col("text")),
      "word\nnext") === "word next")
    assert(one(TextClean.softLineBreaksToSpace(col("text")),
      "end.\nnext") === "end.\nnext")
    assert(one(TextClean.softLineBreaksToSpace(col("text")),
      "end?\nnext") === "end?\nnext")
    assert(one(TextClean.softLineBreaksToSpace(col("text")),
      "end!\nnext") === "end!\nnext")
    assert(one(TextClean.softLineBreaksToSpace(col("text")),
      "end:\nnext") === "end:\nnext")
  }

  test("firstSentences takes the leading n sentences") {
    assert(one(TextClean.firstSentences(col("text"), 2),
      "A one. B two. C three. D") === "A one. B two.")
  }

  test("scriptProfile: per-script censuses, deterministic dominant, " +
      "mixed-script share (q124)") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(
      (1L, "hello world"),                    // pure latin
      (2L, "Привет мир"),                     // pure cyrillic
      (3L, "日本語テキスト"),                   // cjk (kana + ideographs)
      (4L, "hello Привет"),                   // mixed, latin ties? 5 vs 6
      (5L, "12345 !!!"),                      // no script chars
      (6L, "한국어")                           // hangul
    ).toDF("doc_id", "text")
    val got = graft.functions.TextMetrics
      .scriptProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def dom(id: Long) =
      got(id).getString(got(id).fieldIndex("dominant_script"))
    assert(dom(1L) === "latin")
    assert(got(1L).getInt(got(1L).fieldIndex("latin")) === 10)
    assert(dom(2L) === "cyrillic")
    assert(dom(3L) === "cjk")
    assert(dom(6L) === "hangul")
    assert(dom(5L) === "none")
    assert(got(5L).isNullAt(got(5L).fieldIndex("dominant_share")))
    // mixed doc: hello=5 latin, Привет=6 cyrillic -> cyrillic wins
    assert(dom(4L) === "cyrillic")
    val share4 = got(4L).getDouble(got(4L).fieldIndex("dominant_share"))
    assert(math.abs(share4 - 6.0 / 11.0) < 0.001)
  }
}
