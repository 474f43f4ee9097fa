package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text cleaning / normalization as Column expressions (reference F2-F20:
  * utils_/scraping_utils.py, utils_/regular_expression.py,
  * modules/pdf_extractor.py). Regex-first — every transform stays inside
  * whole-stage codegen; the two fidelity-sensitive ops (HTML strip, NFC
  * normalize) use JVM UDFs.
  */
object TextClean {

  /** Strip backlines/tabs/CR (reference F2: BACKLINES_REGEX,
    * regular_expression.py:8; plugins/interface.py:49-58). */
  def stripBacklines(c: Column): Column =
    regexp_replace(c, "[\\n\\t\\r]", " ")

  /** Collapse whitespace runs + trim (reference F3:
    * scraping_utils.py:26-37). */
  def normalizeWhitespace(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Remove punctuation but keep contractions and decimal points
    * (reference F6: computed_metadata.py:51-65). */
  def stripPunctKeepContractions(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "(?<!\\w)[\\p{Punct}]+|[\\p{Punct}]+(?!\\w)", " "),
      "\\s+", " ")

  /** HTML tag strip + entity unescape (reference F4:
    * scraping_utils.py:14-56 uses an HTMLParser; we use a tag regex +
    * common entities, adequate for the reference's fixture corpus). */
  /** `&amp;` is LAST: unescaping it first would double-unescape nested
    * entities (`&amp;lt;` means literal "&lt;", not "<"). */
  private[graft] val htmlEntities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  def stripHtml(c: Column): Column = {
    val noTags = regexp_replace(
      regexp_replace(c, "(?is)<(script|style)[^>]*>.*?</\\1>", " "),
      "(?s)<[^>]+>", " ")
    val unescaped = htmlEntities.foldLeft(noTags) { case (col0, (e, r)) =>
      regexp_replace(col0, java.util.regex.Pattern.quote(e), r)
    }
    normalizeWhitespace(unescaped)
  }

  /** Tag strip with EMPTY replacement — BeautifulSoup `.text` semantics
    * (inline markup like `σ<sup>S</sup>/RpoS` concatenates tightly to
    * `σS/RpoS`, no injected spaces). Entities still unescape. */
  def stripHtmlTight(c: Column): Column = {
    val noTags = regexp_replace(
      regexp_replace(c, "(?is)<(script|style)[^>]*>.*?</\\1>", ""),
      "(?s)<[^>]+>", "")
    htmlEntities.foldLeft(noTags) { case (col0, (e, r)) =>
      regexp_replace(col0, java.util.regex.Pattern.quote(e), r)
    }
  }

  /** Unicode NFC normalize + nbsp replace (reference F5:
    * scraping_utils.py:186-195). UDF — java.text.Normalizer has no
    * expression equivalent. */
  val nfcNormalize: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (s: String) =>
      if (s == null) null
      else java.text.Normalizer
        .normalize(s.replace(' ', ' '), java.text.Normalizer.Form.NFC)
    }

  /** Dehyphenate words wrapped across lines (reference F13:
    * pdf_extractor.py:146-183; WORD_CUT_BY_BACKLINES_REGEX). */
  /** URL removal (reference ANTI_URL_REGEX, regular_expression.py:12 —
    * http/https/ftp/file/www with optional surrounding parens). */
  def removeUrls(c: Column): Column =
    regexp_replace(c,
      """\(?((www)|((https?|ftp|file)://))""" +
        """[-A-Za-z0-9+&@#/%?=~_|!:,.;]*[-A-Za-z0-9+&@#/%=~_|]\)?""", "")

  /** Soft line break -> space: a newline NOT preceded by
    * sentence-ending punctuation joins wrapped lines (reference
    * SOFT_LINE_BREAK_REGEX, regular_expression.py:32). */
  def softLineBreaksToSpace(c: Column): Column =
    regexp_replace(c, """(?<![.:?!])\s*\n\s*""", " ")

  def dehyphenate(c: Column): Column =
    regexp_replace(c, "(\\w)-\\s*\\n\\s*(\\w)", "$1$2")

  /** Ligature replacement (reference F14: pdf_extractor.py:92-114). */
  def replaceLigatures(c: Column): Column = {
    val ligs = Seq("ﬀ" -> "ff", "ﬁ" -> "fi", "ﬂ" -> "fl",
      "ﬃ" -> "ffi", "ﬄ" -> "ffl", "œ" -> "oe",
      "æ" -> "ae")
    ligs.foldLeft(c) { case (col0, (l, r)) =>
      regexp_replace(col0, l, r)
    }
  }

  /** Space repair after closing sign / before capital (reference F16:
    * scraping_utils.py:133-156). */
  def repairSpacing(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "([.!?;:])([A-Z\\u00c0-\\u00dd])", "$1 $2"),
      "([a-z])([A-Z])", "$1 $2")

  /** Reference-exact add_space_after_closing_sign
    * (scraping_utils.py:133-144): a space after `.»")]}` unless followed
    * by whitespace or further punctuation. */
  def spaceAfterClosingSign(c: Column): Column =
    regexp_replace(c,
      "([.»\")\\]}])(?=[^\\s.,;:!?)»\\]}])", "$1 ")

  /** Reference-exact add_space_before_capital_letter
    * (scraping_utils.py:146-156): lowercase (incl. French accents)
    * directly followed by an uppercase gets a space between. */
  def spaceBeforeCapital(c: Column): Column =
    regexp_replace(c,
      "([a-zàâäéèêëîïôöùûüÿç])([A-ZÀÂÄÉÈÊËÎÏÔÖÙÛÜÇ])", "$1 $2")

  /** DOI clean: strip resolver prefix (reference F18:
    * scraping_utils.py:173-183). */
  def cleanDoi(c: Column): Column =
    regexp_replace(c, "^https?://(dx\\.)?doi\\.org/", "")

  /** HAL version strip: …v3 → … (reference F19:
    * scraping_utils.py:159-170). */
  def stripHalVersion(c: Column): Column =
    regexp_replace(c, "v\\d+$", "")

  /** CC license code → canonical URL (reference F17:
    * scraping_utils.py:59-74). */
  def ccLicenseToUrl(code: Column): Column = {
    val norm = lower(trim(code))
    when(norm.rlike("^cc0"), lit("https://creativecommons.org/publicdomain/zero/1.0/"))
      .when(norm.rlike("^cc[ -]by"),
        concat(lit("https://creativecommons.org/licenses/"),
          regexp_replace(regexp_extract(norm, "^cc[ -]([a-z-]+)", 1), " ", "-"),
          lit("/4.0/")))
      .otherwise(code)
  }

  /** First-sentence description (reference F23: hal.py:190-192). */
  def firstSentence(c: Column): Column =
    concat(element_at(split(c, "\\."), 1), lit("."))

  /** First-n-sentences description (reference: pressbooks.py:75-85 —
    * spaCy sentence boundaries there, the F7 sentence-regex spec here;
    * like the reference, returns the WHOLE text when it has fewer than
    * n sentences). */
  def firstSentences(c: Column, n: Int): Column = {
    val sents = regexp_extract_all(c, lit("[^.!?]+[.!?]*"), lit(0))
    when(size(sents) < n, c)
      .otherwise(array_join(transform(slice(sents, 1, n),
        s => trim(s)), " "))
  }

  /** Remove leading boilerplate words like "abstract"/"background"
    * (reference F22: open_alex.py:144-175). */
  def stripLeadingBoilerplate(c: Column): Column =
    regexp_replace(c,
      "(?i)^\\s*((abstract|background|introduction|summary)\\b[:.\\s-]*)+", "")

  /** OpenAlex inverted abstract index → plain text (reference F21:
    * open_alex.py:62-67): map word -> positions, invert to position ->
    * word, sort, join. Pure Spark array/map ops — no UDF. Input: a
    * MapType(String, Array[Int]) column. */
  def invertAbstractIndex(invIndex: Column): Column = {
    val posWord = flatten(
      transform(map_entries(invIndex), kv =>
        transform(kv.getField("value"), p =>
          struct(p.as("pos"), kv.getField("key").as("word")))))
    array_join(transform(array_sort(posWord), _.getField("word")), " ")
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    * lines that (a) have >= 3 whitespace words, (b) end in terminal
    * punctuation (. ! ? ") after right-trim, (c) contain no
    * "javascript"/"lorem ipsum" marker (case-insensitive) and no '{'
    * (code). Pure column expressions over split lines — engine-portable
    * and shuffle-free. Returns the cleaned text (kept lines re-joined
    * with newlines; empty string when nothing survives). */
  def c4CleanLines(text: Column): Column = {
    val lines = split(text, "\n")
    val kept = filter(lines, l => c4LineKeep(l))
    concat_ws("\n", kept)
  }

  /** The per-line C4 predicate (exposed for counting kept/dropped). */
  def c4LineKeep(l: Column): Column = {
    val words = size(split(trim(l), "\\s+")) >= 3
    val term = endswith(rtrim(l), lit(".")) ||
      endswith(rtrim(l), lit("!")) || endswith(rtrim(l), lit("?")) ||
      endswith(rtrim(l), lit("\""))
    val noMarkers = !lower(l).contains("javascript") &&
      !lower(l).contains("lorem ipsum") && !l.contains("{")
    words && term && noMarkers
  }

  /** PII redaction (standard pre-training scrub): e-mail addresses and
    * IPv4 literals replaced with typed placeholder tokens. The regexes
    * are RE2-compatible (no backrefs/lookarounds) so any engine's
    * regexp_replace agrees byte-for-byte. The email host alternative
    * includes bare IPv4 hosts — otherwise `bob@192.168.1.10` would
    * survive as `bob@<IP>`, leaking the identifying local part. */
  val EmailRe = "[A-Za-z0-9._%+-]+@" +
    "(?:[A-Za-z0-9.-]+\\.[A-Za-z]{2,}|\\d{1,3}(?:\\.\\d{1,3}){3})"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"), Ipv4Re, "<IP>")

  def piiCounts(text: Column): (Column, Column) = (
    size(regexp_extract_all(text, lit(EmailRe), lit(0))),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))))
}
