package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analytics metrics as pure Column expressions (codegen'd — no UDFs
  * in the hot path). Mirrors the reference's computed-metadata module
  * (reference: modules/computed_metadata.py) plus the quality/token/lang-id
  * operators a training-data pipeline needs.
  *
  * Every function here is a scalar over one row — embarrassingly parallel,
  * no shuffle, survives any scale-up.
  */
object TextMetrics {

  /** round with a +1e-9 nudge: Spark rounds doubles via BigDecimal
    * decimal-string (HALF_UP on the true double), DuckDB via an FP
    * multiply that can cross the .5 boundary — on near-boundary values
    * (e.g. 85.16499999999999) the two disagree. The epsilon pushes both
    * engines off the boundary the same way; oracle SQL adds the same
    * +1e-9. */
  def roundE(c: Column, scale: Int): Column = round(c + lit(1e-9), scale)

  /** Unicode script census classes — the multilingual curation signal
    * (dominant script, mixed-script spam flagging). Character classes
    * use `\x{...}` range syntax, which Java regex (Spark) and RE2
    * (the DuckDB oracle) both accept, so every count replays
    * bit-identically cross-engine; `\p{script=...}` does NOT port
    * (Java spells it IsLatin, RE2 Latin). Ranges cover each script's
    * primary block(s); rare supplementary blocks land in `other`
    * (= chars minus all counted classes), which is part of the
    * contract, not a bug. Order matters: the dominant-script
    * tie-break is first-in-this-order. */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z\\x{00C0}-\\x{024F}",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "greek" -> "\\x{0370}-\\x{03FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}",
    "devanagari" -> "\\x{0900}-\\x{097F}",
    "cjk" -> "\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}", // kana + ideographs
    "hangul" -> "\\x{AC00}-\\x{D7AF}")

  /** Characters of `text` inside the named script class. */
  def scriptCharCount(text: Column, ranges: String): Column =
    length(regexp_replace(coalesce(text, lit("")),
      s"[^$ranges]", ""))

  /** Per-document script profile: one count column per script, the
    * total of counted script chars, the dominant script (max count,
    * ties to the earlier entry in [[ScriptRanges]] — deterministic),
    * and the dominant share (4-dp, null when no script chars). All
    * integer censuses + one division — fully portable to the SQL
    * oracle. */
  def scriptProfile(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val counted = ScriptRanges.foldLeft(
        df.select(col(idCol), col(textCol))) { case (d, (n, r)) =>
      d.withColumn(n, scriptCharCount(col(textCol), r))
    }
    val names = ScriptRanges.map(_._1)
    val total = names.map(col).reduce(_ + _)
    val maxC = greatest(names.map(col): _*)
    val dominant = names.foldRight(lit("none")) { (n, rest) =>
      when(col(n) > 0 && col(n) >= maxC, lit(n)).otherwise(rest)
    }
    counted
      .withColumn("script_chars", total)
      .withColumn("dominant_script", dominant)
      .withColumn("dominant_share",
        when(col("script_chars") > 0,
          roundE(maxC.cast("double") /
            col("script_chars").cast("double"), 4)))
      .drop(textCol)
  }

  /** Word count via \w+ tokens (reference F8: computed_metadata.py:68-79;
    * WORDS_REGEX regular_expression.py:80-82). */
  def wordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+"), lit(0)))

  /** Whitespace token count (simple tokenizer; split drops no empty
    * trailing strings in Spark, so trim first). */
  def whitespaceTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Sentence count via sentence-boundary regex (reference F7:
    * computed_metadata.py:82-97; SENTENCE_REGEX \b[^.!?]+[.!?]*). Floors
    * at 1 so ratio metrics stay defined for fragment-only docs. */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[^.!?]+[.!?]*"), lit(0))),
      lit(1))

  /** Syllable estimate = vowel-group count (the reference uses Pyphen
    * hyphenation, computed_metadata.py:115-135 — a dictionary approach we
    * deliberately replace with the standard vowel-cluster heuristic; same
    * downstream Flesch formula). */
  def syllableCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))

  /** Flesch reading-ease, clamped to [0,100] (reference F10:
    * computed_metadata.py:156-180; per-language constants
    * constants.py:130-161 — English constants used when lang unknown). */
  def fleschReadingEase(text: Column, base: Double = 206.835,
      sentenceWeight: Double = 1.015, syllableWeight: Double = 84.6): Column = {
    val words = wordCount(text).cast("double")
    val sentences = sentenceCount(text).cast("double")
    val syllables = syllableCount(text).cast("double")
    val raw = lit(base) -
      lit(sentenceWeight) * (words / sentences) -
      lit(syllableWeight) * (syllables / greatest(words, lit(1.0)))
    roundE(least(greatest(raw, lit(0.0)), lit(100.0)), 2)
  }

  /** Reading duration in seconds = words / lang-speed * 60 (reference F11:
    * computed_metadata.py:183-198; per-lang speeds constants.py:117-128). */
  def readingDurationSeconds(text: Column, wordsPerMinute: Column): Column =
    roundE(wordCount(text).cast("double") / wordsPerMinute * 60.0, 2)

  /** Per-language reading speeds (reference: constants.py:117-128). */
  val readingSpeeds: Map[String, Double] = Map(
    "en" -> 228.0, "fr" -> 195.0, "es" -> 218.0, "de" -> 179.0,
    "it" -> 188.0, "pt" -> 181.0, "zh" -> 158.0, "ja" -> 193.0)
  val defaultReadingSpeed = 200.0

  def readingSpeedFor(lang: Column): Column = {
    val m = map(readingSpeeds.toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    coalesce(element_at(m, lang), lit(defaultReadingSpeed))
  }

  // --- Quality scoring (training-data pipeline ops; BASELINE.json north
  // star) — length / punctuation / stopword ratios, composable into a
  // single score column. ---

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Fraction of whitespace tokens that are stopwords. */
  def stopwordRatio(text: Column,
      stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = split(trim(text), "\\s+")
    val stops = filter(toks, t => t.isin(stopwords.map(x => x: Any): _*))
    roundE(size(stops).cast("double") /
      greatest(size(toks), lit(1)).cast("double"), 4)
  }

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    roundE(size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0)))
      .cast("double") / greatest(length(text), lit(1)).cast("double"), 4)

  /** Mean whitespace-token length. */
  def meanWordLength(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    roundE(aggregate(toks, lit(0).cast("long"),
      (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks), lit(1)).cast("double"), 4)
  }

  /** Composite quality heuristic in [0,1]: long-enough, low punctuation
    * noise, some-but-not-all stopwords. Gopher/C4-style rule shape. */
  def qualityScore(text: Column): Column = {
    val lenOk = when(length(text).between(50, 100000), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.2, 1.0).otherwise(0.0)
    val stopOk = when(stopwordRatio(text).between(0.001, 0.6), 1.0)
      .otherwise(0.0)
    val wordLenOk = when(meanWordLength(text).between(2.0, 12.0), 1.0)
      .otherwise(0.0)
    roundE((lenOk + punctOk + stopOk + wordLenOk) / 4.0, 4)
  }

  /** Gopher-style document-quality rules (Rae et al. 2021, §A1.1 — the
    * canonical LLM-training-data admission filter): word-count bounds,
    * mean-word-length bounds, symbol-to-word ratios, bullet/ellipsis
    * line fractions, alphabetic-word fraction, minimum stopword
    * diversity. Every flag is computed with INTEGER arithmetic
    * (ratio <= k/10 becomes count*10 <= total*k), so the output is
    * bitwise stable across engines — no float rounding in the oracle
    * compare. Pure column expressions, one pass, no shuffle. */
  def gopherStruct(text: Column): Column = {
    val ws = split(trim(text), "\\s+")
    val words = size(ws).cast("long")
    val mwlNum = aggregate(ws, lit(0L), (a, t) => a + length(t))
    val hashes = (length(text) -
      length(translate(text, "#", ""))).cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val ellLines = size(filter(lines,
      l => endswith(rtrim(l), lit("...")))).cast("long")
    val bulLines = size(filter(lines, l =>
      startswith(ltrim(l), lit("-")) || startswith(ltrim(l), lit("*")) ||
        startswith(ltrim(l), lit("•")))).cast("long")
    val alphaWords = size(filter(ws,
      w => w.rlike("[A-Za-z]"))).cast("long")
    val stopArr = array(Seq("the", "be", "to", "of", "and", "that",
      "have", "with").map(lit): _*)
    val stopHits = size(array_intersect(
      array_distinct(transform(ws, w => lower(w))), stopArr)).cast("long")
    val wcOk = words >= 50 && words <= 100000
    val mwlOk = mwlNum >= words * 3 && mwlNum <= words * 10
    val hashOk = hashes * 10 <= words
    val ellOk = ellLines * 10 <= nLines * 3
    val bulOk = bulLines * 10 <= nLines * 9
    val alphaOk = alphaWords * 5 >= words * 4
    val stopOk = stopHits >= 2
    struct(
      words.as("word_count"),
      wcOk.as("wc_ok"), mwlOk.as("mwl_ok"), hashOk.as("hash_ok"),
      ellOk.as("ellipsis_ok"), bulOk.as("bullet_ok"),
      alphaOk.as("alpha_ok"), stopOk.as("stop_ok"),
      (wcOk && mwlOk && hashOk && ellOk && bulOk && alphaOk && stopOk)
        .as("keep"))
  }

  /** n-gram-profile language-ID heuristic: score text against tiny
    * per-language marker-word profiles; returns best-scoring language or
    * "und". (The reference uses the lingua library, F12:
    * computed_metadata.py:202-237 — a model dependency we replace with a
    * deterministic heuristic; the routing semantics downstream are what
    * matter.) Pure column expression: one pass, no shuffle. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "that"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "de", "que", "los", "las"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  def langIdHeuristic(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      struct(
        size(filter(toks, t => t.isin(markers.map(x => x: Any): _*)))
          .as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Reference F12 cross-check (computed_metadata.py:202-237 —
    * identify_document_language): detect the language of content AND
    * description independently, flag disagreement, and keep a
    * confidence per side. The reference's lingua confidences become the
    * marker-hit ratio of the winning language (same struct shape;
    * detector quality is the documented divergence, the dataflow —
    * skip-if-lang-present, per-side detection, are_different flag — is
    * reference-exact). */
  def langConsistency(content: Column, description: Column): Column = {
    def side(text: Column): Column = {
      val toks = split(lower(trim(text)), "\\s+")
      val scores = langMarkers.toSeq.sortBy(_._1).map {
        case (lang, markers) =>
          struct(
            size(filter(toks, t => t.isin(markers.map(x => x: Any): _*)))
              .as("score"),
            lit(lang).as("lang"))
      }
      val best = array_max(array(scores: _*))
      struct(
        when(best.getField("score") > 0, best.getField("lang"))
          .otherwise("und").as("language"),
        round(best.getField("score").cast("double") /
          greatest(size(toks), lit(1)) + 1e-9, 4).as("confidence"))
    }
    val c = side(content)
    val d = side(description)
    struct(
      (c.getField("language") =!= d.getField("language"))
        .as("are_different"),
      d.as("description"),
      c.as("content"))
  }

  /** BPE-ish token-count estimate: words + punctuation marks + one token
    * per 4 chars of long words (crude but deterministic; token counting for
    * budget accounting at corpus scale). */
  def tokenCountEstimate(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w{1,4}|[^\\w\\s]"), lit(0)))

  /** Document fingerprint = md5 of whitespace-normalized lowercase text.
    * Cross-engine stable (md5 is identical in Spark and DuckDB), used for
    * exact dedup at any scale (hash-groupBy distributes evenly). */
  /** Fraction of lines that are exact duplicates of an earlier line
    * (Gopher-style repetition filter — boilerplate/nav-menu pages score
    * high). Single-pass UDF per row (line sets are tiny; see the HOF
    * lambda trap in ARCHITECTURE). */
  val duplicateLineFraction: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (text: String) =>
      if (text == null) 0.0
      else {
        val lines = text.split("\n").map(_.trim).filter(_.nonEmpty)
        if (lines.length == 0) 0.0
        else {
          val seen = new java.util.HashSet[String]()
          var dups = 0
          lines.foreach(l => if (!seen.add(l)) dups += 1)
          math.rint(dups.toDouble / lines.length * 10000) / 10000
        }
      }
    }

  /** Shannon entropy of the character distribution in bits — extremely
    * low entropy flags degenerate/repeated-character text, a standard
    * training-data quality signal. */
  val charEntropy: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (text: String) =>
      if (text == null || text.isEmpty) 0.0
      else {
        val counts = new java.util.HashMap[Char, Int]()
        text.foreach(c => counts.merge(c, 1, Integer.sum))
        val n = text.length.toDouble
        var h = 0.0
        counts.values.forEach { c =>
          val p = c / n
          h -= p * math.log(p) / math.log(2)
        }
        math.rint(h * 10000) / 10000
      }
    }

  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Integer repetition statistics (Rae et al. 2021 §A1.1 repetition
    * filters, oracle-stable counterpart of duplicateLineFraction):
    * duplicate-line count and the most-frequent word-2-gram's
    * occurrence count and character length. All INTEGERS — callers form
    * the paper's ratio thresholds as cross-multiplied integer compares
    * (count*len*5 <= chars instead of float fractions), so the output
    * hash-matches any engine. One JVM pass per document; ties on the
    * top 2-gram resolve to the LONGEST gram among the most frequent
    * (deterministic, engine-expressible as two nested maxes). */
  final case class RepetitionStats(n_lines: Int, dup_lines: Int,
      n_grams: Int, top2_count: Int, top2_len: Int, text_chars: Int)

  val repetitionStats: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (text: String) =>
      if (text == null) RepetitionStats(0, 0, 0, 0, 0, 0)
      else {
        val lines = text.split("\n", -1)
        val distinct = new java.util.HashSet[String]()
        lines.foreach(distinct.add)
        // tokens = non-empty \s+ splits of the RAW text. No trim: Java
        // String.trim strips all control chars <= U+0020 while SQL trim
        // strips spaces only, so any trim makes the two engines
        // tokenize "hello world\n" differently. Filtering empties on
        // BOTH sides is whitespace-shape-agnostic.
        val ws = text.split("\\s+").filter(_.nonEmpty)
        val counts = new java.util.HashMap[String, Int]()
        var i = 0
        while (i + 1 < ws.length) {
          counts.merge(ws(i) + " " + ws(i + 1), 1, Integer.sum)
          i += 1
        }
        // CODE POINTS, not UTF-16 units: cross-engine length() counts
        // characters, and a supplementary char would skew the stats
        def cp(s: String): Int = s.codePointCount(0, s.length)
        var topCount = 0
        var topLen = 0
        counts.forEach { (g, c) =>
          if (c > topCount) { topCount = c; topLen = cp(g) }
          else if (c == topCount && cp(g) > topLen) topLen = cp(g)
        }
        RepetitionStats(lines.length, lines.length - distinct.size,
          math.max(ws.length - 1, 0), topCount, topLen, cp(text))
      }
    }
}
