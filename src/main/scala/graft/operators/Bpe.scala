package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer trained IN-ENGINE (Sennrich et al.
  * 2016, the GPT-2 tokenizer family's shape) — the piece that turns
  * the engine's token-count ESTIMATES (sequence packing, q85; Gopher
  * word stats) into real subword token streams.
  *
  * Scale split, the k-means/centroid discipline: the only corpus-sized
  * work is ONE distributed word count (groupBy word — the shuffle);
  * BPE training itself runs on the BOUNDED word-frequency table
  * (vocabulary size, not corpus size — Sennrich's algorithm is
  * sequential in the merge order by definition, and the vocab table at
  * 100 TB is still ~millions of rows where the corpus is trillions of
  * tokens; `maxVocab` caps the driver copy explicitly and loudly).
  * Encoding is embarrassingly parallel: merge ranks broadcast, one
  * row-local greedy pass per word.
  *
  * DETERMINISTIC: pair counts are exact longs; the argmax merge
  * tie-breaks lexicographically on the pair, so the merge sequence is
  * a pure function of the word-count table — identical across
  * partitionings, reruns, engines.
  */
object Bpe {

  /** End-of-word marker: a WHITESPACE character, which is the one
    * class of symbol that provably cannot collide — words are \s+
    * split, so no initial symbol contains it, and merge products are
    * concatenations of initial symbols, so no merge can SYNTHESIZE it
    * either (the classic "&lt;/w&gt;" marker fails that second test:
    * three merges over an HTML-bearing corpus build the literal
    * "</w>" and conflate a mid-word token with the word boundary). */
  private[graft] val Eow = "\n"

  final case class Model(merges: Seq[(String, String)],
      alphabet: Seq[String] = Nil) {
    /** rank map for the encoder: pair -> merge priority */
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Deterministic token -> id table (the vocab.json half of the HF
      * tokenizer-artifact pair, derived instead of stored separately):
      * Eow, then the training alphabet in sorted order, then merge
      * products in merge order, first occurrence wins. A pure function
      * of the model, so two JVMs loading the same artifact agree on
      * every id. */
    @transient lazy val tokenIds: Map[String, Int] = {
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      (Eow +: alphabet) ++ merges.map { case (a, b) => a + b } foreach {
        tok => if (!seen.contains(tok)) seen.update(tok, seen.size)
      }
      seen.toMap
    }
  }

  // ---- tokenizer artifact I/O (the merges.txt/vocab.json seam of the
  // reference's HF tokenizer, embedding_model_helpers.py:34-65, as ONE
  // self-contained file). Line format needs escaping because Eow IS a
  // newline: symbols are escaped (\\, \n, \t, \r), merges are
  // tab-separated pairs, alphabet one symbol per line. ----

  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\t' => "\\t"
    case '\r' => "\\r"
    case c => c.toString
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        sb += (s.charAt(i + 1) match {
          case 'n' => '\n'
          case 't' => '\t'
          case 'r' => '\r'
          case c => c
        })
        i += 2
      } else { sb += s.charAt(i); i += 1 }
    }
    sb.toString
  }

  private val ArtifactHeader = "graft-bpe-v1"

  /** Write a trained model as a portable tokenizer artifact. */
  def save(model: Model, path: String): Unit = {
    val sb = new StringBuilder(ArtifactHeader).append('\n')
    model.alphabet.foreach(a => sb.append("A ").append(esc(a)).append('\n'))
    model.merges.foreach { case (a, b) =>
      sb.append("M ").append(esc(a)).append('\t').append(esc(b)).append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Load a tokenizer artifact written by [[save]]. */
  def loadModel(path: String): Model = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path),
      java.nio.charset.StandardCharsets.UTF_8)
    require(!lines.isEmpty && lines.get(0) == ArtifactHeader,
      s"$path is not a $ArtifactHeader tokenizer artifact")
    val alphabet = Seq.newBuilder[String]
    val merges = Seq.newBuilder[(String, String)]
    lines.subList(1, lines.size).forEach { line =>
      if (line.startsWith("A ")) alphabet += unesc(line.substring(2))
      else if (line.startsWith("M ")) {
        val t = line.substring(2).split("\t", 2)
        require(t.length == 2, s"malformed merge line in $path: '$line'")
        merges += ((unesc(t(0)), unesc(t(1))))
      } else if (line.nonEmpty)
        throw new IllegalArgumentException(
          s"unknown record in $path: '$line'")
    }
    Model(merges.result(), alphabet.result())
  }

  /** Train `numMerges` merges. `minWordCount` prunes the long tail of
    * the word table before it reaches the driver; `maxVocab` is the
    * loud driver-memory bound (train on a SAMPLE or raise the floor if
    * it trips — silently truncating would bias the merges). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minWordCount: Long = 1L, maxVocab: Int = 200000): Model = {
    val words = df
      .select(explode(filter(split(col(textCol), "\\s+"),
        w => length(w) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minWordCount)
    val vocabRows = words.limit(maxVocab + 1).collect()
    require(vocabRows.length <= maxVocab,
      s"word table exceeds maxVocab=$maxVocab after " +
        s"minWordCount=$minWordCount pruning — raise the floor or " +
        "train on a sample (silent truncation would bias the merges)")
    // symbol sequences per word, weighted by corpus frequency
    var vocab: Array[(Array[String], Long)] = vocabRows.map { r =>
      (initialSymbols(r.getString(0)), r.getLong(1))
    }
    // training alphabet (sorted, Eow excluded) — the id-table base of
    // the tokenizer artifact; bounded by the capped word table
    val alphabet = vocab.iterator.flatMap(_._1).filter(_ != Eow)
      .toSeq.distinct.sorted
    val merges = Seq.newBuilder[(String, String)]
    var m = 0
    while (m < numMerges) {
      // exact pair counts over the bounded vocab table
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      vocab.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + cnt)
          i += 1
        }
      }
      if (counts.isEmpty) m = numMerges
      else {
        // argmax with LEXICOGRAPHIC tie-break: determinism contract
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        val (pa, pb) = best._1
        merges += ((pa, pb))
        val joined = pa + pb
        vocab = vocab.map { case (syms, cnt) =>
          (mergePair(syms, pa, pb, joined), cnt)
        }
        m += 1
      }
    }
    Model(merges.result(), alphabet)
  }

  /** Initial symbol sequence of a word: one symbol per CODE POINT
    * (plus the end-of-word marker). Splitting on UTF-16 code units
    * (`word.map(_.toString)`) tears non-BMP characters — emoji,
    * supplementary CJK — into unpaired surrogate halves: the emitted
    * tokens are invalid Unicode and a merge can pair a low surrogate
    * with an unrelated symbol. */
  private def initialSymbols(word: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](
      word.length + 1)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out += Eow
    out.toArray
  }

  private def mergePair(syms: Array[String], a: String, b: String,
      joined: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += joined
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Row-local subword encode of raw text: \s+ word split, then the
    * greedy rank-order merge per word. Same loop [[encode]]'s UDF runs —
    * exposed for executor-side callers that hold a broadcast/singleton
    * rank map (TensorFileEmbedder's subword tokenization). */
  def encodeText(text: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    if (text == null) Array.empty[String]
    else text.split("\\s+").filter(_.nonEmpty)
      .flatMap(w => encodeWord(w, ranks))
  }

  /** Greedy rank-order encode of one word (the standard BPE encode
    * loop: repeatedly merge the lowest-rank adjacent pair). */
  private def encodeWord(word: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = initialSymbols(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        val joined = syms(bestIdx) + syms(bestIdx + 1)
        syms = mergePair(syms, syms(bestIdx), syms(bestIdx + 1), joined)
      }
    }
    syms
  }

  /** (idCol, tokens array<string>, n_tokens) — row-local encode with
    * the broadcast rank map; unseen characters survive as single-char
    * tokens (no OOV loss). */
  def encode(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val bc = sc.broadcast(model.ranks)
    val enc = udf { (text: String) => encodeText(text, bc.value) }
    df.select(col(idCol), enc(col(textCol)).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** Oracle-SQL generator: the DuckDB replay of `train` + `encode` for
    * the q95 workload — kept NEXT to the trainer so they can't drift.
    * The sequential merge loop (the reason q95 sat rows-only since its
    * round) unrolls to `numMerges` MATERIALIZED CTE stages; each stage
    * counts adjacent symbol pairs over the bounded vocab (exact longs),
    * picks the argmax with the engine's exact (count DESC, a ASC,
    * b ASC) tie-break, and applies the merge as a string replace over a
    * control-char-wrapped symbol string — `replace` scans left-to-right
    * non-overlapping over the ORIGINAL string, which is precisely
    * `mergePair`'s semantics; the U+001F/U+001E wrappers make symbol
    * boundaries unambiguous (no initial symbol contains them — words
    * are \s+ split — and merge products are concatenations of initial
    * symbols, so no merge can synthesize them: the Eow argument). The
    * encode loop unrolls to `encK` stages of per-word lowest-rank-pair
    * merges; `encK` must be >= the corpus' max word length (each
    * iteration removes >= 1 symbol) — testdata words cap at 8 chars,
    * and a drift past encK shows up as a hash MISMATCH, never silence.
    * MATERIALIZED is load-bearing: without it DuckDB inlines each
    * doubly-referenced stage and evaluation goes exponential. */
  def oracleSql(numMerges: Int = 200, encK: Int = 12,
      minWordCount: Long = 2L): String = {
    val U = "chr(31)"
    val R = "chr(30)"
    def rebuild(wrapped: String): String =
      s"list_transform(string_split(trim($wrapped, $U || $R), $R || $U), x -> x)"
    def wrap(syms: String): String =
      s"list_aggregate(list_transform($syms, x -> $U || x || $R), 'string_agg', '')"
    val sb = new StringBuilder
    sb ++= s"""wordocc AS MATERIALIZED (
       SELECT doc_id, unnest(list_filter(
         string_split_regex(text, '\\s+'), x -> x <> '')) AS w
       FROM documents),
     wc AS MATERIALIZED (
       SELECT w, count(*) AS cnt FROM wordocc GROUP BY w
       HAVING count(*) >= $minWordCount),
     v0 AS MATERIALIZED (
       SELECT w, cnt, list_concat(
         list_transform(range(1, length(w) + 1), i -> w[i]),
         [chr(10)]) AS syms
       FROM wc)"""
    for (t <- 0 until numMerges) {
      sb ++= s""",
     p$t AS MATERIALIZED (
       SELECT pr[1] AS a, pr[2] AS b, sum(cnt) AS c FROM (
         SELECT cnt, unnest(list_zip(
           syms[1:len(syms) - 1], syms[2:len(syms)])) AS pr
         FROM v$t WHERE len(syms) > 1) GROUP BY 1, 2),
     b$t AS MATERIALIZED (
       SELECT a, b FROM p$t ORDER BY c DESC, a ASC, b ASC LIMIT 1),
     v${t + 1} AS MATERIALIZED (
       SELECT w, cnt,
         CASE WHEN NOT EXISTS (SELECT 1 FROM b$t) THEN syms
         ELSE ${rebuild(s"""replace(${wrap("syms")},
             $U || (SELECT a FROM b$t) || $R || $U || (SELECT b FROM b$t) || $R,
             $U || (SELECT a FROM b$t) || (SELECT b FROM b$t) || $R)""")}
         END AS syms
       FROM v$t)"""
    }
    val mtab = (0 until numMerges)
      .map(t => s"SELECT $t AS rank, a, b FROM b$t")
      .mkString(" UNION ALL ")
    sb ++= s""",
     mtab AS MATERIALIZED ($mtab),
     aw AS MATERIALIZED (SELECT DISTINCT w FROM wordocc),
     e0 AS MATERIALIZED (
       SELECT w, list_concat(
         list_transform(range(1, length(w) + 1), i -> w[i]),
         [chr(10)]) AS syms
       FROM aw)"""
    for (t <- 0 until encK) {
      sb ++= s""",
     eb$t AS MATERIALIZED (
       SELECT w, a, b FROM (
         SELECT q.w, q.a, q.b, row_number() OVER (
           PARTITION BY q.w ORDER BY m.rank ASC) AS rn
         FROM (
           SELECT DISTINCT w, pr[1] AS a, pr[2] AS b FROM (
             SELECT w, unnest(list_zip(
               syms[1:len(syms) - 1], syms[2:len(syms)])) AS pr
             FROM e$t WHERE len(syms) > 1)) q
         JOIN mtab m ON m.a = q.a AND m.b = q.b) t
       WHERE rn = 1),
     e${t + 1} AS MATERIALIZED (
       SELECT e.w,
         CASE WHEN b.w IS NULL THEN e.syms
         ELSE ${rebuild(s"""replace(${wrap("e.syms")},
             $U || b.a || $R || $U || b.b || $R,
             $U || b.a || b.b || $R)""")}
         END AS syms
       FROM e$t e LEFT JOIN eb$t b ON b.w = e.w)"""
    }
    sb ++= s"""
     SELECT d.doc_id, CAST(COALESCE(s.n, 0) AS INT) AS n_tokens
     FROM documents d
     LEFT JOIN (
       SELECT o.doc_id, sum(len(e.syms)) AS n
       FROM wordocc o JOIN e$encK e ON e.w = o.w
       GROUP BY o.doc_id) s ON s.doc_id = d.doc_id"""
    sb.toString
  }
}
