package graft.ml

import java.text.BreakIterator
import java.util.Locale

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Sentence-bounded chunking (reference M1:
  * embedding_model_helpers.py:68-100,166-225): normalize whitespace
  * (backlines then space runs, regular_expression.py:52,57), split text
  * into sentences, pack consecutive sentences into slices of at most
  * `maxWords` words, truncate a single over-long sentence to
  * `maxWords - 1` words + "..." (which then CO-PACKS with following
  * sentences like any other — embedding_model_helpers.py:198-213), and
  * pre-split inputs over 1M chars (the reference's spaCy cap).
  *
  * The packing algorithm is the reference's EXACTLY (its own unit-test
  * golden values pass verbatim — ChunkerParitySpec). The one remaining
  * divergence is the sentence segmenter: the reference's spaCy
  * `xx_sent_ud_sm` model isn't reproducible on the JVM, so boundaries
  * come from ICU BreakIterator; ChunkerParitySpec QUANTIFIES the gap
  * (boundary agreement vs a UD-style rule proxy over the reference's own
  * fixture corpus) instead of hand-waving it, and the property spec keeps
  * the invariants (word cap, order, coverage) segmenter-independent.
  *
  * Row-local generator (UDF -> posexplode): parallel over documents, the
  * order_sequence is the slice position (reference W3).
  */
object Chunker {

  val PreSplitChars = 1000000

  /** Abbreviations that end in '.' but do not end a sentence — the
    * UD/spaCy exceptions ICU's locale-free rules miss most often in
    * academic prose (measured on the reference's fixture corpus:
    * ChunkerParitySpec). Compared lowercased against the final token
    * before a candidate boundary, closing quotes/brackets stripped. */
  private val Abbreviations: Set[String] = Set(
    "e.g.", "i.e.", "etc.", "cf.", "al.", "et al.", "ibid.", "viz.",
    "vs.", "fig.", "figs.", "p.", "pp.", "no.", "nos.", "vol.",
    "vols.", "ch.", "chap.", "sec.", "ed.", "eds.", "dr.", "mr.",
    "mrs.", "ms.", "prof.", "st.", "jr.", "sr.", "inc.", "ltd.",
    "approx.", "dept.", "univ.", "resp.")

  /** True when the ICU boundary at block[end] should be SUPPRESSED
    * (merged with the following sentence):
    *  - abbreviation guard: the last token of the finished sentence is
    *    a known '.'-final abbreviation ("...see fig. 3 below...")
    *  - citation-bracket guard: the next sentence opens with a '(' or
    *    '[' — in academic text that is a trailing citation
    *    "...project." (Danby 2017: 79)" that UD segmenters keep
    *    attached to the sentence it cites. */
  private def suppressBoundary(block: String, start: Int,
      end: Int): Boolean = {
    // next non-space char after the boundary
    var i = end
    while (i < block.length && Character.isWhitespace(block.charAt(i))) i += 1
    if (i < block.length &&
        (block.charAt(i) == '(' || block.charAt(i) == '[')) return true
    // last whitespace-token of the finished sentence, sans closing marks
    var e = end
    while (e > start && Character.isWhitespace(block.charAt(e - 1))) e -= 1
    var b = e
    while (b > start && !Character.isWhitespace(block.charAt(b - 1))) b -= 1
    if (e <= b) return false
    val tok = block.substring(b, e)
      .replaceAll("[\"'“”‘’»«)\\]]+$", "")
      .toLowerCase(Locale.ROOT)
    Abbreviations.contains(tok)
  }

  /** EMITTED sentence boundaries of one <=1M-char block: ICU
    * boundaries minus the suppressed ones (ChunkerParitySpec measures
    * these against the UD rule proxy). Block-relative offsets;
    * excludes offset 0, includes block.length. */
  private[graft] def blockBoundaries(block: String): Seq[Int] = {
    val it = BreakIterator.getSentenceInstance(Locale.ROOT)
    it.setText(block)
    val bounds = mutable.ArrayBuffer(it.first())
    var b = it.next()
    while (b != BreakIterator.DONE) { bounds += b; b = it.next() }
    val out = mutable.ArrayBuffer.empty[Int]
    // suppressed ICU boundaries extend the current run instead of
    // flushing it (the final boundary always flushes)
    var runStart = bounds.head
    var i = 1
    while (i < bounds.length) {
      val end = bounds(i)
      if (i == bounds.length - 1 ||
          !suppressBoundary(block, runStart, end)) {
        out += end
        runStart = end
      }
      i += 1
    }
    out.toSeq
  }

  def splitSentences(text: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    // pre-split very long inputs so the iterator never sees >1M chars
    // (reference embedding_model_helpers.py:87-92)
    text.grouped(PreSplitChars).foreach { block =>
      var runStart = 0
      blockBoundaries(block).foreach { end =>
        val s = block.substring(runStart, end).trim
        if (s.nonEmpty) out += s
        runStart = end
      }
    }
    out.toSeq
  }

  private def wordCount(s: String): Int =
    s.split("\\s+").count(_.nonEmpty)

  /** Pack sentences into word-capped slices — the reference's packing
    * loop VERBATIM (embedding_model_helpers.py:190-225): an over-long
    * sentence truncates to the first `maxWords - 1` words with "..."
    * fused onto the last word, then flows through the SAME packing
    * branch as any other sentence (so a truncated sentence co-packs
    * with its successors); a sentence that would overflow the running
    * slice flushes it first. Never splits a sentence otherwise. */
  def packSlices(sentences: Seq[String], maxWords: Int): Seq[String] = {
    val slices = mutable.ArrayBuffer.empty[String]
    val current = mutable.ArrayBuffer.empty[String]
    var currentWords = 0
    def flush(): Unit = {
      if (current.nonEmpty) { slices += current.mkString(" "); current.clear() }
      currentWords = 0
    }
    sentences.foreach { s0 =>
      var s = s0
      var w = wordCount(s)
      if (w > maxWords) {
        s = s.split("\\s+").filter(_.nonEmpty)
          .take(math.max(maxWords - 1, 0)).mkString(" ") + "..."
        w = wordCount(s)
      }
      if (currentWords + w > maxWords) flush()
      current += s
      currentWords += w
    }
    flush()
    slices.toSeq
  }

  /** The reference's pre-segmentation normalization
    * (embedding_model_helpers.py:181-185): backline runs to one space,
    * then space runs to one space, then strip. */
  def normalizeWs(text: String): String =
    text.replaceAll("\n+", " ").replaceAll(" +", " ").trim

  def chunkText(text: String, maxWords: Int): Seq[String] = {
    if (text == null) return Seq.empty
    val norm = normalizeWs(text)
    if (norm.isEmpty) Seq.empty
    else packSlices(splitSentences(norm), maxWords)
  }

  def chunkUdf(maxWords: Int): UserDefinedFunction =
    udf { (text: String) => chunkText(text, maxWords) }

  /** PORTABLE sentence split (q122's oracle tier): a pinned greedy
    * regex — runs of non-terminators plus their trailing [.!?]+ — that
    * Java regex and RE2 match identically (no lookbehind: RE2 has
    * none). This is NOT the production splitter (BreakIterator handles
    * abbreviations/ellipses far better — the M1 surface, q38); its job
    * is to make the PACKING loop cross-engine-verifiable: with
    * boundaries any engine can reproduce, `packSlices`' greedy
    * flush/truncate/co-pack decisions replay in SQL (a resettable
    * cumsum via recursive CTE), so the reference's packing algorithm is
    * hash-checked, not just golden-tested. */
  private val PortableSentence = "[^.!?]+[.!?]*".r

  def portableSentences(text: String): Seq[String] =
    if (text == null) Seq.empty
    else PortableSentence.findAllIn(normalizeWs(text))
      .map(_.trim).filter(_.nonEmpty).toSeq

  def chunkPortableUdf(maxWords: Int): UserDefinedFunction =
    udf { (text: String) =>
      val sents = portableSentences(text)
      if (sents.isEmpty) Seq.empty[String]
      else packSlices(sents, maxWords)
    }

  def chunkPortable(text: Column, maxWords: Int): Column =
    chunkPortableUdf(maxWords)(text)

  /** Column form: array of slice bodies, ready for posexplode (position =
    * order_sequence). */
  def slices(text: Column, maxWords: Int): Column =
    chunkUdf(maxWords)(text)
}
