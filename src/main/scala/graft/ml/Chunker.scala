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

  def splitSentences(text: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    // pre-split very long inputs so the iterator never sees >1M chars
    // (reference embedding_model_helpers.py:87-92)
    text.grouped(PreSplitChars).foreach { block =>
      val it = BreakIterator.getSentenceInstance(Locale.ROOT)
      it.setText(block)
      var start = it.first()
      var end = it.next()
      while (end != BreakIterator.DONE) {
        val s = block.substring(start, end).trim
        if (s.nonEmpty) out += s
        start = end
        end = it.next()
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
