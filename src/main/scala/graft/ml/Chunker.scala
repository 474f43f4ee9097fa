package graft.ml

import java.text.BreakIterator
import java.util.Locale

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Sentence-bounded chunking (reference M1:
  * embedding_model_helpers.py:68-100,166-225): split text into sentences,
  * pack consecutive sentences into slices of at most `maxWords` words,
  * truncate a single over-long sentence to `maxWords` words with an
  * ellipsis, and pre-split inputs over 1M chars (the reference's spaCy
  * cap).
  *
  * The reference's spaCy `xx_sent_ud_sm` boundaries aren't reproducible on
  * the JVM; per SURVEY §7.5.3 we define the chunker spec with ICU
  * BreakIterator and test invariants (word cap, order, coverage) rather
  * than token-identical output.
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

  /** Pack sentences into word-capped slices; never split a sentence except
    * when a single sentence exceeds the cap (then truncate + "…",
    * reference embedding_model_helpers.py:93-100). */
  def packSlices(sentences: Seq[String], maxWords: Int): Seq[String] = {
    val slices = mutable.ArrayBuffer.empty[String]
    val current = mutable.ArrayBuffer.empty[String]
    var currentWords = 0
    def flush(): Unit = {
      if (current.nonEmpty) { slices += current.mkString(" "); current.clear() }
      currentWords = 0
    }
    sentences.foreach { s =>
      val w = wordCount(s)
      if (w > maxWords) {
        flush()
        slices += s.split("\\s+").filter(_.nonEmpty)
          .take(maxWords).mkString(" ") + "…"
      } else if (currentWords + w > maxWords) {
        flush(); current += s; currentWords = w
      } else {
        current += s; currentWords += w
      }
    }
    flush()
    slices.toSeq
  }

  def chunkText(text: String, maxWords: Int): Seq[String] =
    if (text == null || text.trim.isEmpty) Seq.empty
    else packSlices(splitSentences(text), maxWords)

  def chunkUdf(maxWords: Int): UserDefinedFunction =
    udf { (text: String) => chunkText(text, maxWords) }

  /** Column form: array of slice bodies, ready for posexplode (position =
    * order_sequence). */
  def slices(text: Column, maxWords: Int): Column =
    chunkUdf(maxWords)(text)
}
