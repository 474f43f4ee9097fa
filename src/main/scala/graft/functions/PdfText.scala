package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PDF text refinement (reference S15/F13-F15:
  * modules/pdf_extractor.py:81-183,186-253): the reference pipes PDFs
  * through a Tika sidecar then repairs the extracted per-page text —
  * repeated header/footer removal ("RefineDoc"), dehyphenation, ligature
  * replacement, non-printable stripping. The Tika call itself is a
  * network fetch (stubbed here, like every fetch stage — this container
  * has no egress); the refinement operators below are the real,
  * column-native implementations.
  */
object PdfText {

  /** Remove headers/footers that repeat across pages: a leading/trailing
    * line is boilerplate when it appears verbatim on at least
    * `minRepeat` of the pages (reference RefineDoc semantics:
    * pdf_extractor.py:17-78). Input: array<string> of page texts.
    * Pure array expressions — per-document, no shuffle. */
  def removeRepeatedHeadersFooters(pages: Column,
      minRepeatFraction: Double = 0.5): Column = {
    val firstLines = transform(pages,
      p => element_at(split(p, "\n"), 1))
    val lastLines = transform(pages,
      p => element_at(split(p, "\n"), -1))
    def repeated(lines: Column): Column =
      filter(array_distinct(lines), l =>
        size(filter(lines, x => x === l))
          .cast("double") >= size(pages) * minRepeatFraction &&
        size(pages) > 1)
    val headers = repeated(firstLines)
    val footers = repeated(lastLines)
    transform(pages, p => {
      val lines = split(p, "\n")
      val noHeader = when(array_contains(headers,
          element_at(lines, 1)), slice(lines, lit(2), size(lines) - 1))
        .otherwise(lines)
      val noFooter = when(size(noHeader) > 0 && array_contains(footers,
          element_at(noHeader, -1)),
          slice(noHeader, lit(1), size(noHeader) - 1))
        .otherwise(noHeader)
      concat_ws("\n", noFooter)
    })
  }

  /** Strip ISO control characters except newline/tab (reference F15:
    * pdf_extractor.py:117-143). */
  def stripNonPrintable(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")

  /** Full page-refinement chain: headers/footers -> join pages ->
    * ligatures -> dehyphenate -> control chars -> whitespace. */
  def refinePages(pages: Column): Column = {
    val cleaned = removeRepeatedHeadersFooters(pages)
    val joined = concat_ws("\n", cleaned)
    TextClean.normalizeWhitespace(
      stripNonPrintable(
        TextClean.dehyphenate(
          TextClean.replaceLigatures(joined))))
  }

  /** Size-admission guard (reference R11: HEAD content-length check
    * before GET, pdf_extractor.py:186-203): predicate over a declared
    * byte-size column so oversized files never reach the fetch stage. */
  def admitBySize(sizeBytes: Column, maxBytes: Long = 2000000L): Column =
    sizeBytes.isNotNull && sizeBytes <= maxBytes

  /** Per-page text extraction from raw PDF bytes (PdfExtract — the
    * in-engine replacement for the reference's Tika sidecar; see that
    * object's scaladoc for the supported subset). binary -> array<string>,
    * row-local. */
  def extractPages(pdf: Column): Column = {
    val f = udf { (bytes: Array[Byte]) => PdfExtract.pages(bytes) }
    f(pdf)
  }

  /** [[extractPages]] with a per-row USER password column (round 11 —
    * password-protected corpus files whose password rides alongside
    * the payload; null/empty means the empty user password). Wrong
    * passwords yield an empty page array, so the needsPassword overload
    * below routes them to the error channel instead of emitting
    * garbage. */
  def extractPages(pdf: Column, password: Column): Column = {
    val f = udf { (bytes: Array[Byte], pass: String) =>
      PdfExtract.pages(bytes, if (pass == null) "" else pass)
    }
    f(pdf, password)
  }

  /** needsPassword with a candidate password column: true only when
    * the file stays locked even WITH the supplied password. */
  def needsPassword(pdf: Column, password: Column): Column = {
    val f = udf { (bytes: Array[Byte], pass: String) =>
      PdfExtract.isEncrypted(bytes) &&
        PdfCrypt.handlerFor(bytes,
          if (pass == null) "" else pass).isEmpty
    }
    f(pdf, password)
  }

  /** Encrypted-PDF predicate (declares an /Encrypt dict — the file may
    * still be extractable; see needsPassword for routing). */
  def isEncrypted(pdf: Column): Column = {
    val f = udf { (bytes: Array[Byte]) => PdfExtract.isEncrypted(bytes) }
    f(pdf)
  }

  /** Error-channel routing predicate (reference pdf_extractor.py
    * failure branch -> ErrorRetrieval): encrypted AND not openable with
    * the empty user password under the standard security handler —
    * extractPages decrypts everything else in-line (PdfCrypt). */
  def needsPassword(pdf: Column): Column = {
    val f = udf { (bytes: Array[Byte]) =>
      PdfExtract.isEncrypted(bytes) &&
        PdfCrypt.handlerFor(bytes).isEmpty
    }
    f(pdf)
  }

  /** The full S15 path, binary to clean text: extract pages, strip
    * repeated headers/footers, repair hyphenation/ligatures/controls. */
  def extractRefined(pdf: Column): Column =
    refinePages(extractPages(pdf))
}
