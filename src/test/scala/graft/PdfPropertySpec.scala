package graft

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.functions.PdfExtract

/** Property: any printable text written through PdfFixtures (real
  * objects, deflated streams, escaped literals) round-trips through
  * PdfExtract byte-for-byte — including the hostile characters the
  * escape/lexer paths exist for: parentheses (nesting + escapes),
  * backslashes, '<'/'>' pairs, '%', digits, braces. */
class PdfPropertySpec extends SparkSuite {

  // printable ASCII incl. every PDF-delimiter character, minus the
  // control range (the writer emits literal strings, not octal)
  private val hostileChar = Gen.frequency(
    (8, Gen.alphaNumChar),
    (1, Gen.oneOf('(', ')', '\\', '<', '>', '[', ']', '{', '}', '%',
      '/', '#', '*', '\'', '"', ' ', '.', '-', '+')))
  private val line = for {
    n <- Gen.choose(1, 40)
    cs <- Gen.listOfN(n, hostileChar)
  } yield cs.mkString.trim
  private val page = for {
    k <- Gen.choose(1, 6)
    ls <- Gen.listOfN(k, line)
  } yield ls.filter(_.nonEmpty)
  private val doc = for {
    p <- Gen.choose(1, 4)
    ps <- Gen.listOfN(p, page)
  } yield ps.filter(_.nonEmpty)

  test("/Length lexing: an indirect reference never yields a bogus " +
      "direct length via partial-digit backtracking") {
    // '/Length 123 0 R': the engine must not retry with '12' (whose
    // next char '3' defeats the indirect-ref lookahead)
    assert(PdfExtract.DirectLengthRe
      .findFirstMatchIn("<< /Length 123 0 R >>").isEmpty)
    assert(PdfExtract.DirectLengthRe
      .findFirstMatchIn("<< /Length 123 >>").map(_.group(1))
      === Some("123"))
    assert(PdfExtract.DirectLengthRe
      .findFirstMatchIn("<< /Length 5 0 R /Filter /FlateDecode >>")
      .isEmpty)
  }

  test("writer -> extractor round-trips hostile printable text, " +
      "compressed and uncompressed") {
    val prop = forAll(doc, Gen.oneOf(true, false)) {
      (pages: List[List[String]], compress: Boolean) =>
        pages.isEmpty || pages.exists(_.isEmpty) || {
          val pdf = PdfFixtures.pdf(pages.map(_.toSeq), compress)
          val got = PdfExtract.pages(pdf)
          got.length == pages.length &&
            got.zip(pages).forall { case (text, expected) =>
              text == expected.mkString("\n")
            }
        }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }
}
