package graft

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PdfExtract, TrueTypeCmap}
import graft.ml.SpmPrecompiled
import graft.operators.{AudioFeatures, FlacDecode}

/** Never-throw fuzzing for every round-11 binary parser that feeds on
  * crawl bytes (the executor-task contract the WAV chunk-walk hang
  * violated, ADVICE r10): arbitrary byte soup — plain random, and
  * random with a valid magic prefix so the parser gets PAST the
  * signature check into its structural walk — must return normally.
  * These parsers run inside per-row UDFs at corpus scale; one throw
  * or hang is a failed Spark task, and a reproducible one is a poison
  * row that kills the job on every retry. */
class UntrustedBytesSpec extends AnyFunSuite {

  private val junk: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 512)
    bs <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield bs.toArray

  private def withMagic(magic: Array[Byte]): Gen[Array[Byte]] =
    junk.map(b => magic ++ b)

  private def neverThrows[A](gen: Gen[Array[Byte]])(f: Array[Byte] => A)
      : Unit = {
    val prop = forAll(gen) { bytes => f(bytes); true }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("FlacDecode.decode: random bytes and fLaC-prefixed junk") {
    neverThrows(junk)(FlacDecode.decode)
    neverThrows(withMagic("fLaC".getBytes("US-ASCII")))(FlacDecode.decode)
  }

  test("TrueTypeCmap.glyphToUnicode: random bytes and sfnt-prefixed " +
      "junk") {
    neverThrows(junk)(TrueTypeCmap.glyphToUnicode)
    neverThrows(withMagic(Array[Byte](0, 1, 0, 0)))(
      TrueTypeCmap.glyphToUnicode)
    neverThrows(junk)(b => TrueTypeCmap.cidToUnicode(b, Some(b)))
  }

  test("CffFont: random bytes and CFF-header-prefixed junk") {
    import graft.functions.CffFont
    neverThrows(junk)(CffFont.glyphNames)
    neverThrows(junk)(CffFont.builtinEncoding)
    neverThrows(junk)(CffFont.gidToCid)
    val hdr = Array[Byte](1, 0, 4, 2) // major/minor/hdrSize/offSize
    neverThrows(withMagic(hdr))(CffFont.glyphNames)
    neverThrows(withMagic(hdr))(CffFont.builtinEncoding)
  }

  test("SpmPrecompiled: random blobs and plausible-header junk") {
    neverThrows(junk)(SpmPrecompiled.fromBlob)
    // header claiming a trie size that fits: traversal fuzzing
    neverThrows(junk.map { b =>
      val size = (b.length / 4) * 4
      val hdr = java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(size).array()
      hdr ++ b
    }) { blob =>
      SpmPrecompiled.fromBlob(blob).foreach(_.normalize("abc ﬁ ①"))
    }
  }

  test("AudioFeatures.audioMetadata/decodePcm: random bytes and " +
      "RIFF/OggS/ID3-prefixed junk") {
    neverThrows(junk)(AudioFeatures.audioMetadata)
    neverThrows(withMagic("RIFF\u0000\u0000\u0000\u0000WAVE"
      .getBytes("ISO-8859-1")))(AudioFeatures.audioMetadata)
    neverThrows(withMagic("OggS".getBytes("US-ASCII")))(
      AudioFeatures.audioMetadata)
    neverThrows(withMagic("ID3".getBytes("US-ASCII")))(
      AudioFeatures.audioMetadata)
    neverThrows(junk)(AudioFeatures.decodePcm)
  }

  test("PdfExtract.pages: random bytes and %PDF-prefixed junk (with " +
      "and without a password)") {
    neverThrows(junk)(PdfExtract.pages)
    neverThrows(withMagic("%PDF-1.5\n".getBytes("US-ASCII")))(
      PdfExtract.pages)
    neverThrows(withMagic("%PDF-1.5\n".getBytes("US-ASCII")))(
      PdfExtract.pages(_, "pw"))
  }

  // ---- pre-existing binary parsers, same contract (the Ogg OOB this
  // spec caught on its first run argues for sweeping them all) ----

  test("Multimodal: mp4Metadata and decodeImage on random and " +
      "ftyp-prefixed junk") {
    import graft.operators.Multimodal
    neverThrows(junk)(Multimodal.mp4Metadata)
    // a plausible box header: size 32, type ftyp
    neverThrows(withMagic(Array[Byte](0, 0, 0, 32) ++
      "ftypisom".getBytes("US-ASCII")))(Multimodal.mp4Metadata)
    neverThrows(junk)(Multimodal.decodeImage)
  }

  test("PdfCrypt.handlerFor and PdfExtract.isEncrypted on junk with " +
      "an /Encrypt marker") {
    import graft.functions.PdfCrypt
    neverThrows(junk)(PdfCrypt.handlerFor(_))
    neverThrows(withMagic(
      "%PDF-1.5\ntrailer << /Encrypt 1 0 R >>\n"
        .getBytes("ISO-8859-1")))(b =>
      (PdfExtract.isEncrypted(b), PdfCrypt.handlerFor(b, "x")))
  }

  test("string scrapers: HtmlArticle helpers never throw on tag soup") {
    import graft.sources.HtmlArticle
    val soup: Gen[String] = for {
      n <- Gen.choose(0, 200)
      cs <- Gen.listOfN(n, Gen.frequency(
        (6, Gen.alphaNumChar),
        (2, Gen.oneOf('<', '>', '"', '\'', '=', '/', '&', ';', ' ')),
        (1, Gen.oneOf('\n', 'é', '中', '\u0000'))))
    } yield cs.mkString
    val prop = forAll(soup) { html =>
      HtmlArticle.metaContentOf(html, "og:title")
      HtmlArticle.metaContentIgnoreCase(html, "description")
      HtmlArticle.elementByAttr(html, "div", "class", "content")
      true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("Warc.parseRecords/maybeGunzip on random and WARC/1.0-prefixed " +
      "junk (incl. bogus gzip magic)") {
    import graft.sources.Warc
    neverThrows(junk)(Warc.parseRecords)
    neverThrows(withMagic("WARC/1.0\r\nWARC-Type: response\r\n"
      .getBytes("US-ASCII")))(Warc.parseRecords)
    neverThrows(withMagic(Array[Byte](0x1f, 0x8b.toByte)))(b =>
      Warc.parseRecords(Warc.maybeGunzip(b)))
  }
}
