package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PdfExtract

/** CID/Type0 font extraction via /ToUnicode CMaps — the round-9
  * narrowing of the S15 cut line. LaTeX-produced academic PDFs (the
  * reference corpus' dominant species) carry composite fonts whose
  * strings are 2-byte glyph codes; with the font's ToUnicode CMap the
  * text is fully recoverable. Fixtures here are whole PDFs with a real
  * page -> resources -> font -> ToUnicode object graph, not bare CMap
  * strings, so the graph walk, Tf font tracking, and the 2-byte decode
  * all run end to end. */
class PdfCidSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)

  /** Build a PDF whose page shows `message` through a Type0 font:
    * glyph code for char c = 0x0100 + (c - base alphabet index); the
    * ToUnicode CMap maps codes back via one bfchar per vowel and one
    * bfrange over the whole run (exercising BOTH forms; later entries
    * win either way since they agree). */
  private def cidPdf(message: String,
      alsoSimpleFontLine: Option[String] = None): Array[Byte] = {
    val alphabet = message.distinct.sorted
    def codeOf(c: Char): Int = 0x0100 + alphabet.indexOf(c)
    val codesHex = message.map(c => f"${codeOf(c)}%04x").mkString
    // bfchar entries for up to 4 distinct chars, bfrange for the run
    val bfchars = alphabet.take(4).map(c =>
      f"<${codeOf(c)}%04x> <${c.toInt}%04x>").mkString("\n")
    val bfranges = alphabet.map(c =>
      f"<${codeOf(c)}%04x> <${codeOf(c)}%04x> <${c.toInt}%04x>")
      .mkString("\n")
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
         |12 dict begin begincmap
         |1 begincodespacerange <0000> <ffff> endcodespacerange
         |${alphabet.take(4).length} beginbfchar
         |$bfchars
         |endbfchar
         |${alphabet.length} beginbfrange
         |$bfranges
         |endbfrange
         |endcmap CMapName currentdict /CMap defineresource pop end end
         |""".stripMargin
    val simplePart = alsoSimpleFontLine
      .map(l => s"/F1 12 Tf 0 -20 Td (${l}) Tj\n").getOrElse("")
    val content =
      s"BT /FC 12 Tf 72 720 Td <$codesHex> Tj\n${simplePart}ET"
    val fontExtra = alsoSimpleFontLine.map(_ =>
      " /F1 7 0 R").getOrElse("")

    val objs = Seq(
      1 -> s"<< /Type /Catalog /Pages 2 0 R >>",
      2 -> s"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/MediaBox [0 0 612 792] /Resources << /Font " +
        s"<< /FC 5 0 R$fontExtra >> >> >>"),
      5 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /TestCID " +
        "/Encoding /Identity-H /ToUnicode 6 0 R >>"),
      7 -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    val streamObjs = Seq(4 -> content, 6 -> cmap)

    val out = new ByteArrayOutputStream()
    out.write(bytes("%PDF-1.5\n"))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    (objs.map { case (n, d) => (n, bytes(d)) } ++
      streamObjs.map { case (n, body) =>
        val b = bytes(body)
        val full = new ByteArrayOutputStream()
        full.write(bytes(s"<< /Length ${b.length} >>\nstream\n"))
        full.write(b)
        full.write(bytes("\nendstream"))
        (n, full.toByteArray)
      }).sortBy(_._1).foreach { case (n, body) =>
      offsets(n) = out.size()
      out.write(bytes(s"$n 0 obj\n")); out.write(body)
      out.write(bytes("\nendobj\n"))
    }
    val xrefAt = out.size()
    val maxObj = 7
    out.write(bytes(s"xref\n0 ${maxObj + 1}\n0000000000 65535 f \n"))
    (1 to maxObj).foreach(n =>
      out.write(bytes(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n")))
    out.write(bytes(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  test("Type0/Identity-H text recovers through the ToUnicode CMap") {
    val msg = "Galaxies rotate."
    val got = PdfExtract.pages(cidPdf(msg)).mkString("\n")
    assert(got.contains(msg), s"extracted: '$got'")
  }

  test("Tf switches between CID and simple fonts mid-stream") {
    val got = PdfExtract.pages(
      cidPdf("Spectral lines.", Some("Plain ascii line.")))
      .mkString("\n")
    assert(got.contains("Spectral lines."), s"extracted: '$got'")
    assert(got.contains("Plain ascii line."), s"extracted: '$got'")
  }

  test("parseToUnicode: bfrange array form and multi-char targets") {
    val cmap =
      """2 beginbfchar
        |<0041> <0066006900660069>
        |<0042> <00660069>
        |endbfchar
        |1 beginbfrange
        |<0050> <0052> [<0058> <0059> <005A>]
        |endbfrange""".stripMargin
    val m = PdfExtract.parseToUnicode(cmap)
    assert(m(0x41) === "fifi") // ligature-style multi-char target
    assert(m(0x42) === "fi")
    assert(m(0x50) === "X" && m(0x51) === "Y" && m(0x52) === "Z")
  }

  test("ObjStm: page and font dicts packed in an object stream still " +
      "resolve the ToUnicode graph (compressed-xref writer layout)") {
    val msg = "Nebulae expand."
    val alphabet = msg.distinct.sorted
    def codeOf(c: Char): Int = 0x0100 + alphabet.indexOf(c)
    val codesHex = msg.map(c => f"${codeOf(c)}%04x").mkString
    val cmap =
      s"""1 begincodespacerange <0000> <ffff> endcodespacerange
         |${alphabet.length} beginbfrange
         |${alphabet.map(c =>
             f"<${codeOf(c)}%04x> <${codeOf(c)}%04x> <${c.toInt}%04x>")
           .mkString("\n")}
         |endbfrange
         |endcmap""".stripMargin
    val content = s"BT /FC 12 Tf 72 720 Td <$codesHex> Tj ET"
    // the page (obj 3) and font (obj 5) dicts live INSIDE obj 8, a
    // FlateDecode /ObjStm; content (4) and ToUnicode (6) stay
    // top-level streams (streams cannot live in an ObjStm per spec)
    val pageDict = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/MediaBox [0 0 612 792] /Resources << /Font " +
      "<< /FC 5 0 R >> >> >>"
    val fontDict = "<< /Type /Font /Subtype /Type0 /BaseFont /T " +
      "/Encoding /Identity-H /ToUnicode 6 0 R >>"
    val header = s"3 0 5 ${pageDict.length}\n"
    val stmBody = header + pageDict + fontDict
    val deflated = {
      val d = new java.util.zip.Deflater()
      d.setInput(bytes(stmBody)); d.finish()
      val o = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    val out = new ByteArrayOutputStream()
    out.write(bytes("%PDF-1.6\n"))
    def obj(n: Int, body: Array[Byte]): Unit = {
      out.write(bytes(s"$n 0 obj\n")); out.write(body)
      out.write(bytes("\nendobj\n"))
    }
    obj(1, bytes("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2, bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    obj(4, bytes(s"<< /Length ${content.length} >>\nstream\n" +
      content + "\nendstream"))
    obj(6, bytes(s"<< /Length ${cmap.length} >>\nstream\n" + cmap +
      "\nendstream"))
    val stmb = new ByteArrayOutputStream()
    stmb.write(bytes(s"<< /Type /ObjStm /N 2 /First ${header.length} " +
      s"/Length ${deflated.length} /Filter /FlateDecode >>\nstream\n"))
    stmb.write(deflated)
    stmb.write(bytes("\nendstream"))
    obj(8, stmb.toByteArray)
    out.write(bytes("trailer\n<< /Size 9 /Root 1 0 R >>\n%%EOF\n"))
    val got = PdfExtract.pages(out.toByteArray).mkString("\n")
    assert(got.contains(msg), s"extracted: '$got'")
  }

  test("a CID font WITHOUT ToUnicode keeps the old cut-line behavior " +
    "(no garbage emitted for unmappable codes)") {
    val pdf = cidPdf("Any text.")
    // strip the ToUnicode ref: the font loses its map
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
      .replace("/ToUnicode 6 0 R", "")
    val got = PdfExtract.pages(
      s.getBytes(StandardCharsets.ISO_8859_1)).mkString("\n")
    assert(!got.contains("Any text."),
      "unmapped CID codes must not accidentally decode")
  }
}
