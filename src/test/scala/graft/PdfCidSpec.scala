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
    // strip the ToUnicode ref: the font loses its map (and carries no
    // embedded FontFile2 either, so the r11 fallback finds nothing)
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
      .replace("/ToUnicode 6 0 R", "")
    val got = PdfExtract.pages(
      s.getBytes(StandardCharsets.ISO_8859_1)).mkString("\n")
    assert(!got.contains("Any text."),
      "unmapped CID codes must not accidentally decode")
  }

  // ---- r11: no-ToUnicode recovery through the embedded TrueType ----

  /** Minimal sfnt with a single `cmap` table (format 4, platform 3/1):
    * unicode c -> glyph id per `uniToGid`. One segment per codepoint
    * (delta-encoded, no glyphIdArray) plus the required 0xFFFF
    * terminator segment. */
  private def ttfWithCmap(uniToGid: Seq[(Int, Int)]): Array[Byte] = {
    val segs = uniToGid.sortBy(_._1) :+ (0xffff, 0)
    val segCount = segs.length
    val sub = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { sub.write((v >> 8) & 0xff); sub.write(v & 0xff) }
    u16(4) // format
    u16(16 + 8 * segCount) // length
    u16(0) // language
    u16(segCount * 2)
    u16(0); u16(0); u16(0) // searchRange/entrySelector/rangeShift (unused)
    segs.foreach { case (c, _) => u16(c) } // endCode
    u16(0) // reservedPad
    segs.foreach { case (c, _) => u16(c) } // startCode
    segs.foreach { case (c, g) => u16((g - c) & 0xffff) } // idDelta
    segs.foreach(_ => u16(0)) // idRangeOffset
    val subBytes = sub.toByteArray
    val out = new ByteArrayOutputStream()
    def o16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def o32(v: Long): Unit = { o16(((v >> 16) & 0xffff).toInt); o16((v & 0xffff).toInt) }
    o32(0x00010000L) // sfnt version
    o16(1); o16(0); o16(0); o16(0) // numTables=1
    out.write("cmap".getBytes(StandardCharsets.US_ASCII))
    o32(0L) // checksum (unchecked)
    o32(28L) // table offset: 12 header + 16 record
    o32(12L + subBytes.length) // table length
    // cmap header at offset 28
    o16(0); o16(1) // version, numTables
    o16(3); o16(1); o32(12L) // platform 3, encoding 1, subtable offset
    out.write(subBytes)
    out.toByteArray
  }

  /** Type0/Identity-H WITHOUT ToUnicode, WITH an embedded FontFile2;
    * `gidOf` maps message chars to glyph ids (= the content codes when
    * CIDToGIDMap is Identity). Optional CIDToGIDMap stream. */
  private def cidPdfNoToUni(message: String, gidOf: Char => Int,
      cidToGid: Option[Array[Byte]] = None,
      codeOf: Option[Char => Int] = None): Array[Byte] = {
    val code = codeOf.getOrElse(gidOf)
    val codesHex = message.map(c => f"${code(c)}%04x").mkString
    val content = s"BT /FC 12 Tf 72 720 Td <$codesHex> Tj\nET"
    val ttf = ttfWithCmap(
      message.distinct.map(c => c.toInt -> gidOf(c)))
    val cidGidEntry = cidToGid.map(_ => "/CIDToGIDMap 11 0 R")
      .getOrElse("/CIDToGIDMap /Identity")
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/MediaBox [0 0 612 792] /Resources << /Font " +
        "<< /FC 5 0 R >> >> >>"),
      5 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /TestCID " +
        "/Encoding /Identity-H /DescendantFonts [8 0 R] >>"),
      8 -> ("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /TestCID " +
        s"/FontDescriptor 9 0 R $cidGidEntry >>"),
      9 -> ("<< /Type /FontDescriptor /FontName /TestCID " +
        "/FontFile2 10 0 R >>"))
    val streamObjs = Seq(4 -> content.getBytes(StandardCharsets.ISO_8859_1),
      10 -> ttf) ++ cidToGid.map(m => 11 -> m).toSeq

    val out = new ByteArrayOutputStream()
    out.write(bytes("%PDF-1.5\n"))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    (objs.map { case (n, d) => (n, bytes(d)) } ++
      streamObjs.map { case (n, body) =>
        val full = new ByteArrayOutputStream()
        full.write(bytes(s"<< /Length ${body.length} >>\nstream\n"))
        full.write(body)
        full.write(bytes("\nendstream"))
        (n, full.toByteArray)
      }).sortBy(_._1).foreach { case (n, body) =>
      offsets(n) = out.size()
      out.write(bytes(s"$n 0 obj\n")); out.write(body)
      out.write(bytes("\nendobj\n"))
    }
    val xrefAt = out.size()
    val maxObj = streamObjs.map(_._1).max
    out.write(bytes(s"xref\n0 ${maxObj + 1}\n0000000000 65535 f \n"))
    (1 to maxObj).foreach(n =>
      out.write(bytes(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n")))
    out.write(bytes(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  test("Type0/Identity-H with NO ToUnicode recovers text through the " +
      "embedded TrueType cmap (inverted glyph map, Identity CIDToGIDMap)") {
    val msg = "Galaxies rotate."
    val alphabet = msg.distinct.sorted
    def gid(c: Char): Int = 0x0100 + alphabet.indexOf(c)
    val pdf = cidPdfNoToUni(msg, gid)
    assert(PdfExtract.pages(pdf) === Seq(msg))
  }

  test("no-ToUnicode recovery follows a CIDToGIDMap STREAM " +
      "(code -> CID -> gid -> unicode composition)") {
    val msg = "Spin."
    val alphabet = msg.distinct.sorted
    def gid(c: Char): Int = 0x0100 + alphabet.indexOf(c)
    def code(c: Char): Int = 0x0200 + alphabet.indexOf(c)
    // stream: 2-byte BE gid per CID index; cid 0x0200+i -> gid 0x0100+i
    val maxCid = 0x0200 + alphabet.length
    val m = new Array[Byte](2 * (maxCid + 1))
    alphabet.foreach { c =>
      val cid = code(c); val g = gid(c)
      m(2 * cid) = ((g >> 8) & 0xff).toByte
      m(2 * cid + 1) = (g & 0xff).toByte
    }
    val pdf = cidPdfNoToUni(msg, gid, cidToGid = Some(m),
      codeOf = Some(code))
    assert(PdfExtract.pages(pdf) === Seq(msg))
  }

  /** One-page PDF with a SIMPLE (1-byte-code) font whose dict carries
    * `fontExtra` (e.g. a /Differences encoding or a /ToUnicode ref);
    * content shows `codes` as a hex string. */
  private def simpleFontPdf(codes: Seq[Int], fontExtra: String,
      extraObjs: Seq[(Int, Either[String, String])] = Seq.empty)
      : Array[Byte] = {
    val codesHex = codes.map(c => f"$c%02x").mkString
    val content = s"BT /F1 12 Tf 72 720 Td <$codesHex> Tj\nET"
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/MediaBox [0 0 612 792] /Resources << /Font " +
        "<< /F1 5 0 R >> >> >>"),
      5 -> ("<< /Type /Font /Subtype /Type1 /BaseFont /Sub " +
        s"$fontExtra >>")) ++
      extraObjs.collect { case (n, Left(d)) => n -> d }
    val streamObjs = Seq(4 -> content) ++
      extraObjs.collect { case (n, Right(body)) => n -> body }
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
    val maxObj = (objs.map(_._1) ++ streamObjs.map(_._1)).max
    out.write(bytes(s"xref\n0 ${maxObj + 1}\n0000000000 65535 f \n"))
    (1 to maxObj).foreach(n =>
      out.write(bytes(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n")))
    out.write(bytes(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  test("simple font /Encoding /Differences: remapped 1-byte codes " +
      "decode through AGL glyph names (the LaTeX-subset layout)") {
    // code 1->/H 2->/e 3->/l 4->/o, 30->/space, 40->/uni0021 (!)
    val enc = "/Encoding << /Type /Encoding /Differences " +
      "[ 1 /H /e /l /o 30 /space 40 /uni0021 ] >>"
    val pdf = simpleFontPdf(Seq(1, 2, 3, 3, 4, 30, 4, 40), enc)
    assert(PdfExtract.pages(pdf) === Seq("Hello o!"))
  }

  test("simple font with a 1-byte ToUnicode CMap decodes per byte — " +
      "regression: 2-byte pairing silently dropped such text") {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |12 dict begin begincmap
        |1 begincodespacerange <00> <ff> endcodespacerange
        |4 beginbfchar
        |<41> <0053>
        |<42> <0070>
        |<43> <0061>
        |<44> <0072>
        |endbfchar
        |endcmap CMapName currentdict /CMap defineresource pop end end
        |""".stripMargin
    // codes 'A','B','C','D','D' -> "Spar" + r: ToUnicode remaps all
    val pdf = simpleFontPdf(Seq(0x41, 0x42, 0x43, 0x44),
      "/ToUnicode 6 0 R", Seq(6 -> Right(cmap)))
    assert(PdfExtract.pages(pdf) === Seq("Spar"))
  }

  test("/Encoding as an INDIRECT reference resolves to the real " +
      "encoding dict — not hijacked by a later inline dict in the " +
      "font dict") {
    val enc = "/Encoding 7 0 R /FontMatrix [0.001 0 0 0.001 0 0] " +
      "/CharProcs << /dummy 9 0 R >>"
    val pdf = simpleFontPdf(Seq(1, 2, 3, 3, 4), enc,
      Seq(7 -> Left("<< /Type /Encoding /Differences " +
        "[ 1 /H /e /l /o ] >>")))
    assert(PdfExtract.pages(pdf) === Seq("Hello"))
  }

  test("/DescendantFonts as an indirect reference TO the array still " +
      "reaches the CIDFont dict (one extra deref)") {
    val msg = "Spin."
    val alphabet = msg.distinct.sorted
    def gid(c: Char): Int = 0x0100 + alphabet.indexOf(c)
    val direct = cidPdfNoToUni(msg, gid)
    // rewrite '/DescendantFonts [8 0 R]' to '/DescendantFonts 12 0 R'
    // plus a new object 12 holding the array — same content through
    // one more indirection (a common writer layout)
    val s = new String(direct, StandardCharsets.ISO_8859_1)
    assert(s.contains("/DescendantFonts [8 0 R]"))
    val rewritten = s.replace("/DescendantFonts [8 0 R]",
      "/DescendantFonts 12 0 R")
    // append object 12 before xref; PdfExtract's object walk is
    // regex-based, so a post-xref append parses fine
    val at = rewritten.indexOf("\nxref\n")
    val out = rewritten.substring(0, at) +
      "\n12 0 obj\n[8 0 R]\nendobj\n" + rewritten.substring(at)
    assert(PdfExtract.pages(
      out.getBytes(StandardCharsets.ISO_8859_1)) === Seq(msg))
  }

  test("simple font codes OUTSIDE the Differences table keep their " +
      "raw byte (base-encoding passthrough, never dropped)") {
    val enc = "/Encoding << /Differences [ 1 /H ] >>"
    // 1 -> H, then raw ASCII "i!"
    val pdf = simpleFontPdf(Seq(1, 'i'.toInt, '!'.toInt), enc)
    assert(PdfExtract.pages(pdf) === Seq("Hi!"))
  }

  test("GlyphNames: AGL names, uniXXXX sequences, uXXXXX codepoints, " +
      "unknown -> None") {
    import graft.functions.GlyphNames
    assert(GlyphNames.toText("A") === Some("A"))
    assert(GlyphNames.toText("comma") === Some(","))
    assert(GlyphNames.toText("fi") === Some("ﬁ"))
    assert(GlyphNames.toText("eacute") === Some("é"))
    assert(GlyphNames.toText("Eacute") === Some("É"))
    assert(GlyphNames.toText("uni0041") === Some("A"))
    assert(GlyphNames.toText("uni00480049") === Some("HI"))
    assert(GlyphNames.toText("u1F600") === Some("😀"))
    // a WELL-FORMED surrogate pair spelled as two uniXXXX units is a
    // legal codepoint (non-AGL-strict fonts do this); UNPAIRED
    // surrogates must be rejected — they'd break downstream UTF-8
    assert(GlyphNames.toText("uniD83DDE00") === Some("😀"))
    assert(GlyphNames.toText("uniD800") === None)
    assert(GlyphNames.toText("uniDC00") === None)
    assert(GlyphNames.toText("uniDE00D83D") === None) // reversed pair
    assert(GlyphNames.toText("uD800") === None)
    assert(GlyphNames.toText("g123") === None)
    assert(GlyphNames.toText("uniXYZW") === None)
    assert(GlyphNames.toText("") === None)
  }

  /** Minimal sfnt with a FORMAT-12 cmap subtable (platform 3/10):
    * contiguous groups (startChar, endChar, startGlyph). */
  private def ttfWithCmap12(groups: Seq[(Int, Int, Int)]): Array[Byte] = {
    val sub = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { sub.write((v >> 8) & 0xff); sub.write(v & 0xff) }
    def u32(v: Long): Unit = { u16(((v >> 16) & 0xffff).toInt); u16((v & 0xffff).toInt) }
    u16(12); u16(0) // format 12, reserved
    u32(16L + 12 * groups.length) // length
    u32(0L) // language
    u32(groups.length.toLong)
    groups.foreach { case (sc, ec, sg) => u32(sc); u32(ec); u32(sg) }
    val subBytes = sub.toByteArray
    val out = new ByteArrayOutputStream()
    def o16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def o32(v: Long): Unit = { o16(((v >> 16) & 0xffff).toInt); o16((v & 0xffff).toInt) }
    o32(0x00010000L); o16(1); o16(0); o16(0); o16(0)
    out.write("cmap".getBytes(StandardCharsets.US_ASCII))
    o32(0L); o32(28L); o32(12L + subBytes.length)
    o16(0); o16(1)
    o16(3); o16(10); o32(12L) // platform 3 encoding 10 (UCS-4)
    out.write(subBytes)
    out.toByteArray
  }

  test("TrueTypeCmap format 12: contiguous groups invert, incl. " +
      "astral codepoints; end-to-end through a no-ToUnicode font") {
    import graft.functions.TrueTypeCmap
    val ttf = ttfWithCmap12(Seq(
      ('A'.toInt, 'C'.toInt, 0x100), // A,B,C -> gid 256,257,258
      (0x1F600, 0x1F601, 0x200))) // astral emoji -> gid 512,513
    val g2u = TrueTypeCmap.glyphToUnicode(ttf)
    assert(g2u(0x100) === 'A'.toInt)
    assert(g2u(0x102) === 'C'.toInt)
    assert(g2u(0x200) === 0x1F600)
    // Identity CIDToGIDMap composition surfaces the astral char as a
    // surrogate PAIR string
    val c2u = TrueTypeCmap.cidToUnicode(ttf, None)
    assert(c2u(0x200) === "😀")
    // end-to-end: codes = gids through the PDF walk
    val msg = "BAC"
    def gid(c: Char): Int = 0x100 + (c - 'A')
    val pdf = cidPdfNoToUni(msg, gid)
    // swap the embedded format-4 font for the format-12 one by
    // rebuilding with the same gid mapping
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    assert(PdfExtract.pages(cidPdfNoToUniWith(msg, gid, ttf)) === Seq(msg))
    assert(s.nonEmpty)
  }

  /** cidPdfNoToUni variant embedding a caller-supplied font blob. */
  private def cidPdfNoToUniWith(message: String, gidOf: Char => Int,
      ttf: Array[Byte]): Array[Byte] = {
    val codesHex = message.map(c => f"${gidOf(c)}%04x").mkString
    val content = s"BT /FC 12 Tf 72 720 Td <$codesHex> Tj\nET"
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/MediaBox [0 0 612 792] /Resources << /Font " +
        "<< /FC 5 0 R >> >> >>"),
      5 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /T12 " +
        "/Encoding /Identity-H /DescendantFonts [8 0 R] >>"),
      8 -> ("<< /Type /Font /Subtype /CIDFontType2 /BaseFont /T12 " +
        "/FontDescriptor 9 0 R /CIDToGIDMap /Identity >>"),
      9 -> "<< /Type /FontDescriptor /FontName /T12 /FontFile2 10 0 R >>")
    val streamObjs = Seq(
      4 -> content.getBytes(StandardCharsets.ISO_8859_1), 10 -> ttf)
    val out = new ByteArrayOutputStream()
    out.write(bytes("%PDF-1.5\n"))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    (objs.map { case (n, d) => (n, bytes(d)) } ++
      streamObjs.map { case (n, body) =>
        val full = new ByteArrayOutputStream()
        full.write(bytes(s"<< /Length ${body.length} >>\nstream\n"))
        full.write(body)
        full.write(bytes("\nendstream"))
        (n, full.toByteArray)
      }).sortBy(_._1).foreach { case (n, body) =>
      offsets(n) = out.size()
      out.write(bytes(s"$n 0 obj\n")); out.write(body)
      out.write(bytes("\nendobj\n"))
    }
    val xrefAt = out.size()
    out.write(bytes("xref\n0 11\n0000000000 65535 f \n"))
    (1 to 10).foreach(n =>
      out.write(bytes(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n")))
    out.write(bytes("trailer\n<< /Size 11 /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  test("TrueTypeCmap: format-4 parse inverts to lowest codepoint per " +
      "glyph; junk bytes never throw") {
    import graft.functions.TrueTypeCmap
    val ttf = ttfWithCmap(Seq('A'.toInt -> 5, 'B'.toInt -> 6,
      'a'.toInt -> 5)) // two codepoints -> glyph 5: lowest (A) wins
    val g2u = TrueTypeCmap.glyphToUnicode(ttf)
    assert(g2u(5) === 'A'.toInt)
    assert(g2u(6) === 'B'.toInt)
    assert(TrueTypeCmap.glyphToUnicode(Array.fill[Byte](64)(77)) ===
      Map.empty)
    assert(TrueTypeCmap.glyphToUnicode(null) === Map.empty)
  }

  test("TrueTypeCmap format 12: out-of-range group start codes " +
      "(negative or > 0x10FFFF) are dropped, never stored — " +
      "cidToUnicode must not throw on a crafted font") {
    import graft.functions.TrueTypeCmap
    // both hostile groups pass the span guard (sc <= ec, span < 2^16)
    // but their codepoints are invalid for Character.toChars
    val hostile = ttfWithCmap12Raw(Seq(
      (0x80000000L, 0x80000005L, 0x300L), // negative as Int
      (0x00110000L, 0x00110002L, 0x400L), // beyond U+10FFFF
      ('A'.toLong, 'B'.toLong, 0x100L))) // one valid group survives
    val g2u = TrueTypeCmap.glyphToUnicode(hostile)
    assert(g2u.get(0x100) === Some('A'.toInt))
    assert(!g2u.keys.exists(g => g >= 0x300 && g <= 0x305))
    assert(!g2u.keys.exists(g => g >= 0x400 && g <= 0x402))
    // the never-throws contract end-to-end
    val c2u = TrueTypeCmap.cidToUnicode(hostile, None)
    assert(c2u.get(0x100) === Some("A"))
  }

  // ---- CFF (/FontFile3) fixtures ----

  /** Minimal CFF blob: nGlyphs = sids.length + 1 (gid 0 = .notdef),
    * charset format 0 over `sids`, optional format-0 Encoding giving
    * gid i+1 the code codes(i) (absent -> predefined Standard
    * Encoding), 1-byte dummy charstrings. Custom strings (SID >= 391)
    * go through the String INDEX; `cidKeyed` adds a ROS operator.
    * All Top DICT offsets use fixed-width int32 operands so the dict
    * length is known before layout. */
  private def cffBlob(sids: Seq[Int], codes: Option[Seq[Int]],
      customStrings: Seq[String] = Seq.empty,
      cidKeyed: Boolean = false): Array[Byte] = {
    def index1(data: Array[Byte]): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      b.write(0); b.write(1) // count = 1
      b.write(1) // offSize
      b.write(1); b.write(1 + data.length)
      b.write(data)
      b.toByteArray
    }
    def indexN(items: Seq[Array[Byte]]): Array[Byte] = {
      if (items.isEmpty) return Array[Byte](0, 0)
      val b = new ByteArrayOutputStream()
      b.write((items.length >> 8) & 0xff); b.write(items.length & 0xff)
      b.write(1) // offSize (fixtures stay < 255 data bytes)
      var off = 1
      b.write(off)
      items.foreach { it => off += it.length; b.write(off) }
      items.foreach(b.write)
      b.toByteArray
    }
    def op29(v: Int, op: Seq[Int]): Array[Byte] =
      (Seq(29, (v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff,
        v & 0xff) ++ op).map(_.toByte).toArray
    val nameIdx = index1("TestFont".getBytes(StandardCharsets.US_ASCII))
    val strIdx = indexN(customStrings.map(
      _.getBytes(StandardCharsets.US_ASCII)))
    val tdLen = (if (cidKeyed) 3 * 5 + 2 else 0) + 6 +
      codes.map(_ => 6).getOrElse(0) + 6
    val prefix = 4 + nameIdx.length + (5 + tdLen) + strIdx.length + 2
    val charsetLen = 1 + 2 * sids.length
    val encodingLen = codes.map(c => 2 + c.length).getOrElse(0)
    val charsetOff = prefix
    val encodingOff = prefix + charsetLen
    val charstringsOff = encodingOff + encodingLen
    val td = new ByteArrayOutputStream()
    if (cidKeyed) { // ROS: registry SID, ordering SID, supplement
      td.write(op29(391, Seq.empty)); td.write(op29(392, Seq.empty))
      td.write(op29(0, Seq(12, 30)))
    }
    td.write(op29(charsetOff, Seq(15)))
    codes.foreach(_ => td.write(op29(encodingOff, Seq(16))))
    td.write(op29(charstringsOff, Seq(17)))
    val topIdx = index1(td.toByteArray)
    assert(topIdx.length == 5 + tdLen, "fixture Top DICT length drifted")
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](1, 0, 4, 2)) // header
    out.write(nameIdx); out.write(topIdx); out.write(strIdx)
    out.write(Array[Byte](0, 0)) // empty Global Subr INDEX
    out.write(0) // charset format 0
    sids.foreach { s => out.write((s >> 8) & 0xff); out.write(s & 0xff) }
    codes.foreach { cs =>
      out.write(0); out.write(cs.length) // encoding format 0, nCodes
      cs.foreach(out.write)
    }
    out.write(indexN(Seq.fill(sids.length + 1)(Array[Byte](0x0e))))
    out.toByteArray
  }

  test("CffFont: charset names resolve via standard + custom SIDs, " +
      "format-0 encoding and the predefined Standard Encoding both " +
      "map codes to glyphs, CID-keyed fonts expose CIDs and no " +
      "names, junk never throws") {
    import graft.functions.CffFont
    // standard-string SIDs: H=41 e=70 l=77 o=80
    val cff = cffBlob(Seq(41, 70, 77, 80), Some(Seq(72, 101, 108, 111)))
    assert(CffFont.glyphNames(cff) ===
      Map(1 -> "H", 2 -> "e", 3 -> "l", 4 -> "o"))
    assert(CffFont.builtinEncoding(cff) ===
      Map(72 -> 1, 101 -> 2, 108 -> 3, 111 -> 4))
    assert(!CffFont.isCidKeyed(cff))
    // Encoding op ABSENT -> Standard Encoding: ASCII code -> SID
    // (code - 31) -> charset inverse
    val cffStd = cffBlob(Seq(41, 70, 77, 80), None)
    assert(CffFont.builtinEncoding(cffStd) === Map('H'.toInt -> 1,
      'e'.toInt -> 2, 'l'.toInt -> 3, 'o'.toInt -> 4))
    // custom SIDs through the String INDEX (AGL-resolvable uniXXXX)
    val cffCustom = cffBlob(Seq(391, 392), Some(Seq(1, 2)),
      customStrings = Seq("uni0041", "uni0042"))
    assert(CffFont.glyphNames(cffCustom) ===
      Map(1 -> "uni0041", 2 -> "uni0042"))
    // CID-keyed: the charset IS the CID map; names are impossible
    val cffCid = cffBlob(Seq(17, 23, 99), None, cidKeyed = true)
    assert(CffFont.isCidKeyed(cffCid))
    assert(CffFont.glyphNames(cffCid) === Map.empty)
    assert(CffFont.gidToCid(cffCid) === Map(1 -> 17, 2 -> 23, 3 -> 99))
    assert(CffFont.glyphNames(null) === Map.empty)
    assert(CffFont.glyphNames(Array.fill[Byte](64)(42)) === Map.empty)
    assert(CffFont.builtinEncoding(Array.fill[Byte](64)(42)) ===
      Map.empty)
  }

  /** cidPdfNoToUniWith variant embedding a bare CFF as /FontFile3
    * under a CIDFontType0 descendant (no ToUnicode, no TrueType). */
  private def cidPdfCff(message: String, gidOf: Char => Int,
      cff: Array[Byte]): Array[Byte] = {
    val codesHex = message.map(c => f"${gidOf(c)}%04x").mkString
    val content = s"BT /FC 12 Tf 72 720 Td <$codesHex> Tj\nET"
    val objs = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> ("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
        "/MediaBox [0 0 612 792] /Resources << /Font " +
        "<< /FC 5 0 R >> >> >>"),
      5 -> ("<< /Type /Font /Subtype /Type0 /BaseFont /T1C " +
        "/Encoding /Identity-H /DescendantFonts [8 0 R] >>"),
      8 -> ("<< /Type /Font /Subtype /CIDFontType0 /BaseFont /T1C " +
        "/FontDescriptor 9 0 R >>"),
      9 -> "<< /Type /FontDescriptor /FontName /T1C /FontFile3 10 0 R >>")
    val streamObjs = Seq(
      4 -> content.getBytes(StandardCharsets.ISO_8859_1), 10 -> cff)
    val out = new ByteArrayOutputStream()
    out.write(bytes("%PDF-1.5\n"))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    (objs.map { case (n, d) => (n, bytes(d)) } ++
      streamObjs.map { case (n, body) =>
        val full = new ByteArrayOutputStream()
        full.write(bytes(s"<< /Length ${body.length} >>\nstream\n"))
        full.write(body)
        full.write(bytes("\nendstream"))
        (n, full.toByteArray)
      }).sortBy(_._1).foreach { case (n, body) =>
      offsets(n) = out.size()
      out.write(bytes(s"$n 0 obj\n")); out.write(body)
      out.write(bytes("\nendobj\n"))
    }
    val xrefAt = out.size()
    out.write(bytes("xref\n0 11\n0000000000 65535 f \n"))
    (1 to 10).foreach(n =>
      out.write(bytes(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n")))
    out.write(bytes("trailer\n<< /Size 11 /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }

  test("Type0 font with a bare name-keyed CFF (/FontFile3, no " +
      "/ToUnicode, no TrueType): charset names + AGL recover the " +
      "text end-to-end — the academic-publisher PDF shape") {
    val cff = cffBlob(Seq(41, 70, 77, 80), None) // gids 1..4 = H e l o
    val gid = Map('H' -> 1, 'e' -> 2, 'l' -> 3, 'o' -> 4)
    assert(PdfExtract.pages(cidPdfCff("Hello", gid, cff)) ===
      Seq("Hello"))
  }

  test("simple font with a bare CFF built-in encoding (no ToUnicode, " +
      "no Differences) decodes through charset names; a /Differences " +
      "overlay wins on listed codes and keeps the CFF base elsewhere") {
    val cff = cffBlob(Seq(41, 70, 77, 80), Some(Seq(72, 101, 108, 111)))
    val cffStr = new String(cff, StandardCharsets.ISO_8859_1)
    val fdesc = "<< /Type /FontDescriptor /FontName /Sub " +
      "/FontFile3 7 0 R >>"
    val pdf = simpleFontPdf(Seq(72, 101, 108, 108, 111),
      "/FontDescriptor 6 0 R",
      Seq(6 -> Left(fdesc), 7 -> Right(cffStr)))
    assert(PdfExtract.pages(pdf) === Seq("Hello"))
    val pdf2 = simpleFontPdf(Seq(72, 101, 108, 108, 111),
      "/FontDescriptor 6 0 R /Encoding << /Type /Encoding " +
        "/Differences [ 72 /Z ] >>",
      Seq(6 -> Left(fdesc), 7 -> Right(cffStr)))
    assert(PdfExtract.pages(pdf2) === Seq("Zello"))
  }


  test("/Encoding /WinAnsiEncoding replaces the font's built-in CFF " +
      "encoding (PDF 9.6.6.3) and maps the cp1252 typographic block") {
    // CFF built-in encoding maps codes 1..4 -> H e l o; with a
    // DECLARED base encoding those built-in mappings must NOT apply
    val cff = cffBlob(Seq(41, 70, 77, 80), Some(Seq(1, 2, 3, 4)))
    val cffStr = new String(cff, StandardCharsets.ISO_8859_1)
    val fdesc = "<< /Type /FontDescriptor /FontName /Sub " +
      "/FontFile3 7 0 R >>"
    // sanity: WITHOUT a declared encoding the built-in applies
    val viaBuiltin = simpleFontPdf(Seq(1, 2, 3, 3, 4),
      "/FontDescriptor 6 0 R",
      Seq(6 -> Left(fdesc), 7 -> Right(cffStr)))
    assert(PdfExtract.pages(viaBuiltin) === Seq("Hello"))
    // declared WinAnsi: code 1 is NOT 'H' anymore (raw passthrough),
    // 0x93/0x94 are the cp1252 curly quotes, ASCII rides through
    // (the \u0001 sits mid-string: textFromContent trims the ends)
    val declared = simpleFontPdf(Seq(0x93, 1, 0x48, 0x69, 0x94),
      "/FontDescriptor 6 0 R /Encoding /WinAnsiEncoding",
      Seq(6 -> Left(fdesc), 7 -> Right(cffStr)))
    assert(PdfExtract.pages(declared) ===
      Seq("\u201C\u0001Hi\u201D"))
  }

  test("/Encoding /MacRomanEncoding decodes the Mac OS Roman high " +
      "half, including the no-break space and /currency at 0xDB") {
    val pdf = simpleFontPdf(Seq(0x61, 0x8e, 0xca, 0xdb, 0xd5),
      "/Encoding /MacRomanEncoding")
    assert(PdfExtract.pages(pdf) ===
      Seq("a\u00e9\u00a0\u00a4\u2019"))
  }

  test("/BaseEncoding inside an encoding dict sets the base and " +
      "/Differences still overlays its listed codes only") {
    val pdf = simpleFontPdf(Seq(1, 0x93, 0x5a),
      "/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding " +
        "/Differences [ 1 /H ] >>")
    assert(PdfExtract.pages(pdf) === Seq("H\u201CZ"))
  }

  /** ttfWithCmap12 variant taking raw u32 group fields, so tests can
    * encode start codes outside the valid codepoint range. */
  private def ttfWithCmap12Raw(
      groups: Seq[(Long, Long, Long)]): Array[Byte] = {
    val sub = new ByteArrayOutputStream()
    def u16(v: Int): Unit = {
      sub.write((v >> 8) & 0xff); sub.write(v & 0xff)
    }
    def u32(v: Long): Unit = {
      u16(((v >> 16) & 0xffff).toInt); u16((v & 0xffff).toInt)
    }
    u16(12); u16(0)
    u32(16L + 12 * groups.length)
    u32(0L)
    u32(groups.length.toLong)
    groups.foreach { case (sc, ec, sg) => u32(sc); u32(ec); u32(sg) }
    val subBytes = sub.toByteArray
    val out = new ByteArrayOutputStream()
    def o16(v: Int): Unit = {
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    def o32(v: Long): Unit = {
      o16(((v >> 16) & 0xffff).toInt); o16((v & 0xffff).toInt)
    }
    o32(0x00010000L); o16(1); o16(0); o16(0); o16(0)
    out.write("cmap".getBytes(StandardCharsets.US_ASCII))
    o32(0L); o32(28L); o32(12L + subBytes.length)
    o16(0); o16(1)
    o16(3); o16(10); o32(12L)
    out.write(subBytes)
    out.toByteArray
  }
}
