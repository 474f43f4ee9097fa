package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Minimal-but-valid PDF writer for extractor tests: real objects, real
  * xref table, FlateDecode-compressed content streams — so PdfExtract is
  * exercised against genuine PDF bytes (inflate + operator parsing), not
  * hand-fed strings. */
object PdfFixtures {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** A PDF with one page per entry of `pageLines`; each page's content
    * stream draws its lines top-down with Td moves and Tj shows. */
  def pdf(pageLines: Seq[Seq[String]], compress: Boolean = true)
      : Array[Byte] =
    if (compress) pdfEncoded(pageLines, " /Filter /FlateDecode", deflate)
    else pdfEncoded(pageLines, "", identity)

  /** Same document with an arbitrary /Filter entry and matching
    * encoder — exercises the non-Flate decoders and filter CHAINS
    * (`filterEntry` is spliced into the stream dict verbatim; `encode`
    * must be the left-inverse of the declared decode chain). */
  def pdfEncoded(pageLines: Seq[Seq[String]], filterEntry: String,
      encode: Array[Byte] => Array[Byte]): Array[Byte] = {
    def esc(s: String) = s.replace("\\", "\\\\")
      .replace("(", "\\(").replace(")", "\\)")
    val nPages = pageLines.length
    val firstPageObj = 3
    val contentObj = (i: Int) => firstPageObj + nPages + i
    val fontObj = firstPageObj + 2 * nPages

    val objs = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
    def bytes(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)

    objs += 1 -> bytes("<< /Type /Catalog /Pages 2 0 R >>")
    val kids = (0 until nPages).map(i => s"${firstPageObj + i} 0 R")
      .mkString(" ")
    objs += 2 -> bytes(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>")
    pageLines.zipWithIndex.foreach { case (_, i) =>
      objs += (firstPageObj + i) -> bytes(
        s"<< /Type /Page /Parent 2 0 R /Contents ${contentObj(i)} 0 R " +
          s"/MediaBox [0 0 612 792] /Resources << /Font " +
          s"<< /F1 $fontObj 0 R >> >> >>")
    }
    pageLines.zipWithIndex.foreach { case (lines, i) =>
      val ops = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, j) =>
        if (j > 0) ops.append("0 -16 Td\n")
        ops.append(s"(${esc(line)}) Tj\n")
      }
      ops.append("ET")
      val raw = bytes(ops.toString)
      val body = encode(raw)
      val head = bytes(
        s"<< /Length ${body.length}$filterEntry >>\nstream\n")
      val tail = bytes("\nendstream")
      val full = new Array[Byte](head.length + body.length + tail.length)
      System.arraycopy(head, 0, full, 0, head.length)
      System.arraycopy(body, 0, full, head.length, body.length)
      System.arraycopy(tail, 0, full, head.length + body.length,
        tail.length)
      objs += contentObj(i) -> full
    }
    objs += fontObj -> bytes(
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    val out = new ByteArrayOutputStream()
    out.write(bytes("%PDF-1.4\n"))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    objs.sortBy(_._1).foreach { case (num, body) =>
      offsets(num) = out.size()
      out.write(bytes(s"$num 0 obj\n"))
      out.write(body)
      out.write(bytes("\nendobj\n"))
    }
    val xrefAt = out.size()
    val maxObj = objs.map(_._1).max
    out.write(bytes(s"xref\n0 ${maxObj + 1}\n0000000000 65535 f \n"))
    (1 to maxObj).foreach { n =>
      out.write(bytes(f"${offsets.getOrElse(n, 0)}%010d 00000 n \n"))
    }
    out.write(bytes(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }
}
