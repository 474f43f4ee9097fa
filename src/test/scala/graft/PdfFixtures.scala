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

  // ---- encrypted fixtures (standard security handler) ----
  //
  // The writer derives O/U/file-key with its own spec-literal
  // transcription of ISO 32000 Algorithms 2/3/5 (and 8 for R6), so the
  // round trip through PdfCrypt is not self-referential at the cipher
  // level: RC4 and the 2.B hash are pinned by independent known-answer
  // vectors in the spec, AES is the JRE's. What the round trip then
  // proves is the integration — dict parsing, /ID hashing, per-object
  // key salting, IV handling, filter interplay.

  private def md5(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(b)

  private def aesEnc(key: Array[Byte], iv: Array[Byte],
      data: Array[Byte], pad: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance(
      if (pad) "AES/CBC/PKCS5Padding" else "AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** One-page encrypted PDF. `scheme`: "rc4-40" (V1/R2), "rc4-128"
    * (V2/R3), "aesv2" (V4/R4, AES-128), "aesv3" (V5/R6, AES-256 +
    * Algorithm 2.B). Non-empty `userPassword` exercises the
    * password-as-data path; non-empty `ownerPassword` additionally
    * exercises the Algorithm-7 (R2-R4) / /O-salt (R6) owner
    * opening. */
  def encryptedPdf(lines: Seq[String], scheme: String,
      userPassword: String = "",
      ownerPassword: String = ""): Array[Byte] = {
    import graft.functions.PdfCrypt
    def bytes(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)
    // revision-correct password bytes come from the PRODUCTION
    // mapping (PdfCrypt.passBytes) so the fixture cannot drift from it
    val passBytes = PdfCrypt.passBytes(userPassword, 6)
    val ownerBytes = PdfCrypt.passBytes(ownerPassword, 6)
    // Algorithm 2's 32-byte padded passwords (R<=4: Latin-1 bytes)
    val paddedPass =
      (PdfCrypt.passBytes(userPassword, 3) ++ PdfCrypt.Pad).take(32)
    val paddedOwner =
      (PdfCrypt.passBytes(ownerPassword, 3) ++ PdfCrypt.Pad).take(32)
    def hex(b: Array[Byte]) = "<" + b.map(x => f"${x & 0xFF}%02x")
      .mkString + ">"
    val p = -44 // permissions word (high bits set, printing denied)
    val fileId = Array.tabulate[Byte](16)(i => ((i * 37 + 11) & 0xFF)
      .toByte)
    val (v, r, bits) = scheme match {
      case "rc4-40" => (1, 2, 40)
      case "rc4-128" => (2, 3, 128)
      case "rc4-cf" => (4, 4, 128) // V4 crypt filter with /CFM /V2
      case "aesv2" => (4, 4, 128)
      case "aesv3" => (5, 6, 256)
      case "aesv3-r5" => (5, 5, 256) // plain SHA-256 validation
      case other => sys.error(s"unknown scheme $other")
    }
    val aes = scheme.startsWith("aes")
    val n = bits / 8

    // --- entries + file key ---
    val (encBody, fileKey) =
      if (r <= 4) {
        // Algorithm 3 (O: rk derives from the padded OWNER password
        // and the encrypted payload is the padded USER password)
        var ok = md5(paddedOwner)
        if (r >= 3) (0 until 50).foreach(_ => ok = md5(ok.take(n)))
        val rk = ok.take(n)
        var o = PdfCrypt.rc4(rk, paddedPass)
        if (r >= 3) (1 to 19).foreach(i =>
          o = PdfCrypt.rc4(rk.map(b => (b ^ i).toByte), o))
        // Algorithm 2 (file key from the padded user password)
        var key = md5(paddedPass ++ o ++ Array[Byte](
          (p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
          ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte) ++
          fileId)
        if (r >= 3) (0 until 50).foreach(_ => key = md5(key.take(n)))
        key = key.take(n)
        // Algorithm 4/5 (U)
        val u =
          if (r == 2) PdfCrypt.rc4(key, PdfCrypt.Pad)
          else {
            var x = PdfCrypt.rc4(key, md5(PdfCrypt.Pad ++ fileId))
            (1 to 19).foreach(i =>
              x = PdfCrypt.rc4(key.map(b => (b ^ i).toByte), x))
            x ++ new Array[Byte](16)
          }
        val cf =
          if (aes)
            " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> " +
              "/StmF /StdCF /StrF /StdCF"
          else if (v == 4) // RC4 through a named crypt filter
            " /CF << /StdCF << /CFM /V2 /Length 16 >> >> " +
              "/StmF /StdCF /StrF /StdCF"
          else ""
        (s"<< /Filter /Standard /V $v /R $r /Length $bits /P $p " +
          s"/O ${hex(o)} /U ${hex(u)}$cf >>", key)
      } else {
        // V5/R6: fixed file key; U/UE per Algorithms 8/2.B
        val fk = Array.tabulate[Byte](32)(i => ((i * 7 + 3) & 0xFF)
          .toByte)
        val vs = Array.tabulate[Byte](8)(i => (i + 1).toByte)
        val ks = Array.tabulate[Byte](8)(i => (i + 9).toByte)
        // R5: plain SHA-256(pass ++ salt [++ udata]); R6: Algorithm 2.B
        def ohash(pass: Array[Byte], salt: Array[Byte],
            udata: Array[Byte] = Array.emptyByteArray): Array[Byte] =
          if (r == 5) java.security.MessageDigest.getInstance("SHA-256")
            .digest(pass ++ salt ++ udata)
          else PdfCrypt.hash2b(pass, salt, udata)
        val u = ohash(passBytes, vs) ++ vs ++ ks
        val ue = aesEnc(ohash(passBytes, ks),
          new Array[Byte](16), fk, pad = false)
        // real /O//OE: owner validation/key salts, udata = U[0,48)
        val ovs = Array.tabulate[Byte](8)(i => (i + 17).toByte)
        val oks = Array.tabulate[Byte](8)(i => (i + 25).toByte)
        val u48 = u.take(48)
        val o = ohash(ownerBytes, ovs, u48) ++ ovs ++ oks
        val oe = aesEnc(ohash(ownerBytes, oks, u48),
          new Array[Byte](16), fk, pad = false)
        (s"<< /Filter /Standard /V 5 /R $r /Length 256 /P $p " +
          s"/O ${hex(o)} /U ${hex(u)} /OE ${hex(oe)} /UE ${hex(ue)} " +
          "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
          "/StmF /StdCF /StrF /StdCF >>", fk)
      }

    def encryptStream(obj: Int, data: Array[Byte]): Array[Byte] = {
      val key =
        if (r >= 5) fileKey
        else {
          val salt = Array[Byte](
            (obj & 0xFF).toByte, ((obj >> 8) & 0xFF).toByte,
            ((obj >> 16) & 0xFF).toByte, 0, 0) ++
            (if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54)
             else Array.emptyByteArray)
          md5(fileKey ++ salt).take(math.min(n + 5, 16))
        }
      if (aes) {
        val iv = Array.tabulate[Byte](16)(i => ((obj * 13 + i) & 0xFF)
          .toByte)
        iv ++ aesEnc(key, iv, data, pad = true)
      } else PdfCrypt.rc4(key, data)
    }

    val content = {
      val ops = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, j) =>
        if (j > 0) ops.append("0 -16 Td\n")
        ops.append(s"(${line.replace("\\", "\\\\").replace("(", "\\(")
          .replace(")", "\\)")}) Tj\n")
      }
      ops.append("ET")
      bytes(ops.toString)
    }
    val contentEnc = encryptStream(4, content)

    val out = new ByteArrayOutputStream()
    out.write(bytes("%PDF-1.6\n"))
    val offsets = scala.collection.mutable.Map.empty[Int, Int]
    def obj(num: Int, body: Array[Byte]): Unit = {
      offsets(num) = out.size()
      out.write(bytes(s"$num 0 obj\n")); out.write(body)
      out.write(bytes("\nendobj\n"))
    }
    obj(1, bytes("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2, bytes("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    obj(3, bytes("<< /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/MediaBox [0 0 612 792] /Resources << /Font " +
      "<< /F1 5 0 R >> >> >>"))
    val sHead = bytes(s"<< /Length ${contentEnc.length} >>\nstream\n")
    val sFull = new ByteArrayOutputStream()
    sFull.write(sHead); sFull.write(contentEnc)
    sFull.write(bytes("\nendstream"))
    obj(4, sFull.toByteArray)
    obj(5, bytes("<< /Type /Font /Subtype /Type1 " +
      "/BaseFont /Helvetica >>"))
    obj(6, bytes(encBody))
    val xrefAt = out.size()
    out.write(bytes("xref\n0 7\n0000000000 65535 f \n"))
    (1 to 6).foreach(nn =>
      out.write(bytes(f"${offsets(nn)}%010d 00000 n \n")))
    val idHex = "<" + fileId.map(x => f"${x & 0xFF}%02x").mkString + ">"
    out.write(bytes("trailer\n<< /Size 7 /Root 1 0 R " +
      s"/Encrypt 6 0 R /ID [ $idHex $idHex ] >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n"))
    out.toByteArray
  }
}
