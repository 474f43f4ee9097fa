package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PdfCrypt, PdfExtract}

/** Standard-security-handler decryption (PdfCrypt) — closes the round-9
  * "encrypted PDFs" cut line for the empty-user-password case. The
  * cipher layer is pinned by independent public known-answer vectors
  * (RC4; AES is the JRE's own); the fixture round trips then exercise
  * the full integration: /Encrypt dict parse (direct and by reference),
  * /ID hashing, Algorithm 2 key derivation, /U verification, per-object
  * key salting (obj+gen LE + sAlT), the AES IV prefix, and R6's
  * Algorithm 2.B hardened hash. */
class PdfCryptSpec extends AnyFunSuite with SparkSuite {

  private def hexToBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def toHex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xFF}%02X").mkString

  test("RC4 matches the public known-answer vectors") {
    def enc(key: String, plain: String): String =
      toHex(PdfCrypt.rc4(key.getBytes(StandardCharsets.US_ASCII),
        plain.getBytes(StandardCharsets.US_ASCII)))
    assert(enc("Key", "Plaintext") === "BBF316E8D940AF0AD3")
    assert(enc("Wiki", "pedia") === "1021BF0420")
    assert(enc("Secret", "Attack at dawn") ===
      "45A01F645FC35B383552544B9BF5")
    // symmetric: decrypt == encrypt
    val c = PdfCrypt.rc4("Key".getBytes, "Plaintext".getBytes)
    assert(new String(PdfCrypt.rc4("Key".getBytes, c)) === "Plaintext")
  }

  test("Algorithm 2.B hardened hash: deterministic, 32 bytes, " +
      "salt-sensitive") {
    val s1 = Array.tabulate[Byte](8)(_.toByte)
    val s2 = Array.tabulate[Byte](8)(i => (i + 1).toByte)
    val h1 = PdfCrypt.hash2b(Array.emptyByteArray, s1)
    val h1b = PdfCrypt.hash2b(Array.emptyByteArray, s1)
    val h2 = PdfCrypt.hash2b(Array.emptyByteArray, s2)
    assert(h1.length === 32)
    assert(java.util.Arrays.equals(h1, h1b))
    assert(!java.util.Arrays.equals(h1, h2))
    assert(!java.util.Arrays.equals(
      PdfCrypt.hash2b("pw".getBytes, s1), h1))
  }

  private val lines = Seq("Encrypted corpus document.",
    "Second line of recovered text.")
  private val expected = lines.mkString("\n")

  for (scheme <- Seq("rc4-40", "rc4-128", "rc4-cf", "aesv2",
      "aesv3", "aesv3-r5")) {
    test(s"$scheme: encrypted fixture decrypts and extracts " +
        "known text end to end") {
      val pdf = PdfFixtures.encryptedPdf(lines, scheme)
      assert(PdfExtract.isEncrypted(pdf),
        "fixture must declare /Encrypt")
      assert(PdfCrypt.handlerFor(pdf).isDefined,
        "empty user password must verify against /U")
      assert(PdfExtract.pages(pdf) === Seq(expected))
    }
  }

  test("wrong /U (a real user password we don't have) -> no handler, " +
      "no pages, routed to the error channel") {
    val pdf = PdfFixtures.encryptedPdf(lines, "rc4-128")
    // corrupt the /U entry in place: flip one hex digit inside it
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val uAt = s.indexOf("/U <")
    assert(uAt > 0)
    val bad = (s.substring(0, uAt + 4) +
      (if (s.charAt(uAt + 4) == '0') '1' else '0') +
      s.substring(uAt + 5)).getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfExtract.isEncrypted(bad))
    assert(PdfCrypt.handlerFor(bad).isEmpty,
      "U mismatch must refuse the key, never emit garbage text")
    assert(PdfExtract.pages(bad) === Seq.empty)
  }

  test("encrypt dict key order: /UE and /OE listed BEFORE /U and /O " +
      "still resolves (strField must skip longer-name hits)") {
    val pdf = PdfFixtures.encryptedPdf(lines, "aesv3")
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    // reorder the four string entries in place — same byte length, so
    // xref offsets stay valid
    val re = ("/O (<[0-9a-f]+>) /U (<[0-9a-f]+>) " +
      "/OE (<[0-9a-f]+>) /UE (<[0-9a-f]+>)").r
    val m = re.findFirstMatchIn(s).getOrElse(
      fail("fixture dict should carry /O /U /OE /UE in order"))
    val reordered = s.substring(0, m.start) +
      s"/UE ${m.group(4)} /OE ${m.group(3)} " +
      s"/U ${m.group(2)} /O ${m.group(1)}" +
      s.substring(m.end)
    assert(reordered.length === s.length)
    val out = reordered.getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfCrypt.handlerFor(out).isDefined,
      "/UE-first key order must still verify the empty user password")
    assert(PdfExtract.pages(out) === Seq(expected))
  }

  test("unresolvable /CFM (unknown crypt filter method) refuses — " +
      "never falls back to RC4 over AES ciphertext") {
    val pdf = PdfFixtures.encryptedPdf(lines, "aesv2")
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    // same-length corruption: /CFM /AESV2 -> /CFM /AESVX
    val bad = s.replace("/CFM /AESV2", "/CFM /AESVX")
      .getBytes(StandardCharsets.ISO_8859_1)
    assert(PdfCrypt.handlerFor(bad).isEmpty,
      "unknown CFM must route to the error channel, not guess RC4")
    assert(PdfExtract.pages(bad) === Seq.empty)
  }

  for (scheme <- Seq("rc4-40", "rc4-128", "aesv2", "aesv3",
      "aesv3-r5")) {
    test(s"$scheme + user password: right password extracts, wrong or " +
        "empty refuses (Algorithm 2/2.A password-as-data, round 11)") {
      val pw = "s3cret-pâss" // non-ASCII exercises the UTF-8 path
      // owner password must be non-empty too: with an EMPTY owner
      // password, Algorithm 7 correctly opens the file for anyone
      // (the empty string is then a valid owner password) — real
      // generators always set one when the user password is set
      val pdf = PdfFixtures.encryptedPdf(lines, scheme, pw,
        ownerPassword = "distinct-owner")
      assert(PdfExtract.isEncrypted(pdf))
      // empty password must NOT open it
      assert(PdfCrypt.handlerFor(pdf).isEmpty,
        "a password-protected file must refuse the empty password")
      assert(PdfExtract.pages(pdf) === Seq.empty)
      // wrong password refuses
      assert(PdfCrypt.handlerFor(pdf, "wrong").isEmpty)
      assert(PdfExtract.pages(pdf, "wrong") === Seq.empty)
      // right password extracts the known text end to end
      assert(PdfCrypt.handlerFor(pdf, pw).isDefined)
      assert(PdfExtract.pages(pdf, pw) === Seq(expected))
    }
  }

  for (scheme <- Seq("rc4-40", "rc4-128", "aesv3", "aesv3-r5")) {
    test(s"$scheme owner password opens the file (Algorithm 7 / the " +
        "/O-salt path): user-locked file, owner password recovers") {
      val userPw = "reader-pw"
      val ownerPw = "owner-master"
      val pdf = PdfFixtures.encryptedPdf(lines, scheme, userPw, ownerPw)
      // both real passwords open; empty and wrong refuse
      assert(PdfExtract.pages(pdf, userPw) === Seq(expected))
      assert(PdfExtract.pages(pdf, ownerPw) === Seq(expected),
        "owner password must open via /O recovery")
      assert(PdfCrypt.handlerFor(pdf).isEmpty)
      assert(PdfCrypt.handlerFor(pdf, "wrong").isEmpty)
    }
  }

  test("permissions-only file with a real owner password: empty user " +
      "password still opens (the dominant crawl case)") {
    val pdf = PdfFixtures.encryptedPdf(lines, "rc4-128",
      userPassword = "", ownerPassword = "owner-master")
    assert(PdfExtract.pages(pdf) === Seq(expected))
    assert(PdfExtract.pages(pdf, "owner-master") === Seq(expected))
  }

  test("password columns: extractPages(pdf, password) decrypts per " +
      "row; needsPassword(pdf, password) routes only still-locked rows") {
    val s = initSpark()
    import s.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.PdfText
    val pw = "corpus-key"
    val locked = PdfFixtures.encryptedPdf(lines, "rc4-128", pw)
    val open = PdfFixtures.encryptedPdf(lines, "rc4-128")
    val df = Seq(
      (1L, locked, pw), // right password
      (2L, locked, "nope"), // wrong password
      (3L, open, null.asInstanceOf[String]) // empty-password file
    ).toDF("id", "pdf", "pass")
    val out = df.select(col("id"),
        PdfText.extractPages(col("pdf"), col("pass")).as("pages"),
        PdfText.needsPassword(col("pdf"), col("pass")).as("locked"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getBoolean(2)))).toMap
    assert(out(1L)._1 === Seq(expected) && !out(1L)._2)
    assert(out(2L)._1 === Seq.empty && out(2L)._2,
      "wrong password must extract nothing and flag locked")
    assert(out(3L)._1 === Seq(expected) && !out(3L)._2)
  }

  test("unencrypted files are untouched: no handler, pages unchanged") {
    val plain = PdfFixtures.pdf(Seq(Seq("hello", "world")))
    assert(!PdfExtract.isEncrypted(plain))
    assert(PdfCrypt.handlerFor(plain).isEmpty)
    assert(PdfExtract.pages(plain) === Seq("hello\nworld"))
  }

  test("needsPassword column: false for decryptable, true for " +
      "password-protected, false for plaintext") {
    val s = initSpark()
    import s.implicits._
    val ok = PdfFixtures.encryptedPdf(lines, "aesv2")
    val txt = new String(PdfFixtures.encryptedPdf(lines, "rc4-128"),
      StandardCharsets.ISO_8859_1)
    val uAt = txt.indexOf("/U <")
    val locked = (txt.substring(0, uAt + 4) +
      (if (txt.charAt(uAt + 4) == '0') '1' else '0') +
      txt.substring(uAt + 5)).getBytes(StandardCharsets.ISO_8859_1)
    val plain = PdfFixtures.pdf(Seq(Seq("x")))
    val df = Seq(("ok", ok), ("locked", locked), ("plain", plain))
      .toDF("k", "pdf")
    val got = df.select($"k",
        graft.functions.PdfText.needsPassword($"pdf").as("np"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got === Map("ok" -> false, "locked" -> true,
      "plain" -> false))
  }
}
