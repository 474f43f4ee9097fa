package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** Standard-security-handler PDF decryption (ISO 32000-1 §7.6.3,
  * ISO 32000-2 §7.6.4 — public spec; closes the S15 "encrypted PDFs"
  * cut line for the empty-user-password case, which is the vast
  * majority of encrypted documents in a crawl corpus: permissions-only
  * encryption where the file opens without prompting).
  *
  * Supported: /Filter /Standard with
  *  - V1/V2 + R2/R3 — RC4, 40..128-bit key (Algorithm 2 key derivation)
  *  - V4 + R4 — crypt filters /V2 (RC4) and /AESV2 (AES-128-CBC,
  *    16-byte IV prefix, "sAlT" object-key salt)
  *  - V5 + R5/R6 — /AESV3 (AES-256-CBC), SHA-256 validation (R5) and
  *    the Algorithm-2.B hardened hash (R6)
  *
  * Passwords are supported when supplied as data (the handlerFor
  * overload; Algorithm 2 padding for R≤4, Algorithm 2.A UTF-8/127-byte
  * truncation for R5/R6). The supplied password is tried in BOTH
  * roles, as interactive viewers do: first as the user password,
  * then as the owner password (Algorithm 7's /O→padded-user recovery
  * for R≤4; the /O-salt + /OE file-key path for R5/R6). Verification
  * against /U (or the /O hash) is mandatory either way, so a wrong or
  * missing password refuses rather than emitting garbage.
  *
  * Out of scope (None ⇒ caller routes to the error channel exactly as
  * before): non-Standard filters (public-key /Adobe.PubSec),
  * /Identity-with-embedded-crypt exotica.
  *
  * RC4 is implemented inline (20 lines, public algorithm); AES goes
  * through javax.crypto which every JRE ships with AES-128; AES-256
  * availability is probed (no JCE policy assumption) and R5/R6 support
  * degrades to None where absent.
  */
object PdfCrypt {

  /** ISO 32000-1 Algorithm 2 padding string. */
  private[graft] val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** A ready-to-use decryptor for one file: per-object stream/string
    * decryption with the derived file key. */
  final case class Handler(fileKey: Array[Byte], aes: Boolean, r: Int) {
    /** Decrypt `data` belonging to object (`obj`, `gen`). For R≤4 the
      * object key is MD5(fileKey ‖ obj₃LE ‖ gen₂LE [‖ sAlT]) truncated
      * to min(n+5,16); for R5/R6 the file key is used directly
      * (ISO 32000-2: AESV3 drops object-key salting). */
    def decrypt(obj: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val key =
        if (r >= 5) fileKey
        else {
          val md = MessageDigest.getInstance("MD5")
          md.update(fileKey)
          md.update(Array[Byte](
            (obj & 0xFF).toByte, ((obj >> 8) & 0xFF).toByte,
            ((obj >> 16) & 0xFF).toByte,
            (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte))
          if (aes) md.update(Array[Byte](0x73, 0x41, 0x6C, 0x54))
          md.digest().take(math.min(fileKey.length + 5, 16))
        }
      if (aes) aesCbcDecrypt(key, data) else rc4(key, data)
    }
  }

  /** Build a handler when the file is encrypted with the standard
    * handler and opens with the EMPTY user password; None when the file
    * is unencrypted, needs a real password, or uses an unsupported
    * scheme. The /U entry is always verified before returning a
    * handler — a wrong key never silently produces garbage text. */
  def handlerFor(pdf: Array[Byte]): Option[Handler] =
    handlerFor(pdf, "")

  /** [[handlerFor]] with a USER password supplied as data (round 11 —
    * password-protected corpus files whose password rides in a side
    * column). ISO 32000 Algorithm 2 pads the password to 32 bytes with
    * the standard pad string (R≤4); Algorithm 2.A takes the UTF-8
    * bytes truncated to 127 (R5/R6). Verification is unchanged: the
    * derived key must reproduce /U (Algorithms 6/7 user-password
    * check) or the file refuses — a wrong password never emits
    * garbage. */
  def handlerFor(pdf: Array[Byte], password: String): Option[Handler] = {
    if (pdf == null || pdf.length < 8) return None
    val text = new String(pdf, StandardCharsets.ISO_8859_1)
    for {
      encDict <- findEncryptDict(text)
      if name(encDict, "Filter").contains("Standard")
      h <- buildHandler(encDict, firstFileId(text), password)
    } yield h
  }

  /** Revision-correct password bytes: ISO 32000-1 Algorithm 2 (R≤4)
    * consumes Latin-1/PDFDocEncoding bytes (an Acrobat-era contract —
    * UTF-8 here would mis-derive keys for non-ASCII passwords on real
    * files), while Algorithm 2.A (R5/R6) specifies UTF-8 truncated to
    * 127 bytes. Characters outside Latin-1 cannot appear in a legal
    * R≤4 password; they map to '?' and simply fail /U verification. */
  private[graft] def passBytes(password: String, r: Int): Array[Byte] =
    if (password == null) Array.emptyByteArray
    else if (r >= 5) password.getBytes(StandardCharsets.UTF_8).take(127)
    else password.map(c => if (c.toInt <= 0xff) c.toByte else '?'.toByte)
      .toArray

  /** Algorithm 2's 32-byte padded password (password bytes then the
    * pad constant). */
  private def padded(pass: Array[Byte]): Array[Byte] =
    (pass ++ Pad).take(32)

  // ---- trailer / dict location ----

  /** The /Encrypt dictionary text: direct `<<...>>` in the trailer, or
    * the referenced object's dict. Searches every trailer occurrence
    * (incremental updates append trailers; any of them may carry the
    * /Encrypt key — they all reference the same dict per spec). */
  private def findEncryptDict(text: String): Option[String] = {
    val re = """/Encrypt\s+(?:(\d+)\s+(\d+)\s+R|<<)""".r
    re.findAllMatchIn(text).flatMap { m =>
      if (m.group(1) != null) objectDict(text, m.group(1).toInt)
      else Some(PdfExtract.balancedDictAt(text, m.start))
    }.find(_.nonEmpty)
  }

  /** Dict text of object `num` (first `<<...>>` after its header). */
  private def objectDict(text: String, num: Int): Option[String] = {
    val re = ("(?m)^\\s*" + num + "\\s+\\d+\\s+obj").r
    re.findFirstMatchIn(text)
      .map(m => PdfExtract.balancedDictAt(text, m.end))
      .filter(_.nonEmpty)
  }

  /** First element of the trailer /ID array (bytes), empty when absent
    * (legal per spec when the file is unencrypted; for encrypted files
    * a missing ID means we hash an empty suffix — matching what a
    * writer that omitted it would have hashed). */
  private def firstFileId(text: String): Array[Byte] = {
    val at = text.lastIndexOf("/ID")
    if (at < 0) return Array.emptyByteArray
    val open = text.indexOf('[', at)
    if (open < 0) return Array.emptyByteArray
    // first string opener of either form — the EARLIER match (taking
    // the later one could skip past the ID array entirely and parse
    // unrelated bytes; wrong bytes here fail /U verification, so the
    // failure mode was safe but needlessly lossy)
    val first = Seq(text.indexOf('<', open), text.indexOf('(', open))
      .filter(_ >= 0).minOption.getOrElse(return Array.emptyByteArray)
    stringAt(text, first).getOrElse(Array.emptyByteArray)
  }

  // ---- dict field parsing ----

  private def intField(dict: String, key: String): Option[Int] =
    ("/" + key + "\\s+(-?\\d+)").r.findFirstMatchIn(dict)
      .map(_.group(1).toInt)

  private def name(dict: String, key: String): Option[String] =
    ("/" + key + "\\s*/(\\w+)").r.findFirstMatchIn(dict)
      .map(_.group(1))

  private def boolField(dict: String, key: String): Option[Boolean] =
    ("/" + key + "\\s+(true|false)").r.findFirstMatchIn(dict)
      .map(_.group(1) == "true")

  /** String value (raw bytes) for /key in `dict` — literal or hex.
    * Scans SUCCESSIVE occurrences: the first indexOf hit may land on a
    * longer name (/UE when asked for /U, /OE for /O), and an encrypt
    * dict whose key order puts /UE before /U must still resolve /U —
    * returning None on the first miss misrouted supported files to the
    * error channel depending on writer key order. */
  private def strField(dict: String, key: String): Option[Array[Byte]] = {
    var at = dict.indexOf("/" + key)
    while (at >= 0) {
      var i = at + key.length + 1
      // the name must END here — a regular (non-delimiter) char means
      // this hit is a longer name; move to the next occurrence
      val longerName = i < dict.length && {
        val c = dict.charAt(i)
        !Character.isWhitespace(c) && "()<>[]{}/%".indexOf(c) < 0
      }
      if (!longerName) {
        while (i < dict.length && Character.isWhitespace(dict.charAt(i)))
          i += 1
        if (i < dict.length && (dict.charAt(i) == '(' ||
            (dict.charAt(i) == '<' &&
             (i + 1 >= dict.length || dict.charAt(i + 1) != '<'))))
          return stringAt(dict, i)
      }
      at = dict.indexOf("/" + key, at + 1)
    }
    None
  }

  /** Decode the PDF string starting exactly at `(` or `<` to bytes
    * (ISO-8859-1 char ↔ byte — the parse text was decoded 1:1). */
  private def stringAt(s: String, open: Int): Option[Array[Byte]] =
    s.charAt(open) match {
      case '(' =>
        Some(PdfExtract.literalStringAt(s, open)._1
          .toCharArray.map(_.toByte))
      case '<' =>
        Some(PdfExtract.hexStringAt(s, open)._1
          .toCharArray.map(_.toByte))
      case _ => None
    }

  // ---- key derivation ----

  private def buildHandler(dict: String, fileId: Array[Byte],
      password: String): Option[Handler] = {
    val v = intField(dict, "V").getOrElse(0)
    val r = intField(dict, "R").getOrElse(if (v >= 2) 3 else 2)
    val o = strField(dict, "O").getOrElse(return None)
    val u = strField(dict, "U").getOrElse(return None)
    val p = intField(dict, "P").getOrElse(return None)
    val pass = passBytes(password, r)
    if (r >= 5)
      return buildV5(dict, u, r, pass)
        .orElse(buildV5Owner(dict, u, r, pass))
    buildR4(dict, fileId, padded(pass), o, u, p, v, r)
      .orElse {
        // Algorithm 7: the same supplied password tried as the OWNER
        // password — rk from MD5(paddedOwner) (+50 rounds for R≥3)
        // decrypts /O back into the PADDED USER password, which then
        // must clear the normal Algorithm 6 /U check; any mismatch
        // still refuses. This is what interactive viewers do: one
        // password field, both roles attempted.
        val nBytes =
          if (r == 2) 5
          else math.max(5, math.min(16, intField(dict, "Length")
            .getOrElse(40) / 8))
        var rk = MessageDigest.getInstance("MD5").digest(padded(pass))
        if (r >= 3) {
          var i = 0
          while (i < 50) {
            rk = MessageDigest.getInstance("MD5").digest(rk.take(nBytes))
            i += 1
          }
        }
        rk = rk.take(nBytes)
        val recovered =
          if (r == 2) rc4(rk, o.take(32))
          else {
            var x = o.take(32)
            var i = 19
            while (i >= 0) {
              x = rc4(rk.map(b => (b ^ i).toByte), x)
              i -= 1
            }
            x
          }
        buildR4(dict, fileId, recovered, o, u, p, v, r)
      }
  }

  /** The R2-R4 user-password path over an ALREADY-PADDED 32-byte
    * password block (Algorithm 2 derivation + Algorithm 6 /U
    * verification). Shared by the direct user attempt and the
    * Algorithm-7 owner path (whose /O decryption yields the padded
    * user password directly). */
  private def buildR4(dict: String, fileId: Array[Byte],
      paddedPass: Array[Byte], o: Array[Byte], u: Array[Byte],
      p: Int, v: Int, r: Int): Option[Handler] = {
    // stream crypt method: V4 names a crypt filter; V1/V2 are RC4.
    // The /CFM must resolve POSITIVELY — if /CF is an indirect
    // reference or the named filter's /CFM is missing/unknown, refuse
    // (None → error channel) rather than default to RC4: /U verifies
    // only the KEY, not the cipher, so applying RC4 to AES-CBC
    // ciphertext would silently extract garbage, breaking the
    // "wrong key never silently produces garbage" contract.
    val aes: Boolean =
      if (v != 4) false
      else {
        val stmF = name(dict, "StmF").getOrElse("Identity")
        if (stmF == "Identity") false
        else {
          // /CF << /StdCF << /CFM /AESV2 >> >> — locate the named
          // filter's dict and read its /CFM
          val cfStart = dict.indexOf("/CF")
          val cfAt =
            if (cfStart < 0) -1 else dict.indexOf("/" + stmF, cfStart + 3)
          val cfm =
            if (cfAt < 0) None
            else name(PdfExtract.balancedDictAt(dict, cfAt), "CFM")
          cfm match {
            case Some("AESV2") => true
            case Some("V2") => false // explicit RC4 crypt filter
            case _ => return None // indirect /CF or unknown CFM
          }
        }
      }
    val nBytes =
      if (r == 2) 5
      else math.max(5, math.min(16, intField(dict, "Length")
        .getOrElse(40) / 8))
    // Algorithm 2: MD5(paddedPass ‖ O ‖ P₄LE ‖ ID[0] [‖ FFFFFFFF])
    // then for R≥3 fifty MD5 rounds over the first n bytes
    val md = MessageDigest.getInstance("MD5")
    md.update(paddedPass)
    md.update(o.take(32))
    md.update(Array[Byte](
      (p & 0xFF).toByte, ((p >> 8) & 0xFF).toByte,
      ((p >> 16) & 0xFF).toByte, ((p >> 24) & 0xFF).toByte))
    md.update(fileId)
    if (r >= 4 && !boolField(dict, "EncryptMetadata").getOrElse(true))
      md.update(Array[Byte](-1, -1, -1, -1))
    var key = md.digest()
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        key = MessageDigest.getInstance("MD5").digest(key.take(nBytes))
        i += 1
      }
    }
    key = key.take(nBytes)
    // Algorithm 6: verify the (possibly empty) user password against /U
    val expected =
      if (r == 2) rc4(key, Pad) // Algorithm 4
      else { // Algorithm 5
        val h = MessageDigest.getInstance("MD5")
        h.update(Pad); h.update(fileId)
        var x = rc4(key, h.digest())
        var i = 1
        while (i <= 19) {
          x = rc4(key.map(b => (b ^ i).toByte), x)
          i += 1
        }
        x
      }
    val ok =
      if (r == 2) java.util.Arrays.equals(expected, u.take(32))
      else java.util.Arrays.equals(expected.take(16), u.take(16))
    if (ok) Some(Handler(key, aes, r)) else None
  }

  /** V5/R5/R6 (AES-256): validate the user password against
    * /U[0,32) with its validation salt /U[32,40), then recover the file
    * key by decrypting /UE with the intermediate key from the key salt
    * /U[40,48) (ISO 32000-2 Algorithms 2.A/2.B/8). */
  private def buildV5(dict: String, u: Array[Byte], r: Int,
      pass: Array[Byte]): Option[Handler] = {
    if (u.length < 48) return None
    val ue = strField(dict, "UE").getOrElse(return None)
    if (ue.length < 32) return None
    def hash(salt: Array[Byte]): Array[Byte] =
      if (r == 5) MessageDigest.getInstance("SHA-256")
        .digest(pass ++ salt)
      else hash2b(pass, salt)
    if (!java.util.Arrays.equals(hash(u.slice(32, 40)), u.take(32)))
      return None
    val ik = hash(u.slice(40, 48))
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    try {
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(ik, "AES"),
        new IvParameterSpec(new Array[Byte](16)))
      Some(Handler(c.doFinal(ue.take(32)), aes = true, r = r))
    } catch { // AES-256 unavailable in this JRE → unsupported, not wrong
      case _: java.security.GeneralSecurityException => None
    }
  }

  /** R5/R6 OWNER-password opening: validate against /O[0,32) with its
    * validation salt /O[32,40) and udata = /U[0,48) (the 2.A/2.B owner
    * forms hash the U block too), then decrypt /OE with the
    * intermediate key from the key salt /O[40,48) to recover the same
    * file key /UE carries (ISO 32000-2 Algorithm 9 counterpart). */
  private def buildV5Owner(dict: String, u: Array[Byte], r: Int,
      pass: Array[Byte]): Option[Handler] = {
    if (u.length < 48) return None
    val o = strField(dict, "O").getOrElse(return None)
    if (o.length < 48) return None
    val oe = strField(dict, "OE").getOrElse(return None)
    if (oe.length < 32) return None
    val udata = u.take(48)
    def hash(salt: Array[Byte]): Array[Byte] =
      if (r == 5) MessageDigest.getInstance("SHA-256")
        .digest(pass ++ salt ++ udata)
      else hash2b(pass, salt, udata)
    if (!java.util.Arrays.equals(hash(o.slice(32, 40)), o.take(32)))
      return None
    val ik = hash(o.slice(40, 48))
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    try {
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(ik, "AES"),
        new IvParameterSpec(new Array[Byte](16)))
      Some(Handler(c.doFinal(oe.take(32)), aes = true, r = r))
    } catch {
      case _: java.security.GeneralSecurityException => None
    }
  }

  /** ISO 32000-2 Algorithm 2.B hardened hash (R6). `udata` is empty for
    * user-password derivation (it carries /U only on the owner path). */
  private[graft] def hash2b(pass: Array[Byte], salt: Array[Byte],
      udata: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    var k = MessageDigest.getInstance("SHA-256")
      .digest(pass ++ salt ++ udata)
    var round = 0
    var lastE = 0
    while (round < 64 || lastE > round - 32) {
      val block = pass ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(Cipher.ENCRYPT_MODE,
        new SecretKeySpec(k.take(16), "AES"),
        new IvParameterSpec(k.slice(16, 32)))
      val e = c.doFinal(k1)
      val mod = e.take(16).map(_ & 0xFF).sum % 3
      k = MessageDigest.getInstance(
        if (mod == 0) "SHA-256" else if (mod == 1) "SHA-384" else
          "SHA-512").digest(e)
      lastE = e(e.length - 1) & 0xFF
      round += 1
    }
    k.take(32)
  }

  // ---- ciphers ----

  /** RC4 (symmetric: encryption == decryption). Public algorithm;
    * inline because the JRE's ARCFOUR provider is not guaranteed. */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte])
      : Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var n = 0
    while (n < data.length) {
      x = (x + 1) & 0xFF
      y = (y + s(x)) & 0xFF
      val t = s(x); s(x) = s(y); s(y) = t
      out(n) = (data(n) ^ s((s(x) + s(y)) & 0xFF)).toByte
      n += 1
    }
    out
  }

  /** AES-CBC with the spec's 16-byte IV prefix; PKCS#7 padding stripped
    * manually so a corrupt final block degrades to best-effort bytes
    * instead of throwing mid-extraction. */
  private[graft] def aesCbcDecrypt(key: Array[Byte], data: Array[Byte])
      : Array[Byte] = {
    if (data.length < 32 || data.length % 16 != 0)
      return Array.emptyByteArray
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    try {
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
        new IvParameterSpec(data.take(16)))
      val plain = c.doFinal(data.drop(16))
      val padLen = plain(plain.length - 1) & 0xFF
      if (padLen >= 1 && padLen <= 16 && padLen <= plain.length)
        plain.dropRight(padLen)
      else plain
    } catch {
      case _: java.security.GeneralSecurityException =>
        Array.emptyByteArray
    }
  }
}
