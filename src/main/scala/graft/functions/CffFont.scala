package graft.functions

/** Minimal CFF (Compact Font Format) reader — the remaining CID-font
  * recovery path for PDFs whose fonts embed a bare CFF (`/FontFile3`,
  * subtype Type1C / CIDFontType0C) with NO /ToUnicode CMap. The
  * classic LaTeX / academic-publisher shape: pdfTeX converts Type 1
  * fonts to CFF and relies on the font's own charset + encoding
  * tables; the reference recovers these through its Tika sidecar
  * (welearn_datastack/modules/pdf_extractor.py:206-253).
  *
  * Chain being inverted here: the CFF `charset` maps GID -> SID (a
  * string id naming the glyph); SIDs resolve through the standard
  * strings table (SID < 391, CFF spec Appendix A) or the font's own
  * String INDEX; glyph NAMES resolve to text through GlyphNames' AGL
  * conventions. The CFF `Encoding` table (or the predefined Standard
  * Encoding, Appendix B) supplies code -> GID for simple fonts.
  *
  * CID-keyed CFFs (Top DICT carries a ROS operator) have no glyph
  * names — their charset SIDs are CIDs — so name-based recovery is
  * impossible by construction; [[glyphNames]] returns empty for them
  * and the caller falls through to the raw-byte boundary. Expert-set
  * standard strings (SIDs 229-390: small caps, oldstyle figures)
  * are intentionally unresolved: none map to AGL text.
  *
  * Best-effort on untrusted bytes: any structural violation returns
  * empty, never throws.
  */
object CffFont {

  private final class Reader(b: Array[Byte]) {
    def ok(at: Int, n: Int): Boolean =
      at >= 0 && n >= 0 && at + n <= b.length
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u24(i: Int): Int = (u16(i) << 8) | u8(i + 2)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
    def off(i: Int, offSize: Int): Long = offSize match {
      case 1 => u8(i)
      case 2 => u16(i)
      case 3 => u24(i)
      case 4 => u32(i)
      case _ => -1L
    }
  }

  /** An INDEX structure: (endOffset, item extractor). Items are
    * (start, length) spans into the underlying array. */
  private final case class Index(end: Int, items: Vector[(Int, Int)])

  /** Parse the INDEX at `at`; None on any structural violation.
    * Caps count at 65535 (its card16 limit) and total data at the
    * array length — untrusted offsets cannot allocate past input. */
  private def readIndex(r: Reader, at: Int): Option[Index] = {
    if (!r.ok(at, 2)) return None
    val count = r.u16(at)
    if (count == 0) return Some(Index(at + 2, Vector.empty))
    if (!r.ok(at + 2, 1)) return None
    val offSize = r.u8(at + 2)
    if (offSize < 1 || offSize > 4) return None
    val offAt = at + 3
    if (!r.ok(offAt, (count + 1) * offSize)) return None
    val dataAt = offAt + (count + 1) * offSize - 1 // offsets are 1-based
    val offs = new Array[Long](count + 1)
    var i = 0
    while (i <= count) {
      offs(i) = r.off(offAt + i * offSize, offSize)
      if (offs(i) < 1 || (i > 0 && offs(i) < offs(i - 1))) return None
      i += 1
    }
    val end = dataAt + offs(count)
    if (!r.ok(dataAt + 1, (offs(count) - 1).toInt)) return None
    val items = (0 until count).map { k =>
      (dataAt + offs(k).toInt, (offs(k + 1) - offs(k)).toInt)
    }.toVector
    Some(Index(end.toInt, items))
  }

  /** Top DICT ops we need: charset(15), Encoding(16), CharStrings(17),
    * ROS(12 30). Returns op -> first integer operand (ROS -> 1 as a
    * presence flag). */
  private def readTopDict(b: Array[Byte], start: Int, len: Int)
      : Map[Int, Long] = {
    val out = scala.collection.mutable.Map.empty[Int, Long]
    val operands = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = start
    val end = start + len
    while (i < end) {
      val b0 = b(i) & 0xff
      if (b0 <= 21) { // operator
        val op = if (b0 == 12) {
          i += 1
          if (i >= end) return out.toMap
          1200 + (b(i) & 0xff)
        } else b0
        val v = if (op == 1230) 1L // ROS: presence is the signal
          else operands.headOption.getOrElse(0L)
        out(op) = v
        operands.clear()
        i += 1
      } else if (b0 == 28) {
        if (i + 2 >= end) return out.toMap
        operands += ((b(i + 1) << 8) | (b(i + 2) & 0xff)).toShort.toLong
        i += 3
      } else if (b0 == 29) {
        if (i + 4 >= end) return out.toMap
        operands += (((b(i + 1) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) |
          ((b(i + 3) & 0xff) << 8) | (b(i + 4) & 0xff)).toLong
        i += 5
      } else if (b0 == 30) { // real: nibble stream terminated by 0xf
        i += 1
        var done = false
        while (i < end && !done) {
          val n = b(i) & 0xff
          if ((n & 0x0f) == 0x0f || (n >> 4) == 0x0f) done = true
          i += 1
        }
        operands += 0L // value unused by the ops we read
      } else if (b0 >= 32 && b0 <= 246) {
        operands += (b0 - 139).toLong; i += 1
      } else if (b0 >= 247 && b0 <= 250) {
        if (i + 1 >= end) return out.toMap
        operands += ((b0 - 247) * 256 + (b(i + 1) & 0xff) + 108).toLong
        i += 2
      } else if (b0 >= 251 && b0 <= 254) {
        if (i + 1 >= end) return out.toMap
        operands += (-(b0 - 251) * 256 - (b(i + 1) & 0xff) - 108).toLong
        i += 2
      } else return out.toMap // reserved byte: stop cleanly
    }
    out.toMap
  }

  /** Parsed skeleton: nGlyphs, Top DICT ops, String INDEX items. */
  private final case class Skeleton(r: Reader, b: Array[Byte],
      nGlyphs: Int, top: Map[Int, Long], strings: Index)

  private def skeleton(cff: Array[Byte]): Option[Skeleton] = {
    if (cff == null || cff.length < 8) return None
    val r = new Reader(cff)
    val hdrSize = r.u8(2)
    if (hdrSize < 4 || hdrSize > cff.length) return None
    for {
      nameIdx <- readIndex(r, hdrSize)
      topIdx <- readIndex(r, nameIdx.end)
      (tdAt, tdLen) <- topIdx.items.headOption
      strIdx <- readIndex(r, topIdx.end)
      top = readTopDict(cff, tdAt, tdLen)
      csAt <- top.get(17) // CharStrings offset, from CFF start
      if csAt > 0 && csAt < cff.length
      csIdx <- readIndex(r, csAt.toInt)
    } yield Skeleton(r, cff, csIdx.items.length, top, strIdx)
  }

  /** True when the Top DICT carries a ROS operator (CID-keyed CFF:
    * charset entries are CIDs, the font has no glyph names). */
  def isCidKeyed(cff: Array[Byte]): Boolean =
    try skeleton(cff).exists(_.top.contains(1230))
    catch { case _: Exception => false }

  /** GID -> SID (or CID for CID-keyed fonts) from the charset table.
    * GID 0 is always .notdef (SID 0). Predefined charset 0 (ISOAdobe)
    * is the identity mapping over the first 229 SIDs. */
  private def charsetSids(s: Skeleton): Map[Int, Int] = {
    val n = s.nGlyphs
    if (n <= 0 || n > 65536) return Map.empty
    val out = scala.collection.mutable.Map.empty[Int, Int]
    s.top.getOrElse(15, 0L) match {
      case 0L => // ISOAdobe: SID g for gid g
        var g = 1
        while (g < math.min(n, 229)) { out(g) = g; g += 1 }
      case 1L | 2L => return Map.empty // Expert charsets: no AGL names
      case at if at > 0 && at < s.b.length =>
        val r = s.r
        val fmt = if (r.ok(at.toInt, 1)) r.u8(at.toInt) else -1
        fmt match {
          case 0 =>
            var g = 1
            var i = at.toInt + 1
            while (g < n && r.ok(i, 2)) {
              out(g) = r.u16(i); g += 1; i += 2
            }
          case 1 | 2 =>
            val leftW = if (fmt == 1) 1 else 2
            var g = 1
            var i = at.toInt + 1
            while (g < n && r.ok(i, 2 + leftW)) {
              val first = r.u16(i)
              val nLeft = if (fmt == 1) r.u8(i + 2) else r.u16(i + 2)
              var k = 0
              while (k <= nLeft && g < n) {
                out(g) = first + k; g += 1; k += 1
              }
              i += 2 + leftW
            }
          case _ => return Map.empty
        }
      case _ => return Map.empty
    }
    out.toMap
  }

  private def sidName(s: Skeleton, sid: Int): Option[String] =
    if (sid >= 0 && sid < StdStrings.length)
      Option(StdStrings(sid)) // Expert-set entries are null: no AGL text
    else {
      val k = sid - 391
      if (k >= 0 && k < s.strings.items.length) {
        val (at, len) = s.strings.items(k)
        if (len > 0 && len <= 127)
          Some(new String(s.b, at, len,
            java.nio.charset.StandardCharsets.US_ASCII))
        else None
      } else None
    }

  /** GID -> glyph name for a non-CID CFF; empty for CID-keyed fonts
    * or on any structural violation. */
  def glyphNames(cff: Array[Byte]): Map[Int, String] = try {
    skeleton(cff) match {
      case Some(s) if !s.top.contains(1230) =>
        charsetSids(s).flatMap { case (gid, sid) =>
          sidName(s, sid).map(gid -> _)
        }
      case _ => Map.empty
    }
  } catch { case _: Exception => Map.empty }

  /** GID -> CID for a CID-keyed CFF (the charset IS the CID map);
    * empty for name-keyed fonts. Parser-surface API: production
    * extraction cannot consume it yet — a CID resolved here still
    * needs a predefined CMap registry (UniJIS/UniGB tables, the
    * documented CJK boundary in COVERAGE S15) to become text, so its
    * only callers are the specs that pin charset parsing against
    * known-answer fonts. Wire it into viaCff when/if the registry
    * tables land. */
  def gidToCid(cff: Array[Byte]): Map[Int, Int] = try {
    skeleton(cff) match {
      case Some(s) if s.top.contains(1230) => charsetSids(s)
      case _ => Map.empty
    }
  } catch { case _: Exception => Map.empty }

  /** code -> GID for a simple (name-keyed) CFF: the font's own
    * Encoding table (formats 0/1 plus supplements), or the predefined
    * Standard Encoding composed through the charset's name->gid
    * inverse. Empty for CID-keyed fonts (they have no encoding). */
  def builtinEncoding(cff: Array[Byte]): Map[Int, Int] = try {
    skeleton(cff) match {
      case Some(s) if !s.top.contains(1230) =>
        val r = s.r
        s.top.getOrElse(16, 0L) match {
          case at if at > 1 && at < s.b.length =>
            val out = scala.collection.mutable.Map.empty[Int, Int]
            if (!r.ok(at.toInt, 2)) return Map.empty
            val fmtByte = r.u8(at.toInt)
            val fmt = fmtByte & 0x7f
            var supAt = -1
            if (fmt == 0) {
              val nCodes = r.u8(at.toInt + 1)
              var i = 0
              while (i < nCodes && r.ok(at.toInt + 2 + i, 1)) {
                out(r.u8(at.toInt + 2 + i)) = i + 1 // code of gid i+1
                i += 1
              }
              supAt = at.toInt + 2 + nCodes
            } else if (fmt == 1) {
              val nRanges = r.u8(at.toInt + 1)
              var g = 1
              var i = at.toInt + 2
              var k = 0
              while (k < nRanges && r.ok(i, 2)) {
                val first = r.u8(i)
                val nLeft = r.u8(i + 1)
                var c = 0
                while (c <= nLeft) { out(first + c) = g; g += 1; c += 1 }
                i += 2; k += 1
              }
              supAt = i
            } else return Map.empty
            if ((fmtByte & 0x80) != 0 && r.ok(supAt, 1)) {
              // supplements: nSups x (code card8, SID card16) — map the
              // extra code to the glyph whose charset SID matches
              val sidToGid = charsetSids(s).map(_.swap)
              val nSups = r.u8(supAt)
              var k = 0
              while (k < nSups && r.ok(supAt + 1 + 3 * k, 3)) {
                val code = r.u8(supAt + 1 + 3 * k)
                val sid = r.u16(supAt + 2 + 3 * k)
                sidToGid.get(sid).foreach(out(code) = _)
                k += 1
              }
            }
            out.toMap
          case 0L => // predefined Standard Encoding: code -> SID ->
            // (via charset inverse) -> gid
            val sidToGid = charsetSids(s).map(_.swap)
            StdEncodingSids.iterator.flatMap { case (code, sid) =>
              sidToGid.get(sid).map(code -> _)
            }.toMap
          case _ => Map.empty // Expert encoding: no AGL-resolvable text
        }
      case _ => Map.empty
    }
  } catch { case _: Exception => Map.empty }

  /** Standard strings, CFF spec Appendix A, SIDs 0-228. The Expert
    * set (229-390) is deliberately null-filled: small-caps/oldstyle
    * variant names that never resolve through AGL. */
  private val StdStrings: Array[String] = {
    val a = new Array[String](391)
    val head = Array(
      ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
      "percent", "ampersand", "quoteright", "parenleft", "parenright",
      "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero",
      "one", "two", "three", "four", "five", "six", "seven", "eight",
      "nine", "colon", "semicolon", "less", "equal", "greater",
      "question", "at", "A", "B", "C", "D", "E", "F", "G", "H", "I",
      "J", "K", "L", "M", "N", "O", "P", "Q", "R", "S", "T", "U", "V",
      "W", "X", "Y", "Z", "bracketleft", "backslash", "bracketright",
      "asciicircum", "underscore", "quoteleft", "a", "b", "c", "d",
      "e", "f", "g", "h", "i", "j", "k", "l", "m", "n", "o", "p", "q",
      "r", "s", "t", "u", "v", "w", "x", "y", "z", "braceleft", "bar",
      "braceright", "asciitilde", "exclamdown", "cent", "sterling",
      "fraction", "yen", "florin", "section", "currency",
      "quotesingle", "quotedblleft", "guillemotleft", "guilsinglleft",
      "guilsinglright", "fi", "fl", "endash", "dagger", "daggerdbl",
      "periodcentered", "paragraph", "bullet", "quotesinglbase",
      "quotedblbase", "quotedblright", "guillemotright", "ellipsis",
      "perthousand", "questiondown", "grave", "acute", "circumflex",
      "tilde", "macron", "breve", "dotaccent", "dieresis", "ring",
      "cedilla", "hungarumlaut", "ogonek", "caron", "emdash", "AE",
      "ordfeminine", "Lslash", "Oslash", "OE", "ordmasculine", "ae",
      "dotlessi", "lslash", "oslash", "oe", "germandbls",
      "onesuperior", "logicalnot", "mu", "trademark", "Eth", "onehalf",
      "plusminus", "Thorn", "onequarter", "divide", "brokenbar",
      "degree", "thorn", "threequarters", "twosuperior", "registered",
      "minus", "eth", "multiply", "threesuperior", "copyright",
      "Aacute", "Acircumflex", "Adieresis", "Agrave", "Aring",
      "Atilde", "Ccedilla", "Eacute", "Ecircumflex", "Edieresis",
      "Egrave", "Iacute", "Icircumflex", "Idieresis", "Igrave",
      "Ntilde", "Oacute", "Ocircumflex", "Odieresis", "Ograve",
      "Otilde", "Scaron", "Uacute", "Ucircumflex", "Udieresis",
      "Ugrave", "Yacute", "Ydieresis", "Zcaron", "aacute",
      "acircumflex", "adieresis", "agrave", "aring", "atilde",
      "ccedilla", "eacute", "ecircumflex", "edieresis", "egrave",
      "iacute", "icircumflex", "idieresis", "igrave", "ntilde",
      "oacute", "ocircumflex", "odieresis", "ograve", "otilde",
      "scaron", "uacute", "ucircumflex", "udieresis", "ugrave",
      "yacute", "ydieresis", "zcaron")
    System.arraycopy(head, 0, a, 0, head.length)
    a
  }

  /** Standard Encoding, CFF spec Appendix B: code -> SID. Codes
    * 32-126 are sequential SIDs 1-95; the upper region is the classic
    * Type 1 StandardEncoding layout. */
  private val StdEncodingSids: Map[Int, Int] = {
    val seq = (32 to 126).map(c => c -> (c - 31))
    val high = Seq(
      161 -> 96, 162 -> 97, 163 -> 98, 164 -> 99, 165 -> 100,
      166 -> 101, 167 -> 102, 168 -> 103, 169 -> 104, 170 -> 105,
      171 -> 106, 172 -> 107, 173 -> 108, 174 -> 109, 175 -> 110,
      177 -> 111, 178 -> 112, 179 -> 113, 180 -> 114, 182 -> 115,
      183 -> 116, 184 -> 117, 185 -> 118, 186 -> 119, 187 -> 120,
      188 -> 121, 189 -> 122, 191 -> 123, 193 -> 124, 194 -> 125,
      195 -> 126, 196 -> 127, 197 -> 128, 198 -> 129, 199 -> 130,
      200 -> 131, 202 -> 132, 203 -> 133, 205 -> 134, 206 -> 135,
      207 -> 136, 208 -> 137, 225 -> 138, 227 -> 139, 232 -> 140,
      233 -> 141, 234 -> 142, 235 -> 143, 241 -> 144, 245 -> 145,
      248 -> 146, 249 -> 147, 250 -> 148, 251 -> 149)
    (seq ++ high).toMap
  }
}
