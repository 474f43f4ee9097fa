package graft.functions

/** Minimal TrueType/OpenType `cmap` table reader (public sfnt spec) —
  * the CID-font recovery path for PDFs whose Type0 fonts carry NO
  * /ToUnicode CMap (the r10 PdfExtract cut line; the reference's Tika
  * sidecar recovers these, modules/pdf_extractor.py:206-253).
  *
  * Chain being inverted: with /Encoding /Identity-H the 2-byte string
  * codes ARE CIDs; /CIDToGIDMap sends CID → glyph id; the embedded
  * font's own cmap sends unicode → glyph id. Inverting the font cmap
  * (lowest codepoint wins per glyph) therefore yields glyph → unicode,
  * and composition recovers code → text without any external CMap
  * registry. Subset fonts keep their (subset) cmap, so the common
  * embedded-subset case round-trips.
  *
  * Supported cmap subtable formats: 4 (segmented BMP — the Windows
  * 3/1 staple) and 12 (segmented coverage, full codepoint range).
  * Best-effort on untrusted bytes: any structural violation returns
  * None/empty, never throws.
  */
object TrueTypeCmap {

  private final class Reader(b: Array[Byte]) {
    def ok(at: Int, n: Int): Boolean = at >= 0 && at + n <= b.length
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long = (u16(i).toLong << 16) | u16(i + 2)
  }

  /** glyph id -> unicode codepoint (lowest codepoint per glyph). */
  def glyphToUnicode(font: Array[Byte]): Map[Int, Int] = {
    if (font == null || font.length < 12) return Map.empty
    val r = new Reader(font)
    try {
      val numTables = r.u16(4)
      if (numTables <= 0 || numTables > 512) return Map.empty
      var cmapOff = -1
      var i = 0
      while (i < numTables && cmapOff < 0) {
        val rec = 12 + 16 * i
        if (!r.ok(rec, 16)) return Map.empty
        val tag = new String(font, rec, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        if (tag == "cmap") cmapOff = r.u32(rec + 8).toInt
        i += 1
      }
      if (cmapOff < 0 || !r.ok(cmapOff, 4)) return Map.empty
      val n = r.u16(cmapOff + 2)
      // prefer a unicode subtable: (3,10) fmt12 > (3,1) fmt4 > (0,*)
      var best = -1
      var bestScore = -1
      var j = 0
      while (j < n) {
        val rec = cmapOff + 4 + 8 * j
        if (!r.ok(rec, 8)) return Map.empty
        val plat = r.u16(rec); val enc = r.u16(rec + 2)
        val off = cmapOff + r.u32(rec + 4).toInt
        val score = (plat, enc) match {
          case (3, 10) => 4
          case (3, 1) => 3
          case (0, _) => 2
          case _ => 0
        }
        if (score > bestScore && r.ok(off, 2)) {
          bestScore = score; best = off
        }
        j += 1
      }
      if (best < 0) return Map.empty
      val acc = scala.collection.mutable.Map.empty[Int, Int]
      // hard work/size cap: a crafted cmap (100k max-span format-12
      // groups, or 32k full-range format-4 segments) would otherwise
      // drive billions of iterations / unbounded map growth on one
      // poison row — real fonts map far below 2^17 codepoints, and
      // best-effort means returning what was walked, not spinning
      var budget = 1 << 17
      def put(uni: Int, gid: Int): Unit = {
        budget -= 1
        // reject out-of-range codepoints at the source: format-12
        // group starts come from untrusted u32().toInt, so a crafted
        // group can pass the span guard with uni < 0 or > 0x10FFFF —
        // storing it would make Character.toChars throw downstream.
        // Surrogates (U+D800-U+DFFF) are excluded too: toChars does
        // NOT throw for them, it returns a lone surrogate char, and
        // the extracted string would be ill-formed UTF-16 (silently
        // mangled to U+FFFD at every UTF-8 boundary downstream)
        if (gid != 0 && uni != 0xffff &&
            (uni >= 0 && uni < 0xd800 ||
             uni > 0xdfff && uni <= 0x10ffff))
          acc.updateWith(gid) {
            case Some(prev) => Some(math.min(prev, uni))
            case None => Some(uni)
          }
      }
      r.u16(best) match {
        case 4 =>
          val segX2 = r.u16(best + 6)
          val seg = segX2 / 2
          val endAt = best + 14
          val startAt = endAt + segX2 + 2
          val deltaAt = startAt + segX2
          val rangeAt = deltaAt + segX2
          if (!r.ok(rangeAt, segX2)) return Map.empty
          var s = 0
          while (s < seg && budget > 0) {
            val end = r.u16(endAt + 2 * s)
            val start = r.u16(startAt + 2 * s)
            val delta = r.u16(deltaAt + 2 * s)
            val ro = r.u16(rangeAt + 2 * s)
            if (start <= end && end - start < 0x10000) {
              var c = start
              while (c <= end && budget > 0) {
                val gid =
                  if (ro == 0) (c + delta) & 0xffff
                  else {
                    val addr = rangeAt + 2 * s + ro + 2 * (c - start)
                    if (!r.ok(addr, 2)) 0
                    else {
                      val g = r.u16(addr)
                      if (g == 0) 0 else (g + delta) & 0xffff
                    }
                  }
                put(c, gid)
                c += 1
              }
            }
            s += 1
          }
        case 12 =>
          val nGroups = r.u32(best + 12)
          if (nGroups < 0 || nGroups > 100000) return Map.empty
          var g = 0
          while (g < nGroups && budget > 0) {
            val at = best + 16 + 12 * g
            if (!r.ok(at, 12)) return acc.toMap
            val sc = r.u32(at).toInt
            val ec = r.u32(at + 4).toInt
            val sg = r.u32(at + 8).toInt
            if (sc <= ec && ec - sc < 0x10000) {
              var c = sc
              while (c <= ec && budget > 0) {
                put(c, sg + (c - sc)); c += 1
              }
            }
            g += 1
          }
        case _ => return Map.empty
      }
      acc.toMap
    } catch { case _: Exception => Map.empty }
  }

  /** CID-code -> unicode string for an Identity-H Type0 font:
    * composes the inverted font cmap with /CIDToGIDMap (Identity when
    * `cidToGid` is None, else the 2-byte-BE-per-CID stream). */
  def cidToUnicode(font: Array[Byte],
      cidToGid: Option[Array[Byte]]): Map[Int, String] = try {
    val g2u = glyphToUnicode(font)
    if (g2u.isEmpty) return Map.empty
    cidToGid match {
      case None =>
        g2u.map { case (gid, uni) =>
          gid -> new String(Character.toChars(uni))
        }
      case Some(m) =>
        val out = Map.newBuilder[Int, String]
        var cid = 0
        while (2 * cid + 1 < m.length) {
          val gid = ((m(2 * cid) & 0xff) << 8) | (m(2 * cid + 1) & 0xff)
          g2u.get(gid).foreach(uni =>
            out += cid -> new String(Character.toChars(uni)))
          cid += 1
        }
        out.result()
    }
    // same never-throws contract as glyphToUnicode: untrusted bytes
    // yield an empty map, never an exception out of the extract UDF
  } catch { case _: Exception => Map.empty }
}
