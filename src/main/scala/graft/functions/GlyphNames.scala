package graft.functions

/** Glyph-name → unicode resolution for simple-font /Differences
  * encodings (round 11): PostScript glyph names follow the public
  * Adobe Glyph List conventions — `uniXXXX`/`uXXXX..` hex forms plus
  * a dictionary of conventional names. The subset here covers the
  * Latin/LaTeX-subset names that dominate academic-corpus PDFs
  * (letters, digits, ASCII punctuation, the TeX quote/dash set,
  * ligatures, and the common accented Latin-1 block); unknown names
  * resolve to None and the code keeps its raw byte (the pre-r11
  * behavior), never garbage.
  */
object GlyphNames {

  private val named: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    // single-letter names ARE the letters
    ('A' to 'Z').foreach(c => b += c.toString -> c.toString)
    ('a' to 'z').foreach(c => b += c.toString -> c.toString)
    b ++= Seq(
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
      "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
      "eight" -> "8", "nine" -> "9",
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "minus" -> "−",
      "period" -> ".", "slash" -> "/", "colon" -> ":",
      "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@",
      "bracketleft" -> "[", "backslash" -> "\\",
      "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{",
      "bar" -> "|", "braceright" -> "}", "asciitilde" -> "~",
      // TeX/typographic set
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "quotesinglbase" -> "‚", "quotedblbase" -> "„",
      "endash" -> "–", "emdash" -> "—",
      "bullet" -> "•", "ellipsis" -> "…",
      "dagger" -> "†", "daggerdbl" -> "‡",
      "guillemotleft" -> "«", "guillemotright" -> "»",
      "guilsinglleft" -> "‹", "guilsinglright" -> "›",
      "fi" -> "ﬁ", "fl" -> "ﬂ", "ffi" -> "ﬃ",
      "ffl" -> "ﬄ", "ff" -> "ﬀ",
      "dotlessi" -> "ı", "germandbls" -> "ß",
      "ae" -> "æ", "AE" -> "Æ", "oe" -> "œ",
      "OE" -> "Œ", "oslash" -> "ø", "Oslash" -> "Ø",
      "aring" -> "å", "Aring" -> "Å",
      "ccedilla" -> "ç", "Ccedilla" -> "Ç",
      "ntilde" -> "ñ", "Ntilde" -> "Ñ",
      "degree" -> "°", "sterling" -> "£",
      "yen" -> "¥", "cent" -> "¢", "Euro" -> "€",
      "section" -> "§", "paragraph" -> "¶",
      "copyright" -> "©", "registered" -> "®",
      "trademark" -> "™", "plusminus" -> "±",
      "multiply" -> "×", "divide" -> "÷",
      "micro" -> "µ", "exclamdown" -> "¡",
      "questiondown" -> "¿")
    // acute/grave/circumflex/dieresis/tilde over aeiou(+y) — the
    // Latin-1 accent block by systematic name
    val accents = Seq(
      ("acute", Map('a' -> 0xe1, 'e' -> 0xe9, 'i' -> 0xed, 'o' -> 0xf3,
        'u' -> 0xfa, 'y' -> 0xfd)),
      ("grave", Map('a' -> 0xe0, 'e' -> 0xe8, 'i' -> 0xec, 'o' -> 0xf2,
        'u' -> 0xf9)),
      ("circumflex", Map('a' -> 0xe2, 'e' -> 0xea, 'i' -> 0xee,
        'o' -> 0xf4, 'u' -> 0xfb)),
      ("dieresis", Map('a' -> 0xe4, 'e' -> 0xeb, 'i' -> 0xef,
        'o' -> 0xf6, 'u' -> 0xfc, 'y' -> 0xff)),
      ("tilde", Map('a' -> 0xe3, 'o' -> 0xf5)))
    accents.foreach { case (suffix, m) =>
      m.foreach { case (base, code) =>
        b += s"$base$suffix" -> code.toChar.toString
        // uppercase form is lowercase - 0x20 in Latin-1 (except ÿ)
        if (code != 0xff)
          b += s"${base.toUpper}$suffix" -> (code - 0x20).toChar.toString
      }
    }
    b.result()
  }

  /** Every UTF-16 unit either non-surrogate, or part of a
    * high-then-low pair. */
  private def wellFormedUtf16(units: Seq[Int]): Boolean = {
    var i = 0
    while (i < units.length) {
      val u = units(i)
      if (u >= 0xd800 && u <= 0xdbff) {
        if (i + 1 >= units.length || units(i + 1) < 0xdc00 ||
            units(i + 1) > 0xdfff) return false
        i += 2
      } else if (u >= 0xdc00 && u <= 0xdfff) return false
      else i += 1
    }
    true
  }

  /** Resolve one glyph name; None for unknown names. */
  def toText(name: String): Option[String] = {
    if (name == null || name.isEmpty) return None
    named.get(name).orElse {
      // uniXXXX[XXXX]* — one or more 4-hex-digit UTF-16 code units
      if (name.startsWith("uni") && name.length >= 7 &&
          (name.length - 3) % 4 == 0 &&
          name.drop(3).forall(c => Character.digit(c, 16) >= 0)) {
        val units = name.drop(3).grouped(4)
          .map(Integer.parseInt(_, 16)).toSeq
        // UNPAIRED surrogates would break downstream UTF-8; a
        // well-formed high+low pair is a legal codepoint some
        // non-AGL-strict fonts spell this way (uniD83DDE00) — keep it
        if (wellFormedUtf16(units)) Some(units.map(_.toChar).mkString)
        else None
      // uXXXX / uXXXXX / uXXXXXX — one codepoint, 4-6 hex digits
      } else if (name.startsWith("u") && name.length >= 5 &&
          name.length <= 7 &&
          name.drop(1).forall(c => Character.digit(c, 16) >= 0)) {
        val cp = Integer.parseInt(name.drop(1), 16)
        if (cp >= 0 && cp <= 0x10ffff &&
            !(cp >= 0xd800 && cp <= 0xdfff))
          Some(new String(Character.toChars(cp)))
        else None
      } else None
    }
  }
}
