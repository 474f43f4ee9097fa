package graft.ml

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** sentencepiece `Precompiled` normalizer replay — the
  * `precompiled_charsmap` blob that XLM-R-family checkpoints ship
  * inside `tokenizer.json` (the reference's AutoTokenizer applies it
  * before Unigram segmentation, embedding_model_helpers.py:34-65; this
  * was the r10 residual cut for token-id compatibility).
  *
  * PUBLIC format (sentencepiece normalizer.cc,
  * DecodePrecompiledCharsMap): a little-endian uint32 byte-size of a
  * darts-clone double-array trie, the trie units (LE uint32 each), then
  * a string pool of NUL-terminated UTF-8 replacement strings. A trie
  * key is the UTF-8 byte sequence to replace; its value is the byte
  * offset of the replacement inside the pool.
  *
  * Matching replays sentencepiece `Normalizer::NormalizePrefix`: at
  * each input position take the LONGEST trie-prefix match and emit its
  * replacement; otherwise copy one UTF-8 codepoint verbatim. (HF's
  * `spm_precompiled` crate restricts matches to grapheme boundaries;
  * the charsmaps sentencepiece ships are single-codepoint →
  * replacement entries, where the two formulations agree.)
  *
  * darts-clone unit encoding (public darts_clone/darts.h):
  * `offset = (u >>> 10) << ((u & (1<<9)) >>> 6)`, `label = u &
  * 0x800000FF`, `hasLeaf = (u >>> 8) & 1`, leaf `value = u &
  * 0x7FFFFFFF`; traversal XORs offsets and byte labels.
  */
final class SpmPrecompiled private (
    private val units: Array[Int],
    private val pool: Array[Byte]) extends Serializable {

  @inline private def offset(u: Int): Int =
    (u >>> 10) << ((u & (1 << 9)) >>> 6)
  @inline private def label(u: Int): Int = u & 0x800000ff
  @inline private def hasLeaf(u: Int): Boolean = ((u >>> 8) & 1) == 1
  @inline private def leafValue(u: Int): Int = u & 0x7fffffff

  /** Longest trie prefix of bytes[start, end): packs
    * (consumedLen << 32) | valueOffset, or -1 for no match. */
  private def longestMatch(bytes: Array[Byte], start: Int,
      end: Int): Long = {
    var best = -1L
    var nodePos = 0
    var unit = units(0)
    nodePos ^= offset(unit)
    var i = start
    var dead = false
    while (i < end && !dead) {
      val c = bytes(i) & 0xff
      nodePos ^= c
      if (nodePos < 0 || nodePos >= units.length) dead = true
      else {
        unit = units(nodePos)
        if (label(unit) != c) dead = true
        else {
          nodePos ^= offset(unit)
          if (hasLeaf(unit) && nodePos >= 0 && nodePos < units.length) {
            val v = leafValue(units(nodePos))
            best = ((i - start + 1).toLong << 32) | (v.toLong & 0xffffffffL)
          }
          i += 1
        }
      }
    }
    best
  }

  /** Replacement string at pool byte offset `v` (NUL-terminated).
    * Out-of-range offsets (corrupt trie leaves) yield empty — the
    * never-throw contract holds even when the blob is garbage. */
  private def replacementAt(v: Int): Array[Byte] = {
    if (v < 0 || v >= pool.length) return Array.emptyByteArray
    var end = v
    while (end < pool.length && pool(end) != 0) end += 1
    java.util.Arrays.copyOfRange(pool, v, end)
  }

  /** UTF-8 lead-byte sequence length (1-4; malformed counts 1 so the
    * loop always advances on crawl junk). */
  @inline private def seqLen(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0x80) 1
    else if (u >= 0xf0) 4
    else if (u >= 0xe0) 3
    else if (u >= 0xc0) 2
    else 1
  }

  def normalize(text: String): String = {
    if (text == null || text.isEmpty) return text
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val m = longestMatch(bytes, i, bytes.length)
      if (m >= 0) {
        val len = (m >>> 32).toInt
        val rep = replacementAt(m.toInt)
        out.write(rep, 0, rep.length)
        i += len
      } else {
        val len = math.min(seqLen(bytes(i)), bytes.length - i)
        out.write(bytes, i, len)
        i += len
      }
    }
    new String(out.toByteArray, StandardCharsets.UTF_8)
  }
}

object SpmPrecompiled {

  /** Decode the base64 `precompiled_charsmap` field. Returns None for
    * empty/short blobs (legal: a checkpoint without a charsmap). */
  def fromBase64(b64: String): Option[SpmPrecompiled] = {
    if (b64 == null || b64.isEmpty) return None
    // malformed/truncated base64 degrades to "no charsmap" like every
    // other malformed-field path. Strip only WHITESPACE (line-wrapped
    // serializations) and keep the STRICT decoder: the MIME decoder
    // would silently drop any non-alphabet byte, letting a corrupted
    // or URL-safe-encoded blob decode to shifted garbage and build a
    // silently wrong normalizer — loud None beats wrong token ids
    try fromBlob(java.util.Base64.getDecoder
      .decode(b64.replaceAll("\\s", "")))
    catch { case _: IllegalArgumentException => None }
  }

  def fromBlob(blob: Array[Byte]): Option[SpmPrecompiled] = {
    if (blob == null || blob.length < 8) return None
    val bb = ByteBuffer.wrap(blob).order(ByteOrder.LITTLE_ENDIAN)
    val trieBytes = bb.getInt
    if (trieBytes < 4 || trieBytes % 4 != 0 ||
        4 + trieBytes > blob.length) return None
    val units = new Array[Int](trieBytes / 4)
    var i = 0
    while (i < units.length) { units(i) = bb.getInt; i += 1 }
    val pool = java.util.Arrays.copyOfRange(blob, 4 + trieBytes,
      blob.length)
    Some(new SpmPrecompiled(units, pool))
  }
}
