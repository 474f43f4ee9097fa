package graft.operators

/** Pure-JVM FLAC sample decoder (public format spec / RFC 9639) —
  * closes the "compressed audio" cut for the one lossless codec whose
  * decode is tractable without FFI: LPC/fixed prediction over Rice-
  * coded residuals is integer arithmetic, no DSP library required.
  * Decoded PCM feeds the existing FFT/mel/MFCC front-end
  * (AudioFeatures), so FLAC corpus assets featurize identically to
  * WAV. MP3/AAC/Vorbis (lossy transforms) remain the documented FFI
  * cut; their container METADATA is already parsed in-engine.
  *
  * Supported: 4-32 bps, all block sizes, fixed + LPC subframes
  * (orders per spec), constant/verbatim subframes, Rice/Rice2
  * partitioned residuals incl. escape codes, wasted bits,
  * independent + left-side/right-side/mid-side stereo decorrelation.
  * Best-effort on untrusted bytes: malformed frames stop the decode
  * and return what was recovered (never throw); CRCs are parsed past,
  * not verified (a flipped bit yields degraded audio features, which
  * is the right failure mode for featurization).
  */
object FlacDecode {

  private final class BitReader(b: Array[Byte]) {
    // LONG bit positions: an Int wraps at 256 MiB payloads
    // (b.length * 8 overflow), silently failing valid large files
    var pos = 0L // bit position
    def remaining: Long = b.length.toLong * 8 - pos
    def bad: Boolean = pos > b.length.toLong * 8

    def readBit(): Int = {
      val byteAt = (pos >>> 3).toInt
      if (byteAt >= b.length || byteAt < 0) { pos += 1; return 0 }
      val bit = (b(byteAt) >> (7 - (pos & 7).toInt)) & 1
      pos += 1
      bit
    }

    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readBitsLong(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }

    def readSigned(n: Int): Long = {
      if (n == 0) return 0L
      val v = readBitsLong(n)
      // sign-extend
      val shift = 64 - n
      (v << shift) >> shift
    }

    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0 && !bad) q += 1
      q
    }

    def alignByte(): Unit = if ((pos & 7) != 0) pos += 8 - (pos & 7)
  }

  /** (sampleRate, mono samples in [-1,1]), or None when the payload is
    * not FLAC / carries no decodable frames. */
  def decode(payload: Array[Byte]): Option[(Float, Array[Float])] = {
    if (payload == null || payload.length < 42) return None
    if (!(payload(0) == 'f' && payload(1) == 'L' && payload(2) == 'a' &&
        payload(3) == 'C')) return None
    try decodeInner(payload)
    catch { case _: Exception => None }
  }

  private def decodeInner(payload: Array[Byte])
      : Option[(Float, Array[Float])] = {
    def u8(i: Int) = payload(i) & 0xff
    // metadata blocks: STREAMINFO must be first
    var at = 4
    var last = false
    var rate = 0; var channels = 0; var bps = 0; var total = 0L
    var first = true
    while (!last && at + 4 <= payload.length) {
      val hdr = u8(at)
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = (u8(at + 1) << 16) | (u8(at + 2) << 8) | u8(at + 3)
      if (first) {
        if (btype != 0 || len < 34 || at + 4 + 34 > payload.length)
          return None
        val d = at + 4
        rate = (u8(d + 10) << 12) | (u8(d + 11) << 4) | (u8(d + 12) >> 4)
        channels = ((u8(d + 12) >> 1) & 0x7) + 1
        bps = (((u8(d + 12) & 1) << 4) | (u8(d + 13) >> 4)) + 1
        total = ((u8(d + 13).toLong & 0x0f) << 32) |
          ((u8(d + 14).toLong << 24) | (u8(d + 15) << 16) |
            (u8(d + 16) << 8) | u8(d + 17))
        first = false
      }
      at += 4 + len
    }
    if (first || rate <= 0 || channels <= 0 || bps < 4 || at >= payload.length)
      return None

    val out = new java.util.ArrayList[Float](
      math.min(math.max(total, 1024L), 1 << 24).toInt)
    val r = new BitReader(payload)
    r.pos = at.toLong * 8
    var decoded = 0L
    var ok = true
    while (ok && (total == 0 || decoded < total) && r.remaining >= 40) {
      ok = decodeFrame(r, channels, bps, out)
      if (ok) decoded = out.size.toLong
    }
    if (out.isEmpty) None
    else {
      val arr = new Array[Float](
        if (total > 0 && total < out.size) total.toInt else out.size)
      var i = 0
      while (i < arr.length) { arr(i) = out.get(i); i += 1 }
      Some((rate.toFloat, arr))
    }
  }

  /** One frame; appends mono samples. False stops the decode loop. */
  private def decodeFrame(r: BitReader, chStream: Int, bpsStream: Int,
      out: java.util.ArrayList[Float]): Boolean = {
    // sync 14 bits
    if (r.readBits(14) != 0x3ffe) return false
    r.readBit() // reserved
    r.readBit() // blocking strategy
    val bsCode = r.readBits(4)
    val srCode = r.readBits(4)
    val chCode = r.readBits(4)
    val bpsCode = r.readBits(3)
    r.readBit() // reserved
    // UTF-8-coded frame/sample number: lead byte gives length
    val lead = r.readBits(8)
    var follow =
      if (lead < 0x80) 0
      else if (lead >= 0xfe) 6
      else if (lead >= 0xfc) 5
      else if (lead >= 0xf8) 4
      else if (lead >= 0xf0) 3
      else if (lead >= 0xe0) 2
      else 1
    while (follow > 0) { r.readBits(8); follow -= 1 }
    val blockSize = bsCode match {
      case 0 => return false // reserved
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.readBits(8) + 1
      case 7 => r.readBits(16) + 1
      case c => 256 << (c - 8)
    }
    srCode match { // values only needed for header advance
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      case _ => ()
    }
    r.readBits(8) // header CRC-8 (unverified)
    val channels = chCode match {
      case c if c <= 7 => c + 1
      case _ => 2
    }
    if (channels != chStream && chCode <= 7) return false
    val bps = bpsCode match {
      case 0 => bpsStream
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => return false
    }
    if (blockSize <= 0 || blockSize > 65536) return false
    // normalize by the FRAME's bps — frames may legally override the
    // STREAMINFO value, and the amplitude must follow the frame
    val norm = (1L << (bps - 1)).toFloat
    val chans = new Array[Array[Long]](channels)
    var c = 0
    while (c < channels) {
      // side channel carries one extra bit
      val extra = chCode match {
        case 8 if c == 1 => 1 // left/side
        case 9 if c == 0 => 1 // side/right
        case 10 if c == 1 => 1 // mid/side
        case _ => 0
      }
      chans(c) = decodeSubframe(r, blockSize, bps + extra)
        .getOrElse(return false)
      c += 1
    }
    r.alignByte()
    r.readBits(16) // frame CRC-16 (unverified)
    if (r.bad) return false
    // stereo decorrelation
    chCode match {
      case 8 => // left/side: R = L - S
        var i = 0
        while (i < blockSize) {
          chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1
        }
      case 9 => // side/right: L = S + R
        var i = 0
        while (i < blockSize) {
          chans(0)(i) = chans(0)(i) + chans(1)(i); i += 1
        }
      case 10 => // mid/side
        var i = 0
        while (i < blockSize) {
          val side = chans(1)(i)
          var mid = chans(0)(i) << 1
          mid |= side & 1
          chans(0)(i) = (mid + side) >> 1
          chans(1)(i) = (mid - side) >> 1
          i += 1
        }
      case _ => ()
    }
    var i = 0
    while (i < blockSize) {
      var acc = 0.0f
      var k = 0
      while (k < channels) { acc += chans(k)(i) / norm; k += 1 }
      out.add(acc / channels)
      i += 1
    }
    true
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int)
      : Option[Array[Long]] = {
    if (r.readBit() != 0) return None // padding bit must be 0
    val t = r.readBits(6)
    val wasted =
      if (r.readBit() == 1) r.readUnary() + 1 else 0
    val eff = bps - wasted
    if (eff <= 0 || eff > 33) return None
    val s = new Array[Long](n)
    val ok: Boolean = t match {
      case 0 => // CONSTANT
        val v = r.readSigned(eff)
        java.util.Arrays.fill(s, v); true
      case 1 => // VERBATIM
        var i = 0
        while (i < n) { s(i) = r.readSigned(eff); i += 1 }
        !r.bad
      case ft if ft >= 8 && ft <= 12 => // FIXED order 0-4
        val order = ft - 8
        if (order > n) return None // malformed: warm-up exceeds block
        var i = 0
        while (i < order) { s(i) = r.readSigned(eff); i += 1 }
        decodeResidual(r, s, n, order) && {
          restoreFixed(s, n, order); true
        }
      case lt if lt >= 32 => // LPC order 1-32
        val order = (lt & 31) + 1
        if (order > n) return None
        var i = 0
        while (i < order) { s(i) = r.readSigned(eff); i += 1 }
        val precision = r.readBits(4) + 1
        if (precision == 16) return None // 1111 reserved
        val shift = r.readSigned(5).toInt
        if (shift < 0) return None
        val coefs = new Array[Long](order)
        i = 0
        while (i < order) { coefs(i) = r.readSigned(precision); i += 1 }
        decodeResidual(r, s, n, order) && {
          var j = order
          while (j < n) {
            var acc = 0L
            var k = 0
            while (k < order) { acc += coefs(k) * s(j - 1 - k); k += 1 }
            s(j) += (acc >> shift)
            j += 1
          }
          true
        }
      case _ => false // reserved types
    }
    if (!ok || r.bad) None
    else {
      if (wasted > 0) {
        var i = 0
        while (i < n) { s(i) <<= wasted; i += 1 }
      }
      Some(s)
    }
  }

  /** Rice-partitioned residual, written INTO s[order..n). */
  private def decodeResidual(r: BitReader, s: Array[Long], n: Int,
      order: Int): Boolean = {
    val method = r.readBits(2)
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val po = r.readBits(4)
    val partitions = 1 << po
    // spec requires blockSize divisible by 2^po; the per-partition
    // count guard catches overruns, and the idx == n check at the
    // end rejects underruns (n >> po truncating to leave a zero tail)
    var idx = order
    var p = 0
    while (p < partitions) {
      val count = (n >> po) - (if (p == 0) order else 0)
      if (count < 0 || idx + count > n) return false
      val param = r.readBits(pBits)
      if (param == escape) {
        val raw = r.readBits(5)
        var i = 0
        while (i < count) { s(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          if (r.bad || q > (1 << 24)) return false
          val low = r.readBitsLong(param)
          val v = (q.toLong << param) | low
          s(idx) = (v >>> 1) ^ -(v & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    idx == n && !r.bad
  }

  private def restoreFixed(s: Array[Long], n: Int, order: Int): Unit = {
    var i = order
    order match {
      case 0 => ()
      case 1 =>
        while (i < n) { s(i) += s(i - 1); i += 1 }
      case 2 =>
        while (i < n) { s(i) += 2 * s(i - 1) - s(i - 2); i += 1 }
      case 3 =>
        while (i < n) {
          s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3); i += 1
        }
      case 4 =>
        while (i < n) {
          s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4)
          i += 1
        }
      case _ => ()
    }
  }
}
