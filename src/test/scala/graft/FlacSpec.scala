package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AudioFeatures, FlacDecode}

/** FLAC decode (FlacDecode) against an in-test spec-conformant
  * encoder: STREAMINFO + framed subframes with real CRC-8/CRC-16, so
  * the bytes are valid FLAC streams any decoder would accept, covering
  * VERBATIM / CONSTANT / FIXED+Rice / LPC+Rice subframes and
  * left-side stereo decorrelation. The MFCC parity test is the round-11
  * "done" gate: a FLAC-compressed tone featurizes like its WAV twin. */
class FlacSpec extends AnyFunSuite {

  // ---- bit-level writer + the two FLAC CRCs (public polynomials) ----

  private final class BitW {
    private val out = new ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { out.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (nb != 0) bit(0)
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  private def crc8(d: Array[Byte]): Int = {
    var c = 0
    d.foreach { b =>
      c ^= (b & 0xff)
      var i = 0
      while (i < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff
        else (c << 1) & 0xff
        i += 1
      }
    }
    c
  }

  private def crc16(d: Array[Byte]): Int = {
    var c = 0
    d.foreach { b =>
      c ^= (b & 0xff) << 8
      var i = 0
      while (i < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff
        else (c << 1) & 0xffff
        i += 1
      }
    }
    c
  }

  private def streamInfo(rate: Int, channels: Int, bps: Int,
      total: Long, blockSize: Int): Array[Byte] = {
    val b = new Array[Byte](4 + 34)
    b(0) = 0x80.toByte // last-metadata, type 0
    b(3) = 34
    val d = 4
    b(d) = ((blockSize >> 8) & 0xff).toByte; b(d + 1) = (blockSize & 0xff).toByte
    b(d + 2) = b(d); b(d + 3) = b(d + 1) // max block = min block
    b(d + 10) = ((rate >> 12) & 0xff).toByte
    b(d + 11) = ((rate >> 4) & 0xff).toByte
    b(d + 12) = (((rate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bps - 1) >> 4)).toByte
    b(d + 13) = ((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf).toInt).toByte
    b(d + 14) = ((total >> 24) & 0xff).toByte
    b(d + 15) = ((total >> 16) & 0xff).toByte
    b(d + 16) = ((total >> 8) & 0xff).toByte
    b(d + 17) = (total & 0xff).toByte
    b
  }

  /** Rice-code `res` into w with parameter k (zigzag + unary/binary). */
  private def rice(w: BitW, res: Seq[Long], k: Int): Unit = {
    w.bits(0, 2) // method 0 (4-bit params)
    w.bits(0, 4) // partition order 0
    w.bits(k, 4)
    res.foreach { v =>
      val zz = (v << 1) ^ (v >> 63)
      val q = (zz >>> k).toInt
      var i = 0
      while (i < q) { w.bit(0); i += 1 }
      w.bit(1)
      w.bits(zz & ((1L << k) - 1), k)
    }
  }

  /** One mono frame of `samples` (16 bps) with the given subframe
    * strategy; frameNo < 128. */
  private def monoFrame(samples: Array[Int], frameNo: Int,
      strategy: String): Array[Byte] = {
    val n = samples.length
    val hdr = new BitW
    hdr.bits(0x3ffe, 14); hdr.bit(0); hdr.bit(0)
    hdr.bits(7, 4) // block size: 16-bit minus 1 follows
    hdr.bits(0, 4) // sample rate: from STREAMINFO
    hdr.bits(0, 4) // mono
    hdr.bits(4, 3); hdr.bit(0) // 16 bps
    hdr.bits(frameNo, 8) // UTF-8 frame number (single byte)
    hdr.bits(n - 1, 16)
    val hb = hdr.bytes
    val w = new BitW
    hb.foreach(b => w.bits(b & 0xff, 8))
    w.bits(crc8(hb), 8)
    strategy match {
      case "verbatim" =>
        w.bit(0); w.bits(1, 6); w.bit(0)
        samples.foreach(s => w.bits(s.toLong & 0xffff, 16))
      case "constant" =>
        w.bit(0); w.bits(0, 6); w.bit(0)
        w.bits(samples(0).toLong & 0xffff, 16)
      case "fixed2" => // order-2 fixed predictor + Rice residual
        w.bit(0); w.bits(10, 6); w.bit(0)
        w.bits(samples(0).toLong & 0xffff, 16)
        w.bits(samples(1).toLong & 0xffff, 16)
        val res = (2 until n).map(i =>
          samples(i).toLong - 2L * samples(i - 1) + samples(i - 2))
        rice(w, res, k = 6)
      case "lpc1" => // order-1 LPC, coef 1 << shift 2 (i.e. a[i-1])
        w.bit(0); w.bits(32, 6); w.bit(0) // LPC order 1
        w.bits(samples(0).toLong & 0xffff, 16)
        w.bits(3, 4) // precision-1 = 3 -> 4-bit coefficients
        w.bits(2, 5) // shift 2
        w.bits(4, 4) // coef = 4; prediction = (4*a[i-1]) >> 2 = a[i-1]
        val res = (1 until n).map(i =>
          samples(i).toLong - samples(i - 1))
        rice(w, res, k = 6)
    }
    w.align()
    val body = w.bytes
    val out = new ByteArrayOutputStream()
    out.write(body)
    val c = crc16(body)
    out.write((c >> 8) & 0xff); out.write(c & 0xff)
    out.toByteArray
  }

  private def flacMono(samples: Array[Int], rate: Int,
      strategy: String, blockSize: Int = 512): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(streamInfo(rate, 1, 16, samples.length, blockSize))
    samples.grouped(blockSize).zipWithIndex.foreach { case (blk, i) =>
      out.write(monoFrame(blk, i, strategy))
    }
    out.toByteArray
  }

  private def tone(freq: Double, n: Int, rate: Double): Array[Int] =
    Array.tabulate(n)(i =>
      (math.sin(2 * math.Pi * freq * i / rate) * 30000).toInt)

  for (strategy <- Seq("verbatim", "fixed2", "lpc1")) {
    test(s"FLAC $strategy subframes decode bit-exactly") {
      val samples = tone(440.0, 1200, 8000)
      val flac = flacMono(samples, 8000, strategy)
      val (rate, mono) = FlacDecode.decode(flac).get
      assert(rate === 8000f)
      assert(mono.length === samples.length)
      val back = mono.map(v => math.round(v * 32768f))
      assert(back.toSeq === samples.toSeq,
        s"$strategy must reconstruct the exact integer samples")
    }
  }

  test("FLAC constant subframe fills the block") {
    val samples = Array.fill(512)(1234)
    val (_, mono) = FlacDecode.decode(
      flacMono(samples, 8000, "constant")).get
    assert(mono.forall(v => math.round(v * 32768f) === 1234))
  }

  test("left/side stereo decorrelation reconstructs both channels") {
    val n = 256
    val left = Array.tabulate(n)(i => (math.sin(0.1 * i) * 20000).toInt)
    val right = Array.tabulate(n)(i => (math.cos(0.07 * i) * 15000).toInt)
    // frame: chCode 8 (left/side), sub0 = L (16 bps), sub1 = S (17 bps)
    val hdr = new BitW
    hdr.bits(0x3ffe, 14); hdr.bit(0); hdr.bit(0)
    hdr.bits(7, 4); hdr.bits(0, 4)
    hdr.bits(8, 4) // left/side
    hdr.bits(4, 3); hdr.bit(0)
    hdr.bits(0, 8); hdr.bits(n - 1, 16)
    val hb = hdr.bytes
    val w = new BitW
    hb.foreach(b => w.bits(b & 0xff, 8))
    w.bits(crc8(hb), 8)
    w.bit(0); w.bits(1, 6); w.bit(0) // verbatim L
    left.foreach(s => w.bits(s.toLong & 0xffff, 16))
    w.bit(0); w.bits(1, 6); w.bit(0) // verbatim S, 17 bits
    (0 until n).foreach { i =>
      val side = left(i).toLong - right(i)
      w.bits(side & 0x1ffff, 17)
    }
    w.align()
    val body = w.bytes
    val frame = new ByteArrayOutputStream()
    frame.write(body)
    val c = crc16(body); frame.write((c >> 8) & 0xff); frame.write(c & 0xff)
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(streamInfo(8000, 2, 16, n, n))
    out.write(frame.toByteArray)
    val (_, mono) = FlacDecode.decode(out.toByteArray).get
    assert(mono.length === n)
    val expect = (0 until n).map(i =>
      (left(i) / 32768f + right(i) / 32768f) / 2)
    (0 until n).foreach(i => assert(math.abs(mono(i) - expect(i)) < 1e-6f))
  }

  test("FLAC tone matches the WAV twin: identical PCM through " +
      "decodePcm, MFCC parity within tolerance (round-11 done gate)") {
    val rate = 8000
    val n = 1600 // 200 ms
    val samples = tone(440.0, n, rate)
    val flac = flacMono(samples, rate, "fixed2")
    // decodePcm routes fLaC payloads through FlacDecode
    val (fr, fmono) = AudioFeatures.decodePcm(flac).get
    assert(fr === 8000f && fmono.length === n)
    // same signal as 16-bit WAV through javax.sound
    val data = new Array[Byte](n * 2)
    samples.indices.foreach { i =>
      data(i * 2) = (samples(i) & 0xff).toByte
      data(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val (_, wmono) = AudioFeatures.decodePcm(bos.toByteArray).get
    assert(wmono.length === fmono.length)
    fmono.indices.foreach(i =>
      assert(math.abs(fmono(i) - wmono(i)) < 1e-4f))
    // MFCC parity: same frames, same coefficients within tolerance
    def mfccOf(mono: Array[Float]): Array[Float] = {
      val frame = java.util.Arrays.copyOfRange(mono, 0, 512)
      AudioFeatures.dct2(
        AudioFeatures.melEnergies(frame, 20, rate.toFloat), 13)
    }
    val a = mfccOf(fmono); val b = mfccOf(wmono)
    a.indices.foreach(i => assert(math.abs(a(i) - b(i)) < 1e-2f,
      s"MFCC coefficient $i diverged: ${a(i)} vs ${b(i)}"))
  }

  test("mid/side stereo decorrelation reconstructs both channels " +
      "(odd side values exercise the carried low bit)") {
    val n = 128
    val left = Array.tabulate(n)(i => (math.sin(0.15 * i) * 17000).toInt)
    val right = Array.tabulate(n)(i =>
      (math.cos(0.09 * i) * 13000).toInt + (i % 2)) // force odd sides
    val hdr = new BitW
    hdr.bits(0x3ffe, 14); hdr.bit(0); hdr.bit(0)
    hdr.bits(7, 4); hdr.bits(0, 4)
    hdr.bits(10, 4) // mid/side
    hdr.bits(4, 3); hdr.bit(0)
    hdr.bits(0, 8); hdr.bits(n - 1, 16)
    val hb = hdr.bytes
    val w = new BitW
    hb.foreach(b => w.bits(b & 0xff, 8))
    w.bits(crc8(hb), 8)
    // mid = (L+R)>>1 (floor), side = L-R; decoder rebuilds the low bit
    w.bit(0); w.bits(1, 6); w.bit(0) // verbatim mid, 16 bits
    (0 until n).foreach { i =>
      val mid = (left(i) + right(i)) >> 1
      w.bits(mid.toLong & 0xffff, 16)
    }
    w.bit(0); w.bits(1, 6); w.bit(0) // verbatim side, 17 bits
    (0 until n).foreach { i =>
      val side = left(i).toLong - right(i)
      w.bits(side & 0x1ffff, 17)
    }
    w.align()
    val body = w.bytes
    val frame = new ByteArrayOutputStream()
    frame.write(body)
    val c = crc16(body); frame.write((c >> 8) & 0xff); frame.write(c & 0xff)
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(streamInfo(8000, 2, 16, n, n))
    out.write(frame.toByteArray)
    val (_, mono) = FlacDecode.decode(out.toByteArray).get
    val expect = (0 until n).map(i =>
      (left(i) / 32768f + right(i) / 32768f) / 2)
    (0 until n).foreach(i =>
      assert(math.abs(mono(i) - expect(i)) < 1e-6f,
        s"sample $i: ${mono(i)} vs ${expect(i)}"))
  }

  test("Rice ESCAPE partitions (verbatim-coded residuals) decode " +
      "bit-exactly") {
    val n = 256
    val samples = tone(300.0, n, 8000)
    // frame with FIXED order 1 and an escaped residual partition:
    // method 0, partition order 0, param 15 (escape), 17-bit raw
    val hdr = new BitW
    hdr.bits(0x3ffe, 14); hdr.bit(0); hdr.bit(0)
    hdr.bits(7, 4); hdr.bits(0, 4); hdr.bits(0, 4)
    hdr.bits(4, 3); hdr.bit(0)
    hdr.bits(0, 8); hdr.bits(n - 1, 16)
    val hb = hdr.bytes
    val w = new BitW
    hb.foreach(b => w.bits(b & 0xff, 8))
    w.bits(crc8(hb), 8)
    w.bit(0); w.bits(9, 6); w.bit(0) // FIXED order 1
    w.bits(samples(0).toLong & 0xffff, 16)
    w.bits(0, 2) // rice method 0
    w.bits(0, 4) // partition order 0
    w.bits(15, 4) // ESCAPE
    w.bits(17, 5) // raw residual width
    (1 until n).foreach { i =>
      val res = samples(i).toLong - samples(i - 1)
      w.bits(res & 0x1ffff, 17)
    }
    w.align()
    val body = w.bytes
    val frame = new ByteArrayOutputStream()
    frame.write(body)
    val c = crc16(body); frame.write((c >> 8) & 0xff); frame.write(c & 0xff)
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(streamInfo(8000, 1, 16, n, n))
    out.write(frame.toByteArray)
    val (_, mono) = FlacDecode.decode(out.toByteArray).get
    assert(mono.map(v => math.round(v * 32768f)).toSeq === samples.toSeq)
  }

  test("wasted bits: subframe decoded at reduced width then shifted " +
      "back up") {
    val n = 128
    // samples all even: 1 wasted bit, stored as value >> 1 at 15 bits
    val samples = Array.tabulate(n)(i =>
      ((math.sin(0.2 * i) * 12000).toInt / 2) * 2)
    val hdr = new BitW
    hdr.bits(0x3ffe, 14); hdr.bit(0); hdr.bit(0)
    hdr.bits(7, 4); hdr.bits(0, 4); hdr.bits(0, 4)
    hdr.bits(4, 3); hdr.bit(0)
    hdr.bits(0, 8); hdr.bits(n - 1, 16)
    val hb = hdr.bytes
    val w = new BitW
    hb.foreach(b => w.bits(b & 0xff, 8))
    w.bits(crc8(hb), 8)
    w.bit(0); w.bits(1, 6) // verbatim
    w.bit(1) // wasted-bits flag
    w.bit(1) // unary 0 -> k = 0+1 = 1 wasted bit
    samples.foreach(s => w.bits((s >> 1).toLong & 0x7fff, 15))
    w.align()
    val body = w.bytes
    val frame = new ByteArrayOutputStream()
    frame.write(body)
    val c = crc16(body); frame.write((c >> 8) & 0xff); frame.write(c & 0xff)
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(streamInfo(8000, 1, 16, n, n))
    out.write(frame.toByteArray)
    val (_, mono) = FlacDecode.decode(out.toByteArray).get
    assert(mono.map(v => math.round(v * 32768f)).toSeq === samples.toSeq)
  }

  test("a corrupt trailing frame stops the decode but KEEPS the " +
      "frames already recovered (fixed-order overrun guard)") {
    val samples = tone(440.0, 512, 8000)
    val good = flacMono(samples, 8000, "fixed2", blockSize = 512)
    // append a frame whose header says blockSize 2 but subframe type
    // FIXED order 4 (warm-up would overrun the block array)
    val evil = new BitW
    evil.bits(0x3ffe, 14); evil.bit(0); evil.bit(0)
    evil.bits(7, 4); evil.bits(0, 4); evil.bits(0, 4)
    evil.bits(4, 3); evil.bit(0)
    evil.bits(1, 8) // frame number 1
    evil.bits(1, 16) // blockSize - 1 = 1 -> blockSize 2
    val hb = evil.bytes
    val w = new BitW
    hb.foreach(b => w.bits(b & 0xff, 8))
    w.bits(crc8(hb), 8)
    w.bit(0); w.bits(12, 6); w.bit(0) // FIXED order 4 > blockSize 2
    w.bits(0, 64) // some warm-up bits (never validly consumed)
    // STREAMINFO total = 1024 so the decoder attempts the bad frame
    // instead of stopping satisfied after the good one
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(streamInfo(8000, 1, 16, 1024, 512))
    out.write(java.util.Arrays.copyOfRange(good,
      4 + 38, good.length)) // the good frame, minus marker+streaminfo
    out.write(w.bytes)
    val decoded = FlacDecode.decode(out.toByteArray)
    assert(decoded.nonEmpty, "recovered frames must survive")
    assert(decoded.get._2.length === 512,
      "exactly the good frame's samples, nothing from the bad one")
  }

  test("junk after the fLaC marker never throws") {
    val junk = "fLaC".getBytes("US-ASCII") ++
      Array.fill[Byte](256)(0x5a)
    assert(FlacDecode.decode(junk).isEmpty ||
      FlacDecode.decode(junk).nonEmpty) // any Option, no throw
    assert(FlacDecode.decode(null) === None)
    assert(FlacDecode.decode(Array[Byte](1, 2, 3)) === None)
  }

  test("residual UNDERRUN (blockSize not divisible by 2^po) rejects " +
      "the frame instead of fabricating zero residuals") {
    val samples = tone(440.0, 512, 8000)
    val good = flacMono(samples, 8000, "fixed2", blockSize = 512)
    // evil frame: blockSize 7, FIXED order 1, partition order 1 —
    // counts are (7>>1)-1=2 and (7>>1)=3, so idx ends at 6 < 7 and
    // sample 7 would silently stay a fabricated zero residual
    val hdr = new BitW
    hdr.bits(0x3ffe, 14); hdr.bit(0); hdr.bit(0)
    hdr.bits(7, 4); hdr.bits(0, 4); hdr.bits(0, 4)
    hdr.bits(4, 3); hdr.bit(0)
    hdr.bits(1, 8) // frame number 1
    hdr.bits(6, 16) // blockSize - 1 = 6 -> blockSize 7
    val hb = hdr.bytes
    val w = new BitW
    hb.foreach(b => w.bits(b & 0xff, 8))
    w.bits(crc8(hb), 8)
    w.bit(0); w.bits(9, 6); w.bit(0) // FIXED order 1
    w.bits(100L & 0xffff, 16) // warm-up sample
    w.bits(0, 2) // residual method 0
    w.bits(1, 4) // partition order 1 (7 not divisible by 2)
    val k = 4
    def riceVals(vals: Seq[Long]): Unit = {
      w.bits(k, 4)
      vals.foreach { v =>
        val zz = (v << 1) ^ (v >> 63)
        val q = (zz >>> k).toInt
        var i = 0
        while (i < q) { w.bit(0); i += 1 }
        w.bit(1)
        w.bits(zz & ((1L << k) - 1), k)
      }
    }
    riceVals(Seq(1L, 2L)) // partition 0: count 2
    riceVals(Seq(3L, 4L, 5L)) // partition 1: count 3 -> idx = 6 < 7
    w.align()
    val body = w.bytes
    val fr = new ByteArrayOutputStream()
    fr.write(body)
    val c = crc16(body)
    fr.write((c >> 8) & 0xff); fr.write(c & 0xff)
    val out = new ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(streamInfo(8000, 1, 16, 519, 512))
    out.write(java.util.Arrays.copyOfRange(good, 4 + 38, good.length))
    out.write(fr.toByteArray)
    val decoded = FlacDecode.decode(out.toByteArray)
    assert(decoded.nonEmpty, "recovered frames must survive")
    assert(decoded.get._2.length === 512,
      "the underrun frame must be rejected, not zero-padded")
  }
}
