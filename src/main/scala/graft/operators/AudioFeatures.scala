package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** REAL audio decode + spectral featurization, JDK-only: WAV/AIFF/AU
  * parse through javax.sound.sampled (bundled, headless-safe), PCM
  * converts to mono float, and windows run a radix-2 FFT for band
  * energies — the audio analogue of Multimodal's ImageIO kernels, and
  * the features a near-dup/similarity pass over speech or music corpora
  * keys on. FLAC decodes in-engine (FlacDecode — LPC/Rice is integer
  * arithmetic, no DSP lib needed); lossy codecs (MP3/AAC/Opus) have no
  * JDK decoder and fall back to the byte-histogram stub at the call
  * sites that accept mixed media — same honest FFI cut line as video.
  */
object AudioFeatures {

  /** Decode a WAV/AIFF/AU/FLAC payload to (sampleRate, mono samples in
    * [-1,1]). FLAC goes through the in-engine LPC/Rice decoder
    * (FlacDecode — round 11, closes the lossless-compressed cut);
    * PCM containers go through javax.sound. None when neither can
    * parse the container/encoding. */
  def decodePcm(payload: Array[Byte]): Option[(Float, Array[Float])] =
    if (payload == null || payload.length < 12) None
    else if (payload(0) == 'f' && payload(1) == 'L' &&
        payload(2) == 'a' && payload(3) == 'C')
      FlacDecode.decode(payload)
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          // normalize to signed 16-bit little-endian PCM
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels,
            fmt.getChannels * 2, fmt.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem
            .getAudioInputStream(target, in)
          val bytes = pcm.readAllBytes()
          val ch = target.getChannels
          val n = bytes.length / 2 / ch
          val mono = new Array[Float](n)
          var i = 0
          while (i < n) {
            var acc = 0.0f
            var c = 0
            while (c < ch) {
              val off = (i * ch + c) * 2
              val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
              acc += s / 32768.0f
              c += 1
            }
            mono(i) = acc / ch
            i += 1
          }
          Some((target.getSampleRate, mono))
        } finally in.close()
      } catch {
        // UnsupportedAudioFileException: container unknown.
        // IllegalArgumentException: container parsed but the JDK has no
        // converter to PCM_SIGNED for its encoding (e.g. IEEE float) —
        // AudioSystem throws it from the conversion call, and a decode
        // helper that crashes the task instead of falling back would
        // abort whole feature-extraction jobs on one exotic asset.
        case scala.util.control.NonFatal(_) => None
      }

  /** In-place iterative radix-2 Cooley-Tukey FFT (re/im length must be a
    * power of two). Textbook public algorithm; no allocation per call
    * beyond the caller's buffers. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT length $n is not a power of 2")
    // bit reversal
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + len / 2); val vi0 = im(base + k + len / 2)
          val vr = vr0 * cwr - vi0 * cwi
          val vi = vr0 * cwi + vi0 * cwr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Log-magnitude band energies of one Hann-windowed frame: `bands`
    * equal slices of the FFT magnitude spectrum below Nyquist. */
  private[graft] def bandEnergies(frame: Array[Float], bands: Int)
      : Array[Float] = {
    val n = frame.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) {
      val hann = 0.5 * (1 - math.cos(2 * math.Pi * i / (n - 1)))
      re(i) = frame(i) * hann
      i += 1
    }
    fft(re, im)
    val half = n / 2
    val out = new Array[Float](bands)
    var b = 0
    while (b < bands) {
      val lo = b * half / bands
      val hi = math.max(lo + 1, (b + 1) * half / bands)
      var acc = 0.0
      var k = lo
      while (k < hi) { acc += re(k) * re(k) + im(k) * im(k); k += 1 }
      out(b) = math.log1p(acc / (hi - lo)).toFloat
      b += 1
    }
    out
  }

  /** Fixed-dim clip descriptor: average band-energy vector over all
    * frames, L2-normalized — what the media featureKernel emits for
    * decodable audio. */
  def clipFeatures(payload: Array[Byte], dim: Int,
      frameSize: Int = 512): Option[Array[Float]] =
    decodePcm(payload).map { case (_, mono) =>
      val acc = new Array[Double](dim)
      var frames = 0
      var off = 0
      while (off + frameSize <= mono.length) {
        val e = bandEnergies(
          java.util.Arrays.copyOfRange(mono, off, off + frameSize), dim)
        var i = 0
        while (i < dim) { acc(i) += e(i); i += 1 }
        frames += 1
        off += frameSize
      }
      if (frames == 0) { val v = new Array[Float](dim); v(0) = 1.0f; v }
      else {
        val norm = math.sqrt(acc.map(v => v * v).sum)
        if (norm == 0.0) { val v = new Array[Float](dim); v(0) = 1.0f; v }
        else acc.map(v => (v / norm).toFloat)
      }
    }

  // ---- mel front-end (STFT -> mel filterbank -> log -> DCT = MFCC),
  // the standard speech/music feature stack, self-contained ----

  private def hzToMel(f: Double): Double =
    2595.0 * math.log10(1.0 + f / 700.0)
  private def melToHz(m: Double): Double =
    700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** Triangular mel filterbank: `nMels` filters over [0, nyquist],
    * returned as (fftBin -> weight) rows per filter. Standard HTK-style
    * construction (public formula). */
  private[graft] def melFilterbank(nMels: Int, frameSize: Int,
      sampleRate: Double): Array[Array[Double]] = {
    val nyquist = sampleRate / 2.0
    val half = frameSize / 2
    val melPts = {
      val lo = hzToMel(0.0); val hi = hzToMel(nyquist)
      Array.tabulate(nMels + 2)(i => lo + (hi - lo) * i / (nMels + 1))
    }
    val binHz = sampleRate / frameSize
    Array.tabulate(nMels) { m =>
      val (l, c, r) =
        (melToHz(melPts(m)), melToHz(melPts(m + 1)), melToHz(melPts(m + 2)))
      Array.tabulate(half) { b =>
        val f = b * binHz
        if (f <= l || f >= r) 0.0
        else if (f <= c) (f - l) / math.max(c - l, 1e-9)
        else (r - f) / math.max(r - c, 1e-9)
      }
    }
  }

  /** Log mel energies of one Hann-windowed frame. The filterbank is a
    * pure function of (nMels, frameSize, sampleRate) — callers looping
    * over frames pass a precomputed one (mfcc does); this convenience
    * overload builds it per call. */
  private[graft] def melEnergies(frame: Array[Float], nMels: Int,
      sampleRate: Double): Array[Float] =
    melEnergies(frame, melFilterbank(nMels, frame.length, sampleRate))

  private[graft] def melEnergies(frame: Array[Float],
      fb: Array[Array[Double]]): Array[Float] = {
    val n = frame.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) {
      val hann = 0.5 * (1 - math.cos(2 * math.Pi * i / (n - 1)))
      re(i) = frame(i) * hann
      i += 1
    }
    fft(re, im)
    val power = Array.tabulate(n / 2)(k => re(k) * re(k) + im(k) * im(k))
    Array.tabulate(fb.length) { m =>
      var acc = 0.0
      var b = 0
      while (b < power.length) { acc += fb(m)(b) * power(b); b += 1 }
      math.log1p(acc).toFloat
    }
  }

  /** DCT-II over log mel energies -> cepstral coefficients (the "C" of
    * MFCC; orthonormal scaling). */
  private[graft] def dct2(xs: Array[Float], nCoeffs: Int): Array[Float] = {
    val n = xs.length
    Array.tabulate(nCoeffs) { k =>
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += xs(i) * math.cos(math.Pi * k * (2 * i + 1) / (2.0 * n))
        i += 1
      }
      val scale =
        if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      (acc * scale).toFloat
    }
  }

  val mfccSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("frame_index", IntegerType, nullable = false),
    StructField("start_ms", LongType, nullable = false),
    StructField("mfcc", ArrayType(FloatType), nullable = false)
  ))

  /** MFCC rows over the media table: audio assets explode to one row
    * per OVERLAPPING frame (hop < frameSize — the STFT shape; the
    * plain spectrogram uses non-overlapping frames). Generator +
    * per-asset cap like sampleFrames. */
  def mfcc(media: DataFrame, frameSize: Int = 512, hop: Int = 256,
      nMels: Int = 24, nCoeffs: Int = 13,
      maxFramesPerAsset: Int = 512): DataFrame = {
    require(hop > 0 && hop <= frameSize, "0 < hop <= frameSize")
    val enc = org.apache.spark.sql.Encoders.row(mfccSchema)
    media.where(col("media_type") === "audio")
      .select("asset_id", "payload")
      .flatMap { r =>
        decodePcm(r.getAs[Array[Byte]]("payload")) match {
          case None => Iterator.empty
          case Some((rate, mono)) =>
            // guard BEFORE the division: Scala int division truncates
            // toward zero, so (len-frameSize)/hop+1 on a too-short clip
            // would yield a phantom zero-padded frame instead of none
            val n =
              if (mono.length < frameSize) 0
              else math.min((mono.length - frameSize) / hop + 1,
                maxFramesPerAsset)
            // filterbank hoisted: pure in (nMels, frameSize, rate) —
            // rebuilding it per frame churned ~50 KB per call
            val fb = melFilterbank(nMels, frameSize, rate)
            (0 until n).iterator.map { f =>
              val frame = java.util.Arrays.copyOfRange(
                mono, f * hop, f * hop + frameSize)
              Row(r.getString(0), f,
                (f.toLong * hop * 1000 / rate.toLong),
                dct2(melEnergies(frame, fb), nCoeffs).toSeq)
            }
        }
      }(enc)
  }

  val spectrogramSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("frame_index", IntegerType, nullable = false),
    StructField("start_ms", LongType, nullable = false),
    StructField("bands", ArrayType(FloatType), nullable = false)
  ))

  /** Spectrogram rows over the media table: audio assets explode to one
    * row per FFT frame (generator shape like Multimodal.sampleFrames,
    * capped so one long asset cannot blow a task). `hop` defaults to
    * frameSize (non-overlapping); pass hop < frameSize for the STFT
    * shape (the mfcc default). Undecodable audio yields zero rows —
    * count them upstream via the error channel pattern if routing
    * matters. */
  def spectrogram(media: DataFrame, frameSize: Int = 512,
      bands: Int = 16, maxFramesPerAsset: Int = 256,
      hop: Int = 0): DataFrame = {
    val step = if (hop <= 0) frameSize else hop
    require(step <= frameSize, "hop must be <= frameSize")
    val enc = org.apache.spark.sql.Encoders.row(spectrogramSchema)
    media.where(col("media_type") === "audio")
      .select("asset_id", "payload")
      .flatMap { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        decodePcm(payload) match {
          case None => Iterator.empty
          case Some((rate, mono)) =>
            val n =
              if (mono.length < frameSize) 0
              else math.min((mono.length - frameSize) / step + 1,
                maxFramesPerAsset)
            (0 until n).iterator.map { f =>
              val frame = java.util.Arrays.copyOfRange(
                mono, f * step, f * step + frameSize)
              Row(r.getString(0), f,
                (f.toLong * step * 1000 / rate.toLong),
                bandEnergies(frame, bands).toSeq)
            }
        }
      }(enc)
  }

  // ---- compressed-audio CONTAINER metadata (public specs, no codec) ----
  //
  // Decode of MP3/OGG/FLAC payloads stays the documented FFI cut line
  // (javax.sound ships PCM only), but the header facts curation
  // filters on — duration, sample rate, channels — are byte-level
  // parses of public formats, the audio mirror of Multimodal's
  // ISO-BMFF walk.

  /** Parsed container facts. durationMs is -1 when the container gives
    * no length (e.g. a chained/torn stream). */
  final case class AudioMeta(container: String, durationMs: Long,
      sampleRate: Int, channels: Int)

  /** MP3 / OGG (Opus+Vorbis) / FLAC / WAV header facts; None for
    * null/short/unrecognized payloads. Best-effort: malformed tails
    * degrade the duration to -1, never throw. */
  def audioMetadata(payload: Array[Byte]): Option[AudioMeta] = {
    if (payload == null || payload.length < 12) return None
    def u8(i: Int) = payload(i) & 0xFF
    def ascii(at: Int, n: Int) =
      new String(payload, at, n, java.nio.charset.StandardCharsets.ISO_8859_1)
    def le32(i: Int): Long = (u8(i)) | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def le64(i: Int): Long = le32(i) | (le32(i + 4) << 32)
    def be32(i: Int): Long = (u8(i).toLong << 24) | (u8(i + 1) << 16) |
      (u8(i + 2) << 8) | u8(i + 3)

    if (ascii(0, 4) == "RIFF" && payload.length >= 44 &&
        ascii(8, 4) == "WAVE") {
      val channels = u8(22) | (u8(23) << 8)
      val rate = le32(24).toInt
      val byteRate = le32(28)
      // find the data chunk (fmt may carry extensions)
      var at = 12
      var dur = -1L
      var ok = true
      while (ok && at + 8 <= payload.length && dur < 0) {
        val id = ascii(at, 4); val sz = le32(at + 4)
        if (id == "data" && byteRate > 0) dur = sz * 1000L / byteRate
        // sz is unsigned-32 from untrusted crawl bytes: a huge or
        // padded value must not wrap Int (0xFFFFFFF8 -> advance 0 ->
        // infinite loop) — require strict forward progress and stop
        // at the payload end instead of walking past it.
        val next = at.toLong + 8L + sz + (sz & 1L)
        if (next <= at || next > Int.MaxValue) ok = false
        else at = next.toInt
      }
      Some(AudioMeta("wav", dur, rate, channels))
    } else if (ascii(0, 4) == "fLaC" && payload.length >= 42) {
      // STREAMINFO: 4-byte block header then 34 bytes; rate(20) +
      // channels-1(3) + bps-1(5) + totalSamples(36) start at data+10
      val d = 8 // 4 marker + 4 block header
      val rate = ((u8(d + 10) << 12) | (u8(d + 11) << 4) |
        (u8(d + 12) >> 4))
      val channels = ((u8(d + 12) >> 1) & 0x7) + 1
      val total = ((u8(d + 13).toLong & 0x0F) << 32) | be32(d + 14)
      val dur = if (rate > 0 && total > 0) total * 1000L / rate else -1L
      Some(AudioMeta("flac", dur, rate, channels))
    } else if (ascii(0, 4) == "OggS") {
      // identification packet in the first page's payload; the page
      // header is 27 bytes + segment table — a truncated page is junk
      if (payload.length < 27) return None
      val segs = u8(26)
      val body = 27 + segs
      var rate = 0; var channels = 0; var opusPreSkip = -1
      if (body + 19 <= payload.length && ascii(body, 8) == "OpusHead") {
        channels = u8(body + 9)
        opusPreSkip = u8(body + 10) | (u8(body + 11) << 8)
        rate = 48000 // Opus granule positions are always 48 kHz
      } else if (body + 30 <= payload.length &&
          ascii(body + 1, 6) == "vorbis" && u8(body) == 1) {
        channels = u8(body + 11)
        rate = le32(body + 12).toInt
      } else return None
      // duration: granule position of the LAST page
      val last = ascii(0, payload.length).lastIndexOf("OggS")
      val dur =
        if (last + 14 > payload.length || rate <= 0) -1L
        else {
          val granule = le64(last + 6)
          val effective =
            if (opusPreSkip >= 0) granule - opusPreSkip else granule
          if (effective <= 0) -1L else effective * 1000L / rate
        }
      Some(AudioMeta(if (opusPreSkip >= 0) "opus" else "vorbis",
        dur, rate, channels))
    } else mp3Metadata(payload)
  }

  private val Mp3BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96,
    112, 128, 160, 192, 224, 256, 320)
  private val Mp3BitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64,
    80, 96, 112, 128, 144, 160)
  private val Mp3RateV1 = Array(44100, 48000, 32000)

  /** MPEG Layer III: skip ID3v2, sync to the first frame header,
    * prefer the Xing/Info frame count (VBR-exact), else extrapolate
    * CBR from the first frame's bitrate. */
  private def mp3Metadata(payload: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int) = payload(i) & 0xFF
    var at = 0
    if (payload.length > 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      val size = ((u8(6) & 0x7F) << 21) | ((u8(7) & 0x7F) << 14) |
        ((u8(8) & 0x7F) << 7) | (u8(9) & 0x7F)
      at = 10 + size
    }
    // sync scan (bounded): a real frame header, Layer III only
    var found = -1
    var tries = 0
    while (found < 0 && at + 4 <= payload.length && tries < 4096) {
      if (u8(at) == 0xFF && (u8(at + 1) & 0xE0) == 0xE0 &&
          ((u8(at + 1) >> 1) & 0x3) == 0x1 && // layer III
          ((u8(at + 1) >> 3) & 0x3) != 0x1 && // valid version
          ((u8(at + 2) >> 4) & 0xF) != 0xF && // valid bitrate idx
          ((u8(at + 2) >> 2) & 0x3) != 0x3)   // valid rate idx
        found = at
      else { at += 1; tries += 1 }
    }
    if (found < 0) return None
    val h1 = u8(found + 1); val h2 = u8(found + 2); val h3 = u8(found + 3)
    val versionBits = (h1 >> 3) & 0x3 // 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    val mpeg1 = versionBits == 3
    val rateIdx = (h2 >> 2) & 0x3
    val rate = versionBits match {
      case 3 => Mp3RateV1(rateIdx)
      case 2 => Mp3RateV1(rateIdx) / 2
      case _ => Mp3RateV1(rateIdx) / 4
    }
    val channels = if (((h3 >> 6) & 0x3) == 3) 1 else 2
    val bitrate = (if (mpeg1) Mp3BitrateV1L3 else
      Mp3BitrateV2L3)((h2 >> 4) & 0xF) * 1000
    val samplesPerFrame = if (mpeg1) 1152 else 576
    // Xing/Info VBR header sits after the side info
    val sideInfo = if (mpeg1) { if (channels == 1) 17 else 32 }
      else { if (channels == 1) 9 else 17 }
    val xingAt = found + 4 + sideInfo
    val dur =
      if (xingAt + 12 <= payload.length &&
          (new String(payload, xingAt, 4,
            java.nio.charset.StandardCharsets.ISO_8859_1) == "Xing" ||
           new String(payload, xingAt, 4,
            java.nio.charset.StandardCharsets.ISO_8859_1) == "Info") &&
          (u8(xingAt + 7) & 0x1) == 1) {
        val frames = ((u8(xingAt + 8).toLong << 24) |
          (u8(xingAt + 9) << 16) | (u8(xingAt + 10) << 8) |
          u8(xingAt + 11))
        if (rate > 0) frames * samplesPerFrame * 1000L / rate else -1L
      } else if (bitrate > 0)
        (payload.length - found).toLong * 8000L / bitrate
      else -1L
    Some(AudioMeta("mp3", dur, rate, channels))
  }
}
