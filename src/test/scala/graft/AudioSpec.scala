package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.Row

import graft.operators.{AudioFeatures, Multimodal}

/** Real audio decode + FFT featurization (JDK javax.sound + radix-2
  * FFT): WAV bytes synthesized in-test, spectral peaks verified against
  * the generating tone. */
class AudioSpec extends SparkSuite {

  /** 16-bit mono PCM WAV of a sine tone. */
  private def wav(freq: Double, ms: Int = 200,
      rate: Float = 8000f): Array[Byte] = {
    val n = (rate * ms / 1000).toInt
    val data = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * freq * i / rate) * 30000).toShort
      data(i * 2) = (s & 0xff).toByte
      data(i * 2 + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(data), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodePcm round-trips a real WAV: rate, length, amplitude") {
    val Some((rate, mono)) = AudioFeatures.decodePcm(wav(440.0))
    assert(rate === 8000f)
    assert(mono.length === 1600) // 200ms at 8kHz
    assert(mono.max > 0.85f && mono.min < -0.85f) // ~0.92 peak
    assert(mono.forall(s => s >= -1.0f && s <= 1.0f))
    assert(AudioFeatures.decodePcm("not audio".getBytes) === None)
    assert(AudioFeatures.decodePcm(null) === None)
  }

  test("FFT finds the generating tone: spectral peak lands in the " +
      "expected band for 440 Hz and 2 kHz") {
    val s = initSpark()
    def peakBand(freq: Double): Int = {
      val rows = java.util.Arrays.asList(
        Row("a", "audio", wav(freq), null, null, 200L))
      val m = s.createDataFrame(rows, Multimodal.mediaSchema)
      val spec = AudioFeatures.spectrogram(m, frameSize = 512, bands = 16)
        .collect()
      assert(spec.nonEmpty)
      // every frame of a steady tone peaks in the same band
      val peaks = spec.map(_.getSeq[Float](3).zipWithIndex.maxBy(_._1)._2)
      assert(peaks.distinct.length === 1, s"unstable peak: ${peaks.toSeq}")
      peaks.head
    }
    // band = floor(freq/rate * frameSize) * bands / (frameSize/2)
    assert(peakBand(440.0) === 1) // bin 28 of 256 -> band 1
    assert(peakBand(2000.0) === 8) // bin 128 -> band 8
  }

  test("clip features: deterministic, tone-sensitive, and routed " +
      "through the media featureKernel (not the byte stub)") {
    val a1 = AudioFeatures.clipFeatures(wav(440.0), 16).get
    val a2 = AudioFeatures.clipFeatures(wav(440.0), 16).get
    val b = AudioFeatures.clipFeatures(wav(2000.0), 16).get
    assert(a1.toSeq === a2.toSeq)
    assert(a1.toSeq !== b.toSeq)
    val viaKernel = Multimodal.featureKernel(wav(440.0), 16)
    assert(viaKernel.toSeq === a1.toSeq,
      "featureKernel must take the real audio path for WAV bytes")
    assert(viaKernel.toSeq !==
      Multimodal.stubDecode(wav(440.0), 16).toSeq)
  }

  test("mel front-end: filterbank peaks at the tone's mel filter, MFCC " +
      "frames overlap at the hop and are deterministic") {
    val s = initSpark()
    // filterbank sanity: a pure tone's energy maximizes in the filter
    // whose center is nearest the tone frequency
    def peakMel(freq: Double): Int = {
      val Some((rate, mono)) = AudioFeatures.decodePcm(wav(freq)): @unchecked
      val frame = java.util.Arrays.copyOfRange(mono, 0, 512)
      val e = AudioFeatures.melEnergies(frame, 24, rate)
      e.zipWithIndex.maxBy(_._1)._2
    }
    assert(peakMel(440.0) < peakMel(2000.0),
      "higher tone must excite a higher mel filter")
    // DCT: constant input concentrates in coefficient 0
    val flat = AudioFeatures.dct2(Array.fill(24)(1.0f), 13)
    assert(math.abs(flat(0)) > 1e-3)
    (1 until 13).foreach(k => assert(math.abs(flat(k)) < 1e-5,
      s"c$k of a constant signal must be ~0"))
    // frame count: (samples - frameSize)/hop + 1, capped
    val rows = java.util.Arrays.asList(
      Row("a", "audio", wav(440.0, ms = 200), null, null, 200L))
    val m = s.createDataFrame(rows, Multimodal.mediaSchema)
    val frames = AudioFeatures.mfcc(m, frameSize = 512, hop = 256,
      nMels = 24, nCoeffs = 13).collect()
    assert(frames.length === (1600 - 512) / 256 + 1) // 5 frames
    assert(frames.forall(_.getSeq[Float](3).length === 13))
    val again = AudioFeatures.mfcc(m, frameSize = 512, hop = 256,
      nMels = 24, nCoeffs = 13).collect()
    assert(frames.map(_.getSeq[Float](3)).toSeq ===
      again.map(_.getSeq[Float](3)).toSeq)
  }

  test("tagged featurization reports decoder provenance per asset") {
    val s = initSpark()
    val png = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = java.util.Arrays.asList(
      Row("i", "image", png, 4, 4, null),
      Row("a", "audio", wav(440.0), null, null, 200L),
      Row("x", "video", Array[Byte](9, 9, 9), null, null, 5L))
    val m = s.createDataFrame(rows, Multimodal.mediaSchema)
    val tags = Multimodal.extractFeaturesTagged(m, dim = 8)
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    assert(tags === Map("i" -> "image", "a" -> "audio",
      "x" -> "fallback"))
  }

  test("spectrogram explodes frames with the cap honored") {
    val s = initSpark()
    val rows = java.util.Arrays.asList(
      Row("long", "audio", wav(440.0, ms = 1000), null, null, 1000L),
      Row("img", "image", Array[Byte](1, 2), 1, 1, null))
    val m = s.createDataFrame(rows, Multimodal.mediaSchema)
    // 8000 samples / 512 = 15 full frames, cap at 4
    val capped = AudioFeatures.spectrogram(m, frameSize = 512,
      bands = 8, maxFramesPerAsset = 4).collect()
    assert(capped.length === 4)
    assert(capped.forall(_.getString(0) === "long"))
    assert(capped.map(_.getLong(2)).sorted.toSeq ===
      Seq(0L, 64L, 128L, 192L)) // 512/8000 = 64ms per frame
    // STFT shape: half-frame hop doubles the frame count (minus edge)
    val overlapped = AudioFeatures.spectrogram(m, frameSize = 512,
      bands = 8, maxFramesPerAsset = 1000, hop = 256).collect()
    assert(overlapped.count(_.getString(0) == "long") ===
      (8000 - 512) / 256 + 1)
    // too-short clip emits zero frames, never a zero-padded phantom
    val short = java.util.Arrays.asList(
      Row("s", "audio", wav(440.0, ms = 30), null, null, 30L))
    val sm = s.createDataFrame(short, Multimodal.mediaSchema)
    assert(AudioFeatures.spectrogram(sm, frameSize = 512,
      bands = 8).count() === 0L)
    assert(AudioFeatures.mfcc(sm, frameSize = 512, hop = 256).count()
      === 0L)
  }

  // ---- compressed-audio container metadata ----

  test("audioMetadata: WAV/FLAC/MP3(Xing)/Ogg-Opus header facts pin " +
      "duration, rate, channels; junk -> None") {
    import AudioFeatures.audioMetadata

    // WAV: reuse the real generated fixture (200 ms @ 16 kHz mono)
    val w = audioMetadata(wav(440.0)).get
    assert(w.container === "wav")
    assert(w.channels === 1)
    assert(w.durationMs === 200L)

    // FLAC STREAMINFO: 44100 Hz stereo, 441000 samples = 10 s
    val flac = "fLaC".getBytes ++ Array[Byte](0x80.toByte, 0, 0, 34) ++
      Array.fill[Byte](10)(0) ++ Array[Byte](0x0A, 0xC4.toByte, 0x42,
        0xF0.toByte, 0x00, 0x06, 0xBA.toByte, 0xA8.toByte) ++
      Array.fill[Byte](16)(0)
    val f = audioMetadata(flac).get
    assert(f.container === "flac")
    assert((f.sampleRate, f.channels, f.durationMs) ===
      ((44100, 2, 10000L)))

    // MP3: MPEG1 Layer III 128 kbps 44100 stereo + Xing frame count
    // 38 frames * 1152 samples / 44100 Hz = 992 ms
    val frame = Array[Byte](0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0) ++
      Array.fill[Byte](32)(0) ++ "Xing".getBytes ++
      Array[Byte](0, 0, 0, 1) ++ Array[Byte](0, 0, 0, 38) ++
      Array.fill[Byte](64)(0)
    val id3 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 0)
    val m = audioMetadata(id3 ++ frame).get
    assert(m.container === "mp3")
    assert((m.sampleRate, m.channels) === ((44100, 2)))
    assert(m.durationMs === 38L * 1152 * 1000 / 44100)

    // Ogg Opus: ident page (pre-skip 312) + last page at granule
    // 96312 -> (96312 - 312) / 48 = 2000 ms
    def leBytes(v: Long, n: Int): Array[Byte] =
      Array.tabulate[Byte](n)(i => ((v >> (8 * i)) & 0xFF).toByte)
    val ident = "OggS".getBytes ++ Array[Byte](0, 2) ++
      leBytes(0, 8) ++ leBytes(1, 4) ++ leBytes(0, 4) ++
      leBytes(0, 4) ++ Array[Byte](1, 19) ++
      "OpusHead".getBytes ++ Array[Byte](1, 2) ++ leBytes(312, 2) ++
      leBytes(48000, 4) ++ Array[Byte](0, 0, 0)
    val lastPage = "OggS".getBytes ++ Array[Byte](0, 4) ++
      leBytes(96312, 8) ++ leBytes(1, 4) ++ leBytes(1, 4) ++
      leBytes(0, 4) ++ Array[Byte](0)
    val o = audioMetadata(ident ++ lastPage).get
    assert(o.container === "opus")
    assert((o.sampleRate, o.channels, o.durationMs) ===
      ((48000, 2, 2000L)))

    // junk: None, never a throw
    assert(audioMetadata(null).isEmpty)
    assert(audioMetadata(Array.fill[Byte](64)(42)).isEmpty)
  }

  test("audioMetadata: malformed WAV chunk size (0xFFFFFFF8) " +
      "terminates — no infinite loop, no throw (untrusted crawl bytes)") {
    import AudioFeatures.audioMetadata
    // RIFF/WAVE header then a chunk whose unsigned size wraps Int to -8
    // (the old sz.toInt advance became 0 -> executor task hang)
    val evil = "RIFF".getBytes ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes ++
      "fmt ".getBytes ++ Array[Byte](0xF8.toByte, 0xFF.toByte,
        0xFF.toByte, 0xFF.toByte) ++ Array.fill[Byte](24)(0)
    val done = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fut = done.submit(new java.util.concurrent.Callable[Boolean] {
        def call(): Boolean = { audioMetadata(evil); true }
      })
      assert(fut.get(10, java.util.concurrent.TimeUnit.SECONDS))
    } finally done.shutdownNow()
  }
}
