package graft

import org.apache.spark.sql.Row

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {

  private def media = {
    val s = initSpark()
    val rows = java.util.Arrays.asList(
      Row("a1", "image", Array[Byte](1, 2, 3, 2, 1), 2, 2, null),
      Row("a2", "audio", Array[Byte](9, 9, 9, 9), null, null, 1000L),
      Row("a3", "video", null, null, null, null)
    )
    s.createDataFrame(rows, Multimodal.mediaSchema)
  }

  /** Real PNG bytes: left half red, right half blue. */
  private def pngHalves(w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("REAL IMAGE: resizeImages decodes an actual PNG, bilinear-scales " +
      "it, and the output parses back at the target dims with content " +
      "preserved") {
    val s = initSpark()
    val rows = java.util.Arrays.asList(
      Row("img1", "image", pngHalves(8, 8), 8, 8, null))
    val m = s.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.resizeImages(m, 4, 4).collect().head
    val resized = Multimodal.decodeImage(out.getAs[Array[Byte]](2))
    assert(resized.isDefined, "resized payload must be a decodable image")
    assert(resized.get.getWidth === 4 && resized.get.getHeight === 4)
    // content survives the scale: left still red-dominant, right blue
    val left = resized.get.getRGB(0, 2)
    val right = resized.get.getRGB(3, 2)
    assert(((left >> 16) & 0xff) > (left & 0xff), "left half stays red")
    assert((right & 0xff) > ((right >> 16) & 0xff), "right half stays blue")
  }

  test("REAL IMAGE: featureKernel pools decoded pixels (identical " +
      "images agree, different images differ, undecodable bytes take " +
      "the histogram fallback)") {
    val a = Multimodal.featureKernel(pngHalves(), 16)
    val b = Multimodal.featureKernel(pngHalves(), 16)
    assert(a.toSeq === b.toSeq, "decode+pool must be deterministic")
    // an all-white PNG pools differently from red/blue halves
    val white = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(Multimodal.featureKernel(white, 16).toSeq !== a.toSeq)
    // pixel features, not byte features: the same image re-encoded with
    // different bytes (resize to same size) still pools identically
    // while the byte histogram of the two payloads differs
    val fallback = Multimodal.stubDecode(pngHalves(), 16)
    assert(fallback.toSeq !== a.toSeq,
      "real path must not be the byte-histogram stub")
    // junk bytes fall back instead of throwing
    val junk = Array[Byte](1, 2, 3)
    assert(Multimodal.featureKernel(junk, 16).toSeq ===
      Multimodal.stubDecode(junk, 16).toSeq)
  }

  test("feature extraction preserves schema and handles null payloads") {
    val out = Multimodal.extractFeatures(media, dim = 8)
    assert(out.schema === Multimodal.featureSchema)
    val rows = out.collect().map(r => r.getString(0) ->
      (r.getInt(2), r.getSeq[Float](3))).toMap
    assert(rows("a1")._1 === 5)
    assert(rows("a3")._1 === 0)
    assert(rows.values.forall(_._2.length === 8))
    // null payload gets the deterministic unit vector
    assert(rows("a3")._2.head === 1.0f)
  }

  test("features are deterministic and balanced path matches map path") {
    val a = Multimodal.extractFeatures(media, 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](3)).toMap
    val b = Multimodal.extractFeaturesBalanced(media, partitions = 3, 8)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](3)).toMap
    assert(a === b)
  }

  test("resizeImages rewrites image payload + dims, passes others through") {
    val out = Multimodal.resizeImages(media, 64, 64)
    assert(out.schema === Multimodal.mediaSchema)
    val byId = out.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("a1").getInt(3) === 64 && byId("a1").getInt(4) === 64)
    assert(byId("a1").getAs[Array[Byte]](2).length === (64 * 64) % 4096 + 16)
    // audio row untouched
    assert(byId("a2").getAs[Array[Byte]](2).toSeq === Seq[Byte](9, 9, 9, 9))
    assert(byId("a2").isNullAt(3))
  }

  test("sampleFrames explodes videos at the stride, capped") {
    val s = initSpark()
    val rows = java.util.Arrays.asList(
      Row("v1", "video", Array[Byte](5, 6), null, null, 2500L),
      Row("v2", "video", Array[Byte](7), null, null, 1000000L), // cap
      Row("a1", "image", Array[Byte](1), 1, 1, null))
    val m = s.createDataFrame(rows, Multimodal.mediaSchema)
    val out = Multimodal.sampleFrames(m, everyMs = 1000,
      maxFramesPerAsset = 8)
    assert(out.schema === Multimodal.frameSchema)
    val byAsset = out.collect().groupBy(_.getString(0))
    assert(!byAsset.contains("a1")) // only videos
    assert(byAsset("v1").map(_.getLong(2)).sorted.toSeq ===
      Seq(0L, 1000L, 2000L)) // 2500ms at 1000ms stride
    assert(byAsset("v2").length === 8) // capped
  }

  test("frameNearDupPairs: identical payloads pair across assets, " +
      "distinct footage stays apart") {
    val s = initSpark()
    val shared = Array.tabulate(64)(i => (i * 7 % 127).toByte)
    val other = Array.tabulate(64)(i => (i * 13 % 31 + 64).toByte)
    val rows = java.util.Arrays.asList(
      Row("v1", "video", shared, null, null, 1000L),
      Row("v2", "video", shared.clone(), null, null, 1000L), // same bytes
      Row("v3", "video", other, null, null, 1000L))
    val m = s.createDataFrame(rows, Multimodal.mediaSchema)
    val pairs = Multimodal.frameNearDupPairs(m, everyMs = 1000,
        dim = 16, threshold = 0.999)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // frame k of v1 and frame k of v2 resize identically -> cos 1.0
    assert(pairs.contains(("v1#0", "v2#0")))
    assert(pairs.contains(("v1#1", "v2#1")))
    // v3's distinct footage never pairs with v1/v2
    assert(!pairs.exists(p =>
      (p._1.startsWith("v3") && !p._2.startsWith("v3")) ||
        (p._2.startsWith("v3") && !p._1.startsWith("v3"))))
  }

  // ---- ISO-BMFF metadata (the real part of the video tier) ----

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)

  private def box(typ: String, body: Array[Byte]): Array[Byte] =
    be32(body.length + 8L) ++
      typ.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ body

  test("mp4Metadata: hand-built ISO-BMFF walks ftyp/mvhd/tkhd/stsd " +
      "(duration, dims, codec fourccs); junk bytes -> None") {
    // mvhd v0: version+flags, creation, modification, timescale=1000,
    // duration=90500 -> 90500 ms
    val mvhd = box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++
      be32(1000) ++ be32(90500) ++ Array.fill[Byte](76)(0))
    // tkhd v0: 80-byte body whose LAST 8 bytes are 16.16 width/height
    val tkhd = box("tkhd", Array.fill[Byte](72)(0) ++
      be32(640L << 16) ++ be32(360L << 16))
    val avc1 = box("avc1", Array.fill[Byte](8)(0))
    val stsd = box("stsd", be32(0) ++ be32(1) ++ avc1)
    val stbl = box("stbl", stsd)
    val minf = box("minf", stbl)
    val mdia = box("mdia", minf)
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512))
    val mp4 = ftyp ++ moov

    val got = Multimodal.mp4Metadata(mp4)
    assert(got.isDefined)
    val m = got.get
    assert(m.brand === "isom")
    assert(m.durationMs === 90500L)
    assert(m.trackCount === 1)
    assert((m.width, m.height) === ((640, 360)))
    assert(m.codecs === Seq("avc1"))

    // junk / truncated payloads: None, never a throw
    assert(Multimodal.mp4Metadata(null).isEmpty)
    assert(Multimodal.mp4Metadata(Array.fill[Byte](64)(33)).isEmpty)
    assert(Multimodal.mp4Metadata(mp4.take(20)).isEmpty ||
      Multimodal.mp4Metadata(mp4.take(20)).get.durationMs === -1L)

    // column form: predicates on the parsed facts
    val s2 = initSpark()
    val rows = java.util.Arrays.asList(
      Row("a", "video", mp4, null, null, null),
      Row("b", "video", Array.fill[Byte](32)(7), null, null, null))
    val df = s2.createDataFrame(rows, Multimodal.mediaSchema)
    val meta = Multimodal.withVideoMetadata(df)
      .select("asset_id", "vm_duration_ms", "vm_codecs")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -999L else r.getLong(1))).toMap
    assert(meta("a") === 90500L)
    assert(meta("b") === -999L)
  }
}
