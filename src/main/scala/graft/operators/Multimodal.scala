package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/
  * video payloads as opaque binary columns + typed metadata, with the
  * decode/feature steps as mapPartitions over batched rows.
  *
  * IMAGE kernels are REAL: decode/resize/featurize run through the
  * JDK's ImageIO (PNG/JPEG/BMP/GIF/WBMP readers ship with Java — no
  * external dependency, headless-safe). Payloads ImageIO cannot decode
  * fall back to the deterministic stub kernels so non-image bytes keep
  * flowing (same signature, documented per call site). VIDEO frame
  * DECODE remains the one stub: the JDK has no video codec, and that is
  * the honest FFI cut line — frame sampling arithmetic, caps, and the
  * downstream featurize/LSH plumbing are real either way.
  */
object Multimodal {

  /** Real image decode via the JDK's bundled ImageIO readers. None for
    * null/empty/undecodable payloads (callers fall back to the stub
    * kernels). One call per row inside mapPartitions — ImageIO reader
    * instances are per-call; the JVM caches the reader SPI registry. */
  def decodeImage(payload: Array[Byte])
      : Option[java.awt.image.BufferedImage] =
    if (payload == null || payload.length == 0) None
    else
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** Real resize: bilinear scale to w x h, re-encoded as PNG.
    * Undecodable payloads degrade to stubResize. */
  def resizeKernel(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    decodeImage(payload) match {
      case Some(img) =>
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      case None => stubResize(payload, w, h)
    }

  /** Real image featurization: mean luminance over a g x g pooling grid
    * (g = ceil(sqrt(dim)), first `dim` cells row-major), L2-normalized —
    * the classic tiny-gist descriptor; enough signal for near-dup LSH
    * over decoded pixels rather than compressed bytes. */
  def imageFeatures(img: java.awt.image.BufferedImage,
      dim: Int): Array[Float] = {
    val g = math.ceil(math.sqrt(dim.toDouble)).toInt
    val acc = new Array[Double](dim)
    val cnt = new Array[Long](dim)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      val gy = math.min(g - 1, y * g / math.max(h, 1))
      var x = 0
      while (x < w) {
        val gx = math.min(g - 1, x * g / math.max(w, 1))
        val cell = gy * g + gx
        if (cell < dim) {
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          acc(cell) += lum / 255.0
          cnt(cell) += 1
        }
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < dim) { if (cnt(i) > 0) acc(i) /= cnt(i); i += 1 }
    val norm = math.sqrt(acc.map(v => v * v).sum)
    if (norm == 0.0) { val v = new Array[Float](dim); v(0) = 1.0f; v }
    else acc.map(v => (v / norm).toFloat)
  }

  /** Featurize kernel: real pixel features for decodable images, real
    * FFT band energies for decodable audio (AudioFeatures), byte-
    * histogram stub only for what the JDK cannot decode (compressed
    * audio codecs, video payloads — the FFI cut line). */
  def featureKernel(payload: Array[Byte], dim: Int): Array[Float] =
    featureKernelTagged(payload, dim)._1

  /** featureKernel plus PROVENANCE: which decoder produced the feature
    * ("image" | "audio" | "fallback"). A mixed 100 TB media corpus
    * needs this observable — a codec rollout that silently shifts 30%
    * of assets onto the fallback histogram would otherwise only show
    * up as drifting similarity scores. One decode attempt per path,
    * no double work. */
  def featureKernelTagged(payload: Array[Byte],
      dim: Int): (Array[Float], String) =
    decodeImage(payload) match {
      case Some(img) => (imageFeatures(img, dim), "image")
      case None =>
        AudioFeatures.clipFeatures(payload, dim) match {
          case Some(f) => (f, "audio")
          case None => (stubDecode(payload, dim), "fallback")
        }
    }

  val taggedFeatureSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("decoder", StringType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)
  ))

  /** extractFeatures with the decoder column — same mapPartitions
    * shape. Monitor `GROUP BY decoder` counts per batch. */
  def extractFeaturesTagged(media: DataFrame, dim: Int = 32): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(taggedFeatureSchema)
    media.select("asset_id", "media_type", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (feat, tag) = featureKernelTagged(payload, dim)
          Row(r.getString(0), r.getString(1),
            if (payload == null) 0 else payload.length,
            tag, feat.toSeq)
        }
      }(enc)
  }

  /** media table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)
  ))

  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)
  ))

  /** FALLBACK featurize kernel for payloads ImageIO cannot decode
    * (audio bytes, synthetic fixtures): deterministic byte histogram,
    * L2-normalized. An audio FFI decoder would replace this preserving
    * the exact signature — per-partition iteration means a real backend
    * can hold one decoder instance per partition (executor-singleton,
    * R7). */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Double](dim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        acc(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1.0
        i += 1
      }
    }
    val norm = math.sqrt(acc.map(x => x * x).sum)
    if (norm == 0.0) { val v = new Array[Float](dim); v(0) = 1.0f; v }
    else acc.map(x => (x / norm).toFloat)
  }

  /** Feature extraction over the media table: mapPartitions so decoder
    * state amortizes across a partition's rows (the pandas-UDF batch
    * shape from the reference's Python world, expressed JVM-native).
    * Delegates to the tagged form — one mapPartitions body to
    * maintain; taggedFeatureSchema minus `decoder` IS featureSchema. */
  def extractFeatures(media: DataFrame, dim: Int = 32): DataFrame =
    extractFeaturesTagged(media, dim).drop("decoder")

  /** Partitioning discipline for 100 TB media: repartition by asset hash
    * so payload bytes distribute evenly (media sizes are skewed), then
    * feature-extract map-side. */
  def extractFeaturesBalanced(media: DataFrame, partitions: Int,
      dim: Int = 32): DataFrame =
    extractFeatures(
      media.repartition(partitions, col("asset_id")), dim)

  /** FALLBACK resize kernel for undecodable payloads (and the synthetic
    * frame bytes sampleFrames emits, pending a video FFI decoder):
    * deterministic payload transform whose output length encodes the
    * target dims so tests can assert the transform ran. Real images
    * never reach this — resizeKernel decodes them via ImageIO. */
  def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte]((w * h) % 4096 + 16)
    if (payload != null && payload.length > 0) {
      var i = 0
      while (i < out.length) {
        out(i) = payload(i % payload.length)
        i += 1
      }
    }
    out
  }

  /** Image resize over the media table: binary -> binary mapPartitions
    * with metadata rewrite (width/height become the target dims). Only
    * image rows are transformed; others pass through untouched. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    media.select("asset_id", "media_type", "payload", "width", "height",
        "duration_ms")
      .mapPartitions { rows =>
        // decoder/scaler init would happen HERE, once per partition
        rows.map { r =>
          if (r.getString(1) == "image") {
            Row(r.getString(0), r.getString(1),
              resizeKernel(r.getAs[Array[Byte]]("payload"), w, h),
              w, h, r.get(5))
          } else r
        }
      }(enc)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("asset_id", StringType, nullable = false),
    StructField("frame_index", IntegerType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = false)
  ))

  /** Video frame sampling: one output row per sampled timestamp
    * (generator/UDTF shape — `flatMap` over rows). Frame payloads are
    * deterministic stubs (production: a seeking decoder per partition);
    * the row-explosion, cap, and timestamp arithmetic are real. At
    * 100 TB the explosion factor is duration/everyMs — cap it so one
    * pathological asset can't blow a task. */
  def sampleFrames(media: DataFrame, everyMs: Long,
      maxFramesPerAsset: Int = 64): DataFrame = {
    require(everyMs > 0)
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    media.where(col("media_type") === "video")
      .select("asset_id", "payload", "duration_ms")
      .flatMap { r =>
        val dur = if (r.isNullAt(2)) 0L else r.getLong(2)
        val n = math.min(dur / everyMs + 1, maxFramesPerAsset.toLong).toInt
        val payload = r.getAs[Array[Byte]]("payload")
        (0 until n).map { i =>
          Row(r.getString(0), i, i * everyMs,
            stubResize(payload, i + 1, 16))
        }
      }(enc)
  }

  /** Frame-level near-dup pairs across video assets: sample frames,
    * featurize each frame payload, hyperplane-LSH bucketed cosine
    * pairing (Dedup.embeddingNearDupPairs). The cross-video dedup a
    * training-data pipeline needs — repeated intros / stock footage
    * collapse to pairs without any N^2 frame comparison; decode kernel
    * stubbed, plumbing (generator -> featurize -> LSH join) real. */
  def frameNearDupPairs(media: DataFrame, everyMs: Long, dim: Int,
      threshold: Double, planes: Int = 8): DataFrame = {
    val featUdf = udf { (payload: Array[Byte]) => featureKernel(payload, dim) }
    val frames = sampleFrames(media, everyMs).select(
      concat(col("asset_id"), lit("#"), col("frame_index"))
        .as("frame_id"),
      featUdf(col("frame")).as("feature"))
    Dedup.embeddingNearDupPairs(frames, "frame_id", "feature",
      threshold, planes)
  }

  // ---- ISO-BMFF (MP4/MOV) metadata — REAL parsing, no codec ----
  //
  // Frame DECODE stays the FFI cut line, but the container METADATA a
  // curation pipeline filters on (duration caps, resolution floors,
  // codec allow-lists) is a pure byte-level box walk per ISO/IEC
  // 14496-12 — public spec, no dependency. This narrows the video cut
  // line the same way PdfCrypt narrowed the encrypted-PDF one.

  /** Parsed ISO-BMFF container facts. durationMs from mvhd
    * (duration/timescale); width/height from the first visual tkhd
    * (16.16 fixed point); codecs = stsd sample-entry fourccs in track
    * order. */
  final case class Mp4Info(brand: String, durationMs: Long,
      trackCount: Int, width: Int, height: Int, codecs: Seq[String])

  private def be32(b: Array[Byte], at: Int): Long =
    ((b(at) & 0xFFL) << 24) | ((b(at + 1) & 0xFFL) << 16) |
      ((b(at + 2) & 0xFFL) << 8) | (b(at + 3) & 0xFFL)

  private def be64(b: Array[Byte], at: Int): Long =
    (be32(b, at) << 32) | be32(b, at + 4)

  private def fourcc(b: Array[Byte], at: Int): String =
    new String(b, at, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** None for null/short/non-BMFF payloads (first top-level box must
    * carry a known brand-bearing or structural type). Malformed sizes
    * terminate the walk instead of throwing — best-effort facts over
    * exceptions, like every other kernel here. */
  def mp4Metadata(payload: Array[Byte]): Option[Mp4Info] = {
    if (payload == null || payload.length < 16) return None
    val containers = Set("moov", "trak", "mdia", "minf", "stbl")
    var brand = ""
    var durationMs = -1L
    var tracks = 0
    var width = 0
    var height = 0
    val codecs = scala.collection.mutable.ArrayBuffer.empty[String]
    var sawStructural = false

    def walk(from: Long, to: Long): Unit = {
      var at = from
      while (at + 8 <= to) {
        val size0 = be32(payload, at.toInt)
        val typ = fourcc(payload, at.toInt + 4)
        var header = 8L
        val size =
          if (size0 == 1 && at + 16 <= to) { header = 16L
            be64(payload, at.toInt + 8) }
          else if (size0 == 0) to - at // box runs to end of enclosure
          else size0
        if (size < header || at + size > to) return // torn/corrupt
        val body = at + header
        typ match {
          case "ftyp" if size >= header + 4 =>
            brand = fourcc(payload, body.toInt); sawStructural = true
          case "mvhd" if size >= header + 4 =>
            sawStructural = true
            val v = payload(body.toInt) & 0xFF
            // v0: c(4) m(4) timescale(4) duration(4); v1: 8 8 4 8
            val (ts, dur) =
              if (v == 1 && size >= header + 4 + 28)
                (be32(payload, body.toInt + 20),
                  be64(payload, body.toInt + 24))
              else if (size >= header + 4 + 16)
                (be32(payload, body.toInt + 12),
                  be32(payload, body.toInt + 16))
              else (0L, 0L)
            if (ts > 0) durationMs = dur * 1000L / ts
          case "tkhd" =>
            tracks += 1
            // width/height: the LAST 8 bytes of the box, 16.16 fixed
            val wh = at + size - 8
            if (wh >= body && width == 0) {
              val w = (be32(payload, wh.toInt) >> 16).toInt
              val h = (be32(payload, wh.toInt + 4) >> 16).toInt
              if (w > 0 && h > 0) { width = w; height = h }
            }
          case "stsd" if size >= header + 8 =>
            val n = be32(payload, body.toInt + 4).toInt
            var e = body + 8
            var i = 0
            while (i < n && e + 8 <= at + size) {
              val esz = be32(payload, e.toInt)
              codecs += fourcc(payload, e.toInt + 4)
              if (esz < 8) { i = n } // corrupt entry: stop
              else { e += esz; i += 1 }
            }
          case t if containers(t) =>
            sawStructural = true
            walk(body, at + size)
          case _ => ()
        }
        at += size
      }
    }
    walk(0L, payload.length.toLong)
    if (!sawStructural) None
    else Some(Mp4Info(brand, durationMs, tracks, width, height,
      codecs.toSeq))
  }

  /** Column form: media frame -> parsed container metadata columns
    * (null struct for non-BMFF payloads). Row-local, no shuffle — the
    * admission predicates (duration/resolution/codec) then push into
    * the scan like any other filter. */
  def withVideoMetadata(media: DataFrame): DataFrame = {
    val metaUdf = udf { (payload: Array[Byte]) =>
      mp4Metadata(payload).map(m =>
        (m.brand, m.durationMs, m.trackCount, m.width, m.height,
          m.codecs))
    }
    media.withColumn("video_meta", metaUdf(col("payload")))
      .withColumn("vm_brand", col("video_meta._1"))
      .withColumn("vm_duration_ms", col("video_meta._2"))
      .withColumn("vm_tracks", col("video_meta._3"))
      .withColumn("vm_width", col("video_meta._4"))
      .withColumn("vm_height", col("video_meta._5"))
      .withColumn("vm_codecs", col("video_meta._6"))
      .drop("video_meta")
  }
}
