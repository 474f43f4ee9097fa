package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/
  * video payloads as opaque binary columns + typed metadata, with the
  * decode/feature steps as mapPartitions over batched rows — the Spark-
  * side shape (schema, partitioning, batch iteration) is real and
  * tested; the actual codec call is a deterministic STUB (media libs are
  * not in this container; a production build swaps `stubDecode` for an
  * FFI decode keeping every signature identical).
  */
object Multimodal {

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

  /** STUB decode+featurize kernel: deterministic bytes -> fixed-dim
    * feature (byte histogram, L2-normalized). Replace with a real decoder
    * (image resize / audio frames / video frame-sample) preserving this
    * exact signature — per-partition iteration means a real backend can
    * hold one decoder instance per partition (executor-singleton, R7). */
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
    * shape from the reference's Python world, expressed JVM-native). */
  def extractFeatures(media: DataFrame, dim: Int = 32): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(featureSchema)
    media.select("asset_id", "media_type", "payload")
      .mapPartitions { rows =>
        // decoder init would happen HERE, once per partition
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getString(0), r.getString(1),
            if (payload == null) 0 else payload.length,
            stubDecode(payload, dim).toSeq)
        }
      }(enc)
  }

  /** Partitioning discipline for 100 TB media: repartition by asset hash
    * so payload bytes distribute evenly (media sizes are skewed), then
    * feature-extract map-side. */
  def extractFeaturesBalanced(media: DataFrame, partitions: Int,
      dim: Int = 32): DataFrame =
    extractFeatures(
      media.repartition(partitions, col("asset_id")), dim)

  /** STUB resize kernel: deterministic payload transform standing in for
    * an image decoder+scaler (production: libvips/ImageIO behind the
    * same bytes->bytes signature). Emits a payload whose length encodes
    * the target dims so tests can assert the transform ran. */
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
              stubResize(r.getAs[Array[Byte]]("payload"), w, h),
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
    val featUdf = udf { (payload: Array[Byte]) => stubDecode(payload, dim) }
    val frames = sampleFrames(media, everyMs).select(
      concat(col("asset_id"), lit("#"), col("frame_index"))
        .as("frame_id"),
      featUdf(col("frame")).as("feature"))
    Dedup.embeddingNearDupPairs(frames, "frame_id", "feature",
      threshold, planes)
  }
}
