package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkEntry

/** Streaming-curation bounded-state proof (round-11 stretch): drives
  * `Curation.curateStream` over a replicated documents corpus split
  * into per-batch parquet files (`maxFilesPerTrigger=1` ⇒ one
  * micro-batch per replica, `Trigger.AvailableNow` ⇒ drain-and-stop),
  * and records the dedup state store's row count per micro-batch from
  * `StreamingQueryProgress`. The contract being proven: with a
  * watermark of W batch-intervals, `dropDuplicatesWithinWatermark`
  * state holds ~W batches' distinct fingerprints and then EXPIRES —
  * state stays flat across an arbitrarily long ingest instead of
  * growing with the corpus (the q107/q112 incremental tier's streaming
  * face). A cumulative-state regression shows up as a monotone
  * numRowsTotal ramp and fails the flatness check loudly.
  *
  * Batch layout: replica b of the base corpus gets event time
  * t0 + b·5min and shifted doc ids, so replicas are exact-dup
  * fingerprint collisions for as long as they sit inside the
  * watermark — the worst case for dedup state. Watermark 12 min ⇒
  * steady state ≈ 3 batches of fingerprints.
  */
object StreamProof {

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = if (args.length > 1) args(1)
      else "/tmp/graft_streamproof"
    val batches = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val srcDir = s"$workDir/in"
    // The driver's synthetic corpus fails Curation's Gopher gate by
    // construction (no English stopwords), which would starve the
    // dedup operator of state. Pad every text with a fixed varied
    // stopword-bearing suffix — text-independent and identical across
    // replicas, so fingerprints still collide exactly as the dedup
    // worst case requires, while the FULL production gate stays in
    // the measured path instead of being bypassed.
    val pad = Seq(
      "the story of rivers and stones that have kept with be to cross",
      "of light and the shadow that morning have brought with be to see",
      "and the wind of autumn that have turned with leaves be to fall",
      "that the course of years have settled and with time be to pass",
      "have the makers of tools and that wisdom with care be to build",
      "with the of and that have voices be to carry over distant hills",
      "be the of and that have quiet with rooms to hold every echo",
      "to the of and that have roads with bridges be spanning the vale")
      .mkString(" ")
    val base = SparkEntry.table(spark, baseDir, "documents")
      .withColumn("text", concat_ws(" ", col("text"), lit(pad)))
    val off = base.agg(coalesce(max(col("doc_id")), lit(0L)))
      .head().getLong(0) + 1L
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    (0 until batches).foreach { b =>
      base
        .withColumn("doc_id", col("doc_id") + lit(b.toLong * off))
        .withColumn("ts",
          lit(t0).cast("timestamp") +
            expr(s"INTERVAL ${b * 5} MINUTES"))
        // one file per batch: coalesce(1) so maxFilesPerTrigger=1
        // maps exactly one replica to one micro-batch
        .coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append")
        .parquet(srcDir)
    }

    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val curated = Curation.curateStream(stream, "doc_id", "text",
      "ts", watermarkDelay = "12 minutes")
    val q = curated.writeStream
      .format("noop")
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val progress = q.recentProgress.toSeq
      .filter(p => p.numInputRows > 0 || p.stateOperators.nonEmpty)
    val rows = progress.zipWithIndex.flatMap { case (p, i) =>
      p.stateOperators.headOption.map { so =>
        (i, p.numInputRows, so.numRowsTotal, so.numRowsRemoved,
          p.sink.numOutputRows)
      }
    }
    val lines = rows.map { case (i, in, state, removed, out) =>
      s"""{"batch":$i,"input_rows":$in,"state_rows":$state""" +
        s""","state_removed":$removed,"output_rows":$out}"""
    }
    val stateCounts = rows.map(_._3).filter(_ > 0)
    val perBatchDistinct = base.select("text").distinct().count()
    // flatness: steady-state is bounded by watermark-window batches
    // (3) x per-batch distinct fingerprints, NOT cumulative
    val maxState = if (stateCounts.isEmpty) 0L else stateCounts.max
    val bound = 4L * perBatchDistinct
    val summary =
      s"""{"metric":"stream_proof","batches":${rows.length}""" +
        s""","per_batch_distinct":$perBatchDistinct""" +
        s""","max_state_rows":$maxState""" +
        s""","flat_bound":$bound""" +
        s""","state_flat":${maxState <= bound && maxState > 0}}"""
    rows.foreach(r => System.err.println("[streamproof] " + r))
    println(summary)
    val body = (lines :+ summary).mkString("[", ",\n", "]")
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT",
      "stream_proof.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (body + "\n").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"[streamproof] write failed: $e") }
    spark.stop()
    if (!(maxState <= bound && maxState > 0))
      throw new IllegalStateException(
        s"state not flat: max $maxState vs bound $bound")
  }
}
