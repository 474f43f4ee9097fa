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
    // SPARK_GRAFT_STREAM_STORE=rocksdb (round 18): run every tier
    // under the production-grade RocksDB state store instead of the
    // default HDFS-backed in-memory maps. The measured 10^9-doc
    // state ceilings (SCALE_r18 §2) assume a store that spills —
    // this mode makes "the operators run under RocksDB" a proof
    // output rather than a compatibility claim, and the artifact
    // records which store produced its numbers (memoryUsedBytes
    // semantics differ: RocksDB reports its own memory accounting,
    // so bytes are comparable within a store, not across).
    val stateStore = sys.env.getOrElse("SPARK_GRAFT_STREAM_STORE",
      "hdfs")
    // unknown values fail fast: a typo (RocksDB, rocks-db) silently
    // proving the DEFAULT store would be the worst outcome — the
    // artifact would look like the rocksdb evidence without being it
    require(stateStore == "hdfs" || stateStore == "rocksdb",
      s"SPARK_GRAFT_STREAM_STORE must be 'hdfs' or 'rocksdb', " +
        s"got '$stateStore'")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (stateStore == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // memory-sink streaming queries cannot recover from a previous
    // run's checkpoints — a reused workDir failed with "does not
    // support recovering from checkpoint location" — so stale proof
    // state is wiped up front (the proof re-materializes everything
    // under workDir anyway; nothing there is an input). GUARDED
    // (round-16 advice): the recursive delete refuses a workDir that
    // contains/equals the input baseDir, and an EXISTING directory is
    // wiped only if it carries the marker file a previous proof run
    // wrote — a mistyped path pointing at real data fails loudly
    // instead of being destroyed.
    {
      val marker = ".graft_streamproof"
      // the containment check and the recursive delete must agree on
      // path semantics: both go through the Hadoop FileSystem and
      // compare FULLY QUALIFIED URIs (a java.nio comparison would
      // mangle a scheme-qualified baseDir like file:///… into a
      // relative path and wave the guard through — review finding,
      // round 17)
      val conf = spark.sessionState.newHadoopConf()
      val workP = new org.apache.hadoop.fs.Path(workDir)
      val fs = workP.getFileSystem(conf)
      val root = fs.makeQualified(workP)
      val baseP = new org.apache.hadoop.fs.Path(baseDir)
      val baseQ = baseP.getFileSystem(conf).makeQualified(baseP)
      def within(child: org.apache.hadoop.fs.Path,
          parent: org.apache.hadoop.fs.Path): Boolean = {
        val cu = child.toUri; val pu = parent.toUri
        java.util.Objects.equals(cu.getScheme, pu.getScheme) &&
          java.util.Objects.equals(cu.getAuthority, pu.getAuthority) && {
            val cp = cu.getPath.stripSuffix("/") + "/"
            val pp = pu.getPath.stripSuffix("/") + "/"
            cp.startsWith(pp)
          }
      }
      require(!within(baseQ, root),
        s"refusing to wipe $root: it contains the input $baseQ")
      if (fs.exists(root) && fs.listStatus(root).nonEmpty) {
        require(fs.exists(new org.apache.hadoop.fs.Path(root, marker)),
          s"refusing to wipe $root: no $marker from a previous " +
            s"StreamProof run — pass a dedicated (or empty) work dir")
        fs.delete(root, true)
        ()
      }
      fs.mkdirs(root)
      fs.create(new org.apache.hadoop.fs.Path(root, marker)).close()
    }

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

    // max state rows AND bytes across a query's progress reports
    // (round 18, verdict item 3): `memoryUsedBytes` is the state
    // store's own memory estimate, so bytes-per-retained-doc becomes
    // a MEASURED number per tier instead of a scaladoc argument —
    // the projection to a 10^9-doc stream is then division, recorded
    // in the artifact next to the row counts.
    def stateStats(q: org.apache.spark.sql.streaming.StreamingQuery)
        : (Long, Long) = {
      val sos = q.recentProgress.toSeq
        .flatMap(_.stateOperators.headOption)
      (sos.map(_.numRowsTotal).foldLeft(0L)(math.max),
        sos.map(_.memoryUsedBytes).foldLeft(0L)(math.max))
    }
    // bytes-per-doc over the docs the tier actually ingested; -1.0
    // sentinel when the store reports no estimate
    def perDoc(bytes: Long, docs: Long): String =
      if (bytes <= 0L || docs <= 0L) "-1.0"
      else f"${bytes.toDouble / docs}%.1f"
    val progress = q.recentProgress.toSeq
      .filter(p => p.numInputRows > 0 || p.stateOperators.nonEmpty)
    val rows = progress.zipWithIndex.flatMap { case (p, i) =>
      p.stateOperators.headOption.map { so =>
        (i, p.numInputRows, so.numRowsTotal, so.numRowsRemoved,
          p.sink.numOutputRows, so.memoryUsedBytes)
      }
    }
    val lines = rows.map { case (i, in, state, removed, out, bytes) =>
      s"""{"batch":$i,"input_rows":$in,"state_rows":$state""" +
        s""","state_removed":$removed,"output_rows":$out""" +
        s""","state_bytes":$bytes}"""
    }
    val stateCounts = rows.map(_._3).filter(_ > 0)
    val perBatchDistinct = base.select("text").distinct().count()
    // flatness: steady-state is bounded by watermark-window batches
    // (3) x per-batch distinct fingerprints, NOT cumulative
    val maxState = if (stateCounts.isEmpty) 0L else stateCounts.max
    val maxStateBytes = rows.map(_._6).foldLeft(0L)(math.max)
    val bound = 4L * perBatchDistinct
    // bytes-per-row from the SAME batch (max over per-batch ratios)
    // — max-bytes / max-rows across DIFFERENT batches would be a
    // mixed quotient when the store's accounting ramps while rows
    // stay flat (review finding, round 18; RocksDB does exactly that)
    val bytesPerRow = rows.collect {
      case (_, _, r, _, _, b) if r > 0 && b > 0 => b.toDouble / r
    }
    val maxBytesPerRow = if (bytesPerRow.isEmpty) "-1.0"
      else f"${bytesPerRow.max}%.1f"
    val summary =
      s"""{"metric":"stream_proof","batches":${rows.length}""" +
        s""","state_store":"$stateStore"""" +
        s""","per_batch_distinct":$perBatchDistinct""" +
        s""","max_state_rows":$maxState""" +
        s""","max_state_bytes":$maxStateBytes""" +
        s""","state_bytes_per_row":$maxBytesPerRow""" +
        s""","flat_bound":$bound""" +
        s""","state_flat":${maxState <= bound && maxState > 0}}"""
    rows.foreach(r => System.err.println("[streamproof] " + r))
    println(summary)
    // ---- v2 (round 12): the same contracts under MUTATION — replica
    // b's text is per-token edited at 2b% (the ScaleProof mutation),
    // so batches carry NEAR-dup cliques instead of exact fingerprint
    // collisions. Two measurements:
    //  (a) curateStream flatness: mutated docs have DISTINCT
    //      fingerprints, so dedup state is ~watermark-window batches
    //      of rows and must still expire (flat), not ramp;
    //  (b) NearDupStream: the banded stateful pairer's distinct pair
    //      set must equal the batch portable-LSH pass over the same
    //      documents (the spec-pinned parity contract, now measured
    //      at corpus scale), its bucket state stays within
    //      bands x docs, and its candidate recall vs the EXACT pair
    //      graph is bucketed by true Jaccard — banding CAN miss on
    //      mutated cliques, so the S-curve is the honest number.
    val rawBase = SparkEntry.table(spark, baseDir, "documents")
    val mutCurDir = s"$workDir/mut_cur" // padded: quality gates stay in
    val mutNdDir = s"$workDir/mut_nd" // raw: near-dup structure intact
    (0 until batches).foreach { b =>
      val mutated = rawBase
        .withColumn("text",
          ScaleProof.mutateUdf(col("text"), col("doc_id"), lit(b)))
        .withColumn("doc_id", col("doc_id") + lit(b.toLong * off))
      mutated
        .withColumn("text", concat_ws(" ", col("text"), lit(pad)))
        .withColumn("ts", lit(t0).cast("timestamp") +
          expr(s"INTERVAL ${b * 5} MINUTES"))
        .coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append")
        .parquet(mutCurDir)
      mutated.coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append")
        .parquet(mutNdDir)
    }
    // (a) mutated curateStream
    val mcSchema = spark.read.parquet(mutCurDir).schema
    val mcStream = spark.readStream.schema(mcSchema)
      .option("maxFilesPerTrigger", "1").parquet(mutCurDir)
    val mcQ = Curation.curateStream(mcStream, "doc_id", "text",
        "ts", watermarkDelay = "12 minutes")
      .writeStream.format("noop")
      .option("checkpointLocation", s"$workDir/ckpt_mut")
      .trigger(Trigger.AvailableNow()).start()
    mcQ.awaitTermination()
    val mcRows = mcQ.recentProgress.toSeq
      .filter(p => p.numInputRows > 0 || p.stateOperators.nonEmpty)
      .zipWithIndex.flatMap { case (p, i) =>
        p.stateOperators.headOption.map(so =>
          (i, p.numInputRows, so.numRowsTotal, so.numRowsRemoved))
      }
    val mcPerBatch = rawBase.count()
    val mcMaxBytes = stateStats(mcQ)._2
    val mcMax = if (mcRows.isEmpty) 0L else mcRows.map(_._3).max
    // mutated fingerprints are DISTINCT, so steady state is a full
    // retention window of rows: 12min/5min delay-to-interval (2.4
    // batches) + the one-batch watermark lag (watermark derives from
    // the PREVIOUS batch's max event time) + commit-timing slack —
    // measured plateau is ~6 batches (ramp to b5, then removals track
    // inputs: 4992/3073/4099/4475/4702/4802/4898). Bound 7x per-batch
    // rows separates that plateau from a cumulative ramp (12x), and
    // expiry must actually be OBSERVED (removed > 0), not inferred.
    val mcBound = 7L * mcPerBatch
    val mcRemoved = mcRows.map(_._4).sum
    val mcFlat = mcMax > 0 && mcMax <= mcBound && mcRemoved > 0
    mcRows.foreach(r =>
      System.err.println(s"[streamproof] mutated-curate $r"))
    // (b) NearDupStream over the raw mutated batches
    import spark.implicits._
    import graft.streaming.NearDupStream
    // ONE implementation of the per-bucket occupancy scan (round-18
    // review: four near-verbatim signer→bandKeys→groupBy→max copies
    // can silently diverge): per bucket, member rows AND distinct
    // signature classes (the unit the contracted caps bound) from the
    // same (bkey, sig) pairs — the signature stringified injectively
    // so one row shape serves both signers. Returns
    // (buckets, maxOccupancy, maxClasses).
    def bucketOccupancy(docs: org.apache.spark.sql.DataFrame,
        keyed: String => Seq[(String, String)]): (Long, Long, Long) = {
      val r = docs
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .flatMap { case (_, t) => keyed(t) }
        .toDF("bkey", "sig")
        .groupBy("bkey")
        .agg(count(lit(1)).as("c"), count_distinct(col("sig")).as("k"))
        .agg(count(lit(1)).as("buckets"),
          coalesce(max(col("c")), lit(0L)).as("occ"),
          coalesce(max(col("k")), lit(0L)).as("classes"))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // the LSH wiring's own signer + banding (NearDupStream defaults)
    val lshKeys: String => Seq[(String, String)] = { t =>
      val s = graft.operators.Dedup.portableSignature(t, 3).toSeq
      NearDupStream.bandKeysFor(s, 4).map(k => (k, s.mkString(",")))
    }
    val ndSchema = spark.read.parquet(mutNdDir).schema
    val ndDocs = spark.readStream.schema(ndSchema)
      .option("maxFilesPerTrigger", "1").parquet(mutNdDir)
      .select(col("doc_id").as("id"), col("text"))
      .as[NearDupStream.StreamDoc]
    // Round 18: the PRODUCTION entry point at its own DERIVED cap
    // (the verdict's top item — the SimHash theorem extended to the
    // LSH tier): the caller states the corpus scale, classes ≤ docs
    // makes the derived cap untruncatable within it, and the
    // artifact records the measured class skew that a constant would
    // have had to survive.
    val ndExpectedDocs = mcPerBatch * batches
    val ndDerivedCap = NearDupStream.maxBucketFor(ndExpectedDocs)
    val ndQ = NearDupStream.nearDupPairsFor(ndDocs, ndExpectedDocs)(
        spark)
      .writeStream.format("memory").queryName("ndpairs")
      .option("checkpointLocation", s"$workDir/ckpt_nd")
      .trigger(Trigger.AvailableNow()).start()
    ndQ.awaitTermination()
    val (ndStateFinal, ndStateBytes) = stateStats(ndQ)
    val ndBound = 4L * mcPerBatch * batches // bands x docs admitted
    import org.apache.spark.storage.StorageLevel
    // markers (est_jaccard -1.0, round 17) are a disjoint channel:
    // count for the artifact, exclude from parity — the mutated
    // corpus's per-bucket class diversity sits under the cap, so any
    // marker is a lost-recall bug and throws below
    val ndRaw = spark.table("ndpairs")
    val ndOverflowMarkers = ndRaw.where(col("est_jaccard") < 0).count()
    val streamPairs = ndRaw
      .where(col("est_jaccard") >= 0)
      .select(col("id_old").as("id_a"), col("id_new").as("id_b"),
        col("est_jaccard"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val mutAll = spark.read.parquet(mutNdDir)
    // measured class skew on the MUTATED corpus (the diverse shape:
    // near-dup texts sign distinctly) via the wiring's own banding —
    // max distinct-signature classes per bucket, the unit the derived
    // cap bounds; recorded so derived_cap_would_truncate is a read,
    // not a claim, and so the old constant's margin is visible
    val (_, ndMaxOccupancy, ndMaxClasses) =
      bucketOccupancy(mutAll, lshKeys)
    val batchPairs = graft.operators.Dedup.minhashLshPairsPortable(
        mutAll, "doc_id", "text", n = 3, bands = 4)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nStream = streamPairs.count()
    val nBatch = batchPairs.count()
    val onlyStream = streamPairs.exceptAll(batchPairs).count()
    val onlyBatch = batchPairs.exceptAll(streamPairs).count()
    val parity = nStream == nBatch && onlyStream == 0 && onlyBatch == 0
    // recall vs the exact pair graph, bucketed by true Jaccard —
    // the SAME accounting as the batch/incremental tiers
    // (ScaleProof.recallJson), so the S-curves are comparable by
    // construction
    val exact = graft.operators.Dedup.jaccardPairs(
        mutAll, "doc_id", "text", n = 3, threshold = 0.2)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val recallFields = ScaleProof.recallJson(exact,
      streamPairs.select(col("id_a"), col("id_b"), lit(1).as("hit")))
    exact.unpersist(); streamPairs.unpersist(); batchPairs.unpersist()
    // drop each tier's memory-sink table once its analysis is done
    // (round 18): the memory sink holds every emitted pair ON THE
    // DRIVER, and seven tiers' sinks alive at once (the replica
    // tiers emit millions of rows) put the 8g default heap within
    // OOM range of the late tiers' LocalTableScan copies — measured
    // this round: the run died in exactly that copy before the drops
    spark.catalog.dropTempView("ndpairs")
    // ---- v3 (round 13): the streaming PassJoin fuzzy matcher over an
    // EDIT-mutated corpus — replica b's text gets ONE deterministic
    // character substitution inside q115's 24-char join window
    // (ScaleProof.editMutateUdf), so clique members are 1-2 edits
    // apart (inside tau=2) but never byte-identical: no census
    // contraction anywhere, the segment blocking itself carries both
    // the batch reference and the stream. Contracts: distinct
    // (id_a, id_b, dist) parity with EditDistanceJoin.selfJoin over
    // the same strings, and state bounded by the corpus's distinct
    // (block, role, id) entry count.
    import graft.streaming.EditDistanceStream
    val edBatches = math.min(batches, 6)
    val edDir = s"$workDir/mut_ed"
    (0 until edBatches).foreach { b =>
      rawBase
        .withColumn("text",
          ScaleProof.editMutateUdf(col("text"), col("doc_id"), lit(b)))
        .withColumn("doc_id", col("doc_id") + lit(b.toLong * off))
        .select(col("doc_id").as("id"),
          substring(col("text"), 1, 24).as("s"))
        .coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append")
        .parquet(edDir)
    }
    val edTau = 2
    // Round 18: the PRODUCTION entry point at its own DERIVED cap —
    // the stated corpus scale replaces the hand-measured 65536 the
    // proof used to carry (the corpus's hottest segment class — a
    // common 8-char prefix × replicas, edit-mutated so classes ≈
    // members — exceeded the old 256 default by design; classes ≤
    // docs bounds it without measuring anything first). The measured
    // occupancy below keeps the skew on record.
    val edExpectedDocs = mcPerBatch * edBatches
    val edDerivedCap = EditDistanceStream.maxBlockFor(edExpectedDocs)
    val edSchema = spark.read.parquet(edDir).schema
    val edStream = spark.readStream.schema(edSchema)
      .option("maxFilesPerTrigger", "1").parquet(edDir)
      .as[EditDistanceStream.StreamStr]
    val edQ = EditDistanceStream.editPairsFor(edStream, edTau,
        edExpectedDocs)(spark)
      .writeStream.format("memory").queryName("edpairs")
      .option("checkpointLocation", s"$workDir/ckpt_ed")
      .trigger(Trigger.AvailableNow()).start()
    edQ.awaitTermination()
    val (edStateFinal, edStateBytes) = stateStats(edQ)
    val edAll = spark.read.parquet(edDir)
    // ONE scan: the state-row bound (distinct (block, role, id)
    // entries) AND the per-role class occupancy the derived cap
    // bounds (max distinct strings per (block, role))
    val edOcc = edAll.as[EditDistanceStream.StreamStr]
      .flatMap(EditDistanceStream.entriesFor(_, edTau))
      .groupBy("bkey", "isIndex")
      .agg(count_distinct(col("id")).as("m"),
        count_distinct(col("s")).as("k"))
      .agg(coalesce(sum(col("m")), lit(0L)).as("entries"),
        coalesce(max(col("k")), lit(0L)).as("classes"))
      .head()
    val edEntryBound = edOcc.getLong(0)
    val edMaxClasses = edOcc.getLong(1)
    // markers (dist -1, round 17) are a disjoint channel: count for
    // the artifact, exclude from parity — at the stated proof cap
    // there must be none (thrown on below)
    val edRawTbl = spark.table("edpairs")
    val edOverflowMarkers = edRawTbl.where(col("dist") < 0).count()
    val edStreamPairs = edRawTbl.where(col("dist") >= 0).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edBatchPairs = graft.operators.EditDistanceJoin.selfJoin(
        edAll, "id", "s", edTau)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edNStream = edStreamPairs.count()
    val edNBatch = edBatchPairs.count()
    val edOnlyStream = edStreamPairs.exceptAll(edBatchPairs).count()
    val edOnlyBatch = edBatchPairs.exceptAll(edStreamPairs).count()
    val edParity = edNStream == edNBatch &&
      edOnlyStream == 0 && edOnlyBatch == 0
    edStreamPairs.unpersist(); edBatchPairs.unpersist()
    spark.catalog.dropTempView("edpairs")
    // ---- v4 (round 14): the streaming SimHash matcher over the SAME
    // token-substitution-mutated corpus as the LSH tier — replicas are
    // near-dups whose signatures differ in a few bits, the regime the
    // hamming radius exists for. Contracts (the family's standard
    // pair): distinct canonicalized (id, id, hamming) parity with
    // batch simhashPairs over the same documents, and state bounded
    // by the corpus's distinct (band, bucket) count.
    import graft.streaming.SimHashStream
    val shStream = spark.readStream.schema(ndSchema)
      .option("maxFilesPerTrigger", "1").parquet(mutNdDir)
      .select(col("doc_id").as("id"), col("text"))
      .as[SimHashStream.StreamDoc]
    val shMaxHamming = 7
    // Round 17: the proof runs the PRODUCTION entry point at its own
    // DERIVED cap on BOTH corpus shapes. This corpus is the hard one:
    // it concentrates ~28% of all docs into one band bucket whose
    // signatures are genuinely DISTINCT (near-dups sign differently —
    // measured: 12,618 distinct signatures among the hot bucket's
    // ~14k members), a shape no duplication contraction can absorb
    // and ~8× past the pre-round-17 uniform×8 occupancy model (which
    // this run's failure falsified — as did the v5 replica tier,
    // where real band skew beat uniform×8's own target shape by
    // 1,586 vs 1,568). maxBucketFor now derives the cap as the stated
    // corpus size itself, which distinct-signature classes cannot
    // exceed — so parity at the derived cap is the graded claim on
    // the diverse shape too, and the artifact's occupancy fields
    // (members, and distinct signature classes — the unit the
    // contracted state's cap bounds) document the measured skew that
    // killed every occupancy MODEL.
    val shDocCount = mutAll.count()
    val shDerivedCap = SimHashStream.maxBucketFor(shDocCount,
      shMaxHamming)
    val shQ = SimHashStream.hammingPairsFor(shStream, shDocCount,
      shMaxHamming)(spark)
      .writeStream.format("memory").queryName("shpairs")
      .option("checkpointLocation", s"$workDir/ckpt_sh")
      .trigger(Trigger.AvailableNow()).start()
    shQ.awaitTermination()
    val (shStateFinal, shStateBytes) = stateStats(shQ)
    // bound via the stream's OWN band enumeration (one implementation
    // — an inline re-derivation here would desync when the radius
    // changes the band width); the SAME enumeration also yields the
    // max per-bucket occupancy (round-14 advice: the artifact must
    // show how far the run sat above the production default cap of
    // 64, so `maxBucket` can be sized from data, not guessed)
    // ONE scan for all three occupancy numbers (review finding,
    // round 17 — the two-job form signed the corpus twice): per
    // bucket, member rows AND distinct signatures (the unit the
    // contracted state's cap bounds) from the same (bkey, sig) pairs
    // the SimHash wiring's own signer + radius-dependent banding
    val shKeys: String => Seq[(String, String)] = { t =>
      val s = graft.operators.Dedup.simhashSignature(t)
      SimHashStream.bandKeys(s, shMaxHamming).map(k => (k, s.toString))
    }
    val (shBucketBound, shMaxOccupancy, shMaxClasses) =
      bucketOccupancy(mutAll, shKeys)
    // overflow markers (hamming -1) are a disjoint channel: count them
    // for the artifact, exclude them from pair parity — at the proof
    // cap there must be none
    val shRaw = spark.table("shpairs")
    val shOverflowMarkers = shRaw.where(col("hamming") < 0).count()
    val shStreamPairs = shRaw
      .where(col("hamming") >= 0)
      .select(least(col("id_new"), col("id_old")).as("id_a"),
        greatest(col("id_new"), col("id_old")).as("id_b"),
        col("hamming"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val shBatchPairs = graft.operators.Dedup.simhashPairs(
        mutAll, "doc_id", "text", shMaxHamming)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val shNStream = shStreamPairs.count()
    val shNBatch = shBatchPairs.count()
    val shOnlyStream = shStreamPairs.exceptAll(shBatchPairs).count()
    val shOnlyBatch = shBatchPairs.exceptAll(shStreamPairs).count()
    val shParity = shNStream == shNBatch &&
      shOnlyStream == 0 && shOnlyBatch == 0
    shStreamPairs.unpersist(); shBatchPairs.unpersist()
    spark.catalog.dropTempView("shpairs")
    // ---- v5 (round 17): the REPLICA corpus — byte-identical replicas
    // of every document, the mass-duplication shape all batch emitters
    // contract — run through the PRODUCTION entry point at its own
    // DERIVED cap. This is the round-16 weak finding's closing proof:
    // the contracted bucket state is distinct-signature-bound, and a
    // replica corpus adds NO distinct signatures over its base — the
    // hot bucket that held 15,980 members under member-counted state
    // (the shape that truncated round 16's derived cap at ~8.6× over)
    // contracts to 1,586 classes. Historically this tier is also what
    // falsified the uniform×8 cap model: 1,586 measured classes vs
    // the model's 1,568 on the model's OWN target shape — real band
    // skew runs 8-81× past uniform, which is why maxBucketFor now
    // derives the cap from the stated corpus size instead of any
    // occupancy model. Contracts: exact pair parity with batch
    // simhashPairs (every clique member re-expands, cross-batch),
    // ZERO overflow markers at the derived cap, and measured class
    // occupancy under the cap — the last one thrown on, because
    // classes ≤ docs is the theorem the derivation rests on.
    val repDir = s"$workDir/rep_nd"
    (0 until batches).foreach { b =>
      rawBase
        .withColumn("doc_id", col("doc_id") + lit(b.toLong * off))
        .coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append")
        .parquet(repDir)
    }
    val repAll = spark.read.parquet(repDir)
    val repDocCount = repAll.count()
    val repDerivedCap = SimHashStream.maxBucketFor(repDocCount,
      shMaxHamming)
    val repStream = spark.readStream.schema(ndSchema)
      .option("maxFilesPerTrigger", "1").parquet(repDir)
      .select(col("doc_id").as("id"), col("text"))
      .as[SimHashStream.StreamDoc]
    val repQ = SimHashStream.hammingPairsFor(repStream, repDocCount,
      shMaxHamming)(spark)
      .writeStream.format("memory").queryName("reppairs")
      .option("checkpointLocation", s"$workDir/ckpt_rep")
      .trigger(Trigger.AvailableNow()).start()
    repQ.awaitTermination()
    val (repStateFinal, repStateBytes) = stateStats(repQ)
    val (repBucketBound, repMaxOccupancy, repMaxClasses) =
      bucketOccupancy(repAll, shKeys)
    val repRaw = spark.table("reppairs")
    val repOverflowMarkers = repRaw.where(col("hamming") < 0).count()
    val repStreamPairs = repRaw
      .where(col("hamming") >= 0)
      .select(least(col("id_new"), col("id_old")).as("id_a"),
        greatest(col("id_new"), col("id_old")).as("id_b"),
        col("hamming"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val repBatchPairs = graft.operators.Dedup.simhashPairs(
        repAll, "doc_id", "text", shMaxHamming)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val repNStream = repStreamPairs.count()
    val repNBatch = repBatchPairs.count()
    val repOnlyStream = repStreamPairs.exceptAll(repBatchPairs).count()
    val repOnlyBatch = repBatchPairs.exceptAll(repStreamPairs).count()
    val repParity = repNStream == repNBatch &&
      repOnlyStream == 0 && repOnlyBatch == 0
    repStreamPairs.unpersist(); repBatchPairs.unpersist()
    spark.catalog.dropTempView("reppairs")
    // ---- v6 (round 17; round 18 moved it to the production entry at
    // the DERIVED cap): NearDupStream over the SAME replica corpus —
    // the LSH tier's contraction proof. Byte-identical texts produce
    // byte-identical minhash signatures, so every replica clique is
    // ONE class per shared bucket: measured class occupancy must sit
    // at the BASE corpus's diversity (under the old 64 floor — the
    // thrown contraction claim) regardless of replication depth;
    // under the pre-round-17 member-counted state the 10-deep cliques
    // here would have silently saturated first-seen buckets (no
    // markers existed on this tier). Contracts: exact pair parity
    // with the batch portable-LSH pass, ZERO markers, class occupancy
    // under the floor, and state rows = the corpus's distinct
    // (band, bucket) count via the wiring's own bandKeysFor.
    val rnStream = spark.readStream.schema(ndSchema)
      .option("maxFilesPerTrigger", "1").parquet(repDir)
      .select(col("doc_id").as("id"), col("text"))
      .as[NearDupStream.StreamDoc]
    // production entry at the replica corpus's derived cap (round
    // 18); the graded claim stays the CONTRACTION one — measured
    // class occupancy must sit at the BASE corpus's diversity (under
    // the old 64 floor), because replicas add no distinct signatures
    val rnDerivedCap = NearDupStream.maxBucketFor(repDocCount)
    val rnQ = NearDupStream.nearDupPairsFor(rnStream, repDocCount)(
        spark)
      .writeStream.format("memory").queryName("rnpairs")
      .option("checkpointLocation", s"$workDir/ckpt_rn")
      .trigger(Trigger.AvailableNow()).start()
    rnQ.awaitTermination()
    val (rnStateFinal, rnStateBytes) = stateStats(rnQ)
    val (rnBucketBound, rnMaxOccupancy, rnMaxClasses) =
      bucketOccupancy(repAll, lshKeys)
    val rnRaw = spark.table("rnpairs")
    val rnOverflowMarkers = rnRaw.where(col("est_jaccard") < 0).count()
    val rnStreamPairs = rnRaw
      .where(col("est_jaccard") >= 0)
      .select(least(col("id_new"), col("id_old")).as("id_a"),
        greatest(col("id_new"), col("id_old")).as("id_b"),
        col("est_jaccard"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rnBatchPairs = graft.operators.Dedup.minhashLshPairsPortable(
        repAll, "doc_id", "text", n = 3, bands = 4)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("est_jaccard"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rnNStream = rnStreamPairs.count()
    val rnNBatch = rnBatchPairs.count()
    val rnOnlyStream = rnStreamPairs.exceptAll(rnBatchPairs).count()
    val rnOnlyBatch = rnBatchPairs.exceptAll(rnStreamPairs).count()
    val rnParity = rnNStream == rnNBatch &&
      rnOnlyStream == 0 && rnOnlyBatch == 0
    rnStreamPairs.unpersist(); rnBatchPairs.unpersist()
    spark.catalog.dropTempView("rnpairs")
    val v6 =
      s"""{"metric":"neardup_replica_stream_proof"""" +
        s""","state_store":"$stateStore"""" +
        s""","batches":$batches,"mutation":"none (exact replicas)"""" +
        s""","stream_pairs":$rnNStream,"batch_pairs":$rnNBatch""" +
        s""","only_stream":$rnOnlyStream,"only_batch":$rnOnlyBatch""" +
        s""","parity":$rnParity""" +
        s""","state_rows_final":$rnStateFinal""" +
        s""","state_bytes_final":$rnStateBytes""" +
        s""","state_bytes_per_doc":${perDoc(rnStateBytes,
          repDocCount)}""" +
        s""","state_bucket_bound":$rnBucketBound""" +
        s""","max_bucket_occupancy":$rnMaxOccupancy""" +
        s""","max_bucket_classes":$rnMaxClasses""" +
        s""","class_floor":${NearDupStream.MaxBucket}""" +
        s""","docs":$repDocCount,"derived_cap":$rnDerivedCap""" +
        s""","derived_cap_would_truncate":${
          rnMaxClasses > rnDerivedCap}""" +
        s""","overflow_markers":$rnOverflowMarkers}"""
    System.err.println("[streamproof] " + v6)
    // ---- v7 (round 17; round 18 moved it to the production entry at
    // the DERIVED cap): EditDistanceStream over a byte-identical
    // replica corpus — the PassJoin tier's contraction proof in its
    // cleanest form: under the pre-round-17 member-counted state, any
    // cap independent of replication depth eventually truncates
    // (6-deep replicas of a 4-deep base prefix class = 24 members);
    // under class-contracted state, replication adds NO distinct
    // strings, so measured replica class occupancy must EQUAL the
    // base corpus's bound (still measured, now as the thrown
    // contraction assertion rather than the cap source). Contracts:
    // exact pair parity with batch selfJoin (whose census contraction
    // handles the cliques on its side), ZERO markers, and replica
    // class occupancy equal to the base bound.
    val edRepDir = s"$workDir/rep_ed"
    (0 until edBatches).foreach { b =>
      rawBase
        .withColumn("doc_id", col("doc_id") + lit(b.toLong * off))
        .select(col("doc_id").as("id"),
          substring(col("text"), 1, 24).as("s"))
        .coalesce(1)
        .write.mode(if (b == 0) "overwrite" else "append")
        .parquet(edRepDir)
    }
    val edRepAll = spark.read.parquet(edRepDir)
    val edBaseClasses = rawBase
      .select(col("doc_id").as("id"),
        substring(col("text"), 1, 24).as("s"))
      .as[EditDistanceStream.StreamStr]
      .flatMap(EditDistanceStream.entriesFor(_, edTau))
      .select(col("bkey"), col("isIndex"), col("s")).distinct()
      .groupBy("bkey", "isIndex").agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L))).head().getLong(0)
    // production entry at the replica corpus's derived cap (round 18
    // — the pre-round-18 form hand-sized the cap from a base-corpus
    // scan; stating the scale replaces the scan). The contraction
    // claim survives as the measured assertion below: replica class
    // occupancy must EQUAL the base bound, because replication adds
    // no distinct strings.
    val edRepDocCount = mcPerBatch * edBatches
    val edRepCap = EditDistanceStream.maxBlockFor(edRepDocCount)
    val edRepStream = spark.readStream.schema(edSchema)
      .option("maxFilesPerTrigger", "1").parquet(edRepDir)
      .as[EditDistanceStream.StreamStr]
    val erQ = EditDistanceStream.editPairsFor(edRepStream, edTau,
        edRepDocCount)(spark)
      .writeStream.format("memory").queryName("erpairs")
      .option("checkpointLocation", s"$workDir/ckpt_er")
      .trigger(Trigger.AvailableNow()).start()
    erQ.awaitTermination()
    val (erStateFinal, erStateBytes) = stateStats(erQ)
    // ONE scan for blocks + per-role member/class maxima (the same
    // review finding as the SimHash occupancy jobs)
    val erOcc = edRepAll.as[EditDistanceStream.StreamStr]
      .flatMap(EditDistanceStream.entriesFor(_, edTau))
      .groupBy("bkey", "isIndex")
      .agg(count_distinct(col("id")).as("m"),
        count_distinct(col("s")).as("k"))
      .agg(count_distinct(col("bkey")).as("blocks"),
        max(col("m")).as("members"), max(col("k")).as("classes"))
      .head()
    val erBlockBound = erOcc.getLong(0)
    val erMaxMembers = erOcc.getLong(1)
    val erMaxClasses = erOcc.getLong(2)
    val erRaw = spark.table("erpairs")
    val erOverflowMarkers = erRaw.where(col("dist") < 0).count()
    val erStreamPairs = erRaw.where(col("dist") >= 0).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val erBatchPairs = graft.operators.EditDistanceJoin.selfJoin(
        edRepAll, "id", "s", edTau)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val erNStream = erStreamPairs.count()
    val erNBatch = erBatchPairs.count()
    val erOnlyStream = erStreamPairs.exceptAll(erBatchPairs).count()
    val erOnlyBatch = erBatchPairs.exceptAll(erStreamPairs).count()
    val erParity = erNStream == erNBatch &&
      erOnlyStream == 0 && erOnlyBatch == 0
    erStreamPairs.unpersist(); erBatchPairs.unpersist()
    spark.catalog.dropTempView("erpairs")
    val v7 =
      s"""{"metric":"editdist_replica_stream_proof"""" +
        s""","state_store":"$stateStore"""" +
        s""","batches":$edBatches""" +
        s""","mutation":"none (exact replicas)","tau":$edTau""" +
        s""","stream_pairs":$erNStream,"batch_pairs":$erNBatch""" +
        s""","only_stream":$erOnlyStream,"only_batch":$erOnlyBatch""" +
        s""","parity":$erParity""" +
        s""","state_rows_final":$erStateFinal""" +
        s""","state_bytes_final":$erStateBytes""" +
        s""","state_bytes_per_doc":${perDoc(erStateBytes,
          edRepDocCount)}""" +
        s""","state_block_bound":$erBlockBound""" +
        s""","max_role_members":$erMaxMembers""" +
        s""","max_role_classes":$erMaxClasses""" +
        s""","base_class_bound":$edBaseClasses""" +
        s""","docs":$edRepDocCount,"derived_cap":$edRepCap""" +
        s""","derived_cap_would_truncate":${
          erMaxClasses > edRepCap}""" +
        s""","overflow_markers":$erOverflowMarkers}"""
    System.err.println("[streamproof] " + v7)
    val v5 =
      s"""{"metric":"simhash_replica_stream_proof"""" +
        s""","state_store":"$stateStore"""" +
        s""","batches":$batches,"mutation":"none (exact replicas)"""" +
        s""","max_hamming":$shMaxHamming""" +
        s""","stream_pairs":$repNStream,"batch_pairs":$repNBatch""" +
        s""","only_stream":$repOnlyStream,"only_batch":$repOnlyBatch""" +
        s""","parity":$repParity""" +
        s""","state_rows_final":$repStateFinal""" +
        s""","state_bytes_final":$repStateBytes""" +
        s""","state_bytes_per_doc":${perDoc(repStateBytes,
          repDocCount)}""" +
        s""","state_bucket_bound":$repBucketBound""" +
        s""","max_bucket_occupancy":$repMaxOccupancy""" +
        s""","max_bucket_classes":$repMaxClasses""" +
        s""","docs":$repDocCount,"derived_cap":$repDerivedCap""" +
        s""","derived_cap_would_truncate":${
          repMaxClasses > repDerivedCap}""" +
        s""","overflow_markers":$repOverflowMarkers}"""
    System.err.println("[streamproof] " + v5)
    val v4 =
      s"""{"metric":"simhash_stream_proof","batches":$batches""" +
        s""","state_store":"$stateStore"""" +
        s""","mutation":"2% per replica index"""" +
        s""","max_hamming":$shMaxHamming""" +
        s""","stream_pairs":$shNStream,"batch_pairs":$shNBatch""" +
        s""","only_stream":$shOnlyStream,"only_batch":$shOnlyBatch""" +
        s""","parity":$shParity""" +
        s""","state_rows_final":$shStateFinal""" +
        s""","state_bytes_final":$shStateBytes""" +
        s""","state_bytes_per_doc":${perDoc(shStateBytes,
          shDocCount)}""" +
        s""","state_bucket_bound":$shBucketBound""" +
        s""","max_bucket_occupancy":$shMaxOccupancy""" +
        s""","max_bucket_classes":$shMaxClasses""" +
        s""","cap_floor":${SimHashStream.MaxBucket}""" +
        s""","docs":$shDocCount,"derived_cap":$shDerivedCap""" +
        s""","derived_cap_would_truncate":${
          shMaxClasses > shDerivedCap}""" +
        s""","overflow_markers":$shOverflowMarkers}"""
    System.err.println("[streamproof] " + v4)
    val v3 =
      s"""{"metric":"editdist_stream_proof","batches":$edBatches""" +
        s""","state_store":"$stateStore"""" +
        s""","mutation":"1 char per replica inside the join window"""" +
        s""","tau":$edTau""" +
        s""","stream_pairs":$edNStream,"batch_pairs":$edNBatch""" +
        s""","only_stream":$edOnlyStream,"only_batch":$edOnlyBatch""" +
        s""","parity":$edParity""" +
        s""","state_rows_final":$edStateFinal""" +
        s""","state_bytes_final":$edStateBytes""" +
        s""","state_bytes_per_doc":${perDoc(edStateBytes,
          edExpectedDocs)}""" +
        s""","state_entry_bound":$edEntryBound""" +
        s""","max_role_classes":$edMaxClasses""" +
        s""","class_floor":${EditDistanceStream.MaxBlock}""" +
        s""","docs":$edExpectedDocs,"derived_cap":$edDerivedCap""" +
        s""","derived_cap_would_truncate":${
          edMaxClasses > edDerivedCap}""" +
        s""","overflow_markers":$edOverflowMarkers}"""
    System.err.println("[streamproof] " + v3)
    val v2 =
      s"""{"metric":"neardup_stream_proof","batches":$batches""" +
        s""","state_store":"$stateStore"""" +
        s""","mutation":"2% per replica index"""" +
        s""","mutated_curate_max_state":$mcMax""" +
        s""","mutated_curate_max_state_bytes":$mcMaxBytes""" +
        s""","mutated_curate_bound":$mcBound""" +
        s""","mutated_curate_flat":$mcFlat""" +
        s""","stream_pairs":$nStream,"batch_pairs":$nBatch""" +
        s""","only_stream":$onlyStream,"only_batch":$onlyBatch""" +
        s""","parity":$parity""" +
        s""","nd_state_rows_final":$ndStateFinal""" +
        s""","nd_state_bytes_final":$ndStateBytes""" +
        s""","nd_state_bytes_per_doc":${perDoc(ndStateBytes,
          ndExpectedDocs)}""" +
        s""","nd_state_bound":$ndBound""" +
        s""","nd_max_bucket_occupancy":$ndMaxOccupancy""" +
        s""","nd_max_bucket_classes":$ndMaxClasses""" +
        s""","nd_class_floor":${NearDupStream.MaxBucket}""" +
        s""","nd_docs":$ndExpectedDocs""" +
        s""","nd_derived_cap":$ndDerivedCap""" +
        s""","nd_derived_cap_would_truncate":${
          ndMaxClasses > ndDerivedCap}""" +
        s""","nd_overflow_markers":$ndOverflowMarkers""" +
        s""",$recallFields}"""
    System.err.println("[streamproof] " + v2)
    val body2 = (lines ++ Seq(summary, v2, v3, v4, v5, v6, v7))
      .mkString("[", ",\n", "]")
    val out = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT",
      "stream_proof.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (body2 + "\n").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"[streamproof] write failed: $e") }
    spark.stop()
    if (!(maxState <= bound && maxState > 0))
      throw new IllegalStateException(
        s"state not flat: max $maxState vs bound $bound")
    if (!mcFlat)
      throw new IllegalStateException(
        s"mutated-curate state not flat: max $mcMax vs bound $mcBound")
    if (!parity)
      throw new IllegalStateException(
        s"stream/batch LSH parity broken: $nStream vs $nBatch " +
          s"(+$onlyStream/-$onlyBatch)")
    // enforce the near-dup state bound the artifact records — the
    // other three contracts all throw, and a retention regression
    // (state ramping cumulatively past bands x admitted docs) must
    // fail the proof loudly, not just skew a JSON field
    if (!(ndStateFinal <= ndBound && ndStateFinal > 0L))
      throw new IllegalStateException(
        s"near-dup state out of bounds: final $ndStateFinal vs " +
          s"bound $ndBound")
    if (!edParity)
      throw new IllegalStateException(
        s"edit-distance stream/batch parity broken: $edNStream vs " +
          s"$edNBatch (+$edOnlyStream/-$edOnlyBatch)")
    if (!(edStateFinal > 0L && edStateFinal <= edEntryBound))
      throw new IllegalStateException(
        s"edit-distance stream state out of bounds: $edStateFinal " +
          s"vs $edEntryBound")
    if (!shParity)
      throw new IllegalStateException(
        s"simhash stream/batch parity broken: $shNStream vs " +
          s"$shNBatch (+$shOnlyStream/-$shOnlyBatch)")
    if (!(shStateFinal > 0L && shStateFinal <= shBucketBound))
      throw new IllegalStateException(
        s"simhash stream state out of bounds: $shStateFinal vs " +
          s"$shBucketBound")
    // the run executes at the production-DERIVED cap (round 17),
    // which classes-≤-docs guarantees can't truncate within stated
    // scale — a marker means that theorem (or the contraction) broke
    if (shOverflowMarkers != 0L)
      throw new IllegalStateException(
        s"simhash proof run truncated buckets: $shOverflowMarkers " +
          s"overflow markers at derived cap $shDerivedCap")
    if (shMaxClasses > shDerivedCap)
      throw new IllegalStateException(
        s"derived cap $shDerivedCap under measured class occupancy " +
          s"$shMaxClasses — classes exceeded the stated corpus size")
    // v5 replica-corpus contracts (round 17): parity at the DERIVED
    // cap, zero markers, and class occupancy under the cap — replicas
    // add no distinct signatures, so all three throw
    if (!repParity)
      throw new IllegalStateException(
        s"replica simhash stream/batch parity broken: $repNStream vs " +
          s"$repNBatch (+$repOnlyStream/-$repOnlyBatch)")
    if (repOverflowMarkers != 0L)
      throw new IllegalStateException(
        s"replica run truncated at the DERIVED cap $repDerivedCap: " +
          s"$repOverflowMarkers overflow markers")
    if (repMaxClasses > repDerivedCap)
      throw new IllegalStateException(
        s"derived cap $repDerivedCap under measured class occupancy " +
          s"$repMaxClasses on the replica corpus — contraction failed " +
          s"to absorb byte-identical replicas")
    if (!(repStateFinal > 0L && repStateFinal <= repBucketBound))
      throw new IllegalStateException(
        s"replica simhash stream state out of bounds: $repStateFinal " +
          s"vs $repBucketBound")
    // v2 mutated LSH tier (round 18): the run executes the production
    // entry at its DERIVED cap, which classes-≤-docs guarantees can't
    // truncate within stated scale — a marker means the theorem (or
    // the contraction) broke, and the measured class occupancy must
    // sit under the derivation
    if (ndOverflowMarkers != 0L)
      throw new IllegalStateException(
        s"mutated near-dup run truncated buckets: $ndOverflowMarkers " +
          s"overflow markers at derived cap $ndDerivedCap")
    if (ndMaxClasses > ndDerivedCap)
      throw new IllegalStateException(
        s"derived cap $ndDerivedCap under measured class occupancy " +
          s"$ndMaxClasses — classes exceeded the stated corpus size")
    // v6 replica LSH contracts (round 17): parity at the default
    // class cap, zero markers, class occupancy under the cap (the
    // contraction claim — replicas add no distinct signatures), and
    // state rows = the corpus's bucket count
    if (!rnParity)
      throw new IllegalStateException(
        s"replica near-dup stream/batch parity broken: $rnNStream " +
          s"vs $rnNBatch (+$rnOnlyStream/-$rnOnlyBatch)")
    if (rnOverflowMarkers != 0L)
      throw new IllegalStateException(
        s"replica near-dup run truncated at derived cap " +
          s"$rnDerivedCap: $rnOverflowMarkers markers")
    if (rnMaxClasses > NearDupStream.MaxBucket)
      throw new IllegalStateException(
        s"replica class occupancy $rnMaxClasses exceeds the " +
          s"${NearDupStream.MaxBucket} floor — contraction failed " +
          s"to absorb byte-identical replicas (replicas added " +
          s"distinct signatures)")
    if (!(rnStateFinal > 0L && rnStateFinal <= rnBucketBound))
      throw new IllegalStateException(
        s"replica near-dup stream state out of bounds: $rnStateFinal " +
          s"vs $rnBucketBound")
    // v3 edit-mutated tier (round 18): derived cap, same theorem —
    // markers or measured classes past the derivation both throw
    if (edOverflowMarkers != 0L)
      throw new IllegalStateException(
        s"edit-distance proof run truncated blocks: " +
          s"$edOverflowMarkers overflow markers at derived cap " +
          s"$edDerivedCap")
    if (edMaxClasses > edDerivedCap)
      throw new IllegalStateException(
        s"derived cap $edDerivedCap under measured class occupancy " +
          s"$edMaxClasses — classes exceeded the stated corpus size")
    // v7 replica PassJoin contracts (round 17): parity at a cap sized
    // from the BASE corpus alone, zero markers, and replica class
    // occupancy equal to the base bound (replication adds no classes)
    if (!erParity)
      throw new IllegalStateException(
        s"replica edit-distance stream/batch parity broken: " +
          s"$erNStream vs $erNBatch (+$erOnlyStream/-$erOnlyBatch)")
    if (erOverflowMarkers != 0L)
      throw new IllegalStateException(
        s"replica edit-distance run truncated at base-sized cap " +
          s"$edRepCap: $erOverflowMarkers markers")
    if (erMaxClasses > edBaseClasses)
      throw new IllegalStateException(
        s"replica class occupancy $erMaxClasses exceeds the base " +
          s"bound $edBaseClasses — contraction failed to absorb " +
          s"byte-identical replicas")
    if (!(erStateFinal > 0L && erStateFinal <= erBlockBound))
      throw new IllegalStateException(
        s"replica edit-distance stream state out of bounds: " +
          s"$erStateFinal vs $erBlockBound")
  }
}
