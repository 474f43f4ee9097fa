package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{Merge, TxnLog}

/** Transaction-log table format: snapshot isolation + atomic commits for
  * the reference's delete-then-insert sinks (SURVEY S18/R9). */
class TxnLogSpec extends SparkSuite {

  private def tmpTable(): String = {
    val d = Files.createTempDirectory("txnlog").toFile
    d.deleteOnExit()
    new File(d, "t").getAbsolutePath
  }

  test("append then read round-trips; versions advance") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    val v0 = TxnLog.append(s, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id")
    val v1 = TxnLog.append(s, dir, Seq((3L, "c")).toDF("id", "v"), "id")
    assert(v0 === 0L && v1 === 1L)
    val rows = TxnLog.read(s, dir).get.orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(rows === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(TxnLog.read(s, "/nonexistent/table").isEmpty)
  }

  test("the whole log walks through the Hadoop FS API: a file:-scheme " +
      "table (invisible to java.io.File probes) commits, merges, " +
      "checkpoints, time-travels and vacuums") {
    val s = initSpark()
    import s.implicits._
    val dir = "file://" + tmpTable()
    assert(!new File(dir).exists(),
      "precondition: the scheme'd URI defeats java.io.File")
    val v0 = TxnLog.append(s, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id")
    assert(v0 === 0L)
    TxnLog.replaceByKey(s, dir, Seq((2L, "B")).toDF("id", "v"), "id")
    assert(TxnLog.read(s, dir).get.orderBy("id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "B")))
    // time travel + checkpoint + vacuum all route through the same FS
    assert(TxnLog.read(s, dir, asOf = Some(0L)).get.orderBy("id")
      .as[(Long, String)].collect().toSeq === Seq((1L, "a"), (2L, "b")))
    assert(TxnLog.checkpoint(dir) === 1L)
    assert(TxnLog.vacuum(dir, minAgeMs = 0L) >= 1)
    assert(TxnLog.read(s, dir).get.count() === 2L)
  }

  test("claim on a NON-local FileSystem takes the fail-if-exists rename " +
      "path: first writer wins, loser's bytes never surface; unknown " +
      "schemes are REFUSED rather than assumed rename-atomic") {
    // a RawLocalFileSystem masquerading under another scheme exercises
    // the non-POSIX branch of the claim (rename, not hard link) — the
    // HDFS code path, minus HDFS's stronger rename atomicity (class doc)
    initSpark().conf.set("graft.txnlog.renameSafeSchemes",
      "hdfs,viewfs,webhdfs,mockdfs")
    val fs = new org.apache.hadoop.fs.RawLocalFileSystem() {
      override def getScheme: String = "mockdfs"
    }
    fs.initialize(java.net.URI.create("file:///"),
      new org.apache.hadoop.conf.Configuration())
    val d = Files.createTempDirectory("claim").toString
    val target = new org.apache.hadoop.fs.Path(s"$d/v1.json")
    def stage(name: String, content: String) = {
      val p = new org.apache.hadoop.fs.Path(s"$d/$name")
      val out = fs.create(p, true)
      out.write(content.getBytes("UTF-8")); out.close()
      p
    }
    val w1 = stage("w1.tmp", "winner")
    val w2 = stage("w2.tmp", "loser")
    assert(TxnLog.claim(fs, w1, target), "first claim wins")
    assert(!TxnLog.claim(fs, w2, target), "second claim must lose")
    val in = fs.open(target)
    val got = try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
    assert(got === "winner")
    // an un-whitelisted scheme must refuse loudly, not guess: a silent
    // overwrite-rename would let two racing writers both "win"
    initSpark().conf.unset("graft.txnlog.renameSafeSchemes")
    val w3 = stage("w3.tmp", "other")
    intercept[UnsupportedOperationException] {
      TxnLog.claim(fs, w3, new org.apache.hadoop.fs.Path(s"$d/v2.json"))
    }
  }

  test("replaceByKey matches the pure replaceByKeyDf semantics") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v")
    val repl = Seq((2L, "B1"), (2L, "B2"), (5L, "E")).toDF("id", "v")
    TxnLog.append(s, dir, base, "id")
    TxnLog.replaceByKey(s, dir, repl, "id")
    val got = TxnLog.read(s, dir).get.orderBy("id", "v")
      .as[(Long, String)].collect().toSeq
    val oracle = Merge.replaceByKeyDf(base, repl, "id")
      .orderBy("id", "v").as[(Long, String)].collect().toSeq
    assert(got === oracle)
    assert(got === Seq((1L, "a"), (2L, "B1"), (2L, "B2"), (3L, "c"),
      (4L, "d"), (5L, "E")))
  }

  test("key-range stats prune disjoint files: untouched files survive " +
      "byte-identical (never read, never rewritten)") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    // two appends with disjoint id ranges -> separate files with
    // separate [min,max] stats
    TxnLog.append(s, dir,
      (1L to 100L).map(i => (i, s"low$i")).toDF("id", "v")
        .coalesce(1), "id")
    TxnLog.append(s, dir,
      (1000L to 1100L).map(i => (i, s"high$i")).toDF("id", "v")
        .coalesce(1), "id")
    val before = TxnLog.snapshot(dir).map(_.path).toSet
    // replacement hits only the low range
    TxnLog.replaceByKey(s, dir,
      Seq((50L, "LOW50")).toDF("id", "v"), "id")
    val after = TxnLog.snapshot(dir).map(_.path).toSet
    val lowFiles = before.filterNot(after.contains)
    val keptFiles = before.intersect(after)
    assert(lowFiles.nonEmpty, "low-range file must be rewritten")
    assert(keptFiles.nonEmpty, "high-range file must be kept verbatim")
    // and the data is right
    val d = TxnLog.read(s, dir).get
    assert(d.where(col("id") === 50L).select("v").head().getString(0)
      === "LOW50")
    assert(d.count() === 201L)
  }

  test("time travel: old versions keep reading the pre-merge state") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    val v0 = TxnLog.append(s, dir, Seq((1L, "old")).toDF("id", "v"), "id")
    TxnLog.replaceByKey(s, dir, Seq((1L, "new")).toDF("id", "v"), "id")
    assert(TxnLog.read(s, dir, asOf = Some(v0)).get
      .select("v").head().getString(0) === "old")
    assert(TxnLog.read(s, dir).get
      .select("v").head().getString(0) === "new")
  }

  test("a stray temp file (crash before rename) does not corrupt the " +
      "table; a corrupt committed line does fail loudly") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    TxnLog.append(s, dir, Seq((1L, "a")).toDF("id", "v"), "id")
    // crash simulation: temp commit file left behind
    Files.write(new File(dir, "_graft_log/.commit-orphan.tmp").toPath,
      "{\"add\":{}}".getBytes)
    assert(TxnLog.read(s, dir).get.count() === 1L)
    // corruption of a COMMITTED version must not be silently skipped
    Files.write(new File(dir, f"_graft_log/v${1L}%020d.json").toPath,
      "garbage".getBytes)
    intercept[IllegalStateException] { TxnLog.snapshot(dir) }
  }

  test("conflict: merge aborts when a concurrent commit replaced a file " +
      "it read") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    TxnLog.append(s, dir, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "id")
    val stale = TxnLog.snapshot(dir)
    // concurrent writer replaces key 1 (removes the original file)
    TxnLog.replaceByKey(s, dir, Seq((1L, "A2")).toDF("id", "v"), "id")
    // our merge computed survivors from the stale snapshot: committing a
    // remove of a no-longer-active file must abort
    val adds = Seq.empty[TxnLog.AddFile]
    intercept[IllegalStateException] {
      TxnLog.commit(dir, adds, stale.map(_.path), validate = fresh => {
        val freshPaths = fresh.map(_.path).toSet
        val missing = stale.map(_.path).filterNot(freshPaths.contains)
        if (missing.nonEmpty)
          throw new IllegalStateException("txn conflict")
      })
    }
  }

  test("concurrent appends all land (optimistic version retry)") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    TxnLog.append(s, dir, Seq((0L, "seed")).toDF("id", "v"), "id")
    val threads = (1 to 4).map { i =>
      new Thread(() => {
        TxnLog.append(s, dir,
          Seq((i.toLong * 10, s"t$i")).toDF("id", "v"), "id")
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(TxnLog.read(s, dir).get.count() === 5L)
    assert(TxnLog.versions(dir).size === 5)
  }

  test("STRESS racing replaceByKey writers: every version has exactly " +
      "one author, conflicted losers retry to convergence, no key is " +
      "lost or duplicated") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    // seed: keys 0..19 in one file so every merge overlaps every other
    TxnLog.append(s, dir,
      (0L until 20L).map(k => (k, "seed")).toDF("id", "v").coalesce(1),
      "id")
    val opsPerWriter = 4
    val conflicts = new java.util.concurrent.atomic.AtomicInteger(0)
    val failures =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def writer(tag: String): Thread = new Thread(() => {
      try {
        (1 to opsPerWriter).foreach { op =>
          // each op rewrites an overlapping 12-key window with a
          // writer+op tagged value
          val lo = if (tag == "w1") 0L else 8L
          val rep = (lo until lo + 12L).map(k => (k, s"$tag-op$op"))
            .toDF("id", "v")
          var done = false
          var tries = 0
          while (!done) {
            tries += 1
            assert(tries <= 25, s"$tag op$op did not converge")
            try { TxnLog.replaceByKey(s, dir, rep, "id"); done = true }
            catch {
              case e: IllegalStateException
                  if e.getMessage.contains("txn conflict") =>
                conflicts.incrementAndGet() // lost the race; retry
            }
          }
        }
      } catch { case t: Throwable => failures.add(t) }
    })
    val ts = Seq(writer("w1"), writer("w2"))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(failures.isEmpty, s"writer died: ${failures.peek()}")
    // exactly one author per version: the log is contiguous and every
    // replaceByKey that reported success got its own version
    val vs = TxnLog.versions(dir)
    assert(vs === (0L to vs.max).toSeq, "version sequence must be gapless")
    assert(vs.size === 1 + 2 * opsPerWriter,
      "every successful merge must own exactly one version")
    // no key lost, none duplicated; contended keys hold a tagged value
    val rows = TxnLog.read(s, dir).get.as[(Long, String)].collect()
    assert(rows.map(_._1).sorted === (0L until 20L).toArray)
    val byKey = rows.toMap
    (8L until 12L).foreach { k => // contended window: both writers wrote
      assert(byKey(k).startsWith("w1-op") || byKey(k).startsWith("w2-op"))
    }
    // final state is a consistent replay: keys 12..19 belong to w2 only,
    // 0..7 to w1 only (or seed if never committed last — impossible:
    // both ranges were rewritten every op)
    (0L until 8L).foreach(k => assert(byKey(k) === s"w1-op$opsPerWriter"))
    (12L until 20L).foreach(k => assert(byKey(k) === s"w2-op$opsPerWriter"))
  }

  test("vacuum honors the retention window: a reader pinned inside it " +
      "keeps working after vacuum; only versions beyond it lose files") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    TxnLog.append(s, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), "id")
    TxnLog.replaceByKey(s, dir, Seq((1L, "A")).toDF("id", "v"), "id")
    TxnLog.replaceByKey(s, dir, Seq((2L, "B")).toDF("id", "v"), "id")
    // retain 2 versions back: v0's files stay referenced by the window,
    // so the pinned reader is safe even with the age grace disabled
    assert(TxnLog.vacuum(dir, retainVersions = 2, minAgeMs = 0L) === 0)
    val pinned = TxnLog.read(s, dir, asOf = Some(0L)).get
      .as[(Long, String)].collect().toSeq.sorted
    assert(pinned === Seq((1L, "a"), (2L, "b")),
      "reader pinned inside the retention window must survive vacuum")
    // shrink the window: v0-only files become deletable, latest intact
    assert(TxnLog.vacuum(dir, retainVersions = 0, minAgeMs = 0L) >= 1)
    val latest = TxnLog.read(s, dir).get
      .as[(Long, String)].collect().toSeq.sorted
    assert(latest === Seq((1L, "A"), (2L, "B")))
  }

  test("vacuum deletes files unreferenced by the latest snapshot and " +
      "keeps the active ones") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    TxnLog.append(s, dir,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), "id")
    TxnLog.replaceByKey(s, dir, Seq((1L, "A")).toDF("id", "v"), "id")
    // default grace window spares young files (in-flight-commit guard)
    assert(TxnLog.vacuum(dir) === 0)
    val deleted = TxnLog.vacuum(dir, minAgeMs = 0L)
    assert(deleted >= 1, "the pre-merge file must be physically deleted")
    val rows = TxnLog.read(s, dir).get.orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(rows === Seq((1L, "A"), (2L, "b")))
  }

  test("checkpoint bounds replay: snapshots equal the full-replay " +
      "result, pre-checkpoint time travel still works") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    (0 until 6).foreach { i =>
      TxnLog.replaceByKey(s, dir,
        Seq((i.toLong % 3, s"v$i")).toDF("id", "v"), "id")
    }
    val fullReplay = TxnLog.snapshot(dir).map(f => f.path -> f.rows).toMap
    val cv = TxnLog.checkpoint(dir)
    assert(cv === 5L)
    // post-checkpoint snapshot identical to the pure-replay result
    assert(TxnLog.snapshot(dir).map(f => f.path -> f.rows).toMap
      === fullReplay)
    // further commits replay on top of the checkpoint
    TxnLog.replaceByKey(s, dir, Seq((0L, "final")).toDF("id", "v"), "id")
    val rows = TxnLog.read(s, dir).get.orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(rows === Seq((0L, "final"), (1L, "v4"), (2L, "v5")))
    // time travel BEFORE the checkpoint ignores it
    assert(TxnLog.read(s, dir, asOf = Some(0L)).get
      .as[(Long, String)].collect().toSeq === Seq((0L, "v0")))
    // checkpointing twice is idempotent
    assert(TxnLog.checkpoint(dir, Some(5L)) === 5L)
  }

  test("optimize compacts small files range-clustered: data unchanged, " +
      "fewer files, merges prune better afterwards") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    // 6 tiny appends with interleaved keys -> 6+ files, each spanning
    // the whole key range (worst case for pruning)
    (0 until 6).foreach { i =>
      TxnLog.append(s, dir,
        Seq((i.toLong, s"a$i"), (100L + i, s"b$i"), (200L + i, s"c$i"))
          .toDF("id", "v").coalesce(1), "id")
    }
    val before = TxnLog.snapshot(dir)
    assert(before.size >= 6)
    // pre-optimize: a key-50 merge overlaps EVERY file
    assert(before.forall(f =>
      f.minKey <= TxnLog.statKey(50L) && f.maxKey >= TxnLog.statKey(50L)))

    val v = TxnLog.optimize(s, dir, "id", smallThresholdRows = 100,
      targetRowsPerFile = 6)
    val after = TxnLog.snapshot(dir)
    assert(after.size < before.size)
    val rows = TxnLog.read(s, dir).get.orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(rows.size === 18 && rows.map(_._1) === rows.map(_._1).sorted)
    // post-optimize: clustered ranges — at least one file excludes 50
    assert(after.exists(f =>
      f.minKey > TxnLog.statKey(50L) || f.maxKey < TxnLog.statKey(50L)),
      s"expected disjoint ranges, got ${after.map(f => (f.minKey, f.maxKey))}")
    // idempotent no-op when nothing is small
    assert(TxnLog.optimize(s, dir, "id", smallThresholdRows = 1) === v)
  }

  test("hostile string keys (newline/quote/backslash) survive the log " +
      "round-trip and merge correctly") {
    val s = initSpark()
    import s.implicits._
    val dir = tmpTable()
    val k1 = "line\nbreak"
    val k2 = "quo\"te\\slash"
    TxnLog.append(s, dir,
      Seq((k1, "v1"), (k2, "v1"), ("plain", "v1")).toDF("id", "v"), "id")
    // log stays parseable and stats round-trip exactly
    val snap = TxnLog.snapshot(dir)
    assert(snap.nonEmpty)
    TxnLog.replaceByKey(s, dir, Seq((k1, "v2")).toDF("id", "v"), "id")
    val rows = TxnLog.read(s, dir).get.orderBy("id")
      .as[(String, String)].collect().toMap
    assert(rows(k1) === "v2" && rows(k2) === "v1" && rows("plain") === "v1")
    assert(rows.size === 3, "replaced key must not duplicate")
  }

  test("statKey is order-preserving for longs incl. negatives") {
    val vals = Seq(Long.MinValue, -1000L, -1L, 0L, 1L, 42L, Long.MaxValue)
    val mapped = vals.map(v => TxnLog.statKey(v))
    assert(mapped === mapped.sorted)
  }
}
