package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // 63 queries x several codegen stages each blow through the
      // default 100-entry Janino class cache, so the warm-up pass's
      // compiled classes are evicted before the measured pass reaches
      // them (q21 re-paid ~6s of compilation in round 2's bench)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up pass at the smallest scale factor: identical plans compile
    // identical generated code, so Janino's cache + the JIT are hot when
    // the measured run starts. Measures engine throughput, not compiler
    // cold-start (plan-compile cost is amortized over a real deployment's
    // job lifetime).
    // fixed name order: deterministic execution sequence run-to-run
    // (Map iteration order varies with hashing and would otherwise move
    // JIT/GC noise between queries across rounds)
    // SPARK_GRAFT_BENCH_ONLY=q83,q86 runs just the named prefixes —
    // iteration aid; the driver never sets it, so round artifacts
    // always cover the full suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // Watchdog-guarded rep — the SHARED ScaleProof.timedBody behind
    // the warm-up, the sweep, and the fenced warm pass (round-18
    // review, twice over: a hung query used to block an unguarded
    // count() forever and lose the WHOLE artifact, and the first fix
    // re-implemented the watchdog instead of sharing it). The job
    // group is cancelled after SPARK_GRAFT_BENCH_TIMEOUT seconds
    // (default 120, an order of magnitude above any sf0.1 query) and
    // the rep records as failed (-1 sentinel downstream) WITH its
    // reason ("timeout" vs the exception class) — a 120 s hang and an
    // instant analysis error are different regressions.
    val timeoutSec = sys.env.get("SPARK_GRAFT_BENCH_TIMEOUT")
      .flatMap(_.trim.toIntOption).getOrElse(120).max(1)
    def timedRep(label: String)(body: => Unit)
        : (Double, Boolean, String) = {
      val t0 = System.nanoTime()
      graft.jobs.ScaleProof.timedBody(spark, label, timeoutSec) {
        body; 0L
      } match {
        case Right((_, sec)) => (sec, true, null)
        case Left(reason) =>
          ((System.nanoTime() - t0) / 1e9, false, reason)
      }
    }
    def timedReps(name: String, fn: (SparkSession, String) => DataFrame,
        n: Int): Seq[(Double, Boolean, String)] =
      (0 until n).map(_ =>
        timedRep(name) { fn(spark, sfDir).count(); () })
    def repsStr(timed: Seq[(Double, Boolean, String)]): String =
      timed.map { case (t, ok, reason) =>
        f"$t%.3f" + (if (ok) "" else s"(FAILED:$reason)") }
        .mkString(",")
    val warmDir = "/root/testdata/sf0.001"
    ordered.foreach { case (name, fn) =>
      timedRep(s"$name-warmup") { fn(spark, warmDir).count(); () }
    }
    // Repeated-min measurement: each query runs `reps` times back-to-back
    // and reports the minimum. A single-shot pass conflates engine
    // throughput with whatever fixed per-query overhead happens to land
    // on that one execution (GC pause, JIT deopt/recompile, codegen
    // cache miss, page-cache cold read) — round 3 saw a uniform
    // +0.4-0.7s drift on twelve trivial scans from exactly that. The min
    // over reps is the standard noise-floor estimator (what the engine
    // can do when the environment cooperates); per-rep times go to
    // stderr for drift diagnosis.
    // toIntOption: a malformed env value must not kill the run after
    // the warm-up pass already burned its time
    val reps = sys.env.get("SPARK_GRAFT_REPS")
      .flatMap(_.trim.toIntOption).getOrElse(3).max(1)
    val detailed = ordered.map { case (name, fn) =>
      // One untimed rep at the MEASURED scale before the timed loop: the
      // sf0.001 warm-up above compiles the codegen classes, but AQE
      // re-plans at sf0.1 (different stage stats => different shuffle
      // coalescing / join strategies), so rep1 at sfDir still paid
      // first-execution JIT for the replanned stages — round 9 saw
      // spreads of 2.3-2.8 on q108/q84 from exactly that. Warming at
      // sfDir makes every timed rep a steady-state measurement.
      timedRep(s"$name-rewarm") { fn(spark, sfDir).count(); () }
      // GC fence: garbage from the previous query's executions (and
      // the warm rep above) otherwise lands as a collection pause
      // inside a RANDOM later query's timed rep — q123 measured spread
      // 2.8 in a full-suite run vs 1.1 in isolation from exactly that.
      // One explicit collection here pins the cost to the untimed gap.
      System.gc()
      // min over SUCCESSFUL reps only: a rep that throws returns almost
      // instantly, and letting its near-zero elapsed time into the min
      // would report a transiently failing query as fast. All-failed =>
      // sentinel -1 (visible in the artifact, never mistaken for speed).
      val timed = timedReps(name, fn, reps)
      System.err.println(s"bench $name reps=[" + repsStr(timed) + "]")
      (name, timed)
    }
    val results = detailed.map { case (name, timed) =>
      val good = timed.collect { case (t, true, _) => t }
      name -> (if (good.nonEmpty) good.min else -1.0)
    }.toMap
    // 3-decimal values: the driver captures this line from a bounded
    // stdout tail, and full-precision doubles pushed the line past the
    // tail window in round 6 (artifact arrived truncated → unparseable).
    // Millisecond precision is below the run-to-run noise floor anyway.
    def fmt(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // failed queries (sentinel -1) must not deflate the headline sum
    val total = results.values.filter(_ >= 0).sum
    // Window calibration (round-16 bench protocol): the median min-time
    // of five constant-cost scan queries whose plans never change
    // round-to-round — their median moves ONLY with the machine window
    // (CPU contention, page cache, thermal state), so two runs compare
    // as ratio-to-calibration instead of raw seconds. Round 15's 74.9 s
    // driver window vs the builder's 56.8 s needed manual per-query
    // forensics to attribute; this field makes the window factor a
    // first-class artifact value (calibration_now / calibration_then).
    val calibQueries = Seq("q12_octet_len", "q13_normalize_ws",
      "q14_word_count", "q16_reading_duration", "q19_fingerprint")
    val calibration = {
      val xs = calibQueries.flatMap(results.get).filter(_ >= 0).sorted
      if (xs.isEmpty) -1.0 else xs(xs.size / 2)
    }
    // Fenced warm pass over the heaviest queries (round 18 — the
    // ScaleProof warm discipline folded into the bench): the sweep's
    // min-of-reps still rides whatever JVM/page-cache state the
    // preceding 125 queries left behind, which is exactly why the
    // same binary read 53.3/62.8/72.6 s across three round-17
    // windows — a ±30% band that hides real ~10% regressions. The
    // heavy queries dominate that band (top 10 ≈ half the total), so
    // each gets a cache-clear + GC fence and three MORE reps after
    // the full sweep, when the JVM is as warm as it will ever be;
    // the min over those is the window-robust per-query number.
    // `robust_total_sec` (sweep mins with the top-N replaced by their
    // fenced warm mins) is the headline to compare across rounds; the
    // fenced calibration row scales out whatever window residue
    // remains. SPARK_GRAFT_BENCH_WARM sets N (default 10; 0
    // disables).
    val warmN = sys.env.get("SPARK_GRAFT_BENCH_WARM")
      .flatMap(_.trim.toIntOption).getOrElse(10)
    val fnByName = ordered.toMap
    def fencedMinOf3(name: String)
        : (Seq[(Double, Boolean, String)], Double) = {
      spark.catalog.clearCache()
      System.gc()
      val timed = timedReps(s"$name-warm", fnByName(name), 3)
      val good = timed.collect { case (t, true, _) => t }
      (timed, if (good.nonEmpty) good.min else -1.0)
    }
    val warmNames = results.toSeq.filter(_._2 >= 0)
      .sortBy(-_._2).take(warmN).map(_._1)
    val warmDetailed = warmNames.map { name =>
      val (timed, best) = fencedMinOf3(name)
      System.err.println(s"bench warm $name reps=[" + repsStr(timed) +
        s"] min=${fmt(best)}")
      (name, timed, best)
    }
    val warmMins = warmDetailed.map { case (n, _, b) => n -> b }.toMap
    // the fenced calibration reps are first-class rows too (round-18
    // review: they used to vanish into the median, leaving no per-rep
    // data to separate a contaminated rep from a real window shift)
    val calibDetailed = if (warmN <= 0) Nil
      else calibQueries.filter(fnByName.contains).map { name =>
        val (timed, best) = fencedMinOf3(name)
        System.err.println(s"bench warm-calib $name reps=[" +
          repsStr(timed) + s"] min=${fmt(best)}")
        (name, timed, best)
      }
    val warmCalibration = {
      val xs = calibDetailed.map(_._3).filter(_ >= 0).sorted
      if (xs.isEmpty) -1.0 else xs(xs.size / 2)
    }
    // sweep mins with the warm set's fenced mins substituted (a warm
    // pass that FAILED all reps keeps the sweep number — a transient
    // must not deflate the robust headline)
    val robustTotal = results.toSeq.filter(_._2 >= 0).map {
      case (n, sweepMin) =>
        warmMins.get(n).filter(_ >= 0).getOrElse(sweepMin)
    }.sum
    val warmTopTotal = warmDetailed.map(_._3).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"calibration_sec":${fmt(calibration)},"warm_top_n":${warmDetailed.length},"warm_total_top_sec":${fmt(warmTopTotal)},"robust_total_sec":${fmt(robustTotal)},"warm_calibration_sec":${fmt(warmCalibration)}}"""
    println(line)
    // COMPACT summary as the LAST stdout line (round-18 verdict item 1):
    // the full line above carries the 126-entry per-query map (~3.5 KB),
    // but the driver captures only a bounded stdout tail, so in every
    // round so far the tail began MID-LINE and the artifact recorded
    // parsed:null — no per-query PERF table was ever computed from it.
    // This line stays under ~300 chars (headline fields only, no
    // per-query map) so the tail always holds one complete parseable
    // JSON object; the full map remains on the line above and in the
    // summary artifact file. Same measurement, same fields — a second
    // print of already-computed values, not a methodology change.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","reps":$reps,"calibration_sec":${fmt(calibration)},"warm_top_n":${warmDetailed.length},"warm_total_top_sec":${fmt(warmTopTotal)},"robust_total_sec":${fmt(robustTotal)},"warm_calibration_sec":${fmt(warmCalibration)}}""")
    // also persist the summary: the driver's stdout tail-capture
    // truncated 13 of 75 per-query times in round 4 — the artifact
    // should never depend on tail length. The FILE form additionally
    // carries per-rep times and the max/min spread per query: round 8's
    // bench box was contended and min-of-3 silently absorbed 4-9× rep
    // swings, making the artifact useless for regression detection. With
    // the spread in the artifact, contamination is visible without
    // stderr: spread >~2 on a trivial query = noisy box, not a plan
    // regression.
    val repsJson = detailed.map { case (name, timed) =>
      "\"" + name + "\":[" + timed.map { case (t, ok, _) =>
        if (ok) fmt(t) else fmt(-t) // negative = failed rep, magnitude kept
      }.mkString(",") + "]"
    }.mkString("{", ",", "}")
    // failure REASONS, only for queries that had any (usually empty):
    // a -1 sentinel alone cannot distinguish a 120 s hang from an
    // instant analysis error (round-18 review)
    val repErrsJson = detailed
      .filter { case (_, timed) => timed.exists(!_._2) }
      .map { case (name, timed) =>
        "\"" + name + "\":[" + timed.map { case (_, ok, reason) =>
          if (ok) "null" else "\"" + reason + "\""
        }.mkString(",") + "]"
      }.mkString("{", ",", "}")
    val spreadJson = detailed.map { case (name, timed) =>
      val good = timed.collect { case (t, true, _) => t }
      val sp = if (good.size >= 2 && good.min > 0) good.max / good.min else -1.0
      "\"" + name + "\":" + fmt(sp)
    }.mkString("{", ",", "}")
    val maxSpread = detailed.flatMap { case (_, timed) =>
      val good = timed.collect { case (t, true, _) => t }
      if (good.size >= 2 && good.min > 0) Some(good.max / good.min) else None
    }.foldLeft(0.0)(_ max _)
    val warmJson = (warmDetailed ++ calibDetailed)
      .map { case (name, timed, best) =>
        "\"" + name + "\":{\"reps_sec\":[" + timed.map { case (t, ok, _) =>
          if (ok) fmt(t) else fmt(-t)
        }.mkString(",") + s"],\"min_sec\":${fmt(best)}}"
      }.mkString("{", ",", "}")
    val fileLine = line.dropRight(1) +
      s""","calibration_queries":${calibQueries.map("\"" + _ + "\"")
        .mkString("[", ",", "]")}""" +
      s""","max_spread":${fmt(maxSpread)},"spread":$spreadJson,"warm":$warmJson,"rep_errs":$repErrsJson,"reps_sec":$repsJson}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_summary.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (fileLine + "\n").getBytes("UTF-8"))
    catch { case e: java.io.IOException =>
      System.err.println(s"bench summary write failed: $e") }
    spark.stop()
  }
}
