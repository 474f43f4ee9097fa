package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Mixing, SemDedup, SubstringDedup}

/** Round-6 curation operators: duplicate-substring profile/removal,
  * bloom-prefiltered decontamination, quota sampling (windowed and
  * prefiltered), and SemDeDup. */
class CurationOpsSpec extends SparkSuite {

  private def toks(s: String): Array[String] =
    s.trim.split("\\s+").filter(_.nonEmpty)

  // a 15-token span shared verbatim between docs 1 and 2
  private val span =
    "the quick brown fox jumps over the lazy dog while rain falls on the hill"

  private def substringFixture = {
    val s = initSpark()
    import s.implicits._
    Seq(
      (1L, s"alpha beta $span gamma delta"),
      (2L, s"unrelated opening words here $span and a different tail"),
      (3L, "totally distinct text with no repeated content at all " +
        "padding padding2 padding3 padding4 padding5 padding6"),
      // within-doc repetition: the same span twice in ONE document
      (4L, s"intro $span middle filler words $span outro"),
      (5L, "short doc") // below the window width
    ).toDF("doc_id", "text")
  }

  test("duplicatedWindowStats counts cross-doc and within-doc window " +
      "instances against the corpus census") {
    val docs = substringFixture
    val n = 5
    val stats = SubstringDedup
      .duplicatedWindowStats(docs, "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // doc 5 has < n tokens: no window surface, absent from the output
    assert(stats.keySet === Set(1L, 2L, 3L, 4L))
    // doc 3 shares nothing
    assert(stats(3L)._2 === 0L)
    // the shared 15-token span yields 15-n+1 = 11 duplicated windows
    // in each carrier (plus boundary windows that differ)
    assert(stats(1L)._2 >= 11L)
    assert(stats(2L)._2 >= 11L)
    // within-doc repeat: both copies' windows are duplicated instances
    assert(stats(4L)._2 >= 22L)
    // n_windows is the full instance count: tokens - n + 1
    val t1 = toks(s"alpha beta $span gamma delta").length
    assert(stats(1L)._1 === (t1 - n + 1).toLong)
  }

  test("removeDuplicateWindows keeps the corpus-first occurrence and " +
      "excises every other copy") {
    val docs = substringFixture
    val n = 5
    val out = SubstringDedup
      .removeDuplicateWindows(docs, "doc_id", "text", n)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 is the minimal (id, pos) carrier for the span's windows —
    // nothing cut, text only whitespace-normalized
    assert(out(1L) === s"alpha beta $span gamma delta")
    // doc 2 lost the span (it survives only in doc 1)
    assert(!out(2L).contains("quick brown fox"))
    // doc 2 retains its unique prefix
    assert(out(2L).startsWith("unrelated opening words"))
    // doc 3 untouched
    assert(out(3L) === docs.where(col("doc_id") === 3)
      .collect().head.getString(1))
    // doc 4: both in-doc copies are non-first instances (doc 1 holds
    // the span), so both are cut; unique filler survives
    assert(!out(4L).contains("quick"))
    assert(out(4L).contains("intro"))
    assert(out(4L).contains("outro"))
    // short doc passes through (no window surface)
    assert(out(5L) === "short doc")
  }

  test("removeDuplicateWindows keeps the FIRST within-doc copy when " +
      "the repetition is doc-local") {
    val s = initSpark()
    import s.implicits._
    val docs = Seq(
      (10L, s"$span filler one two three $span")
    ).toDF("doc_id", "text")
    val out = SubstringDedup
      .removeDuplicateWindows(docs, "doc_id", "text", 5)
      .collect().head.getString(1)
    // first copy survives, second is excised
    assert(out.startsWith("the quick brown fox"))
    assert(out.endsWith("filler one two three"))
  }

  test("contaminationPairsBloom returns exactly the exact operator's " +
      "pairs (bloom is plan-only)") {
    val s = initSpark()
    import s.implicits._
    // 40 docs; even ids are "train", odd are "test"; five planted
    // train/test pairs share an 8-token span
    val base = (0L until 40L).map { i =>
      (i, s"doc $i unique words u${i}a u${i}b u${i}c u${i}d u${i}e " +
        s"u${i}f u${i}g u${i}h")
    }
    val planted = (0L until 5L).map { k =>
      val sp = s"shared span s${k}a s${k}b s${k}c s${k}d s${k}e s${k}f"
      (100L + 2 * k, s"train side $sp padding") // even: train
    } ++ (0L until 5L).map { k =>
      val sp = s"shared span s${k}a s${k}b s${k}c s${k}d s${k}e s${k}f"
      (101L + 2 * k, s"test side $sp other tail") // odd: test
    }
    val docs = (base ++ planted).toDF("doc_id", "text")
    val train = docs.where(pmod(col("doc_id"), lit(2)) === 0)
    val test = docs.where(pmod(col("doc_id"), lit(2)) === 1)
    def pairsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    val exact = pairsOf(Decontaminate.contaminationPairs(
      train, test, "doc_id", "text", n = 8))
    val bloom = pairsOf(Decontaminate.contaminationPairsBloom(
      train, test, "doc_id", "text", n = 8))
    assert(exact.nonEmpty, "fixture must plant contamination")
    assert(bloom === exact)
    // an undersized filter degrades the prefilter, never the result
    val tiny = pairsOf(Decontaminate.contaminationPairsBloom(
      train, test, "doc_id", "text", n = 8,
      expectedTestShingles = 4L, fpp = 0.5))
    assert(tiny === exact)
  }

  private def quotaFixture = {
    val s = initSpark()
    import s.implicits._
    (0L until 300L).map { i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c")
    }.toDF("id", "stratum")
  }

  test("quotaSample keeps exactly the md5-first quota rows per stratum " +
      "and drops unlisted strata") {
    val df = quotaFixture
    val out = Mixing.quotaSample(df, "stratum",
      Map("a" -> 7, "b" -> 1000), "id", rankCol = Some("rk"))
    val byStratum = out.collect()
      .groupBy(_.getString(0)) // join puts stratum first
    assert(byStratum.keySet === Set("a", "b"))
    assert(byStratum("a").length === 7)
    // quota above the stratum size keeps the whole stratum
    assert(byStratum("b").length === 100)
    // ranks are 1..quota and ordered by md5 of the id
    val aRows = byStratum("a").map(r => (r.getLong(1), r.getInt(2)))
    assert(aRows.map(_._2).sorted.toSeq === (1 to 7))
    val expected = df.where(col("stratum") === "a")
      .select(col("id"))
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(7).collect().map(_.getLong(0)).toSet
    assert(aRows.map(_._1).toSet === expected)
  }

  test("temperatureMixtureSqrt: quotas follow floor(target*sqrt(c)/" +
      "sum), flatten skew vs proportional, and take md5-first rows") {
    val s = initSpark()
    import s.implicits._
    // heavily skewed strata: 400 / 90 / 10
    val df = (0L until 500L).map { i =>
      (i, if (i < 400) "big" else if (i < 490) "mid" else "tiny")
    }.toDF("id", "stratum")
    val out = Mixing.temperatureMixtureSqrt(df, "stratum", "id",
      target = 100L, rankCol = Some("rk"))
    val got = out.collect().groupBy(_.getString(0))
      .view.mapValues(_.length).toMap
    // exact integer model of the quota vector
    val wq = Map("big" -> 400L, "mid" -> 90L, "tiny" -> 10L)
      .view.mapValues(c => math.floor(math.sqrt(c.toDouble) * 1e6 + 0.5)
        .toLong).toMap
    val wtot = wq.values.sum
    val expect = wq.view.mapValues(w => 100L * w / wtot).toMap
    assert(got === expect.filter(_._2 > 0).map(identity))
    // temperature flattening: tiny's share beats its proportional 2%
    assert(got("tiny").toDouble / 100 > 10.0 / 500)
    assert(got("big").toDouble / 100 < 400.0 / 500)
    // the taken rows per stratum are exactly the md5-first `quota`
    val tinyTaken = out.where(col("stratum") === "tiny")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val tinyExpected = df.where(col("stratum") === "tiny")
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(expect("tiny").toInt)
      .collect().map(_.getLong(0)).toSet
    assert(tinyTaken === tinyExpected)
  }

  /** Independent water-fill model: scan cap values for the largest
    * uniform cap whose clipped sum fits, then spread the remainder
    * one-each over the clipped strata in (count, stratum) order —
    * a DIFFERENT formulation than the closed form under test. */
  private def waterModel(counts: Map[String, Long],
      target: Long): Map[String, Long] = {
    val total = counts.values.sum
    if (total <= target) counts
    else {
      def sumAt(c: Long) = counts.values.map(math.min(_, c)).sum
      var cap = 0L
      while (sumAt(cap + 1) <= target) cap += 1
      var rem = target - sumAt(cap)
      counts.toSeq.sortBy(x => (x._2, x._1)).map { case (st, c) =>
        if (c <= cap) st -> c
        else if (rem > 0) { rem -= 1; st -> (cap + 1) }
        else st -> cap
      }.toMap
    }
  }

  test("waterFillQuotas equals the cap-scan model over randomized " +
      "strata, including no-capping and target-zero edges") {
    val s = initSpark()
    import s.implicits._
    val rnd = new scala.util.Random(911)
    for (trial <- 0 until 20) {
      val nStrata = 1 + rnd.nextInt(8)
      val counts = (0 until nStrata).map { i =>
        s"s$i" -> (1L + rnd.nextInt(40))
      }.toMap
      val total = counts.values.sum
      val target = trial match {
        case 0 => 0L
        case 1 => total      // exact fit: nothing clipped
        case 2 => total + 50 // over-ask keeps everything
        case _ => rnd.nextInt(total.toInt + 1).toLong
      }
      val df = counts.toSeq.flatMap { case (st, c) =>
        (0L until c).map(j => (s"$st-$j", st))
      }.toDF("id", "stratum")
      val got = Mixing.waterFillQuotas(df, "stratum", target)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === waterModel(counts, target),
        s"trial=$trial counts=$counts target=$target")
      assert(got.values.sum === math.min(target, total))
    }
  }

  test("waterFillMix levels skew to the water line and takes the " +
      "md5-first rows per stratum") {
    val s = initSpark()
    import s.implicits._
    // 400 / 90 / 10 skew, target 120: tiny keeps all, the line clips
    // the rest
    val df = (0L until 500L).map { i =>
      (i, if (i < 400) "big" else if (i < 490) "mid" else "tiny")
    }.toDF("id", "stratum")
    val out = Mixing.waterFillMix(df, "stratum", "id", target = 120L,
      rankCol = Some("rk"))
    val got = out.collect().groupBy(_.getString(0))
      .view.mapValues(_.length.toLong).toMap
    assert(got === waterModel(
      Map("big" -> 400L, "mid" -> 90L, "tiny" -> 10L), 120L))
    assert(got("tiny") === 10L) // below the line: keeps everything
    // the taken rows are exactly the md5-first quota per stratum
    val bigTaken = out.where(col("stratum") === "big")
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val bigExpected = df.where(col("stratum") === "big")
      .orderBy(md5(col("id").cast("string")), col("id"))
      .limit(got("big").toInt)
      .collect().map(_.getLong(0)).toSet
    assert(bigTaken === bigExpected)
  }

  test("quotaSamplePrefiltered equals the windowed form, including " +
      "under a slack so tight the fallback fires") {
    val df = quotaFixture
    val quotas = Map("a" -> 9, "b" -> 25, "c" -> 101)
    def setOf(out: org.apache.spark.sql.DataFrame) =
      out.select("id", "stratum", "rk").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val plain = setOf(Mixing.quotaSample(df, "stratum", quotas, "id",
      rankCol = Some("rk")))
    val fast = setOf(Mixing.quotaSamplePrefiltered(df, "stratum",
      quotas, "id", rankCol = Some("rk")))
    assert(fast === plain)
    // slack=1: expected survivor count == quota exactly — sampling
    // variance makes under-runs likely, driving the verified fallback
    val tight = setOf(Mixing.quotaSamplePrefiltered(df, "stratum",
      quotas, "id", rankCol = Some("rk"), slack = 1.0))
    assert(tight === plain)
  }

  test("portable minhash: identical texts share the full signature and " +
      "surface as an LSH pair with estimate 1.0") {
    val s = initSpark()
    import s.implicits._
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
      (3L, "completely different words with no overlap at all here")
    ).toDF("doc_id", "text")
    val sig = Dedup.minhashSignaturesPortable(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    assert((0 until 16).forall(j => sig((1L, j)) === sig((2L, j))))
    val pairs = Dedup.minhashLshPairsPortable(docs, "doc_id", "text",
        n = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 1.0)))
  }

  test("dsirScoreFast equals the oracled relational dsirScore " +
      "(broadcast log-ratio table, row-local pass)") {
    val s = initSpark()
    import s.implicits._
    import graft.operators.ImportanceSampling
    val raw = (0L until 300L).map { i =>
      (i, s"the quick brown item $i of batch b${i % 7} was seen with " +
        s"tag t${i % 13} and note n${i % 5}")
    }.toDF("doc_id", "text")
    val target = raw.where(col("doc_id") % 3 === 0)
    def collectScores(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val slow = collectScores(ImportanceSampling.dsirScore(
      raw, target, "doc_id", "text"))
    val fast = collectScores(ImportanceSampling.dsirScoreFast(
      raw, target, "doc_id", "text"))
    assert(fast === slow)
  }

  test("sampling and split decisions decorrelate: a 0.5 mixture rate " +
      "still yields val and test rows (salted split hash)") {
    val s = initSpark()
    import s.implicits._
    val df = (0L until 2000L).map(i => (i, "s")).toDF("id", "stratum")
    val out = Mixing.stratifiedSample(df, "stratum",
        Map("s" -> 0.5), "id")
      .withColumn("split", Mixing.assignSplit(col("id"), 0.8, 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // unsalted, the surviving buckets (< 500) were all below the train
    // threshold (800) — val and test were structurally EMPTY
    assert(out.getOrElse("val", 0L) > 0L)
    assert(out.getOrElse("test", 0L) > 0L)
    val total = out.values.sum
    assert(out("train").toDouble / total > 0.7 &&
      out("train").toDouble / total < 0.9)
  }

  test("BPE: merges are deterministic across partitionings, frequent " +
      "words collapse to one token, and encode round-trips") {
    val s = initSpark()
    import s.implicits._
    import graft.operators.Bpe
    val corpus = (Seq.fill(8)("low") ++ Seq.fill(4)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .mkString(" ")
    val docs = Seq((1L, corpus), (2L, "low lower unseen")).toDF(
      "doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 12)
    val model2 = Bpe.train(docs.repartition(5), "text", numMerges = 12)
    assert(model.merges === model2.merges)
    val enc = Bpe.encode(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1), r.getInt(2))).toMap
    // round-trip: concatenated tokens minus the end marker rebuild the
    // original words in order
    val rebuilt = enc(2L)._1.mkString("").split(Bpe.Eow).toSeq
    assert(rebuilt === Seq("low", "lower", "unseen"))
    assert(enc(2L)._2 === enc(2L)._1.length)
    // the most frequent word fully merges into a single token
    val lowTokens = Bpe.encode(Seq((9L, "low")).toDF("doc_id", "text"),
      "doc_id", "text", model).collect().head.getSeq[String](1)
    assert(lowTokens === Seq("low" + Bpe.Eow))
    // unseen characters survive as single-char tokens (no OOV loss)
    assert(enc(2L)._1.containsSlice(
      Seq("u", "n")) || enc(2L)._1.exists(_.contains("un")))
  }

  test("BPE: non-BMP characters stay whole code points — no surrogate " +
      "tearing in train or encode") {
    val s = initSpark()
    import s.implicits._
    import graft.operators.Bpe
    // U+1F600 (emoji) and U+20BB7 (supplementary CJK) are surrogate
    // PAIRS in UTF-16; splitting per code unit would emit invalid
    // half-surrogate tokens and let merges pair a low surrogate with
    // unrelated symbols
    val emoji = new String(Character.toChars(0x1F600))
    val cjk = new String(Character.toChars(0x20BB7))
    val word = s"a${emoji}b$cjk"
    val docs = Seq((1L, Seq.fill(5)(word).mkString(" ") + " ab")).toDF(
      "doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 8)
    // every merge side is a well-formed Unicode string (no unpaired
    // surrogate at either end)
    def wellFormed(t: String): Boolean =
      !Character.isLowSurrogate(t.charAt(0)) &&
        !Character.isHighSurrogate(t.charAt(t.length - 1))
    assert(model.merges.forall { case (a, b) =>
      wellFormed(a) && wellFormed(b) })
    val tokens = Bpe.encode(docs, "doc_id", "text", model)
      .collect().head.getSeq[String](1)
    assert(tokens.forall(wellFormed))
    // round-trip: concatenation rebuilds the exact original words
    assert(tokens.mkString("").split(Bpe.Eow).toSeq ===
      Seq.fill(5)(word) :+ "ab")
  }

  test("semDedup drops every epsilon-duplicate except the min id and " +
      "is deterministic across reruns") {
    val s = initSpark()
    import s.implicits._
    // 60 base vectors on distinct directions in 4-d, plus exact
    // copies of vectors 0 and 5 under higher ids
    def unit(i: Int): Array[Float] = {
      val a = math.cos(0.1 * i); val b = math.sin(0.1 * i)
      val c = math.cos(0.07 * i + 1); val d = math.sin(0.07 * i + 1)
      val n = math.sqrt(a * a + b * b + c * c + d * d)
      Array((a / n).toFloat, (b / n).toFloat, (c / n).toFloat,
        (d / n).toFloat)
    }
    val base = (0 until 60).map(i => (i.toLong, unit(i)))
    val dups = Seq((200L, unit(0)), (201L, unit(0)), (202L, unit(5)))
    val emb = (base ++ dups).toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(emb, eps = 0.999, stride = 10,
      iters = 2)
    val keep = out.collect().map(r => r.getLong(0) -> r.getBoolean(2))
      .toMap
    assert(keep.size === 63)
    // copies of vector 0 and 5 die; the originals survive
    assert(keep(0L) && !keep(200L) && !keep(201L))
    assert(keep(5L) && !keep(202L))
    // deterministic: a rerun yields the identical keep set
    val again = SemDedup.semDedup(emb, eps = 0.999, stride = 10,
        iters = 2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(again === keep)
    // consuming form = survivors only
    val kept = SemDedup.dedupSemantic(emb, eps = 0.999, stride = 10,
      iters = 2).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept === keep.filter(_._2).keySet)
  }

  test("semDedup contraction is output-identical to the uncontracted " +
      "plan on a mass-duplicated corpus") {
    val s = initSpark()
    import s.implicits._
    import graft.expr.VectorOps.cosineF32
    import graft.operators.Similarity
    // steps 0.8/0.5 rad: pairwise cosine of two base directions is
    // (cos(0.8d) + cos(0.5d))/2 <= 0.892 for all d in 1..39 — every
    // cross-direction pair is safely OUTSIDE eps = 0.97, so the only
    // epsilon-duplicates are the planted identical replicas
    def unit(i: Int): Array[Float] = {
      val a = math.cos(0.8 * i); val b = math.sin(0.8 * i)
      val c = math.cos(0.5 * i + 2); val d = math.sin(0.5 * i + 2)
      val n = math.sqrt(a * a + b * b + c * c + d * d)
      Array((a / n).toFloat, (b / n).toFloat, (c / n).toFloat,
        (d / n).toFloat)
    }
    // 40 base directions, each replicated 5x under shifted ids — every
    // row is in a 5-member identical clique, the contraction's
    // mass-duplication regime (identical vectors land in one cluster
    // at ANY centroid count)
    val rows = for (i <- 0 until 40; r <- 0 until 5)
      yield ((100L * r + i), unit(i))
    // NaN-bearing identical pair (round-17 advice pin): cosineF32(v,v)
    // is NaN, which under Spark's NaN-as-largest ordering satisfies
    // NaN >= eps, so the class takes the CONTRACTED path — exact
    // because the pair join applies the same NaN semantics, asserted
    // against the inlined uncontracted plan below rather than a
    // hand-derived keep set. Ids 901/903: above every ordinary id (so
    // they can never flip an ordinary keep bit via rid < id) and not
    // divisible by the stride (never sampled as centroids).
    val nanRows = Seq((901L, Array(Float.NaN, 1f, 0f, 0f)),
      (903L, Array(Float.NaN, 1f, 0f, 0f)))
    val emb = (rows ++ nanRows).toDF("vec_id", "embedding")
    val (eps, stride, iters) = (0.97, 10, 2)
    // gateFloor = 0 forces the contraction machinery on this toy
    // corpus (the production floor would route it through the
    // uncontracted plan — see the routing parity assertion below)
    val out = SemDedup.semDedupGated(emb, eps, stride, iters,
        "vec_id", "embedding", Similarity.MaxCentroids, gateFloor = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    // the GateFloor skip is routing-only: the public (floored) entry
    // must emit the same keep bits the forced contraction does
    val floored = SemDedup.semDedup(emb, eps, stride, iters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(floored === out)
    // the uncontracted plan, inlined verbatim (the pre-round-16 form)
    val cents = Similarity.kMeansCentroids(emb, stride, iters,
      "vec_id", "embedding")
    val assigned = Similarity.assignToCentroids(emb, cents,
        "vec_id", "embedding")
      .where(col("centroid_id").isNotNull)
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("centroid_id"))
      .persist()
    val right = assigned.select(col("centroid_id"),
      col("id").as("rid"), col("vec").as("rvec"))
    val dropped = assigned.join(right, "centroid_id")
      .where(col("rid") < col("id") &&
        cosineF32(col("vec"), col("rvec")) >= lit(eps))
      .select("id").distinct()
    val legacy = assigned
      .join(dropped.withColumn("__dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("centroid_id"), col("__dup").isNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assigned.unpersist()
    assert(out === legacy)
    // and the headline semantics: exactly one ORDINARY survivor per
    // clique, the min id (replica 0's id = i) — the NaN pair's keep
    // bits are pinned by the parity assertion above (they depend on
    // which cluster the NaN rows land in, a tie-broken detail both
    // plans share), but they can never alter an ordinary row's bit
    val ordinaryKeep = out.collect { case (id, _, k) if k && id < 500L => id }
    assert(ordinaryKeep.size === 40)
    assert(ordinaryKeep.forall(_ < 100L))
    // at most one NaN survivor: the pair is one identical class, so
    // whichever plan semantics apply, 903 can only survive if 901 does
    val nanKeep = out.collect { case (id, _, k) if id > 500L => id -> k }
      .toMap
    assert(nanKeep.keySet === Set(901L, 903L))
    assert(nanKeep(901L) || !nanKeep(903L))
  }

  test("semDedup degenerate boundaries: identical zero vectors are " +
      "not epsilon-duplicates and stay kept") {
    val s = initSpark()
    import s.implicits._
    def unit(i: Int): Array[Float] = {
      val a = math.cos(0.2 * i); val b = math.sin(0.2 * i)
      Array(a.toFloat, b.toFloat, 0f, 0f)
    }
    // two identical all-zero vectors (cosine 0/0 -> 0.0 by the
    // cosineF32 contract, below any eps) among ordinary distinct rows
    // PLUS one ordinary identical pair so the census engages the
    // contraction path (gateFloor = 0: the production floor would
    // route this toy corpus uncontracted) — the zero rows must route
    // uncontracted WITHIN the contraction
    val rows = (0 until 20).map(i => (i.toLong, unit(i))) ++
      Seq((50L, Array(0f, 0f, 0f, 0f)), (51L, Array(0f, 0f, 0f, 0f)),
        (60L, unit(3)))
    val emb = rows.toDF("vec_id", "embedding")
    val keep = SemDedup.semDedupGated(emb, eps = 0.99, stride = 5,
        iters = 2, "vec_id", "embedding",
        graft.operators.Similarity.MaxCentroids, gateFloor = 0L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(keep.size === 23)
    // zero vectors: cosine 0.0 < eps on both the self-gate and the
    // pair predicate — both survive, exactly as the uncontracted plan
    assert(keep(50L) && keep(51L))
    // the ordinary identical pair contracts: min id survives
    assert(keep(3L) && !keep(60L))
  }
}
