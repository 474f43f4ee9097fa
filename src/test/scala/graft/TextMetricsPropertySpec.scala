package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextMetrics

/** ScalaCheck-generated inputs through the text-metric columns
  * (SURVEY §5 test plan: property tests for F6-F11): bounds must hold
  * for arbitrary text including empty strings, punctuation runs,
  * unicode, and whitespace-only input. Evaluated as ONE Spark job over
  * the generated corpus (per-case jobs would dominate runtime). */
class TextMetricsPropertySpec extends SparkSuite {

  private def genTexts(n: Int): Seq[String] = {
    val g = Gen.frequency(
      (4, Gen.listOf(Gen.oneOf(
        Gen.alphaNumStr, Gen.const("the"), Gen.const("é𝄞ß"),
        Gen.const("a.b!c?"), Gen.const("   "), Gen.const("\t\n")))
        .map(_.mkString(" "))),
      (1, Gen.const("")),
      (1, Gen.const("...!!!???")),
      (1, Gen.const("  ")))
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))
  }

  test("metric bounds hold for arbitrary generated text") {
    val s = initSpark()
    import s.implicits._
    val df = genTexts(300).toDF("text")
    val rows = df.select(
      TextMetrics.wordCount(col("text")).as("w"),
      TextMetrics.sentenceCount(col("text")).as("sc"),
      TextMetrics.fleschReadingEase(col("text")).as("flesch"),
      TextMetrics.readingDurationSeconds(col("text"), lit(200.0))
        .as("dur"),
      TextMetrics.stopwordRatio(col("text")).as("stop"),
      TextMetrics.punctRatio(col("text")).as("punct"),
      TextMetrics.qualityScore(col("text")).as("q"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Number](0).longValue() >= 0L)
      assert(r.getAs[Number](1).longValue() >= 0L)
      val flesch = r.getDouble(2)
      assert(flesch >= 0.0 && flesch <= 100.0, s"flesch=$flesch")
      assert(r.getDouble(3) >= 0.0)
      val stop = r.getDouble(4)
      assert(stop >= 0.0 && stop <= 1.0, s"stop=$stop")
      val punct = r.getDouble(5)
      assert(punct >= 0.0 && punct <= 1.0 + 1e-9, s"punct=$punct")
      val q = r.getDouble(6)
      assert(q >= 0.0 && q <= 1.0, s"q=$q")
    }
  }

  test("gopher + repetition stats never throw and keep their integer " +
      "invariants on arbitrary unicode (incl. supplementary chars, " +
      "whitespace-only, empty)") {
    val s = initSpark()
    import s.implicits._
    val df = genTexts(300).toDF("text")
    val rows = df.select(
      TextMetrics.gopherStruct(col("text")).as("g"),
      TextMetrics.repetitionStats(col("text")).as("r"))
      .select("g.word_count", "r.n_lines", "r.dup_lines", "r.n_grams",
        "r.top2_count", "r.top2_len", "r.text_chars")
      .collect()
    rows.foreach { r =>
      val wc = r.getLong(0)
      val (nl, dl, ng, tc, tl, ch) = (r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))
      assert(wc >= 0 && nl >= 1, s"wc=$wc nl=$nl") // split yields >= 1
      assert(dl >= 0 && dl < nl || (dl == 0 && nl >= 1))
      assert(ng >= 0 && tc >= 0 && tl >= 0 && ch >= 0)
      assert(tc <= math.max(ng, 1), s"top count $tc > grams $ng")
      // a gram's char mass cannot exceed a text made only of it
      if (ng == 0) assert(tc == 0 && tl == 0)
    }
  }
}
