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
}
