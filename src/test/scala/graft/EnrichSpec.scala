package graft

import org.apache.spark.sql.functions._

import graft.operators.Enrich

/** R12 skip-if-present enrichment over the details JSON pocket. */
class EnrichSpec extends SparkSuite {

  test("withDetailsKey computes only when missing, strict forces") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(
      ("d1", """{"duration":"999"}"""), // present -> untouched
      ("d2", """{"other":"x"}"""),      // missing -> computed
      ("d3", null: String))             // null details -> computed
      .toDF("id", "details")
    val out = Enrich.withDetailsKey(df, "details", "duration", lit(42))
      .collect().map(r => r.getString(0) ->
        r.getString(1)).toMap
    assert(out("d1") === """{"duration":"999"}""")
    assert(out("d2").contains(""""duration":"42""""))
    assert(out("d2").contains(""""other":"x""""))
    assert(out("d3").contains(""""duration":"42""""))

    val forced = Enrich.withDetailsKey(df, "details", "duration",
        lit(42), strict = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(forced("d1").contains(""""duration":"42""""))
  }

  test("splice preserves unrelated keys' JSON types (ADVICE r2)") {
    val s = initSpark()
    import s.implicits._
    // external_sdg is an array and trace a number — the splice must not
    // re-quote them as strings when adding/replacing the target key.
    val df = Seq(
      ("d1", """{"external_sdg":[1,2],"trace":7,"score":1.10}"""),
      ("d2", """{"external_sdg":[3],"duration":"1"}"""))
      .toDF("id", "details")
    val out = Enrich.withDetailsKey(df, "details", "duration", lit(42),
        strict = true)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("d1").contains(""""external_sdg":[1,2]"""))
    assert(out("d1").contains(""""trace":7"""))
    assert(out("d1").contains(""""score":1.10"""))
    assert(out("d1").contains(""""duration":"42""""))
    assert(out("d2").contains(""""external_sdg":[3]"""))
    assert(out("d2").contains(""""duration":"42""""))
    assert(!out("d2").contains(""""duration":"1""""))
  }

  test("withDuration/withReadability fill reference detail keys") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(("d1", "Some simple words to read. " * 10, "en", null: String))
      .toDF("id", "full_content", "lang", "details")
    val out = Enrich.withReadability(
      Enrich.withDuration(df, "full_content", "lang"),
      "full_content")
    val details = out.head().getString(3)
    assert(details.contains(""""duration""""))
    assert(details.contains(""""readability""""))
  }
}
