package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{CollectionRouter, Merge}

class SinksSpec extends SparkSuite {

  test("insertIfAbsentDf dedups batch and skips existing keys (S16)") {
    val s = initSpark()
    import s.implicits._
    val existing = Seq(("https://a", "old")).toDF("url", "title")
    val incoming = Seq(
      ("https://a", "dup-of-existing"),
      ("https://b", "first"),
      ("https://b", "second-in-batch"),
      ("https://c", "fresh")
    ).toDF("url", "title")
    val out = Merge.insertIfAbsentDf(existing, incoming, "url", "title")
    val m = out.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m === Map("https://b" -> "first", "https://c" -> "fresh"))
  }

  test("replaceByKeyDf swaps all rows of replaced keys (S18)") {
    val s = initSpark()
    import s.implicits._
    val table = Seq(("d1", "old1a"), ("d1", "old1b"), ("d2", "keep"))
      .toDF("document_id", "body")
    val replacement = Seq(("d1", "new1")).toDF("document_id", "body")
    val out = Merge.replaceByKeyDf(table, replacement, "document_id")
    val got = out.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("d1", "new1"), ("d2", "keep")))
  }

  test("replaceByKey on disk rewrites only touched buckets (S18/R9)") {
    val s = initSpark()
    import s.implicits._
    val dir = Files.createTempDirectory("graft_merge").toString + "/slices"
    val initial = Seq(("d1", "v1"), ("d2", "v1"), ("d3", "v1"))
      .toDF("document_id", "body")
    Merge.replaceByKey(s, dir, initial, "document_id", numBuckets = 4)
    val update = Seq(("d2", "v2")).toDF("document_id", "body")
    Merge.replaceByKey(s, dir, update, "document_id", numBuckets = 4)
    val after = s.read.parquet(dir)
      .select("document_id", "body")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(after === Set(("d1", "v1"), ("d2", "v2"), ("d3", "v1")))
  }

  test("insertIfAbsent on disk is idempotent (T5 at-least-once)") {
    val s = initSpark()
    import s.implicits._
    val dir = Files.createTempDirectory("graft_ins").toString + "/docs"
    val batch = Seq(("https://a", "t1"), ("https://b", "t2"))
      .toDF("url", "title")
    assert(Merge.insertIfAbsent(s, dir, batch, "url", "title") === 2)
    assert(Merge.insertIfAbsent(s, dir, batch, "url", "title") === 0)
    assert(s.read.parquet(dir).count() === 2)
  }

  test("disk writers resolve the table through the Hadoop FS API " +
      "(scheme'd URI a java.io.File probe would call absent)") {
    val s = initSpark()
    import s.implicits._
    // An explicit file:-scheme URI: Spark's writers handle it via the
    // Hadoop FileSystem layer, but `new java.io.File("file:/…").exists()`
    // is false even when the table exists — exactly the off-local lie
    // that made the old bookkeeping append duplicates. Both writers must
    // see through it.
    val base = "file://" + Files.createTempDirectory("graft_hfs").toString
    assert(!new java.io.File(base + "/docs").exists(),
      "precondition: java.io.File cannot see a scheme'd URI")
    val batch = Seq(("https://a", "t1"), ("https://b", "t2"))
      .toDF("url", "title")
    assert(Merge.insertIfAbsent(s, base + "/docs", batch, "url", "title") === 2)
    // second call must find the table and anti-join — NOT re-append
    assert(Merge.insertIfAbsent(s, base + "/docs", batch, "url", "title") === 0)
    assert(s.read.parquet(base + "/docs").count() === 2)

    val initial = Seq(("d1", "v1"), ("d2", "v1")).toDF("document_id", "body")
    Merge.replaceByKey(s, base + "/slices", initial, "document_id", numBuckets = 4)
    Merge.replaceByKey(s, base + "/slices",
      Seq(("d2", "v2")).toDF("document_id", "body"), "document_id", numBuckets = 4)
    val after = s.read.parquet(base + "/slices")
      .select("document_id", "body")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(after === Set(("d1", "v1"), ("d2", "v2")))
  }

  test("collection routing: multilingual, lang-specific, error bucket") {
    val s = initSpark()
    import s.implicits._
    val df = Seq(
      ("d1", "en", "stub-64"),
      ("d2", "fr", "stub-64"),
      ("d3", "xx", "stub-64"),      // unknown lang -> error bucket
      ("d4", "xx", "granite-mul-107m") // multilingual -> routed anyway
    ).toDF("document_id", "lang", "model")
    val (routable, errors) = CollectionRouter.route(df, "lang", "model")
    val m = routable.collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(m("d1") === "collection_welearn_en_stub_64")
    assert(m("d2") === "collection_welearn_fr_stub_64")
    assert(m("d4") === "collection_welearn_mul_granite_mul_107m")
    assert(errors.collect().map(_.getString(0)).toSeq === Seq("d3"))
  }

  test("catalog routing: multilingual wins, else mono, else error (S19)") {
    val s = initSpark()
    import s.implicits._
    val catalog = Seq(
      "collection_welearn_mul_granite",
      "collection_welearn_en_minilm")
    val df = Seq(
      ("d1", "fr", "granite"), // mul collection exists -> mul
      ("d2", "en", "minilm"),  // only mono exists -> mono
      ("d3", "fr", "minilm"))  // neither exists for fr -> error
      .toDF("document_id", "lang", "model")
    val routed = df.withColumn("collection",
      CollectionRouter.collectionForCatalog(col("lang"), col("model"),
        catalog))
    val m = routed.collect()
      .map(r => r.getString(0) -> Option(r.getString(3))).toMap
    assert(m("d1") === Some("collection_welearn_mul_granite"))
    assert(m("d2") === Some("collection_welearn_en_minilm"))
    assert(m("d3") === None)
  }
}
