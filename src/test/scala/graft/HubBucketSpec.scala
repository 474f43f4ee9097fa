package graft

import org.apache.spark.sql.functions._

import graft.jobs.CollectorHub
import graft.jobs.CollectorHub.ExtractResult
import graft.sinks.BucketedWarehouse

class HubBucketSpec extends SparkSuite {

  test("collector hub dispatches per corpus, errors stay in-band (A7)") {
    val s = initSpark()
    import s.implicits._
    val docs = Seq(
      ("hal", "https://hal/1", "payload-hal"),
      ("ted", "https://ted/1", "payload-ted"),
      ("hal", "https://hal/2", "boom"),
      ("unknown-corpus", "https://x/1", "p")
    ).toDF("corpus", "url", "payload")
    val registry = Map[String, CollectorHub.Extractor](
      "hal" -> ((url, payload) =>
        if (payload == "boom") throw new RuntimeException("parse error")
        else ExtractResult(url, s"HAL $payload", "fr", "d", "c", null, None)),
      "ted" -> ((url, payload) =>
        ExtractResult(url, s"TED $payload", "en", "d", "c", null, None))
    )
    val out = CollectorHub.collect(docs, registry).cache()
    val ok = out.where(col("error_info").isNull)
      .collect().map(r => r.getString(1) -> r.getString(2)).toMap
    assert(ok === Map("https://hal/1" -> "HAL payload-hal",
      "https://ted/1" -> "TED payload-ted"))
    val errs = out.where(col("error_info").isNotNull)
      .collect().map(r => r.getString(1) -> r.getInt(7)).toMap
    assert(errs === Map("https://hal/2" -> 500, "https://x/1" -> 501))
  }

  test("identically-bucketed tables join without an exchange (R15)") {
    val s = initSpark()
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = (1 to 100).map(i => (s"d$i", s"url$i"))
        .toDF("document_id", "url")
      val slices = (1 to 100).flatMap(i =>
        Seq((s"d$i", 0, "a"), (s"d$i", 1, "b")))
        .toDF("document_id", "order_sequence", "body")
      BucketedWarehouse.writeBucketed(docs, "bw_docs", "document_id", 8)
      BucketedWarehouse.writeBucketed(slices, "bw_slices", "document_id", 8)
      val joined = BucketedWarehouse.colocatedJoin(s, "bw_docs",
        "bw_slices", "document_id")
      val plan = joined.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        "bucketed join still shuffles:\n" + plan.take(2000))
      assert(joined.count() === 200)
    } finally {
      s.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      s.sql("DROP TABLE IF EXISTS bw_docs")
      s.sql("DROP TABLE IF EXISTS bw_slices")
    }
  }

  test("range-clustered layout: files cover disjoint narrow key ranges") {
    val s = initSpark()
    import s.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_range").toString + "/events"
    val df = (1 to 10000).map(i => ((i * 37) % 10000, s"p$i"))
      .toDF("k", "payload")
    BucketedWarehouse.writeRangeClustered(df, dir, "k", partitions = 8)
    // per-file min/max must not overlap (each file owns a narrow range)
    val spans = s.read.parquet(dir)
      .select(col("k"), input_file_name().as("f"))
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(spans.length >= 4)
    spans.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping file ranges: $hi1 vs $lo2")
    case _ => ()
    }
    // and a point predicate prunes to a fraction of the input split-wise
    val one = s.read.parquet(dir).where(col("k") === 42)
    assert(one.count() === 1)
  }
}
