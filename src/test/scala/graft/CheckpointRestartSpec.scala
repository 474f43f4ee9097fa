package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{EditDistanceStream, NearDupStream,
  SimHashStream}

/** The POSITIVE path of the round-18 state version stamp: the fold
  * specs pin that a DOWN-versioned state fails fast, but nothing
  * there proves the stamped state classes survive a REAL checkpoint
  * encode/decode — Spark's state-store schema handling is exactly
  * where the two prior encoding breaks surfaced. Each test here runs
  * a file-source query to completion (state committed to the
  * checkpoint), then starts a SECOND query instance on the same
  * checkpoint with new input: the restarted fold must restore the
  * stamped state (the version check passes), and a cross-restart
  * pair — one doc from before the restart, one after — must surface.
  * A silently-fresh state would pair nothing; a version/schema
  * mismatch would fail the query. The sink is parquet (the memory
  * sink refuses checkpoint recovery — the StreamProof wipe-guard
  * lesson). */
class CheckpointRestartSpec extends SparkSuite {

  private def addFile[T <: Product : org.apache.spark.sql.Encoder](
      s: SparkSession, dir: String, rows: Seq[T]): Unit = {
    import s.implicits._
    rows.toDS().coalesce(1).write.mode("append").parquet(dir)
  }

  test("SimHashStream: stamped BucketState round-trips a real " +
      "checkpoint restart; cross-restart pair surfaces") {
    val s = initSpark()
    import s.implicits._
    implicit val spark: SparkSession = s
    import SimHashStream.StreamDoc
    val dir = Files.createTempDirectory("sh_restart").toString
    val base =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    addFile(s, s"$dir/in", Seq(StreamDoc(1L, base),
      StreamDoc(2L, "totally different words here entirely unrelated")))
    val schema = s.read.parquet(s"$dir/in").schema
    def run(): Unit = {
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
        .as[StreamDoc]
      val q = SimHashStream.hammingPairsFor(stream,
          expectedDocs = 10, maxHamming = 7)
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run() // first instance: docs 1+2 commit their state
    addFile(s, s"$dir/in", Seq(StreamDoc(10L, base))) // dup of doc 1
    run() // SECOND instance, same checkpoint: must restore state
    val pairs = s.read.schema(
        "id_new BIGINT, id_old BIGINT, hamming INT")
      .parquet(s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    // the cross-restart pair proves the restored (stamped) state was
    // read, not silently replaced by a fresh one
    assert(pairs.contains((10L, 1L, 0)), pairs.toString)
  }

  test("SimHashStream: the restart round-trip also holds under the " +
      "RocksDB state store (its checkpoint format is its own — " +
      "changelog + snapshot files, not the HDFS store's delta maps)") {
    val s = initSpark()
    import s.implicits._
    implicit val spark: SparkSession = s
    import SimHashStream.StreamDoc
    val dir = Files.createTempDirectory("sh_rocks_restart").toString
    val base =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    addFile(s, s"$dir/in", Seq(StreamDoc(1L, base),
      StreamDoc(2L, "totally different words here entirely unrelated")))
    val schema = s.read.parquet(s"$dir/in").schema
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try {
      def run(): Unit = {
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
          .as[StreamDoc]
        val q = SimHashStream.hammingPairsFor(stream,
            expectedDocs = 10, maxHamming = 7)
          .writeStream.format("parquet")
          .option("path", s"$dir/out")
          .option("checkpointLocation", s"$dir/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      run()
      addFile(s, s"$dir/in", Seq(StreamDoc(10L, base)))
      run()
      val pairs = s.read.schema(
          "id_new BIGINT, id_old BIGINT, hamming INT")
        .parquet(s"$dir/out")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(pairs.contains((10L, 1L, 0)), pairs.toString)
    } finally prev match {
      case Some(v) => s.conf.set(providerKey, v)
      case None => s.conf.unset(providerKey)
    }
  }

  test("NearDupStream: stamped BucketState (Seq-signature classes) " +
      "round-trips a real checkpoint restart") {
    val s = initSpark()
    import s.implicits._
    implicit val spark: SparkSession = s
    import NearDupStream.StreamDoc
    val dir = Files.createTempDirectory("nd_restart").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    addFile(s, s"$dir/in", Seq(StreamDoc(1L, base),
      StreamDoc(2L, "nothing in common with anything else at all")))
    val schema = s.read.parquet(s"$dir/in").schema
    def run(): Unit = {
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
        .as[StreamDoc]
      val q = NearDupStream.nearDupPairsFor(stream, expectedDocs = 10)
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    addFile(s, s"$dir/in", Seq(StreamDoc(10L, base)))
    run()
    val pairs = s.read.schema(
        "id_new BIGINT, id_old BIGINT, est_jaccard DOUBLE")
      .parquet(s"$dir/out")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.contains((10L, 1L, 1.0)), pairs.toString)
  }

  test("EditDistanceStream: stamped two-role BlockState round-trips " +
      "a real checkpoint restart") {
    val s = initSpark()
    import s.implicits._
    implicit val spark: SparkSession = s
    import EditDistanceStream.StreamStr
    val dir = Files.createTempDirectory("ed_restart").toString
    addFile(s, s"$dir/in", Seq(StreamStr(1L, "abcdefghijklmnop"),
      StreamStr(2L, "zzzzzzzzzzzzzzzz")))
    val schema = s.read.parquet(s"$dir/in").schema
    def run(): Unit = {
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
        .as[StreamStr]
      val q = EditDistanceStream.editPairsFor(stream, tau = 2,
          expectedDocs = 10)
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    addFile(s, s"$dir/in",
      Seq(StreamStr(10L, "abcdefghijklmnoX"))) // dist 1 of doc 1
    run()
    val pairs = s.read.schema("id_a BIGINT, id_b BIGINT, dist INT")
      .parquet(s"$dir/out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet
    assert(pairs.contains((1L, 10L, 1)), pairs.toString)
  }
}
