package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.EditDistanceJoin
import graft.streaming.EditDistanceStream
import graft.streaming.EditDistanceStream.StreamStr

/** Streaming PassJoin matcher (round-13 stretch): the distinct
  * (id_a, id_b, dist) set over any stream prefix must equal the batch
  * EditDistanceJoin.selfJoin over the same strings — the NearDupStream
  * parity contract applied to the edit-distance tier — and the local
  * banded verifier must agree with the engine's 3-arg levenshtein
  * everywhere, boundary values included. */
class EditDistanceStreamSpec extends SparkSuite {

  test("boundedLevenshtein equals Spark's levenshtein(l, r, tau) on " +
      "randomized strings including the tau boundary") {
    val s = initSpark()
    import s.implicits._
    val rnd = new scala.util.Random(13)
    def str(max: Int) =
      (0 until rnd.nextInt(max + 1)).map(_ => ('a' + rnd.nextInt(3)).toChar)
        .mkString
    val pairs = (0 until 400).map(_ => (str(9), str(9)))
    val tau = 2
    val engine = pairs.toDF("l", "r")
      .select(levenshtein(col("l"), col("r"), tau)).collect()
      .map(_.getInt(0))
    val local = pairs.map { case (l, r) =>
      EditDistanceJoin.boundedLevenshtein(l, r, tau) }
    assert(local === engine.toSeq,
      pairs.zip(local.zip(engine)).filter(p => p._2._1 != p._2._2)
        .take(5).toString)
    // explicit boundary rows: dist exactly tau, tau+1, empty strings
    assert(EditDistanceJoin.boundedLevenshtein("abcd", "abXY", 2) === 2)
    assert(EditDistanceJoin.boundedLevenshtein("abcd", "aXYZ", 2) === -1)
    assert(EditDistanceJoin.boundedLevenshtein("", "ab", 2) === 2)
    assert(EditDistanceJoin.boundedLevenshtein("", "abc", 2) === -1)
    assert(EditDistanceJoin.boundedLevenshtein("", "", 2) === 0)
    // code points, not UTF-16 units: one astral substitution is ONE
    // edit in the engine expression — the local twin must agree
    val emoji = "\uD83D\uDE00" // U+1F600, two chars, one code point
    val engineAstral = Seq((emoji + "ab", "xab"), (emoji, "a"))
      .toDF("l", "r")
      .select(levenshtein(col("l"), col("r"), 2)).collect()
      .map(_.getInt(0)).toSeq
    assert(Seq(
      EditDistanceJoin.boundedLevenshtein(emoji + "ab", "xab", 2),
      EditDistanceJoin.boundedLevenshtein(emoji, "a", 2)) === engineAstral,
      "astral-plane strings must count code points like the engine")
  }

  test("stream-vs-batch pair parity on a designed corpus: exact dups, " +
      "1- and 2-edit pairs, shorts, cross-batch discovery, " +
      "at-least-once replay — with bounded state") {
    val s = initSpark()
    import s.implicits._
    implicit val spark: org.apache.spark.sql.SparkSession = s
    val tau = 2
    val b1 = Seq(
      StreamStr(1L, "abcdefghijklmnop"),
      StreamStr(2L, "abcdefghijklmnoX"), // dist 1 of doc 1
      StreamStr(3L, "zzzzzzzzzzzzzzzz"), // unrelated
      StreamStr(4L, "ab")) // short bucket (len <= tau)
    val b2 = Seq(
      StreamStr(10L, "abcdefghijklmnop"), // exact dup of 1, later batch
      StreamStr(11L, "aXcdefghijklmnoX"), // dist 2 of 1, cross-batch
      StreamStr(12L, "a"), // short: dist 1 of doc 4
      StreamStr(13L, "abX")) // len tau+1: main path vs short doc 4
    val input = MemoryStream[StreamStr](s)
    val query = EditDistanceStream.editPairs(input.toDS(), tau)
      .writeStream.format("memory").queryName("edit_pairs")
      .outputMode("append").start()
    try {
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      input.addData(b1.head) // at-least-once replay of doc 1
      query.processAllAvailable()
      val streamSet = s.sql("SELECT id_a, id_b, dist FROM edit_pairs")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      val batchSet = EditDistanceJoin.selfJoin(
          (b1 ++ b2).map(d => (d.id, d.s)).toDF("id", "s"), "id", "s", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(streamSet === batchSet,
        s"stream=$streamSet\nbatch=$batchSet")
      // the designed pairs are all present with exact distances
      assert(Set((1L, 10L, 0), (1L, 2L, 1), (1L, 11L, 2), (4L, 12L, 1),
        (4L, 13L, 1)).subsetOf(streamSet), streamSet.toString)
      // bounded state: rows in the state store never exceed the block
      // entries the corpus can emit (each (block, role, id) at most
      // once)
      val maxEntries = (b1 ++ b2)
        .flatMap(EditDistanceStream.entriesFor(_, tau))
        .map(e => (e.bkey, e.isIndex, e.id)).distinct.size
      val stateRows = query.lastProgress.stateOperators
        .map(_.numRowsTotal).sum
      assert(stateRows > 0 && stateRows <= maxEntries,
        s"state rows $stateRows vs bound $maxEntries")
    } finally query.stop()
  }

  test("randomized stream-vs-batch parity over short alphabets (the " +
      "regime where every block key collides): 3 batches, 90 strings") {
    val s = initSpark()
    import s.implicits._
    implicit val spark: org.apache.spark.sql.SparkSession = s
    val tau = 2
    val rnd = new scala.util.Random(131)
    val docs = (0 until 90).map { i =>
      val len = rnd.nextInt(9) // includes len 0..2 shorts
      StreamStr(i.toLong,
        (0 until len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    }
    val batches = docs.grouped(30).toSeq
    val input = MemoryStream[StreamStr](s)
    val query = EditDistanceStream.editPairs(input.toDS(), tau)
      .writeStream.format("memory").queryName("edit_pairs_rnd")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        input.addData(b: _*); query.processAllAvailable()
      }
      val streamSet = s.sql("SELECT id_a, id_b, dist FROM edit_pairs_rnd")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      val batchSet = EditDistanceJoin.selfJoin(
          docs.map(d => (d.id, d.s)).toDF("id", "s"), "id", "s", tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .toSet
      assert(streamSet === batchSet,
        s"missing=${(batchSet -- streamSet).take(10)} " +
          s"extra=${(streamSet -- batchSet).take(10)}")
      assert(streamSet.nonEmpty, "degenerate fixture: no pairs at all")
    } finally query.stop()
  }
}
