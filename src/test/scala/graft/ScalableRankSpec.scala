package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ScalableRank

/** The two-phase range-partitioned ranking must be bit-identical to
  * the single-partition window form — rank depends only on the total
  * order, never on partition boundaries. */
class ScalableRankSpec extends SparkSuite {

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.select(col("k"), col("s"), col("id"),
      ntile(k).over(Window.partitionBy("k")
        .orderBy(col("s").asc, col("id").asc)).as("nt"))

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  test("ntileByKey equals window ntile on randomized skewed data, " +
      "ties included, keys spanning range partitions") {
    val s = initSpark()
    import s.implicits._
    val rnd = new scala.util.Random(4217)
    // skewed key sizes (one dominant key forces it across partitions)
    // and a tiny score domain so ties are everywhere
    val rows = (0L until 3000L).map { i =>
      val key = if (rnd.nextInt(10) < 6) "big"
        else s"k${rnd.nextInt(7)}"
      (key, rnd.nextInt(5).toLong, i)
    }
    val df = rows.toDF("k", "s", "id")
    for (k <- Seq(1, 2, 3, 7, 100)) {
      val fast = ScalableRank.ntileByKey(df, "k", "s", "id", k,
        ntileCol = "nt", partitions = 11)
      assert(asSet(fast) === asSet(windowForm(df, k)),
        s"mismatch at k=$k")
    }
  }

  test("ntileByKey handles a key count below the partition count and " +
      "groups smaller than the tile count") {
    val s = initSpark()
    import s.implicits._
    // 2 keys, 13 partitions requested; one key has fewer rows than k
    val df = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("b", 9L, 3L),
      ("b", 2L, 4L), ("b", 5L, 5L)).toDF("k", "s", "id")
    val fast = ScalableRank.ntileByKey(df, "k", "s", "id", 3,
      ntileCol = "nt", partitions = 13)
    assert(asSet(fast) === asSet(windowForm(df, 3)))
  }

  test("rankByKey equals window row_number on randomized skewed data, " +
      "and a CONSTANT key gives the global order distributed") {
    val s = initSpark()
    import s.implicits._
    val rnd = new scala.util.Random(9341)
    val rows = (0L until 2500L).map { i =>
      val key = if (rnd.nextInt(10) < 6) "big" else s"k${rnd.nextInt(5)}"
      (key, rnd.nextInt(4).toLong, i)
    }
    val df = rows.toDF("k", "s", "id")
    val winKeyed = df.select(col("k"), col("s"), col("id"),
      row_number().over(Window.partitionBy("k")
        .orderBy(col("s").asc, col("id").asc)).cast("long").as("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val fastKeyed = ScalableRank.rankByKey(df, "k", "s", "id",
        partitions = 9)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(fastKeyed === winKeyed)
    // constant key = global total order; desc score rides as negation
    val g = df.withColumn("g", lit(0)).withColumn("neg", -col("s"))
    val winGlobal = df.select(col("id"),
      row_number().over(Window.orderBy(col("s").desc, col("id").asc))
        .cast("long").as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fastGlobal = ScalableRank.rankByKey(g, "g", "neg", "id",
        partitions = 9)
      .select(col("id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fastGlobal === winGlobal)
  }

  test("globalRank/globalNtile wrappers equal the bare window forms, " +
      "asc and desc, and leak no synthetic columns") {
    val s = initSpark()
    import s.implicits._
    val rnd = new scala.util.Random(777)
    val df = (0L until 800L).map(i => (rnd.nextInt(6).toLong, i))
      .toDF("s", "id")
    for (desc <- Seq(false, true)) {
      val ord = if (desc) col("s").desc else col("s").asc
      val winRank = df.select(col("id"),
        row_number().over(Window.orderBy(ord, col("id").asc))
          .cast("long").as("r"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fr = ScalableRank.globalRank(df, "s", "id", rankCol = "r",
        desc = desc, partitions = 7)
      assert(fr.columns.toSeq === Seq("id", "s", "r"),
        "synthetic columns must not escape")
      assert(fr.select(col("id"), col("r")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet === winRank,
        s"globalRank desc=$desc")
      val winNt = df.select(col("id"),
        ntile(7).over(Window.orderBy(ord, col("id").asc)).as("nt"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      val fn = ScalableRank.globalNtile(df, "s", "id", 7,
        ntileCol = "nt", desc = desc, partitions = 7)
      assert(fn.select(col("id"), col("nt")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet === winNt,
        s"globalNtile desc=$desc")
    }
  }

  test("globalRank desc is the engine's DESC order over the full " +
      "double domain: NaN and null scores rank exactly like the " +
      "window form (a score negation would misplace both)") {
    val s = initSpark()
    import s.implicits._
    val rnd = new scala.util.Random(4242)
    val df = (0L until 400L).map { i =>
      val sc: java.lang.Double =
        if (i % 97 == 0) Double.NaN
        else if (i % 101 == 0) null
        else rnd.nextDouble() * 10 - 5
      (sc, i)
    }.toDF("s", "id")
    for (desc <- Seq(false, true)) {
      val ord = if (desc) col("s").desc else col("s").asc
      val win = df.select(col("id"),
        row_number().over(Window.orderBy(ord, col("id").asc))
          .cast("long").as("r"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val fast = ScalableRank.globalRank(df, "s", "id", rankCol = "r",
        desc = desc, partitions = 7)
        .select(col("id"), col("r"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast === win, s"NaN/null domain, desc=$desc")
    }
  }

  test("ansiNtile matches the standard tile-size law: first n mod k " +
      "tiles get ceil(n/k) rows") {
    for (n <- 1L to 40L; k <- Seq(1, 2, 3, 5, 8, 40, 41)) {
      val tiles = (1L to n)
        .map(r => ScalableRank.ansiNtile(r, n, k))
      // non-decreasing, starts at 1
      assert(tiles.head === 1)
      assert(tiles.zip(tiles.tail).forall { case (a, b) =>
        b == a || b == a + 1 })
      val sizes = tiles.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val q = n / k
      val rem = n % k
      sizes.foreach { case (tile, size) =>
        val expect = if (tile <= rem) q + 1 else q
        assert(size === expect, s"tile $tile of n=$n k=$k")
      }
    }
  }

  test("globalRank/globalNtile reject id/score column collisions with " +
      "the internal synthetics (ambiguous resolution, not silent ranks)") {
    val s = initSpark()
    import s.implicits._
    val df = Seq((1L, 2.0)).toDF("id", "score")
    intercept[IllegalArgumentException] {
      ScalableRank.globalRank(df.withColumnRenamed("id", "__g"),
        "score", "__g")
    }
    intercept[IllegalArgumentException] {
      ScalableRank.globalRank(df.withColumnRenamed("id", "__score"),
        "score", "__score")
    }
    intercept[IllegalArgumentException] {
      ScalableRank.globalNtile(df, "score", "score", k = 4)
    }
    intercept[IllegalArgumentException] {
      ScalableRank.globalRank(df, "score", "id", rankCol = "__score")
    }
    intercept[IllegalArgumentException] {
      ScalableRank.globalRank(df, "score", "id", rankCol = "id")
    }
  }
}
