package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.jobs.ScaleProof

/** The scale harness's replication must behave like a LARGER CORPUS,
  * not like duplication: row counts multiply by the factor, join
  * fan-out stays linear (every replica joins exactly its own replica —
  * the naive no-offset union would fan out quadratically), dims stay
  * 1x, and key domains remain referentially closed. */
class ScaleProofSpec extends SparkSuite {

  test("scaleTables: linear row counts, linear join fan-out, " +
      "closed foreign keys, dims untouched") {
    val s = initSpark()
    val base = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("scaleproof").toString
    val factor = 3
    ScaleProof.scaleTables(s, base, out, factor)

    def baseT(n: String) = SparkEntry.table(s, base, n)
    def scaledT(n: String) = SparkEntry.table(s, out, n)

    // row counts: facts x factor, dims x 1
    for (t <- Seq("customer", "orders", "lineitem", "documents",
        "events", "embeddings"))
      assert(scaledT(t).count() === baseT(t).count() * factor,
        s"table $t")
    for (t <- Seq("region", "nation"))
      assert(scaledT(t).count() === baseT(t).count(), s"dim $t")

    // join fan-out LINEAR: the orders-customer join grows by exactly
    // the factor (quadratic duplication would give factor^2)
    val baseJoin = baseT("orders").join(baseT("customer"),
      col("o_custkey") === col("c_custkey")).count()
    val scaledJoin = scaledT("orders").join(scaledT("customer"),
      col("o_custkey") === col("c_custkey")).count()
    assert(scaledJoin === baseJoin * factor)

    // referential closure: no dangling o_custkey / l_orderkey
    assert(scaledT("orders").join(scaledT("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti")
      .count() === 0)
    assert(scaledT("lineitem").join(scaledT("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count() === 0)

    // keys stay distinct across replicas (offsets never collide)
    assert(scaledT("documents").select("doc_id").distinct().count() ===
      baseT("documents").count() * factor)

    // content is byte-identical per replica: every doc text appears
    // exactly `factor` times -> the dedup tier sees factor-member
    // exact clusters
    val counts = scaledT("documents").groupBy("text").count()
      .select("count").distinct().collect().map(_.getLong(0)).toSet
    assert(counts === Set(factor.toLong))
  }
}
