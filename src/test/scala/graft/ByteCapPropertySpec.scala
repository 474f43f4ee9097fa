package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.ledger.Ledger

/** ScalaCheck properties for the byte-capped greedy admission operator
  * (SURVEY A2/R5, §7.5 risk #1): the Spark implementation must agree
  * with a direct sequential walk — admit in order while the running
  * total stays <= cap, STOP at the first overflow (later smaller rows
  * are NOT admitted) — for arbitrary size distributions including
  * zero-size rows, and be invariant to input partitioning. */
class ByteCapPropertySpec extends SparkSuite {

  /** Reference model: the reference's loop semantics
    * (retrieve_data_from_database.py:204-247, break at :236-237). */
  private def model(sizes: List[Long], cap: Long): List[Int] = {
    var cum = 0L
    val out = List.newBuilder[Int]
    var i = 0
    var stopped = false
    while (i < sizes.length && !stopped) {
      if (cum + sizes(i) <= cap) { cum += sizes(i); out += i }
      else stopped = true
      i += 1
    }
    out.result()
  }

  test("byteCapAdmit agrees with the sequential model (property)") {
    val s = initSpark()
    import s.implicits._
    val gen = for {
      sizes <- Gen.listOfN(30, Gen.choose(0L, 20L))
      cap <- Gen.choose(0L, 200L)
      parts <- Gen.choose(1, 7)
    } yield (sizes, cap, parts)

    val prop = forAll(gen) { case (sizes, cap, parts) =>
      val df = sizes.zipWithIndex.map { case (sz, i) => (i.toLong, sz) }
        .toDF("id", "sz").repartition(parts)
      val got = Ledger.byteCapAdmit(df, Seq(col("id")), "sz", cap)
        .collect().map(_.getLong(0).toInt).sorted.toList
      got == model(sizes, cap)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
