package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.expr.VectorOps.cosineF32
import graft.operators.{SemDedup, Similarity}

/** ScalaCheck property for the round-16 SemDeDup contraction: over
  * arbitrary small corpora — random direction pools (so epsilon-balls
  * genuinely overlap), random per-vector duplication multiplicities
  * (including the dup-free case, which must route through the
  * uncontracted plan untouched), optional all-zero vectors (cosine
  * 0.0, never an epsilon-duplicate), eps drawn INCLUDING the exact
  * 1.0 float boundary, and random partitioning — the adaptive
  * operator's (id, centroid_id, keep) output must equal the
  * pre-round-16 uncontracted plan's, row for row. The k-means trainer
  * is bitwise deterministic, so the two plans see identical clusters
  * and the comparison is exact, not statistical. */
class SemDedupPropertySpec extends SparkSuite {

  test("semDedup output equals the uncontracted plan for arbitrary " +
      "duplication shapes, zero vectors, and eps boundaries (property)") {
    val s = initSpark()
    import s.implicits._

    def unit(i: Int): Array[Float] = {
      val a = math.cos(0.8 * i); val b = math.sin(0.8 * i)
      val c = math.cos(0.5 * i + 2); val d = math.sin(0.5 * i + 2)
      val n = math.sqrt(a * a + b * b + c * c + d * d)
      Array((a / n).toFloat, (b / n).toFloat, (c / n).toFloat,
        (d / n).toFloat)
    }

    val gen = for {
      nDirs <- Gen.choose(3, 10)
      // per-direction multiplicity 1..4: 1 = no duplication for that
      // class; an all-1 draw exercises the dup-free census route
      mults <- Gen.listOfN(nDirs, Gen.choose(1, 4))
      nZeros <- Gen.choose(0, 2)
      eps <- Gen.oneOf(0.8, 0.97, 1.0)
      stride <- Gen.choose(2, 6)
      parts <- Gen.choose(1, 5)
    } yield (mults, nZeros, eps, stride, parts)

    val prop = forAll(gen) { case (mults, nZeros, eps, stride, parts) =>
      val rows = mults.zipWithIndex.flatMap { case (m, dir) =>
        (0 until m).map(r => (100L * r + dir, unit(dir)))
      } ++ (0 until nZeros).map(z =>
        (500L + z, Array(0f, 0f, 0f, 0f)))
      val emb = rows.toDF("vec_id", "embedding").repartition(parts)
      val got = SemDedup.semDedup(emb, eps, stride, iters = 2)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      // the pre-round-16 uncontracted plan, inlined verbatim
      val cents = Similarity.kMeansCentroids(emb, stride, iters = 2,
        "vec_id", "embedding")
      val assigned = Similarity.assignToCentroids(emb, cents,
          "vec_id", "embedding")
        .where(col("centroid_id").isNotNull)
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          col("centroid_id"))
        .persist()
      val right = assigned.select(col("centroid_id"),
        col("id").as("rid"), col("vec").as("rvec"))
      val dropped = assigned.join(right, "centroid_id")
        .where(col("rid") < col("id") &&
          cosineF32(col("vec"), col("rvec")) >= lit(eps))
        .select("id").distinct()
      val legacy = assigned
        .join(dropped.withColumn("__dup", lit(true)), Seq("id"), "left")
        .select(col("id"), col("centroid_id"), col("__dup").isNull)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assigned.unpersist()
      got == legacy
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
