package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function surface: custom expressions callable from SQL text
  * through GraftExtensions. Own session (extensions are builder-time). */
class ExtensionsSpec extends AnyFunSuite {

  test("graft functions registered and usable from SQL") {
    val s = GraftSession.builder("local[2]", shufflePartitions = 2)
      .getOrCreate()
    try {
      s.sparkContext.setLogLevel("ERROR")
      import s.implicits._
      Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
        .createOrReplaceTempView("ext_vecs")
      val r = s.sql(
        """SELECT dot_f32(a, b) AS d, cosine_f32(a, a) AS self,
           bytes_to_vec(vec_to_bytes(a)) AS roundtrip FROM ext_vecs""")
        .head()
      assert(r.getDouble(0) === 24.0)
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
      assert(r.getSeq[Float](2).toSeq === Seq(3.0f, 4.0f))
    } finally s.stop()
  }
}
