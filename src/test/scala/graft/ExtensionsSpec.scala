package graft

/** The SQL-function surface: custom expressions callable from SQL text.
  * Uses the late-registration path (GraftFunctions.register) because the
  * test harness shares one session across suites — builder-time
  * extensions (GraftExtensions) install the identical expressions. */
class ExtensionsSpec extends SparkSuite {

  test("graft functions registered and usable from SQL") {
    val s = initSpark()
    GraftFunctions.register(s)
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
  }

  test("builder-time extensions produce a session with the functions") {
    // verify the GraftExtensions wiring compiles against a builder even
    // though the shared harness session precludes creating it here
    val b = GraftSession.builder("local[2]", 2)
    assert(b != null)
  }
}
