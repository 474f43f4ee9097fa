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
    val inter = s.sql(
      "SELECT sorted_intersect(array(1L,3L,5L,9L), array(3L,4L,5L)) AS i")
      .head().getInt(0)
    assert(inter === 2)
  }

  test("top_k_by usable from SQL with direction literal") {
    val s = initSpark()
    GraftFunctions.register(s)
    import s.implicits._
    Seq((1, 3L, "b"), (1, 3L, "a"), (1, 9L, "c"), (2, 1L, "z"))
      .toDF("g", "cnt", "name").createOrReplaceTempView("ext_topk")
    val got = s.sql(
      """SELECT g, top_k_by(struct(cnt, name), 2, 'desc,asc') AS top
         FROM ext_topk GROUP BY g""")
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getLong(0), x.getString(1)))).toMap
    assert(got(1) === Seq((9L, "c"), (3L, "a")))
    assert(got(2) === Seq((1L, "z")))
  }

  test("builder-time extensions produce a session with the functions") {
    // verify the GraftExtensions wiring compiles against a builder even
    // though the shared harness session precludes creating it here
    val b = GraftSession.builder("local[2]", 2)
    assert(b != null)
  }
}
