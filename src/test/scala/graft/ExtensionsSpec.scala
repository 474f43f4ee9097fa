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

  test("codec round-trip rule: bytes_to_vec(vec_to_bytes(x)) vanishes " +
      "from the plan for non-null arrays, stays for nullable elements") {
    val s = initSpark()
    GraftFunctions.register(s)
    import s.implicits._
    // repartition(1) breaks ConvertToLocalRelation — over a bare
    // LocalRelation the optimizer EVALUATES the projection eagerly and
    // both assertions would pass/fail on folding, not on the rule
    val df = Seq((Array(1.5f, -2.25f), 1)).toDF("v", "k").repartition(1)
    // Array[Float] encoder -> containsNull = false: rule fires
    val clean = df.selectExpr("bytes_to_vec(vec_to_bytes(v)) AS r")
    val cleanPlan = clean.queryExecution.optimizedPlan.toString()
    assert(!cleanPlan.contains("bytestofloatvector") &&
      !cleanPlan.contains("BytesToFloatVector"),
      "round-trip not eliminated:\n" + cleanPlan)
    assert(clean.head().getSeq[Float](0).toSeq === Seq(1.5f, -2.25f))
    // nullable elements (array built from a column + a NULL literal —
    // column-derived so constant folding cannot collapse it): a null
    // element encodes as 0.0f, so the rule must NOT fire — and the
    // executed round-trip indeed differs from the input
    val nullable = df.selectExpr(
      "bytes_to_vec(vec_to_bytes(array(v[0], CAST(NULL AS FLOAT)))) AS r")
    val nullablePlan = nullable.queryExecution.optimizedPlan.toString()
    assert(nullablePlan.contains("bytestofloatvector") ||
      nullablePlan.contains("BytesToFloatVector"),
      "rule fired on a nullable-element array:\n" + nullablePlan)
    assert(nullable.head().getSeq[Float](0).toSeq === Seq(1.5f, 0.0f))
  }

  test("builder-time extensions produce a session with the functions") {
    // verify the GraftExtensions wiring compiles against a builder even
    // though the shared harness session precludes creating it here
    val b = GraftSession.builder("local[2]", 2)
    assert(b != null)
  }
}
