package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.UserActivity

/** user_related schema operators (reference alembic 4fcbfb7f3145 +
  * e354666f951d): api-key auth and usage analytics. */
class UserActivitySpec extends SparkSuite {

  private def sha(s: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))

  test("authenticate: active key matches by digest, inactive and " +
      "unknown keys yield null register_email") {
    val s = initSpark()
    import s.implicits._
    val keys = Seq(
      ("k1", "prod", true, "alice@example.org", sha("secret-1")),
      ("k2", "old", false, "bob@example.org", sha("secret-2")))
      .toDF("id", "title", "is_active", "register_email", "digest")
    val requests = Seq(
      ("r1", "secret-1"), // active key
      ("r2", "secret-2"), // right digest, inactive key
      ("r3", "wrong")) // unknown
      .toDF("id", "api_key")
    val out = UserActivity.authenticate(requests, "api_key", keys)
      .select("id", "register_email").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("r1") === "alice@example.org")
    assert(out("r2") === null)
    assert(out("r3") === null)
  }

  test("authenticate also accepts an already-hex string digest column " +
      "(review fix: hex() on a string column would hex its UTF-8 bytes " +
      "and silently reject every key)") {
    val s = initSpark()
    import s.implicits._
    val hexDigest = sha("secret-1").map("%02x".format(_)).mkString
    val keys = Seq(
      ("k1", "prod", true, "alice@example.org", hexDigest.toUpperCase))
      .toDF("id", "title", "is_active", "register_email", "digest")
    val requests = Seq(("r1", "secret-1"), ("r2", "nope"))
      .toDF("id", "api_key")
    val out = UserActivity.authenticate(requests, "api_key", keys)
      .select("id", "register_email").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("r1") === "alice@example.org")
    assert(out("r2") === null)
  }

  test("userUsage rolls up requests, errors, endpoints, session time " +
      "per inferred user") {
    val s = initSpark()
    import s.implicits._
    val users = Seq(("u1", null: Timestamp), ("u2", null: Timestamp))
      .toDF("id", "created_at")
    val sessions = Seq(
      ("s1", "u1", Timestamp.valueOf("2026-01-01 10:00:00"),
        Timestamp.valueOf("2026-01-01 10:10:00"), "h1"),
      ("s2", "u1", Timestamp.valueOf("2026-01-01 11:00:00"),
        Timestamp.valueOf("2026-01-01 11:05:00"), "h1"),
      ("s3", "u2", Timestamp.valueOf("2026-01-02 09:00:00"),
        Timestamp.valueOf("2026-01-02 09:01:00"), "h2"))
      .toDF("id", "inferred_user_id", "created_at", "end_at", "host")
    val reqs = Seq(
      ("q1", "s1", "/search", 200, null: String),
      ("q2", "s1", "/search", 500, "boom"),
      ("q3", "s1", "/docs", 200, null: String),
      ("q4", "s2", "/search", 404, "nope"),
      ("q5", "s3", "/docs", 200, null: String))
      .toDF("id", "session_id", "endpoint_name", "http_code", "message")
    val out = UserActivity.userUsage(reqs, sessions, users)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))).toMap
    assert(out("u1") === ((4L, 2L, 2, 900L))) // 10min + 5min sessions
    assert(out("u2") === ((1L, 0L, 1, 60L)))
  }
}
