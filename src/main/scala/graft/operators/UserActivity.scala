package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Operators over the reference's `user_related` schema (alembic
  * migrations 4fcbfb7f3145 api_key_management, e354666f951d
  * inferred_user/session/endpoint_request) — the product-API side of the
  * data model: api-key authentication and usage analytics.
  *
  * Scale notes: the key table is tiny (one row per registered client) —
  * always broadcast; the request log is the big side and is only ever
  * scanned/aggregated, never collected.
  */
object UserActivity {

  /** SHA-256 digest of a presented api key, matching the stored
    * `digest` column's contract (keys are hashed at rest; equality on
    * digests authenticates without materializing plaintext keys
    * warehouse-side). Codegen'd built-in, no UDF. */
  def keyDigest(plainKey: Column): Column = sha2(plainKey, 256)

  /** Authenticate presented keys against the key-management table:
    * requests keep their columns plus `register_email` of the matching
    * ACTIVE key, or null when unauthenticated (left join — callers
    * route rejects to their error channel, reference P-style gate).
    * `keys.digest` may be binary (the schema's form — hex-encoded for
    * the compare) or an already-hex string (compared as-is after
    * lowercasing; hex()-ing a string column would hex its UTF-8 bytes
    * and never match). */
  def authenticate(requests: DataFrame, plainKeyCol: String,
      keys: DataFrame): DataFrame = {
    val digestIsString = keys.schema("digest").dataType ==
      org.apache.spark.sql.types.StringType
    val digestHex =
      if (digestIsString) lower(col("digest"))
      else lower(hex(col("digest")))
    val activeKeys = keys.where(col("is_active"))
      .select(digestHex.as("__digest"), col("register_email"))
    requests
      .withColumn("__digest", lower(keyDigest(col(plainKeyCol))))
      .join(broadcast(activeKeys), Seq("__digest"), "left")
      .drop("__digest")
  }

  /** Per-inferred-user usage rollup: request volume, error volume
    * (4xx/5xx), distinct endpoints, and total session seconds — the
    * aggregate the product API's analytics read models need. One
    * shuffle per grouping stage; sessions and users join broadcast
    * (dimension-sized) unless the caller's session table is huge, in
    * which case Catalyst's size stats pick sort-merge on their own. */
  def userUsage(endpointRequests: DataFrame, sessions: DataFrame,
      users: DataFrame): DataFrame = {
    val perSession = endpointRequests.groupBy("session_id").agg(
      count(lit(1)).as("requests"),
      sum(when(col("http_code") >= 400, 1L).otherwise(0L)).as("errors"),
      collect_set(col("endpoint_name")).as("eps"))
    val withUser = perSession.join(
        sessions.select(col("id").as("session_id"),
          col("inferred_user_id"),
          (unix_timestamp(col("end_at")) -
            unix_timestamp(col("created_at"))).as("session_secs")),
        "session_id")
    withUser.groupBy("inferred_user_id").agg(
        sum(col("requests")).as("requests"),
        sum(col("errors")).as("errors"),
        size(array_distinct(flatten(collect_list(col("eps")))))
          .as("distinct_endpoints"),
        sum(col("session_secs")).as("total_session_secs"))
      .join(users.select(col("id").as("inferred_user_id")), "inferred_user_id")
  }
}
