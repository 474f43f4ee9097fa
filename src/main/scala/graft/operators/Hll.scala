package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CROSS-ENGINE-portable HyperLogLog (Flajolet et al. 2007) — the
  * oracle-able form of `approx_count_distinct` (A5's scale variant).
  * Spark's built-in HLL++ sketch is engine-local (its register layout and
  * bias tables can't be replayed elsewhere), which is why q45 sat in the
  * rows-only tier since round 2. This variant pins every primitive so an
  * independent SQL engine derives the IDENTICAL estimate:
  *
  *   item hash   x = first 15 hex chars of md5(cast(item as string)) as a
  *               60-bit integer (the portable-signer base hash of the
  *               minhash/simhash family — ONE hash convention repo-wide)
  *   registers   m = 256 (p = 8): bucket = x div 2^52 (top 8 bits),
  *               w = x mod 2^52 (low 52 bits),
  *               rho(w) = 53 - msb_position(w) = 53 - length(bin(w)),
  *               w = 0 -> 53; register M_b = max rho over the bucket
  *   indicator   EXACT integer arithmetic: S = sum over all 256 buckets
  *               of 2^(53 - M_b) scaled by 2^53 — each term is a long
  *               shift (absent buckets contribute 2^53), the sum fits in
  *               62 bits, and integer sums are associative, so shuffle
  *               order can never flip a low bit the way a float sum could
  *   estimate    E = alpha_256 * 256^2 * 2^53 / S with the standard
  *               small-range correction E <= 2.5m & V > 0 ->
  *               m * ln(m / V). All float ops run on exact integer inputs
  *               in a pinned left-associative order, so both engines'
  *               correctly-rounded IEEE doubles agree bit-for-bit (ln is
  *               the one ~1-ulp libm call; the 1-dp output rounding gives
  *               it 10 orders of magnitude of slack).
  *
  * Scale shape: identical to production HLL — per-(key, bucket) max is
  * one partial-aggregating shuffle with at most 256 register rows per key
  * (merge = max per bucket, the standard sketch-merge), then a key-local
  * fold. No driver state, no collect. */
object Hll {

  private val M = 256          // registers (p = 8 of the 60 hash bits)
  private val W = 1L << 52     // low-bits modulus
  private val P53 = 1L << 53   // integer scale for the 2^-M_b sum

  /** Per-`keyCol` portable HLL distinct-count estimate of `item`,
    * emitted as a 1-dp double column named `out`. */
  def approxCountDistinct(df: DataFrame, keyCol: String, item: Column,
      out: String): DataFrame = {
    val hashed = df.select(col(keyCol),
      conv(substr(md5(item.cast("string").cast("binary")), lit(1), lit(15)), 16, 10)
        .cast("long").as("h"))
    val regs = hashed
      .select(col(keyCol), expr(s"h DIV $W").as("bucket"),
        expr(s"h % $W").as("w"))
      .withColumn("rho",
        when(col("w") === 0L, lit(53))
          .otherwise(lit(53) - length(bin(col("w")))))
      .groupBy(col(keyCol), col("bucket"))
      .agg(max("rho").as("m"))
    regs.groupBy(col(keyCol))
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m AS INT))")).as("sp"),
        count(lit(1)).as("nb"))
      .withColumn("s", col("sp") + (lit(M.toLong) - col("nb")) * lit(P53))
      .withColumn("v", lit(M.toLong) - col("nb"))
      // pinned literal order, FORCED double: Scala double lits (not
      // expr() text, whose fractional literals Spark parses as DECIMAL
      // and divides under decimal-scale rounding) so every step is the
      // same IEEE double op DuckDB executes — its decimal/decimal
      // division promotes to DOUBLE, verified equal to pure-double
      // left-to-right evaluation
      .withColumn("e_raw",
        lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) * lit(65536.0)
          * lit(9007199254740992.0) / col("s").cast("double"))
      .withColumn("e",
        when(col("e_raw") <= 640.0 && col("v") > 0L,
          lit(256.0) * log(lit(256.0) / col("v")))
          .otherwise(col("e_raw")))
      .select(col(keyCol), round(col("e") + 1e-9, 1).as(out))
  }

  /** The matching oracle-SQL text for one HLL estimate over `events` —
    * kept NEXT to the Spark algebra it mirrors so they can't drift. */
  def oracleSql(itemExpr: String, out: String): String =
    s"""SELECT event_type,
         round(CASE WHEN e_raw <= 640.0 AND v > 0
             THEN 256.0 * ln(256.0 / v) ELSE e_raw END + 1e-9, 1) AS $out
       FROM (
         SELECT event_type,
           0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0 / s
             AS e_raw, v
         FROM (
           SELECT event_type,
             sum(1::BIGINT << (53 - m))
               + (256 - count(*)) * 9007199254740992::BIGINT AS s,
             256 - count(*) AS v
           FROM (
             SELECT event_type, h // 4503599627370496 AS bucket,
               max(CASE WHEN h % 4503599627370496 = 0 THEN 53
                   ELSE 53 - length(bin(h % 4503599627370496)) END) AS m
             FROM (SELECT event_type,
                     ('0x' || substr(md5($itemExpr), 1, 15))::BIGINT AS h
                   FROM events)
             GROUP BY event_type, bucket)
           GROUP BY event_type))"""
}
