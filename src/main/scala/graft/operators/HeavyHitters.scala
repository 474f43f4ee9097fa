package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.MisraGries

/** Exact frequent-items ("heavy hitters") over an exploded token
  * stream, in two bounded-shuffle passes:
  *
  *   1. CANDIDATES — a single Misra–Gries aggregation
  *      ([[graft.expr.MisraGries]], k counters) over all tokens. Map
  *      tasks keep k counters each; the shuffle carries k items per
  *      partition, not the census. MG guarantees every item with true
  *      count > n/k is in the summary (undercount ≤ n/(k+1) < n/k with
  *      k counters, and the bound is merge-stable — Agarwal et al.,
  *      PODS 2012), so the candidate set is a SUPERSET of the answer.
  *      The same aggregation row carries count(*) = n, so pass 1 is
  *      ONE job with a one-row result (bounded driver state: ≤ k
  *      strings).
  *   2. EXACT RECOUNT — re-scan tokens filtered to the ≤ k candidates
  *      (a broadcast IN-set; the filter prunes BEFORE any shuffle), an
  *      exact groupBy over at most k distinct keys, then the integer
  *      threshold `cnt * k > n` (no float division — exactly DuckDB's
  *      `HAVING count(*) * k > n`).
  *
  * Net: the full token stream is scanned twice but SHUFFLED never —
  * pass 1 moves k items/partition, pass 2 moves only candidate rows
  * (≤ k keys). The classic census plan shuffles every token once; at
  * 100 TB of tokens that is the job, and this isn't.
  *
  * Exactness: superset + exact recount + exact threshold ⇒ output ==
  * the census answer, row for row — which is why q116 carries a full
  * DuckDB hash oracle, not an approximate-tier check.
  */
object HeavyHitters {

  /** Tokens = lowercased whitespace split of `textCol` (the engine's
    * standard tokenizer — same split every text operator uses). */
  private def tokens(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(trim(col(textCol))), "\\s+"))
        .as("token"))
      .where(col("token") =!= "")

  /** Items whose token frequency strictly exceeds n/k, with exact
    * counts. Output: (token, cnt), the exact census rows above the
    * threshold. */
  def frequentTokens(docs: DataFrame, textCol: String, k: Int)
      : DataFrame = {
    require(k > 1, "k must exceed 1")
    val toks = tokens(docs, textCol)
    // pass 1: one aggregation row -> (candidate array, n); ≤ k strings
    // of bounded driver state, the only driver materialization here.
    val row = toks
      .agg(MisraGries.candidates(col("token"), k).as("cand"),
        count(lit(1)).as("n"))
      .head()
    val cand = row.getSeq[String](0)
    val n = row.getLong(1)
    if (cand.isEmpty) return toks.sparkSession
      .emptyDataFrame.select(lit("").as("token"), lit(0L).as("cnt"))
      .limit(0)
    // pass 2: candidate-pruned exact recount; isin over ≤ k literals
    // stays a scan-side predicate (no join, no census shuffle).
    toks.where(col("token").isin(cand: _*))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > n)
  }
}
