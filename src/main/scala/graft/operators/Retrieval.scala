package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval + rank fusion — the search side of a curation
  * stack: BM25 scoring feeds quality retrieval, search-based
  * decontamination, and (fused with an embedding ranking) the hybrid
  * retrieval every RAG/data-selection pipeline runs.
  *
  * Scale shape (the whole point at 100 TB):
  *   - the corpus token stream is filtered to the QUERY'S terms
  *     map-side, BEFORE any exchange — the only corpus-wide shuffle
  *     carries (doc, term) rows for query terms only, a stream whose
  *     size is bounded by |docs containing a query term| x |terms|,
  *     not by corpus tokens;
  *   - document frequency / corpus size / average length are
  *     term-count- or single-row-sized aggregates, joined back by
  *     broadcast — the corpus itself is never joined or re-shuffled;
  *   - Catalyst's exchange reuse serves the tf table to both its
  *     consumers (score join + df agg) from one shuffle.
  *
  * Determinism discipline: per-(doc,term) BM25 contributions are
  * quantized to LONG micro-units (floor(x*1e6 + 0.5)) before the
  * per-doc sum, so the summation is integer — associative, partition-
  * order-free, and byte-comparable cross-engine. The only float work
  * is the per-term expression itself, written operator-for-operator
  * identically in the DuckDB oracle. */
object Retrieval {

  /** BM25 (Robertson et al., Okapi; the Lucene `+1` idf form so every
    * term's contribution is positive) of every document containing at
    * least one of `queryTerms`. Output: (idCol, n_terms = distinct
    * query terms present, score_fp6 = BM25 in integer micro-units).
    *
    * Tokenization matches the engine's census convention (q98):
    * lowercase, trim, split on \s+, drop empties. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      w => length(w) > 0)
    // null text drops (size(split(null)) is -1, which would poison the
    // corpus length scalar); the oracle filters identically
    val proj = docs.where(col(textCol).isNotNull)
      .select(col(idCol), size(toks).as("__dl"), toks.as("__toks"))
    // corpus-level scalars: ONE row (N, total length) — broadcast
    val stats = proj.agg(count(lit(1)).as("__n"),
      sum(col("__dl")).as("__tot"))
    // (doc, term) tf — the filter runs inside the scan projection,
    // so the exchange only ever carries query-term hits
    val tf = proj
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("__w"))
      .where(col("__w").isInCollection(queryTerms))
      .groupBy(col(idCol), col("__dl"), col("__w"))
      .agg(count(lit(1)).as("__tf"))
    // document frequency: |queryTerms| rows, computed FROM the tf
    // exchange (reused, not a second corpus pass)
    val dfreq = tf.groupBy("__w")
      .agg(countDistinct(col(idCol)).as("__df"))
    // float expression mirrored verbatim in the oracle SQL:
    //   idf  = ln((n - df + 0.5) / (df + 0.5) + 1)
    //   term = idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * dl/avgdl))
    val idf = log((col("__n") - col("__df") + 0.5) /
      (col("__df") + 0.5) + 1.0)
    val avgdl = col("__tot").cast("double") / col("__n")
    val term = idf * (col("__tf") * (k1 + 1)) /
      (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / avgdl))
    tf.join(broadcast(dfreq), "__w")
      .crossJoin(broadcast(stats))
      .withColumn("__term_fp6",
        floor(term * 1e6 + 0.5).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("__term_fp6")).as("score_fp6"))
  }

  /** TF-IDF top-k terms per document — the keyword-profile staple
    * (doc descriptors, index-time term selection, cluster labeling).
    * Smooth idf (sklearn's): ln((n + 1) / (df + 1)) + 1, score =
    * tf * idf, quantized to LONG micro-units on the rounded score so
    * the ranking is integer (ties broken by term asc).
    *
    * Scale shape — three shuffles, none corpus-token-sized twice:
    *   1. (doc, term) tf groupBy — THE corpus-sized exchange;
    *   2. document frequency as a count window over the tf table
    *      partitioned by term (reuses the tf rows, not a second
    *      corpus pass, and avoids a vocab-dim join);
    *   3. the per-doc top-k via the bounded-heap TypedImperativeAgg
    *      (TopK) — each map task ships <= k rows per doc, not every
    *      (doc, term) row through a sort window.
    * Corpus doc count is a one-row broadcast. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      w => length(w) > 0)
    val base = docs.where(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks"))
    val stats = base.agg(count(lit(1)).as("__n"))
    val tf = base
      .select(col(idCol), explode(col("__toks")).as("__w"))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__tf"))
    // tf has one row per (doc, term), so df(term) = row count per term
    val withDf = tf.withColumn("__df",
      count(lit(1)).over(Window.partitionBy(col("__w"))))
    val scored = withDf.crossJoin(broadcast(stats))
      .withColumn("__score_fp6", floor(col("__tf") *
          (log((col("__n") + 1.0) / (col("__df") + 1.0)) + 1.0)
          * 1e6 + 0.5).cast("long"))
    scored.groupBy(col(idCol))
      .agg(graft.expr.TopK.topKBy(
        struct(col("__score_fp6"), col("__w"), col("__tf"),
          col("__df")), k,
        descending = Seq(true, false, true, true)).as("__top"))
      .select(col(idCol), posexplode(col("__top")).as(Seq("__pos", "__t")))
      .select(col(idCol), col("__t.__w").as("term"),
        col("__t.__tf").as("tf"), col("__t.__df").as("df"),
        col("__t.__score_fp6").as("score_fp6"),
        (col("__pos") + 1).cast("int").as("rnk"))
  }

  /** Top-N under a caller-chosen TOTAL order (include an id
    * tie-break — a partial order would make ranks partitioning-
    * dependent), with a 1-based `rank` column. orderBy+limit first so
    * Spark plans TakeOrderedAndProject (parallel per-partition top-N,
    * no global sort shuffle); the unpartitioned rank window then runs
    * on the already-bounded N rows, where single-task is by design. */
  def rankBy(df: DataFrame, order: Seq[Column], topN: Int): DataFrame =
    df.orderBy(order: _*).limit(topN)
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)))

  /** Reciprocal-rank fusion (Cormack et al. 2009): fuse rankings by
    * sum(1/(k + rank)). INTEGER form: each contribution is
    * 1e9 DIV (k + rank) — fused scores are exact longs, so fusion is
    * float-free end-to-end and cross-engine byte-stable.
    *
    * Inputs: (idCol, rank) frames, already truncated to their top-N
    * (rankings are top-N-sized, not corpus-sized — the fusion join is
    * a join of result lists and broadcasts at any corpus scale).
    * Output: (idCol, rank_1..rank_m nullable, rrf_fp9), one row per id
    * present in ANY ranking; an absent id contributes nothing from
    * that system. */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int = 60)
      : DataFrame = {
    require(rankings.size >= 2, "rrfFuse needs at least two rankings")
    val renamed = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol), col("rank").as(s"rank_${i + 1}"))
    }
    val joined = renamed.reduce { (a, b) =>
      a.join(b, Seq(idCol), "full_outer")
    }
    val contribs = rankings.indices.map { i =>
      val r = col(s"rank_${i + 1}")
      // 1e9 DIV (k+rank). Spark's `/` is double division even on
      // longs; floor of it is still EXACT here: the true quotient is
      // a rational with denominator k+rank (couple hundred at most),
      // so the correctly-rounded double is never on the wrong side of
      // an integer boundary
      when(r.isNotNull,
        floor(lit(1.0e9) / (r.cast("double") + k)).cast("long"))
        .otherwise(0L)
    }
    joined.withColumn("rrf_fp9", contribs.reduce(_ + _))
  }

  /** Per-query ranking quality against a relevance dimension — the
    * eval loop every retrieval/data-selection pipeline closes with:
    * hits@k, recall@k, MRR, nDCG@k (binary relevance, the standard
    * 1/log2(rank+1) discount).
    *
    * `ranking`: (qidCol, idCol, rank) rows (a rankBy/bruteForceTopK
    * output); `relevant`: (qidCol, idCol) pairs. Queries with zero
    * relevant pairs have no definable recall/IDCG and emit no row
    * (document the denominator, don't fake it). Scale: rankings are
    * top-N-sized per query, the relevance join hits only ranked rows,
    * and every aggregate is per-query — nothing here is corpus-sized.
    *
    * Determinism: hits/ranks are integers; MRR is exact fixed-point
    * (1e9 DIV first-hit-rank, the rrfFuse discipline); the two float
    * outputs (recall, ndcg) are 4-dp rounded with IDCG's generated
    * sequence folded left-to-right — each float op mirrored in the
    * oracle. */
  def rankingMetrics(ranking: DataFrame, relevant: DataFrame,
      qidCol: String, idCol: String, k: Int): DataFrame = {
    val totals = relevant.groupBy(col(qidCol))
      .agg(count(lit(1)).as("n_relevant"))
    val hits = ranking.where(col("rank") <= k)
      .join(relevant, Seq(qidCol, idCol))
      .groupBy(col(qidCol))
      .agg(count(lit(1)).as("hits"),
        min(col("rank")).as("__first"),
        sum(lit(1.0) / log2(col("rank") + 1)).as("__dcg"))
    val idcg = aggregate(
      transform(sequence(lit(1),
          least(col("n_relevant"), lit(k.toLong)).cast("int")),
        i => lit(1.0) / log2(i + 1)),
      lit(0.0), (acc, x) => acc + x)
    totals.join(hits, Seq(qidCol), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("mrr_fp9",
        when(col("__first").isNotNull,
          floor(lit(1.0e9) / col("__first").cast("double")).cast("long"))
          .otherwise(0L))
      .withColumn("recall_at_k",
        round(col("hits").cast("double") /
          col("n_relevant").cast("double") + 1e-9, 4))
      .withColumn("ndcg_at_k",
        round(coalesce(col("__dcg"), lit(0.0)) / idcg + 1e-9, 4))
      .drop("__first", "__dcg")
  }

  /** Politeness schedule for a crawl frontier: per-host sequential
    * fetch slots spaced by that host's crawl delay (the
    * [[graft.sources.Robots.crawlDelay]] output is the natural
    * `delays` feed). `delays` is (hostCol, delay_ms) — a per-host
    * dimension, broadcast; hosts without a row get `defaultDelayMs`.
    * Output adds (fetch_seq = 1-based position in the host's queue,
    * fetch_at_ms = (fetch_seq-1) * delay).
    *
    * Scale: ONE shuffle, on host (the window partition). Per-host
    * sequencing is semantically serial — politeness IS a per-host
    * queue — so host skew is inherent to the contract, not a plan
    * defect; the frontier is never globally ordered. `order` must be
    * a total order within host (include the url) or slot assignment
    * is partitioning-dependent. */
  def politenessSchedule(frontier: DataFrame, hostCol: String,
      order: Seq[Column], delays: DataFrame, delayMsCol: String,
      defaultDelayMs: Long): DataFrame = {
    val dim = delays.select(col(hostCol),
      col(delayMsCol).as("__delay_ms"))
    val w = Window.partitionBy(col(hostCol)).orderBy(order: _*)
    frontier.join(broadcast(dim), Seq(hostCol), "left")
      .withColumn("fetch_seq", row_number().over(w))
      .withColumn("fetch_at_ms", (col("fetch_seq") - 1) *
        coalesce(col("__delay_ms"), lit(defaultDelayMs)))
      .drop("__delay_ms")
  }
}
