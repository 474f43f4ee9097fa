package graft.ml

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Keyword extraction with MMR diversity (reference M6:
  * modules/keywords_extractor.py:24-57 — KeyBERT: candidate 1-2grams,
  * embed, cosine vs document embedding, MMR re-rank with diversity 0.7,
  * keep score > 0.5).
  *
  * Row-local (each document's candidate set is small): a UDF running the
  * exact MMR loop over stub-embedded candidates. At corpus scale this
  * parallelizes per document with no shuffle; the downstream keyword-dim
  * upsert (reference J9) is Merge.insertIfAbsentDf.
  */
object Keywords {

  case class ScoredKeyword(keyword: String, score: Double)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  val defaultStopwords: Set[String] = Set(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "by", "at", "be", "this", "are", "or", "from")

  private val NonWord = java.util.regex.Pattern.compile("\\W+")

  /** Candidate 1-2grams with stopword-boundary filtering (the reference
    * strips spaCy stopwords before ngram generation). */
  def candidates(text: String, maxNgram: Int = 2): Seq[String] = {
    val words = NonWord.split(text.toLowerCase(java.util.Locale.ROOT))
      .filter(w => w.nonEmpty && !defaultStopwords.contains(w))
    val out = mutable.LinkedHashSet.empty[String]
    (1 to maxNgram).foreach { n =>
      words.sliding(n).foreach { g =>
        if (g.length == n) out += g.mkString(" ")
      }
    }
    out.toSeq
  }

  /** MMR re-ranking: greedily pick argmax of
    * (1-diversity)*relevance - diversity*maxSimToSelected
    * (reference diversity = 0.7, top_n candidates).
    *
    * Incremental formulation: a per-candidate running max-sim array is
    * updated with only the NEWLY selected vector each round — O(topN*|C|)
    * cosines instead of the naive O(topN^2*|C|) — and flat primitive
    * arrays instead of boxed maps (this loop runs once per document
    * across the whole corpus). Deterministic tie-break on the keyword. */
  def mmr(docVec: Array[Float], cands: Seq[(String, Array[Float])],
      topN: Int, diversity: Double): Seq[ScoredKeyword] = {
    val m = cands.length
    val kws = new Array[String](m)
    val vecs = new Array[Array[Float]](m)
    var i = 0
    cands.foreach { case (kw, v) => kws(i) = kw; vecs(i) = v; i += 1 }
    val relevance = Array.tabulate(m)(j => cosine(docVec, vecs(j)))
    val maxSim = new Array[Double](m)
    val taken = new Array[Boolean](m)
    val picks = mutable.ArrayBuffer.empty[Int]
    val want = math.min(topN, m)
    var round = 0
    while (round < want) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < m) {
        if (!taken(j)) {
          val s = (1 - diversity) * relevance(j) -
            (if (round == 0) 0.0 else diversity * maxSim(j))
          if (s > bestScore ||
              (s == bestScore && (best < 0 || kws(j) > kws(best)))) {
            bestScore = s; best = j
          }
        }
        j += 1
      }
      taken(best) = true
      picks += best
      // fold the new pick into every survivor's running max-sim
      j = 0
      while (j < m) {
        if (!taken(j)) {
          val c = cosine(vecs(best), vecs(j))
          if (c > maxSim(j)) maxSim(j) = c
        }
        j += 1
      }
      round += 1
    }
    picks.map(j => ScoredKeyword(kws(j), relevance(j))).toSeq
  }

  /** Full extractor UDF: text -> array<struct<keyword,score>> with
    * score > minScore, MMR-diverse (reference score>0.5, diversity 0.7).
    * Embeds with the stub embedder (swap via ModelRegistry for a real
    * backend). */
  def extractUdf(dim: Int, topN: Int = 10, diversity: Double = 0.7,
      minScore: Double = 0.0): UserDefinedFunction =
    udf { (text: String) =>
      if (text == null || text.trim.isEmpty) Seq.empty[ScoredKeyword]
      else {
        val docVec = StubEmbedder.embed(text, dim)
        val cands = candidates(text)
          .map(kw => kw -> StubEmbedder.embed(kw, dim))
        mmr(docVec, cands, topN, diversity)
          .filter(_.score > minScore)
      }
    }

  def extract(text: Column, dim: Int, topN: Int = 10,
      diversity: Double = 0.7, minScore: Double = 0.0): Column =
    extractUdf(dim, topN, diversity, minScore)(text)

  // ---- CROSS-ENGINE-portable variant (q39's promotion out of the
  // rows-only tier; the q44 contract-pinning move applied to KeyBERT/
  // MMR). The murmur stub embedding swaps for the md5 feature-hash
  // INTEGER embedding: every vector entry is a small integer carried
  // exactly in float32, so every cosine is (exact integer sums) ->
  // sqrt/div — correctly-rounded IEEE ops on exact inputs, identical in
  // any engine. The MMR loop itself then runs on bit-identical doubles,
  // so the greedy picks, the (score DESC, keyword DESC) tie-break, and
  // the reported relevances all replay in SQL (Keywords.oracleSql
  // unrolls the topN rounds). ----

  /** md5 feature-hash integer vector over `tokens` (the q44 algebra,
    * \W+ tokens): token occurrence adds ±1 to 2 of 64 buckets via
    * h_k = md5Top60(k + "_" + token). Integer-valued floats — exact. */
  private def intVec(tokens: Array[String]): Array[Float] = {
    val v = new Array[Float](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    tokens.foreach { t =>
      var k = 0
      while (k < 2) {
        val h = graft.operators.Dedup.md5Top60(md, s"${k}_$t")
        v((h % 64).toInt) += (if ((h / 64) % 2 == 0L) 1f else -1f)
        k += 1
      }
    }
    v
  }

  def extractPortableUdf(topN: Int = 5, diversity: Double = 0.7)
      : UserDefinedFunction =
    udf { (text: String) =>
      if (text == null || text.trim.isEmpty) Seq.empty[ScoredKeyword]
      else {
        val toks = NonWord.split(text.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)
        val docVec = intVec(toks)
        val cands = candidates(text)
          .map(kw => kw -> intVec(kw.split(' ')))
        mmr(docVec, cands, topN, diversity).filter(_.score > 0.0)
      }
    }

  def extractPortable(text: Column, topN: Int = 5,
      diversity: Double = 0.7): Column =
    extractPortableUdf(topN, diversity)(text)

  /** Oracle-SQL generator: the DuckDB replay of `extractPortable` over
    * `documents` — kept NEXT to the extractor so they can't drift. The
    * greedy MMR loop unrolls to `topN` MATERIALIZED stages; each stage
    * picks argmax of `(1 - d) * rel - d * maxsim` (the engine's exact
    * expression shape, so 1-0.7's representation error matches) with
    * the keyword-DESC tie-break, then folds the pick's cosine into the
    * survivors' running max-sim. All cosines derive from the exact
    * integer feature vectors, so every comparison sees bit-identical
    * doubles. Output: (doc_id, keyword, score 4-dp relevance > 0). */
  def oracleSql(topN: Int = 5, diversity: Double = 0.7): String = {
    val d = diversity.toString
    val stop = defaultStopwords.toSeq.sorted
      .map(w => s"'$w'").mkString(", ")
    def cosSql(num: String, n2a: String, n2b: String): String =
      s"""CASE WHEN sqrt($n2a) * sqrt($n2b) = 0 THEN 0.0
          ELSE $num / (sqrt($n2a) * sqrt($n2b)) END"""
    val sb = new StringBuilder
    sb ++= s"""dtok AS MATERIALIZED (
       SELECT doc_id, unnest(list_filter(
         string_split_regex(lower(text), '\\W+'), x -> x <> '')) AS t
       FROM documents),
     dfeat AS MATERIALIZED (
       SELECT doc_id, h % 64 AS bucket,
         sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS v
       FROM (SELECT doc_id,
               ('0x' || substr(md5(k || '_' || t), 1, 15))::BIGINT AS h
             FROM dtok CROSS JOIN (VALUES (0),(1)) kk(k))
       GROUP BY doc_id, bucket HAVING sum(CASE WHEN (h // 64) % 2 = 0
         THEN 1 ELSE -1 END) <> 0),
     dnorm AS MATERIALIZED (
       SELECT doc_id, sum(v * v)::BIGINT AS n2 FROM dfeat GROUP BY doc_id),
     fw AS MATERIALIZED (
       SELECT doc_id, list_filter(
         list_filter(string_split_regex(lower(text), '\\W+'),
           x -> x <> ''),
         x -> x NOT IN ($stop)) AS ws
       FROM documents),
     cands AS MATERIALIZED (
       SELECT DISTINCT doc_id, kw FROM (
         SELECT doc_id, unnest(list_concat(ws,
           list_filter(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
             i -> ws[i] || ' ' || ws[i + 1]), g -> g IS NOT NULL))) AS kw
         FROM fw)),
     ktok AS MATERIALIZED (
       SELECT doc_id, kw, unnest(string_split(kw, ' ')) AS t FROM cands),
     kfeat AS MATERIALIZED (
       SELECT doc_id, kw, h % 64 AS bucket,
         sum(CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS v
       FROM (SELECT doc_id, kw,
               ('0x' || substr(md5(k || '_' || t), 1, 15))::BIGINT AS h
             FROM ktok CROSS JOIN (VALUES (0),(1)) kk(k))
       GROUP BY doc_id, kw, bucket HAVING sum(CASE WHEN (h // 64) % 2 = 0
         THEN 1 ELSE -1 END) <> 0),
     knorm AS MATERIALIZED (
       SELECT doc_id, kw, sum(v * v)::BIGINT AS n2
       FROM kfeat GROUP BY doc_id, kw),
     rel AS MATERIALIZED (
       SELECT c.doc_id, c.kw,
         ${cosSql("COALESCE(n.num, 0)::DOUBLE",
            "COALESCE(dn.n2, 0)", "COALESCE(kn.n2, 0)")} AS rel
       FROM cands c
       LEFT JOIN (
         SELECT k.doc_id, k.kw, sum(k.v * f.v)::BIGINT AS num
         FROM kfeat k JOIN dfeat f
           ON f.doc_id = k.doc_id AND f.bucket = k.bucket
         GROUP BY k.doc_id, k.kw) n
         ON n.doc_id = c.doc_id AND n.kw = c.kw
       LEFT JOIN dnorm dn ON dn.doc_id = c.doc_id
       LEFT JOIN knorm kn ON kn.doc_id = c.doc_id AND kn.kw = c.kw),
     ms0 AS MATERIALIZED (
       SELECT doc_id, kw, 0.0 AS ms FROM cands)"""
    for (r <- 0 until topN) {
      // accumulated picks live in per-round tables; exclusion joins all
      val notPicked = (0 until r)
        .map(i => s"AND NOT EXISTS (SELECT 1 FROM pick$i p " +
          "WHERE p.doc_id = m.doc_id AND p.kw = m.kw)")
        .mkString(" ")
      sb ++= s""",
     pick$r AS MATERIALIZED (
       SELECT doc_id, kw FROM (
         SELECT m.doc_id, m.kw, row_number() OVER (
           PARTITION BY m.doc_id
           ORDER BY (1 - $d) * r.rel - $d * m.ms DESC, m.kw DESC) AS rn
         FROM ms$r m
         JOIN rel r ON r.doc_id = m.doc_id AND r.kw = m.kw
         WHERE 1 = 1 $notPicked) t
       WHERE rn = 1),
     ms${r + 1} AS MATERIALIZED (
       SELECT m.doc_id, m.kw,
         CASE WHEN p.doc_id IS NULL THEN m.ms
         ELSE greatest(m.ms, ${cosSql("COALESCE(x.num, 0)::DOUBLE",
            "COALESCE(ka.n2, 0)", "COALESCE(kb.n2, 0)")}) END AS ms
       FROM ms$r m
       LEFT JOIN pick$r p ON p.doc_id = m.doc_id
       LEFT JOIN (
         SELECT a.doc_id, a.kw AS kw_a, b.kw AS kw_b,
           sum(a.v * b.v)::BIGINT AS num
         FROM kfeat a
         JOIN pick$r pp ON pp.doc_id = a.doc_id
         JOIN kfeat b ON b.doc_id = a.doc_id AND b.kw = pp.kw
           AND b.bucket = a.bucket
         GROUP BY a.doc_id, a.kw, b.kw) x
         ON x.doc_id = m.doc_id AND x.kw_a = m.kw AND x.kw_b = p.kw
       LEFT JOIN knorm ka ON ka.doc_id = m.doc_id AND ka.kw = m.kw
       LEFT JOIN knorm kb ON kb.doc_id = m.doc_id AND kb.kw = p.kw)"""
    }
    val allPicks = (0 until topN)
      .map(r => s"SELECT doc_id, kw FROM pick$r")
      .mkString(" UNION ALL ")
    sb ++= s"""
     SELECT p.doc_id, p.kw AS keyword,
       round(r.rel + 1e-9, 4) AS score
     FROM ($allPicks) p
     JOIN rel r ON r.doc_id = p.doc_id AND r.kw = p.kw
     WHERE r.rel > 0"""
    sb.toString
  }
}
