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
    val words = NonWord.split(text.toLowerCase)
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
}
