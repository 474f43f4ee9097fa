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

  /** Candidate 1-2grams with stopword-boundary filtering (the reference
    * strips spaCy stopwords before ngram generation). */
  def candidates(text: String, maxNgram: Int = 2): Seq[String] = {
    val words = text.toLowerCase.split("\\W+")
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
    * (reference diversity = 0.7, top_n candidates). */
  def mmr(docVec: Array[Float], cands: Seq[(String, Array[Float])],
      topN: Int, diversity: Double): Seq[ScoredKeyword] = {
    val relevance = cands.map { case (kw, v) => kw -> cosine(docVec, v) }.toMap
    val selected = mutable.ArrayBuffer.empty[(String, Array[Float])]
    val remaining = mutable.ArrayBuffer(cands: _*)
    while (selected.length < math.min(topN, cands.length)
        && remaining.nonEmpty) {
      val best = remaining.maxBy { case (kw, v) =>
        val maxSim = if (selected.isEmpty) 0.0
          else selected.map(s => cosine(s._2, v)).max
        ((1 - diversity) * relevance(kw) - diversity * maxSim,
          kw) // deterministic tie-break on the keyword itself
      }
      selected += best
      remaining -= best
    }
    selected.map { case (kw, _) =>
      ScoredKeyword(kw, relevance(kw)) }.toSeq
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
