package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.functions.{LangId, TextMetrics}
import graft.ml.Chunker

/** Char-trigram lang-id (round 10): the Cavnar-Trenkle rank-profile
  * model must (a) identify every profile language's own sample, (b)
  * beat the marker-word heuristic on SHORT snippets of the reference's
  * own fixture prose — the regime the r9 review called out ("weaker on
  * short/mixed text") — and (c) stay deterministic and total. Its
  * cross-engine exactness is pinned separately by the q123 oracle. */
class LangIdSpec extends SparkSuite {

  private def fixture(name: String): String =
    new String(Files.readAllBytes(Paths.get(
      getClass.getResource(s"/fixtures/$name").toURI)), "UTF-8")

  private def prose(html: String): String = Chunker.normalizeWs(
    html.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", " ")
      .replaceAll("(?s)<[^>]+>", " ")
      .replaceAll("&[a-zA-Z#0-9]+;", " "))

  /** Short snippets (8 words) — too short for reliable whole-word
    * marker hits, plenty for trigram mass. */
  private def snippets(text: String, words: Int = 8): Seq[String] =
    text.split("\\s+").filter(_.nonEmpty).grouped(words)
      .map(_.mkString(" ")).filter(_.length > 20).toSeq

  test("every profile language identifies its own sample text") {
    LangId.samples.foreach { case (lang, sample) =>
      assert(LangId.detect(sample) === lang, s"sample of $lang")
    }
  }

  test("deterministic and total: und on empty/null/digits, stable " +
      "across calls") {
    assert(LangId.detect("") === "und")
    assert(LangId.detect(null) === "und")
    assert(LangId.detect("12345 67 89 ... !!") === "und")
    val t = "The committee considered the proposal carefully."
    assert(LangId.detect(t) === LangId.detect(t))
    assert(LangId.detect(t) === "en")
  }

  test("beats the marker-word heuristic on short snippets of the " +
      "reference's own fixture prose (fr + en)") {
    val s = initSpark()
    import s.implicits._
    // Ground truth needs the fixtures' ARTICLE regions, not whole
    // pages: the OE fixture is an English chapter inside French
    // OpenEdition chrome ("Rechercher", "Table des matières", ...),
    // and the IRD page carries a ~200k-char speech-synthesis voice
    // menu ("Urdu+RicishayMax2 (ur)" x hundreds) before the French
    // article — labeling those by page language would grade noise.
    val oeAll = prose(fixture("oe_book_chapter.html"))
    val oeStart = oeAll.indexOf("Episodes in the history of Latin")
    val oeEnd = oeAll.lastIndexOf("Notes de bas de page")
    assert(oeStart >= 0 && oeEnd > oeStart, "OE chapter body markers")
    val irdAll = prose(fixture("page_ird_le_mag.html"))
    val irdStart = irdAll.indexOf("Accéder à une aide sociale")
    assert(irdStart >= 0, "IRD article body marker")
    val labeled =
      snippets(irdAll.substring(irdStart)).map(("fr", _)) ++
      snippets(oeAll.substring(oeStart, oeEnd)).map(("en", _))
    assert(labeled.size > 100, s"fixture snippet pool: ${labeled.size}")
    val df = labeled.toDF("truth", "snippet")
      .withColumn("trigram", LangId.detectLang(col("snippet")))
      .withColumn("heuristic",
        TextMetrics.langIdHeuristic(col("snippet")))
      .cache()
    def acc(c: String): Double =
      df.where(col(c) === col("truth")).count().toDouble / labeled.size
    val (tri, heu) = (acc("trigram"), acc("heuristic"))
    info(f"snippet accuracy: trigram=$tri%.3f heuristic=$heu%.3f " +
      f"(n=${labeled.size})")
    // MEASURED at pinning time: trigram 0.893 vs heuristic 0.729.
    // Part of the residual is ground-truth noise, not model error —
    // the fixtures are genuinely mixed ("Indian Institute of
    // Technology" inside the French article, Spanish citation titles
    // inside the English chapter), and detecting THOSE by content is
    // the right answer with the wrong label. Floor one notch below
    // measurement.
    assert(tri > heu,
      f"trigram ($tri%.3f) must beat the marker heuristic ($heu%.3f)")
    assert(tri >= 0.85, f"trigram accuracy floor: $tri%.3f")
    df.unpersist()
  }
}
