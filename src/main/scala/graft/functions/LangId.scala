package graft.functions

import java.util.Locale

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Character-trigram language identification (Cavnar & Trenkle 1994,
  * "N-Gram-Based Text Categorization" — the rank-profile model): a
  * strictly stronger detector than [[TextMetrics.langIdHeuristic]]'s
  * marker-word counts on short or mixed text, where a snippet can
  * contain zero whole marker words but always contains trigrams. The
  * reference detects with lingua (computed_metadata.py:202-237), a
  * (publicly documented) rank-profile/ngram family model as well.
  *
  * PORTABLE by construction — the model is three pure tables, and the
  * scoring replays in generated oracle SQL (the q95/q87 discipline):
  *
  *  1. per-language PROFILE: trigrams of the embedded public sample
  *     text (UDHR Article 1 + the language's most common function
  *     words), ranked by (count desc, trigram asc) — deterministic, no
  *     floats anywhere
  *  2. per-document profile: its top [[DocTop]] trigrams, same ranking
  *  3. out-of-place distance: for each doc trigram, |docRank −
  *     langRank|, a missing trigram costing [[MissPenalty]]; lowest
  *     total wins, ties break on the language code, no trigrams at all
  *     is "und".
  *
  * Trigrams: lowercase (Locale.ROOT), words = maximal letter runs
  * (\p{L}+ — digits/punct are separators), each word padded with one
  * space per side, every 3-char window emitted (multiset). Row-local:
  * scales linearly, no shuffle, profiles are a few KB in the closure.
  */
object LangId {

  /** Doc profile depth (C&T use 300 for documents; 100 keeps the SQL
    * replay's window small and loses nothing at snippet length). */
  val DocTop = 100

  /** Out-of-place cost of a trigram absent from a language profile. */
  val MissPenalty = 300

  /** Public sample text per language: UDHR Article 1 (public domain,
    * the standard lang-id calibration text) + the language's most
    * common function words — function words dominate trigram mass in
    * real prose, which is what makes tiny profiles work. */
  private[graft] val samples: Map[String, String] = Map(
    "en" -> ("All human beings are born free and equal in dignity and " +
      "rights. They are endowed with reason and conscience and should " +
      "act towards one another in a spirit of brotherhood. " +
      "the of and to in is was he for it with as his on be at by this " +
      "had not are but from or have an they which one you were her " +
      "all she there would their we him been has when who will more " +
      "no if out so said what its about than them can only other new " +
      "some could time these two may then do first any my now such " +
      "Everyone is entitled to all the rights and freedoms set forth " +
      "in this Declaration, without distinction of any kind, such as " +
      "race, colour, sex, language, religion, political or other " +
      "opinion, national or social origin, property, birth or other " +
      "status."),
    "fr" -> ("Tous les êtres humains naissent libres et égaux en " +
      "dignité et en droits. Ils sont doués de raison et de conscience " +
      "et doivent agir les uns envers les autres dans un esprit de " +
      "fraternité. " +
      "le de la et les des en un du une que est pour qui dans a par " +
      "plus pas au sur ne se ce il sont avec ont cette mais ou comme " +
      "nous leur ses on tout aussi son aux être fait elle deux même " +
      "ces dont entre sans autres après avait ans celui " +
      "Chacun peut se prévaloir de tous les droits et de toutes les " +
      "libertés proclamés dans la présente Déclaration, sans " +
      "distinction aucune, notamment de race, de couleur, de sexe, de " +
      "langue, de religion, d'opinion politique ou de toute autre " +
      "opinion, d'origine nationale ou sociale, de fortune, de " +
      "naissance ou de toute autre situation."),
    "es" -> ("Todos los seres humanos nacen libres e iguales en " +
      "dignidad y derechos y, dotados como están de razón y " +
      "conciencia, deben comportarse fraternalmente los unos con los " +
      "otros. " +
      "de la que el en y a los se del las un por con no una su para " +
      "es al lo como más o pero sus le ha me si sin sobre este ya " +
      "entre cuando todo esta ser son dos también fue había era muy " +
      "años hasta desde está mi porque qué " +
      "Toda persona tiene todos los derechos y libertades proclamados " +
      "en esta Declaración, sin distinción alguna de raza, color, " +
      "sexo, idioma, religión, opinión política o de cualquier otra " +
      "índole, origen nacional o social, posición económica, " +
      "nacimiento o cualquier otra condición."),
    "de" -> ("Alle Menschen sind frei und gleich an Würde und Rechten " +
      "geboren. Sie sind mit Vernunft und Gewissen begabt und sollen " +
      "einander im Geist der Brüderlichkeit begegnen. " +
      "der die und in den von zu das mit sich des auf für ist im dem " +
      "nicht ein eine als auch es an werden aus er hat dass sie nach " +
      "wird bei einer um am sind noch wie einem über einen so zum war " +
      "haben nur oder aber vor zur bis mehr durch " +
      "Jeder hat Anspruch auf die in dieser Erklärung verkündeten " +
      "Rechte und Freiheiten ohne irgendeinen Unterschied, etwa nach " +
      "Rasse, Hautfarbe, Geschlecht, Sprache, Religion, politischer " +
      "oder sonstiger Überzeugung, nationaler oder sozialer Herkunft, " +
      "Vermögen, Geburt oder sonstigem Stand."),
    "it" -> ("Tutti gli esseri umani nascono liberi ed eguali in " +
      "dignità e diritti. Essi sono dotati di ragione e di coscienza " +
      "e devono agire gli uni verso gli altri in spirito di " +
      "fratellanza. " +
      "di e il la che a in un per è non sono da con si come le dei " +
      "del più anche lo ma una nel alla gli questo della suo ha sua " +
      "o se quello fa due anni essere stato nella quando tutto questa " +
      "loro molto può ancora dopo senza " +
      "Ad ogni individuo spettano tutti i diritti e tutte le libertà " +
      "enunciate nella presente Dichiarazione, senza distinzione " +
      "alcuna, per ragioni di razza, di colore, di sesso, di lingua, " +
      "di religione, di opinione politica o di altro genere, di " +
      "origine nazionale o sociale, di ricchezza, di nascita o di " +
      "altra condizione."),
    "pt" -> ("Todos os seres humanos nascem livres e iguais em " +
      "dignidade e em direitos. Dotados de razão e de consciência, " +
      "devem agir uns para com os outros em espírito de fraternidade. " +
      "de a o que e do da em um para é com não uma os no se na por " +
      "mais as dos como mas foi ao ele das tem à seu sua ou ser " +
      "quando muito há nos já está eu também só pelo pela até isso " +
      "ela entre era depois sem mesmo aos ter " +
      "Todos os seres humanos podem invocar os direitos e as " +
      "liberdades proclamados na presente Declaração, sem distinção " +
      "alguma, nomeadamente de raça, de cor, de sexo, de língua, de " +
      "religião, de opinião política ou outra, de origem nacional ou " +
      "social, de fortuna, de nascimento ou de qualquer outra " +
      "situação."))

  /** All padded trigrams of `text` (multiset, emission order). */
  private[graft] def trigrams(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val out = mutable.ArrayBuffer.empty[String]
    text.toLowerCase(Locale.ROOT).split("\\P{L}+").foreach { w =>
      if (w.nonEmpty) {
        val pw = " " + w + " "
        var i = 0
        while (i <= pw.length - 3) { out += pw.substring(i, i + 3); i += 1 }
      }
    }
    out.toSeq
  }

  /** (trigram -> rank) by (count desc, trigram asc), top `depth`. */
  private def rankProfile(text: String, depth: Int): Map[String, Int] = {
    val counts = mutable.HashMap.empty[String, Long]
    trigrams(text).foreach(t => counts.update(t, counts.getOrElse(t, 0L) + 1))
    counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(depth)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1) }.toMap
  }

  /** Language profiles, computed once per JVM from the sample tables —
    * a pure function of [[samples]], so every executor (and the
    * generated oracle SQL) derives the identical model. */
  lazy val profiles: Map[String, Map[String, Int]] =
    samples.map { case (lang, text) =>
      lang -> rankProfile(text, Int.MaxValue)
    }

  /** Detect the language of `text`: "und" when it has no letters. */
  def detect(text: String): String = {
    val doc = rankProfile(text, DocTop)
    if (doc.isEmpty) return "und"
    profiles.toSeq.sortBy(_._1).minBy { case (_, prof) =>
      doc.iterator.map { case (tri, dr) =>
        prof.get(tri) match {
          case Some(r) => math.abs(dr - r).toLong
          case None => MissPenalty.toLong
        }
      }.sum
      // minBy keeps the FIRST minimum of the lang-sorted seq: the tie
      // break is the lexicographically smallest language code
    }._1
  }

  def detectUdf: UserDefinedFunction = udf { (text: String) => detect(text) }

  def detectLang(text: Column): Column = detectUdf(text)

  /** Generated DuckDB oracle: the profile tables inlined as VALUES and
    * the exact rank/distance/argmin algebra replayed in SQL — kept
    * NEXT to the Scala model so they cannot drift (Bpe.oracleSql
    * discipline). `table`/`idCol`/`textCol` name the scored relation.
    * Emits (idCol, detected_lang). */
  def oracleSql(table: String = "documents", idCol: String = "doc_id",
      textCol: String = "text"): String = {
    val profRows = profiles.toSeq.sortBy(_._1).flatMap {
      case (lang, prof) => prof.toSeq.sortBy(_._2).map { case (tri, r) =>
        val esc = tri.replace("'", "''")
        s"('$lang', '$esc', $r)"
      }
    }.mkString(",\n           ")
    s"""WITH prof(lang, tri, r) AS MATERIALIZED (
         VALUES $profRows),
       words AS (
         SELECT $idCol AS id, unnest(list_filter(
           string_split_regex(lower($textCol), '[^\\p{L}]+'),
           w -> w <> '')) AS w
         FROM $table),
       tris AS (
         SELECT id, substr(' ' || w || ' ', i, 3) AS tri
         FROM words, LATERAL unnest(
           range(1, length(' ' || w || ' ') - 1)) t(i)),
       doc_prof AS MATERIALIZED (
         SELECT id, tri, dr FROM (
           SELECT id, tri, row_number() OVER (
             PARTITION BY id ORDER BY cnt DESC, tri ASC) AS dr
           FROM (SELECT id, tri, count(*) AS cnt
                 FROM tris GROUP BY id, tri))
         WHERE dr <= $DocTop),
       dist AS (
         SELECT d.id, l.lang,
           sum(CASE WHEN p.r IS NULL THEN $MissPenalty
               ELSE abs(d.dr - p.r) END)::BIGINT AS dist
         FROM doc_prof d
         CROSS JOIN (SELECT DISTINCT lang FROM prof) l
         LEFT JOIN prof p ON p.lang = l.lang AND p.tri = d.tri
         GROUP BY d.id, l.lang),
       best AS (
         SELECT id, lang, row_number() OVER (
           PARTITION BY id ORDER BY dist ASC, lang ASC) AS rn
         FROM dist)
       SELECT t.$idCol, coalesce(b.lang, 'und') AS detected_lang
       FROM $table t
       LEFT JOIN best b ON b.id = t.$idCol AND b.rn = 1"""
  }
}
