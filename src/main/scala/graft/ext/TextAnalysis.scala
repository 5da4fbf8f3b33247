package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization
  * counts, quality scoring, language ID, document fingerprinting. All are
  * native column expressions (codegen'd, no UDFs) so they run at scan
  * throughput — the operators a 100 TB text-cleaning pass is made of. */
object TextAnalysis {

  /** Whitespace tokens of lowercased, trimmed text. */
  def words(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BPE-ish token count: alpha runs, single digits, single punctuation. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** Word n-gram shingles (distinct), for Jaccard/MinHash dedup. */
  def shingles(ws: Column, n: Int): Column = {
    val grams =
      if (n == 1) ws
      else transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*))
    when(size(ws) >= n, array_distinct(grams)).otherwise(array().cast("array<string>"))
  }

  /** Distinct-stopword-evidence language scores. The score for a language
    * is |distinct stopwords of that language present| / |distinct words| —
    * a deterministic, engine-portable heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es" -> Seq("el", "la", "de", "y", "es", "en", "un", "una", "que", "por"))

  def langScore(ws: Column, lang: String): Column = {
    val stop = array(Stopwords(lang).map(lit): _*)
    round(size(array_intersect(array_distinct(ws), stop)).cast("double") /
      greatest(size(array_distinct(ws)), lit(1)).cast("double"), 4)
  }

  /** Deterministic argmax over the language scores (ties resolved by the
    * fixed order en > de > es, identical to the oracle's CASE chain). */
  def predictLang(sEn: Column, sDe: Column, sEs: Column): Column =
    when(sEn >= sDe && sEn >= sEs, "en")
      .when(sDe >= sEs, "de")
      .otherwise("es")
}
