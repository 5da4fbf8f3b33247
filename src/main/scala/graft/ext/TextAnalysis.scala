package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization
  * counts, quality scoring, language ID, document fingerprinting. All are
  * native column expressions (codegen'd, no UDFs) so they run at scan
  * throughput — the operators a 100 TB text-cleaning pass is made of. */
object TextAnalysis {

  /** Whitespace tokens of lowercased, trimmed text. The coalesce makes the
    * whole downstream expression chain non-nullable, which keeps the
    * optimizer from inferring `isnotnull(<whole chain>)` filters that would
    * re-evaluate expensive expressions a second time per row. */
  def words(text: Column): Column = split(lower(trim(coalesce(text, lit("")))), "\\s+")

  /** BPE-ish token count: alpha runs, single digits, single punctuation. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

  /** The Gopher quality gate (Rae et al. 2021 §A1.1, public) as one
    * boolean column: word-count bounds, mean word length 3–10, ≥80%
    * alpha words, ≤10% symbol words. Map-only higher-order folds over
    * the word array — runs at scan throughput; shared by the batch gate
    * (t5) and the streaming curation front door, so the two paths can
    * never drift. */
  def gopherPasses(text: Column): Column = gopherPassesWs(words(text))

  /** The same gate over a precomputed word array — for pipelines (cur1)
    * that already carry `words(text)` for other stages. ONE definition of
    * the thresholds: every consumer (t5, the streaming front door, the
    * curation DAG) gates the same document set. */
  def gopherPassesWs(ws: Column): Column = {
    val n = size(ws)
    val denom = greatest(n, lit(1))
    // accumulate in LongType: an IntegerType fold wraps negative past 2^31
    // total characters and silently mis-gates (the oracle's list_sum never
    // wraps)
    val meanLen = aggregate(ws, lit(0L), (a, x) => a + length(x)).cast("double") / denom
    val alphaRatio = size(filter(ws, _.rlike("[a-z]"))).cast("double") / denom
    val symbolRatio =
      size(filter(ws, x => x.contains("#") || x.contains("..."))).cast("double") / denom
    n.between(50, 100000) && meanLen.between(3, 10) &&
      alphaRatio >= 0.8 && symbolRatio <= 0.1
  }

  /** Word n-gram shingles (distinct), as one codegen'd pass (custom
    * expression). The higher-order-function formulation
    * (`transform(sequence(...), i -> concat(element_at(ws, i)...))`)
    * evaluates interpreted and re-inlines its input into every
    * element_at — O(words²) per document once the optimizer copies the
    * expression into inferred filters. The kernel is O(words) and
    * non-nullable (no isnotnull constraints get inferred on it). */
  def shingles(ws: Column, n: Int): Column =
    graft.ext.extfunctions.word_shingles(ws, n)

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
