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

  /** One document's compression-ratio row: full UTF-8 byte count, the
    * prefix the ratio was measured over, raw-DEFLATE compressed byte
    * count of that prefix (zlib level 6, no wrapper), and the ratio
    * (`deflate_bytes / max(1, measured_bytes)`). */
  final case class CompressionRow(
      doc_id: Long, n_bytes: Long, measured_bytes: Long,
      deflate_bytes: Long, ratio: Double)

  /** Compression-ratio quality signal (the RefinedWeb/MassiveText-family
    * repetitiveness detector from the other direction): boilerplate and
    * template spam DEFLATE far below natural prose (LZ77 matches eat the
    * repeats), while base64/garbage columns sit near ratio 1. Complements
    * t6's n-gram fractions — DEFLATE's 32 KiB match window catches long-
    * range within-doc repetition no fixed n-gram size sees.
    *
    * Shape: map-only over the corpus scan (no exchange), one `Deflater`
    * instance per PARTITION (the mm2 expensive-init pattern — a Deflater
    * allocates native zlib state; per-row allocation would thrash it),
    * released on task completion. Deterministic for a fixed zlib level
    * per JVM version — executors run one image, and the spec pins
    * partitioning-invariance, so the signal is stable within any one
    * deployment (pin the JVM across a corpus version for cross-run
    * comparability, as with any library-versioned scorer).
    *
    * `maxBytes` bounds the per-document cost: the ratio is computed over
    * the first `maxBytes` UTF-8 bytes (a pathological 100 MB doc must not
    * stall its task — and a prefix window is how production pipelines
    * compute this signal anyway; repetitive junk is repetitive early).
    * `n_bytes` still reports the FULL document size; `measured_bytes`
    * says what the ratio covered. */
  def compressionRatios(docs: DataFrame, maxBytes: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new java.util.zip.Deflater(6, true)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => d.end())
        val buf = new Array[Byte](16 * 1024)
        it.map { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val m = math.min(bytes.length, maxBytes)
          d.reset()
          d.setInput(bytes, 0, m)
          d.finish()
          var n = 0L
          while (!d.finished()) n += d.deflate(buf)
          CompressionRow(id, bytes.length.toLong, m.toLong, n,
            math.rint(n.toDouble / math.max(1, m) * 10000) / 10000)
        }
      }
      .toDF()
  }
}
