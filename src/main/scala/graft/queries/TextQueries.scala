package graft.queries

import graft.ext.TextAnalysis._
import graft.ext.extfunctions._
import org.apache.spark.sql.functions._

/** Text-analysis operator inventory over the `documents` table. */
object TextQueries {

  import QueryDef._

  /** Token counting: whitespace tokens + BPE-ish regex tokens. */
  private val t1Tokens = withOracle("t1_tokens",
    s"""SELECT doc_id,
       |       len(string_split_regex(lower(trim(text)), '\\s+')) AS n_ws_tokens,
       |       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
       |FROM documents""".stripMargin) { (s, dir) =>
    Tables(s, dir, "documents").select(
      col("doc_id"),
      size(words(col("text"))).as("n_ws_tokens"),
      regexp_count(col("text"), lit(BpePattern)).as("n_bpe_tokens"))
  }

  /** Quality scoring: length, alpha/space/punct ratios, mean token length,
    * distinct-word ratio — the standard cheap text-quality features. */
  private val t2Quality = withOracle("t2_quality",
    """SELECT doc_id,
      |       length(text) AS n_chars,
      |       round(cast(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
      |             / greatest(length(text), 1), 4) AS alpha_ratio,
      |       round(cast(length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
      |             / greatest(length(text), 1), 4) AS punct_ratio,
      |       round(cast(len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS DOUBLE)
      |             / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1), 4) AS distinct_word_ratio
      |FROM documents""".stripMargin) { (s, dir) =>
    val t = col("text")
    val ws = words(t)
    Tables(s, dir, "documents").select(
      col("doc_id"),
      length(t).as("n_chars"),
      round(length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") /
        greatest(length(t), lit(1)), 4).as("alpha_ratio"),
      round(length(regexp_replace(t, "[A-Za-z0-9\\s]", "")).cast("double") /
        greatest(length(t), lit(1)), 4).as("punct_ratio"),
      round(size(array_distinct(ws)).cast("double") /
        greatest(size(ws), lit(1)), 4).as("distinct_word_ratio"))
  }

  /** Language ID: distinct-stopword-evidence scores + deterministic argmax.
    * (The corpus text is synthetic; the operator is what's under test.) */
  private val t3LangId = withOracle("t3_langid", {
    def score(stop: Seq[String]): String = {
      val list = stop.map(w => s"'$w'").mkString(", ")
      s"""round(cast(len(list_intersect(list_distinct(string_split_regex(lower(trim(text)), '\\s+')), [$list])) AS DOUBLE)
         | / greatest(len(list_distinct(string_split_regex(lower(trim(text)), '\\s+'))), 1), 4)""".stripMargin
    }
    s"""WITH scored AS (
       |  SELECT doc_id,
       |         ${score(Stopwords("en"))} AS score_en,
       |         ${score(Stopwords("de"))} AS score_de,
       |         ${score(Stopwords("es"))} AS score_es
       |  FROM documents)
       |SELECT doc_id, score_en, score_de, score_es,
       |       CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
       |            WHEN score_de >= score_es THEN 'de'
       |            ELSE 'es' END AS predicted_lang
       |FROM scored""".stripMargin
  }) { (s, dir) =>
    val ws = words(col("text"))
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        langScore(ws, "en").as("score_en"),
        langScore(ws, "de").as("score_de"),
        langScore(ws, "es").as("score_es"))
      .withColumn("predicted_lang",
        predictLang(col("score_en"), col("score_de"), col("score_es")))
  }

  /** Winnowing-style rolling-hash document fingerprint (custom codegen'd
    * expression) — not ANSI-SQL-expressible; exact goldens in ExtSpec.
    * The kernel returns a sorted-distinct array<long>; the gate query emits
    * it comma-joined (canonical, and hashable by the driver's pandas
    * compare — raw arrays are not). */
  private val t4DocFp = rowsOnly("t4_doc_fingerprint") { (s, dir) =>
    // NULL text → NULL kernel output; coalesce both projections to the
    // empty-document rendering ("" / 0) so fp and n_fp stay consistent
    // (concat_ws alone would render NULL as "" while size stays NULL)
    val fp = rolling_fingerprint(col("text"), window = 8, mod = 16)
    Tables(s, dir, "documents").select(
      col("doc_id"),
      concat_ws(",", coalesce(fp, array()).cast("array<string>")).as("fp"),
      size(coalesce(fp, array())).as("n_fp"))
  }

  val all: Seq[QueryDef] = Seq(t1Tokens, t2Quality, t3LangId, t4DocFp)
}
