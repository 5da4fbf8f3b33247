package graft.queries

import graft.ext.TextAnalysis._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pseudo-relevance-feedback query expansion (Rocchio 1971 / the
  * unweighted core of RM3, Abdul-Jaleel et al. TREC 2004): assume the
  * BM25 top-f docs are relevant, mine the e most frequent terms from
  * them (minus the original query), and re-run BM25 with the expanded
  * term set — the classic recall fix for vocabulary mismatch ("spark
  * join window" pulls in "query", "sort", "merge"… and now matches docs
  * that never say the original words).
  *
  * Scale shapes:
  *  - Round 1 is bm1's map-only scoring with a TakeOrdered top-f cut.
  *  - Term mining explodes ONLY the f feedback docs' words (the corpus
  *    scan is pruned by a broadcast semi-join on the f-row doc list);
  *    the candidate aggregate is bounded by f·max_dl rows, the cut by e.
  *  - Round 2 is bm1's map-only scoring again, now over |orig|+e term
  *    columns — still whole-stage-codegen'd array ops, still ONE bounded
  *    stats broadcast, still TakeOrderedAndProject. Total: two corpus
  *    tokenize passes + one f-doc explode — the honest PRF price; at
  *    100 TB both passes stay shuffle-free.
  *  - Expansion terms pass through the driver (a ≤e-row collect, the
  *    same bounded-model shape as IVF centroids): the term set is query
  *    compile-time state, not data-plane rows.
  *
  * FP determinism vs the oracle: round-2 contributions sum in SORTED
  * term order on both engines (Spark reduces the sorted term columns
  * left to right; the oracle pins `list_sum(list(contrib ORDER BY
  * term))` — ASCII fixture terms, so the two orderings agree), and a
  * tf=0 contribution is an exact `+0.0`. Expansion SELECTION is integer
  * arithmetic (counts, term tie-break) — no FP at all. */
object PrfQueries {

  import QueryDef._

  private val FeedbackDocs = 5
  private val ExpandBy = 10
  private val PrfTopK = 20

  /** The e most frequent terms across the BM25 top-f feedback docs,
    * original query terms and the empty token excluded; (term, tf) with
    * the (tf desc, term) cut. */
  def expansionTerms(docs: DataFrame, terms: Seq[String], f: Int,
      e: Int): DataFrame = {
    val feedback = RetrievalQueries.bm25ScoredDocs(docs, terms)
      .orderBy(col("s").desc, col("doc_id"))
      .limit(f)
      .select(col("doc_id"))
    docs.join(broadcast(feedback), Seq("doc_id"), "left_semi")
      .select(explode(words(col("text"))).as("term"))
      .where(!col("term").isin(terms: _*) && col("term") =!= "")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term"))
      .limit(e)
  }

  /** BM25 top-k for the EXPANDED query: original terms plus the mined
    * expansion set, scored by the same map-only kernel as bm1 (term
    * columns in sorted order — the determinism contract above). Docs
    * matching no expanded term are not retrieved (`s > 0`). */
  def bm25ExpandedTopK(docs: DataFrame, terms: Seq[String], f: Int, e: Int,
      k: Int): DataFrame = {
    val expanded = expansionTerms(docs, terms, f, e)
      .collect().map(_.getString(0))
    val all = (terms ++ expanded).distinct.sorted
    RetrievalQueries.bm25ScoredDocs(docs, all)
      .where(col("s") > 0)
      .orderBy(col("s").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("s"), 4).as("bm25x"))
  }

  private def sqlTermList: String =
    RetrievalQueries.Bm25Terms.map(t => s"'$t'").mkString(", ")

  /** fb/w/cand/exp CTEs shared by both oracles: feedback top-f from the
    * bm1 score CTEs, candidate counts from the feedback docs' words,
    * expansion cut (tf desc, term). */
  private def expansionCtes: String =
    s"""${RetrievalQueries.bm25ScoreCtes},
       |fb AS (SELECT doc_id FROM (
       |         SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS rn FROM sc)
       |       WHERE rn <= $FeedbackDocs),
       |w AS (SELECT unnest(ws) AS term FROM d JOIN fb USING (doc_id)),
       |cand AS (SELECT term, CAST(count(*) AS BIGINT) AS tf FROM w
       |         WHERE term NOT IN ($sqlTermList) AND term <> '' GROUP BY term),
       |exp AS (SELECT term, tf FROM (
       |          SELECT term, tf, row_number() OVER (ORDER BY tf DESC, term) AS rn FROM cand)
       |        WHERE rn <= $ExpandBy)""".stripMargin

  /** prf1: the mined expansion terms themselves — integer counts, exact
    * oracle. The round-1 feedback cut rides bm1's hash-proven score
    * agreement. */
  private val prf1 = withOracle("prf1_expansion_terms",
    s"""WITH $expansionCtes
       |SELECT term, tf FROM exp""".stripMargin) { (s, dir) =>
    expansionTerms(Tables(s, dir, "documents"), RetrievalQueries.Bm25Terms,
      FeedbackDocs, ExpandBy)
  }

  /** prf2: the expanded-query BM25 top-k, hash-checked end to end. The
    * oracle's round 2 is the generic (doc, term)-join form — per-pair
    * contributions with the IDENTICAL score expression, summed per doc
    * in pinned term order via `list_sum(list(… ORDER BY term))`. */
  private val prf2 = withOracle("prf2_bm25_expanded",
    s"""WITH $expansionCtes,
       |qt AS (SELECT term FROM exp UNION SELECT unnest([$sqlTermList])),
       |tf2 AS (SELECT dd.doc_id, qt.term,
       |          CAST(len(list_filter(dd.ws, x -> x = qt.term)) AS DOUBLE) AS tf,
       |          CAST(len(dd.ws) AS DOUBLE) AS dl
       |        FROM d dd CROSS JOIN qt),
       |st2 AS (SELECT term, CAST(sum(CASE WHEN tf>0 THEN 1 ELSE 0 END) AS DOUBLE) AS df
       |        FROM tf2 GROUP BY term),
       |g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |             avg(CAST(len(ws) AS DOUBLE)) AS avgdl FROM d),
       |contrib AS (SELECT t.doc_id, t.term,
       |    ln(1+(g.n-s2.df+0.5)/(s2.df+0.5)) * (t.tf*2.2)/(t.tf + 1.2*(0.25 + 0.75*t.dl/g.avgdl)) AS c
       |  FROM tf2 t, st2 s2, g WHERE t.term = s2.term),
       |sx AS (SELECT doc_id, list_sum(list(c ORDER BY term)) AS s FROM contrib GROUP BY doc_id),
       |r AS (SELECT doc_id, s, row_number() OVER (ORDER BY s DESC, doc_id) AS rn
       |      FROM sx WHERE s > 0)
       |SELECT doc_id, round(s,4) AS bm25x FROM r WHERE rn <= $PrfTopK""".stripMargin) { (s, dir) =>
    bm25ExpandedTopK(Tables(s, dir, "documents"), RetrievalQueries.Bm25Terms,
      FeedbackDocs, ExpandBy, PrfTopK)
  }

  val all: Seq[QueryDef] = Seq(prf1, prf2)
}
