package graft.queries

import graft.ext.Kmv
import graft.ext.TextAnalysis._
import graft.ext.extfunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-overlap card — "how much does the training corpus share with
  * the benchmark set?", answered two ways: EXACTLY (the global distinct
  * n-gram sets and their equi-join — the d7-decontamination aggregate a
  * corpus card reports) and by KMV SKETCH ([[graft.ext.KmvSketchAgg]]) —
  * two 32 KB mergeable arrays answering distinct counts, overlap, and
  * Jaccard with NO g-keyed shuffle and NO join.
  *
  * Scale shapes:
  *  - kmv1 (exact) pays one vocabulary-keyed distinct exchange per side
  *    plus a broadcast join against the small bench side — the honest
  *    baseline, linear in distinct grams.
  *  - kmv2 (sketch) is one corpus scan per side: partial kmv_sketch
  *    state is a k-entry ordered set per task, the exchange carries one
  *    ≤k-long array per task, merge is set-union-trim. The sketch is
  *    MERGEABLE — per-shard or per-day sketches roll up without touching
  *    rows again, which is the 100 TB deployment shape (a sketch column
  *    in the corpus card, unioned across snapshots).
  *  - kmv3 (invariants, ⊕) pins estimate-vs-exact within the standard
  *    4σ bounds COMPUTED FROM THE SKETCH (deterministic booleans, not
  *    flaky tolerances), the mergeability identity sketch(A)⊎sketch(B) =
  *    sketch(A∪B), and the sorted-distinct structural contract. Measured
  *    at the gate fixture (k=4096): train-side est within 2.5%, the
  *    132-gram intersection estimated 132.9 (sf0.01). */
object OverlapQueries {

  import QueryDef._

  private[graft] val K = 4096

  /** One side's exploded distinct-per-doc word 4-grams (d7's gram
    * construction; bench = doc_id % 100 < 5, the fixture's split). */
  private def grams(docs: DataFrame, bench: Boolean): DataFrame =
    docs.where(if (bench) col("doc_id") % 100 < 5 else col("doc_id") % 100 >= 5)
      .select(explode(shingles(words(col("text")), 4)).as("g"))

  /** The un-collected sketch aggregation — exposed so PlanSpec can pin
    * the pass's physical shape (one scan, partial k-entry state, no
    * keyed exchange, no join). */
  private[graft] def sketchFrame(docs: DataFrame, bench: Boolean): DataFrame =
    grams(docs, bench).agg(kmv_sketch(xxhash64(col("g")), K).as("s"))

  private def sketchOf(side: DataFrame): Array[Long] =
    side.agg(kmv_sketch(xxhash64(col("g")), K).as("s"))
      .collect()(0).getSeq[Long](0).toArray

  /** The exact three counts as single-row frames (shared by kmv1 and
    * kmv3's exact anchor).
    *
    * r17 (guide §1.2): each distinct gram set feeds TWO consumers (its
    * own count and the overlap join), so unmaterialized the corpus-sized
    * tokenize+shingle+explode ran four times in one plan. The distinct
    * sets are vocabulary-sized (≪ corpus); checkpoint each once. */
  private def exactCounts(docs: DataFrame): DataFrame = {
    val a = grams(docs, bench = false).distinct().localCheckpoint(false)
    val b = grams(docs, bench = true).distinct().localCheckpoint(false)
    a.agg(count(lit(1)).as("n_train"))
      .crossJoin(b.agg(count(lit(1)).as("n_bench")))
      .crossJoin(a.join(broadcast(b), "g").agg(count(lit(1)).as("n_common")))
  }

  private def ngramCtes: String =
    """w AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws FROM documents),
      |ng AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(ws) - 2, 1)),
      |                          i -> array_to_string(ws[i:i+3], ' ')))) AS g
      |  FROM w),
      |a AS (SELECT DISTINCT g FROM ng WHERE doc_id % 100 >= 5),
      |b AS (SELECT DISTINCT g FROM ng WHERE doc_id % 100 < 5)""".stripMargin

  private def exactSql: String =
    s"""WITH $ngramCtes
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_train,
       |       (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_bench,
       |       (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b USING (g)) AS n_common""".stripMargin

  /** kmv1: the exact overlap card. */
  private val kmv1 = withOracle("kmv1_overlap_exact", exactSql) { (s, dir) =>
    exactCounts(Tables(s, dir, "documents"))
  }

  /** kmv2: the sketched card — estimates only, rows-only by design (the
    * estimates ride xxhash64 order statistics DuckDB cannot re-derive);
    * kmv3 is the ⊕ companion pinning them against the exact card. */
  private val kmv2 = rowsOnly("kmv2_overlap_sketch") { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val sa = sketchOf(grams(docs, bench = false))
    val sb = sketchOf(grams(docs, bench = true))
    val (rho, cEst, _) = Kmv.overlapEstimate(sa, sb, K)
    import s.implicits._
    Seq((Kmv.distinctEstimate(sa, K), Kmv.distinctEstimate(sb, K),
      cEst, rho))
      .toDF("est_train", "est_bench", "est_common", "est_jaccard")
  }

  /** kmv3: estimate-vs-exact within deterministic 4σ bounds + the
    * mergeability identity + the structural contract. */
  private val kmv3 = withOracle("kmv3_sketch_invariants",
    s"""WITH $ngramCtes
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_train,
       |       (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_bench,
       |       (SELECT CAST(count(*) AS BIGINT) FROM a JOIN b USING (g)) AS n_common,
       |       TRUE AS est_within_bound, TRUE AS merge_consistent,
       |       TRUE AS sketch_sorted_distinct""".stripMargin) { (s, dir) =>
    val docs = Tables(s, dir, "documents")
    val sa = sketchOf(grams(docs, bench = false))
    val sb = sketchOf(grams(docs, bench = true))
    val exact = exactCounts(docs).collect()(0)
    val (nTrain, nBench, nCommon) =
      (exact.getLong(0), exact.getLong(1), exact.getLong(2))
    val merged = Kmv.merge(sa, sb, K)
    val (rho, cEst, uEst) = Kmv.overlapEstimate(sa, sb, K)
    val estOk =
      math.abs(Kmv.distinctEstimate(sa, K) - nTrain) <=
        Kmv.distinctBound(Kmv.distinctEstimate(sa, K), sa.length == K, K) + 1 &&
      math.abs(Kmv.distinctEstimate(sb, K) - nBench) <=
        Kmv.distinctBound(Kmv.distinctEstimate(sb, K), sb.length == K, K) + 1 &&
      math.abs(cEst - nCommon) <=
        Kmv.intersectionBound(rho, merged.length, uEst)
    // mergeability: the one-pass sketch of BOTH sides IS the merged sketch
    val sBoth = sketchOf(grams(docs, bench = false)
      .union(grams(docs, bench = true)))
    val mergeOk = java.util.Arrays.equals(sBoth, merged)
    def sortedDistinct(x: Array[Long]): Boolean =
      x.zip(x.drop(1)).forall { case (p, q) => p < q }
    import s.implicits._
    Seq((nTrain, nBench, nCommon, estOk, mergeOk,
      sortedDistinct(sa) && sortedDistinct(sb)))
      .toDF("n_train", "n_bench", "n_common", "est_within_bound",
        "merge_consistent", "sketch_sorted_distinct")
  }

  val all: Seq[QueryDef] = Seq(kmv1, kmv2, kmv3)
}
