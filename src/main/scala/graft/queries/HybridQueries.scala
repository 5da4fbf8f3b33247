package graft.queries

import graft.ext.extfunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF; Cormack, Clarke &
  * Buettcher, SIGIR 2009) of a lexical BM25 ranking and a dense
  * embedding-cosine ranking over the same corpus. The production shape
  * behind "hybrid search": the two rankers catch complementary relevance
  * (exact term match vs semantic similarity) and RRF fuses them WITHOUT
  * score calibration — only ranks enter the fused score, so the two
  * rankers' incomparable score scales never meet.
  *
  * Scale shapes:
  *  - Each ranker keeps its own scale path: the lexical side is bm1's
  *    map-only scoring ([[RetrievalQueries.bm25ScoredDocs]] — bounded
  *    stats broadcast, no token explode) and the dense side is s1's
  *    brute-force shape (1-row query broadcast, one codegen'd dot per
  *    vector); at index-backed scale either ranker swaps for its served
  *    form ([[RetrievalQueries.bm25Serve]] / the AnnIndex serves) without
  *    touching the fusion, because fusion consumes only (doc_id, rank).
  *  - Both rankers end in TakeOrderedAndProject to a CONSTANT pool (k
  *    rows per task to the driver, never a global sort of the corpus);
  *    ranks are then assigned by a window over the ≤pool-row result — a
  *    single-partition sort of a constant-size frame, not a corpus sort.
  *  - The fusion itself is a union of the two ≤pool-row rank lists and
  *    one partial aggregate: no join, and the only exchange above the
  *    rankers carries ≤ 2·pool rows regardless of corpus size.
  *
  * FP determinism vs the oracle: ranks are integers, so the fused score
  * is a sum of at most two exact divisions `1.0/(rrfK + rank)` — addition
  * of two IEEE doubles is commutative, so accumulation order (which side
  * of the union arrives first) cannot change the bits. The rankers
  * themselves order by the same unrounded doubles the bm1/s1 gates
  * hash-check against DuckDB (identical expression trees both sides).
  */
object HybridQueries {

  import QueryDef._

  /** Gate fixture: the lexical query is [[RetrievalQueries.Bm25Terms]]
    * (the pinned bm1 request) and the dense query is the embedding of
    * `vec_id =` [[QueryVec]] — one information need, two representations.
    * Parametric in real use. */
  private val QueryVec = 0L
  private val Pool = 50
  private val FusedK = 20
  private val RrfK = 60

  /** Dense ranked pool: cosine of every embedding against the stored
    * query vector, top `pool` as `(doc_id, r)`. The query row is a 1-row
    * broadcast (scalar attach, never a shuffle of the corpus); zero-norm
    * and null embeddings are excluded — their similarity is undefined
    * (0/0), and the s1 contract is that an undefined pair is not a
    * neighbor; the query vector itself is likewise not a candidate. */
  private[graft] def denseRankedPool(embs: DataFrame, queryVecId: Long,
      pool: Int): DataFrame = {
    val e = embs.select(col("vec_id"), col("embedding"),
      sqrt(dot_f(col("embedding"), col("embedding"))).as("nrm"))
    val q = e.where(col("vec_id") === queryVecId)
      .select(col("embedding").as("qv"), col("nrm").as("qnrm"))
    val cos = dot_f(col("qv"), col("embedding")) / (col("qnrm") * col("nrm"))
    e.where(col("vec_id") =!= queryVecId && col("nrm") > 0)
      .join(broadcast(q))
      .select(col("vec_id").as("doc_id"), cos.as("cos"))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(pool)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))).as("r"))
  }

  /** Lexical ranked pool: bm1's exact-BM25 scores, docs with `s > 0`
    * (a doc matching no query term is not retrieved — rank lists carry
    * retrieved docs only, the RRF paper's setting), top `pool` as
    * `(doc_id, r)`. */
  private[graft] def lexicalRankedPool(docs: DataFrame, terms: Seq[String],
      pool: Int): DataFrame =
    RetrievalQueries.bm25ScoredDocs(docs, terms)
      .where(col("s") > 0)
      .orderBy(col("s").desc, col("doc_id"))
      .limit(pool)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("s").desc, col("doc_id"))).as("r"))

  /** RRF fusion of the two ranked pools:
    * `rrf(d) = Σ_rankers 1/(rrfK + rank_ranker(d))` over the rankers that
    * retrieved `d` in their top `pool`, fused top `k` by (rrf desc,
    * doc_id). Emitted score rounded to 6 decimals; the cut uses the
    * unrounded sum. */
  def hybridRrfTopK(docs: DataFrame, embs: DataFrame, terms: Seq[String],
      queryVecId: Long, pool: Int, k: Int, rrfK: Int = RrfK): DataFrame =
    fuseRrf(Seq(lexicalRankedPool(docs, terms, pool),
      denseRankedPool(embs, queryVecId, pool)), k, rrfK)

  /** The fusion kernel proper, ranker-agnostic: each pool is a bounded
    * `(doc_id, r)` rank list; fused score = Σ 1/(rrfK + r) over the pools
    * that retrieved the doc. Union + one partial aggregate — no join, and
    * every input is ≤ pool rows by the rankers' contract. */
  private[graft] def fuseRrf(pools: Seq[DataFrame], k: Int, rrfK: Int): DataFrame =
    pools.map(p => p.select(col("doc_id"),
        (lit(1.0) / (lit(rrfK) + col("r")).cast("double")).as("c")))
      .reduce(_ union _)
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("rrf"), 6).as("rrf"))

  /** Served lexical pool: [[RetrievalQueries.bm25Serve]] from the
    * versioned scored-index artifact at a generous cap (the dispatcher
    * routes to the plain capped serve — exact and completion-free), its
    * top-`pool` ranked by the emitted (bm25 desc, doc_id) order. The
    * serve reads |terms| pruned posting runs + the stats/dfs sidecars,
    * never the corpus. */
  private[graft] def servedLexicalPool(s: org.apache.spark.sql.SparkSession,
      dir: String, pool: Int): DataFrame =
    RetrievalQueries.bm25Serve(s, RetrievalQueries.scoredIndexFor(s, dir),
        RetrievalQueries.Bm25Terms, pool, Long.MaxValue)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id"))).as("r"))

  /** Served dense pool: the AnnIndex IVF serve
    * ([[SimilarityQueries.ivfServedTopK]]) for the [[QueryVec]] query at
    * the s3 operating point (nprobe 6/16 — approximate BY DESIGN; recall
    * floor pinned in the invariants row), ranked by the emitted
    * (cos desc, neighbor_id) order. The serve reads only the probed
    * cells' directories of the artifact, never the corpus. */
  private[graft] def servedDensePool(s: org.apache.spark.sql.SparkSession,
      dir: String, pool: Int): DataFrame = {
    val q = Tables(s, dir, "embeddings").where(col("vec_id") === QueryVec)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    SimilarityQueries.ivfServedTopK(s,
        SimilarityQueries.servedIndexFor(s, dir), q,
        SimilarityQueries.S3Nprobe, pool)
      .select(col("neighbor_id").as("doc_id"),
        row_number().over(Window.orderBy(col("cos").desc, col("neighbor_id"))).as("r"))
  }

  /** hyb2: the SERVED hybrid — the same RRF fusion with BOTH rankers
    * answered from their persisted versioned artifacts (the scored BM25
    * index and the AnnIndex), i.e. the user-facing search endpoint shape:
    * no corpus scan, no tokenize, no training at query time; at 100 TB a
    * query costs |terms| pruned posting runs + nprobe/nlist of one
    * cell-pruned scan + the ≤2·pool-row fusion. Rows-only (the dense
    * side is nprobe-approximate by design — KMeans cells are not
    * ANSI-expressible); the ⊕ companion pins the composition's
    * invariants, and hyb1 is the family's exact-oracle anchor. */
  def hybridServedTopK(s: org.apache.spark.sql.SparkSession, dir: String,
      pool: Int, k: Int, rrfK: Int = RrfK): DataFrame =
    fuseRrf(Seq(servedLexicalPool(s, dir, pool),
      servedDensePool(s, dir, pool)), k, rrfK)

  private val hyb2 = rowsOnly("hyb2_hybrid_served") { (s, dir) =>
    hybridServedTopK(s, dir, Pool, FusedK)
  }

  /** hyb2's ORACLE-CHECKED companion (the s10-invariants pattern —
    * non-SQL-expressible semantics reduced to booleans both engines can
    * state): both artifacts report committed; the served lexical pool
    * retrieves EXACTLY the scan-form lexical pool's doc set (the BM25
    * serve is exact — same unrounded-score cut); the served fusion
    * equals RRF recomputed by hand from its own collected pools (the
    * fusion kernel does pure rank arithmetic); the nprobe-approximate
    * dense pool's recall vs the exact dense pool clears a floor (6/16
    * cells on isotropic data); and the cut is exactly k. */
  private val hyb2Invariants = withOracle("hyb2_served_invariants",
    s"""SELECT TRUE AS artifacts_committed, TRUE AS lex_pool_set_eq,
       |       TRUE AS fused_eq_pools, TRUE AS dense_recall_ok,
       |       CAST($FusedK AS BIGINT) AS n_fused""".stripMargin) { (s, dir) =>
    val committed =
      graft.ext.ArtifactCommit.committed(s, RetrievalQueries.scoredIndexFor(s, dir)) &&
        graft.ext.AnnIndex.committed(s, SimilarityQueries.servedIndexFor(s, dir))
    val lexServed = servedLexicalPool(s, dir, Pool).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val lexScan = lexicalRankedPool(Tables(s, dir, "documents"),
      RetrievalQueries.Bm25Terms, Pool).collect().map(_.getLong(0)).toSet
    val denServed = servedDensePool(s, dir, Pool).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val denExact = denseRankedPool(Tables(s, dir, "embeddings"), QueryVec, Pool)
      .collect().map(_.getLong(0)).toSet
    val recall = (denServed.keySet intersect denExact).size.toDouble / denExact.size
    val expected = (lexServed.keySet ++ denServed.keySet).toSeq.map { id =>
      val c = lexServed.get(id).map(r => 1.0 / (RrfK + r)).getOrElse(0.0) +
        denServed.get(id).map(r => 1.0 / (RrfK + r)).getOrElse(0.0)
      (id, c)
    }.sortBy { case (id, c) => (-c, id) }.take(FusedK).map { case (id, c) =>
      (id, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val fused = hybridServedTopK(s, dir, Pool, FusedK).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    import s.implicits._
    Seq((committed, lexServed.keySet == lexScan, fused == expected,
      recall >= 0.3, fused.size.toLong))
      .toDF("artifacts_committed", "lex_pool_set_eq", "fused_eq_pools",
        "dense_recall_ok", "n_fused")
  }

  /** hyb1: the fused gate — same BM25 CTEs as bm1's oracle (shared
    * builder, can't drift), s1's cosine formula on DOUBLE casts, RRF in
    * ANSI SQL. Hash-checked end to end. */
  private val hyb1 = withOracle("hyb1_hybrid_rrf",
    s"""WITH ${RetrievalQueries.bm25ScoreCtes},
       |lex AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
       |        FROM sc WHERE s > 0),
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qnrm
       |      FROM e WHERE vec_id = $QueryVec),
       |den AS (SELECT e.vec_id AS doc_id,
       |          row_number() OVER (ORDER BY
       |            list_dot_product(qv, e.v) / (qnrm * sqrt(list_dot_product(e.v, e.v))) DESC,
       |            e.vec_id) AS r
       |        FROM e, q
       |        WHERE e.vec_id <> $QueryVec AND list_dot_product(e.v, e.v) > 0),
       |u AS (SELECT doc_id, 1.0::DOUBLE / ($RrfK + r) AS c FROM lex WHERE r <= $Pool
       |      UNION ALL
       |      SELECT doc_id, 1.0::DOUBLE / ($RrfK + r) AS c FROM den WHERE r <= $Pool),
       |f AS (SELECT doc_id, sum(c) AS rrf FROM u GROUP BY doc_id),
       |rk AS (SELECT doc_id, rrf, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rn FROM f)
       |SELECT doc_id, round(rrf, 6) AS rrf FROM rk WHERE rn <= $FusedK""".stripMargin) { (s, dir) =>
    hybridRrfTopK(Tables(s, dir, "documents"), Tables(s, dir, "embeddings"),
      RetrievalQueries.Bm25Terms, QueryVec, Pool, FusedK)
  }

  val all: Seq[QueryDef] = Seq(hyb1, hyb2, hyb2Invariants)
}
