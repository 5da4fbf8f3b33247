package graft.queries

import graft.ext.Mmr
import graft.ext.extfunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Result diversification — MMR over a retrieved candidate pool (see
  * [[graft.ext.Mmr]]): the post-pass between "top-k by similarity" and
  * "top-k worth showing / sampling" when near-duplicates saturate the
  * pool. Rides any bounded ranker output; the gate feeds it the dense
  * cosine pool (s1's shape with the vectors carried through the cut). */
object DiversityQueries {

  import QueryDef._

  private val QueryVec = 0L
  private val Pool = 50
  private val MmrK = 10
  private val Lambda = 0.7

  /** The dense candidate pool WITH vectors: cosine of every embedding
    * against the query vector, TakeOrdered top-`pool`, each row carrying
    * (doc_id, score, embedding) so the diversifier can measure
    * inter-candidate similarity without re-touching the corpus. */
  private[graft] def densePoolWithVecs(s: org.apache.spark.sql.SparkSession,
      dir: String, pool: Int): DataFrame = {
    val e = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"),
      sqrt(dot_f(col("embedding"), col("embedding"))).as("nrm"))
    val q = e.where(col("vec_id") === QueryVec)
      .select(col("embedding").as("qv"), col("nrm").as("qnrm"))
    val cos = dot_f(col("qv"), col("embedding")) / (col("qnrm") * col("nrm"))
    e.where(col("vec_id") =!= QueryVec && col("nrm") > 0)
      .join(broadcast(q))
      .select(col("vec_id").as("doc_id"), cos.as("score"), col("embedding"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(pool)
  }

  /** mmr1: the diversified top-k. Rows-only — the greedy selection is
    * not ANSI-expressible; the ⊕ companion verifies per-step optimality
    * against an independent checker. */
  private val mmr1 = rowsOnly("mmr1_diversified") { (s, dir) =>
    Mmr.diversify(densePoolWithVecs(s, dir, Pool), MmrK, Lambda)
  }

  /** mmr1's ORACLE-CHECKED companion: the selection is verified (not
    * re-run) — an independent pass recomputes every remaining
    * candidate's MMR objective at every step from the raw pool vectors
    * and confirms the pick was optimal (objective max, doc_id
    * tie-break) and that the emitted value is that objective; plus the
    * structural facts (picks ⊆ pool, first pick = relevance argmax,
    * exactly k rows, and the diversified set is never MORE self-similar
    * than the plain top-k it replaces). */
  private val mmr1Invariants = withOracle("mmr1_diversity_invariants",
    s"""SELECT TRUE AS picks_from_pool, TRUE AS first_is_top,
       |       TRUE AS stepwise_optimal, TRUE AS diversity_no_worse,
       |       CAST($MmrK AS BIGINT) AS n_picks""".stripMargin) { (s, dir) =>
    val pool = densePoolWithVecs(s, dir, Pool).collect().map { r =>
      (r.getLong(0), r.getDouble(1),
        r.getSeq[Float](2).map(_.toDouble).toArray)
    }.toSeq
    val byId = pool.map(p => p._1 -> p).toMap
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0.0 || nb == 0.0) 0.0
      else a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    }
    val picks = Mmr.diversify(densePoolWithVecs(s, dir, Pool), MmrK, Lambda)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
    val fromPool = picks.forall(p => byId.contains(p._1))
    val firstIsTop = picks.head._1 ==
      pool.minBy(p => (-p._2, p._1))._1
    var chosen = List.empty[Long]
    val stepwise = picks.forall { case (id, emitted) =>
      def objOf(cand: (Long, Double, Array[Double])): Double = {
        val pen = if (chosen.isEmpty) 0.0
          else chosen.map(c => cosine(cand._3, byId(c)._3)).max
        Lambda * cand._2 - (1 - Lambda) * pen
      }
      val remaining = pool.filterNot(p => chosen.contains(p._1))
      val best = remaining.minBy(p => (-objOf(p), p._1))
      val ok = best._1 == id &&
        BigDecimal(objOf(best)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble == emitted
      chosen = chosen :+ id
      ok
    }
    def meanPairSim(ids: Seq[Long]): Double = {
      val ps = for (i <- ids.indices; j <- i + 1 until ids.size)
        yield cosine(byId(ids(i))._3, byId(ids(j))._3)
      ps.sum / ps.size
    }
    val plainTopK = pool.sortBy(p => (-p._2, p._1)).take(MmrK).map(_._1)
    val divOk = meanPairSim(picks.map(_._1)) <=
      meanPairSim(plainTopK) + 1e-12
    import s.implicits._
    Seq((fromPool, firstIsTop, stepwise, divOk, picks.size.toLong))
      .toDF("picks_from_pool", "first_is_top", "stepwise_optimal",
        "diversity_no_worse", "n_picks")
  }

  val all: Seq[QueryDef] = Seq(mmr1, mmr1Invariants)
}
