package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance result diversification (Carbonell &
  * Goldstein, SIGIR 1998): greedily re-rank a retrieved candidate pool so
  * each pick maximizes `λ·relevance − (1−λ)·max similarity to the already
  * selected set` — the standard fix for near-duplicate-saturated top-k
  * (an ANN pool over a deduped-but-still-redundant corpus returns twenty
  * paraphrases of one answer; MMR returns one of each).
  *
  * Scale shape: the pool is CONSTANT-bounded by the upstream ranker's
  * TakeOrdered cut (the rankers carry the corpus-scale work — this is a
  * post-pass over ≤pool rows), so the greedy runs driver-side on the
  * collected pool — k·pool cosine evaluations on ≤pool vectors, the same
  * bounded-model shape as IVF centroids or the BPE argmax. Nothing here
  * grows with the corpus.
  *
  * Determinism: every step picks the max (objective, then smaller doc_id)
  * over the remaining candidates; similarities are plain double
  * arithmetic over the pool's stored vectors — same bits every run. A
  * zero-norm or null candidate vector has undefined similarity and
  * contributes 0 diversity penalty (it cannot be "similar" to anything).
  */
object Mmr {

  /** Greedy MMR over a collected pool: (doc_id, relevance, embedding) →
    * the first k picks as (doc_id, mmr objective at selection time). */
  private[graft] def select(pool: Seq[(Long, Double, Array[Double])], k: Int,
      lambda: Double): Seq[(Long, Double)] = {
    val norms = pool.map { case (_, _, v) =>
      if (v == null) 0.0 else math.sqrt(v.map(x => x * x).sum)
    }
    def sim(i: Int, j: Int): Double = {
      val (vi, vj) = (pool(i)._3, pool(j)._3)
      if (norms(i) == 0.0 || norms(j) == 0.0) 0.0
      else {
        var s = 0.0; var d = 0
        while (d < vi.length) { s += vi(d) * vj(d); d += 1 }
        s / (norms(i) * norms(j))
      }
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    val remaining = scala.collection.mutable.LinkedHashSet(pool.indices: _*)
    while (out.size < k && remaining.nonEmpty) {
      var bestIdx = -1
      var bestObj = Double.NegativeInfinity
      for (i <- remaining) {
        val penalty =
          if (selected.isEmpty) 0.0
          else selected.map(j => sim(i, j)).max
        val obj = lambda * pool(i)._2 - (1 - lambda) * penalty
        if (obj > bestObj ||
            (obj == bestObj && bestIdx >= 0 && pool(i)._1 < pool(bestIdx)._1)) {
          bestObj = obj; bestIdx = i
        }
      }
      remaining.remove(bestIdx)
      selected += bestIdx
      out += ((pool(bestIdx)._1, bestObj))
    }
    out.toSeq
  }

  /** DataFrame form: `pool` must carry (doc_id: long, score: double,
    * embedding: array<float|double>) and be bounded (an upstream
    * TakeOrdered cut); returns (doc_id, mmr) in selection order with the
    * objective rounded to 4 decimals. */
  def diversify(pool: DataFrame, k: Int, lambda: Double): DataFrame = {
    val spark = pool.sparkSession
    val rows = pool.select("doc_id", "score", "embedding").collect().map { r =>
      val emb = r.get(2) match {
        case null => null
        case s: scala.collection.Seq[_] =>
          s.map(x => x.asInstanceOf[Number].doubleValue()).toArray
      }
      (r.getLong(0), r.getDouble(1), emb)
    }.toSeq
    val picked = select(rows, k, lambda).zipWithIndex.map {
      case ((id, obj), i) =>
        Row(i + 1, id, BigDecimal(obj).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(picked, 1),
      StructType(Seq(StructField("rank", IntegerType, nullable = false),
        StructField("doc_id", LongType, nullable = false),
        StructField("mmr", DoubleType, nullable = false))))
  }
}
