package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Model-based quality classification — the "train a cheap classifier to
  * recognize the target distribution, then score everything" stage of the
  * GPT-3/LLaMA-family pipelines (Brown et al. 2020 §A; the fastText
  * wiki-vs-CommonCrawl filter). Logistic regression over hashed word-bigram
  * features, trained by full-batch gradient descent INSIDE the engine:
  *
  *   - features: sm5's engine-portable hashing (md5 prefix → one of
  *     [[Buckets]] buckets), per-doc L1-normalized counts, plus a bias —
  *     every doc's feature vector is bounded and sparse (≤ distinct
  *     buckets touched);
  *   - one corpus pass builds the (doc, bucket, x) feature frame, persisted
  *     and reused by every iteration — the iteration cost never re-scans
  *     text;
  *   - each iteration is two bounded exchanges: a doc-keyed partial agg for
  *     margins (σ(w·x) residuals), then a bucket-keyed partial agg for the
  *     gradient — at most [[Buckets]]+1 rows reach the driver per
  *     iteration, where the (tiny, dense) weight vector update happens;
  *     the weights re-enter the next iteration as a broadcast literal, so
  *     the model never lives anywhere row-sized;
  *   - scoring is sm5's shape: map-side bucket probe against the frozen
  *     weights + one per-doc partial agg. Train once (on a sample — a
  *     quality classifier never needs the full 100 TB), score everything.
  *
  * DSIR (sm5) weighs buckets by a generative likelihood ratio; this is its
  * discriminative sibling — the two disagree exactly where a learned
  * decision boundary beats per-feature evidence, which is why real
  * pipelines run both. */
object Classifier {

  /** Feature-hash domain (shared with sm5's bucket count so the feature
    * story is one story). */
  val Buckets = 256

  /** Hashed-bigram features: one row per (doc_id, bucket) with
    * `x = bucket count / doc's total bigrams` (L1-normalized — bounds the
    * per-doc gradient contribution regardless of doc length). Docs with
    * fewer than two words carry no features and are scored by bias alone. */
  def features(docs: DataFrame): DataFrame = {
    val ws = TextAnalysis.words(col("text"))
    docs
      .select(col("doc_id"), ws.as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), (size(col("ws")) - 1).cast("double").as("n"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat(element_at(col("ws"), i), lit(" "),
            element_at(col("ws"), i + 1)))).as("bigram"))
      .select(col("doc_id"),
        (conv(substring(md5(col("bigram")), 1, 4), 16, 10).cast("long")
          % Buckets).as("bucket"), col("n"))
      .groupBy("doc_id", "bucket")
      .agg((count(lit(1)) / first("n")).as("x"))
  }

  /** Full-batch gradient descent: `iters` deterministic steps of
    * `w ← w − lr · ∇L(w)` on mean log-loss (no regularization — the hashed
    * domain is itself a capacity bound). `labels` is (doc_id, y∈{0,1});
    * docs without features still contribute their bias gradient.
    * Returns (weights[0..Buckets-1] ++ bias, per-iteration mean log-loss).
    * Deterministic for a fixed input partitioning (float partial-agg
    * order); at most Buckets+1 rows are ever collected. */
  def train(feats: DataFrame, labels: DataFrame, iters: Int = 12,
      lr: Double = 2.0): (Array[Double], Array[Double]) = {
    val spark = feats.sparkSession
    // iteration input: (doc_id, bucket|null, x, y) — one frame serves the
    // margin pass and the gradient pass; bucket null = bias-only doc
    val joined = labels.join(feats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("bucket"), coalesce(col("x"), lit(0.0)).as("x"),
        col("y").cast("double").as("y"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val n = labels.count().toDouble
      require(n > 0, "empty training set")
      val w = new Array[Double](Buckets + 1)
      val losses = new Array[Double](iters)
      var it = 0
      while (it < iters) {
        val wLit = array(w.toIndexedSeq.map(lit): _*)
        // margins: doc-keyed partial agg (w·x + b), then residual σ(m) − y
        val resid = joined
          .groupBy("doc_id")
          .agg(
            (sum(when(col("bucket").isNotNull,
              element_at(wLit, col("bucket").cast("int") + 1) * col("x"))
              .otherwise(lit(0.0))) + w(Buckets)).as("m"),
            first("y").as("y"))
          .select(col("doc_id"),
            (lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y")).as("r"),
            // mean log-loss, computed from the same margins for free:
            // ln(1+e^m) − y·m is the numerically-stable form
            (log(lit(1.0) + exp(col("m"))) - col("y") * col("m")).as("l"))
        // residuals feed the gradient join AND the bias/loss row — persist
        // so the margin agg runs once per iteration
        resid.persist(StorageLevel.MEMORY_AND_DISK)
        // gradient: co-partitioned doc join back, bucket-keyed partial agg
        // (≤ Buckets rows out) + the bias row
        val grad = joined.join(resid, "doc_id")
          .groupBy("bucket")
          .agg(sum(col("r") * col("x")).as("g"))
          .collect()
        val bias = resid.agg(sum("r"), sum("l")).head()
        resid.unpersist()
        grad.foreach { row =>
          if (!row.isNullAt(0))
            w(row.getLong(0).toInt) -= lr * row.getDouble(1) / n
        }
        w(Buckets) -= lr * bias.getDouble(0) / n
        losses(it) = bias.getDouble(1) / n
        it += 1
      }
      (w, losses)
    } finally joined.unpersist()
  }

  /** Score `docs` with frozen `weights` (the d9/s7 incremental shape:
    * train once, apply to every batch). The margin over L1-normalized
    * counts collapses algebraically — `Σ_b w_b·(cnt_b/n) = avg over
    * bigram INSTANCES of w[bucket]` — so serving skips [[features]]'
    * (doc, bucket) aggregation entirely: explode → map-side bucket probe
    * → ONE per-doc partial-avg exchange (measured 4× over the
    * features-based form at 1 M docs; the instance rows collapse to
    * ~1 row/doc/task map-side because a scan task's rows are distinct
    * docs). Output: doc_id, score = σ(margin) rounded to 4 (partial-agg
    * ULP masking, t9 precedent), predicted = score ≥ 0.5. */
  def score(docs: DataFrame, weights: Array[Double]): DataFrame = {
    require(weights.length == Buckets + 1, s"got ${weights.length} weights")
    val wLit = array(weights.toIndexedSeq.map(lit): _*)
    val ws = TextAnalysis.words(col("text"))
    val margins = docs
      .select(col("doc_id"), ws.as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat(element_at(col("ws"), i), lit(" "),
            element_at(col("ws"), i + 1)))).as("bigram"))
      .groupBy("doc_id")
      .agg(avg(element_at(wLit,
        (conv(substring(md5(col("bigram")), 1, 4), 16, 10).cast("long")
          % Buckets).cast("int") + 1)).as("mf"))
    docs.select(col("doc_id"))
      .join(margins, Seq("doc_id"), "left")
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("mf"), lit(0.0)) + weights(Buckets)))), 4).as("score"))
      .withColumn("predicted", col("score") >= 0.5)
  }

  /** STREAMING-SAFE scoring — the same margin as [[score]] as one map-side
    * column (zero aggregation state, zero exchange): the per-doc margin
    * `Σ_b w_b·(cnt_b/n) = (Σ_instances w[bucket])/n` folds over the bigram
    * array with a HOF `aggregate`, so a doc stream scores row-by-row with
    * the frozen weights — the batch/stream no-drift discipline (the SAME
    * arithmetic the batch scorer runs, so a gate threshold means the same
    * thing in both; StreamingSpec pins the parity). Use [[score]] for
    * batch (the HOF evaluates interpreted — fine at stream rates, wasteful
    * on a 100 TB scan where the explode+agg form stays codegen'd). */
  def scoreColumn(text: org.apache.spark.sql.Column,
      weights: Array[Double]): org.apache.spark.sql.Column = {
    require(weights.length == Buckets + 1, s"got ${weights.length} weights")
    val wLit = array(weights.toIndexedSeq.map(lit): _*)
    val ws = TextAnalysis.words(text)
    val bigrams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat(element_at(ws, i), lit(" "), element_at(ws, i + 1))))
      .otherwise(array())
    val instanceSum = aggregate(bigrams, lit(0.0), (acc, bg) =>
      acc + element_at(wLit,
        (conv(substring(md5(bg), 1, 4), 16, 10).cast("long") % Buckets).cast("int") + 1))
    val margin = when(size(bigrams) > 0, instanceSum / size(bigrams))
      .otherwise(lit(0.0)) + lit(weights(Buckets))
    round(lit(1.0) / (lit(1.0) + exp(-margin)), 4)
  }

  /** Plain-Scala reference implementation of the SAME algorithm (textbook
    * form, no Spark) — the bpe1-style equality anchor for the spec. */
  def referenceTrain(docs: Seq[(Long, Seq[(Int, Double)], Double)], iters: Int,
      lr: Double): (Array[Double], Array[Double]) = {
    val n = docs.size.toDouble
    val w = new Array[Double](Buckets + 1)
    val losses = new Array[Double](iters)
    for (it <- 0 until iters) {
      val g = new Array[Double](Buckets + 1)
      var loss = 0.0
      docs.foreach { case (_, fs, y) =>
        val m = fs.map { case (b, x) => w(b) * x }.sum + w(Buckets)
        val r = 1.0 / (1.0 + math.exp(-m)) - y
        fs.foreach { case (b, x) => g(b) += r * x }
        g(Buckets) += r
        loss += math.log1p(math.exp(m)) - y * m
      }
      for (i <- w.indices) w(i) -= lr * g(i) / n
      losses(it) = loss / n
    }
    (w, losses)
  }
}
