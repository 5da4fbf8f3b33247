package graft

import graft.functions.{DDHist, DDOps, dd_hist, dd_hist_merge, dd_quantile}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DDSketch quantile partials: the relative-error and determinism
  * contracts that anchor the rows-only rh4 gate query. */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // FAIR so the serving-path fairness test is real whichever suite
    // creates the shared context; default-pool behavior stays FIFO
    .config("spark.scheduler.mode", "FAIR")
    .getOrCreate()

  private def sketchOf(vs: Seq[Double], alpha: Double = DDOps.DefaultAlpha): Array[Byte] = {
    val h = new DDHist(alpha)
    vs.foreach(h.add)
    h.serialize()
  }

  private def exactQuantile(vs: Seq[Double], q: Double): Double = {
    // rank-based lower quantile over Double.compare (NaN greatest) — the
    // same rank DDOps walks, so the α bound applies between these two
    val sorted = vs.sortWith((a, b) => java.lang.Double.compare(a, b) < 0)
    sorted(math.floor(q * (sorted.length - 1)).toInt)
  }

  test("quantiles are within the alpha relative-error bound of exact") {
    val rnd = new scala.util.Random(42)
    // mixed magnitudes across 12 decades, both signs, zeros
    val vs = Seq.fill(5000)(math.pow(10, rnd.nextDouble() * 12 - 6) *
      (if (rnd.nextBoolean()) 1 else -1)) ++ Seq.fill(50)(0.0)
    val bytes = sketchOf(vs)
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = DDOps.quantileOrNull(bytes, q)
      val exact = exactQuantile(vs, q)
      assert(est != null)
      if (exact != 0.0)
        assert(math.abs(est - exact) <= DDOps.DefaultAlpha * math.abs(exact) * 1.0000001,
          s"q=$q est=$est exact=$exact")
      else assert(est == 0.0)
    }
  }

  test("merge is order- and split-independent at the byte level") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(2000)(rnd.nextGaussian() * 100)
    val whole = sketchOf(vs)
    // split into uneven chunks, merge shuffled
    val chunks = vs.grouped(173).toSeq
    val parts = rnd.shuffle(chunks.map(sketchOf(_)))
    val merged = new DDHist(0.0)
    parts.foreach(p => merged.mergeWith(DDHist.deserialize(p)))
    assert(java.util.Arrays.equals(merged.serialize(), whole))
    // and merging an empty buffer is the identity
    val withEmpty = new DDHist(0.0)
    withEmpty.mergeWith(DDHist.deserialize(whole))
    withEmpty.mergeWith(new DDHist(0.0))
    assert(java.util.Arrays.equals(withEmpty.serialize(), whole))
  }

  test("special values keep the Double.compare total order (NaN greatest)") {
    val vs = Seq(Double.NegativeInfinity, -5.0, -0.0, 0.0, 3.0,
      Double.PositiveInfinity, Double.NaN)
    val bytes = sketchOf(vs)
    assert(DDOps.quantileOrNull(bytes, 0.0) == Double.NegativeInfinity)
    assert(DDOps.quantileOrNull(bytes, 1.0).isNaN)
    // q just below the NaN slot: +Inf
    assert(DDOps.quantileOrNull(bytes, 0.85) == Double.PositiveInfinity)
    // the zero bucket sits between the stores
    assert(DDOps.quantileOrNull(bytes, 0.4) == 0.0)
    assert(DDOps.quantileOrNull(sketchOf(Seq.empty), 0.5) == null)
  }

  test("dd_hist over groups + dd_hist_merge equals the single-pass sketch (Spark)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map(i => (i % 7, rnd.nextInt(2), math.exp(rnd.nextGaussian() * 3)))
    val df = rows.toDF("k", "batch", "v").repartition(4)
    // two-level: per-(k, batch) partials re-merged per k
    val merged = df.groupBy("k", "batch").agg(dd_hist(col("v")).as("h"))
      .groupBy("k").agg(dd_hist_merge(col("h")).as("h"))
    val single = df.groupBy("k").agg(dd_hist(col("v")).as("h"))
    val m = merged.collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("h")).toMap
    val s = single.collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("h")).toMap
    assert(m.keySet === s.keySet)
    m.keys.foreach(k => assert(java.util.Arrays.equals(m(k), s(k)), s"group $k"))
    // dd_quantile tracks the exact per-group median within alpha
    val med = single.select(col("k"), dd_quantile(col("h"), 0.5).as("p50"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val exact = rows.groupBy(_._1).map { case (k, g) =>
      k -> exactQuantile(g.map(_._3), 0.5)
    }
    exact.foreach { case (k, e) =>
      assert(math.abs(med(k) - e) <= DDOps.DefaultAlpha * math.abs(e) * 1.0000001, s"group $k")
    }
  }

  test("non-quantile hint plans prune the sketch aggregate (no dd_hist cost)") {
    import spark.implicits._
    val flat = (1 to 100).map(i => (i.toLong % 5, i.toLong * 1000, i.toDouble))
      .toDF("fingerprint", "timestamp_ms", "value")
      .withColumn("labels", lit("{}"))
    val maxPlan = graft.storage.Storage
      .hintedDownsample(flat, graft.model.ReadHints(10000L, "max_over_time")).get
      .queryExecution.executedPlan.toString
    assert(!maxPlan.contains("dd_hist"),
      "column pruning should drop the sketch partial from non-quantile hints")
    val qPlan = graft.storage.Storage
      .hintedDownsample(flat, graft.model.ReadHints(10000L, "quantile:0.9")).get
      .queryExecution.executedPlan.toString
    assert(qPlan.contains("dd_hist"), "quantile hints do build the sketch")
  }

  test("freq_sketch is EXACT and byte-deterministic when distinct <= capacity") {
    import graft.functions.{freq_sketch, freq_items}
    // gate-corpus regime: the soup vocabulary is far under 256
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = docs.select(explode(
      graft.ext.TextAnalysis.words(col("text"))).as("term"))
    val exact = terms.groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.size <= 256, "fixture vocabulary must be under capacity")
    def run(parts: Int): (Map[String, Long], Seq[Array[Byte]]) = {
      val sk = terms.repartition(parts).agg(freq_sketch(col("term")).as("sk"))
      val items = sk.select(explode(freq_items(col("sk"))).as("it"))
        .select(col("it.term"), col("it.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (items, sk.collect().map(_.getAs[Array[Byte]]("sk")).toSeq)
    }
    val (m1, b1) = run(1)
    val (m7, b7) = run(7)
    assert(m1 === exact, "single-partition summary must be exact")
    assert(m7 === exact, "multi-partition merge must stay exact under capacity")
    assert(java.util.Arrays.equals(b1.head, b7.head),
      "sorted-by-term serialization must be partitioning-independent here")
  }

  test("freq_sketch MG guarantees hold past capacity, under any merge order") {
    import graft.functions.{freq_sketch, freq_items, freq_n}
    // adversarial regime: 10k distinct terms >> capacity 64, with 20
    // planted heavy hitters owning half the mass
    val k = 64
    val df = spark.range(200000).select(
      when(col("id") % 2 === 0, concat(lit("hot"), col("id") % 20))
        .otherwise(concat(lit("tail"), pmod(xxhash64(col("id")), lit(10000))))
        .as("term"))
    val exact = df.groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n / (k + 1) // every estimate under-counts by at most this
    for (parts <- Seq(1, 4, 13)) {
      val sk = df.repartition(parts).agg(freq_sketch(col("term"), k).as("sk"))
      val items = sk.select(explode(freq_items(col("sk"))).as("it"))
        .select(col("it.term"), col("it.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(items.size <= k)
      val nSk = sk.select(freq_n(col("sk"))).collect().head.getLong(0)
      assert(nSk == n, "summary must count every processed value")
      // coverage: every true heavy hitter above the bound is present
      for ((t, c) <- exact if c > bound)
        assert(items.contains(t), s"parts=$parts: heavy '$t' ($c > $bound) missing")
      // estimates never overcount and under-count by at most the bound
      for ((t, est) <- items) {
        assert(est <= exact(t), s"parts=$parts: '$t' overcounted $est > ${exact(t)}")
        assert(est >= exact(t) - bound,
          s"parts=$parts: '$t' est $est below ${exact(t)} - $bound")
      }
    }
  }
}
