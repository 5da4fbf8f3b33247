package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Query-level properties that aren't oracle-expressible. */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // FAIR so the serving-path fairness test is real whichever suite
    // creates the shared context; default-pool behavior stays FIFO
    .config("spark.scheduler.mode", "FAIR")
    .getOrCreate()

  val dir = "/root/testdata/sf0.01"

  test("every inventory query executes and returns a non-degenerate schema at sf0.001") {
    // the driver's gate catches semantic drift at sf0.01; this catches
    // plain runtime breakage (analysis errors, missing columns) inside
    // the suite, before a gate round burns on it
    val tiny = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, tiny)
        assert(df.columns.nonEmpty, s"$name: no columns")
        df.count() // forces full execution
        None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
    // every oracle key must name a real query (a typo'd key would make
    // the driver record a silently-orphaned oracle)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
    assert(SparkEntry.entry(spark).count() > 0, "flagship entry must return rows")
  }

  test("Tables.events normalizes nanos-as-long and native-timestamp parquet identically") {
    import org.apache.spark.sql.functions._
    // the driver's events.parquet has shipped BOTH ways across rounds
    // (TIMESTAMP(NANOS) read as long, then native TIMESTAMP(MICROS));
    // whichever shape the current testdata has, synthesize the OTHER from
    // it and pin that the normalized frames agree row-for-row
    val dir = "/root/testdata/sf0.001"
    val normalized = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_events_ns_").toString
    // derive the raw-int64-nanos variant from the already-normalized frame
    // (works whichever shape the source dir currently has)
    graft.queries.Tables.events(spark, dir)
      .withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val viaNanos = graft.queries.Tables.events(spark, tmp)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    val a = normalized.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = viaNanos.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.length > 0 && a === b)
  }

  test("t8 sketch-quantile mode: threshold within DDSketch α of exact, no percentile pass") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val exact = graft.queries.TextQueries.qualityGateOf(docs, sketchQuantiles = false)
      .select("lang", "thresh").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sk = graft.queries.TextQueries.qualityGateOf(docs, sketchQuantiles = true)
    val skTh = sk.select("lang", "thresh").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(skTh.keySet === exact.keySet)
    for ((lang, t) <- exact) {
      // DDSketch guarantee: reported quantile within α=1% RELATIVE error of
      // a value at the true rank; +round(4) slack on both sides
      assert(math.abs(skTh(lang) - t) <= 0.011 * math.max(t, skTh(lang)) + 2e-4,
        s"lang=$lang sketch=${skTh(lang)} exact=$t")
    }
    // the sketch path must not plan an exact percentile aggregate
    val p = sk.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("percentile"), "sketch mode still plans percentile")
    assert(p.contains("dd_hist") || p.contains("dd_quantile"))
  }

  test("rp3 sketch-quantile mode: counts exact, PSI close where closeness is meaningful") {
    import org.apache.spark.sql.functions._
    def byLang(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // real corpus: integer token counts tie heavily AT the decile cuts, so
    // an α-shifted cut legitimately moves a whole tied group one bucket —
    // PSI closeness is not a sound property here. What IS exact regardless
    // of where cuts land: the language set and the per-side totals.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val exact = byLang(graft.queries.CurationQueries.driftOf(spark, docs, false))
    val sk = graft.queries.CurationQueries.driftOf(spark, docs, true)
    val got = byLang(sk)
    assert(got.keySet === exact.keySet)
    for ((lang, (nb, nn, _)) <- exact)
      assert((got(lang)._1, got(lang)._2) === ((nb, nn)), s"lang=$lang totals")
    val p = sk.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("percentile"), "sketch mode still plans percentile")
    // tie-free synthetic corpus (every token count unique within a lang):
    // an α-shifted cut moves AT MOST one doc per bucket boundary, so the
    // sketch PSI must track the exact PSI tightly
    import spark.implicits._
    val synth = (1 to 400).map { i =>
      (i.toLong, if (i % 2 == 0) "aa" else "bb", Seq.fill(10 + i)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val se = byLang(graft.queries.CurationQueries.driftOf(spark, synth, false))
    val ss = byLang(graft.queries.CurationQueries.driftOf(spark, synth, true))
    assert(ss.keySet === se.keySet)
    for ((lang, (nb, nn, psi)) <- se) {
      val (gb, gn, gpsi) = ss(lang)
      assert((gb, gn) === ((nb, nn)), s"synth lang=$lang totals")
      assert(math.abs(gpsi - psi) <= 0.05, s"synth lang=$lang psi sketch=$gpsi exact=$psi")
    }
  }

  test("rp3 driver-side discrete deciles == percentile_disc aggregate (r17 single-pass path)") {
    import org.apache.spark.sql.functions._
    // the r17 exact path computes cuts driver-side over a (t, count)
    // histogram; pin the rule against Spark's own percentile_disc on the
    // real corpus AND a tie-heavy synthetic (where an off-by-one in the
    // cume_dist arithmetic would move a cut)
    def check(docs: org.apache.spark.sql.DataFrame): Unit = {
      val tok = docs.select(col("lang"),
        size(graft.ext.TextAnalysis.words(col("text"))).as("t"))
      val agg = tok.groupBy("lang").agg(
        array((1 to 9).map(i =>
          expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY t)")): _*).as("cs"))
        .collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
      val hist = tok.groupBy("lang", "t").count().collect()
        .groupBy(_.getString(0)).view.mapValues(rows =>
          graft.queries.CurationQueries.discreteDeciles(
            rows.map(r => (r.getInt(1), r.getLong(2))).toSeq)).toMap
      assert(hist.keySet === agg.keySet)
      for ((lang, cs) <- agg)
        assert(hist(lang) === cs.toSeq, s"lang=$lang driver vs percentile_disc")
    }
    check(spark.read.parquet(s"$dir/documents.parquet"))
    import spark.implicits._
    check((1 to 300).map { i =>
      (if (i % 3 == 0) "aa" else "bb",
        Seq.fill(5 + (i % 7))("w").mkString(" ")) // heavy ties at 7 values
    }.toDF("lang", "text"))
  }

  test("pk2 sketch-quantile mode: monotone buckets, quartile-sized, no percentile pass") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sk = graft.queries.SamplingQueries.lengthBucketsOf(docs, sketchQuantiles = true)
    val rows = sk.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rows.length === docs.count())
    // bucket must be a monotone function of n_tokens — exact for ANY cut
    // placement, so it holds under α-approximate cuts where per-bucket
    // equality would not (ties at the exact quartile values legitimately
    // flip sides)
    val byTokens = rows.sortBy(_._2)
    byTokens.sliding(2).foreach {
      case Array((_, t1, b1), (_, t2, b2)) =>
        assert(b1 <= b2 || t1 == t2, s"bucket not monotone: ($t1,$b1) then ($t2,$b2)")
      case _ =>
    }
    // quartile cuts within α of exact put each bucket near n/4
    val sizes = rows.groupBy(_._3).view.mapValues(_.size).toMap
    assert((0 to 3).forall(sizes.contains), s"empty bucket: $sizes")
    val n = rows.length.toDouble
    for ((b, s) <- sizes)
      assert(s >= n * 0.10 && s <= n * 0.45, s"bucket $b size $s of $n")
    val p = sk.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("percentile"), "sketch mode still plans percentile")
  }

  test("salted aggregation equals direct aggregation (skewed key)") {
    import org.apache.spark.sql.functions._
    // 90% of rows on one hot key — the shape salting exists for
    val df = spark.range(100000).select(
      when(col("id") % 10 < 9, "hot").otherwise(concat(lit("k"), col("id") % 7)).as("k"),
      (col("id") % 100).cast("double").as("v"))
    val direct = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val saltedN = graft.ext.Salting.saltedCount(df, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedS = graft.ext.Salting.saltedSum(df, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(saltedN === direct.view.mapValues(_._1).toMap)
    // sums of integral-valued doubles — exact regardless of order
    assert(saltedS === direct.view.mapValues(_._2).toMap)
  }

  test("approx percentile tracks exact within sketch accuracy") {
    val exact = SparkEntry.queries("q9_percentile")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = SparkEntry.queries("q9_percentile_approx")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (p50, p95)) <- exact) {
      val (a50, a95) = approx(k)
      assert(math.abs(a50 - p50) / math.max(math.abs(p50), 1) < 0.05, s"$k p50: $p50 vs $a50")
      assert(math.abs(a95 - p95) / math.max(math.abs(p95), 1) < 0.05, s"$k p95: $p95 vs $a95")
    }
  }

  test("HLL cardinality tracks exact within the sketch's error bound") {
    val exact = SparkEntry.queries("a3_cardinality")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("a3_cardinality_hll")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((name, n) <- exact) {
      val a = approx(name)
      assert(math.abs(a - n).toDouble / n < 0.1, s"$name: exact=$n hll=$a")
    }
  }

  test("cur3 line prep: dedup fires only on cleaner survivors, boilerplate gone") {
    val rows = SparkEntry.queries("cur3_line_prep")(spark, dir).collect()
    assert(rows.length > 0)
    // only kept pages surface, and the planted boilerplate actually fired
    assert(rows.forall(_.getAs[Long]("n_kept") >= 3))
    assert(rows.map(_.getAs[Long]("n_dup_removed")).sum > 0, "dedup stage was vacuous")
    for (r <- rows) {
      val txt = r.getAs[String]("final_text")
      assert(!txt.contains("subscribe to our newsletter"), s"boilerplate survived: $txt")
      val kept = txt.split("\n").count(_.nonEmpty)
      // final lines = cleaner survivors minus dedup removals
      assert(kept == r.getAs[Long]("n_kept") - r.getAs[Long]("n_dup_removed"))
    }
  }

  test("sm5 DSIR: keeps ~30%, and target-language docs score above the rest") {
    import org.apache.spark.sql.functions._
    val kept = SparkEntry.queries("sm5_dsir_resample")(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count().toDouble
    val frac = kept.count() / nDocs
    // >= 70th percentile with ties → at least 30%, not wildly more
    assert(frac >= 0.29 && frac <= 0.45, s"kept fraction $frac")
    // the importance weights are trained to prefer the target (en) slice,
    // so en documents must survive the cut at a higher rate than the rest
    val keptRate = kept.join(docs.select("doc_id", "lang"), "doc_id")
      .where(col("lang") === "en").count().toDouble /
      docs.where(col("lang") === "en").count()
    val restRate = kept.join(docs.select("doc_id", "lang"), "doc_id")
      .where(col("lang") =!= "en").count().toDouble /
      docs.where(col("lang") =!= "en").count()
    assert(keptRate > restRate,
      s"en kept at $keptRate <= rest at $restRate — importance weights inverted?")
  }

  test("d13 line dedup: boilerplate gone everywhere, survivors preserved in order") {
    val rows = SparkEntry.queries("d13_line_dedup")(spark, dir).collect()
    assert(rows.length > 0)
    assert(rows.map(_.getAs[Long]("n_dup_lines")).sum > 0, "nothing was removed")
    for (r <- rows) {
      val deduped = r.getAs[String]("deduped")
      assert(!deduped.contains("boiler plate notice"), s"boilerplate survived: $deduped")
      val nKept = deduped.split("\n").count(_.nonEmpty)
      assert(nKept == r.getAs[Long]("n_lines") - r.getAs[Long]("n_dup_lines"),
        s"doc ${r.getAs[Long]("doc_id")}: kept $nKept of ${r.getAs[Long]("n_lines")}")
    }
  }

  test("t10 C4 clean: every surviving line satisfies every rule, page flags honest") {
    val rows = SparkEntry.queries("t10_c4_clean")(spark, dir).collect()
    assert(rows.length > 0)
    val kept = rows.filter(_.getAs[Boolean]("page_kept"))
    val dropped = rows.filterNot(_.getAs[Boolean]("page_kept"))
    // planted markers must exercise both outcomes
    assert(kept.nonEmpty && dropped.nonEmpty, s"degenerate split: ${kept.length} kept")
    for (r <- rows) {
      val lines = r.getAs[String]("cleaned").split("\n").filter(_.nonEmpty)
      assert(lines.length == r.getAs[Long]("n_kept"))
      for (l <- lines) {
        assert(l.endsWith("."), s"no terminal punctuation: '$l'")
        assert(l.split(" ").length >= 5, s"short line survived: '$l'")
        assert(!l.contains("javascript"), s"policy token survived: '$l'")
      }
      // a kept page has >= 3 surviving lines and no brace anywhere
      if (r.getAs[Boolean]("page_kept")) {
        assert(r.getAs[Long]("n_kept") >= 3)
        assert(!r.getAs[String]("cleaned").contains("{"))
      }
    }
  }

  test("ev5 sketch heavy hitters equal the exact top-k in the under-capacity regime") {
    // gate corpus: distinct users ≪ MG capacity → est counts are exact,
    // so the sketch's (user, est) prefix equals the exact form's
    // (user, n_events) — the anchor that makes ev5_sketch's rows-only
    // status honest (fi1's pairing, applied to events)
    val tiny = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("ev5_heavy_users")(spark, tiny)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val sketch = SparkEntry.queries("ev5_heavy_users_sketch")(spark, tiny)
      .orderBy(org.apache.spark.sql.functions.col("rank"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    // tie-break differs (the sketch orders tied terms lexically, the exact
    // form numerically) — the count SEQUENCE and the (user, count) SET are
    // the semantics
    assert(sketch.map(_._2) === exact.map(_._2))
    assert(sketch.toSet === exact.toSet)
  }

  test("graph kernels on an edge-less graph return empty, not a plan-time 1/0") {
    // a crawl with no absolute links produces zero edges; ANSI constant
    // folding would turn 1.0/0 into a DIVIDE_BY_ZERO at plan time
    // (caught live by Smoke's fromCrawl on the unlinked fixture)
    import spark.implicits._
    val empty = Seq.empty[(String, String)].toDF("src", "dst")
    assert(graft.queries.GraphQueries
      .pagerank(empty, 3, 0.85, broadcastRanks = false).count() === 0)
    assert(graft.queries.GraphQueries
      .hits(empty, 3, broadcastRanks = false).count() === 0)
  }

  test("pagerank conserves mass on a sink-bearing graph (dangling redistribution)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    // node 3 is a pure sink, node 4 reachable only through it — without
    // the dangling-mass term the kernel loses damping·rank(3) every
    // iteration and Σpr drifts below 1
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (1L, 3L), (2L, 4L))
      .toDF("src", "dst")
    for (bcast <- Seq(true, false); iters <- Seq(1, 5)) {
      val pr = graft.queries.GraphQueries.pagerank(edges, iters, 0.85, bcast)
      val mass = pr.agg(sum(col("pr"))).head().getDouble(0)
      assert(math.abs(mass - 1.0) < 1e-9,
        s"mass $mass after $iters iters (broadcast=$bcast)")
      // sinks still hold rank (they receive, never emit)
      val sink = pr.where(col("h") === 3L).head().getDouble(1)
      assert(sink > 0.15 / 5, s"sink rank $sink must exceed bare teleport")
    }
  }
}
