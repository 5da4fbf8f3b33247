package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts: the plans the 100 TB design depends on, asserted
  * so a refactor can't silently regress them (SCALE.md documents why each
  * shape matters). Runs on sf0.001 — plan shape is SF-independent. */
class PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // FAIR so the serving-path fairness test is real whichever suite
    // creates the shared context; default-pool behavior stays FIFO
    .config("spark.scheduler.mode", "FAIR")
    // FileScan metadata (PushedFilters etc.) truncates at 100 chars by
    // default — long pushed-filter lists would hide the entries these
    // contracts assert on
    .config("spark.sql.maxMetadataStringLength", "2000")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // finalize AQE so codegen spans are visible
    df.queryExecution.executedPlan.toString
  }

  test("q3 star join: all dimensions broadcast, no sort-merge join") {
    val p = plan("q3_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q4 semi-join: broadcast left-semi, fact side not shuffled") {
    val p = plan("q4_semijoin")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q2 top-k plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("q2_topk").contains("TakeOrderedAndProject"))
  }

  test("q5 range scan: time + type predicates pushed to parquet") {
    val p = plan("q5_range_scan")
    assert(p.contains("PushedFilters: [IsNotNull"))
    // the pushdown rule derives raw-column bounds from the comparison over
    // the normalizing conversion — raw int64 nanos bounds when events.ts
    // ships as TIMESTAMP(NANOS)-as-long, raw NTZ bounds when it ships as
    // native TIMESTAMP(MICROS) — and these must reach the scan
    // (PushedFilters renders truncated, so check the derived conjuncts)
    assert(p.contains("GreaterThanOrEqual(ts"))
    import org.apache.spark.sql.types.LongType
    val rawIsLong = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == LongType
    if (rawIsLong) {
      assert("""\(ts#\d+L? >= \d{15,}\)""".r.findFirstIn(p).nonEmpty)
      assert("""\(ts#\d+L? <= \d{15,}\)""".r.findFirstIn(p).nonEmpty)
    } else {
      assert("""\(ts#\d+ >= 2024-01-02""".r.findFirstIn(p).nonEmpty, p.take(2000))
      assert("""\(ts#\d+ <= 2024-01-05""".r.findFirstIn(p).nonEmpty)
    }
  }

  test("q1 agg runs inside whole-stage codegen with partial aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("*(")) // WholeStageCodegen spans render as *(n)
    assert(p.contains("partial_sum"))
    // two HashAggregates = map-side partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }

  test("store read path: date partition pruning + fingerprint/ts pushdown") {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_planspec_").toString
    val store = new graft.storage.ParquetStore(spark, root)
    store.write(spark.range(100).select(
      map(lit("__name__"), lit("m"), lit("i"), (col("id") % 5).cast("string")).as("labels"),
      (lit(1700000000000L) + col("id") * 1000L).as("timestamp_ms"),
      col("id").cast("double").as("value")))
    val q = graft.model.Query(1700000000000L, 1700000050000L,
      Seq(graft.model.Matcher("i", graft.model.MatchType.Eq, "3")))
    val p = store.read(q).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(date"))
    assert(p.contains("GreaterThanOrEqual(timestamp_ms"))
    assert(p.contains("EqualTo(fingerprint") || p.contains("In(fingerprint"))
    assert(!p.contains("SortMergeJoin")) // label attach is broadcast
  }

  test("LSH candidate generation never degrades to a cartesian product") {
    // d2/d4/s2 join on bucket keys — equi-joins by construction; a refactor
    // that loses the equi-condition would silently go quadratic at scale
    for (name <- Seq("d2_dedup_minhash_lsh", "d4_dedup_simhash", "s2_ann_lsh")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), name)
    }
  }

  test("d2 bucket-size cap: count pass shuffles aggregated rows, not the banded table") {
    // The pre-count that bounds LSH buckets must partially aggregate BELOW
    // its exchange — its shuffle then carries one row per (bucket,
    // partition), not the full banded table. Losing partial_count here
    // would double the d2 shuffle volume at scale.
    // executedPlan.toString appends the AQE "Initial Plan" — measure only
    // the final one
    val p = plan("d2_dedup_minhash_lsh").split("== Initial Plan ==")(0)
    assert(p.contains("partial_count"), "bucket pre-count lost map-side partial aggregation")
    assert(p.contains("partial_collect_list"), "bucket collect lost map-side partial aggregation")
    // one banded exchange for the collect pass + one small aggregated-count
    // exchange; the in-cap key set joins via broadcast, never reshuffling
    // the banded table
    val bandedExchanges = "Exchange hashpartitioning\\(band".r.findAllIn(p).size
    assert(bandedExchanges <= 2, s"unexpected extra banding shuffles: $bandedExchanges")
  }

  test("rh2 rollup rate: one events scan, one partial-agg exchange + one merge exchange") {
    // the per-batch partials are computed with the batch id as a grouping
    // key — regressing to per-batch rollupPartials calls would scan events
    // once per batch and add an exchange per batch
    val p = plan("rh2_rate_rollup")
    val finalPlan = p.split("== Initial Plan ==").head
    assert("events\\.parquet".r.findAllIn(finalPlan).size <= 1,
      "rh2 must scan events exactly once")
    assert("(?m)^\\s*\\+?- Exchange ".r.findAllIn(finalPlan).size <= 2,
      "rh2 is two exchanges: partials on (keys, batch, bucket), merge on (keys, step)")
    // the quantile sketch partial rollupPartials builds must be PRUNED
    // from non-quantile hints — a rate hint pays nothing for dd_hist
    assert(!finalPlan.contains("dd_hist"),
      "rh2: the DDSketch partial must be column-pruned from a rate hint")
  }

  test("t9: LM scoring plans with no window and no corpus-sized gather") {
    // the scale contract: model build + scoring are aggregations and
    // equi-joins only — a Window or a corpus-sized single-partition
    // funnel would mean one task does the work at 100 TB. The ONE
    // allowed SinglePartition exchange is the model's 1-row
    // vocabulary-count aggregate (bounded by the pruned LM, not the
    // corpus), and no Sort may feed a single partition anywhere.
    val p = plan("t9_lm_score").split("== Initial Plan ==").head
    assert(!p.contains("Window"), s"t9 must not window:\n$p")
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 1,
      s"t9: only the 1-row vocab aggregate may gather:\n$p")
    assert(!p.contains("Sort "), s"t9 must not sort anything:\n$p")
  }

  test("ev4: one events scan, no join — fan-out + min-offset replaces the range self-join") {
    val p = plan("ev4_active_users").split("== Initial Plan ==").head
    assert("events\\.parquet".r.findAllIn(p).size <= 1,
      s"ev4 must scan events exactly once:\n$p")
    assert(!p.contains("Join"), s"ev4 must not join:\n$p")
  }

  test("ev1/ev3: one user_id exchange serves the window AND the downstream rollup") {
    // the event-analytics family's scale contract: the only corpus-sized
    // exchange is on user_id (the natural key). ev1's session rollup keys
    // (user_id, session_no) are a superset of the window partitioning, so
    // EnsureRequirements must reuse it (subset-key satisfies clustering) —
    // a second corpus-sized exchange would double the shuffle at 100 TB
    for (name <- Seq("ev1_sessionize", "ev3_retention")) {
      val p = plan(name).split("== Initial Plan ==").head
      assert("events\\.parquet".r.findAllIn(p).size <= 1,
        s"$name must scan events exactly once")
      val nEx = "(?m)^\\s*\\+?- Exchange ".r.findAllIn(p).size
      val bound = if (name == "ev1_sessionize") 1 else 2
      assert(nEx <= bound, s"$name: $nEx exchanges, expected <= $bound")
    }
  }

  test("sessionsOf self-sizes its exchange: rows-per-task bounded, not the global setting") {
    // the measured SCALE.md §5 remedy, encoded in the operator: a corpus
    // whose estimated bytes outgrow 64 MB/task must widen the user_id
    // exchange beyond spark.sql.shuffle.partitions (no env knob), while
    // the window and session rollup still reuse that ONE exchange
    import org.apache.spark.sql.functions._
    val big = spark.range(2000000000L).select(
      (col("id") % 1000000L).as("user_id"), col("id").as("event_id"),
      timestamp_micros(col("id")).as("ts"), (col("id") % 100).cast("double").as("value"))
    val n = graft.queries.EventQueries.boundedExchangePartitions(big)
    val default = spark.sessionState.conf.numShufflePartitions
    assert(n > default, s"2B-row input must widen beyond $default, got $n")
    val p = graft.queries.EventQueries.sessionsOf(big)
      .queryExecution.executedPlan.toString
    assert(p.contains(s", $n),"), s"exchange must carry $n partitions:\n$p")
    assert("(?m)^\\s*\\+?- Exchange ".r.findAllIn(p).size === 1,
      s"still exactly one exchange:\n$p")
    // a small input keeps the global setting — gate plans are unchanged
    val small = spark.range(1000L).select(
      (col("id") % 10L).as("user_id"), col("id").as("event_id"),
      timestamp_micros(col("id")).as("ts"), lit(1.0).as("value"))
    assert(graft.queries.EventQueries.boundedExchangePartitions(small) === default)
  }

  test("rollup partials pruning: each hint pays only for the partials it reads") {
    // rollupPartials computes cnt/min/max/sum + sum_sq + first/last packs +
    // a DDSketch — but each serving plan must column-prune everything its
    // hint func doesn't read, or every rollup query pays the sketch build
    // (the dominant partial cost: a hashmap + serialization per group).
    // rh2 (rate) was locked in round 5 (a665a96); this extends the
    // contract to the rest of the family. Pruning evidence: the pruned
    // aggregate's expression names cannot appear anywhere in the final
    // physical plan.
    val rh3 = plan("rh3_last_rollup").split("== Initial Plan ==").head
    assert(!rh3.contains("dd_hist"), "rh3 (last): sketch partial must be pruned")
    assert(!rh3.contains("sum_sq"), "rh3 (last): sum-of-squares partial must be pruned")
    val rh5 = plan("rh5_stddev_rollup").split("== Initial Plan ==").head
    assert(!rh5.contains("dd_hist"), "rh5 (stddev): sketch partial must be pruned")
    assert(!rh5.contains("ts_val_encode"), "rh5 (stddev): first/last packs must be pruned")
    val rh1 = plan("rh1_hinted_read").split("== Initial Plan ==").head
    assert(!rh1.contains("dd_hist"), "rh1 (max, hintedDownsample): sketch pruned")
    assert(!rh1.contains("sum_sq"), "rh1 (max, hintedDownsample): sum_sq pruned")
    assert(!rh1.contains("ts_val_encode"), "rh1 (max, hintedDownsample): first/last pruned")
    // rh4 (quantile) is the one plan that SHOULD carry the sketch
    val rh4 = plan("rh4_quantile_rollup").split("== Initial Plan ==").head
    assert(rh4.contains("dd_hist"), "rh4 (quantile): sketch partial must survive pruning")
  }

  test("streaming rollup sink probe: reads only join keys, bucket+date pruned") {
    // appendRollupIdempotent's existence probe must never read the wide
    // partial columns of the on-disk rollup (the sketch bytes dominate row
    // width) — only (fingerprint, bucket_ms), with the date partition and
    // bucket range pushed to the scan.
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("graft_planspec_sink_").toString +
      "/samples_rollup"
    val rows = graft.storage.Storage.rollupPartials(
      spark.range(1000).select(
        (col("id") % 7).as("fingerprint"),
        (lit(1700000000000L) + col("id") * 60000L).as("timestamp_ms"),
        col("id").cast("double").as("value")), 3600000L)
      .withColumn("date", to_date(timestamp_millis(col("bucket_ms"))))
    rows.write.partitionBy("date").parquet(root)
    val probe = graft.streaming.Downsample.existingKeys(
      spark, rows.schema, root, 1700000000000L, 1700030000000L)
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<fingerprint:bigint,bucket_ms:bigint>"),
      s"probe must read exactly the two key columns:\n$p")
    assert(p.contains("PartitionFilters: [isnotnull(date"), s"date partitions must prune:\n$p")
    assert(p.contains("GreaterThanOrEqual(bucket_ms"), s"bucket range must push down:\n$p")
  }

  test("rollup partials and merge hash-aggregate (no SortAggregate from first/last)") {
    // min/max over the ts_val_encode decimal pack must keep every rollup
    // aggregation in HashAggregateExec; the struct formulation it replaces
    // silently fell to SortAggregateExec — sorting the full input of the
    // ingest- and serving-hot stages (measured ~10x slower per row)
    import org.apache.spark.sql.functions._
    val df = spark.range(10000).select(
      (col("id") % 7).as("fingerprint"),
      (lit(1700000000000L) + col("id") * 250).as("timestamp_ms"),
      (col("id") % 13).cast("double").as("value"))
    val partials = graft.storage.Storage.rollupPartials(df, 60000L)
    val merged = graft.storage.Storage.mergeRollup(partials, 300000L)
    val p = merged.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), "rollup aggs must hash-aggregate")
    assert(!p.contains("SortAggregate"),
      "a SortAggregate in the rollup path means a struct/binary agg buffer crept back in")
    // same contract for the gate queries that pick first/last by pack key
    for (q <- Seq("a1_assembly_stats", "ds1_downsample")) {
      val qp = plan(q).split("== Initial Plan ==").head
      assert(!qp.contains("SortAggregate"), s"$q must not sort-aggregate")
    }
  }

  test("as-of join is a single window pass, not a range join") {
    val p = plan("as1_asof_join")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("NanosComparisonPushdown: identical results with and without the rule") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    graft.plans.Rules.install(spark)
    // nanos straddling µs-bucket boundaries incl. exact-thousand edges
    val base = 1700000000000000000L
    val ns = (0 until 50).map(i => base + i * 333L) ++
      Seq(base, base + 999, base + 1000, base + 1001, base + 2000)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(ns.map(org.apache.spark.sql.Row(_)), 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType))))
      .withColumn("t", expr("timestamp_micros(ts DIV 1000)"))
    val boundMicros = base / 1000 + 1
    val bound = lit(java.time.Instant.ofEpochSecond(0, boundMicros * 1000))
    def conv(n: Long): Long = java.lang.Math.floorDiv(n, 1000L)
    val cases: Seq[(String, Column => Column, Long => Boolean)] = Seq(
      (">=", _ >= bound, conv(_) >= boundMicros),
      (">", _ > bound, conv(_) > boundMicros),
      ("<=", _ <= bound, conv(_) <= boundMicros),
      ("<", _ < bound, conv(_) < boundMicros),
      ("=", _ === bound, conv(_) == boundMicros))
    for ((label, sparkPred, scalaPred) <- cases) {
      val got = df.where(sparkPred(col("t"))).select("ts")
        .collect().map(_.getLong(0)).sorted.toSeq
      val want = ns.filter(scalaPred).sorted
      assert(got === want, s"comparator $label")
    }
  }

  test("t8/pk2 percentile gates: corpus is never globally sorted or windowed") {
    // the thresholds are tiny aggregates broadcast back over the corpus —
    // a Window/ntile formulation would sort the corpus into ~|langs| tasks
    for (name <- Seq("t8_quality_gate", "pk2_length_buckets")) {
      val p = plan(name)
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$name: threshold side should broadcast")
      assert(!p.contains("Window"), s"$name: no window over the corpus")
      assert(!p.contains("SortMergeJoin"), s"$name: corpus never shuffle-joined")
    }
  }

  test("d8 bloom decontamination: probe filtered map-side before any join") {
    val p = plan("d8_decontam_bloom")
    assert(p.contains("might_contain"), "bloom probe must appear as a filter")
    // the bloom filter is evaluated in a Filter, upstream of the exact join
    val filterIdx = p.indexOf("might_contain")
    val joinIdx = p.indexOf("HashJoin")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "plan renders top-down: the join sits above the bloom-filtered scan")
  }

  test("cur1 curation: quality gate pushed below joins, bench side broadcast") {
    val p = plan("cur1_curation_manifest")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("t10 C4 clean is map-only: no exchange, no join, no sort, no filter") {
    val p = plan("t10_c4_clean")
    assert(!p.contains("Exchange"), s"t10 must not shuffle:\n$p")
    assert(!p.contains("Join") && !p.contains("Sort"), s"t10 is a pure projection:\n$p")
    // page rejection is a projected flag, NOT a Filter — a .where over the
    // computed line arrays would clone the HOF chain into a pushed-down
    // predicate (the s6 lesson, commit eb31328). Match the operator node
    // only (the plan text also says "PushedFilters:" and "filter(" HOFs).
    assert("(?m)^[\\s+*-]*(\\(\\d+\\) )?Filter ".r.findFirstIn(p).isEmpty,
      s"t10 must not plan a Filter operator:\n$p")
  }

  test("url1 URL gate: broadcast blocklist probe, corpus never shuffles") {
    val p = plan("url1_url_filter")
    assert(p.contains("BroadcastHashJoin"), s"blocklist must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    // the only exchange allowed is the broadcast of the blocklist itself —
    // the corpus side is a pure codegen string-expression projection
    assert(!p.contains("Exchange hashpartitioning"),
      s"url1 must not shuffle the corpus:\n$p")
  }

  test("mm6 header metadata is map-only (the header-bytes fast path)") {
    val p = plan("mm6_image_header")
    assert(!p.contains("Exchange"), s"mm6 must not shuffle:\n$p")
    assert(!p.contains("Join") && !p.contains("Sort"))
  }

  test("html1 extraction is map-only (the raw-crawl front door never shuffles)") {
    val p = plan("html1_extract")
    assert(!p.contains("Exchange"), s"html1 must not shuffle:\n$p")
    assert(!p.contains("Join") && !p.contains("Sort"))
  }

  test("s4 quantization is map-only: no exchange, no join, no sort") {
    val p = plan("s4_quantize_int8")
    assert(!p.contains("Exchange"), s"s4 must not shuffle:\n$p")
    assert(!p.contains("Join") && !p.contains("Sort"), s"s4 is a pure projection:\n$p")
  }

  test("s5 centroids: partial aggregation below the exchange, no corpus sort") {
    val p = plan("s5_label_centroid")
    // partial_avg in the map-side HashAggregate proves the rows×dim explode
    // output collapses to labels×dim partials before the shuffle
    assert(p.contains("partial_avg") || p.contains("partial_average"),
      s"s5: map-side partial aggregation missing:\n$p")
    assert(!p.contains("SortAggregate"), s"s5: avg must hash-aggregate:\n$p")
    assert(!p.contains("Window"), s"s5: no window:\n$p")
  }

  test("rp1 corpus stats: one documents scan, hash aggregation only") {
    val p = plan("rp1_corpus_stats")
    assert(!p.contains("Window"), s"rp1: no window over the corpus:\n$p")
    assert(!p.contains("Join"), s"rp1: single-table report, no join:\n$p")
    // exactly one parquet scan of documents in the FINAL plan (the AQE
    // string repeats it in the "Initial Plan" section; count-distinct
    // plans a second aggregation level, not a second scan)
    val fin = p.split("== Initial Plan ==").head
    assert("Scan parquet".r.findAllIn(fin).size === 1, s"rp1: one corpus scan:\n$fin")
  }

  test("sh1 epoch shuffle: window partitioned by bucket, never SinglePartition") {
    val p = plan("sh1_epoch_shuffle")
    assert(p.contains("hashpartitioning(__bucket"), s"sh1: bucket exchange missing:\n$p")
    assert(!p.contains("SinglePartition"), s"sh1: single-partition stage found:\n$p")
  }

  test("s6 quantized ANN: corpus never shuffled — queries and candidates broadcast") {
    val p = plan("s6_ann_quantized").split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"s6: bounded sides must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"s6: the corpus must not shuffle into a join:\n$p")
  }

  test("dd_quantile multi-quantile projection compiles under CODEGEN_ONLY") {
    // r15: a fixed local `r` in DDQuantile.doGenCode made Janino reject
    // any generated function holding two+ dd_quantile calls (the
    // p50/p90/p99 shape in rh4, the sampling q1/q2/q3, curation's
    // ten-point spectrum) and Spark fell back to interpreted eval for
    // the whole projection, SILENTLY — correct answers, un-codegen'd
    // plan. CODEGEN_ONLY turns that fallback into a failure; an isolated
    // newSession keeps the conf flip invisible to parallel suites.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val df = SparkEntry.queries("rh4_quantile_rollup")(s2, dir)
    assert(df.collect().nonEmpty)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("),
      s"the multi-quantile projection must stay inside a codegen span:\n$p")
  }

  test("fingerprint expression stays inside whole-stage codegen") {
    val p = plan("x1_fingerprint")
    assert(p.contains("*(")) // WholeStageCodegen spans render as *(n)
    assert(p.contains("labels_fingerprint") || p.contains("fingerprint"))
  }

  test("ev5: exact top-k plans as TakeOrderedAndProject over partial aggregation") {
    val p = plan("ev5_heavy_users")
    assert(p.contains("TakeOrderedAndProject"), s"ev5 must not global-sort:\n$p")
    assert(!p.contains("SinglePartition") || p.contains("TakeOrderedAndProject"),
      s"ev5: no single-partition sort stage:\n$p")
    // sketch form: one 256-counter ObjectHashAggregate pair, no user-keyed
    // exchange of the raw events
    val ps = plan("ev5_heavy_users_sketch")
    assert("ObjectHashAggregate".r.findAllIn(ps).size >= 2,
      s"ev5 sketch must combine MG partials map-side:\n$ps")
  }

  test("pk3: block fan-out is a map-side Generate above the bucketed window — no extra exchange") {
    val p = plan("pk3_block_manifest")
    assert(p.contains("Generate explode"), s"pk3 needs the sequence explode:\n$p")
    assert(p.contains("hashpartitioning(__bucket"), s"pk3 windows per bucket:\n$p")
    assert(!p.contains("SinglePartition"), s"pk3 must never single-partition:\n$p")
    // the explode must add no exchange of its own: plans print top-down,
    // so nothing named Exchange may appear ABOVE the Generate in the final
    // plan — only the prefix-sum exchanges below it
    val finalPlan = p.split("== Initial Plan ==").head
    val gen = finalPlan.indexOf("Generate explode")
    assert(gen >= 0 && !finalPlan.substring(0, gen).contains("Exchange"),
      s"pk3: exchange above the block fan-out:\n$p")
  }

  test("t11 compression ratio is map-only: no exchange in the plan") {
    val p = plan("t11_compression_ratio")
    assert(!p.contains("Exchange"), s"t11 must not shuffle:\n$p")
  }

  test("bm1: no keyed shuffle — stats are one bounded global agg, top-k is TakeOrdered") {
    val p = plan("bm1_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"), s"bm1 must not global-sort:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bm1 must not shuffle by key (tf is map-side, stats broadcast back):\n$p")
    assert(!p.contains("SortMergeJoin"), s"bm1's stats join must broadcast:\n$p")
    val finalPlan = p.split("== Initial Plan ==").head
    assert("Exchange SinglePartition".r.findAllIn(finalPlan).size <= 1,
      s"bm1: only the corpus-stats agg may gather:\n$p")
  }

  test("hyb1 hybrid fusion: rankers TakeOrdered the corpus, fused exchange is bounded") {
    val p = plan("hyb1_hybrid_rrf")
    // both rankers cut the corpus with per-partition heaps, never a
    // global sort of corpus-sized data (the window sorts that assign
    // ranks run ABOVE those cuts, on ≤pool-row frames)
    assert(p.contains("TakeOrderedAndProject"), s"rankers must not global-sort:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"stats/query attaches must broadcast, never sort-merge:\n$p")
    val finalPlan = p.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size <= 1,
      s"only the fused aggregate (≤ 2·pool rows) may hash-shuffle:\n$p")
  }

  test("hyb2 served hybrid: no corpus scan — both rankers read their artifacts") {
    val p = plan("hyb2_hybrid_served")
    // the whole point of the served form: query cost is the two pruned
    // artifact reads + the bounded fusion, never a documents tokenize
    assert(!p.contains("documents.parquet"),
      s"served hybrid must not scan the corpus:\n$p")
    assert(!p.contains("SortMergeJoin"), s"bounded sides must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"pools must not global-sort:\n$p")
  }

  test("prf2 expanded-query round 2 keeps bm1's no-keyed-shuffle shape") {
    // the expansion term set rides the driver (bounded ≤e collect at plan
    // construction), so the executed plan IS round 2: map-side tf columns
    // over |orig|+e terms, one bounded stats gather, TakeOrdered cut
    val p = plan("prf2_bm25_expanded")
    assert(p.contains("TakeOrderedAndProject"), s"prf2 must not global-sort:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"prf2 round 2 must not shuffle by key:\n$p")
    assert(!p.contains("SortMergeJoin"), s"prf2's stats join must broadcast:\n$p")
  }

  test("hn2 hard negatives: heap-aggregate cut, one bounded exchange, no corpus window") {
    // the mined term sets AND the anchor shingle sets ride the driver
    // (bounded anchor-model collect at plan construction — r17: one
    // id-pushdown fetch; anchor SELECTION's TakeOrdered also runs there,
    // so it no longer appears in this frame), leaving the executed plan
    // as pure scoring+cut: per-anchor branches over ONE checkpointed
    // frequency frame whose jac columns carry the map-side Jaccard
    // exclusion against literal shingle sets, broadcast stats, and a
    // partial bottom_k heap per task — the only hash exchange carries
    // ≤ anchors·n·tasks heap rows
    val p = plan("hn2_hard_negatives")
    assert(!p.contains("SortMergeJoin"),
      s"stats/shingle attaches must broadcast:\n$p")
    assert(p.contains("partial_bottom_k"),
      s"the per-anchor cut must be the map-side heap aggregate:\n$p")
    assert(!p.contains("Window"),
      s"the negative path must not window-rank corpus-sized data:\n$p")
    assert(!p.contains("TakeOrderedAndProject") && !p.contains("Scan parquet"),
      s"anchor selection and the corpus tokenize run at plan construction " +
        s"(driver-bounded model + checkpointed frequency frame) — neither " +
        s"may reappear in the scoring frame:\n$p")
    val finalPlan = p.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size <= 1,
      s"only the bottom_k merge may hash-shuffle:\n$p")
  }

  test("ql1 Dirichlet LM keeps bm1's no-keyed-shuffle shape") {
    val p = plan("ql1_lm_dirichlet")
    assert(p.contains("TakeOrderedAndProject"), s"ql1 must not global-sort:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"ql1 must not shuffle by key (stats are one bounded gather):\n$p")
    assert(!p.contains("SortMergeJoin"), s"ql1's stats join must broadcast:\n$p")
  }

  test("kmv sketch pass: one scan, partial k-entry state, no keyed shuffle, no join") {
    // the whole point vs kmv1's exact card: the sketch pass is a
    // partial-aggregate gather (k-entry TreeSet per task), never a
    // g-keyed distinct exchange or an equi-join. kmv2's gate frame is a
    // driver-built card, so the pin targets the sketch aggregation
    // itself
    val df = graft.queries.OverlapQueries.sketchFrame(
      graft.queries.Tables(spark, dir, "documents"), bench = false)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_kmv_sketch"),
      s"the sketch must aggregate map-side before the gather:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"the sketch pass must not shuffle by key:\n$p")
    assert(!p.contains("Join"), s"the sketch pass must not join:\n$p")
  }

  test("lnk1 outlink extraction is map-only; pp1 is map-only + TakeOrdered") {
    val p1 = plan("lnk1_outlinks")
    assert(!p1.contains("Exchange"), s"lnk1 must not shuffle:\n$p1")
    val p2 = plan("pp1_phrase_match")
    assert(p2.contains("TakeOrderedAndProject"), s"pp1 must not global-sort:\n$p2")
    assert(!p2.contains("Exchange hashpartitioning"), s"pp1 must not shuffle by key:\n$p2")
  }

  test("ii1: one vocabulary-keyed exchange carrying bounded bottom-k pages") {
    val p = plan("ii1_postings_page")
    val finalPlan = p.split("== Initial Plan ==").head
    assert("Exchange hashpartitioning\\(term".r.findAllIn(finalPlan).nonEmpty,
      s"ii1 groups by term:\n$p")
    assert("(?m)^\\s*\\+?- Exchange ".r.findAllIn(finalPlan).size === 1,
      s"ii1: exactly one exchange (map-side array_distinct kills the dedup shuffle):\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"ii1 must not global-sort:\n$p")
    assert(p.contains("partial_bottom_k") || p.contains("bottom_k"),
      s"ii1's postings page must be a partial aggregate, not a full list:\n$p")
  }

  test("rj1: range join runs as bucketized equi-join, never a nested-loop theta join") {
    val p = plan("rj1_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"rj1 must not theta-join (|dates| x |lineitem| comparisons):\n$p")
    assert(p.contains("Generate explode"),
      s"rj1's interval must explode into bounded day buckets:\n$p")
  }

  test("ii3: multi-page shards keep ii1's single-exchange shape (pagination is map-side)") {
    val p = plan("ii3_postings_shards")
    val finalPlan = p.split("== Initial Plan ==").head
    assert("(?m)^\\s*\\+?- Exchange ".r.findAllIn(finalPlan).size === 1,
      s"ii3: exactly one exchange — the widened bottom-k partials:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"ii3 must not global-sort:\n$p")
    assert(p.contains("Generate posexplode"),
      s"ii3's pagination must be a map-side generate above the agg:\n$p")
  }
}
