package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus ingestion — the curation pipeline's front door when
  * documents arrive continuously instead of as snapshots (the batch
  * analogue is d9_incremental_dedup).
  */
object DocStream {

  /** Streaming dataset-card: running per-(source, lang) document and
    * token counts over the arriving corpus — rp1's streaming analogue,
    * the live ingest dashboard a crawl pipeline watches. A plain
    * streaming aggregation: state is ONE row per stratum (bounded by
    * strata cardinality, not stream volume), each micro-batch folds in
    * via the same partial-agg merge as batch rp1. No watermark — the
    * card is cumulative over the query's lifetime, and late data must
    * still be counted (same no-watermark stance as the ingest path). */
  def runningCorpusStats(stream: DataFrame): DataFrame =
    stream.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.ext.TextAnalysis.words(col("text")))).as("total_tokens"))

  /** Streaming VOCABULARY card — kmv1/kmv2's live analogue: a running
    * KMV distinct-4-gram sketch per source over the arriving corpus
    * (one ≤k-long array per stratum — bounded by strata cardinality and
    * k, never by stream volume). The sketch aggregate's merge IS the
    * micro-batch fold, so the card is exactly the batch sketch of all
    * rows seen (streaming ≡ batch, suite-pinned) — and two cards (two
    * streams, a stream and a snapshot) merge with [[graft.ext.Kmv.merge]]
    * into the union's sketch, which is how the live card folds into the
    * corpus card without re-reading anything. Distinct-count/overlap
    * estimates are a read-time fold ([[graft.ext.Kmv]]), same stance as
    * [[driftCard]]'s read-time PSI. No watermark — cumulative card, late
    * documents still count (the rp1 stance). */
  def vocabularyCard(stream: DataFrame, k: Int = 4096): DataFrame =
    stream.select(col("source"),
        explode(graft.ext.TextAnalysis.shingles(
          graft.ext.TextAnalysis.words(col("text")), 4)).as("g"))
      .groupBy(col("source"))
      .agg(graft.ext.extfunctions.kmv_sketch(xxhash64(col("g")), k).as("sketch"))

  /** Streaming distribution-drift card — rp3's live analogue: the BASE
    * snapshot's per-language decile cuts are computed batch-side
    * ([[graft.queries.CurationQueries.decileCuts]], exact or DDSketch)
    * and broadcast; each arriving document buckets against them map-side
    * and a running per-(lang, bucket) count accumulates — state is
    * langs×10 rows, bounded by schema, not stream volume. PSI itself is
    * a read-time fold over the card + the base's bucket counts
    * ([[graft.queries.CurationQueries.psiFromBucketCounts]] — the SAME
    * code path as batch rp3, so the monitor can never drift from the
    * report). Late documents still count (no watermark — cumulative
    * card, the rp1 stance). StreamingSpec pins the composed result
    * equal to batch rp3 on the identical split. */
  def driftCard(stream: DataFrame, cuts: DataFrame): DataFrame =
    stream.select(col("lang"),
        size(graft.ext.TextAnalysis.words(col("text"))).as("t"))
      .join(broadcast(cuts), "lang")
      .select(col("lang"), size(filter(col("cs"), c => c <= col("t"))).as("b"))
      .groupBy("lang", "b").agg(count(lit(1)).as("n"))

  /** Streaming EMBEDDING-drift card — rp4's live analogue (the
    * representation axis the token-length PSI of [[driftCard]] can't
    * see): the BASE snapshot's per-label centroids are computed
    * batch-side ([[graft.queries.CurationQueries.labelCentroids]]) and
    * broadcast; each arriving (label, embedding) row joins its base
    * centroid MAP-SIDE and reduces to scalars-plus-dimension-sums, and
    * ONE streaming aggregation per label folds them — state is
    * labels × (dim + 3) numbers, bounded by schema, not stream volume.
    *
    * The shape dodges Spark's no-chained-streaming-aggregations rule:
    * cosine/L2 between the base centroid `cb` and the RUNNING new
    * centroid `Σx/n` decompose over per-row quantities —
    * `cb·(Σx/n) = (Σ cb·x)/n` (a per-row dot product, summed), `|cb|`
    * rides the grouping key, and `|Σx|` needs the per-dimension sums
    * `s_i` — so everything after the single groupBy is a stateless
    * projection: `l2² = |cb|² − 2·dotsum/n + |Σx/n|²`. Complete/update
    * output; the card converges on batch rp4 for the same rows
    * (StreamingSpec parity, FP-reassociation tolerance). */
  def embeddingDriftCard(stream: DataFrame, baseCentroids: DataFrame,
      dim: Int): DataFrame = {
    val dot = aggregate(zip_with(col("x"), col("cb"),
      (a, b) => a * b), lit(0d), (acc, v) => acc + v)
    val nb2 = aggregate(col("cb"), lit(0d), (acc, v) => acc + v * v)
    val perRow = stream
      // LEFT join: a label the base snapshot never saw is the most
      // dramatic drift event possible — it must appear on the card
      // (n_new counted, null cosine/L2 as the novel-slice marker), not
      // silently vanish in an inner join
      .join(broadcast(baseCentroids), Seq("label"), "left") // stream-static, pre-agg
      .select(col("label"), transform(col("embedding"), _.cast("double")).as("x"),
        col("cb"))
      .select(col("label"), dot.as("dot"), nb2.as("nb2"), col("x"))
    val sums = (0 until dim).map(i => sum(col("x")(i)).as(s"s$i"))
    // nb2 in the grouping key: functionally dependent on label, and it
    // keeps the post-agg step a pure projection (no second agg, no join)
    val aggCols = Seq(sum(col("dot")).as("dotsum")) ++ sums
    val g = perRow.groupBy(col("label"), col("nb2"))
      .agg(count(lit(1)).as("n_new"), aggCols: _*)
    val sn2 = (0 until dim).map(i => col(s"s$i") * col(s"s$i")).reduce(_ + _)
    g.select(col("label"), col("n_new"),
      (col("dotsum") / col("n_new") /
        (sqrt(col("nb2")) * (sqrt(sn2) / col("n_new")))).as("centroid_cos"),
      sqrt(greatest(lit(0d),
        col("nb2") - lit(2d) * col("dotsum") / col("n_new") +
          sn2 / (col("n_new") * col("n_new")))).as("centroid_l2"))
  }

  /** Streaming decontamination gate — d7/d8's streaming front: arriving
    * documents probe the benchmark's Bloom filter (built once batch-side
    * with `bloom_agg` over the SAME 4-gram kernel d7/d8 use) map-side via
    * an `exists` over the document's shingles. No false negatives: a
    * document sharing any 4-gram with the benchmark is ALWAYS flagged, so
    * the un-flagged stream is exactly clean and flows on; flagged
    * documents quarantine for the exact batch adjudication (d8's verify
    * join) — the standard stream-bloom + batch-exact split, keeping the
    * streaming side zero-state and zero-join. `fpp` bounds the quarantine
    * overhead, benchmark size bounds the filter (MB-scale for real
    * benchmark suites), corpus size bounds nothing. */
  def decontamGate(stream: DataFrame, bloom: Array[Byte]): DataFrame = {
    import graft.ext.TextAnalysis.{shingles, words}
    import graft.functions.bloom_might_contain
    stream.withColumn("maybe_contaminated",
      exists(shingles(words(col("text")), 4),
        g => bloom_might_contain(lit(bloom), xxhash64(g))))
  }

  /** Exact adjudication of [[decontamGate]]'s quarantined sliver — d7's
    * verify join, batch-side: a flagged document is CONTAMINATED iff it
    * shares a word 4-gram with the exact benchmark n-gram set (the same
    * kernel the Bloom was built over, so Bloom false positives — and only
    * they — come back clean). Returns (released, dropped): released rows
    * re-enter the pipeline, dropped rows are true contamination. The join
    * is unhinted like d8's verify join — AQE broadcasts the bench side
    * while it is small and shuffles only the quarantine sliver once it
    * is not; the sliver is fpp-bounded, never the corpus. */
  def adjudicateQuarantine(quarantined: DataFrame, benchGrams: DataFrame)
      : (DataFrame, DataFrame) = {
    import graft.ext.TextAnalysis.{shingles, words}
    val contaminated = quarantined
      .select(col("doc_id"), explode(shingles(words(col("text")), 4)).as("g"))
      .join(benchGrams, "g")
      .select("doc_id").distinct()
    (quarantined.join(contaminated, Seq("doc_id"), "left_anti"),
      quarantined.join(contaminated, Seq("doc_id"), "left_semi"))
  }

  /** The COMPLETE decontamination pipeline as one streaming sink —
    * closes the loop the gate alone leaves open (a quarantine frame
    * nothing consumes): per micro-batch, unflagged documents flow
    * straight to `cleanPath`, flagged ones go through
    * [[adjudicateQuarantine]]'s exact verify, the released sliver
    * RE-ENTERS the clean output of the same batch, and true
    * contamination lands in `droppedPath` (the audit trail a curation
    * run must keep — silently vanishing documents is how decontam bugs
    * hide). clean ∪ dropped = arriving stream, disjoint, and clean
    * equals what batch d7 would keep — StreamingSpec reconciles all
    * three against d7 on the gate corpus.
    *
    * REPLAY-IDEMPOTENT like [[startLineCountSink]]: each micro-batch
    * OVERWRITES its own `batch_id=<id>` partition directory on both
    * paths, so a replayed batch rewrites identical content instead of
    * appending a duplicate. */
  def startDecontamSink(stream: DataFrame, bloom: Array[Byte], benchGrams: DataFrame,
      cleanPath: String, droppedPath: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    decontamGate(stream, bloom).writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        decontamBatch(batch, id, benchGrams, cleanPath, droppedPath)
      }
      .start()

  private[graft] def decontamBatch(gated: DataFrame, batchId: Long,
      benchGrams: DataFrame, cleanPath: String, droppedPath: String): Unit = {
    // the gate column is computed once per row in the plan; persist the
    // micro-batch so the clean/flagged split does not re-probe the Bloom
    val g = gated.persist()
    try {
      val (released, dropped) =
        adjudicateQuarantine(g.where(col("maybe_contaminated"))
          .drop("maybe_contaminated"), benchGrams)
      g.where(!col("maybe_contaminated")).drop("maybe_contaminated")
        .unionByName(released)
        .write.option("compression", "zstd")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$cleanPath/batch_id=$batchId")
      dropped.write.option("compression", "zstd")
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$droppedPath/batch_id=$batchId")
    } finally g.unpersist(blocking = false)
  }

  /** The streaming curation front door: Gopher quality gate (the same
    * [[graft.ext.TextAnalysis.gopherPasses]] column the batch gate t5
    * runs — one definition, no batch/stream drift) THEN first-seen dedup.
    * Order matters at scale: the gate is a map-side filter ahead of the
    * stateful operator, so rejected documents never shuffle and never
    * enter the state store — state is bounded by distinct PASSING
    * content, corpus reject rates (30–70% on web crawl) cut it
    * proportionally. */
  def curatedDocs(spark: SparkSession, stream: DataFrame): Dataset[(String, Long, String)] =
    firstSeenDocs(spark, stream.where(graft.ext.TextAnalysis.gopherPasses(col("text"))))

  /** Streaming NEAR-dup curation — the streaming form of
    * `minhashPairsIncremental` + keeper election, extending
    * [[firstSeenDocs]] past exact-hash equality. Per micro-batch:
    *
    *   1. MinHash signatures of the batch (the same shingle/signature
    *      kernels as batch d2 — no batch/stream drift);
    *   2. within-batch near-dup components over the batch's LSH pairs
    *      ([[graft.queries.DedupQueries.minhashPairsOfSigs]] + min-label
    *      CC — micro-batch-sized inputs);
    *   3. LSH probe of the batch against the ACCUMULATED base
    *      ([[probeNearDupBase]]): the base is kept BAND-PARTITIONED
    *      (`bands/kb=` hive layout over the band hash, plus a `sigs/db=`
    *      doc-bucketed signature store), so the probe statically prunes
    *      to the buckets the batch actually collides with and fetches
    *      shingle sets candidate-proportionally — per-batch cost tracks
    *      batch size and candidate volume, not accumulated base size (a
    *      backlog-sized replay batch degrades to all buckets, i.e. a
    *      full scan, never worse);
    *   4. acceptance: one keeper (min doc_id) per within-batch component,
    *      and NO member of a component any of whose members verified
    *      against the base (that family is already represented);
    *   5. accepted (doc_id, sh, sig) rows append ONE `delta/batch_id=`
    *      directory (the cheap bounded write path); the band index is
    *      derived from the signatures at compaction
    *      ([[graft.tools.Compact.nearDupBase]] → [[foldCompact]]), never
    *      on the trigger path — the persisted state, exactly d9's base
    *      content-hash index at near-dup granularity.
    *
    * REPLAY-IDEMPOTENT by construction: a replayed accepted document
    * finds itself in the base (Jaccard 1 ≥ threshold), its component is
    * suppressed, and no second row lands — the same checkpoint-wipe
    * upgrade path as the rollup sink, with the self-match playing the
    * anti-join's role. State is signatures only (~0.6 kB/doc), never
    * text: the base table is the dedup index, not a copy of the corpus. */
  def startNearDupSink(stream: DataFrame, basePath: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) => nearDupBatch(batch, basePath, id))
      .start()

  /** The base is a two-tier LSM-style layout:
    *
    *   - `delta/batch_id=<id>/` — one flat (doc_id, sh, sig) directory
    *     per micro-batch (append-mode; replays land nothing because the
    *     probe self-matches): the cheap, bounded-file-count write path;
    *   - `sigs/db=<doc_id bucket>/` + `bands/kb=<band-hash bucket>/` —
    *     the COMPACTED tier, hive-partitioned and sorted, rebuilt by
    *     [[graft.tools.Compact.nearDupBase]] which folds all deltas in
    *     (the band index is DERIVED from sigs at compaction — deltas
    *     never carry band rows).
    *
    * The per-trigger probe runs partition-PRUNED against the compacted
    * tier (band index read only for the batch's `kb` buckets; the heavy
    * shingle column fetched only from the `db` buckets candidates
    * actually hit) and as a plain frame probe against the deltas — whose
    * total size is bounded by docs-since-last-compaction, not by the
    * base. Per-trigger cost therefore tracks batch size + candidate
    * volume + compaction lag, never accumulated base size; write cost
    * stays one small delta directory per trigger. Raising the bucket
    * counts re-shards finer for a bigger base at the next compaction. */
  val BandBuckets = 1024
  val DocBuckets = 1024

  private[graft] def bandsDir(basePath: String) = s"$basePath/bands"
  private[graft] def sigsDir(basePath: String) = s"$basePath/sigs"
  private[graft] def deltaDir(basePath: String) = s"$basePath/delta"

  private def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Per-(session, dir) cache of compacted-tier reads: partition
    * discovery over the BandBuckets/DocBuckets hive dirs costs ~1.4 s
    * per `spark.read.parquet` call (a parallel-listing job), and a
    * streaming sink probes the same tiers every trigger. The compacted
    * tier changes ONLY at compaction (append-path writes go to deltas),
    * so the listing is reusable until [[foldCompact]] — which
    * [[invalidateCompacted]]s. Compaction runs in-process against a
    * stopped (or between-triggers) sink, so same-JVM invalidation is
    * the consistency boundary. */
  private val compactedReads =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private[graft] def cachedCompactedRead(spark: SparkSession, dir: String): DataFrame = {
    // drop entries of stopped sessions so the static map never pins a
    // dead session's plans (tests build many short-lived sessions)
    val it = compactedReads.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    compactedReads.computeIfAbsent((spark, dir), _ => spark.read.parquet(dir))
  }

  private[graft] def invalidateCompacted(basePath: String): Unit = {
    val it = compactedReads.keySet.iterator()
    while (it.hasNext) if (it.next()._2.startsWith(basePath)) it.remove()
  }

  private def nonEmptyDir(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  private[graft] val sigSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("sh",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, false)),
    org.apache.spark.sql.types.StructField("sig",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false))))

  private def emptySigs(spark: SparkSession): DataFrame =
    graft.sources.ShardIO.emptyFrame(spark, sigSchema)

  /** The delta tier as a (doc_id, sh, sig) frame. */
  private[graft] def deltaSigs(spark: SparkSession, basePath: String): DataFrame =
    if (!nonEmptyDir(spark, deltaDir(basePath))) emptySigs(spark)
    else spark.read.parquet(deltaDir(basePath))
      .select("doc_id", "sh", "sig")

  /** The compacted tier as a (doc_id, sh, sig) frame. */
  private[graft] def compactedSigs(spark: SparkSession, basePath: String): DataFrame =
    if (!dirExists(spark, sigsDir(basePath))) emptySigs(spark)
    else cachedCompactedRead(spark, sigsDir(basePath)).select("doc_id", "sh", "sig")

  /** The accumulated base as a logical (doc_id, sh, sig) frame — the ONE
    * read surface over the layout (consumers must not assume file
    * structure under `basePath`): compacted tier ∪ deltas. */
  def nearDupBaseSigs(spark: SparkSession, basePath: String): DataFrame =
    compactedSigs(spark, basePath).unionByName(deltaSigs(spark, basePath))

  /** Batch doc_ids verified near-dup of ANY base doc. Against the
    * COMPACTED tier the probe is partition-pruned:
    *
    *   1. the batch's band keys name their `kb` buckets; the band index
    *      is read WITH a partition `isin` on exactly those buckets
    *      (bounded by [[BandBuckets]]; a backlog-sized replay degrades
    *      to all buckets — a full index scan of narrow rows, never
    *      worse than the unpartitioned layout);
    *   2. candidates = (band, band_hash) equi-join, batch side broadcast
    *      by AQE at micro-batch size;
    *   3. exact-Jaccard verify fetches `sh` ONLY from the `db` buckets
    *      candidates actually hit — the heavy column (KB-scale shingle
    *      arrays) is read candidate-proportionally, never base-wide.
    *
    * Both `isin` lists are collected driver-side but bounded by the
    * bucket constants, never by data volume. The delta tier (bounded by
    * compaction lag) is probed as a plain frame. */
  private[graft] def probeNearDupBase(spark: SparkSession, batchSigs: DataFrame,
      basePath: String): DataFrame = {
    import graft.queries.DedupQueries
    val deltaMatched = DedupQueries
      .probePairsAgainst(batchSigs, deltaSigs(spark, basePath))
      .select(col("new_id").as("doc_id"))
    compactedMatched(spark, batchSigs, basePath)
      .unionByName(deltaMatched).distinct()
  }

  /** The pruned candidate join against the compacted band index, as an
    * un-materialized frame — split out so PlanSpec-style contracts can
    * assert the `kb` partition filter on its scan (the probe itself
    * localCheckpoints it, which hides the scan from the final plan). */
  /** Past this many probe keys the per-key parquet pushdown is skipped
    * (a replay-sized batch degrades to the bucket-pruned narrow-index
    * scan) — each [[KeyPushChunk]] leg costs a near-constant ~0.2 s
    * (driver planning + footer/column-index reads, measured linear from
    * 7 to 625 legs at a 10 M-doc base), so past ~32 legs the chunked
    * point path stops beating the one-scan fallback. */
  private[graft] val MaxKeyPushdown = 16384

  /** Per-chunk key budget for [[keyPrunedScan]]: small enough that the
    * left-deep OR tree parquet builds from one chunk's IN evaluates in
    * bounded stack depth (it overflows past ~1k terms), large enough
    * that normal micro-batches need a handful of chunks. */
  private[graft] val KeyPushChunk = 512

  /** Read `scan` restricted to rows whose `keyCol` ∈ the keys of
    * `dirKeys` (= (partition-dir, key) pairs), with the key list
    * REACHING PARQUET as point predicates: the compacted tier is sorted
    * on the probed column per partition dir and written with small
    * pages, so page column indexes prune to ~the pages the keys
    * actually land in — scan cost O(probe keys × page rows), not
    * O(base). Keys are pushed in [[KeyPushChunk]]-sized `isin`
    * sub-scans unioned together: one InSet node per chunk keeps
    * Catalyst planning cheap (a single thousands-term OR tree costs
    * seconds per trigger to plan), and parquet's per-chunk OR chain
    * stays stack-safe. Crucially the pairs are sorted by DIR before
    * chunking and every chunk's sub-scan partition-prunes to ITS OWN
    * dir set — without that, each of C chunks re-opens every hit dir
    * and the probe degrades C-fold with batch size (measured 72 s for
    * 63 chunks × 1024 dirs at a 10 M-doc base, vs one open per dir
    * here). Spark's In-pushdown threshold is raised (never lowered)
    * past the chunk size on the session — above it, Spark pushes only
    * a useless [min, max] range over uniform hashes.
    *
    * The union is EXACT (no duplicate rows across chunks): a chunk's
    * dirs×keys `isin` pair is a cross-product that can re-match a
    * (dir, key) row another chunk owns whenever dir is NOT a function
    * of key (MediaStream's band index: dir = pmod(xxhash64(band, key)),
    * so one key lives in several dirs), so each chunk adds a map-side
    * In-set post-filter on the packed (dir, key) pair — evaluated after
    * the pushed predicates prune pages, one hash-set lookup per
    * surviving row, no shuffle. Chunks partition the pair set, so each
    * row is kept by at most one chunk. */
  private[graft] def keyPrunedScan(spark: SparkSession, scan: DataFrame,
      keyCol: String, dirCol: String, dirKeys: Array[(Long, Long)]): DataFrame = {
    val k = "spark.sql.parquet.pushdown.inFilterThreshold"
    if (spark.conf.get(k, "10").toInt < KeyPushChunk + 1)
      spark.conf.set(k, KeyPushChunk + 1)
    val pairCol = concat_ws("|", col(dirCol).cast("string"), col(keyCol).cast("string"))
    dirKeys.sorted.grouped(KeyPushChunk)
      .map { g =>
        val dirs = g.map(_._1).distinct.toIndexedSeq
        val ks = g.map(_._2).distinct.toIndexedSeq
        val pairs = g.map { case (d, kk) => s"$d|$kk" }.toIndexedSeq
        scan.where(col(dirCol).isin(dirs: _*) && col(keyCol).isin(ks: _*) &&
          pairCol.isin(pairs: _*))
      }
      .reduce(_ unionByName _)
  }

  private[graft] def compactedCandidates(spark: SparkSession, batchSigs: DataFrame,
      basePath: String): DataFrame = {
    import graft.queries.DedupQueries
    val pBand = DedupQueries.bandedKeys(batchSigs)
      .withColumn("kb", pmod(col("band_hash"), lit(BandBuckets.toLong)))
    // ONE bounded collect serves both prune levels: (kb, band_hash)
    // pairs give the partition-dir list AND the dir-grouped point keys
    val dirKeys = pBand.select("kb", "band_hash").distinct()
      .limit(MaxKeyPushdown + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val scan = cachedCompactedRead(spark, bandsDir(basePath))
    val keyed = // point-predicate pushdown for normal micro-batches
      if (dirKeys.nonEmpty && dirKeys.length <= MaxKeyPushdown)
        keyPrunedScan(spark, scan, "band_hash", "kb", dirKeys)
      else {
        // over-limit (replay-sized) batches fall back to dir-level
        // pruning; the dir list must cover ALL the batch's band keys
        // (bounded by BandBuckets), not the limited sample above
        val hitKb = pBand.select("kb").distinct()
          .collect().map(_.getLong(0)).toIndexedSeq
        scan.where(col("kb").isin(hitKb: _*))
      }
    keyed
      .select(col("doc_id").as("base_id"), col("band"), col("band_hash"))
      .join(pBand.select(col("doc_id").as("new_id"), col("band"), col("band_hash")),
        Seq("band", "band_hash"))
      .select("new_id", "base_id").distinct()
  }

  private def compactedMatched(spark: SparkSession, batchSigs: DataFrame,
      basePath: String): DataFrame = {
    import graft.queries.DedupQueries
    import spark.implicits._
    if (!dirExists(spark, bandsDir(basePath)))
      return Seq.empty[Long].toDF("doc_id")
    // localCheckpoint: candidates feed the db-bucket collect AND the
    // verify — materialize the (small, candidate-bounded) frame once
    // instead of re-running the band join per consumer
    val cand = compactedCandidates(spark, batchSigs, basePath).localCheckpoint()
    // candidate ids as point predicates too: the sig store is sorted by
    // doc_id per db dir, so the heavy sh fetch page-prunes to candidates
    val candDirIds = cand
      .select(pmod(col("base_id"), lit(DocBuckets.toLong)).as("db"), col("base_id"))
      .distinct().limit(MaxKeyPushdown + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    if (candDirIds.isEmpty) return Seq.empty[Long].toDF("doc_id")
    val sigScan = cachedCompactedRead(spark, sigsDir(basePath))
    val shScan =
      if (candDirIds.length <= MaxKeyPushdown)
        keyPrunedScan(spark, sigScan, "doc_id", "db", candDirIds)
      else {
        // over-limit candidate sets fall back to dir-level pruning; the
        // dir list must come from ALL candidates (bounded by DocBuckets),
        // not the limited id sample above
        val hitDb = cand
          .select(pmod(col("base_id"), lit(DocBuckets.toLong)).as("db"))
          .distinct().collect().map(_.getLong(0)).toIndexedSeq
        sigScan.where(col("db").isin(hitDb: _*))
      }
    val baseSh = shScan.select(col("doc_id").as("base_id"), col("sh").as("sh_b"))
    cand
      .join(batchSigs.select(col("doc_id").as("new_id"), col("sh").as("sh_n")), "new_id")
      .join(baseSh, "base_id")
      .where(graft.ext.extfunctions.jaccard_sim(col("sh_n"), col("sh_b"))
        >= DedupQueries.JaccardThreshold)
      .select(col("new_id").as("doc_id")).distinct()
  }

  /** Fold every delta into the compacted tier — the band index is
    * derived from the folded signature set here (deltas never carry band
    * rows), each half landing sorted with one file per partition dir via
    * a staged swap, then the deltas are deleted. Swap order is sigs →
    * bands → delete-deltas: a crash after the sigs swap leaves new rows
    * both in sigs and in a not-yet-deleted delta (the union reader
    * double-counts until Compact is RE-RUN — re-running is the recovery
    * protocol), while the band index is never ahead of the sig store it
    * points into. Run against a stopped (or between-triggers) sink. */
  private[graft] def foldCompact(spark: SparkSession, basePath: String): Unit = {
    val all = nearDupBaseSigs(spark, basePath)
    val root = new org.apache.hadoop.fs.Path(basePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // both stages fully written BEFORE any swap: the folded input reads
    // the live dirs, so writing stage N must not see a half-swapped tier
    val sigStage = stageWrite(fs,
      all.withColumn("db", pmod(col("doc_id"), lit(DocBuckets.toLong))),
      "db", Seq("doc_id"), sigsDir(basePath), heavyTier = true)
    val bandStage = stageWrite(fs,
      graft.queries.DedupQueries.bandedKeys(all)
        .withColumn("kb", pmod(col("band_hash"), lit(BandBuckets.toLong))),
      "kb", Seq("band", "band_hash"), bandsDir(basePath), heavyTier = false)
    swap(fs, sigStage, sigsDir(basePath))
    swap(fs, bandStage, bandsDir(basePath))
    fs.delete(new org.apache.hadoop.fs.Path(deltaDir(basePath)), true)
    invalidateCompacted(basePath)
  }

  /** Stage-write one compacted-tier half: hive-partitioned on `part`,
    * sorted within dirs, one file per dir. The index tier (`heavyTier =
    * false`) is written snappy with 4096-row pages: it is re-scanned or
    * point-probed every trigger, so decode speed and page granularity
    * dominate — with the default ~1 MB pages a point lookup decodes
    * ~40k narrow rows per key, with 4096-row pages ~10× less. The
    * content tier (`heavyTier = true`) keeps zstd + default pages: it
    * is fetched candidate-only and its KB-scale rows make default pages
    * row-sparse already. */
  private[graft] def stageWrite(fs: org.apache.hadoop.fs.FileSystem,
      df: DataFrame, part: String, sortCols: Seq[String], dir: String,
      heavyTier: Boolean): org.apache.hadoop.fs.Path = {
    val stage = new org.apache.hadoop.fs.Path(dir + ".compact_stage")
    val w = df.repartition(col(part))
      .sortWithinPartitions(part, sortCols: _*)
      .write.partitionBy(part).mode(org.apache.spark.sql.SaveMode.Overwrite)
    (if (heavyTier) w.option("compression", "zstd")
     else w.option("compression", "snappy")
       .option("parquet.page.row.count.limit", 4096))
      .parquet(stage.toString)
    stage
  }

  private[graft] def swap(fs: org.apache.hadoop.fs.FileSystem,
      stage: org.apache.hadoop.fs.Path, dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val old = new org.apache.hadoop.fs.Path(dir + ".old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(p)) fs.rename(p, old)
    fs.rename(stage, p)
    fs.delete(old, true)
  }

  private[graft] def nearDupBatch(batch: DataFrame, basePath: String,
      batchId: Long): Unit = {
    import graft.queries.DedupQueries
    val spark = batch.sparkSession
    // signatures feed three jobs (banding, within-batch pairs, verify) —
    // persist the micro-batch's frame rather than re-shingling per job
    val sigs = DedupQueries.signaturesOf(
      batch.select(col("doc_id").cast("long").as("doc_id"), col("text"))).persist()
    try {
      // REPLAY-IDEMPOTENT via self-match: the probe sees the batch's own
      // previously-landed rows (delta or already-compacted), every
      // replayed component is base-matched and suppressed, and the
      // append below lands nothing — checkpoint wipes (which renumber
      // batches from 0 and re-deliver history as one giant batch)
      // converge the same way, which a delta-overwrite scheme would not
      // (it would cross-wire generations sharing a batch_id). The
      // batch_id dir is an audit label, not a replay key.
      val baseMatched = probeNearDupBase(spark, sigs, basePath)
      acceptGivenMatched(sigs, baseMatched)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .option("compression", "zstd")
        .parquet(s"${deltaDir(basePath)}/batch_id=$batchId")
    } finally sigs.unpersist(blocking = false)
  }

  /** The acceptance decision of [[startNearDupSink]] step 4, as a frame:
    * accepted (doc_id, sh, sig) rows of `batchSigs` given `baseSigs`.
    * Frame-form (used by tests and ad-hoc batch callers); the sink itself
    * probes the two-tier base via [[probeNearDupBase]]. */
  private[graft] def acceptNearDup(batchSigs: DataFrame, baseSigs: DataFrame): DataFrame =
    acceptGivenMatched(batchSigs,
      graft.queries.DedupQueries.probePairsAgainst(batchSigs, baseSigs)
        .select(col("new_id").as("doc_id")).distinct())

  /** Keeper election given the already-computed set of batch doc_ids that
    * matched the base: one keeper (min doc_id) per within-batch
    * component, minus components any of whose members matched. */
  private[graft] def acceptGivenMatched(batchSigs: DataFrame,
      baseMatched: DataFrame): DataFrame = {
    import graft.queries.DedupQueries
    val batchPairs = DedupQueries
      .minhashPairsOfSigs(batchSigs, DedupQueries.MaxLshBucket)
      .select("doc_a", "doc_b")
    val comp = DedupQueries.keepList(batchPairs, batchSigs.select("doc_id"))
    val killedComps = comp.join(baseMatched, "doc_id")
      .select("keep_id").distinct()
    comp.where(col("doc_id") === col("keep_id"))
      .join(killedComps, Seq("keep_id"), "left_anti")
      .select("doc_id")
      .join(batchSigs, "doc_id")
  }

  /** Streaming LINE-frequency index maintenance — the streaming state
    * behind d13's duplicated-line removal, completing the granularity
    * ladder of streaming fronts (exact hash [[firstSeenDocs]] → near-dup
    * [[startNearDupSink]] → line level). Per micro-batch the arriving
    * docs' (line, cnt) partial counts append as a DELTA partition keyed
    * by the micro-batch id; the queryable index is the delta sum
    * ([[lineIndex]]) and arriving batches clean against it with
    * [[graft.queries.DedupQueries.lineDedupIncremental]].
    *
    * REPLAY-IDEMPOTENT by construction, differently from the other two
    * sinks: a replayed batch OVERWRITES its own `batch_id` partition
    * directory instead of appending — the index never double-counts,
    * with no read-side anti-join at all. State is
    * (line, cnt) rows only, never documents; the delta layout compacts
    * like the near-dup base (one `Compact`-style rewrite folds old
    * partitions into one). */
  def startLineCountSink(stream: DataFrame, basePath: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) => lineCountBatch(batch, id, basePath))
      .start()

  private[graft] def lineCountBatch(batch: DataFrame, batchId: Long,
      basePath: String): Unit = {
    // each delta lands in its own batch_id=<id> partition DIRECTORY,
    // written with a plain overwrite of that directory alone — replay
    // idempotence is structural (no dynamic-overwrite session conf to
    // propagate into foreachBatch's cloned session), and partition
    // discovery on basePath still reads batch_id as a column
    graft.queries.DedupQueries.lineCountsOf(
        batch.select(col("doc_id"), split(col("text"), "\n").as("lines")))
      .write.option("compression", "zstd")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$basePath/batch_id=$batchId")
  }

  /** The §8.5 rung PAST the two-tier parquet base: the band index as
    * KEYED STATE — `flatMapGroupsWithState` keyed by (band, band_hash)
    * on the RocksDB provider, so probing a micro-batch costs O(1) point
    * lookups per batch band key with NO base scan at all (the parquet
    * tiers' floor at a multi-billion-doc base is the narrow index scan;
    * here the store IS the index). The declared trade, exactly as
    * SCALE.md names it:
    *  - verification is SIGNATURE-ESTIMATED Jaccard (matching minhash
    *    component fraction — E[est] = J, 64 components) instead of the
    *    parquet path's exact shingle Jaccard: estimator-grade
    *    precision/recall at the threshold boundary;
    *  - per-bucket membership is CAPPED (`maxPerBucket`, the
    *    MaxLshBucket rationale: a bucket past the cap is an
    *    exact/near-dup family the d1 exact pass already collapses);
    *    an uncached member cannot match later dups — miss-direction
    *    drift, bounded by the cap;
    *  - state duplicates each signature ×Bands (the classic LSH index
    *    cost) — RocksDB spills it off-heap.
    * Emissions are (new_id, base_id, est) candidate verdicts, possibly
    * repeated across bands — consumers dedup per micro-batch
    * (`.dropDuplicates("new_id","base_id")` in their foreachBatch).
    * Within a batch, docs probe in doc_id order against state ∪
    * earlier-in-batch members, so pairs are deterministic; replays
    * re-emit (at-least-once, the store's idempotent-sink contract
    * absorbs it). */
  def nearDupMatchesStateful(spark: SparkSession, docs: DataFrame,
      estThreshold: Double = graft.queries.DedupQueries.JaccardThreshold,
      maxPerBucket: Int = 64): DataFrame = {
    import spark.implicits._
    import graft.queries.DedupQueries.{Bands, MinhashK}
    val rowsPerBand = MinhashK / Bands
    val sigs = graft.queries.DedupQueries.signaturesOf(docs)
      .select(col("doc_id"), col("sig"))
    sigs
      .select(col("doc_id"), col("sig"), posexplode(
        array((0 until Bands).map(b =>
          xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*))
        .as(Seq("band", "band_hash")))
      .select(col("band"), col("band_hash"), col("doc_id"), col("sig"))
      .as[(Int, Long, Long, Seq[Long])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[Seq[(Long, Seq[Long])], (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Long), rows: Iterator[(Int, Long, Long, Seq[Long])],
            state: GroupState[Seq[(Long, Seq[Long])]]) =>
          val members = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long])]
          members ++= state.getOption.getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          rows.toSeq.sortBy(_._3).foreach { case (_, _, id, sig) =>
            var i = 0
            while (i < members.length) {
              val (bid, bsig) = members(i)
              if (bid != id) {
                var m = 0; var j = 0
                while (j < MinhashK) { if (sig(j) == bsig(j)) m += 1; j += 1 }
                val est = m.toDouble / MinhashK
                if (est >= estThreshold) out += ((id, bid, est))
              }
              i += 1
            }
            // idempotent add: a replayed batch's docs are already members
            if (members.length < maxPerBucket && !members.exists(_._1 == id))
              members += ((id, sig))
          }
          state.update(members.toSeq)
          out.iterator
      }
      .toDF("new_id", "base_id", "est")
  }

  final case class FrontierRow(url: String, first_doc: Long)

  /** Streaming crawl frontier: (doc_id, url, html) pages in → first-seen
    * absolute outlink URLs out — the discovery loop of a crawler, closed
    * over the same scanner the text path runs. Per page, anchors extract
    * map-side ([[graft.ext.HtmlText.anchors]]); hrefs resolve+normalize
    * through [[graft.ext.Urls.frontierUrl]] (url1's rule set); then
    * first-seen election keys state by the normalized URL. A page's OWN
    * url marks its key as crawled WITHOUT emitting, so re-discovered
    * already-crawled pages never re-enter the frontier; a link discovered
    * before its page is crawled emits once (it WAS frontier then). State
    * is one boolean per distinct URL — ttlMs bounds it for unbounded
    * crawls (an evicted URL may re-emit: a frontier dup, never a drop,
    * and the fetcher's own seen-set is the backstop — the firstSeenDocs
    * drift contract). */
  def frontier(spark: SparkSession, pages: DataFrame,
      ttlMs: Long = 0L): Dataset[FrontierRow] = {
    import spark.implicits._
    val timeout =
      if (ttlMs <= 0) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.ProcessingTimeTimeout()
    pages.select(col("doc_id").cast("long").as("doc_id"), col("url"), col("html"))
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, pageUrl, html) =>
        // the page's own (normalized) url rides along as a self-marker
        Iterator.single((graft.ext.Urls.normalize(pageUrl), id, true)) ++
          graft.ext.HtmlText.anchors(html).iterator
            .flatMap(a => graft.ext.Urls.frontierUrl(pageUrl, a.href))
            .map(u => (u, id, false))
      })
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, FrontierRow](
        OutputMode.Append(), timeout) {
        (url: String, rows: Iterator[(String, Long, Boolean)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rs = rows.toSeq
            val out =
              if (state.exists || rs.exists(_._3)) Iterator.empty[FrontierRow]
              // min doc_id: batch shuffle order is not deterministic,
              // discovery attribution must be
              else Iterator.single(FrontierRow(url, rs.map(_._2).min))
            state.update(true)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            out
          }
      }
  }

  /** robots.txt gate over the frontier (RFC 9309 — the access-control
    * half of politeness; [[politeFrontier]] is the rate half): drop URLs
    * the host's robots rules disallow for `agent`. `robotsTxt` is a
    * static (host, robots_txt) frame — the fetched robots corpus,
    * hosts-sized, so this is a stream-static equi-join (broadcast when
    * small, host-keyed shuffle at web scale — which also CLUSTERS each
    * host's rows per task). Rules parse ONCE per (partition, host)
    * through a per-partition memo ([[graft.ext.Robots]]; the
    * expensive-init discipline) and evaluation is a map-side
    * regex-prefix walk. Hosts absent from the corpus allow everything —
    * fetch robots.txt when a host first appears, then gate. */
  def robotsGate(spark: SparkSession, rows: Dataset[FrontierRow],
      robotsTxt: DataFrame, agent: String = "*"): Dataset[FrontierRow] = {
    import spark.implicits._
    rows
      .map(r => (graft.ext.Urls.host(r.url), r.url, r.first_doc))
      .toDF("host", "url", "first_doc")
      .join(robotsTxt.select(col("host"), col("robots_txt")), Seq("host"), "left")
      .select(col("host"), col("url"), col("first_doc"), col("robots_txt"))
      .as[(String, String, Long, String)]
      .mapPartitions { it =>
        val memo = scala.collection.mutable.HashMap.empty[String, graft.ext.Robots.Rules]
        it.filter { case (host, url, _, txt) =>
          memo.getOrElseUpdate(host, graft.ext.Robots.parse(txt, agent))
            .permits(graft.ext.Robots.pathOf(url))
        }.map { case (_, url, doc, _) => FrontierRow(url, doc) }
      }
  }

  final case class PoliteRow(host: String, url: String, first_doc: Long)

  /** Per-host politeness gate over the frontier — the rate budget a real
    * fetch loop needs so one giant host can't monopolize a trigger's
    * fetch slots (and so the crawler honors per-host courtesy limits):
    * at most `perTrigger` URLs per host emit per micro-batch; the excess
    * queues in BOUNDED per-host state (`maxPending` newest-dropped cap —
    * a drop is a frontier miss the recrawl TTL repairs, never a
    * correctness break) and drips out on subsequent triggers through
    * processing-time timeouts, `drainMs` apart, even when no new input
    * arrives for that host. Emission order inside a host is
    * deterministic — (first_doc, url) ascending — so replays drip the
    * same prefix. State per host = ≤maxPending (url, doc) pairs + one
    * timestamp: bounded by hosts × maxPending, never by crawl volume.
    * Compose after [[frontier]]; its ttlMs is the recrawl clock (an
    * evicted URL re-enters here on rediscovery). */
  def politeFrontier(spark: SparkSession, frontierRows: Dataset[FrontierRow],
      perTrigger: Int, maxPending: Int = 10000,
      drainMs: Long = 1000L): Dataset[PoliteRow] = {
    import spark.implicits._
    frontierRows
      .map(r => (graft.ext.Urls.host(r.url), r.url, r.first_doc))
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[(String, Long)], PoliteRow](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (host: String, rows: Iterator[(String, String, Long)],
            state: GroupState[Seq[(String, Long)]]) =>
          val pending = state.getOption.getOrElse(Seq.empty)
          val incoming = rows.map(r => (r._2, r._3)).toSeq
            .sortBy { case (url, doc) => (doc, url) }
          val queue = pending ++ incoming
          val (emit, rest) = queue.splitAt(perTrigger)
          if (rest.nonEmpty) {
            state.update(rest.take(maxPending))
            state.setTimeoutDuration(drainMs)
          } else state.remove()
          emit.iterator.map { case (url, doc) => PoliteRow(host, url, doc) }
      }
  }

  /** Recrawl-after-TTL as an intentional POLICY — the rung past the
    * frontier's TTL, where re-crawling was an eviction SIDE-EFFECT (an
    * evicted URL re-emits only if some page happens to link to it again).
    * Here the schedule is explicit: crawled pages in → recrawl-due
    * [[FrontierRow]]s out, one per URL per elapsed `intervalMs` since its
    * LATEST crawl. Per-URL state is (last_crawl_doc) plus a processing-
    * time deadline `intervalMs` after the latest sighting; a re-crawl
    * inside the interval re-arms the deadline and emits nothing (not-due
    * suppression), and a fired deadline emits the URL as due and clears
    * its state — the refetch's own crawl re-arms the clock, so a URL
    * emits at most once per interval regardless of replay count. Compose
    * the output ahead of [[politeFrontier]] so recrawls pay the same
    * per-host budget as fresh discoveries. State: one (doc, deadline)
    * per tracked URL — crawled-set sized, the same bound the frontier's
    * seen-set carries, on the same RocksDB provider at scale. */
  def recrawlDue(spark: SparkSession, crawled: DataFrame,
      intervalMs: Long): Dataset[FrontierRow] = {
    import spark.implicits._
    crawled.select(col("url"), col("doc_id").cast("long").as("doc_id"))
      .as[(String, Long)]
      .groupByKey(r => graft.ext.Urls.normalize(r._1))
      .flatMapGroupsWithState[Long, FrontierRow](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (url: String, rows: Iterator[(String, Long)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val doc = state.get
            state.remove()
            Iterator.single(FrontierRow(url, doc))
          } else {
            // newest crawl wins attribution; the deadline re-arms from the
            // latest sighting — a within-interval recrawl is NOT due
            val doc = rows.map(_._2).max
            state.update(math.max(doc, state.getOption.getOrElse(Long.MinValue)))
            state.setTimeoutDuration(intervalMs)
            Iterator.empty
          }
      }
  }

  /** [[recrawlDue]] in EVENT time — the replay-correct form: the
    * processing-time variant schedules off the wall clock, so a backfill
    * replay or an AvailableNow drain of historical crawls distorts every
    * deadline (a crawl from last week and one from a minute ago both
    * come due `intervalMs` of WALL time after the drain). Here the
    * schedule keys off the data's own `crawl_ts`: per-URL state is
    * (latest_doc, latest_crawl_ts) and the deadline is an
    * EventTimeTimeout at `latest_crawl_ts + intervalMs` — it fires when
    * the WATERMARK passes it, so draining a month of history emits each
    * URL as due exactly when the month's event time says it was,
    * identically on every replay. A re-crawl inside the interval re-arms
    * the deadline from the LATEST sighting (event-time max — late
    * out-of-order rows never rewind it) and emits nothing; a fired URL
    * clears its state, so it emits at most once per interval regardless
    * of replay count. A deadline already behind the watermark (deep
    * backfill) is clamped to watermark+1 and fires on the next trigger.
    * Keep [[recrawlDue]] for live drips where arrival time IS the
    * schedule; compose either ahead of [[politeFrontier]]. State: one
    * (doc, ts) pair per tracked URL — crawled-set sized, same RocksDB
    * provider bound as the frontier's seen-set. */
  def recrawlDueEventTime(spark: SparkSession, crawled: DataFrame,
      intervalMs: Long, watermarkDelay: String = "0 seconds"): Dataset[FrontierRow] = {
    import spark.implicits._
    crawled
      .select(col("url"), col("doc_id").cast("long").as("doc_id"),
        col("crawl_ts").cast("timestamp").as("crawl_ts"))
      .withWatermark("crawl_ts", watermarkDelay)
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(r => graft.ext.Urls.normalize(r._1))
      .flatMapGroupsWithState[(Long, Long), FrontierRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (url: String, rows: Iterator[(String, Long, java.sql.Timestamp)],
            state: GroupState[(Long, Long)]) =>
          if (state.hasTimedOut) {
            val (doc, _) = state.get
            state.remove()
            Iterator.single(FrontierRow(url, doc))
          } else {
            val batch = rows.map(r => (r._2, r._3.getTime)).toSeq
            val (doc0, arm0) = state.getOption.getOrElse((Long.MinValue, Long.MinValue))
            val doc = math.max(batch.map(_._1).max, doc0)
            val arm = math.max(batch.map(_._2).max, arm0)
            state.update((doc, arm))
            // Spark rejects a timeout at or behind the current watermark:
            // clamp a deep-backfill deadline to wm+1 (fires next trigger)
            state.setTimeoutTimestamp(
              math.max(arm + intervalMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Incremental inverted-index maintenance: each micro-batch's docs
    * aggregate to their own postings delta — (term, df, first-page doc
    * ids) via [[graft.queries.RetrievalQueries.postingsIndexOf]] — landing
    * in a `batch_id=<id>` partition (structural replay idempotence, the
    * line-count sink's layout). The merged index (read-side or after
    * [[graft.tools.Compact.postingsBase]]) equals the batch build over
    * all docs so far: per-batch pages keep each batch's smallest ids, so
    * the bottom-k of their union IS the global first page, and df sums
    * exactly (a doc arrives in one batch). At crawl scale the per-trigger
    * work is one vocabulary-keyed exchange of bounded partials — never
    * proportional to the accumulated index. */
  def startPostingsSink(stream: DataFrame, basePath: String, checkpoint: String,
      page: Int = 100,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) => postingsBatch(batch, id, basePath, page))
      .start()

  private[graft] def postingsBatch(batch: DataFrame, batchId: Long,
      basePath: String, page: Int = 100): Unit =
    graft.queries.RetrievalQueries.postingsIndexOf(batch, page)
      .write.option("compression", "zstd")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$basePath/batch_id=$batchId")

  /** The merged postings index over every delta partition: df sums;
    * pages merge as `slice(sort(flatten(…)))` — each input page is ≤
    * `page` ids, so partials stay bounded by page × deltas-per-task, and
    * compaction collapses them back to one. */
  def postingsIndex(spark: SparkSession, basePath: String,
      page: Int = 100): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(basePath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) {
      import spark.implicits._
      Seq.empty[(String, Long, Seq[Long])].toDF("term", "df", "postings")
    } else spark.read.parquet(basePath)
      .groupBy("term")
      .agg(sum(col("df")).as("df"),
        slice(array_sort(flatten(collect_list(col("postings")))), 1, page)
          .as("postings"))
  }

  /** Multi-page serve of the streamed index — the (term, page_no)
    * sharding over the SAME delta layout: merge at page·maxPages
    * capacity (each per-batch delta written with that capacity keeps its
    * batch's smallest ids, so the bottom of their union is the exact
    * global bottom — run the sink with `page = page·maxPages`), then
    * paginate map-side ([[graft.queries.RetrievalQueries.paginatePostings]]).
    * Per-trigger write cost is unchanged; read amplification is the
    * maxPages factor on the bounded partials only. */
  def postingsIndexPages(spark: SparkSession, basePath: String,
      page: Int, maxPages: Int): DataFrame =
    graft.queries.RetrievalQueries.paginatePostings(
      postingsIndex(spark, basePath, page * maxPages), page)

  /** The accumulated (line, cnt) index over every delta partition —
    * [[graft.queries.DedupQueries.lineDedupIncremental]]'s base side. */
  def lineIndex(spark: SparkSession, basePath: String): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(basePath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("line", "cnt")
    } else spark.read.parquet(basePath)
      .groupBy("line").agg(sum(col("cnt")).as("cnt"))
  }

  /** Exact streaming dedup: emits each distinct document content exactly
    * once for the lifetime of the query, keyed by content hash via
    * `flatMapGroupsWithState`. Within a batch the min doc_id of a
    * duplicate family is the deterministic keeper (same election rule as
    * d1/d9); across batches the keyed state suppresses re-emission.
    *
    * State is ONE BOOLEAN per distinct content — bounded by corpus
    * distinct-content cardinality, not stream volume, and keyed by a
    * uniform 128-bit hash so the state store shards evenly. At 100 TB
    * scale this runs on the RocksDB state store (spills past memory), and
    * the checkpoint makes the seen-set survive restarts — the streaming
    * equivalent of d9's persisted base content-hash index.
    *
    * STATE SIZING CONTRACT: ~50 B/distinct content in RocksDB — a
    * `ttlMs = 0` (never evict) query is bounded by corpus
    * distinct-content cardinality, which for a crawl front grows
    * without bound over years. `ttlMs > 0` evicts contents not RE-SEEN
    * for that long of PROCESSING time (documents carry no event-time
    * column, so the idle clock is wall time; each re-arrival of a dup
    * re-arms it). Eviction drift (pinned in StreamingSpec): a dup of an
    * evicted content is re-emitted — a dedup MISS, never a false drop —
    * and the downstream batch index (d9's content-hash anti-join) is
    * the exact backstop that catches the leaked sliver, the same
    * stream-approximate + batch-exact split as the decontam gate. */
  def firstSeenDocs(spark: SparkSession, stream: DataFrame,
      ttlMs: Long = 0L): Dataset[(String, Long, String)] = {
    import spark.implicits._
    val timeout =
      if (ttlMs <= 0) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.ProcessingTimeTimeout()
    stream
      .select(md5(col("text").cast("binary")).as("ch"),
        col("doc_id").cast("long").as("doc_id"), col("text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long, String)](
        OutputMode.Append(), timeout) {
        (_: String, rows: Iterator[(String, Long, String)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs) // dup re-seen: re-arm
            Iterator.empty
          } else {
            state.update(true)
            if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
            // min doc_id, not iterator head: batch shuffle order is not
            // deterministic, keeper election must be
            Iterator.single(rows.minBy(_._2))
          }
      }
  }
}
