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
    *   3. LSH probe of the batch against the ACCUMULATED base signature
    *      table ([[graft.queries.DedupQueries.probePairsAgainst]]): for
    *      a normal micro-batch AQE broadcasts the batch's band keys and
    *      the base scans once map-side without shuffling, so per-batch
    *      cost tracks batch size, not corpus size (a backlog-sized
    *      replay batch instead shuffle-joins on the uniform band key —
    *      no forced broadcast to blow up on);
    *   4. acceptance: one keeper (min doc_id) per within-batch component,
    *      and NO member of a component any of whose members verified
    *      against the base (that family is already represented);
    *   5. accepted (doc_id, sh, sig) rows append to the base table —
    *      the persisted state, exactly d9's base content-hash index at
    *      near-dup granularity.
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
      .foreachBatch((batch: DataFrame, _: Long) => nearDupBatch(batch, basePath))
      .start()

  private[graft] def nearDupBatch(batch: DataFrame, basePath: String): Unit = {
    import graft.queries.DedupQueries
    val spark = batch.sparkSession
    // signatures feed three jobs (banding, within-batch pairs, verify) —
    // persist the micro-batch's frame rather than re-shingling per job
    val sigs = DedupQueries.signaturesOf(
      batch.select(col("doc_id").cast("long").as("doc_id"), col("text"))).persist()
    try {
      val hPath = new org.apache.hadoop.fs.Path(basePath)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val base =
        if (fs.exists(hPath)) spark.read.schema(sigs.schema).parquet(basePath)
        else sigs.limit(0)
      acceptNearDup(sigs, base)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .option("compression", "zstd").parquet(basePath)
    } finally sigs.unpersist(blocking = false)
  }

  /** The acceptance decision of [[startNearDupSink]] step 4, as a frame:
    * accepted (doc_id, sh, sig) rows of `batchSigs` given `baseSigs`. */
  private[graft] def acceptNearDup(batchSigs: DataFrame, baseSigs: DataFrame): DataFrame = {
    import graft.queries.DedupQueries
    val batchPairs = DedupQueries
      .minhashPairsOfSigs(batchSigs, DedupQueries.MaxLshBucket)
      .select("doc_a", "doc_b")
    val comp = DedupQueries.keepList(batchPairs, batchSigs.select("doc_id"))
    val baseMatched = DedupQueries.probePairsAgainst(batchSigs, baseSigs)
      .select(col("new_id").as("doc_id")).distinct()
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
