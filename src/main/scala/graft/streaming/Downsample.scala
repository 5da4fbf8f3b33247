package graft.streaming

import graft.functions.{labels_fingerprint, labels_json}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming extensions past the reference's surface — the roadmap items its
  * design anticipates (downsampling, README.md:71; new-series tracking, the
  * 5 s index refresh loop, clickhouse.go:146-204) re-expressed as native
  * Structured Streaming operators.
  *
  * Where the batch path has no watermark (the reference accepts late data
  * unconditionally), *windowed* streaming aggregation needs one to bound
  * state — callers choose the lateness budget; samples later than that fall
  * out of the streaming downsample and are still present in the raw table
  * (the batch `ds1_downsample` query re-derives buckets exactly).
  */
object Downsample {

  /** Tumbling-window per-series downsample over a streaming
    * (labels map, timestamp_ms long, value double) frame: count/min/max/
    * avg/last per (fingerprint, bucket). Partial aggregation is map-side;
    * the exchange keys on (fingerprint, window) — uniform, scale-free.
    * `last_v` = value at the max (timestamp_ms) in the bucket. */
  def aggregate(stream: DataFrame,
      bucket: String = "1 minute", watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("fingerprint", labels_fingerprint(col("labels")))
      .withColumn("event_time", timestamp_millis(col("timestamp_ms")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), bucket).as("w"), col("fingerprint"))
      .agg(count(lit(1)).as("n"),
        min("value").as("min_v"), max("value").as("max_v"), avg("value").as("avg_v"),
        max_by(col("value"), col("timestamp_ms")).as("last_v"))
      .select(unix_millis(col("w.start")).as("bucket_ms"), col("fingerprint"),
        col("n"), col("min_v"), col("max_v"), col("avg_v"), col("last_v"))

  /** Continuous rollup maintenance: the streaming producer of the
    * `samples_rollup` table that [[graft.storage.ParquetStore]] serves
    * hinted reads from (same algebraic schema: cnt/min/max/sum/sum_sq plus
    * first/last (ts, value) and a DDSketch quantile partial per
    * (fingerprint, step bucket), date-partitioned — the first/last pair is
    * what makes rate/increase/last hints rollup-servable, the sketch what
    * makes quantile:<q> servable). Append mode — a
    * window's row lands once its watermark closes, so rows are final (no
    * partial-row merge needed); samples later than the watermark stay in
    * the raw table only (hinted serving then slightly undercounts those
    * buckets — the lateness budget is the caller's consistency knob).
    * Use EITHER this sink OR a write-side rollup store
    * (`rollupStepMs > 0`), not both — running both double-counts. This
    * is ENFORCED: each producer kind claims a `_rollup_producer` marker
    * under the store root and the other kind then refuses to start
    * ([[claimRollupProducer]], StreamingSpec-pinned). */
  def rollup(stream: DataFrame, stepMs: Long,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("fingerprint", labels_fingerprint(col("labels")))
      .withColumn("event_time", timestamp_millis(col("timestamp_ms")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), s"$stepMs milliseconds").as("w"),
        col("fingerprint"))
      // decimal pack, not min/max(struct): hash-aggregated streaming state
      // (see Storage.rollupPartials — same first/last semantics)
      .agg(count(lit(1)).as("cnt"), min("value").as("min_v"),
        max("value").as("max_v"), sum("value").as("sum_v"),
        sum(col("value") * col("value")).as("sum_sq"),
        min(graft.functions.ts_val_encode(col("timestamp_ms"), col("value"))).as("f"),
        max(graft.functions.ts_val_encode(col("timestamp_ms"), col("value"))).as("l"),
        graft.functions.dd_hist(col("value")).as("hist"))
      .select(col("fingerprint"), unix_millis(col("w.start")).as("bucket_ms"),
        col("cnt"), col("min_v"), col("max_v"), col("sum_v"), col("sum_sq"),
        graft.functions.ts_val_ts(col("f")).as("first_ts"),
        graft.functions.ts_val_v(col("f")).as("first_v"),
        graft.functions.ts_val_ts(col("l")).as("last_ts"),
        graft.functions.ts_val_v(col("l")).as("last_v"),
        col("hist"),
        to_date(col("w.start")).as("date"))

  /** Start the rollup sink against a store root. Writes are
    * REPLAY-IDEMPOTENT (the `writeIdempotent` analogue for the rollup
    * table): each batch anti-joins its (fingerprint, bucket_ms) keys
    * against the rows already on disk before appending, so re-processing
    * the source — a failed batch retried, or a full replay after the
    * checkpoint is wiped — never lands a second copy of a bucket that
    * `mergeRollup` would then double-count.
    *
    * Upgrade path when the streaming state-store schema changes (the
    * aggregation buffer in [[rollup]] is part of checkpoint state, so an
    * old checkpoint fails to restore): point the restarted query at a NEW
    * checkpoint dir and replay the source; the anti-join skips every
    * bucket the previous incarnation already wrote. No rollup rebuild or
    * manual dedup is needed. */
  def startRollupSink(stream: DataFrame, storeRoot: String, stepMs: Long,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"),
      watermark: String = "10 minutes"): org.apache.spark.sql.streaming.StreamingQuery = {
    val path = s"$storeRoot/samples_rollup"
    claimRollupProducer(stream.sparkSession, storeRoot, "stream")
    rollup(stream, stepMs, watermark).writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, _: Long) => appendRollupIdempotent(batch, path))
      .start()
  }

  /** Append final (watermark-closed) rollup rows to `path`, dropping
    * (fingerprint, bucket_ms) keys that already exist there. The existence
    * probe reads ONLY the date partitions and bucket range the batch spans,
    * so its cost tracks batch time-span, not table size — same pruning
    * shape as the raw path's `writeIdempotent`. */
  private[graft] def appendRollupIdempotent(batch: DataFrame, path: String): Unit = {
    val spark = batch.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a dir written by the old file-stream sink carries a _spark_metadata
    // commit log; batch appends would be invisible to readers of that log.
    require(!fs.exists(new org.apache.hadoop.fs.Path(hPath, "_spark_metadata")),
      s"$path carries a file-stream-sink _spark_metadata log; batch appends would be " +
        "invisible to it. Rebuild the rollup once (graft.tools.Compact.run rewrites it " +
        "without the log) before restarting this sink.")
    // the bounds agg and the anti-join write are two ACTIONS on the same
    // foreachBatch frame — uncached, Spark would re-run the stateful
    // window aggregation (and re-read the source) once per action
    batch.persist()
    try {
      val fresh =
        if (!fs.exists(hPath)) batch
        else {
          val Array(bounds) =
            batch.agg(min("bucket_ms").as("lo"), max("bucket_ms").as("hi")).collect()
          if (bounds.isNullAt(0)) return
          val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
          batch.join(existingKeys(spark, batch.schema, path, lo, hi),
            Seq("fingerprint", "bucket_ms"), "left_anti")
        }
      fresh.write.mode(org.apache.spark.sql.SaveMode.Append).partitionBy("date")
        .option("compression", "zstd").parquet(path)
    } finally batch.unpersist(blocking = false)
  }

  /** The existence probe's key scan: date partitions + bucket range the
    * batch spans, projected to the join keys — so the probe reads two long
    * columns, never the wide partial columns (the DDSketch bytes dominate
    * row width; a probe that read them would pay the whole table's sketch
    * IO per micro-batch). Plan-asserted in PlanSpec. Explicit schema: an
    * empty dir (a no-window first batch wrote only _SUCCESS) reads as an
    * empty frame instead of failing inference. */
  private[graft] def existingKeys(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType, path: String,
      lo: Long, hi: Long): DataFrame =
    spark.read.schema(schema).parquet(path)
      .where(col("date").between(
        to_date(timestamp_millis(lit(lo))), to_date(timestamp_millis(lit(hi)))))
      .where(col("bucket_ms").between(lo, hi))
      .select("fingerprint", "bucket_ms")

  /** Enforce the documented ONE-PRODUCER contract for `samples_rollup`:
    * the write-side batch rollup (`ParquetStore(rollupStepMs > 0)` on its
    * first rollup append) and this streaming sink each claim a marker
    * (`_rollup_producer` under the store root) naming their kind; a
    * second producer of the OTHER kind fails fast and loud instead of
    * silently double-counting every bucket both produce. Restarting the
    * same kind (sink restart, new checkpoint, another batch writer
    * process) re-claims freely — idempotent appends make same-kind
    * producers safe; it is the batch+stream MIX that double-counts.
    * Migrating kinds is a deliberate act: verify/rebuild the rollup
    * (`graft.tools.Compact.run`), then delete the marker. */
  private[graft] def claimRollupProducer(spark: SparkSession, storeRoot: String,
      kind: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$storeRoot/_rollup_producer")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // A marker is only ever renamed into place fully written (below), so an
    // empty read can only be a racing claimer mid-flight (or a legacy
    // create-then-write marker): retry briefly before treating it as real.
    def existing(): String = {
      def readOnce(): String = {
        val in = fs.open(p)
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      }
      var s = readOnce(); var tries = 0
      while (s.isEmpty && tries < 20) { Thread.sleep(50); s = readOnce(); tries += 1 }
      s
    }
    def refuse(other: String): Nothing = throw new IllegalStateException(
      s"samples_rollup under $storeRoot is already produced by the '$other' path; " +
        s"starting a '$kind' producer would double-count every bucket both emit. " +
        "To migrate: stop the other producer, rebuild the rollup once " +
        "(graft.tools.Compact.run), then delete " + p)
    // Claim protocol: an exclusive-create LOCK decides who writes, and the
    // marker itself is write-tmp + rename so it is never observable
    // half-written. Rename alone cannot be the claim: on local/POSIX
    // filesystems RawLocalFileSystem.rename is File.renameTo, which
    // silently REPLACES an existing destination and returns true — two
    // concurrent claimers of different kinds would each "win" their rename
    // and the mixed-producer refuse() would never fire. create(lock,
    // overwrite=false) throws for exactly one of them on HDFS and local
    // alike. A claimer that dies between lock and rename leaves a stale
    // lock; waiters break it after the marker fails to appear within the
    // grace window (graft.rollup.lockGraceMs, default 2000 — raise it on
    // GC-pausey or slow-FS deployments) and retry the claim from scratch.
    // Stale-lock break is not perfectly safe against a LIVE-but-slow
    // holder, so the lock carries an OWNERSHIP TOKEN: the winner writes a
    // UUID into the lock and re-verifies it immediately before the marker
    // rename — a holder whose lock was broken (token gone or replaced)
    // backs off and retries instead of renaming over the new winner's
    // marker; and after the rename it re-reads the marker and refuses on
    // kind mismatch, closing the remaining verify→rename microsecond
    // window on replace-on-rename filesystems.
    val lock = new org.apache.hadoop.fs.Path(s"$storeRoot/._rollup_producer.lock")
    val graceMs = spark.conf.getOption("graft.rollup.lockGraceMs")
      .map(_.toLong).getOrElse(2000L)
    val pollMs = 50L
    val polls = math.max(1L, graceMs / pollMs).toInt
    def readLockToken(): Option[String] =
      try {
        val in = fs.open(lock)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim)
        finally in.close()
      } catch { case _: java.io.IOException => None }
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      if (attempts > 10) throw new IllegalStateException(
        s"could not claim $p after $attempts attempts (lock contention on $lock)")
      if (fs.exists(p)) {
        val e = existing(); if (e != kind) refuse(e)
        done = true
      } else {
        fs.mkdirs(p.getParent)
        val token = java.util.UUID.randomUUID().toString
        // fs.create(overwrite=false) is atomic on HDFS (server-side) but a
        // check-then-create on the local filesystem; there, java.nio's
        // createFile is O_CREAT|O_EXCL — truly exclusive. The token write
        // follows the exclusive create: a reader may briefly see an empty
        // lock, which it treats as "not mine" (only an exact match counts).
        val wonLock =
          try {
            fs match {
              case _: org.apache.hadoop.fs.LocalFileSystem |
                   _: org.apache.hadoop.fs.RawLocalFileSystem =>
                val lp = java.nio.file.Paths.get(lock.toUri.getPath)
                java.nio.file.Files.createFile(lp)
                java.nio.file.Files.write(lp,
                  token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              case _ =>
                val out = fs.create(lock, false)
                try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
                finally out.close()
            }
            true
          } catch { case _: java.io.IOException => false }
        if (wonLock) {
          var ownershipLost = false
          try {
            // the lock serializes claimers, but a previous winner may have
            // finished between our exists() and create(): re-check
            if (fs.exists(p)) {
              val e = existing(); if (e != kind) refuse(e)
            } else {
              val tmp = new org.apache.hadoop.fs.Path(
                s"$storeRoot/._rollup_producer.${java.util.UUID.randomUUID()}.tmp")
              val out = fs.create(tmp, true)
              try out.write(kind.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
              // ownership check: if a waiter judged us dead and broke the
              // lock, our token is gone — renaming now could replace the
              // new winner's marker on local FS. Back off and retry.
              if (!readLockToken().contains(token)) {
                fs.delete(tmp, false)
                ownershipLost = true
              } else if (!fs.rename(tmp, p)) {
                fs.delete(tmp, false); refuse(existing())
              } else {
                // post-rename re-read: on replace-on-rename filesystems a
                // racing claimer in the verify→rename window could have
                // replaced our marker; a kind mismatch here means a MIXED
                // pair raced — refuse rather than double-count.
                val e = existing(); if (e != kind) refuse(e)
              }
            }
          } finally if (!ownershipLost) {
            // delete only a lock we still own — unconditionally deleting
            // would break the NEXT claimer's lock if ours was already broken
            if (readLockToken().contains(token)) fs.delete(lock, false)
          }
          if (!ownershipLost) done = true
          else Thread.sleep(pollMs)
        } else {
          // lost the lock: wait for the winner's marker, then compare kinds
          var tries = 0
          while (!fs.exists(p) && tries < polls) { Thread.sleep(pollMs); tries += 1 }
          if (fs.exists(p)) {
            val e = existing(); if (e != kind) refuse(e)
            done = true
          } else {
            // no marker within the grace window: the holder is presumed
            // dead — break the stale lock and retry the claim from scratch.
            // (A live-but-slow holder is protected by its token check.)
            fs.delete(lock, false)
          }
        }
      }
    }
  }

  /** Stateful first-seen series detection — the streaming-native form of
    * the new-fingerprint check (clickhouse.go:437-447): keyed state per
    * fingerprint, emits (fingerprint, labels JSON) exactly once per series
    * for the lifetime of the query. State is one boolean per distinct
    * series — bounded by series cardinality, not sample volume. */
  def newSeries(spark: SparkSession, stream: DataFrame): Dataset[(Long, String)] = {
    import spark.implicits._
    stream
      .select(labels_fingerprint(col("labels")).as("fingerprint"),
        labels_json(col("labels")).as("labels"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (fp: Long, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1).map { case (_, labels) => (fp, labels) } }
      }
  }
}
