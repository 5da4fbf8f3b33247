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
    * hinted reads from (same algebraic schema: cnt/min/max/sum plus
    * first/last (ts, value) per (fingerprint, step bucket),
    * date-partitioned — the first/last pair is what makes
    * rate/increase/last hints rollup-servable). Append mode — a
    * window's row lands once its watermark closes, so rows are final (no
    * partial-row merge needed); samples later than the watermark stay in
    * the raw table only (hinted serving then slightly undercounts those
    * buckets — the lateness budget is the caller's consistency knob).
    * Use EITHER this sink OR a write-side rollup store
    * (`rollupStepMs > 0`), not both — running both double-counts. */
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
        min(graft.functions.ts_val_encode(col("timestamp_ms"), col("value"))).as("f"),
        max(graft.functions.ts_val_encode(col("timestamp_ms"), col("value"))).as("l"))
      .select(col("fingerprint"), unix_millis(col("w.start")).as("bucket_ms"),
        col("cnt"), col("min_v"), col("max_v"), col("sum_v"),
        graft.functions.ts_val_ts(col("f")).as("first_ts"),
        graft.functions.ts_val_v(col("f")).as("first_v"),
        graft.functions.ts_val_ts(col("l")).as("last_ts"),
        graft.functions.ts_val_v(col("l")).as("last_v"),
        to_date(col("w.start")).as("date"))

  /** Start the rollup sink against a store root. */
  def startRollupSink(stream: DataFrame, storeRoot: String, stepMs: Long,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"),
      watermark: String = "10 minutes"): org.apache.spark.sql.streaming.StreamingQuery =
    rollup(stream, stepMs, watermark).writeStream
      .outputMode("append")
      .trigger(trigger)
      .partitionBy("date")
      .option("path", s"$storeRoot/samples_rollup")
      .option("checkpointLocation", checkpoint)
      .option("compression", "zstd")
      .format("parquet")
      .start()

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
