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
