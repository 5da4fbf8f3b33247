package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming event sessionization — batch ev1's streaming analogue, built
  * on Spark's NATIVE `session_window` rather than a hand-rolled
  * `flatMapGroupsWithState`: the declarative form gets the engine's
  * session-merging state store, watermark-driven eviction and RocksDB
  * spilling for free, and stays optimizable by Catalyst.
  *
  * Semantics vs batch ev1 (graft.queries.EventQueries), pinned in
  * StreamingSpec:
  *   - a session closes after `gap` inactivity, same rule;
  *   - `end_ms` here is last-event + gap (the session_window contract);
  *     ev1 reports the last event itself — subtract the gap for parity;
  *   - the boundary is half-open: an event exactly `gap` after its
  *     predecessor starts a NEW session here but stays in-session under
  *     ev1's strictly-greater rule — measure-zero at microsecond event
  *     time, stated rather than papered over.
  *
  * Scale: state is one merging window per OPEN session — bounded by
  * concurrently-active users, not stream volume — and the watermark
  * evicts closed sessions, so a long-lived query holds only the
  * active-session frontier. The one exchange is on user_id, the same
  * natural key as the batch family (SCALE.md §5).
  */
object EventStream {

  /** `stream` needs (user_id, ts: timestamp, value) columns. Append-mode
    * output emits each session exactly once, when the watermark passes
    * its close. */
  def sessionize(stream: DataFrame, gap: String = "30 minutes",
      watermark: String = "0 seconds"): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(round(col("value") * 100).cast("long")) / 100.0, 2).as("sum_value"))
      .select(col("user_id"),
        unix_millis(col("w.start")).as("start_ms"),
        unix_millis(col("w.end")).as("end_ms"),
        col("n_events"), col("sum_value"))
}
