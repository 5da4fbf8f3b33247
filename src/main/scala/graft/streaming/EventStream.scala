package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

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

  /** Per-user funnel progression: (stage reached so far, completion time
    * of that stage). */
  case class FunnelState(stage: Int, lastT: Long)

  /** Streaming ordered funnel — batch ev2's stateful analogue: each user
    * carries a (stage, last-completion-time) accumulator across
    * micro-batches and advances it greedily on the first event matching
    * the next step strictly after the previous completion — the exact
    * fold ev2 runs, with the SAME within-batch sort key (t, event_id,
    * event_type), so on identical data the final stages agree (pinned in
    * StreamingSpec against an independent plain-Scala fold).
    *
    * Emits (user_id, stage) per user per batch the user appears in
    * (Update-mode semantics; stage is monotone, so the latest row per
    * user is the answer). State is TWO numbers per user — bounded by the
    * user population, not event volume, the cheapest state shape a
    * stateful operator can have.
    *
    * Ordering contract, stated rather than papered over: within a batch
    * events are folded in full time order; across batches the greedy
    * fold is order-sensitive, so exact ev2 parity holds when batch
    * boundaries respect event time (the log-tail / replay case). A
    * cross-batch-late event can only UNDER-advance the funnel (a miss),
    * never invent progress — the conservative failure mode. */
  def funnel(spark: SparkSession, stream: DataFrame,
      steps: Seq[String] = graft.queries.EventQueries.FunnelSteps)
      : Dataset[(Long, Int)] = {
    import spark.implicits._
    stream
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("t"),
        col("event_id").cast("long"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[FunnelState, (Long, Int)](GroupStateTimeout.NoTimeout()) {
        (uid, events, state) =>
          var (stage, lastT) = state.getOption
            .map(s => (s.stage, s.lastT)).getOrElse((0, Long.MinValue))
          events.toSeq.sortBy(e => (e._2, e._3, e._4)).foreach { case (_, t, _, et) =>
            if (stage < steps.size && et == steps(stage) && (stage == 0 || t > lastT)) {
              stage += 1; lastT = t
            }
          }
          state.update(FunnelState(stage, lastT))
          (uid, stage)
      }
  }
}
