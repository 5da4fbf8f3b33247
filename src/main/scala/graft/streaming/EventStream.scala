package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

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
    * never invent progress — the conservative failure mode.
    *
    * STATE SIZING CONTRACT: two numbers per DISTINCT user ever seen —
    * `ttlMs = 0` (never evict) is safe only while the distinct-user
    * population fits the state store (RocksDB: ~48 B/user ⇒ 1 B users
    * ≈ 48 GB across the cluster, fine; an UNBOUNDED-key stream — e.g.
    * user_id minted per request — is not). For long-lived queries set
    * `ttlMs > 0`: a user idle past `ttlMs` of EVENT time (their last
    * folded event + ttl, fired when the watermark — which lags max
    * event time by ttl so in-horizon late events still fold — passes
    * it, i.e. after between ttl and 2·ttl of idleness) is
    * evicted, and on re-emergence the funnel RESTARTS from stage 0 —
    * the conservative direction again (progress is forgotten, never
    * invented), pinned in StreamingSpec's eviction test. */
  def funnel(spark: SparkSession, stream: DataFrame,
      steps: Seq[String] = graft.queries.EventQueries.FunnelSteps,
      ttlMs: Long = 0L)
      : Dataset[(Long, Int)] = {
    import spark.implicits._
    // watermark delay = ttl, NOT zero: EventTimeTimeout also applies the
    // watermark as an input filter (FlatMapGroupsWithStateExec drops rows
    // older than it), so a zero delay would silently discard every
    // cross-batch out-of-order event. With delay = ttl the only events
    // dropped are those older than the eviction horizon — state they
    // would touch is evicted anyway, so the drop coincides with the
    // documented TTL drift window instead of adding a new one.
    val src = if (ttlMs <= 0) stream
      else stream.withWatermark("ts", s"$ttlMs milliseconds")
    val timeout =
      if (ttlMs <= 0) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.EventTimeTimeout()
    // the raw `ts` column rides along (tuple slot 5): it carries the
    // watermark tag EventTimeTimeout requires to be visible in the
    // stateful operator's input — projecting it away fails analysis
    src
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("t"),
        col("event_id").cast("long"), col("event_type"), col("ts"))
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, (Long, Int)](
        OutputMode.Update(), timeout) {
        (uid, events, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var (stage, lastT) = state.getOption
              .map(s => (s.stage, s.lastT)).getOrElse((0, Long.MinValue))
            val evs = events.toSeq
            evs.sortBy(e => (e._2, e._3, e._4)).foreach { case (_, t, _, et, _) =>
              if (stage < steps.size && et == steps(stage) && (stage == 0 || t > lastT)) {
                stage += 1; lastT = t
              }
            }
            state.update(FunnelState(stage, lastT))
            if (ttlMs > 0) {
              // idle-eviction deadline: last EVENT time seen for this user
              // + ttl, clamped above the watermark (Spark rejects a stamp
              // the watermark has already passed — reachable for a user
              // whose only events are themselves ttl-late)
              val maxTMs = evs.iterator.map(_._2).max / 1000L
              state.setTimeoutTimestamp(
                math.max(maxTMs + ttlMs, state.getCurrentWatermarkMs() + 1))
            }
            Iterator.single((uid, stage))
          }
      }
  }

  /** Per-user set of distinct active days (days since epoch, sorted) —
    * the one piece of state both the live DAU/WAU card and the live
    * retention card need. Bounded by days-active-per-user, not event
    * volume: a year-long stream holds ≤365 ints per user. */
  case class DaysState(days: Array[Int])

  /** The PURE delta kernels of the live cards, extracted so the exactness
    * argument is a property-testable function rather than a lambda inside
    * a stateful operator (StreamingSpec checks them against brute-force
    * recomputation over random day sets and batch splits). */
  object DayDeltas {
    /** DAU/WAU deltas for one user gaining `arriving` (possibly known,
      * unordered, duplicated) days on top of `known`: per window-ending
      * day wd, (dauDelta, wauDelta). Exact: a (user, day) membership adds
      * +1 DAU at that day; a (user, window) membership adds +1 WAU at wd
      * iff no previously-counted active day already covered [wd−6, wd]. */
    def activeUsers(known: Set[Int], arriving: Seq[Int])
        : (Set[Int], Map[Int, (Int, Int)]) = {
      var days = known
      val out = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      arriving.distinct.sorted.foreach { d =>
        if (!days(d)) {
          var off = 0
          while (off < 7) {
            val wd = d + off
            val covered = (wd - 6 to wd).exists(days)
            if (!covered || off == 0) {
              val (dau, wau) = out.getOrElse(wd, (0, 0))
              out(wd) = (if (off == 0) dau + 1 else dau,
                if (!covered) wau + 1 else wau)
            }
            off += 1
          }
          days += d
        }
      }
      (days, out.toMap)
    }

    /** Retention deltas: the (cohort, offset) pairs a user STOPS and
      * STARTS contributing when their day set grows — a late
      * earlier-than-d0 day re-buckets the whole user (retract + re-emit). */
    def retention(known: Array[Int], arriving: Seq[Int])
        : (Array[Int], Seq[(Int, Int, Int)]) = {
      val newDays = (known ++ arriving).distinct.sorted
      def pairs(ds: Array[Int]): Set[(Int, Int)] =
        if (ds.isEmpty) Set.empty
        else { val d0 = ds.head; ds.iterator.map(d => (d0, d - d0)).toSet }
      val (oldP, newP) = (pairs(known), pairs(newDays))
      val deltas = (newP -- oldP).toSeq.map { case (c, o) => (c, o, 1) } ++
        (oldP -- newP).toSeq.map { case (c, o) => (c, o, -1) }
      (newDays, deltas)
    }
  }

  /** (user_id, day, raw ts) — the ts column rides along because it carries
    * the watermark tag EventTimeTimeout needs visible in the stateful
    * operator's input; the kernels use only (user, day). */
  private def eventDays(stream: DataFrame, ttlMs: Long)
      : Dataset[(Long, Int, java.sql.Timestamp)] = {
    import stream.sparkSession.implicits._
    // delay = ttl for the same reason as funnel's: a zero-delay watermark
    // would drop late days at the operator input, breaking the exact
    // re-bucket/replay contracts for anything inside the ttl horizon
    val src = if (ttlMs <= 0) stream
      else stream.withWatermark("ts", s"$ttlMs milliseconds")
    src.select(col("user_id").cast("long"),
      unix_date(to_date(col("ts"))).cast("int"), col("ts"))
      .as[(Long, Int, java.sql.Timestamp)]
  }

  private def timeoutOf(ttlMs: Long): GroupStateTimeout =
    if (ttlMs <= 0) GroupStateTimeout.NoTimeout()
    else GroupStateTimeout.EventTimeTimeout()

  /** Idle-eviction deadline for the day-granular cards: end of the user's
    * last active day + ttl, clamped above the current watermark (Spark
    * rejects an already-passed stamp). */
  private def armDayTtl(state: org.apache.spark.sql.streaming.GroupState[DaysState],
      maxDay: Int, ttlMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max((maxDay + 1).toLong * 86400000L + ttlMs,
        state.getCurrentWatermarkMs() + 1))

  /** Streaming ev4 — live DAU/WAU per day, batch
    * [[graft.queries.EventQueries.activeUsersOf]]'s update-mode analogue.
    *
    * Shape: `flatMapGroupsWithState` keyed by user emits EXACT COUNT
    * DELTAS — when a user's set of active days gains day `d`, that is
    * +1 DAU at `d`, and +1 WAU at each window-ending day `wd ∈ [d, d+6]`
    * that no previously-known active day already covered — and a running
    * `sum(delta)` per day downstream turns the delta stream into the
    * card. The sums equal the batch distinct-counts at every prefix by
    * construction (each (user, day) / (user, window) membership change
    * is emitted exactly once, ±1), pinned in StreamingSpec.
    *
    * Why deltas instead of `countDistinct`: streaming distinct
    * aggregation is unsupported (unbounded per-group state in the agg
    * operator); here the distinctness lives in the keyed user state
    * where it is NATURALLY bounded, and the downstream aggregation
    * state is two longs per day. Late events are handled exactly — a
    * replayed (user, day) is already in the set and emits nothing
    * (idempotent), an out-of-order NEW day emits the same deltas batch
    * recomputation would. Scale: one exchange on user_id (same key as
    * sessionize/funnel), emission ≤7 rows per newly-active user-day,
    * second exchange is day-keyed (tiny).
    *
    * STATE SIZING CONTRACT: one sorted int array of DISTINCT ACTIVE DAYS
    * per distinct user — ≤365 ints/user-year, so `ttlMs = 0` (never
    * evict) is bounded by users × active days, not stream volume; it is
    * still monotone in the user population, so a years-long query over
    * an open-world key space needs `ttlMs > 0`. Eviction drift contract
    * (pinned in StreamingSpec): a user idle past `ttlMs` of event time
    * is forgotten; if they re-emerge the card stays EXACT for their new
    * days (a new day is +1 DAU regardless of history) and for every WAU
    * window that does not straddle the idle gap — both counts can only
    * OVER-count, and only when a (user, day) REPLAY arrives after
    * eviction or a new day lands within 6 days of a forgotten one.
    * Choose `ttlMs` ≥ 7 days + the source's max replay lag and the
    * drift window is empty. Timing note: the input watermark lags the
    * max event time by `ttlMs` (so in-horizon late events are never
    * dropped at the operator input), which means the eviction deadline
    * (last active day + ttl) actually fires once a user has been idle
    * between `ttlMs` and `2·ttlMs` of event time — the bound is on the
    * EARLIEST eviction, which is what the drift contract needs.
    *
    * With `ttlMs > 0` the query chains a watermarked stateful operator
    * into the running-sum aggregation, which trips Spark's conservative
    * global-watermark pattern check. Here the pattern is provably benign —
    * the emitted delta rows carry NO event-time column, so the downstream
    * sum can never classify one as late and drop it — set
    * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled=false`
    * to run (StreamingSpec's eviction test does exactly this). */
  def activeUsers(spark: SparkSession, stream: DataFrame, ttlMs: Long = 0L): DataFrame = {
    import spark.implicits._
    val deltas = eventDays(stream, ttlMs)
      .groupByKey(_._1)
      .flatMapGroupsWithState[DaysState, (Int, Int, Int)](
        OutputMode.Append(), timeoutOf(ttlMs)) {
        (_, events, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val known = state.getOption.map(_.days.toSet).getOrElse(Set.empty[Int])
            val (days, out) = DayDeltas.activeUsers(known, events.map(_._2).toSeq)
            state.update(DaysState(days.toArray.sorted))
            if (ttlMs > 0) armDayTtl(state, days.max, ttlMs)
            out.iterator.map { case (wd, (dau, wau)) => (wd, dau, wau) }
          }
      }
      .toDF("wd", "dau_delta", "wau_delta")
    deltas.groupBy(col("wd"))
      .agg(sum(col("dau_delta")).as("dau"), sum(col("wau_delta")).as("wau"))
      .where(col("dau") > 0) // batch contract: observed days only
      .select(date_format(date_from_unix_date(col("wd")), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"))
  }

  /** Streaming ev3 — live cohort retention, batch
    * [[graft.queries.EventQueries.retentionOf]]'s update-mode analogue.
    *
    * Same delta discipline as [[activeUsers]], with one extra wrinkle:
    * a user's cohort is their FIRST-SEEN day, and a late event EARLIER
    * than the known first-seen day re-buckets the whole user. The keyed
    * state makes that exact rather than approximate — the group emits
    * retractions (−1) for every (cohort, offset) pair the user
    * previously contributed and fresh +1s under the new cohort, so the
    * downstream running sum lands on precisely the batch answer, not a
    * drifted one. Normal arrivals (day ≥ d0) touch only their own new
    * offsets. Emission is bounded by the user's distinct-active-day
    * count; state is the same day set as the DAU card.
    *
    * TOMBSTONE CONTRACT: a (cohort, offset) pair whose count retracts to
    * exactly zero stays in the card as an explicit `n_active = 0` row —
    * in update output mode that zeroed row is the ONLY signal an upsert
    * sink gets to delete the stale positive it holds, so it is emitted,
    * not filtered (batch ev3 has no such pairs at all; parity compares
    * exclude the zeros). Pairs never touched have no row.
    *
    * STATE SIZING CONTRACT: same day-set state as [[activeUsers]] —
    * bounded per user, monotone in users, so long-lived open-world
    * streams need `ttlMs > 0`. Eviction drift (pinned in StreamingSpec):
    * a re-emerging evicted user is treated as a NEW user — their new
    * first-seen day becomes a fresh cohort (+1 where batch would count
    * them in the old cohort at a large offset), and late replays of
    * pre-eviction days re-emit. Retention cards read offsets up to a
    * horizon H; choose `ttlMs` ≥ H + max replay lag and every drifted
    * cell lies beyond what the card reports. For exact re-derivation,
    * recompute from the event log with batch ev3 — the card is the live
    * view, the log is the source of truth. `ttlMs > 0` needs the same
    * benign-pattern conf as [[activeUsers]] (delta rows carry no
    * event-time column). */
  def retention(spark: SparkSession, stream: DataFrame, ttlMs: Long = 0L): DataFrame = {
    import spark.implicits._
    val deltas = eventDays(stream, ttlMs)
      .groupByKey(_._1)
      .flatMapGroupsWithState[DaysState, (Int, Int, Int)](
        OutputMode.Append(), timeoutOf(ttlMs)) {
        (_, events, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val known = state.getOption.map(_.days).getOrElse(Array.empty[Int])
            val (newDays, deltas) = DayDeltas.retention(known, events.map(_._2).toSeq)
            state.update(DaysState(newDays))
            if (ttlMs > 0) armDayTtl(state, newDays.max, ttlMs)
            deltas.iterator
          }
      }
      .toDF("cohort", "day_offset", "delta")
    deltas.groupBy(col("cohort"), col("day_offset"))
      .agg(sum(col("delta")).as("n_active"))
      // n_active = 0 rows are KEPT: the tombstone an upsert sink needs
      // when a cohort re-bucket retracts a pair it previously upserted
      .select(
        date_format(date_from_unix_date(col("cohort")), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("long").as("day_offset"), col("n_active"))
  }

  /** LIVE heavy-hitters card — batch ev5's update-mode analogue: the
    * Misra–Gries summary ([[graft.functions]] `freq_sketch`) as the
    * STREAMING AGGREGATION STATE. Each trigger merges the micro-batch's
    * map-side partials into the one persistent 256-counter summary and
    * re-emits the current top-k, so the card converges on exactly what
    * batch ev5 computes over the same prefix (equal whenever distinct
    * users ≤ capacity — pinned in StreamingSpec; beyond that, MG's
    * under-count bound, self-reported as `err_bound`).
    *
    * Why this shape: the exact card would be a streaming
    * `groupBy(user).count()` whose state grows with DISTINCT USERS
    * forever (the NoTimeout anti-pattern the TTL'd cards exist to avoid);
    * here the state is ONE constant-size sketch row however many users
    * the stream ever sees — the frequent-items member of the same
    * family as the HLL/DDSketch rollups, now exercised as streaming
    * state. Zero wide exchange: partials combine map-side, one
    * single-row state update per trigger. */
  def heavyHitters(stream: DataFrame, k: Int = 10): DataFrame = {
    import graft.functions.{freq_sketch, freq_items, freq_n}
    stream.select(col("user_id").cast("string").as("u"))
      .agg(freq_sketch(col("u")).as("sk"))
      .select(slice(freq_items(col("sk")), 1, k).as("items"),
        (freq_n(col("sk")) / (graft.functions.MGOps.DefaultCapacity + 1))
          .as("err_bound"))
  }
}
