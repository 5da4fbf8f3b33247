package graft.queries

import graft.core.MatcherCompiler
import graft.functions.{labels_fingerprint, labels_json}
import graft.model.{MatchType, Matcher}
import graft.storage.RawSql
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The PromHouse query surface (SURVEY.md §2.2/2.4/2.8) exercised over the
  * driver test data. The `events` table plays the samples stream: each
  * (event_type, user_id) pair is a series, with labels
  * `{__name__: event_type, user: <user_id>}` — the same open label-space
  * model as the reference, evaluated with the engine's real matcher
  * compiler and label functions so the DuckDB oracle checks the actual
  * operator implementations.
  */
object PromQueries {

  import QueryDef._

  /** events projected into the engine's sample model. */
  private def eventSamples(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").select(
      map(lit("__name__"), col("event_type"),
        lit("user"), col("user_id").cast("string")).as("labels"),
      col("event_id"),
      unix_millis(col("ts")).as("timestamp_ms"),
      col("value"))

  private def matcherQuery(name: String, matchers: Seq[Matcher], oracleWhere: String): QueryDef =
    withOracle(name,
      s"""SELECT event_id, epoch_ms(ts) AS timestamp_ms, round(value, 2) AS value
         |FROM events
         |WHERE $oracleWhere""".stripMargin) { (s, dir) =>
      eventSamples(s, dir)
        .where(MatcherCompiler.compile(col("labels"), matchers))
        .select(col("event_id"), col("timestamp_ms"), round(col("value"), 2).as("value"))
    }

  /** F1: `=` with the missing-label≡"" rule. */
  private val f1Eq = matcherQuery("f1_matcher_eq",
    Seq(Matcher("__name__", MatchType.Eq, "purchase"), Matcher("user", MatchType.Eq, "5")),
    "event_type = 'purchase' AND cast(user_id AS VARCHAR) = '5'")

  /** F2: `!=`. */
  private val f2Neq = matcherQuery("f2_matcher_neq",
    Seq(Matcher("__name__", MatchType.Neq, "error")),
    "event_type <> 'error'")

  /** F3: `=~` fully-anchored regex. */
  private val f3Re = matcherQuery("f3_matcher_re",
    Seq(Matcher("__name__", MatchType.Re, "p.+|s.+")),
    "regexp_matches(event_type, '^(?:p.+|s.+)$')")

  /** F4: `!~`. */
  private val f4Nre = matcherQuery("f4_matcher_nre",
    Seq(Matcher("__name__", MatchType.Nre, "e.*")),
    "NOT regexp_matches(event_type, '^(?:e.*)$')")

  /** F5: conjunction incl. absent-label cases — `nolabel=""` and
    * `nolabel!="x"` both match everything (the reference's extension). */
  private val f5Conj = matcherQuery("f5_matcher_conj",
    Seq(
      Matcher("__name__", MatchType.Re, ".+"),
      Matcher("no_such_label", MatchType.Eq, ""),
      Matcher("no_such_label", MatchType.Neq, "x"),
      Matcher("user", MatchType.Nre, "1.*")),
    "NOT regexp_matches(cast(user_id AS VARCHAR), '^(?:1.*)$')")

  /** X2: canonical labels JSON — checked against literal string assembly. */
  private val x2Json = withOracle("x2_labels_json",
    """SELECT DISTINCT '{"__name__":"' || event_type || '","user":"' || user_id || '"}' AS labels
      |FROM events""".stripMargin) { (s, dir) =>
    eventSamples(s, dir).select(labels_json(col("labels")).as("labels")).distinct()
  }

  /** X1: FNV-1a fingerprint. Output is the distinct series dictionary
    * with the uint64 fingerprint rendered unsigned (the reference's
    * display semantics, README.md:35).
    *
    * FULL oracle (r10, upgraded from rows-only): FNV-1a is a pure
    * per-byte fold (h ^= b; h *= prime, mod 2⁶⁴ — Prometheus
    * labelSetToFingerprint byte layout: name, 0xFF, value, 0xFF per
    * sorted label), which DuckDB recomputes with `list_reduce` over the
    * code-point list (ASCII labels ⇒ code points ≡ UTF-8 bytes; the
    * 0xFF separators are injected as list elements, never as
    * characters). The ×prime step uses the t4 oracle's overflow-safe
    * 32-bit-split mulmod: prime = 2⁴⁰ + 435 ⇒ hi32 = 256, lo32 = 435. */
  private val x1Fp = withOracle("x1_fingerprint",
    """CREATE OR REPLACE MACRO graft_u64(x) AS
      |  CAST(CAST(x AS HUGEINT) % 18446744073709551616 AS UBIGINT);
      |CREATE OR REPLACE MACRO graft_signed64(x) AS
      |  CASE WHEN x >= CAST(9223372036854775808 AS UBIGINT)
      |       THEN CAST(CAST(x AS HUGEINT) - 18446744073709551616 AS BIGINT)
      |       ELSE CAST(x AS BIGINT) END;
      |CREATE OR REPLACE MACRO graft_fnvstep(h, c) AS graft_u64(
      |  (CAST(xor(h, c) AS HUGEINT) * 435) % 18446744073709551616 +
      |  ((CAST(xor(h, c) AS HUGEINT) * 256) % 4294967296) * 4294967296);
      |CREATE OR REPLACE MACRO graft_strcodes(s) AS
      |  list_transform(range(1, length(s)+1), i -> CAST(ord(s[i]) AS UBIGINT));
      |WITH s AS (
      |  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS uid FROM events),
      |f AS (
      |  SELECT event_type, uid,
      |         list_reduce(
      |           [CAST(14695981039346656037 AS UBIGINT)] ||
      |           graft_strcodes('__name__') || [CAST(255 AS UBIGINT)] ||
      |           graft_strcodes(event_type) || [CAST(255 AS UBIGINT)] ||
      |           graft_strcodes('user') || [CAST(255 AS UBIGINT)] ||
      |           graft_strcodes(uid) || [CAST(255 AS UBIGINT)],
      |           (h, c) -> graft_fnvstep(h, c)) AS fp
      |  FROM s)
      |SELECT '{"__name__":"' || event_type || '","user":"' || uid || '"}' AS labels,
      |       graft_signed64(fp) AS fingerprint,
      |       CAST(fp AS VARCHAR) AS fingerprint_u64
      |FROM f""".stripMargin) { (s, dir) =>
    eventSamples(s, dir)
      .select(labels_json(col("labels")).as("labels"),
        labels_fingerprint(col("labels")).as("fingerprint"))
      .distinct()
      .withColumn("fingerprint_u64", expr(
        """CASE WHEN fingerprint >= 0 THEN CAST(fingerprint AS STRING)
          |ELSE CAST(CAST(fingerprint AS DECIMAL(38,0))
          |          + CAST('18446744073709551616' AS DECIMAL(38,0)) AS STRING) END""".stripMargin))
  }

  /** rate()-style extension (the ReadHints.func the reference anticipates
    * but never implements, prompb.proto:45-50): per-series delta/seconds
    * between consecutive samples via lag window. */
  private val wf2Rate = withOracle("wf2_rate",
    """SELECT event_type, user_id, ts_us, round(rate, 6) + 0.0 AS rate FROM (
      |  SELECT event_type, user_id, epoch_us(ts) AS ts_us,
      |         (value - lag(value) OVER w) /
      |           ((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1000000.0) AS rate
      |  FROM events
      |  WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts, event_id)) t
      |WHERE rate IS NOT NULL""".stripMargin) { (s, dir) =>
    // order and difference on exact microseconds: millisecond truncation
    // would merge instants the oracle keeps distinct
    val w = Window.partitionBy("event_type", "user_id")
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val e0 = Tables(s, dir, "events")
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"), col("event_id"))
    // sort-window family: rows-per-task-bounded exchange on the window's
    // own partition keys (the sessionize remedy, SCALE.md §5)
    e0.repartition(graft.queries.EventQueries.boundedExchangePartitions(e0),
        col("event_type"), col("user_id"))
      .withColumn("rate", (col("value") - lag("value", 1).over(w)) /
        ((col("ts_us") - lag("ts_us", 1).over(w)) / 1000000.0))
      .where(col("rate").isNotNull)
      .select(col("event_type"), col("user_id"), col("ts_us"),
        // + 0.0 normalizes -0.0 (engines disagree on the sign of zero)
        (round(col("rate"), 6) + 0.0).as("rate"))
  }

  /** A1: group-adjacent assembly into (series, time-ordered samples).
    * The engine-internal form is `array<struct>` (readSeries,
    * TimeSeriesStore.scala); the gate query projects it to a canonical
    * string — "ts:cents" pairs, time-ordered — because array columns are
    * not hashable by the driver's pandas compare, and the all-integer
    * rendering is bit-stable across engines (round-to-int of the same
    * double is; double→string is not). */
  private val a1Assembly = withOracle("a1_assembly",
    """SELECT '{"__name__":"' || event_type || '","user":"' || user_id || '"}' AS labels,
      |       string_agg(epoch_ms(ts) || ':' || cast(round(value * 100) AS BIGINT), ','
      |                  ORDER BY epoch_ms(ts), cast(round(value * 100) AS BIGINT)) AS samples,
      |       count(*) AS n_samples
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    eventSamples(s, dir)
      .groupBy(labels_json(col("labels")).as("labels"))
      .agg(
        concat_ws(",", transform(
          sort_array(collect_list(struct(col("timestamp_ms").as("ts"),
            round(col("value") * 100).cast("long").as("cents")))),
          p => concat(p("ts").cast("string"), lit(":"), p("cents").cast("string"))))
          .as("samples"),
        count(lit(1)).as("n_samples"))
  }

  /** A1 stats: per-series sample count, time bounds, first/last value —
    * deterministic tie-break on (timestamp_ms, value, event_id). */
  private val a1Stats = withOracle("a1_assembly_stats",
    """WITH ranked AS (
      |  SELECT event_type, user_id, epoch_ms(ts) AS ts_ms, value, event_id,
      |         row_number() OVER (PARTITION BY event_type, user_id
      |                            ORDER BY epoch_us(ts), value, event_id) AS rn_first,
      |         row_number() OVER (PARTITION BY event_type, user_id
      |                            ORDER BY epoch_us(ts) DESC, value DESC, event_id DESC) AS rn_last
      |  FROM events)
      |SELECT event_type, user_id,
      |       count(*) AS n_samples,
      |       min(ts_ms) AS min_ts, max(ts_ms) AS max_ts,
      |       round(min(CASE WHEN rn_first = 1 THEN value END), 2) AS first_value,
      |       round(min(CASE WHEN rn_last = 1 THEN value END), 2) AS last_value
      |FROM ranked
      |GROUP BY event_type, user_id""".stripMargin) { (s, dir) =>
    // Single partial-agg-friendly pass: min_by/max_by on the composite
    // (ts, value, event_id) key replace two full window sorts — same
    // deterministic tie-break as the oracle's row_number ordering, one
    // exchange instead of two sorted ones. Both sides order on microsecond
    // precision — the oracle on epoch_us(ts) explicitly, because its raw
    // TIMESTAMP_NS column orders on nanoseconds the converted Spark column
    // no longer carries. Only the min_ts/max_ts *outputs* are
    // millisecond-truncated.
    val e = Tables(s, dir, "events")
      .select(col("event_type"), col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        unix_micros(col("ts")).as("ts_us"), col("value"), col("event_id"))
    // first/last via the order-preserving (ts, value) decimal pack, NOT
    // min_by over a struct key (struct agg buffers force SortAggregate —
    // see Storage.rollupPartials). Equivalent to the oracle's
    // (ts_us, value, event_id) ordering: value precedes event_id in the
    // key, so the event_id tie-break can only choose among rows sharing
    // (ts_us, value) — which all carry the same value being selected.
    val pack = graft.functions.ts_val_encode(col("ts_us"), col("value"))
    e.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n_samples"),
        min("ts_ms").as("min_ts"), max("ts_ms").as("max_ts"),
        round(graft.functions.ts_val_v(min(pack)), 2).as("first_value"),
        round(graft.functions.ts_val_v(max(pack)), 2).as("last_value"))
  }

  /** A3 at scale: HyperLogLog++ cardinality — one pass, no
    * distinct-shuffle, fixed-size sketch per group; the form a 100 TB
    * series-cardinality dashboard actually runs. Approximate by design →
    * rows-only (accuracy vs exact asserted in QueriesSpec). */
  private val a3CardinalityHll = rowsOnly("a3_cardinality_hll") { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(col("event_type").as("name"))
      .agg(approx_count_distinct("user_id", 0.02).as("n_series"))
  }

  /** a3's sketch row reduced to oracle-derivable invariants (the
    * rh4/pk4 ladder pattern): per metric, the HLL estimate must sit
    * within the declared relative standard deviation (×3) of the exact
    * distinct count — the exact side recomputed by BOTH engines. */
  private val a3HllInvariants = withOracle("a3_hll_invariants",
    """SELECT event_type AS name, count(DISTINCT user_id) AS n_exact,
      |       TRUE AS hll_within_bound
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    val est = Tables(s, dir, "events")
      .groupBy(col("event_type").as("name"))
      .agg(approx_count_distinct("user_id", 0.02).as("est"))
    Tables(s, dir, "events")
      .groupBy(col("event_type").as("name"))
      .agg(countDistinct("user_id").as("n_exact"))
      .join(broadcast(est), "name")
      .select(col("name"), col("n_exact"),
        (abs(col("est") - col("n_exact"))
          <= lit(3 * 0.02) * col("n_exact")).as("hll_within_bound"))
  }

  /** J4: top-k series enrichment — count per series, top 10, joined back to
    * the series dictionary (README.md:104-119). */
  private val j4TopkEnrich = withOracle("j4_topk_enrich",
    """WITH topk AS (
      |  SELECT event_type, user_id, count(*) AS n
      |  FROM events GROUP BY 1, 2
      |  ORDER BY n DESC, event_type, user_id LIMIT 10)
      |SELECT '{"__name__":"' || event_type || '","user":"' || user_id || '"}' AS labels, n
      |FROM topk""".stripMargin) { (s, dir) =>
    val samples = eventSamples(s, dir)
    val topk = samples
      .groupBy(col("labels"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("labels")("__name__").asc, col("labels")("user").asc)
      .limit(10)
    topk.select(labels_json(col("labels")).as("labels"), col("n"))
  }

  /** F9/X11: rawsql passthrough — the full SQL surface behind the read API.
    * The oracle replicates the any-column→(labels, value) coercion. */
  private val rawSqlQ = withOracle("rawsql_passthrough",
    """WITH q AS (
      |  SELECT l_returnflag AS flag, l_linestatus AS status,
      |         cast(count(*) AS DOUBLE) AS value
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT '{"flag":"' || flag || '","status":"' || status || '"}' AS labels,
      |       value, 1700000000000 AS timestamp_ms
      |FROM q""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    val matchers = Seq(
      Matcher("job", MatchType.Eq, "rawsql"),
      Matcher("query", MatchType.Eq,
        "SELECT l_returnflag AS flag, l_linestatus AS status, cast(count(*) AS DOUBLE) AS value FROM lineitem GROUP BY 1, 2"))
    val sql = RawSql.trigger(matchers).getOrElse(sys.error("rawsql trigger failed"))
    RawSql.read(s, sql, endMs = 1700000000000L)
      .select("labels", "value", "timestamp_ms") // fingerprint is engine-specific
  }

  /** Ranking window functions over the event stream (beyond-reference
    * analytics surface): per-user latest event + rank of value. */
  private val wf1Window = withOracle("wf1_rank_window",
    """SELECT user_id, event_id, round(value, 2) AS value, rnk, rn
      |FROM (
      |  SELECT user_id, event_id, value,
      |         rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rnk <= 3 OR rn = 1""".stripMargin) { (s, dir) =>
    val e0 = Tables(s, dir, "events")
    // sort-window family: rows-per-task-bounded exchange (the sessionize
    // remedy, SCALE.md §5) — both windows share the one user_id exchange
    val e = e0.repartition(
      graft.queries.EventQueries.boundedExchangePartitions(e0), col("user_id"))
    val byValue = Window.partitionBy("user_id").orderBy(col("value").desc, col("event_id").asc)
    val byTime = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rnk", rank().over(byValue))
      .withColumn("rn", row_number().over(byTime))
      .where(col("rnk") <= 3 || col("rn") === 1)
      .select(col("user_id"), col("event_id"), round(col("value"), 2).as("value"),
        col("rnk"), col("rn"))
  }

  /** A3-shape cardinality: series count per metric name
    * (README.md:90-100). */
  private val a3Cardinality = withOracle("a3_cardinality",
    """SELECT event_type AS name, count(DISTINCT user_id) AS n_series
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(col("event_type").as("name"))
      .agg(countDistinct("user_id").as("n_series"))
  }

  /** A2/X4: count of series per extracted label value — the reference's
    * documented `visitParamExtractString(labels, 'job')` analytics shape
    * (README.md:76-88), via `get_json_object` on the canonical JSON. The
    * oracle derives the same result from first principles, so the JSON
    * round-trip + extraction path is what's actually checked. */
  private val a2LabelCount = withOracle("a2_label_count",
    """SELECT user, count(*) AS n_series FROM (
      |  SELECT DISTINCT event_type, cast(user_id AS VARCHAR) AS user FROM events)
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    eventSamples(s, dir)
      .select(labels_json(col("labels")).as("labels")).distinct()
      .groupBy(get_json_object(col("labels"), "$.user").as("user"))
      .agg(count(lit(1)).as("n_series"))
  }

  /** A4: samples-per-series top-k (README.md:104-119). */
  private val a4SamplesPerSeries = withOracle("a4_samples_per_series",
    """SELECT '{"__name__":"' || event_type || '","user":"' || user_id || '"}' AS labels,
      |       count(*) AS n_samples
      |FROM events GROUP BY 1
      |ORDER BY n_samples DESC, labels LIMIT 10""".stripMargin) { (s, dir) =>
    eventSamples(s, dir)
      .groupBy(labels_json(col("labels")).as("labels"))
      .agg(count(lit(1)).as("n_samples"))
      .orderBy(col("n_samples").desc, col("labels").asc)
      .limit(10)
  }

  /** Downsampling — the reference's roadmap item it never shipped
    * (README.md:71): tumbling 1-minute buckets per series with
    * count/min/max/avg/last. Pure partial-agg-friendly groupBy: map-side
    * combine, one uniform exchange on (series, bucket) — the 100 TB shape. */
  private val ds1Downsample = withOracle("ds1_downsample",
    """WITH ranked AS (
      |  SELECT event_type, user_id,
      |         (epoch_ms(ts) // 60000) * 60000 AS bucket_ms, value,
      |         row_number() OVER (PARTITION BY event_type, user_id,
      |                                         (epoch_ms(ts) // 60000) * 60000
      |                            ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT event_type, user_id, bucket_ms,
      |       count(*) AS n,
      |       round(min(value), 2) AS min_v,
      |       round(max(value), 2) AS max_v,
      |       round(sum(cast(round(value * 100) AS BIGINT)) * 100.0 / count(*)) / 10000.0
      |         AS avg_v,
      |       round(min(CASE WHEN rn = 1 THEN value END), 2) AS last_v
      |FROM ranked
      |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(col("event_type"), col("user_id"),
        (floor(unix_millis(col("ts")) / 60000) * 60000).as("bucket_ms"))
      .agg(count(lit(1)).as("n"),
        round(min("value"), 2).as("min_v"),
        round(max("value"), 2).as("max_v"),
        (round(sum(round(col("value") * 100).cast("long")) * 100.0 / count(lit(1)))
          / 10000.0).as("avg_v"),
        // decimal-pack ordering key, not struct — keeps ds1 in
        // HashAggregate (struct min_by/max_by keys force SortAggregate)
        round(max_by(col("value"),
          graft.functions.long_pair_encode(unix_micros(col("ts")),
            col("event_id"))), 2).as("last_v"))
  }

  /** As-of join — time-series alignment (the natural extension SURVEY §2.3
    * notes the reference lacks): each purchase event picks up the most
    * recent click (≤ its timestamp) by the same user. Spark-first
    * formulation: union both sides + one window pass (single shuffle on
    * user_id, no range-join explosion) — `last(..., ignoreNulls)` over an
    * unbounded-preceding frame ordered by (ts, side) so a same-instant
    * right-side row is visible to the left row, matching ASOF `>=`. */
  private val as1AsofJoin = withOracle("as1_asof_join",
    """WITH b AS (
      |  SELECT user_id, ts, arg_max(value, event_id) AS b_value
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |a AS (SELECT * FROM events WHERE event_type = 'purchase')
      |SELECT a.event_id, a.user_id, epoch_us(a.ts) AS ts_us,
      |       round(a.value, 2) AS value,
      |       round(b.b_value, 2) AS prev_click_value,
      |       epoch_us(b.ts) AS prev_click_ts_us
      |FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    // right side deduped to one row per (user, instant) — determinism under
    // ties at any scale, mirroring the oracle's arg_max
    val b = ev.where(col("event_type") === "click")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .agg(max_by(col("value"), col("event_id")).as("b_value"))
    val a = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
    graft.ext.AsOf.joinBackward(a, b, on = Seq("user_id"), timeCol = "ts_us",
        payload = Seq("b_value"), prefix = "prev_")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        round(col("value"), 2).as("value"),
        round(col("prev_b_value"), 2).as("prev_click_value"),
        col("prev_ts_us").as("prev_click_ts_us"))
  }

  /** RH1: hinted read — the ReadHints exploitation path
    * (prompb.proto:45-50, the field the reference receives and drops,
    * prom.go:184-186). A `max_over_time` hint with a 6 h step is answered
    * from per-(series, step-bucket) aggregates via the exact production
    * helper the wire path uses (Storage.hintedDownsample): one
    * partial-agg shuffle, step/interval-fold less data on the wire. */
  private val rh1Hinted = withOracle("rh1_hinted_read",
    """SELECT '{"__name__":"' || event_type || '","user":"' || user_id || '"}' AS labels,
      |       epoch_ms(ts) - epoch_ms(ts) % 21600000 AS bucket_ms,
      |       round(max(value), 2) AS max_v
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val flat = eventSamples(s, dir).select(
      labels_fingerprint(col("labels")).as("fingerprint"),
      col("timestamp_ms"), col("value"),
      labels_json(col("labels")).as("labels"))
    graft.storage.Storage
      .hintedDownsample(flat, graft.model.ReadHints(21600000L, "max_over_time")).get
      .select(col("labels"), col("timestamp_ms").as("bucket_ms"),
        round(col("value"), 2).as("max_v"))
  }

  /** ReadHints `rate` served from rollup partials — the full write-side
    * algebra the rollup store runs across ingest batches
    * (TimeSeriesStore.scala rollupPartials/mergeRollup/deriveHint):
    * partials built per 1 h bucket in two separate "batches" (split on
    * timestamp parity — same buckets, interleaved samples), merged to the
    * hint's 6 h step, rate derived from the first/last (ts, value) pair.
    * Bucket-local rate semantics: (last−first)/Δt within the bucket, no
    * extrapolation (documented at Storage.RollupBases). The oracle
    * recomputes first/last with ranked row_numbers over (ts, value). */
  private val rh2RateRollup = withOracle("rh2_rate_rollup",
    """WITH b AS (
      |  SELECT event_type, user_id,
      |         epoch_ms(ts) - epoch_ms(ts) % 21600000 AS bucket_ms,
      |         epoch_ms(ts) AS ts_ms, value,
      |         row_number() OVER (PARTITION BY event_type, user_id, epoch_ms(ts) - epoch_ms(ts) % 21600000
      |                            ORDER BY epoch_ms(ts), value) AS rn_f,
      |         row_number() OVER (PARTITION BY event_type, user_id, epoch_ms(ts) - epoch_ms(ts) % 21600000
      |                            ORDER BY epoch_ms(ts) DESC, value DESC) AS rn_l
      |  FROM events)
      |SELECT '{"__name__":"' || event_type || '","user":"' || user_id || '"}' AS labels,
      |       bucket_ms,
      |       round((min(CASE WHEN rn_l = 1 THEN value END) - min(CASE WHEN rn_f = 1 THEN value END))
      |             / ((max(ts_ms) - min(ts_ms)) / 1000.0), 6) + 0.0 AS rate
      |FROM b GROUP BY 1, 2
      |HAVING max(ts_ms) > min(ts_ms)""".stripMargin) { (s, dir) =>
    // Shuffle on the narrow natural series keys, exactly as the production
    // rollup shuffles on the fingerprint long — the canonical labels JSON
    // is marshalled once per OUTPUT row, not carried through the exchange
    // per input row. Per-"batch" partials (split on timestamp parity) are
    // computed in ONE scan and ONE shuffle: the batch id is just an extra
    // grouping key — identical partial rows to running rollupPartials per
    // batch and unioning, without scanning events twice.
    val flat = Tables(s, dir, "events").select(
      col("event_type"), col("user_id"),
      unix_millis(col("ts")).as("timestamp_ms"), col("value"))
    val partials = graft.storage.Storage.rollupPartials(
      flat.withColumn("batch", pmod(col("timestamp_ms"), lit(2))),
      3600000L, Seq("event_type", "user_id", "batch"))
    val merged = graft.storage.Storage.mergeRollup(partials, 21600000L,
      Seq("event_type", "user_id"))
    graft.storage.Storage.deriveHint(merged, "rate", Seq("event_type", "user_id")).get
      .select(
        labels_json(map(lit("__name__"), col("event_type"),
          lit("user"), col("user_id").cast("string"))).as("labels"),
        col("timestamp_ms").as("bucket_ms"),
        // + 0.0 normalizes -0.0 (engines disagree on the sign of zero)
        (round(col("value"), 6) + 0.0).as("rate"))
  }

  /** ReadHints `last_over_time` from rollup partials at the hint's own step
    * (partials ARE the merged rows — the one-shuffle fast path
    * hintedDownsample takes); value is the bucket's last (ts, value) pair,
    * bit-exact across engines (no arithmetic, only selection). */
  private val rh3LastRollup = withOracle("rh3_last_rollup",
    """WITH b AS (
      |  SELECT event_type, user_id,
      |         epoch_ms(ts) - epoch_ms(ts) % 21600000 AS bucket_ms, value,
      |         row_number() OVER (PARTITION BY event_type, user_id, epoch_ms(ts) - epoch_ms(ts) % 21600000
      |                            ORDER BY epoch_ms(ts) DESC, value DESC) AS rn_l
      |  FROM events)
      |SELECT '{"__name__":"' || event_type || '","user":"' || user_id || '"}' AS labels,
      |       bucket_ms,
      |       round(min(CASE WHEN rn_l = 1 THEN value END), 2) AS last_v
      |FROM b GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val flat = Tables(s, dir, "events").select(
      col("event_type"), col("user_id"),
      unix_millis(col("ts")).as("timestamp_ms"), col("value"))
    val merged = graft.storage.Storage
      .rollupPartials(flat, 21600000L, Seq("event_type", "user_id"))
      .withColumnRenamed("bucket_ms", "timestamp_ms")
    graft.storage.Storage.deriveHint(merged, "last_over_time", Seq("event_type", "user_id")).get
      .select(
        labels_json(map(lit("__name__"), col("event_type"),
          lit("user"), col("user_id").cast("string"))).as("labels"),
        col("timestamp_ms").as("bucket_ms"),
        round(col("value"), 2).as("last_v"))
  }

  /** ReadHints `quantile:0.9` served from the rollup's DDSketch partials —
    * the t-digest-class capability the rollup schema gained, kept
    * deterministic (DDSketch merges are order-independent, so this output
    * is a pure function of the corpus — same property every other gate
    * query has). Rows-only at the gate (a sketch quantile is not
    * ANSI-expressible); anchored by SketchSpec's relative-error bound vs
    * exact percentile and byte-identical split-merge properties. Same
    * two-batch partial/merge shape as rh2. */
  private val rh4QuantileRollup = rowsOnly("rh4_quantile_rollup") { (s, dir) =>
    val flat = Tables(s, dir, "events").select(
      col("event_type"), col("user_id"),
      unix_millis(col("ts")).as("timestamp_ms"), col("value"))
    val partials = graft.storage.Storage.rollupPartials(
      flat.withColumn("batch", pmod(col("timestamp_ms"), lit(2))),
      3600000L, Seq("event_type", "user_id", "batch"))
    val merged = graft.storage.Storage.mergeRollup(partials, 21600000L,
      Seq("event_type", "user_id"))
    graft.storage.Storage
      .deriveHint(merged, "quantile:0.9", Seq("event_type", "user_id")).get
      .select(
        labels_json(map(lit("__name__"), col("event_type"),
          lit("user"), col("user_id").cast("string"))).as("labels"),
        col("timestamp_ms").as("bucket_ms"),
        col("value").as("p90"))
  }

  /** RH4's ORACLE-CHECKED companion (the pk4_layout_invariants pattern,
    * r10 advice item 5): the sketch VALUES have no ANSI oracle, but the
    * sketch's CONTRACT does —
    *
    *   - count conservation: the merged rollup's `cnt` sums to the raw
    *     event count (hash-checked as a real number, not a literal) and
    *     every group's cnt equals its exact group size;
    *   - accuracy: the reported p90 lies within DDSketch's declared
    *     relative error α of the TRUE rank element (the same
    *     `floor(q·(n−1))` rank the sketch procedure targets, recomputed
    *     exactly from the raw values per group);
    *   - monotonicity: p50 ≤ p90 ≤ p99 from the same sketch.
    *
    * Each property reduces to a value DuckDB derives from the events
    * table alone; SketchSpec keeps the split/merge byte-identity and
    * error-bound properties on synthetic distributions. */
  private val rh4QuantileInvariants = withOracle("rh4_quantile_invariants",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(count(DISTINCT event_type || '|' || CAST(user_id AS VARCHAR) || '|'
      |             || CAST(epoch_ms(ts) - epoch_ms(ts) % 21600000 AS VARCHAR)) AS BIGINT)
      |         AS n_groups,
      |       TRUE AS count_conserved,
      |       TRUE AS p90_within_alpha,
      |       TRUE AS quantiles_monotone
      |FROM events""".stripMargin) { (s, dir) =>
    import graft.functions.dd_quantile
    val flat = Tables(s, dir, "events").select(
      col("event_type"), col("user_id"),
      unix_millis(col("ts")).as("timestamp_ms"), col("value"))
    val partials = graft.storage.Storage.rollupPartials(
      flat.withColumn("batch", pmod(col("timestamp_ms"), lit(2))),
      3600000L, Seq("event_type", "user_id", "batch"))
    val merged = graft.storage.Storage.mergeRollup(partials, 21600000L,
      Seq("event_type", "user_id"))
      .select(col("event_type"), col("user_id"), col("timestamp_ms"), col("cnt"),
        dd_quantile(col("hist"), 0.5).as("p50"),
        dd_quantile(col("hist"), 0.9).as("p90"),
        dd_quantile(col("hist"), 0.99).as("p99"))
    // exact per-group rank element, independent of the sketch path:
    // group sizes are per-(type, user, 6h) — bounded, so the collected
    // value arrays are small even at corpus scale
    val exact = flat
      .withColumn("timestamp_ms",
        col("timestamp_ms") - pmod(col("timestamp_ms"), lit(21600000L)))
      .groupBy("event_type", "user_id", "timestamp_ms")
      .agg(sort_array(collect_list(col("value"))).as("vs"),
        count(lit(1)).as("n_exact"))
      .withColumn("v_r", element_at(col("vs"),
        (floor(lit(0.9) * (col("n_exact") - 1)) + 1).cast("int")))
    val alpha = graft.functions.DDOps.DefaultAlpha
    merged.join(exact, Seq("event_type", "user_id", "timestamp_ms"))
      .agg(
        sum(col("cnt")).cast("long").as("n_rows"),
        count(lit(1)).as("n_groups"),
        every(col("cnt") === col("n_exact")).as("count_conserved"),
        every(abs(col("p90") - col("v_r"))
          <= lit(alpha) * abs(col("v_r")) + lit(1e-9)).as("p90_within_alpha"),
        every(col("p50") <= col("p90") && col("p90") <= col("p99"))
          .as("quantiles_monotone"))
  }

  /** ReadHints `stddev_over_time` served from the rollup's sum-of-squares
    * partial (population-variance algebra E[x²]−E[x]², PromQL's
    * stddev_over_time semantics): cnt/sum_v/sum_sq all ADD across batch
    * partials, so the merge is exact — same two-batch split as rh2. The
    * oracle states the identical naive algebra (not Welford) so the only
    * cross-engine difference is summation order, ~1e-15 relative, masked
    * by round(6). */
  private val rh5StddevRollup = withOracle("rh5_stddev_rollup",
    """SELECT '{"__name__":"' || event_type || '","user":"' || user_id || '"}' AS labels,
      |       epoch_ms(ts) - epoch_ms(ts) % 21600000 AS bucket_ms,
      |       round(sqrt(greatest(
      |         sum(value * value) / count(*)
      |           - (sum(value) / count(*)) * (sum(value) / count(*)), 0)), 6) + 0.0 AS sd
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val flat = Tables(s, dir, "events").select(
      col("event_type"), col("user_id"),
      unix_millis(col("ts")).as("timestamp_ms"), col("value"))
    val partials = graft.storage.Storage.rollupPartials(
      flat.withColumn("batch", pmod(col("timestamp_ms"), lit(2))),
      3600000L, Seq("event_type", "user_id", "batch"))
    val merged = graft.storage.Storage.mergeRollup(partials, 21600000L,
      Seq("event_type", "user_id"))
    graft.storage.Storage
      .deriveHint(merged, "stddev_over_time", Seq("event_type", "user_id")).get
      .select(
        labels_json(map(lit("__name__"), col("event_type"),
          lit("user"), col("user_id").cast("string"))).as("labels"),
        col("timestamp_ms").as("bucket_ms"),
        (round(col("value"), 6) + 0.0).as("sd"))
  }

  val all: Seq[QueryDef] = Seq(
    f1Eq, f2Neq, f3Re, f4Nre, f5Conj,
    x1Fp, x2Json, a1Assembly, a1Stats, a2LabelCount, a3Cardinality,
    a3CardinalityHll, a3HllInvariants, a4SamplesPerSeries, j4TopkEnrich,
    rawSqlQ, wf1Window, wf2Rate, ds1Downsample, as1AsofJoin, rh1Hinted,
    rh2RateRollup, rh3LastRollup, rh4QuantileRollup, rh4QuantileInvariants, rh5StddevRollup)
}
