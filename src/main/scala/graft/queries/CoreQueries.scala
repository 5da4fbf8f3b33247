package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operator inventory (SURVEY.md §2.2-2.7) expressed over
  * the driver test tables. Each query is shaped so its physical plan is the
  * one we'd want at 100 TB: filters/projections pushed to the parquet scan,
  * dimension joins broadcast, aggregations with map-side partials, top-k as
  * TakeOrderedAndProject.
  *
  * Aggregate outputs are kept hash-stable across engines: integer-valued
  * doubles (exact), money sums rounded to cents, timestamps projected as
  * epoch milliseconds.
  */
object CoreQueries {

  import QueryDef._

  /** A2/A4-shape grouped aggregation with map-side combine (reference:
    * README.md:76-119). */
  private val q1Agg = withOracle("q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       sum(l_quantity) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  /** O5 top-k: ORDER BY … DESC LIMIT k plans as TakeOrderedAndProject —
    * no global sort (reference: README.md:104-119). Tie-broken on the key
    * so the row set is deterministic. */
  private val q2TopK = withOracle("q2_topk",
    """SELECT user_id, count(*) AS n_events
      |FROM events
      |GROUP BY user_id
      |ORDER BY n_events DESC, user_id ASC
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
      .orderBy(desc("n_events"), asc("user_id"))
      .limit(10)
  }

  /** J1/J3 star join: fact joined to three dimension tables. nation/region
    * are BOUNDED (25/5 rows) — forced broadcast is always right; customer
    * grows with SF, so no hint: AQE broadcasts it while small and falls
    * back to a shuffle join at the scale where broadcasting would OOM. */
  private val q3Join = withOracle("q3_join",
    """SELECT r.r_name, n.n_name,
      |       count(*) AS n_orders,
      |       round(sum(o.o_totalprice), 2) AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
  }

  /** J2/F7 fingerprint-set pruning: a selective key set semi-joins the fact
    * table — the Spark analogue of the reference's IN-list / temp-table
    * switch (clickhouse.go:282-370). Left-semi with no forced hint: the key
    * set grows with SF, so AQE picks broadcast (no fact shuffle) while it
    * fits and degrades to a shuffle join instead of an OOM when it won't. */
  private val q4SemiJoin = withOracle("q4_semijoin",
    """SELECT l_suppkey, count(*) AS n_items, sum(l_quantity) AS sum_qty
      |FROM lineitem
      |WHERE l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 9000.0)
      |GROUP BY l_suppkey""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem")
    val keys = Tables(s, dir, "supplier")
      .where(col("s_acctbal") > 9000.0)
      .select(col("s_suppkey").as("l_suppkey"))
    li.join(keys, Seq("l_suppkey"), "left_semi")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
  }

  /** S6/F6/O1 time-range scan: closed-interval timestamp predicate + column
    * pruning; both reach the parquet reader (PushedFilters). Timestamps are
    * projected as epoch millis for engine-portable comparison. */
  private val q5RangeScan = withOracle("q5_range_scan",
    """SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, round(value, 2) AS value
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
      |  AND ts <= TIMESTAMP '2024-01-05 00:00:00'
      |  AND event_type <> 'error'""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
        && col("ts") <= lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00"))
        && col("event_type") =!= "error")
      .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
        col("event_type"), round(col("value"), 2).as("value"))
  }

  /** A5 distinct (series-index refresh shape, clickhouse.go:159). */
  private val q6Distinct = withOracle("q6_distinct",
    "SELECT DISTINCT user_id, event_type FROM events") { (s, dir) =>
    Tables(s, dir, "events").select("user_id", "event_type").distinct()
  }

  /** W2 daily bucketing: the storage partitioning function
    * (toDate(timestamp_ms/1000), clickhouse.go:100). */
  private val q7DateBucket = withOracle("q7_date_bucket",
    """SELECT strftime(cast(ts AS DATE), '%Y-%m-%d') AS day, count(*) AS n,
      |       round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
  }

  /** W1 tumbling time windows (promload chunked iteration, main.go:141-147)
    * as a proper windowed aggregation — the scalable form of the
    * reference's loop-of-range-queries. */
  private val q8Window = withOracle("q8_window",
    // Cross-engine-stable average: (1) sum exact integer cents (double sums
    // are associativity-dependent; Spark's partial-agg order vs DuckDB's
    // flipped round() boundaries at sf0.1); (2) round to an INTEGER of
    // 1e-4 units — decimal-scale round() disagrees between engines on
    // exact binary boundaries (Spark rounds the shortest decimal string,
    // DuckDB the binary value; cents/24 yields exact .00125 eighths), while
    // integer rounding of the same double is identical everywhere; (3) one
    // final exact division for display.
    """SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS window_start_ms,
      |       event_type, count(*) AS n,
      |       round(sum(cast(round(value * 100) AS BIGINT)) * 100.0 / count(*)) / 10000.0
      |         AS avg_value
      |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (round(sum(round(col("value") * 100).cast("long")) * 100.0 / count(lit(1)))
          / 10000.0).as("avg_value"))
      .select(unix_millis(col("w.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("avg_value"))
  }

  /** Exact discrete percentiles per group — the sort-based aggregation
    * shape (no interpolation: percentile_disc picks an actual data value,
    * so cross-engine parity is exact; the approximate scale path for heavy
    * cardinalities would be approx_percentile, analogous to a3's HLL
    * variant). */
  private val q9Percentile = withOracle("q9_percentile",
    """SELECT event_type,
      |       round(quantile_disc(value, 0.5), 2) AS p50,
      |       round(quantile_disc(value, 0.95), 2) AS p95
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(
        round(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)"), 2).as("p50"),
        round(expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)"), 2).as("p95"))
  }

  /** q9 at scale: t-digest-style approximate percentiles — one pass,
    * mergeable fixed-size sketch per group instead of q9's per-group sort
    * (the same exact↔sketch pairing as a3_cardinality / a3_cardinality_hll).
    * Approximate by design → rows-only; accuracy vs q9 asserted in
    * QueriesSpec. */
  private val q9PercentileApprox = rowsOnly("q9_percentile_approx") { (s, dir) =>
    Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(
        round(approx_percentile(col("value"), lit(0.5), lit(1000)), 2).as("p50"),
        round(approx_percentile(col("value"), lit(0.95), lit(1000)), 2).as("p95"))
  }

  /** q9_approx's ORACLE-CHECKED companion (the rh4_quantile_invariants
    * pattern): the sketch VALUES are approximate by design, but the
    * sketch's published CONTRACT is checkable exactly —
    *   - rank accuracy: each reported percentile is an element whose rank
    *     interval [#(< v)+1, #(≤ v)] intersects the target rank ±
    *     n/accuracy (Spark's approx_percentile guarantee, re-derived from
    *     the raw values per group — groups are the bounded event_type
    *     set, so the second pass is one broadcast join + partial aggs);
    *   - the reported value is an actual data value of its group (the
    *     summary returns sampled inputs, never an interpolation);
    *   - monotonicity: p50 ≤ p95 from the same sketch.
    * Reduced to values DuckDB derives from the events table alone. */
  private val q9ApproxInvariants = withOracle("q9_approx_invariants",
    """SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_groups,
      |       TRUE AS p50_rank_within_error,
      |       TRUE AS p95_rank_within_error,
      |       TRUE AS values_are_data_values,
      |       TRUE AS quantiles_monotone
      |FROM events""".stripMargin) { (s, dir) =>
    val ev = Tables(s, dir, "events").select("event_type", "value")
    val apx = ev.groupBy("event_type").agg(
      approx_percentile(col("value"), lit(0.5), lit(1000)).as("a50"),
      approx_percentile(col("value"), lit(0.95), lit(1000)).as("a95"),
      count(lit(1)).cast("double").as("n"))
    val eps = 1.0 / 1000 // relative rank error = 1/accuracy
    def rankOk(q: Double, lt: org.apache.spark.sql.Column,
        le: org.apache.spark.sql.Column,
        n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (lt + 1 <= (lit(q) + eps) * n + 1) && (le >= (lit(q) - eps) * n - 1)
    ev.join(broadcast(apx), "event_type")
      .groupBy("event_type")
      .agg(first("n").as("n"), first("a50").as("a50"), first("a95").as("a95"),
        sum((col("value") < col("a50")).cast("long")).as("lt50"),
        sum((col("value") <= col("a50")).cast("long")).as("le50"),
        sum((col("value") < col("a95")).cast("long")).as("lt95"),
        sum((col("value") <= col("a95")).cast("long")).as("le95"),
        max((col("value") === col("a50")).cast("int")).as("hit50"),
        max((col("value") === col("a95")).cast("int")).as("hit95"))
      .agg(count(lit(1)).as("n_groups"),
        every(rankOk(0.5, col("lt50"), col("le50"), col("n")))
          .as("p50_rank_within_error"),
        every(rankOk(0.95, col("lt95"), col("le95"), col("n")))
          .as("p95_rank_within_error"),
        every(col("hit50") === 1 && col("hit95") === 1)
          .as("values_are_data_values"),
        every(col("a50") <= col("a95")).as("quantiles_monotone"))
  }

  /** RJ1: point-in-interval RANGE JOIN — the join family's missing
    * genus beside equi (q3), semi (q4), and as-of (as1): for every
    * order date, how many lineitems were in transit (ship ≤ d ≤
    * receipt; receipt derived deterministically as ship + 1..14 days
    * so both engines build the same intervals). The naive form is a
    * theta join (|dates| × |lineitem| comparisons — a cross product no
    * optimizer saves at 100 TB). The scale form used here BUCKETIZES
    * THE BOUNDED DIMENSION: each interval explodes into its covered
    * day buckets (fan-out ≤ the 15-day transit bound, never
    * data-dependent-unbounded), bucket-keyed partial counts collapse
    * map-side, and the probe side equi-joins on its day — at day
    * granularity the bucket IS the containment predicate, so no
    * residual filter remains (a finer-grained probe keeps the original
    * range predicate as a residual after the bucket equi-join, same
    * plan shape). One uniform exchange on the day key; AQE broadcasts
    * the ~2.4k distinct order dates. */
  private val rj1RangeJoin = withOracle("rj1_range_join",
    """WITH li AS (
      |  SELECT CAST(l_shipdate AS DATE) AS ship,
      |         CAST(l_shipdate AS DATE)
      |           + CAST((l_orderkey*7 + l_linenumber) % 14 + 1 AS INT) AS receipt
      |  FROM lineitem),
      |d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS od FROM orders)
      |SELECT strftime(d.od, '%Y-%m-%d') AS order_date,
      |       CAST(count(li.ship) AS BIGINT) AS n_in_transit
      |FROM d LEFT JOIN li ON li.ship <= d.od AND d.od <= li.receipt
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val li = Tables(s, dir, "lineitem").select(
      to_date(col("l_shipdate")).as("ship"),
      ((col("l_orderkey") * 7 + col("l_linenumber")) % 14 + 1).cast("int").as("days"))
    val perDay = li
      .select(explode(sequence(col("ship"), date_add(col("ship"), col("days"))))
        .as("od"))
      .groupBy("od").agg(count(lit(1)).as("n_in_transit"))
    Tables(s, dir, "orders")
      .select(to_date(col("o_orderdate")).as("od")).distinct()
      .join(perDay, Seq("od"), "left")
      // string day on both engines — the q7 dtype discipline (DuckDB
      // DATE arrives as pandas Timestamp, Spark DATE as date)
      .select(date_format(col("od"), "yyyy-MM-dd").as("order_date"),
        coalesce(col("n_in_transit"), lit(0L)).as("n_in_transit"))
  }

  val all: Seq[QueryDef] = Seq(
    q1Agg, q2TopK, q3Join, q4SemiJoin, q5RangeScan, q6Distinct, q7DateBucket, q8Window,
    q9Percentile, q9PercentileApprox, q9ApproxInvariants, rj1RangeJoin)
}
