package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL over the same
  * parquet tables. Column names MUST match between the two — the driver
  * sorts columns by name before hashing. */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def withOracle(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}

/** Parquet table access for the driver-provided test data.
  *
  * Analyzed frames are memoized per (session, dir, table) with a TTL:
  * `spark.read.parquet` lists the directory and reads footers for schema
  * inference on EVERY call, and a gate/bench run touches the same handful
  * of tables from ~50 queries — the memo pays that fixed cost once per
  * table instead of once per query (the DataFrame itself is an immutable
  * logical plan, safe to share). A rewritten dir is picked up within one
  * TTL or immediately via [[invalidate]] (the file listing is captured at
  * read time, so a stale frame can point at deleted files). */
object Tables {
  val TtlMs = 300000L

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), (DataFrame, Long)]()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val key = (spark, dir, name)
    val hit = cache.get(key)
    if (hit != null && System.currentTimeMillis() - hit._2 < TtlMs) hit._1
    else {
      cache.entrySet().removeIf(e => e.getKey._1.sparkContext.isStopped)
      val df = if (name == "events") events(spark, dir)
        else spark.read.parquet(s"$dir/$name.parquet")
      cache.put(key, (df, System.currentTimeMillis()))
      df
    }
  }

  /** Drop memoized frames for `dir` (all sessions/tables) — call after
    * rewriting a table dir out-of-band, like ParquetStore.invalidateIndex. */
  def invalidate(dir: String): Unit =
    cache.keySet().removeIf(_._2 == dir)

  /** events.ts has shipped as either parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects, needing the nanos-as-long legacy
    * conf plus an explicit ns→µs conversion — or as plain TIMESTAMP(MICROS)
    * (isAdjustedToUTC=false → TIMESTAMP_NTZ). Sniff the footer schema and
    * normalize both to a session-UTC TimestampType column, so every
    * downstream query sees one shape. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // time predicates on a converted nanos column can't push down by
    // themselves; this rule derives pushable raw-int64 bounds
    // (see plans/Rules.scala). A native timestamp column pushes down as-is.
    graft.plans.Rules.install(spark)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long: integer division — ns values exceed 2^53, double
        // division loses bits
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _: TimestampNTZType =>
        // wall-clock micros; session tz is UTC everywhere, so this cast is
        // the identity mapping DuckDB applies reading the same file
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
}
