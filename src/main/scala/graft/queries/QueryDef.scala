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

/** Parquet table access for the driver-provided test data. */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read nanos as long (legacy conf) and convert to a microsecond
    * TimestampType column — lossless here (all values are µs-aligned) and
    * identical to DuckDB's TIMESTAMP_NS handling. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // time predicates on the converted column can't push down by themselves;
    // this rule derives pushable raw-int64 bounds (see plans/Rules.scala)
    graft.plans.Rules.install(spark)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions._
    // integer division — ns values exceed 2^53, double division loses bits
    raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
}
