package graft.storage

import graft.functions.labels_json
import graft.model.{MatchType, Matcher}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** The raw-SQL escape hatch (reference: storages/clickhouse/rawsql.go,
  * trigger clickhouse.go:374-388): a read with exactly
  * `{job="rawsql", query="<SQL>"}` bypasses the matcher pipeline and runs
  * the SQL directly — here via `spark.sql`, which grants the full Spark SQL
  * surface behind the same API.
  *
  * Column coercion (rawsql.go:25-46,66-93): the column named `value`
  * becomes the sample value (cast to double); every other column becomes a
  * label (cast to string); each row is a single-sample series stamped at
  * the query's end time. Start time is ignored, like the reference.
  */
object RawSql {

  /** F9 trigger: Some(sql) iff the matcher set is exactly the rawsql shape. */
  def trigger(matchers: Seq[Matcher]): Option[String] =
    if (matchers.size == 2 &&
      matchers.exists(m => m.name == "job" && m.matchType == MatchType.Eq && m.value == "rawsql"))
      matchers.find(m => m.name == "query" && m.matchType == MatchType.Eq).map(_.value)
    else None

  /** Run `sql` and coerce every row into a single-sample series. The
    * engine's SQL functions (labels_fingerprint, cosine_sim, minhash,
    * simhash, word_shingles, …) are registered first, so rawsql callers get
    * the full extended surface, not just builtins. */
  def read(spark: SparkSession, sql: String, endMs: Long): DataFrame = {
    graft.functions.registerAll(spark)
    val df = spark.sql(sql)
    coerce(df, endMs)
  }

  /** X11 any-column coercion, as a standalone operator. */
  def coerce(df: DataFrame, endMs: Long): DataFrame = {
    val labelCols = df.columns.filterNot(_ == "value")
    val labelMap = map(labelCols.flatMap(c =>
      Seq(lit(c), col(c).cast(StringType))): _*)
    val valueCol =
      if (df.columns.contains("value")) col("value").cast(DoubleType)
      else lit(0.0).cast(DoubleType)
    df.select(
      graft.functions.labels_fingerprint(labelMap).as("fingerprint"),
      lit(endMs).as("timestamp_ms"),
      valueCol.as("value"),
      labels_json(labelMap).as("labels"))
  }
}
