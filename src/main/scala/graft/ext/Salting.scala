package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage salted aggregation for skewed keys (SCALE.md §4): when one
  * group key carries a disproportionate share of rows (a boilerplate-dup
  * content hash, a hot metric), the single exchange on that key bottlenecks
  * one task. Salting splits each key across `buckets` sub-keys for the
  * first (heavy, map-side-combining) aggregation, then a second (tiny)
  * aggregation over at most `buckets` rows per key merges the partials.
  *
  * AQE's skew handling only rewrites sort-merge *joins*; skewed
  * *aggregations* still need this pattern. Only decomposable aggregates
  * (sum/count/min/max) can be salted this way.
  */
object Salting {

  /** Salted count per key set. Deterministic salt: hash of the whole row's
    * key columns + a uniform bucket from xxhash64 of monotonically varying
    * spark partition/row position — we use rand-free `monotonically_increasing_id`
    * so results are reproducible. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int = 32,
      as: String = "n"): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum("__partial").as(as))
  }

  /** Salted sum of `value` per key set (same two-stage shape). */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, buckets: Int = 32,
      as: String = "sum_value"): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("__v", value)
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(sum("__v").as("__partial"))
      .groupBy(keyCols: _*)
      .agg(sum("__partial").as(as))
  }
}
