package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in graft.queries.*; this object is the flat
  * map the driver consumes. */
object SparkEntry {

  /** Every implemented operator, in registration order. */
  def defs: Seq[QueryDef] =
    CoreQueries.all ++ PromQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ MultimodalQueries.all ++
      SamplingQueries.all ++ CurationQueries.all ++ EventQueries.all ++
      RetrievalQueries.all ++ GraphQueries.all ++ HybridQueries.all ++
      PrfQueries.all ++ DiversityQueries.all ++ NegativeQueries.all ++
      OverlapQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    defs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
