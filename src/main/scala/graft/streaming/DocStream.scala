package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus ingestion — the curation pipeline's front door when
  * documents arrive continuously instead of as snapshots (the batch
  * analogue is d9_incremental_dedup).
  */
object DocStream {

  /** Streaming dataset-card: running per-(source, lang) document and
    * token counts over the arriving corpus — rp1's streaming analogue,
    * the live ingest dashboard a crawl pipeline watches. A plain
    * streaming aggregation: state is ONE row per stratum (bounded by
    * strata cardinality, not stream volume), each micro-batch folds in
    * via the same partial-agg merge as batch rp1. No watermark — the
    * card is cumulative over the query's lifetime, and late data must
    * still be counted (same no-watermark stance as the ingest path). */
  def runningCorpusStats(stream: DataFrame): DataFrame =
    stream.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.ext.TextAnalysis.words(col("text")))).as("total_tokens"))

  /** The streaming curation front door: Gopher quality gate (the same
    * [[graft.ext.TextAnalysis.gopherPasses]] column the batch gate t5
    * runs — one definition, no batch/stream drift) THEN first-seen dedup.
    * Order matters at scale: the gate is a map-side filter ahead of the
    * stateful operator, so rejected documents never shuffle and never
    * enter the state store — state is bounded by distinct PASSING
    * content, corpus reject rates (30–70% on web crawl) cut it
    * proportionally. */
  def curatedDocs(spark: SparkSession, stream: DataFrame): Dataset[(String, Long, String)] =
    firstSeenDocs(spark, stream.where(graft.ext.TextAnalysis.gopherPasses(col("text"))))

  /** Exact streaming dedup: emits each distinct document content exactly
    * once for the lifetime of the query, keyed by content hash via
    * `flatMapGroupsWithState`. Within a batch the min doc_id of a
    * duplicate family is the deterministic keeper (same election rule as
    * d1/d9); across batches the keyed state suppresses re-emission.
    *
    * State is ONE BOOLEAN per distinct content — bounded by corpus
    * distinct-content cardinality, not stream volume, and keyed by a
    * uniform 128-bit hash so the state store shards evenly. At 100 TB
    * scale this runs on the RocksDB state store (spills past memory), and
    * the checkpoint makes the seen-set survive restarts — the streaming
    * equivalent of d9's persisted base content-hash index. */
  def firstSeenDocs(spark: SparkSession, stream: DataFrame): Dataset[(String, Long, String)] = {
    import spark.implicits._
    stream
      .select(md5(col("text").cast("binary")).as("ch"),
        col("doc_id").cast("long").as("doc_id"), col("text"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (String, Long, String)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // min doc_id, not iterator head: batch shuffle order is not
            // deterministic, keeper election must be
            Iterator.single(rows.minBy(_._2))
          }
      }
  }
}
