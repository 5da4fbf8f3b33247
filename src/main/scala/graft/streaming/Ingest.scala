package graft.streaming

import graft.storage.Storage
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming ingest — the remote-write path (S1) re-expressed:
  * a stream of (labels, timestamp_ms, value) batches lands in the
  * two-table store via `foreachBatch` (reference semantics, SURVEY.md §2.9):
  *
  *  - no watermark: late/out-of-order data is accepted unconditionally
  *    (the reference has no event-time ordering requirement — storage
  *    sorts at read);
  *  - series-level dedup per batch + anti-join against the stored
  *    dictionary (new-fingerprint detection, clickhouse.go:437-447);
  *    sample-level duplicates are kept, matching the reference;
  *  - at-least-once friendly: samples are plain appends; replays only
  *    create duplicate samples, which the reference tolerates too.
  */
object Ingest {

  /** Start ingesting a streaming DataFrame with columns
    * (labels map<string,string>, timestamp_ms long, value double). */
  def start(stream: DataFrame, store: Storage,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.write(batch)
      }
      .start()

  /** Replay-safe ingest for at-least-once upstreams: duplicate
    * (fingerprint, timestamp_ms) samples from redelivered batches are
    * dropped via a partition-pruned existence check
    * (ParquetStore.writeIdempotent) instead of being appended like the
    * reference does. */
  def startIdempotent(stream: DataFrame, store: graft.storage.ParquetStore,
      trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.writeIdempotent(batch)
      }
      .start()

  /** A7: running samples-written total (reference tallies written samples
    * per request, handlers/prom.go:303-307) — read from streaming progress,
    * no extra job per batch. */
  def samplesWritten(query: StreamingQuery): Long =
    query.recentProgress.map(_.numInputRows).sum
}
