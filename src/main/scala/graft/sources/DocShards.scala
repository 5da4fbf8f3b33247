package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export — the materialization step after curation:
  * `cur2`/`sh1` decide the training ORDER, this sink ships it as numbered
  * shard files a dataloader consumes sequentially. The promload file
  * pattern (PromFile) applied to documents:
  *
  *  - record = `[uint32 BE length][int64 BE doc_id][UTF-8 text]` —
  *    self-framing, splittable at record boundaries, no schema sidecar;
  *  - shards are RANGE-partitioned by the order column and sorted within,
  *    so shard k holds a contiguous slice of the training order and
  *    `(shard, record#)` reconstructs it exactly — the property a
  *    resumable dataloader needs (skip k shards + n records = position);
  *  - shard files are named by partition id (deterministic, unlike a
  *    uuid-per-task), so a task retry commits the same shard name with
  *    identical bytes — idempotent by construction;
  *  - IO is the Hadoop `FileSystem` API end-to-end, so the sink targets
  *    HDFS/S3A/local alike (executors on a real cluster have no shared
  *    POSIX mount — `java.io` streams would scatter shards across local
  *    disks). Commit protocol: each attempt writes
  *    `_temporary/shard-N.bin.attempt-<id>` (attempt-unique, so a
  *    speculative twin never interleaves bytes with a running attempt)
  *    then renames onto the final name — rename is atomic on HDFS, so a
  *    killed task leaves only invisible temp garbage, never a truncated
  *    `shard-*.bin`; the driver stamps `_SUCCESS` after the job and
  *    clears `_temporary`, so job completion is one marker check away
  *    (the parquet convention);
  *  - read side mirrors PromFile: `binaryFile` source, one task per
  *    shard — the natural parallelism unit at scale.
  */
object DocShards {

  def encodeRecord(docId: Long, text: String): Array[Byte] = {
    val utf8 = text.getBytes("UTF-8")
    val len = 8 + utf8.length
    val out = new Array[Byte](4 + len)
    out(0) = (len >>> 24).toByte
    out(1) = (len >>> 16).toByte
    out(2) = (len >>> 8).toByte
    out(3) = len.toByte
    var i = 0
    while (i < 8) { out(4 + i) = (docId >>> (56 - 8 * i)).toByte; i += 1 }
    System.arraycopy(utf8, 0, out, 12, utf8.length)
    out
  }

  def decodeAll(bytes: Array[Byte]): Iterator[(Long, String)] =
    new Iterator[(Long, String)] {
      private var pos = 0
      override def hasNext: Boolean = pos + 4 <= bytes.length
      override def next(): (Long, String) = {
        val len = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
          ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
        pos += 4
        var id = 0L
        var i = 0
        while (i < 8) { id = (id << 8) | (bytes(pos + i) & 0xff); i += 1 }
        val text = new String(bytes, pos + 8, len - 8, "UTF-8")
        pos += len
        (id, text)
      }
    }

  /** Write `docs` as `shards` numbered files under `dir`, in the order of
    * `posCol` (e.g. `Shuffle.deterministicOrder`'s `pos`, or cur2's packed
    * offset). Requires (doc_id, text, posCol) columns. On return with no
    * exception, `dir/_SUCCESS` exists and every visible `shard-*.bin` is
    * complete; on failure, no `_SUCCESS` — a consumer checks the marker,
    * exactly as with a parquet directory. */
  def write(docs: DataFrame, posCol: String, dir: String, shards: Int): Unit = {
    val spark = docs.sparkSession
    val serConf = ShardIO.beginJob(spark, dir)
    docs.select(col("doc_id"), col("text"), col(posCol).as("__pos"))
      .repartitionByRange(shards, col("__pos"))
      .sortWithinPartitions("__pos")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.get().partitionId()
          ShardIO.writeShard(dir, f"shard-$pid%05d.bin", serConf) { out =>
            it.foreach(r => out.write(encodeRecord(r.getLong(0), r.getString(1))))
          }
        }
      }
    ShardIO.commitJob(spark, dir)
  }

  /** True iff `dir` holds a COMPLETE export ([[write]] ran to the end). */
  def committed(spark: SparkSession, dir: String): Boolean =
    ShardIO.committed(spark, dir)

  /** Read a shard directory back: (shard, rec_no, doc_id, text); global
    * training order = ORDER BY (shard, rec_no). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    if (ShardIO.committedEmpty(spark, dir, "shard-")) // committed zero-row export
      return ShardIO.emptyFrame(spark, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("rec_no", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    spark.read.format("binaryFile").load(s"$dir/shard-*.bin")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = path.split("shard-").last.stripSuffix(".bin").toInt
        decodeAll(bytes).zipWithIndex.map { case ((id, text), i) =>
          (shard, i.toLong, id, text)
        }
      }
      .toDF("shard", "rec_no", "doc_id", "text")
  }
}
