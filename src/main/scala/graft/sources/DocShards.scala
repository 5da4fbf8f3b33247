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
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(dir)
    val driverFs = root.getFileSystem(serConf.value)
    // clear a stale marker so a re-export is never half-old-half-new with
    // a _SUCCESS claiming otherwise
    driverFs.delete(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), false)
    docs.select(col("doc_id"), col("text"), col(posCol).as("__pos"))
      .repartitionByRange(shards, col("__pos"))
      .sortWithinPartitions("__pos")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val base = new org.apache.hadoop.fs.Path(dir)
          val fs = base.getFileSystem(serConf.value)
          val finalPath = new org.apache.hadoop.fs.Path(base, f"shard-$pid%05d.bin")
          val tmpPath = new org.apache.hadoop.fs.Path(base,
            f"_temporary/shard-$pid%05d.bin.attempt-${tc.taskAttemptId()}")
          // mkdirs here, not on the driver: on a cluster the driver's
          // mkdir proves nothing about the FS the executor resolves
          fs.mkdirs(tmpPath.getParent)
          val out = new java.io.BufferedOutputStream(fs.create(tmpPath, true))
          var renamed = false
          try {
            it.foreach(r => out.write(encodeRecord(r.getLong(0), r.getString(1))))
            out.close()
            // commit: atomic rename onto the final name. A retry's target
            // may exist from a prior attempt — delete-then-rename is safe
            // because every attempt writes identical bytes (deterministic
            // range partition + sort), so whichever attempt wins, the
            // visible shard is the same; one retry covers the
            // delete/rename interleave of a speculative twin.
            if (!fs.rename(tmpPath, finalPath)) {
              fs.delete(finalPath, false)
              if (!fs.rename(tmpPath, finalPath))
                throw new java.io.IOException(s"commit failed: $tmpPath -> $finalPath")
            }
            renamed = true
          } finally {
            if (!renamed) { // killed/failed attempt: leave no temp garbage
              try out.close() catch { case _: Throwable => () }
              try fs.delete(tmpPath, false) catch { case _: Throwable => () }
            }
          }
        }
      }
    driverFs.delete(new org.apache.hadoop.fs.Path(root, "_temporary"), true)
    val success = driverFs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true)
    success.close()
  }

  /** True iff `dir` holds a COMPLETE export ([[write]] ran to the end). */
  def committed(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Read a shard directory back: (shard, rec_no, doc_id, text); global
    * training order = ORDER BY (shard, rec_no). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
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
