package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** The shard sinks' commit protocol ([[DocShards]], [[Warc]]), factored so
  * every export format shares ONE atomicity story:
  *
  *   - executors write through the Hadoop `FileSystem` API (HDFS/S3A/local
  *     alike — no shared-POSIX assumption) to an attempt-unique temp path
  *     `_temporary/<name>.attempt-<id>`, so a speculative twin never
  *     interleaves bytes with a running attempt;
  *   - a finished attempt renames onto the final name (atomic on HDFS) —
  *     a killed task leaves only invisible temp garbage, never a truncated
  *     visible shard; deterministic shard names + deterministic bytes make
  *     retries idempotent (whichever attempt wins, the shard is the same);
  *   - the DRIVER clears `_temporary` and stamps `_SUCCESS` only after the
  *     job completes — consumers check the marker, the parquet convention.
  */
object ShardIO {

  /** Executor-side: write one shard via `body`, then commit it atomically
    * under `dir/name`. Call from inside `foreachPartition`. */
  def writeShard(dir: String, name: String, serConf: SerializableConfiguration)
      (body: java.io.OutputStream => Unit): Unit = {
    val tc = org.apache.spark.TaskContext.get()
    val base = new Path(dir)
    val fs = base.getFileSystem(serConf.value)
    val finalPath = new Path(base, name)
    val attempt = if (tc != null) tc.taskAttemptId() else 0L
    val tmpPath = new Path(base, s"_temporary/$name.attempt-$attempt")
    // mkdirs here, not on the driver: on a cluster the driver's mkdir
    // proves nothing about the FS the executor resolves
    fs.mkdirs(tmpPath.getParent)
    val out = new java.io.BufferedOutputStream(fs.create(tmpPath, true))
    var renamed = false
    try {
      body(out)
      out.close()
      // commit: atomic rename onto the final name. A retry's target may
      // exist from a prior attempt — and because every attempt writes
      // identical bytes (deterministic partition + sort), an existing
      // dest IS a completed commit: treat rename-failure-because-exists
      // as success and discard our temp. NEVER delete-then-rename — a
      // crash (or a killed speculative twin) between the delete and the
      // re-rename would leave no visible shard, possibly under an
      // already-stamped _SUCCESS.
      if (!fs.rename(tmpPath, finalPath)) {
        if (fs.exists(finalPath)) fs.delete(tmpPath, false)
        else throw new java.io.IOException(s"commit failed: $tmpPath -> $finalPath")
      }
      renamed = true
    } finally {
      if (!renamed) { // killed/failed attempt: leave no temp garbage
        try out.close() catch { case _: Throwable => () }
        try fs.delete(tmpPath, false) catch { case _: Throwable => () }
      }
    }
  }

  /** Driver-side, before the job: clear the stale success marker AND any
    * prior export's shards, so a re-export into the same dir (Curate is a
    * re-runnable CLI) can never commit a mix — a second run with fewer or
    * renamed shards would otherwise leave the old `part-*` files in place
    * and stamp a fresh `_SUCCESS` over old+new data. Delete order matters:
    * the marker goes FIRST, so a crash mid-cleanup leaves an uncommitted
    * dir, never a committed partial one. */
  def beginJob(spark: SparkSession, dir: String): SerializableConfiguration = {
    val serConf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(dir)
    val fs = root.getFileSystem(serConf.value)
    fs.delete(new Path(root, "_SUCCESS"), false)
    if (fs.exists(root)) {
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("part-") || n.startsWith("warc-") ||
            n.startsWith("shard-") || n == "_temporary")
          fs.delete(st.getPath, true)
      }
    }
    serConf
  }

  /** Driver-side, after the job ran to the end: clear temp garbage and
    * stamp the completion marker. */
  def commitJob(spark: SparkSession, dir: String): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root, "_temporary"), true)
    fs.create(new Path(root, "_SUCCESS"), true).close()
  }

  /** True iff `dir` holds a COMPLETE export (its write ran to the end). */
  def committed(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** True iff `dir` holds at least one shard with `prefix` — the
    * zero-row-export guard every read side needs: a committed empty
    * export has `_SUCCESS` but no shards (writes skip empty partitions),
    * and `binaryFile` over a glob matching nothing throws rather than
    * returning an empty frame. */
  def hasShards(spark: SparkSession, dir: String, prefix: String): Boolean = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(root) && fs.listStatus(root).exists(_.getPath.getName.startsWith(prefix))
  }

  /** Zero-shard read triage: `true` ONLY for a committed empty export
    * (`_SUCCESS` present, no shards — writes skip empty partitions).
    * A zero-shard dir WITHOUT the marker is a typo'd path or a torn/
    * uncommitted export — reading it as an empty corpus would silently
    * drop data downstream, so fail loudly instead (the documented
    * fail-loudly contract for torn shards). */
  def committedEmpty(spark: SparkSession, dir: String, prefix: String): Boolean =
    if (hasShards(spark, dir, prefix)) false
    else if (committed(spark, dir)) true
    else throw new IllegalStateException(
      s"shard read of '$dir': no '$prefix*' shards and no _SUCCESS marker — " +
        "either the path is wrong or the export was torn/never committed; " +
        "refusing to read it as an empty corpus")

  /** An empty frame with the given schema (the zero-shard read result). */
  def emptyFrame(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
}
