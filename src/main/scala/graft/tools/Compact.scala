package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Store compaction — the engine's stand-in for ClickHouse's background
  * merges (the reference leans on MergeTree merging + ReplacingMergeTree
  * dedup; a lake store must do it explicitly, SCALE.md §7):
  *
  *  - `samples/`: rewrite each day partition re-sorted by (fingerprint,
  *    timestamp_ms) — many per-batch appended files become one sorted file
  *    per day per shuffle task, restoring tight row-group fingerprint
  *    stats after unordered appends. Embarrassingly parallel by day.
  *  - `time_series/`: collapse duplicate fingerprints (cross-writer races
  *    are tolerated at write time; compaction makes read-side
  *    `dropDuplicates` a no-op).
  *
  * Usage: runMain graft.tools.Compact <storeRoot>
  *
  * Live `ParquetStore` instances serving the same root should
  * `invalidateIndex()` after a compaction (or just wait out their index
  * TTL) so their cached dictionary snapshot re-reads the rewritten files.
  */
object Compact {

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(sys.error("usage: Compact <storeRoot>"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, root)
    spark.stop()
  }

  def run(spark: SparkSession, root: String): Unit = {
    val stage = s"$root/.compact_stage"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())

    // samples: day-partitioned re-sort (bucket-partitioned too when the
    // store uses the fingerprint-bucketed layout). Stage-then-swap so a
    // crash mid-job leaves the live tree untouched.
    val samples = spark.read.parquet(s"$root/samples")
    val sampleParts =
      if (samples.columns.contains("bucket")) Seq("date", "bucket") else Seq("date")
    samples
      .repartition(sampleParts.map(col): _*)
      .sortWithinPartitions("fingerprint", "timestamp_ms")
      .write.mode(SaveMode.Overwrite).partitionBy(sampleParts: _*)
      .option("compression", "zstd").parquet(s"$stage/samples")

    // series dictionary: one row per fingerprint, earliest sighting date
    // (matches ReplacingMergeTree keeping a single row per key)
    val series = spark.read.parquet(s"$root/time_series")
    series
      .groupBy("fingerprint")
      .agg(min("date").as("date"), first("labels").as("labels"))
      .select("date", "fingerprint", "labels")
      .coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(s"$stage/time_series")

    // rollup (when the store maintains one): merge per-batch partial rows
    // to one row per (fingerprint, bucket) — read-side re-merge becomes a
    // no-op, same algebraic combine the read path uses
    val rollupLive = new org.apache.hadoop.fs.Path(s"$root/samples_rollup")
    val hasRollup = fs.exists(rollupLive)
    if (hasRollup) {
      // same algebraic combine the read path uses (Storage.mergeRollup at
      // the rollup's own granularity = pure partial-row merge, no re-bucket)
      val rollup = spark.read.parquet(s"$root/samples_rollup")
      graft.storage.Storage.mergeRollup(rollup, stepMs = 1L)
        .withColumnRenamed("timestamp_ms", "bucket_ms")
        .withColumn("date", to_date(timestamp_millis(col("bucket_ms"))))
        .select(rollup.columns.filter(_ != "date").map(col) :+ col("date"): _*)
        .repartition(col("date"))
        .sortWithinPartitions("fingerprint", "bucket_ms")
        .write.mode(SaveMode.Overwrite).partitionBy("date")
        .option("compression", "zstd").parquet(s"$stage/samples_rollup")
    }

    def swap(name: String): Unit = {
      val live = new org.apache.hadoop.fs.Path(s"$root/$name")
      val old = new org.apache.hadoop.fs.Path(s"$root/.old_$name")
      val staged = new org.apache.hadoop.fs.Path(s"$stage/$name")
      if (fs.exists(old)) fs.delete(old, true)
      fs.rename(live, old)
      fs.rename(staged, live)
      fs.delete(old, true)
    }
    swap("samples")
    swap("time_series")
    if (hasRollup) swap("samples_rollup")
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
  }
}
