package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics for performance/scale work: storage efficiency
  * (bytes/sample vs the reference's 5.3 B/sample, README.md:63-65) and
  * pushdown evidence on the hot scan paths. */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // --- storage efficiency: Prometheus-shaped corpus, 2M samples ---
    // 200 series x 10k samples, 15s scrape interval, counter-like values
    def dirSize(p: java.io.File): Long =
      if (p.isFile) p.length else Option(p.listFiles).map(_.map(dirSize).sum).getOrElse(0L)
    val batch = spark.range(2_000_000).select(
      map(lit("__name__"), lit("http_requests_total"),
        lit("instance"), concat(lit("host-"), (col("id") % 200).cast("string"))).as("labels"),
      (lit(1700000000000L) + (col("id") / 200).cast("long") * 15000L).as("timestamp_ms"),
      (col("id") / 200 + (col("id") % 7)).cast("double").as("value"))
    // the store always writes zstd (its own writer option); the knob under
    // test here is the parquet page version — v2 pages get
    // DELTA_BINARY_PACKED for ints, and regular timestamps + sorted
    // fingerprints should delta-encode well on top of the sort
    var root = ""
    for (pv <- Seq("PARQUET_1_0", "PARQUET_2_0")) {
      spark.sparkContext.hadoopConfiguration.set("parquet.writer.version", pv)
      root = java.nio.file.Files.createTempDirectory(s"graft_eff_${pv}_").toString
      val store = new graft.storage.ParquetStore(spark, root)
      val t0 = System.nanoTime()
      store.write(batch)
      val wallSec = (System.nanoTime() - t0) / 1e9
      val bytes = dirSize(new java.io.File(s"$root/samples"))
      println(f"[zstd/$pv] ingest: 2,000,000 samples in $wallSec%.1f s (${2e6 / wallSec}%.0f samples/s); " +
        f"$bytes bytes -> ${bytes / 2e6}%.2f bytes/sample (reference: 5.3)")
    }
    spark.sparkContext.hadoopConfiguration.set("parquet.writer.version", "PARQUET_1_0")
    spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
    val store = new graft.storage.ParquetStore(spark, root)

    // --- pushdown evidence on the samples read path ---
    val q = graft.model.Query(1700000000000L, 1700000900000L,
      Seq(graft.model.Matcher("instance", graft.model.MatchType.Eq, "host-7")))
    val df = store.read(q)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println("read-path scan pushdown:")
    plan.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("PartitionFilters")
      || l.contains("Scan parquet") || l.contains("ReadSchema"))
      .foreach(l => println("  " + l.trim.take(200)))

    // --- rollup economics: write overhead vs hinted-read speedup ---
    val rollupRoot = java.nio.file.Files.createTempDirectory("graft_rollup_diag_").toString
    val rollupStore = new graft.storage.ParquetStore(spark, rollupRoot, rollupStepMs = 60000L)
    val tr = System.nanoTime()
    rollupStore.write(batch)
    val rollupWallSec = (System.nanoTime() - tr) / 1e9
    println(f"[rollup] ingest with 1m rollup: ${2e6 / rollupWallSec}%.0f samples/s " +
      f"(rollup table ${dirSize(new java.io.File(s"$rollupRoot/samples_rollup"))} bytes)")
    val hq = graft.model.Query(1700000000000L, 1700030000000L,
      Seq(graft.model.Matcher("instance", graft.model.MatchType.Eq, "host-7")),
      Some(graft.model.ReadHints(stepMs = 300000L, func = "avg_over_time")))
    def time(f: => Unit): Double = { val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e9 }
    val plainStore = new graft.storage.ParquetStore(spark, rollupRoot) // raw-path hint serving
    val tRollup = time(rollupStore.readSeries(hq).collect())
    val tRaw = time(plainStore.readSeries(hq).collect())
    println(f"[rollup] hinted read (avg/5m over 8h): rollup-served $tRollup%.2f s vs raw-aggregated $tRaw%.2f s")
    spark.stop()
  }
}
