package graft.tools

import graft.model.{MatchType, Matcher, Query}
import graft.sources.PromFile
import graft.storage.ParquetStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** promload-equivalent bulk copy tool (reference: cmd/promload/main.go):
  * copies time series between a promload file directory and a store,
  * reading `[start, end)` in tumbling `step` chunks (W1) with progress
  * reporting — the chunking bounds per-job memory exactly like the
  * reference's 1-minute request slices bound response sizes.
  *
  * Usage:
  *   runMain graft.tools.Promload file2store <srcDir> <storeRoot>
  *   runMain graft.tools.Promload store2file <storeRoot> <dstDir> <startMs> <endMs> [stepMs]
  */
object Promload {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.Engine.install(spark)
    args.toList match {
      case "file2store" :: src :: root :: Nil =>
        fileToStore(spark, src, root)
      case "file2null" :: src :: Nil =>
        // S11 null sink (cmd/promload/null.go): decode-and-discard, for
        // measuring source throughput alone
        PromFile.read(spark, src).write.format("noop").mode("overwrite").save()
      case "exporter2store" :: url :: root :: rest =>
        val scrapes = rest.headOption.map(_.toInt).getOrElse(10)
        val intervalMs = rest.lift(1).map(_.toLong).getOrElse(1000L)
        exporterToStore(spark, url, root, scrapes, intervalMs)
      case "store2file" :: root :: dst :: s :: e :: rest =>
        val step = rest.headOption.map(_.toLong).getOrElse(60_000L)
        storeToFile(spark, root, dst, s.toLong, e.toLong, step)
      case other =>
        System.err.println(s"unknown args: $other"); sys.exit(2)
    }
    spark.stop()
  }

  /** File source → store sink: one distributed read, one store append.
    * Progress is byte-accounted like the reference's file source
    * (file.go:96-105: bytes consumed vs file size). */
  def fileToStore(spark: SparkSession, src: String, root: String): Unit = {
    val batch = PromFile.read(spark, src)
    val store = new ParquetStore(spark, root)
    store.write(batch)
    val srcBytes = dirBytes(new java.io.File(src))
    println(s"[promload] copied ${batch.count()} samples ($srcBytes source bytes, 100.0%) from $src to $root")
  }

  private def dirBytes(f: java.io.File): Long =
    if (f.isFile) f.length
    else Option(f.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)

  /** S9 as a live source: scrape a text-exposition endpoint `scrapes`
    * times at `intervalMs`, stamping un-timestamped samples with scrape
    * time, landing each scrape in the store (reference:
    * cmd/promload/exporter.go:73-159 + the copy loop main.go:123-241).
    * One scrape = one small batch; the ingest path (fingerprint, anti-join,
    * partitioned append) amortizes exactly as in streaming use. */
  def exporterToStore(spark: SparkSession, url: String, root: String,
      scrapes: Int, intervalMs: Long): Unit = {
    import graft.sources.Exposition
    import spark.implicits._
    val store = new ParquetStore(spark, root)
    var total = 0L
    for (i <- 0 until scrapes) {
      val t0 = System.currentTimeMillis()
      val text = scala.io.Source.fromURL(url, "UTF-8").mkString
      val series = Exposition.parse(text, defaultTsMs = t0)
      if (series.nonEmpty) {
        val rows = series.flatMap(ts => ts.samples.map(s =>
          (ts.labels.map(l => l.name -> l.value).toMap, s.timestampMs, s.value)))
        store.write(rows.toDF("labels", "timestamp_ms", "value"))
        total += rows.size
      }
      println(s"[promload] scrape ${i + 1}/$scrapes: ${series.size} series, $total total samples")
      val sleep = intervalMs - (System.currentTimeMillis() - t0)
      if (i < scrapes - 1 && sleep > 0) Thread.sleep(sleep)
    }
  }

  /** Read-ahead bound between the chunk reader and the file writer — the
    * reference's bounded channel (cap 10, cmd/promload/main.go:201): a slow
    * sink back-pressures the reader instead of letting it buffer the whole
    * source in memory. */
  val ReadAheadChunks = 10

  /** Store source → file sink in tumbling [start, end) chunks; the last
    * partial chunk is clamped (reference: cmd/promload/main.go:141-147).
    * A reader thread pulls chunks ahead of the writer through a bounded
    * queue (cap [[ReadAheadChunks]]); progress reports percent of the time
    * range plus bytes written (reference: file.go:96-105 byte accounting). */
  def storeToFile(spark: SparkSession, root: String, dst: String,
      startMs: Long, endMs: Long, stepMs: Long): Unit = {
    import spark.implicits._
    val store = new ParquetStore(spark, root)

    // (chunkStart, chunkEnd, series); None = source drained
    val queue = new java.util.concurrent.ArrayBlockingQueue[
      Option[(Long, Long, Seq[graft.model.TimeSeries])]](ReadAheadChunks)
    val reader = new Thread(() => {
      try {
        var chunkStart = startMs
        while (chunkStart < endMs) {
          val chunkEnd = math.min(chunkStart + stepMs, endMs)
          // closed interval on [chunkStart, chunkEnd-1] so chunks don't overlap
          val series = store.readTimeSeries(Query(chunkStart, chunkEnd - 1, Seq.empty))
          queue.put(Some((chunkStart, chunkEnd, series))) // blocks when full
          chunkStart = chunkEnd
        }
      } finally queue.put(None)
    }, "promload-chunk-reader")
    reader.setDaemon(true)
    reader.start()

    var copied = 0L
    var bytes = 0L
    var done = false
    while (!done) queue.take() match {
      case None => done = true
      case Some((chunkStart, chunkEnd, series)) =>
        if (series.nonEmpty) {
          val chunkDir = s"$dst/chunk_$chunkStart"
          PromFile.write(series.toDS(), chunkDir)
          bytes += dirBytes(new java.io.File(chunkDir))
        }
        copied += series.map(_.samples.size).sum
        val pct = 100.0 * (chunkEnd - startMs) / (endMs - startMs)
        println(f"[promload] $pct%5.1f%% — ${series.size} series, $copied total samples, $bytes bytes written")
    }
    reader.join()
  }
}
