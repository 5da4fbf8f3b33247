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
    args.toList match {
      case "file2store" :: src :: root :: Nil =>
        fileToStore(spark, src, root)
      case "file2null" :: src :: Nil =>
        // S11 null sink (cmd/promload/null.go): decode-and-discard, for
        // measuring source throughput alone
        PromFile.read(spark, src).write.format("noop").mode("overwrite").save()
      case "store2file" :: root :: dst :: s :: e :: rest =>
        val step = rest.headOption.map(_.toLong).getOrElse(60_000L)
        storeToFile(spark, root, dst, s.toLong, e.toLong, step)
      case other =>
        System.err.println(s"unknown args: $other"); sys.exit(2)
    }
    spark.stop()
  }

  /** File source → store sink: one distributed read, one store append. */
  def fileToStore(spark: SparkSession, src: String, root: String): Unit = {
    val batch = PromFile.read(spark, src)
    val store = new ParquetStore(spark, root)
    store.write(batch)
    println(s"[promload] copied ${batch.count()} samples from $src to $root")
  }

  /** Store source → file sink in tumbling [start, end) chunks; the last
    * partial chunk is clamped (reference: cmd/promload/main.go:141-147). */
  def storeToFile(spark: SparkSession, root: String, dst: String,
      startMs: Long, endMs: Long, stepMs: Long): Unit = {
    import spark.implicits._
    val store = new ParquetStore(spark, root)
    var chunkStart = startMs
    var copied = 0L
    while (chunkStart < endMs) {
      val chunkEnd = math.min(chunkStart + stepMs, endMs)
      // closed interval on [chunkStart, chunkEnd-1] so chunks don't overlap
      val series = store.readTimeSeries(Query(chunkStart, chunkEnd - 1, Seq.empty))
      if (series.nonEmpty)
        PromFile.write(series.toDS(), s"$dst/chunk_$chunkStart")
      copied += series.map(_.samples.size).sum
      val pct = 100.0 * (chunkEnd - startMs) / (endMs - startMs)
      println(f"[promload] $pct%5.1f%% — ${series.size} series, $copied total samples")
      chunkStart = chunkEnd
    }
  }
}
