package graft.sources

import graft.model.TimeSeries
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.xerial.snappy.Snappy

/** The promload file format (reference: cmd/promload/file.go:63-155):
  * repeated records of `[uint32 BigEndian length][snappy(TimeSeries
  * protobuf)]`.
  *
  * Read side: `binaryFile` source (one row per file, files are the
  * parallelism unit — at scale the corpus is many shard files, so tasks
  * distribute naturally) + per-partition record split/decode. Write side:
  * one shard per partition via `foreachPartition`.
  */
object PromFile {

  /** Decode a whole file's bytes into TimeSeries records. */
  def decodeAll(bytes: Array[Byte]): Iterator[TimeSeries] = new Iterator[TimeSeries] {
    private var pos = 0
    override def hasNext: Boolean = pos + 4 <= bytes.length
    override def next(): TimeSeries = {
      val len = ((bytes(pos) & 0xff) << 24) | ((bytes(pos + 1) & 0xff) << 16) |
        ((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff)
      pos += 4
      val rec = Snappy.uncompress(java.util.Arrays.copyOfRange(bytes, pos, pos + len))
      pos += len
      Prompb.decodeTimeSeries(rec)
    }
  }

  def encodeRecord(ts: TimeSeries): Array[Byte] = {
    val compressed = Snappy.compress(Prompb.encodeTimeSeries(ts))
    val out = new Array[Byte](4 + compressed.length)
    out(0) = (compressed.length >>> 24).toByte
    out(1) = (compressed.length >>> 16).toByte
    out(2) = (compressed.length >>> 8).toByte
    out(3) = compressed.length.toByte
    System.arraycopy(compressed, 0, out, 4, compressed.length)
    out
  }

  /** S7: read a directory (or glob) of promload files into the flat batch
    * schema (labels map, timestamp_ms, value). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(path)
      .select(col("content").as[Array[Byte]])
    val flat = files.mapPartitions { contents =>
      contents.flatMap(bytes => decodeAll(bytes).flatMap { ts =>
        val labels = ts.labels.map(l => l.name -> l.value).toMap
        ts.samples.map(s => (labels, s.timestampMs, s.value))
      })
    }
    flat.toDF("labels", "timestamp_ms", "value")
  }

  /** S8: write each partition of a typed TimeSeries dataset as one shard
    * file in the promload format. */
  def write(series: Dataset[TimeSeries], dir: String): Unit = {
    new java.io.File(dir).mkdirs()
    series.foreachPartition { (it: Iterator[TimeSeries]) =>
      if (it.hasNext) {
        val shard = java.util.UUID.nameUUIDFromBytes(
          it.toString.getBytes("UTF-8")).toString.take(8)
        val path = s"$dir/part-${java.lang.Thread.currentThread().getId}-$shard.bin"
        val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
        try it.foreach(ts => out.write(encodeRecord(ts)))
        finally out.close()
      }
    }
  }

  /** Local (driver-side) writer for small fixtures and tools. */
  def writeLocal(series: Seq[TimeSeries], path: String): Unit = {
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    try series.foreach(ts => out.write(encodeRecord(ts)))
    finally out.close()
  }
}
