package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

/** JSONL corpus interchange — the format LLM training corpora actually
  * ship in (one JSON object per line; The Pile, Dolma, RedPajama all use
  * it). Complements [[Warc]] (the crawl-side wire format) and
  * [[DocShards]] (the dataloader-side packed shards) on the SAME
  * [[ShardIO]] atomic commit protocol:
  *
  *   - serialization is Spark's own `to_json` over the frame's columns —
  *     whole-stage-codegen, schema-faithful (JSON never contains a raw
  *     newline: `to_json` escapes them, so line framing is sound for any
  *     text);
  *   - shards are range-partitioned by the first column and sorted within,
  *     so bytes are deterministic and task retries idempotent —
  *     `part-NNNNN.jsonl` or `.jsonl.gz` (one gzip stream per shard,
  *     MTIME=0 via Java's deflater defaults keeps retry bytes identical);
  *   - read side mirrors the other shard sources: `binaryFile`, one task
  *     per shard, then a DISTRIBUTED `from_json` parse against the
  *     caller's schema (corrupt lines surface as nulls under the default
  *     PERMISSIVE mode — callers gate on [[committed]] first, same as
  *     DocShards);
  *   - `readStream` turns a landing directory into the streaming corpus
  *     front door, shard-at-a-time, each exactly once (file-source
  *     checkpointing) — the JSONL twin of [[Warc.readStream]].
  */
object Jsonl {

  /** Export every column of `df` as JSONL shards under `dir`. Atomic via
    * [[ShardIO]]: on return `_SUCCESS` exists and every visible shard is
    * complete. `keyCol` orders the export (range partition + in-shard
    * sort) so shard names AND bytes are deterministic. */
  def write(df: DataFrame, dir: String, shards: Int, keyCol: String = "doc_id",
      gzip: Boolean = true): Unit = {
    val spark = df.sparkSession
    val serConf = ShardIO.beginJob(spark, dir)
    val ext = if (gzip) "jsonl.gz" else "jsonl"
    val cols = df.columns.map(col).toSeq
    df.select(col(keyCol).as("__key"), to_json(struct(cols: _*)).as("__line"))
      .repartitionByRange(shards, col("__key"))
      .sortWithinPartitions("__key")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.get().partitionId()
          ShardIO.writeShard(dir, f"part-$pid%05d.$ext", serConf) { raw =>
            val out = if (gzip) new GZIPOutputStream(raw, 64 * 1024) else raw
            it.foreach { r =>
              out.write(r.getString(1).getBytes(UTF_8))
              out.write('\n')
            }
            // close (not finish): releases the native Deflater eagerly;
            // the outer stream's close in writeShard is idempotent
            out match { case gz: GZIPOutputStream => gz.close(); case _ => () }
          }
        }
      }
    ShardIO.commitJob(spark, dir)
  }

  /** Read a JSONL shard directory back against `schema`: one task per
    * shard (gzip sniffed per file by magic, like [[Warc.inflate]]), lines
    * parsed distributedly by `from_json`. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    // committed zero-row exports have _SUCCESS but no shards (ShardIO)
    if (ShardIO.committedEmpty(spark, dir, "part-")) ShardIO.emptyFrame(spark, schema)
    else
      parseLines(spark,
        spark.read.format("binaryFile").load(s"$dir/part-*")
          .select(col("content")), schema)

  /** STREAMING ingestion of a JSONL landing directory — shards appearing
    * under `dir` parse as they arrive, each exactly once. */
  def readStream(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    import org.apache.spark.sql.types._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    parseLines(spark,
      spark.readStream.format("binaryFile")
        .schema(binaryFileSchema)
        .option("pathGlobFilter", "part-*")
        .load(dir)
        .select(col("content")), schema)
  }

  private def parseLines(spark: SparkSession, shards: DataFrame,
      schema: StructType): DataFrame = {
    import spark.implicits._
    val lines: Dataset[String] = shards.as[Array[Byte]].flatMap { b =>
      new String(Warc.inflate(b), UTF_8).split('\n').iterator.filter(_.nonEmpty)
    }
    lines.select(from_json(col("value"), schema).as("j")).select(col("j.*"))
  }

  /** True iff `dir` holds a COMPLETE export. */
  def committed(spark: SparkSession, dir: String): Boolean =
    ShardIO.committed(spark, dir)
}
