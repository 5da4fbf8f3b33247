package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) rides through the
  * pipeline as an opaque `binary` column plus typed metadata; decode /
  * feature-extraction runs as a partition-wise batch transform (the Scala
  * analogue of mapInPandas).
  *
  * The actual codec is STUBBED — no image/audio libraries exist in this
  * environment — with a deterministic fake that derives pseudo-metadata
  * from the bytes. The Spark-side plumbing (schema, partitioning, batch
  * iteration, typed Dataset round-trip) is real and tested; swapping
  * `stubDecode` for a real JNI/ffmpeg decoder changes nothing upstream.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte])
  case class MediaFeature(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      channels: Int,
      byte_mean: Double)

  /** STUB decoder: deterministic pseudo image metadata from raw bytes.
    * A real implementation would parse the container header; `???`-grade
    * fake kept total and reproducible. */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Int, Double) = {
    val n = bytes.length
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xff; i += 1 }
    val width = 16 + (math.abs(ExtOps.splitmix64(n.toLong)) % 1024).toInt
    val height = 16 + (math.abs(ExtOps.splitmix64(sum)) % 1024).toInt
    val channels = 1 + (sum % 3).toInt
    val mean = if (n == 0) 0d else sum.toDouble / n
    (width, height, channels, mean)
  }

  /** Partition-wise feature extraction over the opaque binary column.
    * One decoder instance per partition (the expensive-init pattern for
    * real codecs), streaming iterator in/out — constant memory per task. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs would be initialized once per partition here
      rows.map { r =>
        val (w, h, c, mean) = stubDecode(r.media)
        MediaFeature(r.doc_id, r.media.length, w, h, c, mean)
      }
    }
  }

  /** The documents table as a media table: text bytes standing in for an
    * encoded image payload (schema shape is what matters). */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
      .as[MediaRow]
  }

  case class ResizedRow(doc_id: Long, media: Array[Byte], width: Int, height: Int)

  /** Resize — the binary→binary transform of image pipelines: payload in,
    * (smaller) payload + updated metadata out, batched per partition like
    * the decoder. STUB: deterministic stride subsampling of the bytes down
    * to ≤`maxBytes` stands in for a real scaler; the contract that matters
    * (and is tested) is output length ≤ maxBytes, determinism, and the
    * map-only plan. */
  def resize(media: Dataset[MediaRow], maxBytes: Int = 4096): Dataset[ResizedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.media.length
        val out =
          if (n <= maxBytes) r.media
          else {
            val stride = (n + maxBytes - 1) / maxBytes
            Array.tabulate(n / stride)(i => r.media(i * stride))
          }
        val (w, h, _, _) = stubDecode(out)
        ResizedRow(r.doc_id, out, w, h)
      }
    }
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, ts_ms: Long, luma: Double)

  /** Frame sampling — the 1-row → N-rows generator shape of video
    * pipelines: each media payload yields one sampled frame per `stepMs`
    * of (stubbed) duration, capped at `maxFrames`. Map-only plan: the
    * expansion happens inside the partition iterator (constant memory, no
    * shuffle, binary payload never copied per frame). The stub "decoder"
    * derives duration from payload size (1 B ≈ 1 ms) and a deterministic
    * per-frame luma — a real ffmpeg frame grab slots into the same
    * flatMap without touching the plan shape. */
  def sampleFrames(media: Dataset[MediaRow], stepMs: Long = 1000L,
      maxFrames: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val durationMs = r.media.length.toLong // stub: 1 byte ≈ 1 ms
        val n = math.min(maxFrames.toLong, durationMs / stepMs + 1)
        (0L until n).iterator.map(i =>
          FrameRow(r.doc_id, i, i * stepMs, ((r.doc_id * 131 + i) % 256).toDouble))
      }
    }
  }
}
