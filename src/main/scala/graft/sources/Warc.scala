package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** WARC/WET interchange (ISO 28500 / WARC 1.0 — the Common Crawl wire
  * format, where a 100 TB text pipeline's input actually arrives):
  *
  *   - records are WET-style `WARC-Type: conversion` (extracted plain
  *     text), framed by `Content-Length` with the spec's CRLF discipline
  *     (blank line after headers, two CRLFs after the payload);
  *   - `.warc.gz` uses the Common Crawl member-per-record convention:
  *     each record is its OWN gzip member, members concatenated — any
  *     RFC 1952 reader (`zcat`, `GZIPInputStream`) decodes the whole
  *     file, and record boundaries coincide with member boundaries (what
  *     makes the format seekable once offsets are indexed). Java's
  *     `GZIPOutputStream` writes MTIME=0, so shard bytes stay
  *     deterministic and task retries idempotent;
  *   - the export shards through [[ShardIO]]'s atomic commit protocol
  *     (attempt-unique temp + rename + `_SUCCESS`), range-partitioned by
  *     `doc_id` and sorted within — deterministic names AND bytes;
  *   - the read side mirrors [[DocShards]]: `binaryFile` source, one task
  *     per shard (Common Crawl ships ~1 GiB WET files — the natural task
  *     granule), gzip sniffed per file by magic, parse is strict
  *     (structural truncation throws rather than silently yielding a
  *     partial corpus — the committed-marker check is the cheap pre-test).
  *
  * Reference framing per ISO 28500 §4; no parser code is derived from any
  * existing implementation. */
object Warc {

  private val Crlf = "\r\n"

  /** FNV-1a 64 over UTF-8 bytes — deterministic doc_id for records whose
    * provenance id is not one of our own `<urn:graft:doc:N>` exports. */
  private def fnv64(s: String): Long = {
    val bytes = s.getBytes(UTF_8)
    var h = graft.core.Fingerprint.Offset64
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= graft.core.Fingerprint.Prime64; i += 1
    }
    h
  }

  /** Frame one WARC record: version + headers + length-framed payload +
    * the spec's CRLF CRLF terminator. */
  private def frameRecord(warcType: String, contentType: String, docId: Long,
      url: String, date: String, payload: Array[Byte]): Array[Byte] = {
    val header =
      s"WARC/1.0$Crlf" +
        s"WARC-Type: $warcType$Crlf" +
        s"WARC-Record-ID: <urn:graft:doc:$docId>$Crlf" +
        s"WARC-Date: $date$Crlf" +
        s"WARC-Target-URI: $url$Crlf" +
        s"Content-Type: $contentType$Crlf" +
        s"Content-Length: ${payload.length}$Crlf" +
        Crlf
    val head = header.getBytes(UTF_8)
    val out = new Array[Byte](head.length + payload.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(payload, 0, out, head.length, payload.length)
    // record terminator: CRLF CRLF
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** One WET conversion record's serialized bytes. `date` must be a
    * W3C/ISO-8601 UTC instant; fixed per export so retries are
    * byte-identical. */
  def encodeRecord(docId: Long, url: String, text: String,
      date: String): Array[Byte] =
    frameRecord("conversion", "text/plain", docId, url, date, text.getBytes(UTF_8))

  /** One WARC `response` record's serialized bytes — the RAW-crawl shape
    * (pre-extraction HTML, what Common Crawl's `.warc.gz` holds, versus
    * the WET `conversion` records above). Per ISO 28500 §6.3 the payload
    * is a full HTTP message (`application/http; msgtype=response`):
    * status line + HTTP headers + blank line + entity body. */
  def encodeResponseRecord(docId: Long, url: String, html: String,
      date: String): Array[Byte] = {
    val body = html.getBytes(UTF_8)
    val http = (s"HTTP/1.1 200 OK$Crlf" +
      s"Content-Type: text/html; charset=utf-8$Crlf" +
      s"Content-Length: ${body.length}$Crlf" + Crlf).getBytes(UTF_8)
    frameRecord("response", "application/http; msgtype=response", docId, url,
      date, http ++ body)
  }

  /** `bytes` as one standalone gzip member (RFC 1952; deterministic —
    * Java's gzip header carries MTIME=0). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  /** Decode a whole shard to its concatenated record bytes: multi-member
    * gzip when the magic matches, identity otherwise. */
  def inflate(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      // GZIPInputStream consumes concatenated members natively
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
      val bos = new ByteArrayOutputStream(bytes.length * 3)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } else bytes

  /** Walk concatenated WARC records of ANY type, yielding (lowercased
    * headers, payload). Strict on structure: a truncated header, payload,
    * or terminator throws (a torn shard must fail loudly, not pass as a
    * smaller corpus). The typed views below ([[parseAll]] for WET
    * `conversion`, [[parseResponses]] for raw-crawl `response`) filter by
    * record type — real crawls interleave `warcinfo`/`request` records. */
  def parseRecords(bytes: Array[Byte]): Iterator[(Map[String, String], String)] =
    new Iterator[(Map[String, String], String)] {
      private var pos = 0

      private def line(): String = {
        val start = pos
        while (pos + 1 < bytes.length && !(bytes(pos) == '\r' && bytes(pos + 1) == '\n'))
          pos += 1
        if (pos + 1 >= bytes.length)
          throw new IllegalArgumentException(s"truncated header line at $start")
        val s = new String(bytes, start, pos - start, UTF_8)
        pos += 2
        s
      }

      override def hasNext: Boolean = pos < bytes.length
      override def next(): (Map[String, String], String) = {
        val version = line()
        if (!version.startsWith("WARC/"))
          throw new IllegalArgumentException(s"expected WARC version line, got '$version'")
        var headers = Map.empty[String, String]
        var h = line()
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          if (i < 0) throw new IllegalArgumentException(s"malformed header '$h'")
          headers += h.substring(0, i).trim.toLowerCase -> h.substring(i + 1).trim
          h = line()
        }
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException("missing Content-Length")).toInt
        if (pos + len + 4 > bytes.length)
          throw new IllegalArgumentException(s"truncated payload at $pos (need $len)")
        val payload = new String(bytes, pos, len, UTF_8)
        pos += len
        if (!(bytes(pos) == '\r' && bytes(pos + 1) == '\n' &&
            bytes(pos + 2) == '\r' && bytes(pos + 3) == '\n'))
          throw new IllegalArgumentException(s"missing record terminator at $pos")
        pos += 4
        (headers, payload)
      }
    }

  /** Deterministic doc id for a record: our own exports carry the doc_id
    * in the record id; FOREIGN records (real Common Crawl:
    * `<urn:uuid:...>`, or a graft-looking id with a non-numeric payload)
    * get a deterministic FNV-1a of the id string (or of the target URI
    * when the id header is absent) — strictness stays on STRUCTURE
    * (framing), not on provenance conventions, so the front door ingests
    * crawls it didn't write. */
  private def recordId(headers: Map[String, String], uri: String): Long =
    headers.get("warc-record-id") match {
      case Some(rid) if rid.startsWith("<urn:graft:doc:") && rid.endsWith(">") =>
        scala.util.Try(
          rid.stripPrefix("<urn:graft:doc:").stripSuffix(">").toLong
        ).getOrElse(fnv64(rid))
      case Some(rid) => fnv64(rid)
      case None => fnv64(uri)
    }

  /** WET view: `conversion` records as (doc_id, url, extracted_text). */
  def parseAll(bytes: Array[Byte]): Iterator[(Long, String, String)] =
    parseRecords(bytes).collect {
      case (h, payload) if h.get("warc-type").contains("conversion") =>
        val uri = h.getOrElse("warc-target-uri", "")
        (recordId(h, uri), uri, payload)
    }

  /** Raw-crawl view: `response` records as (doc_id, url, entity_body) —
    * the HTTP envelope (status line + headers) is stripped; what remains
    * is the raw HTML a text-extraction front ([[graft.ext.HtmlText]])
    * consumes. The envelope is STRUCTURE, so a response payload that is
    * not an HTTP message throws like any framing violation. */
  def parseResponses(bytes: Array[Byte]): Iterator[(Long, String, String)] =
    parseRecords(bytes).collect {
      case (h, payload) if h.get("warc-type").contains("response") =>
        val uri = h.getOrElse("warc-target-uri", "")
        if (!payload.startsWith("HTTP/"))
          throw new IllegalArgumentException(
            "response payload is not an HTTP message")
        val sep = payload.indexOf("\r\n\r\n")
        if (sep < 0)
          throw new IllegalArgumentException("missing HTTP header terminator")
        (recordId(h, uri), uri, payload.substring(sep + 4))
    }

  /** Export `docs` (doc_id, text, url columns) as `shards` WET files under
    * `dir` — `warc-NNNNN.warc.gz` (member-per-record) or `.warc` when
    * `gzip = false`. Atomic via [[ShardIO]]: on return, `_SUCCESS` exists
    * and every visible shard is complete. */
  def write(docs: DataFrame, dir: String, shards: Int, gzip: Boolean = true,
      date: String = "2026-01-01T00:00:00Z"): Unit = {
    val spark = docs.sparkSession
    val serConf = ShardIO.beginJob(spark, dir)
    val ext = if (gzip) "warc.gz" else "warc"
    docs.select(col("doc_id"), col("text"), col("url"))
      .repartitionByRange(shards, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.get().partitionId()
          ShardIO.writeShard(dir, f"warc-$pid%05d.$ext", serConf) { out =>
            it.foreach { r =>
              val rec = encodeRecord(r.getLong(0), r.getString(2), r.getString(1), date)
              out.write(if (gzip) gzipMember(rec) else rec)
            }
          }
        }
      }
    ShardIO.commitJob(spark, dir)
  }

  /** Read a WET shard directory back: (doc_id, url, text). One task per
    * shard; `.warc` and `.warc.gz` shards may mix. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    if (ShardIO.committedEmpty(spark, dir, "warc-")) // committed zero-row export
      ShardIO.emptyFrame(spark, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    else spark.read.format("binaryFile").load(s"$dir/warc-*")
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(b => parseAll(inflate(b)))
      .toDF("doc_id", "url", "text")
  }

  /** Export `docs` (doc_id, html, url columns) as raw-crawl WARC shards of
    * `response` records — the synthetic twin of a real Common Crawl
    * `.warc.gz` segment, for driving the HTML front door end-to-end.
    * Same [[ShardIO]] atomic commit, names `warc-NNNNN.warc[.gz]`. */
  def writeResponses(docs: DataFrame, dir: String, shards: Int,
      gzip: Boolean = true, date: String = "2026-01-01T00:00:00Z"): Unit = {
    val spark = docs.sparkSession
    val serConf = ShardIO.beginJob(spark, dir)
    val ext = if (gzip) "warc.gz" else "warc"
    docs.select(col("doc_id"), col("html"), col("url"))
      .repartitionByRange(shards, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.get().partitionId()
          ShardIO.writeShard(dir, f"warc-$pid%05d.$ext", serConf) { out =>
            it.foreach { r =>
              val rec = encodeResponseRecord(r.getLong(0), r.getString(2),
                r.getString(1), date)
              out.write(if (gzip) gzipMember(rec) else rec)
            }
          }
        }
      }
    ShardIO.commitJob(spark, dir)
  }

  /** Read a raw-crawl shard directory's `response` records back:
    * (doc_id, url, html) with the HTTP envelope stripped. One task per
    * shard — the input side of the `html→text → quality-gate` ladder. */
  def readResponses(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    if (ShardIO.committedEmpty(spark, dir, "warc-")) // committed zero-row export
      ShardIO.emptyFrame(spark, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("html", org.apache.spark.sql.types.StringType))))
    else spark.read.format("binaryFile").load(s"$dir/warc-*")
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap(b => parseResponses(inflate(b)))
      .toDF("doc_id", "url", "html")
  }

  /** True iff `dir` holds a COMPLETE export. */
  def committed(spark: SparkSession, dir: String): Boolean =
    ShardIO.committed(spark, dir)

  /** STREAMING ingestion of a WET landing directory: shards appearing
    * under `dir` are parsed as they arrive — the file-source stream over
    * the binaryFile format, one task per new shard, each shard exactly
    * once (the source checkpoints processed paths). This is the corpus
    * front door at its realistic shape: a crawler drops `warc-*` shards,
    * and the parse feeds straight into the streaming curation ladder
    * (`DocStream.curatedDocs` → `decontamGate` →
    * `Classifier.scoreColumn`). Same strict parse as [[read]]. */
  def readStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "warc-*")
      .load(dir)
      .select(col("content")).as[Array[Byte]]
      .flatMap(b => parseAll(inflate(b)))
      .toDF("doc_id", "url", "text")
  }

  /** STREAMING ingestion of a raw-crawl landing directory — the
    * `response`-record twin of [[readStream]]: `warc-*` shards appearing
    * under `dir` parse as they arrive, HTTP envelopes stripped, each
    * shard exactly once. Feeds [[graft.ext.HtmlText.extractFrame]] for
    * the live `url filter → html→text → quality gate` front. */
  def readResponsesStream(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "warc-*")
      .load(dir)
      .select(col("content")).as[Array[Byte]]
      .flatMap(b => parseResponses(inflate(b)))
      .toDF("doc_id", "url", "html")
  }

  /** Deterministic provenance URLs for the test corpus (the `documents`
    * table carries source+lang but no crawl URL — a real WET input has
    * one per record). */
  def withUrls(docs: DataFrame): DataFrame =
    docs.withColumn("url",
      concat(lit("https://"), col("source"), lit(".example/"),
        col("lang"), lit("/"), col("doc_id")))
}
