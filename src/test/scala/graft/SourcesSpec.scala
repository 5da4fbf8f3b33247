package graft

import graft.model._
import graft.sources.{DocShards, Exposition, Jsonl, PromFile, Prompb, Warc}
import graft.storage.ParquetStore
import graft.streaming.Ingest
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // FAIR so the serving-path fairness test is real whichever suite
    // creates the shared context; default-pool behavior stays FIFO
    .config("spark.scheduler.mode", "FAIR")
    .getOrCreate()

  val T0 = 1700000000000L
  def fixture: Seq[TimeSeries] = Seq(
    TimeSeries(
      Seq(Label("__name__", "http_requests_total"), Label("code", "200"), Label("handler", "query")),
      (0 until 5).map(i => Sample(T0 + i * 1000L, 13d + i))),
    TimeSeries(
      Seq(Label("__name__", "up"), Label("job", "clickhouse")),
      Seq(Sample(T0, 1d))),
    TimeSeries(
      Seq(Label("__name__", "weird"), Label("v", "a\"b\\c\nd")),
      Seq(Sample(T0, Double.PositiveInfinity), Sample(T0 + 1, Double.NaN))))

  test("prompb codec round-trip (incl. NaN/Inf and escapes)") {
    for (ts <- fixture) {
      val got = Prompb.decodeTimeSeries(Prompb.encodeTimeSeries(ts))
      assert(got.labels === ts.labels)
      assert(got.samples.map(_.timestampMs) === ts.samples.map(_.timestampMs))
      got.samples.zip(ts.samples).foreach { case (g, w) =>
        assert(java.lang.Double.compare(g.value, w.value) === 0)
      }
    }
    val wr = Prompb.decodeWriteRequest(Prompb.encodeWriteRequest(fixture))
    assert(wr.map(_.labels) === fixture.map(_.labels))
  }

  test("promload file format round-trip through Spark read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_promfile_").toString
    PromFile.writeLocal(fixture, s"$dir/shard0.bin")
    val df = PromFile.read(spark, dir)
    assert(df.count() === fixture.map(_.samples.size).sum)
    val byName = df.collect().groupBy(_.getAs[Map[String, String]]("labels")("__name__"))
    assert(byName.keySet === Set("http_requests_total", "up", "weird"))
    assert(byName("http_requests_total").map(_.getAs[Long]("timestamp_ms")).sorted
      === (0 until 5).map(T0 + _ * 1000L))
  }

  test("promload distributed write + read round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_promfile_w_").toString
    PromFile.write(fixture.toDS().repartition(2), dir)
    val back = PromFile.read(spark, dir)
    assert(back.count() === fixture.map(_.samples.size).sum)
  }

  test("doc shards: training-order export round-trips and preserves the order") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val ordered = graft.ext.Shuffle.deterministicOrder(docs, "doc_id", "ep1")
    val dir = java.nio.file.Files.createTempDirectory("graft_docshards_").toString
    DocShards.write(ordered, "pos", dir, shards = 4)
    val back = DocShards.read(spark, dir)
    // content round-trip (incl. multi-byte text)
    val origSet = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val backRows = back.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(backRows.map(r => r._3 -> r._4).toMap === origSet)
    assert(backRows.length === origSet.size)
    // (shard, rec_no) reconstructs the training order exactly
    val byOrder = backRows.sortBy(r => (r._1, r._2)).map(_._3).toSeq
    val want = ordered.orderBy(col("pos")).select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(byOrder === want)
    // deterministic shard files: re-export is byte-identical
    val dir2 = java.nio.file.Files.createTempDirectory("graft_docshards2_").toString
    DocShards.write(ordered, "pos", dir2, shards = 4)
    def bytesOf(d: String) = new java.io.File(d).listFiles().sortBy(_.getName)
      .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    assert(bytesOf(dir) === bytesOf(dir2))
  }

  test("doc shards: failed export leaves no visible partial shard and no _SUCCESS") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val ordered = graft.ext.Shuffle.deterministicOrder(docs, "doc_id", "ep1")
    // poison ONE row mid-stream: its task dies after having written part of
    // its temp file — the commit protocol must leave that partial bytes
    // INVISIBLE (temp name, never renamed), not a truncated shard-*.bin
    val poisonId = ordered.orderBy(col("pos").desc).select("doc_id")
      .head.getLong(0)
    val boom = udf { (id: Long, text: String) =>
      if (id == poisonId) throw new RuntimeException("poisoned row")
      text
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_docshards_f_").toString
    val poisoned = ordered.withColumn("text", boom(col("doc_id"), col("text")))
    intercept[org.apache.spark.SparkException] {
      DocShards.write(poisoned, "pos", dir, shards = 4)
    }
    assert(!DocShards.committed(spark, dir), "failed export must not stamp _SUCCESS")
    // every VISIBLE shard decodes cleanly end-to-end (complete, committed
    // by a task that finished before the job died) — no torn bytes
    val visible = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("shard-\\d+\\.bin"))
    visible.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val n = DocShards.decodeAll(bytes).size // throws/misaligns if torn
      assert(n > 0)
    }
    // the retry (no poison) commits over whatever the failed run left
    DocShards.write(ordered, "pos", dir, shards = 4)
    assert(DocShards.committed(spark, dir))
    assert(!new java.io.File(dir, "_temporary").exists(),
      "committed export must clear _temporary")
    val back = DocShards.read(spark, dir)
    assert(back.count() === docs.count())
  }

  test("warc: WET export round-trips plain and gzip, deterministic bytes, zcat-compatible members") {
    val docs = Warc.withUrls(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
    val orig = docs.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("url"), r.getAs[String]("text")))).toMap

    for (gzip <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_warc_$gzip").toString
      Warc.write(docs, dir, shards = 3, gzip = gzip)
      assert(Warc.committed(spark, dir))
      val back = Warc.read(spark, dir).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(back === orig, s"round-trip mismatch (gzip=$gzip)")

      // deterministic bytes: re-export is byte-identical (idempotent retry)
      val dir2 = java.nio.file.Files.createTempDirectory(s"graft_warc2_$gzip").toString
      Warc.write(docs, dir2, shards = 3, gzip = gzip)
      def bytesOf(d: String) = new java.io.File(d).listFiles()
        .filter(_.getName.startsWith("warc-")).sortBy(_.getName)
        .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
      assert(bytesOf(dir) === bytesOf(dir2))
    }

    // member-per-record: any plain RFC 1952 reader decodes the whole .gz
    // shard (the zcat contract), and member count == record count
    val gzDir = java.nio.file.Files.createTempDirectory("graft_warc_gz").toString
    Warc.write(docs, gzDir, shards = 1, gzip = true)
    val shard = new java.io.File(gzDir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val raw = java.nio.file.Files.readAllBytes(shard.toPath)
    val members = raw.indices.count(i =>
      (raw(i) & 0xff) == 0x1f && i + 2 < raw.length && (raw(i + 1) & 0xff) == 0x8b
        && (raw(i + 2) & 0xff) == 0x08)
    assert(members >= orig.size, s"expected ≥${orig.size} gzip members, found $members")
    val inflated = Warc.inflate(raw)
    assert(Warc.parseAll(inflated).size === orig.size)
  }

  test("jsonl: full-schema export round-trips plain and gzip with deterministic bytes") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val orig = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
    for (gzip <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_jsonl_$gzip").toString
      Jsonl.write(docs, dir, shards = 3, gzip = gzip)
      assert(Jsonl.committed(spark, dir))
      assert(!new java.io.File(dir, "_temporary").exists())
      val back = Jsonl.read(spark, dir, docs.schema)
      assert(back.schema.map(f => (f.name, f.dataType)) ===
        docs.schema.map(f => (f.name, f.dataType)),
        "schema survives the JSON round trip (nullability aside)")
      val backMap = back.collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq).toMap
      assert(backMap === orig, s"round-trip mismatch (gzip=$gzip)")
      // deterministic bytes: a re-export (= a task retry) is byte-identical
      val dir2 = java.nio.file.Files.createTempDirectory(s"graft_jsonl2_$gzip").toString
      Jsonl.write(docs, dir2, shards = 3, gzip = gzip)
      def bytesOf(d: String) = new java.io.File(d).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
        .map(f => f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
      assert(bytesOf(dir) === bytesOf(dir2))
    }
    // line framing survives text with embedded newlines/quotes (to_json
    // escapes them — a raw newline in a payload must NOT split a record)
    import spark.implicits._
    val tricky = Seq((1L, "line one\nline two\t\"quoted\""), (2L, "plain"))
      .toDF("doc_id", "text")
    val tdir = java.nio.file.Files.createTempDirectory("graft_jsonl_esc").toString
    Jsonl.write(tricky, tdir, shards = 1)
    val tback = Jsonl.read(spark, tdir, tricky.schema).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tback === Map(1L -> "line one\nline two\t\"quoted\"", 2L -> "plain"))
  }

  test("jsonl/shardio: re-export into the same dir leaves NO stale shards; zero-row export reads back empty") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_rerun").toString
    Jsonl.write(docs, dir, shards = 4)
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("part-")) === 4)
    // second export with FEWER shards: beginJob must clear the first run's
    // part-* files, so a committed dir only ever holds one export's shards
    Jsonl.write(docs, dir, shards = 1)
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("part-")) === 1)
    assert(Jsonl.committed(spark, dir))
    assert(Jsonl.read(spark, dir, docs.schema).count() === 50)
    // same for the WARC sink's warc-* names
    val wdir = java.nio.file.Files.createTempDirectory("graft_warc_rerun").toString
    val wdocs = Warc.withUrls(docs)
    Warc.write(wdocs, wdir, shards = 3, gzip = false)
    Warc.write(wdocs, wdir, shards = 1, gzip = false)
    assert(new java.io.File(wdir).listFiles().count(_.getName.startsWith("warc-")) === 1)
    assert(Warc.read(spark, wdir).count() === 50)
    // a committed ZERO-ROW export has _SUCCESS but no shards (empty
    // partitions are skipped) — EVERY format's read must return an empty
    // frame, not throw on the unmatched glob
    val empty = docs.filter($"doc_id" < 0)
    val edir = java.nio.file.Files.createTempDirectory("graft_jsonl_empty").toString
    Jsonl.write(empty, edir, shards = 2)
    assert(Jsonl.committed(spark, edir))
    assert(Jsonl.read(spark, edir, docs.schema).count() === 0)
    val ewarc = java.nio.file.Files.createTempDirectory("graft_warc_empty").toString
    Warc.write(Warc.withUrls(empty), ewarc, shards = 2)
    assert(Warc.committed(spark, ewarc))
    assert(Warc.read(spark, ewarc).count() === 0)
    val eresp = java.nio.file.Files.createTempDirectory("graft_resp_empty").toString
    Warc.writeResponses(empty.withColumn("html", $"text")
      .withColumn("url", org.apache.spark.sql.functions.lit("https://x/")),
      eresp, shards = 2)
    assert(Warc.readResponses(spark, eresp).count() === 0)
    val eshard = java.nio.file.Files.createTempDirectory("graft_shard_empty").toString
    DocShards.write(empty.withColumn("pos", $"doc_id"), "pos", eshard, shards = 2)
    assert(DocShards.committed(spark, eshard))
    assert(DocShards.read(spark, eshard).count() === 0)
  }

  test("shardio: zero-shard read WITHOUT _SUCCESS fails loudly across all formats") {
    // the empty-frame branch is ONLY for committed empty exports — a
    // typo'd path (dir doesn't exist) or a torn/uncommitted export must
    // throw, never silently read as an empty corpus
    val schema = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").schema
    val nosuch = "/tmp/graft_no_such_dir_" + java.util.UUID.randomUUID()
    intercept[IllegalStateException] { Jsonl.read(spark, nosuch, schema).count() }
    intercept[IllegalStateException] { Warc.read(spark, nosuch).count() }
    intercept[IllegalStateException] { Warc.readResponses(spark, nosuch).count() }
    intercept[IllegalStateException] { DocShards.read(spark, nosuch).count() }
    // an existing dir with no shards and no marker = torn export: same
    val torn = java.nio.file.Files.createTempDirectory("graft_torn_dir").toString
    intercept[IllegalStateException] { Jsonl.read(spark, torn, schema).count() }
    intercept[IllegalStateException] { DocShards.read(spark, torn).count() }
  }

  test("warc: torn shard fails loudly, skips non-conversion records") {
    val docs = Warc.withUrls(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20))
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_torn").toString
    Warc.write(docs, dir, shards = 1, gzip = false)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc")).head
    val bytes = java.nio.file.Files.readAllBytes(shard.toPath)

    // truncating anywhere inside the last record must throw, never yield
    // a silently smaller corpus
    intercept[IllegalArgumentException] {
      Warc.parseAll(java.util.Arrays.copyOf(bytes, bytes.length - 7)).size
    }

    // a warcinfo record interleaved ahead (real WET files start with one)
    // is skipped, not an error
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\n" +
      "hello\r\n\r\n").getBytes("UTF-8")
    val mixed = info ++ bytes
    assert(Warc.parseAll(mixed).size === 20)
  }

  test("warc: foreign record ids (real CC WET shape) parse with deterministic hashed ids") {
    def rec(headers: String, payload: String) =
      (s"WARC/1.0\r\n$headers" +
        s"Content-Type: text/plain\r\nContent-Length: ${payload.length}\r\n\r\n" +
        payload + "\r\n\r\n").getBytes("UTF-8")
    // a real Common Crawl WET conversion record carries <urn:uuid:...>
    val foreign = rec(
      "WARC-Type: conversion\r\nWARC-Record-ID: <urn:uuid:11ec-8a3f>\r\n" +
        "WARC-Target-URI: https://example.org/page\r\n", "hello")
    val out = Warc.parseAll(foreign).toList
    assert(out.map(r => (r._2, r._3)) === List(("https://example.org/page", "hello")))
    // deterministic: same id on every parse; distinct from a graft id
    assert(out.head._1 === Warc.parseAll(foreign).toList.head._1)
    // id header absent entirely: URI-derived, still deterministic
    val noId = rec(
      "WARC-Type: conversion\r\nWARC-Target-URI: https://example.org/p2\r\n", "world")
    assert(Warc.parseAll(noId).toList.head._1 ===
      Warc.parseAll(noId).toList.head._1)
    // our own exports still round-trip their literal doc_id
    val own = Warc.encodeRecord(42L, "https://x/y", "mine", "2026-01-01T00:00:00Z")
    assert(Warc.parseAll(own).toList.head._1 === 42L)
    // a foreign id that merely LOOKS like ours (non-numeric / overflowing
    // payload inside the graft prefix) hashes instead of throwing — the
    // tolerant path must not reintroduce a crash on provenance
    for (fake <- Seq("<urn:graft:doc:not-a-number>",
        "<urn:graft:doc:99999999999999999999999>", "<urn:graft:doc:>")) {
      val r = rec(s"WARC-Type: conversion\r\nWARC-Record-ID: $fake\r\n" +
        "WARC-Target-URI: https://example.org/f\r\n", "x")
      val parsed = Warc.parseAll(r).toList
      assert(parsed.size === 1, fake)
      assert(parsed.head._1 === Warc.parseAll(r).toList.head._1, s"deterministic: $fake")
    }
  }

  test("warc: raw-crawl response records round-trip and feed the html→text front door") {
    import graft.ext.HtmlText
    import spark.implicits._
    // synthetic raw-crawl: one response record per doc, HTML per the
    // html1 fixture, framed as a full HTTP message per ISO 28500 §6.3
    val pages = HtmlText.asGeneratedPages(spark, "/root/testdata/sf0.001").toDF()
    val orig = pages.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("url"), r.getAs[String]("html"))).toMap
    for (gzip <- Seq(false, true)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_warcresp_$gzip").toString
      Warc.writeResponses(pages, dir, shards = 3, gzip = gzip)
      assert(Warc.committed(spark, dir))
      val back = Warc.readResponses(spark, dir)
      val backMap = back.collect().map(r =>
        r.getAs[Long]("doc_id") -> (r.getAs[String]("url"), r.getAs[String]("html"))).toMap
      assert(backMap === orig, s"gzip=$gzip")
      // the front door composed end-to-end: warc response → html→text;
      // extraction over the round-tripped bytes ≡ extraction over the
      // original pages (the pipeline's first real stage)
      if (!gzip) {
        val viaWarc = HtmlText.extractFrame(back).collect()
          .map(d => d.doc_id -> d.text).toMap
        val direct = HtmlText.extractDocs(
          HtmlText.asGeneratedPages(spark, "/root/testdata/sf0.001")).collect()
          .map(d => d.doc_id -> d.text).toMap
        assert(viaWarc === direct)
        assert(viaWarc.values.forall(_.nonEmpty))
      }
    }
    // a response record whose payload is NOT an HTTP message is a
    // structural violation — strict, like torn framing
    val bogus = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:graft:doc:1>\r\nWARC-Target-URI: https://x/1\r\n" +
      "Content-Length: 9\r\n\r\nnot http!\r\n\r\n").getBytes("UTF-8")
    intercept[IllegalArgumentException] { Warc.parseResponses(bogus).toList }
    // conversion and response views are disjoint over a mixed shard
    val conv = Warc.encodeRecord(7L, "https://x/7", "plain text", "2026-01-01T00:00:00Z")
    val resp = Warc.encodeResponseRecord(8L, "https://x/8",
      "<p>This paragraph is long enough to clear the length rule.</p>", "2026-01-01T00:00:00Z")
    val mixed = conv ++ resp
    assert(Warc.parseAll(mixed).toList.map(_._1) === List(7L))
    val respOut = Warc.parseResponses(mixed).toList
    assert(respOut.map(_._1) === List(8L))
    assert(respOut.head._3 === "<p>This paragraph is long enough to clear the length rule.</p>")
  }

  test("warc: Content-Length framing is immune to WARC-looking payload bytes") {
    // a payload that contains CRLFs, header-shaped lines, and a full fake
    // record head must ride through untouched — framing is length-based,
    // never delimiter-based
    val nasty = "WARC/1.0\r\nWARC-Type: conversion\r\n\r\nfake\r\n\r\n" +
      "Content-Length: 99999\r\n plus   binary ÿ bytes"
    val rec = Warc.encodeRecord(7L, "https://x.example/7", nasty, "2026-01-01T00:00:00Z")
    val got = Warc.parseAll(rec).toSeq
    assert(got === Seq((7L, "https://x.example/7", nasty)))
    // and in company, plain and gzipped
    val rec2 = Warc.encodeRecord(8L, "https://x.example/8", "plain", "2026-01-01T00:00:00Z")
    assert(Warc.parseAll(rec ++ rec2).toSeq.map(_._1) === Seq(7L, 8L))
    assert(Warc.parseAll(Warc.inflate(
      Warc.gzipMember(rec) ++ Warc.gzipMember(rec2))).toSeq.map(_._1) === Seq(7L, 8L))
  }

  test("exposition text format parse (S9)") {
    val text =
      """# HELP http_requests_total Counts
        |# TYPE http_requests_total counter
        |http_requests_total{code="200",handler="query"} 1027 1395066363000
        |metric_without_labels 12.47
        |escaped{v="a\"b\\c\nd"} 1
        |special NaN
        |up{job="x"} +Inf
        |malformed{{{ 3
        |""".stripMargin
    val got = Exposition.parse(text, defaultTsMs = 42L)
    assert(got.size === 5)
    assert(got(0) === TimeSeries(
      Seq(Label("__name__", "http_requests_total"), Label("code", "200"), Label("handler", "query")),
      Seq(Sample(1395066363000L, 1027d))))
    assert(got(1) === TimeSeries(Seq(Label("__name__", "metric_without_labels")), Seq(Sample(42L, 12.47))))
    assert(got(2).labels === Seq(Label("__name__", "escaped"), Label("v", "a\"b\\c\nd")))
    assert(got(3).samples.head.value.isNaN)
    assert(got(4).samples.head.value.isPosInfinity)
  }

  test("streaming ingest lands batches in the store (S1 foreachBatch)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      org.apache.spark.sql.classic.SparkSession.builder().getOrCreate().sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_").toString
    val store = new ParquetStore(spark, dir)

    val stream = MemoryStream[(Map[String, String], Long, Double)]
    val df = stream.toDF().toDF("labels", "timestamp_ms", "value")
    // AvailableNow processes what's in the source at start and terminates:
    // data must be added BEFORE start or the query may land zero batches.
    stream.addData(fixture.flatMap(ts =>
      ts.samples.map(s => (ts.labels.map(l => l.name -> l.value).toMap, s.timestampMs, s.value))))
    val q = Ingest.start(df, store, Trigger.AvailableNow())
    q.awaitTermination(60000)

    val got = store.readTimeSeries(Query(T0, T0 + 10000,
      Seq(Matcher("__name__", MatchType.Eq, "http_requests_total"))))
    assert(got.size === 1)
    assert(got.head.samples.size === 5)

    // second identical batch: dictionary unchanged, samples appended
    stream.addData(fixture.flatMap(ts =>
      ts.samples.map(s => (ts.labels.map(l => l.name -> l.value).toMap, s.timestampMs, s.value))))
    val q2 = Ingest.start(df, store, Trigger.AvailableNow())
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$dir/time_series").count() === 3)
  }
}
