package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual drive entry: exercises the library's public API in a live local
  * Spark session. Run: `sbt "runMain graft.tools.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("graft-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.Engine.install(spark)
    import spark.implicits._
    import graft.functions._

    val df = Seq(
      Map("__name__" -> "http_requests_total", "code" -> "200", "handler" -> "query"),
      Map("__name__" -> "up", "instance" -> "promhouse_clickhouse_exporter_1:9116", "job" -> "clickhouse"),
      Map.empty[String, String],
      Map("l" -> "a\"b\\c\nd\te")
    ).toDF("labels")
    val out = df.select(labels_fingerprint($"labels").as("fp"), labels_json($"labels").as("json"))
    out.show(false)
    println("UNSIGNED: " + out.collect().map(r => java.lang.Long.toUnsignedString(r.getLong(0))).mkString(", "))

    registerAll(spark)
    df.createOrReplaceTempView("t")
    spark.sql("select labels_fingerprint(labels) fp, labels_json(labels) j from t").show(false)

    // full SQL kernel surface (GraftFunctions/GraftExtensions registration)
    spark.sql(
      """select ts_val_ts(ts_val_encode(1700000000000L, 1.5D)) ts_back,
        |       ts_val_v(ts_val_encode(1700000000000L, 1.5D)) v_back,
        |       repetition_stats(array('a','b','a','b'), 2) rep,
        |       dd_quantile(dd_hist(v), 0.5) is null as dd_empty_null
        |from (select cast(null as double) v)""".stripMargin).show(false)

    val big = spark.range(100000).select(map(lit("k"), $"id".cast("string")).as("labels"))
    println("BIG distinct fps: " + big.select(labels_fingerprint($"labels").as("f")).distinct.count)
    println(spark.sql("select labels_fingerprint(labels) f from t").queryExecution.executedPlan.toString.linesIterator.take(5).mkString("\n"))

    // end-to-end: promload file -> Spark source -> two-table store -> matcher read
    import graft.model._
    import graft.sources.PromFile
    import graft.storage.ParquetStore
    val fixture = Seq(
      TimeSeries(Seq(Label("__name__", "http_requests_total"), Label("code", "200")),
        (0 until 5).map(i => Sample(1700000000000L + i * 1000L, 13d + i))),
      TimeSeries(Seq(Label("__name__", "up"), Label("job", "ch")),
        Seq(Sample(1700000000000L, 1d))))
    val tmp = java.nio.file.Files.createTempDirectory("smoke_e2e_").toString
    PromFile.writeLocal(fixture, s"$tmp/shard0.bin")
    val store = new ParquetStore(spark, s"$tmp/store")
    store.write(PromFile.read(spark, s"$tmp/shard0.bin"))
    val back = store.readTimeSeries(Query(1700000000000L, 1700000005000L,
      Seq(Matcher("__name__", MatchType.Re, "http_.+"))))
    println(s"E2E file->store->read: ${back.size} series, samples=${back.head.samples}")

    // compaction: second write -> duplicate dictionary rows -> compact -> unique
    store.write(PromFile.read(spark, s"$tmp/shard0.bin"))
    Compact.run(spark, s"$tmp/store")
    val dict = spark.read.parquet(s"$tmp/store/time_series")
    println(s"COMPACT: dictionary rows=${dict.count()} (distinct fp=${dict.select("fingerprint").distinct.count()})")
    val afterCompact = store.readTimeSeries(Query(1700000000000L, 1700000005000L,
      Seq(Matcher("__name__", MatchType.Re, "http_.+"))))
    println(s"COMPACT read-back: ${afterCompact.head.samples.size} samples (dup samples kept, reference semantics)")

    // wire protocol round-trip over a live HTTP server
    val api = new graft.api.HttpApi(spark, store)
    val port = api.start()
    val remote = graft.api.HttpApi.remoteRead(s"http://127.0.0.1:$port",
      Seq(Query(1700000000000L, 1700000005000L, Seq(Matcher("job", MatchType.Eq, "ch")))))
    println(s"HTTP remote read: ${remote.head.size} series -> ${remote.head.head.labels}")
    api.stop()

    // as-of + downsample over the driver test data
    println("AS-OF sample:")
    graft.SparkEntry.queries("as1_asof_join")(spark, "/root/testdata/sf0.001").show(3, false)
    println("DOWNSAMPLE sample:")
    graft.SparkEntry.queries("ds1_downsample")(spark, "/root/testdata/sf0.001").show(3, false)

    // hinted read: pre-aggregated step buckets vs raw samples
    val hinted = store.readTimeSeries(Query(1700000000000L, 1700000005000L,
      Seq(Matcher("__name__", MatchType.Re, "http_.+")),
      Some(graft.model.ReadHints(stepMs = 2000L, func = "max_over_time"))))
    println(s"HINTED read (max/2s): ${hinted.head.samples} (raw had ${afterCompact.head.samples.size})")

    // stddev hint served from the write-side rollup's sum_sq partial
    locally {
      val r = new ParquetStore(spark, s"$tmp/sdstore", rollupStepMs = 1000L)
      r.write(PromFile.read(spark, s"$tmp/shard0.bin"))
      val q = Query(1700000000000L, 1700000005000L,
        Seq(Matcher("__name__", MatchType.Re, "http_.+")),
        Some(graft.model.ReadHints(stepMs = 2000L, func = "stddev_over_time")))
      val sd = r.readTimeSeries(q)
      val usedRollup = r.readSeries(q).queryExecution.executedPlan
        .toString.contains("samples_rollup")
      println(s"STDDEV-HINT: ${sd.head.samples} rollup-served=$usedRollup")
    }

    // multimodal: resize + frame sampling over the documents fixture
    val media = graft.ext.Multimodal.asMedia(spark, "/root/testdata/sf0.001")
    val rz = graft.ext.Multimodal.resize(media, maxBytes = 64)
    println(s"RESIZE: ${rz.count()} payloads, max bytes=${rz.collect().map(_.media.length).max}")
    val fr = graft.ext.Multimodal.sampleFrames(media, stepMs = 100L)
    println(s"FRAMES: ${fr.count()} frames from ${media.count()} docs")

    // epoch shuffle: distributed rank == a permutation; seeds independent
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ep1 = graft.ext.Shuffle.deterministicOrder(docs, "doc_id", "ep1")
      .select($"doc_id", $"pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ep2 = graft.ext.Shuffle.deterministicOrder(docs, "doc_id", "ep2")
      .select($"doc_id", $"pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    println(s"SHUFFLE: n=${ep1.size} perm=${ep1.values.toSeq.sorted == (0L until ep1.size)}" +
      s" fixedPointsAcrossSeeds=${ep1.count { case (d, p) => ep2(d) == p }}")

    // int8 quantization + label centroids over the embeddings fixture
    graft.SparkEntry.queries("s4_quantize_int8")(spark, "/root/testdata/sf0.001").show(2, 60)
    graft.SparkEntry.queries("s5_label_centroid")(spark, "/root/testdata/sf0.001")
      .orderBy($"label", $"pos").show(3, false)

    // streaming doc dedup: duplicate content suppressed across batches
    locally {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val st = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = graft.streaming.DocStream.firstSeenDocs(spark,
          st.toDF().select($"_1".as("doc_id"), $"_2".as("text")))
        .toDF("ch", "doc_id", "text")
        .writeStream.format("memory").queryName("smoke_docs").outputMode("append").start()
      st.addData((7L, "alpha"), (3L, "alpha"), (5L, "beta"))
      q.processAllAvailable()
      st.addData((9L, "alpha"), (2L, "gamma"))
      q.processAllAvailable()
      println("DOCSTREAM: " + spark.table("smoke_docs").collect()
        .map(r => s"${r.getString(2)}->${r.getLong(1)}").sorted.mkString(", "))
      q.stop()

      // curated stream: quality gate ahead of the dedup state
      val good = Seq.fill(60)("word").mkString(" ")
      val st2 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q2 = graft.streaming.DocStream.curatedDocs(spark,
          st2.toDF().select($"_1".as("doc_id"), $"_2".as("text")))
        .toDF("ch", "doc_id", "text")
        .writeStream.format("memory").queryName("smoke_curated").outputMode("append").start()
      st2.addData((1L, good), (2L, good), (3L, "too short"))
      q2.processAllAvailable()
      println("CURATED: kept=" + spark.table("smoke_curated").collect()
        .map(_.getLong(1)).sorted.mkString(","))
      q2.stop()
    }

    // substring-level dedup: duplicated-span extents on the fixture corpus
    graft.SparkEntry.queries("d10_substring_dedup")(spark, "/root/testdata/sf0.001")
      .orderBy($"doc_id", $"span_start").show(3, false)

    // incremental keeper election: contracted-graph CC over a day's pairs
    locally {
      val dir = "/root/testdata/sf0.001"
      val docs = graft.queries.Tables(spark, dir, "documents").select("doc_id")
      val pairs = graft.queries.DedupQueries.minhashPairs(spark, dir)
        .select("doc_a", "doc_b")
      val baseKeepers = graft.queries.DedupQueries.keepList(
        pairs.where($"doc_a" % 2 === 1 && $"doc_b" % 2 === 1),
        docs.where($"doc_id" % 2 === 1))
      val inc = graft.queries.DedupQueries.keepListIncremental(baseKeepers,
        pairs.where($"doc_a" % 2 === 0 || $"doc_b" % 2 === 0),
        docs.where($"doc_id" % 2 === 0))
      val merged = inc.where($"doc_id" =!= $"keep_id").count()
      println(s"KEEPLIST-INC: rows=${inc.count()} dedupedDocs=$merged")
    }

    // dataset-card report over the documents fixture + the snapshot diff
    graft.SparkEntry.queries("rp1_corpus_stats")(spark, "/root/testdata/sf0.001")
      .orderBy($"source", $"lang").show(3, false)
    println("DIFF: " + graft.SparkEntry.queries("rp2_corpus_diff")(spark, "/root/testdata/sf0.001")
      .groupBy($"status").count().collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
      .sorted.mkString(", "))

    // live dataset card over a document stream
    locally {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val st = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String, String)]
      val q = graft.streaming.DocStream.runningCorpusStats(
          st.toDF().select($"_1".as("source"), $"_2".as("lang"), $"_3".as("text")))
        .writeStream.format("memory").queryName("smoke_card").outputMode("complete").start()
      st.addData(("web", "en", "one two"), ("web", "en", "three"))
      q.processAllAvailable()
      println("CARD: " + spark.table("smoke_card").collect()
        .map(r => s"${r.getString(0)}/${r.getString(1)}:docs=${r.getLong(2)},toks=${r.getLong(3)}")
        .mkString(", "))
      q.stop()
    }

    // streaming funnel: state carries stage across micro-batches
    locally {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val st = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Long, String)]
      def t(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000)
      val q = graft.streaming.EventStream.funnel(spark,
          st.toDF().select($"_1".as("user_id"), $"_2".as("ts"),
            $"_3".as("event_id"), $"_4".as("event_type")))
        .toDF("user_id", "stage")
        .writeStream.format("memory").queryName("smoke_funnel")
        .outputMode("update").start()
      st.addData((1L, t(0), 1L, "view"), (1L, t(1), 2L, "click"), (2L, t(0), 3L, "view"))
      q.processAllAvailable()
      st.addData((1L, t(2), 4L, "purchase"), (2L, t(3), 5L, "error"))
      q.processAllAvailable()
      val stages = spark.table("smoke_funnel").groupBy($"user_id")
        .agg(max($"stage").as("s")).collect()
        .map(r => s"u${r.getLong(0)}=stage${r.getInt(1)}").sorted.mkString(", ")
      println("FUNNEL: " + stages) // expect u1=stage3 (completed), u2=stage1
      q.stop()
    }

    // real codecs (r8): PNG decode round-trip, WAV metadata, bilinear resize
    locally {
      val png = graft.ext.Multimodal.syntheticPng(17L)
      val Some((w, h, c, m)) = graft.ext.Multimodal.decodeImage(png)
      println(s"IMG-DECODE: ${png.length} B png -> ${w}x$h c=$c mean=$m")
      val Some(rz) = graft.ext.Multimodal.resizeImage(png, maxDim = 8)
      val Some((rw, rh, _, rm)) = graft.ext.Multimodal.decodeImage(rz)
      println(s"IMG-RESIZE: -> ${rw}x$rh mean=$rm (constant preserved=${rm == m})")
      val wav = graft.ext.Multimodal.syntheticWav(17L)
      val Some((rate, ch, frames, mean)) = graft.ext.Multimodal.decodeWav(wav)
      println(s"WAV-DECODE: ${wav.length} B wav -> rate=$rate ch=$ch frames=$frames mean=$mean")
      graft.SparkEntry.queries("mm4_audio_meta")(spark, "/root/testdata/sf0.001").show(2, false)
    }

    // sketch-quantile mode (r8): the at-scale percentile swap, flag-driven
    locally {
      spark.conf.set("spark.graft.sketchQuantiles", "true")
      try {
        val t8 = graft.SparkEntry.queries("t8_quality_gate")(spark, "/root/testdata/sf0.001")
        println(s"SKETCH-T8: kept=${t8.count()} planHasPercentile=" +
          t8.queryExecution.executedPlan.toString.toLowerCase.contains("percentile"))
      } finally spark.conf.unset("spark.graft.sketchQuantiles")
    }

    // live drift card (r8): stream new-side docs against batch base cuts
    locally {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val cuts = graft.queries.CurationQueries.decileCuts(
        docs.where($"doc_id" % 10 < 8).select($"lang",
          size(graft.ext.TextAnalysis.words($"text")).as("t")), sketchQuantiles = false)
      val st = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
      val q = graft.streaming.DocStream.driftCard(
          st.toDF().select($"_1".as("lang"), $"_2".as("text")), cuts)
        .writeStream.format("memory").queryName("smoke_drift").outputMode("complete").start()
      st.addData(("en", "one two three"), ("en", "four"))
      q.processAllAvailable()
      println("DRIFT-CARD: " + spark.table("smoke_drift").collect()
        .map(r => s"${r.getString(0)}/b${r.getInt(1)}=${r.getLong(2)}").sorted.mkString(", "))
      q.stop()
    }

    // live DAU/WAU + retention cards (r8): delta-state streaming ev3/ev4
    locally {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val st = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp)]
      val q = graft.streaming.EventStream.activeUsers(spark,
          st.toDF().select($"_1".as("user_id"), $"_2".as("ts")))
        .writeStream.format("memory").queryName("smoke_dau").outputMode("complete").start()
      st.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
        (1L, ts("2024-01-03 09:00:00")))
      q.processAllAvailable()
      println("DAU-CARD: " + spark.table("smoke_dau").collect()
        .map(r => s"${r.getString(0)}:dau=${r.getLong(1)},wau=${r.getLong(2)}")
        .sorted.mkString(", "))
      q.stop()
    }

    // streaming decontamination gate: bloom probe map-side, zero state
    locally {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import graft.ext.TextAnalysis.{shingles, words}
      val bloom = Seq("leaked benchmark question text here").toDF("text")
        .select(explode(shingles(words($"text"), 4)).as("g"))
        .agg(graft.functions.bloom_agg(xxhash64($"g")).as("bf"))
        .head.getAs[Array[Byte]](0)
      val st = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
      val q = graft.streaming.DocStream.decontamGate(
          st.toDF().select($"_1".as("doc_id"), $"_2".as("text")), bloom)
        .select($"doc_id", $"maybe_contaminated")
        .writeStream.format("memory").queryName("smoke_decontam")
        .outputMode("append").start()
      st.addData((1L, "totally novel writing"), (2L, "leaked benchmark question text here"))
      q.processAllAvailable()
      println("DECONTAM: " + spark.table("smoke_decontam").collect()
        .map(r => s"${r.getLong(0)}=${r.getBoolean(1)}").sorted.mkString(", "))
      q.stop()
    }

    // training-shard export: ordered docs -> numbered shard files -> read back
    locally {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      val ordered = graft.ext.Shuffle.deterministicOrder(docs, "doc_id", "ep1")
      val dir = java.nio.file.Files.createTempDirectory("smoke_shards_").toString
      graft.sources.DocShards.write(ordered, "pos", dir, shards = 3)
      val back = graft.sources.DocShards.read(spark, dir)
      println(s"DOCSHARDS: ${back.count()} docs over " +
        s"${new java.io.File(dir).listFiles().length} shards; head=" +
        back.orderBy($"shard", $"rec_no").select($"doc_id").head.getLong(0))
    }

    // near-dup base compaction: a legacy FLAT base (root-level appends)
    // migrates into the two-tier layout and stays fully readable through
    // the one read surface (nearDupBaseSigs — never the raw root)
    locally {
      val base = java.nio.file.Files.createTempDirectory("smoke_ndbase_").toString + "/base"
      val rows = Seq((1L, Seq("a b", "b c"), Seq(1L, 2L)), (2L, Seq("c d"), Seq(3L, 4L)))
      rows.foreach { r =>
        Seq(r).toDF("doc_id", "sh", "sig")
          .write.mode("append").parquet(base)
      }
      graft.tools.Compact.nearDupBase(spark, base, files = 1)
      println("NDCOMPACT: rows=" +
        graft.streaming.DocStream.nearDupBaseSigs(spark, base).count() +
        " tiers=" + new java.io.File(base).listFiles()
          .filter(_.isDirectory).map(_.getName).sorted.mkString(","))
    }
    // r9: header-only fast path vs real decode, perceptual near-dup pairs
    locally {
      val png = graft.ext.Multimodal.syntheticPng(17L)
      val Some((fmt, hw, hh)) = graft.ext.Multimodal.parseImageHeader(png)
      println(s"IMG-HEADER: $fmt ${hw}x$hh (header bytes only, no pixel decode)")
      val pairs = graft.SparkEntry.queries("mmd1_image_neardup")(spark, "/root/testdata/sf0.001")
      println(s"IMG-NEARDUP: ${pairs.count()} perceptual pairs; sample:")
      pairs.orderBy($"doc_a", $"doc_b").show(3, false)
    }

    // r9: URL gate — normalize + blocklist + word filter, zero corpus shuffle
    locally {
      val g = graft.SparkEntry.queries("url1_url_filter")(spark, "/root/testdata/sf0.001")
      val blocked = g.where($"blocked" === 1).count()
      println(s"URL-GATE: ${g.count()} urls, $blocked blocked; sample:")
      g.orderBy($"doc_id").show(3, false)
    }

    // r9: live embedding-drift card — base centroids broadcast, one
    // streaming agg, state bounded by labels x dim
    locally {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val base = graft.queries.CurationQueries.labelCentroids(
        emb.where($"vec_id" % 10 < 8), dim = 64)
      val st = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Int, Seq[Float])]
      val q = graft.streaming.DocStream.embeddingDriftCard(
          st.toDF().select($"_1".as("label"), $"_2".as("embedding")), base, dim = 64)
        .writeStream.format("memory").queryName("smoke_embdrift")
        .outputMode("complete").start()
      st.addData(emb.where($"vec_id" % 10 >= 8).select("label", "embedding")
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).toIndexedSeq: _*)
      q.processAllAvailable()
      println("EMB-DRIFT: " + spark.table("smoke_embdrift").collect()
        .map(r => f"${r.getInt(0)}:cos=${r.getDouble(2)}%.4f").sorted.take(4).mkString(", "))
      q.stop()
    }

    // r9: JSONL interchange — full-schema shard round trip on ShardIO
    locally {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val dir = java.nio.file.Files.createTempDirectory("smoke_jsonl_").toString
      graft.sources.Jsonl.write(docs, dir, shards = 3)
      val back = graft.sources.Jsonl.read(spark, dir, docs.schema)
      println(s"JSONL: ${back.count()} docs over " +
        new java.io.File(dir).listFiles().count(_.getName.endsWith(".jsonl.gz")) +
        s" gz shards, committed=${graft.sources.Jsonl.committed(spark, dir)}")
    }

    // r10: the raw-crawl front door end-to-end — synthetic pages as WARC
    // response shards, read back with envelopes stripped, html→text, then
    // the whole crawl→artifacts driver
    locally {
      val pages = graft.ext.HtmlText.asGeneratedPages(spark, "/root/testdata/sf0.001")
        .toDF().limit(60)
      val crawl = java.nio.file.Files.createTempDirectory("smoke_crawl_").toString
      graft.sources.Warc.writeResponses(pages, crawl, shards = 2)
      val extracted = graft.ext.HtmlText.extractFrame(
        graft.sources.Warc.readResponses(spark, crawl))
      println(s"HTML: ${extracted.count()} pages extracted; sample blocks=" +
        extracted.toDF().orderBy("doc_id").head().getAs[Int]("n_blocks"))
      val out = java.nio.file.Files.createTempDirectory("smoke_crawlrun_").toString
      val r = graft.tools.Curate.fromCrawl(spark, crawl, out, shards = 2)
      println(s"CRAWL->ARTIFACTS: ${r.docs} docs kept, stages=" +
        r.stages.map { case (n, t) => f"$n=$t%.1fs" }.mkString(",") +
        s", committed=${graft.tools.Curate.committed(spark, out)}")
    }

    // r10: perceptual fingerprints — image dHash + audio energy hash, one
    // banded gate for both
    locally {
      import graft.ext.Multimodal
      val img = Multimodal.dHash(Multimodal.syntheticNearDupPng(7L, 50)).get
      val imgCopy = Multimodal.dHash(Multimodal.syntheticNearDupPng(57L, 50)).get
      val aud = Multimodal.audioHash(Multimodal.syntheticNearDupWav(7L, 50)).get
      val audCopy = Multimodal.audioHash(Multimodal.syntheticNearDupWav(57L, 50)).get
      println(f"PERCEPTUAL: img hamming(base,copy)=${java.lang.Long.bitCount(img ^ imgCopy)} " +
        f"audio hamming(base,copy)=${java.lang.Long.bitCount(aud ^ audCopy)}")
    }

    // r11: ranked retrieval — BM25 scan vs index-served parity, postings
    // pages, phrase match
    locally {
      val dir = "/root/testdata/sf0.001"
      val scan = graft.SparkEntry.queries("bm1_bm25_topk")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val served = graft.SparkEntry.queries("ii2_bm25_served")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      println(s"BM25: top-${scan.length} scan==index-served: ${scan.sameElements(served)}; " +
        s"head=${scan.take(3).mkString(",")}")
      val pp = graft.SparkEntry.queries("pp1_phrase_match")(spark, dir).count()
      println(s"PHRASE: $pp docs matched 'hash join'")
    }

    // r11: link graph — outlinks through the real scanner, PageRank mass
    // conservation, anchor pages
    locally {
      val dir = "/root/testdata/sf0.001"
      val pr = graft.SparkEntry.queries("pr1_host_pagerank")(spark, dir)
      val mass = pr.agg(org.apache.spark.sql.functions.sum("pagerank"))
        .head().getDouble(0)
      println(f"PAGERANK: ${pr.count()} hosts, mass=$mass%.4f (≈1 when no dangling)")
      val anchors = graft.SparkEntry.queries("lnk2_anchor_text")(spark, dir)
        .orderBy(org.apache.spark.sql.functions.col("n_links").desc).head()
      println(s"ANCHORS: top host=${anchors.getLong(0)} n_links=${anchors.getLong(1)} " +
        s"texts=${anchors.getString(2)}")
    }

    // r12: dangling-mass pagerank, multi-page postings, polite frontier
    locally {
      import org.apache.spark.sql.functions.{col, sum}
      val dir = "/root/testdata/sf0.001"
      val pr2 = graft.SparkEntry.queries("pr2_dangling_pagerank")(spark, dir)
      val mass2 = pr2.agg(sum("pagerank")).head().getDouble(0)
      println(f"PAGERANK-DANGLING: ${pr2.count()} hosts, mass=$mass2%.4f (=1 with sinks)")
      val shards = graft.SparkEntry.queries("ii3_postings_shards")(spark, dir)
      val maxPage = shards.agg(org.apache.spark.sql.functions.max("page_no"))
        .head().getLong(0)
      println(s"POSTINGS-SHARDS: ${shards.count()} pages, deepest page_no=$maxPage")
      // polite frontier: one-batch drive through a real streaming query
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ms = MemoryStream[(String, Long)]
      ms.addData((1L to 5L).map(i => (s"https://h.example/p$i", i)): _*)
      val seen = new java.util.concurrent.atomic.AtomicInteger()
      val q = graft.streaming.DocStream.politeFrontier(spark,
          ms.toDS().map(r => graft.streaming.DocStream.FrontierRow(r._1, r._2)),
          perTrigger = 2)
        .writeStream
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("smoke_polite_").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[graft.streaming.DocStream.PoliteRow],
              _: Long) => seen.addAndGet(b.collect().length); ()
        }
        .start()
      q.awaitTermination(60000); q.stop()
      println(s"POLITE-FRONTIER: ${seen.get()} of 5 urls released (cap 2/host/trigger)")
      // merges.txt artifact: write, read back, serve the loaded rules
      val dict = spark.read.parquet(s"$dir/documents.parquet")
        .select(org.apache.spark.sql.functions.explode(
          graft.ext.TextAnalysis.words(col("text"))).as("w"))
        .where(org.apache.spark.sql.functions.length(col("w")) > 0)
        .groupBy("w").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
      val rules = graft.ext.Bpe.batchedMerges(dict, 16, 16).map(m => (m._2, m._3))
      val mPath = java.nio.file.Files.createTempDirectory("smoke_merges_")
        .toString + "/merges.txt"
      graft.ext.Bpe.writeMerges(spark, rules, mPath)
      val loaded = graft.ext.Bpe.readMerges(spark, mPath)
      println(s"MERGES-ARTIFACT: ${loaded.size} rules round-tripped, " +
        s"equal=${loaded == rules}")

      // r13 serving artifacts: persisted ANN index (build once, serve the
      // s3/s6/s8-shaped queries + frozen-centroid append) and the scored
      // BM25 full index (serve + incremental append)
      val annPath = java.nio.file.Files.createTempDirectory("smoke_ann_")
        .toString + "/index"
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      graft.ext.AnnIndex.write(spark, emb.where(col("vec_id") % 10 < 8), annPath)
      graft.ext.AnnIndex.append(spark, annPath, emb.where(col("vec_id") % 10 >= 8))
      val annQ = emb.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val ivf = graft.queries.SimilarityQueries
        .ivfServedTopK(spark, annPath, annQ, 6, 5).count()
      val qnt = graft.queries.SimilarityQueries
        .quantizedServedTopK(spark, annPath, annQ, 5).count()
      val pq = graft.queries.SimilarityQueries
        .pqServedTopK(spark, annPath, annQ, 5).count()
      val adc = graft.queries.SimilarityQueries
        .ivfPqrServedTopK(spark, annPath, annQ, 6, 5, candMult = 20).count()
      println(s"ANN-INDEX: committed=${graft.ext.AnnIndex.committed(spark, annPath)} " +
        s"ivf_rows=$ivf quantized_rows=$qnt pq_rows=$pq ivfadc_residual_rows=$adc " +
        s"snapshot=${graft.ext.AnnIndex.readSnapshot(spark, annPath).map(_.v)}")

      val fidx = java.nio.file.Files.createTempDirectory("smoke_fidx_")
        .toString + "/index"
      val docsAll = spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "text")
      graft.queries.RetrievalQueries.fullIndexWriteScored(
        docsAll.where(col("doc_id") % 2 === 1), fidx, shards = 4)
      graft.queries.RetrievalQueries.fullIndexAppendScored(
        docsAll.where(col("doc_id") % 2 === 0), fidx, shards = 4)
      val bm = graft.queries.RetrievalQueries
        .bm25FromIndex(spark, fidx, Seq("spark", "join"), 10).collect()
      val bmCap = graft.queries.RetrievalQueries
        .bm25FromIndexCapped(spark, fidx, Seq("spark", "join"), 10, 1L << 20)
        .collect()
      // the ONE serve entry, at a BINDING cap (32 ≪ the fixture dfs):
      // the sidecar dfs route it to the two-stage completion — capped
      // prefixes vote candidates, exact sidecar df + true tf complete
      val bmTwo = graft.queries.RetrievalQueries
        .bm25Serve(spark, fidx, Seq("spark", "join"), 10, 32L)
        .collect()
      val binds = graft.queries.RetrievalQueries
        .capBinds(spark, fidx, Seq("spark", "join"), 32L)
      println(s"BM25-FULL-INDEX: top=${bm.take(3).map(r =>
        s"${r.getLong(0)}:${r.getDouble(1)}").mkString(",")} rows=${bm.length} " +
        s"capped_equal=${bm.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
          bmCap.map(r => (r.getLong(0), r.getDouble(1))).toSeq} " +
        s"dispatch_binding_cap_equal=${bm.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
          bmTwo.map(r => (r.getLong(0), r.getDouble(1))).toSeq} " +
        s"cap_binds=$binds " +
        s"committed=${graft.queries.RetrievalQueries.scoredIndexCommitted(spark, fidx)}")

      // r17 retrieval-stack post-passes: hybrid RRF fusion (scan + served
      // forms), PRF query expansion, MMR diversification
      val hyb = graft.queries.HybridQueries.hybridRrfTopK(
        docsAll, emb, Seq("spark", "join"), 0L, 30, 10).collect()
      val exp = graft.queries.PrfQueries.expansionTerms(
        docsAll, Seq("spark", "join"), 5, 8).collect()
      val prf = graft.queries.PrfQueries.bm25ExpandedTopK(
        docsAll, Seq("spark", "join"), 5, 8, 10).collect()
      println(s"RETRIEVAL-STACK: hybrid_rows=${hyb.length} " +
        s"hybrid_top=${hyb.take(2).map(r => s"${r.getLong(0)}:${r.getDouble(1)}").mkString(",")} " +
        s"expansion=${exp.map(_.getString(0)).mkString("/")} " +
        s"expanded_rows=${prf.length}")

      // r17 contrastive mining: BM25 hard negatives for ad-hoc anchors +
      // triplets from the dedup clusters
      val anchors = docsAll.orderBy(col("doc_id")).limit(2)
        .select(col("doc_id").as("anchor_id"))
      val hneg = graft.queries.NegativeQueries
        .hardNegatives(docsAll, anchors, 5, 5).collect()
      val keepers = graft.queries.DedupQueries.keepList(
        graft.queries.DedupQueries.minhashPairs(spark, dir), docsAll)
      val tri = graft.queries.NegativeQueries
        .trainingTriplets(docsAll, keepers, 2, 5, 3).collect()
      println(s"CONTRASTIVE: hard_neg_rows=${hneg.length} " +
        s"neg_top=${hneg.take(2).map(r =>
          s"${r.getLong(0)}->${r.getLong(1)}@${r.getDouble(3)}").mkString(",")} " +
        s"triplet_rows=${tri.length} " +
        s"triplet_anchors=${tri.map(_.getLong(0)).distinct.sorted.mkString("/")}")

      // r17 second ranking model + sketched corpus-overlap card
      val qlm = graft.queries.RetrievalQueries
        .qlmScoredDocs(docsAll, Seq("join", "spark"), 2000.0)
        .orderBy(col("s").desc, col("doc_id")).limit(3).collect()
      val card = graft.SparkEntry.queries("kmv2_overlap_sketch")(spark, dir)
        .collect()(0)
      val cardExact = graft.SparkEntry.queries("kmv1_overlap_exact")(spark, dir)
        .collect()(0)
      println(f"OVERLAP-CARD: qlm_top=${qlm.map(r =>
          s"${r.getLong(0)}:${"%.4f".format(r.getDouble(1))}").mkString(",")} " +
        f"exact=(${cardExact.getLong(0)},${cardExact.getLong(1)},${cardExact.getLong(2)}) " +
        f"est=(${card.getDouble(0)}%.0f,${card.getDouble(1)}%.0f,${card.getDouble(2)}%.1f)")

      // r17 serving extras: batch serve (one pruned scan for Q queries),
      // spell suggestion from the df sidecar, snippets for the top hits
      val batch = graft.queries.RetrievalQueries.bm25FromIndexBatch(spark,
        fidx, Seq("qa" -> Seq("spark", "join"), "qb" -> Seq("sort", "merge")), 5)
        .collect()
      val dym = graft.queries.RetrievalQueries.didYouMean(
        graft.queries.RetrievalQueries.readScoredDfs(spark, fidx).get
          .select(col("term"), col("df").cast("long").as("df")),
        Seq("spakr"), 2, 3).collect()
      val snip = graft.queries.RetrievalQueries.snippets(
        docsAll, Seq("spark", "join"), 2, 8).collect()
      println(s"SERVE-EXTRAS: batch_rows=${batch.length} " +
        s"batch_qs=${batch.map(_.getString(0)).distinct.sorted.mkString("/")} " +
        s"dym=${dym.map(r => s"${r.getString(0)}->${r.getString(1)}").mkString(",")} " +
        s"snippets=${snip.map(r => s"${r.getLong(0)}@${r.getLong(1)}:${r.getLong(2)}hits").mkString(",")}")
    }
    spark.stop()
  }
}
