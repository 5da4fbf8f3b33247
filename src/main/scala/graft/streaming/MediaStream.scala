package graft.streaming

import graft.ext.Multimodal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PERCEPTUAL near-dup curation — [[DocStream.startNearDupSink]]'s
  * discipline lifted from text shingles to the 64-bit perceptual-hash
  * domain, completing the multimodal streaming ladder: the same gate
  * serves images (dHash) and audio (energy-envelope hash) because both
  * the banding (4×16-bit equi-join keys, mmd1/mmd2's) and the verify
  * (Hamming ≤ 3, pigeonhole-exact under the banding) are hash-domain
  * -agnostic. Per micro-batch:
  *
  *   1. decode + hash the batch's media map-side (the ONLY stage that
  *      touches bytes; state is hashes only — 16 B/doc, never media);
  *   2. within-batch components over banded pairs
  *      ([[graft.queries.MultimodalQueries.dHashPairs]] + min-label CC);
  *   3. band-probe the batch against the ACCUMULATED base — the base is
  *      kept BAND-PARTITIONED (`bands/kb=` + `hashes/db=` hive layout,
  *      [[probePerceptualBase]]), so the probe statically prunes to the
  *      buckets the batch collides with: candidates only where a 16-bit
  *      band collides, verified exactly, per-trigger I/O tracking batch
  *      size, not base size;
  *   4. accept one keeper (min doc_id) per component, minus components
  *      any of whose members matched the base (family already
  *      represented);
  *   5. accepted (doc_id, hash) rows append ONE `delta/batch_id=`
  *      directory; the band index is derived at compaction
  *      ([[graft.tools.Compact.nearDupBase]] → [[foldCompact]]), never
  *      on the trigger path.
  *
  * REPLAY-IDEMPOTENT like the text sink: a replayed accepted row matches
  * itself in the base (Hamming 0), its component is suppressed, no second
  * row lands. */
object MediaStream {

  /** Map-side image hashing for a (doc_id, media) stream — real decode +
    * dHash; undecodable payloads drop (they can't near-dup). */
  def imageHashes(stream: DataFrame): DataFrame = {
    import stream.sparkSession.implicits._
    stream.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, m) => Multimodal.dHash(m).map(h => (id, h)) })
      .toDF("doc_id", "hash")
  }

  /** Map-side audio hashing — the energy-envelope fingerprint. */
  def audioHashes(stream: DataFrame): DataFrame = {
    import stream.sparkSession.implicits._
    stream.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, m) => Multimodal.audioHash(m).map(h => (id, h)) })
      .toDF("doc_id", "hash")
  }

  /** The perceptual near-dup sink over an ALREADY-HASHED (doc_id, hash)
    * stream (compose with [[imageHashes]]/[[audioHashes]] upstream so the
    * modality choice stays out of the state machinery). */
  def startPerceptualSink(hashed: DataFrame, basePath: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"),
      maxHamming: Int = 3): org.apache.spark.sql.streaming.StreamingQuery =
    hashed.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: DataFrame, id: Long) =>
        perceptualBatch(batch, basePath, maxHamming, id))
      .start()

  /** Two-tier base layout — [[DocStream]]'s LSM discipline (see
    * DocStream.BandBuckets scaladoc) in the 64-bit hash domain:
    * `delta/batch_id=<id>/` flat (doc_id, hash) per-trigger dirs
    * (append-mode; replays self-match and land nothing), plus the
    * COMPACTED tier `hashes/db=` +
    * `bands/kb=` rebuilt by [[graft.tools.Compact.nearDupBase]] (band
    * rows derived from hashes at compaction; `kb = pmod(xxhash64(band,
    * key), BandBuckets)` — raw dHash band bits are gradient bits, not
    * uniform, so they hash first). The per-trigger probe is partition-
    * pruned against the compacted tier and a plain frame probe against
    * the bounded deltas. */
  val BandBuckets = 1024
  val DocBuckets = 1024

  private[graft] def bandsDir(basePath: String) = s"$basePath/bands"
  private[graft] def hashesDir(basePath: String) = s"$basePath/hashes"
  private[graft] def deltaDir(basePath: String) = s"$basePath/delta"

  private def dirExists(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def nonEmptyDir(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  private val hashSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("hash", org.apache.spark.sql.types.LongType)))

  private def emptyHashes(spark: org.apache.spark.sql.SparkSession): DataFrame =
    graft.sources.ShardIO.emptyFrame(spark, hashSchema)

  private[graft] def deltaHashes(spark: org.apache.spark.sql.SparkSession,
      basePath: String): DataFrame =
    if (!nonEmptyDir(spark, deltaDir(basePath))) emptyHashes(spark)
    else spark.read.parquet(deltaDir(basePath))
      .select("doc_id", "hash")

  private[graft] def compactedHashes(spark: org.apache.spark.sql.SparkSession,
      basePath: String): DataFrame =
    if (!dirExists(spark, hashesDir(basePath))) emptyHashes(spark)
    else DocStream.cachedCompactedRead(spark, hashesDir(basePath)).select("doc_id", "hash")

  /** The accumulated base as a logical (doc_id, hash) frame — the ONE
    * read surface over the layout: compacted tier ∪ deltas. */
  def baseHashes(spark: org.apache.spark.sql.SparkSession, basePath: String): DataFrame =
    compactedHashes(spark, basePath).unionByName(deltaHashes(spark, basePath))

  private[graft] def kbOf(band: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column) =
    pmod(xxhash64(band, key), lit(BandBuckets.toLong))

  /** Batch doc_ids within `maxHamming` of ANY base doc — the pruned
    * probe against the compacted tier (band index read only for the
    * batch's `kb` buckets, hashes fetched only from the `db` buckets
    * candidates hit; both `isin` lists bounded by the bucket constants),
    * plus a plain banded frame probe against the bounded deltas. */
  private[graft] def probePerceptualBase(spark: org.apache.spark.sql.SparkSession,
      batchHashes: DataFrame, basePath: String, maxHamming: Int): DataFrame = {
    val deltaMatched = frameMatched(batchHashes,
      deltaHashes(spark, basePath), maxHamming)
    compactedPerceptualMatched(spark, batchHashes, basePath, maxHamming)
      .unionByName(deltaMatched).distinct()
  }

  private def frameMatched(batchHashes: DataFrame, baseHashes: DataFrame,
      maxHamming: Int): DataFrame =
    banded(baseHashes, "base_id", "hash_b")
      .join(banded(batchHashes, "new_id", "hash_n"), Seq("band", "key"))
      .where(bit_count(col("hash_b").bitwiseXOR(col("hash_n"))) <= maxHamming)
      .select(col("new_id").as("doc_id")).distinct()

  private def compactedPerceptualMatched(spark: org.apache.spark.sql.SparkSession,
      batchHashes: DataFrame, basePath: String, maxHamming: Int): DataFrame = {
    import spark.implicits._
    if (!dirExists(spark, bandsDir(basePath)))
      return Seq.empty[Long].toDF("doc_id")
    val pBand = banded(batchHashes, "new_id", "hash_n")
      .withColumn("kb", kbOf(col("band"), col("key")))
    // keys pushed as dir-grouped point predicates (DocStream.
    // keyPrunedScan scaladoc); the band index is sorted by (band, key)
    // per kb dir so pages prune per key — pushed on `key` alone (the
    // selective column; band has 4 values and rides the join for
    // exactness). One bounded collect serves dirs AND keys.
    val dirKeys = pBand.select("kb", "key").distinct()
      .limit(DocStream.MaxKeyPushdown + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val scan = DocStream.cachedCompactedRead(spark, bandsDir(basePath))
    val keyed =
      if (dirKeys.nonEmpty && dirKeys.length <= DocStream.MaxKeyPushdown)
        DocStream.keyPrunedScan(spark, scan, "key", "kb", dirKeys)
      else {
        val hitKb = pBand.select("kb").distinct()
          .collect().map(_.getLong(0)).toIndexedSeq
        scan.where(col("kb").isin(hitKb: _*))
      }
    val cand = keyed
      .select(col("doc_id").as("base_id"), col("band"), col("key"))
      .join(pBand.select(col("new_id"), col("hash_n"), col("band"), col("key")),
        Seq("band", "key"))
      .select("new_id", "hash_n", "base_id").distinct()
      .localCheckpoint() // feeds the db collect AND the verify once
    val candDirIds = cand
      .select(pmod(col("base_id"), lit(DocBuckets.toLong)).as("db"), col("base_id"))
      .distinct().limit(DocStream.MaxKeyPushdown + 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    if (candDirIds.isEmpty) return Seq.empty[Long].toDF("doc_id")
    val hashScan = DocStream.cachedCompactedRead(spark, hashesDir(basePath))
    val hScan =
      if (candDirIds.length <= DocStream.MaxKeyPushdown)
        DocStream.keyPrunedScan(spark, hashScan, "doc_id", "db", candDirIds)
      else {
        val hitDb = cand
          .select(pmod(col("base_id"), lit(DocBuckets.toLong)).as("db"))
          .distinct().collect().map(_.getLong(0)).toIndexedSeq
        hashScan.where(col("db").isin(hitDb: _*))
      }
    val baseH = hScan.select(col("doc_id").as("base_id"), col("hash").as("hash_b"))
    cand.join(baseH, "base_id")
      .where(bit_count(col("hash_b").bitwiseXOR(col("hash_n"))) <= maxHamming)
      .select(col("new_id").as("doc_id")).distinct()
  }

  /** Fold every delta into the compacted tier — DocStream.foldCompact's
    * protocol (stage both halves, swap hashes → bands, delete deltas;
    * re-run Compact after a crash). */
  private[graft] def foldCompact(spark: org.apache.spark.sql.SparkSession,
      basePath: String): Unit = {
    val all = baseHashes(spark, basePath)
    val root = new org.apache.hadoop.fs.Path(basePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the hash store is 16 B/row — index-tier treatment (snappy, small
    // pages) serves BOTH halves here; there is no KB-scale heavy column
    val hashStage = DocStream.stageWrite(fs,
      all.withColumn("db", pmod(col("doc_id"), lit(DocBuckets.toLong))),
      "db", Seq("doc_id"), hashesDir(basePath), heavyTier = false)
    val bandStage = DocStream.stageWrite(fs,
      banded(all, "doc_id", "hash")
        .withColumn("kb", kbOf(col("band"), col("key")))
        .select("band", "key", "doc_id", "kb"),
      "kb", Seq("band", "key"), bandsDir(basePath), heavyTier = false)
    DocStream.swap(fs, hashStage, hashesDir(basePath))
    DocStream.swap(fs, bandStage, bandsDir(basePath))
    fs.delete(new org.apache.hadoop.fs.Path(deltaDir(basePath)), true)
    DocStream.invalidateCompacted(basePath)
  }

  private[graft] def perceptualBatch(batch: DataFrame, basePath: String,
      maxHamming: Int, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val hashes = batch.select(col("doc_id").cast("long").as("doc_id"), col("hash"))
      .persist() // feeds three jobs: within-batch pairs, probe, delta write
    try {
      // replay-idempotent via self-match (DocStream.nearDupBatch): the
      // probe sees previously-landed rows, replays append nothing
      val baseMatched = probePerceptualBase(spark, hashes, basePath, maxHamming)
      acceptGivenMatched(hashes, baseMatched, maxHamming)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .option("compression", "zstd")
        .parquet(s"${deltaDir(basePath)}/batch_id=$batchId")
    } finally hashes.unpersist(blocking = false)
  }

  /** 4×16-bit band keys of a (id, hash) frame — the candidate-generation
    * keys shared with the batch operators. */
  private def banded(h: DataFrame, idOut: String, hashOut: String): DataFrame =
    h.select(col("doc_id").as(idOut), col("hash").as(hashOut),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("hash"), b * 16).bitwiseAND(lit(0xffffL))
            .as("key"))): _*)).as("bk"))
      .select(col(idOut), col(hashOut), col("bk.band"), col("bk.key"))

  /** The acceptance decision as a frame: accepted (doc_id, hash) rows of
    * `batchHashes` given `baseHashes`. The base probe is UNHINTED (the
    * text sink's policy): AQE broadcasts a normal micro-batch's band
    * keys; a backlog-sized replay shuffle-joins on the uniform band key. */
  private[graft] def acceptPerceptual(batchHashes: DataFrame, baseHashes: DataFrame,
      maxHamming: Int = 3): DataFrame =
    acceptGivenMatched(batchHashes,
      frameMatched(batchHashes, baseHashes, maxHamming), maxHamming)

  /** Keeper election given the already-computed set of batch doc_ids
    * that matched the base (DocStream.acceptGivenMatched's shape). */
  private[graft] def acceptGivenMatched(batchHashes: DataFrame,
      baseMatched: DataFrame, maxHamming: Int): DataFrame = {
    import graft.queries.{DedupQueries, MultimodalQueries}
    val batchPairs = MultimodalQueries.dHashPairs(batchHashes, maxHamming)
      .select("doc_a", "doc_b")
    val comp = DedupQueries.keepList(batchPairs, batchHashes.select("doc_id"))
    val killedComps = comp.join(baseMatched, "doc_id")
      .select("keep_id").distinct()
    comp.where(col("doc_id") === col("keep_id"))
      .join(killedComps, Seq("keep_id"), "left_anti")
      .select("doc_id")
      .join(batchHashes, "doc_id")
  }
}
