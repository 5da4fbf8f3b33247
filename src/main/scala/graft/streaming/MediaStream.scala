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
  *   3. band-probe the batch against the ACCUMULATED base hash table —
  *      candidates only where a 16-bit band collides, verified exactly;
  *   4. accept one keeper (min doc_id) per component, minus components
  *      any of whose members matched the base (family already
  *      represented);
  *   5. accepted (doc_id, hash) rows append to the base.
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
      .foreachBatch((batch: DataFrame, _: Long) =>
        perceptualBatch(batch, basePath, maxHamming))
      .start()

  private[graft] def perceptualBatch(batch: DataFrame, basePath: String,
      maxHamming: Int): Unit = {
    val spark = batch.sparkSession
    val hashes = batch.select(col("doc_id").cast("long").as("doc_id"), col("hash"))
      .persist() // feeds three jobs: within-batch pairs, probe, append
    try {
      val hPath = new org.apache.hadoop.fs.Path(basePath)
      val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val base =
        if (fs.exists(hPath)) spark.read.schema(hashes.schema).parquet(basePath)
        else hashes.limit(0)
      acceptPerceptual(hashes, base, maxHamming)
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .option("compression", "zstd").parquet(basePath)
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
      maxHamming: Int = 3): DataFrame = {
    import graft.queries.{DedupQueries, MultimodalQueries}
    val batchPairs = MultimodalQueries.dHashPairs(batchHashes, maxHamming)
      .select("doc_a", "doc_b")
    val comp = DedupQueries.keepList(batchPairs, batchHashes.select("doc_id"))
    val baseMatched = banded(baseHashes, "base_id", "hash_b")
      .join(banded(batchHashes, "new_id", "hash_n"), Seq("band", "key"))
      .where(bit_count(col("hash_b").bitwiseXOR(col("hash_n"))) <= maxHamming)
      .select(col("new_id").as("doc_id")).distinct()
    val killedComps = comp.join(baseMatched, "doc_id")
      .select("keep_id").distinct()
    comp.where(col("doc_id") === col("keep_id"))
      .join(killedComps, Seq("keep_id"), "left_anti")
      .select("doc_id")
      .join(batchHashes, "doc_id")
  }
}
