package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end curation DRIVER — one entry point that takes a raw
  * corpus directory and leaves behind the complete artifact set a training
  * job consumes. This is the "switch to this library" surface: every stage
  * is an operator the gate already checks individually (cur2's DAG = t5
  * gopher gate → d1 keeper election → d7 decontamination → t9 LM gate →
  * sm4 token budget → sh1 epoch order → pk1 packing; rp1's dataset card),
  * composed here into the artifact layout:
  *
  *   outDir/shards/    — the ordered training shards (DocShards framing,
  *                       (shard, rec#) reconstructs the training order)
  *   outDir/manifest/  — per-document JSONL manifest (doc_id, lang,
  *                       n_tokens, pos, offset) keyed by training position
  *   outDir/card/      — the rp1 dataset card as JSONL
  *
  * All three land atomically ([[graft.sources.ShardIO]]: temp + rename +
  * `_SUCCESS`), so a consumer checking [[committed]] never reads a
  * half-written run. Scale shape: one corpus-sized equi-join attaches text
  * to the kept mix (uniform doc_id keys); everything else is the
  * already-audited operator DAG.
  */
object Curate {

  final case class Result(docs: Long, shards: Int,
      stages: Seq[(String, Double)] = Seq.empty)

  def run(spark: SparkSession, corpusDir: String, outDir: String,
      shards: Int = 8): Result = {
    val stages = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      stages += name -> ((System.nanoTime() - t0) / 1e9)
      r
    }
    // PERSIST the manifest: three consumers (shard export, manifest
    // export, the count) would otherwise each re-run the full cur2 DAG —
    // the most expensive query in the bench — from the raw corpus.
    // mix_build times CONSTRUCTION + materialization together: the cur2
    // ordering/packing stages run driver-side bucket-count collects at
    // DataFrame-construction time, which at corpus scale are most of the
    // mix cost — timing only the final count would hide them.
    var nDocs = 0L
    val manifest = timed("mix_build") {
      val m = graft.SparkEntry.queries("cur2_training_mix")(spark, corpusDir)
        .persist()
      nDocs = m.count()
      m
    }
    try {
      val docs = graft.queries.Tables(spark, corpusDir, "documents")
      // the packed training stream: manifest order + document text; the
      // join is the run's one corpus exchange (both sides doc_id-keyed)
      timed("shard_export") {
        val ordered = manifest.select(col("doc_id"), col("pos"))
          .join(docs.select(col("doc_id"), col("text")), "doc_id")
        graft.sources.DocShards.write(ordered, "pos", s"$outDir/shards", shards)
      }
      timed("manifest_export") {
        graft.sources.Jsonl.write(manifest, s"$outDir/manifest", shards, keyCol = "pos")
      }
      timed("card_export") {
        graft.sources.Jsonl.write(
          graft.SparkEntry.queries("rp1_corpus_stats")(spark, corpusDir),
          s"$outDir/card", shards = 1, keyCol = "source")
      }
      Result(nDocs, shards, stages.toSeq)
    } finally manifest.unpersist(blocking = false)
  }

  /** True iff every artifact of a [[run]] completed. */
  def committed(spark: SparkSession, outDir: String): Boolean =
    Seq("shards", "manifest", "card")
      .forall(d => graft.sources.ShardIO.committed(spark, s"$outDir/$d"))

  def main(args: Array[String]): Unit = {
    val corpusDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_curate_").toString)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.Engine.install(spark)
    val r = run(spark, corpusDir, outDir)
    println(s"[curate] ${r.docs} docs -> $outDir (${r.shards} shards, " +
      s"committed=${committed(spark, outDir)})")
    spark.stop()
  }
}
