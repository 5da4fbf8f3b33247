package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level API for the engine's custom functions. All are native
  * Catalyst expressions (codegen'd) — no Scala UDF wrapping. */
package object functions {

  import org.apache.spark.sql.graftbridge.{column => col, expression}

  /** FNV-1a 64 fingerprint of a `map<string,string>` labels column. */
  def labels_fingerprint(labels: Column): Column =
    col(LabelsFingerprint(expression(labels)))

  /** Canonical (name-sorted, minimally-escaped) JSON of a labels map. */
  def labels_json(labels: Column): Column =
    col(LabelsCanonicalJson(expression(labels)))

  /** Order-preserving (ts, value) → decimal(38,0) pack; min/max over it
    * hash-aggregates where min/max(struct) would force a SortAggregate. */
  def ts_val_encode(ts: Column, v: Column): Column =
    col(TsValEncode(expression(ts), expression(v)))
  def ts_val_ts(enc: Column): Column = col(TsValTs(expression(enc)))
  def ts_val_v(enc: Column): Column = col(TsValV(expression(enc)))

  /** Order-preserving (long, long) pack — a hash-aggregable min_by/max_by
    * ordering key where a struct key would force SortAggregate. */
  def long_pair_encode(a: Column, b: Column): Column =
    col(LongPairEncode(expression(a), expression(b)))

  /** Register SQL names for all custom functions on a session.
    * Idempotent: skips if already registered (re-registering logs a
    * "replaced a previously registered function" warning per call, which
    * floods the bench/verify output). */
  def registerAll(spark: SparkSession): Unit = {
    import graft.ext._
    val registry = spark.sessionState.functionRegistry
    if (registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("labels_fingerprint"))) return
    registry.createOrReplaceTempFunction(
      "labels_fingerprint", exprs => LabelsFingerprint(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "labels_json", exprs => LabelsCanonicalJson(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "dot_f", exprs => DotProductF(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    registry.createOrReplaceTempFunction(
      "minhash_signature", exprs => MinHashSignature(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int]), "built-in")
    registry.createOrReplaceTempFunction(
      "rolling_fingerprint", exprs => RollingFingerprint(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]), "built-in")
    registry.createOrReplaceTempFunction(
      "lsh_buckets", exprs => LshBuckets(exprs(0),
        exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int]), "built-in")
    registry.createOrReplaceTempFunction(
      "jaccard_sim", exprs => JaccardSim(exprs(0), exprs(1)), "built-in")
  }
}
