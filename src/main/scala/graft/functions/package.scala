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

  /** DDSketch quantile partial over a group's double values → binary
    * (deterministic, merge-order-independent; see [[DDOps]]). */
  def dd_hist(v: Column, alpha: Double = DDOps.DefaultAlpha): Column =
    col(DDHistAgg(expression(v), alpha).toAggregateExpression())

  /** Re-merge serialized [[dd_hist]] sketches (rollup partial combine). */
  def dd_hist_merge(h: Column): Column =
    col(DDHistMergeAgg(expression(h)).toAggregateExpression())

  /** q-quantile from sketch bytes, within relative error α of a true
    * value; null for an empty sketch. */
  def dd_quantile(h: Column, q: Double): Column =
    col(DDQuantile(expression(h), q))

  /** Register SQL names for all custom functions on a session — the full
    * table (with `DESCRIBE FUNCTION` info and literal-argument validation)
    * lives in [[graft.plans.GraftFunctions]]; config-driven sessions get
    * the same set via `spark.sql.extensions=graft.plans.GraftExtensions`. */
  def registerAll(spark: SparkSession): Unit =
    graft.plans.GraftFunctions.register(spark)
}
