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

  /** Register SQL names for the custom functions on a session. */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "labels_fingerprint", exprs => LabelsFingerprint(exprs.head), "built-in")
    registry.createOrReplaceTempFunction(
      "labels_json", exprs => LabelsCanonicalJson(exprs.head), "built-in")
  }
}
