package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable as-of (backward) join — time-series alignment, the extension
  * SURVEY §2.3 notes the reference lacks.
  *
  * Spark-first formulation: instead of a range join (which Catalyst plans
  * as a BroadcastNestedLoopJoin / cartesian at scale), both sides are
  * unioned and swept with ONE window pass per partition key — a single
  * shuffle on the keys, linear work, no pair explosion. `last(...,
  * ignoreNulls)` over an unbounded-preceding frame ordered by (time, side)
  * makes a same-instant right row visible to the left row (ASOF `>=`
  * semantics).
  *
  * Scale notes: the exchange keys on the join keys (cardinality-bounded by
  * the entity space, uniform for id-like keys); per-partition state inside
  * the window is one row of carried payload. If one key is degenerately hot
  * the standard salting/two-phase tricks apply upstream (`ext.Salting`).
  */
object AsOf {

  /** For each `left` row, attach the payload of the most recent `right`
    * row with `right.timeCol <= left.timeCol` within the same `on` keys
    * (NULLs when no such row). Right payload columns are emitted as
    * `prefix+name`, plus `prefix+timeCol` = the matched right row's time.
    *
    * `right` should hold at most one row per (keys, instant) — pre-dedup
    * with max_by/arg-max if ties are possible (determinism). */
  def joinBackward(left: DataFrame, right: DataFrame, on: Seq[String],
      timeCol: String, payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one partition key")
    val leftSchema = left.schema
    val rightSchema = right.schema
    val outPayload = payload.map(prefix + _) :+ (prefix + timeCol)

    var r = right.select((on :+ timeCol).map(col) ++
        payload.map(c => col(c).as(prefix + c)): _*)
      .withColumn(prefix + timeCol, col(timeCol))
      .withColumn("__side", lit(0))
    for (c <- left.columns if !on.contains(c) && c != timeCol)
      r = r.withColumn(c, lit(null).cast(leftSchema(c).dataType))

    var l = left.withColumn("__side", lit(1))
    for (c <- payload)
      l = l.withColumn(prefix + c, lit(null).cast(rightSchema(c).dataType))
    l = l.withColumn(prefix + timeCol, lit(null).cast(leftSchema(timeCol).dataType))

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = outPayload.foldLeft(r.unionByName(l.select(r.columns.map(col): _*))) {
      (df, c) => df.withColumn(c,
        last(when(col("__side") === 0, col(c)), ignoreNulls = true).over(w))
    }
    swept.where(col("__side") === 1)
      .select(left.columns.map(col) ++ outPayload.map(col): _*)
  }

  /** Forward variant: nearest right row with `right.timeCol >= left.timeCol`
    * — the backward sweep over negated time (same single-shuffle plan).
    * `timeCol` must be numeric (epoch millis/micros). The matched right
    * row's time surfaces as `prefix+timeCol`, like the backward form. */
  def joinForward(left: DataFrame, right: DataFrame, on: Seq[String],
      timeCol: String, payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val neg = "__negt"
    joinBackward(
      left.withColumn(neg, -col(timeCol)),
      right.withColumn(neg, -col(timeCol)),
      on, neg, payload :+ timeCol, prefix)
      .drop(neg, prefix + neg)
  }
}
