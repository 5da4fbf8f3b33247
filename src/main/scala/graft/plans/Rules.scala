package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: comparisons against a timestamp derived monotonically
  * from a raw int64-nanos column — `timestamp_micros(ts DIV 1000) cmp lit`
  * — imply bounds on the raw column itself. Catalyst can't see through the
  * conversion, so the timestamp predicate stays un-pushable and a 100 TB
  * scan reads every row group. This rule conjoins the implied raw-column
  * bound (redundant w.r.t. the original predicate, so semantics are
  * untouched) which then pushes into the parquet scan as a plain long
  * filter → row-group min/max pruning.
  *
  * floor-division bounds: conv = floor(ns/1000) µs, so
  *   conv >= L  ⟹  ns >= 1000·L          conv >  L  ⟹  ns >= 1000·(L+1)
  *   conv <= L  ⟹  ns <= 1000·L + 999    conv <  L  ⟹  ns <= 1000·L − 1
  *   conv  = L  ⟹  1000·L <= ns <= 1000·L + 999
  */
object NanosComparisonPushdown extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(a DIV 1000) where a is a raw attribute. */
  private object ConvertedNanos {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(IntegralDivide(a: Attribute, Literal(1000L, LongType), _)) => Some(a)
      case _ => None
    }
  }

  /** Matches cast(a: TIMESTAMP_NTZ as TIMESTAMP) under a UTC session —
    * where the cast is the IDENTITY on the underlying micros value, so a
    * bound on the cast is the same bound on the raw NTZ column (which the
    * parquet reader can push; the cast hides it otherwise). The newer
    * testdata ships events.ts as native TIMESTAMP(MICROS) and
    * `Tables.events` normalizes it with exactly this cast. Guarded on the
    * session zone: in a DST zone wall-clock→instant is not monotone and
    * the rewrite would be unsound. */
  private object CastNtz {
    def unapply(e: Expression): Option[Attribute] = e match {
      case c @ Cast(a: Attribute, TimestampType, _, _)
          if a.dataType == TimestampNTZType &&
            java.time.ZoneId.of(c.timeZoneId.getOrElse(
              org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
              .normalized() == java.time.ZoneOffset.UTC =>
        Some(a)
      case _ => None
    }
  }

  private def ntz(l: Literal): Literal = Literal(l.value, TimestampNTZType)

  private def micros(l: Literal): Long = l.value.asInstanceOf[Long]

  /** Implied raw-long conjuncts for one comparison, if it has the shape. */
  private def implied(e: Expression): Seq[Expression] = e match {
    case GreaterThanOrEqual(ConvertedNanos(a), l @ Literal(_, TimestampType)) =>
      Seq(GreaterThanOrEqual(a, Literal(micros(l) * 1000L, LongType)))
    case GreaterThan(ConvertedNanos(a), l @ Literal(_, TimestampType)) =>
      Seq(GreaterThanOrEqual(a, Literal((micros(l) + 1) * 1000L, LongType)))
    case LessThanOrEqual(ConvertedNanos(a), l @ Literal(_, TimestampType)) =>
      Seq(LessThanOrEqual(a, Literal(micros(l) * 1000L + 999L, LongType)))
    case LessThan(ConvertedNanos(a), l @ Literal(_, TimestampType)) =>
      Seq(LessThanOrEqual(a, Literal(micros(l) * 1000L - 1L, LongType)))
    case EqualTo(ConvertedNanos(a), l @ Literal(_, TimestampType)) =>
      Seq(GreaterThanOrEqual(a, Literal(micros(l) * 1000L, LongType)),
        LessThanOrEqual(a, Literal(micros(l) * 1000L + 999L, LongType)))
    // literal-on-left mirrors
    case GreaterThanOrEqual(l @ Literal(_, TimestampType), ConvertedNanos(a)) =>
      Seq(LessThanOrEqual(a, Literal(micros(l) * 1000L + 999L, LongType)))
    case LessThanOrEqual(l @ Literal(_, TimestampType), ConvertedNanos(a)) =>
      Seq(GreaterThanOrEqual(a, Literal(micros(l) * 1000L, LongType)))
    // identity-cast NTZ: exact bounds, same comparator, NTZ-typed literal
    case GreaterThanOrEqual(CastNtz(a), l @ Literal(_, TimestampType)) =>
      Seq(GreaterThanOrEqual(a, ntz(l)))
    case GreaterThan(CastNtz(a), l @ Literal(_, TimestampType)) =>
      Seq(GreaterThan(a, ntz(l)))
    case LessThanOrEqual(CastNtz(a), l @ Literal(_, TimestampType)) =>
      Seq(LessThanOrEqual(a, ntz(l)))
    case LessThan(CastNtz(a), l @ Literal(_, TimestampType)) =>
      Seq(LessThan(a, ntz(l)))
    case EqualTo(CastNtz(a), l @ Literal(_, TimestampType)) =>
      Seq(EqualTo(a, ntz(l)))
    case GreaterThanOrEqual(l @ Literal(_, TimestampType), CastNtz(a)) =>
      Seq(LessThanOrEqual(a, ntz(l)))
    case LessThanOrEqual(l @ Literal(_, TimestampType), CastNtz(a)) =>
      Seq(GreaterThanOrEqual(a, ntz(l)))
    case _ => Seq.empty
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      val extra = existing.flatMap(implied)
        .filterNot(x => existing.exists(_.semanticEquals(x)))
        .distinct
      if (extra.isEmpty) f
      else Filter(extra.foldLeft(cond)(And(_, _)), child)
  }
}

object Rules {
  /** Idempotently install the engine's optimizer rules on a session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(NanosComparisonPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ NanosComparisonPushdown
}
