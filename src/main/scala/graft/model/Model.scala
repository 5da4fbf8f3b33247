package graft.model

/** Core data model of the engine (reference: prompb/prompb.proto:17-75).
  *
  * The universe is time series: a sorted set of label name/value pairs
  * (including `__name__`) identifying the series, plus (timestamp_ms, value)
  * samples. These case classes are the typed API edge; internally everything
  * is columnar DataFrames (see [[graft.storage.TimeSeriesStore]]).
  */
final case class Label(name: String, value: String)

final case class Sample(timestampMs: Long, value: Double)

final case class TimeSeries(labels: Seq[Label], samples: Seq[Sample]) {

  /** Labels sorted by name — the canonical form used for fingerprinting
    * (reference: utils/timeseries/timeseries.go:26-28). */
  def sortedLabels: Seq[Label] = labels.sortBy(_.name)
}

object TimeSeries {
  def sortLabels(labels: Seq[Label]): Seq[Label] = labels.sortBy(_.name)
}

/** Matcher types, mirroring prompb LabelMatcher.Type
  * (reference: prompb/prompb.proto:32-43, storages/base/base.go:53-88). */
sealed abstract class MatchType(val repr: String)
object MatchType {
  case object Eq  extends MatchType("=")
  case object Neq extends MatchType("!=")
  case object Re  extends MatchType("=~")
  case object Nre extends MatchType("!~")
}

/** A single label matcher. Missing label is treated as empty string
  * (reference: storages/base/base.go:90,100-118). Regexes are fully
  * anchored: `^(?:value)$` (base.go:101-103). */
final case class Matcher(name: String, matchType: MatchType, value: String)

/** Prometheus read hints (reference: prompb/prompb.proto:45-50) — the
  * caller's outer function and step. The reference receives and DROPS these
  * (handlers/prom.go:184-186); this engine exploits them: an aggregating
  * `func` with a positive `stepMs` is answered with per-step pre-aggregated
  * buckets instead of raw samples (see [[graft.storage.Storage.readSeries]]),
  * cutting the wire volume by the step/scrape-interval ratio. */
final case class ReadHints(
    stepMs: Long = 0L, func: String = "", startMs: Long = 0L, endMs: Long = 0L)

/** A read query: closed time interval + conjunction of matchers.
  * Empty matcher list matches everything (bulk-export extension,
  * reference: storages/base/base.go:100-138). */
final case class Query(startMs: Long, endMs: Long, matchers: Seq[Matcher],
    hints: Option[ReadHints] = None)
