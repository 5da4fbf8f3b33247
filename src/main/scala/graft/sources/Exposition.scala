package graft.sources

import graft.model.{Label, Sample, TimeSeries}

/** Prometheus text exposition format parser — the S9 scrape source
  * (reference: cmd/promload/exporter.go:73-159, which delegates to the
  * expfmt library; re-implemented here from the public format spec).
  *
  * Supported: `metric_name{label="value",...} value [timestamp_ms]`,
  * bare `metric_name value`, `# HELP/TYPE/comment` lines, escaped label
  * values (`\\`, `\"`, `\n`), and the special values NaN/+Inf/-Inf.
  */
object Exposition {

  /** Parse one exposition line; None for comments/blank/malformed. */
  def parseLine(line0: String, defaultTsMs: Long = 0L): Option[TimeSeries] = {
    val line = line0.trim
    if (line.isEmpty || line.startsWith("#")) return None
    try {
      var i = 0
      def isNameChar(c: Char, first: Boolean): Boolean =
        c.isLetter || c == '_' || c == ':' || (!first && c.isDigit)
      while (i < line.length && isNameChar(line.charAt(i), i == 0)) i += 1
      if (i == 0) return None
      val name = line.substring(0, i)
      val labels = Seq.newBuilder[Label]
      labels += Label("__name__", name)
      if (i < line.length && line.charAt(i) == '{') {
        i += 1
        while (line.charAt(i) != '}') {
          while (line.charAt(i) == ',' || line.charAt(i) == ' ') i += 1
          if (line.charAt(i) == '}') ()
          else {
            val ns = i
            while (line.charAt(i) != '=') i += 1
            val lname = line.substring(ns, i).trim
            i += 1 // '='
            while (line.charAt(i) == ' ') i += 1
            require(line.charAt(i) == '"', "expected quoted label value")
            i += 1
            val sb = new java.lang.StringBuilder
            while (line.charAt(i) != '"') {
              val c = line.charAt(i)
              if (c == '\\') {
                i += 1
                line.charAt(i) match {
                  case 'n'   => sb.append('\n')
                  case '\\'  => sb.append('\\')
                  case '"'   => sb.append('"')
                  case other => sb.append(other)
                }
              } else sb.append(c)
              i += 1
            }
            i += 1 // closing quote
            labels += Label(lname, sb.toString)
          }
        }
        i += 1 // '}'
      }
      val rest = line.substring(i).trim.split("\\s+")
      if (rest.isEmpty || rest(0).isEmpty) return None
      val value = rest(0) match {
        case "NaN" | "nan"           => Double.NaN
        case "+Inf" | "Inf" | "inf"  => Double.PositiveInfinity
        case "-Inf" | "-inf"         => Double.NegativeInfinity
        case v                       => v.toDouble
      }
      val ts = if (rest.length > 1) rest(1).toLong else defaultTsMs
      Some(TimeSeries(labels.result(), Seq(Sample(ts, value))))
    } catch {
      case _: Exception => None
    }
  }

  /** Parse a full exposition payload; one TimeSeries per sample line. */
  def parse(text: String, defaultTsMs: Long = 0L): Seq[TimeSeries] =
    text.linesIterator.flatMap(parseLine(_, defaultTsMs)).toSeq
}
