package graft.sources

import graft.model.{Label, Sample, TimeSeries}
import java.io.ByteArrayOutputStream

/** Minimal hand-rolled protobuf (proto3 wire format) codec for the
  * Prometheus remote-storage messages the engine exchanges
  * (reference: prompb/prompb.proto:17-75):
  *
  * {{{
  * Label      { 1: string name; 2: string value }
  * Sample     { 1: double value; 2: int64 timestamp (ms) }
  * TimeSeries { 1: repeated Label labels; 2: repeated Sample samples }
  * WriteRequest { 1: repeated TimeSeries timeseries }
  * }}}
  *
  * Only the standard wire encoding is used (varint, fixed64,
  * length-delimited) — ~100 lines beats dragging in a codegen dependency
  * for four tiny messages.
  */
object Prompb {

  // ---- writer ----

  private final class Writer {
    val out = new ByteArrayOutputStream(256)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def tag(field: Int, wire: Int): Unit = varint((field << 3) | wire)
    def bytes(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length); out.write(b) }
    def string(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
    def fixed64(field: Int, v: Long): Unit = {
      tag(field, 1)
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def int64(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
    def result(): Array[Byte] = out.toByteArray
  }

  private def encodeLabel(l: Label): Array[Byte] = {
    val w = new Writer
    if (l.name.nonEmpty) w.string(1, l.name)
    if (l.value.nonEmpty) w.string(2, l.value)
    w.result()
  }

  private def encodeSample(s: Sample): Array[Byte] = {
    val w = new Writer
    if (s.value != 0d || java.lang.Double.doubleToRawLongBits(s.value) != 0L)
      w.fixed64(1, java.lang.Double.doubleToLongBits(s.value))
    if (s.timestampMs != 0L) w.int64(2, s.timestampMs)
    w.result()
  }

  def encodeTimeSeries(ts: TimeSeries): Array[Byte] = {
    val w = new Writer
    ts.labels.foreach(l => w.bytes(1, encodeLabel(l)))
    ts.samples.foreach(s => w.bytes(2, encodeSample(s)))
    w.result()
  }

  def encodeWriteRequest(series: Seq[TimeSeries]): Array[Byte] = {
    val w = new Writer
    series.foreach(ts => w.bytes(1, encodeTimeSeries(ts)))
    w.result()
  }

  // ---- reader ----

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      var b = 0
      do {
        b = buf(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def fixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8
      v
    }
    def lenDelimited(): (Int, Int) = { val len = varint().toInt; val s = pos; pos += len; (s, len) }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val len = varint().toInt; pos += len
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def decodeLabel(buf: Array[Byte], start: Int, len: Int): Label = {
    val r = new Reader(buf, start, start + len)
    var name = ""; var value = ""
    while (r.hasMore) {
      val t = r.varint()
      (t >> 3).toInt match {
        case 1 => val (s, l) = r.lenDelimited(); name = new String(buf, s, l, "UTF-8")
        case 2 => val (s, l) = r.lenDelimited(); value = new String(buf, s, l, "UTF-8")
        case _ => r.skip((t & 7).toInt)
      }
    }
    Label(name, value)
  }

  private def decodeSample(buf: Array[Byte], start: Int, len: Int): Sample = {
    val r = new Reader(buf, start, start + len)
    var value = 0d; var ts = 0L
    while (r.hasMore) {
      val t = r.varint()
      (t >> 3).toInt match {
        case 1 => value = java.lang.Double.longBitsToDouble(r.fixed64())
        case 2 => ts = r.varint()
        case _ => r.skip((t & 7).toInt)
      }
    }
    Sample(ts, value)
  }

  def decodeTimeSeries(buf: Array[Byte], start: Int = 0, length: Int = -1): TimeSeries = {
    val end = if (length < 0) buf.length else start + length
    val r = new Reader(buf, start, end)
    val labels = Seq.newBuilder[Label]
    val samples = Seq.newBuilder[Sample]
    while (r.hasMore) {
      val t = r.varint()
      (t >> 3).toInt match {
        case 1 => val (s, l) = r.lenDelimited(); labels += decodeLabel(buf, s, l)
        case 2 => val (s, l) = r.lenDelimited(); samples += decodeSample(buf, s, l)
        case _ => r.skip((t & 7).toInt)
      }
    }
    TimeSeries(labels.result(), samples.result())
  }

  def decodeWriteRequest(buf: Array[Byte]): Seq[TimeSeries] = {
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[TimeSeries]
    while (r.hasMore) {
      val t = r.varint()
      (t >> 3).toInt match {
        case 1 => val (s, l) = r.lenDelimited(); out += decodeTimeSeries(buf, s, l)
        case _ => r.skip((t & 7).toInt)
      }
    }
    out.result()
  }

  // ---- read protocol (prompb.proto:32-71) ----
  // LabelMatcher { 1: enum type (EQ=0 NEQ=1 RE=2 NRE=3); 2: name; 3: value }
  // Query { 1: int64 start_ms; 2: int64 end_ms; 3: repeated LabelMatcher; 4: ReadHints }
  // ReadHints { 1: int64 step_ms; 2: string func; 3: int64 start_ms; 4: int64 end_ms }
  //   (prompb.proto:45-50 — decoded here and exploited by the hinted read
  //   path, unlike the reference which logs and drops them, prom.go:184-186)
  // ReadRequest { 1: repeated Query } / ReadResponse { 1: repeated QueryResult }
  // QueryResult { 1: repeated TimeSeries }

  import graft.model.{MatchType, Matcher, Query, ReadHints}

  private def encodeHints(h: ReadHints): Array[Byte] = {
    val w = new Writer
    if (h.stepMs != 0) w.int64(1, h.stepMs)
    if (h.func.nonEmpty) w.string(2, h.func)
    if (h.startMs != 0) w.int64(3, h.startMs)
    if (h.endMs != 0) w.int64(4, h.endMs)
    w.result()
  }

  private def decodeHints(buf: Array[Byte], start: Int, len: Int): ReadHints = {
    val r = new Reader(buf, start, start + len)
    var step = 0L; var func = ""; var s0 = 0L; var e0 = 0L
    while (r.hasMore) {
      val t = r.varint()
      (t >> 3).toInt match {
        case 1 => step = r.varint()
        case 2 => val (s, l) = r.lenDelimited(); func = new String(buf, s, l, "UTF-8")
        case 3 => s0 = r.varint()
        case 4 => e0 = r.varint()
        case _ => r.skip((t & 7).toInt)
      }
    }
    ReadHints(step, func, s0, e0)
  }

  private def matchTypeToInt(t: MatchType): Int = t match {
    case MatchType.Eq => 0; case MatchType.Neq => 1
    case MatchType.Re => 2; case MatchType.Nre => 3
  }
  private def intToMatchType(i: Int): MatchType = i match {
    case 0 => MatchType.Eq; case 1 => MatchType.Neq
    case 2 => MatchType.Re; case 3 => MatchType.Nre
    case other => throw new IllegalArgumentException(s"bad matcher type $other")
  }

  private def encodeMatcher(m: Matcher): Array[Byte] = {
    val w = new Writer
    if (matchTypeToInt(m.matchType) != 0) w.int64(1, matchTypeToInt(m.matchType))
    if (m.name.nonEmpty) w.string(2, m.name)
    if (m.value.nonEmpty) w.string(3, m.value)
    w.result()
  }

  private def decodeMatcher(buf: Array[Byte], start: Int, len: Int): Matcher = {
    val r = new Reader(buf, start, start + len)
    var tpe = 0; var name = ""; var value = ""
    while (r.hasMore) {
      val t = r.varint()
      (t >> 3).toInt match {
        case 1 => tpe = r.varint().toInt
        case 2 => val (s, l) = r.lenDelimited(); name = new String(buf, s, l, "UTF-8")
        case 3 => val (s, l) = r.lenDelimited(); value = new String(buf, s, l, "UTF-8")
        case _ => r.skip((t & 7).toInt)
      }
    }
    Matcher(name, intToMatchType(tpe), value)
  }

  def encodeQuery(q: Query): Array[Byte] = {
    val w = new Writer
    if (q.startMs != 0) w.int64(1, q.startMs)
    if (q.endMs != 0) w.int64(2, q.endMs)
    q.matchers.foreach(m => w.bytes(3, encodeMatcher(m)))
    q.hints.foreach(h => w.bytes(4, encodeHints(h)))
    w.result()
  }

  def decodeQuery(buf: Array[Byte], start: Int, len: Int): Query = {
    val r = new Reader(buf, start, start + len)
    var s0 = 0L; var e0 = 0L
    var hints: Option[ReadHints] = None
    val ms = Seq.newBuilder[Matcher]
    while (r.hasMore) {
      val t = r.varint()
      (t >> 3).toInt match {
        case 1 => s0 = r.varint()
        case 2 => e0 = r.varint()
        case 3 => val (s, l) = r.lenDelimited(); ms += decodeMatcher(buf, s, l)
        case 4 => val (s, l) = r.lenDelimited(); hints = Some(decodeHints(buf, s, l))
        case _ => r.skip((t & 7).toInt)
      }
    }
    Query(s0, e0, ms.result(), hints)
  }

  def encodeReadRequest(queries: Seq[Query]): Array[Byte] = {
    val w = new Writer
    queries.foreach(q => w.bytes(1, encodeQuery(q)))
    w.result()
  }

  def decodeReadRequest(buf: Array[Byte]): Seq[Query] = {
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[Query]
    while (r.hasMore) {
      val t = r.varint()
      (t >> 3).toInt match {
        case 1 => val (s, l) = r.lenDelimited(); out += decodeQuery(buf, s, l)
        case _ => r.skip((t & 7).toInt)
      }
    }
    out.result()
  }

  def encodeReadResponse(results: Seq[Seq[TimeSeries]]): Array[Byte] = {
    val w = new Writer
    results.foreach { series =>
      val qr = new Writer
      series.foreach(ts => qr.bytes(1, encodeTimeSeries(ts)))
      w.bytes(1, qr.result())
    }
    w.result()
  }

  def decodeReadResponse(buf: Array[Byte]): Seq[Seq[TimeSeries]] = {
    val r = new Reader(buf, 0, buf.length)
    val out = Seq.newBuilder[Seq[TimeSeries]]
    while (r.hasMore) {
      val t = r.varint()
      (t >> 3).toInt match {
        case 1 =>
          val (s, l) = r.lenDelimited()
          val qr = new Reader(buf, s, s + l)
          val series = Seq.newBuilder[TimeSeries]
          while (qr.hasMore) {
            val t2 = qr.varint()
            (t2 >> 3).toInt match {
              case 1 => val (s2, l2) = qr.lenDelimited(); series += decodeTimeSeries(buf, s2, l2)
              case _ => qr.skip((t2 & 7).toInt)
            }
          }
          out += series.result()
        case _ => r.skip((t & 7).toInt)
      }
    }
    out.result()
  }
}
