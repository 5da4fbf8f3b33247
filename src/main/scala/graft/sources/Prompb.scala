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
}
