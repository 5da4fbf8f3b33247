package graft.core

import graft.model.Label
import scala.collection.mutable

/** Canonical one-line JSON serialization of a label set, matching the
  * reference's hand-rolled marshaller byte-for-byte
  * (reference: storages/clickhouse/json.go:27-65):
  *
  *  - preserves the given label order (callers pass name-sorted labels for
  *    the stored canonical form);
  *  - label *names* are emitted unescaped (Prometheus names are
  *    `[a-zA-Z_][a-zA-Z0-9_]*` so this is safe);
  *  - label *values* escape only `\`, `"`, `\n`, `\r`, `\t`;
  *  - other control chars and bytes >= 0x80 pass through verbatim (the
  *    reference's documented gap, json.go:39-41 — replicated for
  *    byte-compatibility, documented here).
  *
  * Unmarshalling is order-lossy, like the reference (json.go:69-82).
  */
object LabelsJson {

  def marshal(labels: Seq[Label]): String = {
    if (labels.isEmpty) return "{}"
    val b = new java.lang.StringBuilder(64)
    b.append('{')
    var first = true
    labels.foreach { l =>
      if (!first) b.append(',')
      first = false
      b.append('"').append(l.name).append("\":\"")
      appendEscaped(b, l.value)
      b.append('"')
    }
    b.append('}')
    b.toString
  }

  def marshalMap(sortedNames: Array[String], values: Array[String]): String = {
    if (sortedNames.length == 0) return "{}"
    val b = new java.lang.StringBuilder(64)
    b.append('{')
    var i = 0
    while (i < sortedNames.length) {
      if (i > 0) b.append(',')
      b.append('"').append(sortedNames(i)).append("\":\"")
      appendEscaped(b, values(i))
      b.append('"')
      i += 1
    }
    b.append('}')
    b.toString
  }

  private def appendEscaped(b: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      (c: @annotation.switch) match {
        case '\\' => b.append('\\').append('\\')
        case '"'  => b.append('\\').append('"')
        case '\n' => b.append('\\').append('n')
        case '\r' => b.append('\\').append('r')
        case '\t' => b.append('\\').append('t')
        case _    => b.append(c)
      }
      i += 1
    }
  }

  /** Minimal recursive-descent parser for the flat `{"k":"v",...}` shape we
    * emit. Accepts standard JSON string escapes (incl. `\uXXXX`) so it can
    * also read strictly-JSON input. Order-lossy, like the reference. */
  def unmarshal(json: String): Map[String, String] = {
    val m = mutable.LinkedHashMap.empty[String, String]
    val n = json.length
    var i = 0
    def skipWs(): Unit = while (i < n && Character.isWhitespace(json.charAt(i))) i += 1
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad labels JSON at $i: $msg in $json")
    def parseString(): String = {
      if (json.charAt(i) != '"') fail("expected '\"'")
      i += 1
      val b = new java.lang.StringBuilder()
      while (i < n && json.charAt(i) != '"') {
        val c = json.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= n) fail("dangling escape")
          json.charAt(i) match {
            case '"'  => b.append('"')
            case '\\' => b.append('\\')
            case '/'  => b.append('/')
            case 'n'  => b.append('\n')
            case 'r'  => b.append('\r')
            case 't'  => b.append('\t')
            case 'b'  => b.append('\b')
            case 'f'  => b.append('\f')
            case 'u' =>
              if (i + 4 >= n) fail("short \\u escape")
              b.append(Integer.parseInt(json.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => fail(s"bad escape \\$other")
          }
        } else b.append(c)
        i += 1
      }
      if (i >= n) fail("unterminated string")
      i += 1 // closing quote
      b.toString
    }
    skipWs()
    if (i >= n || json.charAt(i) != '{') fail("expected '{'")
    i += 1
    skipWs()
    if (i < n && json.charAt(i) == '}') return Map.empty
    var done = false
    while (!done) {
      skipWs()
      val k = parseString()
      skipWs()
      if (i >= n || json.charAt(i) != ':') fail("expected ':'")
      i += 1
      skipWs()
      val v = parseString()
      m.put(k, v)
      skipWs()
      if (i < n && json.charAt(i) == ',') i += 1
      else if (i < n && json.charAt(i) == '}') { i += 1; done = true }
      else fail("expected ',' or '}'")
    }
    m.toMap
  }

  /** Canonical storage form: sort by name, then marshal. */
  def canonical(labels: Map[String, String]): String = {
    val names = labels.keys.toArray
    java.util.Arrays.sort(names.asInstanceOf[Array[AnyRef]])
    marshalMap(names, names.map(labels))
  }
}
