package graft.core

import graft.model.Label

/** FNV-1a 64-bit fingerprint over name-sorted label pairs with a 0xFF
  * separator after each name and each value — byte-compatible with
  * Prometheus `labelSetToFingerprint` so data can migrate between engines
  * (reference: utils/timeseries/fingerprint.go:39-76).
  *
  * Empty label set fingerprints to the FNV offset basis
  * 14695981039346656037 (fingerprint.go:63-66).
  *
  * The value is an *unsigned* 64-bit quantity; we carry it in a signed
  * `Long` (same 64 bits). Equality / join / group-by are unaffected;
  * ordering or display must use `java.lang.Long.compareUnsigned` /
  * `toUnsignedString`.
  */
object Fingerprint {
  final val Offset64: Long = -3750763034362895579L // 14695981039346656037
  final val Prime64: Long  = 1099511628211L

  @inline private def hashAddBytes(h0: Long, s: String): Long = {
    // FNV operates on UTF-8 bytes
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime64
      i += 1
    }
    h
  }

  @inline private def hashAddByte(h0: Long, b: Int): Long = {
    var h = h0
    h ^= (b & 0xffL)
    h *= Prime64
    h
  }

  /** Fingerprint of labels that are ALREADY sorted by name. */
  def ofSorted(names: Array[String], values: Array[String]): Long = {
    if (names.length == 0) return Offset64
    var h = Offset64
    var i = 0
    while (i < names.length) {
      h = hashAddBytes(h, names(i))
      h = hashAddByte(h, 0xff)
      h = hashAddBytes(h, values(i))
      h = hashAddByte(h, 0xff)
      i += 1
    }
    h
  }

  /** Fingerprint of an arbitrary label set (sorts by name first). */
  def of(labels: Seq[Label]): Long = {
    val sorted = labels.sortBy(_.name)
    ofSorted(sorted.map(_.name).toArray, sorted.map(_.value).toArray)
  }

  def of(labels: Map[String, String]): Long = {
    val names = labels.keys.toArray
    java.util.Arrays.sort(names.asInstanceOf[Array[AnyRef]])
    ofSorted(names, names.map(labels))
  }

  def toUnsignedString(fp: Long): String = java.lang.Long.toUnsignedString(fp)
}
