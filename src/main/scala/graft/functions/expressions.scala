package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers invoked from both interpreted eval and generated code.
  * Operating on UTF8String bytes directly avoids a UTF-16 round-trip on the
  * per-row ingest hot path, and makes the name sort byte-lexicographic,
  * exactly like the reference's Go `sort.Strings` on UTF-8 strings
  * (reference: utils/timeseries/timeseries.go:26-28).
  */
object LabelOps {
  import graft.core.Fingerprint.{Offset64, Prime64}

  @inline private def hashBytes(h0: Long, s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime64
      i += 1
    }
    h
  }

  /** Sort (by binary name order) and return index permutation of map entries. */
  private def sortedIndices(keys: Array[UTF8String]): Array[Int] = {
    val idx = Array.tabulate(keys.length)(identity)
    // insertion sort: label sets are tiny (typically < 20 entries)
    var i = 1
    while (i < idx.length) {
      val v = idx(i)
      var j = i - 1
      while (j >= 0 && keys(idx(j)).compareTo(keys(v)) > 0) {
        idx(j + 1) = idx(j); j -= 1
      }
      idx(j + 1) = v
      i += 1
    }
    idx
  }

  private def mapEntries(map: MapData): (Array[UTF8String], Array[UTF8String]) = {
    val n = map.numElements()
    val ks = new Array[UTF8String](n)
    val vs = new Array[UTF8String](n)
    val ka = map.keyArray(); val va = map.valueArray()
    var i = 0
    while (i < n) {
      ks(i) = ka.getUTF8String(i)
      vs(i) = if (va.isNullAt(i)) UTF8String.EMPTY_UTF8 else va.getUTF8String(i)
      i += 1
    }
    (ks, vs)
  }

  /** FNV-1a 64 fingerprint of a labels map (sorts by name internally). */
  def fingerprintMap(map: MapData): Long = {
    val n = map.numElements()
    if (n == 0) return Offset64
    val (ks, vs) = mapEntries(map)
    val order = sortedIndices(ks)
    var h = Offset64
    var i = 0
    while (i < n) {
      val o = order(i)
      h = hashBytes(h, ks(o))
      h = (h ^ 0xffL) * Prime64
      h = hashBytes(h, vs(o))
      h = (h ^ 0xffL) * Prime64
      i += 1
    }
    h
  }

  /** Canonical (name-sorted) one-line JSON of a labels map; see
    * [[graft.core.LabelsJson]] for the escaping contract. */
  def canonicalJsonMap(map: MapData): UTF8String = {
    val n = map.numElements()
    if (n == 0) return UTF8String.fromString("{}")
    val (ks, vs) = mapEntries(map)
    val order = sortedIndices(ks)
    val names = new Array[String](n)
    val values = new Array[String](n)
    var i = 0
    while (i < n) {
      names(i) = ks(order(i)).toString
      values(i) = vs(order(i)).toString
      i += 1
    }
    UTF8String.fromString(graft.core.LabelsJson.marshalMap(names, values))
  }
}

/** `labels_fingerprint(map<string,string>) -> long` — the Prometheus series
  * identity (reference: utils/timeseries/fingerprint.go:39-76). Codegen
  * emits a static call so whole-stage codegen stays intact. */
case class LabelsFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case MapType(StringType, StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"labels_fingerprint expects map<string,string>, got ${other.sql}")
    }
  override def nullSafeEval(input: Any): Any =
    LabelOps.fingerprintMap(input.asInstanceOf[MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LabelOps.fingerprintMap($c)")
  override protected def withNewChildInternal(newChild: Expression): LabelsFingerprint =
    copy(child = newChild)
  override def prettyName: String = "labels_fingerprint"
}

/** `labels_json(map<string,string>) -> string` — canonical name-sorted JSON
  * (reference: storages/clickhouse/json.go:27-65). */
case class LabelsCanonicalJson(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case MapType(StringType, StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"labels_json expects map<string,string>, got ${other.sql}")
    }
  override def nullSafeEval(input: Any): Any =
    LabelOps.canonicalJsonMap(input.asInstanceOf[MapData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LabelOps.canonicalJsonMap($c)")
  override protected def withNewChildInternal(newChild: Expression): LabelsCanonicalJson =
    copy(child = newChild)
  override def prettyName: String = "labels_json"
}
