package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries 1982; the streaming
  * top-k form popularized as SpaceSaving by Metwally, Agrawal & El Abbadi,
  * ICDT 2005; merge rule from Agarwal et al., "Mergeable Summaries", PODS
  * 2012 — all public designs, implemented from the papers).
  *
  * Completes the sketch family alongside DDSketch (quantiles), HLL
  * (cardinality) and Bloom (membership): FREQUENCY. The exact corpus-wide
  * top-k terms needs a vocabulary-keyed exchange of every term instance;
  * the summary replaces it with a fixed `capacity`-counter state per
  * partition that merges like any algebraic partial — constant bytes
  * through the shuffle however large the corpus.
  *
  * Guarantees (merge-ORDER-INDEPENDENT even though the summary content
  * itself is not, see below): with n values processed and capacity k,
  * every term with true count > n/(k+1) is present, and every reported
  * estimate is an UNDER-estimate low by at most n/(k+1). When the number
  * of distinct terms is ≤ k the summary is EXACT (no decrement ever runs)
  * and byte-deterministic under any partitioning.
  *
  * Beyond k distinct terms, which near-threshold terms survive may depend
  * on merge order (the trim after each pairwise merge is not associative)
  * — the bounds above hold for every order, and [[MGOps.nOrZero]] lets a
  * reader derive the bound (n/(k+1)) from the sketch itself. State is
  * serialized sorted-by-term, so identical content ⇒ identical bytes.
  */
object MGOps {
  /** Default counter capacity: heavy hitters above n/257 survive. */
  val DefaultCapacity = 256

  /** Full summary as (term, est) rows sorted by (est desc, term asc) —
    * deterministic rendering of the counter set. Invoked from generated
    * code. */
  def itemsArray(bytes: Array[Byte]): ArrayData = {
    val s = MGSummary.deserialize(bytes)
    val entries = s.counts.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(entries.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c): Any
    })
  }

  /** Total values the sketch has processed (the n in the n/(k+1) bound). */
  def nOrZero(bytes: Array[Byte]): Long = MGSummary.deserialize(bytes).n
}

/** Mutable Misra–Gries state: `capacity == 0` marks an empty merge buffer
  * that adopts the first merged summary's capacity (the DDHist α=0
  * convention). */
final class MGSummary(var capacity: Int) {
  val counts: scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty
  var n: Long = 0L

  def add(t: String): Unit = {
    require(capacity > 0, "cannot add values to an unparameterized merge buffer")
    n += 1
    counts.get(t) match {
      case Some(c) => counts.update(t, c + 1)
      case None if counts.size < capacity => counts.update(t, 1L)
      case None => // decrement-all, drop zeros (the classic MG step)
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counts.foreachEntry { (k, c) =>
          if (c == 1L) dead += k else counts.update(k, c - 1)
        }
        dead.foreach(counts.remove)
    }
  }

  /** Agarwal et al. merge: pointwise sum, then if over capacity subtract
    * the (capacity+1)-th largest count from every counter and drop the
    * non-positive — size back ≤ capacity, error bounds add. */
  def mergeWith(other: MGSummary): Unit = {
    if (other.capacity == 0) return
    if (capacity == 0) capacity = other.capacity
    else require(capacity == other.capacity,
      s"cannot merge summaries with different capacities ($capacity vs ${other.capacity})")
    n += other.n
    other.counts.foreachEntry { (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
    if (counts.size > capacity) {
      val sorted = counts.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - capacity - 1) // (capacity+1)-th largest
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counts.foreachEntry { (k, c) =>
        if (c <= cut) dead += k else counts.update(k, c - cut)
      }
      dead.foreach(counts.remove)
    }
  }

  /** Deterministic bytes: version, capacity, n, then (term, count) pairs
    * sorted by term — identical content ⇒ identical bytes. */
  def serialize(): Array[Byte] = {
    val entries = counts.toArray.sortBy(_._1)
    val termBytes = entries.map(e => e._1.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val size = 1 + 4 + 8 + 4 + termBytes.map(_.length + 12).sum
    val buf = java.nio.ByteBuffer.allocate(size)
    buf.put(1.toByte).putInt(capacity).putLong(n).putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      buf.putInt(termBytes(i).length).put(termBytes(i)).putLong(entries(i)._2)
      i += 1
    }
    buf.array()
  }
}

object MGSummary {
  def deserialize(bytes: Array[Byte]): MGSummary = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val ver = buf.get()
    require(ver == 1, s"unknown freq_sketch version $ver")
    val s = new MGSummary(buf.getInt())
    s.n = buf.getLong()
    val size = buf.getInt()
    var i = 0
    while (i < size) {
      val len = buf.getInt()
      val tb = new Array[Byte](len)
      buf.get(tb)
      val c = buf.getLong()
      s.counts.update(new String(tb, java.nio.charset.StandardCharsets.UTF_8), c)
      i += 1
    }
    s
  }
}

/** `freq_sketch(string[, capacity]) -> binary` — Misra–Gries summary over
  * a group's terms. NULLs are skipped (SQL aggregate convention). */
case class FreqSketchAgg(child: Expression, capacity: Int = MGOps.DefaultCapacity,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {
  require(capacity > 0, s"capacity must be positive, got $capacity")
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_sketch expects a STRING term column (cast others), got ${other.sql}")
    }
  override def createAggregationBuffer(): MGSummary = new MGSummary(capacity)
  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }
  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.mergeWith(other); buf
  }
  override def eval(buf: MGSummary): Any = buf.serialize()
  override def serialize(buf: MGSummary): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): MGSummary = MGSummary.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg = copy(child = c)
  override def prettyName: String = "freq_sketch"
}

/** `freq_sketch_merge(binary) -> binary` — re-merge serialized summaries
  * (pre-sketched shard/rollup combine). NULL inputs skipped. */
case class FreqSketchMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGSummary] with UnaryLike[Expression] {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_sketch_merge expects binary summary bytes, got ${other.sql}")
    }
  override def createAggregationBuffer(): MGSummary = new MGSummary(0)
  override def update(buf: MGSummary, input: InternalRow): MGSummary = {
    val v = child.eval(input)
    if (v != null) buf.mergeWith(MGSummary.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(buf: MGSummary, other: MGSummary): MGSummary = {
    buf.mergeWith(other); buf
  }
  override def eval(buf: MGSummary): Any = buf.serialize()
  override def serialize(buf: MGSummary): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): MGSummary = MGSummary.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): FreqSketchMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqSketchMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): FreqSketchMergeAgg =
    copy(child = c)
  override def prettyName: String = "freq_sketch_merge"
}

/** `freq_items(binary) -> array<struct<term,est>>` — the summary's
  * counters sorted by (est desc, term asc); estimates under-count by at
  * most n/(capacity+1). */
case class FreqItems(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_items expects binary summary bytes, got ${other.sql}")
    }
  override def nullSafeEval(input: Any): Any =
    MGOps.itemsArray(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MGOps.itemsArray($c);")
  override protected def withNewChildInternal(c: Expression): FreqItems = copy(child = c)
  override def prettyName: String = "freq_items"
}

/** `freq_n(binary) -> long` — total values processed (the n of the
  * n/(capacity+1) error bound, so the bound derives from the sketch). */
case class FreqN(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_n expects binary summary bytes, got ${other.sql}")
    }
  override def nullSafeEval(input: Any): Any =
    MGOps.nOrZero(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MGOps.nOrZero($c);")
  override protected def withNewChildInternal(c: Expression): FreqN = copy(child = c)
  override def prettyName: String = "freq_n"
}
