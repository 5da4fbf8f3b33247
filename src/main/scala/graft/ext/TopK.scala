package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded exact top-k selection as an aggregate.
  *
  * The idiomatic Spark top-k-per-group is
  * `row_number() OVER (PARTITION BY g ORDER BY s)` + filter — but that
  * window EXCHANGES the entire scored row set into |groups| partitions
  * before ranking (one task per group: at 100 TB the ANN candidate stage
  * would funnel corpus×|queries| rows through |queries| tasks). Spark's
  * `WindowGroupLimit` pushes a per-partition limit below the exchange, but
  * the full per-partition survivor ROWS still shuffle.
  *
  * `bottom_k` instead keeps a size-≤k heap as the aggregation state:
  * partial aggregation bounds each task's output to k rows PER GROUP
  * before the exchange, and the merge is heap-union — the classic
  * distributed-top-k algebra (exact: min-of-maxes commutes). State is
  * O(k), the exchange carries tasks×groups×k rows, and no row outside the
  * final k survives any stage. Selection is EXACT and deterministic for a
  * total, deterministic ordering key.
  *
  * Semantics: keeps the k SMALLEST values of `child` by the type's natural
  * ascending ordering (struct = lexicographic by field); output is the
  * kept values sorted ascending. "Largest" selections negate the score
  * (caveat: negation reverses NaN to smallest; keep NaN out of scores).
  * NULL inputs are skipped (SQL aggregate convention).
  */
final class TopKBuf(val k: Int, val ord: Ordering[Any]) {
  /** Max-heap on the natural ordering: head = worst (largest) kept value,
    * the one a better candidate evicts. */
  val heap: mutable.PriorityQueue[Any] = mutable.PriorityQueue.empty[Any](ord)

  /** Insert if it beats the current worst; `copy` runs only on keeps, so a
    * rejected candidate costs one comparison and zero allocation. */
  def insert(v: Any, copy: Any => Any): Unit =
    if (heap.size < k) heap.enqueue(copy(v))
    else if (ord.lt(v, heap.head)) { heap.dequeue(); heap.enqueue(copy(v)) }

  /** Kept values, ascending (deterministic eval/serialize order). */
  def sortedAsc: Array[Any] = heap.clone().dequeueAll.reverse.toArray
}

/** `bottom_k(value, k) -> array<value>` — see [[TopKBuf]]. */
case class BottomKAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf] with UnaryLike[Expression] {
  require(k >= 1 && k <= (1 << 20), s"bottom_k: k in [1, 2^20], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ord = TypeUtils.getInterpretedOrdering(child.dataType)
  @transient private lazy val proj = UnsafeProjection.create(Array(child.dataType))

  private def copyOf(v: Any): Any = v match {
    case r: InternalRow => r.copy()
    case a: ArrayData => a.copy()
    case s: UTF8String => s.clone()
    case other => other
  }

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k, ord)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v, copyOf)
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    // other's values are already defensive copies — no re-copy needed
    other.heap.foreach(v => buf.insert(v, identity))
    buf
  }

  override def eval(buf: TopKBuf): Any = new GenericArrayData(buf.sortedAsc)

  /** [n] then per element [len][UnsafeRow bytes] — each value round-trips
    * through a 1-field UnsafeRow (handles any orderable type uniformly). */
  override def serialize(buf: TopKBuf): Array[Byte] = {
    val elems = buf.sortedAsc
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(elems.length)
    val row = new GenericInternalRow(1)
    elems.foreach { e =>
      row.update(0, e)
      val bytes = proj(row).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = dis.readInt()
    val buf = new TopKBuf(k, ord)
    val holder = new UnsafeRow(1)
    var i = 0
    while (i < n) {
      val len = dis.readInt()
      val b = new Array[Byte](len)
      dis.readFully(b)
      holder.pointTo(b, len)
      // copy: the extracted value may point into `b`, which the next
      // loop iteration abandons but the heap entry must outlive
      buf.insert(holder.get(0, child.dataType), copyOf)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): BottomKAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BottomKAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): BottomKAgg = copy(child = c)
  override def prettyName: String = "bottom_k"
}
