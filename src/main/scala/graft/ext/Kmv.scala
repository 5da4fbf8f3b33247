package graft.ext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV ("k minimum values") distinct-value sketch as an aggregate
  * (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007 estimators): the k
  * SMALLEST DISTINCT 64-bit hash values of the input. Unlike
  * [[BottomKAgg]] (a multiset heap), the state is a bounded ordered SET —
  * duplicates of a kept hash must not occupy slots, which is exactly what
  * makes the k-th minimum an unbiased uniform order statistic.
  *
  * Scale shape: partial aggregation keeps one k-entry TreeSet per task
  * (k·8 B of state), the exchange carries one ≤k-long array per task, and
  * the merge is set-union-then-trim — the sketch is MERGEABLE, so a
  * per-shard/per-day sketch column rolls up to the corpus sketch without
  * touching rows again. The estimators ([[Kmv]]) then answer distinct
  * counts, overlap, and Jaccard between corpora from two 32 KB arrays —
  * no g-keyed distinct shuffle, no join (contrast: the exact overlap
  * card's global DISTINCT + equi-join, kmv1's oracle anchor).
  *
  * Hash order is SIGNED ascending; the estimators map a signed hash h to
  * u(h) = h/2^64 + 0.5 ∈ [0,1), which is the same total order — uniform
  * for a well-mixed 64-bit hash (xxhash64 here). */
final class KmvBuf(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def insert(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last) { if (set.add(v)) { set.pollLast(); () } }
  }
  def sortedAsc: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}

/** `kmv_sketch(hash64, k) -> array<long>` — see [[KmvBuf]]. NULL hashes
  * are skipped (SQL aggregate convention). */
case class KmvSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuf] with UnaryLike[Expression] {
  require(k >= 16 && k <= (1 << 20), s"kmv_sketch: k in [16, 2^20], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch needs a LONG hash input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)

  override def update(buf: KmvBuf, input: InternalRow): KmvBuf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuf, other: KmvBuf): KmvBuf = {
    val it = other.set.iterator()
    while (it.hasNext) buf.insert(it.next())
    buf
  }

  override def eval(buf: KmvBuf): Any = new GenericArrayData(buf.sortedAsc)

  override def serialize(buf: KmvBuf): Array[Byte] = {
    val elems = buf.sortedAsc
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * elems.length)
    bb.putInt(elems.length)
    elems.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new KmvBuf(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): KmvSketchAgg =
    copy(child = c)
  override def prettyName: String = "kmv_sketch"
}

/** Driver-side estimators over KMV sketches (sorted-ascending signed
  * hash arrays from [[KmvSketchAgg]]). All deterministic given the
  * sketches — the error bounds the invariants gate asserts are the
  * standard 4σ forms computed FROM the sketch, so they are reproducible
  * booleans, not flaky tolerances. */
object Kmv {

  /** Signed 64-bit hash → u ∈ [0,1), order-preserving. */
  private def u(h: Long): Double = h.toDouble / 1.8446744073709552e19 + 0.5

  /** Distinct-count estimate: exact when the sketch didn't fill
    * (|S| < k ⇒ S IS the distinct hash set), else the classic
    * (k−1)/u(k-th minimum). */
  def distinctEstimate(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / u(sketch(sketch.length - 1))

  /** k smallest distinct of two sketches' union — the merged sketch, and
    * also the sketch of A ∪ B (the mergeability identity the invariants
    * gate pins). */
  def merge(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val set = new java.util.TreeSet[java.lang.Long]()
    a.foreach(set.add(_))
    b.foreach(set.add(_))
    val out = new Array[Long](math.min(k, set.size))
    val it = set.iterator()
    var i = 0
    while (i < out.length) { out(i) = it.next(); i += 1 }
    out
  }

  /** (jaccard, intersection, union) estimates (Beyer et al. 2007): over
    * U = the merged k-minimum set, ρ = |{x ∈ U: x ∈ A ∧ x ∈ B}| / |U|
    * estimates J; |A∪B| from U's k-th minimum; |A∩B| = ρ·|A∪B|. */
  def overlapEstimate(a: Array[Long], b: Array[Long],
      k: Int): (Double, Double, Double) = {
    val union = merge(a, b, k)
    val sa = a.toSet
    val sb = b.toSet
    val both = union.count(x => sa(x) && sb(x))
    val rho = if (union.isEmpty) 0.0 else both.toDouble / union.length
    val uEst = distinctEstimate(union, k)
    (rho, rho * uEst, uEst)
  }

  /** 4σ bound for the ρ-based intersection estimate: ρ is a
    * hypergeometric (≈ binomial) fraction over |U| draws, σ_ρ =
    * sqrt(ρ(1−ρ)/|U|); scaled by the union estimate for the count form.
    * The +2 absorbs integer truncation at tiny overlaps. */
  def intersectionBound(rho: Double, nU: Int, unionEst: Double): Double =
    4.0 * math.sqrt(math.max(rho, 1.0 / math.max(nU, 1)) * (1 - rho) /
      math.max(nU, 1)) * unionEst + 2.0

  /** 4σ bound for a filled sketch's distinct estimate (CV = 1/sqrt(k−2));
    * an unfilled sketch is exact, bound 0. */
  def distinctBound(est: Double, filled: Boolean, k: Int): Double =
    if (!filled) 0.0 else 4.0 * est / math.sqrt((k - 2).toDouble)
}
