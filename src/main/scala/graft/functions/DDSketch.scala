package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** DDSketch-style mergeable quantile sketch (Masson, Rim & Lee, "DDSketch:
  * A Fast and Fully-Mergeable Quantile Sketch with Relative-Error
  * Guarantees", VLDB 2019 — public design, implemented from the paper).
  *
  * Log-bucketed histogram: finite nonzero values land in bucket
  * ceil(ln|v|/ln γ) of a sign-split store, γ = (1+α)/(1−α), so any
  * reported quantile is within relative error α of a true value. Chosen
  * over t-digest for the rollup because it is DETERMINISTIC and
  * MERGE-ORDER-INDEPENDENT: partial sketches from any batch split, merged
  * in any order, are byte-identical — the same algebraic-partials property
  * cnt/min/max/sum and the first/last pack already have, so quantile hints
  * slot into the existing rollup write/merge/compact machinery unchanged.
  *
  * Specials keep the full double domain totally ordered (consistent with
  * `Double.compare`, NaN greatest): −Inf < negatives < ±0.0 < positives <
  * +Inf < NaN, each in a dedicated bucket. Sketch state is a sparse
  * (bucket → count) map, serialized sorted-by-key for determinism;
  * per-rollup-bucket maps are small (a series' values within one step
  * bucket cluster into a few log buckets).
  */
object DDOps {
  /** Default relative-error bound (1%). */
  val DefaultAlpha = 0.01

  /** |index| clamp: for α ≥ 0.0005 every finite double maps inside the
    * clamp; smaller α degrades only the extreme tails (values beyond
    * ~e^(±2^21·lnγ)) to the clamp bucket instead of failing. */
  val MaxIdx: Int = 1 << 21

  // special buckets, disjoint from the ±2^22 range of sign-split keys
  val NegInfKey: Int = Int.MinValue
  val ZeroKey: Int = Int.MinValue + 1
  val PosInfKey: Int = Int.MaxValue - 1
  val NaNKey: Int = Int.MaxValue

  def gamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** Bucket key of a value: sign-split log index (positive → idx<<1,
    * negative → idx<<1|1) or a special bucket. */
  def key(v: Double, lnGamma: Double): Int = {
    if (java.lang.Double.isNaN(v)) return NaNKey
    if (v == Double.PositiveInfinity) return PosInfKey
    if (v == Double.NegativeInfinity) return NegInfKey
    if (v == 0.0) return ZeroKey
    val mag = math.abs(v)
    val raw = math.ceil(math.log(mag) / lnGamma)
    val idx = math.max(-MaxIdx, math.min(MaxIdx, raw)).toInt
    if (v > 0) idx << 1 else (idx << 1) | 1
  }

  /** Ascending-value rank of a bucket key (total order over the double
    * domain: −Inf, negatives by descending |v|, zero, positives, +Inf,
    * NaN greatest — `Double.compare`-consistent). */
  def rank(key: Int): Long = key match {
    case NegInfKey => -(1L << 40)
    case ZeroKey   => 1L << 30
    case PosInfKey => 1L << 40
    case NaNKey    => 1L << 41
    case k if (k & 1) == 1 => -(k >> 1).toLong // negative store: big idx = more negative
    case k => (1L << 32) + (k >> 1)
  }

  /** Representative value of a bucket (γ-midpoint of the log bucket —
    * the paper's 2γ^i/(γ+1) point, relative error ≤ α). */
  def estimate(key: Int, g: Double): Double = key match {
    case NegInfKey => Double.NegativeInfinity
    case ZeroKey   => 0.0
    case PosInfKey => Double.PositiveInfinity
    case NaNKey    => Double.NaN
    case k if (k & 1) == 1 => -(2.0 * math.pow(g, (k >> 1).toDouble) / (g + 1))
    case k => 2.0 * math.pow(g, (k >> 1).toDouble) / (g + 1)
  }

  /** q-quantile (q ∈ [0,1]) from serialized sketch bytes; null when the
    * sketch is empty (only possible from merging pre-migration null
    * partials — a row's own sketch always saw ≥ 1 value). Invoked from
    * generated code. */
  def quantileOrNull(bytes: Array[Byte], q: Double): java.lang.Double = {
    val h = DDHist.deserialize(bytes)
    var total = 0L
    h.counts.foreach { case (_, c) => total += c }
    if (total == 0) return null
    val g = gamma(h.alpha)
    // rank r = floor(q·(n−1)); walk buckets in value order until the
    // cumulative count exceeds it (the paper's quantile procedure)
    val r = math.floor(q * (total - 1)).toLong
    val byRank = h.counts.keysIterator.toArray.sortBy(rank)
    var cum = 0L
    var i = 0
    while (i < byRank.length) {
      cum += h.counts(byRank(i))
      if (cum > r) return estimate(byRank(i), g)
      i += 1
    }
    estimate(byRank.last, g)
  }
}

/** Mutable sketch state: relative-error bound + sparse bucket counts.
  * `alpha == 0` marks an empty merge buffer that adopts the first merged
  * sketch's bound. */
final class DDHist(var alpha: Double) {
  val counts: scala.collection.mutable.HashMap[Int, Long] =
    scala.collection.mutable.HashMap.empty
  private var lnGamma: Double = if (alpha > 0) math.log(DDOps.gamma(alpha)) else 0.0

  def add(v: Double): Unit = {
    require(alpha > 0, "cannot add values to an unparameterized merge buffer")
    val k = DDOps.key(v, lnGamma)
    counts.update(k, counts.getOrElse(k, 0L) + 1L)
  }

  def mergeWith(other: DDHist): Unit = {
    if (other.alpha == 0) return // empty unparameterized buffer
    if (alpha == 0) { alpha = other.alpha; lnGamma = math.log(DDOps.gamma(alpha)) }
    else require(alpha == other.alpha,
      s"cannot merge sketches with different error bounds ($alpha vs ${other.alpha})")
    other.counts.foreach { case (k, c) =>
      counts.update(k, counts.getOrElse(k, 0L) + c)
    }
  }

  /** Deterministic bytes: version, alpha, n, then (key, count) pairs
    * sorted by key — identical content ⇒ identical bytes, so merge-order
    * independence holds at the byte level (testable with a column ===). */
  def serialize(): Array[Byte] = {
    val keys = counts.keysIterator.toArray
    java.util.Arrays.sort(keys)
    val buf = java.nio.ByteBuffer.allocate(1 + 8 + 4 + 12 * keys.length)
    buf.put(1.toByte).putDouble(alpha).putInt(keys.length)
    var i = 0
    while (i < keys.length) {
      buf.putInt(keys(i)).putLong(counts(keys(i)))
      i += 1
    }
    buf.array()
  }
}

object DDHist {
  def deserialize(bytes: Array[Byte]): DDHist = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val ver = buf.get()
    require(ver == 1, s"unknown dd_hist version $ver")
    val h = new DDHist(buf.getDouble())
    val n = buf.getInt()
    var i = 0
    while (i < n) {
      val k = buf.getInt(); val c = buf.getLong()
      h.counts.update(k, c)
      i += 1
    }
    h
  }
}

/** `dd_hist(double) -> binary` — build a DDSketch over a group's values.
  * NULLs are skipped (SQL aggregate convention); NaN/±Inf/zero are counted
  * in their own buckets so cnt parity with `count(value)` holds. */
case class DDHistAgg(child: Expression, alpha: Double = DDOps.DefaultAlpha,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DDHist] with UnaryLike[Expression] {
  require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
  // SQL-reachable via GraftFunctions: fail at analysis, not with a
  // mid-job ClassCastException from executors (same contract as
  // DDQuantile's check; AbstractDataType is sql-private in Spark 4, so no
  // ImplicitCastInputTypes here — callers cast numerics explicitly)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dd_hist expects a DOUBLE value column (cast numerics), got ${other.sql}")
    }
  override def createAggregationBuffer(): DDHist = new DDHist(alpha)
  override def update(buf: DDHist, input: InternalRow): DDHist = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }
  override def merge(buf: DDHist, other: DDHist): DDHist = { buf.mergeWith(other); buf }
  override def eval(buf: DDHist): Any = buf.serialize()
  override def serialize(buf: DDHist): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): DDHist = DDHist.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): DDHistAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): DDHistAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): DDHistAgg = copy(child = c)
  override def prettyName: String = "dd_hist"
}

/** `dd_hist_merge(binary) -> binary` — re-merge serialized sketches (the
  * rollup partial-row combine). NULL inputs (pre-migration rollup rows)
  * are skipped, mirroring min/max-ignores-nulls on the first/last pack —
  * the serving gate keeps mixed groups away from quantile funcs. */
case class DDHistMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[DDHist] with UnaryLike[Expression] {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dd_hist_merge expects binary sketch bytes, got ${other.sql}")
    }
  override def createAggregationBuffer(): DDHist = new DDHist(0.0)
  override def update(buf: DDHist, input: InternalRow): DDHist = {
    val v = child.eval(input)
    if (v != null) buf.mergeWith(DDHist.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(buf: DDHist, other: DDHist): DDHist = { buf.mergeWith(other); buf }
  override def eval(buf: DDHist): Any = buf.serialize()
  override def serialize(buf: DDHist): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): DDHist = DDHist.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(n: Int): DDHistMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): DDHistMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): DDHistMergeAgg = copy(child = c)
  override def prettyName: String = "dd_hist_merge"
}

/** `dd_quantile(binary, q) -> double` — q-quantile of a serialized sketch,
  * within relative error α of a true value; null for an empty sketch. */
case class DDQuantile(child: Expression, q: Double) extends UnaryExpression {
  require(q >= 0 && q <= 1, s"quantile must be in [0,1], got $q")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dd_quantile expects binary sketch bytes, got ${other.sql}")
    }
  override def nullSafeEval(input: Any): Any =
    DDOps.quantileOrNull(input.asInstanceOf[Array[Byte]], q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // freshName, NOT a fixed local: two dd_quantile calls in one
      // projection (p50/p90/p99 is the common shape) land in ONE
      // generated function — a fixed `r` made Janino reject the whole
      // function ("Redefinition of local variable r") and the plan fell
      // back to interpreted eval silently (r15 verdict).
      val r = ctx.freshName("r")
      s"""
      java.lang.Double $r = graft.functions.DDOps.quantileOrNull($c, ${q}D);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
    """})
  override protected def withNewChildInternal(c: Expression): DDQuantile = copy(child = c)
  override def prettyName: String = "dd_quantile"
}
