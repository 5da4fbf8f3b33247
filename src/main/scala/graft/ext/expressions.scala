package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the training-data-pipeline expressions. Each is a
  * tight loop over array data invoked from generated code — the per-row hot
  * path stays inside whole-stage codegen with no boxing per element. */
object ExtOps {

  /** Cosine similarity of two float vectors, accumulated in double,
    * left-to-right (matches DuckDB list_cosine_similarity on double casts). */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0d; var na = 0d; var nb = 0d
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0d || nb == 0d) 0d else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0d
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  /** splitmix64 — public-domain mixer; used to derive per-permutation
    * coefficients deterministically. */
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** FNV-1a over UTF-8 bytes — cheap, dependency-free base hash for
    * shingles/words (quality is sufficient for MinHash/SimHash bucketing). */
  @inline def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = -3750763034362895579L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 1099511628211L; i += 1 }
    h
  }

  /** Per-k permutation coefficients, derived once (they were previously
    * re-derived per token × permutation — pure waste in the hot loop). */
  private val minhashCoef =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()
  private def coeffs(k: Int): (Array[Long], Array[Long]) =
    minhashCoef.computeIfAbsent(k, { kk =>
      (Array.tabulate(kk)(j => splitmix64(2L * j + 1) | 1L),
        Array.tabulate(kk)(j => splitmix64(-(j + 1).toLong)))
    })

  /** MinHash signature: one base hash per element, k universal-hash
    * permutations h_j(x) = a_j*x + b_j (a_j odd). One pass over the data
    * regardless of k — the 100 TB-friendly form (vs k transforms). */
  def minhash(tokens: ArrayData, k: Int): ArrayData = {
    val (as, bs) = coeffs(k)
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = hash64(tokens.getUTF8String(i))
      var j = 0
      while (j < k) {
        val p = as(j) * h + bs(j)
        if (p < sig(j)) sig(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over token hashes (majority vote per bit). */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = hash64(tokens.getUTF8String(i))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (counts(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  /** Unicode text repair — the cleanup every web corpus needs BEFORE
    * tokenization/hashing, so `'e'+COMBINING ACUTE` and `'é'` dedup and
    * fingerprint identically: NFC composition, CR/CRLF → LF, then C0/C1
    * control characters stripped (TAB and LF survive). One pass after the
    * normalizer; the t12 oracle mirrors the chain exactly
    * (`nfc_normalize` → replace CRLF → replace CR → regexp class strip). */
  def unicodeClean(s: UTF8String): UTF8String = {
    val str = java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC)
    val n = str.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c == '\r') {
        sb.append('\n')
        if (i + 1 < n && str.charAt(i + 1) == '\n') i += 1
      } else if (c == '\t' || c == '\n' ||
          !(c < 0x20 || (c >= 0x7f && c <= 0x9f))) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** The space-joined n-gram starting at word `i` — ONE definition of
    * gram-string construction (separator, join order) shared by
    * [[repetitionStats]], [[shingleSet]] and [[gramHashes]]: d2/d7
    * shingles, t6 repetition signals and d10 span hashes must all agree
    * on what an n-gram IS for the oracle-parity story to hold. */
  @inline private def gramAt(ws: ArrayData, i: Int, n: Int): UTF8String = {
    var s = ws.getUTF8String(i)
    var j = 1
    while (j < n) {
      s = UTF8String.concat(s, UTF8String.fromString(" "), ws.getUTF8String(i + j))
      j += 1
    }
    s
  }

  /** n-gram repetition statistics in one O(words) hashmap pass:
    * (total n-gram instances, instances whose n-gram occurs more than
    * once, occurrences of the most frequent n-gram) — the Gopher-rule
    * repetition signals (duplicate-n-gram fraction, top-n-gram fraction)
    * derive from these by division. One multiset count per row, map-only;
    * the unnest+GROUP BY formulation an SQL engine uses would shuffle
    * every n-gram instance of a 100 TB corpus twice. */
  def repetitionStats(ws: ArrayData, n: Int): InternalRow = {
    val count = ws.numElements()
    if (count < n) return InternalRow(0L, 0L, 0L)
    // clamp the size hint: `count * 2` overflows Int for >2^30-word docs
    // (negative capacity throws); past the clamp the map just rehashes
    val freq = new java.util.HashMap[UTF8String, Int](math.min(count, 1 << 20) * 2)
    var i = 0
    while (i <= count - n) {
      freq.merge(gramAt(ws, i, n), 1, (a, b) => a + b)
      i += 1
    }
    var dup = 0L; var top = 0L
    val it = freq.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > 1) dup += c
      if (c > top) top = c
    }
    InternalRow((count - n + 1).toLong, dup, top)
  }

  /** Distinct word n-gram shingles in one codegen'd pass — the
    * higher-order-function formulation (transform/element_at) evaluates
    * interpreted and gets re-inlined into optimizer-inferred filters, which
    * turned the shingle pass quadratic; this kernel is O(words). */
  def shingleSet(ws: ArrayData, n: Int): ArrayData = {
    val count = ws.numElements()
    if (count < n) return new GenericArrayData(Array.empty[Any])
    // same Int-overflow clamp as repetitionStats' size hint
    val seen = new java.util.LinkedHashSet[UTF8String](math.min(count, 1 << 20) * 2)
    var i = 0
    while (i <= count - n) {
      seen.add(gramAt(ws, i, n))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Positional word n-gram hashes: out(i) = hash64 of the space-joined n
    * words starting at i (length = words−n+1; empty when words < n). The
    * POSITIONAL counterpart of [[shingleSet]] — span-level dedup (d10)
    * needs every occurrence with its offset, not the distinct set. Emits
    * longs, not gram strings: the exploded (pos, hash) stream is 16
    * bytes/row through the duplicate-detection exchange instead of the
    * n-word text. FNV-64 collisions mark a false duplicate position at
    * ~n²/2⁶⁵ probability — negligible against a 64-bit keyspace. */
  def gramHashes(ws: ArrayData, n: Int): ArrayData = {
    val count = ws.numElements()
    if (count < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](count - n + 1)
    var i = 0
    while (i <= count - n) {
      out(i) = hash64(gramAt(ws, i, n))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane LSH bucket ids, all hash tables in one pass.
    * Hyperplane components are ±1 derived from splitmix64 — identical to
    * evaluating `tables`×`bits` aggregate(zip_with) dot products, but one
    * tight loop with no per-element closures or intermediate arrays.
    * Accumulation per plane is left-to-right in element order, so results
    * are bitwise-equal to the HOF formulation it replaces. */
  def lshBuckets(emb: ArrayData, tables: Int, bits: Int): ArrayData = {
    val n = emb.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val base = (t * 64 + j) * 64 + 12345
        var dot = 0d
        var d = 0
        while (d < n) {
          val x = emb.getFloat(d).toDouble
          dot += (if ((splitmix64((base + d).toLong) & 1L) == 1L) x else -x)
          d += 1
        }
        if (dot >= 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Exact Jaccard similarity of two DISTINCT-element string arrays in one
    * pass: |∩| via a hash probe of the smaller side, |∪| = na + nb − |∩|.
    * Replaces `size(array_intersect)/size(array_union)` in the dedup
    * verification hot path — those materialize both result arrays just to
    * take their sizes (two hash builds + two output copies per pair).
    * Same rational value ⇒ bit-identical double ⇒ oracle-stable. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 || nb == 0) return 0d
    val (small, big, ns, nbg) = if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nbg) { if (set.contains(big.getUTF8String(i))) inter += 1; i += 1 }
    inter.toDouble / (na + nb - inter)
  }

  /** Winnowing-style document fingerprint: Rabin-Karp rolling hash over
    * UTF-8 bytes with window `w`; keep hashes ≡ 0 (mod `mod`) — a
    * deterministic content-defined sample of substring hashes (the MOSS /
    * content-defined-chunking idea, public literature). Output sorted
    * distinct, so it is set-comparable. */
  def rollingFingerprint(text: UTF8String, w: Int, mod: Int): ArrayData = {
    val bytes = text.getBytes
    if (bytes.length < w) return new GenericArrayData(Array.empty[Long])
    val B = 1000003L
    var pow = 1L
    var i = 1
    while (i < w) { pow *= B; i += 1 }
    val out = scala.collection.mutable.SortedSet.empty[Long]
    var h = 0L
    i = 0
    while (i < bytes.length) {
      h = h * B + (bytes(i) & 0xffL)
      if (i >= w) h -= pow * B * (bytes(i - w) & 0xffL)
      if (i >= w - 1 && (h % mod + mod) % mod == 0) out += splitmix64(h)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ExtOps.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.ExtOps.cosineF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

case class DotProductF(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ExtOps.dotF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.ExtOps.dotF($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductF =
    copy(left = l, right = r)
  override def prettyName: String = "dot_f"
}

case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(tokens: Any): Any =
    ExtOps.minhash(tokens.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.ExtOps.minhash($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any): Any =
    ExtOps.simhash(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.ExtOps.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

case class UnicodeClean(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    ExtOps.unicodeClean(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.ExtOps.unicodeClean($c)")
  override protected def withNewChildInternal(c: Expression): UnicodeClean = copy(child = c)
  override def prettyName: String = "unicode_clean"
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(Array.empty[Any])
    else ExtOps.shingleSet(v.asInstanceOf[ArrayData], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    val empty = "new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[0])"
    ev.copy(
      code = c.code +
        code"""
           |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
           |  ${c.isNull} ? $empty : graft.ext.ExtOps.shingleSet(${c.value}, $n);
           |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def prettyName: String = "word_shingles"
}

case class RepetitionStats(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("dup_grams", LongType, nullable = false),
    StructField("top_gram", LongType, nullable = false)))
  override def nullSafeEval(tokens: Any): Any =
    ExtOps.repetitionStats(tokens.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.ExtOps.repetitionStats($c, $n)")
  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
  override def prettyName: String = "repetition_stats"
}

case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(ws: Any): Any =
    ExtOps.gramHashes(ws.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.ExtOps.gramHashes($c, $n)")
  override protected def withNewChildInternal(c: Expression): GramHashes = copy(child = c)
  override def prettyName: String = "gram_hashes"
}

case class LshBuckets(child: Expression, tables: Int, bits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(emb: Any): Any =
    ExtOps.lshBuckets(emb.asInstanceOf[ArrayData], tables, bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.ExtOps.lshBuckets($c, $tables, $bits)")
  override protected def withNewChildInternal(c: Expression): LshBuckets = copy(child = c)
  override def prettyName: String = "lsh_buckets"
}

case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    ExtOps.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ext.ExtOps.jaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
  override def prettyName: String = "jaccard_sim"
}

case class RollingFingerprint(child: Expression, window: Int, mod: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    ExtOps.rollingFingerprint(text.asInstanceOf[UTF8String], window, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ext.ExtOps.rollingFingerprint($c, $window, $mod)")
  override protected def withNewChildInternal(c: Expression): RollingFingerprint = copy(child = c)
  override def prettyName: String = "rolling_fingerprint"
}

/** Column API for the ext expressions. */
object extfunctions {
  import org.apache.spark.sql.graftbridge.{column, expression}

  def cosine_sim(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
  def dot_f(a: Column, b: Column): Column =
    column(DotProductF(expression(a), expression(b)))
  def minhash_signature(tokens: Column, k: Int): Column =
    column(MinHashSignature(expression(tokens), k))
  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))
  def word_shingles(ws: Column, n: Int): Column =
    column(WordShingles(expression(ws), n))
  def unicode_clean(s: Column): Column =
    column(UnicodeClean(expression(s)))
  def repetition_stats(ws: Column, n: Int): Column =
    column(RepetitionStats(expression(ws), n))
  def rolling_fingerprint(text: Column, window: Int = 8, mod: Int = 16): Column =
    column(RollingFingerprint(expression(text), window, mod))
  def jaccard_sim(a: Column, b: Column): Column =
    column(JaccardSim(expression(a), expression(b)))
  def lsh_buckets(emb: Column, tables: Int, bits: Int): Column =
    column(LshBuckets(expression(emb), tables, bits))

  /** Positional n-gram hashes of a word array — see [[GramHashes]]. */
  def gram_hashes(ws: Column, n: Int): Column =
    column(GramHashes(expression(ws), n))

  /** Bounded exact top-k aggregate: k smallest of `v` (natural ascending
    * ordering), returned sorted ascending — see [[BottomKAgg]]. */
  def bottom_k(v: Column, k: Int): Column =
    column(BottomKAgg(expression(v), k).toAggregateExpression())

  /** KMV distinct-value sketch: the k smallest DISTINCT 64-bit hashes of
    * `h`, sorted ascending — see [[KmvSketchAgg]]/[[Kmv]]. */
  def kmv_sketch(h: Column, k: Int): Column =
    column(KmvSketchAgg(expression(h), k).toAggregateExpression())
}
