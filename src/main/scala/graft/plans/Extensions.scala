package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ext._
import graft.functions._

/** SQL surface for the engine's custom Catalyst kernels.
  *
  * Every custom expression (fingerprint, canonical JSON, minhash/simhash,
  * cosine, DDSketch aggregates, …) is usable from the Column API via
  * `graft.functions`/`graft.ext.extfunctions`; this module registers the
  * same builders in the session's `FunctionRegistry` so they are equally
  * callable from `spark.sql("…")` — including through the rawsql escape
  * hatch (reference: storages/clickhouse/rawsql.go:48-101), which thereby
  * gains the engine's kernels on top of the stock Spark SQL surface.
  *
  * Two installation paths, same table of builders:
  *   - [[GraftExtensions]] for config-driven sessions
  *     (`--conf spark.sql.extensions=graft.plans.GraftExtensions`), the
  *     idiomatic deployment on a shared cluster: rule + functions exist
  *     before any user code runs.
  *   - [[GraftFunctions.register]] + [[Rules.install]] for sessions the
  *     engine builds itself (tools, tests, the driver's entry points) —
  *     both idempotent.
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  private def arity(name: String, args: Seq[Expression], n: Int*): Unit =
    if (!n.contains(args.length))
      throw new IllegalArgumentException(
        s"$name expects ${n.mkString(" or ")} argument(s), got ${args.length}")

  /** SQL literal argument → Int (bands, shingle width, …). Foldable so
    * `minhash_signature(ws, 32 * 2)` works, not just bare literals. */
  private def intArg(name: String, e: Expression): Int = {
    require(e.foldable, s"$name: expected a foldable integer literal argument")
    e.eval() match {
      case i: Int => i
      case l: Long => math.toIntExact(l)
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal.toIntExact
      case other =>
        throw new IllegalArgumentException(
          s"$name: expected an integer literal, got $other")
    }
  }

  /** SQL literal argument → Double (quantile, alpha). SQL `0.5` parses as
    * a decimal literal, so Decimal is the common case. */
  private def doubleArg(name: String, e: Expression): Double = {
    require(e.foldable, s"$name: expected a foldable numeric literal argument")
    e.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case other =>
        throw new IllegalArgumentException(
          s"$name: expected a numeric literal, got $other")
    }
  }

  private def fn(name: String, clazz: Class[_])(b: Builder)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getCanonicalName, name), b)

  /** The full registration table — one row per custom kernel. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    fn("labels_fingerprint", classOf[LabelsFingerprint]) { a =>
      arity("labels_fingerprint", a, 1); LabelsFingerprint(a(0))
    },
    fn("labels_json", classOf[LabelsCanonicalJson]) { a =>
      arity("labels_json", a, 1); LabelsCanonicalJson(a(0))
    },
    fn("ts_val_encode", classOf[TsValEncode]) { a =>
      arity("ts_val_encode", a, 2); TsValEncode(a(0), a(1))
    },
    fn("ts_val_ts", classOf[TsValTs]) { a =>
      arity("ts_val_ts", a, 1); TsValTs(a(0))
    },
    fn("ts_val_v", classOf[TsValV]) { a =>
      arity("ts_val_v", a, 1); TsValV(a(0))
    },
    fn("long_pair_encode", classOf[LongPairEncode]) { a =>
      arity("long_pair_encode", a, 2); LongPairEncode(a(0), a(1))
    },
    fn("cosine_sim", classOf[CosineSimilarity]) { a =>
      arity("cosine_sim", a, 2); CosineSimilarity(a(0), a(1))
    },
    fn("dot_f", classOf[DotProductF]) { a =>
      arity("dot_f", a, 2); DotProductF(a(0), a(1))
    },
    fn("jaccard_sim", classOf[JaccardSim]) { a =>
      arity("jaccard_sim", a, 2); JaccardSim(a(0), a(1))
    },
    fn("minhash_signature", classOf[MinHashSignature]) { a =>
      arity("minhash_signature", a, 2)
      MinHashSignature(a(0), intArg("minhash_signature", a(1)))
    },
    fn("simhash64", classOf[SimHash64]) { a =>
      arity("simhash64", a, 1); SimHash64(a(0))
    },
    fn("word_shingles", classOf[WordShingles]) { a =>
      arity("word_shingles", a, 2)
      WordShingles(a(0), intArg("word_shingles", a(1)))
    },
    fn("unicode_clean", classOf[UnicodeClean]) { a =>
      arity("unicode_clean", a, 1); UnicodeClean(a(0))
    },
    fn("repetition_stats", classOf[RepetitionStats]) { a =>
      arity("repetition_stats", a, 2)
      RepetitionStats(a(0), intArg("repetition_stats", a(1)))
    },
    fn("lsh_buckets", classOf[LshBuckets]) { a =>
      arity("lsh_buckets", a, 3)
      LshBuckets(a(0), intArg("lsh_buckets", a(1)), intArg("lsh_buckets", a(2)))
    },
    fn("rolling_fingerprint", classOf[RollingFingerprint]) { a =>
      arity("rolling_fingerprint", a, 1, 3)
      if (a.length == 1) RollingFingerprint(a(0), 8, 16)
      else RollingFingerprint(a(0),
        intArg("rolling_fingerprint", a(1)), intArg("rolling_fingerprint", a(2)))
    },
    fn("dd_hist", classOf[DDHistAgg]) { a =>
      arity("dd_hist", a, 1, 2)
      if (a.length == 1) DDHistAgg(a(0))
      else DDHistAgg(a(0), doubleArg("dd_hist", a(1)))
    },
    fn("dd_hist_merge", classOf[DDHistMergeAgg]) { a =>
      arity("dd_hist_merge", a, 1); DDHistMergeAgg(a(0))
    },
    fn("bloom_agg",
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate]) { a =>
      arity("bloom_agg", a, 1, 3)
      import org.apache.spark.sql.catalyst.expressions.Literal
      val items = if (a.length == 3) intArg("bloom_agg", a(1)).toLong else 1L << 20
      val fpp = if (a.length == 3) doubleArg("bloom_agg", a(2)) else 0.01
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        a(0), Literal(items), Literal(graft.functions.bloomNumBits(items, fpp)))
    },
    fn("bloom_might_contain",
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]) { a =>
      arity("bloom_might_contain", a, 2)
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(a(0), a(1))
    },
    fn("dd_quantile", classOf[DDQuantile]) { a =>
      arity("dd_quantile", a, 2); DDQuantile(a(0), doubleArg("dd_quantile", a(1)))
    },
    fn("freq_sketch", classOf[FreqSketchAgg]) { a =>
      arity("freq_sketch", a, 1, 2)
      if (a.length == 1) FreqSketchAgg(a(0))
      else FreqSketchAgg(a(0), intArg("freq_sketch", a(1)))
    },
    fn("freq_sketch_merge", classOf[FreqSketchMergeAgg]) { a =>
      arity("freq_sketch_merge", a, 1); FreqSketchMergeAgg(a(0))
    },
    fn("freq_items", classOf[FreqItems]) { a =>
      arity("freq_items", a, 1); FreqItems(a(0))
    },
    fn("freq_n", classOf[FreqN]) { a =>
      arity("freq_n", a, 1); FreqN(a(0))
    },
    fn("bottom_k", classOf[BottomKAgg]) { a =>
      arity("bottom_k", a, 2); BottomKAgg(a(0), intArg("bottom_k", a(1)))
    },
    fn("gram_hashes", classOf[GramHashes]) { a =>
      arity("gram_hashes", a, 2); GramHashes(a(0), intArg("gram_hashes", a(1)))
    }
  )

  /** Sessions already registered — `registerFunction` itself is a
    * replace (safe), but it logs a replacement warning per function per
    * call, and the rawsql path registers on every query. Weak keys: a
    * stopped session's entry must not pin it. */
  private val installed =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently register every kernel on an already-built session. */
  def register(spark: SparkSession): Unit =
    if (installed.putIfAbsent(spark, java.lang.Boolean.TRUE) == null) {
      val reg = org.apache.spark.sql.graftbridge.functionRegistry(spark)
      all.foreach { case (ident, info, builder) => reg.registerFunction(ident, info, builder) }
    }
}

/** Post-hoc installation of everything [[GraftExtensions]] injects, for
  * sessions the engine (or a test) built without the config. */
object Engine {
  def install(spark: SparkSession): Unit = {
    Rules.install(spark)
    GraftFunctions.register(spark)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — installs the
  * engine's optimizer rule and SQL functions at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NanosComparisonPushdown)
    GraftFunctions.all.foreach(ext.injectFunction)
  }
}
