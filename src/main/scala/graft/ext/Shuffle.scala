package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic global shuffle for training-data ordering: every epoch of
  * a pre-training run wants the corpus in a pseudo-random order that is a
  * pure function of (corpus, seed) — reproducible across reruns, engines,
  * and cluster layouts. `ORDER BY rand()` fails all three (partitioning-
  * dependent); sorting by a salted cryptographic hash of the row identity
  * fails none: md5 is bit-identical everywhere and keying by `seed:id`
  * draws a fresh independent permutation per seed (epoch).
  *
  * Assigning the POSITION in that order is the distributed-rank problem.
  * The naive `row_number() OVER (ORDER BY h)` is an un-partitioned window —
  * Spark plans a single-partition exchange and ranks 100 TB on one task.
  * This instead reuses the two-pass prefix-sum shape of [[Packing]]:
  *
  *   1. bucket rows by the hash's first hex byte — 256 buckets that are
  *      ORDER-ALIGNED with the hash sort order (bucket b's rows all sort
  *      before bucket b+1's) and uniformly sized (md5 is uniform), so no
  *      balance assumption is needed, unlike Packing's id-density one;
  *   2. one partial-agg exchange counts rows per bucket (≤256 rows reach
  *      the driver); their running sum is each bucket's global rank base;
  *   3. `row_number` per bucket (partitionBy bucket, orderBy hash) plus the
  *      broadcast base — per-task state is one bucket's slice (~1/256 of
  *      the corpus; raise `hexDigits` for more buckets at larger scale).
  */
object Shuffle {

  /** Global 0-based shuffle position for each row, as a pure function of
    * (seed, id). Ties on the full 32-hex hash are broken by `id` — total
    * and deterministic even in the astronomically-unlikely collision case.
    */
  def deterministicOrder(df: DataFrame, id: String, seed: String,
      hexDigits: Int = 2): DataFrame = {
    // Driver memory for the bucket-count collect scales as 16^hexDigits
    // rows: 5 digits ≈ 1M tuples (~tens of MB) is the safe ceiling; beyond
    // that the prefix sum itself would need to go distributed, which
    // defeats the ≤bounded-driver-state design. 5 digits already yields
    // ~100k-row task slices at 100 TB / ~1 KB rows.
    require(hexDigits >= 1 && hexDigits <= 5, s"hexDigits in [1,5], got $hexDigits")
    // Sort on the 16-byte binary digest, not the 32-char hex string:
    // unsigned byte-wise binary comparison is exactly the lexicographic
    // order of the lowercase hex rendering (same permutation, the one the
    // oracle states), at half the key bytes through the shuffle and sort.
    val h = md5(concat(lit(seed), lit(":"), col(id).cast("string")))
    val hashed = df.withColumn("__h", unhex(h))
      // conv() parses the hex prefix; order-aligned because the prefix is
      // the most-significant digits of the ordering. Both columns share
      // the one md5 call via codegen subexpression elimination.
      .withColumn("__bucket", conv(substring(h, 1, hexDigits), 16, 10).cast("long"))

    val counts = hashed.groupBy("__bucket").agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val bases = counts.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, n)) => (b, acc + n)
    }.sliding(2).collect { case Array((_, base), (b, _)) => (b, base) }.toSeq
    if (bases.isEmpty)
      return df.withColumn("pos", lit(0L)).limit(0)
    val baseDf = df.sparkSession.createDataFrame(bases).toDF("__bucket", "__base")

    val win = Window.partitionBy("__bucket").orderBy(col("__h"), col(id))
    hashed.join(broadcast(baseDf), "__bucket")
      .withColumn("pos", col("__base") + row_number().over(win) - 1)
      .drop("__h", "__bucket", "__base")
  }
}
