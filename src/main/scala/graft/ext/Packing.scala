package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: documents are concatenated
  * in a canonical order (ORDER BY id) and split into fixed-size token
  * blocks (the context length), documents straddling block boundaries. The
  * operator computes each document's global token offset in that virtual
  * concatenation, plus the block span it lands in — the metadata a packed
  * pre-training dataloader needs (which block(s) to read for a document,
  * which documents compose a block).
  *
  * The naive formulation is `sum(w) OVER (ORDER BY id)` — an un-partitioned
  * window, which Spark executes on ONE task after shuffling the corpus to a
  * single partition: the textbook 100 TB scale-killer. This is instead the
  * classic two-pass distributed prefix sum:
  *
  *   1. bucket each row by an order-aligned id range (any order-aligned
  *      bucketing yields identical offsets — bucketing affects parallelism,
  *      never the result);
  *   2. one partial-agg exchange computes per-bucket token totals — at most
  *      `buckets` rows — whose running sum (driver-side, bounded by the
  *      `buckets` parameter) gives each bucket's global base offset;
  *   3. one window per bucket (`partitionBy(bucket) orderBy(id)`) adds the
  *      within-bucket running sum to the broadcast base.
  *
  * Per-task state is one bucket's slice (corpus/buckets — sized to the
  * cluster), the corpus shuffles once (on the uniform bucket key), and no
  * stage sees more than `buckets` rows of global state.
  */
object Packing {

  /** Global pack offsets for `df` in ascending `id` order (`id` must be a
    * unique long column; `weight` a non-negative integral token count).
    * Output: the input row's `id` and `weight` plus
    *   - `offset`      global token offset of the document's first token
    *   - `first_block` / `last_block`  the blockSize-token block span
    *     (last_block of an empty document equals first_block)
    *   - `spans_boundary` whether the document crosses a block edge.
    */
  def packOffsets(df: DataFrame, id: String, weight: Column, blockSize: Long,
      buckets: Int = 256): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val w = df.select(col(id), weight.cast("long").as("__w"))

    // Order-aligned range bucketing. min/max is a bounded 2-long agg; the
    // id-range split assumes roughly uniform id density for BALANCE (dense
    // surrogate ids — the common case). Offsets are bucketing-independent
    // either way.
    val bounds = w.agg(min(col(id)), max(col(id))).head()
    if (bounds.isNullAt(0)) // empty corpus
      return w.select(col(id), col("__w").as("weight"),
        lit(0L).as("offset"), lit(0L).as("first_block"), lit(0L).as("last_block"),
        lit(false).as("spans_boundary"))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // an id span past Long.MaxValue would overflow both `hi - lo` here and
    // the `id - lo` bucket expression below, silently mis-bucketing (and
    // therefore mis-offsetting) the extremes — fail loudly instead; ids
    // that wide need pre-normalizing (they are not the dense-surrogate
    // shape this bucketing balances for anyway)
    require(BigInt(hi) - BigInt(lo) <= BigInt(Long.MaxValue),
      s"id span [$lo, $hi] exceeds Long.MaxValue; normalize ids before packing")
    // ceil-div on the (non-negative) span so bucket ids stay < buckets;
    // integer DIV throughout — doubles lose bits past 2^53
    val width = math.max(1L, (hi - lo) / buckets + 1L)
    val bucketed = w.withColumn("__bucket",
      expr(s"(CAST(`$id` AS BIGINT) - ${lo}L) DIV ${width}L"))

    // Pass 1: per-bucket totals → global base offset per bucket. At most
    // `buckets` rows leave the partial aggregation; the running sum over
    // them is driver-side by design (bounded by the parameter, like the
    // ANN query/centroid sets).
    val totals = bucketed.groupBy("__bucket").agg(sum("__w").as("__t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val bases = totals.scanLeft((Long.MinValue, 0L)) {
      case ((_, acc), (b, t)) => (b, acc + t)
    }.sliding(2).map { case Array((_, base), (b, _)) => (b, base) }.toSeq
    val baseDf = df.sparkSession.createDataFrame(bases).toDF("__bucket", "__base")

    // Pass 2: within-bucket running sum + broadcast base join.
    val win = Window.partitionBy("__bucket").orderBy(id)
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = bucketed
      .join(broadcast(baseDf), "__bucket")
      .withColumn("offset", col("__base") + coalesce(sum("__w").over(win), lit(0L)))

    off.select(col(id), col("__w").as("weight"), col("offset"),
        expr(s"offset DIV ${blockSize}L").as("first_block"),
        expr(s"(offset + greatest(__w, 1L) - 1L) DIV ${blockSize}L").as("last_block"))
      .withColumn("spans_boundary", col("first_block") =!= col("last_block"))
  }

  /** The block-composition manifest — [[packOffsets]] inverted to the view
    * the DATALOADER consumes: for every blockSize-token block, which
    * document segments compose it. One row per (block, document) pair:
    *
    *   - `block_id`              the block (token range [b·B, (b+1)·B))
    *   - `seg_start`/`seg_end`   the segment's IN-BLOCK token range
    *     (end-exclusive); a document straddling a block edge appears in
    *     each block it touches with the clipped range.
    *
    * Segments tile each block exactly — `[0, B)` for every interior block,
    * `[0, tail)` for the last — with no overlaps and no gaps, which is the
    * invariant an attention-mask builder needs (mask resets at every
    * seg_start). Zero-weight documents occupy no tokens and emit no
    * segment.
    *
    * Scale shape: [[packOffsets]]'s two-pass prefix sum (no global window),
    * then a map-side `explode(sequence(first_block, last_block))` — fan-out
    * per document is `⌈w/B⌉ + 1` rows, so the manifest is at most
    * `docs + totalTokens/B` rows and no stage holds more than a partition's
    * slice. */
  def blockManifest(df: DataFrame, id: String, weight: Column,
      blockSize: Long, buckets: Int = 256): DataFrame = {
    val off = packOffsets(df, id, weight, blockSize, buckets)
    off.where(col("weight") > 0L)
      .select(col(id), col("offset"),
        (col("offset") + col("weight")).as("__gend"),
        explode(expr("sequence(first_block, last_block)")).as("block_id"))
      .select(col("block_id"), col(id),
        (greatest(col("offset"), col("block_id") * blockSize)
          - col("block_id") * blockSize).as("seg_start"),
        (least(col("__gend"), (col("block_id") + 1L) * blockSize)
          - col("block_id") * blockSize).as("seg_end"))
  }

  /** BEST-FIT packing (Ding et al. 2024, "Fewer Truncations Improve
    * Language Modeling"): instead of [[packOffsets]]' concatenate-and-
    * split (which truncates documents at every block boundary), assign
    * each document WHOLE to a bin of `capacity` tokens via best-fit-
    * decreasing — the published padding/truncation reducer. Documents
    * longer than the capacity are clipped to one full bin (the paper's
    * pre-split; at a real context length almost nothing clips).
    *
    * Scale shape: exact FFD/BFD is inherently sequential, so the corpus
    * shards deterministically (`pmod(xxhash64(id), shards)` — a uniform
    * hash, never data order) and each shard packs independently inside
    * ONE task: sort its slice by (tokens desc, id), best-fit via a
    * remaining-capacity TreeMap (O(n log bins)), bin ids = shard·2³² +
    * local index so ids never collide across shards. One exchange (the
    * shard repartition); per-task state is a shard's doc-COUNT-sized
    * bin table, no driver involvement. Sharding costs packing quality
    * only at the margin: BFD's all-but-one-bin-over-half-full guarantee
    * holds PER SHARD (pinned as a gate invariant), so total padding
    * stays within shards/2 bins of the unsharded run.
    *
    * Output: (id, tokens, bin_id) — one row per doc, every doc assigned
    * exactly once. Deterministic for fixed (corpus, capacity, shards). */
  def bestFitBins(df: DataFrame, id: String, weight: Column,
      capacity: Long, shards: Int = 64): DataFrame = {
    require(capacity > 0 && shards > 0)
    val spark = df.sparkSession
    import spark.implicits._
    // least() skips NULLs (SQL semantics): an unguarded NULL weight would
    // silently become tokens=capacity — a whole bin per NULL doc — and the
    // tokens_clipped gate invariant re-derives through the same least(),
    // so it could never catch it. NULL/negative weights count as 0.
    df.select(col(id).cast("long").as("id"),
        least(greatest(coalesce(weight.cast("long"), lit(0L)), lit(0L)),
          lit(capacity)).as("tokens"),
        pmod(xxhash64(col(id)), lit(shards.toLong)).cast("int").as("shard"))
      .repartition(shards, col("shard"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        val docs = it.toArray
        if (docs.isEmpty) Iterator.empty
        else {
          // several shards can share a task when shards > partitions;
          // pack each independently so bin ids stay shard-scoped
          docs.groupBy(_._3).iterator.flatMap { case (sh, ds) =>
            val sorted = ds.sortBy { case (i, w, _) => (-w, i) }
            // remaining capacity -> bin ids with that exact remainder
            // (best fit = smallest remainder >= w; ties to the oldest bin)
            val byRem = new java.util.TreeMap[Long, java.util.TreeSet[Int]]()
            val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
            def place(rem: Long, bin: Int): Unit =
              byRem.computeIfAbsent(rem, _ => new java.util.TreeSet[Int]()).add(bin)
            def unplace(rem: Long, bin: Int): Unit = {
              val s = byRem.get(rem); s.remove(bin)
              if (s.isEmpty) byRem.remove(rem)
            }
            sorted.iterator.map { case (docId, w, _) =>
              val e = byRem.ceilingEntry(w)
              val bin =
                if (e == null) { fills += 0L; fills.length - 1 }
                else {
                  val b = e.getValue.first()
                  unplace(e.getKey, b); b
                }
              val rem = capacity - fills(bin) - w
              fills(bin) += w
              place(rem, bin)
              (docId, w, sh.toLong * (1L << 32) + bin)
            }
          }
        }
      }
      .toDF("id", "tokens", "bin_id")
      .withColumnRenamed("id", id)
  }
}
