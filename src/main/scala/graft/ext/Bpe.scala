package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning — the tokenizer-TRAINING step of a
  * data pipeline (t1's counting is the serving side). Classic algorithm
  * (Sennrich et al. 2016): represent each distinct word as a symbol
  * sequence (characters + an end-of-word marker), repeatedly count
  * frequency-weighted adjacent symbol pairs and merge the most frequent
  * pair everywhere, emitting one merge rule per step.
  *
  * Scale shape — the published recipe's own: ONE corpus pass builds the
  * word-frequency dictionary (the partial-agg exchange t1 proved), and
  * every subsequent iteration runs on the DICTIONARY (|vocab| rows, not
  * corpus rows): pair counting is a vocab-sized explode + partial agg,
  * the argmax is a 1-row driver collect (bounded driver state), and the
  * merge is a map-side fold over each word's symbol array. Plan growth
  * across iterations is capped by localCheckpoint (each step
  * materializes the bounded dictionary, so step k+1's plan does not
  * embed k transforms). Determinism: ties break (count desc, left asc,
  * right asc) — a total order, pinned against a plain-Scala reference
  * implementation in ExtSpec.
  */
object Bpe {

  /** End-of-word marker (the standard `</w>` sentinel). */
  val Eow = "</w>"

  /** Merge (a, b) occurrences left-to-right in a symbol array — the
    * greedy leftmost-first, non-overlapping application standard BPE
    * uses ("aaa" under (a,a) becomes ["aa","a"]). */
  private def mergeSym(sym: Column, a: String, b: String): Column =
    aggregate(sym, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Serving-side encode: apply learned merge rules, in rule order, to a
    * words-array column — each word becomes its BPE symbol sequence
    * (chars + [[Eow]], folded through every rule). Pure map-side column
    * expression (rule count is small and fixed, so the chained folds stay
    * one projection); the training loop above is the write-side one-off
    * that produces `rules`. */
  def encodeWords(ws: Column, rules: Seq[(String, String)]): Column =
    transform(ws, w => {
      val chars = concat(
        transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1))),
        array(lit(Eow)))
      rules.foldLeft(chars) { case (sym, (a, b)) => mergeSym(sym, a, b) }
    })

  /** Greedy leftmost application of a BATCH of symbol-disjoint rules in
    * one pass — equivalent to applying each rule's [[mergeSym]] fold
    * separately, because disjoint rules never compete for a symbol. */
  private def applyRules(sym: Seq[String],
      rules: Map[(String, String), String]): Seq[String] = {
    if (sym.length < 2) return sym
    val out = new scala.collection.mutable.ArrayBuffer[String](sym.length)
    var j = 0
    while (j < sym.length) {
      val cur = sym(j)
      if (out.nonEmpty && rules.contains((out.last, cur)))
        out(out.length - 1) = rules((out.last, cur))
      else out += cur
      j += 1
    }
    out.toSeq
  }

  /** BATCHED merge learning — the scale path for real vocab sizes. The
    * sequential algorithm ([[merges]]) is driver-paced: one pair-count
    * job + one argmax collect PER RULE, so a 32k-rule tokenizer costs 32k
    * scheduler round trips (~a day of driver-bound wall time regardless
    * of cluster size). This variant learns up to `batch` rules per round
    * (the published fast-BPE family: apply the top-N MUTUALLY DISJOINT
    * pairs per recount), collapsing 32k rounds into hundreds:
    *
    *   - one pair-count job per ROUND (vocab-sized partial agg), top
    *     candidates collected in the argmax order (count desc, left asc,
    *     right asc — the same total order as sequential);
    *   - a candidate is accepted iff none of its left symbol, right
    *     symbol, or MERGED string was touched by an earlier acceptance in
    *     the round — disjointness makes the batch's application
    *     order-independent AND keeps the one-pass [[applyRules]] fold
    *     exactly equal to per-rule sequential application;
    *   - the batch applies in ONE map-side pass over the dictionary.
    *
    * At `batch = 1` this IS the sequential algorithm (same argmax, same
    * greedy merge — pinned in ExtSpec). For `batch > 1` the learned rule
    * SET can deviate from strict sequential order where an early merge
    * would have changed a later pair's count — the standard, documented
    * trade of every batched BPE trainer; rule quality is preserved
    * because batch members are frequency-ranked from a full recount. */
  def batchedMerges(dict: DataFrame, steps: Int, batch: Int)
      : Seq[(Int, String, String, String, Long)] = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    val spark = dict.sparkSession
    import spark.implicits._
    // r17 (guide §5, driver pacing): LAZY localCheckpoints — the eager
    // form scheduled a separate materialization job per training round
    // (plus one for the initial symbol expansion) before the round's
    // pair-count job even started; lazily the checkpoint materializes
    // inside the next round's pair-count action (one scheduler round trip
    // per round instead of two), and the final round's never-read vocab
    // is never materialized at all. Lineage is still truncated at every
    // round — the reason the checkpoint exists.
    var vocab = dict.select(col("cnt").cast("long").as("cnt"),
      concat(
        transform(sequence(lit(1), length(col("w"))), i => col("w").substr(i, lit(1))),
        array(lit(Eow))).as("sym"))
      .as[(Long, Seq[String])].localCheckpoint(false)

    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var done = false
    while (out.size < steps && !done) {
      val room = math.min(batch, steps - out.size)
      // over-collect: disjointness rejections thin the pool, and an
      // unfilled batch only costs an extra (cheap) round
      val pool = math.max(4 * room, 64)
      // r18 (guide §4): pair counting as codegen column expressions — the
      // old typed flatMap deserialized every word's symbol array per round
      // (DeserializeToObject + SerializeFromObject around an opaque
      // lambda, breaking WholeStageCodegen exactly where each round
      // spends its time). The explode/aggregate form emits the identical
      // (a, b, cnt) multiset — element_at is 1-based, so i and i+1 over
      // sequence(1, size-1) are the flatMap's (sym(i), sym(i+1)) pairs —
      // and stays in codegen through the partial agg. Single-symbol words
      // (possible once a whole word merges to one token) are filtered
      // rather than fed to sequence(1, 0), which would yield a DESCENDING
      // [1, 0] probe (the flatMap's 0 until len-1 was empty there).
      val cands = vocab.toDF("cnt", "sym")
        .where(size(col("sym")) >= 2)
        .select(col("cnt"), explode(transform(sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("a"),
            element_at(col("sym"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(pool).collect()
      val used = scala.collection.mutable.Set[String]()
      val accepted = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
      var k = 0
      while (k < cands.length && accepted.size < room) {
        val (a, b, c) = (cands(k).getString(0), cands(k).getString(1), cands(k).getLong(2))
        if (!used(a) && !used(b) && !used(a + b)) {
          accepted += ((a, b, c)); used += a; used += b; used += (a + b)
        }
        k += 1
      }
      if (accepted.isEmpty) done = true
      else {
        accepted.foreach { case (a, b, c) => out += ((out.size + 1, a, b, a + b, c)) }
        val rules = accepted.map { case (a, b, _) => (a, b) -> (a + b) }.toMap
        vocab = vocab.mapPartitions(_.map { case (cnt, sym) =>
          (cnt, applyRules(sym, rules))
        }).localCheckpoint(false)
      }
    }
    out.toSeq
  }

  /** Plain-Scala serving encode of one word: rules applied IN ORDER
    * (later rules may consume earlier rules' merged symbols — across
    * rounds they are NOT disjoint), each greedy-leftmost. The scalar twin
    * of [[encodeWords]], usable where a 100k-rule chain would blow up a
    * Catalyst expression tree. O(rules × len) per word — the parity
    * REFERENCE for [[encodeRanked]], not the serving path. */
  def encodeWordSeq(w: String, rules: Seq[(String, String)]): Seq[String] =
    rules.foldLeft(w.map(_.toString).toVector :+ Eow) { case (sym, (a, b)) =>
      applyRules(sym, Map((a, b) -> (a + b))).toVector
    }

  /** Rank-driven serving encode — the real-vocab path: instead of
    * folding the word through every rule (32k folds/word), repeatedly
    * apply the LOWEST-RANK pair present until none remains. Equivalent
    * to the in-order fold because a BPE rule's operands are produced
    * only by strictly earlier rules, so a merge can never create a pair
    * of lower rank than the one just applied (parity vs
    * [[encodeWordSeq]] pinned in ExtSpec). O(applied-merges × len) per
    * word, independent of total rule count. */
  def encodeRanked(w: String, ranks: scala.collection.Map[(String, String), Int])
      : Seq[String] = {
    var sym: Seq[String] = w.map(_.toString).toVector :+ Eow
    var go = sym.length >= 2
    while (go) {
      var bestRank = Int.MaxValue
      var bestPair: (String, String) = null
      var i = 0
      while (i < sym.length - 1) {
        val p = (sym(i), sym(i + 1))
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = p }
        i += 1
      }
      if (bestPair == null) go = false
      else {
        sym = applyRules(sym, Map(bestPair -> (bestPair._1 + bestPair._2)))
        go = sym.length >= 2
      }
    }
    sym
  }

  /** Per-document BPE unit counts at REAL vocab size — the serving
    * kernel tok1 runs: (doc_id, n_words, n_bpe_units) for a `documents`
    * frame. A Catalyst fold chain is infeasible past a few dozen rules
    * (the expression tree grows per rule), so this is a mapPartitions
    * kernel in the mm2 expensive-init shape: the broadcast rank map is
    * resolved ONCE per partition, and a per-partition word→unit-count
    * memo exploits the Zipfian repeat rate (most words encode once per
    * partition, not once per occurrence). Map-only: no shuffle at any
    * corpus size. */
  def bpeUnitCounts(docs: DataFrame, rules: Seq[(String, String)],
      memoCap: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      rules.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    docs.select(col("doc_id").cast("long").as("doc_id"),
        graft.ext.TextAnalysis.words(col("text")).as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ranks = bc.value
        val memo = new java.util.HashMap[String, Integer]()
        it.map { case (id, ws) =>
          var units = 0L
          val n = ws.length
          var i = 0
          while (i < n) {
            val w = ws(i)
            var u = memo.get(w)
            if (u == null) {
              u = Integer.valueOf(encodeRanked(w, ranks).length)
              if (memo.size < memoCap) memo.put(w, u)
            }
            units += u.intValue()
            i += 1
          }
          (id, n, units)
        }
      }
      .toDF("doc_id", "n_words", "n_bpe_units")
  }

  /** Learn `steps` merge rules from a (word, cnt) frequency dictionary.
    * Returns one row per rule: (step, left, right, merged, pair_count).
    * Stops early if no adjacent pair remains. */
  def merges(dict: DataFrame, steps: Int): Seq[(Int, String, String, String, Long)] = {
    var vocab = dict.select(col("cnt"),
      concat(
        transform(sequence(lit(1), length(col("w"))), i => col("w").substr(i, lit(1))),
        array(lit(Eow))).as("sym"))
      .localCheckpoint()

    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    var step = 1
    var done = false
    while (step <= steps && !done) {
      val pairs = vocab.select(col("cnt"),
        explode(transform(sequence(lit(1), size(col("sym")) - 1),
          i => struct(element_at(col("sym"), i).as("a"),
            element_at(col("sym"), i + 1).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("c"))
      val best = pairs.orderBy(col("c").desc, col("a").asc, col("b").asc).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((step, a, b, a + b, c))
        vocab = vocab.select(col("cnt"), mergeSym(col("sym"), a, b).as("sym"))
          .localCheckpoint()
        step += 1
      }
    }
    out.toSeq
  }

  /** Persist learned merge rules as the standard `merges.txt` artifact
    * (the file every BPE consumer — tokenizers, serving fleets — loads:
    * one `left right` pair per line, rank order; a `#version` header
    * line, the huggingface/GPT-2 convention). Rules are the bounded
    * driver-side training artifact (≤ vocab budget), so this is one
    * small-file write: tmp + rename, so a torn write is never visible
    * (the ShardIO discipline). On local/POSIX filesystems rename
    * REPLACES an existing target atomically, so overwrite publication
    * has no missing-file window; on filesystems that reject
    * rename-over-existing (HDFS) we fall back to delete-then-rename,
    * which has a brief not-found window for concurrent readers — there
    * the artifact is replaced, never torn. A failed rename cleans up
    * its tmp file. Tokens never contain whitespace (words split on
    * \s+), so the space separator is unambiguous. */
  def writeMerges(spark: org.apache.spark.sql.SparkSession,
      rules: Seq[(String, String)], path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(
      path + ".tmp-" + java.util.UUID.randomUUID())
    try {
      val out = fs.create(tmp, true)
      try {
        out.write("#version: graft-bpe-1\n".getBytes("UTF-8"))
        rules.foreach { case (a, b) => out.write(s"$a $b\n".getBytes("UTF-8")) }
      } finally out.close()
      // try rename-in-place first: local File.renameTo replaces the target
      // atomically, keeping the artifact continuously readable. Only when
      // the FS rejects rename-over-existing (HDFS) delete-then-rename.
      if (!fs.rename(tmp, p)) {
        if (fs.exists(p)) fs.delete(p, false)
        if (!fs.rename(tmp, p))
          throw new java.io.IOException(s"merges artifact rename failed: $tmp -> $p")
      }
    } catch {
      case e: Throwable =>
        try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
        throw e
    }
  }

  /** Load a `merges.txt` artifact back into the rule sequence
    * [[encodeWords]] / [[bpeUnitCounts]] consume. Strict: a malformed
    * line throws (a truncated artifact must fail loudly, never tokenize
    * differently). */
  def readMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    txt.split("\n").iterator
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1, s"malformed merges line: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }
      .toSeq
  }
}
