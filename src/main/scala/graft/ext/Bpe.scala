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
}
