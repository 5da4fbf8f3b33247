package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Packing

/** Distributed prefix-sum sequence packing: result must equal the naive
  * global running sum, independent of input partitioning and of the
  * operator's bucket count. */
class PackingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // FAIR so the serving-path fairness test is real whichever suite
    // creates the shared context; default-pool behavior stays FIFO
    .config("spark.scheduler.mode", "FAIR")
    .getOrCreate()

  private def reference(rows: Seq[(Long, Long)], blockSize: Long)
      : Map[Long, (Long, Long, Long, Boolean)] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, w) =>
      val off = acc; acc += w
      val first = off / blockSize
      val last = (off + math.max(w, 1L) - 1L) / blockSize
      id -> (off, first, last, first != last)
    }.toMap
  }

  private def collectOffsets(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Long, Long, Long, Boolean)] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap

  test("offsets equal the naive global running sum") {
    // sparse non-uniform ids, weights including 0 and block-sized runs
    val rows = Seq.tabulate(500) { i =>
      val id = i.toLong * 17 + (i % 3) // irregular spacing
      val w = (i * 37 % 190).toLong // some zero weights (i*37 % 190 == 0)
      (id, w)
    }
    val df = spark.createDataFrame(rows).toDF("id", "w")
    val got = collectOffsets(
      Packing.packOffsets(df, "id", col("w"), blockSize = 128L, buckets = 16))
    assert(got === reference(rows, 128L))
  }

  test("result is invariant under input partitioning and bucket count") {
    val rows = Seq.tabulate(300)(i => (i.toLong, (i % 11 + 1).toLong))
    val df = spark.createDataFrame(rows).toDF("id", "w")
    val base = collectOffsets(Packing.packOffsets(df, "id", col("w"), 64L, buckets = 8))
    val shuffled = collectOffsets(
      Packing.packOffsets(df.repartition(7, col("w")), "id", col("w"), 64L, buckets = 8))
    val rebucketed = collectOffsets(Packing.packOffsets(df, "id", col("w"), 64L, buckets = 3))
    val oneBucket = collectOffsets(Packing.packOffsets(df, "id", col("w"), 64L, buckets = 1))
    assert(shuffled === base)
    assert(rebucketed === base)
    assert(oneBucket === base)
    assert(base === reference(rows, 64L))
  }

  test("edge cases: empty corpus, single doc, doc larger than a block") {
    val empty = spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("id", "w")
    assert(Packing.packOffsets(empty, "id", col("w"), 16L).count() === 0)

    val one = spark.createDataFrame(Seq((42L, 5L))).toDF("id", "w")
    assert(collectOffsets(Packing.packOffsets(one, "id", col("w"), 16L)) ===
      Map(42L -> ((0L, 0L, 0L, false))))

    // a 100-token doc over 16-token blocks spans blocks 0..6
    val big = spark.createDataFrame(Seq((1L, 100L), (2L, 1L))).toDF("id", "w")
    val got = collectOffsets(Packing.packOffsets(big, "id", col("w"), 16L))
    assert(got(1L) === ((0L, 0L, 6L, true)))
    assert(got(2L) === ((100L, 6L, 6L, false)))
  }

  test("block manifest tiles every block gap- and overlap-free and matches brute force") {
    val rows = Seq.tabulate(200) { i =>
      (i.toLong * 3 + (i % 2), (i * 29 % 47).toLong) // irregular ids, some 0 weights
    }
    val df = spark.createDataFrame(rows).toDF("id", "w")
    val B = 32L
    val got = Packing.blockManifest(df, "id", col("w"), B, buckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // brute force: concatenate in id order, clip every doc to each block
    var acc = 0L
    val expect = rows.sortBy(_._1).flatMap { case (id, w) =>
      val (s, e) = (acc, acc + w); acc += w
      if (w == 0) Nil
      else (s / B to (e - 1) / B).map(b =>
        (b, id, math.max(s, b * B) - b * B, math.min(e, (b + 1) * B) - b * B))
    }
    assert(got.sorted === expect.sorted)

    // tiling invariant: within each block, segments cover [0, blockFill)
    // exactly once (attention-mask contract)
    val total = rows.map(_._2).sum
    got.groupBy(_._1).foreach { case (b, segs) =>
      val sorted = segs.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"block $b does not start at 0")
      sorted.sliding(2).foreach {
        case Array((_, _, _, e1), (_, _, s2, _)) =>
          assert(e1 === s2, s"gap/overlap in block $b")
        case _ => ()
      }
      val fill = if (b == (total - 1) / B) total - b * B else B
      assert(sorted.last._4 === fill, s"block $b fill mismatch")
    }

    // zero-weight docs emit no segment
    val zeroIds = rows.filter(_._2 == 0).map(_._1).toSet
    assert(got.forall(s => !zeroIds.contains(s._2)))
  }

  test("plan contract: no single-partition window — the exchange keys on the bucket") {
    val df = spark.createDataFrame(Seq.tabulate(100)(i => (i.toLong, 1L))).toDF("id", "w")
    val plan = Packing.packOffsets(df, "id", col("w"), 64L, buckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__bucket"), s"bucket exchange missing:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-partition stage found:\n$plan")
  }
}
