package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Shuffle

/** Deterministic epoch shuffle: the distributed two-pass rank must equal
  * the naive global-window rank, independent of partitioning and bucket
  * granularity, and distinct seeds must draw distinct permutations. */
class ShuffleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // FAIR so the serving-path fairness test is real whichever suite
    // creates the shared context; default-pool behavior stays FIFO
    .config("spark.scheduler.mode", "FAIR")
    .getOrCreate()

  private def ids(n: Int) = spark.range(0, n).toDF("id")

  private def order(df: org.apache.spark.sql.DataFrame, seed: String, hexDigits: Int = 2) =
    Shuffle.deterministicOrder(df, "id", seed, hexDigits)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("pos")).toMap

  test("positions equal the naive global-window rank and form a 0..n-1 permutation") {
    import org.apache.spark.sql.expressions.Window
    val df = ids(500)
    val got = order(df, "ep1")
    val naive = df
      .withColumn("h", md5(concat(lit("ep1:"), col("id").cast("string"))))
      .withColumn("pos", row_number().over(Window.orderBy(col("h"), col("id"))) - 1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("pos").toLong).toMap
    assert(got === naive)
    assert(got.values.toSeq.sorted === (0L until 500L))
  }

  test("invariant under input partitioning and bucket granularity") {
    val df = ids(300)
    val base = order(df, "s")
    assert(order(df.repartition(7, col("id")), "s") === base)
    assert(order(df, "s", hexDigits = 1) === base)
    assert(order(df, "s", hexDigits = 3) === base)
  }

  test("distinct seeds draw distinct (independent) permutations") {
    val df = ids(200)
    val a = order(df, "ep1")
    val b = order(df, "ep2")
    assert(a !== b)
    // fixed points between independent permutations ~ Poisson(1); 20 would
    // mean the permutations are correlated
    assert(a.count { case (id, p) => b(id) == p } < 20)
  }

  test("empty corpus yields an empty result") {
    assert(Shuffle.deterministicOrder(ids(0), "id", "s").count() === 0)
  }

  test("plan contract: no single-partition window — the exchange keys on the bucket") {
    val plan = Shuffle.deterministicOrder(ids(100), "id", "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__bucket"), s"bucket exchange missing:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single-partition stage found:\n$plan")
  }
}
