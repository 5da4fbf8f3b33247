package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Query-level properties that aren't oracle-expressible. */
class QueriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.01"

  test("HLL cardinality tracks exact within the sketch's error bound") {
    val exact = SparkEntry.queries("a3_cardinality")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("a3_cardinality_hll")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    for ((name, n) <- exact) {
      val a = approx(name)
      assert(math.abs(a - n).toDouble / n < 0.1, s"$name: exact=$n hll=$a")
    }
  }
}
