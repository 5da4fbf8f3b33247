package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe-stamped A/B timing for a SUBSET of the inventory — the
  * attribution tool the full bench can't be: time query X alone, then X
  * with suspected cache/neighbor interference queries run beside it, on
  * one machine-health-stamped session, and read the delta directly.
  *
  * Usage:
  *   runMain graft.tools.BenchSubset <sfDir> <q1,q2,...> [rounds]
  *
  * Each round: probe stamp → each named query (noop-sink materialized,
  * timed) in order. Reports per-query min/median/all-rounds plus the
  * probe stamps, one JSON line. Interleaved like the main bench so a
  * one-off stall is visible rather than folded in.
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.Engine.install(spark)
    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    // warmup (JIT + footers), untimed
    qs.foreach { case (_, fn) =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    val probes = scala.collection.mutable.ArrayBuffer[Double]()
    val times = scala.collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 0 until rounds) {
      probes += MachineProbe.stampParMs(cpus.toInt)
      qs.foreach { case (n, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    probes += MachineProbe.stampParMs(cpus.toInt)
    val body = names.map { n =>
      val xs = times(n)
      f""""$n":{"min":${xs.min}%.3f,"median":${xs.sorted.apply(xs.size / 2)}%.3f,"all":${xs.map(x => f"$x%.3f").mkString("[", ",", "]")}}"""
    }.mkString(",")
    println(s"""{"sf":"$sfDir","probe_par_ms":${probes.map(p => f"$p%.0f").mkString("[", ",", "]")},$body}""")
    spark.stop()
  }
}
