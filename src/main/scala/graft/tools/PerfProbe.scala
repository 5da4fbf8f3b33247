package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: time named gate queries with/without Engine.install.
  * `sbt "runMain graft.tools.PerfProbe q1_agg s1_ann_brute"` */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val install = sys.env.getOrElse("SPARK_GRAFT_INSTALL", "1") == "1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (install) graft.plans.Engine.install(spark)
    // same machine-health stamps as Bench's probe_ms/probe_par_ms (one
    // shared workload, MachineProbe): a single stamp ≫2× nominal means a
    // degraded window; a PAR stamp ≫ the single stamp means a co-tenant
    // is stealing cores (the mode that slows every 32-way query while
    // the single-thread stamp reads nominal) — either way the numbers
    // indict the machine, not the code
    def calib(): Unit = println(
      f"CALIB ${MachineProbe.stampMs()}%.0f ms  PAR32 ${MachineProbe.stampParMs(32)}%.0f ms")
    calib()
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"PROBE $name run$i install=$install ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    calib()
    spark.stop()
  }
}
