package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: dump the executed plan of one inventory query.
  * Usage: runMain graft.tools.PlanDump <query_name> [sfDir] */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d2_dedup_minhash_lsh")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.Engine.install(spark)
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println("=== PLAN " + name + " ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
