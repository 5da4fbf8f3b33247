package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for named inventory queries to files —
  * the plan evidence the optimization rounds commit under `plans/`.
  *
  * Usage: runMain graft.tools.PlanFmt <out_dir> <suffix> <q1,q2,...> [sfDir]
  *
  * Writes `<out_dir>/<query>_<suffix>.txt`. Each query is EXECUTED first
  * through ITS OWN QueryExecution (a noop write — and also
  * `Dataset.foreach`, which goes through the separate deserialized
  * `rddQueryExecution` — would leave `df.queryExecution.executedPlan`
  * unfinalized, so the r17 "post-AQE" dumps actually carried
  * `isFinalPlan=false` initial plans; r18 ADVICE) so with AQE on the
  * dumped plan is the final adaptive plan (`isFinalPlan=true` where
  * applicable), matching what the bench actually runs, and the formatted
  * pre-execution plan (scan details: PushedFilters/ReadSchema) is
  * appended alongside it. */
object PlanFmt {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.Engine.install(spark)
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      // drive df's OWN QueryExecution so AQE finalizes the plan we dump
      // (PlanSpec's plan() helper does the same via collect; executing
      // the physical plan's RDD avoids pulling result rows to the driver)
      df.queryExecution.executedPlan.execute().count()
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val executed = df.queryExecution.executedPlan.toString
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        (s"=== $name — explain(formatted) ===\n$formatted\n" +
          s"=== $name — executed plan (post-AQE) ===\n$executed\n")
          .getBytes("UTF-8"))
      println(s"[planfmt] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
