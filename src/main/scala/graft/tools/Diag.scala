package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis._
import graft.ext.extfunctions._

/** Scratch diagnostics for performance work. */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val d = docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .select(col("doc_id"), shingles(col("ws"), 2).as("sh"))

    time("shingles materialized-ws")(d.write.format("noop").mode("overwrite").save())
    val sim = d.select(col("doc_id"), simhash64(col("sh")).as("sim"))
      .withColumn("bucket", shiftrightunsigned(col("sim"), 48))
    time("simhash")(sim.write.format("noop").mode("overwrite").save())
    val a = sim.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"), col("bucket"))
    val b = sim.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"), col("bucket"))
    val joined = a.join(broadcast(b), Seq("bucket")).where(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= 6)
    time("d4 join")(joined.write.format("noop").mode("overwrite").save())
    joined.explain("formatted")
    spark.stop()
  }
}
