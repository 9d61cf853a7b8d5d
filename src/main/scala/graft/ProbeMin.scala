package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: minimal EnsureRequirements reproduction — does a shuffled
  * hash join reuse an explicit-count repartition on its join keys? */
object ProbeMin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val a = spark.range(10000).select(pmod(col("id"), lit(2)).as("k1"), col("id").as("lo"), col("id").as("v"))
      .repartition(32, col("k1"), col("lo"))
    val b = spark.range(200).select(pmod(col("id"), lit(2)).as("k1"), col("id").as("lo"), col("id").as("w"))
    val j = a.join(b.hint("shuffle_hash"), Seq("k1", "lo"))
    j.collect()
    j.explain("formatted")
    spark.stop()
  }
}
