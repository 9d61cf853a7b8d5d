package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: standalone reproduction of the ScaleCheck hot-key
  * chunked-candidate probe (10k postings on one key) with plan dump —
  * for adjudicating partition-spread regressions without a full
  * ScaleCheck run. */
object ProbeChunks {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nCrowd = 10000L
    // non-foldable constant-valued keys (see the ScaleCheck crowd probes):
    // lit() keys fold into the partitioning and defeat exchange reuse
    val posts = spark.range(nCrowd).select(
      (pmod(col("id"), lit(1L)) + lit(0)).cast("int").as("k1"),
      (pmod(col("id"), lit(1L)) + lit(42L)).as("k2"),
      col("id").as("doc_id"), lit(40L).as("sz"))
    val pairs = Dedup.chunkedKeyedPairs(posts, 19, 20)
    val byPart = pairs.groupBy(spark_partition_id().as("p"))
      .agg(count(lit(1)).as("n")).collect()
    println(s"[probe] partitions=${byPart.length} total=${byPart.map(_.getLong(1)).sum} " +
      s"max=${byPart.map(_.getLong(1)).max}")
    pairs.explain("formatted")
    spark.stop()
  }
}
