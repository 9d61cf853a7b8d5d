package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table ONCE at write time so
  * every later equi-join/aggregation on the bucket key runs shuffle-free.
  *
  * This is the classic 100 TB lever for repeated joins on the same key
  * (e.g. lineitem ⋈ orders on the order key every day): both sides bucketed
  * by the key into the same bucket count co-locate partitions, and Spark
  * plans a SortMergeJoin with NO Exchange on either side. Bucketing rides
  * Spark's managed-table metadata, so tables are registered in the session
  * catalog (`saveAsTable`) rather than written to bare paths.
  */
object Bucketed {

  /** Write `df` as a bucketed managed table (overwriting any previous
    * version), bucketed AND sorted by `keys` into `numBuckets` buckets.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket keys as a sort-merge
    * join (the merge hint keeps small test tables from degenerating into a
    * broadcast join, which would make the no-shuffle property vacuous).
    * With matching bucket counts this plans with zero shuffle exchanges —
    * assert via [[exchangeCount]] in tests/plan audits.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   keys: Seq[String]): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right).hint("merge"), keys)

  /** Number of shuffle Exchange operators in a frame's executed plan —
    * the thing bucketing exists to eliminate. Unwraps AQE (where executed
    * exchanges appear as shuffle query stages). */
  def exchangeCount(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      case s: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => s
    }.size
  }
}
