package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities: two-phase salted aggregation.
  *
  * A `groupBy(key)` over data where a few keys dominate sends each hot key
  * to a single reducer. Salting splits every key into `salts` sub-keys for
  * a partial aggregate, then combines partials in a second (tiny) aggregate
  * — turning one hot partition into `salts` even ones. AQE's skew-join
  * handling covers joins; this covers aggregations whose partials are
  * algebraic (sum/count/min/max).
  *
  * At 100 TB this is the difference between a stuck straggler and an even
  * shuffle for zipfian keys (user ids, hostnames, symbols on event days).
  */
object Skew {

  /** Salted sum/count/min/max aggregation.
    *
    * @param aggs (outputName → (partialExpr, combiner)) where the combiner
    *             re-aggregates the named partial column.
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], salts: Int)(
      aggs: Seq[(String, Column, String => Column)]): DataFrame = {
    val salt = pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).as("__salt")
    val partial = df
      .withColumn("__salt", salt)
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map(a => a._2.as(a._1)): _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(aggs.head._3(aggs.head._1).as(aggs.head._1),
        aggs.tail.map(a => a._3(a._1).as(a._1)): _*)
  }

  /** Convenience: salted count + sum over one column. */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     salts: Int = 16): DataFrame =
    saltedAgg(df, keyCols, salts)(Seq(
      ("n", count(lit(1)), (c: String) => sum(col(c))),
      ("total", sum(col(valueCol)), (c: String) => sum(col(c)))))

  /** Skew-safe equi-join for a dim too big to broadcast against a fact
    * with hot keys: the fact side salts each ROW into one of `salts`
    * sub-keys (a deterministic hash of the whole row — the salt value
    * never affects the join predicate, so the RESULT is exactly the
    * plain join), the dim side replicates ×`salts`, and the join runs on
    * (key, salt) — one hot key becomes `salts` even partitions instead
    * of one straggler reducer. This is what AQE's skew handling does at
    * runtime; pre-salting is the deterministic-layout variant for
    * engines/pipelines that must plan it (bucketed outputs, stateful
    * streaming joins, AQE-off clusters). A `shuffle_hash` hint keeps the
    * planner from broadcasting the replicated dim, which would defeat
    * the exercise.
    * Returns the joined frame without the salt column.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    require(salts >= 1, "salts must be positive")
    val rowHash = xxhash64(fact.columns.map(col).toIndexedSeq: _*)
    val salted = fact.withColumn("__salt", pmod(rowHash, lit(salts.toLong)))
    val dimRep = dim
      .withColumn("__salt", explode(sequence(lit(0L), lit(salts - 1L))))
      .hint("shuffle_hash")
    salted.join(dimRep, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt advisor — the measurement that decides [[saltedJoin]]'s
    * `salts` parameter BEFORE paying the skewed shuffle: per join key
    * whose row count exceeds the ideal per-partition share (n/`parts`),
    * the key's share in HALF_UP bp and the minimum salt factor that
    * brings its heaviest shard back under the ideal —
    * ceil(c·parts/n), one exact integer ceiling. Uniform keys produce
    * NO rows (nothing to fix); output is bounded by the number of
    * genuinely heavy keys (≤ parts, since each needs share > 1/parts).
    * One hash agg over the key dim + one broadcast total.
    * Output: key, n_rows, share_bp, salt_factor.
    */
  def saltAdvisor(df: DataFrame, keyCol: String,
                  parts: Int = 32): DataFrame = {
    require(parts >= 1, "parts must be positive")
    val counts = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val total = broadcast(counts.agg(sum(col("n_rows")).as("__n")))
    counts.crossJoin(total)
      .where(col("n_rows") * parts > col("__n"))
      .select(col("key"), col("n_rows"),
        floor(col("n_rows") * 10000.0 / col("__n") + 0.5).cast("long")
          .as("share_bp"),
        expr(s"(n_rows * $parts + __n - 1) DIV __n").as("salt_factor"))
      .orderBy(col("key"))
  }
}
