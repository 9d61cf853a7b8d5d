package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-min sketch: the fixed-size heavy-hitter summary for streams and
  * shuffles too wide to hash-aggregate exactly.
  *
  * A d×w counter grid where every key increments one salted-hash slot
  * per row; a point estimate reads the MINIMUM of its d slots, so
  * estimates only ever OVER-count (collisions add, never subtract).
  * Like [[Bloom]], the hashes are salted-md5 arithmetic — deterministic
  * and engine-replayable — and the sketch materializes as a bounded
  * (row, slot, count) relation rather than an opaque binary (Spark's
  * own `count_min_sketch` agg exists but its sketch bytes are not
  * portable to an oracle).
  *
  * Counts are additive, so the sketch builds from the exact per-key
  * aggregate when one is affordable (as here, for the audit) or from
  * raw occurrences map-side at stream scale — same result either way.
  */
object Sketch {

  /** slot_r(key) = md5("r:key") low-32 mod w — one salt per hash row. */
  def slotExpr(row: Int, key: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$row:"), key)), 1, 8), 16, 10)
      .cast("long"), lit(w.toLong))

  /** Heavy-hitter audit of the (d, w) design point: the exact top-`k`
    * tokens with their CMS point estimates and the relative
    * over-estimate in floor-bp — the table that says whether w is wide
    * enough before a pipeline trusts the sketch at stream scale. The
    * sketch is a d×w bounded relation (broadcast to the probe join);
    * the probe side is k rows.
    * Output: rank, tok, n_exact, n_est (≥ n_exact always), over_bp.
    */
  def cmsHeavyHitterAudit(docs: DataFrame, d: Int = 4, w: Int = 1024,
                          k: Int = 20): DataFrame = {
    require(d >= 1 && w >= 1, "need d >= 1 hash rows and w >= 1 slots")
    val exact = docs
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
    val cms = (0 until d).map { r =>
      exact.select(lit(r).as("__row"), slotExpr(r, col("tok"), w).as("__slot"),
        col("n_exact").as("__c"))
    }.reduce(_ unionByName _)
      .groupBy(col("__row"), col("__slot")).agg(sum(col("__c")).as("__sc"))
    val ord = Seq(col("n_exact").desc, col("tok").asc)
    val top = exact.orderBy(ord: _*).limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(ord: _*)).cast("long"))
    val probes = (0 until d).map { r =>
      top.select(col("rank"), col("tok"), col("n_exact"),
        lit(r).as("__row"), slotExpr(r, col("tok"), w).as("__slot"))
    }.reduce(_ unionByName _)
    probes.join(broadcast(cms), Seq("__row", "__slot"))
      .groupBy(col("rank"), col("tok"), col("n_exact"))
      .agg(min(col("__sc")).as("n_est"))
      .withColumn("over_bp",
        expr("CAST(((n_est - n_exact) * 10000) DIV n_exact AS BIGINT)"))
      .select(col("rank"), col("tok"), col("n_exact"), col("n_est"),
        col("over_bp"))
  }
}
