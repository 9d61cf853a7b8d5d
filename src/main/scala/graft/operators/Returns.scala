package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Return-based price analytics over the tick stream — the realized-risk
  * counterparts to the range-based [[Atr]]: per-interval returns,
  * realized variance, historical-rank and drawdown statistics. The
  * reference pipeline's ATR answers "how wide does this instrument
  * swing"; these answer "what did holding it actually cost".
  *
  * Determinism discipline shared with [[Ohlc]]/[[Atr]]: prices become
  * integer 1e-4 ticks HALF_UP at the scan, consecutive-sample pairing is
  * one `lag` window per symbol on the pinned (ts, id) order, ratios are
  * single-shot double divisions under floor(x + 0.5) (both engines run
  * the identical IEEE op sequence), and every sum that can outgrow int64
  * at corpus scale folds in decimal(38,0).
  */
object Returns {

  private def ticks(c: org.apache.spark.sql.Column) =
    floor(c * 10000 + 0.5).cast("long")

  /** Per (symbol, day) realized variance from consecutive-sample basis-
    * point returns: r_bp = HALF_UP((tick − prev) · 10⁴ / prev), summed
    * (drift) and squared-summed (realized variance, the standard
    * high-frequency volatility estimator — no ln(), whose last ulp is
    * engine-specific). A return spanning midnight belongs to the day of
    * the LATER sample (the observation that realizes it).
    * Output: symbol, d, n_returns, drift_bp, rv.
    */
  def realizedVolDaily(events: DataFrame, symbolCol: String = "event_type",
                       tsCol: String = "ts", valueCol: String = "value",
                       idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col("symbol"))
      .orderBy(col("__us"), col("__id"))
    events
      .where(col(symbolCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(symbolCol).as("symbol"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(idCol).as("__id"),
        to_date(col(tsCol).cast("timestamp")).as("d"),
        ticks(col(valueCol)).as("__t"))
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .where(col("__prev").isNotNull && col("__prev") > 0)
      .withColumn("__r",
        floor((col("__t") - col("__prev")).cast("double") * 10000.0 /
          col("__prev") + 0.5).cast("long"))
      .groupBy(col("symbol"), col("d"))
      .agg(count(lit(1)).as("n_returns"),
        sum(col("__r")).as("drift_bp"),
        sum((col("__r") * col("__r")).cast("decimal(38,0)")).as("__rv"))
      .select(col("symbol"), col("d"), col("n_returns"), col("drift_bp"),
        expr("CAST(__rv AS BIGINT)").as("rv"))
      .orderBy(col("symbol"), col("d"))
  }

  /** Historical rank of each symbol's LATEST price: the share of its own
    * history strictly below the current level, in basis points — the
    * "IV rank" pattern every options screen applies before trusting a
    * volatility level. The latest sample is a struct extreme on the
    * pinned (µs, id, tick) order (no window, one agg); the comparison
    * runs on the (symbol × tick) counting grid, not raw rows.
    * Output: symbol, n, last_ticks, n_below, rank_bp.
    */
  def lastValueRank(events: DataFrame, symbolCol: String = "event_type",
                    tsCol: String = "ts", valueCol: String = "value",
                    idCol: String = "event_id"): DataFrame = {
    val base = events
      .where(col(symbolCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(symbolCol).as("symbol"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(idCol).as("__id"), ticks(col(valueCol)).as("__t"))
    val last = base.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        max(struct(col("__us"), col("__id"), col("__t"))).as("__m"))
      .select(col("symbol"), col("n"), col("__m.__t").as("last_ticks"))
    val grid = base.groupBy(col("symbol"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    grid.join(broadcast(last), Seq("symbol"))
      .groupBy(col("symbol"), col("n"), col("last_ticks"))
      .agg(sum(when(col("__t") < col("last_ticks"), col("__c"))
        .otherwise(0L)).as("n_below"))
      .withColumn("rank_bp",
        expr("CAST((n_below * 10000) DIV n AS BIGINT)"))
      .select(col("symbol"), col("n"), col("last_ticks"), col("n_below"),
        col("rank_bp"))
      .orderBy(col("symbol"))
  }

  /** Maximum drawdown per symbol: the worst peak-to-trough loss an
    * investor holding through the whole stream could have realized,
    * in basis points of the peak. One cumulative-max window on the
    * pinned order, then dd = (runmax − tick)·10⁴ DIV runmax — both
    * operands non-negative, so integral division is identical in both
    * engines. Output: symbol, n, peak_ticks (at max dd), max_dd_bp.
    */
  def maxDrawdown(events: DataFrame, symbolCol: String = "event_type",
                  tsCol: String = "ts", valueCol: String = "value",
                  idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(col("symbol"))
      .orderBy(col("__us"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    events
      .where(col(symbolCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(symbolCol).as("symbol"),
        unix_micros(col(tsCol).cast("timestamp")).as("__us"),
        col(idCol).as("__id"), ticks(col(valueCol)).as("__t"))
      .withColumn("__peak", max(col("__t")).over(w))
      .withColumn("__dd",
        expr("CAST(((__peak - __t) * 10000) DIV __peak AS BIGINT)"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n"),
        max(struct(col("__dd"), col("__peak"))).as("__m"))
      .select(col("symbol"), col("n"),
        col("__m.__peak").as("peak_ticks"),
        col("__m.__dd").as("max_dd_bp"))
      .orderBy(col("symbol"))
  }
}
