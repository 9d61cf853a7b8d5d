package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tick → 5-minute OHLC candle aggregation.
  *
  * Reference semantics: /root/reference/modules/aggregator/tick_buffer.py:96-146
  * (incremental per-tick OHLC upsert) and the window-assignment rules of
  * /root/reference/utils/time_utils.py:167-224 (tumbling windows, membership
  * `[start, start+interval)`, boundary tick belongs to the *starting* window).
  *
  * Spark-first design: one declarative `groupBy(window(...), symbol)` hash
  * aggregate. Catalyst plans a partial (map-side) aggregate before the
  * shuffle, so the shuffled volume is one row per (symbol, window) per input
  * partition — the same "memory bounded to active window" property the
  * reference hand-rolls, but spillable and distributed. `window()`'s
  * floor-based assignment is identical to the reference's boundary-list scan
  * because sessions open on a 5-minute grid (SURVEY.md §2.6).
  *
  * open/close use `min_by`/`max_by` ordered by (event_ts, seq): the reference
  * resolves equal-timestamp ticks by arrival order under a lock; a monotonic
  * sequence column reproduces that deterministically in a distributed setting
  * (SURVEY.md §7 hard parts).
  */
object Ohlc {

  /** Batch (and, unchanged, streaming) OHLC core.
    *
    * @param ticks  input with at least (tsCol, symCol, priceCol, seqCol)
    * @param windowDuration Spark interval string, e.g. "5 minutes"
    * @return (window_start, symbol, open, high, low, close, tick_count)
    */
  def candles(
      ticks: DataFrame,
      tsCol: String = "ts",
      symCol: String = "event_type",
      priceCol: String = "value",
      seqCol: String = "event_id",
      windowDuration: String = "5 minutes"): DataFrame = {
    // Arrival order (ts, seq) packed into one DECIMAL(38,0):
    // ts_micros · 10¹² + seq. A struct ordering key forces min_by/max_by
    // into SortAggregate (struct buffers aren't hash-aggregable), which
    // would sort the whole tick stream per partition; a fixed-width decimal
    // keeps the plan in HashAggregate with map-side partials. Order is
    // isomorphic to (ts, seq) for seq < 10¹² (µs-unique beyond that).
    val ord: Column =
      unix_micros(col(tsCol).cast("timestamp")).cast("decimal(20,0)") *
        lit(1000000000000L) + col(seqCol)
    // group by the window STRUCT (not window().start): Spark only recognizes
    // the event-time window — and so watermark-driven finalization in
    // streaming — when the TimeWindow expression itself is a grouping key
    ticks
      .groupBy(
        window(col(tsCol), windowDuration).as("w"),
        col(symCol).as("symbol"))
      .agg(
        min_by(col(priceCol), ord).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), ord).as("close"),
        count(lit(1)).as("tick_count"))
      .select(col("w.start").as("window_start"), col("symbol"), col("open"),
        col("high"), col("low"), col("close"), col("tick_count"))
  }

  /** OHLC invariant violations (candle_aggregator.py:205-216): rows where
    * high < max(open, close) or low > min(open, close). Empty when healthy;
    * feeds the warnings/system_log path rather than failing the pipeline.
    */
  def invariantViolations(candles: DataFrame): DataFrame =
    candles.where(
      col("high") < greatest(col("open"), col("close")) ||
      col("low") > least(col("open"), col("close")))

  /** Time-weighted average price per symbol — the benchmark rate when
    * samples arrive irregularly: each observation holds until the next
    * one, so its weight is the INTERVAL it was live, not 1. The mean of
    * raw ticks over-weights bursts; TWAP is what execution quality and
    * funding-rate calculations actually reference.
    *
    * Exact integer arithmetic end-to-end: price → HALF_UP 1e-4 ticks,
    * interval → epoch-microsecond difference via one `lead` window per
    * symbol (ordered ts, id — the q95 precision discipline), products
    * and sums in decimal(38,0) so a 30-day × corpus-scale interval·tick
    * product cannot overflow int64, and the final quotient is one
    * integral DIV over non-negative operands. The last sample per
    * symbol has no successor — zero weight by declared convention (its
    * live interval is unobserved, the same censoring honesty as
    * [[Engagement.survivalCurve]]).
    * Output: symbol, n_samples, dur_us, twap_ticks (price·1e4).
    */
  def twap(events: DataFrame, symbolCol: String = "event_type",
           tsCol: String = "ts", valueCol: String = "value",
           idCol: String = "event_id"): DataFrame = {
    events
      .where(col(symbolCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull && !isnan(col(valueCol)))
      .select(col(symbolCol).as("symbol"),
        unix_micros(col(tsCol)).as("__us"),
        col(idCol).as("__id"),
        floor(col(valueCol) * 10000 + 0.5).cast("long").as("__ticks"))
      .withColumn("__dur",
        lead(col("__us"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("symbol")).orderBy(col("__us"), col("__id")))
          - col("__us"))
      .where(col("__dur").isNotNull)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("__dur")).as("dur_us"),
        sum(col("__ticks").cast("decimal(38,0)") *
          col("__dur").cast("decimal(38,0)")).as("__wsum"))
      .select(col("symbol"), col("n_samples"), col("dur_us"),
        expr("CAST(__wsum DIV dur_us AS BIGINT)").as("twap_ticks"))
      .orderBy(col("symbol"))
  }

  /** Candlestick pattern census: the classical single- and two-candle
    * shapes every charting screen annotates, as PURE integer-tick
    * predicates (no ratios, no floats — a body/range comparison is a
    * cross-multiplication, so both engines evaluate the identical
    * integer inequality):
    *  - doji: body·10 ≤ range (body within 10% of the bar), range > 0;
    *  - hammer: lower wick ≥ 2·body AND upper wick ≤ body, range > 0;
    *  - bullish engulfing: previous bar bearish, this bar bullish, and
    *    this body spans the previous body (o ≤ prev_c, c ≥ prev_o);
    *  - bearish engulfing: the mirror.
    * The lag pairing is per symbol on the candle order; counts are
    * conditional sums in one scan — candle-grid-sized work at any tick
    * volume. Output: symbol, n_candles, n_doji, n_hammer,
    * n_bull_engulf, n_bear_engulf.
    */
  def candlePatterns(candles: DataFrame): DataFrame = {
    def t(c: String) = floor(col(c) * 10000 + 0.5).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("symbol")).orderBy(col("window_start"))
    val one = (p: Column) => sum(when(p, 1L).otherwise(0L))
    candles
      .select(col("symbol"), col("window_start"), t("open").as("__o"),
        t("high").as("__h"), t("low").as("__l"), t("close").as("__c"))
      .withColumn("__po", lag(col("__o"), 1).over(w))
      .withColumn("__pc", lag(col("__c"), 1).over(w))
      .withColumn("__body", abs(col("__c") - col("__o")))
      .withColumn("__range", col("__h") - col("__l"))
      .withColumn("__up", col("__h") - greatest(col("__o"), col("__c")))
      .withColumn("__dn", least(col("__o"), col("__c")) - col("__l"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_candles"),
        one(col("__range") > 0L && col("__body") * 10L <= col("__range"))
          .as("n_doji"),
        one(col("__range") > 0L && col("__dn") >= col("__body") * 2L &&
          col("__up") <= col("__body")).as("n_hammer"),
        one(col("__pc") < col("__po") && col("__c") > col("__o") &&
          col("__o") <= col("__pc") && col("__c") >= col("__po"))
          .as("n_bull_engulf"),
        one(col("__pc") > col("__po") && col("__c") < col("__o") &&
          col("__o") >= col("__pc") && col("__c") <= col("__po"))
          .as("n_bear_engulf"))
      .orderBy(col("symbol"))
  }

  /** Candle resample: roll fine candles up to a coarser bar (5-min →
    * 30-min is the classic chart-zoom) — one hash aggregate over the
    * candle grid, never a re-scan of ticks. Open/close pick by
    * `min_by`/`max_by` on `window_start` (unique per symbol within a
    * bucket by construction, so deterministic); high/low/volume are
    * plain extremes/sums. The coarse bucket is pure integer-µs
    * arithmetic (`DIV`) — engine-portable and alignment-explicit, no
    * reliance on an engine's time_bucket origin convention. Cost tracks
    * the candle-grid size (symbols × fine buckets), not tick volume.
    * Output: window_start (coarse), symbol, open, high, low, close,
    * tick_count.
    */
  def resample(candles: DataFrame, minutes: Int = 30): DataFrame = {
    require(minutes >= 1, "minutes must be positive")
    val span = minutes.toLong * 60000000L
    candles
      .withColumn("__w",
        timestamp_micros(expr(s"unix_micros(window_start) DIV $span * $span")))
      .groupBy(col("__w"), col("symbol"))
      .agg(
        min_by(col("open"), col("window_start")).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"), col("window_start")).as("close"),
        sum(col("tick_count")).as("tick_count"))
      .withColumnRenamed("__w", "window_start")
  }
}
