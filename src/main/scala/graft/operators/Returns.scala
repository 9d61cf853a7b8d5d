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
        col(valueCol).isNotNull && !isnan(col(valueCol)))
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
        sum(col("__r").cast("decimal(38,0)") * col("__r")).as("__rv"))
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
        col(valueCol).isNotNull && !isnan(col(valueCol)))
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

  /** Bollinger bands over the candle close series: rolling mean ±
    * k·σ, all in integer ticks. The mean is `Σt DIV n` (non-negative
    * operands — integral division identical in both engines); the
    * standard deviation comes from the EXACT integer variance numerator
    * `n·Σt² − (Σt)²` folded in decimal(38,0) (fold-order exact; no
    * per-row float squares), with the only float op the final
    * correctly-rounded IEEE `sqrt` — deterministic given identical
    * integer inputs. Only COMPLETE n-candle windows emit (a band over
    * 3 samples is noise, and partial frames would make the first rows
    * engine-order-sensitive). Output: symbol, window_start, close_ticks,
    * mid_ticks, sd_ticks, upper_ticks, lower_ticks, outside.
    */
  def bollinger(candles: DataFrame, nWin: Int = 8, kBand: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
      .rowsBetween(-(nWin - 1), 0)
    candles
      .select(col("symbol"), col("window_start"),
        ticks(col("close")).as("__t"))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__st", sum(col("__t")).over(w))
      .withColumn("__stt",
        sum(col("__t").cast("decimal(38,0)") * col("__t")).over(w))
      .where(col("__n") === nWin)
      .withColumn("mid_ticks", expr(s"CAST(__st DIV $nWin AS BIGINT)"))
      .withColumn("sd_ticks",
        floor(sqrt(expr(s"CAST($nWin * __stt - CAST(__st AS DECIMAL(38,0)) * __st AS DOUBLE)")) /
          lit(nWin)).cast("long"))
      .withColumn("upper_ticks", col("mid_ticks") + lit(kBand.toLong) * col("sd_ticks"))
      .withColumn("lower_ticks", col("mid_ticks") - lit(kBand.toLong) * col("sd_ticks"))
      .select(col("symbol"), col("window_start"), col("__t").as("close_ticks"),
        col("mid_ticks"), col("sd_ticks"), col("upper_ticks"), col("lower_ticks"),
        (col("__t") > col("upper_ticks") || col("__t") < col("lower_ticks"))
          .as("outside"))
      .orderBy(col("symbol"), col("window_start"))
  }

  /** Cutler's RSI over candle closes: SMA-based relative strength
    * (the non-recursive cousin of Wilder's — chosen deliberately so
    * the statistic is a pure rolling-sum window, replayable in any
    * engine without a recursion feature; the recursive Wilder fold
    * already exists for ATR in [[Atr]]). Per symbol: Δ = t − prev on
    * the candle order, gain = max(Δ,0), loss = max(−Δ,0), both summed
    * over the last n deltas; RSI_bp = 10⁴·Σgain DIV (Σgain+Σloss)
    * (non-negative DIV), with the flat-window Σ=0 case pinned to
    * 10⁴ (Wilder's "no losses → RSI 100" convention). Complete
    * windows only. Output: symbol, window_start, gain_sum, loss_sum,
    * rsi_bp.
    */
  def rsiCutler(candles: DataFrame, nWin: Int = 14): DataFrame = {
    val lagW = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val sumW = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
      .rowsBetween(-(nWin - 1), 0)
    candles
      .select(col("symbol"), col("window_start"), ticks(col("close")).as("__t"))
      .withColumn("__prev", lag(col("__t"), 1).over(lagW))
      .where(col("__prev").isNotNull)
      .withColumn("__gain", greatest(col("__t") - col("__prev"), lit(0L)))
      .withColumn("__loss", greatest(col("__prev") - col("__t"), lit(0L)))
      .withColumn("__n", count(lit(1)).over(sumW))
      .withColumn("gain_sum", sum(col("__gain")).over(sumW))
      .withColumn("loss_sum", sum(col("__loss")).over(sumW))
      .where(col("__n") === nWin)
      .withColumn("rsi_bp",
        when(col("gain_sum") + col("loss_sum") === 0L, lit(10000L))
          .otherwise(expr(
            "CAST((gain_sum * 10000) DIV (gain_sum + loss_sum) AS BIGINT)")))
      .select(col("symbol"), col("window_start"), col("gain_sum"),
        col("loss_sum"), col("rsi_bp"))
      .orderBy(col("symbol"), col("window_start"))
  }

  /** Cross-symbol return correlation matrix: Pearson correlation of
    * per-candle bp returns, paired on the shared candle grid
    * (inner join on window_start — only buckets where BOTH symbols
    * traded contribute, the standard aligned-series treatment).
    * Returns are the q229 HALF_UP bp integers; all six Pearson sums
    * fold exactly (decimal(38,0) cross/square sums — the
    * [[graft.operators.TextAnalysis.lengthQualityCorrelation]]
    * recipe), so the only float work is the final guarded
    * round(·, 4) quotient. The join moves the CANDLE-sized return
    * series (symbols × sessions × 75 rows), never ticks — at 100 TB
    * the pair matrix is still dimension-bounded: symbols² pairs.
    * Output: sym_a, sym_b, n, corr.
    */
  def returnCorrelationMatrix(candles: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
    val rets = candles
      .select(col("symbol"), col("window_start"), ticks(col("close")).as("__t"))
      .withColumn("__prev", lag(col("__t"), 1).over(w))
      .where(col("__prev").isNotNull && col("__prev") > 0)
      .select(col("symbol"), col("window_start"),
        floor((col("__t") - col("__prev")).cast("double") * 10000.0 /
          col("__prev") + 0.5).cast("long").as("__r"))
    val a = rets.select(col("symbol").as("sym_a"), col("window_start"),
      col("__r").as("__x"))
    val b = rets.select(col("symbol").as("sym_b"), col("window_start"),
      col("__r").as("__y"))
    a.join(b, Seq("window_start"))
      .where(col("sym_a") < col("sym_b"))
      .groupBy(col("sym_a"), col("sym_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
        sum(col("__x").cast("decimal(38,0)") * col("__y")).as("__sxy"),
        sum(col("__x").cast("decimal(38,0)") * col("__x")).as("__sxx"),
        sum(col("__y").cast("decimal(38,0)") * col("__y")).as("__syy"))
      .select(col("sym_a"), col("sym_b"), col("n"),
        round(
          (col("n") * col("__sxy").cast("double") -
            col("__sx").cast("double") * col("__sy").cast("double")) /
            sqrt(greatest(lit(1e-12),
              (col("n") * col("__sxx").cast("double") -
                col("__sx").cast("double") * col("__sx").cast("double")) *
                (col("n") * col("__syy").cast("double") -
                  col("__sy").cast("double") * col("__sy").cast("double")))),
          4).as("corr"))
      .orderBy(col("sym_a"), col("sym_b"))
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
        col(valueCol).isNotNull && !isnan(col(valueCol)))
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

  /** MACD over candle closes: fast and slow EMAs plus their difference,
    * the trend-following indicator next to [[bollinger]]/[[rsiCutler]].
    * EMAs run in integer 1e-4 ticks with the exact HALF_UP recurrence
    * ema' = round((2·close + (k−1)·ema) / (k+1)) — implemented as one
    * non-negative integer floor division, so every step replays
    * bit-for-bit in any engine with a recursive CTE (the [[Atr]] oracle
    * discipline). Seeding is first-value (ema₁ = close₁, the fully
    * defined convention — no warmup gap; declared, SMA-seeded variants
    * shift early rows only). The signal line (an EMA of MACD) is out of
    * scope — it rides the same fold if needed.
    *
    * Recursive state makes a window impossible, so this is the
    * [[Atr.enrich]] shape: hash-partition by symbol, sort within
    * partitions, ONE streaming fold per partition resetting at symbol
    * boundaries — no per-group buffering, shuffle count 1.
    * Output: symbol, window_start, close_ticks, ema_fast_ticks,
    * ema_slow_ticks, macd_ticks.
    */
  def macd(candles: DataFrame, fast: Int = 12, slow: Int = 26): DataFrame = {
    require(fast >= 1 && slow > fast, "need 1 <= fast < slow")
    val spark = candles.sparkSession
    import spark.implicits._
    // ema' = floor((2c + (k−1)·ema)/(k+1) + 1/2), exact via ×2 numerator
    def step(prev: Long, c: Long, k: Int): Long = {
      val x = 2L * c + (k - 1).toLong * prev
      Math.floorDiv(2L * x + (k + 1), 2L * (k + 1))
    }
    candles
      .select(col("symbol"),
        unix_micros(col("window_start").cast("timestamp")).as("wkey"),
        ticks(col("close")).as("ct"))
      .as[(String, Long, Long)]
      .repartition(col("symbol"))
      .sortWithinPartitions(col("symbol"), col("wkey"))
      .mapPartitions { it =>
        var cur: String = null
        var e12 = 0L
        var e26 = 0L
        it.map { case (sym, wkey, c) =>
          if (sym != cur) { cur = sym; e12 = c; e26 = c }
          else { e12 = step(e12, c, fast); e26 = step(e26, c, slow) }
          (sym, wkey, c, e12, e26, e12 - e26)
        }
      }
      .toDF("symbol", "__wkey", "close_ticks", "ema_fast_ticks",
        "ema_slow_ticks", "macd_ticks")
      .select(col("symbol"), timestamp_micros(col("__wkey")).as("window_start"),
        col("close_ticks"), col("ema_fast_ticks"), col("ema_slow_ticks"),
        col("macd_ticks"))
  }
}
