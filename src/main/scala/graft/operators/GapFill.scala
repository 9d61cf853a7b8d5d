package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-fill: synthesize flat candles for (symbol, window) slots with zero
  * ticks, carrying the last known close forward.
  *
  * Reference semantics: /root/reference/modules/aggregator/gap_fill.py:32-88 —
  * expected symbols LEFT JOIN current candles; missing + prior close known →
  * flat candle (o=h=l=c=prev close, tick_count=0, gap_filled=true); missing
  * with no prior close ever → unfillable, dropped (cold start).
  *
  * Spark-first design: build the dense (window × symbol) grid declaratively
  * (`sequence` + `explode` over the observed bounds — no driver-side loop,
  * the grid is generated inside the plan), left-join the candles, and
  * forward-fill with `last(close, ignoreNulls)` over a per-symbol window
  * (SURVEY.md §2.6).
  *
  * DEFAULT = [[fillSessions]]: bounded per-task state (one symbol-day per
  * frame, days chained through a tiny per-day seed), which is what the
  * pipeline entrypoints (BatchReplay, SparkEntry.entry, q50) use. [[fill]]
  * is the explicitly-GLOBAL variant — one continuous grid across the whole
  * observed range including overnight/weekend slots, with a per-symbol
  * full-range frame — kept for small ranges where that semantics (or a
  * single frame) is actually wanted.
  */
object GapFill {

  /** Explicitly-global gap-fill: densify on one continuous grid between the
    * global min and max observed window (overnight slots included), with an
    * unbounded per-symbol forward-fill frame. A symbol's FULL range flows
    * through one task — fine for a session or a few days of 5-minute
    * candles, wrong at tick granularity or long histories; the default
    * scale-safe formulation is [[fillSessions]].
    *
    * @param candles (window_start: timestamp, symbol, open, high, low, close, tick_count)
    * @return same schema + gap_filled, densified on the 5-minute grid between
    *         the global min and max observed window.
    */
  def fill(candles: DataFrame, intervalMinutes: Int = 5): DataFrame = {
    val bounds = candles.agg(
      min(col("window_start")).as("wmin"),
      max(col("window_start")).as("wmax"))
    val wins = bounds.select(
      explode(sequence(col("wmin"), col("wmax"),
        expr(s"interval $intervalMinutes minutes"))).as("window_start"))
    val syms = candles.select(col("symbol")).distinct()
    // grid = windows × symbols; symbols dim is small → broadcast the cross join
    val grid = wins.crossJoin(broadcast(syms))
    val joined = grid.join(candles, Seq("window_start", "symbol"), "left_outer")
    val w = Window.partitionBy(col("symbol")).orderBy(col("window_start"))
      .rowsBetween(Window.unboundedPreceding, -1)
    joined
      .withColumn("prev_close", last(col("close"), ignoreNulls = true).over(w))
      .withColumn("gap_filled", col("tick_count").isNull && col("prev_close").isNotNull)
      // cold start: never seen a close → unfillable, drop (gap_fill.py:70-75)
      .where(col("tick_count").isNotNull || col("prev_close").isNotNull)
      .select(
        col("window_start"), col("symbol"),
        coalesce(col("open"), col("prev_close")).as("open"),
        coalesce(col("high"), col("prev_close")).as("high"),
        coalesce(col("low"), col("prev_close")).as("low"),
        coalesce(col("close"), col("prev_close")).as("close"),
        coalesce(col("tick_count"), lit(0L)).as("tick_count"),
        col("gap_filled"))
  }

  /** Session-aware gap-fill with BOUNDED per-task state — the 100 TB
    * formulation of [[fill]]. The dense grid is built per trading day (the
    * day's observed [min, max] window range, shared across symbols, like
    * the reference's common session bounds), the forward-fill window
    * partitions by (symbol, day) — so a task holds at most one symbol-day
    * (≤ a few hundred windows) — and days chain through a DAY-granularity
    * window over one row per (symbol, day): the previous observed day-close
    * seeds the next day, across any run of fully-silent days. Output
    * contract matches [[fill]] (+ cold-start drop), restricted to observed
    * days' session ranges.
    */
  def fillSessions(candles: DataFrame, intervalMinutes: Int = 5): DataFrame = {
    val cd = candles.withColumn("d", to_date(col("window_start")))
    // per-day session bounds over ALL symbols (tiny: one row per day)
    val dayBounds = cd.groupBy(col("d")).agg(
      min(col("window_start")).as("wmin"), max(col("window_start")).as("wmax"))
    val wins = dayBounds.select(col("d"),
      explode(sequence(col("wmin"), col("wmax"),
        expr(s"interval $intervalMinutes minutes"))).as("window_start"))
    val syms = cd.select(col("symbol")).distinct()
    val grid = wins.crossJoin(broadcast(syms))
    val joined = grid.join(cd, Seq("window_start", "symbol", "d"), "left_outer")
    // last observed close per (symbol, day) — from real candles only
    val dayLast = cd.groupBy(col("symbol"), col("d"))
      .agg(max_by(col("close"), col("window_start")).as("day_close"))
    // previous-day seed: day-level forward fill over one row per
    // (symbol, day) — symbols × days rows, trivially small at any scale
    val dayGrid = dayBounds.select(col("d")).crossJoin(broadcast(syms))
      .join(dayLast, Seq("symbol", "d"), "left_outer")
    val dw = Window.partitionBy(col("symbol")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val seeds = dayGrid
      .withColumn("seed", last(col("day_close"), ignoreNulls = true).over(dw))
      .select(col("symbol"), col("d"), col("seed"))
    // intraday forward fill: frame bounded by windows-per-session
    val iw = Window.partitionBy(col("symbol"), col("d")).orderBy(col("window_start"))
      .rowsBetween(Window.unboundedPreceding, -1)
    joined
      .join(seeds, Seq("symbol", "d"))
      .withColumn("prev_close",
        coalesce(last(col("close"), ignoreNulls = true).over(iw), col("seed")))
      .withColumn("gap_filled", col("tick_count").isNull && col("prev_close").isNotNull)
      .where(col("tick_count").isNotNull || col("prev_close").isNotNull)
      .select(
        col("window_start"), col("symbol"),
        coalesce(col("open"), col("prev_close")).as("open"),
        coalesce(col("high"), col("prev_close")).as("high"),
        coalesce(col("low"), col("prev_close")).as("low"),
        coalesce(col("close"), col("prev_close")).as("close"),
        coalesce(col("tick_count"), lit(0L)).as("tick_count"),
        col("gap_filled"))
  }

  /** Missing-ticker census (candle_aggregator.py:193-203): expected grid slots
    * with no candle at all — the validation-log complement of [[fill]].
    * GLOBAL grid (min–max across the whole range, overnight slots included)
    * — kept for the single-session oracle shape; multi-day histories should
    * use the day-bounded [[missingCensusSessions]].
    */
  def missingCensus(candles: DataFrame, intervalMinutes: Int = 5): DataFrame = {
    val bounds = candles.agg(
      min(col("window_start")).as("wmin"),
      max(col("window_start")).as("wmax"))
    val wins = bounds.select(
      explode(sequence(col("wmin"), col("wmax"),
        expr(s"interval $intervalMinutes minutes"))).as("window_start"))
    val syms = candles.select(col("symbol")).distinct()
    wins.crossJoin(broadcast(syms))
      .join(candles.select("window_start", "symbol"), Seq("window_start", "symbol"), "left_anti")
  }

  /** Day-bounded missing-ticker census — the [[fillSessions]]-consistent
    * formulation of [[missingCensus]]: the expected grid is built per
    * observed trading day (that day's [min, max] window range shared across
    * symbols), so a long history's census grid grows with sessions actually
    * traded, never with overnight/weekend slots. The anti-join itself is
    * per-slot (no window frame), so on a single session the output equals
    * the global variant's exactly.
    */
  def missingCensusSessions(candles: DataFrame, intervalMinutes: Int = 5): DataFrame = {
    val cd = candles.withColumn("d", to_date(col("window_start")))
    val dayBounds = cd.groupBy(col("d")).agg(
      min(col("window_start")).as("wmin"), max(col("window_start")).as("wmax"))
    val wins = dayBounds.select(
      explode(sequence(col("wmin"), col("wmax"),
        expr(s"interval $intervalMinutes minutes"))).as("window_start"))
    val syms = candles.select(col("symbol")).distinct()
    wins.crossJoin(broadcast(syms))
      .join(candles.select("window_start", "symbol"), Seq("window_start", "symbol"), "left_anti")
  }
}
