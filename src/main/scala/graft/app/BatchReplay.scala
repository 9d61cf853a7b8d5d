package graft.app

import graft.ingest.TickIngest
import graft.model.Instrument
import graft.operators.{Atr, GapFill, Ohlc}
import graft.sink.{EdgeFormat, IdempotentSink}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Batch replay entrypoint: the reference's whole day-pipeline as one
  * declarative job (SURVEY.md §7 "minimum end-to-end slice") —
  *
  *   raw ticks → ingest (parse/validate + broadcast dim join)
  *             → 5-minute OHLC aggregation
  *             → gap-fill (dense grid + forward fill)
  *             → Wilder ATR enrichment
  *             → 13-column edge format
  *             → idempotent dedup append sink
  *
  * Replaying the same day twice writes zero duplicate rows (🔒3), which is
  * the reference's recovery story (08_ULTRA_RECOVERY_POLICY.md) expressed as
  * plain idempotency.
  */
object BatchReplay {

  /** Ticks → enriched candles (no sink). */
  def enrich(rawTicks: DataFrame, instruments: Dataset[Instrument]): DataFrame = {
    val ticks = TickIngest.ingest(rawTicks, instruments)
    val candles = Ohlc.candles(ticks, tsCol = "event_ts", symCol = "symbol",
      priceCol = "ltp", seqCol = "seq")
    val filled = GapFill.fillSessions(candles)
    Atr.enrich(filled).toDF()
  }

  /** Full replay: enrich + edge-format + idempotent append.
    *
    * The sink layout is IDENTICAL to the streaming pipeline's (declared
    * market_data schema, `dt` partition column, timestamp-pruned dedup
    * scan) — a day replayed in batch and a day written live land in the
    * same directory shape, so either path can dedup against the other.
    *
    * @return rows actually written (0 on a pure replay)
    */
  def run(rawTicks: DataFrame, instruments: Dataset[Instrument],
          sinkDir: String, createdAt: String): Long = {
    val edge = EdgeFormat.sheetRows(
      enrich(rawTicks, instruments)
        // re-join segment from the dimension for the edge row
        .join(broadcast(instruments.toDF().select(col("symbol"), col("segment"))), Seq("symbol"), "left_outer"),
      createdAt)
    graft.sink.Schemas.validate(edge, graft.sink.Schemas.MarketData, "market_data")
    val rows = edge.withColumn("dt", substring(col("timestamp"), 1, 10))
    IdempotentSink.appendDedup(rows, sinkDir,
      pruneCol = Some("timestamp"), partitionCol = Some("dt"))
  }
}
