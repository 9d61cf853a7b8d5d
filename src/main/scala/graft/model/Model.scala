package graft.model

/** Core data model, derived from the reference's dataclasses
  * (SURVEY.md §1.1; /root/reference/modules/aggregator/tick_buffer.py:24-44,
  * /root/reference/modules/atr/atr_engine.py:20-60,
  * /root/reference/config/instruments.py:12-17).
  *
  * Window starts are carried as two parallel representations inside the
  * typed core: `wkey` (epoch micros, cheap total order for sorting) and
  * `window_start` (formatted string, the stable cross-engine output form).
  */

/** A parsed tick: what the reference's WebSocket parser emits
  * (ws_client.py:141-189). `seq` is a monotonic arrival sequence used to
  * break open/close ties on equal event timestamps (SURVEY.md §7).
  */
final case class Tick(
    token: String,
    symbol: String,
    ltp: Double,
    eventTsMicros: Long,
    seq: Long)

/** One OHLC candle per (symbol, 5-minute window) — tick_buffer.py:24-44. */
final case class Candle(
    symbol: String,
    wkey: Long,            // window start, epoch micros
    window_start: String,  // "yyyy-MM-dd HH:mm:ss"
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    tick_count: Long,
    gap_filled: Boolean)

/** Candle + True Range + Wilder ATR — atr_engine.py:29-60. TR/ATR are None
  * during warmup and must survive as real nulls (SURVEY.md §7 hard parts).
  */
final case class EnrichedCandle(
    symbol: String,
    wkey: Long,
    window_start: String,
    open: Double,
    high: Double,
    low: Double,
    close: Double,
    tick_count: Long,
    gap_filled: Boolean,
    tr: Option[Double],
    atr: Option[Double])

/** Per-symbol ATR recursion state — atr_engine.py:20-26. */
final case class AtrState(
    prevClose: Option[Double],
    prevAtr: Option[Double],
    trHistory: List[Double],
    candleCount: Int)

object AtrState {
  val empty: AtrState = AtrState(None, None, Nil, 0)
}

/** Instrument dimension row — config/instruments.py:12-17 (178 rows). */
final case class Instrument(symbol: String, token: String, segment: String)
