package graft.streaming

import graft.model.{AtrState, Candle, EnrichedCandle}
import graft.operators.Atr
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Wilder ATR on Spark 4's `transformWithState` arbitrary-state API — the
  * successor to `flatMapGroupsWithState` ([[StreamingPipeline.atrEnrich]]):
  * named state variables in the RocksDB-backed store, explicit TTL/timer
  * surface, and schema-evolvable state. Semantics are identical
  * ([[Atr.step]] per candle in window order, state carried across
  * micro-batches); both operators stay maintained since
  * flatMapGroupsWithState runs on the default HDFS-backed store while this
  * requires the RocksDB state-store provider.
  */
class AtrProcessor extends StatefulProcessor[String, Candle, EnrichedCandle] {

  @transient private var state: ValueState[AtrState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[AtrState]("atr",
      Encoders.product[AtrState], TTLConfig.NONE)

  override def handleInputRows(symbol: String, rows: Iterator[Candle],
                               timerValues: TimerValues): Iterator[EnrichedCandle] = {
    var st = Option(state.get()).getOrElse(AtrState.empty)
    val out = rows.toIndexedSeq.sortBy(_.wkey).map { c =>
      val (next, tr, atr) = Atr.step(st, c.high, c.low, c.close)
      st = next
      EnrichedCandle(c.symbol, c.wkey, c.window_start, c.open, c.high, c.low,
        c.close, c.tick_count, c.gap_filled, Some(tr), atr)
    }
    state.update(st)
    out.iterator
  }
}

object AtrProcessor {
  /** Requires `spark.sql.streaming.stateStore.providerClass` =
    * RocksDBStateStoreProvider on the session.
    */
  def enrich(candles: Dataset[Candle]): Dataset[EnrichedCandle] = {
    import candles.sparkSession.implicits._
    candles.groupByKey(_.symbol)
      .transformWithState(new AtrProcessor, TimeMode.None(), OutputMode.Append())
  }
}
