package graft

import graft.model.Candle
import graft.operators.Atr
import graft.streaming.AtrProcessor
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState needs the RocksDB state store — its own session so the
  * provider config doesn't leak into the shared test session.
  */
class AtrProcessorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tws-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("transformWithState ATR matches the batch recursion across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val candles = (1 to 16).map(i =>
      Candle("X", i.toLong, f"w$i%03d", 15.0, 20.0, 10.0, 15.0, 1L, gap_filled = false))
    val stream = MemoryStream[Candle]
    val q = AtrProcessor.enrich(stream.toDS())
      .writeStream.outputMode("append").format("memory").queryName("tws_out").start()
    try {
      stream.addData(candles.take(9)); q.processAllAvailable()
      stream.addData(candles.drop(9)); q.processAllAvailable()
      val got = spark.table("tws_out").as[graft.model.EnrichedCandle]
        .collect().sortBy(_.wkey)
      val want = Atr.enrichSeries(candles)
      assert(got.map(e => (e.wkey, e.tr, e.atr)).toSeq === want.map(e => (e.wkey, e.tr, e.atr)))
      assert(got(13).atr.contains(10.0))
    } finally q.stop()
  }
}
