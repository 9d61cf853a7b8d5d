package graft

import graft.model.Instrument
import graft.streaming.{ChainedPipeline, FullPipeline, StreamingPipeline}
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The streaming-native chained enrich (transformWithState) against the
  * same fixture day PipelineEndToEndSpec pins for the foreachBatch path:
  * byte-identical output, and checkpoint-only restart continuity (no
  * external state snapshots). Needs the RocksDB state store, hence its own
  * session (transformWithState requirement).
  */
class ChainedPipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-chained-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private val instruments = Seq(
    Instrument("RELIANCE", "2885", "nse_cm"),
    Instrument("TCS", "11536", "nse_cm"),
    Instrument("NIFTY", "26000", "nse_cm"))

  /** The PipelineEndToEndSpec fixture day: 17 windows from 09:15, RELIANCE
    * every window, TCS silent in w2-w3, w5 globally silent, NIFTY never
    * ticks, one unknown token + one null price.
    */
  private def syntheticDay(date: String = "2026-02-02"): Seq[(String, Option[Double], Timestamp, Long)] = {
    val rnd = new Random(7)
    val base = Timestamp.valueOf(s"$date 09:15:00").getTime
    var seq = 0L
    val rows = scala.collection.mutable.Buffer[(String, Option[Double], Timestamp, Long)]()
    for (w <- 0 until 17 if w != 5) {
      val wstart = base + w * 300000L
      seq += 1; rows += (("2885", Some(2000.0 + rnd.nextInt(100)), new Timestamp(wstart), seq))
      for (_ <- 0 until 3) {
        seq += 1
        rows += (("2885", Some(2000.0 + rnd.nextInt(100)),
          new Timestamp(wstart + 1000 + rnd.nextInt(290000)), seq))
      }
      if (w < 2 || w > 3) {
        seq += 1
        rows += (("11536", Some(3300.0 + rnd.nextInt(50)),
          new Timestamp(wstart + rnd.nextInt(299000)), seq))
      }
    }
    seq += 1; rows += (("424242", Some(1.0), new Timestamp(base + 1000), seq))
    seq += 1; rows += (("2885", None, new Timestamp(base + 2000), seq))
    rows.toSeq
  }

  private def rawDf(date: String = "2026-02-02") =
    syntheticDay(date).toDF("tk", "ltp", "exchange_timestamp", "seq")

  /** Sentinel just past the last real window's end: watermark lands at
    * 10:40:00, closing window 16 (10:35) exactly — BOTH streaming paths
    * finalize precisely the fixture's windows, nothing trailing, so the
    * watermark-bounded chained sweep and the batch-max-bounded foreachBatch
    * densify the same range and the outputs can be compared byte-for-byte.
    */
  private val sentinel = Seq(("2885", Some(2000.0),
    Timestamp.valueOf("2026-02-02 10:40:01"), 99999L))

  private def sinkRows(dir: String): Set[Seq[Any]] =
    spark.read.parquet(dir).drop("created_at", "dt").collect().map(_.toSeq).toSet

  test("chained transformWithState pipeline is byte-identical to foreachBatch and batch truth") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-chained").toString
    val dim = instruments.toDS()

    // batch truth
    val batchSink = s"$root/batch_sink"
    graft.app.BatchReplay.run(rawDf(), dim, batchSink, "2026-02-02T16:00:00")
    val want = sinkRows(batchSink)

    def candleStream(stream: MemoryStream[(String, Option[Double], Timestamp, Long)]) = {
      val ticks = graft.ingest.TickIngest.ingest(
        stream.toDF().toDF("tk", "ltp", "exchange_timestamp", "seq"), dim)
      StreamingPipeline.ohlcCandles(ticks, tsCol = "event_ts",
        symCol = "symbol", priceCol = "ltp", seqCol = "seq", watermarkDelay = "1 seconds")
    }
    def feed(stream: MemoryStream[(String, Option[Double], Timestamp, Long)],
             q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val day = syntheticDay()
      val (first, second) = day.splitAt(day.length / 2)
      stream.addData(first); q.processAllAvailable()
      stream.addData(second); q.processAllAvailable()
      stream.addData(sentinel); q.processAllAvailable()
    }

    // foreachBatch reference path
    val s1 = MemoryStream[(String, Option[Double], Timestamp, Long)]
    val q1 = FullPipeline.start(candleStream(s1), instruments.map(_.symbol),
      s"$root/full_sink", s"$root/full_dead", s"$root/full_ckpt", s"$root/full_state")
    try feed(s1, q1) finally q1.stop()

    // chained transformWithState path
    val s2 = MemoryStream[(String, Option[Double], Timestamp, Long)]
    val q2 = ChainedPipeline.start(candleStream(s2), instruments.map(_.symbol),
      s"$root/ch_sink", s"$root/ch_dead", s"$root/ch_ckpt")
    try feed(s2, q2) finally q2.stop()

    val full = sinkRows(s"$root/full_sink")
    val chained = sinkRows(s"$root/ch_sink")
    // the chained path reproduces batch truth exactly — 34 rows: 17×2 with
    // TCS gaps at w2/w3/w5 and RELIANCE gap at w5 — and matches foreachBatch
    assert(chained === want,
      s"chained != batch: missing ${(want -- chained).take(2)}, extra ${(chained -- want).take(2)}")
    assert(chained === full)
    // the globally-silent window was synthesized for both active symbols
    assert(spark.read.parquet(s"$root/ch_sink")
      .where($"timestamp" === "2026-02-02T09:40:00" && $"gap_filled" === "TRUE")
      .count() === 2)
    val ids = spark.read.parquet(s"$root/ch_sink").select("id").as[String].collect()
    assert(ids.length === ids.distinct.length)
  }

  test("day-bounded sweep: two sessions, no overnight synthesis, matches batch truth") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft-chained-2day").toString
    val dim = instruments.toDS()

    // batch truth over BOTH days: fillSessions densifies per-day observed
    // ranges and chains the seed across the overnight gap
    val batchSink = s"$root/batch_sink"
    graft.app.BatchReplay.run(rawDf("2026-02-02").union(rawDf("2026-02-03")),
      dim, batchSink, "x")
    val want = sinkRows(batchSink)

    // both days trade 09:15-10:40 (17 windows), nothing in between
    val sched = graft.time.SessionSchedule("UTC", 555, 930, Set.empty,
      Map("2026-02-02" -> ((555, 640)), "2026-02-03" -> ((555, 640))))
    val s = MemoryStream[(String, Option[Double], Timestamp, Long)]
    val ticks = graft.ingest.TickIngest.ingest(
      s.toDF().toDF("tk", "ltp", "exchange_timestamp", "seq"), dim)
    val candles = StreamingPipeline.ohlcCandles(ticks, tsCol = "event_ts",
      symCol = "symbol", priceCol = "ltp", seqCol = "seq", watermarkDelay = "1 seconds")
    val q = ChainedPipeline.start(candles, instruments.map(_.symbol),
      s"$root/sink", s"$root/dead", s"$root/ckpt", schedule = Some(sched))
    try {
      s.addData(syntheticDay("2026-02-02")); q.processAllAvailable()
      // Tuesday's first ticks advance the watermark across the overnight
      // gap — without the schedule the sweep would synthesize ~274 flat
      // candles per seeded symbol here and the batch compare would fail
      s.addData(syntheticDay("2026-02-03")); q.processAllAvailable()
      s.addData(Seq(("2885", Some(2000.0),
        Timestamp.valueOf("2026-02-03 10:40:01"), 999999L)))
      q.processAllAvailable()
    } finally q.stop()

    val got = sinkRows(s"$root/sink")
    assert(got === want,
      s"2-day chained != batch: missing ${(want -- got).take(2)}, extra ${(got -- want).take(2)}")
    val ts = spark.read.parquet(s"$root/sink").select("timestamp").as[String].collect()
    assert(ts.forall(t => t.startsWith("2026-02-02") || t.startsWith("2026-02-03")))
    assert(ts.forall(_.substring(11, 16) <= "10:35"), "overnight window leaked into the sink")
  }

  test("routing guard: restarting a checkpoint with different numShards fails fast") {
    val root = Files.createTempDirectory("graft-chained-routing").toString
    ChainedPipeline.guardRouting(spark, s"$root/ckpt", 8)
    ChainedPipeline.guardRouting(spark, s"$root/ckpt", 8) // same routing: fine
    val e = intercept[IllegalStateException] {
      ChainedPipeline.guardRouting(spark, s"$root/ckpt", 4)
    }
    assert(e.getMessage.contains("numShards"))
  }

  test("sink body on an empty batch: no writes, at most the single gate job") {
    val root = Files.createTempDirectory("graft-chained-empty").toString
    val empty = spark.emptyDataset[graft.model.EnrichedCandle].toDF()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      ChainedPipeline.sinkBatch(empty, 3, s"$root/sink", s"$root/dead")
      Thread.sleep(1000) // listener bus is async; settle before counting
      assert(jobs.get() <= 1, s"empty batch issued ${jobs.get()} jobs")
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/sink")))
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/dead")))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("chained pipeline restart: checkpoint-only state continuity, no dupes") {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-chained-restart").toString
    val dim = instruments.toDS()
    val srcDir = s"$root/src"

    val batchSink = s"$root/batch_sink"
    graft.app.BatchReplay.run(rawDf(), dim, batchSink, "x")
    val want = sinkRows(batchSink)

    val day = syntheticDay()
    val (first, second) = day.splitAt(day.length / 2)
    first.toDF("tk", "ltp", "exchange_timestamp", "seq")
      .coalesce(1).write.mode("append").parquet(srcDir)

    val schema = StructType(Seq(
      StructField("tk", StringType), StructField("ltp", DoubleType),
      StructField("exchange_timestamp", TimestampType), StructField("seq", LongType)))
    def startQuery() = {
      val ticks = graft.ingest.TickIngest.ingest(
        spark.readStream.schema(schema).parquet(srcDir), dim)
      val candles = StreamingPipeline.ohlcCandles(ticks, tsCol = "event_ts",
        symCol = "symbol", priceCol = "ltp", seqCol = "seq", watermarkDelay = "1 seconds")
      ChainedPipeline.start(candles, instruments.map(_.symbol),
        s"$root/sink", s"$root/dead", s"$root/ckpt")
    }

    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // crash mid-day — ATR/seed state lives ONLY in the checkpoint

    (second ++ sentinel).toDF("tk", "ltp", "exchange_timestamp", "seq")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val got = sinkRows(s"$root/sink")
      assert(got === want,
        s"restart diverged: missing ${(want -- got).take(2)}, extra ${(got -- want).take(2)}")
      val ids = spark.read.parquet(s"$root/sink").select("id").as[String].collect()
      assert(ids.length === ids.distinct.length)
    } finally q2.stop()
  }
}
