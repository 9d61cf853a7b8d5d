package graft

import graft.ingest.TickIngest
import graft.model.Instrument
import graft.sources.ScripMaster
import graft.time.TradingCalendar
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class SourcesTimeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def res(name: String) = getClass.getResource(s"/$name").getPath

  test("scrip master: segment filter, null drop, first-match per symbol") {
    val master = ScripMaster.load(spark, res("scrip_master_fixture.csv"))
    val dim = ScripMaster.instruments(master).collect().sortBy(_.symbol)
    // BSEONLY (other segment) and the null-symbol row dropped;
    // RELIANCE resolves to the lowest token (2885), not the dup (9999)
    assert(dim.map(i => (i.symbol, i.token)).toSeq ===
      Seq(("NIFTY", "26000"), ("RELIANCE", "2885"), ("TCS", "11536")))
    val scoped = ScripMaster.instruments(master, Some(Seq("TCS"))).collect()
    assert(scoped.map(_.symbol).toSeq === Seq("TCS"))
  }

  test("subscribe batching: 50-per-batch spacing plan, failed batch isolated") {
    import graft.ingest.Subscriptions
    val universe = (1 to 120).map(t => s"tok$t")
    val plan = Subscriptions.plan(universe)
    assert(plan.map(_.items.size) === Seq(50, 50, 20))
    assert(plan.map(_.startIndex) === Seq(0, 50, 100))
    assert(plan.map(_.delayMsBefore) === Seq(0L, 500L, 500L)) // no sleep before first
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val subscribed = scala.collection.mutable.ArrayBuffer.empty[Int]
    // batch 2 fails → isolated, batch 3 still subscribes
    val failedBatches = Subscriptions.run(plan)(
      items => { if (items.head == "tok51") throw new RuntimeException("throttled")
                 else subscribed += items.size },
      sleep = slept += _)
    assert(subscribed.toSeq === Seq(50, 20))
    assert(slept.toSeq === Seq(500L, 500L))
    assert(failedBatches.map(_.startIndex) === Seq(50)) // comes back for retry
  }

  test("session runner: calendar-gated multi-day loop with per-day failure isolation") {
    import graft.app.SessionRunner
    val cal = TradingCalendar.load(spark, res("calendar_fixture.json"))
    // 02-04 is a holiday, 02-07 Sat runs special hours, 02-08 Sun never runs
    val sessions = SessionRunner.tradingSessions(cal, "2026-02-02", "2026-02-08")
    assert(sessions.map(_.date) ===
      Seq("2026-02-02", "2026-02-03", "2026-02-05", "2026-02-06", "2026-02-07"))
    assert(sessions.last.open.toString === "2026-02-07 18:15:00.0")
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val report = SessionRunner.runRange(cal, "2026-02-02", "2026-02-08",
      onError = (s, _) => errs += s.date) { s =>
      if (s.date == "2026-02-03") throw new RuntimeException("bad day")
    }
    assert(report.ran === Seq("2026-02-02", "2026-02-05", "2026-02-06", "2026-02-07"))
    assert(report.failed.map(_._1) === Seq("2026-02-03"))
    assert(errs.toSeq === Seq("2026-02-03"))
    // failFast propagates instead
    intercept[RuntimeException] {
      SessionRunner.runRange(cal, "2026-02-02", "2026-02-08", failFast = true) { s =>
        if (s.date == "2026-02-03") throw new RuntimeException("bad day")
      }
    }
  }

  test("calendar: weekday/holiday/special-session resolution and window dim") {
    val cal = TradingCalendar.load(spark, res("calendar_fixture.json"))
    assert(TradingCalendar.holidays(cal).count() === 1)
    // 2026-02-02 Mon .. 2026-02-08 Sun; 02-04 Wed holiday; 02-07 Sat special
    val ss = TradingCalendar.sessions(cal, "2026-02-02", "2026-02-08")
      .collect().map(r => (r.getDate(0).toString, r.getTimestamp(1).toString,
        r.getTimestamp(2).toString)).sortBy(_._1)
    assert(ss.map(_._1).toSeq ===
      Seq("2026-02-02", "2026-02-03", "2026-02-05", "2026-02-06", "2026-02-07"))
    assert(ss.head._2 === "2026-02-02 09:15:00.0")
    assert(ss.last._2 === "2026-02-07 18:15:00.0") // special hours override
    assert(ss.last._3 === "2026-02-07 19:45:00.0")
    val wins = TradingCalendar.windowDim(
      TradingCalendar.sessions(cal, "2026-02-02", "2026-02-02"))
    assert(wins.count() === 75) // 09:15..15:25 inclusive = 75 five-minute starts
    val special = TradingCalendar.windowDim(
      TradingCalendar.sessions(cal, "2026-02-07", "2026-02-07"))
    assert(special.count() === 18) // 18:15..19:40
  }

  test("session schedule: closure-shippable gate matches calendar sessions semantics") {
    val cal = TradingCalendar.load(spark, res("calendar_fixture.json"))
    val sched = graft.time.SessionSchedule.fromCalendar(cal, "UTC")
    def ms(s: String) = java.time.LocalDateTime.parse(s)
      .atZone(java.time.ZoneId.of("UTC")).toInstant.toEpochMilli
    assert(sched.windowInSession(ms("2026-02-02T09:15:00")))  // Mon open
    assert(!sched.windowInSession(ms("2026-02-02T09:10:00"))) // pre-open
    assert(sched.windowInSession(ms("2026-02-02T15:25:00")))  // last window
    assert(!sched.windowInSession(ms("2026-02-02T15:30:00"))) // close exclusive
    assert(!sched.windowInSession(ms("2026-02-04T10:00:00"))) // holiday
    assert(!sched.windowInSession(ms("2026-02-07T10:00:00"))) // special day off-hours
    assert(sched.windowInSession(ms("2026-02-07T18:15:00")))  // Sat special hours
    assert(!sched.windowInSession(ms("2026-02-07T19:45:00")))
    assert(!sched.windowInSession(ms("2026-02-08T10:00:00"))) // Sunday
  }

  test("tick ingest: alias extraction, invalid drop, unknown-token drop") {
    val raw = Seq(
      ("2885", Some(100.5), 1770022500L, 1L),   // valid RELIANCE tick
      ("11536", Some(3300.0), 1770022501L, 2L), // valid TCS tick
      ("", Some(1.0), 1770022502L, 3L),         // empty token → drop
      ("2885", None, 1770022503L, 4L),          // null ltp → drop
      ("424242", Some(5.0), 1770022504L, 5L)    // unknown token → drop
    ).toDF("tk", "ltp", "exchange_timestamp", "seq")
    val dim = Seq(
      Instrument("RELIANCE", "2885", "nse_cm"),
      Instrument("TCS", "11536", "nse_cm")).toDS()
    val out = TickIngest.ingest(raw, dim).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(4))).sortBy(_._3)
    assert(out.toSeq === Seq(("RELIANCE", 100.5, 1L), ("TCS", 3300.0, 2L)))
  }

  test("tick ingest: accepts alternate alias spellings and ISO strings") {
    val raw = Seq(("2885", 99.0, "2026-02-02 09:15:00", 1L))
      .toDF("instrument_token", "last_traded_price", "event_ts", "seq")
    val dim = Seq(Instrument("RELIANCE", "2885", "nse_cm")).toDS()
    val out = TickIngest.ingest(raw, dim).collect()
    assert(out.length === 1)
    assert(out.head.getTimestamp(3) === Timestamp.valueOf("2026-02-02 09:15:00"))
  }
}
