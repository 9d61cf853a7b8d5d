package graft

import graft.operators.GapFill
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class GapFillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // A trades in w1 and w3 (silent in w2); B first appears in w3 (cold start)
  private val candles = Seq(
    (ts("2026-02-02 09:15:00"), "A", 10.0, 12.0, 9.0, 11.0, 5L),
    (ts("2026-02-02 09:25:00"), "A", 11.5, 13.0, 11.0, 12.0, 4L),
    (ts("2026-02-02 09:25:00"), "B", 50.0, 50.0, 50.0, 50.0, 1L)
  ).toDF("window_start", "symbol", "open", "high", "low", "close", "tick_count")

  test("gap-fill synthesizes flat candle from last close; cold start drops") {
    val out = GapFill.fill(candles).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6), r.getBoolean(7)))
      .sortBy(t => (t._1, t._2))
    assert(out === Array(
      ("A", "2026-02-02 09:15:00.0", 10.0, 12.0, 9.0, 11.0, 5L, false),
      // gap: o=h=l=c = prev close 11.0, tick_count 0, flagged
      ("A", "2026-02-02 09:20:00.0", 11.0, 11.0, 11.0, 11.0, 0L, true),
      ("A", "2026-02-02 09:25:00.0", 11.5, 13.0, 11.0, 12.0, 4L, false),
      // B has no prior close at 09:15/09:20 → unfillable, dropped
      ("B", "2026-02-02 09:25:00.0", 50.0, 50.0, 50.0, 50.0, 1L, false)))
  }

  test("session gap-fill seeds a silent day from the previous day's close") {
    // day 1: A and B trade; day 2: only B trades (A fully silent);
    // day 3: both trade. C appears only on day 3 (cold start before that).
    val multiDay = Seq(
      (ts("2026-02-02 09:15:00"), "A", 10.0, 12.0, 9.0, 11.0, 5L),
      (ts("2026-02-02 09:20:00"), "B", 50.0, 50.0, 50.0, 50.0, 1L),
      (ts("2026-02-03 09:15:00"), "B", 51.0, 51.0, 51.0, 51.0, 2L),
      (ts("2026-02-04 09:15:00"), "A", 14.0, 14.0, 14.0, 14.0, 1L),
      (ts("2026-02-04 09:15:00"), "C", 7.0, 7.0, 7.0, 7.0, 1L)
    ).toDF("window_start", "symbol", "open", "high", "low", "close", "tick_count")
    val out = GapFill.fillSessions(multiDay).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString, r.getDouble(5),
        r.getLong(6), r.getBoolean(7)))
      .sortBy(t => (t._1, t._2))
    // A on silent day 2 is synthesized flat at day-1 close 11.0
    assert(out.contains(("A", "2026-02-03 09:15:00.0", 11.0, 0L, true)))
    // A's day-1 09:20 slot (grid from B's candle) fills intraday
    assert(out.contains(("A", "2026-02-02 09:20:00.0", 11.0, 0L, true)))
    // C before its first candle is cold-start dropped
    assert(!out.exists(t => t._1 == "C" && t._2 < "2026-02-04"))
    // intra-task frames never cross days: every filled value matches the
    // chain of observed closes, so real candles pass through untouched
    assert(out.contains(("A", "2026-02-04 09:15:00.0", 14.0, 1L, false)))
    assert(out.contains(("B", "2026-02-04 09:15:00.0", 51.0, 0L, true)))
  }

  test("missing census lists exactly the empty grid slots") {
    val missing = GapFill.missingCensus(candles).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString)).sorted
    assert(missing === Array(
      ("A", "2026-02-02 09:20:00.0"),
      ("B", "2026-02-02 09:15:00.0"),
      ("B", "2026-02-02 09:20:00.0")))
    // single session: the day-bounded variant is slot-identical
    val bounded = GapFill.missingCensusSessions(candles).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString)).sorted
    assert(bounded === missing)
  }

  test("day-bounded census never materializes overnight slots") {
    // two sessions a day apart: the global grid spans the overnight gap
    // (~287 five-minute slots), the session grid only the traded ranges
    val twoDays = Seq(
      (ts("2026-02-02 09:15:00"), "A", 10.0, 10.0, 10.0, 10.0, 1L),
      (ts("2026-02-02 09:25:00"), "A", 11.0, 11.0, 11.0, 11.0, 1L),
      (ts("2026-02-03 09:15:00"), "A", 12.0, 12.0, 12.0, 12.0, 1L),
      (ts("2026-02-03 09:25:00"), "B", 50.0, 50.0, 50.0, 50.0, 1L)
    ).toDF("window_start", "symbol", "open", "high", "low", "close", "tick_count")
    val bounded = GapFill.missingCensusSessions(twoDays).collect()
      .map(r => (r.getString(1), r.getTimestamp(0).toString)).sorted
    // day 1 session = 09:15..09:25 (3 slots × {A,B}), day 2 likewise:
    // missing = A@d1 09:20, B@d1 all 3, A@d2 {09:20, 09:25}, B@d2 {09:15, 09:20}
    assert(bounded === Array(
      ("A", "2026-02-02 09:20:00.0"),
      ("A", "2026-02-03 09:20:00.0"),
      ("A", "2026-02-03 09:25:00.0"),
      ("B", "2026-02-02 09:15:00.0"),
      ("B", "2026-02-02 09:20:00.0"),
      ("B", "2026-02-02 09:25:00.0"),
      ("B", "2026-02-03 09:15:00.0"),
      ("B", "2026-02-03 09:20:00.0")))
    // and the global variant would have materialized the overnight span
    assert(GapFill.missingCensus(twoDays).count() > bounded.length)
  }
}
