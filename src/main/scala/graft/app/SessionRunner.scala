package graft.app

import graft.time.TradingCalendar
import org.apache.spark.sql.DataFrame
import scala.util.control.NonFatal

/** Calendar-driven multi-day orchestration — the reference's top-level day
  * loop (main.py:107-151): gate on the trading calendar (weekends and
  * holidays never run; special sessions run at their own hours), resolve
  * the session bounds, and run the day's pipeline; a day's failure is
  * reported and the loop continues to the next session (the reference
  * exits its single day — across a replayed RANGE the correct analog is
  * isolate-and-continue, since each day's sink append is idempotent).
  *
  * The session list is driver-side by design: a year of sessions is ~250
  * rows from [[TradingCalendar.sessions]] — the loop iterates days, every
  * day's actual work stays distributed.
  */
object SessionRunner {

  final case class Session(date: String, open: java.sql.Timestamp, close: java.sql.Timestamp)
  final case class RunReport(ran: Seq[String], failed: Seq[(String, Throwable)])

  /** Ordered trading sessions in [startDate, endDate] (dates inclusive,
    * "yyyy-MM-dd"). Non-trading days simply don't appear — the
    * is_trading_day gate of main.py:115-124 expressed by construction.
    */
  def tradingSessions(cal: DataFrame, startDate: String, endDate: String,
                      default: TradingCalendar.SessionBounds = TradingCalendar.DefaultSession): Seq[Session] =
    TradingCalendar.sessions(cal, startDate, endDate, default)
      .orderBy("session_date")
      .collect()
      .toSeq
      .map(r => Session(r.getDate(0).toString, r.getTimestamp(1), r.getTimestamp(2)))

  /** Run one body per trading session in order. Failures are isolated per
    * day (reported via `onError` and the returned report) unless
    * `failFast` — replays are safe either way because every session's
    * writes go through the idempotent sink.
    */
  def runRange(cal: DataFrame, startDate: String, endDate: String,
               failFast: Boolean = false,
               onError: (Session, Throwable) => Unit = (_, _) => ())
              (body: Session => Unit): RunReport = {
    val sessions = tradingSessions(cal, startDate, endDate)
    val ran = Seq.newBuilder[String]
    val failed = Seq.newBuilder[(String, Throwable)]
    sessions.foreach { s =>
      try { body(s); ran += s.date }
      catch {
        case NonFatal(e) if !failFast =>
          onError(s, e)
          failed += s.date -> e
      }
    }
    RunReport(ran.result(), failed.result())
  }
}
