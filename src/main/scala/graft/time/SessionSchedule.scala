package graft.time

import org.apache.spark.sql.DataFrame

/** Serializable trading-session schedule for STREAMING-side calendar
  * gating: the closure-shippable form of [[TradingCalendar.sessions]],
  * answering "is this window start inside a trading session?" without a
  * join — the chained sweep asks it per candidate window, on executors.
  *
  * Semantics match TradingCalendar.sessions exactly (reference:
  * /root/reference/config/trading_calendar.py:60-95): weekdays minus
  * holidays trade the default [open, close); a special session trades its
  * own hours on ANY day, overriding weekend/holiday status.
  *
  * The payload is tiny by construction — a year of holidays plus a
  * handful of special sessions — so shipping it inside the processor
  * closure is free; there is deliberately no per-day window list (that
  * would grow with the replayed range).
  */
final case class SessionSchedule(
    zoneId: String,
    defaultOpenMin: Int,
    defaultCloseMin: Int,
    holidays: Set[String],                 // "yyyy-MM-dd"
    specials: Map[String, (Int, Int)])     // date -> (openMin, closeMin)
    extends Serializable {

  @transient private lazy val zone = java.time.ZoneId.of(zoneId)

  /** The session bounds (openMin, closeMin) trading on `date`
    * ("yyyy-MM-dd"), if any — the is_trading_day gate plus hours.
    */
  def sessionOn(date: String): Option[(Int, Int)] =
    specials.get(date).orElse {
      val d = java.time.LocalDate.parse(date)
      if (d.getDayOfWeek.getValue <= 5 && !holidays.contains(date))
        Some((defaultOpenMin, defaultCloseMin))
      else None
    }

  /** open ≤ w < close for the session (if any) on w's local date. */
  def windowInSession(wMs: Long): Boolean = {
    val zdt = java.time.Instant.ofEpochMilli(wMs).atZone(zone)
    val minuteOfDay = zdt.getHour * 60 + zdt.getMinute
    sessionOn(zdt.toLocalDate.toString)
      .exists { case (o, c) => minuteOfDay >= o && minuteOfDay < c }
  }
}

object SessionSchedule {

  private def minutes(hm: String): Int = {
    val Array(h, m) = hm.split(":", 2)
    h.toInt * 60 + m.toInt
  }

  /** Build from the calendar frame (one driver collect of the tiny holiday
    * and special-session dimensions).
    */
  def fromCalendar(cal: DataFrame, zoneId: String,
                   default: TradingCalendar.SessionBounds = TradingCalendar.DefaultSession): SessionSchedule = {
    val hol = TradingCalendar.holidays(cal)
      .select("date").collect().map(_.getString(0)).toSet
    val sp = TradingCalendar.specialSessions(cal)
      .select("date", "open", "close").collect()
      .map(r => r.getString(0) -> (minutes(r.getString(1)), minutes(r.getString(2))))
      .toMap
    SessionSchedule(zoneId, minutes(default.open), minutes(default.close), hol, sp)
  }

  /** Every weekday trades the default hours — no calendar data needed. */
  def weekdays(zoneId: String,
               default: TradingCalendar.SessionBounds = TradingCalendar.DefaultSession): SessionSchedule =
    SessionSchedule(zoneId, minutes(default.open), minutes(default.close),
      Set.empty, Map.empty)
}
