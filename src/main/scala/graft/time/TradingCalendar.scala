package graft.time

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trading-calendar source + session-bounds resolution + session window
  * dimension.
  *
  * Reference: /root/reference/config/trading_calendar.py:28-95 loads a
  * per-year JSON (`{year, holidays: [{date,name}],
  * special_sessions: [{date,name,open,close}]}`,
  * /root/reference/data/calendars/holidays_2026.json:1-89), gates
  * processing on trading days (weekends/holidays skip; special sessions
  * override open/close), and /root/reference/utils/time_utils.py:54-89
  * precomputes the day's 5-minute window boundaries.
  *
  * Engine version: `multiLine` JSON scan + explode into two small
  * DataFrames, and the window dimension generated declaratively with
  * `sequence` + `explode` — the grid lives in the plan, never on the driver.
  */
object TradingCalendar {

  final case class SessionBounds(open: String, close: String) // "HH:mm"

  val DefaultSession: SessionBounds = SessionBounds("09:15", "15:30")

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** (date STRING, name STRING) holiday rows. */
  def holidays(cal: DataFrame): DataFrame =
    cal.select(explode(col("holidays")).as("h"))
      .select(col("h.date").as("date"), col("h.name").as("name"))

  /** (date, name, open, close) special-session rows. */
  def specialSessions(cal: DataFrame): DataFrame =
    cal.select(explode(col("special_sessions")).as("s"))
      .select(col("s.date").as("date"), col("s.name").as("name"),
        col("s.open").as("open"), col("s.close").as("close"))

  /** Per-date trading sessions over a date range: weekdays minus holidays at
    * default hours, plus special sessions (any day) at their own hours —
    * trading_calendar.py:60-95 semantics as one declarative frame.
    * Output: (session_date DATE, open TIMESTAMP, close TIMESTAMP).
    */
  def sessions(cal: DataFrame, startDate: String, endDate: String,
               default: SessionBounds = DefaultSession): DataFrame = {
    val spark = cal.sparkSession
    val days = spark.range(1).select(
        explode(sequence(lit(startDate).cast("date"), lit(endDate).cast("date"),
          expr("interval 1 day"))).as("session_date"))
    val hol = holidays(cal).select(col("date").cast("date").as("session_date"), lit(true).as("is_holiday"))
    val special = specialSessions(cal).select(
      col("date").cast("date").as("session_date"),
      col("open").as("sp_open"), col("close").as("sp_close"))
    days
      .join(broadcast(hol), Seq("session_date"), "left_outer")
      .join(broadcast(special), Seq("session_date"), "left_outer")
      // regular day: weekday and not a holiday; special session overrides all
      .where(col("sp_open").isNotNull ||
        (dayofweek(col("session_date")).between(2, 6) && col("is_holiday").isNull))
      .select(
        col("session_date"),
        to_timestamp(concat_ws(" ", col("session_date").cast("string"),
          coalesce(col("sp_open"), lit(default.open)))).as("open"),
        to_timestamp(concat_ws(" ", col("session_date").cast("string"),
          coalesce(col("sp_close"), lit(default.close)))).as("close"))
  }

  /** Window dimension: every window start in [open, close) per session —
    * time_utils.py:54-89 (75 windows for a default 09:15–15:30 day).
    */
  def windowDim(sessions: DataFrame, intervalMinutes: Int = 5): DataFrame =
    sessions.select(
      col("session_date"),
      explode(sequence(col("open"),
        col("close") - expr(s"interval $intervalMinutes minutes"),
        expr(s"interval $intervalMinutes minutes"))).as("window_start"))

  /** Market-hours predicate for a tick frame joined against its session:
    * open ≤ ts < close (inclusive-open/exclusive-close,
    * time_utils.py:140-164).
    */
  def inSession(ts: org.apache.spark.sql.Column, open: org.apache.spark.sql.Column,
                close: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ts >= open && ts < close
}
