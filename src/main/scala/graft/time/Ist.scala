package graft.time

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IST (Asia/Kolkata) event-time helpers.
  *
  * The reference pins every timestamp to IST
  * (/root/reference/config/settings.py:32, ZoneInfo("Asia/Kolkata")) and
  * serializes ISO strings at each boundary. The engine keeps instants in
  * UTC internally (session timezone UTC, SURVEY.md §1.2) and converts only
  * at the edges — these helpers are those edges.
  */
object Ist {
  val Zone = "Asia/Kolkata"

  /** UTC instant → IST wall-clock (as timestamp-without-zone semantics). */
  def toIst(utc: Column): Column = from_utc_timestamp(utc, Zone)

  /** IST wall-clock → UTC instant. */
  def fromIst(ist: Column): Column = to_utc_timestamp(ist, Zone)

  /** Epoch seconds (broker feed, ws_client.py:163-165) → IST wall-clock. */
  def epochToIst(epochSeconds: Column): Column =
    toIst(to_timestamp(from_unixtime(epochSeconds)))

  /** ISO-8601 IST string for sink rows (tick_buffer.py:37 formatting). */
  def isoIst(utc: Column): Column =
    date_format(toIst(utc), "yyyy-MM-dd'T'HH:mm:ss")

  /** IST minutes-since-midnight — the market-hours predicate's axis
    * (09:15 → 555, 15:30 → 930; membership is [open, close)).
    */
  def istMinutesOfDay(utc: Column): Column =
    hour(toIst(utc)) * 60 + minute(toIst(utc))
}
