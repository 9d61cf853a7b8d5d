package graft.ingest

import graft.model.Instrument
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Tick parse / normalize / validate — the engine-side equivalent of the
  * reference's WebSocket message handler
  * (/root/reference/modules/websocket/ws_client.py:132-201):
  *
  *   - tolerant field extraction over aliased names (`tk` vs
  *     `instrument_token`, `ltp` vs `last_traded_price`,
  *     `exchange_timestamp`/`ft`/`feed_time`) — ws_client.py:146-174
  *   - null/invalid drop (`ltp is None or token == ""`) — ws_client.py:149-150
  *   - epoch-seconds → timestamp conversion — ws_client.py:163-165
  *   - unknown-token drop via instrument dimension — ws_client.py:177-179
  *
  * All of it is one declarative projection + a broadcast inner join, so the
  * whole parse path stays inside WholeStageCodegen and the dimension lookup
  * is a build-side hash table per executor — the distributed analog of the
  * reference's `INSTRUMENT_BY_TOKEN` dict. Dropped-row counts are exposed
  * via `observe` metrics instead of counters.
  */
object TickIngest {

  /** First non-null among the reference's accepted alias spellings. */
  private def alias1(df: DataFrame, names: Seq[String]) = {
    val present = names.filter(df.columns.contains)
    require(present.nonEmpty, s"none of ${names.mkString("/")} present")
    coalesce(present.map(col): _*)
  }

  /** Normalize a raw tick frame to (token STRING, ltp DOUBLE, event_ts
    * TIMESTAMP, seq LONG). `event_ts` accepts either an epoch-seconds
    * numeric or a timestamp/ISO-string column.
    */
  def normalize(raw: DataFrame, seqCol: String = "seq"): DataFrame = {
    val token = alias1(raw, Seq("tk", "instrument_token", "token")).cast("string")
    val ltp = alias1(raw, Seq("ltp", "last_traded_price")).cast("double")
    val tsName = Seq("exchange_timestamp", "ft", "feed_time", "event_ts")
      .find(raw.columns.contains)
      .getOrElse(throw new IllegalArgumentException("no timestamp column"))
    val ts = raw.schema(tsName).dataType.typeName match {
      case "long" | "integer" | "double" | "float" =>
        to_timestamp(from_unixtime(col(tsName)))
      case _ => to_timestamp(col(tsName))
    }
    raw.select(
        token.as("token"), ltp.as("ltp"), ts.as("event_ts"),
        col(seqCol).cast("long").as("seq"))
      .where(col("ltp").isNotNull && col("token").isNotNull && col("token") =!= "" &&
        col("event_ts").isNotNull)
  }

  /** Resolve token → (symbol, segment) against the instrument dimension;
    * unknown tokens drop out (inner-join semantics, ws_client.py:177-179).
    * The dimension is broadcast — never a shuffle of the tick stream.
    */
  def resolve(ticks: DataFrame, instruments: Dataset[Instrument]): DataFrame =
    ticks.join(broadcast(instruments.toDF()), Seq("token"))
      .select(col("symbol"), col("segment"), col("ltp"), col("event_ts"), col("seq"))

  /** Full ingest: normalize + resolve + observability counters.
    * `df.observe("ingest", ...)` surfaces accepted row counts the way the
    * reference keeps malformed/unknown counters (tick_buffer.py:112-115).
    */
  def ingest(raw: DataFrame, instruments: Dataset[Instrument]): DataFrame =
    resolve(normalize(raw), instruments)
      .observe("ingest", count(lit(1)).as("accepted_rows"))
}
