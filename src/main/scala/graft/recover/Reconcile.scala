package graft.recover

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Startup state reconciliation: decide, before (re)starting the stream,
  * whether ATR state comes from the local checkpoint, the sink's `atr_state`
  * snapshot, or a fresh start — and audit divergence between the two.
  *
  * Reference: /root/reference/modules/recovery/checkpoint_manager.py:184-260
  * (the 4-case matrix) and :274-298 (divergence audit, |Δatr| > 1e-4).
  * In Spark, offsets/state normally recover via checkpointLocation; this job
  * reproduces the reference's extra cross-validation against the sink, which
  * Structured Streaming does NOT give for free (SURVEY.md §3.3).
  */
object Reconcile {

  sealed trait Source
  case object Fresh extends Source
  case object FromLocal extends Source
  case object FromSink extends Source

  /** One reconciliation snapshot: the latest finalized window plus per-symbol
    * state (symbol, last_close, last_atr).
    */
  final case class Snapshot(lastWindow: Option[String], state: DataFrame)

  final case class Decision(source: Source, reason: String, divergences: Long)

  /** Count symbols whose ATR disagrees beyond tolerance between two state
    * frames (checkpoint_manager.py:274-298): inner join + |Δ| filter.
    */
  def divergences(local: DataFrame, sink: DataFrame, tol: Double = 1e-4): Long =
    local.select(col("symbol"), col("last_atr").as("atr_l"))
      .join(sink.select(col("symbol"), col("last_atr").as("atr_s")), Seq("symbol"))
      .where(col("atr_l").isNotNull && col("atr_s").isNotNull &&
        abs(col("atr_l") - col("atr_s")) > tol)
      .count()

  /** Sink read-back (sheets_client.py:154-210 analog): the persisted
    * `atr_state` snapshot plus the max finalized window from the fact table.
    * The max-window scan projects a single column and aggregates — at scale,
    * partition the sink by date so the scan prunes to recent partitions.
    */
  def sinkSnapshot(spark: SparkSession, factDir: String, stateDir: String): Option[Snapshot] =
    try {
      val state = spark.read.parquet(stateDir)
        .select(col("symbol"), col("last_close").cast("double"),
          col("last_atr").cast("double"))
      val maxW = spark.read.parquet(factDir)
        .agg(max(col("timestamp")).cast("string")).head().getString(0)
      Some(Snapshot(Option(maxW), state))
    } catch { case _: AnalysisException => None }

  /** The 4-case matrix (checkpoint_manager.py:201-260):
    *   1. neither present            → Fresh
    *   2. sink only                  → FromSink
    *   3. local only                 → FromLocal
    *   4. both: winner by window recency (ISO window strings compare
    *      lexicographically); equal → consistent → local; audit divergence.
    */
  def decide(local: Option[Snapshot], sink: Option[Snapshot]): Decision =
    (local, sink) match {
      case (None, None) => Decision(Fresh, "no local checkpoint, empty sink", 0L)
      case (None, Some(_)) => Decision(FromSink, "no local checkpoint, sink has state", 0L)
      case (Some(_), None) => Decision(FromLocal, "local checkpoint only, sink empty", 0L)
      case (Some(l), Some(s)) =>
        val d = divergences(l.state, s.state)
        (l.lastWindow, s.lastWindow) match {
          case (Some(lw), Some(sw)) if lw > sw =>
            Decision(FromLocal, s"local ahead ($lw > $sw): sink write was lost mid-flight", d)
          case (Some(lw), Some(sw)) if lw < sw =>
            Decision(FromSink, s"sink ahead ($sw > $lw): local checkpoint stale", d)
          case (Some(_), Some(_)) =>
            Decision(FromLocal, "consistent: windows equal", d)
          // only one side knows its window → the side with evidence wins
          case (None, Some(sw)) =>
            Decision(FromSink, s"local has no window, sink at $sw", d)
          case (Some(lw), None) =>
            Decision(FromLocal, s"sink has no window, local at $lw", d)
          case (None, None) =>
            Decision(FromLocal, "neither side has a window: keep local", d)
        }
    }

  /** Resolved state frame for the chosen source, with a full-outer merge as
    * the safety net when states disagree on symbol coverage: the winner's row
    * when present, the other side's otherwise.
    */
  def resolve(decision: Decision, local: Option[Snapshot], sink: Option[Snapshot]): Option[DataFrame] = {
    def merged(win: DataFrame, lose: DataFrame): DataFrame = {
      val w = win.select(col("symbol"), col("last_close").as("c_w"), col("last_atr").as("a_w"))
      val l = lose.select(col("symbol"), col("last_close").as("c_l"), col("last_atr").as("a_l"))
      w.join(l, Seq("symbol"), "full_outer")
        .select(col("symbol"),
          coalesce(col("c_w"), col("c_l")).as("last_close"),
          coalesce(col("a_w"), col("a_l")).as("last_atr"))
    }
    decision.source match {
      case Fresh => None
      case FromLocal => local.map(l => sink.map(s => merged(l.state, s.state)).getOrElse(l.state))
      case FromSink => sink.map(s => local.map(l => merged(s.state, l.state)).getOrElse(s.state))
    }
  }
}
