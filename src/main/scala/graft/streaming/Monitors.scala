package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.atomic.AtomicLong

/** Operational monitors for the streaming pipeline, mirroring the
  * reference's ops surface on Spark's listener bus:
  *
  *   - heartbeat: no progress for `silenceTimeoutMs` → stalled
  *     (ws_client.py:228-244, 30 s tick-silence reconnect trigger)
  *   - late-data observability: cumulative rows dropped by watermark
  *     (tick_buffer.py:114-126 counted drops, surfaced per snapshot)
  *   - query termination → alert callback (reconnect ladder entry point,
  *     reconnect_manager.py)
  *
  * The listener is a thin shell over [[HeartbeatMonitor]], which takes an
  * injectable clock so the stall logic is unit-testable without a real
  * streaming query.
  */
object Monitors {

  final class HeartbeatMonitor(silenceTimeoutMs: Long, clock: () => Long = () => System.currentTimeMillis()) {
    private val lastProgressAt = new AtomicLong(clock())
    private val droppedByWatermark = new AtomicLong(0L)
    private val lastBatchId = new AtomicLong(-1L)

    /** `droppedRowsInBatch` is the PER-BATCH numRowsDroppedByWatermark;
      * progress events can repeat for an idle batch, so only a strictly
      * newer batchId accumulates.
      */
    def recordProgress(batchId: Long, droppedRowsInBatch: Long): Unit = {
      lastProgressAt.set(clock())
      if (batchId > lastBatchId.get()) {
        lastBatchId.set(batchId)
        droppedByWatermark.addAndGet(droppedRowsInBatch)
      }
    }

    /** True when no micro-batch progressed within the silence timeout —
      * the reference's "no tick for 30 s → reconnect" condition.
      */
    def isStalled: Boolean = clock() - lastProgressAt.get() > silenceTimeoutMs
    def silenceMs: Long = clock() - lastProgressAt.get()
    def totalDroppedByWatermark: Long = droppedByWatermark.get()
    def latestBatchId: Long = lastBatchId.get()
  }

  /** The reconnect alert ladder as listener-driveable state: consecutive
    * failures escalate WARNING → CRITICAL → CRITICAL(exhausted) per
    * [[graft.recover.RetryPolicy.alertFor]], and the first progress after
    * any failure (or a heartbeat stall) emits the INFO recovery row —
    * every row dispatched through the dual-channel [[Alerts.AlertManager]]
    * so a dead system_log sink can never take down the stream it monitors.
    * Factored out of the listener so the ladder is unit-testable (Spark's
    * listener events have private constructors).
    */
  private[graft] final class AlertLadder(
      alerts: Alerts.AlertManager,
      cfg: graft.recover.RetryPolicy.Config = graft.recover.RetryPolicy.Config()) {
    private val failures = new AtomicLong(0L)

    def onFailure(window: String, details: String): Unit = {
      val n = failures.incrementAndGet().toInt
      val level = Alerts.levelOf(graft.recover.RetryPolicy.alertFor(cfg, n))
      alerts.dispatch(level, "query_terminated", window, details)
    }

    def onProgress(window: String, wasStalled: Boolean): Unit =
      if (failures.getAndSet(0L) > 0 || wasStalled)
        alerts.dispatch("INFO", "recovered", window, "progress resumed")

    def consecutiveFailures: Long = failures.get()
  }

  /** Attachable listener: spark.streams.addListener(Monitors.listener(hb, onTerm)).
    * With an [[Alerts.AlertManager]], termination/recovery events also land
    * as system_log rows via the alert ladder.
    */
  def listener(hb: HeartbeatMonitor,
               onTerminated: Option[String] => Unit = _ => (),
               alerts: Option[Alerts.AlertManager] = None): StreamingQueryListener =
    new StreamingQueryListener {
      private val ladder = alerts.map(new AlertLadder(_))
      override def onQueryStarted(event: QueryStartedEvent): Unit = ()
      override def onQueryProgress(event: QueryProgressEvent): Unit = {
        val wasStalled = hb.isStalled
        val dropped = event.progress.stateOperators
          .map(op => op.numRowsDroppedByWatermark).sum
        hb.recordProgress(event.progress.batchId, dropped)
        ladder.foreach(_.onProgress(event.progress.batchId.toString, wasStalled))
        // micro-batch cadence for a buffered system_log channel: one sink
        // append per progress event, however many alerts fired inside it
        alerts.foreach(_.flush())
      }
      override def onQueryTerminated(event: QueryTerminatedEvent): Unit = {
        event.exception.foreach(err =>
          ladder.foreach(_.onFailure("-", err.take(500))))
        alerts.foreach(_.flush())
        onTerminated(event.exception)
      }
    }
}
