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

  /** Attachable listener: spark.streams.addListener(Monitors.listener(hb, onTerm)). */
  def listener(hb: HeartbeatMonitor,
               onTerminated: Option[String] => Unit = _ => ()): StreamingQueryListener =
    new StreamingQueryListener {
      override def onQueryStarted(event: QueryStartedEvent): Unit = ()
      override def onQueryProgress(event: QueryProgressEvent): Unit = {
        val dropped = event.progress.stateOperators
          .map(op => op.numRowsDroppedByWatermark).sum
        hb.recordProgress(event.progress.batchId, dropped)
      }
      override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
        onTerminated(event.exception)
    }
}
