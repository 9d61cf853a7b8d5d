package graft.ingest

import scala.util.control.NonFatal

/** Throttle-aware subscribe batching — the reference's connector-side
  * subscription protocol (modules/websocket/ws_client.py:96-121): the
  * instrument universe subscribes in fixed-size batches with a spacing
  * delay between them so the feed never throttles the burst, and one
  * failed batch logs-and-continues (the remaining universe still
  * subscribes; the failed slice is reported for a retry pass).
  *
  * Kept connector-agnostic: [[plan]] is a pure function producing the
  * batch schedule (unit-testable, no sleeping), and [[run]] drives any
  * `subscribe` callback with an injectable clock, so the engine can set
  * up whatever tick source a deployment actually uses (the WS connector
  * itself is out of scope per SURVEY §2.1).
  */
object Subscriptions {

  /** One scheduled batch: items, their start offset in the universe, and
    * the delay to wait BEFORE issuing this batch (0 for the first —
    * ws_client.py sleeps between batches, not before the first).
    */
  final case class Batch[T](startIndex: Int, items: Seq[T], delayMsBefore: Long)

  /** Reference parameters: 50 instruments/batch, 0.5 s spacing
    * (config/settings.py WS_SUBSCRIBE_BATCH_SIZE / ws_client.py:116).
    */
  val DefaultBatchSize = 50
  val DefaultSpacingMs = 500L

  /** Pure batch schedule for a universe. */
  def plan[T](universe: Seq[T], batchSize: Int = DefaultBatchSize,
              spacingMs: Long = DefaultSpacingMs): Seq[Batch[T]] = {
    require(batchSize > 0, "batchSize must be positive")
    universe.grouped(batchSize).zipWithIndex.map { case (items, i) =>
      Batch(i * batchSize, items, if (i == 0) 0L else spacingMs)
    }.toSeq
  }

  /** Drive a subscribe callback over the schedule. A batch failure is
    * isolated (ws_client.py:107-120 logs SUBSCRIBE_FAILED and keeps
    * going); the failed batches come back for a retry pass.
    *
    * @param sleep injectable for tests; production default really sleeps
    * @return batches that failed, in schedule order
    */
  def run[T](schedule: Seq[Batch[T]])(subscribe: Seq[T] => Unit,
             sleep: Long => Unit = Thread.sleep(_)): Seq[Batch[T]] =
    schedule.flatMap { b =>
      if (b.delayMsBefore > 0) sleep(b.delayMsBefore)
      try { subscribe(b.items); None }
      catch { case NonFatal(_) => Some(b) }
    }
}
