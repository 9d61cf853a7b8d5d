package graft.streaming

import graft.recover.RetryPolicy
import graft.sink.IdempotentSink
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Dual-channel alert dispatch — the reference's AlertManager
  * (modules/alerts/alert_manager.py:37-64): every alert fires on the
  * console channel AND the system_log sink channel, and a failure in
  * either channel is isolated so the other still fires — alerting (and the
  * pipeline behind it) must never die because a log sink is down.
  */
object Alerts {

  class AlertManager(console: String => Unit,
                     sinkLog: (String, String, String, String) => Unit) {
    /** Fire one alert on both channels; channel failures are swallowed
      * independently (alert_manager.py:51-64 wraps each channel's send).
      */
    def dispatch(level: String, event: String, window: String, details: String): Unit = {
      try console(s"[$level] $event window=$window $details")
      catch { case NonFatal(_) => () }
      try sinkLog(level, event, window, details)
      catch { case NonFatal(_) => () }
    }

    /** Deliver anything a buffered channel has accumulated; no-op for the
      * direct manager. [[graft.streaming.Monitors.listener]] calls this
      * once per progress/termination event — the micro-batch cadence.
      */
    def flush(): Unit = ()
  }

  /** Production wiring: stderr console + `system_log` parquet append
    * ([[IdempotentSink.logEvent]], itself failure-swallowing). One sink
    * file per alert — fine at human alert volume; chatty deployments
    * should use [[buffered]].
    */
  def manager(spark: SparkSession, systemLogDir: String): AlertManager =
    new AlertManager(
      m => System.err.println(m),
      (lvl, ev, win, det) => IdempotentSink.logEvent(spark, systemLogDir, lvl, ev, win, det))

  /** Micro-batch-buffered system_log channel: alerts collect driver-side
    * (stamped at dispatch time) and land as ONE parquet append per
    * [[AlertManager.flush]], followed by a size-triggered compaction sweep
    * ([[IdempotentSink.compactLog]]) that keeps the log's file count
    * bounded under a chatty listener. The console channel stays immediate
    * — only the sink channel buffers. Alert volume is human-scale
    * (reconnect ladders, heartbeats), so the buffer is trivially bounded.
    */
  def buffered(spark: SparkSession, systemLogDir: String,
               compactAfterFiles: Int = 64): AlertManager = {
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, String, String)]
    new AlertManager(
      m => System.err.println(m),
      (lvl, ev, win, det) => buf.synchronized {
        buf += ((java.time.Instant.now.toString, lvl, ev, win, det)); ()
      }) {
      override def flush(): Unit = {
        val rows = buf.synchronized { val r = buf.toList; buf.clear(); r }
        IdempotentSink.logEvents(spark, systemLogDir, rows)
        IdempotentSink.compactLog(spark, systemLogDir, compactAfterFiles)
      }
    }
  }

  /** system_log level for a reconnect-ladder alert (reconnect_manager.py:
    * 63-88: WARNING per attempt, CRITICAL from attempt 3 and on
    * exhaustion, INFO on recovery).
    */
  def levelOf(a: RetryPolicy.Alert): String = a match {
    case RetryPolicy.Warning => "WARNING"
    case RetryPolicy.Critical | RetryPolicy.Exhausted => "CRITICAL"
    case RetryPolicy.Recovered => "INFO"
  }
}
