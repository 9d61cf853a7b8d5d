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

  final class AlertManager(console: String => Unit,
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
  }

  /** Production wiring: stderr console + `system_log` parquet append
    * ([[IdempotentSink.logEvent]], itself failure-swallowing).
    */
  def manager(spark: SparkSession, systemLogDir: String): AlertManager =
    new AlertManager(
      m => System.err.println(m),
      (lvl, ev, win, det) => IdempotentSink.logEvent(spark, systemLogDir, lvl, ev, win, det))

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
