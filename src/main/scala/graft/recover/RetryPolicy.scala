package graft.recover

/** Reconnect/backoff policy with alert escalation — the connector-side state
  * machine of the reference, reproduced as pure functions so the driver loop
  * (or a StreamingQueryListener.onQueryTerminated handler) can apply it.
  *
  * Reference: /root/reference/modules/websocket/reconnect_manager.py:15-105
  * with parameters at /root/reference/config/settings.py:79-84 — base 2 s,
  * factor ×2, cap 120 s, 10 attempts, ±25% deterministic jitter, WARNING per
  * attempt, CRITICAL at attempt 3, INFO on recovery, CRITICAL on exhaustion.
  */
object RetryPolicy {

  final case class Config(
      baseDelayMs: Long = 2000L,
      factor: Double = 2.0,
      maxDelayMs: Long = 120000L,
      maxAttempts: Int = 10,
      jitterFrac: Double = 0.25,
      criticalAt: Int = 3)

  sealed trait Alert
  case object Warning extends Alert
  case object Critical extends Alert
  case object Recovered extends Alert
  case object Exhausted extends Alert

  /** Deterministic jitter in [-jitterFrac, +jitterFrac], derived from the
    * attempt number — reproducible without RNG state.
    */
  private def jitter(cfg: Config, attempt: Int): Double = {
    val h = scala.util.hashing.MurmurHash3.stringHash(s"retry-$attempt")
    val unit = (h & 0x7fffffff).toDouble / Int.MaxValue // [0,1)
    (unit * 2 - 1) * cfg.jitterFrac
  }

  /** Backoff delay before the given (1-based) attempt:
    * min(base·factor^(n−1), cap) ± jitter.
    */
  def delayMs(cfg: Config, attempt: Int): Long = {
    require(attempt >= 1)
    val raw = cfg.baseDelayMs * math.pow(cfg.factor, (attempt - 1).toDouble)
    val capped = math.min(raw, cfg.maxDelayMs.toDouble)
    math.max(0L, (capped * (1.0 + jitter(cfg, attempt))).toLong)
  }

  /** Alert level for a failed attempt (reconnect_manager.py:63-88). */
  def alertFor(cfg: Config, attempt: Int): Alert =
    if (attempt >= cfg.maxAttempts) Exhausted
    else if (attempt >= cfg.criticalAt) Critical
    else Warning

  def canRetry(cfg: Config, attempt: Int): Boolean = attempt < cfg.maxAttempts
}
