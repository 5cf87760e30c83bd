package graft.http

/** Retry back-off schedule for lookup requests.
  *
  * Re-expresses the reference's retry strategies (flink-connector-http
  * `retry/RetryStrategyType.java`, `retry/RetryConfigProvider.java`,
  * `retry/HttpClientWithRetry.java`): `fixed-delay` (default, 1s) and
  * `exponential-delay` (initial 1s, max 1m, multiplier 1.5), driven by
  * `lookup.max-retries` (default 3; 0 disables). Retries trigger on
  * IOException or a retryable status code; delays are per-attempt.
  */
sealed trait RetryPolicy extends Serializable {
  def maxRetries: Int

  /** Delay in millis before retry attempt `attempt` (1-based). */
  def delayMillis(attempt: Int): Long
}

final case class FixedDelayRetry(maxRetries: Int, delayMs: Long)
    extends RetryPolicy {
  def delayMillis(attempt: Int): Long = delayMs
}

final case class ExponentialDelayRetry(
    maxRetries: Int,
    initialBackoffMs: Long,
    maxBackoffMs: Long,
    multiplier: Double)
    extends RetryPolicy {
  def delayMillis(attempt: Int): Long = {
    val d = initialBackoffMs * math.pow(multiplier, (attempt - 1).max(0))
    math.min(d.toLong, maxBackoffMs)
  }
}

object RetryPolicy {
  val FixedDelayName = "fixed-delay"
  val ExponentialDelayName = "exponential-delay"

  def fromOptions(o: HttpOptions): RetryPolicy = {
    val maxRetries = o.int(HttpOptions.MaxRetries, 3)
    o.str(HttpOptions.RetryStrategyType, FixedDelayName) match {
      case FixedDelayName =>
        FixedDelayRetry(
          maxRetries,
          o.durationMs(HttpOptions.RetryFixedDelay, 1000L))
      case ExponentialDelayName =>
        ExponentialDelayRetry(
          maxRetries,
          o.durationMs(HttpOptions.RetryExpInitialBackoff, 1000L),
          o.durationMs(HttpOptions.RetryExpMaxBackoff, 60000L),
          o.double(HttpOptions.RetryExpMultiplier, 1.5))
      case other =>
        throw new HttpConfigException(s"Unknown retry strategy type: '$other'")
    }
  }
}
