package graft

/** Jittered-retry envelope (ref: lib/retry/retry.go + lib/jitter/sleep.go —
  * the reference wraps flushes and destination publishes in 15 attempts of
  * exponential backoff + full jitter). On Spark, TASK-level faults are
  * already retried by the scheduler; this envelope is for DRIVER-side sink
  * I/O (snapshot fs ops against an object store) and per-row external
  * publishes inside foreachPartition (Redis/SQS-style fan-out), where a
  * transient error would otherwise fail the whole batch. Unlike the
  * reference it is OPT-IN at the sinks (foreachPartitionSink defaults to
  * maxAttempts = 1): callers who enable it should pass an `isRetryable`
  * that recognizes their client's transient errors, because retrying a
  * deterministic failure burns the backoff budget times Spark's own task
  * retries, and a non-idempotent send duplicates per attempt.
  */
object Retries {
  /** sleep = random_between(0, min(maxMs, baseMs * 2^attempt)) — AWS
    * full-jitter backoff, overflow-safe like the reference's
    * safePowerOfTwo (sleep.go:12-43).
    */
  def jitterMs(baseMs: Long, maxMs: Long, attempt: Int, rng: scala.util.Random): Long = {
    if (maxMs <= 0 || baseMs <= 0) return 0L
    val pow = if (attempt < 0) 0L else if (attempt > 62) Long.MaxValue else 1L << attempt
    val upper =
      if (pow != 0 && pow > Long.MaxValue / baseMs) maxMs
      else math.min(maxMs, baseMs * pow)
    if (upper <= 0) 0L else rng.nextLong(upper)
  }

  /** Retry policy. `sleep`/`seed` are injectable so tests run instantly
    * and deterministically; production callers keep the defaults
    * (reference envelope: 15 attempts, jitter capped at 3.5 s).
    */
  final case class RetryConfig(
      baseMs: Long = 100,
      maxMs: Long = 3500,
      maxAttempts: Int = 15,
      isRetryable: Throwable => Boolean = _ => true,
      sleep: Long => Unit = Thread.sleep,
      seed: Option[Long] = None) {
    require(baseMs > 0, "baseMs must be > 0")
    require(maxMs > 0, "maxMs must be > 0")
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
  }

  /** Run `body`, retrying retryable NON-FATAL failures with backoff; the
    * terminal failure (or a non-retryable one) propagates to the caller
    * (retry.go:79-101 WithRetries). Fatal errors and interrupts are NEVER
    * retried — a cancelled Spark task must die on its interrupt, not keep
    * publishing through 14 more jittered sleeps. The RNG is allocated
    * lazily on the first failure, so the happy path (one call per
    * published row on sink hot loops) allocates nothing.
    */
  def withRetries[T](cfg: RetryConfig = RetryConfig())(body: => T): T = {
    var rng: scala.util.Random = null
    var attempt = 0
    while (true) {
      try return body
      catch {
        case scala.util.control.NonFatal(e) =>
          attempt += 1
          if (attempt >= cfg.maxAttempts || !cfg.isRetryable(e)) throw e
          if (rng == null)
            rng = cfg.seed.map(new scala.util.Random(_)).getOrElse(new scala.util.Random())
          cfg.sleep(jitterMs(cfg.baseMs, cfg.maxMs, attempt - 1, rng))
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
