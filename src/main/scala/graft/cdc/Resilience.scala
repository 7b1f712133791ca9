package graft.cdc

import scala.annotation.tailrec

/** Operational resilience primitives — the reference's failure-handling
  * layer re-expressed as pure Scala:
  *   - retry with exponential backoff + non-retryable short-circuit
  *     (reference: backend/ingestion/retry.py:23-88)
  *   - sensitive-field masking for audit logs
  *     (reference: backend/ingestion/audit.py:141-160)
  *   - component-status health ladder
  *     (reference: backend/ingestion/health.py:149-230)
  *
  * These wrap the Spark pipeline surface ([[graft.Pipeline]]): a
  * StreamingQuery restart goes through [[Resilience.retry]], connector
  * property maps pass through [[Resilience.maskSensitive]] before being
  * logged, and [[Resilience.overallStatus]] folds per-component health
  * into the pipeline status the reference dashboards show.
  */
object Resilience {

  /** Marks an error that must NOT be retried (config error, auth failure);
    * the retry loop rethrows it immediately. */
  final class NonRetryableError(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  /** Run `f` up to `maxAttempts` times with exponential backoff.
    * `onRetry(error, attempt)` fires before each sleep (metrics hook);
    * its own failures are swallowed, mirroring the reference. */
  def retry[A](
      maxAttempts: Int = 3,
      delayMs: Long = 1000L,
      backoff: Double = 2.0,
      onRetry: (Throwable, Int) => Unit = (_, _) => (),
      sleep: Long => Unit = Thread.sleep)(f: => A): A = {
    @tailrec def go(attempt: Int, delay: Long): A = {
      val r =
        try Right(f)
        catch {
          case e: NonRetryableError => throw e
          // interruption is a shutdown signal: restore the flag and stop —
          // sleeping through the backoff schedule would stall shutdown
          case e: InterruptedException => Thread.currentThread().interrupt(); throw e
          // NonFatal only: retrying after OutOfMemoryError/LinkageError
          // re-runs work on a JVM already in a fatal state
          case scala.util.control.NonFatal(e) if attempt < maxAttempts =>
            try onRetry(e, attempt) catch { case _: Throwable => () }
            sleep(delay)
            Left(e)
        }
      r match {
        case Right(a) => a
        case Left(_)  => go(attempt + 1, (delay * backoff).toLong)
      }
    }
    go(1, delayMs)
  }

  private val sensitiveFields = Seq(
    "password", "hashed_password", "token", "access_token",
    "refresh_token", "secret", "api_key")

  /** Mask credential-bearing keys in a config/property map before it is
    * audited or logged. Key matching is substring + case-insensitive,
    * same as the reference. */
  def maskSensitive(config: Map[String, String]): Map[String, String] =
    config.map { case (k, v) =>
      val lower = k.toLowerCase
      if (sensitiveFields.exists(lower.contains)) k -> "***MASKED***"
      else k -> v
    }

  /** Fold per-component statuses into the pipeline's overall status:
    * any unhealthy → unhealthy; else any degraded → degraded; else all
    * known healthy → healthy; else unknown. */
  def overallStatus(components: Map[String, String]): String = {
    val ss = components.values.toSeq
    if (ss.contains("unhealthy")) "unhealthy"
    else if (ss.contains("degraded")) "degraded"
    else {
      val known = ss.filter(_ != "unknown")
      if (known.nonEmpty && known.forall(_ == "healthy")) "healthy"
      else "unknown"
    }
  }
}
