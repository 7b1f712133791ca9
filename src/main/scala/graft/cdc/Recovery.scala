package graft.cdc

import org.apache.spark.sql.streaming.StreamingQuery

/** Pipeline auto-recovery policy — the reference's RecoveryManager
  * (backend/ingestion/recovery.py:27-116 recover_failed_pipeline /
  * auto_recover_all_failed) re-expressed over Structured Streaming.
  *
  * The reference restarts a failed pipeline through the connector
  * manager with capped attempts and a settle delay; here the restart is
  * "build and start the query again against the same checkpoint" — the
  * checkpoint IS the preserved state, so a recovered query resumes from
  * the exact offset the failure interrupted, and the idempotent
  * per-batch upsert makes the replayed micro-batch harmless
  * ([[graft.Pipeline]]). On each failure the supervisor stops the dying
  * query (the reference's stop-before-restart), waits `delayMs`
  * (exponential backoff, [[Resilience.retry]]'s schedule), rebuilds, and
  * re-runs; after `maxRestarts` consecutive failures it gives up cleanly
  * with the attempt log instead of flapping forever.
  *
  * A [[Resilience.NonRetryableError]] thrown by the query body (config
  * error, auth failure) short-circuits straight to gave-up, same as the
  * retry primitive.
  */
object Recovery {

  /** One recovery attempt: which restart, what killed the previous run. */
  final case class Attempt(attempt: Int, error: String)

  /** Outcome of a supervised run: `recovered` = the final run completed
    * without failing (for a continuous query: terminated cleanly).
    * `attempts` lists every failed run, INCLUDING a terminal
    * non-retryable one (empty = first run succeeded); `finalError` is
    * set when the policy gave up. `restarts` counts actual restarts
    * performed: on every gave-up path (cap exhausted or non-retryable)
    * the LAST failure did not trigger one, so it is failures − 1 there. */
  final case class Outcome(
      recovered: Boolean,
      attempts: Seq[Attempt],
      finalError: Option[String]) {
    def failures: Int = attempts.length
    def restarts: Int = if (recovered) attempts.length else math.max(0, attempts.length - 1)
  }

  /** Run a streaming query under the restart policy.
    *
    * @param mkQuery  builds AND starts the query (same checkpoint each
    *                 time — that is what makes restart = recovery)
    * @param run      drives the started query to completion; throwing =
    *                 the pipeline failed. Production: `_.awaitTermination()`.
    *                 Tests: `q => { q.processAllAvailable(); q.stop() }`.
    * @param maxRestarts cap on restart attempts AFTER the initial run
    *                 (reference max_retries = 3)
    * @param delayMs  settle delay before each restart (reference
    *                 retry_delay_seconds, here with exponential backoff)
    * @param sleep    injectable for tests
    * @param onRestart metrics hook, called before each restart sleep;
    *                 its own failures are swallowed
    */
  def supervise(
      mkQuery: () => StreamingQuery,
      run: StreamingQuery => Unit = _.awaitTermination(),
      maxRestarts: Int = 3,
      delayMs: Long = 60000L,
      backoff: Double = 2.0,
      sleep: Long => Unit = Thread.sleep,
      onRestart: (Throwable, Int) => Unit = (_, _) => ()): Outcome = {
    val attempts = scala.collection.mutable.ArrayBuffer.empty[Attempt]
    var delay = delayMs
    var attempt = 0
    while (true) {
      val failure =
        try {
          val q = mkQuery()
          try { run(q); None }
          finally {
            // stop-before-restart, and no leak on success paths that
            // didn't stop — but stop() itself can throw (stopTimeout):
            // swallowed, or it would mask run()'s real failure in this
            // finally, or convert a completed run into a counted one
            if (q.isActive) {
              try q.stop()
              catch { case scala.util.control.NonFatal(_) => () }
            }
          }
        } catch {
          case e: Resilience.NonRetryableError =>
            // recorded like any other failed run (so failures/restarts
            // stay exact), but never retried
            attempts += Attempt(attempt + 1, s"non-retryable: ${e.getMessage}")
            return Outcome(recovered = false, attempts.toSeq,
              Some(s"non-retryable: ${e.getMessage}"))
          case e: InterruptedException => Thread.currentThread().interrupt(); throw e
          case scala.util.control.NonFatal(e) => Some(e)
        }
      failure match {
        case None => return Outcome(recovered = true, attempts.toSeq, None)
        case Some(e) =>
          attempt += 1
          attempts += Attempt(attempt, rootMessage(e))
          if (attempt > maxRestarts)
            return Outcome(recovered = false, attempts.toSeq, Some(rootMessage(e)))
          try onRestart(e, attempt) catch { case _: Throwable => () }
          sleep(delay)
          delay = (delay * backoff).toLong
      }
    }
    sys.error("unreachable")
  }

  /** StreamingQueryException wraps the user-code error; report the root
    * cause a human can act on, not the wrapper chain. */
  private def rootMessage(e: Throwable): String = {
    var cur = e
    while (cur.getCause != null && cur.getCause != cur) cur = cur.getCause
    Option(cur.getMessage).getOrElse(cur.getClass.getSimpleName)
  }

  /** Summary of a sweep over failed pipelines (auto_recover_all_failed):
    * per-pipeline outcomes plus the counters the reference returns. */
  final case class SweepResult(
      totalFailed: Int,
      recovered: Int,
      failed: Int,
      details: Map[String, Outcome])

  /** One background-monitor sweep (reference background_monitor.py
    * _check_all_pipelines + cdc_health_monitor.monitor_all_pipelines):
    * classify every registered pipeline from its LIVE query handle —
    * active → healthy, terminated with an exception → unhealthy — and
    * put each unhealthy one back through the restart policy. Healthy
    * pipelines are never touched; the summary carries the same counters
    * the reference logs (checked / healthy / unhealthy / recovered). */
  final case class MonitorSweep(
      checked: Int,
      healthy: Int,
      /** terminated WITHOUT an exception — deliberately taken down;
        * never restarted by a sweep */
      stopped: Int,
      unhealthy: Int,
      recovered: Int,
      outcomes: Map[String, Outcome])

  def checkAndRecover(
      running: Map[String, StreamingQuery],
      rebuild: Map[String, () => StreamingQuery],
      run: StreamingQuery => Unit = _.awaitTermination(),
      maxRestarts: Int = 3,
      delayMs: Long = 60000L,
      sleep: Long => Unit = Thread.sleep): MonitorSweep = {
    val active = running.filter { case (_, q) => q.isActive }
    val terminated = running.filter { case (_, q) => !q.isActive }
    // a pipeline an operator stopped cleanly (no exception) is NOT
    // unhealthy — restarting it would resume something deliberately
    // taken down; only exception-terminated queries enter recovery
    val (dead, stopped) = terminated.partition { case (_, q) => q.exception.isDefined }
    val outcomes = dead.map { case (name, _) =>
      rebuild.get(name) match {
        case Some(mk) => name -> supervise(mk, run, maxRestarts, delayMs, sleep = sleep)
        case None =>
          // registry drift must be VISIBLE: the pipeline that most needs
          // attention can't silently vanish from the report
          name -> Outcome(recovered = false, Nil,
            Some("no rebuild registered for this pipeline"))
      }
    }
    MonitorSweep(
      checked = running.size,
      healthy = active.size,
      stopped = stopped.size,
      unhealthy = dead.size,
      recovered = outcomes.count(_._2.recovered),
      outcomes = outcomes)
  }

  /** Recover every failed pipeline: `failedPipelines` maps pipeline name
    * to its (rebuild, drive) pair; each is supervised independently, and
    * one pipeline exhausting its restarts does not stop the sweep. */
  def recoverAll(
      failedPipelines: Map[String, () => StreamingQuery],
      run: StreamingQuery => Unit = _.awaitTermination(),
      maxRestarts: Int = 3,
      delayMs: Long = 60000L,
      sleep: Long => Unit = Thread.sleep): SweepResult = {
    val details = failedPipelines.map { case (name, mk) =>
      name -> supervise(mk, run, maxRestarts, delayMs, sleep = sleep)
    }
    SweepResult(
      totalFailed = failedPipelines.size,
      recovered = details.count(_._2.recovered),
      failed = details.count(!_._2.recovered),
      details = details)
  }
}
