package graft

import graft.cdc.Resilience
import graft.cdc.Resilience.NonRetryableError
import org.scalatest.funsuite.AnyFunSuite

/** Failure-handling semantics: backoff schedule, non-retryable
  * short-circuit, credential masking, health ladder. */
class ResilienceSpec extends AnyFunSuite {

  test("retry succeeds after transient failures, backoff doubles") {
    var calls = 0
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val out = Resilience.retry(maxAttempts = 4, delayMs = 100,
      sleep = d => { sleeps += d; () }) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(out === "ok")
    assert(calls === 3)
    assert(sleeps.toSeq === Seq(100L, 200L))
  }

  test("retry exhausts attempts then rethrows the last error") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Resilience.retry(maxAttempts = 3, delayMs = 1, sleep = _ => ()) {
        calls += 1; throw new RuntimeException(s"fail $calls")
      }
    }
    assert(calls === 3)
    assert(e.getMessage === "fail 3")
  }

  test("non-retryable errors short-circuit on the first attempt") {
    var calls = 0
    intercept[NonRetryableError] {
      Resilience.retry(maxAttempts = 5, delayMs = 1, sleep = _ => ()) {
        calls += 1; throw new NonRetryableError("bad config")
      }
    }
    assert(calls === 1)
  }

  test("onRetry callback failures never break the retry loop") {
    var calls = 0
    val out = Resilience.retry(maxAttempts = 2, delayMs = 1, sleep = _ => (),
      onRetry = (_, _) => throw new RuntimeException("metrics down")) {
      calls += 1
      if (calls < 2) throw new RuntimeException("transient")
      42
    }
    assert(out === 42)
  }

  test("sensitive keys are masked, others pass through") {
    val masked = Resilience.maskSensitive(Map(
      "database.password" -> "hunter2",
      "connection.user" -> "cdc",
      "My_API_Key" -> "k123",
      "access_token" -> "t",
      "topic.prefix" -> "pipe"))
    assert(masked("database.password") === "***MASKED***")
    assert(masked("My_API_Key") === "***MASKED***")
    assert(masked("access_token") === "***MASKED***")
    assert(masked("connection.user") === "cdc")
    assert(masked("topic.prefix") === "pipe")
  }

  test("health ladder: unhealthy > degraded > healthy > unknown") {
    import Resilience.overallStatus
    assert(overallStatus(Map("db" -> "healthy", "kafka" -> "unhealthy")) === "unhealthy")
    assert(overallStatus(Map("db" -> "degraded", "kafka" -> "healthy")) === "degraded")
    assert(overallStatus(Map("db" -> "healthy", "kafka" -> "healthy")) === "healthy")
    // known components all healthy → healthy even with unknowns alongside
    assert(overallStatus(Map("db" -> "healthy", "kafka" -> "unknown")) === "healthy")
    // deliberate deviation from the reference: ALL-unknown reports unknown,
    // not healthy (vacuous all() in health.py:221 would claim healthy)
    assert(overallStatus(Map("db" -> "unknown")) === "unknown")
    assert(overallStatus(Map.empty) === "unknown")
  }
}
