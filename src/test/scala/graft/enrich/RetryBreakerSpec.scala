package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

class RetryBreakerSpec extends AnyFunSuite {

  // ---------------- RetryPolicy (E3: 3 attempts, 5 s, ×2, 60 s cap) ----

  test("retry schedule matches the reference: 5s, 10s, capped at 60s") {
    val p = RetryPolicy()
    assert(p.delayFor(1) == 5000L)
    assert(p.delayFor(2) == 10000L)
    assert(p.delayFor(3) == 20000L)
    assert(p.delayFor(10) == 60000L) // cap
  }

  test("retry returns success with attempt count; sleeps between attempts") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val p = RetryPolicy(maxAttempts = 3, initialDelayMs = 7,
      sleeper = sleeps.append(_))
    var calls = 0
    val r = p.run { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException(s"boom $calls")
      "ok"
    }
    assert(r == Right(("ok", 3)))
    assert(sleeps.toList == List(7L, 14L))
  }

  test("retry exhausts and reports the last error") {
    val p = RetryPolicy(maxAttempts = 3, sleeper = _ => ())
    var calls = 0
    val r = p.run { () => calls += 1; throw new RuntimeException(s"err $calls") }
    assert(r == Left(("err 3", 3)))
    assert(calls == 3)
  }

  // -------- CircuitBreaker (X2: 50% ratio, 60 s open, 3-success close) --

  private class FakeClock(var now: Long = 0L) { def apply(): Long = now }

  private def failing(b: CircuitBreaker): Option[String] =
    try { b.call(() => throw new RuntimeException("svc down")); None }
    catch { case e: RuntimeException => Some(e.getMessage) }

  test("breaker opens at 50% failures over the rolling window, fails fast, half-opens after delay, closes after 3 successes") {
    val clock = new FakeClock
    val b = new CircuitBreaker(
      BreakerConfig(failureRatio = 0.5, requestVolumeThreshold = 4,
        openDelayMs = 60000L, successThreshold = 3),
      () => clock.now)

    // 2 ok + 2 fail = 50% over window of 4 -> opens.
    b.call(() => "ok"); b.call(() => "ok")
    assert(failing(b).contains("svc down"))
    assert(failing(b).contains("svc down"))
    assert(b.state == b.Open)

    // Open: fails fast with the F2-routable marker, service not called.
    var called = false
    val msg = try { b.call(() => { called = true; "ok" }); "?" }
              catch { case e: RuntimeException => e.getMessage }
    assert(msg.contains("circuit breaker"))
    assert(!called)

    // After the open delay: half-open, 3 successes close it.
    clock.now += 60001L
    assert(b.state == b.HalfOpen)
    b.call(() => "ok"); b.call(() => "ok")
    assert(b.state == b.HalfOpen)
    b.call(() => "ok")
    assert(b.state == b.Closed)
  }

  test("a failure in half-open re-opens the breaker") {
    val clock = new FakeClock
    val b = new CircuitBreaker(
      BreakerConfig(failureRatio = 0.5, requestVolumeThreshold = 2,
        openDelayMs = 1000L, successThreshold = 3),
      () => clock.now)
    failing(b); failing(b)
    assert(b.state == b.Open)
    clock.now += 1001L
    assert(b.state == b.HalfOpen)
    failing(b)
    assert(b.state == b.Open)
    // and the open delay restarts from the half-open failure
    clock.now += 999L
    assert(b.state == b.Open)
    clock.now += 2L
    assert(b.state == b.HalfOpen)
  }

  test("open breaker aborts the retry schedule immediately (no sleeps, no calls)") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val p = RetryPolicy(maxAttempts = 3, sleeper = sleeps.append(_))
    val b = new CircuitBreaker(
      BreakerConfig(failureRatio = 0.5, requestVolumeThreshold = 2),
      () => 0L)
    failing(b); failing(b)
    assert(b.state == b.Open)
    var calls = 0
    val r = p.run(() => b.call { () => calls += 1; "ok" })
    assert(r == Left(("circuit breaker open: failing fast", 1)))
    // fail-fast means fast: the service was never called and the retry
    // schedule never slept through an open breaker
    assert(calls == 0 && sleeps.isEmpty)
  }

  test("below the request-volume threshold the breaker never opens") {
    val b = new CircuitBreaker(
      BreakerConfig(failureRatio = 0.5, requestVolumeThreshold = 10),
      () => 0L)
    (1 to 9).foreach(_ => failing(b))
    assert(b.state == b.Closed)
  }
}
