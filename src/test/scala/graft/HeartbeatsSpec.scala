package graft

import org.scalatest.funsuite.AnyFunSuite

/** lib/heartbeats.go:9-84 semantics: silent before the initial delay,
  * ticking after it, stopped by the returned function (idempotent).
  */
class HeartbeatsSpec extends AnyFunSuite {
  test("ticks only after the initial delay, then every interval") {
    var seen = 0
    val hb = new Heartbeats(60, 25, "merge", Map("table" -> "t"), () => seen += 1)
    val stop = hb.start()
    try {
      Thread.sleep(30)
      assert(hb.tickCount === 0, "must stay silent during the initial delay")
      Thread.sleep(300)
      assert(hb.tickCount >= 3, s"expected >= 3 ticks after the delay, got ${hb.tickCount}")
      assert(seen === hb.tickCount)
    } finally stop()
  }

  test("a process that finishes before the initial delay never ticks") {
    val hb = new Heartbeats(10000, 10, "merge", Map.empty)
    val stop = hb.start()
    stop() // the wrapped work finished immediately
    Thread.sleep(120)
    assert(hb.tickCount === 0)
    stop() // idempotent
  }

  test("monitored wraps a body and returns its value; exceptions still stop the watchdog") {
    assert(Heartbeats.monitored("merge", Map("table" -> "x")) { 41 + 1 } === 42)
    val boom = intercept[RuntimeException] {
      Heartbeats.monitored("merge", Map.empty) { throw new RuntimeException("boom") }
    }
    assert(boom.getMessage === "boom")
  }
}
