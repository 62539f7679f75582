package graft

import java.util.concurrent.atomic.AtomicInteger

/** Long-running-process watchdog (reference: lib/heartbeats.go:9-84,
  * wrapped around every warehouse merge in clients/shared/merge.go:34-40
  * with a 30 min initial delay / 2 min interval): after `initialDelay`,
  * logs a "still running" line every `interval` until stopped — the
  * operational breadcrumb that separates a deadlocked flush from a slow
  * one. If the wrapped work finishes before the initial delay elapses,
  * nothing is ever logged (the reference's noise guard).
  *
  * Spark-side shape: one daemon thread per started heartbeat (the
  * reference uses a goroutine); `start()` returns the stop function the
  * caller defers, mirroring `Start() func()`. `onTick` is the test seam
  * (the reference's `test`/`ticks` fields) and doubles as a metrics
  * hook.
  */
final class Heartbeats(initialDelayMs: Long, intervalMs: Long,
                       metric: String, tags: Map[String, String],
                       onTick: () => Unit = () => ()) {
  require(initialDelayMs >= 0 && intervalMs > 0,
    s"need initialDelayMs >= 0 and intervalMs > 0, got $initialDelayMs/$intervalMs")

  private val ticks = new AtomicInteger(0)

  /** Ticks observed so far (test/metrics visibility). */
  def tickCount: Int = ticks.get()

  /** Start the watchdog; invoke the returned function to stop it. Safe
    * to call the stop function more than once.
    */
  def start(): () => Unit = {
    val startNanos = System.nanoTime()
    val done = new java.util.concurrent.CountDownLatch(1)
    val t = new Thread(() => {
      // initial delay first — a process that finishes before it stays
      // silent
      if (!done.await(initialDelayMs, java.util.concurrent.TimeUnit.MILLISECONDS)) {
        var running = true
        while (running) {
          if (done.await(intervalMs, java.util.concurrent.TimeUnit.MILLISECONDS))
            running = false
          else {
            ticks.incrementAndGet()
            onTick()
            val elapsedS = (System.nanoTime() - startNanos) / 1e9
            System.err.println(
              f"[heartbeats] process is still running metric=$metric " +
                f"tags=${tags.map { case (k, v) => s"$k=$v" }.mkString(",")} " +
                f"duration=$elapsedS%.0fs")
          }
        }
      }
    }, s"graft-heartbeats-$metric")
    t.setDaemon(true)
    t.start()
    () => done.countDown()
  }
}

object Heartbeats {
  /** The reference's merge-wrapper defaults (merge.go:24-25). */
  val MergeInitialDelayMs: Long = 30L * 60 * 1000
  val MergeIntervalMs: Long = 2L * 60 * 1000

  /** Wrap `body` in a merge-shaped heartbeat, reference defaults. */
  def monitored[A](metric: String, tags: Map[String, String])(body: => A): A = {
    val stop = new Heartbeats(MergeInitialDelayMs, MergeIntervalMs, metric, tags).start()
    try body finally stop()
  }
}
