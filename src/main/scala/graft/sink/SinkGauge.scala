package graft.sink

import java.util.concurrent.atomic.AtomicInteger

/** Concurrent-writer gauge for [[JdbcSink.write]] — proves (rather than
  * assumes) the sink's partition fan-out: every in-flight per-partition
  * connection bumps `current`, and `peak` records the high-water mark.
  * Two atomic ops per PARTITION (not per row), so it stays on in
  * production code. Accurate in local mode, where all writer tasks share
  * one JVM (the bench's measurement regime); on a real cluster each
  * executor sees only its own tasks — read it there as a per-executor
  * floor on parallelism, not a global count.
  */
object SinkGauge {
  private val current = new AtomicInteger(0)
  private val peakW = new AtomicInteger(0)

  private[sink] def enter(): Unit = {
    val c = current.incrementAndGet()
    peakW.accumulateAndGet(c, Math.max(_, _))
  }

  private[sink] def exit(): Unit = { current.decrementAndGet(); () }

  def reset(): Unit = { current.set(0); peakW.set(0) }

  /** Max simultaneously-open writer connections since the last reset. */
  def peakWriters: Int = peakW.get()
}
