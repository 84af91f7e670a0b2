package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Cumulative shuffle/spill accounting via the scheduler's task-end
  * metrics. Wall time tells you a regression HAPPENED; bytes moved tell
  * you it will survive a faster machine — a change that doubles a shuffle
  * is a 100 TB regression even when the VM absorbs it at bench scale, so
  * Bench records per-query deltas of these counters alongside seconds and
  * PlanShapeSpec pins ceilings for the most expensive queries.
  *
  * Listener events post asynchronously on the bus, so a delta taken the
  * instant an action returns can miss trailing task-end events;
  * [[stable]] polls until the counters stop moving (bounded) before
  * snapshotting.
  */
object ShuffleMeter {
  final case class Snap(write: Long, read: Long, spill: Long) {
    def -(o: Snap): Snap = Snap(write - o.write, read - o.read, spill - o.spill)
  }
}

final class ShuffleMeter extends SparkListener {
  import ShuffleMeter.Snap

  private val w = new java.util.concurrent.atomic.AtomicLong
  private val r = new java.util.concurrent.atomic.AtomicLong
  private val sp = new java.util.concurrent.atomic.AtomicLong

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      w.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      r.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      sp.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled): Unit
    }
  }

  private def snap: Snap = Snap(w.get, r.get, sp.get)

  /** Snapshot after the listener bus has drained: poll until two reads
    * `quietMs` apart agree (bounded by `timeoutMs`). If the deadline
    * expires while counters are still moving (a straggler finishing during
    * the poll), the snapshot may attribute trailing bytes to the next
    * window — log it so a reader of the bench artifact can tell
    * (round-6 ADVICE; timing-only telemetry, never correctness). */
  def stable(quietMs: Long = 50, timeoutMs: Long = 2000): Snap = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var prev = snap
    var cur = { Thread.sleep(quietMs); snap }
    while (cur != prev && System.nanoTime() < deadline) {
      prev = cur
      Thread.sleep(quietMs)
      cur = snap
    }
    if (cur != prev)
      System.err.println(
        s"[ShuffleMeter] drain deadline (${timeoutMs} ms) hit with counters " +
          s"still moving; next window may inherit trailing bytes")
    cur
  }
}
