package graft.stat

import java.util.concurrent.ConcurrentHashMap

import graft.util.EstimatedHistogram

/** Per-operation latency registry — the fork's ops-stats surface
  * (`stat/src/odkl/cassandra/stat/StoreLatencyTrackerAspect.java`:
  * AspectJ around-advice folding every store operation's wall time into
  * a per-operation EstimatedHistogram, exported through the
  * `stat/create.sql` tables) re-expressed as a driver-side instrument.
  * A lazy engine only HAS a latency at its actions, so `timed(op)(f)`
  * brackets an action; microsecond samples fold into one lock-free
  * [[EstimatedHistogram]] per operation name (any thread may record
  * while another snapshots — the aspect's concurrency contract), and
  * [[report]] reads count/p50/p95/p99/mean/max per op. Wiring: every
  * Bench leg run records under its leg name (the sidecar's `latency`
  * block), and the lens's paged range coordinator records each page
  * materialization — the per-page driver-side step that IS the
  * reference coordinator's per-call latency.
  */
object StoreLatency {

  final case class OpStats(count: Long, p50Micros: Long, p95Micros: Long,
      p99Micros: Long, meanMicros: Long, maxMicros: Long)

  private val hists = new ConcurrentHashMap[String, EstimatedHistogram]()
  // exact max kept beside the histogram: the bucket table resolves ~20%
  // and saturates past ~33M µs, a worst-case that SHOULD read exact
  private val maxes = new ConcurrentHashMap[String, java.lang.Long]()

  def record(op: String, micros: Long): Unit = {
    hists.computeIfAbsent(op, _ => new EstimatedHistogram).add(micros)
    maxes.merge(op, Long.box(micros),
      (a, b) => if (a.longValue >= b.longValue) a else b)
    ()
  }

  def timed[A](op: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f
    finally record(op, (System.nanoTime() - t0) / 1000L)
  }

  /** Snapshot of every operation's stats, op-name-sorted. Percentiles and
    * mean are bucket-resolution (±~20%), max is exact.
    */
  def report(): Seq[(String, OpStats)] = {
    import scala.jdk.CollectionConverters._
    hists.asScala.toSeq.sortBy(_._1).map { case (op, h) =>
      op -> OpStats(h.count, h.percentile(0.50), h.percentile(0.95),
        h.percentile(0.99), h.mean,
        Option(maxes.get(op)).map(_.longValue).getOrElse(0L))
    }
  }

  /** Drop all recorded operations (test isolation). */
  def clear(): Unit = {
    hists.clear()
    maxes.clear()
  }
}
