package graft.util

/** Operation-rate throttle (utils/RateControl.java:1-76 analog): paces a
  * driver-side op loop to at most `opsSec` operations per second by
  * pausing the calling thread, averaging over a 10-second window (a burst
  * early in the window may run ahead; the pacing pulls the AVERAGE back
  * to the limit before the window resets). The reference uses it to cap
  * stream-IN rate so bulk transfer can't overload a serving node; here it
  * caps a driver feed loop (e.g. micro-batch ingest in StreamBench) the
  * same way. Semantics mirrored exactly:
  *
  *  - the window anchor is the FIRST op's timestamp;
  *  - after op k the estimated "paid-up" time is anchor + k·nanosPerOp;
  *  - the thread sleeps only when it is ahead by MORE than 10% of one
  *    op's budget (small jitter is never paid for — the reference's
  *    "dont pause, if delta is not so much" rule);
  *  - once the window exceeds 10 s the counter and anchor reset, so a
  *    long quiet gap doesn't bank unlimited burst credit.
  *
  * Clock and sleeper are injectable so specs drive virtual time; the
  * production default is System.nanoTime + Thread.sleep (whole millis —
  * the sub-milli busy-yield tail the reference uses matters only at
  * >10k ops/s, where a Spark driver loop is not the bottleneck).
  */
final class RateControl(
    opsSec: Int,
    nanoTime: () => Long = () => System.nanoTime(),
    sleeper: Long => Unit = RateControl.sleepNanos) {
  require(opsSec > 0, s"opsSec must be positive, got $opsSec")

  private val avgWindowNanos = 10L * 1000L * 1000L * 1000L
  private val nanosPerOp = 1000000000L / opsSec

  private var anchor = 0L
  private var ops = 0L
  private var sleptTotal = 0L

  /** Count one operation, pausing the calling thread if the loop is
    * running ahead of the configured rate.
    */
  def control(): Unit = synchronized {
    if (anchor == 0L) {
      anchor = nanoTime()
      ops = 1
      return
    }
    val now = nanoTime()
    ops += 1
    val paidUp = anchor + nanosPerOp * ops
    if (paidUp > now + nanosPerOp / 10) {
      val pause = paidUp - now
      sleptTotal += pause
      sleeper(pause)
    }
    if (now > anchor + avgWindowNanos) {
      ops = 1
      anchor = now
    }
  }

  /** Total nanoseconds of pause requested so far (observability hook —
    * StreamBench reports it next to the histogram percentiles).
    */
  def sleptNanos: Long = synchronized(sleptTotal)
}

object RateControl {
  private def sleepNanos(n: Long): Unit = {
    val millis = n / 1000000L
    if (millis > 0)
      try Thread.sleep(millis)
      catch { case _: InterruptedException => Thread.currentThread().interrupt() }
  }
}
