package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.EstimatedHistogram

/** EstimatedHistogram (utils/EstimatedHistogram.java analog): bucket
  * series shape, add/percentile/mean estimation bounds, overflow,
  * snapshot/merge (the distributed combine).
  */
class HistogramSpec extends AnyFunSuite {

  test("bucket boundaries: strictly increasing, ~1.2 growth, microseconds to ~30s") {
    val off = EstimatedHistogram.bucketOffsets
    assert(off.head == 1L)
    assert(off.last >= 33000000L && off.last < 50000000L)
    off.sliding(2).foreach { case Array(a, b) =>
      assert(b > a, s"not increasing at $a -> $b")
      // growth rule: next = max(n+1, floor(1.2 n)) => ratio never above 1.2
      assert(b <= math.max(a + 1, a * 12 / 10), s"growth above 1.2 at $a -> $b")
    }
    // ~20% resolution needs ~log_1.2(33M) ≈ 90+ buckets, not thousands
    assert(off.length > 80 && off.length < 120, s"${off.length} buckets")
  }

  test("percentile and mean estimate within one bucket of the exact values") {
    val h = new EstimatedHistogram
    val rnd = new scala.util.Random(11)
    val samples = Seq.fill(5000)(math.abs(rnd.nextGaussian() * 400.0).toLong + 50L)
    samples.foreach(h.add)
    assert(h.count == 5000L)
    val sorted = samples.sorted
    def exact(p: Double): Long = sorted(math.ceil(p * sorted.size).toInt - 1)
    for (p <- Seq(0.5, 0.95, 0.99)) {
      val est = h.percentile(p)
      val ex = exact(p)
      // estimate reports a bucket UPPER boundary >= the exact rank value,
      // within one 1.2x bucket width of it
      assert(est >= ex, s"p=$p est $est below exact $ex")
      assert(est <= math.max(ex + 1, ex * 12 / 10), s"p=$p est $est above one bucket over $ex")
    }
    val exactMean = samples.sum / samples.size
    assert(h.mean >= exactMean && h.mean <= exactMean * 12 / 10 + 1,
      s"mean ${h.mean} vs exact $exactMean")
  }

  test("add semantics: exact boundary goes to the NEXT bucket; overflow capped") {
    val h = new EstimatedHistogram
    // value 1 == first boundary -> second bucket => p100 reports boundary 2
    h.add(1L)
    assert(h.percentile(1.0) == 2L)
    // overflow: values beyond the table report the last boundary
    val h2 = new EstimatedHistogram
    h2.add(Long.MaxValue / 2)
    assert(h2.percentile(0.5) == EstimatedHistogram.bucketOffsets.last)
    // zero-sample histogram answers 0
    assert(new EstimatedHistogram().percentile(0.99) == 0L)
    assert(new EstimatedHistogram().mean == 0L)
  }

  test("snapshot + merge: the distributed bucket-vector combine is exact") {
    val a = new EstimatedHistogram
    val b = new EstimatedHistogram
    val merged = new EstimatedHistogram
    val rnd = new scala.util.Random(13)
    val sa = Seq.fill(800)(rnd.nextInt(100000).toLong + 1)
    val sb = Seq.fill(1200)(rnd.nextInt(5000).toLong + 1)
    sa.foreach(a.add); sb.foreach(b.add)
    (sa ++ sb).foreach(merged.add)
    // element-wise sum of snapshots == histogram of the union
    val combined = new EstimatedHistogram
    combined.merge(a.snapshot())
    combined.merge(b.snapshot())
    assert(combined.snapshot().toSeq == merged.snapshot().toSeq)
    assert(combined.percentile(0.95) == merged.percentile(0.95))
    // snapshot(reset = true) drains
    assert(a.snapshot(reset = true).sum == 800L)
    assert(a.count == 0L)
  }

  test("StoreLatency: per-op histograms, percentile/mean bucket-resolution, exact max") {
    import graft.stat.StoreLatency
    StoreLatency.clear()
    // two ops; op A gets a skewed sample set so p50 ≠ p99
    (1 to 90).foreach(_ => StoreLatency.record("a", 100L))
    (1 to 9).foreach(_ => StoreLatency.record("a", 10000L))
    StoreLatency.record("a", 1234567L)
    assert(StoreLatency.timed("b") { 7 } == 7) // timed returns the value
    val rep = StoreLatency.report().toMap
    val a = rep("a")
    assert(a.count == 100 && a.maxMicros == 1234567L)
    // bucket resolution: within ~20% of the exact quantiles
    assert(a.p50Micros >= 100 && a.p50Micros <= 120, a.toString)
    assert(a.p99Micros >= 10000 && a.p99Micros <= 12000, a.toString)
    assert(a.p50Micros <= a.p95Micros && a.p95Micros <= a.p99Micros)
    assert(rep("b").count == 1)
    StoreLatency.clear()
    assert(StoreLatency.report().isEmpty)
  }

  test("RateControl: fast producer paced to the limit, slow producer never slept") {
    import graft.util.RateControl
    // virtual clock: each op arrives 1 ms apart against a 100 ops/s limit
    // (10 ms budget/op) -> the loop must sleep ~9 ms per op on average
    var now = 1000000L
    var slept = 0L
    val rc = new RateControl(100,
      nanoTime = () => now,
      sleeper = n => { slept += n; now += n }) // sleeping advances the clock
    (1 to 50).foreach { _ => now += 1000000L; rc.control() }
    // after pacing, elapsed must cover ~ops*nanosPerOp within the 10% slack
    val elapsed = now - 1000000L
    assert(elapsed >= 49L * 10000000L * 9 / 10, s"elapsed $elapsed under-paced")
    assert(slept > 0L && rc.sleptNanos == slept)

    // a slow producer (20 ms between ops at a 10 ms budget) never sleeps
    var now2 = 1000000L
    var slept2 = 0L
    val rc2 = new RateControl(100,
      nanoTime = () => now2, sleeper = n => { slept2 += n; now2 += n })
    (1 to 50).foreach { _ => now2 += 20000000L; rc2.control() }
    assert(slept2 == 0L, s"slow producer slept $slept2")
  }

  test("RateControl: 10s window reset forgives banked burst credit") {
    import graft.util.RateControl
    var now = 1000000L
    var slept = 0L
    val rc = new RateControl(100,
      nanoTime = () => now, sleeper = n => { slept += n; now += n })
    rc.control() // anchor
    // a long quiet gap (15 s) would bank 1500 ops of credit without the
    // reset; after it, a fast burst must STILL be paced
    now += 15L * 1000000000L
    rc.control() // crosses the window: counter re-anchors here
    val sleptBefore = slept
    (1 to 100).foreach { _ => now += 1000000L; rc.control() }
    assert(slept > sleptBefore, "burst after window reset was not paced")
  }

  test("RateControl: sub-10% jitter is never paid for") {
    import graft.util.RateControl
    var now = 1000000L
    var slept = 0L
    val rc = new RateControl(100,
      nanoTime = () => now, sleeper = n => { slept += n; now += n })
    rc.control()
    // arriving exactly on budget (10 ms/op): after the reference's one-op
    // startup correction (op 2 pays the first op's budget slot), an
    // on-budget producer is never slept again
    now += 10000000L; rc.control()
    val startup = slept
    assert(startup <= 10000000L, s"startup correction too large: $startup")
    (1 to 50).foreach { _ => now += 10000000L; rc.control() }
    assert(slept == startup, s"on-budget producer slept beyond startup: ${slept - startup}")
  }
}
