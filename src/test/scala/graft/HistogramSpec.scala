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
}
