package graft.util

import java.util.concurrent.atomic.AtomicLongArray

/** Geometric-bucket latency histogram — the per-operator observability
  * primitive of the reference (utils/EstimatedHistogram.java:24-101: a
  * bucket series growing ×1.2 from 1 to ~33M, lock-free adds via binary
  * search, percentiles estimated at bucket granularity). The boundary
  * series here is REGENERATED from the same growth rule (start 1, next =
  * max(n+1, ⌊n·1.2⌋), capped past 33M), not copied — same ~20% relative
  * resolution and estimation behavior, but the boundary VALUES drift from
  * the reference's ⌊1.2^k⌋-with-dedup table (e.g. 9,10,12,14,… here vs
  * 10,12,15,18,… there), so snapshot bucket vectors are NOT
  * interchangeable with reference-format ones — merge only among
  * histograms from this class. ~90 buckets covering µs→30s.
  *
  * Concurrency matches the reference: adds are atomic per bucket, so any
  * thread can record while another snapshots. Reads (`percentile`,
  * `mean`, `count`) see a live snapshot.
  *
  * Spark-first usage note: this is a DRIVER-side instrument (micro-batch
  * durations in StreamBench, per-operation timings in a coordinator). To
  * aggregate latencies recorded on EXECUTORS, ship the bucket VECTOR
  * (element-wise sum is associative — `snapshot` + local merge), never
  * raw samples; the bucket count is a constant ~90 longs regardless of
  * sample volume, which is what makes the estimated histogram the right
  * shape for distributed percentiles.
  */
final class EstimatedHistogram {
  import EstimatedHistogram.offsets

  // one extra overflow bucket past the last boundary, like the reference
  private val buckets = new AtomicLongArray(offsets.length + 1)

  /** Record a value (reference `add`: binary search, inexact → insertion
    * bucket, exact match → next bucket, i.e. bucket i counts values in
    * (offsets(i-1), offsets(i)]).
    */
  def add(n: Long): Unit = {
    var idx = java.util.Arrays.binarySearch(offsets, n)
    idx = if (idx < 0) -idx - 1 else idx + 1
    buckets.incrementAndGet(idx)
    ()
  }

  def count: Long = {
    var total = 0L
    var i = 0
    while (i < buckets.length()) { total += buckets.get(i); i += 1 }
    total
  }

  /** Estimated p-quantile: the upper boundary of the first bucket whose
    * cumulative count reaches ⌈p·total⌉. Error bounded by the ~20%
    * bucket width. Overflow samples (beyond the last boundary) report
    * the last boundary — the reference's histogram likewise cannot
    * resolve past its table.
    */
  def percentile(p: Double): Long = {
    require(p >= 0.0 && p <= 1.0, s"percentile needs p in [0,1], got $p")
    val total = count
    if (total == 0) return 0L
    val target = math.max(1L, math.ceil(p * total).toLong)
    var seen = 0L
    var i = 0
    while (i < buckets.length()) {
      seen += buckets.get(i)
      if (seen >= target) return offsets(math.min(i, offsets.length - 1))
      i += 1
    }
    offsets.last
  }

  /** Bucket-resolution mean: each sample weighted by its bucket's upper
    * boundary (overflow weighted by the last boundary).
    */
  def mean: Long = {
    val total = count
    if (total == 0) return 0L
    var acc = 0L
    var i = 0
    while (i < buckets.length()) {
      acc += buckets.get(i) * offsets(math.min(i, offsets.length - 1))
      i += 1
    }
    acc / total
  }

  /** Live bucket snapshot (reference `get`); element-wise-summable for
    * distributed merges. `reset` zeroes the counts after reading.
    */
  def snapshot(reset: Boolean = false): Array[Long] = {
    val out = new Array[Long](buckets.length())
    var i = 0
    while (i < out.length) {
      // getAndSet drains atomically per bucket — a concurrent add lands
      // either in this snapshot or in the next one, never in neither
      out(i) = if (reset) buckets.getAndSet(i, 0L) else buckets.get(i)
      i += 1
    }
    out
  }

  /** Merge another histogram's snapshot into this one (the distributed
    * combine: bucket vectors add element-wise).
    */
  def merge(other: Array[Long]): Unit = {
    require(other.length == buckets.length(),
      s"bucket count mismatch: ${other.length} vs ${buckets.length()}")
    var i = 0
    while (i < other.length) { buckets.addAndGet(i, other(i)); i += 1 }
  }
}

object EstimatedHistogram {
  /** ×1.2 geometric boundaries, regenerated (see class doc). */
  private[util] val offsets: Array[Long] = {
    val b = Array.newBuilder[Long]
    var n = 1L
    while (n <= 33000000L) {
      b += n
      n = math.max(n + 1, n * 12 / 10)
    }
    b += n // first boundary past 33M, so the table covers the full ~30s
    b.result()
  }

  def bucketOffsets: Array[Long] = offsets.clone()
}
