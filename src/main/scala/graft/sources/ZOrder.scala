package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout for
  * min/max pruning, the analog of Delta/Iceberg's OPTIMIZE ZORDER
  * applied to plain parquet. A table sorted on ONE column prunes range
  * predicates on that column only; a 2-D query rectangle (user range ×
  * time range) over a user-sorted 100 TB table still scans every file
  * the user range touches at EVERY time. Interleaving the bits of both
  * dimensions into one sort key makes files cover axis-aligned
  * quadrants: every power-of-2-aligned 2^k × 2^k cell is a CONTIGUOUS
  * zkey range (spec-pinned), so per-file min/max stats of the PLAIN
  * COLUMNS tighten in both dimensions at once and parquet row-group /
  * file skipping works for rectangles, not just one axis.
  *
  * The key is built from pure codegen'd bit arithmetic (the classic
  * mask-spread: 4 shift-and steps per dimension, no UDFs, no loops), so
  * it costs a handful of ALU ops per row at write time and NOTHING at
  * read time — readers filter on the original columns and never see the
  * key. Caller contract: dimension values are pre-scaled to
  * [0, 2^bits); the op masks defensively.
  */
object ZOrder {

  /** Spread the low 16 bits of `x` so bit i lands at position 2i —
    * the standard Morton mask ladder, each step a codegen'd long op.
    */
  private def spread16(x: Column): Column = {
    val m0 = lit(0x0000FFFFL)
    val s1 = (x.bitwiseAND(m0)) // defensive clamp to 16 bits
    val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s4 = s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x33333333L))
    s4.bitwiseOR(shiftleft(s4, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** The 2-D Morton key: a's bits at even positions, b's at odd —
    * 16 bits per dimension (the caller scales real domains down to
    * 65536 buckets; finer than any practical file count).
    */
  def zorderKey(a: Column, b: Column): Column =
    spread16(a.cast("long")).bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  /** Inverse of [[spread16]]: collapse bits 0,2,4,… back to 0..15. */
  private def unspread16(x: Column): Column = {
    val s0 = x.bitwiseAND(lit(0x55555555L))
    val s1 = s0.bitwiseOR(shiftright(s0, 1)).bitwiseAND(lit(0x33333333L))
    val s2 = s1.bitwiseOR(shiftright(s1, 2)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftright(s2, 4)).bitwiseAND(lit(0x00FF00FFL))
    s3.bitwiseOR(shiftright(s3, 8)).bitwiseAND(lit(0x0000FFFFL))
  }

  /** Decode a 2-D Morton key back to its (a, b) cell — the bijection
    * witness the spec pins; also what a z-range query planner would use
    * to skip gap runs (BIGMIN), kept here as the decode primitive.
    */
  def zorderDecode(z: Column): (Column, Column) =
    (unspread16(z), unspread16(shiftright(z, 1)))

  /** Contiguous zkey ranges covering EXACTLY the axis-aligned rectangle
    * [aLo, aHi] × [bLo, bHi] — the query-planner half of the layout:
    * a reader scanning a zkey-sorted store issues one range scan per
    * returned pair and touches no key outside the rectangle (the
    * BIGMIN/quadrant-decomposition idea). Recursive descent over
    * aligned quadrants: a quadrant fully inside the rectangle emits its
    * whole (contiguous — the spec-pinned property) key range; a
    * partial overlap splits into the four subquadrants IN ASCENDING
    * KEY ORDER ((a₀b₀), (a₁b₀), (a₀b₁), (a₁b₁) — a rides the even
    * bits), so emitted ranges arrive sorted and adjacent ones merge on
    * the way out. Exactness law (spec-pinned): Σ(hi−lo+1) over the
    * ranges equals the rectangle's area — full coverage, zero
    * overcoverage. Range count is O(perimeter · log side), driver-side
    * planning cost only.
    */
  def zRanges(aLo: Long, aHi: Long, bLo: Long, bHi: Long): Seq[(Long, Long)] = {
    require(0 <= aLo && aLo <= aHi && aHi < 65536 &&
      0 <= bLo && bLo <= bHi && bHi < 65536,
      s"rectangle [$aLo,$aHi]x[$bLo,$bHi] outside the 16-bit domain")
    def z(a: Long, b: Long): Long = {
      def spread(x0: Long): Long = {
        var x = x0 & 0x0000FFFFL
        x = (x | (x << 8)) & 0x00FF00FFL
        x = (x | (x << 4)) & 0x0F0F0F0FL
        x = (x | (x << 2)) & 0x33333333L
        (x | (x << 1)) & 0x55555555L
      }
      spread(a) | (spread(b) << 1)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def emit(lo: Long, hi: Long): Unit =
      if (out.nonEmpty && out.last._2 + 1 == lo)
        out(out.length - 1) = (out.last._1, hi)
      else out += ((lo, hi))
    def rec(aMin: Long, aMax: Long, bMin: Long, bMax: Long): Unit = {
      if (aMax < aLo || aMin > aHi || bMax < bLo || bMin > bHi) return
      if (aMin >= aLo && aMax <= aHi && bMin >= bLo && bMax <= bHi) {
        emit(z(aMin, bMin), z(aMax, bMax)); return
      }
      val (am, bm) = ((aMin + aMax) / 2, (bMin + bMax) / 2)
      rec(aMin, am, bMin, bm); rec(am + 1, aMax, bMin, bm)
      rec(aMin, am, bm + 1, bMax); rec(am + 1, aMax, bm + 1, bMax)
    }
    rec(0L, 65535L, 0L, 65535L)
    out.toSeq
  }

  /** Write `df` clustered by the 2-D Morton key of (`colA`, `colB`)
    * (each pre-scaled by the given expressions to [0, 65536)):
    * range-repartition on the key so files cover disjoint key ranges,
    * sort within partitions so row groups subdivide them. The key is
    * PERSISTED as column `zkey`: readers that filter the ORIGINAL
    * columns still prune via parquet min/max stats on them, and a
    * z-range reader ([[zRangeScan]]) seeks by the key itself — files
    * cover disjoint, sorted key ranges, so a key-range predicate
    * touches exactly the covering runs (the sampled-index seek of the
    * reference's IndexSummary: locate, then read only the covering
    * runs — `io/IndexSummary.java:1-150`).
    */
  def writeZOrdered(df: DataFrame, path: String, aExpr: Column,
      bExpr: Column, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles $numFiles must be >= 1")
    require(!df.columns.contains("zkey"),
      "writeZOrdered persists a 'zkey' column; the input already has one " +
        "— rename it, or it would be silently overwritten and shadow the " +
        "layout key for every reader of this store")
    df.withColumn("zkey", zorderKey(aExpr, bExpr))
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(path)
  }

  /** Cap a sorted disjoint range list at `maxRanges` by bridging the
    * SMALLEST inter-range gaps first (keep the `maxRanges−1` largest
    * gaps as separators) — the classic seek-budget trade: each bridged
    * gap admits overcoverage proportional to its width, and the
    * smallest-gap order admits the least total. Exactness is restored
    * downstream by the residual rectangle filter, so merging only
    * trades extra scanned keys for fewer range predicates.
    */
  def mergeRanges(ranges: Seq[(Long, Long)], maxRanges: Int): Seq[(Long, Long)] = {
    require(maxRanges >= 1, s"maxRanges $maxRanges must be >= 1")
    if (ranges.length <= maxRanges) return ranges
    // gap i sits between ranges(i) and ranges(i+1); keep the largest
    // maxRanges-1 as separators
    val gaps = ranges.sliding(2).zipWithIndex.map {
      case (Seq((_, h), (l2, _)), i) => (l2 - h, i)
    }.toSeq
    val keep = gaps.sortBy { case (w, i) => (-w, i) }
      .take(maxRanges - 1).map(_._2).toSet
    val out = scala.collection.mutable.ArrayBuffer((ranges.head._1, ranges.head._2))
    ranges.tail.zipWithIndex.foreach { case ((l, h), i) =>
      if (keep(i)) out += ((l, h))
      else out(out.length - 1) = (out.last._1, h)
    }
    out.toSeq
  }

  /** Read the rectangle [aLo, aHi] × [bLo, bHi] from a
    * [[writeZOrdered]] store by SEEKING the persisted `zkey`: the
    * planner's ranges (capped at `maxRanges` via [[mergeRanges]])
    * become an OR-of-BETWEENs pushed to the parquet scan — files and
    * row groups whose zkey min/max miss every range are skipped
    * footer-only, in BOTH dimensions at once — and the exact rectangle
    * is restored by a residual filter on the DECODED key (so merging's
    * overcoverage can never leak a row). Self-contained: needs only
    * `zkey`, not the original dimension columns.
    */
  def zRangeScan(spark: org.apache.spark.sql.SparkSession, path: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      maxRanges: Int = 64): DataFrame = {
    val ranges = mergeRanges(zRanges(aLo, aHi, bLo, bHi), maxRanges)
    val zPred = ranges.map { case (l, h) => col("zkey").between(l, h) }
      .reduce(_ or _)
    val (da, db) = zorderDecode(col("zkey"))
    spark.read.parquet(path)
      .filter(zPred)
      .filter(da.between(aLo, aHi) && db.between(bLo, bHi))
  }

  /** Streaming z-ordered ingest — each micro-batch flushes as ONE
    * z-ordered RUN under `basePath/run=<batchId>/` via
    * [[writeZOrdered]]: the streaming analog of a memtable flush
    * producing a sorted SSTable (runs are individually zkey-clustered;
    * files cover disjoint key ranges WITHIN a run). Readers open the
    * union (`spark.read.parquet(basePath)` discovers `run` as a
    * partition column) and [[zRangeScan]] seeks every run's files
    * independently — pruning holds per run exactly as per SSTable; a
    * later compaction merges runs the way the size-tiered compactor
    * merges sorted tables. Overwrite-by-batch-id makes redelivery
    * idempotent (at-least-once safe): a replayed batch rewrites its own
    * run in place. Returns the configured writer — the caller sets
    * checkpoint location and trigger and starts it.
    */
  def zorderedIngest(stream: DataFrame, basePath: String, aExpr: Column,
      bExpr: Column, filesPerRun: Int):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty)
        writeZOrdered(batch, s"$basePath/run=$id", aExpr, bExpr, filesPerRun)
    }
}
