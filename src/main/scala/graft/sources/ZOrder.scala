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
    writeRun(df.withColumn("zkey", zorderKey(aExpr, bExpr)), path, numFiles)
  }

  /** Cluster a frame that ALREADY carries its `zkey` into one z-ordered
    * run: range-repartition (files cover disjoint key ranges) + in-file
    * sort (row groups subdivide them). Shared by [[writeZOrdered]] and
    * [[compactZRuns]] so layout invariants can't drift between the
    * flush path and the merge path.
    */
  private def writeRun(df: DataFrame, path: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(path)

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

  /** [[zorderedIngest]] composed with its lifecycle half: after each
    * micro-batch flush, if the store holds ≥ `compactAtRuns` run
    * directories, [[compactZRuns]] folds them size-tiered — the
    * reference's memtable-flush → minor-compaction loop as one
    * streaming pipeline. Compaction runs INSIDE foreachBatch (between
    * batches, never concurrent with a flush, same as the reference's
    * single compaction executor per CF). Every batch ends with a HEALED
    * store: [[healZRuns]] runs unconditionally after each flush (one
    * directory listing), not only when the compaction threshold is
    * crossed — a crash between a compaction's source-run deletes and
    * the stream checkpoint commit makes the replayed batch rewrite a
    * run that is already inside the published compacted run, and the
    * unconditional heal deletes that resurrected run in the SAME batch
    * instead of leaving readers double-counting until a later batch
    * crosses the threshold. The residual window is within one
    * foreachBatch call (between the replayed flush and its heal);
    * batch boundaries always expose a consistent store: flush
    * publishes whole runs, compaction publishes-then-deletes.
    */
  def zorderedIngestCompacting(stream: DataFrame, basePath: String,
      aExpr: Column, bExpr: Column, filesPerRun: Int,
      compactAtRuns: Int = 8, targetFileBytes: Long = 128L << 20):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(compactAtRuns >= 2, "compactAtRuns must be >= 2")
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        writeZOrdered(batch, s"$basePath/run=$id", aExpr, bExpr, filesPerRun)
        val base = new org.apache.hadoop.fs.Path(basePath)
        val fs = base.getFileSystem(
          batch.sparkSession.sparkContext.hadoopConfiguration)
        // unconditional: a replayed batch may have just resurrected a
        // run that a published compacted run already contains — heal
        // NOW, not at the next threshold crossing (heal before the run
        // count so an already-merged resurrected run can't inflate it)
        healZRuns(fs, base)
        if (runDirs(fs, base).length >= compactAtRuns) {
          compactZRuns(batch.sparkSession, basePath, targetFileBytes)
          ()
        }
      }
    }
  }

  /** Finish interrupted compaction cycles — the startup-recovery step
    * (reference: compaction-marked SSTables deleted at startup). A stale
    * never-published temp dir is discarded; a source run still on disk
    * but named by a PUBLISHED run's manifest was already merged, so
    * reading it again would double-count — delete it. Idempotent; call
    * after an unclean shutdown before trusting plain reads of the store
    * (compactZRuns and every zorderedIngestCompacting batch heal first
    * automatically).
    */
  def healZRuns(spark: org.apache.spark.sql.SparkSession,
      basePath: String): Unit = {
    val base = new org.apache.hadoop.fs.Path(basePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(base)) healZRuns(fs, base)
  }

  private def healZRuns(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Unit = RunFold.heal(fs, base)

  /** The `run=<id>` directories of a [[zorderedIngest]] store, by id. */
  private def runDirs(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    RunFold.runDirs(fs, base)

  /** Size-tiered bucketing of (id, bytes) runs — the
    * `CompactionManager.getBuckets` rule (reference
    * `db/CompactionManager.java:614-660`): walk runs by ascending size,
    * a run joins the current bucket while it stays within
    * [avg·low, avg·high] of the bucket's running average (tiny runs
    * under `minRunBytes` always group); otherwise it starts a new tier.
    * Exposed for the spec; order inside a bucket is ascending size.
    */
  def sizeTieredBuckets(sizes: Seq[(Long, Long)], low: Double = 0.5,
      high: Double = 1.5, minRunBytes: Long = 4L << 20): Seq[Seq[Long]] = {
    val sorted = sizes.sortBy { case (id, bytes) => (bytes, id) }
    val out = scala.collection.mutable.ArrayBuffer.empty[scala.collection.mutable.ArrayBuffer[(Long, Long)]]
    sorted.foreach { case (id, bytes) =>
      val fits = out.lastOption.exists { b =>
        val avg = b.map(_._2).sum.toDouble / b.length
        (bytes >= avg * low && bytes <= avg * high) ||
          (bytes < minRunBytes && avg < minRunBytes)
      }
      if (fits) out.last += ((id, bytes))
      else out += scala.collection.mutable.ArrayBuffer((id, bytes))
    }
    out.map(_.map(_._1).toSeq).toSeq
  }

  /** Size-tiered compaction of a [[zorderedIngest]] store — the
    * lifecycle half the ingest path defers to: without it a long-running
    * stream accumulates one run per micro-batch forever and
    * [[zRangeScan]] degrades linearly in run count (every run's files
    * are probed per range). Buckets runs of similar size
    * ([[sizeTieredBuckets]] — the reference's size-tiered rule), merges
    * each bucket of ≥ `minRunsPerBucket` runs into ONE new z-ordered run
    * sized by `targetFileBytes` (merged runs grow, so file COUNT grows
    * with data rather than file size), and deletes the sources. Crash
    * safety is the reference compactor's publish-then-delete protocol:
    * the merged run is written to a dot-prefixed temp dir (invisible to
    * parquet discovery), a `_compacted_from` manifest naming the source
    * run ids is placed INSIDE it, and only then is it renamed into
    * `run=<negative id>` (compacted runs use the negative id namespace —
    * stream batch ids are ≥ 0, so redelivered batches can never collide
    * with a compacted run) and the sources removed. A crash before
    * publish leaves only an ignored temp dir (readers unaffected); a
    * crash BETWEEN publish and the source deletes leaves both the
    * merged run and its sources on disk — plain readers over that
    * window WOULD double-count, so the recovery contract is the
    * reference compactor's: run [[healZRuns]] (or any compactZRuns /
    * [[zorderedIngestCompacting]] batch, which heal first) after an
    * unclean shutdown BEFORE trusting reads, exactly as the reference
    * deletes compaction-marked SSTables at startup
    * (`io/SSTable.deleteIfCompacted`). Healing is idempotent and
    * rerunning compaction is a fixed point. Caller contract
    * (same as [[zorderedIngest]]'s redelivery rule): the stream's
    * checkpoint must live as long as the store — a FRESH checkpoint
    * restarts batch ids at 0 and would collide with ids the manifests
    * remember. Returns (newRunId, mergedSourceIds) per merged bucket;
    * empty when nothing qualifies (idempotent fixed point).
    */
  def compactZRuns(spark: org.apache.spark.sql.SparkSession,
      basePath: String, targetFileBytes: Long = 128L << 20,
      minRunsPerBucket: Int = 2, low: Double = 0.5, high: Double = 1.5,
      minRunBytes: Long = 4L << 20): Seq[(Long, Seq[Long])] =
    RunFold.foldSizeTiered(spark, basePath, targetFileBytes,
      minRunsPerBucket, low, high, minRunBytes) { (srcPaths, tmp, nFiles, _) =>
      writeRun(spark.read.parquet(srcPaths.map(_.toString): _*),
        tmp.toString, nFiles)
    }
}
