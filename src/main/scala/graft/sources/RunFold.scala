package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The generic `run=<id>` directory lifecycle shared by every
  * append-only flat run store (the z-ordered store's ingest/compaction
  * protocol factored out so the PRIMARY cell store's streaming loop
  * uses the SAME conventions instead of a parallel copy):
  *
  *  - a stream flushes each micro-batch as `base/run=<batchId>`
  *    (overwrite-by-id ⇒ redelivery idempotent);
  *  - compaction merges size-tiered runs into ONE new run in the
  *    NEGATIVE id namespace (batch ids are ≥ 0, so replayed batches
  *    can never collide with a compacted run), published
  *    write-temp → manifest → rename → delete-sources;
  *  - [[heal]] finishes interrupted cycles: stale `.compacting-*`
  *    temps are discarded, and a source run still on disk but named by
  *    a PUBLISHED run's `_compacted_from` manifest was already merged
  *    (reading it again would double-count) — delete it. The reference
  *    analog is deleting compaction-marked SSTables at startup
  *    (`io/SSTable.deleteIfCompacted`).
  *
  * Reference: db/CompactionManager.java:87-141 (the flush→minor loop),
  * io/CompactionIterator merge publish discipline.
  */
private[graft] object RunFold {

  val ManifestName = "_compacted_from"

  /** The `run=<id>` directories of a run store, by numeric id. */
  def runDirs(fs: FileSystem, base: Path): Seq[(Long, Path)] =
    fs.listStatus(base).toSeq.filter(_.isDirectory).flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("run="))
        scala.util.Try(n.drop(4).toLong).toOption.map(_ -> st.getPath)
      else None
    }

  /** Finish interrupted compaction cycles (idempotent; see object doc). */
  def heal(fs: FileSystem, base: Path): Unit = {
    fs.listStatus(base).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith(".compacting-"))
        fs.delete(st.getPath, true)
    }
    runDirs(fs, base).foreach { case (_, dir) =>
      val mf = new Path(dir, ManifestName)
      if (fs.exists(mf)) {
        val in = fs.open(mf)
        val ids = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).map(_.toLong).toSeq
        finally in.close()
        ids.foreach { sid =>
          val p = new Path(base, s"run=$sid")
          if (fs.exists(p)) fs.delete(p, true)
        }
      }
    }
  }

  /** Publish a merged run written at `tmp`: place the source-id
    * manifest INSIDE it, rename into `run=<newId>`, then delete the
    * sources. A crash before the rename leaves an ignored temp; a
    * crash between rename and deletes leaves double-counting residue
    * that the next [[heal]] removes (the recovery contract).
    */
  def publish(fs: FileSystem, base: Path, newId: Long, tmp: Path,
      srcIds: Seq[Long]): Unit = {
    val out = fs.create(new Path(tmp, ManifestName), true)
    try out.write(srcIds.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, new Path(base, s"run=$newId")),
      s"run-fold publish rename failed for run=$newId")
    srcIds.foreach(sid => fs.delete(new Path(base, s"run=$sid"), true))
  }

  /** The whole size-tiered plan-and-publish skeleton, shared by the
    * z-ordered store and the cell store (the two differ ONLY in how a
    * merged run's rows are written): heal first, size the surviving
    * runs, bucket them ([[ZOrder.sizeTieredBuckets]] — the reference's
    * getBuckets rule), and for each qualifying bucket allocate the next
    * NEGATIVE id, hand (sources, temp dir, file budget, full-fold flag)
    * to `writeMerged`, and publish-then-delete through [[publish]].
    * `isFullFold` is true when the bucket covers every surviving run —
    * the cell store's tombstone-purge precondition. Returns
    * (newRunId, mergedSourceIds) per merged bucket; empty when nothing
    * qualifies (idempotent fixed point).
    */
  def foldSizeTiered(spark: org.apache.spark.sql.SparkSession,
      basePath: String, targetFileBytes: Long, minRunsPerBucket: Int,
      low: Double, high: Double, minRunBytes: Long)(
      writeMerged: (Seq[Path], Path, Int, Boolean) => Unit): Seq[(Long, Seq[Long])] = {
    require(minRunsPerBucket >= 2, "minRunsPerBucket must be >= 2")
    require(targetFileBytes >= 1, "targetFileBytes must be >= 1")
    val base = new Path(basePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq.empty
    heal(fs, base)
    val sized = runDirs(fs, base).map { case (id, p) =>
      (id, fs.getContentSummary(p).getLength)
    }
    val buckets = ZOrder.sizeTieredBuckets(sized, low, high, minRunBytes)
      .filter(_.length >= minRunsPerBucket)
    if (buckets.isEmpty) return Seq.empty
    var nextId = math.min(-1L, sized.map(_._1).min - 1L)
    val byId = sized.toMap
    val allIds = sized.map(_._1).toSet
    buckets.map { srcIds =>
      val newId = nextId
      nextId -= 1
      val srcPaths = srcIds.map(id => new Path(base, s"run=$id"))
      val bytes = srcIds.map(byId).sum
      val nFiles = math.max(1L,
        (bytes + targetFileBytes - 1) / targetFileBytes).toInt
      val tmp = new Path(base, s".compacting-run-$newId")
      writeMerged(srcPaths, tmp, nFiles, srcIds.toSet == allIds)
      publish(fs, base, newId, tmp, srcIds)
      (newId, srcIds)
    }
  }
}
