package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Row

import graft.model.Cell
import graft.operators.Reconcile

/** Structured-Streaming ingestion — the write path of SURVEY §2.10 mapped
  * onto Spark's streaming model:
  *
  *   memtable (db/Memtable.java:49-125)  → streaming state / micro-batch delta
  *   flush (Memtable.switchMemtable)     → foreachBatch sorted parquet append
  *   commit log (db/commitlog/)          → checkpoint WAL (exactly-once)
  *   gcGrace horizon                     → watermark + state TTL
  *
  * A mutation stream is simply a stream of cells (inserts + tombstones);
  * because reconciliation is order-insensitive (ReconcileSpec), appending
  * micro-batches preserves read-path semantics exactly.
  */
object CellStream {

  /** Flush pipeline: append each micro-batch of mutation cells to the base
    * store as sorted parquet runs (the SSTable-flush analog). Reads see
    * base ∪ delta via CellStore.mergeOnRead; compaction folds runs later.
    *
    * `listeners` is the IStoreApplyListener analog on the streaming ingest
    * path (fork db/IStoreApplyListener.java:1-30 — see
    * CassandraLens.withApplyListener for the batch twin): each micro-batch
    * runs through the chain BEFORE the flush, so a veto (filter) or
    * transform (TTL stamping) applies exactly once per delivered batch.
    * The reference warns the same hook fires on redeliveries (hinted
    * handoff); here foreachBatch replays carry the same batchId and the
    * checkpoint WAL makes the append exactly-once, so listeners must
    * simply be deterministic.
    *
    * `compactAtRuns` ≥ 2 switches the store to the `run=<batchId>`
    * layout and closes the flush → minor-compaction loop (see the
    * in-body comment); 0 (default) keeps the legacy flat append.
    */
  def writeToStore(mutations: DataFrame, path: String, checkpoint: String,
      listeners: Seq[DataFrame => DataFrame] = Nil,
      compactAtRuns: Int = 0, gcBeforeSeconds: Int = Int.MinValue,
      targetFileBytes: Long = 128L << 20): DataStreamWriter[Row] =
    if (compactAtRuns == 0)
      mutations.writeStream
        .option("checkpointLocation", checkpoint)
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          listeners.foldLeft(batch)((df, l) => l(df))
            .sortWithinPartitions(col("key"), col("super_name"), col("col_name"))
            .write.mode("append").parquet(path)
        }
    else {
      // The flush → minor-compaction loop CLOSED for the primary cell
      // store — the reference's flush path always ends in
      // CompactionManager.submitMinorIfNeeded
      // (db/ColumnFamilyStore.java:558-640), and without this an
      // unbounded mutation feed accumulates one run per micro-batch
      // forever. Pattern and crash contract are
      // [[graft.sources.ZOrder.zorderedIngestCompacting]]'s, shared via
      // [[graft.sources.RunFold]]: each batch flushes as its own
      // `run=<batchId>` (overwrite-by-id ⇒ redelivery idempotent,
      // unlike the flat append above whose replays rely on the
      // checkpoint WAL), the store HEALS unconditionally after every
      // flush (a replayed batch may have just resurrected a run a
      // published compacted run already contains — collect it in the
      // SAME batch), and when the surviving run count reaches
      // `compactAtRuns` the size-tiered fold
      // ([[graft.sources.CellStore.compactCellRuns]]) merges inside
      // foreachBatch — between batches, never concurrent with a flush,
      // the reference's one-compaction-executor-per-CF rule. Read the
      // store with [[graft.sources.CellStore.readRuns]] (drops the
      // discovered run column). Tombstones purge only on full folds
      // (the compactCellRuns rule); majors still own unconditional GC.
      require(compactAtRuns >= 2, "compactAtRuns must be >= 2")
      mutations.writeStream
        .option("checkpointLocation", checkpoint)
        .outputMode(OutputMode.Append)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (!batch.isEmpty) {
            listeners.foldLeft(batch)((df, l) => l(df))
              .sortWithinPartitions(col("key"), col("super_name"), col("col_name"))
              .write.mode("overwrite").parquet(s"$path/run=$id")
            val base = new org.apache.hadoop.fs.Path(path)
            val fs = base.getFileSystem(
              batch.sparkSession.sparkContext.hadoopConfiguration)
            graft.sources.RunFold.heal(fs, base)
            if (graft.sources.RunFold.runDirs(fs, base).length >= compactAtRuns) {
              graft.sources.CellStore.compactCellRuns(batch.sparkSession,
                path, gcBeforeSeconds, targetFileBytes)
              ()
            }
          }
        }
    }

  /** Streaming reconciled view of one key's newest cells held in state:
    * keeps the winning version per column per key as mutations arrive —
    * the memtable's in-place `ColumnFamily.resolve` (db/Memtable.java:120-140)
    * as flatMapGroupsWithState.
    */
  def latestPerKey(cells: Dataset[Cell], maxColumns: Int = 10000,
      gcBeforeSeconds: Int = Int.MinValue): Dataset[Cell] = {
    import cells.sparkSession.implicits._
    cells
      .groupByKey(_.key)
      .flatMapGroupsWithState[Map[String, Cell], Cell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Cell], state: GroupState[Map[String, Cell]]) =>
          val cur = state.getOption.getOrElse(Map.empty)
          val merged = it.foldLeft(cur) { (m, c) =>
            val ck = (Option(c.super_name).map(_.toSeq).getOrElse(Nil),
              Option(c.col_name).map(_.toSeq).getOrElse(Nil)).toString()
            m.get(ck) match {
              case Some(old) if !losesTo(old, c) => m
              case _ => m.updated(ck, c)
            }
          }
          // gcGrace as state TTL (db/CompactionManager.java:636-643): expired
          // tombstones leave the state — bounding it — with the SAME
          // consequence the reference documents: a slower writer can
          // resurrect the column afterwards ("zombie"), which is why
          // gcGraceSeconds must exceed the repair/delivery horizon.
          val kept = merged.filter { case (_, c) =>
            !(c.tombstone && c.local_del_time < gcBeforeSeconds)
          }
          state.update(kept.takeRight(maxColumns))
          merged.valuesIterator
      }
  }

  /** comparePriority (db/Column.java:196-210): does `old` lose to `c`? */
  private def losesTo(old: Cell, c: Cell): Boolean = {
    if (old.ts != c.ts) old.ts < c.ts
    else if (old.tombstone != c.tombstone) c.tombstone
    else {
      val (a, b) = (old.value, c.value)
      var i = 0
      val n = math.min(a.length, b.length)
      var r = 0
      while (i < n && r == 0) { r = (a(i) & 0xFF) - (b(i) & 0xFF); i += 1 }
      if (r != 0) r < 0 else a.length < b.length
    }
  }

  /** Event-time sessionization on an unbounded event stream — the
    * streaming twin of the batch gaps-and-islands plan (q22), expressed
    * with Spark's native `session_window`: the state store merges
    * overlapping per-event windows, and a session emits exactly once when
    * the watermark passes its end (Append mode).
    *
    * Gap semantics: the batch rule breaks a session when the inter-event
    * gap is STRICTLY greater than `gapMicros`. Spark merges an event into
    * a session when `session.end >= event.start` with end = ts + gap —
    * INCLUSIVE at the boundary (MergingSessionsIterator), so the gap
    * parameter maps 1:1: an exact-tie gap stays in-session on both paths
    * (spec-pinned — an off-by-one here is invisible on data without exact
    * ties, which is why the tie case is planted).
    *
    * `ts` is nanoseconds (the events table encoding); sums/bounds are on
    * the µs integer `tus`, so outputs are exact integers, not timestamps.
    * The watermark delay bounds accepted disorder AND session-state
    * lifetime: an event later than `watermark` behind the max seen is
    * dropped, and a session closes (emits, state freed) once the
    * watermark passes its end — unbounded gap tolerance would mean
    * unbounded state, the same tradeoff every op here makes.
    */
  def sessionize(events: DataFrame, gapMicros: Long, watermark: String): DataFrame =
    events
      .withColumn("tus", expr("ts div 1000"))
      .withColumn("event_time", timestamp_micros(col("tus")))
      .withWatermark("event_time", watermark)
      .groupBy(col("user_id"),
        session_window(col("event_time"), s"$gapMicros microseconds"))
      .agg(count(lit(1)).as("n"), min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"))
      .select(col("user_id"), col("n"), col("start_us"), col("end_us"))

  /** Event-time windowed aggregation with a watermark over a cell stream —
    * the streaming twin of the batch q15 plan (same logical shape).
    */
  def windowedCounts(cells: DataFrame, watermark: String, window_ : String): DataFrame =
    cells
      .withColumn("event_time", timestamp_micros((col("ts") / 1000).cast("long")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("key"))
      .agg(count(lit(1)).as("n"))

  /** The batch q15 rollup (tumbling window × event_type, count + exact
    * cent sum) on an unbounded event stream: watermark-bounded state, one
    * emission per closed window (Append mode). Integer cents make the sum
    * order-insensitive — streaming and batch agree exactly.
    */
  def eventWindowStats(events: DataFrame, watermark: String, window_ : String): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("sum_cents"))
}
