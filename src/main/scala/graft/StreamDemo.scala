package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Cell
import graft.operators.Compaction
import graft.sources.{CellEncodings, CellStore}
import graft.streaming.CellStream

/** End-to-end streaming ingestion demo: mutation files arrive in a staging
  * directory (the commit-log segments), a file-source stream flushes each
  * micro-batch into the store as sorted runs (memtable flush), compaction
  * folds the runs + writes the tombstone-horizon sidecar, and the final
  * lens answers queries — the full write → flush → compact → read cycle
  * of SURVEY §3.3 on Structured Streaming.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dir = Files.createTempDirectory("graft_streamdemo").toString
    val stage = s"$dir/incoming"
    val store = s"$dir/store"
    new java.io.File(stage).mkdirs()

    val cells = CellEncodings.eventsCells(spark, "/root/testdata/sf0.001")

    val stream = spark.readStream
      .schema(Cell.schema)
      .parquet(stage)
    val q = CellStream.writeToStore(stream, store, s"$dir/ckpt").start()

    // three arriving mutation batches (commit-log segments)
    (0 until 3).foreach { i =>
      cells.filter(pmod(col("ts"), lit(3)) === i)
        .write.mode("append").parquet(stage)
      q.processAllAvailable()
      val n = spark.read.parquet(store).count()
      println(s"[stream] after batch $i: $n cells in store")
    }
    q.stop()

    // major compaction: fold runs, GC, persist horizons sidecar
    val compacted = Compaction.compact(spark.read.parquet(store), gcBeforeSeconds = 0)
    CellStore.writeWithHorizons(compacted, CellEncodings.eventsMeta, s"$dir/compacted",
      numPartitions = 4)
    // a late row-delete delta folds in INCREMENTALLY: compaction merges
    // runs+delta and refreshes the sidecar from old-sidecar ⊕ delta
    // markers only (never re-scanning the runs for the sidecar)
    val victim = "0000000007"
    val victimCells = spark.read.parquet(store)
      .filter(col("key") === victim).count()
    val lateDelta = graft.operators.Mutations.asRowDeletes(
      spark.range(1).select(lit(victim).as("key"),
        lit(Long.MaxValue - 1).as("ts")),
      localDeletionTimeSec = 2000000000)
    CellStore.compactWithHorizons(spark, s"$dir/compacted", Some(lateDelta),
      CellEncodings.eventsMeta, gcBeforeSeconds = 0, numPartitions = 4)
    println(s"[stream] incremental compaction folded a row delete for $victim ($victimCells cells shadowed)")
    val lens = CellStore.openWithHorizons(spark, s"$dir/compacted", CellEncodings.eventsMeta)
    val total = lens.live.count()
    val users = lens.getCountAll.count()
    println(s"[stream] compacted store: $total live cells across $users users")
    val sample = lens.getSlice("0000000012", None, graft.operators.SliceRange(count = 3))
      .select(col("key"), decode(col("value"), "UTF-8")).collect()
    sample.foreach(r => println(s"[stream] sample ${r.getString(0)} -> ${r.getString(1)}"))
    assert(total == 1000 - victimCells,
      s"expected ${1000 - victimCells} live cells after the row delete, got $total")
    spark.stop()
  }
}
