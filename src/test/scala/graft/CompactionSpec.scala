package graft

import org.apache.spark.sql.functions._

import graft.model.Cell
import graft.operators.Compaction

/** Compaction pipeline: merge + GC + the fork's IRowProcessor chain
  * (db/proc/IRowProcessor.java:36-76; db/CompactionRowProcTest shape).
  */
class CompactionSpec extends SparkSpec {

  test("compaction collapses versions to one winner per column") {
    val out = Compaction.compact(cellsDf(Seq(
      ins("k1", "c1", "a", 1), ins("k1", "c1", "b", 2), ins("k1", "c1", "c", 3))),
      gcBeforeSeconds = 0)
    assert(out.count() == 1 && liveValues(out) == Map("c1" -> "c"))
  }

  test("row processors rewrite/drop rows during compaction (IRowProcessor)") {
    object DropK2 extends Compaction.RowProcessor {
      override def process(key: String, cells: Iterator[Cell]): Iterator[Cell] =
        if (key == "k2") Iterator.empty else cells
    }
    val out = Compaction.compact(cellsDf(Seq(
      ins("k1", "c1", "v", 1), ins("k2", "c1", "v", 1), ins("k3", "c1", "v", 1))),
      gcBeforeSeconds = 0, processors = Seq(DropK2))
    assert(out.select("key").collect().map(_.getString(0)).sorted.toSeq == Seq("k1", "k3"))
  }

  test("retention processor drops cells older than the horizon") {
    val out = Compaction.compact(cellsDf(Seq(
      ins("k1", "c1", "old", 1), ins("k1", "c2", "new", 10))),
      gcBeforeSeconds = 0, processors = Seq(Compaction.RetentionProcessor(5)))
    assert(liveNames(out) == Seq("c2"))
  }

  test("processors chain in order") {
    object UpperValue extends Compaction.RowProcessor {
      override def process(key: String, cells: Iterator[Cell]): Iterator[Cell] =
        cells.map(c => c.copy(value = new String(c.value, "UTF-8").toUpperCase.getBytes("UTF-8")))
    }
    object DropEmptyRows extends Compaction.RowProcessor {
      override def process(key: String, cells: Iterator[Cell]): Iterator[Cell] = cells
    }
    val out = Compaction.compact(cellsDf(Seq(ins("k1", "c1", "v", 1))),
      gcBeforeSeconds = 0, processors = Seq(UpperValue, DropEmptyRows))
    assert(liveValues(out) == Map("c1" -> "V"))
  }

  test("size-tiered buckets group similar sizes; smalls pool together (getBuckets)") {
    val runs = Seq("a" -> 10L, "b" -> 12L, "c" -> 11L, "d" -> 100L, "e" -> 110L, "f" -> 400L)
    val buckets = Compaction.sizeTieredBuckets(runs, minSmall = 20L)
    assert(buckets.map(_.toSet) == Seq(Set("a", "c", "b"), Set("d", "e"), Set("f")))
    // 50%-of-average rule: 100 joins avg-100's bucket, 160 does not
    assert(Compaction.sizeTieredBuckets(Seq("x" -> 100L, "y" -> 160L), minSmall = 1L)
      .map(_.toSet) == Seq(Set("x"), Set("y")))
    assert(Compaction.sizeTieredBuckets(Seq("x" -> 100L, "y" -> 140L), minSmall = 1L)
      .map(_.toSet) == Seq(Set("x", "y")))
  }

  test("planMinor over real run directories groups the similar-sized runs") {
    import graft.model.CfMeta
    import graft.sources.CellStore
    val dir = java.nio.file.Files.createTempDirectory("graft_minor").toString
    // four small runs of similar size + one much larger run
    val paths = (0 until 4).map { i =>
      val p = s"$dir/run_$i"
      CellStore.write(cellsDf(Seq(ins(s"k$i", "c1", "v", 1))), CfMeta("t"), p, numPartitions = 1)
      p
    } :+ {
      // genuinely big: 200k rows of incompressible md5 values — tiny runs
      // carry ~2 MB of parquet bloom filter alone, so "big" must dominate
      // that floor, not the row count
      val p = s"$dir/run_big"
      val bigCells = spark.range(200000).select(
        format_string("k%08d", col("id")).as("key"),
        lit(null).cast("binary").as("super_name"),
        graft.functions.GraftFunctions.beBytes(col("id")).as("col_name"),
        encode(md5(col("id").cast("string")), "UTF-8").as("value"),
        lit(1L).as("ts"), lit(false).as("tombstone"), lit(0).as("local_del_time"))
      CellStore.write(bigCells, CfMeta("t"), p, numPartitions = 1)
      p
    }
    // derive the small-run threshold from the MEASURED sizes so the spec
    // doesn't depend on parquet's physical encoding staying put: anything
    // between the small runs and the big run separates the buckets
    val sizes = graft.operators.Compaction.runSizes(spark, paths).toMap
    val smallMax = (0 until 4).map(i => sizes(s"$dir/run_$i")).max
    val bigSize = sizes(s"$dir/run_big")
    assert(smallMax * 2 < bigSize, s"fixture degenerate: small=$smallMax big=$bigSize")
    val plan = graft.operators.Compaction.planMinor(spark, paths,
      minThreshold = 3, maxThreshold = 32, minSmall = (smallMax + bigSize) / 2)
    assert(plan.size == 1)
    assert(plan.head.toSet == (0 until 4).map(i => s"$dir/run_$i").toSet)
  }

  test("minor-compaction plan: only buckets at minThreshold, capped at maxThreshold") {
    val runs = (1 to 6).map(i => s"r$i" -> (100L + i)) ++ Seq("big" -> 100000L)
    val plan = Compaction.minorCompactionPlan(runs, minThreshold = 4, maxThreshold = 5,
      minSmall = 1L)
    assert(plan.size == 1)
    assert(plan.head.size == 5 && plan.head.toSet.subsetOf((1 to 6).map(i => s"r$i").toSet))
    assert(Compaction.minorCompactionPlan(Seq("a" -> 10L, "b" -> 11L), minThreshold = 4).isEmpty)
  }
}
