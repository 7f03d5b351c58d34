package graft

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
}
