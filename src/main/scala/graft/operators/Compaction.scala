package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Cell

/** Compaction = the read-path merge applied table-wide (SURVEY §2.7,
  * io/CompactionIterator.java:45-290): reconcile every column, apply
  * container shadowing, purge tombstones past the gcGrace horizon, then run
  * the fork's pluggable per-row processors (db/proc/IRowProcessor.java:36-76,
  * chained by db/proc/RowProcessorChain.java) — a flatMap over (key, cells).
  *
  * One Spark job: hash-aggregate reconcile (map-side partial), small
  * broadcast-ish join for the tombstone horizons, optional per-key
  * flatMapGroups only when processors are attached (keeps the common path
  * in whole-stage codegen).
  */
object Compaction {

  /** IRowProcessor analog: rewrite or drop whole rows as they flow through
    * compaction (TTL retention, migration). Receives the reconciled,
    * GC-filtered cells of one row.
    */
  trait RowProcessor extends Serializable {
    def process(key: String, cells: Iterator[Cell]): Iterator[Cell]
  }

  /** RemoveDeletedRowProcessor (db/proc/RemoveDeletedRowProcessor.java:20-100)
    * is implicit in `Reconcile.compacted`; this built-in mirrors the fork's
    * retention use-case: drop cells older than a timestamp horizon.
    */
  case class RetentionProcessor(minTs: Long) extends RowProcessor {
    override def process(key: String, cells: Iterator[Cell]): Iterator[Cell] =
      cells.filter(c => c.ts >= minTs || c.col_name == null)
  }

  def compact(
      cells: DataFrame,
      gcBeforeSeconds: Int,
      processors: Seq[RowProcessor] = Nil): DataFrame = {
    val merged = Reconcile.compacted(cells, gcBeforeSeconds)
    if (processors.isEmpty) merged
    else {
      val spark = merged.sparkSession
      import spark.implicits._
      merged
        .select(Cell.columns.map(col): _*)
        .as[Cell]
        .groupByKey(_.key)
        .flatMapGroups { (k, it) =>
          processors.foldLeft(it: Iterator[Cell])((acc, p) => p.process(k, acc))
        }
        .toDF()
    }
  }
}
