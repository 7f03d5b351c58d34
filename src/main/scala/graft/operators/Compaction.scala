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

  /** Size-tiered bucketing of immutable runs by file size — the minor-
    * compaction candidate selector (CompactionManager.getBuckets,
    * db/CompactionManager.java:614-660): after sorting by size, a run
    * joins a bucket when it is within 50% of the bucket's running average,
    * or when run and bucket are both "small" (< minSmall, default 50 MB);
    * otherwise it opens a new bucket. Deterministic refinement: buckets
    * are probed in creation order (the reference probes HashMap iteration
    * order — deterministic only per-JVM; CHANGES.txt 0.6.9 made the sort
    * deterministic, this makes the probe order deterministic too).
    */
  def sizeTieredBuckets[T](runs: Seq[(T, Long)], minSmall: Long = 50L << 20): Seq[Seq[T]] = {
    case class Bucket(var members: Vector[T], var avg: Long)
    val buckets = scala.collection.mutable.ArrayBuffer.empty[Bucket]
    runs.sortBy(_._2).foreach { case (run, size) =>
      buckets.find(b =>
        (size > b.avg / 2 && size < 3 * b.avg / 2) || (size < minSmall && b.avg < minSmall)
      ) match {
        case Some(b) =>
          b.avg = (b.avg * b.members.size + size) / (b.members.size + 1)
          b.members :+= run
        case None => buckets += Bucket(Vector(run), size)
      }
    }
    buckets.map(_.members).toSeq
  }

  /** Minor-compaction plan (submitMinorIfNeeded, :87-141): buckets with at
    * least `minThreshold` runs are compacted, at most `maxThreshold` runs
    * per job (smallest first, like the reference's subList cap).
    */
  def minorCompactionPlan[T](runs: Seq[(T, Long)], minThreshold: Int = 4,
      maxThreshold: Int = 32, minSmall: Long = 50L << 20): Seq[Seq[T]] =
    sizeTieredBuckets(runs, minSmall)
      .filter(_.size >= minThreshold)
      .map(_.take(maxThreshold))

  /** On-disk sizes of a set of run directories (the SSTable manifest the
    * size-tiered planner consumes) — one filesystem call per run, no data
    * read.
    */
  def runSizes(spark: org.apache.spark.sql.SparkSession, runPaths: Seq[String]): Seq[(String, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    runPaths.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      p -> hp.getFileSystem(conf).getContentSummary(hp).getLength
    }
  }

  /** Minor-compaction plan over real run directories: measure sizes, pick
    * size-tiered buckets, return the groups of run paths to merge (each
    * group = one compact() + rewrite job).
    */
  def planMinor(spark: org.apache.spark.sql.SparkSession, runPaths: Seq[String],
      minThreshold: Int = 4, maxThreshold: Int = 32,
      minSmall: Long = 50L << 20): Seq[Seq[String]] =
    minorCompactionPlan(runSizes(spark, runPaths), minThreshold, maxThreshold, minSmall)

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
