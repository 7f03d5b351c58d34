package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The time-partitioned event-log layout — what the [[CellStore]] token
  * layout is for keyed reads, applied to the analytics table every
  * event operator in [[graft.operators.EventOps]] scans: day-bucket
  * directory partitions so a "last 7 days" / "this cohort window" query
  * prunes 100 TB of history down to the touched days BEFORE any byte is
  * read, plus within-partition (user, time) sort so per-user lag/session
  * windows read runs that parquet page stats can skip into.
  *
  *  - `partitionBy(day)` ⇒ directory pruning: a day-range predicate
  *    lands in the scan's PartitionFilters (spec-asserted), so the
  *    planner never lists untouched days — the property that makes
  *    daily retention/funnel jobs O(window), not O(history).
  *  - `repartition(day, pmod(hash(user)))` ⇒ each day splits into
  *    `filesPerDay` user-hash shards: bounded file sizes at any daily
  *    volume, and a given user's day lands in ONE file.
  *  - `sortWithinPartitions(user, ts)` ⇒ row-group min/max on user
  *    prunes point lookups, and time-ordered runs per user make the
  *    downstream window sorts cheap merges.
  */
object EventStore {

  /** Write `events` under `path` partitioned by day (`tsCol` div
    * `bucketSize`, epoch-aligned). The day column is ADDED here and
    * comes back on read (partition column); all other columns pass
    * through unchanged.
    */
  def writeTimePartitioned(events: DataFrame, path: String, tsCol: String,
      userCol: String, bucketSize: Long = 86400000000L,
      filesPerDay: Int = 4): Unit = {
    require(bucketSize > 0, s"bucketSize $bucketSize must be positive")
    require(filesPerDay >= 1, s"filesPerDay $filesPerDay must be >= 1")
    events
      .withColumn("day", expr(s"CAST(`$tsCol` AS BIGINT) div ${bucketSize}L"))
      .repartition(col("day"), pmod(hash(col(userCol)), lit(filesPerDay)))
      .sortWithinPartitions(col(userCol), col(tsCol))
      .write.mode("overwrite").partitionBy("day").parquet(path)
  }

  /** Open the store. Day predicates prune directories; everything else
    * is an ordinary parquet scan with pushdown.
    */
  def open(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** The windowed read every recurring job starts from: days in
    * [fromDay, toDay] — a PartitionFilters-pruned scan, O(window) at
    * any history length.
    */
  def readDays(spark: SparkSession, path: String, fromDay: Long,
      toDay: Long): DataFrame =
    open(spark, path).filter(col("day") >= fromDay && col("day") <= toDay)

  /** Retention: drop every day partition BEFORE `keepFromDay` (the
    * nightly expiry task — the maintenance analog of the fork's
    * snapshot-retention cleanup, at event grain). Directory deletes
    * only — no rewrite, no scan of surviving days; returns the number
    * of day partitions removed. Readers see the post-expiry view
    * immediately (each read lists directories fresh).
    */
  def expireDays(spark: SparkSession, path: String,
      keepFromDay: Long): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("day="))
      .flatMap { st =>
        val d = st.getPath.getName.stripPrefix("day=")
        try Some((st.getPath, d.toLong)) catch { case _: Exception => None }
      }
      .filter(_._2 < keepFromDay)
      // count only CONFIRMED deletes: a failed delete (permissions, a
      // non-POSIX FS holding open files) must not report as expired
      .map { case (dir, _) => if (fs.delete(dir, true)) 1L else 0L }
      .sum
  }
}
