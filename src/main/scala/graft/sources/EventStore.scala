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
    val withDay = events
      .withColumn("day", expr(s"CAST(`$tsCol` AS BIGINT) div ${bucketSize}L"))
    withDay
      .repartition(col("day"), pmod(hash(col(userCol)), lit(filesPerDay)))
      .sortWithinPartitions(col(userCol), col(tsCol))
      .write.mode("overwrite").partitionBy("day").parquet(path)
    // Schema sidecar: lets `open` return an EMPTY frame (not an
    // unable-to-infer-schema failure) after retention expires every day
    // partition — the nightly expireDays round trip must survive a
    // keepFromDay beyond the newest day. expireDays deletes only day=
    // dirs, so the sidecar persists.
    val p = new org.apache.hadoop.fs.Path(path, SchemaSidecar)
    val fs = p.getFileSystem(events.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(withDay.schema.json.getBytes("UTF-8")) finally out.close()
  }

  private val SchemaSidecar = "_graft_schema.json"

  /** Open the store. Day predicates prune directories; everything else
    * is an ordinary parquet scan with pushdown. The sidecar schema is
    * applied on BOTH the live and the fully-expired path — partition
    * TYPE INFERENCE would otherwise type `day` from the surviving
    * directory values (IntegerType for small days) while the expired
    * path replays the write-time BIGINT, and a consumer compiled against
    * one shape would break when retention flips the store to the other.
    * Pre-sidecar stores (no `_graft_schema.json`) fall back to plain
    * inference when live and fail loudly when empty.
    */
  def open(spark: SparkSession, path: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasDays = fs.exists(root) && fs.listStatus(root).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("day="))
    val sp = new org.apache.hadoop.fs.Path(root, SchemaSidecar)
    val schema = if (fs.exists(sp)) {
      val in = fs.open(sp)
      val json = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
        buf.toString("UTF-8")
      } finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    } else None
    (hasDays, schema) match {
      case (true, Some(sc)) => spark.read.schema(sc).parquet(path)
      case (true, None) => spark.read.parquet(path)
      case (false, Some(sc)) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sc)
      case (false, None) => throw new IllegalStateException(
        s"EventStore at $path has no day= partitions and no schema sidecar")
    }
  }

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
