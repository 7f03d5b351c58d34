package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: every main/test goes through here so the
  * engine's config is uniform (UTC, AQE, right-sized shuffle partitions,
  * ns-timestamp parquet reads).
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  /** @param taskSideCommit v2 file-output commit: tasks publish their files
    *   as they finish instead of the driver renaming them sequentially at
    *   job end. ~100-directory partitioned writes (domainSplit) commit in
    *   parallel, but a FAILED job leaves partial task output visible at the
    *   destination — v1's all-or-nothing job commit does not. So v2 is
    *   opt-in for throughput-measuring sessions (Bench, ScaleProbe) whose
    *   output dirs are ephemeral; durable writes default to v1, and the
    *   publish paths that must be atomic under v2 too go through
    *   temp-dir+rename (compactWithHorizons) or staging-table rename-aside
    *   (replaceTable/compactBucketed).
    */
  def builder(master: String = s"local[$cpus]",
      taskSideCommit: Boolean = false): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries INT64 TIMESTAMP(NANOS) — surfaces as Long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
        if (taskSideCommit) "2" else "1")
      .config("spark.ui.enabled", "false")

  def create(master: String = s"local[$cpus]",
      taskSideCommit: Boolean = false): SparkSession = {
    val spark = builder(master, taskSideCommit).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    graft.plans.GraftOptimizations.install(spark)
    spark
  }
}
