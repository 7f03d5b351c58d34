package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: every main/test goes through here so the
  * engine's config is uniform (UTC, AQE, right-sized shuffle partitions,
  * ns-timestamp parquet reads).
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(master: String = s"local[$cpus]"): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries INT64 TIMESTAMP(NANOS) — surfaces as Long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // task-side output commit (v2): v1 renames every task's files
      // SEQUENTIALLY on the driver at job end, which dominates partitioned
      // writes (domainSplit emits ~100 directories) and grows with file
      // count at scale
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")

  def create(master: String = s"local[$cpus]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    graft.plans.GraftOptimizations.install(spark)
    spark
  }
}
