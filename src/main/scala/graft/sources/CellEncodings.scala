package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.model.{CfMeta, ComparatorType, PartitionerType}

/** Deterministic encodings of the driver's TPC-H-ish parquet tables into
  * cell stores (FIXTURES.md §3) — every encoding is reproducible in plain
  * SQL so the DuckDB oracle can compute the expected reconciled output.
  *
  * Key convention: numeric ids as zero-padded 10-char strings (stress.py's
  * key shape, contrib/py_stress/stress.py:62-78) — lexicographic ==
  * numeric order, so OrderPreservingPartitioner scans are oracle-friendly.
  */
object CellEncodings {

  /** Loads a driver parquet table, normalizing any `ts` column to epoch
    * NANOS as BIGINT regardless of the file's physical type. The driver has
    * shipped events.ts as both INT64 TIMESTAMP(NANOS) (reads as Long under
    * nanosAsLong) and timestamp[us] (reads as TIMESTAMP_NTZ); every
    * downstream encoding and oracle treats ts as a Long nanos value, so the
    * conversion happens once here. Session timezone is UTC (GraftSession),
    * so the NTZ→timestamp cast is identity on the wall-clock value — the
    * same naive-UTC reading DuckDB's epoch_us(ts) applies on the oracle
    * side.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.TimestampType) |
           Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
      case _ => df
    }
    // NO blanket repartition here (round-19 measured it): widening EVERY
    // consumer taxes the cheap ones — point reads, window/event legs, and
    // the tombstone-overlay unions inside read queries each paid an extra
    // exchange + sort-before-repartition PER PLAN BRANCH, regressing the
    // read legs 1.5-2x. Heavy per-row operators widen their own narrow
    // scan inputs instead ([[graft.util.Widen.widenNarrowScan]]).
  }

  def key10(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lpad(c.cast("string"), 10, "0")

  /** `orders_by_custkey` (standard CF, LongType comparator): one row per
    * customer, columns named by 8-byte big-endian o_orderkey, value =
    * o_orderstatus bytes, ts = epoch millis of o_orderdate.
    */
  def ordersCells(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders").select(
      key10(col("o_custkey")).as("key"),
      lit(null).cast("binary").as("super_name"),
      beBytes(col("o_orderkey")).as("col_name"),
      encode(col("o_orderstatus"), "UTF-8").as("value"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("ts"),
      lit(false).as("tombstone"),
      lit(0).as("local_del_time"))

  val ordersMeta: CfMeta = CfMeta("orders_by_custkey",
    comparator = ComparatorType.Long_, partitioner = PartitionerType.OrderPreserving)

  /** Tombstone overlay deleting every order with status 'F' one millisecond
    * after it was written (column-level deletes — the LWW/tombstone
    * conformance fixture; localDeletionTime staged for gcGrace tests).
    */
  def ordersStatusFTombstones(spark: SparkSession, dir: String, localDelTime: Int = 2000000000): DataFrame =
    table(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(
        key10(col("o_custkey")).as("key"),
        lit(null).cast("binary").as("super_name"),
        beBytes(col("o_orderkey")).as("col_name"),
        lit(Array.emptyByteArray).as("value"),
        (unix_millis(col("o_orderdate").cast("timestamp")) + 1).as("ts"),
        lit(true).as("tombstone"),
        lit(localDelTime).as("local_del_time"))

  /** `events_by_user` (standard CF, LongType comparator): columns named by
    * event_id, value = event_type, ts = event-time nanos.
    */
  def eventsCells(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      key10(col("user_id")).as("key"),
      lit(null).cast("binary").as("super_name"),
      beBytes(col("event_id")).as("col_name"),
      encode(col("event_type"), "UTF-8").as("value"),
      col("ts").as("ts"),
      lit(false).as("tombstone"),
      lit(0).as("local_del_time"))

  val eventsMeta: CfMeta = CfMeta("events_by_user",
    comparator = ComparatorType.Long_, partitioner = PartitionerType.OrderPreserving)

  /** `events_by_time` (standard CF, fork FreshTimestampType comparator):
    * columns named by the 8-byte event-time — comparator order = newest
    * first, so a slice with count=k is "latest k events" (FIXTURES.md §3).
    */
  def eventsFreshCells(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events").select(
      key10(col("user_id")).as("key"),
      lit(null).cast("binary").as("super_name"),
      beBytes(col("ts")).as("col_name"),
      encode(col("event_type"), "UTF-8").as("value"),
      col("ts").as("ts"),
      lit(false).as("tombstone"),
      lit(0).as("local_del_time"))

  val eventsFreshMeta: CfMeta = CfMeta("events_by_time",
    comparator = ComparatorType.FreshTimestamp, partitioner = PartitionerType.OrderPreserving)

  /** `lineitems_super` (super CF, LongType/LongType): key = l_orderkey,
    * supercolumn = l_linenumber, subcolumns = field ordinals 1..4
    * (quantity, extendedprice-cents, discount-cents, returnflag).
    */
  def lineitemSuperCells(spark: SparkSession, dir: String): DataFrame = {
    // widen BEFORE the 4-way explode + byte/string encoding: downstream
    // of a one-row-group scan that per-cell work is the single-core wall
    // (CellStore.write's own widen would land above the explode, after
    // the expensive part) — round-19 measured insert_super ~2x on this
    val li = graft.util.Widen.widenNarrowScan(table(spark, dir, "lineitem"))
    val cents = (c: org.apache.spark.sql.Column) => round(c * 100).cast("long").cast("string")
    li.select(
      key10(col("l_orderkey")).as("key"),
      beBytes(col("l_linenumber").cast("long")).as("super_name"),
      explode(array(
        struct(lit(1L).as("ord"), col("l_quantity").cast("long").cast("string").as("v")),
        struct(lit(2L).as("ord"), cents(col("l_extendedprice")).as("v")),
        struct(lit(3L).as("ord"), cents(col("l_discount")).as("v")),
        struct(lit(4L).as("ord"), col("l_returnflag").as("v")))).as("sub"))
      .select(
        col("key"), col("super_name"),
        beBytes(col("sub.ord")).as("col_name"),
        encode(col("sub.v"), "UTF-8").as("value"),
        lit(1L).as("ts"),
        lit(false).as("tombstone"),
        lit(0).as("local_del_time"))
  }

  val lineitemSuperMeta: CfMeta = CfMeta("lineitems_super",
    comparator = ComparatorType.Long_, subComparator = ComparatorType.Long_,
    isSuper = true, partitioner = PartitionerType.OrderPreserving)

  /** `part_names` (standard CF, UTF8 comparator): columns named by p_name,
    * value = retail price cents.
    */
  def partNameCells(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "part").select(
      key10(col("p_partkey")).as("key"),
      lit(null).cast("binary").as("super_name"),
      encode(col("p_name"), "UTF-8").as("col_name"),
      encode(round(col("p_retailprice") * 100).cast("long").cast("string"), "UTF-8").as("value"),
      lit(1L).as("ts"),
      lit(false).as("tombstone"),
      lit(0).as("local_del_time"))

  val partNamesMeta: CfMeta = CfMeta("part_names",
    comparator = ComparatorType.Utf8, partitioner = PartitionerType.OrderPreserving)
}
