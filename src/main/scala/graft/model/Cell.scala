package graft.model

import org.apache.spark.sql.types._

/** The canonical cell-store row (SURVEY §1.4).
  *
  * One row per Cassandra column version. A Cassandra 0.6 "row" (key →
  * sorted columns) is the group of cells sharing `key`; a supercolumn is
  * the group sharing (`key`, `super_name`).
  *
  * Container (row / supercolumn) tombstones — reference
  * `db/ColumnFamily.java:233-252`, `db/SuperColumn.java:84-92` — are
  * carried as marker cells with `col_name = NULL` (and `super_name = NULL`
  * for a whole-row delete), mirroring markedForDeleteAt/localDeletionTime.
  *
  * @param key            row key (Thrift API keys are strings; cassandra.thrift:301)
  * @param super_name     supercolumn name, null for standard CFs
  * @param col_name       comparator-typed column name bytes; null ⇒ container tombstone marker
  * @param value          opaque value bytes (reference values are always binary)
  * @param ts             client-supplied timestamp (cassandra.thrift:64) — LWW priority
  * @param tombstone      Column.isMarkedForDelete (db/Column.java:54)
  * @param local_del_time server-clock seconds at delete; drives gcGrace GC (db/Column.java:189-193)
  */
case class Cell(
    key: String,
    super_name: Array[Byte],
    col_name: Array[Byte],
    value: Array[Byte],
    ts: Long,
    tombstone: Boolean,
    local_del_time: Int)

object Cell {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("super_name", BinaryType, nullable = true),
    StructField("col_name", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("ts", LongType, nullable = false),
    StructField("tombstone", BooleanType, nullable = false),
    StructField("local_del_time", IntegerType, nullable = false)))

  val columns: Seq[String] =
    Seq("key", "super_name", "col_name", "value", "ts", "tombstone", "local_del_time")
}

/** Comparator names, mirroring db/marshal/Types.java:14-52. */
object ComparatorType extends Enumeration {
  val Bytes, Ascii, Utf8, Long_, TimeUuid, LexicalUuid, FreshTimestamp, Collating = Value
}

/** Partitioner names, mirroring dht/IPartitioner implementations. */
object PartitionerType extends Enumeration {
  /** md5 BigInteger token — dht/RandomPartitioner.java:35-130 */
  val Random = Value
  /** key IS the token — dht/OrderPreservingPartitioner.java:31-175 */
  val OrderPreserving = Value
  /** last-2-hex-chars "domain" moved to front — dht/OdklDomainPartitioner.java:36-120 (fork) */
  val OdklDomain = Value
  /** md5 hex-string token: same hash placement idea as Random but without
    * the BigInteger.abs() fold, so any SQL engine computes the identical
    * token — used by oracle-checked scans; abs() ordering is covered by
    * property tests.
    */
  val Md5Hex = Value
}

/** Per-column-family metadata (config/CFMetaData.java:30-88).
  * `domainSplit` mirrors the fork's sharding of one logical CF into 256
  * physical CFs by the 2-char key domain (config/CFMetaData.java:49-53):
  * here the domain is a Spark PARTITION COLUMN, so keyed reads prune whole
  * directories before any file IO.
  */
case class CfMeta(
    name: String,
    comparator: ComparatorType.Value = ComparatorType.Bytes,
    subComparator: ComparatorType.Value = ComparatorType.Bytes,
    isSuper: Boolean = false,
    partitioner: PartitionerType.Value = PartitionerType.OrderPreserving,
    gcGraceSeconds: Int = 864000,
    domainSplit: Boolean = false)
