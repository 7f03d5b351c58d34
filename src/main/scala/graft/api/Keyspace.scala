package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.CfMeta
import graft.sources.CellStore

/** Keyspace = Spark catalog namespace (SURVEY §1.1: db/Table.java:52-60 →
  * `spark.catalog` database). Column families live as bucketed tables
  * inside the namespace; CF metadata is carried in table properties via a
  * naming convention so a lens can be re-opened from the catalog alone —
  * the describe_keyspace(s) surface (thrift:429-443).
  */
class Keyspace(val spark: SparkSession, val name: String) {
  spark.sql(s"CREATE DATABASE IF NOT EXISTS $name")

  private def tableName(cf: String) = s"$name.$cf"

  /** Create/replace a column family from a cell DataFrame (bucketed by key
    * — per-key reads and reconcile run shuffle-free).
    */
  private def hrowTable(cf: String) = s"${tableName(cf)}__hrow"
  private def hscTable(cf: String) = s"${tableName(cf)}__hsc"

  /** Create/replace a column family plus its tombstone-horizon sidecar
    * tables. The horizons are tiny (they are deletes); persisting them
    * means every read joins two small tables instead of re-aggregating
    * marker cells out of the big table — the keyspace face of
    * CellStore.writeWithHorizons, and at 100 TB the difference between
    * one scan of the store per query and three.
    *
    * `meta.domainSplit` drives the physical layout, exactly like the
    * fork's CFMetaData flag: domain-partitioned + bucketed when set
    * (directory pruning AND shuffle-free reconcile), plain bucketed
    * otherwise. Compaction preserves whichever layout the metadata names.
    */
  def saveColumnFamily(cells: DataFrame, meta: CfMeta, buckets: Int = 32): Unit = {
    CellStore.dropManaged(spark, tableName(meta.name))
    if (meta.domainSplit)
      CellStore.writeDomainBucketed(cells, meta, tableName(meta.name), buckets)
    else
      CellStore.writeBucketed(cells, meta, tableName(meta.name), buckets)
    setMetaProperties(meta)
    CellStore.dropManaged(spark, hrowTable(meta.name))
    CellStore.dropManaged(spark, hscTable(meta.name))
    graft.operators.Reconcile.rowTombstones(cells)
      .write.format("parquet").saveAsTable(hrowTable(meta.name))
    graft.operators.Reconcile.superTombstones(cells)
      .write.format("parquet").saveAsTable(hscTable(meta.name))
  }

  /** Major compaction of a stored CF in place (reconcile + gcGrace purge,
    * shuffle-free over the bucketed layout; see CellStore.compactBucketed).
    * Metadata properties are re-applied — the rename-published staging
    * table starts without them.
    */
  def compactColumnFamily(meta: CfMeta, gcBeforeSeconds: Int, buckets: Int = 32,
      processors: Seq[graft.operators.Compaction.RowProcessor] = Nil): Unit = {
    CellStore.compactBucketed(spark, tableName(meta.name), meta, gcBeforeSeconds,
      buckets, processors)
    setMetaProperties(meta)
    // incremental sidecar refresh: horizons only shrink under compaction
    // (entries past the gcGrace horizon purge; no new markers appear), so
    // the refresh filters the OLD sidecar — never rescans the store
    if (spark.catalog.tableExists(hrowTable(meta.name)))
      CellStore.replaceTable(spark, hrowTable(meta.name),
        spark.table(hrowTable(meta.name)).filter(col("row_del_ldt") >= gcBeforeSeconds))
    if (spark.catalog.tableExists(hscTable(meta.name)))
      CellStore.replaceTable(spark, hscTable(meta.name),
        spark.table(hscTable(meta.name)).filter(col("sc_del_ldt") >= gcBeforeSeconds))
  }

  /** Open a lens over a stored column family; when the horizon sidecar
    * tables exist, reads join them instead of re-aggregating markers.
    */
  def columnFamily(meta: CfMeta): CassandraLens = {
    val horizons =
      if (spark.catalog.tableExists(hrowTable(meta.name)) &&
        spark.catalog.tableExists(hscTable(meta.name)))
        Some((spark.table(hrowTable(meta.name)), spark.table(hscTable(meta.name))))
      else None
    new CassandraLens(spark.table(tableName(meta.name)), meta, horizons)
  }

  // ---- CF metadata in the catalog (config/CFMetaData.java:30-88 →
  // table properties; describe_keyspace returns real metadata, and a lens
  // re-opens from the catalog alone) ----

  private def setMetaProperties(meta: CfMeta): Unit = {
    val props = Map(
      "graft.comparator" -> meta.comparator.toString,
      "graft.subComparator" -> meta.subComparator.toString,
      "graft.isSuper" -> meta.isSuper.toString,
      "graft.partitioner" -> meta.partitioner.toString,
      "graft.gcGraceSeconds" -> meta.gcGraceSeconds.toString,
      "graft.domainSplit" -> meta.domainSplit.toString)
      .map { case (k, v) => s"'$k' = '$v'" }.mkString(", ")
    spark.sql(s"ALTER TABLE ${tableName(meta.name)} SET TBLPROPERTIES ($props)")
  }

  /** Reconstruct a CF's metadata from its catalog table properties. */
  def columnFamilyMeta(cf: String): CfMeta = {
    val props = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(cf, Some(name))).properties
    CfMeta(cf,
      comparator = graft.model.ComparatorType.withName(
        props.getOrElse("graft.comparator", "Bytes")),
      subComparator = graft.model.ComparatorType.withName(
        props.getOrElse("graft.subComparator", "Bytes")),
      isSuper = props.getOrElse("graft.isSuper", "false").toBoolean,
      partitioner = graft.model.PartitionerType.withName(
        props.getOrElse("graft.partitioner", "OrderPreserving")),
      gcGraceSeconds = props.getOrElse("graft.gcGraceSeconds", "864000").toInt,
      domainSplit = props.getOrElse("graft.domainSplit", "false").toBoolean)
  }

  /** Open a lens by NAME alone — metadata comes from the catalog, the
    * describe_keyspace round trip (thrift:429-443).
    */
  def columnFamily(cf: String): CassandraLens = columnFamily(columnFamilyMeta(cf))

  /** describe_keyspace: list column families in the namespace (horizon
    * sidecar and staging tables are internal — filtered out).
    */
  def describe(): DataFrame =
    spark.sql(s"SHOW TABLES IN $name").select(col("tableName").as("column_family"))
      .filter(!col("column_family").rlike("__(hrow|hsc|compacting|staging)$"))

  /** describe_keyspace with full CF metadata (thrift:437-443 returns the
    * CfDef fields; here they come back out of the table properties).
    */
  def describeDetailed(): DataFrame = {
    import spark.implicits._
    describe().collect().map(_.getString(0))
      .map { cf =>
        val m = columnFamilyMeta(cf)
        (cf, m.comparator.toString, m.subComparator.toString, m.isSuper,
          m.partitioner.toString, m.gcGraceSeconds, m.domainSplit)
      }.toSeq
      .toDF("column_family", "comparator", "sub_comparator", "is_super",
        "partitioner", "gc_grace_seconds", "domain_split")
  }

  /** Q8 `batch_mutate` across column families (thrift:415-418 —
    * map<key, map<cf, list<Mutation>>>; RowMutation folds all CFs of one
    * key into one commit-log entry, db/RowMutation.java:270-289). Every
    * CF's mutation cells are applied in ONE logical batch; the returned
    * lenses all observe the batch or none of it (the caller swaps views
    * together) — the structural analog of the reference's atomic-per-row
    * multi-CF apply.
    */
  def batchMutate(batch: Map[CfMeta, Seq[DataFrame]]): Map[String, CassandraLens] =
    batch.map { case (meta, muts) =>
      meta.name -> columnFamily(meta).batchMutate(muts: _*)
    }

  def drop(): Unit = spark.sql(s"DROP DATABASE IF EXISTS $name CASCADE")
}

object Keyspace {
  def apply(spark: SparkSession, name: String): Keyspace = new Keyspace(spark, name)
}

/** Thrift-shaped result materialization (SURVEY §1.4): rows as
  * key → comparator-ordered array of columns — the `thriftifyColumns`
  * sink (thrift/CassandraServer.java:112-208) as one aggregation.
  */
object Thriftify {
  import graft.model.{Comparators, ComparatorType}

  /** (key, columns: array<struct<name,value,ts>>) — array sorted by the
    * comparator's order via a sort-key-first struct (sort_array orders by
    * the leading fields; reversal applied at materialization, matching the
    * reference).
    */
  def rows(live: DataFrame, cmp: ComparatorType.Value, reversed: Boolean = false): DataFrame = {
    val sorted = sort_array(
      collect_list(struct(
        Comparators.sortKey(cmp, col("col_name")).as("_sk"),
        col("col_name").as("name"), col("value").as("value"), col("ts").as("ts"))),
      asc = !reversed)
    live.groupBy(col("key"))
      .agg(sorted.as("_cols"))
      .select(col("key"),
        expr("transform(_cols, c -> struct(c.name AS name, c.value AS value, c.ts AS ts))")
          .as("columns"))
  }

  /** Super-CF rows: key → comparator-ordered array of supercolumns, each
    * holding its subcomparator-ordered subcolumn array — the two-level
    * ColumnOrSuperColumn nesting (thrift:72-90) as nested arrays.
    */
  def superRows(live: DataFrame, cmp: ComparatorType.Value,
      subCmp: ComparatorType.Value): DataFrame = {
    val subSorted = sort_array(
      collect_list(struct(
        Comparators.sortKey(subCmp, col("col_name")).as("_sk"),
        col("col_name").as("name"), col("value").as("value"), col("ts").as("ts"))))
    val perSuper = live
      .groupBy(col("key"), col("super_name"))
      .agg(subSorted.as("_cols"))
      .select(col("key"), col("super_name"),
        expr("transform(_cols, c -> struct(c.name AS name, c.value AS value, c.ts AS ts))")
          .as("columns"))
    perSuper
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(
        Comparators.sortKey(cmp, col("super_name")).as("_sk"),
        col("super_name").as("name"), col("columns").as("columns")))).as("_sc"))
      .select(col("key"),
        expr("transform(_sc, s -> struct(s.name AS name, s.columns AS columns))")
          .as("super_columns"))
  }
}
