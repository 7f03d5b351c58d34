package graft

import org.apache.spark.sql.functions._

import graft.api.{Keyspace, Thriftify}
import graft.model.{Cell, CfMeta, ComparatorType}
import graft.operators.Reconcile

class KeyspaceSpec extends SparkSpec {

  test("keyspace namespace: save, describe, reopen, query") {
    val loc = new java.io.File("spark-warehouse/graft_ks.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ks")
    try {
      val meta = CfMeta("cf1")
      ks.saveColumnFamily(cellsDf(Seq(
        ins("k1", "c1", "v1", 1), ins("k1", "c1", "v2", 5), ins("k2", "c1", "w", 1))),
        meta, buckets = 4)
      assert(ks.describe().collect().map(_.getString(0)).contains("cf1"))
      val lens = ks.columnFamily(meta)
      assert(liveValues(lens.getSlice("k1", None, graft.operators.SliceRange(count = 10)))
        == Map("c1" -> "v2"))
    } finally ks.drop()
  }

  test("archived mutation log: replay-at, daysOld retention cutoff, junk skipped") {
    val loc = new java.io.File("spark-warehouse/graft_ksla.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ksla")
    try {
      val meta = CfMeta("cf1")
      val day = 86400000L
      // three discarded segments at day stamps 1/2/3 (ts inside matches)
      ks.archiveMutationLog(cellsDf(Seq(ins("k1", "c1", "v1", 1 * day))), 1 * day)
      ks.archiveMutationLog(cellsDf(Seq(ins("k1", "c1", "v2", 2 * day))), 2 * day)
      ks.archiveMutationLog(cellsDf(Seq(ins("k2", "c1", "w", 3 * day),
        del("k1", "c1", 3 * day))), 3 * day)
      assert(ks.archivedLogSegments() == Seq(1 * day, 2 * day, 3 * day))
      // PIT replay: at ts 2·day the LWW winner is v2 and k2/tombstone absent
      val at2 = ks.replayArchivedLogs(meta, 2 * day)
      assert(liveValues(at2.getSlice("k1", None,
        graft.operators.SliceRange(count = 10))) == Map("c1" -> "v2"))
      // full replay: k1.c1 tombstoned away, k2 live
      val at3 = ks.replayArchivedLogs(meta, 3 * day)
      assert(liveValues(at3.getSlice("k2", None,
        graft.operators.SliceRange(count = 10))) == Map("c1" -> "w"))
      assert(at3.getSlice("k1", None,
        graft.operators.SliceRange(count = 10)).isEmpty)
      // junk dir in the archive is skipped, never deleted
      val junk = new java.io.File(loc, "__logarchive/not-a-log")
      junk.mkdirs()
      // retention at now = 4·day, daysOld = 2: cutoff 2·day INCLUSIVE →
      // segments 1 and 2 go, 3 stays; rerun is a no-op
      assert(ks.cleanArchivedLogs(2, 4 * day) == Seq(1 * day, 2 * day))
      assert(ks.cleanArchivedLogs(2, 4 * day).isEmpty)
      assert(ks.archivedLogSegments() == Seq(3 * day) && junk.exists())
    } finally ks.drop()
  }

  test("multi-CF batch_mutate: one batch lands in every column family's view") {
    val loc = new java.io.File("spark-warehouse/graft_ks2.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ks2")
    try {
      val m1 = CfMeta("cfa")
      val m2 = CfMeta("cfb")
      ks.saveColumnFamily(cellsDf(Seq(ins("k1", "c1", "old", 1))), m1, buckets = 2)
      ks.saveColumnFamily(cellsDf(Seq(ins("k1", "d1", "keep", 1), ins("k1", "d2", "gone", 1))),
        m2, buckets = 2)
      // one batch: upsert into cfa, delete a column of the SAME key in cfb
      val updated = ks.batchMutate(Map(
        m1 -> Seq(graft.operators.Mutations.asInserts(cellsDf(Seq(ins("k1", "c1", "new", 9))))),
        m2 -> Seq(graft.operators.Mutations.asColumnDeletes(
          cellsDf(Seq(del("k1", "d2", 9))), localDeletionTimeSec = 100))))
      assert(liveValues(updated("cfa").getSlice("k1", None, graft.operators.SliceRange(count = 10)))
        == Map("c1" -> "new"))
      assert(liveValues(updated("cfb").getSlice("k1", None, graft.operators.SliceRange(count = 10)))
        == Map("d1" -> "keep"))
    } finally ks.drop()
  }

  test("bucketed compaction in place: purge, equality, layout preserved") {
    val loc = new java.io.File("spark-warehouse/graft_ks3.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ks3")
    try {
      val meta = CfMeta("cfc")
      val cells = Seq(
        ins("k1", "c1", "old", 1), ins("k1", "c1", "new", 5),
        ins("k1", "c2", "keep", 10), del("k1", "c2", 9, ldt = 100), // tombstone loses + purges
        ins("k2", "c1", "x", 1), delRow("k2", 7, ldt = 100), // row shadowed+purged
        ins("k3", "c1", "alive", 3))
      ks.saveColumnFamily(cellsDf(cells), meta, buckets = 4)
      ks.compactColumnFamily(meta, gcBeforeSeconds = 500, buckets = 4)

      // physical state: tombstones purged, LWW losers gone
      val stored = spark.table("graft_ks3.cfc")
      assert(stored.filter(col("tombstone")).count() == 0, "tombstones must be GC'd")
      def canon(df: org.apache.spark.sql.DataFrame): Set[(String, String, String, Long)] =
        df.select(col("key"), decode(col("col_name"), "UTF-8"),
          decode(col("value"), "UTF-8"), col("ts"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      val expected = graft.operators.Compaction.compact(cellsDf(cells), gcBeforeSeconds = 500)
      assert(canon(stored) == canon(expected),
        "in-place compaction must equal the plain compaction result")

      // layout preserved: still bucketed, and the staging table is gone
      val bucketSpec = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("cfc", Some("graft_ks3"))).bucketSpec
      assert(bucketSpec.exists(s => s.numBuckets == 4 && s.bucketColumnNames == Seq("key")),
        s"compacted table must keep its bucket spec, got $bucketSpec")
      assert(!spark.catalog.tableExists("graft_ks3.cfc__compacting"))

      // reads after the swap still answer correctly
      val lens = ks.columnFamily(meta)
      assert(liveValues(lens.getSlice("k1", None, graft.operators.SliceRange(count = 10)))
        == Map("c1" -> "new", "c2" -> "keep"))
      assert(lens.getSlice("k2", None, graft.operators.SliceRange(count = 10)).isEmpty)
    } finally ks.drop()
  }

  test("CF metadata round-trips through catalog table properties") {
    val loc = new java.io.File("spark-warehouse/graft_ks4.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ks4")
    try {
      val meta = CfMeta("cfm",
        comparator = ComparatorType.Long_,
        subComparator = ComparatorType.TimeUuid,
        isSuper = true,
        partitioner = graft.model.PartitionerType.OdklDomain,
        gcGraceSeconds = 1234,
        domainSplit = true)
      ks.saveColumnFamily(cellsDf(Seq(
        Cell("k1", b("sc"), bl(1L), b("v"), 1, tombstone = false, 0))), meta, buckets = 2)
      assert(ks.columnFamilyMeta("cfm") == meta)
      val det = ks.describeDetailed().collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getBoolean(3), r.getBoolean(6)))).toMap
      assert(det("cfm") == (("Long_", true, true)))
      // the by-name lens observes the metadata (super slicing works)
      val lens = ks.columnFamily("cfm")
      assert(lens.meta.isSuper && lens.meta.comparator == ComparatorType.Long_)
      // compaction keeps the properties through the staging-table rename
      ks.compactColumnFamily(meta, gcBeforeSeconds = 0, buckets = 2)
      assert(ks.columnFamilyMeta("cfm") == meta)
    } finally ks.drop()
  }

  test("keyspace horizon sidecar: one store scan, equal results, compaction purge") {
    val loc = new java.io.File("spark-warehouse/graft_ks5.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ks5")
    try {
      val meta = CfMeta("cfh")
      val cells = Seq(
        ins("k1", "c1", "v1", 5), ins("k2", "c1", "dead", 1),
        delRow("k2", 7, ldt = 100),
        ins("k3", "c1", "v3", 3))
      ks.saveColumnFamily(cellsDf(cells), meta, buckets = 2)
      val lens = ks.columnFamily("cfh")
      assert(lens.horizons.isDefined, "sidecar tables must be picked up")
      val plain = new graft.api.CassandraLens(spark.table("graft_ks5.cfh"), meta)
      def canon(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
        df.select(col("key"), decode(col("value"), "UTF-8"))
          .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(canon(lens.live) == canon(plain.live))
      assert(canon(lens.live) == Set("k1" -> "v1", "k3" -> "v3")) // k2 row-shadowed
      // plan: the sidecar lens scans the BIG table once; the self-computing
      // lens scans it for data + row horizons + sc horizons
      def storeScans(p: String): Int =
        p.linesIterator.count(l => l.contains("FileScan") && l.contains("cfh[")
          && !l.contains("__h"))
      assert(storeScans(lens.live.queryExecution.executedPlan.toString) == 1)
      assert(storeScans(plain.live.queryExecution.executedPlan.toString) == 3)

      // compaction refreshes the sidecar by FILTERING it (no store rescan):
      // the purged row marker leaves both the store and the sidecar
      ks.compactColumnFamily(meta, gcBeforeSeconds = 500, buckets = 2)
      assert(spark.table("graft_ks5.cfh__hrow").isEmpty)
      val after = ks.columnFamily("cfh")
      assert(after.getSlice("k2", None, graft.operators.SliceRange(count = 10)).isEmpty)
      assert(liveValues(after.getSlice("k1", None, graft.operators.SliceRange(count = 10)))
        == Map("c1" -> "v1"))
    } finally ks.drop()
  }

  test("domainSplit metadata drives the keyspace layout; compaction preserves it") {
    val loc = new java.io.File("spark-warehouse/graft_ks6.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ks6")
    try {
      val meta = CfMeta("cfd", domainSplit = true)
      val cells = Seq(
        ins("alpha01", "c1", "v1", 5), ins("beta02", "c1", "v2", 3),
        ins("gamma01", "c1", "dead", 1), delRow("gamma01", 7, ldt = 100))
      ks.saveColumnFamily(cellsDf(cells), meta, buckets = 2)
      def cat() = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("cfd", Some("graft_ks6")))
      assert(cat().partitionColumnNames == Seq("domain"))
      assert(cat().bucketSpec.exists(_.numBuckets == 2))

      val lens = ks.columnFamily("cfd") // domainSplit arrives via properties
      assert(lens.meta.domainSplit)
      val read = lens.multigetSlice(Seq("alpha01"), None, graft.operators.SliceRange(count = 5))
      val formatted = read.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(formatted.contains("PartitionFilters") && formatted.contains("domain"),
        formatted.take(2500))
      assert(liveValues(read) == Map("c1" -> "v1"))

      // compaction keeps the composed layout AND the results
      ks.compactColumnFamily(meta, gcBeforeSeconds = 500, buckets = 2)
      assert(cat().partitionColumnNames == Seq("domain"))
      assert(cat().bucketSpec.exists(_.numBuckets == 2))
      val after = ks.columnFamily("cfd")
      assert(after.getSlice("gamma01", None, graft.operators.SliceRange(count = 5)).isEmpty)
      assert(liveValues(after.getSlice("beta02", None, graft.operators.SliceRange(count = 5)))
        == Map("c1" -> "v2"))
    } finally ks.drop()
  }

  test("anti-entropy diffRanges flags only the buckets that differ") {
    val a = cellsDf((0 until 64).map(i => ins(f"k$i%03d", "c", "v", 1)))
    // b: one key's value changed, one key missing entirely
    val b0 = (0 until 64).filterNot(_ == 50).map { i =>
      if (i == 7) ins(f"k$i%03d", "c", "CHANGED", 1) else ins(f"k$i%03d", "c", "v", 1)
    }
    val diff = graft.operators.Validation.diffRanges(a, cellsDf(b0), buckets = 16)
      .collect()
    val expect = Set("k007", "k050").map { k =>
      Math.floorMod(
        a.filter(org.apache.spark.sql.functions.col("key") === k)
          .select(org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("key"))).head().getLong(0), 16L)
    }
    assert(diff.map(_.getLong(0)).toSet == expect,
      s"differing buckets must be exactly those of k007/k050: got ${diff.mkString(",")}")
    // identical stores: no differing ranges
    assert(graft.operators.Validation.diffRanges(a, a, buckets = 16).isEmpty)
  }

  test("thriftify super rows: two-level nesting in both comparator orders") {
    val live = Reconcile.liveView(cellsDf(Seq(
      ins("k1", "c2", "v2", 1, sup = "sc2"), ins("k1", "c1", "v1", 1, sup = "sc2"),
      ins("k1", "c9", "v9", 1, sup = "sc1"))))
    val row = Thriftify.superRows(live, ComparatorType.Bytes, ComparatorType.Bytes).head()
    val sc = row.getSeq[org.apache.spark.sql.Row](1)
    assert(sc.map(r => new String(r.getAs[Array[Byte]]("name"), "UTF-8")) == Seq("sc1", "sc2"))
    val sub2 = sc(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => new String(r.getAs[Array[Byte]]("name"), "UTF-8"))
    assert(sub2 == Seq("c1", "c2"))
  }

  test("get on a supercolumn path returns the whole live supercolumn") {
    val cells = Seq(
      ins("k1", "c1", "v1", 1, sup = "sc1"), ins("k1", "c2", "v2", 1, sup = "sc1"),
      del("k1", "c2", 2, sup = "sc1"), ins("k1", "cX", "w", 1, sup = "sc2"))
    val lens = new graft.api.CassandraLens(cellsDf(cells),
      CfMeta("s", isSuper = true))
    assert(liveValues(lens.getSuperColumn("k1", b("sc1"))) == Map("c1" -> "v1"))
  }

  test("reversed top-level super slice: supercolumns from the top") {
    val cells = Seq(
      ins("k1", "c1", "v", 1, sup = "sc1"), ins("k1", "c1", "v", 1, sup = "sc2"),
      ins("k1", "c1", "v", 1, sup = "sc3"))
    val lens = new graft.api.CassandraLens(cellsDf(cells), CfMeta("s", isSuper = true))
    val r = lens.getSlice("k1", None,
      graft.operators.SliceRange(reversed = true, count = 2))
    val supers = r.select(org.apache.spark.sql.functions.decode(
      org.apache.spark.sql.functions.col("super_name"), "UTF-8"))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(supers == Seq("sc2", "sc3"))
  }

  test("row cache save + reopen-preheat: reads equal cold, reconcile never re-runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rowcache").toString
    val cells = Seq(
      ins("k1", "c1", "old", 1), ins("k1", "c1", "new", 5),
      ins("k2", "c1", "x", 2), del("k2", "c1", 7, ldt = 100), // tombstoned
      ins("k3", "c1", "alive", 3))
    val lens = new graft.api.CassandraLens(cellsDf(cells), CfMeta("t"))
    // session 1: warm the cache, persist it beside the store
    val warm = lens.withRowCache()
    warm.live.count()
    warm.saveRowCache(s"$dir/rowcache")
    warm.dropRowCache()
    // session 2 (fresh lens over the same cells): preheat from the snapshot
    val reopened = new graft.api.CassandraLens(cellsDf(cells), CfMeta("t"))
      .withRowCacheFrom(s"$dir/rowcache")
    val q = reopened.rangeSliceByKeys(None, None, None,
      graft.operators.SliceRange(count = 10), Int.MaxValue)
    // byte-identical to the cold read path
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
      df.select(col("key"), decode(col("col_name"), "UTF-8"), decode(col("value"), "UTF-8"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(rows(q) == rows(lens.rangeSliceByKeys(None, None, None,
      graft.operators.SliceRange(count = 10), Int.MaxValue)))
    assert(rows(q) == Set(("k1", "c1", "new"), ("k3", "c1", "alive"))) // k2 shadowed
    // the preheated plan serves from the cached snapshot scan — the
    // reconcile (marker-horizon aggregates over the cell store) is absent
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan.take(2000))
    assert(!plan.contains("graft_reconcile"),
      s"preheated read must not re-reconcile:\n${plan.take(2000)}")
    reopened.dropRowCache()
  }

  test("compactWithCacheRefresh: cache serves post-compaction state; snapshot re-saved") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compactcache").toString
    val cells = Seq(
      ins("k1", "c1", "old", 1), ins("k1", "c1", "new", 5),
      ins("k2", "c1", "x", 2), del("k2", "c1", 7, ldt = 100),
      ins("k3", "c1", "alive", 3))
    val warm = new graft.api.CassandraLens(cellsDf(cells), CfMeta("t")).withRowCache()
    warm.live.count()
    warm.saveRowCache(s"$dir/rowcache")
    // compact with the cache attached: old cache dropped, new one serves
    // the GC'd view, snapshot re-saved in the same step
    val compacted = warm.compactWithCacheRefresh(gcBeforeSeconds = 1000,
      savedCachePath = Some(s"$dir/rowcache"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
      df.select(col("key"), decode(col("col_name"), "UTF-8"), decode(col("value"), "UTF-8"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val expect = Set(("k1", "c1", "new"), ("k3", "c1", "alive"))
    assert(rows(compacted.rangeSliceByKeys(None, None, None,
      graft.operators.SliceRange(count = 10), Int.MaxValue)) == expect)
    // a reopen preheating from the re-saved snapshot sees the SAME state
    // without re-reconciling (stale-snapshot hazard closed)
    val reopened = new graft.api.CassandraLens(
      compacted.cells, CfMeta("t")).withRowCacheFrom(s"$dir/rowcache")
    val q = reopened.rangeSliceByKeys(None, None, None,
      graft.operators.SliceRange(count = 10), Int.MaxValue)
    assert(rows(q) == expect)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan") && !plan.contains("graft_reconcile"),
      plan.take(2000))
    compacted.dropRowCache(); reopened.dropRowCache()
  }

  test("snapshot/restore/retention: hard-link clone survives table replace") {
    val loc = new java.io.File("spark-warehouse/graft_ks7.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ks7")
    try {
      val meta = CfMeta("cfs")
      val cells = Seq(
        ins("k1", "c1", "v1", 5),
        ins("k2", "c1", "dead", 1), delRow("k2", 7, ldt = 100), // row-shadowed (sidecar)
        ins("k3", "c1", "v3", 3))
      ks.saveColumnFamily(cellsDf(cells), meta, buckets = 2)
      val snap = ks.snapshot("cfs", "night", atMillis = 2000L)
      assert(snap == "2000-night")
      // clobber the live CF AFTER the snapshot (drops the original table
      // location — the hard links must keep the snapshot's files alive)
      ks.saveColumnFamily(cellsDf(Seq(ins("zz", "c9", "junk", 1))), meta, buckets = 2)
      ks.snapshot("cfs", "old", atMillis = 1000L)
      ks.snapshot("cfs", "new", atMillis = 3000L)
      // unparseable snapshot dir: listed with null millis, never deleted
      new java.io.File(loc, "__snapshots/notasnap").mkdirs()

      val deleted = ks.cleanOldSnapshots(1500L)
      assert(deleted == Seq("1000-old"))
      val listed = ks.snapshots().collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      assert(listed == Map("2000-night" -> 2000L, "3000-new" -> 3000L, "notasnap" -> -1L))

      ks.restoreSnapshot("2000-night", "cfs")
      val lens = ks.columnFamily("cfs")
      assert(lens.horizons.isDefined, "horizon sidecars must restore too")
      assert(liveValues(lens.getSlice("k1", None, graft.operators.SliceRange(count = 10)))
        == Map("c1" -> "v1"))
      assert(lens.getSlice("k2", None, graft.operators.SliceRange(count = 10)).isEmpty,
        "restored row tombstone must still shadow k2")
      assert(liveValues(lens.getSlice("k3", None, graft.operators.SliceRange(count = 10)))
        == Map("c1" -> "v3"))
      assert(lens.getSlice("zz", None, graft.operators.SliceRange(count = 10)).isEmpty,
        "post-snapshot junk must be gone after restore")
      // restored table keeps the bucket spec (shuffle-free reads hold)
      val bucketSpec = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("cfs", Some("graft_ks7"))).bucketSpec
      assert(bucketSpec.exists(s => s.numBuckets == 2 && s.bucketColumnNames == Seq("key")),
        s"restored table must keep its bucket spec, got $bucketSpec")
    } finally ks.drop()
  }

  test("snapshotAll regex + domainSplit restore keeps the composed layout") {
    val loc = new java.io.File("spark-warehouse/graft_ks8.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ks8")
    try {
      val meta = CfMeta("cfd", domainSplit = true)
      ks.saveColumnFamily(cellsDf(Seq(
        ins("alpha01", "c1", "v1", 5), ins("beta02", "c1", "v2", 3))), meta, buckets = 2)
      ks.saveColumnFamily(cellsDf(Seq(ins("k1", "c1", "x", 1))), CfMeta("other"), buckets = 2)
      // tag(cfRegExp) selection: only cfd matches (ClusterSnapshotTask.java:34-52)
      val snap = ks.snapshotAll("night", cfRegExp = Some("cfd.*"), atMillis = 4000L)
      val fs = new java.io.File(loc, s"__snapshots/$snap")
      assert(new java.io.File(fs, "cfd").exists() && !new java.io.File(fs, "other").exists())
      ks.saveColumnFamily(cellsDf(Seq(ins("gamma03", "c1", "junk", 1))), meta, buckets = 2)
      ks.restoreSnapshot(snap, "cfd")
      def cat() = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("cfd", Some("graft_ks8")))
      assert(cat().partitionColumnNames == Seq("domain"))
      assert(cat().bucketSpec.exists(_.numBuckets == 2))
      val lens = ks.columnFamily("cfd")
      assert(liveValues(lens.getSlice("alpha01", None, graft.operators.SliceRange(count = 5)))
        == Map("c1" -> "v1"))
      assert(lens.getSlice("gamma03", None, graft.operators.SliceRange(count = 5)).isEmpty)
    } finally ks.drop()
  }

  test("thriftify: comparator-ordered column arrays per key, reversal at sink") {
    val live = Reconcile.liveView(cellsDf(Seq(
      ins("k1", "b", "2", 1), ins("k1", "a", "1", 1), ins("k1", "c", "3", 1))))
    def names(reversed: Boolean): Seq[String] = {
      val row = Thriftify.rows(live, ComparatorType.Bytes, reversed).head()
      row.getSeq[org.apache.spark.sql.Row](1).map(r => new String(r.getAs[Array[Byte]]("name"), "UTF-8"))
    }
    assert(names(reversed = false) == Seq("a", "b", "c"))
    assert(names(reversed = true) == Seq("c", "b", "a"))
  }

  test("get_string_property / get_string_list_property analogs") {
    assert(Keyspace.getStringProperty(spark, "cluster name")
      == spark.sparkContext.appName)
    val conf = Keyspace.getStringProperty(spark, "config file")
    assert(conf.linesIterator.nonEmpty && conf.contains("spark.sql.shuffle.partitions="))
    // lines are sorted key=value (deterministic render of the live conf)
    val keys = conf.linesIterator.map(_.takeWhile(_ != '=')).toSeq
    assert(keys == keys.sorted)
    // credential-bearing keys render redacted, never the value
    spark.conf.set("spark.graft.test.secret", "hunter2")
    try {
      val red = Keyspace.getStringProperty(spark, "config file")
      assert(red.contains("spark.graft.test.secret=*********(redacted)"),
        "secret key must be redacted")
      assert(!red.contains("hunter2"), "secret value must not appear")
    } finally spark.conf.unset("spark.graft.test.secret")
    // single-engine ring: one token, this engine's master endpoint
    val tokenMap = Keyspace.getStringProperty(spark, "token map")
    assert(tokenMap == s"""{"0":"${spark.sparkContext.master}"}""")
    assert(Keyspace.getStringProperty(spark, "version") == "2.2.0")
    assert(Keyspace.getStringProperty(spark, "no such thing") == "?")
    val ks = Keyspace(spark, "graft_prop_spec_ks")
    try {
      assert(Keyspace.getStringListProperty(spark, "keyspaces")
        .contains("graft_prop_spec_ks"))
      assert(Keyspace.getStringListProperty(spark, "anything else").isEmpty)
    } finally ks.drop()
  }

  test("validateRuns: truncated file, orphaned manifest, resurrected z-run source all report; clean CF is clean") {
    val loc = new java.io.File("spark-warehouse/graft_ksvr.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ksvr")
    try {
      val meta = CfMeta("cfv")
      ks.saveColumnFamily(cellsDf(Seq(
        ins("k1", "c1", "v1", 1), ins("k2", "c1", "w", 1),
        ins("k3", "c1", "x", 2))),
        meta, buckets = 4)
      // clean store: every row ok (with footer row counts), deep too
      val clean = ks.validateRuns("cfv").collect()
      assert(clean.nonEmpty && clean.forall(_.getString(3) == "ok"),
        s"got ${clean.mkString("\n")}")
      assert(clean.exists(r => r.getString(0).endsWith("__hrow")),
        "horizon sidecar stores must be in the report")
      assert(ks.validateRuns("cfv", deep = true).collect()
        .forall(_.getString(3) == "ok"))
      // plant a TRUNCATED data file (half its bytes): footer decode fails
      val dataDir = new java.io.File(loc, "cfv")
      val pq = dataDir.listFiles().filter(_.getName.endsWith(".parquet")).head
      val bytes = java.nio.file.Files.readAllBytes(pq.toPath)
      java.nio.file.Files.write(pq.toPath, bytes.take(bytes.length / 2))
      val report = ks.validateRuns("cfv").collect()
      val bad = report.filter(_.getString(3) == "unreadable")
      assert(bad.length == 1 && bad.head.getString(1).endsWith(pq.getName),
        s"got ${bad.mkString("\n")}")
      // the read path is untouched by validation (merge-on-read would
      // fail on the broken file — validateRuns itself must not throw)
      java.nio.file.Files.write(pq.toPath, bytes) // restore
      assert(ks.validateRuns("cfv").collect().forall(_.getString(3) == "ok"))
    } finally ks.drop()

    // store-level conventions on a scratch run store
    val base = java.nio.file.Files.createTempDirectory("graft_ri").toString
    import spark.implicits._
    Seq((1L, 0L, 2L, 5L)).toDF("cell", "id", "rank", "nbr")
      .write.parquet(s"$base/graph/run=0")
    Seq(1L).toDF("cell").write.parquet(s"$base/graphcells/run=0")
    Seq(2L).toDF("cell").write.parquet(s"$base/graphcells/run=7") // orphan
    Seq((3L, "x")).toDF("a", "b").write.parquet(s"$base/runs/run=1")
    Seq((4L, "y")).toDF("a", "b").write.parquet(s"$base/runs/run=3")
    // run=3 claims it absorbed run=1, but run=1 is still on disk
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/runs/run=3/_compacted_from"),
      "1\n".getBytes("UTF-8"))
    new java.io.File(s"$base/index__old").mkdirs() // no live sibling
    val rep = graft.sources.RunIntegrity.validateStore(spark, base)
      .collect().map(r => (r.getString(1), r.getString(3), r.getString(4)))
    def one(status: String, pathHas: String, detailHas: String): Unit =
      assert(rep.exists(r => r._2 == status && r._1.contains(pathHas)
        && r._3.contains(detailHas)), s"missing ($status, $pathHas): " +
        rep.mkString("\n"))
    one("orphaned", "graphcells/run=7", "does not exist")
    one("mismatch", "runs/run=1", "still on disk")
    one("mismatch", "index__old", "no live 'index' sibling")
    // the intact pieces still report ok
    assert(rep.exists(r => r._1.contains("graph/run=0") && r._2 == "ok"))
    // the validator sees what a READER sees: quarantined and
    // residue-subtree files are never footer-checked (the recipe
    // converges; a retired __old's broken bytes are not a live problem)
    val qd = new java.io.File(s"$base/_quarantine"); qd.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/_quarantine/broken.parquet"),
      "junk".getBytes("UTF-8"))
    new java.io.File(s"$base/index__old/run=0").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/index__old/run=0/part-0.parquet"),
      "junk".getBytes("UTF-8"))
    val rep2 = graft.sources.RunIntegrity.validateStore(spark, base)
      .collect().map(r => (r.getString(1), r.getString(3)))
    assert(!rep2.exists(r => r._1.contains("_quarantine")), rep2.mkString("\n"))
    assert(!rep2.exists(r => r._1.contains("index__old") && r._2 == "unreadable"),
      rep2.mkString("\n"))
  }

  test("storeStats: cfstats census over a store with known composition") {
    val loc = new java.io.File("spark-warehouse/graft_ks9.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ks9")
    try {
      val meta = CfMeta("cfx")
      // known composition: 3 value cells, 1 column tombstone, 1 row marker
      ks.saveColumnFamily(cellsDf(Seq(
        ins("k1", "c1", "v1", 1), ins("k1", "c2", "v2", 1),
        ins("k2", "c1", "v3", 1), del("k2", "c9", 5), delRow("k3", 5))),
        meta, buckets = 2)
      ks.snapshot("cfx", "night", atMillis = 2000L)
      val stats = ks.storeStats("cfx", withCellStats = true).collect()
        .map(r => r.getString(1) -> r).toMap
      assert(stats.keySet == Set("data", "hrow", "hsc"), stats.keySet)
      val d = stats("data")
      assert(d.getLong(2) > 0 && d.getLong(3) > 0, "files/bytes > 0")
      assert(d.getLong(4) == 5, s"footer rows ${d.getLong(4)} != 5 cells")
      assert(d.getLong(5) == 0, "no unreadable files")
      assert(d.getLong(6) == 0, "flat store: no domain dirs")
      assert(d.getLong(8) == 1, "one snapshot contains cfx")
      assert(!d.isNullAt(9) && d.getBoolean(9), "sidecar written after data = fresh")
      assert(d.getLong(10) == 3, "keys_est exact at this size: k1 k2 k3")
      assert(d.getLong(11) == 3 && d.getLong(12) == 1 && d.getLong(13) == 1,
        s"value/deleted/marker = ${(d.getLong(11), d.getLong(12), d.getLong(13))}")
      // sidecar rows: 1 row horizon, 0 super horizons; CF-grain columns null
      assert(stats("hrow").getLong(4) == 1 && stats("hsc").getLong(4) == 0)
      assert(stats("hrow").isNullAt(9) && stats("hrow").isNullAt(10))
      // metadata-only call works without the cell-stat aggregate
      val cheap = ks.storeStats("cfx").collect().map(r => r.getString(1) -> r).toMap
      assert(cheap("data").isNullAt(10) && cheap("data").getLong(4) == 5)
      // staleness: clobber the data table without refreshing sidecars —
      // saveColumnFamily refreshes them, so write into the table directly
      Thread.sleep(5) // mtime granularity
      spark.sql("INSERT INTO graft_ks9.cfx SELECT * FROM graft_ks9.cfx LIMIT 1")
      val after = ks.storeStats("cfx").collect().map(r => r.getString(1) -> r).toMap
      assert(!after("data").isNullAt(9) && !after("data").getBoolean(9),
        "data newer than sidecar must report stale")
    } finally ks.drop()
  }

  test("compactionAdvice/compactIfNeeded: fragmented store advises and compacts; tight store advises nothing") {
    val loc = new java.io.File("spark-warehouse/graft_ksc.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ksc")
    try {
      val meta = CfMeta("cfa") // gcGrace default 864000; tombstone ldt 1000
      ks.saveColumnFamily(cellsDf(Seq(
        ins("k1", "c1", "v1", 1), ins("k2", "c1", "v2", 1),
        del("k2", "c9", 5))), meta, buckets = 2)
      // fresh store, tombstone still inside grace: NO advice of any kind
      val quietNow = 500 + meta.gcGraceSeconds // gcBefore 500 < ldt 1000
      assert(ks.compactionAdvice("cfa", quietNow).isEmpty,
        "freshly-saved store must advise nothing")
      // fragment: each INSERT INTO appends one more file per populated
      // bucket (the flush-per-batch shape a streaming ingest produces)
      (0 until 4).foreach { _ =>
        spark.sql("INSERT INTO graft_ksc.cfa SELECT * FROM graft_ksc.cfa LIMIT 2")
      }
      val lateNow = 1001 + meta.gcGraceSeconds // gcBefore 1001 > ldt 1000
      val advice = ks.compactionAdvice("cfa", lateNow).collect()
      val kinds = advice.map(_.getString(0)).toSet
      assert(kinds.contains("minor"),
        s"fragmented bucket must advise a minor merge: ${advice.mkString("; ")}")
      assert(kinds.contains("gc"),
        s"past-grace tombstone must advise gc: ${advice.mkString("; ")}")
      assert(kinds.contains("sidecar"),
        s"direct insert left the sidecar stale: ${advice.mkString("; ")}")
      advice.filter(_.getString(0) == "minor").foreach(r =>
        assert(r.getLong(2) >= 4 && r.getLong(3) > 0, r.toString))
      assert(advice.find(_.getString(0) == "gc").get.getLong(4) >= 1)
      // act: compactIfNeeded returns the advice it acted on …
      assert(ks.compactIfNeeded("cfa", lateNow).count() == advice.length)
      // … and the compacted store advises nothing at the SAME clock
      assert(ks.compactionAdvice("cfa", lateNow).isEmpty,
        "freshly-compacted store must advise nothing")
      // the rewrite preserved the live data (tombstoned c9 purged)
      val lens = ks.columnFamily("cfa")
      assert(liveValues(lens.getSlice("k1", None,
        graft.operators.SliceRange(count = 10))) == Map("c1" -> "v1"))
      // no-op call on the tight store rewrites nothing
      assert(ks.compactIfNeeded("cfa", lateNow).isEmpty)
      // SIDECAR-ONLY advice must refresh the horizon tables WITHOUT a
      // data rewrite: one direct insert makes the sidecar stale (one
      // extra file per touched bucket stays under minThreshold, no new
      // tombstones → no minor, no gc)
      Thread.sleep(5) // mtime granularity
      spark.sql("INSERT INTO graft_ksc.cfa SELECT * FROM graft_ksc.cfa LIMIT 1")
      def dataFiles() = new java.io.File(loc, "cfa").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
      val before = dataFiles()
      val acted = ks.compactIfNeeded("cfa", lateNow).collect()
      assert(acted.map(_.getString(0)).toSet == Set("sidecar"),
        acted.mkString("; "))
      assert(dataFiles() == before,
        "sidecar-only advice must not rewrite the data store")
      assert(ks.compactionAdvice("cfa", lateNow).isEmpty,
        "refreshed sidecar advises nothing")
    } finally ks.drop()
  }

  test("runKeys: one run's distinct decorated keys in token order; union covers the CF") {
    val loc = new java.io.File("spark-warehouse/graft_ksa.db")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    val ks = Keyspace(spark, "graft_ksa")
    try {
      val meta = CfMeta("cfk")
      ks.saveColumnFamily(cellsDf(Seq(
        ins("k3", "c1", "v", 1), ins("k1", "c1", "v", 1), ins("k1", "c2", "v", 1),
        ins("k2", "c1", "v", 1), delRow("k4", 5))), meta, buckets = 2)
      val files = new java.io.File(loc, "cfk").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName).sorted
      assert(files.nonEmpty)
      val perRun = files.map(f => ks.runKeys("cfk", f).collect()
        .map(_.getString(1)).toSeq)
      // distinct within a run (k1 has two cells), token-ordered
      // (OrderPreserving: token = key), union = every key incl. the
      // marker-only k4 (sstablekeys prints tombstoned rows' keys too)
      perRun.foreach(ksq => assert(ksq == ksq.distinct.sorted, ksq))
      assert(perRun.flatten.toSet == Set("k1", "k2", "k3", "k4"))
      intercept[IllegalArgumentException](ks.runKeys("cfk", "nope.parquet"))
    } finally ks.drop()
  }
}
