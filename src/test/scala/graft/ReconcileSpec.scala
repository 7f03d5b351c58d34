package graft

import graft.operators.Reconcile

/** LWW + tombstone algebra conformance (db/Column.java:196-210
  * comparePriority; db/ColumnFamilyStore.java:663-717 removeDeleted) —
  * the deletion-matrix cases of test/system/test_server.py:335-534.
  */
class ReconcileSpec extends SparkSpec {

  test("higher timestamp wins (LWW upsert)") {
    val live = Reconcile.liveView(cellsDf(Seq(
      ins("k1", "c1", "old", 1), ins("k1", "c1", "new", 2))))
    assert(liveValues(live) == Map("c1" -> "new"))
  }

  test("tombstone wins timestamp ties") {
    val live = Reconcile.liveView(cellsDf(Seq(
      ins("k1", "c1", "v", 5), del("k1", "c1", 5))))
    assert(live.count() == 0)
  }

  test("equal-ts live columns tie-break on greater value bytes") {
    val live = Reconcile.liveView(cellsDf(Seq(
      ins("k1", "c1", "apple", 5), ins("k1", "c1", "zebra", 5))))
    assert(liveValues(live) == Map("c1" -> "zebra"))
  }

  test("reconcile is order-insensitive (replica merge determinism)") {
    val cells = Seq(
      ins("k1", "c1", "a", 1), del("k1", "c1", 2), ins("k1", "c1", "b", 3),
      ins("k1", "c2", "x", 7), del("k1", "c2", 7))
    val fwd = liveValues(Reconcile.liveView(cellsDf(cells)))
    val rev = liveValues(Reconcile.liveView(cellsDf(cells.reverse)))
    assert(fwd == rev && fwd == Map("c1" -> "b"))
  }

  test("newer insert resurrects a deleted column") {
    val live = Reconcile.liveView(cellsDf(Seq(
      ins("k1", "c1", "v1", 1), del("k1", "c1", 2), ins("k1", "c1", "v2", 3))))
    assert(liveValues(live) == Map("c1" -> "v2"))
  }

  test("row tombstone shadows older columns, newer survive") {
    val live = Reconcile.liveView(cellsDf(Seq(
      ins("k1", "c1", "old", 1), ins("k1", "c2", "old", 9),
      delRow("k1", 5),
      ins("k1", "c3", "new", 6))))
    assert(liveNames(live).toSet == Set("c2", "c3"))
  }

  test("supercolumn tombstone shadows only its subcolumns; resurrect works" +
      " (test_super_cf_resurrect_subcolumn, test_server.py:757)") {
    val live = Reconcile.liveView(cellsDf(Seq(
      ins("k1", "s1c1", "v", 1, sup = "sc1"),
      ins("k1", "s2c1", "v", 1, sup = "sc2"),
      delSuper("k1", "sc1", 2),
      ins("k1", "s1c1", "back", 3, sup = "sc1"))))
    assert(liveValues(live) == Map("s1c1" -> "back", "s2c1" -> "v"))
  }

  test("row tombstone also shadows subcolumns via max(row, sc) horizon") {
    val live = Reconcile.liveView(cellsDf(Seq(
      ins("k1", "c1", "v", 3, sup = "sc1"),
      delSuper("k1", "sc1", 1), // older SC delete
      delRow("k1", 4)))) // newer row delete wins
    assert(live.count() == 0)
  }

  test("reconcile distributes over partitioning (partial-aggregation law)") {
    // reconcile(A ∪ B) == reconcile(reconcile(A) ∪ reconcile(B)) — the
    // property map-side partial aggregation and multi-SSTable merge rely on
    val rnd = new scala.util.Random(7)
    val all = (1 to 200).map { _ =>
      val key = s"k${rnd.nextInt(5)}"
      val c = s"c${rnd.nextInt(8)}"
      if (rnd.nextInt(4) == 0) del(key, c, rnd.nextInt(10).toLong, rnd.nextInt(100))
      else ins(key, c, s"v${rnd.nextInt(26)}", rnd.nextInt(10).toLong)
    }
    val (a, b) = all.splitAt(97)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      import org.apache.spark.sql.functions._
      df.select(col("key"), decode(col("col_name"), "UTF-8"),
        decode(col("value"), "UTF-8"), col("ts"), col("tombstone"), col("local_del_time"))
        .collect().map(_.toString).sorted.toSeq
    }
    val whole = canon(Reconcile.latestCells(cellsDf(all)))
    val parts = canon(Reconcile.latestCells(
      Reconcile.latestCells(cellsDf(a)).unionByName(Reconcile.latestCells(cellsDf(b)))))
    assert(whole == parts)
  }

  test("reconcile is idempotent: latestCells ∘ latestCells = latestCells") {
    val cells = cellsDf(Seq(
      ins("k1", "c1", "a", 1), ins("k1", "c1", "b", 2), del("k1", "c2", 3),
      ins("k2", "c1", "x", 1)))
    val once = Reconcile.latestCells(cells)
    val twice = Reconcile.latestCells(once)
    val c1 = liveValues(once.filter(!org.apache.spark.sql.functions.col("tombstone")))
    val c2 = liveValues(twice.filter(!org.apache.spark.sql.functions.col("tombstone")))
    assert(c1 == c2 && once.count() == twice.count())
  }

  test("gcGrace: compaction keeps young tombstones, purges expired ones") {
    val cells = cellsDf(Seq(
      ins("k1", "c1", "v", 1), del("k1", "c1", 2, ldt = 100),
      ins("k1", "c2", "v", 1), del("k1", "c2", 2, ldt = 900)))
    val compacted = Reconcile.compacted(cells, gcBeforeSeconds = 500)
    // c1 tombstone expired (ldt 100 < 500) → purged entirely;
    // c2 tombstone still within grace → retained as tombstone
    val kept = compacted.collect()
    assert(kept.length == 1 && kept.head.getAs[Boolean]("tombstone"))
  }

  test("compacted markers survive until gcBefore passes") {
    val cells = cellsDf(Seq(ins("k1", "c1", "v", 1), delRow("k1", 5, ldt = 900)))
    val c1 = Reconcile.compacted(cells, gcBeforeSeconds = 500)
    assert(c1.filter("col_name is null").count() == 1)
    val c2 = Reconcile.compacted(cells, gcBeforeSeconds = 1000)
    assert(c2.filter("col_name is null").count() == 0)
  }
}
