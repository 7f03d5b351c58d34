package graft

import graft.api.CassandraLens
import graft.model.{CfMeta, ComparatorType}
import graft.operators.{SliceByNames, SliceRange}

/** Slice semantics conformance — test_get_slice_range shape
  * (test/system/test_server.py:822), reversal, sentinels, live-count
  * limits, names filter, supercolumn sub-slices.
  */
class SliceSpec extends SparkSpec {

  private def lens(cells: Seq[graft.model.Cell], meta: CfMeta = CfMeta("t")) =
    new CassandraLens(cellsDf(cells), meta)

  private val row = Seq(
    ins("k1", "c1", "v1", 1), ins("k1", "c2", "v2", 1), ins("k1", "c3", "v3", 1),
    ins("k1", "c4", "v4", 1), ins("k1", "c5", "v5", 1))

  test("bounded slice [c2,c4]") {
    val r = lens(row).getSlice("k1", None, SliceRange(b("c2"), b("c4"), count = 100))
    assert(liveNames(r).sorted == Seq("c2", "c3", "c4"))
  }

  test("empty sentinels mean unbounded ('' start/finish)") {
    val r = lens(row).getSlice("k1", None, SliceRange(count = 100))
    assert(liveNames(r).sorted == Seq("c1", "c2", "c3", "c4", "c5"))
  }

  test("count limits live columns in comparator order") {
    val r = lens(row).getSlice("k1", None, SliceRange(count = 2))
    assert(liveNames(r).sorted == Seq("c1", "c2"))
  }

  test("reversed slice: start is the upper bound, count from the top") {
    val r = lens(row).getSlice("k1", None,
      SliceRange(start = b("c4"), finish = b("c2"), reversed = true, count = 2))
    assert(liveNames(r).sorted == Seq("c3", "c4"))
  }

  test("count counts LIVE columns only — tombstones do not consume the budget") {
    val cells = row ++ Seq(del("k1", "c1", 2), del("k1", "c3", 2))
    val r = lens(cells).getSlice("k1", None, SliceRange(count = 2))
    assert(liveNames(r).sorted == Seq("c2", "c4"))
  }

  test("slice by names (NamesQueryFilter)") {
    val r = lens(row).getSlice("k1", None, SliceByNames(Seq(b("c2"), b("c5"), b("nope"))))
    assert(liveNames(r).sorted == Seq("c2", "c5"))
  }

  test("multiget_slice slices per key independently") {
    val cells = row ++ Seq(ins("k2", "d1", "w1", 1), ins("k2", "d2", "w2", 1))
    val r = lens(cells).multigetSlice(Seq("k1", "k2"), None, SliceRange(count = 1))
    assert(liveNames(r).sorted == Seq("c1", "d1"))
  }

  test("multiget_slice via keys-DataFrame (broadcast semi-join path)") {
    import spark.implicits._
    val cells = row ++ Seq(ins("k2", "d1", "w1", 1), ins("k3", "e1", "x", 1))
    val keysDf = Seq("k1", "k3", "zz").toDF("key")
    val r = lens(cells).multigetSlice(keysDf, None, SliceRange(count = 1))
    assert(liveNames(r).sorted == Seq("c1", "e1"))
  }

  test("get returns exactly one column; absent name returns empty") {
    val l = lens(row)
    assert(liveValues(l.get("k1", None, b("c3"))) == Map("c3" -> "v3"))
    assert(l.get("k1", None, b("zz")).count() == 0)
  }

  test("get_count counts live columns per key") {
    val cells = row ++ Seq(del("k1", "c1", 2), ins("k2", "d1", "w", 1))
    val counts = lens(cells).getCount(Seq("k1", "k2"), None)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("k1" -> 4L, "k2" -> 1L))
  }

  test("super CF: top-level slice counts supercolumns, keeps all subcolumns") {
    val meta = CfMeta("s", isSuper = true)
    val cells = Seq(
      ins("k1", "c1", "v", 1, sup = "sc1"), ins("k1", "c2", "v", 1, sup = "sc1"),
      ins("k1", "c1", "v", 1, sup = "sc2"), ins("k1", "c1", "v", 1, sup = "sc3"))
    val r = lens(cells, meta).getSlice("k1", None, SliceRange(count = 2))
    import org.apache.spark.sql.functions._
    val supers = r.select(decode(col("super_name"), "UTF-8")).collect().map(_.getString(0))
    assert(supers.sorted.toSeq == Seq("sc1", "sc1", "sc2"))
  }

  test("super CF: sub-slice within one supercolumn uses the subcomparator") {
    val meta = CfMeta("s", isSuper = true)
    val cells = Seq(
      ins("k1", "c1", "v1", 1, sup = "sc1"), ins("k1", "c2", "v2", 1, sup = "sc1"),
      ins("k1", "c3", "v3", 1, sup = "sc1"), ins("k1", "cX", "w", 1, sup = "sc2"))
    val r = lens(cells, meta).getSlice("k1", Some(b("sc1")),
      SliceRange(start = b("c2"), count = 5))
    assert(liveNames(r).sorted == Seq("c2", "c3"))
  }

  test("LongType comparator slices numerically, not lexicographically") {
    val meta = CfMeta("t", comparator = ComparatorType.Long_)
    val cells = Seq(2L, 10L, 33L, 100L).map(v =>
      graft.model.Cell("k1", null, bl(v), b(s"v$v"), 1, tombstone = false, 0))
    val l = new CassandraLens(cellsDf(cells), meta)
    val r = l.getSlice("k1", None, SliceRange(start = bl(3L), finish = bl(50L), count = 10))
    import org.apache.spark.sql.functions._
    val names = r.select(graft.functions.GraftFunctions.beLong(col("col_name")))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(names == Seq(10L, 33L))
  }

  test("wide row: 5k columns slice + reversed + count stay correct") {
    val wide = (0 until 5000).map(i => ins("w", f"c$i%05d", s"v$i", 1))
    val l = lens(wide)
    assert(liveNames(l.getSlice("w", None, SliceRange(count = 7))).sorted ==
      (0 until 7).map(i => f"c$i%05d"))
    assert(liveNames(l.getSlice("w", None, SliceRange(reversed = true, count = 3))).sorted ==
      (4997 until 5000).map(i => f"c$i%05d"))
    val mid = l.getSlice("w", None, SliceRange(b("c01000"), b("c01999"), count = Int.MaxValue))
    assert(mid.count() == 1000)
  }

  test("validation: start after finish rejected unless reversed (ThriftValidation:230-258)") {
    val l = lens(row)
    intercept[IllegalArgumentException] {
      l.getSlice("k1", None, SliceRange(start = b("c4"), finish = b("c2")))
    }
    intercept[IllegalArgumentException] {
      l.getSlice("k1", None, SliceByNames(Nil))
    }
    intercept[IllegalArgumentException] { l.get("", None, b("c1")) }
  }
}
