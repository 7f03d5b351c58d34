package graft

import org.apache.spark.sql.functions._

import graft.api.CassandraLens
import graft.model.CfMeta
import graft.operators.Slice

/** Fork maintenance/probe operators: existence filters, point-in-time
  * replay, cleanup, anti-entropy digests, read-amplification guard.
  */
class MaintenanceSpec extends SparkSpec {

  private val cells = Seq(
    ins("a", "c1", "v", 1), ins("a", "c2", "v", 1), del("a", "c2", 2),
    ins("b", "c1", "v", 5), ins("c", "c1", "v", 9))
  private def lens = new CassandraLens(cellsDf(cells), CfMeta("t"))

  test("columnsExist: live pairs only (deleted column excluded)") {
    import spark.implicits._
    val probe = Seq(("a", "c1"), ("a", "c2"), ("b", "c1"), ("z", "c1"))
      .map { case (k, c) => (k, b(c)) }.toDF("key", "col_name")
    val got = lens.columnsExist(probe)
      .select(col("key"), decode(col("col_name"), "UTF-8"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "c1"), ("b", "c1")))
  }

  test("rowsExist: keys with any live cell") {
    import spark.implicits._
    val l = new CassandraLens(cellsDf(cells :+ delRow("c", 10)), CfMeta("t"))
    val got = l.rowsExist(Seq("a", "c", "z").toDF("key"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a"))
    // "c" fully shadowed by row tombstone, "z" never existed
  }

  test("replayAt: point-in-time recovery sees only mutations <= maxTs") {
    val l = lens
    assert(liveValues(l.replayAt(1).getSlice("a", None,
      graft.operators.SliceRange(count = 10))) == Map("c1" -> "v", "c2" -> "v"))
    assert(liveValues(l.replayAt(3).getSlice("a", None,
      graft.operators.SliceRange(count = 10))) == Map("c1" -> "v"))
    assert(l.replayAt(4).rowsExist(cellsDf(Seq(ins("b", "x", "x", 1))).select("key")).count() == 0)
  }

  test("cleanup drops keys outside the owned token ranges") {
    val cleaned = lens.cleanup(t => t >= lit("b"))
    assert(cleaned.live.select("key").distinct().collect().map(_.getString(0)).sorted.toSeq
      == Seq("b", "c"))
  }

  test("digests: identical stores agree, divergent stores differ") {
    val d1 = lens.digests(4).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val d2 = new CassandraLens(cellsDf(cells.reverse), CfMeta("t"))
      .digests(4).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d1 == d2) // order-insensitive
    val d3 = new CassandraLens(cellsDf(cells :+ ins("b", "c9", "w", 7)), CfMeta("t"))
      .digests(4).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(d1 != d3)
  }

  test("adaptive Merkle depth + token-range leaves isolate repairs on a skewed store") {
    import graft.operators.Validation
    // depth sizing: smallest 16^d covering rows at <= target rows/leaf
    assert(Validation.merkleDepthFor(1000L) == 1)
    assert(Validation.merkleDepthFor(16L * (1L << 17)) == 1) // exactly full leaves
    assert(Validation.merkleDepthFor(16L * (1L << 17) + 1) == 2)
    assert(Validation.merkleDepthFor(Long.MaxValue) == 8) // capped

    // adversarial skew: 200 keys crowd the "aa" prefix of an
    // ORDER-PRESERVING ring (token = key, so key clustering IS token
    // clustering); one divergent cell hides among them
    val crowd = (0 until 200).map(i => ins(f"aa$i%04d", "c1", s"v$i", 1))
    val spread = Seq(ins("q1", "c1", "v", 1), ins("z9", "c1", "v", 1))
    val sa = cellsDf(crowd ++ spread)
    val sb = cellsDf(crowd.map(c =>
      if (c.key == "aa0042") c.copy(value = b("CORRUPT")) else c) ++ spread)

    // depth 1: the whole crowded "a" range is one leaf — repair re-streams
    // 200 keys for one bad cell
    val d1 = Validation.merkleDiffRanges(sa, sb, col("key"), depthHex = 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(d1.keySet == Set("a"), s"got $d1")
    assert(d1("a") == 200L)

    // depth 4: one more level of digits isolates the divergence to the
    // "aa00" quarter of the crowd — 100 keys, and only that leaf flagged
    val d4 = Validation.merkleDiffRanges(sa, sb, col("key"), depthHex = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(d4.keySet == Set("aa00"), s"got $d4")
    assert(d4("aa00") == 100L)

    // identical stores agree at every depth; and on the md5 ring one
    // mutation flags exactly one contiguous leaf
    assert(Validation.merkleDiffRanges(sa, sa, col("key"), 4).isEmpty)
    val md5Tok = graft.model.Tokens.md5HexToken(col("key"))
    val dm = Validation.merkleDiffRanges(sa, sb, md5Tok, depthHex = 2).collect()
    assert(dm.length == 1, s"got ${dm.toSeq}")
  }

  test("row cache: same slice results, served from InMemoryTableScan; mutation drops it") {
    val cached = lens.withRowCache()
    val plain = lens.getSlice("a", None, graft.operators.SliceRange(count = 10))
    val viaCache = cached.getSlice("a", None, graft.operators.SliceRange(count = 10))
    assert(liveValues(viaCache) == liveValues(plain))
    val plan = viaCache.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), s"expected cache scan:\n${plan.take(1500)}")
    // a mutation returns a lens WITHOUT the cache (write invalidation)
    val mutated = cached.insert(graft.operators.Mutations.asInserts(
      cellsDf(Seq(ins("a", "cN", "fresh", 99)))))
    val after = mutated.getSlice("a", None, graft.operators.SliceRange(count = 10))
    assert(liveValues(after).get("cN").contains("fresh"))
    assert(!after.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
  }

  test("hot-key row cache: save keys, fresh lens pre-warms, hot hits cache, cold falls through") {
    val dir = java.nio.file.Files.createTempDirectory("graft_keycache").toString
    // warm session: hot set = the keys traffic actually touched
    val warm = lens.withRowCache(Seq("a", "b"))
    val plain = lens.getSlice("a", None, graft.operators.SliceRange(count = 10))
    val hot = warm.getSlice("a", None, graft.operators.SliceRange(count = 10))
    assert(liveValues(hot) == liveValues(plain))
    assert(hot.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "hot key must serve from the cache")
    // a COLD key still answers correctly through the same lens
    val cold = warm.getSlice("c", None, graft.operators.SliceRange(count = 10))
    assert(liveValues(cold) == Map("c1" -> "v"))
    // shutdown: persist the CACHED key set (hot only, not the corpus)
    warm.saveCachedKeys(s"$dir/keys")
    warm.dropRowCache()
    // restart: a FRESH lens pre-warms deterministically from the file
    val fresh = new CassandraLens(cellsDf(cells), CfMeta("t"))
    val loaded = fresh.loadCachedKeys(s"$dir/keys")
    assert(loaded.sorted == Seq("a", "b"))
    val rewarmed = fresh.withRowCache(loaded)
    val re = rewarmed.getSlice("a", None, graft.operators.SliceRange(count = 10))
    assert(liveValues(re) == liveValues(plain))
    assert(re.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "re-warmed cache must serve hot reads")
    rewarmed.dropRowCache()
  }

  test("hot-key row cache guard: >10k keys switch to broadcast semi-join, MaxHotKeys bounds loudly") {
    // a saved key set past the IN-list convention must not become a
    // mega-predicate: the plan splits hot/cold by broadcast join instead
    val bigHot = (1 to 10001).map(i => f"h$i%05d") :+ "a"
    val warm = lens.withRowCache(bigHot)
    val viaCache = warm.getSlice("a", None, graft.operators.SliceRange(count = 10))
    val plain = lens.getSlice("a", None, graft.operators.SliceRange(count = 10))
    assert(liveValues(viaCache) == liveValues(plain))
    val plan = viaCache.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"hot key must still serve from the cache:\n${plan.take(1500)}")
    assert(!plan.contains("h09999"),
      "the hot set must not appear as an IN-list literal in the plan")
    // cold keys still answer through the anti-join branch
    assert(liveValues(warm.getSlice("c", None,
      graft.operators.SliceRange(count = 10))) == Map("c1" -> "v"))
    warm.dropRowCache()
    // corpus-sized ask fails loudly, naming the bound
    val e = intercept[IllegalArgumentException] {
      lens.withRowCache((1 to CassandraLens.MaxHotKeys + 1).map(_.toString))
    }
    assert(e.getMessage.contains("MaxHotKeys"))
  }

  test("ReadColumnsLimit guard raises on pathological wide rows") {
    val wide = (1 to 20).map(i => ins("w", f"c$i%03d", "v", 1))
    val live = new CassandraLens(cellsDf(wide), CfMeta("t")).live
    assert(Slice.withReadGuard(live, 50).count() == 20)
    val e = intercept[Exception] { Slice.withReadGuard(live, 10).count() }
    assert(e.getMessage.contains("ReadColumnsLimit") ||
      Option(e.getCause).exists(_.getMessage.contains("ReadColumnsLimit")))
  }
}
