package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sketches
import graft.operators.EventOps

/** HLL / count-min sketch laws and the event-analytics operators
  * (as-of join, funnel) against brute-force references.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  /** Scala reference for the engine's rho: leading-zero count + 1 of the
    * top 60−b bits of hash60.
    */
  private def refRho(h: Long, b: Int): Long = {
    val rest = h >>> b
    val w = 60 - b
    if (rest == 0) w + 1L else w + 1L - (64 - java.lang.Long.numberOfLeadingZeros(rest))
  }

  private def hash60Ref(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("hll registers: engine rho/register match the per-key reference") {
    val keys = (0 until 300).map(i => (s"k$i", if (i % 2 == 0) "a" else "bb"))
    val df = keys.toDF("k", "g")
    val got = Sketches.hllRegisters(df, "k", "g", b = 6)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = keys.groupBy { case (k, g) => (g, hash60Ref(k) % 64) }
      .map { case ((g, reg), ks) =>
        (g, reg) -> ks.map { case (k, _) => refRho(hash60Ref(k), 6) }.max }
    assert(got == want)
  }

  test("hll merge law: shard max equals the whole-corpus sketch; idempotent") {
    val all = (0 until 500).map(i => (s"key$i", "g")).toDF("k", "g")
    val s1 = Sketches.hllRegisters(all.filter($"k".substr(4, 9).cast("int") % 2 === 0), "k", "g", 6)
    val s2 = Sketches.hllRegisters(all.filter($"k".substr(4, 9).cast("int") % 2 === 1), "k", "g", 6)
    val merged = Sketches.hllMerge(s1, s2).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val whole = Sketches.hllRegisters(all, "k", "g", 6).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == whole)
    // idempotent: re-merging a shard cannot change the union sketch
    val again = Sketches.hllMerge(Sketches.hllMerge(s1, s2), s1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == whole)
  }

  test("hll estimate: within the b=6 error envelope; duplicates don't inflate") {
    val distinct = (0 until 4000).map(i => (s"v$i", "g"))
    // every key duplicated 3x — the estimate must track DISTINCT, not rows
    val df = (distinct ++ distinct ++ distinct).toDF("k", "g")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "k", "g", 6), 6)
      .collect().head.getAs[Double]("estimate")
    // standard error ~1.04/sqrt(64) = 13%; allow 3 sigma
    assert(math.abs(est - 4000.0) / 4000.0 < 0.39, s"estimate $est")
  }

  test("hll estimate small range: linear counting is near-exact") {
    val df = (0 until 12).map(i => (s"s$i", "g")).toDF("k", "g")
    val est = Sketches.hllEstimate(Sketches.hllRegisters(df, "k", "g", 6), 6)
      .collect().head.getAs[Double]("estimate")
    assert(math.abs(est - 12.0) < 3.0, s"estimate $est")
  }

  test("hll intersect: inclusion-exclusion tracks the true overlap") {
    // A = 0..2999, B = 2000..4999 → true intersection 1000 of 3000 each
    val rows = (0 until 3000).map(i => (s"x$i", "A")) ++
      (2000 until 5000).map(i => (s"x$i", "B"))
    val regs = Sketches.hllRegisters(rows.toDF("k", "g"), "k", "g", b = 6)
    val r = Sketches.hllIntersect(regs, 6, "A", "B").collect().head
    val (ea, eb, eu, ei) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(math.abs(ea - 3000) / 3000.0 < 0.39, s"est_a $ea")
    assert(math.abs(eu - 5000) / 5000.0 < 0.39, s"est_union $eu")
    // intersection compounds three estimates' errors — generous envelope,
    // but it must land in the right order of magnitude and below |A|
    assert(ei > 100 && ei < 2500, s"est_intersect $ei (true 1000)")
    assert(eb > 0 && eu >= math.max(ea, eb) - 1e-9)
  }

  test("hll sliding: every bucket's window equals the registers of its trailing slice") {
    // keys active on scattered days 0..9 with gaps (no activity on 4, 7)
    val rows = (0 until 600).map { i =>
      val day = Seq(0L, 1L, 2L, 3L, 5L, 6L, 8L, 9L)(i % 8)
      (s"u${i % 97}-${i % 3}", day)
    }
    val df = rows.toDF("k", "day")
    val got = Sketches.hllSliding(df, "k", "day", b = 5, windowBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference: for each present day d, hllRegisters over data in [d-2, d]
    val days = rows.map(_._2).distinct.sorted
    val want = days.flatMap { d =>
      Sketches.hllRegisters(
        df.filter($"day" >= d - 2 && $"day" <= d).withColumn("g", lit("x")),
        "k", "g", 5)
        .collect().map(r => (d, r.getLong(1)) -> r.getLong(2))
    }.toMap
    assert(got == want)
  }

  test("cms: one-sided error, row-total conservation, merge-by-sum law") {
    val docs = (0 until 100).map(i => (i.toLong, s"tok${i % 7} tok${i % 3} filler"))
      .toDF("id", "text")
    val sk = Sketches.countMinSketch(docs, "text", d = 4, w = 64)
    val cells = sk.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // each of the d rows partitions ALL token occurrences: per-row sums equal
    val totals = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    assert(totals.values.toSet.size == 1 && totals.size == 4)
    assert(totals.values.head == 300L) // 3 tokens per doc
    // one-sided: estimate >= true for every distinct token
    val trueCounts = (0 until 100).flatMap(i => Seq(s"tok${i % 7}", s"tok${i % 3}", "filler"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = Sketches.cmsLookup(sk, trueCounts.keys.toSeq.toDF("tok"), "tok", d = 4, w = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    trueCounts.foreach { case (t, n) => assert(est(t) >= n, s"$t est ${est(t)} < $n") }
    // merge law: shard sketches sum to the whole-corpus sketch
    val m = Sketches.cmsMerge(
      Sketches.countMinSketch(docs.filter($"id" % 2 === 0), "text", 4, 64),
      Sketches.countMinSketch(docs.filter($"id" % 2 === 1), "text", 4, 64))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == cells)
  }

  test("countMinSketchBy: group slices sum to the global sketch") {
    val docs = (0 until 60).map(i =>
      (i.toLong, s"tok${i % 7} shared", if (i % 2 == 0) "en" else "de"))
      .toDF("id", "text", "lang")
    val by = Sketches.countMinSketchBy(docs, "text", "lang", d = 4, w = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(by.keys.map(_._1).toSet == Set("en", "de"))
    val global = Sketches.countMinSketch(docs, "text", d = 4, w = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val summed = by.groupBy { case ((_, r, b), _) => (r, b) }
      .view.mapValues(_.values.sum).toMap
    assert(summed == global)
  }

  test("cms lookup: token absent from the corpus estimates 0 when its cells are empty") {
    val docs = Seq((1L, "a a b")).toDF("id", "text")
    val sk = Sketches.countMinSketch(docs, "text", d = 4, w = 512)
    val est = Sketches.cmsLookup(sk, Seq("zzz-not-there").toDF("tok"), "tok", 4, 512)
      .collect().head.getLong(1)
    // with w=512 and 2 distinct tokens a 4-way collision is impossible
    assert(est == 0L)
  }

  test("asOfJoin: inclusive same-ts quote, left nulls, max-struct tiebreak") {
    val quotes = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 20L, 99L), (2L, 50L, 200L))
      .toDF("k", "ts", "qid")
    val probes = Seq((1L, 9L, 900L), (1L, 20L, 901L), (1L, 25L, 902L), (2L, 40L, 903L), (3L, 5L, 904L))
      .toDF("k", "ts", "pid")
    val got = EventOps.asOfJoin(probes, quotes, Seq("k"), "ts")
      .select($"pid", $"q_qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got(900L) == -1L)  // before any quote
    // same-instant: quote at ts=20 visible; two quotes at ts=20 → greater
    // payload struct (ts equal, then qid) wins deterministically
    assert(got(901L) == 101L)
    assert(got(902L) == 101L)
    assert(got(903L) == -1L)  // quote for k=2 is later
    assert(got(904L) == -1L)  // key never quoted
  }

  test("asOfJoin: agrees with the brute-force reference on a generated set") {
    val quotes = (0 until 200).map { i =>
      (i % 7L, (i * 13 % 101).toLong, 1000L + i) }.toDF("k", "ts", "qid")
    val probes = (0 until 150).map { i =>
      (i % 9L, (i * 17 % 101).toLong, 2000L + i) }.toDF("k", "ts", "pid")
    val got = EventOps.asOfJoin(probes, quotes, Seq("k"), "ts")
      .select($"pid", $"q_qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val qs = quotes.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    probes.collect().foreach { r =>
      val (k, ts, pid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cand = qs.filter(q => q._1 == k && q._2 <= ts)
      val want = if (cand.isEmpty) -1L
        else { val m = cand.map(q => (q._2, q._3)).max; m._2 }
      assert(got(pid) == want, s"probe $pid")
    }
    assert(got.size == 150)
  }

  test("asOfJoin plan: exactly one exchange — the key shuffle, no range join") {
    val quotes = Seq((1L, 10L, 100L)).toDF("k", "ts", "qid")
    val probes = Seq((1L, 9L, 900L)).toDF("k", "ts", "pid")
    val plan = EventOps.asOfJoin(probes, quotes, Seq("k"), "ts")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(3000))
    assert(!plan.contains("Join"), plan.take(3000))
  }

  test("nearbyCount plan: equi-join on the bin — no nested-loop, no cartesian") {
    val probes = Seq((1L, 100L)).toDF("id", "t")
    val events = Seq((2L, 150L)).toDF("id", "t")
    val plan = EventOps.nearbyCount(probes, events, "id", "t", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("Join"), plan.take(3000)) // a real equi-join happened
  }

  test("valuePercentiles plan: the histogram joins BROADCAST back to the rows") {
    val df = (1L to 100L).map(v => (v, "g", v % 7L)).toDF("id", "grp", "v")
    val plan = Sketches.valuePercentiles(df, "id", "v", "grp")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    assert(!plan.contains("SortMergeJoin"), plan.take(3000))
  }

  test("funnel: sequential-min semantics — strictly-after, order, monotone counts") {
    // u1 completes all 3; u2 does B before A (B must not count);
    // u3 has B at the SAME ts as A (strictly-after excludes it);
    // u4 only A.
    val ev = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"),
      (2L, 10L, "B"), (2L, 20L, "A"), (2L, 30L, "B"), (2L, 31L, "C"),
      (3L, 10L, "A"), (3L, 10L, "B"),
      (4L, 10L, "A")
    ).toDF("u", "t", "et")
    val got = EventOps.funnel(ev, "u", "t", "et", Seq("A", "B", "C"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
      .sortBy(_._1)
    assert(got == List((1L, "A", 4L), (2L, "B", 2L), (3L, "C", 2L)))
    // monotone: each stage's cohort is a subset of the previous one
    assert(got.map(_._3) == got.map(_._3).sorted.reverse)
  }

  test("funnelBranching: alternative stage types advance on the earliest of ANY; singleton law") {
    // u1: signup then view (no click) then purchase — the view branch
    //     carries it through stage 2;
    // u2: signup, then click AND view after — stage-2 time is the
    //     EARLIEST of the two (the click at 20, not the view at 25),
    //     purchase at 22 is after click but the sequential-min time is
    //     20, so 22 > 20 counts;
    // u3: view BEFORE signup only — stage 2 must not count it;
    // u4: signup only.
    val ev = Seq(
      (1L, 10L, "signup"), (1L, 30L, "view"), (1L, 40L, "purchase"),
      (2L, 10L, "signup"), (2L, 20L, "click"), (2L, 25L, "view"),
      (2L, 22L, "purchase"),
      (3L, 5L, "view"), (3L, 10L, "signup"),
      (4L, 10L, "signup")
    ).toDF("u", "t", "et")
    val got = EventOps.funnelBranching(ev, "u", "t", "et",
      Seq(Seq("signup"), Seq("click", "view"), Seq("purchase")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toList.sortBy(_._1)
    assert(got == List((1L, "signup", 4L), (2L, "click|view", 2L),
      (3L, "purchase", 2L)))
    // singleton law: every-stage-singleton branching IS the classic funnel
    val classic = EventOps.funnel(ev, "u", "t", "et",
      Seq("signup", "view", "purchase")).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val single = EventOps.funnelBranching(ev, "u", "t", "et",
      Seq(Seq("signup"), Seq("view"), Seq("purchase"))).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(single == classic)
  }

  test("intervalPointCount: over-long interval fails loudly at the fanout cap") {
    val iv = Seq((1L, 0L, 1000L)).toDF("iid", "s", "e")
    val pts = Seq(5L).toDF("t")
    val e = intercept[Exception] {
      EventOps.intervalPointCount(iv, Seq("iid"), "s", "e", pts, "t",
        binSize = 10L, maxBinsPerInterval = 50L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("intervalPointCount")), e.getMessage)
    // and the compliant case still works at the same cap
    assert(EventOps.intervalPointCount(iv, Seq("iid"), "s", "e", pts, "t",
      binSize = 10L, maxBinsPerInterval = 200L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap == Map(1L -> 1L))
  }

  test("triangleCounts: K4 exact, star hub zero, direction/multiplicity/self-loop canonicalized") {
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, every node in exactly 3 —
    // fed as DIRECTED MULTI edges (both directions, dups, a self-loop)
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b))
    val edges = (k4 ++ Seq((1L, 2L), (3L, 3L))).toDF("s", "d")
    val got = EventOps.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == (1L to 4L).map(_ -> ((3L, 3L))).toMap)
    // star: hub 0 connected to 1..5 — no triangles anywhere, but every
    // node still reports a row (zero-fill), hub degree 5
    val star = (1L to 5L).map(i => (0L, i)).toDF("s", "d")
    val g2 = EventOps.triangleCounts(star, "s", "d")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g2(0L) == ((5L, 0L)) && (1L to 5L).forall(i => g2(i) == ((1L, 0L))))
    // one triangle hanging off the star closes exactly one
    val g3 = EventOps.triangleCounts(
      (star.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq :+ (1L, 2L))
        .toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(g3 == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }

  test("triangleDelta: A/B branch split, both-new-wedge dedup, new nodes, maintained ≡ recompute") {
    // Planted so each disjoint branch fires at least once (orientation is
    // by node id, triangle x<y<z found as wedge (x,y),(x,z) + closing (y,z)):
    //   {1,2,3}:    wedges (1,2),(1,3) OLD, closing (2,3) NEW      — case B
    //   {4,5,6}:    wedge (4,6) NEW + closing (5,6) NEW            — case A
    //   {7,8,9}:    wedge (7,9) NEW, closing (8,9) OLD             — case A
    //   {10,11,12}: ALL THREE new — BOTH wedge edges new at apex 10,
    //               the x<y rule must count the wedge exactly once
    //   {13,14,15}: both wedges NEW, closing (14,15) OLD — x<y dedup
    //               against an old closure
    // plus delta noise the canonicalizer/anti-join must drop (reversed
    // duplicate, self-loop, already-in-base edge) and a disconnected
    // base edge (20,21) that must pass through the merge untouched.
    val base = Seq((1L, 2L), (1L, 3L), (4L, 5L), (7L, 8L), (8L, 9L),
      (14L, 15L), (20L, 21L)).toDF("s", "d")
    val delta = Seq((2L, 3L), (4L, 6L), (5L, 6L), (7L, 9L), (10L, 11L),
      (10L, 12L), (11L, 12L), (13L, 14L), (13L, 15L),
      (3L, 2L), (5L, 5L), (1L, 2L)).toDF("s", "d")
    val inc = EventOps.triangleDelta(base, delta, "s", "d")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // d_degree counts surviving NEW canonical edges only (9 of the 12
    // delta rows: reversed dup, self-loop and in-base edge are dropped);
    // d_triangles is 1 at every corner of the five planted triangles —
    // the both-new-wedge cases would read 2 if the x<y dedup failed
    assert(inc == Map(
      1L -> ((0L, 1L)), 2L -> ((1L, 1L)), 3L -> ((1L, 1L)),
      4L -> ((1L, 1L)), 5L -> ((1L, 1L)), 6L -> ((2L, 1L)),
      7L -> ((1L, 1L)), 8L -> ((0L, 1L)), 9L -> ((1L, 1L)),
      10L -> ((2L, 1L)), 11L -> ((2L, 1L)), 12L -> ((2L, 1L)),
      13L -> ((2L, 1L)), 14L -> ((1L, 1L)), 15L -> ((1L, 1L))))
    // the maintained artifact ≡ the full recompute on base ∪ delta —
    // including nodes 6/10/11/12/13 that did not exist in the base
    // (full-outer merge) and the untouched (20,21) passthrough
    val maintained = EventOps.applyTriangleDelta(
      EventOps.triangleCounts(base, "s", "d"),
      EventOps.triangleDelta(base, delta, "s", "d"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val full = EventOps.triangleCounts(base.unionAll(delta), "s", "d")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(maintained == full)
    assert(maintained(10L) == ((2L, 1L)) && maintained(20L) == ((1L, 0L)))
    // an EMPTY delta increments nothing: maintained view is unchanged
    val noop = EventOps.applyTriangleDelta(
      EventOps.triangleCounts(base, "s", "d"),
      EventOps.triangleDelta(base, base.limit(1), "s", "d"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val baseOnly = EventOps.triangleCounts(base, "s", "d")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(noop == baseOnly)
  }

  test("pageRankFrom: warm-start composition is exact; new nodes seed uniform; cold ≡ pageRank") {
    // weighted multigraph with a sink and a hub — every structural case
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L), (3L, 1L, 1L),
      (4L, 1L, 5L)).toDF("s", "d", "n")
    def ranksOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // composition law: a cold iterations then b warm ≡ a+b cold — the
    // integer fixed-point step makes this bit-exact, not approximate
    for ((a, b) <- Seq((1, 2), (2, 3))) {
      val warm = ranksOf(EventOps.pageRankFrom(edges, "s", "d", "n",
        EventOps.pageRank(edges, "s", "d", "n", iters = a), iters = b))
      val cold = ranksOf(EventOps.pageRank(edges, "s", "d", "n", iters = a + b))
      assert(warm == cold, s"a=$a b=$b: $warm vs $cold")
    }
    // a node the init never saw (graph grew) starts at the uniform scale:
    // warm-starting the GROWN graph from the old artifact equals cold
    // ranks when the old artifact was itself the uniform start's ranks
    val grown = edges.unionByName(Seq((5L, 2L, 1L)).toDF("s", "d", "n"))
    val oldArtifact = EventOps.pageRank(edges, "s", "d", "n", iters = 1)
    val warmGrown = ranksOf(EventOps.pageRankFrom(grown, "s", "d", "n",
      oldArtifact, iters = 1))
    // node 5 exists in the output (uniform-seeded) and every node has a rank
    assert(warmGrown.contains(5L) && warmGrown.size == 5)
    // and a departed node drops out: ranks are over the CURRENT edges
    val shrunk = edges.filter(col("s") =!= 4L)
    val warmShrunk = ranksOf(EventOps.pageRankFrom(shrunk, "s", "d", "n",
      oldArtifact, iters = 1))
    assert(!warmShrunk.contains(4L) && warmShrunk.size == 3)
  }

  test("kCorePeel: cascade peels a chain round by round; clique survives; exact-rounds contract") {
    // K4 on {1,2,3,4} plus a pendant chain 4-5-6: at k=2 the chain peels
    // one node per round (6 first, then 5), K4 never peels
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val g = (k4 ++ Seq((4L, 5L), (5L, 6L), (6L, 6L), (2L, 1L))) // self-loop + reverse dup absorbed
      .toDF("s", "d")
    def run(rounds: Int) = EventOps.kCorePeel(g, "s", "d", k = 2, rounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1: only 6 has degree < 2 → peels; 5 keeps but its degree
    // drops to 1 (the exactly-rounds readout shows what round 2 sees)
    assert(run(1) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L, 5L -> 1L))
    // round 2 peels 5; round 3 is a fixed point (K4 alone, all degree 3)
    val k4Only = Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
    assert(run(2) == k4Only && run(3) == k4Only)
    // a too-high k empties the graph (no survivors, empty frame)
    assert(EventOps.kCorePeel(g, "s", "d", k = 5, rounds = 2).isEmpty)
  }

  test("kCoreDelta: rescue cascade crosses the ball, fold ≡ full, noop delta, loud bound") {
    // standing: square 1-2-3-4 (survives forever at k=2) + pendant chain
    // 1-7-6-5 peeling one node per round (5@r1, 6@r2, 7@r3)
    val standing = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (1L, 7L), (7L, 6L), (6L, 5L)).toDF("s", "d")
    def art(df: org.apache.spark.sql.DataFrame) =
      EventOps.kCoreRounds(df, "s", "d", k = 2, rounds = 3)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) 0 else r.getInt(1))).toMap
    assert(art(standing) == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0,
      5L -> 1, 6L -> 2, 7L -> 3))
    // delta: triangle 5-8-9 rescues 5; the rescue cascades 2 hops (6 at
    // round 2, 7 at round 3) — exactly the rounds−1 ball radius; node 1
    // stays OUTSIDE the ball and feeds the re-peel as boundary state
    val delta = Seq((5L, 8L), (5L, 9L), (8L, 9L)).toDF("s", "d")
    val standingArt = EventOps.kCoreRounds(standing, "s", "d", 2, 3)
    def toMapArt(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) 0 else r.getInt(1))).toMap
    val folded = toMapArt(EventOps.kCoreDelta(
      standingArt, standing, delta, "s", "d", k = 2, rounds = 3))
    val full = art(standing.unionByName(delta))
    assert(folded == full, s"folded $folded != full $full")
    assert(full.values.forall(_ == 0), "everything survives after the rescue")
    // the survivors readout matches kCorePeel on the union graph
    val union = standing.unionByName(delta)
    val canon = union.select(least(col("s"), col("d")).as("x"),
      greatest(col("s"), col("d")).as("y")).distinct()
    val viaFold = EventOps.kCoreSurvivors(EventOps.kCoreDelta(
        standingArt, standing, delta, "s", "d", 2, 3), canon)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFull = EventOps.kCorePeel(union, "s", "d", 2, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFold == viaFull)
    // noop delta (already-standing edges) returns the artifact verbatim
    val noop = toMapArt(EventOps.kCoreDelta(standingArt, standing,
      Seq((1L, 2L), (2L, 1L)).toDF("s", "d"), "s", "d", 2, 3))
    assert(noop == art(standing))
    // the cascade ball must refuse loudly above the bound
    val e = intercept[IllegalArgumentException] {
      EventOps.kCoreDelta(standingArt, standing, delta, "s", "d", 2, 3,
        maxBallNodes = 2L)
    }
    assert(e.getMessage.contains("maxBallNodes"))
    // an artifact that does NOT cover every standing node must fail
    // loudly, not silently count the absentee as alive boundary state:
    // node 1 is outside the ball (pure boundary) — drop its artifact row
    val holey = standingArt.filter(col("node") =!= 1L)
    val cov = intercept[IllegalArgumentException] {
      EventOps.kCoreDelta(holey, standing, delta, "s", "d", 2, 3).collect()
    }
    assert(cov.getMessage.contains("absent from the standing artifact"),
      s"got: ${cov.getMessage}")
  }

  test("pageRankDelta: folded artifact ranks ≡ full recompute; warm composition; loud bound") {
    // standing graph with a sink and a hub; delta touches an existing
    // source (2), adds a parallel row for an existing edge (1→2), and
    // introduces a brand-new source AND node (5→6)
    val standing = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L),
      (3L, 1L, 1L), (4L, 1L, 5L)).toDF("s", "d", "n")
    val delta = Seq((2L, 1L, 4L), (1L, 2L, 2L), (5L, 6L, 1L)).toDF("s", "d", "n")
    val union = standing.unionByName(delta)
    def ranksOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val art = EventOps.pageRankEdgeArtifact(standing, "s", "d", "n")
      .localCheckpoint()
    // the folded artifact is row-identical to the recomputed one
    val folded = EventOps.pageRankDelta(art, delta, "s", "d", "n", iters = 3)
    assert(ranksOf(folded) == ranksOf(
      EventOps.pageRank(union, "s", "d", "n", iters = 3)))
    // warm composition through the fold: a cold iterations on the union,
    // then b warm via the fold ≡ a+b cold on the union (bit-exact)
    val prev = EventOps.pageRank(union, "s", "d", "n", iters = 1)
    assert(ranksOf(EventOps.pageRankDelta(art, delta, "s", "d", "n",
        initRanks = Some(prev), iters = 2))
      == ranksOf(EventOps.pageRank(union, "s", "d", "n", iters = 3)))
    // an empty-ish delta bound refuses loudly
    val tooBig = intercept[IllegalArgumentException] {
      EventOps.pageRankDelta(art, delta, "s", "d", "n", iters = 1,
        maxDeltaEdges = 1L)
    }
    assert(tooBig.getMessage.contains("maxDeltaEdges"))
  }

  test("linearAttribution: equal split + remainder on latest touch, window excludes, conservation") {
    // purchase P1 (rev 10) by u1 at t=100: touches at 90, 95, 99 →
    //   10 div 3 = 3 each, remainder 1 rides the t=99 touch (day 0);
    // purchase P2 (rev 7) by u2 at t=100: its only click is at t=5,
    //   95 > lookback 50 → unattributed, whole 7 in day -1;
    // purchase P3 (rev 5) by u1 at t=200: single touch at 180 → 5.
    val purchases = Seq((1L, 100L, 101L, 10L), (2L, 100L, 102L, 7L),
      (1L, 200L, 103L, 5L)).toDF("u", "pt", "pid", "rev")
    val clicks = Seq((1L, 90L, 11L), (1L, 95L, 12L), (1L, 99L, 13L),
      (2L, 5L, 14L), (1L, 180L, 15L)).toDF("u", "ct", "cid")
    val got = EventOps.linearAttribution(purchases, clicks,
      "u", "pt", "pid", "rev", "ct", "cid", lookback = 50L, dayMicros = 100L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // day 0 holds P1's three shares (3+3+4); day 1 holds P3's 5
    assert(got == Map(0L -> ((3L, 10L)), 1L -> ((1L, 5L)), -1L -> ((1L, 7L))))
    // conservation: attributed sums to total revenue exactly
    assert(got.values.map(_._2).sum == 22L)
  }

  test("keySkewProfile: exact shares, cumulative concentration, tie rank by key") {
    // counts: a=6, b=3, c=3, d=1 (total 13); ties b/c rank by key asc
    val rows = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++
      Seq("d")).toDF("k")
    val got = EventOps.keySkewProfile(rows, "k", k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toList.sortBy(_._1)
    assert(got == List(
      (1L, "a", 6L, 6000 / 13L, 6000 / 13L),
      (2L, "b", 3L, 3000 / 13L, 9000 / 13L),
      (3L, "c", 3L, 3000 / 13L, 12000 / 13L)))
  }

  test("associationRules: exact permilles, directional confidence, symmetric pair counts") {
    // 4 sessions (gap 100): s1{A,B}, s2{A,B}, s3{A}, s4{B,C} →
    // N=4, n_A=3, n_B=3, n_C=1, n_AB=2, n_BC=1
    val ev = Seq(
      (1L, 0L, "A"), (1L, 10L, "B"),            // s1
      (1L, 500L, "A"), (1L, 510L, "B"),         // s2
      (2L, 0L, "A"),                            // s3
      (3L, 0L, "B"), (3L, 10L, "C"), (3L, 20L, "B") // s4 (B twice: distinct)
    ).toDF("u", "t", "et")
    val got = EventOps.associationRules(ev, "u", "t", "et", gap = 100L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // A→B: sup 2000/4=500, conf 2000/3=666, lift 2000·4/(3·3)=888
    assert(got(("A", "B")) == ((2L, 3L, 3L, 500L, 666L, 888L)))
    // B→A mirrors counts but swaps n_a/n_b (same conf here since equal)
    assert(got(("B", "A")) == ((2L, 3L, 3L, 500L, 666L, 888L)))
    // B→C vs C→B: same pair count, DIFFERENT confidence (directional)
    assert(got(("B", "C")) == ((1L, 3L, 1L, 250L, 333L, 1333L)))
    assert(got(("C", "B")) == ((1L, 1L, 3L, 250L, 1000L, 1333L)))
    // pair counts agree with the co-occurrence readout on the same input
    val co = EventOps.sessionCooccurrence(ev, "u", "t", "et", 100L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(co.forall { case ((a, b), n) => got((a, b))._1 == n })
  }

  test("scdIntervals: runs collapse to versions, open-ended current, null-safe transitions") {
    val log = Seq(
      (1L, 10L, Some("x")), (1L, 20L, Some("x")), (1L, 30L, Some("y")),
      (1L, 40L, Some("y")), (1L, 50L, Some("x")),
      (2L, 10L, None), (2L, 20L, None), (2L, 30L, Some("z")), (2L, 40L, None)
    ).toDF("k", "t", "v")
    val got = EventOps.scdIntervals(log, "k", "t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        (Option(r.getString(1)), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(got == Map(
      (1L, 1L) -> ((Some("x"), 10L, Some(30L))),
      (1L, 2L) -> ((Some("y"), 30L, Some(50L))),
      (1L, 3L) -> ((Some("x"), 50L, None)), // value RECURS as a new version
      (2L, 1L) -> ((None, 10L, Some(30L))), // leading NULL run kept
      (2L, 2L) -> ((Some("z"), 30L, Some(40L))),
      (2L, 3L) -> ((None, 40L, None)))) // X→NULL is a change
  }

  test("abReadout: variants partition users, permilles exact, self-lift 1000") {
    val ev = (1L to 200L).flatMap { u =>
      Seq((u, "view")) ++ (if (u % 3 == 0) Seq((u, "purchase")) else Nil)
    }.toDF("u", "et")
    val rows = EventOps.abReadout(ev, "u", "et", "purchase", variants = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows.keySet == Set(0L, 1L))
    // the hash split partitions the population exactly
    assert(rows.values.map(_._1).sum == 200L)
    assert(rows.values.map(_._2).sum == (1L to 200L).count(_ % 3 == 0))
    // per-row formulas exact; variant 0's self-lift is exactly 1000
    rows.foreach { case (_, (u, c, p, _)) => assert(p == c * 1000 / u) }
    assert(rows(0L)._4 == 1000L)
  }

  test("abReadoutCuped: constant covariate degenerates to raw; perfect covariate equalizes variants") {
    // constant X (every user 2 views): Var(X)=0 → theta=0 → adj == raw
    val const = (1L to 100L).flatMap { u =>
      Seq((u, "view"), (u, "view")) ++
        (if (u % 3 == 0) Seq((u, "purchase")) else Nil)
    }.toDF("u", "et")
    val g0 = EventOps.abReadoutCuped(const, "u", "et", "purchase", "view")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(g0.values.forall { case (_, th, raw, adj) => th == 0L && raw == adj })
    assert(g0.values.map(_._1).sum == 100L)
    // perfect covariate (X == Y: converters get exactly one view):
    // theta_micro = 1e6 exactly, and the adjusted means collapse to the
    // pooled mean — the variant difference vanishes (±2 micro for the
    // two truncated divisions)
    val perfect = (1L to 100L).flatMap { u =>
      Seq((u, "signup")) ++
        (if (u % 3 == 0) Seq((u, "view"), (u, "purchase")) else Nil)
    }.toDF("u", "et")
    val g1 = EventOps.abReadoutCuped(perfect, "u", "et", "purchase", "view")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(g1.values.forall(_._1 == 1000000L))
    val pooledMicro = 33L * 1000000L / 100L
    assert(g1.values.forall { case (_, _, adj) =>
      math.abs(adj - pooledMicro) <= 2L })
    // and the raw means genuinely differed before adjustment (the hash
    // split won't land conversions perfectly evenly)
    assert(g1.values.map(_._2).toSet.size >= 1)
  }

  test("quantileShift: exact per-bucket quantiles, consecutive deltas, first bucket null") {
    import graft.pipeline.Sketches
    // day 1: 1..10 (q50 = 5, q90 = 9); day 2: 11..20 (+10 shift each)
    val rows = ((1L to 10L).map((1L, _)) ++ (11L to 20L).map((2L, _)))
      .toDF("day", "v")
    val got = Sketches.quantileShift(rows, "v", "day", Seq(50, 90))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(got == Map(1L -> ((5L, -1L, 9L, -1L)),
      2L -> ((15L, 10L, 19L, 10L))))
  }

  test("chiSquareDrift: uniform table is zero; full flip gives chi2 = N; exact micro terms") {
    import graft.pipeline.Sketches
    // uniform 2x2: expected == observed everywhere → 0
    val uni = (Seq.fill(10)((1L, "a")) ++ Seq.fill(10)((1L, "b")) ++
      Seq.fill(10)((2L, "a")) ++ Seq.fill(10)((2L, "b"))).toDF("b", "cat")
    val g0 = Sketches.chiSquareDrift(uni, "b", "cat")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g0 == Map(1L -> ((20L, 0L)), 2L -> ((20L, 0L))))
    // complete flip [[20,0],[0,20]]: chi2 == N == 40, split evenly —
    // each cell contributes 1e6·(o·N−r·c)²/(N·r·c) = 10e6 exactly
    val flip = (Seq.fill(20)((1L, "a")) ++ Seq.fill(20)((2L, "b")))
      .toDF("b", "cat")
    val g1 = Sketches.chiSquareDrift(flip, "b", "cat")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g1 == Map(1L -> ((20L, 20000000L)), 2L -> ((20L, 20000000L))))
    assert(g1.values.map(_._2).sum == 40L * 1000000L) // Σ buckets = χ²·1e6 = N·1e6
  }

  test("corpusCube: subtotal planes conserve the grand total; <all> labels") {
    import graft.pipeline.TextAnalysis
    val docs = Seq(
      ("web", "en", "a b c"), ("web", "en", "d e"), ("web", "de", "f"),
      ("book", "en", "g h i j")
    ).toDF("source", "lang", "text")
    val got = TextAnalysis.corpusCube(docs, "source", "lang", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("web", "en")) == ((2L, 5L)))
    assert(got(("web", "<all>")) == ((3L, 6L)))
    assert(got(("<all>", "en")) == ((3L, 9L)))
    assert(got(("<all>", "<all>")) == ((4L, 10L)))
    // every plane sums to the grand total (doc and token conservation)
    val cells = got.filter { case ((a, b), _) => a != "<all>" && b != "<all>" }
    assert(cells.values.map(_._1).sum == 4L && cells.values.map(_._2).sum == 10L)
    assert(got.size == 3 + 2 + 2 + 1) // cells + row/col subtotals + total
  }

  test("decayedEventScores: exact literal weights, horizon cutoff, per-key sums") {
    // weights at 900‰: w0=1000000, w1=900000, w2=810000 (exact decimals)
    val w = EventOps.decayWeightTable(900, 5).toMap
    assert(w(0L) == 1000000L && w(1L) == 900000L && w(2L) == 810000L &&
      w(3L) == 729000L && w(4L) == 656100L)
    // key A: 2 events today + 1 two days ago; key B: 1 event at the
    // horizon edge (age 4, counted) and 1 beyond it (age 5, cut)
    val ev = Seq(("A", 100L), ("A", 100L), ("A", 98L),
      ("B", 96L), ("B", 95L)).toDF("k", "day")
    val got = EventOps.decayedEventScores(ev, "k", "day",
      refDay = 100L, decayPermille = 900, horizonDays = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A" -> (2L * 1000000L + 810000L), "B" -> 656100L))
  }

  test("pointInTimeLookup: facts pick the covering SCD2 version; pre-history nulls; min tie rule") {
    // key 1: value x from t=10, y from t=30, x again from t=50;
    // at t=20 two observations (z and a) — min picks "a" as a version
    val log = Seq((1L, 10L, "x"), (1L, 30L, "y"), (1L, 50L, "x"),
      (2L, 20L, "z"), (2L, 20L, "a")).toDF("k", "t", "v")
    val facts = Seq((1L, 15L, 100L), (1L, 30L, 101L), (1L, 49L, 102L),
      (1L, 60L, 103L), (1L, 5L, 104L), (2L, 25L, 105L))
      .toDF("k", "t", "fid")
    val got = EventOps.pointInTimeLookup(facts, log, "k", "t", "v")
      .collect().map(r => r.getLong(2) -> // cols: k, t, fid, q_t, q_value, q_version
        (Option(r.getString(4)), if (r.isNullAt(5)) -1L else r.getLong(5)))
      .toMap
    assert(got == Map(
      100L -> ((Some("x"), 1L)), // inside version 1
      101L -> ((Some("y"), 2L)), // exactly at a version start
      102L -> ((Some("y"), 2L)), // just before the next change
      103L -> ((Some("x"), 3L)), // the recurring value is version 3
      104L -> ((None, -1L)),     // before any observation
      105L -> ((Some("a"), 1L)))) // min tie rule at the duplicate ts
  }

  test("topEventPaths: gap splits sessions, paths order by time, count ties rank by path") {
    // u1: A,B then (gap) C  → paths "A>B" and "C"
    // u2: A,B in one session → "A>B" again (count 2)
    // u3: B,A out of order in arrival but t-ordered → "A>B"? no: t 5=B, 9=A → "B>A"
    val ev = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 500L, "C"),
      (2L, 100L, "A"), (2L, 150L, "B"),
      (3L, 9L, "A"), (3L, 5L, "B")
    ).toDF("u", "t", "et")
    val got = EventOps.topEventPaths(ev, "u", "t", "et", gap = 100L, k = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(got == List((1L, "A>B", 2L), (2L, "B>A", 1L), (3L, "C", 1L)))
  }

  test("cusum change point: planted rate shift peaks at the boundary; constant rate scores 0") {
    // days 1..10 at 2 rows/day, days 11..20 at 10 rows/day
    val shifted = ((1L to 10L).flatMap(d => Seq.fill(2)(d)) ++
      (11L to 20L).flatMap(d => Seq.fill(10)(d))).toDF("day")
    val r = Sketches.cusumChangePoint(shifted, "day").collect().head
    assert(r.getLong(2) == 10L, s"at_bucket ${r.getLong(2)}") // the boundary
    assert(r.getLong(0) == 20L && r.getLong(1) == 120L)
    assert(r.getLong(4) > 200L) // strong signal
    val const = (1L to 20L).flatMap(d => Seq.fill(5)(d)).toDF("day")
    assert(Sketches.cusumChangePoint(const, "day").collect().head.getLong(4) == 0L)
  }

  test("madOutliers: planted outlier flagged, bulk untouched, zero-MAD group degenerate rule") {
    // group a: values around 50 (median 50, MAD 2) with one wild point
    val a = Seq((1L, "a", 48L), (2L, "a", 50L), (3L, "a", 50L),
      (4L, "a", 52L), (5L, "a", 53L), (6L, "a", 500L))
    // group b: over half identical -> MAD 0; any deviation >= 1 flags
    val b = Seq((11L, "b", 7L), (12L, "b", 7L), (13L, "b", 7L), (14L, "b", 8L))
    val got = Sketches.madOutliers(
      (a ++ b).toDF("id", "g", "v"), "id", "v", "g", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // group a: median 50, deviations {2,0,0,2,3,450} -> MAD 2; only 450 > 6
    assert(got(6L) == ((50L, 2L, 1L)), got.toString)
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(got(_)._3 == 0L))
    // group b: median 7, MAD 0 -> the deviation-1 point flags
    assert(got(14L) == ((7L, 0L, 1L)) && got(11L)._3 == 0L)
  }

  test("transitionFit: argmax prediction, tie to greater type, correctness rollup exact") {
    // from A: 2x->B, 1x->C (predict B, 2/3 correct); from B: 1x->A
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "C")
    ).toDF("u", "t", "et")
    val got = EventOps.transitionFit(ev, "u", "t", "et")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("A") == (("B", 3L, 2L)), got.toString)
    assert(got("B") == (("A", 1L, 1L)))
  }

  test("sessionCooccurrence: same-session pairs only, counted once per session") {
    // u1 session1: A,B,A (pair A-B once); u1 session2: A,C;
    // u2 session1: B,C
    val ev = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"),
      (1L, 500L, "A"), (1L, 501L, "C"),
      (2L, 1L, "B"), (2L, 2L, "C")
    ).toDF("u", "t", "et")
    val got = EventOps.sessionCooccurrence(ev, "u", "t", "et", gap = 100L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "B") -> 1L, ("A", "C") -> 1L, ("B", "C") -> 1L))
  }

  test("eventTransitions: time-ordered lag pairs, first events emit nothing") {
    val ev = Seq(
      (1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "A"),
      (2L, 5L, "B"), (2L, 6L, "A"),
      (3L, 1L, "C")
    ).toDF("u", "t", "et")
    val got = EventOps.eventTransitions(ev, "u", "t", "et")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("A", "B") -> 1L, ("B", "A") -> 2L))
  }

  test("cdc chunks: boundaries re-sync after an insertion; short docs emit one chunk") {
    import graft.pipeline.Dedup
    val rnd = new scala.util.Random(7)
    val body = (0 until 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = body.substring(0, 30) + " INSERTED CLAUSE HERE " + body.substring(30)
    val docs = Seq((1L, body), (2L, edited), (3L, "tiny")).toDF("doc_id", "text")
    val ch = Dedup.cdcChunks(docs, "doc_id", "text", window = 16, mask = 32)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val fp1 = ch.filter(_._1 == 1L).map(_._2)
    val fp2 = ch.filter(_._1 == 2L).map(_._2)
    // the tail chunks re-sync: most of doc 1's chunks survive verbatim in
    // doc 2 even though every absolute position after char 30 shifted
    val shared = fp1.toSet.intersect(fp2.toSet).size
    assert(fp1.length >= 5, s"want several chunks, got ${fp1.length}")
    assert(shared >= fp1.length - 2,
      s"only $shared of ${fp1.length} chunks survived the insertion")
    // a fixed-width chunking at the same grain shares NOTHING after the
    // edit: every 32-char-aligned window past position 30 shifted
    val fixed1 = body.grouped(32).toSeq
    val fixed2 = edited.grouped(32).toSeq
    assert(fixed1.toSet.intersect(fixed2.toSet).size <= 1)
    // short doc: one whole-doc chunk at start 1
    val tiny = ch.filter(_._1 == 3L)
    assert(tiny.length == 1)
  }

  test("containment flags quote-inclusion that symmetric Jaccard misses") {
    import graft.pipeline.Dedup
    val quote = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, quote), // the short original
      (2L, s"intro words here then $quote and a very long tail " +
        "one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
      (3L, "completely unrelated content with nothing shared at all here"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, tauPermille = 900)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    assert(cont.keySet == Set((1L, 2L)))
    assert(cont((1L, 2L)) == 1000L) // every 3-gram of the quote is in doc 2
    // symmetric Jaccard at the same strictness finds nothing
    val jac = Dedup.nearDuplicates(docs, "doc_id", "text", 3, 9, 10)
      .collect()
    assert(jac.isEmpty)
  }

  test("exactKeepBest: keeps the highest-score copy, ties by id; uniques pass through") {
    import graft.pipeline.Dedup
    val docs = Seq(
      (1L, "same text", 5L), (2L, "same  TEXT", 9L), (3L, "Same text", 9L),
      (4L, "unique here", 7L)).toDF("doc_id", "text", "score")
    val got = Dedup.exactKeepBest(docs, "doc_id", "text", "score")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(3L -> ((9L, 3L)), 4L -> ((7L, 1L))))
  }

  test("ksDriftMatrix: every pair equals the two-corpus ksDrift; no self/dup pairs") {
    val df = (Seq.fill(30)(("a", 1L)) ++ Seq.fill(20)(("a", 5L)) ++
      Seq.fill(25)(("b", 2L)) ++ Seq.fill(25)(("b", 5L)) ++
      Seq.fill(40)(("c", 9L))).toDF("g", "v")
    val m = Sketches.ksDriftMatrix(df, "v", "g")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(m.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    for (((ga, gb), got) <- m) {
      val single = Sketches.ksDrift(
        df.filter($"g" === ga), df.filter($"g" === gb), "v").collect().head
      assert(got == ((single.getLong(0), single.getLong(1),
        single.getLong(2), single.getLong(4))), s"pair ($ga,$gb)")
    }
    // disjoint pair saturates
    assert(m(("a", "c"))._4 == 1000L && m(("b", "c"))._4 == 1000L)
  }

  test("retentionSegmented: per-segment matrix conserves the plain retention") {
    val ev = Seq(
      (1L, 5L, "a"), (1L, 12L, "a"), (1L, 35L, "b"),
      (2L, 15L, "b"),
      (3L, 9L, "a"), (3L, 11L, "a")
    ).toDF("u", "t", "sv")
    val got = EventOps.retentionSegmented(ev, "u", "t", "sv", bucketSize = 10L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    // u1 seg a (first event), cohorts as the plain case; u2 seg b; u3 seg a
    assert(got == Map(("a", 0L, 0L) -> 2L, ("a", 0L, 1L) -> 2L,
      ("a", 0L, 3L) -> 1L, ("b", 1L, 0L) -> 1L), got.toString)
    // conservation vs the plain retention on the same events
    val plain = EventOps.retentionCohorts(ev.select($"u", $"t"), "u", "t", 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rolled = got.groupBy { case ((_, c, o), _) => (c, o) }
      .view.mapValues(_.values.sum).toMap
    assert(rolled == plain)
  }

  test("retention cohorts: hand case, offset-0 totality, multi-event days count once") {
    // day buckets of size 10: u1 first day 0, active days 0,1,3 (day 1
    // twice — counts once); u2 first day 1, active 1 only; u3 first day
    // 0, active 0 and 1.
    val ev = Seq(
      (1L, 5L), (1L, 12L), (1L, 13L), (1L, 35L),
      (2L, 15L),
      (3L, 9L), (3L, 11L)
    ).toDF("u", "t")
    val got = EventOps.retentionCohorts(ev, "u", "t", bucketSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((0L, 0L) -> 2L, (0L, 1L) -> 2L, (0L, 3L) -> 1L, (1L, 0L) -> 1L))
    // offset 0 rows cover every user exactly once (by definition of cohort)
    assert(got.collect { case ((_, 0L), n) => n }.sum == 3L)
  }

  test("asOfJoin lookback window: stale match nulls out, row survives") {
    val quotes = Seq((1L, 10L, 100L), (2L, 10L, 200L)).toDF("k", "ts", "qid")
    val probes = Seq((1L, 15L, 900L), (2L, 50L, 901L)).toDF("k", "ts", "pid")
    val got = EventOps.asOfJoin(probes, quotes, Seq("k"), "ts", maxLookback = 20L)
      .select($"pid", $"q_qid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(900L -> 100L, 901L -> -1L)) // 40 > 20: attribution expired
  }

  test("funnelTiming: exact per-stage gap sums and maxima; stage 1 zero") {
    // u1: A@10 B@25 C@30 (gaps 15, 5); u2: A@100 B@160 (gap 60)
    val ev = Seq((1L, 10L, "A"), (1L, 25L, "B"), (1L, 30L, "C"),
      (2L, 100L, "A"), (2L, 160L, "B")).toDF("u", "t", "et")
    val got = EventOps.funnelTiming(ev, "u", "t", "et", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(1L -> (2L, 0L, 0L), 2L -> (2L, 75L, 60L), 3L -> (1L, 5L, 5L)))
    // counts agree with the plain funnel on the same input
    val plain = EventOps.funnel(ev, "u", "t", "et", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(plain == got.view.mapValues(_._1).toMap)
  }

  test("ksDrift: zero on identical corpora, 1000 permille on disjoint, exact hand case") {
    val a = Seq(1L, 2L, 2L, 3L).toDF("v")
    assert(Sketches.ksDrift(a, a, "v").collect().head.getLong(4) == 0L)
    val b = Seq(10L, 11L).toDF("v")
    val disjoint = Sketches.ksDrift(a, b, "v").collect().head
    assert(disjoint.getLong(4) == 1000L && disjoint.getLong(2) == 3L)
    // hand case: A = {1,2,2,3}, B = {2,3,3,4}: cdf gaps at v=1:|1*4-0|=4,
    // v=2: |3*4-1*4|=8, v=3: |4*4-3*4|=4, v=4: 0 → max 8 at v=2
    val c = Seq(2L, 3L, 3L, 4L).toDF("v")
    val r = Sketches.ksDrift(a, c, "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)) ==
      ((4L, 4L, 2L, 500L)))
    assert(r.getDecimal(3).longValueExact() == 8L)
    // empty / one-side-empty inputs: zero rows, never a null or /0 row
    val empty = Seq.empty[Long].toDF("v")
    assert(Sketches.ksDrift(empty, a, "v").collect().isEmpty)
    assert(Sketches.ksDrift(empty, empty, "v").collect().isEmpty)
    assert(Sketches.cusumChangePoint(empty, "v").collect().isEmpty)
  }

  test("funnelSegmented: per-segment counts sum to the plain funnel; first-event cohort label") {
    // u1 (segment a) completes A,B; u2 (segment b) completes A;
    // u3's first event carries segment a, later events b — label stays a
    val ev = Seq(
      (1L, 10L, "A", "a"), (1L, 20L, "B", "a"),
      (2L, 10L, "A", "b"),
      (3L, 5L, "A", "a"), (3L, 9L, "B", "b")
    ).toDF("u", "t", "et", "sv")
    val got = EventOps.funnelSegmented(ev, "u", "t", "et", "sv", Seq("A", "B"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == Map(("a", 1L) -> 2L, ("b", 1L) -> 1L, ("a", 2L) -> 2L))
    val plain = EventOps.funnel(ev, "u", "t", "et", Seq("A", "B"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(plain(1L) == 3L && plain(2L) == 2L)
    // conservation: per-stage segment counts sum to the plain funnel
    assert(got.collect { case ((_, 1L), n) => n }.sum == plain(1L))
    assert(got.collect { case ((_, 2L), n) => n }.sum == plain(2L))
  }

  test("funnel: earliest qualifying time feeds the next stage (not any later one)") {
    // A at 10; B at 15 and 40; C at 20. If stage B greedily took 40, C
    // at 20 would be missed — sequential-min must use B=15.
    val ev = Seq((7L, 10L, "A"), (7L, 15L, "B"), (7L, 40L, "B"), (7L, 20L, "C"))
      .toDF("u", "t", "et")
    val got = EventOps.funnel(ev, "u", "t", "et", Seq("A", "B", "C"))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(got == Map("A" -> 1L, "B" -> 1L, "C" -> 1L))
  }

  test("cmsDriftSeries: identical buckets zero l1; disjoint vocab l1 = both masses; gap buckets pair with previous present") {
    // buckets 1 and 2 share the same text (zero drift), bucket 4 (gap at
    // 3) flips vocabulary entirely
    val df = Seq((1L, "aa bb"), (2L, "aa bb"), (4L, "cc dd"))
      .toDF("b", "txt")
    val got = Sketches.cmsDriftSeries(df, "txt", "b", d = 2, w = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // pair (2,1): identical sketches → l1 0, cells_changed 0, mass 4 each
    assert(got((2L, 1L)) == ((0L, 0L, 4L, 4L)))
    // pair (4,2): disjoint tokens → every cell changes hands; l1 = 8
    // unless a cross-vocab cell collision cancels — with w=32 and these
    // 4 tokens, verify against the reference cell tables
    val cells = Seq("aa", "bb", "cc", "dd").flatMap(t =>
      (0 until 2).map(r => (t, r.toLong, hash60Ref(s"$r:$t") % 32)))
    val mA = cells.filter(c => Set("aa", "bb")(c._1)).groupBy(c => (c._2, c._3)).view.mapValues(_.size.toLong).toMap
    val mB = cells.filter(c => Set("cc", "dd")(c._1)).groupBy(c => (c._2, c._3)).view.mapValues(_.size.toLong).toMap
    val l1Ref = (mA.keySet ++ mB.keySet).toSeq
      .map(k => math.abs(mA.getOrElse(k, 0L) - mB.getOrElse(k, 0L))).sum
    assert(got((4L, 2L))._1 == l1Ref && got((4L, 2L))._3 == 4L && got((4L, 2L))._4 == 4L)
    // first bucket emits nothing
    assert(!got.contains((1L, 1L)) && got.size == 2)
  }

  test("tvDriftMatrix: identical mixes 0 permille, disjoint 1000; dev_scaled exact on a hand case") {
    val df = Seq(
      ("s1", "en"), ("s1", "en"), ("s1", "fr"),
      ("s2", "en"), ("s2", "en"), ("s2", "fr"), // s2 ≡ s1 scaled 1×
      ("s3", "de"), ("s3", "de")                // disjoint from both
    ).toDF("src", "lang")
    val got = Sketches.tvDriftMatrix(df, "lang", "src")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // s1 vs s2: identical distributions → all devs 0, tv 0
    assert(got(("s1", "s2", "en")) == ((3L, 3L, 0L, 0L)))
    assert(got(("s1", "s2", "fr")) == ((3L, 3L, 0L, 0L)))
    // s1 vs s3: disjoint → tv_permille 1000; dev for en = |2·2 − 0·3| = 4
    assert(got(("s1", "s3", "en")) == ((3L, 2L, 4L, 1000L)))
    assert(got(("s1", "s3", "de")) == ((3L, 2L, 6L, 1000L)))
    // 3 unordered pairs × their categories; no self pairs
    assert(got.keySet.map(k => (k._1, k._2)) ==
      Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
  }

  test("psiDriftMatrix: hand-computed smoothed terms; identical mixes score 0") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"), // a: x=3, y=1
      ("b", "x"), ("b", "y"), ("b", "y"), ("b", "y"), // b: x=1, y=3
      ("c", "x"), ("c", "x"), ("c", "x"), ("c", "y")  // c ≡ a
    ).toDF("src", "lang")
    val got = Sketches.psiDriftMatrix(df, "lang", "src")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // a vs b, cat x: p=(3+1)/(4+2)=2/3, q=(1+1)/6=1/3 →
    // term = (1/3)·ln 2 = 0.23104906… → 231049 micro; y mirrors it
    assert(got(("a", "b", "x")) == ((3L, 1L, 231049L, 462098L)), got.toString)
    assert(got(("a", "b", "y")) == ((1L, 3L, 231049L, 462098L)))
    // identical distributions: p = q on every cat → terms and total 0
    assert(got(("a", "c", "x")) == ((3L, 3L, 0L, 0L)))
    assert(got(("a", "c", "y")) == ((1L, 1L, 0L, 0L)))
    // census fold law: two disjoint halves fold by addition and the
    // readout is row-identical to the direct matrix
    val h1 = Sketches.categoryCensusTable(df.limit(6), "lang", "src")
    val h2 = Sketches.categoryCensusTable(df.exceptAll(df.limit(6)), "lang", "src")
    val folded = Sketches.psiDriftFromCensus(
      Sketches.foldCategoryCensus(h1, h2))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(folded == got, s"folded $folded vs direct $got")
  }

  test("jsDriftMatrix: hand-computed symmetric terms; identical mixes score 0; census readout folds") {
    val df = Seq(
      ("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"), // a: x=3, y=1
      ("b", "x"), ("b", "y"), ("b", "y"), ("b", "y"), // b: x=1, y=3
      ("c", "x"), ("c", "x"), ("c", "x"), ("c", "y")  // c ≡ a
    ).toDF("src", "lang")
    val got = Sketches.jsDriftMatrix(df, "lang", "src")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // a vs b, cat x: p=2/3, q=1/3, m=1/2 →
    // term = ½(p·ln(p/m) + q·ln(q/m)) = 0.02831650… → 28317 micro;
    // cat y swaps p and q — SAME term (JS is symmetric)
    assert(got(("a", "b", "x")) == ((3L, 1L, 28317L, 56634L)), got.toString)
    assert(got(("a", "b", "y")) == ((1L, 3L, 28317L, 56634L)))
    assert(got(("a", "c", "x")) == ((3L, 3L, 0L, 0L)))
    assert(got(("a", "c", "y")) == ((1L, 1L, 0L, 0L)))
    // one census artifact serves the readout: folded halves ≡ direct
    val h1 = Sketches.categoryCensusTable(df.limit(6), "lang", "src")
    val h2 = Sketches.categoryCensusTable(df.exceptAll(df.limit(6)), "lang", "src")
    val folded = Sketches.jsDriftFromCensus(
      Sketches.foldCategoryCensus(h1, h2))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(folded == got, s"folded $folded vs direct $got")
    // pair-frame volume contract: the (G−1)·|census| bound trips loudly
    // for an over-cap census (the term-grain hazard), names the cap
    val census = Sketches.categoryCensusTable(df, "lang", "src")
    val boom = intercept[IllegalArgumentException] {
      Sketches.jsDriftFromCensus(census, maxPairCells = 1L)
    }
    assert(boom.getMessage.contains("maxPairCells"), boom.getMessage)
    // at the computed bound exactly ((3−1)·6 = 12 cells) it runs
    assert(Sketches.jsDriftFromCensus(census, maxPairCells = 12L)
      .count() == 6L)
    // topKCensus: the named fix — per-group head by (c desc, cat asc),
    // deterministic at ties, census shape preserved
    val big = Seq(("a", "x", 5L), ("a", "y", 3L), ("a", "z", 3L),
      ("a", "w", 1L), ("b", "x", 9L), ("b", "q", 2L))
      .toDF("g", "cat", "c")
    val kept = Sketches.topKCensus(big, 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // group a's tie at c=3 breaks cat-asc: y kept, z dropped
    assert(kept == Set(("a", "x", 5L), ("a", "y", 3L),
      ("b", "x", 9L), ("b", "q", 2L)), kept.toString)
  }

  test("groupedQuantile / winsorizedStats: exact thresholds and clamped moments on a hand case") {
    // group g: values 1..100 once each → p5 = 5, p95 = 95
    val df = (1L to 100L).map(v => ("g", v)).toDF("grp", "v")
    val q5 = Sketches.groupedQuantile(df, "v", "grp", 5).collect().head.getLong(1)
    val q95 = Sketches.groupedQuantile(df, "v", "grp", 95).collect().head.getLong(1)
    assert(q5 == 5L && q95 == 95L)
    val r = Sketches.winsorizedStats(df, "v", "grp", 5, 95).collect().head
    // wsum = 4·5 (1..4 clamped up) + Σ5..95 + 5·95 (96..100 clamped down)
    val wsumRef = 4 * 5 + (5 to 95).sum + 5 * 95
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((100L, 5L, 95L, wsumRef.toLong, 95L)))
    // an extreme outlier shifts the rank thresholds one value (n 100→101)
    // and clamps to the new hi — exact: lo 6, hi 96,
    // wsum = 5·6 + Σ6..96 + 4·96 + 96 = 5151
    val spiked = df.union(Seq(("g", 1000000L)).toDF("grp", "v"))
    val r2 = Sketches.winsorizedStats(spiked, "v", "grp", 5, 95).collect().head
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3), r2.getLong(4), r2.getLong(5)) ==
      ((101L, 6L, 96L, 5151L, 96L)))
  }

  test("nearbyCount: window edges inclusive, self excluded, isolated probe counts 0") {
    val probes = Seq((1L, 100L), (2L, 500L)).toDF("id", "t")
    val events = Seq((10L, 90L), (11L, 110L), (12L, 90L + 20L), // around p1
      (13L, 1000L), (1L, 100L)).toDF("id", "t") // id 1 = the probe itself
    val got = EventOps.nearbyCount(probes, events, "id", "t", window = 20L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // p1 at 100: events at 90 (|Δ|=10), 110 (10), 110 (=90+20 → |Δ|=10)
    // all inside; its own id-1 twin excluded; p2 at 500 sees nothing
    assert(got == Map(1L -> 3L, 2L -> 0L))
    // exact boundary |Δt| = window is IN
    val got2 = EventOps.nearbyCount(probes, Seq((20L, 120L)).toDF("id", "t"),
      "id", "t", window = 20L).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got2(1L) == 1L)
    // a probe whose bins hold ONLY non-qualifying events (its own twin
    // and out-of-window neighbors at bin distance 1) must still report
    // 0 — not silently vanish (the left-join contract)
    val near = Seq((1L, 50L), (8L, 29L), (7L, 71L)).toDF("id", "t")
    val got3 = EventOps.nearbyCount(Seq((1L, 50L)).toDF("id", "t"), near,
      "id", "t", window = 20L).collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got3 == Map(1L -> 0L))
  }

  test("nearbyCountRank: identical to nearbyCount — edges, self-exclusion, zero probes") {
    // the density-proof ECDF path must reproduce the bin path row by
    // row on every semantic corner the bin spec pins
    val probes = Seq((1L, 100L), (2L, 500L)).toDF("id", "t")
    val events = Seq((10L, 90L), (11L, 110L), (12L, 110L),
      (13L, 1000L), (1L, 100L)).toDF("id", "t")
    def both(p: org.apache.spark.sql.DataFrame,
        e: org.apache.spark.sql.DataFrame, w: Long) = (
      EventOps.nearbyCount(p, e, "id", "t", w)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap,
      EventOps.nearbyCountRank(p, e, "id", "t", w)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap)
    val (bin1, rank1) = both(probes, events, 20L)
    assert(rank1 == bin1 && rank1 == Map((1L, 100L) -> 3L, (2L, 500L) -> 0L))
    // exact boundary |Δt| = window is IN on both paths
    val (bin2, rank2) = both(probes, Seq((20L, 120L)).toDF("id", "t"), 20L)
    assert(rank2 == bin2 && rank2((1L, 100L)) == 1L)
    // zero-match probe reports 0 (never vanishes); self twin excluded
    val near = Seq((1L, 50L), (8L, 29L), (7L, 71L)).toDF("id", "t")
    val (bin3, rank3) = both(Seq((1L, 50L)).toDF("id", "t"), near, 20L)
    assert(rank3 == bin3 && rank3 == Map((1L, 50L) -> 0L))
  }

  test("windowCountByKey: key isolation, inclusive edges, self excluded, same-ts rows") {
    val ev = Seq(
      (1L, 10L, 100L), (1L, 11L, 110L), (1L, 12L, 120L), // key 1: tight run
      (1L, 13L, 500L),                                   // key 1: isolated
      (2L, 20L, 100L),                                   // key 2: alone at t=100
      (3L, 30L, 50L), (3L, 31L, 50L))                    // key 3: same-ts pair
      .toDF("k", "id", "t")
    val got = EventOps.windowCountByKey(ev, "k", "id", "t", window = 20L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    // key 1: 100/110/120 all within ±20 of each other → 2 neighbors each;
    // isolated 500 → 0; key 2 never sees key 1's rows; same-ts pair → 1
    assert(got == Map(10L -> 2L, 11L -> 2L, 12L -> 2L, 13L -> 0L,
      20L -> 0L, 30L -> 1L, 31L -> 1L), s"got $got")
    // exact boundary |Δt| = window is IN (range frame is inclusive)
    val edge = EventOps.windowCountByKey(
      Seq((1L, 1L, 100L), (1L, 2L, 120L)).toDF("k", "id", "t"),
      "k", "id", "t", window = 20L)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(edge == Map(1L -> 1L, 2L -> 1L))
  }

  test("intervalPointCountRank: identical to the bin path — edges, zero-point, long interval") {
    val ivs = Seq((1L, 1L, 100L, 200L), (1L, 2L, 500L, 600L),
      (2L, 1L, 0L, 1000000L)) // a LONG interval the bin path must cap
      .toDF("user", "sid", "start", "end")
    val pts = Seq(100L, 150L, 200L, 201L, 499L, 777777L).toDF("t")
    val bin = EventOps.intervalPointCount(ivs, Seq("user", "sid"),
      "start", "end", pts, "t", binSize = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    val rank = EventOps.intervalPointCountRank(ivs, Seq("user", "sid"),
      "start", "end", pts, "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    // [100,200] holds 100/150/200 (both ends inclusive, 201 out);
    // [500,600] holds nothing (LEFT semantics: 0, never dropped);
    // the long interval holds 100..201,499,777777 = 6 points
    assert(rank == Map((1L, 1L) -> 3L, (1L, 2L) -> 0L, (2L, 1L) -> 6L),
      s"got $rank")
    assert(rank == bin)
  }

  test("pageRank: uniform cycle stays uniform; sink keeps teleport floor; mass bounded") {
    // 3-cycle a→b→c→a, unit weights: perfectly symmetric, every rank
    // stays exactly at scale through any number of iterations
    val cyc = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("s", "d", "w")
    val rc = EventOps.pageRank(cyc, "s", "d", "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rc == Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L))
    // star a→b, a→c: b and c are sinks (forward nothing); a receives
    // only teleport → after one iteration a = 150000, and b=c by symmetry
    val star = Seq(("a", "b", 1L), ("a", "c", 1L)).toDF("s", "d", "w")
    val rs = EventOps.pageRank(star, "s", "d", "w", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rs("a") == 150000L && rs("b") == rs("c"))
    // hand value: b gets (150·1e6 + 850·(1e6·1 div 2)) div 1000 = 575000
    assert(rs("b") == 575000L)
  }

  test("cohortLtv: cumulative and per-user floor on a hand case; conservation with retention") {
    // cohort 0: u1 (day0 rev 2.0, day1 rev 1.0), u2 (day0 rev 0) →
    // size 2; cohort 1: u3 day1 rev 4.5
    val ev = Seq((1L, 0L, 2.0), (1L, 150L, 1.0), (2L, 10L, 0.0), (3L, 120L, 4.5))
      .toDF("u", "t", "v")
    val got = EventOps.cohortLtv(ev, "u", "t", "v", bucketSize = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got((0L, 0L)) == ((2L, 2000000L, 2000000L, 1000000L)))
    assert(got((0L, 1L)) == ((1L, 1000000L, 3000000L, 1500000L)))
    assert(got((1L, 0L)) == ((1L, 4500000L, 4500000L, 4500000L)))
    // n_users column IS the retention matrix
    val ret = EventOps.retentionCohorts(ev, "u", "t", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.view.mapValues(_._1).toMap == ret)
  }

  test("dedupEventsWindowed: keep-first per window, copy census, min-struct tie rule") {
    val ev = Seq(
      (1L, "a", 10L, 100L), (1L, "a", 11L, 150L), (1L, "a", 12L, 150L), // same window
      (1L, "a", 13L, 250L), // next window
      (2L, "a", 14L, 100L)  // other key
    ).toDF("u", "et", "id", "t")
    val got = EventOps.dedupEventsWindowed(ev, Seq("u", "et"), "id", "t", window = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // window [100,200): keeps (100, id 10), drops 2; same-t ties would
    // take the smaller id (min struct)
    assert(got == Map(
      (1L, "a", 100L) -> ((10L, 100L, 2L)),
      (1L, "a", 200L) -> ((13L, 250L, 0L)),
      (2L, "a", 100L) -> ((14L, 100L, 0L))))
  }

  test("valuePercentiles: rank = strict-below share; duplicates share a rank; singleton rank 0") {
    val df = Seq((1L, "g", 10L), (2L, "g", 10L), (3L, "g", 20L), (4L, "g", 30L),
      (5L, "h", 7L)).toDF("id", "grp", "v")
    val got = Sketches.valuePercentiles(df, "id", "v", "grp")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // g: n=4 → v=10 below 0 → 0; v=20 below 2 → 500; v=30 below 3 → 750
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 500L, 4L -> 750L, 5L -> 0L))
  }

  test("winsorBounds + applyWinsorBounds: stream-shared clamp equals the stats readout; untrained group drops") {
    val df = (1L to 100L).map(v => (v, "g", v)).toDF("id", "grp", "v")
    val bounds = Sketches.winsorBounds(df, "v", "grp", 5, 95)
    val b = bounds.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(b == Map("g" -> ((5L, 95L))))
    val rows = df.union(Seq((200L, "unseen", 7L)).toDF("id", "grp", "v"))
    val clamped = Sketches.applyWinsorBounds(rows, "id", "v", "grp", bounds)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(!clamped.contains(200L)) // untrained group drops
    // Σ clamped row values == the winsorizedStats histogram wsum
    val wsum = Sketches.winsorizedStats(df, "v", "grp", 5, 95)
      .collect().head.getLong(4)
    assert(clamped.values.sum == wsum)
  }

  test("hourlyProfile: counts per epoch-hour mod 24, flat profile dev 0, shares floor-sum") {
    // type A: 24 events, one per hour → perfectly flat
    val flat = (0L until 24L).map(h => ("A", h * 3600000000L))
    val skew = Seq(("B", 0L), ("B", 1L), ("B", 3600000000L))
    val got = EventOps.hourlyProfile((flat ++ skew).toDF("et", "t"), "et", "t")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    (0L until 24L).foreach { h =>
      assert(got(("A", h)) == ((1L, 0L, 41L))) // |24·1−24| = 0; 1000/24 = 41
    }
    assert(got(("B", 0L)) == ((2L, 45L, 666L))) // |48−3| = 45
    assert(got(("B", 1L)) == ((1L, 21L, 333L)))
  }

  test("interArrivalStats: gaps pair same (user, type) only; exact median/p90/max") {
    // user 1 type A at 0,10,30,100 → gaps 10,20,70; user 2 type A at
    // 0,5 → gap 5; type B single event → no gap, absent from output
    val ev = Seq((1L, 0L, "A"), (1L, 10L, "A"), (1L, 30L, "A"), (1L, 100L, "A"),
      (2L, 0L, "A"), (2L, 5L, "A"), (1L, 50L, "B"))
      .toDF("u", "t", "et")
    val got = EventOps.interArrivalStats(ev, "u", "t", "et", unit = 1L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // gaps sorted: 5,10,20,70 → med (cum·100 ≥ 50·4 → cum ≥ 2) = 10;
    // p90 (cum ≥ 3.6) = 70
    assert(got == Map("A" -> ((4L, 10L, 70L, 70L))))
  }

  test("funnelWithin: deadline drops late conversions the classic funnel keeps") {
    // u1: A@0, B@5 (in time); u2: A@0, B@200 (misses maxGap 100);
    // u3: A@0, B@50, C@120 — C within 100 of B, so all three stages
    val ev = Seq((1L, 0L, "A"), (1L, 5L, "B"),
      (2L, 0L, "A"), (2L, 200L, "B"),
      (3L, 0L, "A"), (3L, 50L, "B"), (3L, 120L, "C"))
      .toDF("u", "t", "et")
    val bounded = EventOps.funnelWithin(ev, "u", "t", "et", Seq("A", "B", "C"), 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bounded == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    // the unbounded classic keeps u2's late B
    val classic = EventOps.funnel(ev, "u", "t", "et", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(classic == Map(1L -> 3L, 2L -> 3L, 3L -> 1L))
  }

  test("ndcgLabelEval: perfect ranking scores 1e6, relevant-at-bottom scores less; idcg truncates at k") {
    import graft.pipeline.Similarity
    // pool: 3 vectors of label X clustered near the query direction,
    // 3 of label Y orthogonal-ish; query (label X) at e1
    val pool = Seq(
      (1L, Array(1.0f, 0.01f), "X"), (2L, Array(1.0f, 0.02f), "X"),
      (3L, Array(1.0f, 0.03f), "X"),
      (4L, Array(0.01f, 1.0f), "Y"), (5L, Array(0.02f, 1.0f), "Y"),
      (6L, Array(0.03f, 1.0f), "Y")).toDF("id", "v", "label")
    val q = Seq((100L, Array(1.0f, 0.0f), "X")).toDF("qid", "qv", "qlabel")
    val r = Similarity.ndcgLabelEval(pool, "id", "v", "label",
      q, "qid", "qv", "qlabel", k = 3).collect().head
    // top-3 by cosine are exactly the 3 X vectors → dcg = idcg → nDCG 1
    assert((r.getLong(1), r.getLong(4)) == ((3L, 1000000L)))
    val disc = Similarity.dcgDiscountsMicro(3)
    assert(r.getLong(2) == disc.sum && r.getLong(3) == disc.sum)
    // flip relevance: query labeled Y ranks its 3 relevant docs at
    // positions 4..6 (k=3 window has none) → dcg 0, nDCG 0
    val qy = Seq((101L, Array(1.0f, 0.0f), "Y")).toDF("qid", "qv", "qlabel")
    val ry = Similarity.ndcgLabelEval(pool, "id", "v", "label",
      qy, "qid", "qv", "qlabel", k = 3).collect().head
    assert(ry.getLong(2) == 0L && ry.getLong(4) == 0L)
    // n_rel beyond k truncates idcg at k (disc sums, not n_rel terms)
    assert(ry.getLong(3) == disc.sum)
    // discount table is the closed form at micro-scale
    assert(disc.toSeq == Seq(1000000L, 630929L, 500000L))
  }

  test("sessionStats: hand case — session boundaries, exact quantiles over two observables") {
    // u1: events at 0,10,20 (one session, 3 events, dur 20), then 1000
    // (second session, 1 event, dur 0); u2: 0,5 (one session, 2 events,
    // dur 5). gap=100. Sessions: (3,20),(1,0),(2,5)
    val ev = Seq((1L, 0L, "a"), (1L, 10L, "a"), (1L, 20L, "a"), (1L, 1000L, "a"),
      (2L, 0L, "a"), (2L, 5L, "a")).toDF("u", "t", "et")
    val r = EventOps.sessionStats(ev, "u", "t", "et", gap = 100L, unit = 1L)
      .collect().head
    // n_events sorted: 1,2,3 → med (cum·100 ≥ 150) = 2, p90 = 3
    // dur sorted: 0,5,20 → med = 5, p90 = 20
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((3L, 2L, 3L, 5L, 20L)))
  }

  test("cusumChangePointBy: each group's row equals the global cusum of that group alone") {
    val a = (1L to 10L).flatMap(b => Seq.fill(if (b > 5) 9 else 1)(("A", b)))
    val bb = (1L to 10L).map(b => ("B", b)) // constant rate → dev 0
    val df = (a ++ bb).toDF("g", "bucket")
    val got = Sketches.cusumChangePointBy(df, "bucket", "g")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val globalA = Sketches.cusumChangePoint(a.toDF("g", "bucket"), "bucket")
      .collect().head
    assert(got("A") == ((globalA.getLong(0), globalA.getLong(1),
      globalA.getLong(2), globalA.getLong(3), globalA.getLong(4))))
    // planted rate jump after bucket 5 peaks there; constant B scores 0
    assert(got("A")._3 == 5L && got("A")._5 > 0L)
    assert(got("B")._5 == 0L)
  }

  test("bucketQuantiles: percentiles land in the right geometric buckets; upper-bound convention") {
    val off = graft.util.EstimatedHistogram.bucketOffsets
    // 100 values 1..100 → p50 should land in the bucket containing 50
    val df = (1L to 100L).map(v => ("g", v)).toDF("grp", "v")
    val r = Sketches.bucketQuantiles(df, "v", "grp", Seq(50, 99)).collect().head
    assert(r.getLong(1) == 100L)
    val q50hi = r.getLong(2)
    // hi of the bucket holding value 50: smallest offset > 50
    val expected50 = off.find(_ > 50L).get
    assert(q50hi == expected50, s"q50_hi $q50hi vs $expected50")
    val q99hi = r.getLong(3)
    assert(q99hi == off.find(_ > 99L).get)
  }

  test("rollingActiveUsers: window membership exact; multi-day users count once per window") {
    // u1 active days 1 and 3; u2 active day 1 only. window 3:
    // day1 windows covering it: 1,2,3; day3: 3,4,5
    val ev = Seq((1L, 1L), (1L, 1L), (1L, 3L), (2L, 1L)).toDF("u", "d")
    val got = EventOps.rollingActiveUsers(ev, "u", "d", bucketSize = 1L,
      windowBuckets = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // day 1: u1,u2; day 2: u1,u2 (trailing); day 3: u1 (twice→once),u2;
    // days 4,5: u1 only
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("funnelRates: overall and step permilles exact; stage 1 is 1000/1000") {
    // 4 users reach A, 2 reach B, 1 reaches C
    val ev = Seq((1L, 0L, "A"), (1L, 1L, "B"), (1L, 2L, "C"),
      (2L, 0L, "A"), (2L, 5L, "B"), (3L, 0L, "A"), (4L, 0L, "A"))
      .toDF("u", "t", "et")
    val got = EventOps.funnelRates(ev, "u", "t", "et", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(1L -> ((4L, 1000L, 1000L)), 2L -> ((2L, 500L, 500L)),
      3L -> ((1L, 250L, 500L))))
  }

  test("burstBuckets: planted spike flagged over the unmoved median; quiet series flags nothing") {
    // 9 buckets of 10 events + one of 100 → median stays 10; the spike
    // reads 10000 permille
    val ev = ((0L until 9L).flatMap(b => Seq.fill(10)(b * 100L)) ++
      Seq.fill(100)(900L)).toDF("t")
    val got = EventOps.burstBuckets(ev, "t", bucketSize = 100L, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((9L, 100L, 10L, 10000L)))
    val quiet = (0L until 10L).flatMap(b => Seq.fill(10)(b * 100L)).toDF("t")
    assert(EventOps.burstBuckets(quiet, "t", 100L, 3).collect().isEmpty)
  }

  test("theilSenTrend: outlier day doesn't move the median slope; negative trend exact") {
    // group A: counts 10,8,6,4,2 over days 1..5 (slope −2/day) with one
    // outlier day of 100 events — the MEDIAN slope stays on the trend
    val a = Seq((1L, 10), (2L, 8), (3L, 6), (4L, 4), (5L, 2), (6L, 100))
      .flatMap { case (d, n) => Seq.fill(n)(("A", d)) }
    val got = Sketches.theilSenTrend(a.toDF("g", "d"), "d", "g")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (nb, np, slope) = got("A")
    assert(nb == 6L && np == 15L)
    // pairwise slopes among days 1..5 are all −2e6; the 5 outlier pairs
    // are huge positive — lower median of 15 sorted values (rank 8) is
    // still −2e6 (10 trend pairs sort first)
    assert(slope == -2000000L)
    // single-bucket group emits nothing
    assert(Sketches.theilSenTrend(Seq(("B", 1L), ("B", 1L)).toDF("g", "d"),
      "d", "g").collect().isEmpty)
  }

  test("intervalPointCount: inclusive bounds, empty interval reports 0, multi-bin spans count once") {
    val iv = Seq((1L, 100L, 250L), (2L, 300L, 300L), (3L, 500L, 520L))
      .toDF("iid", "s", "e")
    // points: 100 (on start), 250 (on end), 180 (inside, bin differs
    // from both ends at binSize 100), 299 (outside all), 300 (on the
    // degenerate interval), none near iid 3
    val pts = Seq(100L, 250L, 180L, 299L, 300L).toDF("t")
    val got = EventOps.intervalPointCount(iv, Seq("iid"), "s", "e", pts, "t",
      binSize = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
  }

  test("sessionIntervals: gap rule bounds, single-event session degenerate interval") {
    val ev = Seq((1L, 0L, "a"), (1L, 50L, "b"), (1L, 500L, "a"), (2L, 7L, "a"))
      .toDF("u", "t", "et")
    val got = EventOps.sessionIntervals(ev, "u", "t", "et", gap = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map((1L, 1L) -> ((0L, 50L, 2L)), (1L, 2L) -> ((500L, 500L, 1L)),
      (2L, 1L) -> ((7L, 7L, 1L))))
  }

  test("collocations: planted pair clears lift, independent filler does not; exact integers") {
    import graft.pipeline.TextAnalysis
    // "new york" always adjacent (planted collocation) inside varied filler
    val docs = (0 until 40).map(i =>
      (i.toLong, s"new york f$i g${i % 7} h${i % 5} k${i % 3}")).toDF("id", "text")
    val got = TextAnalysis.collocations(docs, "text",
        minCount = 3L, minLiftPermille = 1500L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(5))).toMap
    assert(got.contains(("new", "york")))
    val ((nab, lift)) = got(("new", "york"))
    assert(nab == 40L && lift > 1500L)
    // hand check: N = 240 unigrams, B = 200 bigrams, n_a = n_b = 40 →
    // lift = 40·240²·1000 div (200·40·40) = 7200
    assert(lift == 7200L)
    // pairs under minCount never appear: each f-token is unique to its
    // doc, so every (york, f$i) pair has n_ab = 1 < 3
    assert(!got.keys.exists { case (a, b) => a.startsWith("f") || b.startsWith("f") })
    // NOTE the structural fillers (g→h, h→k) are always-adjacent by
    // construction, so they legitimately clear the lift gate — they ARE
    // collocations of this corpus, not a false positive
    assert(got.contains(("h0", "k0")) || got.keys.exists(_._1.startsWith("h")))
  }

  test("userRegularity: one-hot user scores 1000 permille, uniform user 0; absent hours count") {
    // cron bot: 48 events all at hour 0 → dev = 23·48 + 23·48 = 46·48
    val bot = (0 until 48).map(i => (1L, i * 86400000000L))
    // uniform user: 48 events, exactly 2 per hour → dev 0
    val uni = (0 until 48).map(i => (2L, (i % 24) * 3600000000L + (i / 24) * 86400000000L))
    val got = EventOps.userRegularity((bot ++ uni).toDF("u", "t"), "u", "t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((48L, 46L * 48L, 1000L)))
    assert(got(2L) == ((48L, 0L, 0L)))
  }

  test("funnelGapQuantiles: per-stage gap histogram quantiles on a hand case") {
    // stage A→B gaps: u1 10, u2 20, u3 90 → med 20, p90 90
    // stage B→C gaps: u1 5 → med=p90=5; u2/u3 never reach C
    val ev = Seq(
      (1L, 0L, "A"), (1L, 10L, "B"), (1L, 15L, "C"),
      (2L, 0L, "A"), (2L, 20L, "B"),
      (3L, 0L, "A"), (3L, 90L, "B")).toDF("u", "t", "et")
    val got = EventOps.funnelGapQuantiles(ev, "u", "t", "et",
      Seq("A", "B", "C"), unit = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map((2L, "B") -> ((3L, 20L, 90L)), (3L, "C") -> ((1L, 5L, 5L))))
  }

  test("heavyHittersByBucket: exact counts, rank ties by item, k bound") {
    val ev = Seq((1L, "x"), (1L, "x"), (1L, "y"), (1L, "y"), (1L, "z"),
      (2L, "w")).toDF("b", "item")
    val got = EventOps.heavyHittersByBucket(ev, "item", "b", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3))).toMap
    // bucket 1: x and y tie at 2 — x ranks first (item asc); z cut by k=2
    assert(got == Map((1L, 1L) -> (("x", 2L)), (1L, 2L) -> (("y", 2L)),
      (2L, 1L) -> (("w", 1L))))
  }

  test("asOfJoin composite keys: match requires BOTH keys; per-key independence") {
    val quotes = Seq((1L, 10L, 100L, 900L), (1L, 20L, 110L, 901L),
      (2L, 10L, 105L, 902L)).toDF("u", "item", "t", "qid")
    val probes = Seq((1L, 10L, 120L, 1L), (1L, 20L, 115L, 2L),
      (1L, 30L, 130L, 3L), (2L, 10L, 104L, 4L)).toDF("u", "item", "t", "pid")
    val got = EventOps.asOfJoin(probes, quotes, Seq("u", "item"), "t")
      .collect().map(r => r.getAs[Long]("pid") ->
        Option(r.getAs[Any]("q_qid")).map(_.asInstanceOf[Long])).toMap
    // probe 1 (u1,i10) → quote 900 (not u1,i20's 110 even though closer);
    // probe 3 (u1,i30) no quote; probe 4 predates u2's quote
    assert(got == Map(1L -> Some(900L), 2L -> Some(901L), 3L -> None, 4L -> None))
  }
}
