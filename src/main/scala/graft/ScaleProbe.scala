package graft

import org.apache.spark.sql.functions._

import graft.api.CassandraLens
import graft.operators.SliceRange
import graft.sources.CellEncodings

/** One-off scaling probe (not part of the driver bench): amplify the
  * orders cell store N× with salted keys and time the reconcile scan, to
  * check the plan's cost grows ~linearly with input (the property that
  * matters before trusting it at 100 TB).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    val dir = "/root/testdata/sf0.1"
    val base = CellEncodings.ordersCells(spark, dir)
      .unionByName(CellEncodings.ordersStatusFTombstones(spark, dir))
    for (mult <- Seq(1, 4, 8)) {
      val amplified =
        if (mult == 1) base
        else base.crossJoin(
          spark.range(mult).select(col("id").cast("string").as("salt")))
          .withColumn("key", concat(col("salt"), lit("_"), col("key")))
          .drop("salt")
      val lens = new CassandraLens(amplified, CellEncodings.ordersMeta)
      val t0 = System.nanoTime()
      val n = lens.rangeSliceByKeys(None, None, None, SliceRange(count = 3), Int.MaxValue).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scale] mult=$mult%2d cells=${223000L * mult}%9d live_out=$n%8d reconcile_scan=$dt%6.2f s")
    }

    // Skew probe: ONE key holding 500k columns (the pathological wide row).
    // The slice's per-key window is hash-partitioned by key, so the hot key
    // lands in one task — but WindowGroupLimit pre-filters each map
    // partition to `count` candidates BEFORE the shuffle, so the single
    // task sees ≤ count × partitions rows, not 500k. The probe times the
    // count=5 slice against the full-row scan to show the difference.
    val wide = spark.range(500000).select(
      lit("hot").as("key"),
      lit(null).cast("binary").as("super_name"),
      graft.functions.GraftFunctions.beBytes(col("id")).as("col_name"),
      encode(concat(lit("v"), col("id")), "UTF-8").as("value"),
      col("id").as("ts"),
      lit(false).as("tombstone"),
      lit(0).as("local_del_time"))
    val wideLens = new CassandraLens(wide,
      CellEncodings.ordersMeta.copy(partitioner = graft.model.PartitionerType.OrderPreserving))
    val t1 = System.nanoTime()
    val sliced = wideLens.getSlice("hot", None, SliceRange(count = 5)).count()
    val dtSlice = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val full = wideLens.getSlice("hot", None, SliceRange(count = Int.MaxValue)).count()
    val dtFull = (System.nanoTime() - t2) / 1e9
    println(f"[scale] wide-row 500k cols: count=5 slice -> $sliced rows in $dtSlice%5.2f s; unlimited -> $full%d rows in $dtFull%5.2f s")

    // Version-skew probe: 500k timestamped versions of ONE cell (the
    // pathological LWW write pattern — a counter-like hot column). The
    // reconcile group key is (key, super, col), so all 500k rows target a
    // single group: correctness requires the winner, scale requires the
    // map-side partial aggregate to collapse each scan partition to ONE
    // candidate before the shuffle — the wire carries ~#partitions rows.
    val hot = spark.range(500000).select(
      lit("hotkey").as("key"),
      lit(null).cast("binary").as("super_name"),
      graft.functions.GraftFunctions.beBytes(lit(7L)).as("col_name"),
      encode(concat(lit("v"), col("id")), "UTF-8").as("value"),
      col("id").as("ts"),
      lit(false).as("tombstone"),
      lit(0).as("local_del_time"))
    val t3 = System.nanoTime()
    val winners = graft.operators.Reconcile.liveView(hot).count()
    val dtHot = (System.nanoTime() - t3) / 1e9
    println(f"[scale] version-skew 500k versions of one cell -> $winners winner in $dtHot%5.2f s (partial-agg collapse)")

    // ANN recall/latency tradeoff: IVF with a trained codebook vs brute
    // force, recall@10 averaged over 20 queries for nprobe ∈ {1, 2, 4}.
    // The scale story: brute force scans |vectors| per query; IVF scans
    // ~|vectors| × nprobe / k — the knob that keeps per-query cost flat
    // as the corpus grows.
    import graft.pipeline.Similarity
    val emb = CellEncodings.table(spark, dir, "embeddings").cache()
    emb.count()
    val centroids = Similarity.trainCodebook(emb, "vec_id", "embedding", k = 16, iters = 3)
    val queries = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select(col("id")).collect().map(_.getLong(0)).toSet
    import spark.implicits._
    val truth = queries.map { case (qid, qv) =>
      val q = Seq(Tuple1(qv)).toDF("q")
      qid -> topIds(Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= qid), "vec_id", "embedding", q, 10))
    }.toMap
    for (nprobe <- Seq(1, 2, 4)) {
      val t = System.nanoTime()
      val recalls = queries.map { case (qid, qv) =>
        val got = topIds(Similarity.ivfSearch(
          emb.filter(col("vec_id") =!= qid), "vec_id", "embedding",
          centroids, qv, k = 10, nprobe = nprobe))
        got.intersect(truth(qid)).size / 10.0
      }
      val dtq = (System.nanoTime() - t) / 1e9 / queries.length
      println(f"[scale] ivf nprobe=$nprobe recall@10=${recalls.sum / recalls.length}%5.3f  per-query=$dtq%5.3f s")
    }

    // IVF-PQ rerank/recall tradeoff at fixed nprobe: the codes-only
    // candidate scan + exact rerank of `rerank` finalists vs the exact
    // in-cell scan. The knob that removes vector IO from the hot path.
    val pqBook = Similarity.trainProductCodebook(emb, "vec_id", "embedding",
      centroids, m = 8, ksub = 16, iters = 2)
    for (rerank <- Seq(20, 50)) {
      val recalls = queries.map { case (qid, qv) =>
        val got = topIds(Similarity.pqSearch(
          emb.filter(col("vec_id") =!= qid), "vec_id", "embedding",
          centroids, pqBook, qv, k = 10, nprobe = 4, rerank = rerank))
        got.intersect(truth(qid)).size / 10.0
      }
      println(f"[scale] ivf-pq nprobe=4 rerank=$rerank%3d recall@10=${recalls.sum / recalls.length}%5.3f (vs ivf nprobe=4 exact)")
    }

    // OPQ-lite: same sweep with the variance-balancing dimension
    // permutation — measures what the cheap rotation substitute buys on
    // THIS corpus (isotropic embeddings gain little; skewed ones more).
    val opqBook = Similarity.trainProductCodebook(emb, "vec_id", "embedding",
      centroids, m = 8, ksub = 16, iters = 2, opq = true)
    for (rerank <- Seq(20, 50)) {
      val recalls = queries.map { case (qid, qv) =>
        val got = topIds(Similarity.pqSearch(
          emb.filter(col("vec_id") =!= qid), "vec_id", "embedding",
          centroids, opqBook, qv, k = 10, nprobe = 4, rerank = rerank))
        got.intersect(truth(qid)).size / 10.0
      }
      println(f"[scale] ivf-opq nprobe=4 rerank=$rerank%3d recall@10=${recalls.sum / recalls.length}%5.3f (permuted subspaces)")
    }

    // Per-cell OPQ: each coarse cell balances its OWN residual spectrum
    // (cell-keyed permutation map, still expression-only). Gains over
    // global OPQ appear when cells have different dominant directions;
    // on isotropic corpora the three variants should tie.
    val cellOpqBook = Similarity.trainProductCodebook(emb, "vec_id", "embedding",
      centroids, m = 8, ksub = 16, iters = 2, opqPerCell = true)
    for (rerank <- Seq(20, 50)) {
      val recalls = queries.map { case (qid, qv) =>
        val got = topIds(Similarity.pqSearch(
          emb.filter(col("vec_id") =!= qid), "vec_id", "embedding",
          centroids, cellOpqBook, qv, k = 10, nprobe = 4, rerank = rerank))
        got.intersect(truth(qid)).size / 10.0
      }
      println(f"[scale] ivf-opq-cell nprobe=4 rerank=$rerank%3d recall@10=${recalls.sum / recalls.length}%5.3f (per-cell permutations)")
    }

    // Exact-rank probe (round 9): pid-offset ranking (exactRankBuckets)
    // vs the single-partition global window on the same 5M-row frame.
    // Both produce identical ranks (checksum-asserted); the difference is
    // WHERE the sort happens — 32 parallel range partitions vs one task.
    {
      import org.apache.spark.sql.expressions.Window
      val rdf = spark.range(5000000L)
        .select(col("id"), (hash(col("id")) % 100000L).cast("long").as("score"))
        .localCheckpoint() // identical pinned input for both paths
      def run(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val cs = mk.agg(sum(col("rank") * (col("id") % 997L))).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, cs)
      }
      val (dtE, csE) = run(graft.pipeline.TextAnalysis.exactRankBuckets(
        rdf, Seq(col("score").asc, col("id").asc), 3).select(col("id"), col("rank")))
      val (dtG, csG) = run(rdf.withColumn("rank",
        row_number().over(Window.orderBy(col("score").asc, col("id").asc)).cast("long"))
        .select(col("id"), col("rank")))
      assert(csE == csG, s"rank checksum mismatch: $csE vs $csG")
      println(f"[scale] exact-rank 5M rows: pid-offset=$dtE%5.2f s " +
        f"single-partition-window=$dtG%5.2f s (identical ranks)")
    }

    // Prefix-sum probe (round 9): pid-offset running totals
    // (exactPrefixSums) vs the single-partition SUM OVER (ORDER BY)
    // window on the same 5M-row frame — the budget-select (p99) data
    // path. Identical cums (checksum-asserted); the global window has
    // no PARTITION BY, so one task accumulates everything.
    {
      import org.apache.spark.sql.expressions.Window
      val rdf = spark.range(5000000L)
        .select(col("id"), (hash(col("id")) % 100000L).cast("long").as("score"),
          (col("id") % 512L + 1L).as("v"))
        .localCheckpoint() // identical pinned input for both paths
      def run(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val cs = mk.agg(sum(col("cum") * (col("id") % 997L))).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, cs)
      }
      val (dtE, csE) = run(graft.pipeline.TextAnalysis.exactPrefixSums(
        rdf, Seq(col("score").asc, col("id").asc), "v").select(col("id"), col("cum")))
      val (dtG, csG) = run(rdf.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("score").asc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .select(col("id"), col("cum")))
      assert(csE == csG, s"prefix-sum checksum mismatch: $csE vs $csG")
      println(f"[scale] prefix-sum 5M rows: pid-offset=$dtE%5.2f s " +
        f"single-partition-window=$dtG%5.2f s (identical cums)")
    }

    // Grouped-rank skew probe (round 9): exactGroupRanks vs the
    // PARTITION BY group window on a 5M-row frame where ONE group holds
    // 90% of the rows — the head-group case where a per-group window
    // serializes most of the corpus through one task. Identical
    // (rank, n) checksums asserted.
    {
      import org.apache.spark.sql.expressions.Window
      val rdf = spark.range(5000000L)
        .select(col("id"),
          when(col("id") % 10L < 9L, lit("head")).otherwise(lit("tail")).as("g"),
          (hash(col("id")) % 100000L).cast("long").as("score"))
        .localCheckpoint()
      def run(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val cs = mk.agg(sum((col("rank") + col("n")) * (col("id") % 997L)))
          .head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, cs)
      }
      val (dtE, csE) = run(graft.pipeline.TextAnalysis.exactGroupRanks(
        rdf, "g", Seq(col("score").asc, col("id").asc))
        .select(col("id"), col("rank"), col("n")))
      val (dtG, csG) = run {
        val w = Window.partitionBy(col("g")).orderBy(col("score").asc, col("id").asc)
        rdf.withColumn("rank", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))).cast("long"))
          .select(col("id"), col("rank"), col("n"))
      }
      assert(csE == csG, s"grouped-rank checksum mismatch: $csE vs $csG")
      println(f"[scale] grouped-rank 5M rows (90%% one group): pid-offset=$dtE%5.2f s " +
        f"per-group-window=$dtG%5.2f s (identical ranks)")
    }

    // As-of join probe (round 9): union + running-last vs the naive
    // equi-join + ts-filter + per-probe argmax on 100 keys × 1k quotes ×
    // 1k probes. The naive shape materializes ~n·m/2 candidate rows per
    // key (~5e7 here) before its aggregate; the union shape sorts n+m
    // rows per key once. Identical matched-quote checksums asserted —
    // the gap is the 100 TB argument for EventOps.asOfJoin.
    {
      val quotes = spark.range(100000L).select(
        (col("id") % 100L).as("k"), (col("id") * 7919L % 1000000L).as("ts"),
        col("id").as("qid")).localCheckpoint()
      val probes = spark.range(100000L).select(
        (col("id") % 100L).as("k"), (col("id") * 104729L % 1000000L).as("ts"),
        col("id").as("pid")).localCheckpoint()
      def run(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
        val t0 = System.nanoTime()
        val cs = mk.agg(sum(col("qid") * (col("pid") % 997L))).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, cs)
      }
      val (dtU, csU) = run(graft.operators.EventOps
        .asOfJoin(probes, quotes, Seq("k"), "ts")
        .select(col("pid"), coalesce(col("q_qid"), lit(0L)).as("qid")))
      val (dtN, csN) = run {
        val q = quotes.select(col("k"), col("ts").as("qts"), col("qid"))
        probes.join(q, Seq("k"), "left")
          .filter(col("qts") <= col("ts"))
          .groupBy(col("pid"))
          .agg(max(struct(col("qts"), col("qid"))).as("m"))
          .select(col("pid"), col("m.qid").as("qid"))
          // probes with no prior quote drop out of the naive inner path;
          // re-add as 0 to align checksums with the left-semantics shape
          .unionByName(probes.join(
            q.groupBy(col("k")).agg(min(col("qts")).as("minq")), Seq("k"), "left")
            .filter(col("minq").isNull || col("minq") > col("ts"))
            .select(col("pid"), lit(0L).as("qid")))
      }
      assert(csU == csN, s"asof checksum mismatch: $csU vs $csN")
      println(f"[scale] asof 100k+100k rows/100 keys: union+last=$dtU%5.2f s " +
        f"naive join+argmax=$dtN%5.2f s (identical matches)")
    }

    // Unkeyed time-window join probe (round 10): nearbyCount's bin
    // decomposition vs the naive inequality join Spark plans as a
    // nested-loop (BroadcastNestedLoopJoin — |probe|·|events|
    // comparisons before the bound filter). Checksum equality at
    // 10k×10k pins the semantics; the binned path then runs 100k×100k
    // (100× the pair work) — the naive shape is quadratic and CANNOT
    // be run there, which is exactly the point.
    locally {
      def mk(n: Long, salt: Long) = spark.range(n).select(
        (col("id") * salt % 10000000L).as("t"),
        (col("id") + salt).as("id")).localCheckpoint()
      def run(mk2: => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
        val t0 = System.nanoTime()
        // checksum AND row count: a zero-count probe contributes 0 to the
        // checksum, so only the count equality catches silently DROPPED
        // probes (the left-join contract)
        val r = mk2.agg(sum(col("id") * col("n_near")), count(lit(1))).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
      }
      val (p10, e10) = (mk(10000L, 7919L), mk(10000L, 104729L))
      val w = 5000L
      val (dtB10, csB10, nB10) = run(graft.operators.EventOps
        .nearbyCount(p10, e10, "id", "t", w))
      val (dtN10, csN10, nN10) = run {
        p10.join(e10.select(col("id").as("eid"), col("t").as("te")), // no key: nested loop
            abs(col("te") - col("t")) <= w && col("eid") =!= col("id"), "left")
          .groupBy(col("id"), col("t")).agg(count(col("eid")).as("n_near"))
      }
      assert(csB10 == csN10, s"window-join checksum mismatch: $csB10 vs $csN10")
      assert(nB10 == nN10, s"window-join row-count mismatch: $nB10 vs $nN10")
      val (p100, e100) = (mk(100000L, 7919L), mk(100000L, 104729L))
      val (dtB100, _, _) = run(graft.operators.EventOps
        .nearbyCount(p100, e100, "id", "t", w))
      println(f"[scale] window-join 10k x 10k: binned=$dtB10%5.2f s " +
        f"naive-nested-loop=$dtN10%5.2f s (identical counts); " +
        f"100k x 100k binned=$dtB100%5.2f s (naive is quadratic)")
    }

    // Triangle-counting probe (round 11): degree-oriented wedge
    // enumeration vs the naive all-direction wedge join on a HUB graph
    // (one node adjacent to everything — the shape that breaks
    // unoriented enumeration: C(deg,2) wedges at the hub). Per-node
    // checksums asserted identical at hub=2k; the oriented path then
    // runs hub=200k (C(200k,2) = 2e10 naive wedges — unrunnable), where
    // orientation emits ZERO wedges at the hub because every hub edge
    // points INTO it.
    locally {
      def hubGraph(n: Long, rand: Long) = {
        val hub = spark.range(1L, n + 1L)
          .select(lit(0L).as("s"), col("id").as("d"))
        val rnd = spark.range(rand).select(
          (abs(xxhash64(col("id"))) % n + 1L).as("s"),
          (abs(xxhash64(col("id") + 1000000007L)) % n + 1L).as("d"))
        hub.unionAll(rnd).localCheckpoint()
      }
      def run(mk: => org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
        val t0 = System.nanoTime()
        val r = mk.agg(sum(col("node") * col("n_triangles")),
          sum(col("n_triangles"))).head()
        ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
      }
      val small = hubGraph(2000L, 4000L)
      val (dtO, csO, ntO) = run(
        graft.operators.EventOps.triangleCounts(small, "s", "d"))
      val (dtN, csN, ntN) = run {
        val und = small.select(least(col("s"), col("d")).as("a"),
            greatest(col("s"), col("d")).as("b"))
          .filter(col("a") =!= col("b")).distinct().localCheckpoint()
        val adj = und.select(col("a").as("u"), col("b").as("v"))
          .unionAll(und.select(col("b").as("u"), col("a").as("v")))
        val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("dg"))
        val l = adj.select(col("u"), col("v").as("x"))
        val r = adj.select(col("u"), col("v").as("y"))
        deg.join(
          l.join(r, Seq("u")).filter(col("x") < col("y"))
            .join(und, col("a") === col("x") && col("b") === col("y"))
            .groupBy(col("u")).agg(count(lit(1)).as("nt")),
          Seq("u"), "left")
          .select(col("u").as("node"),
            coalesce(col("nt"), lit(0L)).as("n_triangles"))
      }
      assert(csO == csN && ntO == ntN,
        s"triangle checksum mismatch: ($csO,$ntO) vs ($csN,$ntN)")
      val big = hubGraph(200000L, 400000L)
      val (dtBig, _, ntBig) = run(
        graft.operators.EventOps.triangleCounts(big, "s", "d"))
      println(f"[scale] triangles hub=2k+4k edges: oriented=$dtO%5.2f s " +
        f"naive-wedges=$dtN%5.2f s (identical per-node counts, $ntO%d corners); " +
        f"hub=200k+400k oriented=$dtBig%5.2f s ($ntBig%d corners; naive is 2e10 wedges)")
    }

    // Integer k-means scaling probe (round 9): the Lloyd step over 10k →
    // 40k → 160k synthetic 64-dim vectors, k=8. Cost model says ~linear
    // in n (component explode + broadcast join + two key-balanced
    // aggregates); the probe checks the measured growth stays near 4×
    // per 4× input, the property that matters before trusting it on
    // 1e9-vector corpora.
    for (n <- Seq(10000L, 40000L, 160000L)) {
      val vecs = spark.range(n).select(col("id").as("vec_id"),
        expr("transform(sequence(1, 64), j -> CAST(sin(id * j) AS FLOAT))").as("embedding"))
        .localCheckpoint() // pin the synthetic input; time only the step
      val t0 = System.nanoTime()
      val rows = graft.pipeline.Similarity.kmeansStepExact(
        vecs, "vec_id", "embedding", k = 8).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[scale] kmeans-step n=$n%7d k=8 dim=64 stats_rows=$rows%4d  $dt%5.2f s")
      vecs.unpersist()
    }

    // SemDeDup prefilter probe (round 8) — see [[semdedupPrefilterProbe]];
    // also runnable alone via `runMain graft.PrefilterProbe`.
    semdedupPrefilterProbe(spark)

    // Incremental triangle maintenance probe (round 13) — see
    // [[triangleDeltaProbe]]; also alone via `runMain graft.TriangleProbe`.
    triangleDeltaProbe(spark)

    // Incremental connected-components probe (round 13) — see
    // [[ccDeltaProbe]]; also alone via `runMain graft.CcDeltaProbe`.
    ccDeltaProbe(spark)

    // Skewed-hub star-contraction probe (round 15) — see [[ccHubProbe]].
    ccHubProbe(spark)

    // Shuffle-elimination probe: major compaction over the bucketed
    // catalog layout vs over plain parquet runs, measured in actual
    // shuffle-write bytes (task metrics). The bucketed path's reconcile +
    // horizon aggregates all run in place — at 100 TB the difference is
    // the entire table crossing the network vs nothing.
    def withTaskBytes(body: => Unit): (Long, Long, Long) = {
      val written = new java.util.concurrent.atomic.AtomicLong()
      val read = new java.util.concurrent.atomic.AtomicLong()
      val input = new java.util.concurrent.atomic.AtomicLong()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null) {
            written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            input.addAndGet(m.inputMetrics.bytesRead)
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        // deterministic drain — a fixed sleep can undercount when the bus
        // is still queueing onTaskEnd events under load
        org.apache.spark.graft.ListenerDrain.waitUntilEmpty(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(listener)
      (written.get(), read.get(), input.get())
    }
    def withShuffleBytes(body: => Unit): (Long, Long) = {
      val (w, r, _) = withTaskBytes(body)
      (w, r)
    }
    val probeDir = java.nio.file.Files.createTempDirectory("graft_probe").toString
    graft.sources.CellStore.write(base, CellEncodings.ordersMeta, s"$probeDir/runs")
    graft.sources.CellStore.dropManaged(spark, "graft_probe_bucketed")
    graft.sources.CellStore.writeBucketed(base, CellEncodings.ordersMeta,
      "graft_probe_bucketed", buckets = 32)
    val (wPlain, _) = withShuffleBytes {
      graft.operators.Compaction.compact(
        spark.read.parquet(s"$probeDir/runs"), gcBeforeSeconds = 0).count()
    }
    val (wBucketed, _) = withShuffleBytes {
      graft.operators.Compaction.compact(
        spark.table("graft_probe_bucketed"), gcBeforeSeconds = 0).count()
    }
    println(f"[scale] compaction shuffle-write bytes: plain-runs=$wPlain%,d  bucketed=$wBucketed%,d")
    spark.sql("DROP TABLE IF EXISTS graft_probe_bucketed")

    // Range-pick probe: bytes a get_range_slices page pays to FIND its
    // first 1000 live keys. The old pick reconciled the whole range
    // (values included); the value-free pick aggregates live/tombstone ts
    // per column — the value bytes never leave the parquet reader.
    val scan = spark.read.parquet(s"$probeDir/runs")
    val probeLens = new CassandraLens(scan, CellEncodings.ordersMeta)
    def timed(body: => Unit): (Double, (Long, Long, Long)) = {
      // time the body alone — withTaskBytes blocks on the listener-bus
      // drain after it, which must not count as query time
      var dt = 0.0
      val b = withTaskBytes {
        val t0 = System.nanoTime()
        body
        dt = (System.nanoTime() - t0) / 1e9
      }
      (dt, b)
    }
    def readSchemas(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.filter(_.contains("ReadSchema")).map(_.trim).mkString(" | ")
    val oldPick = graft.operators.RangeScan.pickKeys(
      graft.operators.Reconcile.liveView(scan).withColumn("token",
        graft.model.Tokens.token(CellEncodings.ordersMeta.partitioner, col("key"))),
      1000)
    val newPick = probeLens.liveKeySet(scan).withColumn("token",
      graft.model.Tokens.token(CellEncodings.ordersMeta.partitioner, col("key")))
      .orderBy(col("token"), col("key")).limit(1000)
    val (dtOld, (_, _, inOld)) = timed { oldPick.collect() }
    val (dtNew, (_, _, inNew)) = timed { newPick.collect() }
    println(f"[scale] range-pick 1000 keys: full-reconcile in=$inOld%,d B $dtOld%5.2f s; value-free in=$inNew%,d B $dtNew%5.2f s")
    println(s"[scale] range-pick ReadSchema old: ${readSchemas(oldPick)}")
    println(s"[scale] range-pick ReadSchema new: ${readSchemas(newPick)}")

    // Connected-components round shape (star rounds since round 14):
    // each round materializes the contracted edge set once; the per-round
    // count probe reads the freshly checkpointed blocks (zero shuffle)
    // and the set-equality except probe only runs once counts stabilize.
    // Count jobs and the shuffle traffic split on a 20k-node chain + 5k
    // isolated pairs.
    locally {
      import scala.jdk.CollectionConverters._
      val stagesByJob = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
      val startByJob = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
      val durByJob = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
      val shuffleByStage = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          stagesByJob.put(js.jobId, js.stageIds)
          startByJob.put(js.jobId, js.time)
        }
        override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          Option(startByJob.get(je.jobId)).foreach(t0 =>
            durByJob.put(je.jobId, je.time - t0))
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          if (m != null) shuffleByStage.put(sc.stageInfo.stageId,
            m.shuffleReadMetrics.totalBytesRead + m.shuffleWriteMetrics.bytesWritten)
        }
      }
      val chain = spark.range(0, 20000)
        .select(col("id").as("ia"), (col("id") + 1).as("ib"))
        .unionByName(spark.range(0, 5000)
          .select((col("id") * 2 + 100000).as("ia"), (col("id") * 2 + 100001).as("ib")))
      spark.sparkContext.addSparkListener(listener)
      val t0cc = System.nanoTime()
      val nComps = graft.pipeline.Dedup.connectedComponents(chain)
        .select(countDistinct(col("comp"))).head().getLong(0)
      val dtCc = (System.nanoTime() - t0cc) / 1e9
      org.apache.spark.graft.ListenerDrain.waitUntilEmpty(spark.sparkContext)
      spark.sparkContext.removeSparkListener(listener)
      // count probes read only the round's checkpointed edge blocks: zero
      // shuffle traffic across all their stages (AQE materialization jobs
      // always carry shuffle bytes, so this classification separates them)
      val jobs = stagesByJob.asScala.toSeq
      def shuffled(stages: Seq[Int]): Long =
        stages.map(id => Option(shuffleByStage.get(id)).map(_.longValue).getOrElse(0L)).sum
      val (probes, heavy) = jobs.partition { case (_, st) => shuffled(st) == 0L }
      def totalMs(js: Seq[(Int, Seq[Int])]): Long =
        js.map { case (id, _) => Option(durByJob.get(id)).map(_.longValue).getOrElse(0L) }.sum
      println(f"[scale] cc 20k-chain+5k-pairs: components=$nComps%,d in $dtCc%5.2f s; " +
        f"jobs=${jobs.size} zero-shuffle probe jobs=${probes.size} taking ${totalMs(probes)}%,d ms " +
        f"vs ${totalMs(heavy)}%,d ms shuffle-bearing (star rounds; counts probe cached blocks)")
    }

    // Streaming near-dup state growth: how the per-band-bucket state
    // scales with documents ingested, unbounded vs watermark-bounded
    // (PipelineStream.nearDupPairsWithinWatermark). Event time advances
    // one hour per 10k-doc batch; with the 30-minute delay the watermark
    // (which lags one batch) keeps roughly the last batch-and-a-half of
    // buckets live — the plateau the probe prints, and the eviction
    // story SCALE.md documents.
    locally {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      def text(i: Long): String =
        (0 until 40).map(j => "w" + (((i * 31 + j * 7) ^ (i >> 3)) % 5000)).mkString(" ")
      def run(watermarked: Boolean): Seq[(Long, Long)] = {
        val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, java.sql.Timestamp)]
        val src = mem.toDS().toDF("doc_id", "text", "ets")
        val out =
          if (watermarked) graft.streaming.PipelineStream.nearDupPairsWithinWatermark(
            src, "doc_id", "text", "ets", "30 minutes", n = 3, numHashes = 16,
            bands = 4, num = 4, den = 5,
            maxBucket = None) // eviction-plateau probe: keep the story un-capped
          else graft.streaming.PipelineStream.nearDupPairs(
            src, "doc_id", "text", n = 3, numHashes = 16, bands = 4, num = 4, den = 5,
            maxBucket = None)
        val name = if (watermarked) "sp_ndwm" else "sp_nd"
        val q = out.writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        val sizes = Seq.newBuilder[(Long, Long)]
        try {
          for (b <- 0 until 5) {
            val t0 = 1700000000000L + b * 3600000L
            mem.addData((0 until 10000).map(i =>
              ((b * 10000L + i), text(b * 10000L + i), new java.sql.Timestamp(t0))): _*)
            q.processAllAvailable()
            val so = q.lastProgress.stateOperators(0)
            sizes += ((so.numRowsTotal, so.memoryUsedBytes))
          }
        } finally q.stop()
        sizes.result()
      }
      val unbounded = run(watermarked = false)
      val bounded = run(watermarked = true)
      def fmt(s: Seq[(Long, Long)]): String =
        s.map { case (r, m) => f"$r%,d rows/${m / 1024 / 1024}%d MiB" }.mkString(" -> ")
      println(s"[scale] stream near-dup state, 5x10k docs: unbounded ${fmt(unbounded)}")
      println(s"[scale] stream near-dup state, watermarked 30m/1h batches: ${fmt(bounded)}")
    }

    // Row cache at DEPTH: the bench's read_gaussian_cached runs over a
    // shallow store (1-2 versions/key) where the reconcile is cheap. Here
    // every key carries 64 LWW versions — the multi-run store a week of
    // un-compacted ingest produces — so the uncached read pays a real
    // per-read reconcile and the cached view's win is the reconcile
    // itself, not just plan overhead.
    locally {
      val deep = base.crossJoin(
        spark.range(64).select(col("id").as("v")))
        .withColumn("ts", col("ts") + col("v")).drop("v")
      val deepLens = new CassandraLens(deep, CellEncodings.ordersMeta)
      val keys = {
        val rnd = new java.util.Random(42)
        Seq.fill(300)(
          math.max(0L, math.min(2999L, math.round(1500.0 + rnd.nextGaussian() * 300.0))))
          .distinct.map(i => f"$i%010d")
      }
      def time2(f: => Long): Double = {
        f // warm
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val dtUncached = time2 {
        deepLens.multigetSlice(keys, None, SliceRange(count = 5)).count()
      }
      val cached = deepLens.withRowCache()
      cached.live.count() // build the cache (untimed, like the bench leg)
      val dtCached = time2 {
        cached.multigetSlice(keys, None, SliceRange(count = 5)).count()
      }
      cached.dropRowCache()
      println(f"[scale] row cache at depth (64 versions/key, ~150 hot keys): " +
        f"uncached=$dtUncached%5.2f s cached=$dtCached%5.2f s")
    }

    // Incremental near-dup ingest: one shard checked against a persisted
    // MinHash snapshot vs re-running the full-corpus near-dup over
    // corpus+shard. The snapshot path's corpus cost is the bucket join +
    // candidate shingles; the rerun re-shingles and re-buckets everything
    // — the gap is what a daily 100 TB ingest pays per shard.
    locally {
      import graft.pipeline.Dedup
      val docs = CellEncodings.table(spark, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val shard = docs.filter(col("doc_id") % 10 === 0)
      val tmp = java.nio.file.Files.createTempDirectory("graft_snap_probe").toString
      val tSave = System.nanoTime()
      Dedup.saveMinhashSnapshot(corpus, "doc_id", "text", 3, 32, 8, s"$tmp/snap",
        maxBucket = None) // equality probe vs the uncapped full rerun
      val dtSave = (System.nanoTime() - tSave) / 1e9
      val tInc = System.nanoTime()
      val incPairs = Dedup.nearDupsAgainstSnapshot(shard, "doc_id", "text",
        s"$tmp/snap", 3, 32, 8, 4, 5, maxBucket = None).count()
      val dtInc = (System.nanoTime() - tInc) / 1e9
      val tFull = System.nanoTime()
      val fullPairs = Dedup.minhashNearDuplicates(docs, "doc_id", "text",
        3, 32, 8, 4, 5, maxBucket = None).count()
      val dtFull2 = (System.nanoTime() - tFull) / 1e9
      println(f"[scale] snapshot ingest (10%% shard vs full rerun): snapshot-build=$dtSave%5.2f s " +
        f"shard-check=$dtInc%5.2f s ($incPairs pairs) full-rerun=$dtFull2%5.2f s ($fullPairs pairs)")
    }
    containmentIngestProbe(spark, dir)
    phrasePruneProbe(spark, dir)
    knnGraphProbe(spark, dir)
    knnMaintProbe(spark, dir)
    noveltyProbe(spark, dir)
    runStoreSnapshotProbe(spark, dir)
    spark.stop()
  }

  /** Run-store snapshot/restore probe (round 19): the O(#files)
    * hard-link claim MEASURED against the alternative a deployment
    * actually faces — rebuilding the store from the corpus. Builds the
    * sf0.1 kNN store in four folds (a multi-run, multi-substore store:
    * index + graph + graphcells), then times snapshotRunStore (link
    * pass, no data IO), restoreRunStore (link + one atomic pointer
    * commit), and the four-fold rebuild. At 100 TB the fold rebuild
    * scales with corpus bytes while snapshot/restore scale with FILE
    * COUNT — the probe prints both next to the store's size so the
    * SCALE.md row states a measured ratio, not an argument.
    */
  def runStoreSnapshotProbe(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import graft.pipeline.Similarity
    import graft.streaming.PipelineStream
    val emb = CellEncodings.table(spark, dir, "embeddings")
      .localCheckpoint(eager = false)
    val codebook = Similarity.refinedCentroids(
      Similarity.kmeansStepExact(emb, "vec_id", "embedding", k = 16))
      .localCheckpoint()
    val base = java.nio.file.Files
      .createTempDirectory("graft_snapprobe").toString + "/store"
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def build(): Double = timed((0 until 4).foreach { i =>
      PipelineStream.knnGraphBatchFold(
        emb.filter(col("vec_id") % 4 === i), "vec_id", "embedding",
        codebook, 16, 10, base, runId = i.toLong)
    })
    val dtBuild = build()
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = graft.util.FsTrees.walkFiles(fs,
      new org.apache.hadoop.fs.Path(base))
    val (nFiles, bytes) = (files.size, files.map(_.getLen).sum)
    val dtSnap = timed(PipelineStream.snapshotRunStore(spark, base, "probe"))
    val dtRestore = timed(PipelineStream.restoreRunStore(spark, base, "probe"))
    println(f"[scale] run-store snapshot sf0.1 knn store ($nFiles%d files, " +
      f"$bytes%,d B): build-4-folds=$dtBuild%5.2f s snapshot=$dtSnap%5.2f s " +
      f"restore=$dtRestore%5.2f s (link+pointer, no data IO)")
  }

  /** kNN-graph probe (round 16): the in-cell self-join cost model and
    * the single-vs-multi-probe recall trade, measured. The exact graph
    * is nProbe=k (probing every cell covers every home cell — the
    * spec-pinned law), so recall here is TRUE recall, not an estimate.
    * Scale story: single-probe cost is Σ|cell|² ≈ n²/k (balanced),
    * multi-probe ×nProbe on the probe side only — the knob trades
    * wall-clock for near-boundary recall without touching the index.
    */
  def knnGraphProbe(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.pipeline.Similarity
    val emb = CellEncodings.table(spark, dir, "embeddings")
      .localCheckpoint(eager = false)
    val n = emb.count()
    val codebook = Similarity.refinedCentroids(
      Similarity.kmeansStepExact(emb, "vec_id", "embedding", k = 16))
      .localCheckpoint()
    val index = Similarity.ivfIndexTable(emb, "vec_id", "embedding", codebook, 16)
      .localCheckpoint()
    def timed(f: => org.apache.spark.sql.DataFrame): (Double, org.apache.spark.sql.DataFrame) = {
      val t0 = System.nanoTime()
      val d = f.localCheckpoint() // materialize
      ((System.nanoTime() - t0) / 1e9, d)
    }
    val (dt1, g1) = timed(Similarity.knnGraphIvf(index, 10))
    val (dt2, g2) = timed(Similarity.knnGraphMultiProbe(index, codebook, 16, 2, 10))
    val (dtX, gx) = timed(Similarity.knnGraphMultiProbe(index, codebook, 16, 16, 10))
    def recall(g: org.apache.spark.sql.DataFrame): Double = {
      val hits = g.select(col("id"), col("nbr"))
        .join(gx.select(col("id"), col("nbr")), Seq("id", "nbr"), "left_semi")
        .count()
      hits.toDouble / gx.count()
    }
    println(f"[scale] knn-graph n=$n%,d k=16 top-10: single=$dt1%5.2f s " +
      f"recall=${recall(g1)}%5.3f; nprobe=2 $dt2%5.2f s recall=${recall(g2)}%5.3f; " +
      f"exact(nprobe=16)=$dtX%5.2f s")
  }

  /** kNN-graph MAINTENANCE probe (round 16): (1) cell-occupancy skew
    * of the IVF index on the real embeddings — the decision metric for
    * a two-level (coarse→fine) split: if Σ|cell|² ≫ the balanced n²/k
    * or one hot cell dominates, the in-cell quadratic needs a second
    * level; (2) the delta fold's measured win — knnGraphDelta on a 10%
    * delta (touched cells only) vs a full knnGraphTable rebuild over
    * the folded index, with the touched-row fraction printed so the
    * speedup is attributable.
    */
  def knnMaintProbe(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.pipeline.Similarity
    val emb = CellEncodings.table(spark, dir, "embeddings")
      .localCheckpoint(eager = false)
    val base = emb.filter(col("vec_id") % 10 =!= 0)
    val delta = emb.filter(col("vec_id") % 10 === 0)
    val codebook = Similarity.refinedCentroids(
      Similarity.kmeansStepExact(base, "vec_id", "embedding", k = 16))
      .localCheckpoint()
    val idx = Similarity.ivfIndexTable(base, "vec_id", "embedding", codebook, 16)
      .localCheckpoint()
    val dIdx = Similarity.ivfIndexTable(delta, "vec_id", "embedding", codebook, 16)
      .localCheckpoint()
    val occ = idx.groupBy(col("cell")).count()
      .select(col("count")).collect().map(_.getLong(0)).sorted
    val n = occ.sum
    val sumSq = occ.map(c => c * c).sum
    val balanced = (n.toDouble / 16) * (n.toDouble / 16) * 16
    println(f"[scale] knn-maint cells: n=$n%,d k=16 max=${occ.last}%,d " +
      f"mean=${n / 16}%,d sumsq=${sumSq}%,d balanced=${balanced}%.0f " +
      f"skew=${sumSq / balanced}%4.2f max_share=${occ.last.toDouble / n}%5.3f " +
      f"suggestK(n)=${Similarity.suggestK(n)} " + // the reindex policy
      f"suggestK(2M)=${Similarity.suggestK(2000000L)}")
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val g0 = Similarity.knnGraphTable(idx, 10).localCheckpoint()
    val touched = dIdx.select(col("cell")).distinct().count()
    val dtFull = timed(Similarity.knnGraphTable(
      Similarity.foldIvfIndex(idx, dIdx), 10).localCheckpoint())
    val dtDelta = timed(Similarity.knnGraphDelta(g0, idx, dIdx, 10)
      .localCheckpoint())
    println(f"[scale] knn-maint fold 10%% delta: touched_cells=$touched%d/16 " +
      f"full-rebuild=$dtFull%5.2f s delta-fold=$dtDelta%5.2f s")
    // the localized arrival (new content concentrated in 2 of 16
    // topics): the carry skips 14 cells' quadratic — the win the
    // touched-cells contract is FOR; a spread delta (above) re-derives
    // everything and honestly shows none
    val dLoc = dIdx.filter(col("cell") < 2).localCheckpoint()
    val locRows = dLoc.count()
    // measured, not assumed: an unlucky codebook numbering could leave
    // cells 0-1 delta-free and the "win" would be the identity fold
    val locCells = dLoc.select(col("cell")).distinct().count()
    val dtLoc = timed(Similarity.knnGraphDelta(g0, idx, dLoc, 10)
      .localCheckpoint())
    println(f"[scale] knn-maint fold localized delta ($locRows%,d rows, " +
      f"$locCells%d/16 cells): delta-fold=$dtLoc%5.2f s (vs full $dtFull%5.2f s)")
  }

  /** knn_delta slope probe (round 17): the bench leg's exact shape —
    * standing index/graph over 95% of the embeddings (k=16 frozen
    * codebook), then time (a) the LOCALIZED 5% fold (arrivals in cells
    * 0-1: knnGraphDelta re-derives only the touched cells) and (b) the
    * full knnGraphTable rebuild over the folded index. The fold's cost
    * follows the touched cells' Σ|cell|², so at 10× corpus the fold
    * should scale like the touched share while the rebuild scales like
    * the whole graph.
    */
  def knnDeltaProbe(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.pipeline.Similarity
    val emb = CellEncodings.table(spark, dir, "embeddings")
      .localCheckpoint(eager = false)
    val base = emb.filter(col("vec_id") % 20 =!= 0)
    val codebook = Similarity.refinedCentroids(
      Similarity.kmeansStepExact(base, "vec_id", "embedding", k = 16))
      .localCheckpoint()
    val idx = Similarity.ivfIndexTable(base, "vec_id", "embedding", codebook, 16)
      .localCheckpoint()
    val g0 = Similarity.knnGraphTable(idx, 10).localCheckpoint()
    val dLoc = Similarity.ivfIndexTable(
      emb.filter(col("vec_id") % 20 === 0), "vec_id", "embedding",
      codebook, 16).filter(col("cell") < 2).localCheckpoint()
    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val n = idx.count()
    val dn = dLoc.count()
    val dtFold = timed(Similarity.knnGraphDelta(g0, idx, dLoc, 10)
      .localCheckpoint())
    val dtFull = timed(Similarity.knnGraphTable(
      Similarity.foldIvfIndex(idx, dLoc), 10).localCheckpoint())
    println(f"[scale] knn-delta $dir: standing=$n%,d delta=$dn%,d (cells<2) " +
      f"fold=$dtFold%5.2f s full-rebuild=$dtFull%5.2f s")
  }

  /** Batched-BPE trainer probe (round 17): the driver-loop scale
    * hazard measured — sequential training runs ONE Spark job per
    * merge (a 30k-merge production vocab = 30k jobs of per-job
    * scheduling overhead on top of the corpus passes), while the
    * batched greedy admits a rank-prefix of symbol-disjoint merges per
    * pass and folds them into one expression chain. Prints wall-clock
    * at merges = 64 for batchSize 1 vs 64 plus the measured pass count
    * and merge-sequence agreement (byte-level trainer, the production
    * variant).
    */
  def bpeTrainProbe(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.pipeline.TextAnalysis
    val docs = CellEncodings.table(spark, dir, "documents").localCheckpoint()
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
    }
    val (dtSeq, mSeq) = timed(
      TextAnalysis.trainByteBpeMerges(docs, "text", merges = 64))
    val (dtBat, mBat) = timed(
      TextAnalysis.trainByteBpeMerges(docs, "text", merges = 64,
        batchSize = 64))
    val agree = mSeq.map(m => (m._1, m._2)).toSet
      .intersect(mBat.map(m => (m._1, m._2)).toSet).size
    println(f"[scale] bpe-train merges=64: sequential=$dtSeq%6.2f s (64 jobs) " +
      f"batched(64)=$dtBat%6.2f s agree=$agree/64 " +
      f"(seq=${mSeq.size} bat=${mBat.size} learned)")
  }

  /** Novelty-probe cost (round 16): scoring a 10%% shard against the
    * STANDING n-gram census vs rebuilding the census over the grown
    * corpus — the decontamination maintenance story (probe pays
    * shard-grams × one hash join; the rebuild re-scans everything).
    */
  def noveltyProbe(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.pipeline.TextAnalysis
    val docs = CellEncodings.table(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val shard = docs.filter(col("doc_id") % 10 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_novelty_probe").toString
    val tSave = System.nanoTime()
    TextAnalysis.ngramStatsTable(corpus, "doc_id", "text", 3)
      .write.parquet(s"$tmp/census")
    val dtSave = (System.nanoTime() - tSave) / 1e9
    val census = spark.read.parquet(s"$tmp/census")
    val tProbe = System.nanoTime()
    val scored = TextAnalysis.ngramNovelty(shard, "doc_id", "text", census, 3).count()
    val dtProbe = (System.nanoTime() - tProbe) / 1e9
    val tFull = System.nanoTime()
    val rebuilt = TextAnalysis.ngramStatsTable(docs, "doc_id", "text", 3).count()
    val dtFull = (System.nanoTime() - tFull) / 1e9
    println(f"[scale] novelty ingest (10%% shard): census-build=$dtSave%5.2f s " +
      f"shard-score=$dtProbe%5.2f s ($scored docs) " +
      f"census-rebuild=$dtFull%5.2f s ($rebuilt grams)")
  }

  /** Phrase-probe IO pruning measured: a k-term phrase over the
    * range-laid positional postings must read the k terms' row groups,
    * not the corpus — the input-bytes split between a full postings
    * count and one probe is the claim with a number (PushedFilters is
    * already plan-pinned in PlanQualitySpec; this is the bytes-side
    * proof).
    */
  def phrasePruneProbe(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    // scan-node numOutputRows (the Bench io-harvest metric): rows the
    // parquet reader EMITS after pushdown + row-group pruning — the
    // cross-plan-comparable pruning measure (task inputMetrics bytes
    // are unreliable across vectorized-reader paths)
    def scanRows(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val outRows = df.queryExecution.toRdd.count() // ONE execution
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val kids = p.children ++ (p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case r: org.apache.spark.sql.execution.ReusedSubqueryExec => Seq(r.child)
          case _ => Nil
        })
        p +: (kids ++ p.subqueries).flatMap(allNodes)
      }
      val emitted = allNodes(df.queryExecution.executedPlan).iterator
        .filter(_.getClass.getSimpleName.contains("Scan"))
        .flatMap(_.metrics.get("numOutputRows")).map(_.value)
        .filter(_ >= 0L).sum
      (outRows, emitted)
    }
    val docs = CellEncodings.table(spark, dir, "documents")
    val phrase = SparkEntry.doc0Tokens(docs).slice(3, 6).mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft_phr_probe").toString
    graft.pipeline.TextAnalysis.positionalPostings(docs, "doc_id", "text")
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.parquet(s"$tmp/postings")
    val postings = spark.read.parquet(s"$tmp/postings")
    val total = postings.count()
    val (hits, emitted) = scanRows(graft.pipeline.TextAnalysis
      .phraseMatchesIndexed(postings, phrase))
    // unpushed baseline: the probe runs THREE scans, each would emit
    // every posting — 3·total rows cross the reader boundary
    println(f"[scale] phrase probe pruning: $total%,d standing postings; " +
      f"3-term probe's scans emit $emitted%,d rows vs ${3 * total}%,d unpushed " +
      f"(${100.0 * emitted / math.max(3 * total, 1L)}%.2f%% — term pushdown at " +
      f"the reader; $hits%d matches; the synthetic corpus's ~46-word " +
      f"vocabulary makes these terms ~10%%-frequency each — a real corpus's " +
      f"Zipf tail prunes far harder)")
  }

  /** Incremental-containment ingest probe: a FIXED 10% shard probed
    * against a 1× posting artifact and a 9× one whose added content is
    * VOCABULARY-SALTED (per-replica token remap — shares no shingles
    * with anything, the honest "more distinct content" model). Directed
    * pairs must be IDENTICAL across artifact sizes (the added postings
    * are untouchable by the shard); the timing split shows what the
    * artifact buys: the probe pays the (pruned) posting join only,
    * while the batch rerun re-shingles and re-pairs the whole grown
    * corpus per ingest.
    */
  def containmentIngestProbe(spark: org.apache.spark.sql.SparkSession,
      dir: String): Unit = {
    import graft.pipeline.Dedup
    val docs = CellEncodings.table(spark, dir, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val shard = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text")).localCheckpoint()
    // replica id stride derived from the REAL max id — a fixed constant
    // would collide with corpus ids on a large sf dir and corrupt the
    // artifact joins silently
    val stride = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val big = corpus.unionByName(
      spark.range(1, 9).crossJoin(corpus)
        .select((col("doc_id") + col("id") * stride).as("doc_id"),
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("r"), col("id").cast("string"), lit("$1"))).as("text")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_cont_probe").toString
    def timed[A](f: => A): (Double, A) = {
      val t = System.nanoTime(); val a = f; ((System.nanoTime() - t) / 1e9, a)
    }
    val (dtS1, _) = timed(Dedup.saveShinglePostings(
      corpus, "doc_id", "text", n = 3, path = s"$tmp/one"))
    val (dtS9, _) = timed(Dedup.saveShinglePostings(
      big, "doc_id", "text", n = 3, path = s"$tmp/big"))
    def probe(path: String): Set[(Long, Long)] =
      Dedup.containmentAgainstSnapshot(shard, "doc_id", "text", path,
        n = 3, num = 4, den = 5, maxDocFreq = None)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probe(s"$tmp/one") // warm (codegen + file listing)
    val (dt1, p1) = timed(probe(s"$tmp/one"))
    val (dt9, p9) = timed(probe(s"$tmp/big"))
    assert(p1 == p9,
      s"salted growth changed directed pairs: ${p1.size} vs ${p9.size}")
    val (dtRerun, _) = timed(Dedup.containmentNearDuplicates(
      big.unionByName(shard), "doc_id", "text", n = 3, num = 4, den = 5,
      maxDocFreq = None, hashShingles = true).count())
    val rows1 = spark.read.parquet(s"$tmp/one/postings").count()
    val rows9 = spark.read.parquet(s"$tmp/big/postings").count()
    println(f"[scale] containment ingest (fixed 10%% shard; salted 9x growth): " +
      f"build 1x=$dtS1%5.2f s/9x=$dtS9%5.2f s ($rows1%,d -> $rows9%,d postings); " +
      f"probe 1x=$dt1%5.2f s 9x=$dt9%5.2f s (${p1.size}%d pairs IDENTICAL); " +
      f"batch rerun over grown corpus=$dtRerun%5.2f s")
  }

  /** SemDeDup prefilter probe: within-cell pair mining at a REALISTIC
    * embedding shape — 256 dims with a decaying spectrum (real embedding
    * spectra are PCA-like; the sf embeddings are only 16-dim and
    * isotropic, the prefilter's worst case, so the probe builds its own
    * corpus). Exact all-pairs cosine vs the slim-join head-dot +
    * Cauchy-Schwarz-tail prefilter (h=32 of 256, variance order): the
    * bound is exact math, so the pair sets must be IDENTICAL — the probe
    * measures what the O(h) slim join saves over carrying O(d) vectors
    * through the quadratic join.
    */
  def semdedupPrefilterProbe(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(256, 1024, 1536, 3072).foreach(semdedupPrefilterProbeAt(spark, _))

  def semdedupPrefilterProbeAt(spark: org.apache.spark.sql.SparkSession,
      dim: Int): Unit = {
    import graft.pipeline.Similarity
    val n = 12000
    val nCells = 24
    val mk = (idExpr: String) => expr(
      s"""transform(sequence(1, $dim), i -> CAST(
         |  (((xxhash64(($idExpr) * $dim + i) % 1000) + 1000) % 1000 / 1000.0 - 0.5)
         |  / (1.0 + (i - 1) / 16.0) AS FLOAT))""".stripMargin)
    val base = spark.range(n).select(col("id"), mk("id").as("vec"))
    // 50 planted twins (ids n+s duplicate s) so qualifying pairs exist
    val twins = spark.range(50).select((col("id") + n).as("id"), mk("id").as("vec"))
    val corpus = base.unionByName(twins).cache()
    corpus.count()
    val cellExpr = pmod(col("id"), lit(n)) % nCells
    def pairsOf(head: Int, order: Array[Int]): (Double, Set[(Long, Long)]) = {
      val t = System.nanoTime()
      val got = Similarity.semanticPairs(corpus, "id", "vec", cellExpr,
        tauPermille = 800, maxCellSize = 0, prefilterHeadDims = head,
        headOrder = order)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      ((System.nanoTime() - t) / 1e9, got)
    }
    pairsOf(0, Array.empty) // warm both shapes once (codegen + cache)
    val (dtExact, exact) = pairsOf(0, Array.empty)
    val order = Similarity.varianceOrder(corpus, "vec")
    pairsOf(32, order)
    val (dtPre, pre) = pairsOf(32, order)
    assert(pre == exact, s"prefilter changed results: ${pre.size} vs ${exact.size}")
    println(f"[scale] semdedup prefilter d=$dim%4d h=32 (3M pairs): exact=$dtExact%5.2f s " +
      f"prefiltered=$dtPre%5.2f s pairs=${exact.size}%d (sets identical)")
    corpus.unpersist()
  }
  /** Incremental-CC probe backing connectedComponentsDelta's scaling
    * claim: at FIXED |Δ| the fold is one linear relabel pass plus a
    * |Δ|-sized closure, while the full closure re-pays its star rounds
    * over the whole graph. Labels asserted identical before timing is
    * trusted.
    */
  def ccDeltaProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.pipeline.Dedup
    // the operator's actual domain: a sea of SMALL clusters (near-dup
    // groups of ~4 docs — shallow, closes in few rounds). The fold's
    // claim is corpus-pass avoidance, so the probe grows the corpus 10×
    // at fixed |Δ|: full closure re-pays rounds × (2 shuffles over ALL
    // edges); the fold pays one linear relabel + a |Δ|-sized closure.
    // (Deep position-uncorrelated graphs are ccPathProbe's target; this
    // probe measures the fold-vs-full-closure gap on the dedup shape.)
    def clusters(n: Long) = spark.range(n).select(
        ((col("id") / 4L) * 4L + (abs(xxhash64(col("id"))) % 4L)).as("ia"),
        ((col("id") / 4L) * 4L + (abs(xxhash64(col("id") + 3L)) % 4L)).as("ib"))
      .filter(col("ia") =!= col("ib")).localCheckpoint()
    val delta = spark.range(1000L).select(
        (abs(xxhash64(col("id") + 7L)) % 40000000L).as("ia"),
        (abs(xxhash64(col("id") * 13 + 11L)) % 40000000L).as("ib"))
      .filter(col("ia") =!= col("ib")).localCheckpoint()
    def checksum(df: org.apache.spark.sql.DataFrame): (Double, String) = {
      val t0 = System.nanoTime()
      // id·comp products reach ~1.6e13 over millions of rows — a BIGINT
      // sum overflows (ANSI errors); DECIMAL(38,0) is exact
      val c = df.agg(sum((col("id") * col("comp")).cast("decimal(38,0)")))
        .head().getDecimal(0).toPlainString
      ((System.nanoTime() - t0) / 1e9, c)
    }
    Seq(4000000L, 16000000L).foreach { n =>
      val base = clusters(n)
      val standing = Dedup.connectedComponents(base).localCheckpoint()
      val d = delta.filter(col("ia") < n && col("ib") < n).localCheckpoint()
      val (dtInc, csI) = checksum(Dedup.connectedComponentsDelta(standing, d))
      val (dtFull, csF) = checksum(
        Dedup.connectedComponents(base.unionByName(d)))
      assert(csI == csF, s"cc-delta ≠ full at n=$n: $csI vs $csF")
      println(f"[scale] cc-delta n=$n%8d |delta|=1k: fold=$dtInc%5.2f s " +
        f"full-closure=$dtFull%5.2f s (identical labels)")
    }
  }

  /** Pathological-depth probe backing connectedComponents' convergence
    * claim: a 100k-segment PATH whose node ids are position-uncorrelated
    * (hash-permuted) — the worst shape for label propagation (the old
    * pointer-jumping implementation measured >200 rounds without closing
    * a 400-segment version; star rounds rewrite edges, so depth falls
    * geometrically regardless of id placement). The probe closes it
    * under an explicit 20-round cap (≈ log₂ 100k = 17) and asserts one
    * component before trusting the timing.
    */
  def ccPathProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.pipeline.Dedup
    val n = 100000L
    // xxhash64 over 0..n is a near-permutation (collisions ~n²/2⁶⁴ ≈ 0);
    // a collision would only merge two path nodes — still one component
    val path = spark.range(n)
      .select(xxhash64(col("id")).as("ia"), xxhash64(col("id") + 1L).as("ib"))
      .localCheckpoint()
    val t0 = System.nanoTime()
    val comps = Dedup.connectedComponents(path, maxIter = 20)
      .agg(countDistinct(col("comp"))).head().getLong(0)
    val dt = (System.nanoTime() - t0) / 1e9
    assert(comps == 1L, s"cc-path: expected one component, got $comps")
    println(f"[scale] cc-path n=$n%,d segments random-id: closed to " +
      f"$comps component in $dt%5.2f s within 20 star rounds " +
      "(old label propagation: >200 rounds on 1/250th of this)")
  }

  /** Skewed-hub probe for the star-contraction CC rounds: ONE hub node
    * adjacent to 2M spokes, with the hub the group's MAXIMUM id so both
    * star operators must move its whole adjacency (the post-contraction
    * shape of any giant dup-cluster: the min node's degree ≈ cluster
    * size). The per-node min inside large/small-star is a groupBy
    * aggregate joined back — map-side combine collapses each map
    * partition's hub rows to ONE partial, and the join-back is an equi
    * join AQE can skew-split; the Window.partitionBy(node) formulation
    * this replaced (round 15) funneled the hub's full 2M-row symmetrized
    * adjacency through a single sorting task every round.
    */
  def ccHubProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.pipeline.Dedup
    val n = 2000000L
    val hubId = Long.MaxValue / 2
    val star = spark.range(n)
      .select(lit(hubId).as("ia"), abs(xxhash64(col("id"))).as("ib"))
      .filter(col("ib") =!= hubId) // xxhash collision with the hub (~0)
      .localCheckpoint()
    val t0 = System.nanoTime()
    val comps = Dedup.connectedComponents(star, maxIter = 20)
      .agg(countDistinct(col("comp"))).head().getLong(0)
    val dt = (System.nanoTime() - t0) / 1e9
    assert(comps == 1L, s"cc-hub: expected one component, got $comps")
    println(f"[scale] cc-hub n=$n%,d spokes, max-id hub: closed to " +
      f"$comps component in $dt%5.2f s (per-node min = map-side-combined " +
      "aggregate; a window would single-task the hub group)")
  }

  /** Incremental-triangle probe backing triangleDelta's scaling claim:
    * at FIXED |Δ| (~1k edges), maintenance cost must stay ~flat as the
    * standing graph grows 10× (its joins are |Δ|·deg-bounded plus linear
    * passes over the standing edges), while the full recompute re-pays
    * the superlinear wedge enumeration every time. Counts are asserted
    * identical (maintained ≡ recompute on base ∪ Δ) before timing is
    * trusted. Random multigraph on 20k nodes so densification (not just
    * edge count) grows the wedge space.
    */
  def triangleDeltaProbe(spark: org.apache.spark.sql.SparkSession): Unit = {
    import graft.operators.EventOps
    def graph(edges: Long, salt: Long) = spark.range(edges).select(
        (abs(xxhash64(col("id") + lit(salt))) % 20000L).as("s"),
        (abs(xxhash64(col("id") * 31 + lit(salt) + 7L)) % 20000L).as("d"))
      .filter(col("s") =!= col("d")).localCheckpoint()
    val delta = graph(1200L, 999999L)
    def sums(df: org.apache.spark.sql.DataFrame): (Double, Long, Long) = {
      val t0 = System.nanoTime()
      val r = df.agg(sum(col("node") * col("n_triangles")),
        sum(col("n_triangles"))).head()
      ((System.nanoTime() - t0) / 1e9, r.getLong(0), r.getLong(1))
    }
    Seq(80000L, 800000L).foreach { m =>
      val base = graph(m, 1L)
      val baseCounts = EventOps.triangleCounts(base, "s", "d").localCheckpoint()
      val (dtDelta, csD, ntD) = sums(EventOps.applyTriangleDelta(
        baseCounts, EventOps.triangleDelta(base, delta, "s", "d")))
      val (dtFull, csF, ntF) = sums(
        EventOps.triangleCounts(base.unionAll(delta), "s", "d"))
      assert(csD == csF && ntD == ntF,
        s"maintained ≠ recompute at m=$m: ($csD,$ntD) vs ($csF,$ntF)")
      println(f"[scale] triangle-delta m=$m%7d |delta|=1.2k: maintain=$dtDelta%5.2f s " +
        f"recompute=$dtFull%5.2f s (identical counts, $ntF%,d corners)")
    }
  }
}

/** Focused runner for the incremental-triangle maintenance probe. */
object TriangleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    ScaleProbe.triangleDeltaProbe(spark)
    spark.stop()
  }
}

/** Focused runner for the incremental connected-components probe. */
object CcDeltaProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    ScaleProbe.ccDeltaProbe(spark)
    spark.stop()
  }
}

/** Focused runner for the skewed-hub star-contraction probe. */
object CcHubProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    ScaleProbe.ccHubProbe(spark)
    spark.stop()
  }
}

/** Focused runner for the pathological-depth connected-components probe. */
object CcPathProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    ScaleProbe.ccPathProbe(spark)
    spark.stop()
  }
}

/** Focused runner for the phrase-probe IO pruning probe. */
object PhrasePruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    ScaleProbe.phrasePruneProbe(spark, "/root/testdata/sf0.1")
    spark.stop()
  }
}

/** Focused runner for the incremental-containment ingest probe. */
object ContainmentIngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    ScaleProbe.containmentIngestProbe(spark, "/root/testdata/sf0.1")
    spark.stop()
  }
}

/** Focused runner for the SemDeDup prefilter probe (fast iteration —
  * the full ScaleProbe takes minutes).
  */
object PrefilterProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    ScaleProbe.semdedupPrefilterProbe(spark)
    spark.stop()
  }
}

/** Focused runner for the kNN-graph and novelty-ingest probes. */
object KnnNoveltyProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    ScaleProbe.knnGraphProbe(spark, "/root/testdata/sf0.1")
    ScaleProbe.knnMaintProbe(spark, "/root/testdata/sf0.1")
    ScaleProbe.noveltyProbe(spark, "/root/testdata/sf0.1")
    spark.stop()
  }
}

/** Focused runner for the knn_delta bench leg's sf-slope row: the
  * standing-store + localized-5%-fold shape at two scales (pass dirs
  * as args; defaults sf0.1 + /tmp/sf1 when present).
  */
object KnnDeltaProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1") ++
        (if (new java.io.File("/tmp/sf1/embeddings.parquet").exists())
          Seq("/tmp/sf1") else Nil)
    dirs.foreach(ScaleProbe.knnDeltaProbe(spark, _))
    spark.stop()
  }
}

/** Focused runner for the batched-BPE trainer probe. */
object BpeTrainProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    ScaleProbe.bpeTrainProbe(spark, "/root/testdata/sf0.1")
    spark.stop()
  }
}

/** Focused runner for the run-store snapshot/restore timing probe. */
object SnapshotProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(taskSideCommit = true)
    ScaleProbe.runStoreSnapshotProbe(spark, "/root/testdata/sf0.1")
    spark.stop()
  }
}
