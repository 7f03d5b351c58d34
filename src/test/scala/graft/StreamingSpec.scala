package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Cell
import graft.operators.Reconcile
import graft.sources.CellStore
import graft.streaming.CellStream

/** Streaming ingestion: memtable→state, flush→parquet append, and the
  * invariant that streaming ingest + merge-on-read equals batch reconcile.
  */
class StreamingSpec extends SparkSpec {

  test("foreachBatch flush appends runs; merge-on-read equals batch reconcile") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream").toString
    val mem = MemoryStream[Cell]
    val q = CellStream.writeToStore(mem.toDS().toDF(), s"$dir/store", s"$dir/ckpt").start()
    try {
      mem.addData(ins("k1", "c1", "v1", 1), ins("k1", "c2", "v2", 1))
      q.processAllAvailable()
      mem.addData(del("k1", "c1", 2), ins("k2", "c1", "w", 1))
      q.processAllAvailable()
    } finally q.stop()

    val stored = spark.read.parquet(s"$dir/store")
    assert(stored.count() == 4) // all versions retained (SSTable runs)
    val live = Reconcile.liveView(stored)
    assert(liveValues(live) == Map("c2" -> "v2", "c1" -> "w"))
  }

  test("writeToStore compactAtRuns: run count stays bounded mid-stream, reconciled view exact, purge only on full folds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_streamc").toString
    val store = s"$dir/store"
    val mem = MemoryStream[Cell]
    // gcBefore 20 > the tombstone's ldt 10: a FULL fold may purge it
    val q = CellStream.writeToStore(mem.toDS().toDF(), store, s"$dir/ckpt",
      compactAtRuns = 3, gcBeforeSeconds = 20).start()
    def runCount = new java.io.File(store).listFiles()
      .count(_.getName.startsWith("run="))
    val counts = scala.collection.mutable.ArrayBuffer[Int]()
    try {
      (0 until 6).foreach { i =>
        if (i == 0)
          mem.addData(ins("k0", "c0", "v0", 1), ins("kk", "w", "w0", 1),
            del("k0", "c0", 100, ldt = 10))
        else
          mem.addData(ins(s"k$i", s"c$i", s"v$i", 1),
            ins("kk", "w", s"w$i", i + 1))
        q.processAllAvailable()
        counts += runCount
      }
    } finally q.stop()
    // bounded: six flushed batches, but the threshold-3 fold keeps the
    // live run count at or under the threshold the whole stream
    assert(counts.forall(_ <= 3), s"run counts $counts")
    // the reader drops the discovered run partition column
    val stored = CellStore.readRuns(spark, store)
    assert(!stored.columns.contains("run"))
    // exactly once: the reconciled view over the folded store equals the
    // batch reconcile of every mutation ever fed — k0.c0 tombstoned away,
    // kk.w LWW-resolved to the newest write
    assert(liveValues(Reconcile.liveView(stored)) ==
      Map("c1" -> "v1", "c2" -> "v2", "c3" -> "v3", "c4" -> "v4",
        "c5" -> "v5", "w" -> "w5"))
    // the batch-2 fold covered ALL runs, so the past-grace tombstone (and
    // the value it shadowed) purged — no tombstone survives in the store
    assert(stored.filter(col("tombstone")).count() == 0,
      "full fold must purge the past-grace tombstone")
    assert(stored.filter(col("key") === "k0").count() == 0,
      "shadowed value must not resurrect after the purge")
  }

  test("session_window sessionize: exact-tie gap merges, gap+1 splits, late events drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapNs = 1800000000L * 1000L // 30 min in ns
    val mem = MemoryStream[(Long, Long)]
    val sess = CellStream.sessionize(
      mem.toDS().toDF("user_id", "ts"), gapMicros = 1800000000L, watermark = "1 hour")
    val q = sess.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: e2 exactly one gap after e1 (same session — the batch rule
      // breaks only on STRICTLY greater), e3 one gap + 1µs after e2 (splits)
      mem.addData((1L, 0L), (1L, gapNs), (1L, 2L * gapNs + 1000L))
      q.processAllAvailable()
      // sentinels push the watermark past every real session end
      mem.addData((-1L, 20L * gapNs))
      q.processAllAvailable()
      mem.addData((-1L, 40L * gapNs))
      q.processAllAvailable()
      // user 2 arrives far below the advanced watermark: dropped, no session
      mem.addData((2L, 0L))
      q.processAllAvailable()
      mem.addData((-1L, 60L * gapNs))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sessions").filter(col("user_id") >= 0L)
      .select("user_id", "n", "start_us", "end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(
      (1L, 2L, 0L, 1800000000L),
      (1L, 1L, 3600000001L, 3600000001L)), s"got $rows")
  }

  test("sessionize: a late in-watermark event BRIDGES two state sessions into one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapNs = 1800000000L * 1000L // 30 min
    val mem = MemoryStream[(Long, Long)]
    val sess = CellStream.sessionize(
      mem.toDS().toDF("user_id", "ts"), gapMicros = 1800000000L, watermark = "2 hours")
    val q = sess.writeStream.format("memory").queryName("sessions_bridge")
      .outputMode("append").start()
    try {
      // two events 50 min apart: TWO open sessions in state
      mem.addData((1L, 0L), (1L, (50L * 60L) * 1000000000L))
      q.processAllAvailable()
      // a late event at +25 min lands within the 2h watermark and within
      // one gap of BOTH: the state store must merge all three into ONE
      // session — the window-merging behavior that distinguishes session
      // state from plain keyed aggregation
      mem.addData((1L, (25L * 60L) * 1000000000L))
      q.processAllAvailable()
      mem.addData((-1L, 100L * gapNs))
      q.processAllAvailable()
      mem.addData((-1L, 200L * gapNs))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sessions_bridge").filter(col("user_id") >= 0L)
      .select("n", "start_us", "end_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows == Set((3L, 0L, 3000000000L)), s"got $rows")
  }

  test("sessionize equals an independent batch reference on random event soups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 1800000000L // 30 min
    val rnd = new scala.util.Random(2027)
    for (round <- 1 to 3) {
      // timestamps drawn from multiples of HALF the gap so exact-tie
      // inter-event gaps (the boundary case) occur constantly; duplicate
      // (user, ts) events allowed
      val events = Seq.fill(120)(
        (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong * (gapUs / 2) * 1000L))
      // independent reference: plain Scala gaps-and-islands (no Spark)
      val expected = events.groupBy(_._1).flatMap { case (uid, evs) =>
        val ts = evs.map(_._2 / 1000L).sorted
        val sessions = ts.tail.foldLeft(List(List(ts.head))) { (acc, t) =>
          if (t - acc.head.head <= gapUs) (t :: acc.head) :: acc.tail
          else List(t) :: acc
        }
        sessions.map(s => (uid, s.size.toLong, s.min, s.max))
      }.toSet
      val mem = MemoryStream[(Long, Long)]
      val q = CellStream.sessionize(mem.toDS().toDF("user_id", "ts"),
        gapMicros = gapUs, watermark = "30 days")
        .writeStream.format("memory").queryName(s"sessions_rand_$round")
        .outputMode("append").start()
      try {
        // arbitrary batch boundaries; 30-day watermark accepts any order
        events.grouped(40).foreach { b => mem.addData(b); q.processAllAvailable() }
        val maxNs = events.map(_._2).max
        mem.addData((-1L, maxNs + 40L * 86400L * 1000000000L))
        q.processAllAvailable()
        mem.addData((-1L, maxNs + 80L * 86400L * 1000000000L))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(s"sessions_rand_$round").filter(col("user_id") >= 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == expected,
        s"round $round: extra=${got.diff(expected)} missing=${expected.diff(got)}")
    }
  }

  test("stateful latestPerKey maintains LWW winners incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Cell]
    val out = CellStream.latestPerKey(mem.toDS())
    val q = out.writeStream.format("memory").queryName("latest")
      .outputMode("append").start()
    try {
      mem.addData(ins("k1", "c1", "old", 1))
      q.processAllAvailable()
      mem.addData(ins("k1", "c1", "new", 5), del("k1", "c1", 5)) // tombstone wins tie
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("latest")
      .filter(col("ts") === 5)
      .collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("tombstone")))
  }

  test("gcGrace state TTL purges expired tombstones (then zombies can resurrect)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Cell]
    val out = CellStream.latestPerKey(mem.toDS(), gcBeforeSeconds = 500)
    val q = out.writeStream.format("memory").queryName("gcttl")
      .outputMode("append").start()
    try {
      mem.addData(ins("k1", "c1", "v", 1), del("k1", "c1", 10, ldt = 100)) // expired tombstone
      q.processAllAvailable()
      // tombstone won batch 1 but was purged from state; an OLDER write now
      // resurrects — the documented gcGrace zombie semantics
      mem.addData(ins("k1", "c1", "zombie", 5))
      q.processAllAvailable()
    } finally q.stop()
    val last = spark.table("gcttl").filter(col("ts") === 5).collect()
    assert(last.length == 1 && new String(last.head.getAs[Array[Byte]]("value"), "UTF-8") == "zombie")
  }

  test("streaming exact dedup: first-seen fingerprint wins across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.PipelineStream.dedupExact(
      mem.toDS().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      mem.addData((0L, "alpha beta"), (1L, "gamma"))
      q.processAllAvailable()
      // batch 2: an exact dup of doc 0 (normalization-equal, not byte-equal)
      // and one genuinely new doc
      mem.addData((2L, "  Alpha   BETA "), (3L, "delta"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("sdedup").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L, 3L), s"dup doc 2 must be dropped, got $ids")
  }

  test("streaming containment ingest: per-batch probes union to the one-shot probe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val book = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15 t16 t17 t18 t19 t20"
    val corpus = Seq((2L, book), (4L, "u5 u6 u7 u8 u9")).toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("contingest").toString
    graft.pipeline.Dedup.saveShinglePostings(
      corpus, "doc_id", "text", n = 3, path = s"$base/snap")
    val shard = Seq(
      (1L, "t5 t6 t7 t8 t9 t10"), // batch 1: quote of the standing book
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13 u14 u15"), // batch 2
      (5L, "x1 x2 x3 x4 x5")) // batch 2: matches nothing
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.PipelineStream.containmentIngest(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text", s"$base/snap",
      n = 3, num = 4, den = 5, basePath = s"$base/store", maxDocFreq = None)
      .option("checkpointLocation", s"$base/ckpt").start()
    try {
      mem.addData(shard.head)
      q.processAllAvailable()
      mem.addData(shard(1), shard(2))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$base/store/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val oneShot = graft.pipeline.Dedup.containmentAgainstSnapshot(
      shard.toDF("doc_id", "text"), "doc_id", "text", s"$base/snap",
      n = 3, num = 4, den = 5, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == oneShot, s"stream $got vs one-shot $oneShot")
    assert(got == Set((1L, 2L, 4L, 4L), (4L, 3L, 3L, 3L)), s"got $got")
  }

  test("streaming chunk registry: passages register once, contents equal the batch census") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val boiler = (1 to 8).map(i => s"boiler$i").mkString(" ") // one full chunk
    val docs = Seq(
      (1L, boiler + " unique one text here"),
      (2L, boiler + " other content entirely"),
      (3L, "standalone document with no shared passage at all"))
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.PipelineStream.chunkRegistry(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text", maxTokens = 8, stride = 8)
    val q = out.writeStream.format("memory").queryName("schunks")
      .outputMode("append").start()
    try {
      mem.addData(docs.take(1)); q.processAllAvailable()
      // doc 1 contributes its boilerplate chunk + its tail chunk
      assert(spark.table("schunks").count() == 2L)
      mem.addData(docs.drop(1)); q.processAllAvailable()
    } finally q.stop()
    val reg = spark.table("schunks").collect()
      .map(r => (r.getString(r.fieldIndex("fp")), r.getLong(r.fieldIndex("n_tokens"))))
    // doc 2's boilerplate chunk was already registered in batch 1 — it
    // must NOT re-emit; only doc 2's tail and doc 3's single chunk are new
    assert(reg.length == 4, s"got ${reg.length} rows: ${reg.toSeq}")
    assert(reg.distinct.length == reg.length) // each fp exactly once
    // registry contents == DISTINCT rows of the batch chunk lineage,
    // whatever the arrival order put first
    val batch = graft.pipeline.TextAnalysis.chunkByTokens(
      docs.toDF("doc_id", "text"), "doc_id", "text", 8, 8)
      .withColumn("fp", md5(col("chunk_text")))
      .withColumn("n_tokens",
        size(graft.pipeline.TextAnalysis.tokens(col("chunk_text"))).cast("long"))
      .select("fp", "n_tokens").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(reg.toSet == batch.toSet)
  }

  test("streaming codebook assignment equals batch assignExact bit-for-bit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array.tabulate(6)(j => (math.sin(i * 7 + j) * 2).toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val refined = graft.pipeline.Similarity.refinedCentroids(
      graft.pipeline.Similarity.kmeansStepExact(emb, "vec_id", "embedding", k = 4))
      .localCheckpoint()
    val batch = graft.pipeline.Similarity.assignExact(
      emb, "vec_id", "embedding", refined, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val mem = MemoryStream[(Long, Array[Float])]
    val out = graft.streaming.PipelineStream.assignStream(
      mem.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding", refined)
    val q = out.writeStream.format("memory").queryName("sassign")
      .outputMode("append").start()
    try {
      mem.addData(vecs.take(15)); q.processAllAvailable()
      mem.addData(vecs.drop(15)); q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("sassign").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream == batch, s"stream ${stream.size} rows vs batch ${batch.size}")
  }

  test("streaming decontamination flags exactly the batch-contaminated ids, once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma DELTA epsilon zeta"),
      (12L, "one two three four five six seven"),
      (13L, "short text"))
    val evalDocs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val evalGrams = evalDocs.select(
      explode(graft.pipeline.TextAnalysis.wordNgrams(col("text"), 5)).as("gram")).distinct()
    val batchFlagged = graft.pipeline.TextAnalysis.decontaminate(
      train.toDF("doc_id", "text"), evalDocs, "doc_id", "text", n = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.PipelineStream.contaminatedIds(
      mem.toDS().toDF("doc_id", "text"), evalGrams, "doc_id", "text", n = 5)
    val q = out.writeStream.format("memory").queryName("sdecon")
      .outputMode("append").start()
    try {
      mem.addData(train.take(2)); q.processAllAvailable()
      // re-deliver doc 10 (at-least-once feed) plus the rest
      mem.addData(train.drop(2) :+ train.head: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sdecon").select("id").collect().map(_.getLong(0))
    assert(rows.toSet == batchFlagged, s"stream flagged ${rows.toSet}, batch $batchFlagged")
    assert(rows.length == rows.toSet.size, s"re-delivered doc flagged twice: ${rows.toSeq}")
  }

  test("streaming near-dups equal the batch pipeline on random doc soups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // random docs over a small vocabulary with a planted template family:
    // enough shared shingles for candidates and verified pairs to occur
    // at random, including across batch boundaries
    val rnd = new scala.util.Random(2028)
    for (round <- 1 to 2) {
      val docs = (0L until 40L).map { i =>
        val base = Seq.tabulate(12)(j => s"w${(j * 3 + rnd.nextInt(3)) % 30}")
        val mutated =
          if (i % 3 == 0) base.updated(rnd.nextInt(12), s"x${rnd.nextInt(5)}")
          else Seq.fill(12)(s"w${rnd.nextInt(30)}")
        (i, mutated.mkString(" "))
      }
      val batchPairs = graft.pipeline.Dedup.minhashNearDuplicates(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, num = 4, den = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val mem = MemoryStream[(Long, String)]
      val q = graft.streaming.PipelineStream.nearDupPairs(
        mem.toDS().toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, num = 4, den = 5)
        .writeStream.format("memory").queryName(s"sneardup_rand_$round")
        .outputMode("append").start()
      try {
        docs.grouped(13).foreach { b => mem.addData(b); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table(s"sneardup_rand_$round")
        .select("ia", "ib", "inter", "uni").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == batchPairs,
        s"round $round: extra=${got.diff(batchPairs)} missing=${batchPairs.diff(got)}")
    }
  }

  test("streaming minhash-LSH near-dups: batch pair set, exact stats, redelivery-safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (2L, "completely different content about spark catalyst optimizer rules engine"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (4L, "yet another unrelated document mentioning parquet bloom filters and scans"))
    val batchPairs = graft.pipeline.Dedup.minhashNearDuplicates(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, num = 4, den = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batchPairs.map(p => (p._1, p._2)) == Set((0L, 1L), (0L, 3L), (1L, 3L)))

    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.PipelineStream.nearDupPairs(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, num = 4, den = 5)
    val q = out.writeStream.format("memory").queryName("sneardup")
      .outputMode("append").start()
    try {
      // near-dup pair arriving within one micro-batch
      mem.addData(corpus.take(2): _*); q.processAllAvailable()
      // exact dup of doc 0 in a LATER batch, plus a redelivery of doc 0
      mem.addData(corpus.drop(2) :+ corpus.head: _*); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sneardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the stream finds exactly the batch pairs with identical exact stats
    // (pairs may repeat once per shared band bucket, never more)
    assert(rows.toSet == batchPairs, s"stream ${rows.toSet} vs batch $batchPairs")
    val byPair = rows.groupBy(p => (p._1, p._2)).view.mapValues(_.length)
    byPair.foreach { case (p, c) =>
      assert(c <= 8, s"pair $p emitted $c times (> bands)") }
  }

  test("watermark-bounded decontamination: dup flags drop in-window, state expires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val dirty = "alpha beta gamma delta epsilon zeta"
    val clean = "one two three four five six seven"
    val evalGrams = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
      .select(explode(graft.pipeline.TextAnalysis.wordNgrams(col("text"), 5)).as("gram"))
      .distinct()
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.PipelineStream.contaminatedIdsWithinWatermark(
      mem.toDS().toDF("doc_id", "text", "ets"), evalGrams, "doc_id", "text",
      n = 5, "ets", "10 minutes")
    val q = out.writeStream.format("memory").queryName("swdecon")
      .outputMode("append").start()
    try {
      mem.addData((10L, dirty, ts(0)), (12L, clean, ts(0)))
      q.processAllAvailable()
      // re-delivery inside the delay dedups; the late clean doc pushes the
      // watermark to minute 50, expiring doc 10's state row
      mem.addData((10L, dirty, ts(5)), (99L, clean, ts(60)))
      q.processAllAvailable()
      // state expired: the same id re-emits — the bounded-state tradeoff;
      // sinks dedup idempotently on the id
      mem.addData((10L, dirty, ts(65)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("swdecon").select("id").collect().map(_.getLong(0)).toSeq
    assert(ids.count(_ == 10L) == 2 && ids.toSet == Set(10L), s"got $ids")
  }

  test("watermark-bounded near-dup: in-window twin found, expired bucket forgets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val textA = "the quick brown fox jumps over the lazy dog near the river bank today"
    val textB = "a completely different document about spark catalyst optimizer internals"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.PipelineStream.nearDupPairsWithinWatermark(
      mem.toDS().toDF("doc_id", "text", "ets"), "doc_id", "text",
      "ets", "10 minutes", n = 3, numHashes = 32, bands = 8, num = 4, den = 5)
    val q = out.writeStream.format("memory").queryName("swneardup")
      .outputMode("append").start()
    try {
      // twin within the delay window: pair (1,2) must be found
      mem.addData((1L, textA, ts(0)), (5L, textB, ts(0)))
      q.processAllAvailable()
      mem.addData((2L, textA, ts(5)))
      q.processAllAvailable()
      // push the watermark far past every bucket's newest member
      mem.addData((6L, textB + " and more words here", ts(120)))
      q.processAllAvailable()
      // same text re-arrives AFTER eviction: its bucket forgot doc 1/2 —
      // no pair emits (the bounded-state tradeoff; the batch pass catches it)
      mem.addData((3L, textA, ts(125)))
      q.processAllAvailable()
      // but a twin of doc 3 inside the NEW window pairs with it
      mem.addData((4L, textA, ts(130)))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("swneardup").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)), s"got $pairs")
    // state is bounded: after the evictions, rows track the in-window
    // docs' band buckets only (not every doc ever seen)
    val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
    assert(stateRows <= 3 * 8, s"state must hold only in-window buckets: $stateRows")
  }

  test("streaming near-dup maxBucket: overflowed bucket stops emitting, honest pair unaffected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val blobText = "zig zag zog zeb zub zam zin zon zur zat"
    val honest = Seq( // J = 12/14 ≥ 4/5, different buckets than the blob
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi omicron pi"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi omicron rho"))
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.PipelineStream.nearDupPairs(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, num = 4, den = 5, maxBucket = Some(4))
      .writeStream.format("memory").queryName("snd_guard")
      .outputMode("append").start()
    try {
      // exactly cap members: pairs among them emit (streaming can't retract)
      mem.addData((100L to 103L).map(i => (i, blobText)): _*); q.processAllAvailable()
      // the cap+1'th member overflows every blob bucket: no pair with it
      mem.addData((104L, blobText)); q.processAllAvailable()
      // post-overflow arrivals ignored; the honest pair (other buckets) found
      mem.addData(Seq((105L, blobText)) ++ honest: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("snd_guard").select("ia", "ib").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val firstFour = (100L to 103L)
    val blobPairs = (for { a <- firstFour; b <- firstFour if a < b } yield (a, b)).toSet
    assert(got == blobPairs + ((1L, 2L)), s"got $got")
  }

  test("watermarked near-dup maxBucket: overflow flag expires once the feed leaves it quiet") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val blobText = "zig zag zog zeb zub zam zin zon zur zat"
    val other = "a completely different document about spark catalyst optimizer internals"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val q = graft.streaming.PipelineStream.nearDupPairsWithinWatermark(
      mem.toDS().toDF("doc_id", "text", "ets"), "doc_id", "text",
      "ets", "10 minutes", n = 3, numHashes = 32, bands = 8, num = 4, den = 5,
      maxBucket = Some(2))
      .writeStream.format("memory").queryName("swnd_guard")
      .outputMode("append").start()
    try {
      mem.addData((100L, blobText, ts(0)), (101L, blobText, ts(0)))
      q.processAllAvailable() // pair (100,101) — at cap, not over it
      mem.addData((102L, blobText, ts(1)), (103L, blobText, ts(2)))
      q.processAllAvailable() // 3rd member overflows: members freed, flag kept
      // push the watermark past the flag's newest ignored arrival (min 2):
      // the event-time timeout reaps the flag row itself
      mem.addData((50L, other, ts(120)))
      q.processAllAvailable()
      // fresh window: the bucket starts clean and pairs again
      mem.addData((104L, blobText, ts(125)), (105L, blobText, ts(126)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("swnd_guard").select("ia", "ib").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 101L), (104L, 105L)), s"got $got")
  }

  test("streaming sample gate admits exactly the batch mixtureSample ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 120L).map(i =>
      (i, if (i % 2 == 0) "the cat and the dog of the house in the night"
          else "el perro y el gato de la casa que ladra en la noche"))
    val rates = Seq("en" -> 600, "es" -> 300)
    val batchKept = graft.pipeline.TextAnalysis.mixtureSample(
      docs.toDF("doc_id", "text"), "doc_id", "text", rates, defaultPermille = 0)
      .select("id").collect().map(_.getLong(0)).toSet
    val mem = MemoryStream[(Long, String)]
    val out = graft.streaming.PipelineStream.sampleGate(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text", rates, defaultPermille = 0)
    val q = out.writeStream.format("memory").queryName("ssample")
      .outputMode("append").start()
    try {
      docs.grouped(40).foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val streamKept = spark.table("ssample").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(streamKept == batchKept,
      s"stream/batch sampling diverged: ${streamKept.diff(batchKept)} / ${batchKept.diff(streamKept)}")
    assert(batchKept.nonEmpty && batchKept.size < 120)
  }

  test("weightedSampleGate: adversarial arrival orders admit exactly the batch winners") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 300L).map(i => (i, i % 17L + 1L))
    val batch = graft.pipeline.TextAnalysis.weightedSample(
      docs.toDF("doc_id", "wt"), "doc_id", "wt", k = 40)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(batch.length == 40)
    val threshold = graft.pipeline.TextAnalysis.weightedSampleThreshold(
      docs.toDF("doc_id", "wt"), "doc_id", "wt", k = 40).localCheckpoint()
    // forward and reversed feeds, different slicings → identical output,
    // bit-for-bit equal to the batch race (stateless gate: no state to
    // depend on order)
    Seq(("fwd", docs, 75), ("rev", docs.reverse, 111)).foreach {
      case (tag, order, slice) =>
        val mem = MemoryStream[(Long, Long)]
        val out = graft.streaming.PipelineStream.weightedSampleGate(
          mem.toDS().toDF("doc_id", "wt"), "doc_id", "wt", threshold)
        val q = out.writeStream.format("memory").queryName(s"swsk_$tag")
          .outputMode("append").start()
        try order.grouped(slice).foreach { b => mem.addData(b); q.processAllAvailable() }
        finally q.stop()
        val streamed = graft.pipeline.TextAnalysis.assignSamplePicks(
          spark.table(s"swsk_$tag"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
        assert(streamed == batch,
          s"$tag arrival diverged: ${streamed.diff(batch)} / ${batch.diff(streamed)}")
    }
  }

  test("budgetGateByGroup: arrival orders admit exactly the batch prefix; cums re-derive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 3 groups incl. NULL, variable doc lengths
    val docs = (0L until 120L).map { i =>
      val grp = i % 3 match { case 0 => "en"; case 1 => "de"; case 2 => null }
      (i, grp, Seq.fill(3 + (i % 7).toInt)("w").mkString(" "))
    }
    val d = docs.toDF("doc_id", "lang", "text")
    val budget = 50L
    val batch = graft.pipeline.TextAnalysis
      .budgetSelectByGroup(d, "doc_id", "lang", "text", budget)
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val thresholds = graft.pipeline.TextAnalysis.budgetGroupThresholds(
      d, "doc_id", "lang", "text", budget).localCheckpoint()
    Seq(("fwd", docs, 40), ("rev", docs.reverse, 33)).foreach {
      case (tag, order, slice) =>
        val mem = MemoryStream[(Long, String, String)]
        val out = graft.streaming.PipelineStream.budgetGateByGroup(
          mem.toDS().toDF("doc_id", "lang", "text"), "doc_id", "lang",
          "text", thresholds)
        val q = out.writeStream.format("memory").queryName(s"sbud_$tag")
          .outputMode("append").start()
        try order.grouped(slice).foreach { b => mem.addData(b); q.processAllAvailable() }
        finally q.stop()
        val streamed = graft.pipeline.TextAnalysis.assignGroupBudgetCums(
          spark.table(s"sbud_$tag"))
          .collect()
          .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        assert(streamed == batch,
          s"$tag diverged: extra=${streamed.diff(batch)} missing=${batch.diff(streamed)}")
    }
  }

  test("watermark-bounded streaming dedup: dups inside the delay drop, state expires") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = graft.streaming.PipelineStream.dedupExactWithinWatermark(
      mem.toDS().toDF("doc_id", "text", "ets"), "text", "ets", "10 minutes")
    val q = out.writeStream.format("memory").queryName("swdedup")
      .outputMode("append").start()
    try {
      mem.addData((0L, "alpha", ts(0)), (1L, "beta", ts(0)))
      q.processAllAvailable()
      // dup inside the delay window drops; the late doc pushes the
      // watermark to minute 50 (60 - 10 delay), expiring alpha's state
      mem.addData((2L, "alpha", ts(5)), (3L, "pusher", ts(60)))
      q.processAllAvailable()
      // alpha's state is gone: the same text is emitted again — the
      // bounded-state tradeoff the batch dedup pass mops up
      mem.addData((4L, "alpha", ts(65)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table("swdedup").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(0L, 1L, 3L, 4L), s"got $ids")
  }

  test("sketchPairs: streaming closure equals batch hammingClusters; identical-sketch flood stays linear") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val A = 0x0123456789abcdefL
    val B = A ^ (1L << 3) ^ (1L << 40)  // hamming 2 from A (bands 0 and 2)
    val D = B ^ (1L << 17) ^ (1L << 18) // hamming 2 from B, 4 from A: chains only via B
    val C = 0x0F0F0F0F0F0F0F0FL        // no band shared with A/B/D
    val items = Map(1L -> A, 2L -> A, 3L -> A, 4L -> B, 5L -> C, 6L -> D)
    val mem = MemoryStream[(Long, Long)]
    val out = graft.streaming.PipelineStream.sketchPairs(
      mem.toDS().toDF("id", "h"), "id", "h", maxHamming = 3)
    val q = out.writeStream.format("memory").queryName("sketch_pairs")
      .outputMode("append").start()
    try {
      // adversarial arrival order: the B-bridge first, the A-mass split
      // across batches, the singleton in the middle
      mem.addData((4L, B)); q.processAllAvailable()
      mem.addData((3L, A), (6L, D)); q.processAllAvailable()
      mem.addData((1L, A), (5L, C), (2L, A)); q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("sketch_pairs").select("ia", "ib").distinct()
    val cc = graft.pipeline.Dedup.connectedComponents(pairs)
    val streamed = items.keys.toSeq.toDF("id")
      .join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = graft.pipeline.Dedup.hammingClusters(
      items.toSeq.toDF("id", "h"), "id", "h", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(batch == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 6L -> 1L, 5L -> 5L),
      s"batch fixture drifted: $batch")
    assert(streamed == batch, s"streamed $streamed vs batch $batch")

    // a flood of identical sketches: state holds one entry, emissions are
    // rep links — at most 4 (one per band) per arrival, never C(N,2)
    val mem2 = MemoryStream[(Long, Long)]
    val out2 = graft.streaming.PipelineStream.sketchPairs(
      mem2.toDS().toDF("id", "h"), "id", "h", maxHamming = 3)
    val q2 = out2.writeStream.format("memory").queryName("sketch_flood")
      .outputMode("append").start()
    try {
      (1L to 10L).grouped(3).foreach { g =>
        mem2.addData(g.map(i => (i, A)): _*); q2.processAllAvailable()
      }
    } finally q2.stop()
    val flood = spark.table("sketch_flood")
    assert(flood.count() <= 4L * 9L, s"flood emitted ${flood.count()} rows — quadratic?")
    val oneComp = graft.pipeline.Dedup.connectedComponents(
      flood.select("ia", "ib").distinct())
      .agg(countDistinct(col("comp"))).head().getLong(0)
    assert(oneComp == 1L)
  }

  test("streaming HLL: changelog compacts to the batch registers; emissions monotone and bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val keys = (0 until 400).map(i => (s"k$i", if (i % 3 == 0) "en" else "de"))
    val batch = graft.pipeline.Sketches.hllRegisters(
      keys.toDF("k", "g"), "k", "g", b = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mem = MemoryStream[(String, String)]
    val out = graft.streaming.PipelineStream.hllStream(
      mem.toDS().toDF("k", "g"), "k", "g", b = 4)
    val q = out.writeStream.format("memory").queryName("shll")
      .outputMode("append").start()
    try {
      // reversed arrival order + a redelivered prefix (at-least-once feed)
      mem.addData(keys.reverse.take(150): _*); q.processAllAvailable()
      mem.addData(keys.reverse.drop(150) ++ keys.take(50): _*); q.processAllAvailable()
    } finally q.stop()
    val log = spark.table("shll")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val compacted = log.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(compacted == batch)
    // monotone changelog: a register never emits the same or a lower rho
    // twice, so per-register emission count == distinct rho count
    log.groupBy(_._1).foreach { case (reg, rows) =>
      assert(rows.map(_._2).distinct.length == rows.length, s"dup emission at $reg")
    }
  }

  test("streaming CMS: per-batch partials sum to the batch sketch for any slicing") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = (0 until 60).map(i => s"tok${i % 5} tok${i % 11} shared filler$i")
    val batch = graft.pipeline.Sketches.countMinSketch(
      docs.toDF("text"), "text", d = 4, w = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mem = MemoryStream[String]
    val out = graft.streaming.PipelineStream.cmsStream(
      mem.toDS().toDF("text"), "text", d = 4, w = 64)
    val q = out.writeStream.format("memory").queryName("scms")
      .outputMode("append").start()
    try {
      // uneven slices, reversed order — additivity is slicing-invariant
      mem.addData(docs.reverse.take(7): _*); q.processAllAvailable()
      mem.addData(docs.reverse.slice(7, 40): _*); q.processAllAvailable()
      mem.addData(docs.reverse.drop(40): _*); q.processAllAvailable()
    } finally q.stop()
    val compacted = spark.table("scms")
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(compacted == batch)
  }

  test("streaming asof: quotes-lead feed equals batch; same-batch disorder resolves; early probe honest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int, Long)]
    val out = graft.streaming.PipelineStream.asofStream(
      mem.toDS().toDF("k", "ts", "tag", "id"))
    val q = out.writeStream.format("memory").queryName("sasof")
      .outputMode("append").start()
    try {
      // batch 1: one user's quote AND probe arrive together, probe FIRST
      // in arrival order — the per-batch (ts, tag, id) sort must match it
      mem.addData((1L, 20L, 1, 900L), (1L, 10L, 0, 100L)); q.processAllAvailable()
      // batch 2: a probe for user 2 arrives BEFORE its quote (next batch)
      mem.addData((2L, 50L, 1, 901L)); q.processAllAvailable()
      mem.addData((2L, 40L, 0, 200L), (2L, 60L, 1, 902L)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sasof")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(rows(900L) == 100L)  // same-batch disorder resolved by sort
    assert(rows(901L) == -1L)   // attribution-at-arrival: quote not yet seen
    assert(rows(902L) == 200L)  // later probe sees the registered quote
  }

  test("streaming asof maxQuotes: exact within the horizon, evicted quote honestly forgotten") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int, Long)]
    val out = graft.streaming.PipelineStream.asofStream(
      mem.toDS().toDF("k", "ts", "tag", "id"), maxQuotes = 2)
    val q = out.writeStream.format("memory").queryName("sasofb")
      .outputMode("append").start()
    try {
      // three quotes; the oldest (ts=10) evicts under maxQuotes=2
      mem.addData((1L, 10L, 0, 100L), (1L, 20L, 0, 101L), (1L, 30L, 0, 102L))
      q.processAllAvailable()
      // probe at 35 matches inside the horizon (quote 30)
      // probe at 15 would need the EVICTED quote 10 → honest None
      mem.addData((1L, 35L, 1, 900L), (1L, 15L, 1, 901L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sasofb")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(rows == Map(900L -> 102L, 901L -> -1L))
  }

  test("streaming asof lookback: stale match nulls, state evicts behind the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int, Long)]
    val out = graft.streaming.PipelineStream.asofStream(
      mem.toDS().toDF("k", "ts", "tag", "id"), maxLookback = 20L)
    val q = out.writeStream.format("memory").queryName("sasofw")
      .outputMode("append").start()
    try {
      mem.addData((1L, 10L, 0, 100L), (1L, 50L, 0, 101L)); q.processAllAvailable()
      // quote 10 is now 40 behind maxSeen=50 → evicted; probe at 60
      // matches 101 (gap 10 ≤ 20), probe at 80 nulls (gap 30 > 20)
      mem.addData((1L, 60L, 1, 900L), (1L, 80L, 1, 901L)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sasofw")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(rows == Map(900L -> 101L, 901L -> -1L))
  }

  test("asof holdback: probe-before-quote across batches still matches (watermark resolution)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int, Long)]
    // second-scale µs event times: watermarks tick in engine MILLIseconds
    val out = graft.streaming.PipelineStream.asofStreamHoldback(
      mem.toDS().toDF("k", "ts", "tag", "id"), disorderBoundUs = 5000000L)
    val q = out.writeStream.format("memory").queryName("sasofh")
      .outputMode("append").start()
    try {
      // the delivery shape attribution-at-arrival CANNOT attribute: the
      // probe (ts=20s) arrives a full batch BEFORE its quote (ts=17s)
      mem.addData((1L, 20000000L, 1, 900L)); q.processAllAvailable()
      // quote arrives late-but-in-bound (wm is now 15s; 17s > 15s);
      // flusher quotes on another key then walk the watermark past 20s
      mem.addData((1L, 17000000L, 0, 100L), (9L, 40000000L, 0, 500L))
      q.processAllAvailable()
      mem.addData((9L, 60000000L, 0, 501L)); q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sasofh")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(rows == Map(900L -> 100L), s"got $rows")
  }

  test("asof holdback lookback: held probes drain, stale match nulls, quote state evicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Int, Long)]
    val out = graft.streaming.PipelineStream.asofStreamHoldback(
      mem.toDS().toDF("k", "ts", "tag", "id"),
      disorderBoundUs = 5000000L, maxLookback = 10000000L)
    val q = out.writeStream.format("memory").queryName("sasofhw")
      .outputMode("append").start()
    try {
      mem.addData((1L, 10000000L, 0, 100L), (1L, 13000000L, 1, 900L),
        (1L, 30000000L, 1, 901L))
      q.processAllAvailable()
      // wm walks to 25s in the data batch (resolving probe 13s) and the
      // engine's NO-DATA batch walks it to 35s right after, draining the
      // 30s probe too — held probes resolve as the watermark passes them
      mem.addData((9L, 40000000L, 0, 500L)); q.processAllAvailable()
      val midRows = spark.table("sasofhw").count()
      assert(midRows >= 1L, s"no held probe drained, got $midRows")
      // wm 35s: probe 30s resolves NULL (gap 20s > lookback); quote 10s
      // is behind wm − lookback = 25s and must evict; key 1 state empties
      mem.addData((9L, 70000000L, 0, 501L)); q.processAllAvailable()
      mem.addData((9L, 100000000L, 0, 502L)); q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators(0).numRowsTotal
      // only key 9's in-window quotes may remain
      assert(stateRows <= 2L, s"state did not evict: $stateRows rows")
    } finally q.stop()
    val rows = spark.table("sasofhw")
      .collect().map(r => r.getLong(2) ->
        (if (r.isNullAt(4)) -1L else r.getLong(4))).toMap
    assert(rows == Map(900L -> 100L, 901L -> -1L), s"got $rows")
  }

  test("eventDedupStream: min-struct winner on an ADVERSARIAL arrival order equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, Long)]
    val out = graft.streaming.PipelineStream.eventDedupStream(
      mem.toDS().toDF("u", "et", "id", "t"), Seq("u", "et"), "id", "t",
      windowMicros = 100L, watermark = "0 microseconds")
    val q = out.writeStream.format("memory").queryName("sdw")
      .outputMode("append").start()
    try {
      // the LATER copy (t=150) arrives FIRST — keep-first-by-time must
      // still win for the earlier one (min-struct, not first-arrival)
      mem.addData((1L, "a", 11L, 150L), (1L, "a", 10L, 120L))
      q.processAllAvailable()
      // watermark passes window [100,200) only once a later event shows
      mem.addData((1L, "a", 12L, 350L))
      q.processAllAvailable()
      mem.addData((1L, "a", 13L, 990L)) // watermark → 990
      q.processAllAvailable()
      mem.addData((1L, "a", 14L, 2000L)) // closes [300,400)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sdw").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got((1L, "a", 100L)) == ((10L, 120L, 1L)))
    assert(got((1L, "a", 300L)) == ((12L, 350L, 0L)))
    // batch twin on the same closed windows agrees exactly
    val batch = graft.operators.EventOps.dedupEventsWindowed(
      Seq((1L, "a", 11L, 150L), (1L, "a", 10L, 120L), (1L, "a", 12L, 350L))
        .toDF("u", "et", "id", "t"), Seq("u", "et"), "id", "t", 100L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(batch.forall { case (k, v) => got(k) == v })
  }

  test("scdStream: intra-batch disorder repaired; null-safe changes; versions equal batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val out = graft.streaming.PipelineStream.scdStream(
      mem.toDS().toDF("k", "ts", "v"))
    val q = out.writeStream.format("memory").queryName("sscd")
      .outputMode("append").start()
    try {
      // batch 1 SHUFFLED within the batch: x@20 before x@10 — the sort
      // must collapse them into ONE version starting at 10; u2 opens
      // with a NULL value (kept as version 1)
      mem.addData((1L, 20L, "x"), (1L, 10L, "x"), (2L, 10L, null))
      q.processAllAvailable()
      // batch 2 (later event times): u1 changes to y then BACK to x
      // (recurring value = new version); u2 null→z is a change
      mem.addData((1L, 30L, "y"), (1L, 50L, "x"), (2L, 30L, "z"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sscd").collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        (Option(r.getString(1)), r.getLong(3))).toMap
    assert(got == Map(
      (1L, 1L) -> ((Some("x"), 10L)), (1L, 2L) -> ((Some("y"), 30L)),
      (1L, 3L) -> ((Some("x"), 50L)),
      (2L, 1L) -> ((None, 10L)), (2L, 2L) -> ((Some("z"), 30L))))
    // change rows equal the batch operator's on the union
    val batch = graft.operators.EventOps.scdIntervals(
      Seq((1L, 20L, "x"), (1L, 10L, "x"), (2L, 10L, null: String),
        (1L, 30L, "y"), (1L, 50L, "x"), (2L, 30L, "z")).toDF("k", "t", "v"),
      "k", "t", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        (Option(r.getString(1)), r.getLong(3))).toMap
    assert(batch == got)
  }

  test("bucketCountStream: window-close counts on adversarial slicing rank to the batch heavy hitters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // item, t
    // second-scale timestamps: Spark tracks watermarks in MILLIseconds,
    // so sub-millisecond toy values would pin the watermark at 0 forever
    val M = 1000000L
    val out = graft.streaming.PipelineStream.bucketCountStream(
      mem.toDS().toDF("item", "t"), "item", "t",
      windowMicros = 100L * M, watermark = "0 microseconds")
    val q = out.writeStream.format("memory").queryName("sbhh")
      .outputMode("append").start()
    try {
      // bucket 1 split across batches, late-within-batch disorder
      mem.addData((7L, 110L * M), (7L, 150L * M), (8L, 120L * M))
      q.processAllAvailable()
      mem.addData((7L, 199L * M), (8L, 130L * M), (8L, 140L * M),
        (9L, 101L * M))
      q.processAllAvailable()
      mem.addData((5L, 310L * M)) // watermark → 310 s: closes bucket 1
      q.processAllAvailable()
      mem.addData((5L, 990L * M)) // closes bucket 3
      q.processAllAvailable()
    } finally q.stop()
    val counts = spark.table("sbhh")
    val got = counts.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 7L) -> 3L, (1L, 8L) -> 3L, (1L, 9L) -> 1L,
      (3L, 5L) -> 1L))
    // ranked through the shared definition ≡ the batch heavy hitters
    val ranked = graft.operators.EventOps.topKByBucket(counts, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(ranked == Map((1L, 1L) -> ((7L, 3L)), (1L, 2L) -> ((8L, 3L)),
      (3L, 1L) -> ((5L, 1L))))
    val batch = graft.operators.EventOps.heavyHittersByBucket(
      Seq((7L, 1L), (7L, 1L), (8L, 1L), (7L, 1L), (8L, 1L), (8L, 1L),
        (9L, 1L), (5L, 3L)).toDF("item", "b"), "item", "b", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(batch == ranked)
  }

  test("funnelStreamBranching: any admitted type advances; earliest-of-any on ordered feed equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq(Seq("A"), Seq("B", "C"), Seq("D"))
    val mem = MemoryStream[(Long, Long, String)]
    val out = graft.streaming.PipelineStream.funnelStreamBranching(
      mem.toDS().toDF("k", "ts", "et"), stages)
    val q = out.writeStream.format("memory").queryName("sbfunnel")
      .outputMode("append").start()
    try {
      // u1 advances stage 2 on C (no B ever); u2 sees C then B after A —
      // the EARLIEST of the two (C@20) must be its stage-2 time; u3's
      // B arrives before its A and must not count
      mem.addData((1L, 10L, "A"), (1L, 30L, "C"), (2L, 10L, "A"),
        (3L, 5L, "B"), (3L, 10L, "A"))
      q.processAllAvailable()
      mem.addData((1L, 40L, "D"), (2L, 20L, "C"), (2L, 25L, "B"),
        (2L, 35L, "D"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sbfunnel").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 1L) -> 10L, (1L, 2L) -> 30L, (1L, 3L) -> 40L,
      (2L, 1L) -> 10L, (2L, 2L) -> 20L, (2L, 3L) -> 35L, (3L, 1L) -> 10L))
    // per-stage counts equal the batch branching funnel on the union
    val batch = graft.operators.EventOps.funnelBranching(
      Seq((1L, 10L, "A"), (1L, 30L, "C"), (2L, 10L, "A"), (3L, 5L, "B"),
        (3L, 10L, "A"), (1L, 40L, "D"), (2L, 20L, "C"), (2L, 25L, "B"),
        (2L, 35L, "D")).toDF("u", "t", "et"),
      "u", "t", "et", stages)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val streamCounts = got.keys.groupBy(_._2).view.mapValues(_.size.toLong)
    assert(batch.forall { case (k, n) => streamCounts.getOrElse(k, 0L) == n })
  }

  test("intervalJoinStream: cross-arrival disorder matches exactly; rollup equals batch; state evicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val miv = MemoryStream[(Long, Long, Long, Long)] // user, sid, start, end
    val mpt = MemoryStream[Long]
    val out = graft.streaming.PipelineStream.intervalJoinStream(
      miv.toDS().toDF("user", "sid", "start", "end"),
      mpt.toDS().toDF("t"),
      Seq("user", "sid"), "start", "end", "t",
      binSize = 100L, maxIntervalMicros = 300L, watermark = "0 microseconds")
    val q = out.writeStream.format("memory").queryName("sivj")
      .outputMode("append").start()
    try {
      // batch 1: points arrive BEFORE any interval (710 before its
      // interval even exists) — symmetric state must hold them
      mpt.addData(120L, 250L, 710L)
      q.processAllAvailable()
      // batch 2: the interval covering the early points, the interval
      // covering the pre-arrived 710, a zero-match interval, and one
      // more point for the fresh interval — both arrival orders
      miv.addData((1L, 1L, 100L, 260L), (2L, 1L, 700L, 720L),
        (3L, 1L, 400L, 450L))
      mpt.addData(705L)
      q.processAllAvailable()
      // batch 3: far-future both sides → the watermark advances and the
      // declared range condition lets Spark evict the old state
      miv.addData((9L, 1L, 100000L, 100010L))
      mpt.addData(100005L)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sivj").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    assert(got == Set((1L, 1L, 120L), (1L, 1L, 250L), (2L, 1L, 705L),
      (2L, 1L, 710L), (9L, 1L, 100005L)))
    // zero-filled rollup (the caller contract) equals the batch operator
    val ivDf = Seq((1L, 1L, 100L, 260L), (2L, 1L, 700L, 720L),
      (3L, 1L, 400L, 450L), (9L, 1L, 100000L, 100010L))
      .toDF("user", "sid", "start", "end")
    val ptDf = Seq(120L, 250L, 710L, 705L, 100005L).toDF("t")
    val batch = graft.operators.EventOps.intervalPointCount(
      ivDf, Seq("user", "sid"), "start", "end", ptDf, "t", binSize = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(batch == Map((1L, 1L) -> 2L, (2L, 1L) -> 2L, (3L, 1L) -> 0L,
      (9L, 1L) -> 1L))
    val counts = got.groupBy(k => (k._1, k._2)).view.mapValues(_.size.toLong)
    assert(batch.forall { case (k, n) =>
      counts.getOrElse(k, 0L) == n || n == 0L })
    // eviction really happened: total state rows < everything ever fed
    // (5 exploded interval-bin rows + 5 points); the batch-3 watermark
    // clears the batch-1/2 era on both sides
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows < 10L, s"state rows $stateRows — nothing evicted?")
  }

  test("funnelStream: intra-batch disorder repaired; cross-batch time order gives batch equality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val out = graft.streaming.PipelineStream.funnelStream(
      mem.toDS().toDF("k", "ts", "et"), Seq("A", "B", "C"))
    val q = out.writeStream.format("memory").queryName("sfunnel")
      .outputMode("append").start()
    try {
      // batch 1 arrives SHUFFLED within the batch: B@20 before A@10 —
      // the sort must still advance A then B. u2 only reaches A.
      mem.addData((1L, 20L, "B"), (1L, 10L, "A"), (2L, 15L, "A"))
      q.processAllAvailable()
      // batch 2 (later event times): u1 completes C; u2's B at a time
      // NOT after its A-time... at 15 exactly → no advance; then at 30 → advance
      mem.addData((1L, 40L, "C"), (2L, 15L, "B"), (2L, 30L, "B"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sfunnel").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 1L) -> 10L, (1L, 2L) -> 20L, (1L, 3L) -> 40L,
      (2L, 1L) -> 15L, (2L, 2L) -> 30L))
    // per-stage advance counts == the batch funnel on the union
    val batch = graft.operators.EventOps.funnel(
      Seq((1L, 20L, "B"), (1L, 10L, "A"), (2L, 15L, "A"),
        (1L, 40L, "C"), (2L, 15L, "B"), (2L, 30L, "B")).toDF("u", "t", "et"),
      "u", "t", "et", Seq("A", "B", "C"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val streamCounts = got.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(batch.forall { case (k, n) => streamCounts.getOrElse(k, 0L) == n })
  }

  test("windowed counts with watermark run on a cell stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Cell]
    val agg = CellStream.windowedCounts(mem.toDS().toDF(), "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win")
      .outputMode("complete").start()
    try {
      val base = 1700000000000L * 1000000L // ns
      mem.addData(
        ins("k1", "c1", "v", base), ins("k1", "c2", "v", base + 60L * 1000000000L),
        ins("k2", "c1", "v", base))
      q.processAllAvailable()
    } finally q.stop()
    val n = spark.table("win").agg(sum("n")).head().getLong(0)
    assert(n == 3L)
  }

  test("bm25IndexIngest: per-batch postings runs; indexed readout ≡ batch scorer; empty batch skipped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_bm25ing").toString
    val mem = MemoryStream[(Long, String)]
    val in = mem.toDS().toDF("doc_id", "text")
    val q = graft.streaming.PipelineStream
      .bm25IndexIngest(in, "doc_id", "text", s"$base/store")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val docs = Seq(
      (1L, "rare filler filler filler"),
      (2L, "rare filler filler filler extra extra extra extra"),
      (3L, "common filler filler filler"),
      (4L, ""), // token-less: doclens row only
      (5L, "common common filler filler"),
      (6L, "common pad pad pad"))
    try {
      docs.grouped(3).foreach { g => mem.addData(g); q.processAllAvailable() }
    } finally q.stop()
    // two micro-batches → two append-only runs per artifact
    val postings = spark.read.parquet(s"$base/store/postings")
    val doclens = spark.read.parquet(s"$base/store/doclens")
    assert(postings.select($"run").distinct().count() == 2L)
    assert(doclens.count() == 6L) // the token-less doc still weights N
    // readout over the unioned runs ≡ the ad-hoc batch scorer
    def rks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = rks(graft.pipeline.TextAnalysis.bm25TopKIndexed(
      postings, doclens, "rare common", k = 6))
    val adhoc = rks(graft.pipeline.TextAnalysis.bm25TopK(
      docs.toDF("doc_id", "text"), "doc_id", "text", "rare common", k = 6))
    assert(streamed == adhoc, s"$streamed vs $adhoc")
  }

  test("knnGraphIngest: append-only runs, latest-run-per-cell readout ≡ one-shot graph") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_knning").toString
    val rnd = new scala.util.Random(29)
    val all = (0 until 21).map { i =>
      (i.toLong, Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    }
    val df = all.toDF("vec_id", "embedding").localCheckpoint()
    val codebook = graft.pipeline.Similarity.refinedCentroids(
      graft.pipeline.Similarity.kmeansStepExact(df, "vec_id", "embedding", k = 3))
      .localCheckpoint()
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.streaming.PipelineStream.knnGraphIngest(
      mem.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
      codebook, k = 3, kNbrs = 2, basePath = s"$base/store")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      // 3 batches over 3 cells: later batches RE-touch earlier cells,
      // so the readout must supersede their stale runs
      all.grouped(7).foreach { g => mem.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val runs = spark.read.parquet(s"$base/store/index")
      .select($"run").distinct().count()
    assert(runs == 3L, s"expected 3 append-only index runs, got $runs")
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      d.select("cell", "id", "rank", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val oneShot = graft.pipeline.Similarity.knnGraphTable(
      graft.pipeline.Similarity.ivfIndexTable(df, "vec_id", "embedding",
        codebook, 3), 2)
    assert(rows(graft.streaming.PipelineStream.readKnnGraph(spark, s"$base/store"))
      == rows(oneShot))
    // nothing ingested yet → empty graph, not a crash
    assert(graft.streaming.PipelineStream
      .readKnnGraph(spark, s"$base/empty").isEmpty)
    // compact: runs consolidate under the max numeric id, readout
    // unchanged; a later batch fold continues the lifecycle
    graft.streaming.PipelineStream.compactKnnStore(spark, s"$base/store")
    assert(spark.read.parquet(graft.streaming.PipelineStream
        .resolveSubPath(spark, s"$base/store", "index"))
      .select($"run").distinct().count() == 1L)
    assert(rows(graft.streaming.PipelineStream
      .readKnnGraph(spark, s"$base/store")) == rows(oneShot))
    val more = (21 until 25).map { i =>
      (i.toLong, Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    }
    graft.streaming.PipelineStream.knnGraphBatchFold(
      more.toDF("vec_id", "embedding"), "vec_id", "embedding", codebook,
      k = 3, kNbrs = 2, basePath = s"$base/store", runId = 99L)
    val grown = graft.pipeline.Similarity.knnGraphTable(
      graft.pipeline.Similarity.ivfIndexTable(
        (all ++ more).toDF("vec_id", "embedding"), "vec_id", "embedding",
        codebook, 3), 2)
    assert(rows(graft.streaming.PipelineStream
      .readKnnGraph(spark, s"$base/store")) == rows(grown))
  }

  test("knnStoreDelete: survivors re-derive, singleton cell goes EMPTY (manifest, no stale fallback), lifecycle continues") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_knndel").toString
    val store = s"$base/store"
    // 3 well-separated clusters; seeds = ids 0,1,2 land one per cluster.
    // Cluster C has exactly TWO members (2, 9) — deleting 9 leaves a
    // singleton cell whose recompute is EMPTY while run 0 had rows.
    def v(c: Int, jit: Float) = Array.tabulate(4)(i =>
      (if (i == c) 10f else 0f) + (if (i == 3) jit else 0f))
    val pts = Seq(
      (0L, v(0, 0.1f)), (3L, v(0, 0.2f)), (6L, v(0, 0.3f)),
      (1L, v(1, 0.1f)), (4L, v(1, 0.2f)), (7L, v(1, 0.3f)),
      (2L, v(2, 0.1f)), (9L, v(2, 0.2f)))
    val df = pts.toDF("vec_id", "embedding").localCheckpoint()
    val codebook = graft.pipeline.Similarity.refinedCentroids(
      graft.pipeline.Similarity.kmeansStepExact(df, "vec_id", "embedding", k = 3))
      .localCheckpoint()
    graft.streaming.PipelineStream.knnGraphBatchFold(df, "vec_id",
      "embedding", codebook, k = 3, kNbrs = 2, basePath = store, runId = 0L)
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      d.select("cell", "id", "rank", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def oneShot(corpus: Seq[(Long, Array[Float])]) =
      rows(graft.pipeline.Similarity.knnGraphTable(
        graft.pipeline.Similarity.ivfIndexTable(
          corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
          codebook, 3), 2))
    graft.streaming.PipelineStream.knnStoreDelete(spark, store,
      Seq(9L).toDF("id"), kNbrs = 2, runId = 1L)
    val afterDel = rows(graft.streaming.PipelineStream
      .readKnnGraph(spark, store))
    assert(afterDel == oneShot(pts.filterNot(_._1 == 9L)), s"got $afterDel")
    // the singleton cell: id 2 has no rows and is nobody's neighbor —
    // the manifest prevented fallback to run 0's stale (2, 9) rows
    assert(!afterDel.exists(t => t._2 == 2L || t._4 == 2L))
    assert(!afterDel.exists(t => t._2 == 9L || t._4 == 9L))
    // lifecycle continues: a later batch repopulates the emptied cell
    val more = Seq((20L, v(2, 0.4f)), (21L, v(2, 0.5f)))
    graft.streaming.PipelineStream.knnGraphBatchFold(
      more.toDF("vec_id", "embedding"), "vec_id", "embedding", codebook,
      k = 3, kNbrs = 2, basePath = store, runId = 2L)
    val grown = oneShot(pts.filterNot(_._1 == 9L) ++ more)
    assert(rows(graft.streaming.PipelineStream.readKnnGraph(spark, store))
      == grown)
    // compaction applies + GCs the tombstones; readout unchanged
    graft.streaming.PipelineStream.compactKnnStore(spark, store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/deletes")))
    assert(rows(graft.streaming.PipelineStream.readKnnGraph(spark, store))
      == grown)
  }

  test("knnStoreIngest: two-source feed — deletes fold per batch, delete-then-insert-same-id survives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_knn2src").toString
    val store = s"$base/store"
    def v(c: Int, jit: Float) = Array.tabulate(4)(i =>
      (if (i == c) 10f else 0f) + (if (i == 3) jit else 0f))
    val pts = Seq(
      (0L, v(0, 0.1f)), (3L, v(0, 0.2f)), (6L, v(0, 0.3f)),
      (1L, v(1, 0.1f)), (4L, v(1, 0.2f)), (7L, v(1, 0.3f)),
      (2L, v(2, 0.1f)), (9L, v(2, 0.2f)))
    val codebook = graft.pipeline.Similarity.refinedCentroids(
      graft.pipeline.Similarity.kmeansStepExact(
        pts.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 3))
      .localCheckpoint()
    val memV = MemoryStream[(Long, Array[Float])]
    val memD = MemoryStream[Long]
    val q = graft.streaming.PipelineStream.knnStoreIngest(
      memV.toDS().toDF("vec_id", "embedding"), "vec_id", "embedding",
      memD.toDS().toDF("del_id"), "del_id", codebook, k = 3, kNbrs = 2,
      basePath = store)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      d.select("cell", "id", "rank", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def oneShot(corpus: Seq[(Long, Array[Float])]) =
      rows(graft.pipeline.Similarity.knnGraphTable(
        graft.pipeline.Similarity.ivfIndexTable(
          corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
          codebook, 3), 2))
    try {
      // batch: all adds
      memV.addData(pts); q.processAllAvailable()
      assert(rows(graft.streaming.PipelineStream.readKnnGraph(spark, store))
        == oneShot(pts))
      // batch: pure delete — 9 vanishes as node AND neighbor
      memD.addData(9L); q.processAllAvailable()
      val afterDel = rows(graft.streaming.PipelineStream.readKnnGraph(spark, store))
      assert(afterDel == oneShot(pts.filterNot(_._1 == 9L)))
      assert(!afterDel.exists(t => t._2 == 9L || t._4 == 9L))
      // batch: RE-INSERT the deleted id with a new vector — the
      // run-order-aware shadow must let it survive the old tombstone
      val nine2 = (9L, v(2, 0.6f))
      memV.addData(nine2); q.processAllAvailable()
      assert(rows(graft.streaming.PipelineStream.readKnnGraph(spark, store))
        == oneShot(pts.filterNot(_._1 == 9L) :+ nine2))
      // one batch carrying BOTH a delete and a re-add of the same id:
      // deletes apply first, so the re-add lands on the survivor store
      val two2 = (2L, v(2, 0.9f))
      memD.addData(2L); memV.addData(two2); q.processAllAvailable()
      val mixed = rows(graft.streaming.PipelineStream.readKnnGraph(spark, store))
      assert(mixed ==
        oneShot(pts.filterNot(p => p._1 == 9L || p._1 == 2L) :+ nine2 :+ two2),
        s"got $mixed")
    } finally q.stop()
    // compaction applies + GCs tombstones; readout unchanged, and the
    // consolidated index holds exactly the live ids (re-adds included)
    graft.streaming.PipelineStream.compactKnnStore(spark, store)
    assert(rows(graft.streaming.PipelineStream.readKnnGraph(spark, store))
      == oneShot(pts.filterNot(p => p._1 == 9L || p._1 == 2L) :+ (9L, v(2, 0.6f))
        :+ (2L, v(2, 0.9f))))
  }

  test("atomic store publish: readers see the old or the new generation, never a mix") {
    import spark.implicits._
    val PS = graft.streaming.PipelineStream
    val base = Files.createTempDirectory("graft_atomic").toString
    val store = s"$base/store"
    def v(c: Int, jit: Float) = Array.tabulate(4)(i =>
      (if (i == c) 10f else 0f) + (if (i == 3) jit else 0f))
    val pts = Seq(
      (0L, v(0, 0.1f)), (3L, v(0, 0.2f)), (6L, v(0, 0.3f)),
      (1L, v(1, 0.1f)), (4L, v(1, 0.2f)), (7L, v(1, 0.3f)))
    val codebook = graft.pipeline.Similarity.refinedCentroids(
      graft.pipeline.Similarity.kmeansStepExact(
        pts.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 2))
      .localCheckpoint()
    PS.knnGraphBatchFold(pts.take(3).toDF("vec_id", "embedding"), "vec_id",
      "embedding", codebook, k = 2, kNbrs = 2, basePath = store, runId = 0L)
    PS.knnGraphBatchFold(pts.drop(3).toDF("vec_id", "embedding"), "vec_id",
      "embedding", codebook, k = 2, kNbrs = 2, basePath = store, runId = 1L)
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      d.select("cell", "id", "rank", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val before = rows(PS.readKnnGraph(spark, store))
    assert(before.nonEmpty)
    // a DELIBERATELY DIFFERENT generation 1 (one extra vector) so old
    // and new readouts are distinguishable — planted dir by dir, the
    // exact on-disk states a compaction/reindex crash passes through
    val grown = pts :+ (9L, v(1, 0.4f))
    val newIdx = graft.pipeline.Similarity.ivfIndexTable(
      grown.toDF("vec_id", "embedding"), "vec_id", "embedding", codebook, 2)
      .localCheckpoint()
    val newGraph = graft.pipeline.Similarity.knnGraphTable(newIdx, 2)
      .localCheckpoint()
    val after = newGraph.select(col("cell"), col("id"), col("rank"),
      col("nbr")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(after != before)
    def readBoth(): (Set[(Long, Long, Long, Long)], Long) = {
      val g = rows(PS.readKnnGraph(spark, store))
      val n = PS.knnStoreQuery(spark, store,
        grown.toDF("vec_id", "embedding"), "vec_id", "embedding",
        codebook, k = 2, nProbe = 2, topK = 1).count()
      (g, n)
    }
    // boundary 1-3: generation dirs land one at a time, NO pointer yet
    // — every read still resolves the legacy store, whole
    newIdx.write.parquet(s"$store/index.g1/run=1")
    assert(readBoth()._1 == before, "index.g1 alone must be invisible")
    newGraph.write.parquet(s"$store/graph.g1/run=1")
    assert(readBoth()._1 == before, "graph.g1 without pointer must be invisible")
    newIdx.select(col("cell").cast("long").as("cell")).distinct()
      .write.parquet(s"$store/graphcells.g1/run=1")
    val (g3, n3) = readBoth()
    assert(g3 == before, "complete but uncommitted generation must be invisible")
    // RunIntegrity: the uncommitted generation reports as residue, the
    // legacy store reports clean rows
    val rep = graft.sources.RunIntegrity.validateStore(spark, store).collect()
      .map(r => (r.getString(1), r.getString(3), r.getString(4)))
    assert(rep.exists(r => r._1.contains("index.g1") && r._2 == "orphaned"
      && r._3.contains("unpublished generation")), rep.mkString("\n"))
    // THE commit boundary: one pointer file appears atomically
    val fsp = new org.apache.hadoop.fs.Path(store)
    val fs = fsp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(fsp, "CURRENT.1"), true)
    out.write("""{"gen":1}""".getBytes("UTF-8")); out.close()
    val (g4, n4) = readBoth()
    assert(g4 == after, "committed generation must serve whole")
    assert(n4 == grown.size.toLong)
    // post-commit: the legacy dirs are now superseded residue
    val rep2 = graft.sources.RunIntegrity.validateStore(spark, store).collect()
      .map(r => (r.getString(1), r.getString(3), r.getString(4)))
    assert(rep2.exists(r => r._1.endsWith("/index") && r._2 == "orphaned"
      && r._3.contains("superseded")), rep2.mkString("\n"))
    assert(!rep2.exists(r => r._1.contains("index.g1") && r._2 != "ok"),
      rep2.mkString("\n"))
  }

  test("compactKnnStore end-to-end under the pointer: commit, GC, crashed-attempt rerun") {
    import spark.implicits._
    val PS = graft.streaming.PipelineStream
    val base = Files.createTempDirectory("graft_atomic2").toString
    val store = s"$base/store"
    def v(c: Int, jit: Float) = Array.tabulate(4)(i =>
      (if (i == c) 10f else 0f) + (if (i == 3) jit else 0f))
    val pts = Seq(
      (0L, v(0, 0.1f)), (3L, v(0, 0.2f)), (6L, v(0, 0.3f)),
      (1L, v(1, 0.1f)), (4L, v(1, 0.2f)), (7L, v(1, 0.3f)))
    val codebook = graft.pipeline.Similarity.refinedCentroids(
      graft.pipeline.Similarity.kmeansStepExact(
        pts.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 2))
      .localCheckpoint()
    PS.knnGraphBatchFold(pts.take(3).toDF("vec_id", "embedding"), "vec_id",
      "embedding", codebook, k = 2, kNbrs = 2, basePath = store, runId = 0L)
    PS.knnGraphBatchFold(pts.drop(3).toDF("vec_id", "embedding"), "vec_id",
      "embedding", codebook, k = 2, kNbrs = 2, basePath = store, runId = 1L)
    PS.knnStoreDelete(spark, store, Seq(7L).toDF("id"), kNbrs = 2, runId = 2L)
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      d.select("cell", "id", "rank", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val before = rows(PS.readKnnGraph(spark, store))
    // a CRASHED earlier attempt left garbage inside the upcoming
    // generation — the rerun must clear it, not union it in
    Seq((99L, 5L)).toDF("a", "b").write.parquet(s"$store/index.g1/run=77")
    PS.compactKnnStore(spark, store)
    val fsp = new org.apache.hadoop.fs.Path(store)
    val fs = fsp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(fsp, "CURRENT.1")))
    // GC: legacy dirs and tombstones gone; crashed-attempt run gone
    for (d <- Seq("index", "graph", "graphcells", "deletes",
        "index.g1/run=77", "deletes.g1"))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(fsp, d)), s"$d survives")
    assert(rows(PS.readKnnGraph(spark, store)) == before)
    // lifecycle continues INTO the generation dirs; second compaction
    // advances the pointer and collects generation 1
    val more = Seq((20L, v(0, 0.4f)), (21L, v(0, 0.5f)))
    PS.knnGraphBatchFold(more.toDF("vec_id", "embedding"), "vec_id",
      "embedding", codebook, k = 2, kNbrs = 2, basePath = store, runId = 9L)
    val grown = rows(PS.readKnnGraph(spark, store))
    PS.compactBm25Store _ // (unused ref guard against typos)
    PS.compactKnnStore(spark, store)
    assert(fs.exists(new org.apache.hadoop.fs.Path(fsp, "CURRENT.2")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(fsp, "CURRENT.1")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(fsp, "index.g1")))
    assert(rows(PS.readKnnGraph(spark, store)) == grown)
    // the compacted store is CLEAN: integrity reports no non-ok rows
    val rep = graft.sources.RunIntegrity.validateStore(spark, store)
      .filter(col("status") =!= "ok").collect()
    assert(rep.isEmpty, rep.mkString("\n"))
  }

  test("snapshotRunStore/restoreRunStore: kNN store round trip — snapshot, mutate, atomic restore, lifecycle continues") {
    import spark.implicits._
    val PS = graft.streaming.PipelineStream
    val base = Files.createTempDirectory("graft_snaprt").toString
    val store = s"$base/store"
    def v(c: Int, jit: Float) = Array.tabulate(4)(i =>
      (if (i == c) 10f else 0f) + (if (i == 3) jit else 0f))
    val pts = Seq(
      (0L, v(0, 0.1f)), (3L, v(0, 0.2f)), (6L, v(0, 0.3f)),
      (1L, v(1, 0.1f)), (4L, v(1, 0.2f)), (7L, v(1, 0.3f)),
      (2L, v(2, 0.1f)), (9L, v(2, 0.2f)))
    val codebook = graft.pipeline.Similarity.refinedCentroids(
      graft.pipeline.Similarity.kmeansStepExact(
        pts.toDF("vec_id", "embedding"), "vec_id", "embedding", k = 3))
      .localCheckpoint()
    PS.knnGraphBatchFold(pts.take(4).toDF("vec_id", "embedding"), "vec_id",
      "embedding", codebook, k = 3, kNbrs = 2, basePath = store, runId = 0L)
    PS.knnGraphBatchFold(pts.drop(4).toDF("vec_id", "embedding"), "vec_id",
      "embedding", codebook, k = 3, kNbrs = 2, basePath = store, runId = 1L)
    PS.knnStoreDelete(spark, store, Seq(9L).toDF("id"), kNbrs = 2, runId = 2L)
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      d.select("cell", "id", "rank", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val before = rows(PS.readKnnGraph(spark, store))
    val snap = PS.snapshotRunStore(spark, store, "pre")
    assert(PS.listRunStoreSnapshots(spark, store) == Seq("pre"))
    // the snapshot reads DIRECTLY as a (legacy-layout) store — deletes
    // runs included, so the tombstone still shadows
    assert(rows(PS.readKnnGraph(spark, snap)) == before)
    // mutate the live store past recognition: another delete + compact
    // (the store advances to generation 1)
    PS.knnStoreDelete(spark, store, Seq(0L, 3L).toDF("id"), kNbrs = 2,
      runId = 3L)
    PS.compactKnnStore(spark, store)
    assert(rows(PS.readKnnGraph(spark, store)) != before)
    // atomic restore: publishes the snapshot as generation 2
    PS.restoreRunStore(spark, store, "pre")
    assert(rows(PS.readKnnGraph(spark, store)) == before)
    // the snapshot survives the restore's GC (hard links keep inodes)
    assert(rows(PS.readKnnGraph(spark, snap)) == before)
    // lifecycle continues above the restored max run id
    val more = Seq((20L, v(2, 0.4f)))
    PS.knnGraphBatchFold(more.toDF("vec_id", "embedding"), "vec_id",
      "embedding", codebook, k = 3, kNbrs = 2, basePath = store, runId = 9L)
    assert(rows(PS.readKnnGraph(spark, store)) ==
      rows(graft.pipeline.Similarity.knnGraphTable(
        graft.pipeline.Similarity.ivfIndexTable(
          (pts.filterNot(_._1 == 9L) ++ more).toDF("vec_id", "embedding"),
          "vec_id", "embedding", codebook, 3), 2)))
    // integrity: the restored store is clean (snapshots are hidden)
    val rep = graft.sources.RunIntegrity.validateStore(spark, store)
      .filter(col("status") =!= "ok").collect()
    assert(rep.isEmpty, rep.mkString("\n"))
  }

  test("snapshotRunStore: BM25 store and single-dir positional store round trips") {
    import spark.implicits._
    val PS = graft.streaming.PipelineStream
    // ---- BM25 store ----
    val base = Files.createTempDirectory("graft_snapbm").toString
    val store = s"$base/store"
    val docs = Seq((1L, "rare filler filler"), (2L, "rare extra extra"),
      (3L, "common filler filler"), (5L, "common common filler"))
    val df = docs.toDF("doc_id", "text")
    Seq(0, 1).foreach { r =>
      val part = df.filter($"doc_id" % 2 === r)
      graft.pipeline.TextAnalysis.bm25Postings(part, "doc_id", "text")
        .write.parquet(s"$store/postings/run=$r")
      graft.pipeline.TextAnalysis.bm25DocLens(part, "doc_id", "text")
        .write.parquet(s"$store/doclens/run=$r")
    }
    PS.bm25DeleteDocs(Seq(3L).toDF("id"), store, runId = 2L)
    def rks() = graft.pipeline.TextAnalysis.bm25TopKIndexed(
      PS.readBm25Postings(spark, store), PS.readBm25DocLens(spark, store),
      "rare common", k = 6).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val before = rks()
    PS.snapshotRunStore(spark, store, "nightly")
    // mutate: delete another doc AND compact (generation advances)
    PS.bm25DeleteDocs(Seq(1L).toDF("id"), store, runId = 3L)
    PS.compactBm25Store(spark, store)
    assert(rks() != before)
    PS.restoreRunStore(spark, store, "nightly")
    assert(rks() == before)

    // ---- single-dir positional postings store ----
    val pbase = Files.createTempDirectory("graft_snappos").toString
    val pstore = s"$pbase/postings"
    val pdocs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
    graft.pipeline.TextAnalysis.appendPositionalPostings(
      pdocs.toDF("doc_id", "text"), "doc_id", "text", pstore, runTag = "0")
    // compact first so the snapshot carries a NON-NUMERIC run tag (the
    // max-run-id cut must include it)
    graft.pipeline.TextAnalysis.compactPositionalPostings(spark, pstore)
    def phrase() = graft.pipeline.TextAnalysis.phraseMatchesIndexed(
      spark.read.parquet(pstore), "beta gamma").collect()
      .map(_.getLong(0)).sorted.toSeq
    val pBefore = phrase()
    assert(pBefore == Seq(1L, 2L))
    PS.snapshotRunStore(spark, pstore, "pre")
    graft.pipeline.TextAnalysis.appendPositionalPostings(
      Seq((9L, "beta gamma")).toDF("doc_id", "text"), "doc_id", "text",
      pstore, runTag = "9")
    assert(phrase() == Seq(1L, 2L, 9L))
    PS.restoreRunStore(spark, pstore, "pre")
    assert(phrase() == pBefore)
    // compaction must CARRY the snapshots across its whole-base swap
    // (ADVICE r18: the retire-rename used to take _snapshots with it and
    // the delete-last step destroyed every backup)
    graft.pipeline.TextAnalysis.appendPositionalPostings(
      Seq((9L, "beta gamma")).toDF("doc_id", "text"), "doc_id", "text",
      pstore, runTag = "9")
    graft.pipeline.TextAnalysis.compactPositionalPostings(spark, pstore)
    assert(PS.listRunStoreSnapshots(spark, pstore) == Seq("pre"),
      "compaction must not destroy the store's snapshots")
    assert(phrase() == Seq(1L, 2L, 9L))
    PS.restoreRunStore(spark, pstore, "pre")
    assert(phrase() == pBefore,
      "post-compaction restore from the carried snapshot")
    // crash-after-publish residue: snapshots stranded in <base>__old must
    // be visible to list/restore WITHOUT running a compaction first
    val pfs = new org.apache.hadoop.fs.Path(pstore)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val strandedOld = new org.apache.hadoop.fs.Path(pstore + "__old")
    pfs.mkdirs(strandedOld)
    assert(pfs.rename(new org.apache.hadoop.fs.Path(pstore, "_snapshots"),
      new org.apache.hadoop.fs.Path(strandedOld, "_snapshots")))
    assert(PS.listRunStoreSnapshots(spark, pstore) == Seq("pre"),
      "stranded snapshots must be adopted, not invisible")
    PS.restoreRunStore(spark, pstore, "pre")
    assert(phrase() == pBefore, "restore from the adopted snapshot")
    assert(pfs.exists(strandedOld),
      "adoption moves only the snapshots; __old residue stays for the heal")

    // ---- plain-reader census store: restore must NOT commit a pointer
    // (readNgramCensus opens the plain dir name) — retire-and-link path
    val cbase = Files.createTempDirectory("graft_snapcen").toString
    val cstore = s"$cbase/store"
    val cdocs = Seq((1L, "a b c a b"), (2L, "b c d")).toDF("doc_id", "text")
    def crun(f: org.apache.spark.sql.DataFrame, id: Long): Unit =
      graft.pipeline.TextAnalysis.ngramStatsTable(f, "doc_id", "text", 1)
        .write.mode("overwrite").parquet(s"$cstore/census/run=$id")
    crun(cdocs.filter($"doc_id" === 1L), 0L)
    crun(cdocs.filter($"doc_id" === 2L), 1L)
    def census() = PS.readNgramCensus(spark, cstore).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val cBefore = census()
    PS.snapshotRunStore(spark, cstore, "pre")
    crun(cdocs.filter($"doc_id" === 2L), 2L) // double-count corruption
    assert(census() != cBefore)
    PS.restoreRunStore(spark, cstore, "pre")
    assert(census() == cBefore)
    val cfs = new org.apache.hadoop.fs.Path(cstore)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(cfs.exists(new org.apache.hadoop.fs.Path(s"$cstore/census")),
      "plain-reader store must keep its plain dir")
    assert(!cfs.exists(new org.apache.hadoop.fs.Path(s"$cstore/CURRENT.1")),
      "plain-reader restore must not commit a pointer")
  }

  test("reindexKnnStore: live store re-assigns under a new codebook; lifecycle continues; guard prices the rebuild") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_knnre").toString
    val store = s"$base/store"
    def v(c: Int, jit: Float) = Array.tabulate(4)(i =>
      (if (i == c) 10f else 0f) + (if (i == 3) jit else 0f))
    val pts = Seq(
      (0L, v(0, 0.1f)), (3L, v(0, 0.2f)), (6L, v(0, 0.3f)),
      (1L, v(1, 0.1f)), (4L, v(1, 0.2f)), (7L, v(1, 0.3f)),
      (2L, v(2, 0.1f)), (9L, v(2, 0.2f)))
    val df = pts.toDF("vec_id", "embedding").localCheckpoint()
    // fold era: a COARSE k=2 codebook trained on clusters 0/1 only
    val oldCb = graft.pipeline.Similarity.refinedCentroids(
      graft.pipeline.Similarity.kmeansStepExact(
        df.filter($"vec_id" % 3 =!= 2), "vec_id", "embedding", k = 2))
      .localCheckpoint()
    graft.streaming.PipelineStream.knnGraphBatchFold(df, "vec_id",
      "embedding", oldCb, k = 2, kNbrs = 2, basePath = store, runId = 0L)
    graft.streaming.PipelineStream.knnStoreDelete(spark, store,
      Seq(9L).toDF("id"), kNbrs = 2, runId = 1L)
    // reindex under the full k=3 codebook: survivors re-assign, graph
    // rebuilds, tombstones GC
    val newCb = graft.pipeline.Similarity.refinedCentroids(
      graft.pipeline.Similarity.kmeansStepExact(df, "vec_id", "embedding",
        k = 3)).localCheckpoint()
    graft.streaming.PipelineStream.reindexKnnStore(spark, store, newCb,
      k = 3, kNbrs = 2)
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      d.select("cell", "id", "rank", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    def oneShot(corpus: Seq[(Long, Array[Float])]) =
      rows(graft.pipeline.Similarity.knnGraphTable(
        graft.pipeline.Similarity.ivfIndexTable(
          corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
          newCb, 3), 2))
    val survivors = pts.filterNot(_._1 == 9L)
    assert(rows(graft.streaming.PipelineStream.readKnnGraph(spark, store))
      == oneShot(survivors))
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/deletes")))
    // lifecycle continues under the NEW codebook with larger run ids
    val more = Seq((20L, v(2, 0.4f)), (21L, v(2, 0.5f)))
    graft.streaming.PipelineStream.knnGraphBatchFold(
      more.toDF("vec_id", "embedding"), "vec_id", "embedding", newCb,
      k = 3, kNbrs = 2, basePath = store, runId = 9L)
    assert(rows(graft.streaming.PipelineStream.readKnnGraph(spark, store))
      == oneShot(survivors ++ more))
    // the ONLINE query path with the live residents reproduces the
    // standing graph readout exactly (p303's law)
    val viaQuery = graft.streaming.PipelineStream.knnStoreQuery(spark,
      store, (survivors ++ more).toDF("vec_id", "embedding"), "vec_id",
      "embedding", newCb, k = 3, nProbe = 1, topK = 2, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaQuery == rows(graft.streaming.PipelineStream
      .readKnnGraph(spark, store)).map(t => (t._2, t._3, t._4)),
      s"query path diverged: $viaQuery")
    // an EXTERNAL query vector (not indexed) probes its nearest cell
    val ext = graft.streaming.PipelineStream.knnStoreQuery(spark, store,
      Seq((99L, v(2, 0.15f))).toDF("vec_id", "embedding"), "vec_id",
      "embedding", newCb, k = 3, nProbe = 3, topK = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(ext.length == 1 && ext.head._1 == 99L, ext.mkString(","))
    // reindexing INTO a too-coarse codebook trips the occupancy guard
    val boom = intercept[IllegalArgumentException] {
      graft.streaming.PipelineStream.reindexKnnStore(spark, store,
        newCb.filter($"cluster" === 0), k = 1, kNbrs = 2, maxPairs = 10L)
    }
    assert(boom.getMessage.contains("maxPairs"), boom.getMessage)
  }

  test("bm25StoreIngest: two-source feed — survivor stats per batch, delete-then-reinsert serves the NEW text") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_bm252src").toString
    val store = s"$base/store"
    val memD = MemoryStream[(Long, String)]
    val memX = MemoryStream[Long]
    val q = graft.streaming.PipelineStream.bm25StoreIngest(
      memD.toDS().toDF("doc_id", "text"), "doc_id", "text",
      memX.toDS().toDF("del_id"), "del_id", basePath = store)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    def keyed(d: org.apache.spark.sql.DataFrame) =
      d.select("term", "id", "tf", "len").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    def lens(d: org.apache.spark.sql.DataFrame) =
      d.select("id", "len").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def liveRows(): (Set[(String, Long, Long, Long)], Set[(Long, Long)]) = (
      keyed(graft.streaming.PipelineStream.readBm25Postings(spark, store)),
      lens(graft.streaming.PipelineStream.readBm25DocLens(spark, store)))
    def batchRows(docs: Seq[(Long, String)]) = (
      keyed(graft.pipeline.TextAnalysis.bm25Postings(
        docs.toDF("doc_id", "text"), "doc_id", "text")),
      lens(graft.pipeline.TextAnalysis.bm25DocLens(
        docs.toDF("doc_id", "text"), "doc_id", "text")))
    val d1 = Seq((1L, "rare words here"), (2L, "common words twice twice"),
      (3L, "common filler"))
    try {
      memD.addData(d1: _*); q.processAllAvailable()
      assert(liveRows() == batchRows(d1))
      // delete doc 2: postings AND doc-lens drop it (N, df post-delete)
      memX.addData(2L); q.processAllAvailable()
      assert(liveRows() == batchRows(d1.filterNot(_._1 == 2L)))
      // re-insert doc 2 with NEW text in a later batch: the run-order-
      // aware shadow serves the new rows, not the tombstone
      val d2new = (2L, "fresh replacement text")
      memD.addData(d2new); q.processAllAvailable()
      assert(liveRows() == batchRows(d1.filterNot(_._1 == 2L) :+ d2new))
      // same-batch delete + re-add of one id: deletes apply first
      val d3new = (3L, "rewritten third doc")
      memX.addData(3L); memD.addData(d3new); q.processAllAvailable()
      val expect = Seq(d1.head, d2new, d3new)
      assert(liveRows() == batchRows(expect))
    } finally q.stop()
    // compaction (writer stopped) applies + GCs; readout unchanged
    graft.streaming.PipelineStream.compactBm25Store(spark, store)
    assert(liveRows() == batchRows(Seq(d1.head,
      (2L, "fresh replacement text"), (3L, "rewritten third doc"))))
  }

  test("bm25 tombstones: masked readout ≡ survivor scorer; compaction GCs the tombstones") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_bm25del").toString
    val store = s"$base/store"
    val docs = Seq(
      (1L, "rare filler filler filler"),
      (2L, "rare filler filler filler extra extra extra extra"),
      (3L, "common filler filler filler"),
      (4L, ""), // token-less: its doc-lens row weights N until deleted
      (5L, "common common filler filler"),
      (6L, "common pad pad pad"))
    val df = docs.toDF("doc_id", "text")
    Seq(0, 1).foreach { r =>
      val part = df.filter($"doc_id" % 2 === r)
      graft.pipeline.TextAnalysis.bm25Postings(part, "doc_id", "text")
        .write.parquet(s"$store/postings/run=$r")
      graft.pipeline.TextAnalysis.bm25DocLens(part, "doc_id", "text")
        .write.parquet(s"$store/doclens/run=$r")
    }
    graft.streaming.PipelineStream.bm25DeleteDocs(
      Seq(3L, 4L).toDF("id"), store, runId = 2L)
    def rks(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    def masked() = rks(graft.pipeline.TextAnalysis.bm25TopKIndexed(
      graft.streaming.PipelineStream.readBm25Postings(spark, store),
      graft.streaming.PipelineStream.readBm25DocLens(spark, store),
      "rare common", k = 6))
    // ≡ the ad-hoc scorer over the survivors: N, T, df, idf all
    // post-delete (doc 4's token-less doc-lens row must drop too)
    val adhoc = rks(graft.pipeline.TextAnalysis.bm25TopK(
      df.filter(!$"doc_id".isin(3L, 4L)), "doc_id", "text",
      "rare common", k = 6))
    assert(masked() == adhoc, s"${masked()} vs $adhoc")
    // compaction: live rows consolidate, tombstones GC'd, readout fixed
    graft.streaming.PipelineStream.compactBm25Store(spark, store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$store/deletes")))
    def sub(n: String) =
      graft.streaming.PipelineStream.resolveSubPath(spark, store, n)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(sub("deletes"))))
    assert(spark.read.parquet(sub("postings"))
      .select($"run").distinct().count() == 1L)
    assert(spark.read.parquet(sub("doclens"))
      .filter($"id".isin(3L, 4L)).isEmpty)
    assert(masked() == adhoc)
  }

  test("ngramCensusIngest: per-batch census runs sum to the batch table; top-k readout matches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_census").toString
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.PipelineStream.ngramCensusIngest(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text", 3, s"$base/store")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val docs = (0L until 12L).map(i =>
      (i, Seq.fill(4)(s"w${i % 3}").mkString(" ") + " shared tail gram"))
    try {
      docs.grouped(6).foreach { g => mem.addData(g); q.processAllAvailable() }
    } finally q.stop()
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val standing = graft.streaming.PipelineStream
      .readNgramCensus(spark, s"$base/store")
    assert(m(standing) == m(graft.pipeline.TextAnalysis.ngramStatsTable(
      docs.toDF("doc_id", "text"), "doc_id", "text", 3)))
    assert(m(graft.pipeline.TextAnalysis.ngramTopK(standing, 3))
      == m(graft.pipeline.TextAnalysis.ngramStats(
        docs.toDF("doc_id", "text"), "doc_id", "text", 3, 3)))
  }

  test("zorderedIngest: batches flush as z-ordered runs; seek equals filter; per-run files prune") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_zingest").toString
    val mem = MemoryStream[(Long, Long, Long)]
    val in = mem.toDS().toDF("u", "t", "id")
    // 8 files per run: repartitionByRange RESAMPLES bounds per
    // execution, so per-file coverage jitters — at 4 files/run the
    // pruning assertion's margin was one boundary file wide and flaked
    val q = graft.sources.ZOrder
      .zorderedIngest(in, s"$base/store", col("u"), col("t"), 8)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val rnd = new scala.util.Random(7)
    val rows = (0 until 20000).map(i =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong, i.toLong))
    try {
      rows.grouped(10000).foreach { g => mem.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val store = spark.read.parquet(s"$base/store")
    // two micro-batches → two independent z-ordered runs
    assert(store.select($"run").distinct().count() == 2L)
    assert(store.count() == 20000L)
    // the zRangeScan seek over the MULTI-RUN store equals the plain 2-D
    // filter — run is just a partition column; pruning composes per run
    val scanned = graft.sources.ZOrder
      .zRangeScan(spark, s"$base/store", 256L, 511L, 256L, 511L)
      .select($"id")
    val plain = store.filter($"u".between(256L, 511L) && $"t".between(256L, 511L))
      .select($"id")
    assert(scanned.exceptAll(plain).count() == 0L)
    assert(plain.exceptAll(scanned).count() == 0L)
    // per-run file skipping: within EACH run, files whose zkey min/max
    // miss every planner range are skippable — the rectangle is 1/16 of
    // the key space, so well under half the files survive
    val ranges = graft.sources.ZOrder.mergeRanges(
      graft.sources.ZOrder.zRanges(256L, 511L, 256L, 511L), 64)
    val boxes = store
      .groupBy(input_file_name().as("f"))
      .agg(min($"zkey").as("zl"), max($"zkey").as("zh"))
      .collect()
    val touched = boxes.count(r => ranges.exists { case (l, h) =>
      r.getAs[Long]("zl") <= h && r.getAs[Long]("zh") >= l })
    assert(boxes.length >= 6, s"only ${boxes.length} files — runs did not split")
    assert(touched * 2 < boxes.length,
      s"zkey seek touched $touched of ${boxes.length} run files — no pruning")
  }

  test("triangleMaintainIngest: maintained artifact equals full recompute; dups absorbed; versions GC'd") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_tmaint").toString
    val mem = MemoryStream[(Long, Long)]
    val in = mem.toDS().toDF("s", "d")
    val q = graft.operators.EventOps
      .triangleMaintainIngest(in, s"$base/store", "s", "d")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    // three batches with cross-batch duplicate edges, reversals, a
    // self-loop, and triangles that only close across batches
    val b1 = Seq((1L, 2L), (1L, 3L), (4L, 5L), (7L, 8L))
    val b2 = Seq((2L, 3L), (3L, 1L), (5L, 5L), (8L, 9L), (4L, 6L))
    val b3 = Seq((5L, 6L), (7L, 9L), (1L, 2L), (10L, 11L))
    try {
      Seq(b1, b2, b3).foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = graft.operators.EventOps.readTriangleCounts(spark, s"$base/store")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = graft.operators.EventOps.triangleCounts(
      (b1 ++ b2 ++ b3).toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want, s"maintained ≠ recompute: $got vs $want")
    assert(got.values.map(_._2).sum > 0, "no triangles closed across batches")
    // GC keeps at most the current version and its replay predecessor
    val vs = new java.io.File(s"$base/store/counts").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(vs.length <= 2 && vs.nonEmpty, s"count versions on disk: $vs")
  }

  test("clusterMaintainIngest: streamed pair folds equal full closure; labels-only store; versions GC'd") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_cmaint").toString
    val mem = MemoryStream[(Long, Long)]
    val in = mem.toDS().toDF("ia", "ib")
    val q = graft.streaming.PipelineStream
      .clusterMaintainIngest(in, s"$base/store")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    // components that only connect ACROSS batches + duplicates + a
    // cross-batch 3-way merge through the rep graph
    val b1 = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val b2 = Seq((2L, 3L), (11L, 20L), (30L, 31L), (1L, 2L))
    val b3 = Seq((3L, 10L), (40L, 41L), (21L, 40L))
    try {
      Seq(b1, b2, b3).foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = graft.streaming.PipelineStream
      .readClusterLabels(spark, s"$base/store")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.pipeline.Dedup.connectedComponents(
      (b1 ++ b2 ++ b3).toDF("ia", "ib"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"stream ≠ full: $got vs $want")
    assert(got(41L) == 1L && got(30L) == 30L)
    // labels-only store (no pair runs kept) and ≤2 versions survive GC
    val dirs = new java.io.File(s"$base/store").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs == Seq("labels"), s"store dirs: $dirs")
    val vs = new java.io.File(s"$base/store/labels").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(vs.length <= 2 && vs.nonEmpty, s"label versions on disk: $vs")
  }

  test("zorderedIngestCompacting: in-loop compaction folds runs mid-stream; data exact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("graft_zingestc").toString
    val mem = MemoryStream[(Long, Long, Long)]
    val in = mem.toDS().toDF("u", "t", "id")
    val q = graft.sources.ZOrder
      .zorderedIngestCompacting(in, s"$base/store", col("u"), col("t"),
        filesPerRun = 2, compactAtRuns = 3, targetFileBytes = 1L << 20)
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    val rnd = new scala.util.Random(11)
    val rows = (0 until 6000).map(i =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong, i.toLong))
    try {
      // 6 micro-batches of 1000 — the threshold-3 compactor must fire at
      // least twice along the way
      rows.grouped(1000).foreach { g => mem.addData(g); q.processAllAvailable() }
    } finally q.stop()
    val store = spark.read.parquet(s"$base/store")
    // every row survives flush ∘ compaction cycles exactly once
    assert(store.count() == 6000L)
    assert(store.select($"id").distinct().count() == 6000L)
    // compaction really folded: far fewer runs than the 6 batches, and
    // at least one surviving run is a compacted (negative-id) one
    // `run` is a discovered partition column — inferred INT when values
    // fit; cast for a stable read
    val runs = store.select($"run".cast("long")).distinct().collect()
      .map(_.getLong(0))
    assert(runs.length < 4, s"runs ${runs.toSeq.sorted} — compactor never fired")
    assert(runs.exists(_ < 0L), s"no compacted run among ${runs.toSeq.sorted}")
    // and the seek still equals the plain filter over the folded store
    val scanned = graft.sources.ZOrder
      .zRangeScan(spark, s"$base/store", 0L, 255L, 0L, 255L).select($"id")
    val plain = store.filter($"u" <= 255L && $"t" <= 255L).select($"id")
    assert(scanned.exceptAll(plain).count() == 0L)
    assert(plain.exceptAll(scanned).count() == 0L)
  }
}
