package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Cell
import graft.sources.CellEncodings
import graft.streaming.CellStream

/** Streaming ingest benchmark: drives the mutation stream → sorted-run
  * flush path (memtable→SSTable analog) with arriving file batches and
  * reports sustained rows/sec plus per-micro-batch latency percentiles
  * from StreamingQueryProgress — the numbers SCALE.md cites for the
  * Structured Streaming extension (SURVEY §8.10).
  *
  * Prints ONE JSON line like Bench.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val dir = Files.createTempDirectory("graft_streambench").toString
    val stage = s"$dir/incoming"
    val store = s"$dir/store"
    new java.io.File(stage).mkdirs()

    val nBatches = 5
    // pre-materialize arrival batches (staged OUTSIDE the timed window)
    val cells = CellEncodings.eventsCells(spark, sfDir)
    val total = cells.count()
    (0 until nBatches).foreach { i =>
      cells.filter(pmod(col("ts"), lit(nBatches)) === i)
        .write.mode("overwrite").parquet(s"$dir/batch_$i")
    }

    val stream = spark.readStream.schema(Cell.schema).parquet(stage)
    val q = CellStream.writeToStore(stream, store, s"$dir/ckpt").start()

    val t0 = System.nanoTime()
    (0 until nBatches).foreach { i =>
      // batch arrival = atomic move of the staged files into the source dir
      val src = new java.io.File(s"$dir/batch_$i")
      src.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(stage, s"b${i}_${f.getName}"))
      }
      q.processAllAvailable()
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    q.stop()

    val stored = spark.read.parquet(store).count()
    assert(stored == total, s"streamed $stored of $total cells")

    val durs = q.recentProgress.toSeq
      .filter(_.numInputRows > 0).map(_.batchDuration.toDouble).sorted
    // nearest-rank percentile: ceil(p*N)-1 on the ascending list
    def pct(p: Double): Double =
      if (durs.isEmpty) 0
      else durs(math.max(0, math.min(durs.size - 1, math.ceil(p * durs.size).toInt - 1)))
    // the reference's per-operator latency surface (EstimatedHistogram):
    // geometric buckets, constant memory however many batches run — the
    // estimates sit within one ~20% bucket of the exact ranks above
    val hist = new graft.util.EstimatedHistogram
    durs.foreach(d => hist.add(math.max(1L, d.toLong)))

    val rate = total / elapsed

    // Stateful leg: the same cell stream through latestPerKey
    // (flatMapGroupsWithState LWW state — the memtable-resolve path),
    // feeding a memory sink. State size is bounded by live keys.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Cell]
    val stateQ = graft.streaming.CellStream.latestPerKey(mem.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_streambench_state")
      .option("checkpointLocation", s"$dir/ckpt_state").start()
    val allCells = cells.as[Cell].collect()
    // optional ingest throttle (utils/RateControl.java analog — the
    // reference caps stream-IN rate the same way): one control() per
    // fed BATCH; off unless the env sets a positive batches/sec limit
    val throttle = sys.env.get("SPARK_GRAFT_INGEST_BATCHES_SEC")
      .map(_.toInt).filter(_ > 0).map(new graft.util.RateControl(_))
    val t1 = System.nanoTime()
    allCells.grouped((allCells.length + nBatches - 1) / nBatches).foreach { b =>
      throttle.foreach(_.control())
      mem.addData(b.toIndexedSeq)
      stateQ.processAllAvailable()
    }
    val stateElapsed = (System.nanoTime() - t1) / 1e9
    stateQ.stop()
    val stateRate = total / stateElapsed
    // correctness guard (like the flush leg's stored==total): every input
    // key must have produced at least one state-resolved emission
    val emittedKeys = spark.table("graft_streambench_state")
      .select("key").distinct().count()
    val inputKeys = allCells.map(_.key).distinct.length
    assert(emittedKeys == inputKeys,
      s"stateful leg emitted $emittedKeys keys of $inputKeys")

    // Dedup leg: documents through the streaming first-seen-wins exact
    // dedup (dropDuplicates fingerprint state — the ingestion-gating
    // PipelineStream path). Docs stream in batches with a planted full
    // duplicate of every batch (each batch sent twice), so the state is
    // genuinely exercised: exactly half the arrivals must be dropped.
    val memD = MemoryStream[(Long, String)]
    val dedupQ = graft.streaming.PipelineStream.dedupExact(
        memD.toDS().toDF("doc_id", "text"), "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_streambench_dedup")
      .option("checkpointLocation", s"$dir/ckpt_dedup").start()
    val docs = CellEncodings.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val t2 = System.nanoTime()
    docs.grouped((docs.length + nBatches - 1) / nBatches).foreach { b =>
      memD.addData(b.toIndexedSeq)
      memD.addData(b.map { case (id, t) => (id + 1000000L, t) }.toIndexedSeq) // dup wave
      dedupQ.processAllAvailable()
    }
    val dedupElapsed = (System.nanoTime() - t2) / 1e9
    dedupQ.stop()
    val dedupIn = docs.length * 2L
    val dedupRate = dedupIn / dedupElapsed
    // Locale.ROOT mirrors Spark's locale-independent lower() — the default-
    // locale overload diverges on e.g. Turkish dotted-I
    val distinctTexts = docs.map(d =>
      d._2.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim).distinct.length
    val dedupOut = spark.table("graft_streambench_dedup").count()
    assert(dedupOut == distinctTexts,
      s"streaming dedup emitted $dedupOut of $distinctTexts distinct docs")

    // Near-dup leg: documents through the watermark-bounded streaming
    // MinHash-LSH (the unbounded-feed configuration — band-bucket state
    // evicted behind the watermark). Event time advances one hour per
    // batch with a 30-minute delay; the watermark LAGS one batch (it is
    // computed from the previous batch's max event time), so state holds
    // ~2 batches of buckets and ADJACENT-batch pairs are still found —
    // only pairs two or more batches apart are out of reach. This
    // measures the steady-state per-batch signature+match cost.
    val memN = MemoryStream[(Long, String, java.sql.Timestamp)]
    val nearQ = graft.streaming.PipelineStream.nearDupPairsWithinWatermark(
        memN.toDS().toDF("doc_id", "text", "ets"), "doc_id", "text",
        "ets", "30 minutes", n = 3, numHashes = 16, bands = 4, num = 4, den = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_streambench_neardup")
      .option("checkpointLocation", s"$dir/ckpt_neardup").start()
    val t3 = System.nanoTime()
    var batchIdx = 0
    docs.grouped((docs.length + nBatches - 1) / nBatches).foreach { b =>
      val ts = new java.sql.Timestamp(1700000000000L + batchIdx * 3600000L)
      memN.addData(b.map { case (id, t) => (id, t, ts) }.toIndexedSeq)
      nearQ.processAllAvailable()
      batchIdx += 1
    }
    val nearElapsed = (System.nanoTime() - t3) / 1e9
    val nearState = nearQ.lastProgress.stateOperators(0).numRowsTotal
    nearQ.stop()
    val nearPairs = spark.table("graft_streambench_neardup")
      .select("ia", "ib").distinct().count()
    val nearRate = docs.length / nearElapsed
    assert(nearPairs > 0, "planted near-dups in documents must be found in-window")

    // Sessionize leg: the events table through native session_window
    // (CellStream.sessionize), fed in event-time order so the watermark
    // advances every batch and sessions close progressively — the
    // steady-state cost of merging-session state. Two sentinels close the
    // trailing sessions; the guard pins the emitted count to the batch
    // gaps-and-islands session count (q22 logic).
    val memS = MemoryStream[(Long, Long)]
    val sessQ = CellStream.sessionize(memS.toDS().toDF("user_id", "ts"),
        gapMicros = 1800000000L, watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_streambench_sessions")
      .option("checkpointLocation", s"$dir/ckpt_sess").start()
    val events = CellEncodings.table(spark, sfDir, "events")
      .select(col("user_id").cast("long"), col("ts").cast("long"))
      .orderBy("ts").as[(Long, Long)].collect()
    val maxEvTs = events.last._2
    val t4 = System.nanoTime()
    events.grouped((events.length + nBatches - 1) / nBatches).foreach { b =>
      memS.addData(b.toIndexedSeq)
      sessQ.processAllAvailable()
    }
    memS.addData((-1L, maxEvTs + 48L * 3600L * 1000000000L))
    sessQ.processAllAvailable()
    memS.addData((-1L, maxEvTs + 96L * 3600L * 1000000000L))
    sessQ.processAllAvailable()
    val sessElapsed = (System.nanoTime() - t4) / 1e9
    val sessState = sessQ.lastProgress.stateOperators(0).numRowsTotal
    sessQ.stop()
    val sessionsOut = spark.table("graft_streambench_sessions")
      .filter(col("user_id") >= 0L).count()
    val batchSessions = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tus")
      CellEncodings.table(spark, sfDir, "events")
        .select(col("user_id"), expr("ts div 1000").as("tus"))
        .withColumn("brk", when(lag(col("tus"), 1).over(w).isNull ||
          col("tus") - lag(col("tus"), 1).over(w) > 1800000000L, 1).otherwise(0))
        .agg(sum(col("brk"))).head().getLong(0)
    }
    assert(sessionsOut == batchSessions,
      s"streamed $sessionsOut sessions, batch computes $batchSessions")
    val sessRate = events.length / sessElapsed

    // Out-of-order variant: the same events with seeded positional jitter
    // (displacement ≤ 1/8 of a batch), under a watermark that covers one
    // batch's time span — the bounded-disorder contract. The result must
    // STILL equal the batch computation exactly: late-but-in-watermark
    // events merge into (or bridge) their sessions in state.
    val spanNs = events.last._2 - events.head._2
    val batchLen = (events.length + nBatches - 1) / nBatches
    val rndJ = new scala.util.Random(7)
    val jittered = events.zipWithIndex
      .map { case (e, i) => (e, i + rndJ.nextInt(batchLen / 4 + 1) - batchLen / 8) }
      .sortBy(_._2).map(_._1)
    val memO = MemoryStream[(Long, Long)]
    val oooQ = CellStream.sessionize(memO.toDS().toDF("user_id", "ts"),
        gapMicros = 1800000000L,
        watermark = s"${spanNs / nBatches / 1000L + 3600000000L} microseconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_streambench_sessions_ooo")
      .option("checkpointLocation", s"$dir/ckpt_sess_ooo").start()
    val t5 = System.nanoTime()
    jittered.grouped(batchLen).foreach { b =>
      memO.addData(b.toIndexedSeq)
      oooQ.processAllAvailable()
    }
    memO.addData((-1L, maxEvTs + 480L * 3600L * 1000000000L))
    oooQ.processAllAvailable()
    memO.addData((-1L, maxEvTs + 960L * 3600L * 1000000000L))
    oooQ.processAllAvailable()
    val oooElapsed = (System.nanoTime() - t5) / 1e9
    oooQ.stop()
    val oooSessions = spark.table("graft_streambench_sessions_ooo")
      .filter(col("user_id") >= 0L).count()
    assert(oooSessions == batchSessions,
      s"out-of-order streamed $oooSessions sessions, batch computes $batchSessions")
    val oooRate = events.length / oooElapsed

    // Streaming interval join leg (round 11): session intervals + the
    // error feed through the NATIVE stream-stream bin join
    // (intervalJoinStream), both feeds in time order so the declared
    // range condition evicts state as the watermark advances. The match
    // count is pinned to the batch interval×point join's total.
    val ivRows = graft.operators.EventOps.sessionIntervals(
        CellEncodings.table(spark, sfDir, "events")
          .select(col("user_id"), expr("ts div 1000").as("tus"),
            col("event_type")),
        "user_id", "tus", "event_type", gap = 1800000000L)
      .select(col("user"), col("sid"), col("start"), col("end"))
      .orderBy("start").as[(Long, Long, Long, Long)].collect()
    val ptRows = CellEncodings.table(spark, sfDir, "events")
      .filter(col("event_type") === "error")
      .select(expr("ts div 1000").as("tus")).orderBy("tus")
      .as[Long].collect()
    val memI = MemoryStream[(Long, Long, Long, Long)]
    val memP = MemoryStream[Long]
    val ivjQ = graft.streaming.PipelineStream.intervalJoinStream(
        memI.toDS().toDF("user", "sid", "start", "end"),
        memP.toDS().toDF("t"), Seq("user", "sid"), "start", "end", "t",
        binSize = 3600000000L, maxIntervalMicros = 7L * 86400000000L,
        watermark = "2 hours")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_streambench_ivjoin")
      .option("checkpointLocation", s"$dir/ckpt_ivj").start()
    val t6 = System.nanoTime()
    // max(1, …): grouped(0) throws on an empty feed (a dataset with no
    // error events must degrade to a zero-match leg, not kill the bench
    // before its single JSON line prints)
    val ivSlices = ivRows.grouped(math.max(1, (ivRows.length + 4) / 5)).toSeq
    val ptSlices = ptRows.grouped(math.max(1, (ptRows.length + 4) / 5)).toSeq
    (0 until 5).foreach { i =>
      ivSlices.lift(i).foreach(b => memI.addData(b.toIndexedSeq))
      ptSlices.lift(i).foreach(b => memP.addData(b.toIndexedSeq))
      ivjQ.processAllAvailable()
    }
    val ivjElapsed = (System.nanoTime() - t6) / 1e9
    val ivjState = ivjQ.lastProgress.stateOperators.map(_.numRowsTotal).sum
    ivjQ.stop()
    val ivjMatches = spark.table("graft_streambench_ivjoin").count()
    val batchMatches = graft.operators.EventOps.intervalPointCount(
        ivRows.toSeq.toDF("user", "sid", "start", "end"), Seq("user", "sid"),
        "start", "end", ptRows.toSeq.toDF("t"), "t", binSize = 3600000000L)
      .agg(coalesce(sum(col("n_points")), lit(0L))).head().getLong(0)
    assert(ivjMatches == batchMatches,
      s"streamed $ivjMatches interval-join matches, batch computes $batchMatches")
    val ivjRate = (ivRows.length + ptRows.length) / ivjElapsed

    println(f"""{"metric":"stream_ingest","rows":$total,"sec":$elapsed%.3f,"rows_per_sec":$rate%.0f,"batches":${durs.size},"batch_ms_p50":${pct(0.5)}%.0f,"batch_ms_max":${durs.lastOption.getOrElse(0.0)}%.0f,"batch_ms_p50_est":${hist.percentile(0.5)},"batch_ms_p95_est":${hist.percentile(0.95)},"batch_ms_p99_est":${hist.percentile(0.99)},"batch_ms_mean_est":${hist.mean},"stateful_sec":$stateElapsed%.3f,"throttle_slept_ms":${throttle.map(_.sleptNanos / 1000000L).getOrElse(0L)},"stateful_rows_per_sec":$stateRate%.0f,"dedup_docs_in":$dedupIn,"dedup_docs_kept":$dedupOut,"dedup_docs_per_sec":$dedupRate%.0f,"neardup_docs_per_sec":$nearRate%.0f,"neardup_pairs":$nearPairs,"neardup_state_rows":$nearState,"session_events_per_sec":$sessRate%.0f,"sessions":$sessionsOut,"session_state_rows":$sessState,"session_ooo_events_per_sec":$oooRate%.0f,"ivjoin_rows_per_sec":$ivjRate%.0f,"ivjoin_matches":$ivjMatches,"ivjoin_state_rows":$ivjState,"sf":"$sfDir"}""")
    spark.stop()
  }
}
