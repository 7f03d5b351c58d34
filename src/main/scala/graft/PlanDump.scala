package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

import graft.api.CassandraLens
import graft.operators.SliceRange
import graft.sources.{CellEncodings, CellStore}

/** Round-19 deliverable helper: writes `.explain("formatted")` for each
  * bench-leg / operator DataFrame to plans/<tag>/<name>_<suffix>.txt so
  * plan-shape claims in OPTIMIZATION_r19.md are checkable offline.
  * Usage: runMain graft.PlanDump <tag> <suffix>   (e.g. "r19 before").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.length > 0) args(0) else "r19"
    val suffix = if (args.length > 1) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(taskSideCommit = true)
    val outDir = s"plans/$tag"
    new java.io.File(outDir).mkdirs()

    def dump(name: String)(df: => DataFrame): Unit = {
      val text =
        try df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"EXPLAIN FAILED: $e" }
      Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
        text.getBytes("UTF-8"))
      println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
    }

    val tmp = Files.createTempDirectory("graft_plandump").toString

    // cell-store write legs have no DataFrame action to explain —
    // dump the pre-write frame (exchange + sort shape is what matters)
    val superMeta = CellEncodings.lineitemSuperMeta
    dump("insert_super") {
      val sk = graft.model.Comparators.sortKey(superMeta.comparator, col("col_name"))
      CellEncodings.lineitemSuperCells(spark, sfDir)
        .withColumn("token", graft.model.Tokens.token(superMeta.partitioner, col("key")))
        .repartitionByRange(GraftSession.cpus.toInt, col("token"), col("key"))
        .sortWithinPartitions(col("token"), col("key"), col("super_name"), sk)
        .drop("token")
    }
    // bucketed insert: the v1 bucketed write is a command (no DataFrame
    // action to explain); dump the pre-write clustering frame — the
    // plan's ONE exchange. The writer itself adds only a per-partition
    // sort by (bucketId, key), no further exchange.
    dump("insert_bucketed") {
      CellEncodings.ordersCells(spark, sfDir)
        .unionByName(CellEncodings.ordersStatusFTombstones(spark, sfDir))
        .repartition(GraftSession.cpus.toInt, col("key"))
    }
    val domainMeta = CellEncodings.ordersMeta.copy(domainSplit = true)
    dump("insert_domain") {
      val sk = graft.model.Comparators.sortKey(domainMeta.comparator, col("col_name"))
      CellEncodings.ordersCells(spark, sfDir)
        .unionByName(CellEncodings.ordersStatusFTombstones(spark, sfDir))
        .withColumn("domain", substring(col("key"), -2, 2))
        .repartition(col("domain"))
        .sortWithinPartitions(col("key"), col("super_name"), sk)
    }

    val docs = CellEncodings.table(spark, sfDir, "documents")
    dump("jaccard_neardup") {
      graft.pipeline.Dedup.nearDuplicates(docs, "doc_id", "text", 3, 4, 5,
        hashShingles = true, maxDocFreq = None)
    }
    dump("jaccard_guarded") {
      graft.pipeline.Dedup.nearDuplicates(docs, "doc_id", "text", 3, 4, 5,
        hashShingles = true, maxDocFreq = Some(500))
    }
    dump("containment") {
      graft.pipeline.Dedup.containmentNearDuplicates(docs, "doc_id", "text",
        3, 4, 5, hashShingles = true)
    }
    dump("minhash_lsh") {
      graft.pipeline.Dedup.minhashNearDuplicates(docs, "doc_id", "text",
        3, 32, 8, 4, 5, maxBucket = None)
    }
    dump("minhash_guarded") {
      graft.pipeline.Dedup.minhashNearDuplicates(docs, "doc_id", "text",
        3, 32, 8, 4, 5)
    }
    locally {
      val merges = graft.pipeline.TextAnalysis.trainByteBpeMerges(docs, "text",
        merges = 6, samplePermille = 100).map { case (l, r, _) => (l, r) }
      dump("bytebpe_tokcount") {
        graft.pipeline.TextAnalysis.byteBpeTokenCount(docs, "doc_id", "text", merges)
      }
    }
    dump("sketches") {
      graft.pipeline.Sketches.hllRegisters(
        docs.select(col("lang"),
          graft.pipeline.TextAnalysis.fingerprint(col("text")).as("fp")),
        "fp", "lang", b = 6)
        .unionByName(
          graft.pipeline.Sketches.countMinSketch(docs, "text", d = 4, w = 512)
            .select(lit("cms").as("grp"), col("bucket").as("register"),
              col("cnt").as("rho")))
    }
    val ev = CellEncodings.table(spark, sfDir, "events")
    dump("drift_monitors") {
      graft.pipeline.Sketches.cmsDriftSeries(
        ev.select(expr("ts div 1000 div 86400000000").as("day"), col("props")),
        "props", "day", d = 4, w = 128)
        .select(col("bucket").as("a"), col("l1").as("b"))
        .unionByName(graft.pipeline.Sketches.winsorizedStats(
          ev.select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents")),
          "cents", "event_type")
          .select(col("lo").as("a"), col("wsum").as("b")))
    }
    val emb = CellEncodings.table(spark, sfDir, "embeddings")
    dump("knn_graph") {
      val codebook = graft.pipeline.Similarity.refinedCentroids(
        graft.pipeline.Similarity.kmeansStepExact(emb, "vec_id",
          "embedding", k = 16)).localCheckpoint()
      graft.pipeline.Similarity.knnGraphIvf(
        graft.pipeline.Similarity.ivfIndexTable(emb, "vec_id",
          "embedding", codebook, 16), kNbrs = 10)
    }
    dump("event_graph") {
      val e = ev.select(col("user_id"), expr("ts div 1000").as("tus"),
        col("event_type"), col("event_id"), col("value"),
        expr("CAST(nullif(regexp_extract(props, '[0-9]+', 0), '') AS BIGINT)")
          .as("item"))
        .localCheckpoint(false)
      val tri = graft.operators.EventOps.triangleCounts(
        graft.operators.EventOps.eventTransitions(
          e.select(col("user_id"), col("tus"), col("item")),
          "user_id", "tus", "item"),
        "from_type", "to_type")
        .select(col("node").as("a"), col("n_triangles").as("b"))
      val attrib = graft.operators.EventOps.linearAttribution(
        e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("tus"), col("event_id"),
            round(col("value") * 1e6).cast("long").as("rev_micro")),
        e.filter(col("event_type") === "click")
          .select(col("user_id"), col("tus"), col("event_id").as("cid")),
        "user_id", "tus", "event_id", "rev_micro", "tus", "cid",
        lookback = 604800000000L)
        .select(col("click_day").as("a"), col("attributed_micro").as("b"))
      tri.unionByName(attrib)
    }

    // reads against a freshly written store (same as bench)
    CellStore.write(CellEncodings.ordersCells(spark, sfDir),
      CellEncodings.ordersMeta, s"$tmp/orders_cells",
      numPartitions = GraftSession.cpus.toInt)
    val storedLens = new CassandraLens(
      spark.read.parquet(s"$tmp/orders_cells")
        .unionByName(CellEncodings.ordersStatusFTombstones(spark, sfDir)),
      CellEncodings.ordersMeta)
    dump("read") {
      val keys = (0L until 3000L by 20L).map(i => f"$i%010d")
      storedLens.multigetSlice(keys, None, SliceRange(count = 5))
    }
    dump("rangeslice") {
      storedLens.rangeSliceByKeys(Some("0000000000"), None, None,
        SliceRange(count = 5), 1000)
    }
    dump("reconcile_scan") {
      storedLens.rangeSliceByKeys(None, None, None, SliceRange(count = 3), Int.MaxValue)
    }
    dump("compaction") {
      new CassandraLens(
        CellEncodings.ordersCells(spark, sfDir)
          .unionByName(CellEncodings.ordersStatusFTombstones(spark, sfDir)),
        CellEncodings.ordersMeta).compact(gcBeforeSeconds = 1000000000).cells
    }
    CellStore.write(CellEncodings.lineitemSuperCells(spark, sfDir),
      CellEncodings.lineitemSuperMeta, s"$tmp/li_super",
      numPartitions = GraftSession.cpus.toInt)
    val superLens = new CassandraLens(
      spark.read.parquet(s"$tmp/li_super"), CellEncodings.lineitemSuperMeta)
    dump("read_super") {
      val keys = (1L until 12000L by 4L).map(i => f"$i%010d")
      superLens.multigetSlice(keys, None, SliceRange(count = 5))
    }
    dump("rangeslice_super") {
      val sup = java.nio.ByteBuffer.allocate(8).putLong(1L).array()
      superLens.rangeSliceByKeys(Some("0000000001"), None, Some(sup),
        SliceRange(count = 5), 1000)
    }

    try new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
    catch { case _: Throwable => () }
    spark.stop()
  }
}
