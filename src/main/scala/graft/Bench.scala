package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.CassandraLens
import graft.model.PartitionerType
import graft.operators.SliceRange
import graft.sources.{CellEncodings, CellStore}

/** Headline benchmark (driver-run per round; BASELINE.md protocol).
  *
  * stress.py's three workloads (contrib/py_stress/stress.py:168-260)
  * re-expressed as Spark jobs over the cell store:
  *  - insert:     bulk cell-store write (sorted, bloom-filtered parquet —
  *                the SSTable flush path);
  *  - read:       point slices (get_slice count=5) for a sampled key set
  *                over the reconciled live view;
  *  - rangeslice: token-ordered range scan, 1000-key batch, per-key slice.
  * Plus the heaviest pipeline operators (dedup joins, minhash, ANN) and
  * the reconciled full-table slice.
  *
  * Prints ONE JSON line: {"metric":...,"queries":{name:sec,...}}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create(taskSideCommit = true)

    // best-of-two: the container's noisy neighbors add ±30% on join-heavy
    // workloads; min-of-2 reports the engine's cost, not the noise
    def time(f: => Long): (Double, Long) = {
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val a = once()
      val b = once()
      (math.min(a._1, b._1), b._2)
    }

    // Untimed warmup over reduced inputs: first execution of each operator
    // shape pays classloading + whole-stage-codegen compilation + parquet
    // reader init (up to 4× per BASELINE.md) — run every workload's shape
    // small and cold ONCE so the timed best-of-two below measures the
    // engine. ~3s total, not counted.
    locally {
      val wtmp = Files.createTempDirectory("graft_warm").toString
      val some = CellEncodings.ordersCells(spark, sfDir).limit(20000)
      CellStore.write(some, CellEncodings.ordersMeta, s"$wtmp/w", numPartitions = 4)
      val wl = new CassandraLens(spark.read.parquet(s"$wtmp/w"), CellEncodings.ordersMeta)
      wl.multigetSlice((0L until 100L).map(i => f"$i%010d"), None, SliceRange(count = 5)).count()
      wl.rangeSliceByKeys(Some("0000000000"), None, None, SliceRange(count = 5), 100).count()
      wl.compact(gcBeforeSeconds = 1000000000).cells.count()
      spark.sql("DROP TABLE IF EXISTS graft_warm_bucketed")
      // in-memory catalog: a killed prior run leaves the managed location
      // behind with no catalog entry — clear the directory explicitly,
      // derived from the session's warehouse config (not a hardcoded path)
      val warmLoc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        "graft_warm_bucketed")
      if (warmLoc.exists()) new scala.reflect.io.Directory(warmLoc).deleteRecursively()
      CellStore.writeBucketed(some, CellEncodings.ordersMeta, "graft_warm_bucketed", 4)
      spark.table("graft_warm_bucketed").count()
      spark.sql("DROP TABLE IF EXISTS graft_warm_bucketed")
      CellStore.writeDomainSplit(some, CellEncodings.ordersMeta.copy(domainSplit = true),
        s"$wtmp/wd")
      new CassandraLens(CellStore.readDomainSplit(spark, s"$wtmp/wd"),
        CellEncodings.ordersMeta.copy(domainSplit = true))
        .multigetSlice((0L until 100L).map(i => f"$i%010d"), None, SliceRange(count = 5)).count()
      CellStore.writeWithHorizons(some, CellEncodings.ordersMeta, s"$wtmp/ws",
        numPartitions = 4)
      CellStore.openWithHorizons(spark, s"$wtmp/ws", CellEncodings.ordersMeta)
        .multigetSlice((0L until 100L).map(i => f"$i%010d"), None, SliceRange(count = 5)).count()
      val wdocs = CellEncodings.table(spark, sfDir, "documents").limit(400)
      graft.pipeline.Dedup.nearDuplicates(wdocs, "doc_id", "text", 3, 4, 5,
        hashShingles = true).count() // warm the SAME path the timed run measures
      graft.pipeline.Dedup.minhashNearDuplicates(wdocs, "doc_id", "text", 3, 32, 8, 4, 5).count()
      SparkEntry.queries("q22_sessionize")(spark, sfDir).limit(10).count()
      try new scala.reflect.io.Directory(new java.io.File(wtmp)).deleteRecursively()
      catch { case _: Throwable => () }
    }

    val ordersLens = new CassandraLens(
      CellEncodings.ordersCells(spark, sfDir)
        .unionByName(CellEncodings.ordersStatusFTombstones(spark, sfDir)),
      CellEncodings.ordersMeta)

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    var rows = scala.collection.mutable.LinkedHashMap[String, Long]()

    // 1. insert: cell-store write path (SSTable-flush analog)
    val tmp = Files.createTempDirectory("graft_bench").toString
    val (tIns, nIns) = time {
      val cells = CellEncodings.ordersCells(spark, sfDir)
      CellStore.write(cells, CellEncodings.ordersMeta, s"$tmp/orders_cells",
        numPartitions = GraftSession.cpus.toInt)
      spark.read.parquet(s"$tmp/orders_cells").count()
    }
    results += "insert" -> tIns; rows += "insert" -> nIns

    // reads run against the store written in step 1 — sorted runs + blooms
    // + pushdown actually exercised (stress.py inserts then reads)
    val storedLens = new CassandraLens(
      spark.read.parquet(s"$tmp/orders_cells")
        .unionByName(CellEncodings.ordersStatusFTombstones(spark, sfDir)),
      CellEncodings.ordersMeta)

    // 2. read: point-slice batch (gaussian-ish sample: every 20th key)
    val (tRead, nRead) = time {
      val keys = (0L until 3000L by 20L).map(i => f"$i%010d")
      storedLens.multigetSlice(keys, None, SliceRange(count = 5)).count()
    }
    results += "read" -> tRead; rows += "read" -> nRead

    // 3. rangeslice: token-ordered scan, 1000-key batch, count=5 slices
    val (tRange, nRange) = time {
      storedLens.rangeSliceByKeys(Some("0000000000"), None, None,
        SliceRange(count = 5), 1000).count()
    }
    results += "rangeslice" -> tRange; rows += "rangeslice" -> nRange

    // 4. reconcile_scan: full LWW reconcile + shadow + slice over every key
    val (tScan, nScan) = time {
      storedLens.rangeSliceByKeys(None, None, None, SliceRange(count = 3), Int.MaxValue).count()
    }
    results += "reconcile_scan" -> tScan; rows += "reconcile_scan" -> nScan

    // 3b. bucketed layout: write once co-located by key, then the same
    // point-slice batch runs with a SHUFFLE-FREE reconcile
    spark.sql("DROP TABLE IF EXISTS graft_bench_bucketed")
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_bench_bucketed")
    if (wh.exists()) new scala.reflect.io.Directory(wh).deleteRecursively()
    val (tInsB, nInsB) = time {
      CellStore.writeBucketed(
        CellEncodings.ordersCells(spark, sfDir)
          .unionByName(CellEncodings.ordersStatusFTombstones(spark, sfDir)),
        CellEncodings.ordersMeta, "graft_bench_bucketed", GraftSession.cpus.toInt)
      spark.table("graft_bench_bucketed").count()
    }
    results += "insert_bucketed" -> tInsB; rows += "insert_bucketed" -> nInsB

    val bucketLens = new CassandraLens(
      spark.table("graft_bench_bucketed"), CellEncodings.ordersMeta)
    val (tReadB, nReadB) = time {
      val keys = (0L until 3000L by 20L).map(i => f"$i%010d")
      bucketLens.multigetSlice(keys, None, SliceRange(count = 5)).count()
    }
    results += "read_bucketed" -> tReadB; rows += "read_bucketed" -> nReadB
    spark.sql("DROP TABLE IF EXISTS graft_bench_bucketed")

    // 3c. domainSplit layout (fork CFMetaData.domainSplit): the 2-char key
    // domain is a parquet partition column; keyed reads derive domains from
    // the requested keys and prune whole directories (PartitionFilters)
    val domainMeta = CellEncodings.ordersMeta.copy(domainSplit = true)
    val (tInsD, nInsD) = time {
      CellStore.writeDomainSplit(
        CellEncodings.ordersCells(spark, sfDir)
          .unionByName(CellEncodings.ordersStatusFTombstones(spark, sfDir)),
        domainMeta, s"$tmp/orders_domain")
      spark.read.parquet(s"$tmp/orders_domain").count()
    }
    results += "insert_domain" -> tInsD; rows += "insert_domain" -> nInsD
    val domainLens = new CassandraLens(
      CellStore.readDomainSplit(spark, s"$tmp/orders_domain"), domainMeta)
    val (tReadD, nReadD) = time {
      val keys = (0L until 3000L by 20L).map(i => f"$i%010d")
      domainLens.multigetSlice(keys, None, SliceRange(count = 5)).count()
    }
    results += "read_domain" -> tReadD; rows += "read_domain" -> nReadD

    // 3e. composed domainSplit ∘ bucketed catalog layout (the 100 TB
    // layout: directory pruning AND shuffle-free reconcile in one table;
    // write is insert_domain plus the bucket spec — setup untimed, the
    // READ is what the composition changes)
    CellStore.dropManaged(spark, "graft_bench_domain_bucketed")
    val dbMeta = CellEncodings.ordersMeta.copy(domainSplit = true)
    CellStore.writeDomainBucketed(
      CellEncodings.ordersCells(spark, sfDir)
        .unionByName(CellEncodings.ordersStatusFTombstones(spark, sfDir)),
      dbMeta, "graft_bench_domain_bucketed", GraftSession.cpus.toInt)
    val dbLens = new CassandraLens(
      spark.table("graft_bench_domain_bucketed"), dbMeta)
    val (tReadDb, nReadDb) = time {
      val keys = (0L until 3000L by 20L).map(i => f"$i%010d")
      dbLens.multigetSlice(keys, None, SliceRange(count = 5)).count()
    }
    results += "read_domain_bucketed" -> tReadDb; rows += "read_domain_bucketed" -> nReadDb
    spark.sql("DROP TABLE IF EXISTS graft_bench_domain_bucketed")

    // 3d. horizon-sidecar store: runs + precomputed deletion horizons;
    // reads join two tiny tables instead of re-aggregating marker cells
    // out of the store (setup untimed — the write path is `insert` plus
    // two small aggregates; the READ is what the sidecar changes)
    CellStore.writeWithHorizons(
      CellEncodings.ordersCells(spark, sfDir)
        .unionByName(CellEncodings.ordersStatusFTombstones(spark, sfDir)),
      CellEncodings.ordersMeta, s"$tmp/orders_sidecar",
      numPartitions = GraftSession.cpus.toInt)
    val sideLens = CellStore.openWithHorizons(spark, s"$tmp/orders_sidecar",
      CellEncodings.ordersMeta)
    val (tReadS, nReadS) = time {
      val keys = (0L until 3000L by 20L).map(i => f"$i%010d")
      sideLens.multigetSlice(keys, None, SliceRange(count = 5)).count()
    }
    results += "read_sidecar" -> tReadS; rows += "read_sidecar" -> nReadS

    // 4b. sessionize: gap-based session windows over 100k events
    val (tSess, nSess) = time {
      SparkEntry.queries("q22_sessionize")(spark, sfDir).count()
    }
    results += "sessionize" -> tSess; rows += "sessionize" -> nSess

    // 5. compaction: table-wide merge + GC (major compaction analog)
    val (tComp, nComp) = time {
      ordersLens.compact(gcBeforeSeconds = 1000000000).cells.count()
    }
    results += "compaction" -> tComp; rows += "compaction" -> nComp

    // pipeline headliners
    val docs = CellEncodings.table(spark, sfDir, "documents")
    val (tJac, nJac) = time {
      // scale path: 8-byte hashed shingle shuffle keys (oracle queries
      // keep exact strings; spec asserts equal results)
      graft.pipeline.Dedup.nearDuplicates(docs, "doc_id", "text", 3, 4, 5,
        hashShingles = true).count()
    }
    results += "jaccard_neardup" -> tJac; rows += "jaccard_neardup" -> nJac

    val (tMh, nMh) = time {
      graft.pipeline.Dedup.minhashNearDuplicates(docs, "doc_id", "text", 3, 32, 8, 4, 5).count()
    }
    results += "minhash_lsh" -> tMh; rows += "minhash_lsh" -> nMh

    val emb = CellEncodings.table(spark, sfDir, "embeddings")
    val (tAnn, nAnn) = time {
      val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
      graft.pipeline.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= 0), "vec_id", "embedding", q, 10).count()
    }
    results += "ann_topk" -> tAnn; rows += "ann_topk" -> nAnn

    val (tWin, nWin) = time {
      CellEncodings.table(spark, sfDir, "events")
        .groupBy(expr("ts div 3600000000000"), col("event_type"))
        .agg(count(lit(1)), sum(col("value"))).count()
    }
    results += "events_window" -> tWin; rows += "events_window" -> nWin

    // cleanup
    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    } catch { case _: Throwable => () }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val rs = rows.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.values.sum
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"rows":$rs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
