package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.api.CassandraLens
import graft.operators.SliceRange
import graft.sources.{CellEncodings, CellStore}

/** Plan-inspection harness: prints formatted physical plans for the hot
  * paths so scan pruning / shuffle counts / codegen coverage are reviewable.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val dir = "/root/testdata/sf0.001"

    // write a real cell store (sorted + blooms) and point-read it
    val tmp = Files.createTempDirectory("graft_explain").toString
    CellStore.write(CellEncodings.ordersCells(spark, dir), CellEncodings.ordersMeta,
      s"$tmp/store", numPartitions = 4)
    val stored = new CassandraLens(CellStore.read(spark, s"$tmp/store"), CellEncodings.ordersMeta)

    println("\n================ POINT READ (get_slice one key) ================")
    stored.getSlice("0000000042", None, SliceRange(count = 5)).explain("formatted")

    println("\n================ FULL RECONCILE SCAN (per-key slice) ================")
    stored.rangeSliceByKeys(None, None, None, SliceRange(count = 3), Int.MaxValue).explain("formatted")

    println("\n================ RANGE SLICE maxKeys=1000 ================")
    stored.rangeSliceByKeys(Some("0000000100"), None, None, SliceRange(count = 5), 1000).explain("formatted")

    println("\n================ SIDECAR READ (horizon-join multiget) ================")
    CellStore.writeWithHorizons(CellEncodings.ordersCells(spark, dir),
      CellEncodings.ordersMeta, s"$tmp/side", numPartitions = 4)
    CellStore.openWithHorizons(spark, s"$tmp/side", CellEncodings.ordersMeta)
      .getSlice("0000000042", None, SliceRange(count = 5)).explain("formatted")

    println("\n================ BUCKETED COMPACTION (Exchange-free) ================")
    CellStore.dropManaged(spark, "graft_explain_bct")
    CellStore.writeBucketed(CellEncodings.ordersCells(spark, dir),
      CellEncodings.ordersMeta, "graft_explain_bct", buckets = 4)
    graft.operators.Compaction.compact(spark.table("graft_explain_bct"), 0).explain("formatted")
    spark.sql("DROP TABLE graft_explain_bct")

    println("\n================ IVF-PQ CANDIDATE SCAN (codes only) ================")
    import graft.pipeline.Similarity
    val emb = CellEncodings.table(spark, dir, "embeddings")
    val coarse = Similarity.trainCodebook(emb, "vec_id", "embedding", k = 4, iters = 1)
    val pq = Similarity.trainProductCodebook(emb, "vec_id", "embedding", coarse, m = 4, ksub = 8, iters = 1)
    Similarity.savePqIndex(emb, "vec_id", "embedding", coarse, pq, s"$tmp/pq")
    val codes = spark.read.parquet(s"$tmp/pq/vectors").select("id", "code", "cell")
    val qv = emb.limit(1).select(col("embedding")).head().getSeq[Float](0).toArray
    Similarity.pqCandidates(codes, "id", coarse, pq, qv, nprobe = 2, rerank = 20)
      .explain("formatted")

    println("\n================ SNAPSHOT NEAR-DUP INGEST (no corpus rescan) ================")
    import graft.pipeline.Dedup
    val docs = CellEncodings.table(spark, dir, "documents")
    Dedup.saveMinhashSnapshot(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", n = 3, numHashes = 32, bands = 8, path = s"$tmp/snap")
    Dedup.nearDupsAgainstSnapshot(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", s"$tmp/snap", n = 3, numHashes = 32, bands = 8, num = 4, den = 5)
      .explain("formatted")

    println("\n================ DRIFT MONITORS (where does the sort live?) ================")
    // the bench leg's two lineages, explained separately: the CMS drift
    // series (corpus tokens × d through a hash aggregate into day×w
    // cells) and the winsorized stats (corpus → (grp, v) histogram);
    // any Sort/Window over a corpus-sized frame here is a scale bug —
    // sorts are only legitimate on metrics-space frames (days, cells)
    val ev = CellEncodings.table(spark, dir, "events")
    graft.pipeline.Sketches.cmsDriftSeries(
      ev.select(expr("ts div 1000 div 86400000000").as("day"), col("props")),
      "props", "day", d = 4, w = 128).explain("formatted")
    graft.pipeline.Sketches.winsorizedStats(
      ev.select(col("event_type"), round(col("value") * 100).cast("long").as("cents")),
      "cents", "event_type").explain("formatted")

    spark.stop()
  }
}
