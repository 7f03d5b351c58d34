package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.api.CassandraLens
import graft.model.{Cell, CfMeta}
import graft.operators.{Mutations, Reconcile, SliceRange}
import graft.streaming.CellStream

/** IStoreApplyListener analog (fork db/IStoreApplyListener.java:1-30, wired
  * in db/Table.java:568-605): pre-apply veto/transform chain on the write
  * path — batch (CassandraLens.withApplyListener) and streaming ingest
  * (CellStream.writeToStore listeners).
  */
class ApplyListenerSpec extends SparkSpec {

  private val meta = CfMeta("cf")

  test("veto listener drops a mutation before it reaches the store") {
    val base = cellsDf(Seq(ins("k1", "c1", "old1", 1), ins("k2", "c1", "old2", 1)))
    val lens = new CassandraLens(base, meta)
      .withApplyListener(_.filter(col("key") =!= "k2")) // preapply → false for k2
    val after = lens.insert(cellsDf(Seq(
      ins("k1", "c1", "new1", 9), ins("k2", "c1", "new2", 9)))
      .select("key", "super_name", "col_name", "value", "ts"))
    assert(liveValues(after.getSlice("k1", None, SliceRange(count = 10)))
      == Map("c1" -> "new1"))
    assert(liveValues(after.getSlice("k2", None, SliceRange(count = 10)))
      == Map("c1" -> "old2"), "vetoed mutation must be ignored, base row kept")
  }

  test("transform listener rewrites mutations; base cells are untouched") {
    val base = cellsDf(Seq(ins("k1", "c1", "old", 1)))
    val lens = new CassandraLens(base, meta)
      .withApplyListener(_.withColumn("value", upper(decode(col("value"), "UTF-8"))
        .cast("binary")))
    val after = lens.insert(cellsDf(Seq(ins("k1", "c2", "fresh", 9)))
      .select("key", "super_name", "col_name", "value", "ts"))
    assert(liveValues(after.getSlice("k1", None, SliceRange(count = 10)))
      == Map("c1" -> "old", "c2" -> "FRESH"),
      "transform applies to the mutation only, never to stored cells")
  }

  test("listeners chain in attach order and persist across derived lenses") {
    val base = cellsDf(Seq(ins("k1", "c1", "old", 1)))
    var vetoCalls = 0
    val lens = new CassandraLens(base, meta)
      .withApplyListener { df => vetoCalls += 1; df.filter(col("key") =!= "kX") }
      .withApplyListener(_.withColumn("value",
        concat(col("value"), lit("!".getBytes("UTF-8")))))
    // first mutation: veto then transform (order matters — 'kX!' never lands)
    val m1 = lens.batchMutate(Mutations.asInserts(cellsDf(Seq(
      ins("k1", "c2", "a", 5), ins("kX", "c1", "nope", 5)))
      .select("key", "super_name", "col_name", "value", "ts")))
    assert(liveValues(m1.getSlice("k1", None, SliceRange(count = 10)))
      == Map("c1" -> "old", "c2" -> "a!"))
    assert(m1.getSlice("kX", None, SliceRange(count = 10)).isEmpty)
    // the mutated lens kept the chain: a second write is still hooked
    val m2 = m1.insert(cellsDf(Seq(ins("kX", "c1", "again", 7)))
      .select("key", "super_name", "col_name", "value", "ts"))
    assert(m2.getSlice("kX", None, SliceRange(count = 10)).isEmpty,
      "listener chain must survive mutation (store configuration)")
    assert(vetoCalls >= 2, "chain ran on both writes")
  }

  test("tombstone mutations pass through the chain too (veto a delete)") {
    val base = cellsDf(Seq(ins("k1", "c1", "keep", 1), ins("k2", "c1", "gone", 1)))
    val lens = new CassandraLens(base, meta)
      .withApplyListener(_.filter(!(col("tombstone") && col("key") === "k1")))
    val after = lens.removeRows(
      cellsDf(Seq(delRow("k1", 9), delRow("k2", 9))).select("key", "ts"),
      localDeletionTimeSec = 100)
    assert(liveValues(after.getSlice("k1", None, SliceRange(count = 10)))
      == Map("c1" -> "keep"), "vetoed row delete must not shadow k1")
    assert(after.getSlice("k2", None, SliceRange(count = 10)).isEmpty)
  }

  test("unhooked lens plan is listener-free (common path untouched)") {
    val base = cellsDf(Seq(ins("k1", "c1", "old", 1)))
    val muts = cellsDf(Seq(ins("k1", "c2", "new", 9)))
      .select("key", "super_name", "col_name", "value", "ts")
    val plain = new CassandraLens(base, meta).insert(muts)
    // same analyzed plan as a hand-built union — preApply added nothing
    val manual = Mutations(base, Mutations.asInserts(muts))
    assert(plain.cells.queryExecution.analyzed.sameResult(
      manual.queryExecution.analyzed))
  }

  test("streaming ingest runs the listener chain per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_stream_hook").toString
    val mem = MemoryStream[Cell]
    val listeners: Seq[DataFrame => DataFrame] = Seq(
      _.filter(col("key") =!= "kX"), // veto
      _.withColumn("value", upper(decode(col("value"), "UTF-8")).cast("binary")))
    val q = CellStream.writeToStore(mem.toDS().toDF(), s"$dir/store", s"$dir/ckpt",
      listeners).start()
    try {
      mem.addData(ins("k1", "c1", "v1", 1), ins("kX", "c1", "drop", 1))
      q.processAllAvailable()
      mem.addData(ins("k2", "c1", "w", 2))
      q.processAllAvailable()
    } finally q.stop()
    val stored = spark.read.parquet(s"$dir/store")
    assert(stored.filter(col("key") === "kX").isEmpty, "vetoed cell must not flush")
    val live = Reconcile.liveView(stored)
    assert(liveValues(live.filter(col("key") === "k1")) == Map("c1" -> "V1"),
      "transform applies before the flush")
    assert(liveValues(live.filter(col("key") === "k2")) == Map("c1" -> "W"))
  }
}
