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

    spark.stop()
  }
}
