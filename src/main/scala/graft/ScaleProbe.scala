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
    val spark = GraftSession.create()
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
    spark.stop()
  }
}
