package graft

/** Driver-smoke emulation + negative-path probe: runs SparkEntry.entry
  * (rows>0 contract) and exercises a validation failure.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    val rows = SparkEntry.entry(spark).limit(10).collect()
    println(s"[smoke] entry rows (limit 10): ${rows.length}")
    rows.take(3).foreach(r => println(s"[smoke] $r"))
    // invalid slice: start after finish without reversed must be rejected
    // (ThriftValidation.validateRange, thrift/ThriftValidation.java:230-258)
    val lens = new graft.api.CassandraLens(
      graft.sources.CellEncodings.ordersCells(spark, "/root/testdata/sf0.001"),
      graft.sources.CellEncodings.ordersMeta)
    try {
      lens.getSlice("0000000001", None,
        graft.operators.SliceRange(
          start = graft.functions.ExprHelpers.longBytes(100L),
          finish = graft.functions.ExprHelpers.longBytes(1L)))
      println("[smoke] PROBE-FAIL: invalid range accepted")
    } catch {
      case e: IllegalArgumentException =>
        println(s"[smoke] probe ok — rejected: ${e.getMessage}")
    }
    spark.stop()
  }
}
