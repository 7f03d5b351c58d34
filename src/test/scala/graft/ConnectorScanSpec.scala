package graft

import org.apache.spark.sql.functions._

import graft.api.CassandraLens
import graft.model.CfMeta
import graft.operators.SliceRange
import graft.sources.ConnectorScan

/** Hadoop-connector read shape: split-parallel full scan with a fixed
  * SlicePredicate projection (ColumnFamilyInputFormat analog).
  */
class ConnectorScanSpec extends SparkSpec {

  private val cells = (0 until 64).flatMap { i =>
    Seq(ins(f"k$i%03d", "c1", s"v$i", 1), ins(f"k$i%03d", "c2", s"w$i", 1))
  }
  private def lens = new CassandraLens(cellsDf(cells), CfMeta("t"))

  test("connector scan: n token-contiguous splits, same rows as the plain scan") {
    val n = 4
    val scanned = ConnectorScan.scan(lens, SliceRange(count = 1), n)
    assert(scanned.rdd.getNumPartitions == n)

    // token-contiguous: per-partition [min,max] key ranges do not overlap
    val ranges = scanned
      .select(spark_partition_id().as("p"), col("key"))
      .groupBy("p").agg(min("key").as("lo"), max("key").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getString(1), r.getString(2)))
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap: $hi1 > $lo2")
      case _ =>
    }

    // projection (count=1 slice) applied identically to the plain path
    val plain = lens.rangeSliceByKeys(None, None, None, SliceRange(count = 1), Int.MaxValue)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
      df.select(col("key"), decode(col("col_name"), "UTF-8").as("c"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs(scanned) == pairs(plain))
    assert(scanned.count() == 64)

    // split metadata covers every key exactly once
    val splits = ConnectorScan.splits(lens, n).agg(sum("n_keys")).head().getLong(0)
    assert(splits == 64)
  }
}
