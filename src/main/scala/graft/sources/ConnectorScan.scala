package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.CassandraLens
import graft.operators.{RangeScan, SlicePredicate}

/** The Hadoop analytics connector's read shape (SURVEY §2.4:
  * hadoop/ColumnFamilyInputFormat.java:79-226 +
  * ColumnFamilyRecordReader.java:49-280) re-expressed as ONE Spark plan:
  *
  *  - splits: one token range per task — `repartitionByRange(n, token)`
  *    replaces describe_splits + per-split readers; each output partition
  *    is a contiguous token range exactly like a ColumnFamilySplit;
  *  - projection pushdown: the job's fixed SlicePredicate (serialized into
  *    the job conf by ConfigHelper:134-160) is the slice applied before
  *    repartitioning — name filters reach the parquet scan.
  *
  * The reference pages each split through get_range_slices; Spark's scan
  * tasks stream partitions natively, so paging disappears — PagedScan
  * remains for the driver-side sequential pattern.
  */
object ConnectorScan {

  /** Full-CF parallel scan with a fixed per-row projection, partitioned
    * into `nSplits` contiguous token ranges.
    */
  def scan(lens: CassandraLens, pred: SlicePredicate, nSplits: Int): DataFrame =
    lens.rangeSliceByKeys(None, None, None, pred, Int.MaxValue)
      .repartitionByRange(nSplits, col("token"), col("key"))

  /** The split boundaries the scan's partitions correspond to — exact
    * quantiles over the live keys (describe_splits, thrift:452-456).
    */
  def splits(lens: CassandraLens, nSplits: Int): DataFrame =
    lens.describeSplits(nSplits)
}
