package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.CassandraLens

/** Paged full-CF iteration — the hadoop connector's read pattern
  * (hadoop/ColumnFamilyRecordReader.java:139-187): fetch `pageSize` keys,
  * remember the last key, continue with an EXCLUSIVE start (the reference
  * re-issues get_range_slices with start_key = last seen key and skips it;
  * here the token-range scan's start-exclusive semantics do it directly).
  *
  * Pagination is inherently sequential per split — at scale each of the
  * `describe_splits` token ranges pages independently in parallel tasks;
  * this driver-side helper is the single-split building block.
  */
object PagedScan {

  /** Lazily yields pages of live cells, `pageSize` keys per page, in token
    * order, until the scan is exhausted.
    */
  def pages(lens: CassandraLens, pred: SlicePredicate, pageSize: Int): Iterator[DataFrame] =
    new Iterator[DataFrame] {
      private var lastToken: Option[Any] = None
      private var nextPage: Option[DataFrame] = fetch()

      private def fetch(): Option[DataFrame] = {
        val page = lastToken match {
          case None => lens.rangeSliceByKeys(None, None, None, pred, pageSize)
          case Some(t) => lens.rangeSliceByToken(Some(lit(t)), None, None, pred, pageSize)
        }
        // continuation in TOKEN space (works for any partitioner; the scan
        // outputs carry the token column)
        val t = page.select(org.apache.spark.sql.functions.max(col("token"))).first()
        if (t.isNullAt(0)) None
        else {
          lastToken = Some(t.get(0))
          Some(page)
        }
      }

      override def hasNext: Boolean = nextPage.isDefined
      override def next(): DataFrame = {
        val p = nextPage.get
        nextPage = fetch()
        p
      }
    }
}
