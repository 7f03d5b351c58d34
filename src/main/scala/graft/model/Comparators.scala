package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Order-preserving sort keys for the reference's comparator types
  * (db/marshal/Types.java:14-52). Each comparator maps column-name bytes to
  * a Spark-orderable value such that ascending Spark ordering of
  * `sortKey(col)` equals the reference comparator's order — including the
  * reversed FreshTimestampType and the empty-bytes edge cases
  * (db/marshal/AbstractType.java:50-70).
  *
  * Spark's BinaryType comparison is unsigned lexicographic, which is exactly
  * FBUtilities.compareByteArrays — so Bytes/Ascii/Utf8 need no transform.
  */
object Comparators {

  /** Sort key Column for `col` (binary column-name bytes) under `cmp`.
    * The empty byte-array (slice sentinel / degenerate name) sorts FIRST for
    * every comparator (reference AbstractType compare: length-0 first), which
    * for Long/TimeUuid decodes we realize by mapping empty → null
    * (Spark sorts nulls first in ascending order).
    */
  def sortKey(cmp: ComparatorType.Value, col: Column): Column = cmp match {
    case ComparatorType.Bytes | ComparatorType.Ascii | ComparatorType.Utf8 =>
      col
    case ComparatorType.Long_ =>
      when(length(col) === 0, lit(null)).otherwise(beLong(col))
    case ComparatorType.TimeUuid =>
      // timestamp first, then raw bytes as the tie-break
      // (db/marshal/TimeUUIDType.java:28-93)
      when(length(col) === 0, lit(null))
        .otherwise(struct(timeUuidTs(col).as("t"), col.as("b")))
    case ComparatorType.LexicalUuid =>
      // UUID.compareTo: signed msb then signed lsb (db/marshal/LexicalUUIDType.java)
      when(length(col) === 0, lit(null))
        .otherwise(struct(
          beLong(substring(col, 1, 8)).as("msb"),
          beLong(substring(col, 9, 8)).as("lsb")))
    case ComparatorType.FreshTimestamp =>
      // descending byte order, empty first (fork FreshTimestampType)
      binaryNot(col)
    case ComparatorType.Collating =>
      collationKey(col.cast("string"))
  }
}
