package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Decorated-key tokens (db/DecoratedKey.java, dht partitioners).
  * The token decides ring placement and the iteration order of range scans;
  * in the Spark engine it is a derived column used for ordering,
  * `repartitionByRange` co-location, and split computation.
  */
object Tokens {

  def token(p: PartitionerType.Value, key: Column): Column = p match {
    case PartitionerType.Random =>
      // md5 BigInteger token, 16-byte unsigned-comparable form
      // (dht/RandomPartitioner.java:35-130)
      md5AbsToken(key)
    case PartitionerType.OrderPreserving =>
      // the key string IS the token (dht/OrderPreservingPartitioner.java:31-175)
      key
    case PartitionerType.OdklDomain =>
      // 2-hex-char domain moved to front (fork dht/OdklDomainPartitioner.java:36-120)
      odklDomainToken(key)
    case PartitionerType.Md5Hex =>
      md5HexToken(key)
  }

  /** Hex-string md5 token — same ordering as [[PartitionerType.Random]]
    * WITHOUT the BigInteger.abs() fold. Used by SQL-oracle-checked scans
    * because `md5(key)` is identically computable in any SQL engine; the
    * abs() variant is covered by property tests instead.
    */
  def md5HexToken(key: Column): Column = md5(encode(key, "UTF-8"))
}
