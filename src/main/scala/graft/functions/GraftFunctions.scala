package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Session registration of the engine's native Catalyst expressions plus
  * `Column`-level helpers. All helpers resolve through the function
  * registry (`call_function`), so `Graft.register(spark)` must run once per
  * session — every public API entry point does this idempotently.
  */
object GraftFunctions {

  private val builders: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)] =
    Seq(
      "graft_be_long" -> (es => BigEndianLong(es.head)),
      "graft_be_bytes" -> (es => LongToBytesBE(es.head)),
      "graft_binary_not" -> (es => BinaryNot(es.head)),
      "graft_md5_abs_token" -> (es => Md5AbsToken(es.head)),
      "graft_timeuuid_ts" -> (es => TimeUuidTimestamp(es.head)),
      "graft_collation_key" -> (es => CollationKeyBytes(es.head)),
      "graft_odkl_domain_token" -> (es => OdklDomainToken(es.head)),
      "graft_nfc" -> (es => NfcNormalize(es.head)),
      "graft_reconcile" -> (es =>
        ReconcileMax(es(0), es(1), es(2), es(3)).toAggregateExpression()),
      "graft_cosine" -> (es => CosineSimilarity(es(0), es(1))),
      "graft_dot" -> (es => DotProduct(es(0), es(1))),
      "graft_rolling_min_hash" -> { es =>
        require(es.length == 2 && es(1).foldable,
          "graft_rolling_min_hash(text, k): k must be a literal")
        val k = es(1).eval() match {
          case n: Number => n.intValue()
          case other => throw new IllegalArgumentException(
            s"graft_rolling_min_hash: k must be numeric, got $other")
        }
        require(k >= 1, s"graft_rolling_min_hash: k must be >= 1, got $k")
        RollingMinHash(es.head, k)
      })

  def register(spark: SparkSession): Unit = synchronized {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }

  /** binary(8) big-endian → signed long (LongType comparator decode). */
  def beLong(c: Column): Column = call_function("graft_be_long", c)

  /** long → binary(8) big-endian (LongType comparator encode). */
  def beBytes(c: Column): Column = call_function("graft_be_bytes", c)

  /** Descending-order binary encoding (FreshTimestampType). */
  def binaryNot(c: Column): Column = call_function("graft_binary_not", c)

  /** Winnowing rolling fingerprint: min 60-bit md5-prefix hash over
    * k-codepoint sliding windows, fused (no per-row window array).
    */
  def rollingMinHash(c: Column, k: Int): Column =
    call_function("graft_rolling_min_hash", c, lit(k))

  /** RandomPartitioner md5-abs token bytes of a string key. */
  def md5AbsToken(c: Column): Column =
    call_function("graft_md5_abs_token", encode(c, "UTF-8"))

  /** Embedded 60-bit timestamp of a v1 time-UUID (16 bytes). */
  def timeUuidTs(c: Column): Column = call_function("graft_timeuuid_ts", c)

  /** en_US collation key bytes of a string. */
  def collationKey(c: Column): Column = call_function("graft_collation_key", c)

  /** OdklDomainPartitioner token string of a string key. */
  def odklDomainToken(c: Column): Column = call_function("graft_odkl_domain_token", c)

  /** Unicode NFC normalization of a string. */
  def nfc(c: Column): Column = call_function("graft_nfc", c)
}
