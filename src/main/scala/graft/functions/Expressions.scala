package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Runtime helpers invoked both by interpreted eval and by generated code.
  * Kept as a top-level object so codegen can call the static forwarders
  * (`graft.functions.ExprHelpers.beLong(...)`).
  */
object ExprHelpers {

  /** Signed numeric value of an 8-byte big-endian long (reference
    * db/marshal/LongType.java:30-46 — first byte signed, rest unsigned ⇒
    * exactly big-endian two's-complement order).
    */
  def beLong(b: Array[Byte]): Long = {
    if (b.length != 8)
      throw new IllegalArgumentException(s"A long is exactly 8 bytes: ${b.length}")
    java.nio.ByteBuffer.wrap(b).getLong
  }

  def longBytes(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(v).array()

  /** Order-reversing byte encoding for the fork's FreshTimestampType
    * (descending byte order with the EMPTY array sorting first = "freshest";
    * db/marshal/FreshTimestampType.java:22-60). Ascending unsigned-lex
    * comparison of the encoded form reproduces that order exactly:
    *   empty → [0x00]            (sorts before everything)
    *   b     → 0x01 ++ ~b ++ 0xFF (complement reverses order; the 0xFF
    *            terminator makes a longer run sort BEFORE its prefix,
    *            i.e. prefix-extension order is reversed too)
    */
  def binaryNot(b: Array[Byte]): Array[Byte] = {
    if (b.length == 0) return Array[Byte](0)
    val out = new Array[Byte](b.length + 2)
    out(0) = 1.toByte
    var i = 0
    while (i < b.length) { out(i + 1) = (~b(i)).toByte; i += 1 }
    out(b.length + 1) = 0xFF.toByte
    out
  }

  /** RandomPartitioner token: abs(BigInteger(md5(key))) as a 16-byte
    * big-endian unsigned value, so plain BinaryType comparison equals
    * BigInteger comparison (dht/RandomPartitioner.java:35-130; `hash` uses
    * FBUtilities.hash = md5, token = hash.abs()).
    */
  def md5AbsToken(key: Array[Byte]): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val big = new java.math.BigInteger(md.digest(key)).abs()
    val raw = big.toByteArray // <= 17 bytes (sign byte), big-endian
    val out = new Array[Byte](16)
    val src = if (raw.length > 16) raw.length - 16 else 0
    val dst = if (raw.length > 16) 0 else 16 - raw.length
    System.arraycopy(raw, src, out, dst, raw.length - src)
    out
  }

  /** 60-bit timestamp of a version-1 UUID given its 16 raw bytes
    * (db/marshal/TimeUUIDType.java:28-93 compares the reordered timestamp
    * fields: time_hi, time_mid, time_low).
    */
  def timeUuidTimestamp(b: Array[Byte]): Long = {
    if (b.length != 16)
      throw new IllegalArgumentException(s"UUIDs must be exactly 16 bytes: ${b.length}")
    val bb = java.nio.ByteBuffer.wrap(b)
    val msb = bb.getLong
    // v1 layout: time_low(32) time_mid(16) version(4) time_hi(12)
    val timeLow = (msb >>> 32) & 0xFFFFFFFFL
    val timeMid = (msb >>> 16) & 0xFFFFL
    val timeHi = msb & 0x0FFFL
    (timeHi << 48) | (timeMid << 32) | timeLow
  }

  /** en_US collation key bytes (dht/CollatingOrderPreservingPartitioner). */
  def collationKey(s: org.apache.spark.unsafe.types.UTF8String): Array[Byte] =
    CollatorHolder.collator.getCollationKey(s.toString).toByteArray

  /** Fused dot product of two numeric arrays (shorter length wins —
    * mirrors the zip_with truncation semantics it replaces). Element
    * types are resolved at ANALYSIS time (ArrayData does not carry
    * them); the constant flags JIT-fold the branches away.
    */
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData,
      aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** Fused cosine similarity over two float ArrayData, double accumulation
    * left-to-right — numerically identical to
    * `aggregate(zip_with(a,b,(x,y)->x*y), 0d, (acc,v)->acc+v) / (sqrt(...)*sqrt(...))`.
    */
  def cosine(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    var j = n
    while (j < a.numElements()) { val x = a.getFloat(j).toDouble; na += x * x; j += 1 }
    j = n
    while (j < b.numElements()) { val y = b.getFloat(j).toDouble; nb += y * y; j += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Unicode NFC normalization (canonical composition). ASCII fast path:
    * Normalizer.isNormalized is O(n) with no allocation, and ASCII (the
    * bulk of web text) is always NFC — the common row never pays the
    * String round-trip.
    */
  def nfcNormalize(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** OdklDomainPartitioner token: the 2-hex-char "domain" (last two chars of
    * the key) moved to the front (dht/OdklDomainPartitioner.java:36-120).
    */
  def odklDomainToken(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val str = s.toString
    val dom = if (str.length >= 2) str.substring(str.length - 2) else str
    org.apache.spark.unsafe.types.UTF8String.fromString(dom + str)
  }
}

object RollingHash {
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Min over the 60-bit md5-prefix hashes of every k-codepoint sliding
    * window of `s` — the winnowing fingerprint, single pass. Semantics
    * identical to the SQL formulation
    * `array_min(transform(sequence(1, greatest(len-k+1, 1)),
    *   i -> conv(substring(md5(substring(s, i, k)), 1, 15), 16, 10)))`:
    * windows are slices over the RAW UTF-8 bytes at the same code-point
    * boundaries UTF8String.substringSQL walks (numBytesForFirstByte —
    * also correct on invalid UTF-8, where a String round-trip would
    * substitute U+FFFD and diverge), and the hash is the big-endian
    * 60-bit digest prefix (= the first 15 hex chars read as an integer).
    * Hot-path clean: thread-local digest, no per-window allocation.
    */
  def rollingMin(s: org.apache.spark.unsafe.types.UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    // code-point start offsets via the same lead-byte walk UTF8String uses
    val starts = new Array[Int](bytes.length + 1)
    var i = 0
    var n = 0
    while (i < bytes.length) {
      starts(n) = i
      n += 1
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts(n) = bytes.length
    val md = digestTL.get()
    val out = new Array[Byte](16)
    val nWindows = math.max(n - k + 1, 1)
    var minV = Long.MaxValue
    var w = 0
    while (w < nWindows) {
      val start = starts(w)
      val end = starts(math.min(w + k, n))
      md.reset()
      md.update(bytes, start, end - start)
      md.digest(out, 0, 16)
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (out(j) & 0xFFL); j += 1 }
      v = (v << 4) | ((out(7) & 0xFFL) >>> 4) // 60-bit big-endian prefix
      if (v < minV) minV = v
      w += 1
    }
    minV
  }
}

object CollatorHolder {
  val collator: java.text.Collator = java.text.Collator.getInstance(java.util.Locale.US)
}

/** binary(8, big-endian) → signed long. Codegen-friendly. */
case class BigEndianLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "be_long"
  override protected def nullSafeEval(v: Any): Any =
    ExprHelpers.beLong(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprHelpers.beLong($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing rolling-hash fingerprint of a string (min 60-bit md5-prefix
  * over k-codepoint windows) — one fused pass in codegen instead of the
  * transform + array_min allocation per row.
  */
case class RollingMinHash(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"
  override protected def nullSafeEval(v: Any): Any =
    RollingHash.rollingMin(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.rollingMin($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** long → binary(8, big-endian). */
case class LongToBytesBE(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "be_bytes"
  override protected def nullSafeEval(v: Any): Any =
    ExprHelpers.longBytes(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprHelpers.longBytes($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** binary → bitwise-NOT binary (+0x00 sentinel) for descending byte order. */
case class BinaryNot(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "binary_not"
  override protected def nullSafeEval(v: Any): Any =
    ExprHelpers.binaryNot(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprHelpers.binaryNot($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** binary key bytes → 16-byte abs(BigInteger(md5)) RandomPartitioner token. */
case class Md5AbsToken(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "md5_abs_token"
  override protected def nullSafeEval(v: Any): Any =
    ExprHelpers.md5AbsToken(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprHelpers.md5AbsToken($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** binary(16) v1 UUID → embedded 60-bit timestamp (long). */
case class TimeUuidTimestamp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "timeuuid_ts"
  override protected def nullSafeEval(v: Any): Any =
    ExprHelpers.timeUuidTimestamp(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprHelpers.timeUuidTimestamp($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** string → en_US collation key bytes. */
case class CollationKeyBytes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "collation_key"
  override protected def nullSafeEval(v: Any): Any =
    ExprHelpers.collationKey(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprHelpers.collationKey($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Cosine similarity of two float-array columns, double accumulation,
  * left-to-right (bit-identical to the `aggregate(zip_with(...))` SQL
  * formulation it replaces — asserted in PipelineSpec). A fused native
  * loop: one pass, three accumulators, no intermediate array allocation —
  * the SQL version materializes the zipped product array per row, which
  * is the dominant cost on 100k+-vector scans.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprHelpers.cosine(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ExprHelpers.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product of two double-array columns — the fused-loop sibling of
  * [[CosineSimilarity]] for PRE-normalized inputs (e.g. the head-slice
  * prefilter bound in pipeline/Similarity.semanticPairs, where the arrays
  * are already scaled by the full vector norm and re-normalizing would be
  * wrong). No intermediate array allocation — the `aggregate(zip_with())`
  * SQL formulation it replaces allocates the product array per PAIR,
  * which dominates on quadratic within-cell joins (measured 4.8x slower
  * in the round-8 ScaleProbe before this expression).
  */
case class DotProduct(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"graft_dot expects array<float|double> operands, got $other")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprHelpers.dot(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      isFloat(left), isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ExprHelpers.dot($a, $b, ${isFloat(left)}, ${isFloat(right)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** string → Unicode-NFC-normalized string (codegen'd; ASCII rows pass
  * through without allocation).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(v: Any): Any =
    ExprHelpers.nfcNormalize(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprHelpers.nfcNormalize($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** string key → OdklDomain token string. */
case class OdklDomainToken(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "odkl_domain_token"
  override protected def nullSafeEval(v: Any): Any =
    ExprHelpers.odklDomainToken(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprHelpers.odklDomainToken($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
