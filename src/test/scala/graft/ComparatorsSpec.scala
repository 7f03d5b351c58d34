package graft

import org.apache.spark.sql.functions._

import graft.api.JComparators
import graft.model.{Comparators, ComparatorType}

/** Comparator-order conformance: the Spark sortKey ordering must equal the
  * reference byte-level comparators on random vectors — the property the
  * reference only exercises via db/NameSortTest, db/TimeSortTest,
  * db/marshal/TypeCompareTest.
  */
class ComparatorsSpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  /** Sort byte-arrays through a Spark DataFrame using the comparator's
    * sortKey and compare with the driver-side reference ordering.
    */
  private def checkOrder(cmp: ComparatorType.Value, vectors: Seq[Array[Byte]]): Unit = {
    import spark.implicits._
    val df = vectors.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "name")
    val sparkOrder = df
      .withColumn("_sk", Comparators.sortKey(cmp, col("name")))
      .orderBy(col("_sk").asc_nulls_first, col("i")) // i breaks exact ties deterministically
      .select("i").collect().map(_.getLong(0)).toSeq
    val ord = JComparators.ordering(cmp)
    val refOrder = vectors.zipWithIndex
      .sortWith { case ((a, ia), (b, ib)) =>
        val c = ord.compare(a, b); if (c != 0) c < 0 else ia < ib }
      .map(_._2.toLong)
    assert(sparkOrder == refOrder, s"comparator $cmp ordering diverged")
  }

  test("BytesType: unsigned lexicographic order incl. high-bit bytes") {
    val vs = Seq.fill(200)(Array.fill(rnd.nextInt(6))(rnd.nextInt(256).toByte)) ++
      Seq(Array.emptyByteArray, Array(0x7F.toByte), Array(0x80.toByte), Array(0xFF.toByte))
    checkOrder(ComparatorType.Bytes, vs)
  }

  test("LongType: signed numeric order of 8-byte BE names (db/TimeSortTest shape)") {
    val vs = Seq.fill(200)(bl(rnd.nextLong())) ++
      Seq(bl(Long.MinValue), bl(-1L), bl(0L), bl(1L), bl(Long.MaxValue))
    checkOrder(ComparatorType.Long_, vs)
  }

  test("TimeUUIDType: order by embedded 60-bit timestamp then bytes") {
    def v1uuid(ts: Long, clock: Int): Array[Byte] = {
      val timeLow = ts & 0xFFFFFFFFL
      val timeMid = (ts >>> 32) & 0xFFFFL
      val timeHi = ((ts >>> 48) & 0x0FFFL) | 0x1000L // version 1
      val msb = (timeLow << 32) | (timeMid << 16) | timeHi
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putLong(msb); bb.putLong(0x8000000000000000L | clock.toLong)
      bb.array()
    }
    val vs = Seq.fill(200)(v1uuid(rnd.nextLong() & 0x0FFFFFFFFFFFFFFFL, rnd.nextInt(1000)))
    checkOrder(ComparatorType.TimeUuid, vs)
  }

  test("LexicalUUIDType: signed msb/lsb order") {
    val vs = Seq.fill(200) {
      val bb = java.nio.ByteBuffer.allocate(16)
      bb.putLong(rnd.nextLong()); bb.putLong(rnd.nextLong()); bb.array()
    }
    checkOrder(ComparatorType.LexicalUuid, vs)
  }

  test("FreshTimestampType: descending byte order, empty first (fork)") {
    val vs = Seq.fill(200)(Array.fill(rnd.nextInt(10))(rnd.nextInt(256).toByte)) ++
      Seq(Array.emptyByteArray, Array(0x00.toByte), Array(0xFF.toByte))
    checkOrder(ComparatorType.FreshTimestamp, vs)
    // explicit: empty sorts FIRST (freshest), larger bytes before smaller
    val ord = JComparators.ordering(ComparatorType.FreshTimestamp)
    assert(ord.compare(Array.emptyByteArray, Array(0xFF.toByte)) < 0)
    assert(ord.compare(Array(0xFF.toByte), Array(0x00.toByte)) < 0)
  }

  test("FreshTimestamp prefix rule: longer run sorts before its prefix") {
    // descending semantics: 0x01 02 is "larger" than 0x01 ⇒ comes first
    val ord = JComparators.ordering(ComparatorType.FreshTimestamp)
    assert(ord.compare(Array[Byte](1, 2), Array[Byte](1)) < 0)
    checkOrder(ComparatorType.FreshTimestamp,
      Seq(Array[Byte](1), Array[Byte](1, 2), Array[Byte](1, 2, 3), Array[Byte](2)))
  }

  test("RandomPartitioner token: 16-byte binary order == BigInteger.abs(md5) order") {
    import spark.implicits._
    val keys = Seq.fill(300)(rnd.alphanumeric.take(rnd.nextInt(12) + 1).mkString)
    val df = keys.zipWithIndex.toDF("key", "i")
    val sparkOrder = df
      .withColumn("t", graft.model.Tokens.token(graft.model.PartitionerType.Random, col("key")))
      .orderBy(col("t"), col("i")).select("i").collect().map(_.getInt(0)).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def tok(k: String): BigInt = {
      md.reset(); BigInt(new java.math.BigInteger(md.digest(k.getBytes("UTF-8"))).abs())
    }
    val refOrder = keys.zipWithIndex
      .sortWith { case ((a, ia), (b, ib)) =>
        val c = tok(a).compare(tok(b)); if (c != 0) c < 0 else ia < ib }
      .map(_._2)
    assert(sparkOrder == refOrder)
  }

  test("OdklDomain token moves the 2-char domain to the front") {
    import spark.implicits._
    val df = Seq("0000000123").toDF("key")
    val t = df.select(graft.model.Tokens.token(
      graft.model.PartitionerType.OdklDomain, col("key"))).head().getString(0)
    assert(t == "230000000123")
  }
}
