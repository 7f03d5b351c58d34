package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Cell

/** Shared local session per suite (one JVM-wide session; suites reuse it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.create("local[4]")

  def cellsDf(cells: Seq[Cell]): DataFrame = {
    import spark.implicits._
    cells.toDF()
  }

  def b(s: String): Array[Byte] = s.getBytes("UTF-8")
  def bl(v: Long): Array[Byte] = graft.functions.ExprHelpers.longBytes(v)

  /** Live insert cell. */
  def ins(key: String, col: String, value: String, ts: Long,
      sup: String = null): Cell =
    Cell(key, Option(sup).map(b).orNull, b(col), b(value), ts, tombstone = false, 0)

  /** Column tombstone. */
  def del(key: String, col: String, ts: Long, ldt: Int = 1000,
      sup: String = null): Cell =
    Cell(key, Option(sup).map(b).orNull, b(col), Array.emptyByteArray, ts,
      tombstone = true, ldt)

  /** Row tombstone marker. */
  def delRow(key: String, ts: Long, ldt: Int = 1000): Cell =
    Cell(key, null, null, Array.emptyByteArray, ts, tombstone = true, ldt)

  /** Supercolumn tombstone marker. */
  def delSuper(key: String, sup: String, ts: Long, ldt: Int = 1000): Cell =
    Cell(key, b(sup), null, Array.emptyByteArray, ts, tombstone = true, ldt)

  def liveNames(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions._
    df.select(decode(col("col_name"), "UTF-8")).collect().map(_.getString(0)).toSeq
  }

  def liveValues(df: DataFrame): Map[String, String] = {
    import org.apache.spark.sql.functions._
    df.select(decode(col("col_name"), "UTF-8"), decode(col("value"), "UTF-8"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }
}
