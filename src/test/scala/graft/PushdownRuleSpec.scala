package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.CfMeta
import graft.sources.CellStore

/** The PushBeLongComparisons optimizer rule: user-level predicates on the
  * decoded sort key gain scan-pushable raw-byte conjuncts.
  */
class PushdownRuleSpec extends SparkSpec {

  private lazy val storeDir: String = {
    val dir = Files.createTempDirectory("graft_rule").toString
    val cells = (-5L to 40L).map(v =>
      graft.model.Cell("k1", null, bl(v), b(s"v$v"), 1, tombstone = false, 0))
    CellStore.write(cellsDf(cells), CfMeta("t"), s"$dir/s", numPartitions = 2)
    s"$dir/s"
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("equality on graft_be_long pushes a byte EqualTo (any sign)") {
    val df = spark.read.parquet(storeDir)
      .filter(expr("graft_be_long(col_name) = -3"))
    assert(planOf(df).contains("EqualTo(col_name"), planOf(df).take(2000))
    assert(df.count() == 1)
  }

  test("non-negative BETWEEN on graft_be_long pushes byte range bounds") {
    val df = spark.read.parquet(storeDir)
      .filter(expr("graft_be_long(col_name) >= 10 AND graft_be_long(col_name) < 20"))
    val p = planOf(df)
    assert(p.contains("GreaterThanOrEqual(col_name") && p.contains("LessThan(col_name"), p.take(2000))
    assert(df.count() == 10)
  }

  test("range with a negative bound adds NO byte hint (byte order diverges)") {
    val df = spark.read.parquet(storeDir)
      .filter(expr("graft_be_long(col_name) >= -2 AND graft_be_long(col_name) <= 2"))
    val p = planOf(df)
    assert(!p.contains("GreaterThanOrEqual(col_name"), p.take(2000))
    assert(df.count() == 5) // semantics unchanged: -2..2
  }

  test("results are identical with and without the rule") {
    val expected = (0L to 15L).toSet
    val got = spark.read.parquet(storeDir)
      .filter(expr("graft_be_long(col_name) BETWEEN 0 AND 15"))
      .select(graft.functions.GraftFunctions.beLong(col("col_name")))
      .collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }
}
