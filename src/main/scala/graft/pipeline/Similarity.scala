package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine is the exact baseline: a broadcast of the query
  * vector + a codegen'd `aggregate(zip_with(...))` dot product — a single
  * scan, no shuffle, embarrassingly parallel at 100 TB.
  *
  * The scale path is IVF-style cell restriction: searching only the
  * query's coarse cell (here the `label` column stands in for a centroid
  * assignment) cuts the scan by the number of cells; the same top-k runs
  * within the cell.
  */
object Similarity {

  /** Cosine similarity of two array<float> columns via the native fused
    * CosineSimilarity expression (double accumulation, left-to-right —
    * bit-identical to the SQL `aggregate(zip_with(...))` formulation, see
    * cosineSql, but without the per-row product-array allocation).
    */
  def cosine(a: String, b: String): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", col(a), col(b))

  /** Reference SQL formulation (kept for the equivalence spec). */
  def cosineSql(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       | CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
       | / (sqrt(aggregate($a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))
       |    * sqrt(aggregate($b, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))""".stripMargin)

  /** Exact top-k by cosine against the single query row `queryDf(q)`.
    * Distributed top-k (TakeOrdered), then rank assignment on the k rows.
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryDf: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val scored = df.crossJoin(broadcast(queryDf))
      .withColumn("sim", cosine(vecCol, "q"))
      .select(col(idCol).as("id"), col("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
    scored.withColumn("rank", row_number().over(
      Window.orderBy(col("sim").desc, col("id"))))
  }

  /** IVF-style ANN: restrict to the query's coarse cell, then exact top-k
    * within it.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, cellCol: String,
      queryDf: DataFrame, k: Int): DataFrame = {
    val cell = queryDf.select(col("qcell"))
    bruteForceTopK(
      df.join(broadcast(cell), df(cellCol) === col("qcell"), "left_semi"),
      idCol, vecCol, queryDf, k)
  }

  /** Embedding near-dup mining: the single most-similar pair per cell
    * (all-pairs within a cell — cells bound the quadratic term).
    */
  def topPairPerCell(df: DataFrame, idCol: String, vecCol: String, cellCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val a = df.select(col(cellCol).as("cell"), col(idCol).as("ia"), col(vecCol).as("va"))
    val b = df.select(col(cellCol).as("cell"), col(idCol).as("ib"), col(vecCol).as("vb"))
    val pairs = a.join(b, Seq("cell")).filter(col("ia") < col("ib"))
      .withColumn("sim", cosine("va", "vb"))
    pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("sim").desc, col("ia"), col("ib"))))
      .filter(col("rn") === 1)
      .select(col("cell"), col("ia"), col("ib"))
  }
}
