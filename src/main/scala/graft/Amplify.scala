package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-probe data amplifier: writes a `mult`× copy of a testdata
  * scale factor under an output dir (NEVER under /root/testdata) so the
  * bench suite can be run one scale factor up and slopes recorded in
  * SCALE.md. Amplification is key-shifted so cardinalities actually
  * scale (a naive union of identical rows would just deepen LWW piles):
  *
  *  - orders/lineitem: order/customer keys offset per replica (lineitem
  *    stays join-consistent with orders);
  *  - events: user_id/event_id offset — 10× users over the same time
  *    range (a bigger site, not a longer history);
  *  - documents: doc_id offset; replica 0 keeps its text, replicas > 0
  *    get a per-replica deterministic token SHUFFLE (sort by
  *    xxhash64(token ‖ replica)) — same token statistics, distinct
  *    n-gram shingles, so dedup legs see a mostly-distinct corpus like
  *    a real 10× crawl instead of a 10-deep duplicate pile. The
  *    optional `salt` mode instead REMAPS each replica's vocabulary
  *    (token → token‖"_r" per replica > 0): replicas share NO tokens,
  *    so cross-replica near-dup/bucket density drops to zero — the
  *    honest model of "10× more DISTINCT content". Shuffle keeps token
  *    statistics (and thus inflates shingle/bucket collision density at
  *    10×, overstating dedup slopes); salt keeps per-replica zipf shape
  *    but makes vocabulary grow with corpus. Record BOTH slopes: real
  *    crawls sit between them;
  *  - embeddings: vec_id offset, vectors kept (ANN/k-means cost scales
  *    with row count, not vector identity);
  *  - dims (region/nation/customer/supplier/part): copied through
  *    UNCHANGED — amplified orders reference customer keys that do not
  *    exist in the copied dim (no bench leg joins them today; a future
  *    dim-join leg must amplify customer with the o_custkey stride).
  *
  * Usage: `runMain graft.Amplify <srcSfDir> <outDir> <mult> [shuffle|salt]`.
  */
object Amplify {
  private def replicas(spark: SparkSession, mult: Int): DataFrame =
    spark.range(mult).select(col("id").cast("long").as("__rep"))

  /** Union of `mult` key-shifted copies: each (column, base) gets
    * `+ __rep * base` so replica key spaces never collide. Bases are
    * passed in (not derived per table) so columns that must stay
    * JOIN-CONSISTENT across tables — l_orderkey vs o_orderkey — shift
    * by the SAME stride.
    */
  private def amplify(spark: SparkSession, df: DataFrame, mult: Int,
      offsets: Seq[(String, Long)]): DataFrame =
    offsets.foldLeft(df.crossJoin(replicas(spark, mult))) {
      case (d, (c, base)) =>
        d.withColumn(c, col(c) + col("__rep") * lit(base))
    }.drop("__rep")

  private def keyBase(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    val Array(src, out, multS) = args.take(3)
    val mult = multS.toInt
    val textMode = if (args.length > 3) args(3) else "shuffle"
    require(textMode == "shuffle" || textMode == "salt",
      s"text mode must be shuffle|salt, got $textMode")
    require(!out.startsWith("/root/testdata"), "never write under testdata")
    val spark = GraftSession.create(taskSideCommit = true)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      // count from footer metadata, not a second full scan of the output
      val n = spark.read.parquet(s"$out/$name.parquet").count()
      println(s"[amplify] $name: $n rows")
    }
    // each source is read by the key-base aggregate AND the amplified
    // write — one lazy checkpoint per table instead of a rescan each use
    val tblCache = scala.collection.mutable.Map.empty[String, DataFrame]
    def tbl(name: String): DataFrame = tblCache.getOrElseUpdate(name,
      spark.read.parquet(s"$src/$name.parquet").localCheckpoint(eager = false))

    // ONE orderkey stride shared by orders and lineitem so the amplified
    // tables stay join-consistent replica by replica
    val orderBase = keyBase(tbl("orders"), "o_orderkey")
    write("orders", amplify(spark, tbl("orders"), mult,
      Seq("o_orderkey" -> orderBase,
        "o_custkey" -> keyBase(tbl("orders"), "o_custkey"))))
    write("lineitem", amplify(spark, tbl("lineitem"), mult,
      Seq("l_orderkey" -> orderBase)))
    write("events", amplify(spark, tbl("events"), mult,
      Seq("event_id" -> keyBase(tbl("events"), "event_id"),
        "user_id" -> keyBase(tbl("events"), "user_id"))))
    // documents: shuffle tokens per replica > 0 (deterministic) so the
    // amplified corpus is shingle-distinct, then recompute n_chars
    val docBase = keyBase(tbl("documents"), "doc_id")
    val docs = amplify(spark, tbl("documents"), mult, Seq("doc_id" -> docBase))
    val reText = if (textMode == "salt")
      // disjoint per-replica vocabulary: token -> token_r<replica>
      expr("""concat_ws(' ', transform(split(text, '\\s+'),
             |  t -> concat(t, '_r', CAST(__r AS STRING))))""".stripMargin)
    else
      expr("""concat_ws(' ', transform(array_sort(transform(
             |  split(text, '\\s+'),
             |  t -> struct(xxhash64(concat(t, CAST(__r AS STRING))) AS h, t AS t))),
             |  s -> s.t))""".stripMargin)
    val reworded = docs
      .withColumn("__r", (col("doc_id") / lit(docBase)).cast("long"))
      .withColumn("text", when(col("__r") === 0L, col("text")).otherwise(reText))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__r")
    write("documents", reworded)
    write("embeddings", amplify(spark, tbl("embeddings"), mult,
      Seq("vec_id" -> keyBase(tbl("embeddings"), "vec_id"))))
    write("customer", tbl("customer"))
    write("supplier", tbl("supplier"))
    write("part", tbl("part"))
    write("region", tbl("region"))
    write("nation", tbl("nation"))
    spark.stop()
  }
}
