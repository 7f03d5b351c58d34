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

  /** Batched ANN: exact top-k per QUERY for a whole query set at once —
    * the training-pipeline shape (dedup a new shard against the corpus,
    * retrieve neighbors for every example). Queries broadcast; the
    * per-query rank is a window partitioned BY QUERY, so WindowGroupLimit
    * pre-filters each map partition to k candidates per query before the
    * shuffle — cost is |corpus| × |queries| scores but only k × |queries|
    * shuffled rows.
    */
  def topKPerQuery(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val scored = df.crossJoin(broadcast(
        queries.select(col(queryIdCol).as("qid"), col(queryVecCol).as("q"))))
      .withColumn("sim", cosine(vecCol, "q"))
      .select(col("qid"), col(idCol).as("id"), col("sim"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"))
  }

  /** The nDCG discount table at micro-scale: disc(i) = ⌊1e6 / log₂(i+1)⌋
    * for ranks 1..k — computed ONCE at plan-build time and embedded as
    * the SAME literal integers into both the Spark plan and the oracle
    * SQL (via [[ndcgDiscountSqlCase]] / [[ndcgIdcgSqlList]]), so the
    * transcendental log never runs inside either engine and the eval is
    * exact integer arithmetic end to end.
    */
  private[graft] def dcgDiscountsMicro(k: Int): Array[Long] =
    (1 to k).map(i =>
      math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0))).toLong).toArray

  /** SQL CASE over the rank column with the [[dcgDiscountsMicro]]
    * literals — the oracle-side face of the one discount table.
    */
  private[graft] def ndcgDiscountSqlCase(rankCol: String, k: Int): String =
    dcgDiscountsMicro(k).zipWithIndex
      .map { case (d, i) => s"WHEN ${i + 1} THEN $d" }
      .mkString(s"CASE $rankCol ", " ", " ELSE 0 END")

  /** SQL list literal of the CUMULATIVE discount sums (idcg of a query
    * with j relevant docs = element j) — again the same integers.
    */
  private[graft] def ndcgIdcgSqlList(k: Int): String =
    dcgDiscountsMicro(k).scanLeft(0L)(_ + _).drop(1)
      .mkString("[", ", ", "]")

  /** Graded-ranking retrieval eval: nDCG@k of the brute-force cosine
    * ranking where a pool item is relevant iff it shares the query's
    * `labelCol` (the standard labeled-corpus protocol). Per query:
    * n_rel (relevant items in the POOL), dcg_micro = Σ rel_i·disc(i)
    * over the top-k, idcg_micro = Σ_{i≤min(n_rel,k)} disc(i), and
    * ndcg_micro = 1e6·dcg div idcg — ALL exact integers: similarities
    * micro-quantize before ranking (ties break by id), the discount
    * table is literal ([[dcgDiscountsMicro]]), and idcg is a literal
    * cumulative-array lookup. Queries with n_rel = 0 drop (nDCG is
    * undefined there). Returns (qid, n_rel, dcg_micro, idcg_micro,
    * ndcg_micro).
    *
    * Scale shape: queries broadcast against one pool pass; ranking is
    * the per-query WindowGroupLimit top-k; n_rel comes from a
    * label-histogram join (labels-sized), never a second pool pass.
    */
  def ndcgLabelEval(pool: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, queryLabelCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k $k outside [1,1000]")
    graft.functions.GraftFunctions.register(pool.sparkSession)
    val p = pool.select(col(idCol).as("id"), col(vecCol).as("v"),
      col(labelCol).as("label")).localCheckpoint(false) // scored + histogram
    val q = queries.select(col(queryIdCol).as("qid"),
      col(queryVecCol).as("qv"), col(queryLabelCol).as("qlabel"))
    val ranked = p.crossJoin(broadcast(q))
      .withColumn("sm", round(cosine("v", "qv") * 1e6).cast("long"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sm").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"))
    ndcgOfRanking(ranked, p.select(col("id"), col("label")),
      q.select(col("qid"), col("qlabel")), k)
  }

  /** The ONE nDCG scorer any ranking plugs into — [[ndcgLabelEval]]'s
    * brute-force cosine and the hybrid retriever's fused ranks (p189)
    * both score through this, so the discount arithmetic cannot drift
    * between evals. `ranked` = (qid, rank, id) with rank 1-based ≤ k;
    * `items` = (id, label) for the POOL (n_rel counts over it);
    * `queries` = (qid, qlabel). Integer end to end — see
    * [[dcgDiscountsMicro]].
    */
  def ndcgOfRanking(ranked: DataFrame, items: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k $k outside [1,1000]")
    val disc = dcgDiscountsMicro(k)
    val idcgArr = array(disc.scanLeft(0L)(_ + _).drop(1).map(lit): _*)
    val discExpr = disc.zipWithIndex.foldLeft(lit(0L)) { case (acc, (d, i)) =>
      when(col("rank") === (i + 1), lit(d)).otherwise(acc)
    }
    val dcg = ranked
      .join(items.select(col("id"), col("label")), Seq("id"), "left")
      .join(broadcast(queries.select(col("qid"), col("qlabel"))), Seq("qid"))
      .groupBy(col("qid"), col("qlabel"))
      .agg(sum(when(col("label") === col("qlabel"), discExpr)
        .otherwise(0L)).as("dcg_micro"))
    val relCounts = items.groupBy(col("label").as("qlabel"))
      .agg(count(lit(1)).as("n_rel"))
    dcg.join(broadcast(relCounts), Seq("qlabel"))
      .filter(col("n_rel") > 0)
      .withColumn("idcg_micro",
        element_at(idcgArr, least(col("n_rel"), lit(k.toLong)).cast("int")))
      .select(col("qid"), col("n_rel"), col("dcg_micro"), col("idcg_micro"),
        expr("dcg_micro * 1000000 div idcg_micro").as("ndcg_micro"))
  }

  /** Cross-corpus margin-based alignment mining (the bitext-mining
    * criterion of Artetxe & Schwenk: a pair is aligned when its
    * similarity clearly exceeds what each side scores against its OTHER
    * near neighbors — a raw cosine threshold can't separate "true
    * translation" from "dense hub region", the ratio margin can).
    * For each source vector: its best target in the shared coarse cell,
    * kept iff  s(x,y) / ((avgK(x)+avgK(y))/2) ≥ τ, where avgK is the
    * mean of the side's top-`kMargin` scores. Returns
    * (src_id, dst_id, s_micro, margin_permille).
    *
    * Scale shape: candidates ONLY within the shared cell (the IVF-style
    * pruning every part of this engine's ANN family uses — Σ|cellA|·
    * |cellB| pairs, never |A|·|B|); two per-side WindowGroupLimit-shaped
    * rank windows and two bounded sum-aggregates; the scored frame is
    * lazily checkpointed once for its three consumers.
    *
    * Cross-engine exactness: per-pair scores micro-quantize to
    * round(1e6·cos) BEFORE any sum (the integer-quantization contract —
    * top-k sums become exact BIGINT arithmetic), and the margin gate is
    * the cross-multiplied integer inequality
    * 2·s·1000·ka·kb ≥ τ‰·(sumA·kb + sumB·ka), so no float division
    * anywhere. Passed rows have both sides positive, where Spark's
    * truncating `div` and a flooring SQL `//` agree on margin_permille.
    */
  def marginMine(src: DataFrame, dst: DataFrame, idCol: String,
      vecCol: String, cellCol: String, kMargin: Int,
      tauPermille: Int, checkpointShared: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(src.sparkSession)
    require(kMargin >= 1, "kMargin >= 1")
    val a = src.select(col(cellCol).as("cell"), col(idCol).as("ia"),
      col(vecCol).as("va"))
    val b = dst.select(col(cellCol).as("cell"), col(idCol).as("ib"),
      col(vecCol).as("vb"))
    // zero-norm vectors make the cosine NaN, and round(NaN).cast(long)
    // THROWS under codegen (CAST_OVERFLOW) — map NaN to the −2.0
    // sentinel (below any real cosine): such pairs rank last everywhere
    // and the τ>0 / den>0 gates exclude them from the output. An oracle
    // over data containing zero vectors needs the same coalesce.
    val ranked0 = a.join(b, Seq("cell"))
      .withColumn("s",
        round(nanvl(cosine("va", "vb"), lit(-2.0)) * lit(1e6)).cast("long"))
      .select(col("ia"), col("ib"), col("s"))
      .withColumn("ra", row_number().over(
        Window.partitionBy(col("ia")).orderBy(col("s").desc, col("ib"))))
      .withColumn("rb", row_number().over(
        Window.partitionBy(col("ib")).orderBy(col("s").desc, col("ia"))))
    // three consumers below — compute once. checkpointShared=false exists
    // for PLAN INSPECTION only (a checkpoint rewrites the lineage to
    // Scan ExistingRDD, hiding the candidate join from plan assertions)
    val ranked = if (checkpointShared) ranked0.localCheckpoint(false) else ranked0
    val sumA = ranked.filter(col("ra") <= kMargin).groupBy(col("ia"))
      .agg(sum(col("s")).as("suma"), count(lit(1)).as("ka"))
    val sumB = ranked.filter(col("rb") <= kMargin).groupBy(col("ib"))
      .agg(sum(col("s")).as("sumb"), count(lit(1)).as("kb"))
    ranked.filter(col("ra") === 1)
      .join(sumA, Seq("ia")).join(sumB, Seq("ib"))
      .withColumn("num", lit(2L) * col("s") * 1000L * col("ka") * col("kb"))
      .withColumn("den", col("suma") * col("kb") + col("sumb") * col("ka"))
      .filter(col("den") > 0L && col("num") >= lit(tauPermille.toLong) * col("den"))
      .select(col("ia").as("src_id"), col("ib").as("dst_id"),
        col("s").as("s_micro"),
        expr("num DIV den").as("margin_permille"))
  }

  /** Recall@k EVALUATION of a cell-restricted (IVF-style) search against
    * exact brute force, per query: `hits` = |approx top-k ∩ exact top-k|,
    * `recall_permille` = 1000·hits/k (floor). The eval every ANN
    * deployment needs before trusting its index parameters (nprobe /
    * cell count): run it on a query SAMPLE, not the corpus — the exact
    * side is a full scan per query batch, which is the point (ground
    * truth), and queries broadcast so the scan happens ONCE for all of
    * them (|corpus| × |queries| scores, k × |queries| shuffled rows via
    * WindowGroupLimit, same shape as [[topKPerQuery]]). The approx side
    * joins corpus to queries on the cell key — a broadcast hash join that
    * prunes to the query's cell before any distance math, exactly what
    * the index does at serve time.
    *
    * Ties in cosine break by ascending id on BOTH sides, so the compared
    * top-k SETS are deterministic. Queries with an empty cell (or fewer
    * than k cell-mates) score hits over whatever the approx side returned
    * — recall degrades honestly rather than erroring.
    */
  def recallAtK(df: DataFrame, idCol: String, vecCol: String, cellCol: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      queryCellCol: String, k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    require(k >= 1, "k >= 1")
    val exact = topKPerQuery(df, idCol, vecCol, queries, queryIdCol, queryVecCol, k)
    val q = broadcast(queries.select(col(queryIdCol).as("qid"),
      col(queryVecCol).as("q"), col(queryCellCol).as("qcell")))
    val approx = df.join(q, df(cellCol) === col("qcell"))
      .withColumn("sim", cosine(vecCol, "q"))
      .select(col("qid"), col(idCol).as("id"), col("sim"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("id"))
    val hits = exact.select(col("qid"), col("id"))
      .join(approx, Seq("qid", "id"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
    queries.select(col(queryIdCol).as("qid"))
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), lit(k.toLong).as("k"),
        coalesce(col("hits"), lit(0L)).as("hits"))
      .withColumn("recall_permille", expr(s"hits * 1000 DIV $k"))
  }

  // ---- real IVF: k-means|| -style coarse quantizer + nprobe search ----

  /** A SQL DOUBLE literal EXACTLY equal to the float's double value:
    * 17 significant digits round-trip any double, and Locale.ROOT keeps
    * the decimal point a '.' on comma-decimal JVMs (the f"" interpolator
    * is locale-sensitive). Driver-side arithmetic (nearestCells) uses
    * .toDouble on the same floats, so literal-based and driver-based
    * distance ranking agree bit-for-bit.
    */
  private def doubleLit(v: Float): String =
    "CAST(" + String.format(java.util.Locale.ROOT, "%.17e", Double.box(v.toDouble)) + " AS DOUBLE)"

  /** Squared-L2 distance of a vector column to a centroid literal —
    * expression-only (codegen'd), no UDF.
    */
  private def l2sq(vecCol: String, centroid: Array[Float]): Column = {
    val c = centroid.map(doubleLit).mkString("array(", ",", ")")
    expr(
      s"""aggregate(zip_with($vecCol, $c, (x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)),
         | CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
  }

  /** Nearest-centroid assignment as a `least(struct(dist, idx))` over the
    * (small) codebook — ties resolve to the lowest centroid id.
    */
  def assignCell(df: DataFrame, vecCol: String, centroids: Array[Array[Float]]): DataFrame = {
    val cands = centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(l2sq(vecCol, c).as("d"), lit(i).as("cell"))
    }
    df.withColumn("cell", least(cands: _*).getField("cell"))
  }

  /** Largest k [[trainCodebook]] accepts: it collects a k×dim float
    * codebook to the driver PER ITERATION and assigns through a k-wide
    * literal expression, so it is a SMALL-k tool by construction.
    * Larger codebooks must use the integer sufficient-statistics family
    * ([[kmeansStepExact]] / [[kmeansRefineDelta]] — the p86/p87/p92
    * path): shard-mergeable sums+counts, no driver vectors, exact
    * cross-engine arithmetic.
    */
  val SmallKMax: Int = 4096

  /** Train a SMALL-k centroid codebook with Lloyd iterations expressed
    * as DataFrame aggregations: assign (expression argmin) → elementwise
    * mean per cell (posexplode + avg) → collect the k×dim codebook
    * (tiny). Deterministic: seeds are the first k vectors in id order.
    * Bounded at [[SmallKMax]] — the loud gate steering large-k callers
    * to [[kmeansStepExact]]/[[kmeansRefineDelta]], which never collect
    * vectors to the driver.
    */
  def trainCodebook(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): Array[Array[Float]] = {
    require(k >= 1 && k <= SmallKMax,
      s"trainCodebook collects k x dim floats to the driver per iteration; " +
        s"k=$k exceeds SmallKMax=$SmallKMax - use the integer " +
        "kmeansStepExact/kmeansRefineDelta family for large codebooks")
    var centroids = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    for (_ <- 0 until iters) {
      val assigned = assignCell(df, vecCol, centroids)
      val means = assigned
        .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("ms"))
        .select(col("cell"), expr("transform(ms, s -> CAST(s.m AS FLOAT))").as("centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
    }
    centroids
  }

  /** Micro-quantized component table: one row per (vector, dimension)
    * with the component as round(x·1e6) BIGINT — the single quantization
    * step every integer-k-means path shares (one definition, no drift).
    */
  private def microComp(df: DataFrame, idCol: String, vecCol: String,
      idOut: String, valOut: String): DataFrame =
    df.select(col(idCol).as(idOut), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col(idOut), col("pos").cast("long").as("pos"),
        round(col("x").cast("double") * lit(1e6)).cast("long").as(valOut))

  /** Seed centroid component table (cluster, pos, cm): the k smallest-id
    * vectors, cluster = 0-based id order. k-row frame — the
    * single-partition rank window is bounded by construction.
    */
  private def seedComp(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    microComp(
      df.orderBy(col(idCol)).limit(k)
        .withColumn("cluster",
          row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col(idCol)))
            .cast("long") - 1L),
      "cluster", vecCol, "cluster", "cm")

  /** Argmin assignment of a component table against a centroid component
    * table: broadcast join on dimension, map-side partial aggregation of
    * per-(id, cluster) squared-L2 distances, then min over the
    * (d2, cluster) STRUCT — lexicographic struct ordering gives nearest
    * centroid with lowest-cluster tie-break and, unlike a packed
    * d2·k+cluster key, cannot overflow however large k·dim·|micro| grow.
    */
  private def assignComp(comp: DataFrame, centroidComp: DataFrame): DataFrame =
    // repartition by id FIRST (round 20): HashPartitioning(id) satisfies
    // both downstream aggregates' clustering, so the (id, cluster)
    // distance sum and the per-id argmin stack in ONE stage behind ONE
    // exchange — the r19 shape paid two aggregate exchanges (n·k then n
    // rows). The raw exchange ships n·dim component rows instead of
    // n·k partial-aggregated distances: at production codebook sizes
    // (suggestK ⇒ k ≈ 1200 ≫ dim) that is FEWER bytes as well as fewer
    // stages; results are bit-identical (exact integer sums, struct
    // argmin unchanged).
    comp.repartition(col("id"))
      .join(broadcast(centroidComp), Seq("pos"))
      .groupBy(col("id"), col("cluster"))
      .agg(sum((col("m") - col("cm")) * (col("m") - col("cm"))).as("d2"))
      .groupBy(col("id"))
      .agg(min(struct(col("d2"), col("cluster"))).as("km"))
      .select(col("id"), col("km.cluster").as("cluster"), col("km.d2").as("d2"))

  /** The `nProbe` nearest centroids per vector (not just the argmin) —
    * the multi-probe assignment: (id, cluster, crank) with crank 1 =
    * the home cell ([[assignExact]]'s answer), ties broken by cluster
    * id exactly like the argmin struct. Same exact-integer distance
    * lineage; the rank window is per-id over ≤ k rows.
    */
  def assignExactTopCells(df: DataFrame, idCol: String, vecCol: String,
      centroidComp: DataFrame, k: Int, nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= k, "1 <= nProbe <= k")
    // same one-exchange stacking as assignComp: the distance aggregate
    // AND the per-id rank window both run behind the single id exchange
    microComp(df, idCol, vecCol, "id", "m")
      .repartition(col("id"))
      .join(broadcast(centroidComp), Seq("pos"))
      .groupBy(col("id"), col("cluster"))
      .agg(sum((col("m") - col("cm")) * (col("m") - col("cm"))).as("d2"))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("d2"), col("cluster")))
        .cast("long"))
      .filter(col("crank") <= nProbe)
      .select(col("id"), col("cluster"), col("crank"))
  }

  /** One DISTRIBUTED Lloyd iteration in exact integer arithmetic — the
    * form that survives both 100 TB and a cross-engine oracle. Where
    * [[trainCodebook]] assigns through a k-wide literal expression and
    * collects the means (right for small codebooks), this never moves a
    * vector to the driver and assigns through a broadcast JOIN on the
    * component table, so k can grow far past expression-width limits.
    *
    * Exactness (the DSIR micro-quantization pattern): every component is
    * quantized once to round(x·1e6) BIGINT; squared-L2 distances, the
    * struct argmin, and the per-cluster component sums are then pure
    * integer arithmetic — bit-stable across engines, partitionings, and
    * aggregation orders. The only magnitude bound is the distance sum
    * itself: dim·(2·maxAbs·1e6)² < 2^63, i.e. fine through dim ~4096 at
    * |x| ≤ ~20 — far beyond embedding norms.
    *
    * Seeds are the k smallest-id vectors (rank = id order, 0-based).
    * Returns the new-centroid SUFFICIENT STATISTICS (cluster, pos,
    * sum_micro, n) — k·dim rows; callers derive means as sum_micro/(1e6·n)
    * (kept un-divided so the result stays exact and mergeable across
    * shards, the EstimatedHistogram-snapshot idea applied to centroids).
    *
    * Plan shape: one posexplode of the corpus (n·dim rows), one broadcast
    * join against the k·dim component table with map-side partial
    * aggregation of (id, cluster) distances, one per-id min, one broadcast
    * join back, one (cluster, pos) aggregate. No shuffle is corpus-wide
    * more than twice (the two aggregates), both key-balanced.
    */
  def kmeansStepExact(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val comp = microComp(df, idCol, vecCol, "id", "m")
      .localCheckpoint(eager = false) // feeds assignment AND the stats join
    clusterStats(comp, assignComp(comp, seedComp(df, idCol, vecCol, k)))
  }

  private def clusterStats(comp: DataFrame, assign: DataFrame): DataFrame =
    comp.join(assign.select(col("id"), col("cluster")), Seq("id"))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("m")).as("sum_micro"), count(lit(1)).as("n"))
      .select(col("cluster"), col("pos"), col("sum_micro"), col("n"))

  /** Cluster topic report — the corpus map every embedding-clustered
    * dataset ships with: the refined integer-k-means assignment joined
    * back to the documents' text, each cluster described by its size
    * and top distinctive terms ([[TextAnalysis.distinctiveTerms]] at
    * CLUSTER grain — tf within cluster, df across clusters, exact
    * rational score). Returns (cluster, n_docs, term, tf, df, score),
    * ≤ k·topTerms rows. The corpus pays the k-means passes plus one
    * tokenize aggregate; everything later is k-bounded.
    */
  def clusterTopics(emb: DataFrame, vecIdCol: String, vecCol: String,
      docs: DataFrame, docIdCol: String, textCol: String, k: Int,
      topTerms: Int): DataFrame = {
    val labeled = docs.select(col(docIdCol).as("id"), col(textCol).as("text"))
      .join(refinedAssign(emb, vecIdCol, vecCol, k), Seq("id"))
      .localCheckpoint(eager = false) // sizes + term scoring
    val sizes = labeled.groupBy(col("cluster")).agg(count(lit(1)).as("n_docs"))
    TextAnalysis.distinctiveTerms(
        labeled.select(col("cluster"), col("text")), "cluster", "text", topTerms)
      .withColumnRenamed("id", "cluster")
      .join(sizes, Seq("cluster"))
      .select(col("cluster"), col("n_docs"), col("term"), col("tf"),
        col("df"), col("score"))
  }

  /** The whole-corpus refined assignment (second Lloyd iteration:
    * step → refined centroids → assignExact) as (id, cluster) — the ONE
    * Spark-side definition the cluster-consuming compositions
    * ([[clusterTopics]], the cluster-balanced sampler) share, mirroring
    * the single refined-assignment CTE block their oracles share.
    */
  def refinedAssign(emb: DataFrame, vecIdCol: String, vecCol: String,
      k: Int): DataFrame = {
    val refined = refinedCentroids(kmeansStepExact(emb, vecIdCol, vecCol, k))
      .localCheckpoint(eager = false)
    assignExact(emb, vecIdCol, vecCol, refined, k)
      .select(col("id"), col("cluster"))
  }

  /** Nearest-centroid assignment against an integer micro-component
    * centroid table `(cluster, pos, cm)` — the join-based counterpart of
    * [[assignCell]], usable with centroids that exist only as a DataFrame
    * (e.g. derived from [[kmeansStepExact]] statistics — the
    * persisted-codebook path for assigning NEW vectors). Returns
    * (id, cluster, d2). Same struct-argmin determinism as the step.
    */
  def assignExact(df: DataFrame, idCol: String, vecCol: String,
      centroidComp: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    assignComp(microComp(df, idCol, vecCol, "id", "m"), centroidComp)
  }

  /** Standing IVF index TABLE — the persisted ANN artifact
    * (id, cell, embedding): every vector assigned to its nearest
    * codebook centroid ([[assignExact]]), carrying its raw vector for
    * the in-cell re-rank. This is what a 100 TB corpus keeps standing:
    * queries probe ONE cell's rows (the [[ivfTopK]] shape), and ingest
    * folds new batches by APPEND ([[foldIvfIndex]]) — never a corpus
    * re-scan, never a re-assignment of standing rows.
    */
  def ivfIndexTable(df: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, k: Int): DataFrame =
    assignExact(df, idCol, vecCol, codebook, k)
      .join(df.select(col(idCol).as("id"), col(vecCol).as("embedding")),
        Seq("id"))
      .select(col("id"), col("cluster").as("cell"), col("embedding"))

  /** k-NN GRAPH over a standing IVF index — the batch
    * all-nearest-neighbors substrate (semantic-dedup clustering,
    * diversity sampling, graph-based retrieval): every indexed
    * vector's `kNbrs` nearest IN-CELL neighbors by exact cosine.
    * ONE per-cell self-join — cost Σ|cell|², bounded by codebook
    * balance, never corpus all-pairs (the [[ivfTopK]] cost model
    * applied all-points-at-once); per-id top-k via a rank window, so
    * WindowGroupLimit pre-filters each map partition to kNbrs
    * candidates per id before the shuffle. IVF recall caveat: true
    * neighbors in OTHER cells are unseen — [[recallAtK]] measures
    * exactly that trade; raise k (smaller cells ⇒ cheaper join, lower
    * recall) or probe neighboring cells downstream when it matters.
    * Returns (id, rank, nbr) — the readout of [[knnGraphTable]] (the
    * ONE graph definition) with the artifact's cell column dropped.
    */
  def knnGraphIvf(index: DataFrame, kNbrs: Int,
      maxPairs: Long = DefaultMaxGraphPairs): DataFrame =
    knnGraphTable(index, kNbrs, maxPairs)
      .select(col("id"), col("rank"), col("nbr"))

  /** Default loud bound on the FULL graph build's in-cell candidate-pair
    * volume: Σ|cell|² ≤ 5e9 ≈ a few minutes of codegen'd cosine work on
    * one executor-ful of cores — the [[knnGraphTouched]] maxTouchedRows
    * spirit applied where it actually bites, the pair count. At the
    * bench's frozen k = 16, 2M vectors are ~2.5e11 pairs: over the bound
    * by 50×, exactly the silent multi-hour join the guard exists to stop.
    */
  val DefaultMaxGraphPairs: Long = 5000000000L

  /** Codebook size that keeps a FULL [[knnGraphTable]] build under
    * `maxPairs` candidate pairs: balanced cells give Σ|cell|² ≈ n²/k, so
    * k ≥ skew · n² / maxPairs. `skew` is the measured Σ|cell|² /
    * balanced ratio — knnMaintProbe reads 1.01 on the sf0.1 embeddings
    * (near-isotropic corpus, max cell share 0.073 ≈ 1/16); the default
    * 1.5 is headroom for mildly clustered real corpora. This turns
    * "reindex with a finer codebook" from a scaladoc sentence into a
    * computed decision: at n = 2M and the default bound, suggestK ⇒
    * k = 1200 (cells of ~1.7k rows) instead of the bench's frozen 16.
    */
  def suggestK(n: Long, maxPairs: Long = DefaultMaxGraphPairs,
      skew: Double = 1.5): Int = {
    require(n >= 0, "n >= 0")
    require(maxPairs >= 1, "maxPairs >= 1")
    require(skew >= 1.0, "skew >= 1.0 (balanced cells are the floor)")
    if (n == 0) 1
    else {
      val k = math.ceil(skew * n.toDouble * n.toDouble / maxPairs.toDouble)
      // never more cells than vectors; never 0; clamp to Int range
      math.max(1L, math.min(k.toLong, math.min(n, Int.MaxValue.toLong))).toInt
    }
  }

  /** The k-NN graph as a STANDING ARTIFACT: [[knnGraphIvf]]'s rows
    * keyed by the cell they were derived in — (cell, id, rank, nbr).
    * The cell column is what makes the graph MAINTAINABLE: edges only
    * ever connect ids in the same cell, so appending new vectors
    * invalidates exactly the touched cells' rows and nothing else
    * ([[knnGraphDelta]]); persist range-laid by cell and a delta fold
    * reads only touched row groups (the positionalPostings layout
    * argument at graph grain).
    *
    * The in-cell self-join is Σ|cell|² candidate pairs — fine under the
    * "k grows with the corpus" contract, but nothing upstream enforces
    * it, so the build GUARDS it loudly: one cheap occupancy aggregate
    * (map-side-combined groupBy count over the already-checkpointed
    * index) prices the join before it runs, and a build over the bound
    * fails with the measured pair count, the hottest cell, and the
    * [[suggestK]] codebook size that would fix it — never a silent
    * quadratic multi-hour job. The delta paths inherit the guard through
    * their touched-cells recompute (their maxTouchedRows bound caps rows;
    * this one caps the pairs those rows imply).
    */
  def knnGraphTable(index: DataFrame, kNbrs: Int,
      maxPairs: Long = DefaultMaxGraphPairs): DataFrame = {
    require(kNbrs >= 1, "kNbrs >= 1")
    graft.functions.GraftFunctions.register(index.sparkSession)
    // Round-20 A/B, kept as documentation: three attempts to co-partition
    // the in-cell self-join (repartition(cell) below a lazy checkpoint,
    // above it, and below an EAGER checkpoint) all still planned two
    // join-side exchanges — a checkpoint under AQE surfaces
    // UnknownPartitioning to the consumer plan (plan-dump verified each
    // form), and a repartition above the checkpoint is defeated by the
    // rename project being pushed under the second side's exchange. The
    // r19 shape (select + lazy checkpoint, join plans its own
    // exchanges) is therefore kept as-is.
    val v = index.select(col("cell"), col("id"), col("embedding"))
      .localCheckpoint(eager = false) // both sides of the in-cell join
    // decimal(38,0): Σ of long² sums can overflow BIGINT past ~3e9 rows
    // in one cell — the Chao1 lesson applied to the guard itself
    val occ = v.groupBy(col("cell")).count()
      .agg(
        coalesce(sum(col("count").cast("decimal(38,0)") * col("count")),
          lit(0).cast("decimal(38,0)")).as("pairs"),
        coalesce(max(col("count")), lit(0L)).as("hottest"),
        coalesce(sum(col("count")), lit(0L)).as("n"))
      .collect()(0)
    val pairs = occ.getDecimal(0)
    val n = occ.getLong(2)
    require(pairs.compareTo(java.math.BigDecimal.valueOf(maxPairs)) <= 0,
      s"knnGraphTable: Σ|cell|² = $pairs candidate pairs (n = $n rows, " +
        s"hottest cell ${occ.getLong(1)} rows) exceeds maxPairs = " +
        s"$maxPairs — the in-cell self-join is quadratic per cell; " +
        s"reindex with a finer codebook (suggestK($n) = " +
        s"${suggestK(n, maxPairs)} centroids holds balanced cells under " +
        "the bound), fold smaller slices, or raise the bound deliberately")
    v.join(v.select(col("cell"), col("id").as("nbr"),
        col("embedding").as("q")), Seq("cell"))
      .filter(col("id") =!= col("nbr"))
      // nanvl: a zero-norm vector's cosine is NaN, which Spark orders
      // ABOVE every real sim — unguarded it becomes everyone's rank-1
      // neighbor (the allPairsCos guard, review-caught here)
      .withColumn("sim", nanvl(cosine("embedding", "q"), lit(-2.0)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("sim").desc, col("nbr"))))
      .filter(col("rank") <= kNbrs)
      .select(col("cell").cast("long").as("cell"), col("id"),
        col("rank").cast("long").as("rank"), col("nbr"))
  }

  /** Recomputed [[knnGraphTable]] rows for exactly the cells a delta
    * batch touches: the graph-maintenance WORK UNIT shared by the
    * batch fold ([[knnGraphDelta]]) and the streaming ingest
    * ([[graft.streaming.PipelineStream.knnGraphIngest]]) — one
    * definition of "what a touched cell's rows become". The touched
    * cell list collects (≤ codebook size — the bounded-literal rule),
    * so the standing-index read is a STATIC `cell IN (…)` filter that
    * prunes a cell-laid parquet artifact to touched row groups; the
    * recompute joins only Σ|touched cell|² pairs. `maxTouchedRows`
    * bounds that quadratic loudly — a delta that lands in a
    * pathologically hot cell fails with the bound, never a silent
    * multi-hour join (the maxBallNodes pattern at ANN grain).
    */
  def knnGraphTouched(index: DataFrame, delta: DataFrame, kNbrs: Int,
      maxTouchedRows: Long = 5000000L): DataFrame = {
    val d = delta.select(col("id"), col("cell"), col("embedding"))
      .localCheckpoint() // cells collect + union below
    knnGraphTouchedWithCells(index, d, deltaCells(d), kNbrs, maxTouchedRows)
  }

  /** The collected distinct cells of an already-CHECKPOINTED delta
    * frame — ≤ codebook size (the bounded-literal rule). Shared so the
    * fold paths collect it exactly once per fold.
    */
  private[graft] def deltaCells(d: DataFrame): Seq[Any] =
    d.select(col("cell")).distinct().collect().map(_.get(0)).toSeq

  /** [[knnGraphTouched]] with the delta pre-checkpointed and its cell
    * list pre-collected — the shared core, so knnGraphDelta and the
    * streaming fold pay ONE checkpoint and ONE cells collect per fold.
    */
  private[graft] def knnGraphTouchedWithCells(index: DataFrame,
      d: DataFrame, cells: Seq[Any], kNbrs: Int,
      maxTouchedRows: Long): DataFrame = {
    if (cells.isEmpty) return knnGraphTable(index.limit(0), kNbrs)
    val touched = index.select(col("id"), col("cell"), col("embedding"))
      .unionByName(d.select(col("id"), col("cell"), col("embedding")))
      .filter(col("cell").isin(cells: _*))
      .localCheckpoint(eager = false) // counted + both join sides
    val n = touched.count()
    require(n <= maxTouchedRows,
      s"knnGraphTouched: $n rows in the ${cells.size} touched cells exceed " +
        s"maxTouchedRows = $maxTouchedRows — the in-cell recompute is " +
        "quadratic per cell; fold smaller deltas, raise the bound " +
        "deliberately, or reindex with a finer codebook")
    knnGraphTable(touched, kNbrs)
  }

  /** MUTUAL (reciprocal) k-NN edges over a [[knnGraphTable]] /
    * [[knnGraphIvf]] graph: keep a pair iff EACH is in the other's
    * top-k list — the standard sparsifier for neighborhood-based
    * clustering (Jarvis–Patrick / SNN): a hub that everyone ranks
    * highly but that ranks none of them back contributes NO edges, so
    * dense regions stay connected while hub bridges vanish. One
    * self-semi-join on the (id, nbr) edge set — graph-sized, never
    * corpus-pairs. Returns (id, nbr) with id < nbr, one row per
    * mutual pair; cluster it with
    * [[graft.pipeline.Dedup.connectedComponents]] for SNN components.
    */
  def mutualKnnEdges(graph: DataFrame): DataFrame = {
    val e = graph.select(col("id"), col("nbr"))
      .localCheckpoint(eager = false) // both orientations of the semi-join
    e.join(e.select(col("nbr").as("id"), col("id").as("nbr")),
        Seq("id", "nbr"), "left_semi")
      .filter(col("id") < col("nbr"))
  }

  /** Fold a delta batch into a standing k-NN graph — the
    * [[foldIvfIndex]] law lifted to graph grain: under the frozen
    * codebook, edges live strictly inside cells, so
    * `knnGraphDelta(knnGraphTable(index), index, delta)` ≡
    * `knnGraphTable(foldIvfIndex(index, delta))` with only the touched
    * cells re-derived ([[knnGraphTouched]]) and every untouched cell's
    * rows CARRIED unchanged. Delta ids must be disjoint from the
    * standing index (loud broadcast probe, [[foldIvfIndex]]'s wording —
    * a collision means an upstream dedupe or a reindex); `delta` rows
    * are (id, cell, embedding) already assigned under the SAME codebook
    * as the index (a re-trained codebook is a REINDEX: cells would no
    * longer be comparable and the carry would be silently wrong).
    * At scale, prefer the append-only run store
    * ([[graft.streaming.PipelineStream.knnGraphIngest]]) over
    * materializing the carried copy per fold — the carry here is a
    * full-graph rewrite, which is the right shape for an in-memory
    * fold but not for a 100 TB standing artifact.
    */
  def knnGraphDelta(graphTable: DataFrame, index: DataFrame,
      delta: DataFrame, kNbrs: Int, maxTouchedRows: Long = 5000000L,
      maxDeltaRows: Long = 5000000L): DataFrame = {
    val d = delta.select(col("id"), col("cell"), col("embedding"))
      .localCheckpoint() // counted + collision probe + touched recompute
    val n = d.count()
    require(n <= maxDeltaRows,
      s"knnGraphDelta: |delta| = $n exceeds maxDeltaRows = $maxDeltaRows — " +
        "the collision probe broadcasts the delta ids; fold in slices " +
        "or reindex")
    require(index.join(broadcast(d.select(col("id"))), Seq("id"), "left_semi")
        .isEmpty,
      "knnGraphDelta: delta ids collide with the standing index — dedupe " +
        "the batch or reindex")
    val cells = deltaCells(d)
    if (cells.isEmpty) return graphTable
    graphTable.filter(!col("cell").isin(cells: _*))
      .unionByName(
        knnGraphTouchedWithCells(index, d, cells, kNbrs, maxTouchedRows))
  }

  /** Multi-probe [[knnGraphIvf]]: each vector PROBES its `nProbe`
    * nearest cells ([[assignExactTopCells]]) while candidates still
    * live in their single home cell — the standing index is UNCHANGED,
    * recall recovers the near-boundary neighbors single-probe misses,
    * and cost grows ×nProbe on the probe side only. A neighbor's home
    * cell is unique, so (id, nbr) candidate pairs never duplicate
    * across probed cells — no dedup stage. Returns (id, rank, nbr);
    * nProbe = 1 degenerates to [[knnGraphIvf]] exactly.
    */
  def knnGraphMultiProbe(index: DataFrame, codebook: DataFrame, k: Int,
      nProbe: Int, kNbrs: Int): DataFrame = {
    require(kNbrs >= 1, "kNbrs >= 1")
    graft.functions.GraftFunctions.register(index.sparkSession)
    val vecs = index.select(col("id"), col("embedding"))
      .localCheckpoint(eager = false) // probe assignment + probe-side vectors
    val probes = assignExactTopCells(vecs, "id", "embedding", codebook,
      k, nProbe).select(col("id"), col("cluster").as("cell"))
    probes.join(vecs, Seq("id"))
      .join(index.select(col("cell"), col("id").as("nbr"),
        col("embedding").as("q")), Seq("cell"))
      .filter(col("id") =!= col("nbr"))
      // same zero-norm NaN guard as knnGraphIvf
      .withColumn("sim", nanvl(cosine("embedding", "q"), lit(-2.0)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("sim").desc, col("nbr"))))
      .filter(col("rank") <= kNbrs)
      .select(col("id"), col("rank").cast("long").as("rank"), col("nbr"))
  }

  /** Fold a NEW batch into a standing IVF index — the artifact-fold law
    * at ANN grain: the codebook is FROZEN (cells stay comparable;
    * re-training the codebook is a REINDEX, not a fold), so maintenance
    * is a pure append of disjoint ids and the folded index probes
    * identically to one built over the full corpus with the same
    * codebook. Disjointness IS the fold's correctness and is enforced
    * loudly (broadcast probe of the bounded delta against standing ids
    * — the standing side never shuffles); a colliding id means an
    * upstream dedupe or a reindex, never a silent duplicate that would
    * double-count a vector in every future probe.
    *
    * `maxDeltaRows` prices the guard itself: the collision probe
    * BROADCASTS the delta's id column to every executor and runs an
    * eager job per fold, so the default (5M ids ≈ 40 MB serialized,
    * comfortably under the 8 GB broadcast hard cap and a few hundred ms
    * to ship) keeps the "bounded delta" contract cheap. Raise it
    * deliberately if a fold batch is genuinely larger — at 50M ids the
    * broadcast is ~400 MB on every executor — or fold in slices.
    */
  def foldIvfIndex(index: DataFrame, newRows: DataFrame,
      maxDeltaRows: Long = 5000000L): DataFrame = {
    val d = newRows.select(col("id"), col("cell"), col("embedding"))
      .localCheckpoint() // counted + collision probe + union
    val n = d.count()
    require(n <= maxDeltaRows,
      s"foldIvfIndex: |delta| = $n exceeds maxDeltaRows = $maxDeltaRows — " +
        "the fold broadcasts the delta against the standing ids; fold in " +
        "slices or reindex")
    require(index.join(broadcast(d.select(col("id"))), Seq("id"), "left_semi")
        .isEmpty,
      "foldIvfIndex: delta ids collide with the standing index — dedupe " +
        "the batch or reindex")
    index.select(col("id"), col("cell"), col("embedding")).unionByName(d)
  }

  /** Second Lloyd iteration ENTIRELY in integer space + the migration
    * report: refined centroids are the floor-divided means of the first
    * iteration's sufficient statistics (floor semantics spelled out as
    * (s - ((s % n + n) % n)) / n so Spark's truncate-toward-zero `DIV`
    * and an engine with floored `//` compute the SAME value on negative
    * sums), then every vector reassigns against the refined table.
    * Output (id, cluster0, cluster1, moved) — the per-iteration
    * convergence signal (Σ moved is the Lloyd stopping criterion) that a
    * production curation run logs each round. The corpus explodes ONCE
    * (the checkpointed component table); the seed assignment is computed
    * once and reused for both the statistics and cluster0; the only
    * second corpus-wide pass is the inherent reassignment. Every
    * centroid table stays k·dim rows and broadcasts.
    */
  /** Refined centroid component table from [[kmeansStepExact]]-shaped
    * sufficient statistics: the floor-divided micro-mean, with floor
    * semantics spelled engine-portably — (s - ((s % n + n) % n)) DIV n
    * gives the SAME value under Spark's truncate-toward-zero DIV and a
    * floored `//` even on negative sums. The ONE definition of this
    * spelling (kmeansRefineDelta, the p92 refresh entry and specs all
    * call it).
    */
  def refinedCentroids(stats: DataFrame): DataFrame =
    stats.select(col("cluster"), col("pos"),
      expr("CAST((sum_micro - ((sum_micro % n + n) % n)) DIV n AS BIGINT)").as("cm"))

  def kmeansRefineDelta(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    val comp = microComp(df, idCol, vecCol, "id", "m")
      .localCheckpoint(eager = false) // one explode feeds all three passes
    val a0 = assignComp(comp, seedComp(df, idCol, vecCol, k))
      .select(col("id"), col("cluster"))
      .localCheckpoint(eager = false) // feeds the stats AND the delta join
    val refined = refinedCentroids(clusterStats(comp, a0))
    a0.withColumnRenamed("cluster", "cluster0")
      .join(assignComp(comp, refined).select(col("id"), col("cluster").as("cluster1")),
        Seq("id"))
      .select(col("id"), col("cluster0"), col("cluster1"),
        (col("cluster0") =!= col("cluster1")).as("moved"))
  }

  /** Cluster-drift matrix — [[kmeansRefineDelta]] rolled to the ops
    * dashboard shape: per (cluster0, cluster1) vector counts, the
    * k×k migration table that says whether an index refresh moved mass
    * (diagonal = stable, off-diagonal = drift). ≤ k² rows at any corpus
    * size; the rollup adds one tiny aggregate to the refine lineage.
    */
  def kmeansDriftMatrix(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame =
    kmeansRefineDelta(df, idCol, vecCol, k)
      .groupBy(col("cluster0"), col("cluster1"))
      .agg(count(lit(1)).as("n_vecs"))

  /** The nprobe cells nearest to the query (driver-side — the codebook is
    * tiny); shared by the in-memory and persisted-index search paths.
    */
  private def nearestCells(centroids: Array[Array[Float]], queryVec: Array[Float],
      nprobe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < math.min(c.length, queryVec.length)) {
        val t = c(j).toDouble - queryVec(j).toDouble; d += t * t; j += 1
      }
      (d, i)
    }.sortBy(p => (p._1, p._2)).take(nprobe).map(_._2).toSeq

  /** IVF search with a trained codebook: scan only the `nprobe` cells
    * nearest to the query, exact cosine top-k within them. At 100 TB the
    * assignment is precomputed (a partition column — see saveIndex), so
    * the scan prunes to nprobe/k of the data before any distance math.
    */
  def ivfSearch(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], queryVec: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val probeCells = nearestCells(centroids, queryVec, nprobe)
    val spark = df.sparkSession
    import spark.implicits._
    val assigned = assignCell(df, vecCol, centroids)
      .filter(col("cell").isin(probeCells: _*))
    val q = Seq(Tuple1(queryVec)).toDF("q")
    bruteForceTopK(assigned, idCol, vecCol, q, k)
  }

  // ---- random-hyperplane LSH (the other scale path besides IVF) ----

  /** Deterministic pseudo-random hyperplanes: component (p, d) is derived
    * from md5(seed, p, d) — reproducible across runs/engines, no RNG
    * state. Values uniform in [-1, 1).
    */
  def randomHyperplanes(dim: Int, nPlanes: Int, seed: Long): Array[Array[Float]] = {
    require(nPlanes <= 64, "signature packs into one long")
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val bytes = md.digest(s"$seed:$p:$d".getBytes("UTF-8"))
        val v = java.nio.ByteBuffer.wrap(bytes).getLong(0)
        ((v >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }
    }
  }

  /** Sign-of-dot-product signature of an embedding against the
    * hyperplanes, packed into one long — expression-only (codegen'd).
    */
  def hyperplaneSignature(vecCol: String, planes: Array[Array[Float]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val arrLit = plane.map(doubleLit).mkString("array(", ",", ")")
      val dot = expr(
        s"""aggregate(zip_with($vecCol, $arrLit, (x, y) -> CAST(x AS DOUBLE) * y),
           | CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Embedding near-dup pairs via banded hyperplane-LSH candidates +
    * EXACT cosine verification — the LSH-bucketed alternative to the IVF
    * cell restriction: no training step, recall tuned by planes/bands.
    * Never all-pairs: candidates only through matching signature bands.
    */
  def embeddingNearDupLsh(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nPlanes: Int = 32, bands: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(bands >= 1 && bands <= nPlanes && nPlanes % bands == 0,
      s"bands ($bands) must divide nPlanes ($nPlanes) — r=0 would degenerate to all-pairs, " +
        "a non-dividing bands silently drops planes")
    graft.functions.GraftFunctions.register(df.sparkSession)
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val firstRow = vecs.filter(col("v").isNotNull).select(size(col("v"))).head(1)
    if (firstRow.isEmpty) // empty shard: no pairs, don't crash the pipeline
      return vecs.select(col("id").as("ia"), col("id").as("ib"),
        lit(0.0).as("cos")).limit(0)
    val planes = randomHyperplanes(firstRow.head.getInt(0), nPlanes, seed)
    val r = nPlanes / bands
    val mask = (1L << r) - 1
    val signed = vecs.select(col("id"), col("v"),
      hyperplaneSignature("v", planes).as("sig"))
    val banded = signed.select(col("id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * r).bitwiseAND(lit(mask)).as("bh"))): _*)).as("bd"))
      .select(col("id"), col("bd.band").as("band"), col("bd.bh").as("bh"))
    // candidate ids first, ONE cosine per distinct pair after the dedup —
    // a pair agreeing on all bands must not be scored `bands` times
    val cand = banded.select(col("id").as("ia"), col("band"), col("bh"))
      .join(banded.select(col("id").as("ib"), col("band"), col("bh")), Seq("band", "bh"))
      .filter(col("ia") < col("ib"))
      .select("ia", "ib").distinct()
    cand
      .join(vecs.select(col("id").as("ia"), col("v").as("va")), Seq("ia"))
      .join(vecs.select(col("id").as("ib"), col("v").as("vb")), Seq("ib"))
      .select(col("ia"), col("ib"), cosine("va", "vb").as("cos"))
      .filter(col("cos") >= minCosine)
  }

  /** Persist an IVF index: the codebook as a tiny parquet table and every
    * vector under its coarse cell as a PARTITION COLUMN. nprobe search
    * then reads only the probed cells' directories (PartitionFilters) —
    * the on-disk layout that keeps per-query IO at nprobe/k of the corpus
    * no matter how large the corpus grows (the sharded-vector-search
    * pattern).
    */
  def saveIndex(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    assignCell(df, vecCol, centroids)
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("cell"))
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/vectors")
  }

  /** Search a persisted IVF index: rank cells by query-to-centroid
    * distance on the driver (codebook is tiny), then scan ONLY the nprobe
    * nearest cells' partitions for the exact top-k.
    */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queryVec: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val centroids = spark.read.parquet(s"$path/codebook")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("centroid")).toArray)
    val probeCells = nearestCells(centroids, queryVec, nprobe)
    import spark.implicits._
    val vecs = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probeCells: _*))
    val q = Seq(Tuple1(queryVec)).toDF("q")
    bruteForceTopK(vecs.withColumnRenamed("vec", "embedding"), "id", "embedding", q, k)
  }

  /** Batched nprobe search over a persisted IVF index: every query in ONE
    * plan. Per-query probe cells are computed as an EXPRESSION (sorted
    * distance-to-centroid array, sliced to nprobe) so the query set stays
    * distributed; only the tiny union of probed cell ids is collected to
    * prune the vector partitions statically. Scan cost: the probed cells'
    * directories once, scored only against the queries probing each cell.
    */
  def searchIndexBatch(spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, queryIdCol: String, queryVecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val centroids = spark.read.parquet(s"$path/codebook")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("centroid")).toArray)
    val cands = centroids.zipWithIndex.toIndexedSeq.map { case (c, i) =>
      struct(l2sq(queryVecCol, c).as("d"), lit(i).as("cell"))
    }
    val probes = queries
      .select(col(queryIdCol).as("qid"), col(queryVecCol).as(queryVecCol))
      .withColumn("_cand", sort_array(array(cands: _*)))
      .withColumn("cell", explode(expr(s"transform(slice(_cand, 1, $nprobe), s -> s.cell)")))
      .select(col("qid"), col(queryVecCol).as("qv"), col("cell"))
      // materialize once: the probe assignment feeds both the pruning
      // collect and the join — without this the k×|queries| distance
      // expressions would evaluate twice
      .localCheckpoint()
    // static partition pruning: the probed-cell union is tiny — collect it
    val probedCells = probes.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val vecs = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probedCells: _*))
    // plain equi-join on cell: AQE broadcasts the probe side when it is
    // small and falls back to a shuffle join for huge query sets — an
    // unconditional broadcast would pin every query vector on the driver
    vecs.join(probes, Seq("cell"))
      .withColumn("sim", cosine("vec", "qv"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"))
  }

  // ---- IVF-PQ: residual product quantization over the coarse cells ----

  /** Per-subspace codebooks trained on coarse-cell RESIDUALS
    * (vec − centroid[cell]), split into `m` contiguous subspaces of
    * `dsub` dims each: books(s)(j) is sub-centroid j of subspace s.
    * Doubles throughout — the executor-side assignment expressions and
    * the driver-side query LUT must rank identically.
    */
  /** `perm` is the OPQ-lite dimension permutation: residuals are reordered
    * as permuted(i) = residual(perm(i)) BEFORE the contiguous subspace
    * split, so each subspace gets a balanced share of the residual
    * variance instead of whatever the storage order happens to group
    * (full OPQ learns a rotation matrix; the permutation is its cheap,
    * expression-only diagonal cousin). None = identity (plain PQ).
    *
    * `cellPerms` is the per-cell refinement (FAISS's OPQ-per-IVF-list
    * analog): cellPerms(cell) permutes THAT cell's residuals, so each
    * coarse cell balances its own residual variance — different cells
    * have different dominant directions, and one global permutation can
    * only balance their average. When set it takes precedence over
    * `perm`; encode and the query LUT both key the permutation by cell,
    * which stays expression-only (a cell→perm map literal).
    */
  case class ProductCodebook(dsub: Int, books: Array[Array[Array[Double]]],
      perm: Option[Array[Int]] = None,
      cellPerms: Option[Array[Array[Int]]] = None) {
    def m: Int = books.length
    def ksub: Int = books.headOption.map(_.length).getOrElse(0)
    /** The permutation in effect for one coarse cell (identity = None). */
    def permFor(cell: Int): Option[Array[Int]] =
      cellPerms.map(_(cell)).orElse(perm)
  }

  private def doubleLitD(v: Double): String =
    "CAST(" + String.format(java.util.Locale.ROOT, "%.17e", Double.box(v)) + " AS DOUBLE)"

  private def arrayLitD(a: Array[Double]): String =
    a.map(doubleLitD).mkString("array(", ",", ")")

  /** Residual of `vecCol` against its coarse cell's centroid, as a
    * `cell → centroid` map literal lookup — expression-only, evaluated
    * after [[assignCell]] has produced the `cell` column.
    */
  private def residualExpr(vecCol: String, centroids: Array[Array[Float]]): Column = {
    val entries = centroids.zipWithIndex
      .map { case (c, i) => s"$i, ${c.map(doubleLit).mkString("array(", ",", ")")}" }
      .mkString(", ")
    expr(s"zip_with($vecCol, element_at(map($entries), cell), (x, c) -> CAST(x AS DOUBLE) - c)")
  }

  /** permuted(i) = r(perm(i)) as one codegen'd expression. */
  private def permuteExpr(rCol: String, perm: Array[Int]): Column =
    expr(s"transform(array(${perm.mkString(",")}), p -> element_at($rCol, p + 1))")

  /** Per-cell permute: the row's `cell` column selects its permutation
    * from a map literal (numCells × dim ints — codebook-scale, inlined).
    */
  private def permuteByCellExpr(rCol: String, perms: Array[Array[Int]]): Column = {
    val entries = perms.zipWithIndex
      .map { case (p, c) => s"$c, array(${p.mkString(",")})" }.mkString(", ")
    expr(s"transform(element_at(map($entries), cell), p -> element_at($rCol, p + 1))")
  }

  /** Greedy longest-processing-time assignment of dims to subspaces:
    * dims sorted by variance descending, each placed in the subspace with
    * the smallest variance sum that still has a free slot — deterministic,
    * no learned rotation.
    */
  private def lptPermutation(vars: Map[Int, Double], m: Int, dsub: Int): Array[Int] = {
    val order = (0 until m * dsub).sortBy(d => (-vars.getOrElse(d, 0.0), d))
    val sums = Array.fill(m)(0.0)
    val slots = Array.fill(m)(0)
    val groups = Array.fill(m)(List.empty[Int])
    for (d <- order) {
      val s = (0 until m).filter(slots(_) < dsub)
        .minBy(s => (sums(s), s))
      sums(s) += vars.getOrElse(d, 0.0)
      slots(s) += 1
      groups(s) = d :: groups(s)
    }
    groups.flatMap(_.reverse)
  }

  /** OPQ-lite: one variance-balancing permutation from a single
    * per-dim var_pop aggregation over all residuals.
    */
  private def balancedPermutation(resid: DataFrame, m: Int, dsub: Int): Array[Int] = {
    val vars = resid
      .select(posexplode(col("r")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(var_pop(col("x")).as("v"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    lptPermutation(vars, m, dsub)
  }

  /** Per-cell OPQ-lite: one permutation per coarse cell from a single
    * (cell, dim) variance aggregation. Cells with no residuals (or a
    * single vector, where var_pop is 0 everywhere) get the identity.
    */
  private def balancedCellPermutations(resid: DataFrame, numCells: Int,
      m: Int, dsub: Int): Array[Array[Int]] = {
    val byCell = resid
      .select(col("cell"), posexplode(col("r")).as(Seq("pos", "x")))
      .groupBy(col("cell"), col("pos")).agg(var_pop(col("x")).as("v"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (c, rows) =>
        c -> rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
      }
    Array.tabulate(numCells) { c =>
      byCell.get(c) match {
        case Some(vars) => lptPermutation(vars, m, dsub)
        case None => Array.range(0, m * dsub)
      }
    }
  }

  private def l2sqSub(subExpr: String, centroid: Array[Double]): Column =
    expr(
      s"""aggregate(zip_with($subExpr, ${arrayLitD(centroid)}, (x, y) -> (x - y) * (x - y)),
         | CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  /** Train the per-subspace residual codebooks: Lloyd iterations on each
    * subspace's residual slices, expressed as DataFrame aggregations like
    * [[trainCodebook]] (assign = expression argmin; recenter = posexplode
    * + avg). Deterministic: seeds are the first ksub residuals in id
    * order. The residual table is localCheckpointed once — m × iters
    * passes read the materialized slices, never recompute the assignment
    * expressions.
    */
  def trainProductCodebook(df: DataFrame, idCol: String, vecCol: String,
      coarse: Array[Array[Float]], m: Int, ksub: Int, iters: Int,
      opq: Boolean = false, opqPerCell: Boolean = false): ProductCodebook = {
    // dim from the source directly; the residual frame is only
    // materialized ONCE, after the (optional) permutation is known —
    // checkpointing the unpermuted residuals first would pin BOTH copies
    // in the block manager (Dataset.unpersist cannot free localCheckpoint
    // blocks: they live at the RDD level, not in the CacheManager)
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    def resid0 = assignCell(df, vecCol, coarse)
      .select(col(idCol).as("id"), col("cell"), residualExpr(vecCol, coarse).as("r"))
    val cellPerms =
      if (opqPerCell) Some(balancedCellPermutations(resid0, coarse.length, m, dsub))
      else None
    val perm = if (opq && !opqPerCell) Some(balancedPermutation(resid0, m, dsub)) else None
    // codebooks are shared across cells but trained on the PERMUTED
    // residuals — with per-cell perms each subspace sees each cell's own
    // variance-balanced slice, which is exactly what it will quantize at
    // encode time
    val resid = (cellPerms match {
      case Some(ps) => resid0.select(col("id"), permuteByCellExpr("r", ps).as("r"))
      case None => perm match {
        case Some(p) => resid0.select(col("id"), permuteExpr("r", p).as("r"))
        case None => resid0.select(col("id"), col("r"))
      }
    }).localCheckpoint()
    val books = Array.tabulate(m) { s =>
      val subExpr = s"slice(r, ${s * dsub + 1}, $dsub)"
      val sub = resid.select(col("id"), expr(subExpr).as("sub"))
      var cents = sub.orderBy(col("id")).limit(ksub)
        .select(col("sub")).collect().map(_.getSeq[Double](0).toArray)
      for (_ <- 0 until iters) {
        val cands = cents.zipWithIndex.toIndexedSeq.map { case (c, j) =>
          struct(l2sqSub("sub", c).as("d"), lit(j).as("j"))
        }
        val means = sub
          .withColumn("j", least(cands: _*).getField("j"))
          .select(col("j"), posexplode(col("sub")).as(Seq("pos", "x")))
          .groupBy(col("j"), col("pos"))
          .agg(avg(col("x")).as("mu"))
          .groupBy(col("j"))
          .agg(sort_array(collect_list(struct(col("pos"), col("mu")))).as("ms"))
          .select(col("j"), expr("transform(ms, s -> s.mu)").as("c"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
        cents = cents.indices.map(j => means.getOrElse(j, cents(j))).toArray
      }
      cents
    }
    ProductCodebook(dsub, books, perm, cellPerms)
  }

  /** Encode every vector as its coarse cell + the m sub-centroid indices
    * of its residual — expression-only (codegen'd argmin per subspace).
    * The `code` column is what the candidate scan reads at search time:
    * m small ints instead of dim floats.
    */
  def encodePq(df: DataFrame, vecCol: String, coarse: Array[Array[Float]],
      pq: ProductCodebook): DataFrame = {
    val rawResid = residualExpr(vecCol, coarse)
    val permuted = pq.cellPerms.map(permuteByCellExpr("_r0", _))
      .orElse(pq.perm.map(permuteExpr("_r0", _)))
    val withResid = assignCell(df, vecCol, coarse)
      .withColumn("_r0", rawResid)
      .withColumn("_r", permuted.getOrElse(col("_r0")))
      .drop("_r0")
    val codeCols = (0 until pq.m).map { s =>
      val subExpr = s"slice(_r, ${s * pq.dsub + 1}, ${pq.dsub})"
      val cands = pq.books(s).zipWithIndex.toIndexedSeq.map { case (c, j) =>
        struct(l2sqSub(subExpr, c).as("d"), lit(j).as("j"))
      }
      least(cands: _*).getField("j")
    }
    withResid.withColumn("code", array(codeCols: _*)).drop("_r")
  }

  /** Asymmetric-distance candidate scan: for each probed cell the driver
    * computes the query's per-subspace lookup table (‖residual-slice −
    * sub-centroid‖², m × ksub doubles — tiny), and the scan sums m table
    * lookups per row over the CODE column alone. Returns the `rerank`
    * best candidate ids by approximate distance.
    */
  def pqCandidates(encoded: DataFrame, idCol: String,
      coarse: Array[Array[Float]], pq: ProductCodebook,
      queryVec: Array[Float], nprobe: Int, rerank: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val probeCells = nearestCells(coarse, queryVec, nprobe)
    val lutRows = probeCells.map { cell =>
      val rq0 = queryVec.indices.map(i => queryVec(i).toDouble - coarse(cell)(i).toDouble)
      // the query residual walks through the SAME permutation the stored
      // codes were encoded under — per-cell when the index has one, so
      // each probed cell gets its own LUT under its own dimension order
      val rq = pq.permFor(cell).map(p => p.toIndexedSeq.map(rq0)).getOrElse(rq0)
      val lut = Seq.tabulate(pq.m) { s =>
        Seq.tabulate(pq.ksub) { j =>
          var d = 0.0; var t = 0
          while (t < pq.dsub) {
            val x = rq(s * pq.dsub + t) - pq.books(s)(j)(t); d += x * x; t += 1
          }
          d
        }
      }
      (cell, lut)
    }
    val luts = lutRows.toDF("cell", "lut")
    encoded
      .filter(col("cell").isin(probeCells: _*))
      .join(broadcast(luts), Seq("cell"))
      .withColumn("adist", expr(
        "aggregate(zip_with(code, lut, (cd, t) -> element_at(t, cd + 1)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
      .orderBy(col("adist"), col(idCol))
      .limit(rerank)
      .select(col(idCol).as("id"), col("adist"))
  }

  /** IVF-PQ search (in-memory form): encode, approximate-scan the probed
    * cells for `rerank` candidates, then EXACT cosine rerank of only those
    * — result shape matches [[bruteForceTopK]]. With rerank covering the
    * probed cells this equals [[ivfSearch]] exactly; smaller rerank trades
    * recall for a scan that never touches the vectors.
    */
  def pqSearch(df: DataFrame, idCol: String, vecCol: String,
      coarse: Array[Array[Float]], pq: ProductCodebook,
      queryVec: Array[Float], k: Int, nprobe: Int, rerank: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val encoded = encodePq(df, vecCol, coarse, pq)
    val candidateIds = pqCandidates(encoded, idCol, coarse, pq, queryVec, nprobe, rerank)
      .select(col("id")).collect().map(_.get(0))
    val q = Seq(Tuple1(queryVec)).toDF("q")
    bruteForceTopK(df.filter(col(idCol).isin(candidateIds: _*)), idCol, vecCol, q, k)
  }

  /** Persist an IVF-PQ index: coarse codebook + subspace books + the
    * vector table (id, vec, code) partitioned by cell. The candidate scan
    * reads only (id, code) of the probed partitions — at 100 TB the hot
    * search path reads m bytes-ish per vector, directory-pruned to
    * nprobe/k of the corpus; full vectors are read only for the `rerank`
    * finalists.
    */
  def savePqIndex(df: DataFrame, idCol: String, vecCol: String,
      coarse: Array[Array[Float]], pq: ProductCodebook, path: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
    (for (s <- pq.books.indices; j <- pq.books(s).indices)
      yield (s, j, pq.dsub, pq.books(s)(j).toSeq)).toDF("s", "j", "dsub", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/pq_books")
    // pq_perm presence is the load-time OPQ signal — a permutation-less
    // save over a previous OPQ index at the same path must REMOVE the stale
    // permutation, or searches would permute queries against codes encoded
    // unpermuted. Per-cell indexes add a `cell` column (its presence is
    // the per-cell signal), and overwrite mode replaces a stale global
    // permutation file in place.
    val permPath = new org.apache.hadoop.fs.Path(s"$path/pq_perm")
    (pq.cellPerms, pq.perm) match {
      case (Some(ps), _) =>
        (for ((p, c) <- ps.zipWithIndex; (d, i) <- p.zipWithIndex)
          yield (c, i, d)).toSeq.toDF("cell", "pos", "dim")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/pq_perm")
      case (None, Some(p)) =>
        p.zipWithIndex.map { case (d, i) => (i, d) }.toSeq.toDF("pos", "dim")
          .coalesce(1).write.mode("overwrite").parquet(s"$path/pq_perm")
      case (None, None) =>
        permPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(permPath, true)
    }
    encodePq(df, vecCol, coarse, pq)
      .select(col(idCol).as("id"), col(vecCol).as("vec"), col("code"), col("cell"))
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/vectors")
  }

  private def loadPqIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): (Array[Array[Float]], ProductCodebook) = {
    val coarse = spark.read.parquet(s"$path/codebook")
      .orderBy("cell").collect()
      .map(r => r.getSeq[Float](r.fieldIndex("centroid")).toArray)
    val bookRows = spark.read.parquet(s"$path/pq_books").collect()
    val dsub = bookRows.head.getAs[Int]("dsub")
    val books = bookRows.map(r => (r.getAs[Int]("s"), r.getAs[Int]("j"),
        r.getSeq[Double](r.fieldIndex("centroid")).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3)).toArray
    val permPath = new org.apache.hadoop.fs.Path(s"$path/pq_perm")
    val (perm, cellPerms) =
      if (permPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(permPath)) {
        val df = spark.read.parquet(s"$path/pq_perm")
        if (df.columns.contains("cell")) {
          val byCell = df.collect()
            .groupBy(_.getAs[Int]("cell"))
            .map { case (c, rows) =>
              c -> rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Int]("dim"))
            }
          (None, Some(Array.tabulate(coarse.length)(c =>
            byCell.getOrElse(c, Array.range(0, books.length * dsub)))))
        } else
          (Some(df.orderBy("pos").collect().map(_.getAs[Int]("dim"))), None)
      } else (None, None)
    (coarse, ProductCodebook(dsub, books, perm, cellPerms))
  }

  /** Search a persisted IVF-PQ index: codes-only candidate scan over the
    * probed partitions, exact cosine rerank of the finalists.
    */
  def searchPqIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      queryVec: Array[Float], k: Int, nprobe: Int, rerank: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val (coarse, pq) = loadPqIndex(spark, path)
    val codes = spark.read.parquet(s"$path/vectors").select("id", "code", "cell")
    val candidateIds = pqCandidates(codes, "id", coarse, pq, queryVec, nprobe, rerank)
      .select(col("id")).collect().map(_.get(0))
    val finalists = spark.read.parquet(s"$path/vectors")
      .filter(col("id").isin(candidateIds: _*))
    val q = Seq(Tuple1(queryVec)).toDF("q")
    bruteForceTopK(finalists.withColumnRenamed("vec", "embedding"), "id", "embedding", q, k)
  }

  /** Cell-size guard for the within-cell all-pairs joins: any cell larger
    * than `maxCellSize` is split into ceil(n/max) subcells by a secondary
    * hash of the id, so one degenerate cell (a codebook centroid attracting
    * 1% of a 100 TB corpus) keeps a bounded quadratic term instead of an
    * unbounded one — per-cell pair work drops from n² to ~n·maxCellSize.
    * Pairs never form across subcells: the same recall/cost tradeoff the
    * cell partition itself already accepts, now also bounded from above.
    * Only the oversized cells' counts are joined (broadcast — there can
    * only be corpus/maxCellSize of them); normal cells take subcell 0 and
    * are completely unaffected. maxCellSize <= 0 disables the guard.
    */
  private def withSubcell(v: DataFrame, idC: String, maxCellSize: Int): DataFrame =
    if (maxCellSize <= 0) v.withColumn("__sub", lit(0))
    else {
      val over = v.groupBy("cell").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxCellSize)
      v.join(broadcast(over), Seq("cell"), "left")
        .withColumn("__sub",
          when(col("__n").isNull, lit(0)).otherwise(
            pmod(xxhash64(col(idC)),
              ceil(col("__n").cast("double") / maxCellSize)).cast("int")))
        .drop("__n")
    }

  /** Embedding near-dup mining: the single most-similar pair per cell
    * (all-pairs within a cell — cells bound the quadratic term, and
    * `maxCellSize` bounds a degenerate cell; see [[withSubcell]]).
    */
  def topPairPerCell(df: DataFrame, idCol: String, vecCol: String, cellCol: String,
      maxCellSize: Int = 1 << 14): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val v = withSubcell(df.select(col(cellCol).as("cell"), col(idCol).as("id"),
      col(vecCol).as("vec")), "id", maxCellSize)
    val a = v.select(col("cell"), col("__sub"), col("id").as("ia"), col("vec").as("va"))
    val b = v.select(col("cell"), col("__sub"), col("id").as("ib"), col("vec").as("vb"))
    val pairs = a.join(b, Seq("cell", "__sub")).filter(col("ia") < col("ib"))
      .withColumn("sim", cosine("va", "vb"))
    pairs
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cell")).orderBy(col("sim").desc, col("ia"), col("ib"))))
      .filter(col("rn") === 1)
      .select(col("cell"), col("ia"), col("ib"))
  }

  /** SemDeDup-style semantic clustering: within-cell pairwise cosine,
    * pairs at or above `tauPermille`/1000 chain into connected components,
    * every doc labeled with its representative (min id; no-near-dup docs
    * are their own singleton). `cellExpr` is any deterministic cell
    * assignment — the cells bound the quadratic term, which is the scale
    * lever: an IVF codebook cell in production ([[semanticClustersIvf]]),
    * a hash bucket or metadata column for cross-engine verification.
    * Near-identical vectors landing in different cells lose their pair —
    * the recall/cost tradeoff every ANN-backed dedup accepts.
    */
  def semanticClusters(df: DataFrame, idCol: String, vecCol: String,
      cellExpr: Column, tauPermille: Int, maxCellSize: Int = 1 << 14,
      prefilterHeadDims: Int = 0, headOrder: Array[Int] = Array.empty): DataFrame = {
    val cc = Dedup.connectedComponents(
      semanticPairs(df, idCol, vecCol, cellExpr, tauPermille, maxCellSize,
        prefilterHeadDims, headOrder))
    df.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("comp"), col("id")).as("cluster"))
  }

  /** Variance-DESCENDING dimension order (one corpus aggregation, the
    * spectrum read the OPQ trainer also takes): the permutation that
    * concentrates vector energy in the leading dims, which is exactly
    * what makes [[semanticPairs]]' head-dot prefilter bound tight. Real
    * embedding spectra decay fast (PCA-like), so a short head carries
    * most of the norm. 1-based positions, ready for `element_at`.
    */
  def varianceOrder(df: DataFrame, vecCol: String): Array[Int] =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(avg(col("x") * col("x")).as("ex2"), avg(col("x")).as("ex"))
      .select(col("pos"), (col("ex2") - col("ex") * col("ex")).as("v"))
      .orderBy(col("v").desc, col("pos"))
      .collect().map(_.getInt(0) + 1)

  /** The pair-emission stage of [[semanticClusters]]: all within-cell pairs
    * at or above the cosine threshold, as (ia, ib). Public both as a usable
    * near-dup-pair miner and so the cell-size guard's pair bound is
    * directly observable.
    *
    * `prefilterHeadDims` > 0 turns on the partial-cosine PREFILTER (the
    * SemDeDup cost lever, VERDICT r7 item 4): per vector, precompute the
    * full-norm-scaled head slice h (the `headOrder` permutation's first
    * dims — pass [[varianceOrder]] output; identity order when empty) and
    * its tail factor √max(0, 1−‖h‖²). For a pair, cos(a,b) = ⟨ha,hb⟩ +
    * ⟨ta,tb⟩ and Cauchy–Schwarz bounds the tail term by the tail-factor
    * product, so `⟨ha,hb⟩ + ta·tb < τ` PROVES the pair fails the
    * threshold. The bound is exact mathematics, not an approximation —
    * recall 1 by construction — and survivors take the exact cosine, so
    * results are identical with the prefilter on or off (spec-pinned).
    *
    * The shape matters as much as the math: the quadratic join is
    * MEMORY-bound (the round-8 probe measured carrying full vectors
    * through the pair join at ~240 ns/pair with the fused cosine — adding
    * prefilter columns on top only made rows bigger and 3x slower), so
    * the prefiltered path joins SLIM rows (id, head, tail factor — no
    * vector), bound-filters, and only the few survivors join back to
    * their full vectors for the exact check. Win condition (measured,
    * ScaleProbe round 8, 3M pairs, decaying spectrum): the pair-join
    * machinery itself costs ~250 ns/pair, which DOMINATES the fused
    * cosine up to ~1k dims — exact wins at 256 (0.8 s vs 1.7 s), ties at
    * 1024, and the prefilter wins 1.5× at 3072 (2.6 s vs 1.8 s, the
    * modern embedding-API size) with a gap that grows linearly in d
    * while the prefiltered path stays flat. Leave OFF below ~1k dims; a
    * flat spectrum also prunes nothing (see [[varianceOrder]]).
    */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
      cellExpr: Column, tauPermille: Int, maxCellSize: Int = 1 << 14,
      prefilterHeadDims: Int = 0, headOrder: Array[Int] = Array.empty): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val v0 = withSubcell(
      df.select(col(idCol).as("id"), col(vecCol).as("vec"), cellExpr.as("cell")),
      "id", maxCellSize)
    if (prefilterHeadDims <= 0) {
      val a = v0.select(col("cell"), col("__sub"), col("id").as("ia"), col("vec").as("va"))
      val b = v0.select(col("cell"), col("__sub"), col("id").as("ib"), col("vec").as("vb"))
      a.join(b, Seq("cell", "__sub")).filter(col("ia") < col("ib"))
        .filter(cosine("va", "vb") * 1000 >= tauPermille)
        .select(col("ia"), col("ib"))
    } else {
      require(headOrder.isEmpty || headOrder.length >= prefilterHeadDims,
        s"headOrder has ${headOrder.length} positions but prefilterHeadDims=" +
          s"$prefilterHeadDims — supply at least prefilterHeadDims positions")
      val headPos = (if (headOrder.nonEmpty) headOrder
        else (1 to prefilterHeadDims).toArray).take(prefilterHeadDims)
      require(headPos.forall(p => p >= 1),
        s"headOrder positions are 1-based; got ${headPos.filter(_ < 1).mkString(",")}")
      val maxPos = headPos.max
      val dotF = (x: Column, y: Column) =>
        org.apache.spark.sql.functions.call_function("graft_dot", x, y)
      // per-VECTOR precompute (linear, once): full-norm-scaled head slice
      // + the Cauchy-Schwarz tail factor √max(0, 1−‖h‖²). The pair join
      // carries ONLY these slim columns — never the vector. Every
      // expression here is CODEGEN-able on purpose: a transform/aggregate
      // lambda formulation is CodegenFallback (interpreted), and filter
      // pushdown INLINES the alias into the per-side scans — measured as
      // the dominant cost of the whole prefilter before this shape.
      val nrm = sqrt(dotF(col("vec"), col("vec")))
      // head positions past a vector's end would yield null slots in __h,
      // which graft_dot reads as garbage — fail LOUDLY per row instead
      // (checks every row, so ragged vector lengths can't slip through;
      // cost is one comparison in a linear per-vector pass)
      val guarded = when(size(col("vec")) >= lit(maxPos), col("vec"))
        .otherwise(raise_error(concat(
          lit(s"graft.semanticPairs: prefilter head position $maxPos exceeds vector length "),
          size(col("vec")).cast("string"))))
      val slim = v0
        .withColumn("vec", guarded)
        .withColumn("__h", array(
          headPos.map(i => element_at(col("vec"), lit(i)).cast("double") / nrm): _*))
        .withColumn("__ht", sqrt(greatest(lit(0.0d),
          lit(1.0d) - dotF(col("__h"), col("__h")))))
        .select(col("cell"), col("__sub"), col("id"), col("__h"), col("__ht"))
      val a = slim.select(col("cell"), col("__sub"), col("id").as("ia"),
        col("__h").as("__ha"), col("__ht").as("__hta"))
      val b = slim.select(col("cell"), col("__sub"), col("id").as("ib"),
        col("__h").as("__hb"), col("__ht").as("__htb"))
      // per-PAIR cost: one fused O(head) dot (native graft_dot — a
      // zip_with/aggregate bound allocates the product array per pair
      // and measured SLOWER than no prefilter at all) + one multiply.
      // The 1e-6 slack covers floating-point evaluation-order drift
      // between the bound and the exact cosine: Cauchy-Schwarz holds in
      // exact arithmetic, but a pair EXACTLY at the threshold could
      // round an ulp below it here and above it in graft_cosine — the
      // slack admits boundary pairs to the exact re-check (which decides
      // truth) instead of losing them, keeping on/off results identical.
      val bound = org.apache.spark.sql.functions.call_function(
        "graft_dot", col("__ha"), col("__hb")) + col("__hta") * col("__htb")
      val survivors = a.join(b, Seq("cell", "__sub"))
        .filter(col("ia") < col("ib"))
        .filter((bound + lit(1e-6d)) * 1000 >= tauPermille)
        .select(col("ia"), col("ib"))
      // only survivors (few, by construction) fetch their full vectors
      // back for the exact check — two joins over a tiny frame
      val vecs = v0.select(col("id"), col("vec"))
      survivors
        .join(vecs.toDF("ia", "va"), Seq("ia"))
        .join(vecs.toDF("ib", "vb"), Seq("ib"))
        .filter(cosine("va", "vb") * 1000 >= tauPermille)
        .select(col("ia"), col("ib"))
    }
  }

  /** [[semanticClusters]] with IVF-codebook cells — train once
    * ([[trainCodebook]]), then cluster within coarse cells.
    */
  def semanticClustersIvf(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], tauPermille: Int,
      maxCellSize: Int = 1 << 14, prefilterHeadDims: Int = 0,
      headOrder: Array[Int] = Array.empty): DataFrame =
    semanticClusters(
      assignCell(df, vecCol, centroids), idCol, vecCol, col("cell"), tauPermille,
      maxCellSize, prefilterHeadDims, headOrder)

  /** Semantic dedup: keep exactly one document per semantic cluster (the
    * min-id representative) — the SemDeDup "drop the rest" step.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      cellExpr: Column, tauPermille: Int, maxCellSize: Int = 1 << 14,
      prefilterHeadDims: Int = 0, headOrder: Array[Int] = Array.empty): DataFrame = {
    val clusters = semanticClusters(df, idCol, vecCol, cellExpr, tauPermille,
      maxCellSize, prefilterHeadDims, headOrder)
    df.join(
      clusters.filter(col(idCol) === col("cluster")).select(idCol),
      Seq(idCol), "left_semi")
  }

  /** Hybrid retrieval: lexical (integer-idf keyword) and vector (cosine)
    * candidate pools of `poolK` each, fused by RANK SUM — an id absent
    * from one pool takes the poolK+1 penalty rank. Rank-sum fusion is the
    * integer-exact cousin of reciprocal-rank fusion: fully reproducible
    * across engines (no float score mixing), and the usual first choice
    * when lexical and vector scores live on incomparable scales. Both
    * pools are distributed top-K; the fuse is a full-outer join of two
    * poolK-row frames — driver-scale, not corpus-scale.
    */
  def hybridTopK(docs: DataFrame, docIdCol: String, textCol: String,
      emb: DataFrame, vecIdCol: String, vecCol: String,
      queryText: String, queryVec: Array[Float], k: Int, poolK: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    rankFuse(
      TextAnalysis.lexicalTopK(docs, docIdCol, textCol, queryText, poolK),
      bruteForceTopK(emb, vecIdCol, vecCol, Seq(Tuple1(queryVec)).toDF("q"), poolK),
      k, poolK)
  }

  /** [[hybridTopK]] with the BM25 lexical arm
    * ([[TextAnalysis.bm25TopK]] — tf saturation + length normalization
    * instead of the plain idf pool): identical rank-sum fusion, so
    * swapping the lexical scorer changes ONLY the lexical pool's order;
    * the fixed-point BM25 keeps the whole hybrid table engine-exact.
    */
  def hybridTopKBm25(docs: DataFrame, docIdCol: String, textCol: String,
      emb: DataFrame, vecIdCol: String, vecCol: String,
      queryText: String, queryVec: Array[Float], k: Int, poolK: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    rankFuse(
      TextAnalysis.bm25TopK(docs, docIdCol, textCol, queryText, poolK),
      bruteForceTopK(emb, vecIdCol, vecCol, Seq(Tuple1(queryVec)).toDF("q"), poolK),
      k, poolK)
  }

  /** [[hybridTopK]] with an IVF-RESTRICTED vector pool — the 100 TB
    * retrieval path: the vector side probes only the query's coarse cell
    * ([[ivfTopK]]; `queryDf` carries `q` + `qcell` exactly as there)
    * instead of brute-force scanning the corpus, so per-query vector cost
    * is |corpus| × nprobe / nCells while the fusion semantics stay
    * byte-identical to [[hybridTopK]] (rank-sum over poolK pools with
    * poolK+1 absence penalties). With trained centroids, build `queryDf`
    * via [[assignCell]] of the query vector; with a metadata cell
    * (cross-engine verification) pass it directly.
    */
  def hybridTopKIvf(docs: DataFrame, docIdCol: String, textCol: String,
      emb: DataFrame, vecIdCol: String, vecCol: String, cellCol: String,
      queryText: String, queryDf: DataFrame, k: Int, poolK: Int): DataFrame =
    rankFuse(
      TextAnalysis.lexicalTopK(docs, docIdCol, textCol, queryText, poolK),
      ivfTopK(emb, vecIdCol, vecCol, cellCol, queryDf, poolK),
      k, poolK)

  /** BATCHED [[hybridTopKIvf]] — production retrieval is a query SET, not
    * one query. `queries` carries one row per query: `qid`, `qterms`
    * (array of lexical terms, pre-lowercased), `q` (query vector),
    * `qcell` (coarse IVF cell). Per-query fusion semantics are
    * byte-identical to the single-query path (rank-sum over poolK pools,
    * poolK+1 absence penalty), asserted by PipelineSpec against
    * [[hybridTopKIvf]] run query-by-query.
    *
    * The batch shape is what changes the cost: the corpus tokenize runs
    * ONCE for all queries (docs explode → broadcast semi-join on the
    * UNION of query terms, then the per-query term map re-joins the
    * already-matched rows); term df is computed once per term over that
    * matched set (df is query-independent); the vector side is ONE
    * pruned scan — the corpus joins the broadcast query set on the cell
    * key, so only the union of query cells is scored, |cell| × nprobe
    * rows per query, and every per-query rank is a window PARTITIONED BY
    * QUERY (WindowGroupLimit pre-filters each map partition to poolK
    * rows per query before the shuffle). Queries are driver-bounded by
    * contract (they broadcast); pools are poolK × |queries| rows.
    */
  def hybridTopKIvfBatch(docs: DataFrame, docIdCol: String, textCol: String,
      emb: DataFrame, vecIdCol: String, vecCol: String, cellCol: String,
      queries: DataFrame, k: Int, poolK: Int): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // referenced by the lexical AND vector branches of one final action
    val q = queries.select(col("qid"), col("qterms"), col("q"), col("qcell"))
      .localCheckpoint(eager = false)
    val qTerms = q.select(col("qid"), explode(array_distinct(col("qterms"))).as("term"))
    val termSet = qTerms.select(col("term")).distinct()
    val nDocs = docs.count()
    val matchedDocs = docs
      .select(col(docIdCol).as("id"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
      .join(broadcast(termSet), Seq("term"))
      .localCheckpoint(eager = false) // feeds df agg AND the score join
    val dfc = matchedDocs.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val lex = matchedDocs
      .join(broadcast(qTerms), Seq("term"))
      .join(broadcast(dfc), Seq("term"))
      .withColumn("w", expr(s"(${nDocs}L * 1000L) div df"))
      .groupBy(col("qid"), col("id")).agg(sum(col("w")).as("score"))
      .withColumn("lrank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))))
      .filter(col("lrank") <= poolK)
      .select(col("qid"), col("id"), col("lrank"))
    val vec = emb
      .join(broadcast(q.select(col("qid"), col("q"), col("qcell"))),
        emb(cellCol) === col("qcell"))
      .withColumn("sim", cosine(vecCol, "q"))
      .select(col("qid"), col(vecIdCol).as("id"), col("sim"))
      .withColumn("vrank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))))
      .filter(col("vrank") <= poolK)
      .select(col("qid"), col("id"), col("vrank"))
    lex.join(vec, Seq("qid", "id"), "full_outer")
      .na.fill(poolK + 1, Seq("lrank", "vrank"))
      .withColumn("rank_sum", (col("lrank") + col("vrank")).cast("long"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rank_sum"), col("id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("rank_sum"))
  }

  /** SEMANTIC decontamination (the embedding twin of the n-gram
    * [[TextAnalysis.decontaminate]]): flag every train vector whose
    * cosine against ANY eval vector reaches `tauPermille`/1000 —
    * paraphrased eval leakage that shares no 8-gram with the benchmark
    * still lands next to it in embedding space. Recall must be 1 (a
    * missed contamination poisons the benchmark), so there is no ANN
    * shortcut here: the eval set is benchmark-sized (thousands, driver-
    * bounded by contract) and BROADCASTS; the train side stays one
    * linear pass — broadcast nested-loop join, per-row cosine against
    * each eval vector, map-side-combined per-id count. No shuffle ever
    * carries more than one row per CONTAMINATED train id. Returns
    * (id, n_hits) for contaminated train vectors only, n_hits = how many
    * eval vectors sit at/above the threshold.
    */
  def semanticDecontaminate(train: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, tauPermille: Int): DataFrame = {
    graft.functions.GraftFunctions.register(train.sparkSession)
    train.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(broadcast(evalSet.select(col(vecCol).as("q"))),
        cosine("v", "q") * 1000 >= tauPermille)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Persist a cell-assigned vector snapshot for incremental semantic
    * dedup — the embedding twin of `Dedup.saveMinhashSnapshot`: (id, vec)
    * partitioned by the caller's cell column, so a later shard ingest
    * joins cell-to-cell against a layout that PRUNES to the shard's
    * cells (directory-level PartitionFilters) instead of rescanning the
    * corpus.
    */
  def saveSemanticSnapshot(df: DataFrame, idCol: String, vecCol: String,
      cellCol: Column, path: String): Unit =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"), cellCol.as("cell"))
      .repartition(col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Incremental SEMANTIC near-dup: check an arriving shard against a
    * [[saveSemanticSnapshot]] corpus without an all-pairs pass — the
    * SemDeDup contract (same-cell exact cosine, recall within cells)
    * applied cross-generation. The join key is the cell, so only the
    * shard's cells' snapshot partitions are read; within a matched cell
    * the exact `graft_cosine` filter runs per candidate pair (skewed
    * cells re-split by AQE skew-join; the within-cell pair count is the
    * cost driver, exactly as in batch semanticPairs). Returns
    * (snap_id, new_id) pairs at `tauPermille`.
    */
  def semanticDupsAgainstSnapshot(shard: DataFrame, idCol: String,
      vecCol: String, cellCol: Column, path: String,
      tauPermille: Int): DataFrame = {
    graft.functions.GraftFunctions.register(shard.sparkSession)
    val snap = shard.sparkSession.read.parquet(path)
    snap.select(col("cell"), col("id").as("snap_id"), col("vec").as("va"))
      .join(shard.select(cellCol.as("cell"), col(idCol).as("new_id"),
        col(vecCol).as("vb")), Seq("cell"))
      .filter(cosine("va", "vb") * 1000 >= tauPermille)
      .select(col("snap_id"), col("new_id"))
  }

  /** Int8 embedding quantization (the 4× storage/bandwidth cut every
    * vector store applies before ANN serving): per-vector symmetric
    * scale 127/max|x|, code = floor(x·scale + 0.5) ∈ [-127, 127].
    * floor(·+0.5) instead of round(): both engines define floor
    * identically, while round()'s half-rule differs across engines — and
    * the margin probe shows every corpus value sits ≥3e-6 from a floor
    * boundary, far above FP noise. All-zero vectors quantize to zero
    * codes (the scale guard — 127/0 would poison the row with NaN).
    * Returns exploded (id, dim, q), dim 1-based; per-row projection +
    * posexplode, no shuffle.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        array_max(transform(col(vecCol), x => abs(x.cast("double")))).as("m"))
      .select(col("id"),
        when(col("m") === 0d, lit(0d)).otherwise(lit(127.0) / col("m")).as("scale"),
        posexplode(col("v")).as(Seq("i", "x")))
      .select(col("id"), (col("i") + 1).cast("long").as("dim"),
        floor(col("x").cast("double") * col("scale") + lit(0.5)).cast("long").as("q"))

  /** Rank-sum fusion core shared by the hybrid variants: both pools
    * arrive as (id, rank ≤ poolK); absence from a pool costs poolK+1.
    */
  private def rankFuse(lexPool: DataFrame, vecPool: DataFrame,
      k: Int, poolK: Int): DataFrame = {
    val lex = lexPool.select(col("id"), col("rank").as("lrank"))
    val vec = vecPool.select(col("id"), col("rank").as("vrank"))
    lex.join(vec, Seq("id"), "full_outer")
      .na.fill(poolK + 1, Seq("lrank", "vrank"))
      .withColumn("rank_sum", (col("lrank") + col("vrank")).cast("long"))
      .orderBy(col("rank_sum"), col("id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rank_sum"), col("id"))))
      .select(col("rank"), col("id"), col("rank_sum"))
  }
}
