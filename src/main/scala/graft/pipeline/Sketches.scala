package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shard-mergeable cardinality / frequency sketches — the corpus
  * observability layer a 100 TB pipeline runs ALONGSIDE the data passes
  * (Flajolet et al. HyperLogLog; Cormode & Muthukrishnan count-min).
  *
  * The engine deliberately materializes the SKETCH STATE as a small
  * relation rather than hiding it in an opaque binary blob (what
  * `approx_count_distinct` does): a (group, register, rho) /
  * (row, bucket, count) table is
  *  - exactly mergeable across shards/days with one `max` / `sum`
  *    aggregate (the sketch laws, spec-pinned),
  *  - engine-portable (any SQL engine recomputes it bit-for-bit — the
  *    correctness gate runs the same lineage in DuckDB), and
  *  - bounded: ≤ groups·2^b rows (HLL) or d·w rows (CMS) at ANY corpus
  *    size, so the daily sketch of a 100 TB crawl is kilobytes.
  *
  * All hashing is [[TextAnalysis.hash60]] (md5-derived 60-bit), so the
  * register/bucket assignment is deterministic across engines, shards,
  * partitionings and rounds — no JVM hashCode anywhere.
  */
object Sketches {

  /** HyperLogLog register table over the distinct values of `keyCol`,
    * one sketch per `groupCol` value: (group, register, rho) where
    * register = hash60 mod 2^b and rho = leading-zero-count + 1 of the
    * remaining 60−b hash bits (the classic HLL observable). Sparse —
    * only registers that were hit appear; [[hllEstimate]] treats absent
    * registers as rho 0.
    *
    * One hash-aggregate (map-side combined max), output ≤ groups·2^b
    * rows regardless of input size. Day-over-day / shard-over-shard
    * union is [[hllMerge]] — max per register, associative and
    * idempotent, so re-processing a shard cannot inflate the estimate
    * (the property that makes HLL the right distinct-counter for
    * at-least-once pipelines).
    *
    * rho is exact integer arithmetic on both engines: bit-length via
    * `length(bin(x))` (Spark and DuckDB `bin` agree on non-negative
    * BIGINT), never a float log2.
    */
  def hllRegisters(df: DataFrame, keyCol: String, groupCol: String,
      b: Int): DataFrame =
    hllObservables(df, keyCol, groupCol, b)
      .groupBy(col("grp"), col("register"))
      .agg(max(col("rho0")).as("rho"))

  /** The per-row HLL observable BEFORE aggregation: (grp, register,
    * rho0) for each input row — the ONE definition the batch max
    * ([[hllRegisters]]) and the streaming register state
    * ([[graft.streaming.PipelineStream.hllStream]]) both fold, so the
    * two paths cannot drift.
    */
  def hllObservables(df: DataFrame, keyCol: String, groupCol: String,
      b: Int): DataFrame = {
    require(b >= 1 && b <= 16, s"register bits b=$b outside [1,16]")
    val m = 1L << b
    val w = 60 - b
    val h = TextAnalysis.hash60(col(keyCol))
    val rest = shiftright(h, b) // h >= 0: arithmetic shift == logical
    df.select(col(groupCol).as("grp"),
      (h % m).as("register"),
      when(rest === 0L, lit(w + 1).cast("long"))
        .otherwise(lit(w + 1).cast("long") - length(bin(rest)))
        .as("rho0"))
  }

  /** Merge two register tables (max per (group, register)) — the HLL
    * union law: estimate(merge(a,b)) counts distinct(a ∪ b).
    */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("grp"), col("register"))
      .agg(max(col("rho")).as("rho"))

  /** Cardinality estimate per group from a register table: the standard
    * HLL estimator (α_m·m²/Σ2^−rho with the small-range linear-counting
    * correction). Floats — an OBSERVABILITY readout, deliberately not an
    * oracle surface; the register table itself is the exact artifact.
    */
  def hllEstimate(registers: DataFrame, b: Int): DataFrame = {
    val m = 1L << b
    val alpha = b match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    registers
      .groupBy(col("grp"))
      .agg(sum(pow(lit(2.0), -col("rho"))).as("hit_sum"),
        count(lit(1)).as("nonzero"))
      .select(col("grp"), col("nonzero"),
        {
          val zeros = lit(m.toDouble) - col("nonzero")
          val raw = lit(alpha * m * m) / (col("hit_sum") + zeros)
          // linear counting below 2.5m when empty registers remain
          when(raw <= lit(2.5 * m) && zeros > 0,
            lit(m.toDouble) * log(lit(m.toDouble) / zeros))
            .otherwise(raw).as("estimate")
        })
  }

  /** Sliding-window distinct sketch: HLL registers per time bucket
    * (`bucketCol` — e.g. epoch day), then each bucket's TRAILING-window
    * union via register-wise max over the previous `windowBuckets`
    * buckets — "distinct users, last 7 days, every day" in one pass
    * plus one tiny window. Returns (bucket, register, rho) of the
    * WINDOWED sketch; feed to [[hllEstimate]] (grp = bucket) for the
    * numeric series.
    *
    * The range window runs on the REGISTER TABLE (≤ buckets·2^b rows),
    * not the data — the corpus pass is the one hash-aggregate of
    * [[hllRegisters]]; sliding re-aggregation of raw data never
    * happens. Exact integer output: oracle-able as SQL end to end.
    */
  def hllSliding(df: DataFrame, keyCol: String, bucketCol: String,
      b: Int, windowBuckets: Int): DataFrame = {
    require(windowBuckets >= 1, s"windowBuckets $windowBuckets < 1")
    val perBucket = hllRegisters(df, keyCol, bucketCol, b)
      .select(col("grp").cast("long").as("bucket"), col("register"), col("rho"))
    // union over the trailing window = max over buckets in range; sparse
    // registers stay sparse (absent = never hit in the window)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("register"))
      .orderBy(col("bucket"))
      .rangeBetween(-(windowBuckets - 1).toLong, 0L)
    // a register absent in bucket t but present at t-1 must still appear
    // in t's window: densify buckets per register to every bucket in the
    // table's range before the max (register table is tiny — this is
    // metrics-space work)
    val buckets = perBucket.select(col("bucket")).distinct()
    val regs = perBucket.select(col("register")).distinct()
    buckets.crossJoin(regs)
      .join(perBucket, Seq("bucket", "register"), "left")
      .withColumn("wrho", max(col("rho")).over(w))
      .filter(col("wrho").isNotNull)
      .select(col("bucket"), col("register"), col("wrho").as("rho"))
  }

  /** Audience-overlap readout between two groups' register tables:
    * |A ∩ B| estimated by inclusion–exclusion over the HLL estimates
    * (est(A) + est(B) − est(A ∪ B), union = register-wise max — the
    * merge law applied across groups instead of shards; floored at 0).
    * One row out; everything operates on ≤ 2·2^b register rows, so this
    * is a metrics readout like [[hllEstimate]], not an oracle surface.
    */
  def hllIntersect(registers: DataFrame, b: Int, grpA: String,
      grpB: String): DataFrame = {
    val sel = registers.filter(col("grp").isin(grpA, grpB))
    val per = hllEstimate(sel, b)
    val ea = per.filter(col("grp") === grpA).select(col("estimate").as("est_a"))
    val eb = per.filter(col("grp") === grpB).select(col("estimate").as("est_b"))
    val eu = hllEstimate(
      sel.groupBy(lit("__union").as("grp"), col("register"))
        .agg(max(col("rho")).as("rho")), b)
      .select(col("estimate").as("est_union"))
    ea.crossJoin(eb).crossJoin(eu)
      .select(lit(grpA).as("grp_a"), lit(grpB).as("grp_b"),
        col("est_a"), col("est_b"), col("est_union"),
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union"))
          .as("est_intersect"))
  }

  /** Exact two-sample Kolmogorov–Smirnov drift statistic between two
    * corpora over an integer-valued per-row observable (token count,
    * quality score, …): D = max over values v of |F_A(v) − F_B(v)|,
    * computed and returned ENTIRELY in integer space —
    * `d_scaled = max |cumA(v)·n_B − cumB(v)·n_A|` (DECIMAL(38,0), exact
    * past 2^63), `d_permille = 1000·d_scaled / (n_A·n_B)` and the
    * arg-max value — so two engines agree bit-for-bit, unlike any
    * float-CDF formulation. One row out: (n_a, n_b, at_value,
    * d_scaled, d_permille).
    *
    * Shape: per-side value-histogram aggregates (bounded by the
    * VALUE DOMAIN, not the corpus), a full-outer join of the two
    * histograms, one running-sum window over distinct values. That
    * window is a single global order — correct because the frame is
    * histogram-sized (the p91 contract: lengths/scores have ≤ ~1e4
    * distinct values at any corpus size); for an unbounded continuous
    * observable, bucket it first (`EstimatedHistogram` bounds) exactly
    * as p91 does.
    */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val ha = a.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("ca"))
    val hb = b.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cb"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ha.join(hb, Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .withColumn("cuma", sum(col("ca")).over(w).cast("decimal(38,0)"))
      .withColumn("cumb", sum(col("cb")).over(w).cast("decimal(38,0)"))
      .withColumn("na", sum(col("ca")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()).cast("decimal(38,0)"))
      .withColumn("nb", sum(col("cb")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()).cast("decimal(38,0)"))
      .withColumn("gap", abs(col("cuma") * col("nb") - col("cumb") * col("na")))
      // arg-max by (gap desc, v asc) via one struct-max — deterministic
      .select(max(struct(col("gap"), (-col("v")).as("negv"),
        col("na"), col("nb"))).as("m"))
      // empty input → the global agg emits one all-null row; one-side-
      // empty → na·nb = 0 and D is undefined. Both return ZERO rows
      // (the SQL-lineage contract), never a null or divide-by-zero row.
      .filter(col("m").isNotNull && col("m.na") > 0 && col("m.nb") > 0)
      .select(col("m.na").cast("long").as("n_a"),
        col("m.nb").cast("long").as("n_b"),
        (-col("m.negv")).cast("long").as("at_value"),
        col("m.gap").as("d_scaled"),
        expr("CAST(m.gap * 1000 DIV (m.na * m.nb) AS BIGINT)").as("d_permille"))
  }

  /** Per-group exact lower median of an integer observable via the
    * histogram trick: (group, value) counts, per-group cumulative
    * window over the bounded value domain (the p91 contract), median =
    * least value whose cumulative count reaches rank (n+1) div 2.
    * Returns (grp, med). Never sorts raw rows — only the histogram.
    */
  def groupedMedian(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    df.select(col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(tot))
      .filter(expr("cum >= (n + 1) div 2"))
      .groupBy(col("grp")).agg(min(col("v")).as("med"))
  }

  /** Robust per-group outlier flags: a row is an outlier when its
    * absolute deviation from the group median exceeds k × the group's
    * MAD (median absolute deviation) — the z-score's robust cousin,
    * immune to the outliers it hunts, and ENTIRELY integer-exact (two
    * [[groupedMedian]] passes + one comparison; no means, no stddevs,
    * no floats). MAD 0 (over half the group identical) flags any
    * deviation ≥ 1, the conventional degenerate reading. Returns every
    * row: (id, grp, v, med, mad, outlier 0/1).
    */
  def madOutliers(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String, k: Int = 3): DataFrame = {
    // ONE projection feeds the threshold training AND the row flags —
    // df (often a computed-column lineage) scans once
    val d = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
        col(valueCol).cast("long").as("v"))
      .localCheckpoint(false)
    applyMadThresholds(d, "id", "v", "grp",
      madThresholdsFrom(d.select(col("grp"), col("v"))), k)
  }

  /** The ONE flag application batch ([[madOutliers]]) and stream
    * ([[graft.streaming.PipelineStream.outlierStream]]) share: rows join
    * the broadcast (grp, med, mad) artifact and flag
    * |v − med| > k·MAD. Rows in groups absent from the artifact drop
    * (inner join — an untrained group belongs in the next training
    * pass, not silently unflagged).
    */
  def applyMadThresholds(rows: DataFrame, idCol: String, valueCol: String,
      groupCol: String, thresholds: DataFrame, k: Int): DataFrame =
    rows.select(col(idCol).as("id"), col(groupCol).as("grp"),
        col(valueCol).cast("long").as("v"))
      .join(broadcast(thresholds), Seq("grp"))
      .select(col("id"), col("grp"), col("v"), col("med"), col("mad"),
        (abs(col("v") - col("med")) > col("mad") * k).cast("long").as("outlier"))

  /** The trained (grp, med, mad) artifact behind [[madOutliers]] —
    * groups-sized, broadcastable, and the model a STREAMING gate
    * ([[graft.streaming.PipelineStream.outlierStream]]) applies to a
    * feed; one definition so batch and stream flags cannot drift.
    */
  def madThresholds(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame =
    madThresholdsFrom(df.select(col(groupCol).as("grp"),
      col(valueCol).cast("long").as("v")))

  private def madThresholdsFrom(d0: DataFrame): DataFrame = {
    val d = d0.localCheckpoint(false) // feeds both median passes
    val med = groupedMedian(d, "v", "grp")
    val mad = groupedMedian(
      d.join(med, Seq("grp")).withColumn("adev", abs(col("v") - col("med"))),
      "adev", "grp").withColumnRenamed("med", "mad")
    med.join(mad, Seq("grp"))
  }

  /** CUSUM-style change-point detection over a counted time series:
    * bucket the rows by `bucketCol` (e.g. epoch day), index the present
    * buckets 1..D in order, and find the bucket maximizing
    * |S_i·D − i·S| — the deviation of the observed prefix count S_i
    * from the constant-rate expectation i·S/D, cleared of division (the
    * same integer-exactness move as [[ksDrift]]). A rate change at
    * bucket c makes the statistic peak at c. One row out: (n_buckets,
    * total, at_bucket, dev_scaled, dev_permille), dev_permille =
    * 1000·max|…|/(D·S) ∈ [0, ~500] (0 = perfectly constant rate).
    *
    * The bucket-count aggregate is the only corpus pass; the windows
    * run on the bucket table (the p91 bounded-domain contract). Decimal
    * arithmetic keeps S_i·D exact past 2^63.
    */
  def cusumChangePoint(df: DataFrame, bucketCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    df.select(col(bucketCol).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("si", sum(col("c")).over(wRun).cast("decimal(38,0)"))
      .withColumn("d", count(lit(1)).over(tot).cast("decimal(38,0)"))
      .withColumn("s", sum(col("c")).over(tot).cast("decimal(38,0)"))
      .withColumn("gap", abs(col("si") * col("d") - col("i") * col("s")))
      .select(max(struct(col("gap"), (-col("bucket")).as("negb"),
        col("d"), col("s"))).as("m"))
      .filter(col("m").isNotNull) // empty input → zero rows, not nulls
      .select(col("m.d").cast("long").as("n_buckets"),
        col("m.s").cast("long").as("total"),
        (-col("m.negb")).cast("long").as("at_bucket"),
        col("m.gap").cast("long").as("dev_scaled"),
        expr("CAST(m.gap * 1000 DIV (m.d * m.s) AS BIGINT)").as("dev_permille"))
  }

  /** Per-group Theil–Sen robust trend over a counted time series: daily
    * counts per (group, bucket), then the MEDIAN of all pairwise slopes
    * (c₂−c₁)/(b₂−b₁) — the slope estimator that shrugs off outlier
    * days where least-squares chases them. Slopes micro-quantize with
    * truncating integer division — MEASURED to agree between Spark's
    * `div` and DuckDB's integer `//` on negatives (both truncate
    * toward zero; DuckDB floors only on floats) — and the median is the
    * [[groupedMedian]] histogram trick over the ≤ C(buckets,2) slope
    * values per group — metrics space end to end after the one
    * (group, bucket) corpus aggregate. Returns (grp, n_buckets,
    * n_pairs, slope_micro_med); groups with a single bucket emit
    * nothing (no pair exists).
    */
  def theilSenTrend(df: DataFrame, bucketCol: String,
      groupCol: String): DataFrame = {
    val b = df.select(col(groupCol).as("grp"),
        col(bucketCol).cast("long").as("bucket"))
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // both sides of the pair join + the rollup
    val pairs = b.select(col("grp"), col("bucket").as("b1"), col("c").as("c1"))
      .join(b.select(col("grp"), col("bucket").as("b2"), col("c").as("c2")),
        Seq("grp"))
      .filter(col("b1") < col("b2"))
      .select(col("grp"),
        expr("1000000 * (c2 - c1) div (b2 - b1)").as("slope"))
      .localCheckpoint(false) // feeds the median and the pair count
    val med = groupedMedian(pairs, "slope", "grp")
      .withColumnRenamed("med", "slope_micro_med")
    b.groupBy(col("grp")).agg(count(lit(1)).as("n_buckets"))
      .join(pairs.groupBy(col("grp")).agg(count(lit(1)).as("n_pairs")),
        Seq("grp"))
      .join(med, Seq("grp"))
      .select(col("grp"), col("n_buckets"), col("n_pairs"),
        col("slope_micro_med"))
  }

  /** Per-group [[cusumChangePoint]] (the monitoring matrix): one
    * change-point row PER `groupCol` value, windows PARTITIONED BY
    * GROUP over the (group, bucket) count table — nothing global, so
    * the report scales to any number of monitored series (the
    * [[ksDriftMatrix]] move applied to the CUSUM statistic). Returns
    * (grp, n_buckets, total, at_bucket, dev_scaled, dev_permille).
    */
  def cusumChangePointBy(df: DataFrame, bucketCol: String,
      groupCol: String): DataFrame = {
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("bucket"))
    val wRun = wOrd.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    df.select(col(groupCol).as("grp"), col(bucketCol).cast("long").as("bucket"))
      .groupBy(col("grp"), col("bucket")).agg(count(lit(1)).as("c"))
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("si", sum(col("c")).over(wRun).cast("decimal(38,0)"))
      .withColumn("d", count(lit(1)).over(tot).cast("decimal(38,0)"))
      .withColumn("s", sum(col("c")).over(tot).cast("decimal(38,0)"))
      .withColumn("gap", abs(col("si") * col("d") - col("i") * col("s")))
      .groupBy(col("grp"))
      .agg(max(struct(col("gap"), (-col("bucket")).as("negb"),
        col("d"), col("s"))).as("m"))
      .select(col("grp"),
        col("m.d").cast("long").as("n_buckets"),
        col("m.s").cast("long").as("total"),
        (-col("m.negb")).cast("long").as("at_bucket"),
        col("m.gap").cast("long").as("dev_scaled"),
        expr("CAST(m.gap * 1000 DIV (m.d * m.s) AS BIGINT)").as("dev_permille"))
  }

  /** Pairwise [[ksDrift]] across every unordered pair of `groupCol`
    * values (the per-source drift data card): one histogram aggregate
    * over (group, value), a tiny group-pair frame, then cumulative
    * windows PARTITIONED BY PAIR — unlike the two-corpus [[ksDrift]],
    * nothing here is a global window, so the matrix scales to any
    * number of sources whose histograms fit the value-domain contract.
    * Returns (grp_a, grp_b, n_a, n_b, at_value, d_permille), grp_a <
    * grp_b.
    */
  def ksDriftMatrix(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    val h = df.groupBy(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // pairs/left/right all read it
    val groups = h.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .crossJoin(groups.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    val left = pairs.join(
      h.select(col("g").as("ga"), col("v"), col("c").as("ca")), Seq("ga"))
    val right = pairs.join(
      h.select(col("g").as("gb"), col("v"), col("c").as("cb")), Seq("gb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb"))
    left.join(right, Seq("ga", "gb", "v"), "full_outer")
      .select(col("ga"), col("gb"), col("v"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .withColumn("cuma", sum(col("ca")).over(w).cast("decimal(38,0)"))
      .withColumn("cumb", sum(col("cb")).over(w).cast("decimal(38,0)"))
      .withColumn("na", sum(col("ca")).over(tot).cast("decimal(38,0)"))
      .withColumn("nb", sum(col("cb")).over(tot).cast("decimal(38,0)"))
      .withColumn("gap", abs(col("cuma") * col("nb") - col("cumb") * col("na")))
      .groupBy(col("ga").as("grp_a"), col("gb").as("grp_b"))
      .agg(max(struct(col("gap"), (-col("v")).as("negv"),
        col("na"), col("nb"))).as("m"))
      .select(col("grp_a"), col("grp_b"),
        col("m.na").cast("long").as("n_a"),
        col("m.nb").cast("long").as("n_b"),
        (-col("m.negv")).cast("long").as("at_value"),
        expr("CAST(m.gap * 1000 DIV (m.na * m.nb) AS BIGINT)").as("d_permille"))
  }

  /** Count-min sketch of token frequencies over `textCol`: d salted
    * hash rows × w buckets, cell = total occurrences of the tokens
    * mapping there. Output (row, bucket, cnt) — d·w rows at any corpus
    * size, shard-mergeable by plain SUM ([[cmsMerge]]).
    *
    * One tokenize pass: per token, its d buckets are computed as one
    * codegen'd array and `posexplode`d (d small), then a single
    * hash-aggregate with map-side combine. No per-row state, no
    * driver-side anything.
    */
  def countMinSketch(df: DataFrame, textCol: String, d: Int = 4,
      w: Int = 512): DataFrame =
    cmsObservables(df, textCol, d, w)
      .groupBy(col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** One count-min sketch PER `groupCol` value (per-language /
    * per-source token profiles): same cells, keyed by group — still one
    * tokenize pass and one map-side-combined aggregate, ≤ groups·d·w
    * output rows, each group's slice merging by the same SUM law.
    */
  def countMinSketchBy(df: DataFrame, textCol: String, groupCol: String,
      d: Int = 4, w: Int = 512): DataFrame =
    cmsObservables(df.withColumnRenamed(groupCol, "grp"), textCol, d, w,
      carry = Seq("grp"))
      .groupBy(col("grp"), col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** The per-token-occurrence CMS observable BEFORE aggregation: one
    * (row, bucket) cell hit per (token, hash row) — the ONE definition
    * the batch counts ([[countMinSketch]]/[[countMinSketchBy]]) and the
    * streaming partials ([[graft.streaming.PipelineStream.cmsStream]])
    * all aggregate. `carry` rides extra key columns through unchanged.
    */
  def cmsObservables(df: DataFrame, textCol: String, d: Int,
      w: Int, carry: Seq[String] = Nil): DataFrame = {
    require(d >= 1 && d <= 16, s"depth d=$d outside [1,16]")
    require(w >= 2, s"width w=$w < 2")
    val tok = explode(TextAnalysis.tokens(col(textCol))).as("tok")
    val buckets = array((0 until d).map { r =>
      TextAnalysis.hash60(concat(lit(s"$r:"), col("tok"))) % w
    }: _*)
    // d md5 hashes per token occurrence dominate the pre-aggregate cost:
    // widen a narrow-scan corpus so the hashing runs on every core
    graft.util.Widen.widenNarrowScan(df).select(carry.map(col) :+ tok: _*)
      .select(carry.map(col) :+ posexplode(buckets).as(Seq("row", "bucket")): _*)
      .select(carry.map(col) ++ Seq(col("row").cast("long").as("row"),
        col("bucket")): _*)
  }

  /** Merge two count-min sketches of identical (d, w): cell-wise sum —
    * exact because each cell is a plain counter.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-query readout: estimated frequency of each query token =
    * min over the d cells it maps to (the count-min guarantee:
    * estimate ≥ true count, overshoot bounded by collisions). The
    * sketch is d·w rows → broadcast; the query side is one pass.
    * Returns (tok, est).
    */
  def cmsLookup(sketch: DataFrame, queries: DataFrame, tokCol: String,
      d: Int = 4, w: Int = 512): DataFrame = {
    val buckets = array((0 until d).map { r =>
      TextAnalysis.hash60(concat(lit(s"$r:"), col("tok"))) % w
    }: _*)
    val q = queries.select(col(tokCol).as("tok")).distinct()
      .select(col("tok"), posexplode(buckets).as(Seq("qrow", "qbucket")))
    q.join(broadcast(sketch),
        q("qrow").cast("long") === sketch("row") &&
          q("qbucket") === sketch("bucket"), "left")
      .groupBy(col("tok"))
      // a row/bucket absent from the sketch is a zero cell
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Windowed CMS drift series (the heavy-hitter drift monitor): one
    * count-min sketch per time bucket of `bucketCol`, then per
    * consecutive-bucket pair the CELL-SPACE distance between the two
    * sketches — `l1` = Σ|cell_t − cell_{t−1}| and `cells_changed` —
    * plus both buckets' total mass. A vocabulary shift (new spam
    * campaign, feed schema change, language mix flip) moves cell mass
    * between buckets and spikes `l1` long before any exact top-k job
    * would surface it, at d·w integers per bucket of state.
    *
    * One tokenize pass (the [[cmsObservables]] lineage with the bucket
    * carried), one map-side-combined aggregate; the pairing runs on the
    * SKETCH TABLE (≤ buckets·d·w rows — metrics space), via a
    * full-outer join of each bucket's cells with its predecessor's
    * (absent cell = 0). The predecessor is the previous PRESENT bucket
    * (lag over the distinct-bucket list — a global window over ≤
    * buckets rows, the p91 bounded-domain contract), so an empty bucket
    * reads as a gap, not a zero sketch. Returns (bucket, prev_bucket,
    * l1, cells_changed, mass, prev_mass); the first bucket emits
    * nothing.
    */
  def cmsDriftSeries(df: DataFrame, textCol: String, bucketCol: String,
      d: Int = 4, w: Int = 512): DataFrame = {
    val sk = cmsObservables(
        df.select(col(bucketCol).cast("long").as("grp"), col(textCol)),
        textCol, d, w, carry = Seq("grp"))
      .groupBy(col("grp"), col("row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // both sides of the consecutive-pair join
    val wb = org.apache.spark.sql.expressions.Window.orderBy(col("grp"))
    val pairs = sk.select(col("grp")).distinct()
      .withColumn("pg", lag(col("grp"), 1).over(wb))
      .filter(col("pg").isNotNull)
      .localCheckpoint(false) // joined from both sides below
    val cur = pairs.join(sk, Seq("grp"))
      .select(col("grp"), col("pg"), col("row"), col("bucket"),
        col("cnt").as("ca"))
    val prev = pairs.join(
        sk.select(col("grp").as("pg"), col("row"), col("bucket"),
          col("cnt").as("cb")), Seq("pg"))
      .select(col("grp"), col("pg"), col("row"), col("bucket"), col("cb"))
    cur.join(prev, Seq("grp", "pg", "row", "bucket"), "full_outer")
      .select(col("grp"), col("pg"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .groupBy(col("grp").as("bucket"), col("pg").as("prev_bucket"))
      .agg(sum(abs(col("ca") - col("cb"))).as("l1"),
        count(when(col("ca") =!= col("cb"), 1)).as("cells_changed"),
        sum(col("ca")).as("mass"), sum(col("cb")).as("prev_mass"))
  }

  /** Pairwise total-variation drift across every unordered pair of
    * `groupCol` values over a CATEGORICAL observable — the unordered
    * cousin of [[ksDriftMatrix]] (KS needs an ordered domain; language
    * / event-type / source mixes have none). Per pair and category the
    * division-free deviation `dev_scaled = |c_a·n_b − c_b·n_a|`
    * (DECIMAL(38,0) — exact past 2^63), and the pair's TV distance
    * `tv_permille = 1000·Σdev / (2·n_a·n_b)` stamped on every row.
    *
    * One (group, category) histogram aggregate is the only corpus
    * pass; the pair explosion runs on the histogram (≤ groups²·cats
    * rows — metrics space). Categories absent on one side count 0
    * (full-outer). Returns (grp_a, grp_b, cat, n_a, n_b, dev_scaled,
    * tv_permille), grp_a < grp_b.
    */
  /** Per-bucket chi-square drift — the classic homogeneity statistic
    * over the (bucket × category) contingency table, EXACT integers:
    * each cell contributes 1e6·(o·N − r·c)² div (N·r·c) (the expected
    * count e = r·c/N cleared of its fraction), rolled up per bucket so
    * Σ over buckets is the full-table χ²·1e6. Products run in
    * DECIMAL(38,0); the 1e6·(o·N − r·c)² intermediate (|o·N − r·c| can
    * reach N²) caps the validity at N ≤ 1e8 rows per table (loud
    * guard) — one contingency table per drift window, so the bound is
    * per-window, not per-corpus; wider windows shard by time first.
    * Joins: cell counts ×
    * bucket totals (co-keyed) × a category-count broadcast × the N
    * scalar — contingency-sized, never corpus-sized. Returns
    * (bucket, n, chi2_micro); the caller compares buckets or sums for
    * the table statistic (df = (buckets−1)·(cats−1)).
    */
  def chiSquareDrift(df: DataFrame, bucketCol: String,
      catCol: String): DataFrame =
    chiSquareFromCounts(
      df.groupBy(col(bucketCol).cast("long").as("bucket"),
          col(catCol).as("cat"))
        .agg(count(lit(1)).as("o")))

  /** The scoring half of [[chiSquareDrift]], shared so the streaming
    * twin (window-close per-(bucket, cat) counts) scores through the
    * SAME completed-table arithmetic: input is a (bucket, cat, o)
    * count relation, output (bucket, n, chi2_micro).
    */
  def chiSquareFromCounts(counts: DataFrame): DataFrame = {
    // Re-aggregate at entry: a caller passing duplicate (bucket, cat)
    // rows (a replayed stream readout, non-aggregated counts) would
    // otherwise inflate r/c/N AND emit duplicate cell rows through the
    // left join — sum-merging here makes the contract "any count
    // relation", duplicates included, at the cost of one map-side
    // combinable shuffle on an already contingency-sized input.
    val o = counts.select(col("bucket").cast("long").as("bucket"),
        col("cat"), col("o"))
      .groupBy(col("bucket"), col("cat")).agg(sum(col("o")).as("o"))
      .localCheckpoint(false) // cells, bucket totals, cat totals, N
    val r = o.groupBy(col("bucket")).agg(sum(col("o")).as("r"))
    val c = o.groupBy(col("cat")).agg(sum(col("o")).as("c"))
    // coalesce: an empty window must yield an empty frame, not a NULL
    // tripping the guard with a misleading overflow message. Bound:
    // 1e6·(o·N−r·c)² with |o·N−r·c| ≤ N² needs 1e6·N⁴ ≤ 1e38 ⇒ N ≤ 1e8
    // (the first 3e9 bound forgot the 1e6 scale and the square of the
    // FULL residual — Spark would silently NULL overflowed cell terms
    // and sum() would skip them, understating χ² under strong drift).
    val n = o.agg(coalesce(sum(col("o")), lit(0L))
        .cast("decimal(38,0)").as("nn"))
      .filter(expr(
        "assert_true(nn <= CAST(100000000 AS DECIMAL(38,0)), " +
          "'chiSquareDrift: table exceeds 1e8 rows; cell terms would " +
          "overflow DECIMAL(38,0)') IS NULL"))
    // COMPLETE the table before scoring: a category absent from a
    // bucket is an o=0 cell contributing (0−e)²/e = e — dropping it
    // (the naive observed-cells-only join) silently undercounts χ²
    // exactly where drift is strongest (spec-caught: the full-flip
    // table scored half its true statistic)
    val cells = r.select(col("bucket"), col("r"))
      .crossJoin(broadcast(c))
      .join(o, Seq("bucket", "cat"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    cells.crossJoin(broadcast(n))
      .withColumn("term", expr(
        "CAST(1000000 AS DECIMAL(38,0)) * " +
          "(CAST(o AS DECIMAL(38,0)) * nn - CAST(r AS DECIMAL(38,0)) * c) * " +
          "(CAST(o AS DECIMAL(38,0)) * nn - CAST(r AS DECIMAL(38,0)) * c) " +
          "DIV (nn * r * c)"))
      .groupBy(col("bucket"))
      .agg(min(col("r")).as("n"), // the bucket total rides every cell row
        sum(col("term")).cast("long").as("chi2_micro"))
  }

  /** The paired per-category count scaffold every pairwise categorical
    * drift score reads: (ga, gb, cat, ca, cb) over the pair's category
    * UNION (full outer — a category absent on one side counts 0).
    * ONE definition for [[tvDriftMatrix]] and [[psiDriftMatrix]].
    */
  /** The additive category census every pairwise drift score reads:
    * (g, cat, c) occurrence counts. ADDITIVE over disjoint row batches
    * (plain sums — the ngramStatsTable fold law at category grain), so
    * a standing census folds by [[foldCategoryCensus]] and the drift
    * scores are READOUTS over the folded table — drift monitoring
    * without re-scanning the corpus per report.
    */
  def categoryCensusTable(df: DataFrame, catCol: String,
      groupCol: String): DataFrame =
    df.groupBy(col(groupCol).as("g"), col(catCol).as("cat"))
      .agg(count(lit(1)).as("c"))

  /** Fold a batch census into a standing one: per-(g, cat) ADDITION
    * (both counters additive over disjoint rows; untouched keys pass
    * through the full-outer join unchanged).
    */
  def foldCategoryCensus(standing: DataFrame, batch: DataFrame): DataFrame =
    standing.select(col("g"), col("cat"), col("c").as("__cs"))
      .join(batch.select(col("g"), col("cat"), col("c").as("__cb")),
        Seq("g", "cat"), "full_outer")
      .select(col("g"), col("cat"),
        (coalesce(col("__cs"), lit(0L)) + coalesce(col("__cb"), lit(0L))).as("c"))

  private def pairedCategoryCounts(df: DataFrame, catCol: String,
      groupCol: String): DataFrame =
    pairedFromCounts(categoryCensusTable(df, catCol, groupCol))

  /** [[pairedCategoryCounts]] from an existing (g, cat, c) census —
    * the readout entry point a folded standing census probes.
    *
    * MEMORY/VOLUME CONTRACT (the categoryCensusTable convention): the
    * pair frame holds one row per (ga, gb, cat) with cat in the pair's
    * category UNION — Σ_{a<b} |V_a ∪ V_b| ≤ (G−1)·|census| rows total,
    * where G = distinct groups. At CATEGORY grain (langs, sources,
    * buckets) that is trivially small; at TERM grain
    * ([[graft.pipeline.TextAnalysis.termCensus]] — p297/p298's
    * vocabulary drift) it multiplies a vocabulary-sized census by the
    * group count: 100 sources × a 10M-term census is ~1e9 pair cells,
    * and every downstream score windows by (ga, gb) — each pair's
    * union vocabulary sorts in ONE task. Both hazards are bounded
    * LOUDLY here via the computed (G−1)·|census| upper bound: an
    * over-bound readout fails naming the fix (readout per pair slice,
    * restrict the census to top-K terms per group, or raise the bound
    * deliberately) instead of shuffling for hours.
    */
  private def pairedFromCounts(census: DataFrame,
      maxPairCells: Long = 2000000000L): DataFrame = {
    val h = census.localCheckpoint(false) // pairs/left/right all read it
    val stats = h.agg(countDistinct(col("g")).as("ng"),
      count(lit(1)).as("rows")).collect()(0)
    // BigInt: the product overflows Long exactly when it matters most
    val bound = BigInt(math.max(0L, stats.getLong(0) - 1L)) *
      BigInt(stats.getLong(1))
    require(bound <= BigInt(maxPairCells),
      s"pairedFromCounts: (${stats.getLong(0)} groups − 1) × " +
        s"${stats.getLong(1)} census rows bound the pair frame by $bound " +
        s"cells > maxPairCells = $maxPairCells — score pair slices " +
        "separately, restrict the census to top-K terms per group, or " +
        "raise the bound deliberately")
    val groups = h.select(col("g")).distinct()
    val pairs = groups.select(col("g").as("ga"))
      .crossJoin(groups.select(col("g").as("gb")))
      .filter(col("ga") < col("gb"))
    val left = pairs.join(
      h.select(col("g").as("ga"), col("cat"), col("c").as("ca")), Seq("ga"))
    val right = pairs.join(
      h.select(col("g").as("gb"), col("cat"), col("c").as("cb")), Seq("gb"))
    left.join(right, Seq("ga", "gb", "cat"), "full_outer")
      .select(col("ga"), col("gb"), col("cat"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
  }

  /** Restrict a (g, cat, c) census to each group's K heaviest
    * categories (count desc, cat asc — deterministic) — the computed
    * fix [[pairedFromCounts]]'s bound names: a vocabulary-sized census
    * pairs in ≤ (G−1)·G·K cells instead of (G−1)·|census|. Drift
    * readouts over the restriction measure the HEAD's divergence — the
    * standard monitoring trade (tail terms carry negligible probability
    * mass under add-one smoothing); the output keeps the census shape,
    * so it composes with every FromCensus readout unchanged. The
    * window partitions by group — each partition sorts ONE group's
    * vocabulary, the same bound the census itself already implies.
    */
  def topKCensus(census: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    census.withColumn("__rk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
        .orderBy(col("c").desc, col("cat"))))
      .filter(col("__rk") <= k).drop("__rk")
  }

  def tvDriftMatrix(df: DataFrame, catCol: String,
      groupCol: String): DataFrame =
    tvDriftFromCensus(categoryCensusTable(df, catCol, groupCol))

  /** [[tvDriftMatrix]] as a READOUT over a (folded) standing census —
    * the [[psiDriftFromCensus]] twin: every pairwise categorical drift
    * score reads the same additive (g, cat, c) table, so ONE folded
    * census serves TV, PSI, and any future score without re-scanning
    * the corpus (p277 gates fold-then-readout ≡ p151's one-shot).
    */
  def tvDriftFromCensus(census: DataFrame,
      maxPairCells: Long = 2000000000L): DataFrame = {
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb"))
    pairedFromCounts(census, maxPairCells)
      .withColumn("na", sum(col("ca")).over(tot).cast("decimal(38,0)"))
      .withColumn("nb", sum(col("cb")).over(tot).cast("decimal(38,0)"))
      .withColumn("dev", abs(col("ca") * col("nb") - col("cb") * col("na")))
      .withColumn("sdev", sum(col("dev")).over(tot))
      .filter(col("na") > 0 && col("nb") > 0) // a one-sided pair has no TV
      .select(col("ga").as("grp_a"), col("gb").as("grp_b"), col("cat"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        col("dev").cast("long").as("dev_scaled"),
        expr("CAST(sdev * 1000 DIV (2 * na * nb) AS BIGINT)").as("tv_permille"))
  }

  /** PSI drift matrix — the Population Stability Index, the
    * model-monitoring industry's categorical drift score next to TV/KS/χ²:
    * PSI(a,b) = Σ_cat (p_i − q_i)·ln(p_i/q_i) with ADD-ONE (Laplace)
    * smoothing over the pair's category union — zero-count bins
    * otherwise blow the log up, and smoothing is the standard fix that
    * keeps the score finite (p_i = (ca+1)/(na+|cats|)). The one float
    * is micro-quantized at the model boundary per CATEGORY
    * (round(1e6·term) — the bm25-idf move), so each pair's total is an
    * exact integer sum of per-cat integers and one oracle covers the
    * whole score. Returns (grp_a, grp_b, cat, c_a, c_b, term_micro,
    * psi_micro); rule of thumb reading: psi_micro < 100000 stable,
    * > 250000 action (the classic 0.1/0.25 thresholds in micro units).
    */
  def psiDriftMatrix(df: DataFrame, catCol: String,
      groupCol: String): DataFrame =
    psiDriftFromCensus(categoryCensusTable(df, catCol, groupCol))

  /** Jensen–Shannon drift matrix — the third readout off the SAME
    * standing (g, cat, c) census as TV and PSI: symmetric, bounded
    * [0, ln 2], the divergence mixture-shift monitors usually report.
    * Same add-one smoothing and micro-quantization as
    * [[psiDriftFromCensus]] (per-term integers sum exactly);
    * js_micro ≈ 693147 is maximal divergence. Returns (grp_a, grp_b,
    * cat, c_a, c_b, term_micro, js_micro).
    */
  def jsDriftMatrix(df: DataFrame, catCol: String,
      groupCol: String): DataFrame =
    jsDriftFromCensus(categoryCensusTable(df, catCol, groupCol))

  /** [[jsDriftMatrix]] as a READOUT over a (folded) standing census —
    * one additive artifact serves TV, PSI and JS reports.
    */
  def jsDriftFromCensus(census: DataFrame,
      maxPairCells: Long = 2000000000L): DataFrame = {
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb"))
    pairedFromCounts(census, maxPairCells)
      .withColumn("na", sum(col("ca")).over(tot))
      .withColumn("nb", sum(col("cb")).over(tot))
      .withColumn("ncat", count(lit(1)).over(tot))
      .withColumn("p", (col("ca") + 1).cast("double") /
        (col("na") + col("ncat")).cast("double"))
      .withColumn("q", (col("cb") + 1).cast("double") /
        (col("nb") + col("ncat")).cast("double"))
      .withColumn("term_micro",
        round((col("p") * log(lit(2.0) * col("p") / (col("p") + col("q"))) +
            col("q") * log(lit(2.0) * col("q") / (col("p") + col("q"))))
          * 0.5 * 1e6).cast("long"))
      .withColumn("js_micro", sum(col("term_micro")).over(tot))
      .select(col("ga").as("grp_a"), col("gb").as("grp_b"), col("cat"),
        col("ca").as("c_a"), col("cb").as("c_b"),
        col("term_micro"), col("js_micro"))
  }

  /** [[psiDriftMatrix]] as a READOUT over a (folded) standing census —
    * the drift-monitoring maintenance story: census folds additively
    * per batch, PSI reports come off the table (p263 gates
    * fold-then-readout bit-identical to the full-corpus p254).
    */
  def psiDriftFromCensus(census: DataFrame,
      maxPairCells: Long = 2000000000L): DataFrame = {
    val tot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ga"), col("gb"))
    pairedFromCounts(census, maxPairCells)
      .withColumn("na", sum(col("ca")).over(tot))
      .withColumn("nb", sum(col("cb")).over(tot))
      .withColumn("ncat", count(lit(1)).over(tot))
      .withColumn("p", (col("ca") + 1).cast("double") /
        (col("na") + col("ncat")).cast("double"))
      .withColumn("q", (col("cb") + 1).cast("double") /
        (col("nb") + col("ncat")).cast("double"))
      .withColumn("term_micro",
        round((col("p") - col("q")) * log(col("p") / col("q")) * 1e6)
          .cast("long"))
      .withColumn("psi_micro", sum(col("term_micro")).over(tot))
      .select(col("ga").as("grp_a"), col("gb").as("grp_b"), col("cat"),
        col("ca").as("c_a"), col("cb").as("c_b"),
        col("term_micro"), col("psi_micro"))
  }

  /** Per-group exact `pct`-th percentile (least v with 100·cum ≥ pct·n)
    * of an integer observable via the [[groupedMedian]] histogram trick
    * — never sorts raw rows, only the bounded value domain. Returns
    * (grp, q). pct ∈ [1, 100]; pct 50 is the UPPER-median convention
    * (100·cum ≥ 50·n), deliberately distinct from [[groupedMedian]]'s
    * lower median.
    */
  def groupedQuantile(df: DataFrame, valueCol: String, groupCol: String,
      pct: Int): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct $pct outside [1,100]")
    quantileFromHistogram(histogramOf(df, valueCol, groupCol), pct)
      .withColumnRenamed(s"q$pct", "q")
  }

  /** Several exact percentiles from ONE histogram pass: the corpus
    * aggregates once (checkpointed), each pct is then a cheap window
    * over the tiny histogram. Returns (grp, q<p1>, q<p2>, …) — use
    * this instead of repeated [[groupedQuantile]] calls, which would
    * re-aggregate the input per pct.
    */
  /** Day-over-day quantile-shift monitor — [[groupedQuantiles]] per
    * time bucket plus the consecutive-bucket |Δq| for each percentile:
    * the distribution-shift readout that catches a value distribution
    * drifting at specific quantiles (a p90 creep the mean hides). One
    * histogram pass (shared with groupedQuantiles), then a lag window
    * over the BUCKET rows only — metrics space, bounded by days, so the
    * single-partition ordering is fine at any corpus size. The first
    * bucket's deltas are NULL (no predecessor). Returns
    * (bucket, q<p>…, d_q<p>…).
    */
  def quantileShift(df: DataFrame, valueCol: String, bucketCol: String,
      pcts: Seq[Int]): DataFrame = {
    val q = groupedQuantiles(
      df.select(col(valueCol), col(bucketCol).cast("long").as("__bk")),
      valueCol, "__bk", pcts)
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("grp"))
    pcts.foldLeft(q) { (acc, p) =>
      acc.withColumn(s"d_q$p", abs(col(s"q$p") - lag(col(s"q$p"), 1).over(w)))
    }.select(col("grp").as("bucket") +:
      pcts.flatMap(p => Seq(col(s"q$p"), col(s"d_q$p"))): _*)
  }

  def groupedQuantiles(df: DataFrame, valueCol: String, groupCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts == pcts.distinct,
      s"pcts $pcts must be non-empty and distinct")
    pcts.foreach(p => require(p >= 1 && p <= 100, s"pct $p outside [1,100]"))
    val h = histogramOf(df, valueCol, groupCol).localCheckpoint(false)
    pcts.map(p => quantileFromHistogram(h, p))
      .reduce(_.join(_, Seq("grp")))
  }

  /** Winsorized per-group moments (the robust-mean readout): exact
    * loPct/hiPct percentiles per group, every value clamped into
    * [lo, hi], then n / clamped sum / clamped max — the outlier-immune
    * scale observable next to [[madOutliers]]'s flags. ENTIRELY on the
    * (group, value) histogram: one corpus aggregate, quantiles via
    * per-group cumulative windows over the bounded value domain, the
    * clamped sum as Σ c·clamp(v) on histogram rows — the raw corpus is
    * never sorted or re-scanned. Returns (grp, n, lo, hi, wsum, wmax).
    */
  def winsorizedStats(df: DataFrame, valueCol: String, groupCol: String,
      loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    val h = histogramOf(df, valueCol, groupCol)
      .localCheckpoint(false) // feeds both quantiles and the clamped sum
    h.join(broadcast(boundsFromHistogram(h, loPct, hiPct)), Seq("grp"))
      .groupBy(col("grp"))
      .agg(sum(col("c")).as("n"), first(col("lo")).as("lo"),
        first(col("hi")).as("hi"),
        sum(col("c") * greatest(col("lo"), least(col("hi"), col("v"))))
          .as("wsum"),
        max(greatest(col("lo"), least(col("hi"), col("v")))).as("wmax"))
  }

  /** The trained (grp, lo, hi) winsor-bounds artifact — groups-sized,
    * broadcastable, and what a STREAMING clamp gate
    * ([[graft.streaming.PipelineStream.winsorStream]]) applies to a
    * feed; extracted from the same histogram lineage as
    * [[winsorizedStats]] so the two paths cannot drift.
    */
  def winsorBounds(df: DataFrame, valueCol: String, groupCol: String,
      loPct: Int = 5, hiPct: Int = 95): DataFrame =
    boundsFromHistogram(histogramOf(df, valueCol, groupCol)
      .localCheckpoint(false), loPct, hiPct)

  /** The ONE clamp application a batch readout and the stream gate
    * share: rows join the broadcast (grp, lo, hi) artifact and emit the
    * winsorized value next to the raw one. Rows in groups absent from
    * the artifact drop (inner join — the [[applyMadThresholds]]
    * untrained-group rule).
    */
  def applyWinsorBounds(rows: DataFrame, idCol: String, valueCol: String,
      groupCol: String, bounds: DataFrame): DataFrame =
    rows.select(col(idCol).as("id"), col(groupCol).as("grp"),
        col(valueCol).cast("long").as("v"))
      .join(broadcast(bounds), Seq("grp"))
      .select(col("id"), col("grp"), col("v"),
        greatest(col("lo"), least(col("hi"), col("v"))).as("wv"))

  /** Per-row exact percentile rank within its group — the
    * feature-engineering readout ("this purchase is in the 97th
    * percentile for its type"): `rank_permille` = 1000·(# group rows
    * STRICTLY below v) div n, exact integers from the (grp, v)
    * histogram. One histogram aggregate + one broadcast join back to
    * the rows (the histogram is value-domain-bounded — the p91
    * contract — so the join side is tiny); the raw corpus is scanned
    * once and never sorted. Returns (id, grp, v, rank_permille).
    */
  def valuePercentiles(df: DataFrame, idCol: String, valueCol: String,
      groupCol: String): DataFrame = {
    val d = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
        col(valueCol).cast("long").as("v"))
      .localCheckpoint(false) // one scan feeds histogram AND row join
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    val ranks = d.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("below", sum(col("c")).over(w) - col("c"))
      .withColumn("n", sum(col("c")).over(tot))
      .select(col("grp"), col("v"),
        expr("below * 1000 div n").as("rank_permille"))
    d.join(broadcast(ranks), Seq("grp", "v"))
      .select(col("id"), col("grp"), col("v"), col("rank_permille"))
  }

  /** Per-group quantiles for UNBOUNDED value domains: values map into
    * the [[graft.util.EstimatedHistogram]] geometric bucket space
    * (~170 buckets covering 1..2^63 at ~20% resolution) FIRST, then
    * the exact histogram-quantile machinery runs over bucket ids —
    * the p91 bridge for observables whose raw domain would break the
    * bounded-histogram contract (revenue micros, latencies). Reported
    * value = the bucket's UPPER bound (the EstimatedHistogram
    * percentile convention): approximate in value (≤ ~20% high), but
    * EXACT integer arithmetic end to end, so two engines agree
    * bit-for-bit on which bucket each percentile lands in. Returns
    * (grp, n, q<p>_hi per pct).
    */
  def bucketQuantiles(df: DataFrame, valueCol: String, groupCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts == pcts.distinct,
      s"pcts $pcts must be non-empty and distinct")
    pcts.foreach(p => require(p >= 1 && p <= 100, s"pct $p outside [1,100]"))
    val off = graft.util.EstimatedHistogram.bucketOffsets
    val offArr = array(off.map(lit(_)): _*)
    val h = df.select(col(groupCol).as("grp"),
        size(filter(offArr, o => o <= col(valueCol).cast("long")))
          .cast("long").as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // one corpus pass feeds every pct
    val withQs = pcts.map(p => quantileFromHistogram(h, p))
      .reduce(_.join(_, Seq("grp")))
    h.groupBy(col("grp")).agg(sum(col("c")).as("n"))
      .join(withQs, Seq("grp"))
      .select(col("grp") +: col("n") +: pcts.map(p =>
        element_at(offArr,
          least(col(s"q$p") + 1, lit(off.length.toLong)).cast("int"))
          .as(s"q${p}_hi")): _*)
  }

  private def boundsFromHistogram(h: DataFrame, loPct: Int,
      hiPct: Int): DataFrame = {
    require(loPct >= 1 && hiPct <= 100 && loPct < hiPct,
      s"percentile bounds [$loPct, $hiPct] invalid")
    quantileFromHistogram(h, loPct)
      .join(quantileFromHistogram(h, hiPct), Seq("grp"))
      .select(col("grp"), col(s"q$loPct").as("lo"), col(s"q$hiPct").as("hi"))
  }

  private def histogramOf(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame =
    df.select(col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))

  private def quantileFromHistogram(h: DataFrame, pct: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    h.withColumn("cum", sum(col("c")).over(w))
      .withColumn("n", sum(col("c")).over(tot))
      .filter(col("cum") * 100 >= col("n") * pct)
      .groupBy(col("grp")).agg(min(col("v")).as(s"q$pct"))
  }
}
