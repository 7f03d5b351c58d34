package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over timestamped streams: point-in-time
  * (as-of) join and ordered-funnel conversion. Both are shapes Spark has
  * no built-in operator for; both are expressed here in the one form
  * that survives 100 TB:
  *  - asOfJoin: union + per-key running `last` — ONE shuffle on the key,
  *    never a range join (whose per-key candidate set is
  *    |probe|·|quote| before the bound filter);
  *  - funnel: per-stage chained min-aggregates on the SAME key (each
  *    stage a co-partitioned join + partial-agg min), never a per-user
  *    collect_list (a whale user's full history never materializes in
  *    one row).
  */
object EventOps {

  /** As-of (point-in-time) join: for every probe row, the latest quote
    * row with the same key and quote ts ≤ probe ts (the classic
    * attribution / mark-to-market join). Left semantics: probes with no
    * prior quote keep nulls.
    *
    * Shape: tag quotes 0 / probes 1, union, one window per key ordered
    * by (ts, tag, quote-payload) with a running `last(quote, ignoreNulls)`
    * over UNBOUNDED PRECEDING..CURRENT ROW — an incremental frame (no
    * per-key buffering beyond the sort), one exchange on `keyCols`, zero
    * row amplification. Quotes sort BEFORE probes at equal ts, so a
    * same-instant quote is visible (ts ≥ quote-ts inclusive, the DuckDB
    * ASOF convention). Several quotes at the same (key, ts) resolve to
    * the lexicographically greatest payload struct — deterministic under
    * any partitioning.
    *
    * Output: keyCols, tsCol (probe ts), probe payload columns, and each
    * quote payload column (its ts included) prefixed with `quotePrefix`.
    *
    * `maxLookback` bounds the attribution window: a matched quote older
    * than probe ts − maxLookback nulls out (the row stays — "purchase
    * with no attributable click", not a dropped purchase). The bound
    * applies AFTER the running last, so it costs one per-row comparison
    * and no plan change.
    */
  def asOfJoin(probe: DataFrame, quote: DataFrame, keyCols: Seq[String],
      tsCol: String, quotePrefix: String = "q_",
      maxLookback: Long = Long.MaxValue): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoin needs at least one key column")
    val qPayload = quote.columns.toSeq.filterNot(keyCols.contains)
    val pPayload = probe.columns.toSeq.filterNot(c =>
      keyCols.contains(c) || c == tsCol)
    val q2 = quote.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).cast("long").as("__ts"), lit(0).as("__tag"),
        struct(qPayload.map(col): _*).as("__q")): _*)
    val p2 = probe.select(
      keyCols.map(col) ++ Seq(
        col(tsCol).cast("long").as("__ts"), lit(1).as("__tag"),
        struct(pPayload.map(col): _*).as("__p")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__tag"), col("__q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q2.unionByName(p2, allowMissingColumns = true)
      .withColumn("__m", last(col("__q"), ignoreNulls = true).over(w))
      .withColumn("__m", when(
        col("__ts") - col(s"__m.$tsCol").cast("long") <= maxLookback,
        col("__m"))) // else null: match outside the attribution window
      .filter(col("__tag") === 1)
      .select(
        keyCols.map(col) ++
          Seq(col("__ts").as(tsCol)) ++
          pPayload.map(c => col(s"__p.$c").as(c)) ++
          qPayload.map(c => col(s"__m.$c").as(s"$quotePrefix$c")): _*)
  }

  /** Top-k most common event-type paths per session (the product
    * path-analysis query): sessions by the same gap rule as the batch
    * sessionizer (break when the inactivity gap exceeds `gap`), each
    * session rolled to its ordered type string, counted, ranked.
    * Returns (rank, path, n_sessions).
    *
    * Per-session collect is the sessionize contract (a session is
    * humanly bounded — the one place a per-group list is safe); ties in
    * time order break by type then, and count ties rank by path, so the
    * table is deterministic under any partitioning. The count and the
    * final top-k are bounded by DISTINCT paths, not sessions.
    */
  def topEventPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, gap: Long, k: Int): DataFrame = {
    val sessions = sessionized(events, userCol, tsCol, typeCol, gap)
      .groupBy(col("user"), col("sid"))
      .agg(concat_ws(">", transform(
        sort_array(collect_list(struct(col("t"), col("et")))),
        x => x("et"))).as("path"))
    sessions.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path"))).cast("long"))
      .select(col("rank"), col("path"), col("n_sessions"))
  }

  /** The shared gap-rule sessionizer (the q22 lineage): (user, sid, t,
    * et) rows, session breaks where the inactivity gap exceeds `gap`.
    */
  private def sessionized(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, gap: Long): DataFrame = {
    val wOrd = Window.partitionBy(col("user")).orderBy(col("t"), col("et"))
    events.select(col(userCol).as("user"),
        col(tsCol).cast("long").as("t"), col(typeCol).as("et"))
      .withColumn("brk",
        when(lag(col("t"), 1).over(wOrd).isNull ||
          col("t") - lag(col("t"), 1).over(wOrd) > gap, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user"), col("sid"), col("t"), col("et"))
  }

  /** Session-level type co-occurrence (the basket-analysis readout):
    * for every unordered pair of event types appearing in the SAME
    * session, the number of sessions containing both. Distinct types
    * per session first (≤ types rows/session), then a per-session
    * pair join — ≤ C(types, 2) pairs per session, ≤ types² output.
    * Returns (type_a, type_b, n_sessions), type_a < type_b.
    */
  def sessionCooccurrence(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, gap: Long): DataFrame = {
    val st = sessionized(events, userCol, tsCol, typeCol, gap)
      .select(col("user"), col("sid"), col("et")).distinct()
      .localCheckpoint(false) // both sides of the pair join
    st.select(col("user"), col("sid"), col("et").as("type_a"))
      .join(st.select(col("user"), col("sid"), col("et").as("type_b")),
        Seq("user", "sid"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_sessions"))
  }

  /** In-sample fit of the first-order Markov model (the sanity readout
    * before anyone trusts the transition matrix): per from-type, the
    * argmax next type (ties to the greater type via struct-max) and how
    * many observed transitions it explains. Returns (from_type,
    * predicted, n_total, n_correct) — all exact integers over the
    * [[eventTransitions]] relation (types²-bounded; no second corpus
    * pass).
    */
  def transitionFit(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    val m = eventTransitions(events, userCol, tsCol, typeCol)
      .localCheckpoint(false) // feeds the argmax and the rollup
    scoreTransitions(m, argmaxNext(m))
  }

  /** Held-out evaluation of the Markov model (the honest version of
    * [[transitionFit]]'s in-sample number): predictions train on
    * `trainEvents`' transitions, accuracy scores on `testEvents`'
    * (disjoint users — the leakage-safe split convention). From-types
    * the training corpus never saw drop from the report (no prediction
    * exists); same exact-integer rollup.
    */
  def transitionFitHeldOut(trainEvents: DataFrame, testEvents: DataFrame,
      userCol: String, tsCol: String, typeCol: String): DataFrame =
    scoreTransitions(
      eventTransitions(testEvents, userCol, tsCol, typeCol),
      argmaxNext(eventTransitions(trainEvents, userCol, tsCol, typeCol)))

  /** Argmax next type per from-type (ties to the greater type via
    * struct-max) — the model readout both fit variants share.
    */
  private def argmaxNext(m: DataFrame): DataFrame =
    m.groupBy(col("from_type"))
      .agg(max(struct(col("n"), col("to_type"))).as("p"))
      .select(col("from_type"), col("p.to_type").as("predicted"))

  private def scoreTransitions(m: DataFrame, pred: DataFrame): DataFrame =
    m.join(pred, Seq("from_type"))
      .groupBy(col("from_type"), col("predicted"))
      .agg(sum(col("n")).as("n_total"),
        sum(when(col("to_type") === col("predicted"), col("n"))
          .otherwise(0L)).as("n_correct"))

  /** Event-type transition matrix (the first-order Markov behavior
    * model): per user, consecutive event pairs in time order, counted
    * per (from, to). One lag window per user + one hash-aggregate;
    * ≤ types² output rows. A user's first event has no predecessor and
    * emits nothing. Ties in time order break by type (deterministic
    * under any partitioning). Returns (from_type, to_type, n).
    */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    // nulls-last tie order: matches SQL engines' ASC default should a
    // caller feed a nullable type column (p166's parsed item)
    val wOrd = Window.partitionBy(col("user"))
      .orderBy(col("t"), col("et").asc_nulls_last)
    events.select(col(userCol).as("user"), col(tsCol).cast("long").as("t"),
        col(typeCol).as("et"))
      .withColumn("prev", lag(col("et"), 1).over(wOrd))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev").as("from_type"), col("et").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Retention cohorts: users bucketed by the time bucket of their FIRST
    * event (the cohort), counted once per (cohort, offset) bucket they
    * were active in. Returns (cohort, offset, n_users) — ≤ buckets² rows
    * at any scale. Two hash-aggregates ((user) first-bucket, then
    * (user, bucket) distinct-activity) and one join on user; every
    * intermediate is user- or bucket-bounded, nothing global.
    *
    * `tsCol` is divided by `bucketSize` with truncating `div` — callers
    * pass non-negative times (epoch µs), where truncation == floor and a
    * SQL engine's flooring `//` agrees.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      bucketSize: Long): DataFrame = {
    require(bucketSize > 0, s"bucketSize $bucketSize must be positive")
    val e = events.select(col(userCol).as("user"),
      expr(s"CAST(`$tsCol` AS BIGINT) div ${bucketSize}L").as("bucket"))
    val first = e.groupBy(col("user")).agg(min(col("bucket")).as("cohort"))
    e.groupBy(col("user"), col("bucket")).agg(lit(1))
      .join(first, Seq("user"))
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** [[retentionCohorts]] segmented by an acquisition attribute: the
    * user's segment is a column of their FIRST event (same struct-min
    * label rule as [[funnelSegmented]]), and the engagement matrix
    * rolls up per segment — ≤ segments·buckets² rows. Cost adds one
    * user-bounded segment aggregate to the plain retention plan.
    */
  def retentionSegmented(events: DataFrame, userCol: String, tsCol: String,
      segmentCol: String, bucketSize: Long): DataFrame = {
    require(bucketSize > 0, s"bucketSize $bucketSize must be positive")
    val e = events.select(col(userCol).as("user"),
      expr(s"CAST(`$tsCol` AS BIGINT) div ${bucketSize}L").as("bucket"),
      col(tsCol).cast("long").as("t"), col(segmentCol).as("sv"))
    val first = e.groupBy(col("user"))
      .agg(min(col("bucket")).as("cohort"),
        min(struct(col("t"), col("sv"))).as("m"))
      .select(col("user"), col("cohort"), col("m.sv").as("segment"))
    e.groupBy(col("user"), col("bucket")).agg(lit(1))
      .join(first, Seq("user"))
      .groupBy(col("segment"), col("cohort"),
        (col("bucket") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Ordered-funnel conversion: how many users complete stage k of
    * `stages` in order, where stage k counts only at a ts STRICTLY after
    * the user's stage-(k−1) time and each stage time is the EARLIEST
    * qualifying event (the standard sequential-min funnel semantics).
    * Returns one row per stage: (stage_idx, stage, n_users).
    *
    * Each stage is a filter (tiny slice of the corpus) + co-partitioned
    * join against the previous stage's (user, t) frame + min-aggregate —
    * all on the same key, so AQE coalesces the exchanges; intermediate
    * stage frames are lazily checkpointed so the k-stage union computes
    * each lineage ONCE (the subtree-duplication rule).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame =
    rollupStages(stages, funnelStages(events, userCol, tsCol, typeCol, stages)) {
      df => df.agg(count(lit(1)).as("n_users"))
    }

  /** [[funnel]] plus conversion-lag observables per stage: `sum_gap` =
    * Σ over converting users of (their stage time − their previous-stage
    * time) and `max_gap` — exact integers in the caller's time unit, so
    * avg lag = sum_gap div n_users stays engine-portable. Stage 1's gap
    * is 0 by definition.
    */
  def funnelTiming(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame =
    rollupStages(stages, funnelStages(events, userCol, tsCol, typeCol, stages)) {
      df => df.agg(count(lit(1)).as("n_users"),
        coalesce(sum(col("gap")), lit(0L)).as("sum_gap"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap"))
    }

  /** [[funnel]] segmented by a per-user cohort attribute: each user's
    * segment is a column of their FIRST event (acquisition-cohort
    * convention — ties by the segment value itself via struct-min, so
    * the label is deterministic), and each stage rolls up per segment.
    * Returns (segment, stage_idx, stage, n_users) — stages × segments
    * rows. Cost = the funnel chain + one broadcast-sized (user,
    * segment) aggregate joined into each stage rollup.
    */
  def funnelSegmented(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, segmentCol: String, stages: Seq[String]): DataFrame = {
    val seg = events.select(col(userCol).as("user"),
        col(tsCol).cast("long").as("t"), col(segmentCol).as("sv"))
      .groupBy(col("user"))
      .agg(min(struct(col("t"), col("sv"))).as("m"))
      .select(col("user"), col("m.sv").as("segment"))
      .localCheckpoint(false) // joined into every stage rollup
    val frames = funnelStages(events, userCol, tsCol, typeCol, stages)
    frames.zipWithIndex.map { case (df, i) =>
      df.join(seg, Seq("user"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_users"))
        .select(col("segment"), lit(i + 1).cast("long").as("stage_idx"),
          lit(stages(i)).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** [[funnel]] with a per-step conversion deadline: stage k counts
    * only at a ts strictly after stage k−1 AND within `maxGap` of it
    * (the "converted within 7 days" product semantics). Stage times
    * stay the earliest QUALIFYING event — a user whose only stage-k
    * event misses the deadline drops there, exactly like the
    * sequential-min rule with a bounded window. Same per-stage plan as
    * [[funnel]]; the deadline is one extra per-row comparison.
    */
  def funnelWithin(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], maxGap: Long): DataFrame = {
    require(maxGap > 0, s"maxGap $maxGap must be positive")
    rollupStages(stages,
      funnelStages(events, userCol, tsCol, typeCol, stages, maxGap)) {
      df => df.agg(count(lit(1)).as("n_users"))
    }
  }

  /** BRANCHING [[funnel]]: each stage admits ALTERNATIVE event types —
    * signup → {click|view} → purchase counts a user as reaching stage 2
    * on their earliest click OR view after signup. Stage labels join
    * the alternatives with '|'. Semantics and plan are [[funnel]]'s
    * sequential-min chain with each stage's equality filter widened to
    * an In-predicate; a singleton at every stage reproduces [[funnel]]
    * exactly (spec-pinned law).
    */
  def funnelBranching(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[Seq[String]]): DataFrame =
    rollupStages(stages.map(_.mkString("|")),
      funnelStagesAlt(events, userCol, tsCol, typeCol, stages)) {
      df => df.agg(count(lit(1)).as("n_users"))
    }

  /** The shared sequential-min stage chain: stage k's frame holds one
    * row per user who reached it — (user, t, gap), gap = t − t_{k−1}
    * (0 at stage 1). Each frame is lazily checkpointed: it feeds both
    * stage k+1 and its own rollup (the subtree-duplication rule).
    * `maxGap` bounds each step's conversion window ([[funnelWithin]]);
    * Long.MaxValue = the unbounded classic.
    */
  private def funnelStages(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, stages: Seq[String],
      maxGap: Long = Long.MaxValue): Seq[DataFrame] =
    funnelStagesAlt(events, userCol, tsCol, typeCol,
      stages.map(Seq(_)), maxGap)

  /** [[funnelStages]] generalized to BRANCHING stages: stage k is a SET
    * of event types any one of which advances the user (signup →
    * {click|view} → purchase). Sequential-min semantics are unchanged —
    * stage k's time is the user's earliest event of ANY admitted type
    * strictly after stage k−1 — so the singleton case is exactly the
    * classic chain. The alternative set is an `isin` filter (codegen'd
    * In-predicate, pushed to the scan), not a union of per-type frames:
    * one slice + one co-partitioned join per stage either way.
    */
  private def funnelStagesAlt(events: DataFrame, userCol: String,
      tsCol: String, typeCol: String, stages: Seq[Seq[String]],
      maxGap: Long = Long.MaxValue): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.forall(_.nonEmpty),
      "every funnel stage needs at least one admitted event type")
    val e = events.select(col(userCol).as("user"),
      col(tsCol).cast("long").as("t"), col(typeCol).as("et"))
    var reached = e.filter(col("et").isin(stages.head: _*))
      .groupBy(col("user")).agg(min(col("t")).as("t"))
      .withColumn("gap", lit(0L))
      .localCheckpoint(false)
    val perStage = Seq.newBuilder[DataFrame]
    perStage += reached
    stages.drop(1).foreach { st =>
      reached = e.filter(col("et").isin(st: _*))
        .join(reached.select(col("user"), col("t").as("tprev")), Seq("user"))
        .filter(col("t") > col("tprev") && col("t") - col("tprev") <= maxGap)
        .groupBy(col("user"))
        .agg(min(col("t")).as("t"), (min(col("t")) - first(col("tprev"))).as("gap"))
        .localCheckpoint(false)
      perStage += reached
    }
    perStage.result()
  }

  /** Session-grain summary statistics (the engagement data card): gap
    * sessions rolled to (n_events, duration) each, then ONE row of
    * exact corpus numbers — session count and the histogram-trick
    * median / p90 of both observables (durations floored to `unit`s so
    * the histogram obeys the bounded-domain contract). Returns
    * (n_sessions, med_events, p90_events, med_dur, p90_dur).
    *
    * The per-session rollup is the [[sessionized]] lineage + one
    * (user, sid) aggregate; every quantile runs on the (observable,
    * count) histogram, never a raw-session sort.
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, gap: Long, unit: Long = 1000000L): DataFrame = {
    require(unit > 0, s"unit $unit must be positive")
    val sess = sessionized(events, userCol, tsCol, typeCol, gap)
      .groupBy(col("user"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        expr(s"(max(t) - min(t)) div ${unit}L").as("dur"))
      .withColumn("g", lit("all"))
      .localCheckpoint(false) // feeds both histograms and the count
    val qe = graft.pipeline.Sketches.groupedQuantiles(sess, "n_events", "g",
      Seq(50, 90))
    val qd = graft.pipeline.Sketches.groupedQuantiles(sess, "dur", "g",
      Seq(50, 90))
    sess.groupBy(col("g")).agg(count(lit(1)).as("n_sessions"))
      .join(qe.select(col("grp").as("g"), col("q50").as("med_events"),
        col("q90").as("p90_events")), Seq("g"))
      .join(qd.select(col("grp").as("g"), col("q50").as("med_dur"),
        col("q90").as("p90_dur")), Seq("g"))
      .select(col("n_sessions"), col("med_events"), col("p90_events"),
        col("med_dur"), col("p90_dur"))
  }

  /** Exact top-k heavy hitters per time bucket (what the CMS sketch
    * approximates, where the full pass is affordable): per bucket the k
    * most frequent `itemCol` values with counts, rank ties broken by
    * item (deterministic). One hash-aggregate on (bucket, item) + a
    * per-bucket rank window that the optimizer turns into
    * WindowGroupLimit (top-k per group never materializes the full
    * rank — plan-asserted). Returns (bucket, rank, item, n).
    */
  def heavyHittersByBucket(events: DataFrame, itemCol: String,
      bucketCol: String, k: Int): DataFrame =
    topKByBucket(
      events.select(col(bucketCol).cast("long").as("bucket"),
          col(itemCol).as("item"))
        .groupBy(col("bucket"), col("item")).agg(count(lit(1)).as("n")),
      k)

  /** The rank-and-cut half of [[heavyHittersByBucket]], shared so the
    * streaming twin's readout ranks through the SAME definition: top-k
    * rows of a (bucket, item, n) count relation per bucket, WindowGroupLimit
    * bounding the rank window. NULLS LAST explicitly: Spark's ASC
    * default is nulls-first, SQL engines' (the oracle's) is nulls-last —
    * a null item tying into the top-k would otherwise rank differently
    * per engine.
    */
  def topKByBucket(counts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k $k must be positive")
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("n").desc, col("item").asc_nulls_last)
    counts
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("bucket"), col("rank"), col("item"), col("n"))
  }

  /** Per-user regularity score (the bot-detection readout): how far the
    * user's hour-of-day histogram sits from uniform, as the exact
    * integer deviation dev = Σ over all 24 hours of |24·n_h − n| (an
    * absent hour contributes n), normalized to `reg_permille` =
    * 1000·dev div (46·n) ∈ [0, 1000] — 46·n is the one-hot maximum
    * (23·n from the hot hour + 23·n from the empty ones), so ~1000
    * reads "fires at exactly the same hour every time" (cron), ~0
    * "uniform across the clock" (organic/global). One (user, hour)
    * hash-aggregate + one user rollup; returns (user, n, dev_scaled,
    * reg_permille).
    */
  def userRegularity(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val tot = Window.partitionBy(col("user"))
    events.select(col(userCol).as("user"),
        expr(s"(CAST(`$tsCol` AS BIGINT) div 3600000000L) % 24").as("hour"))
      .groupBy(col("user"), col("hour")).agg(count(lit(1)).as("c"))
      // per-user window over the ≤24-row hour histogram (metrics space)
      .withColumn("n", sum(col("c")).over(tot))
      .groupBy(col("user"))
      .agg(first(col("n")).as("n"),
        sum(abs(lit(24) * col("c") - col("n"))).as("devp"),
        count(lit(1)).as("hours_present"))
      .select(col("user"), col("n"),
        (col("devp") + (lit(24) - col("hours_present")) * col("n"))
          .as("dev_scaled"),
        expr("(devp + (24 - hours_present) * n) * 1000 div (46 * n)")
          .as("reg_permille"))
  }

  /** [[funnelTiming]]'s distributional face: per stage ≥ 2 the exact
    * histogram-trick median and p90 of the conversion gap (the numbers
    * a product team actually quotes — "median signup→purchase is 2
    * days, the tail is 9"). Gaps floor to `unit`s for the bounded
    * histogram domain. Returns (stage_idx, stage, n_users, med_gap,
    * p90_gap); stage 1 has no gap and emits nothing.
    */
  def funnelGapQuantiles(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], unit: Long = 1000000L): DataFrame = {
    require(unit > 0, s"unit $unit must be positive")
    require(stages.size >= 2, "funnelGapQuantiles needs at least 2 stages")
    val frames = funnelStages(events, userCol, tsCol, typeCol, stages)
    val gaps = frames.zipWithIndex.drop(1).map { case (df, i) =>
      df.select(lit(i + 1).cast("long").as("sidx"),
        expr(s"gap div ${unit}L").as("g"))
    }.reduce(_ unionByName _).localCheckpoint(false)
    val q = graft.pipeline.Sketches.groupedQuantiles(gaps, "g", "sidx",
        Seq(50, 90))
      .select(col("grp").as("sidx"), col("q50").as("med_gap"),
        col("q90").as("p90_gap"))
    gaps.groupBy(col("sidx")).agg(count(lit(1)).as("n_users"))
      .join(q, Seq("sidx"))
      .select(col("sidx").as("stage_idx"),
        element_at(array(stages.map(lit): _*), col("sidx").cast("int"))
          .as("stage"),
        col("n_users"), col("med_gap"), col("p90_gap"))
  }

  /** EXACT trailing-window distinct actives ("7-day active users,
    * every day") — what [[graft.pipeline.Sketches.hllSliding]]
    * approximates, where the full pass is affordable: each (user, day)
    * activity row contributes to the `windowBuckets` window-END days
    * it falls inside (a bounded explode — fanout = the window length),
    * then one distinct-count per end day. Days with no activity in
    * range simply don't appear; trailing windows extending past the
    * last active day DO (the series' natural tail). Returns
    * (day, n_active).
    */
  def rollingActiveUsers(events: DataFrame, userCol: String, tsCol: String,
      bucketSize: Long, windowBuckets: Int): DataFrame = {
    require(bucketSize > 0, s"bucketSize $bucketSize must be positive")
    require(windowBuckets >= 1, s"windowBuckets $windowBuckets < 1")
    events.select(col(userCol).as("user"),
        expr(s"CAST(`$tsCol` AS BIGINT) div ${bucketSize}L").as("d"))
      .distinct()
      .select(col("user"),
        explode(expr(s"sequence(d, d + ${windowBuckets - 1})")).as("day"))
      .groupBy(col("day"))
      .agg(count_distinct(col("user")).as("n_active"))
  }

  /** [[funnel]] with the conversion-rate readout a dashboard actually
    * shows: per stage, `conv_permille` (vs stage 1) and
    * `step_permille` (vs the previous stage) — exact integer divisions
    * over the stages-row rollup (metrics space; the lag window runs on
    * ≤ stages rows). Stage 1 reads 1000/1000 by definition. Returns
    * (stage_idx, stage, n_users, conv_permille, step_permille).
    */
  def funnelRates(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    val w = Window.orderBy(col("stage_idx"))
    funnel(events, userCol, tsCol, typeCol, stages)
      .withColumn("n1", max(when(col("stage_idx") === 1, col("n_users")))
        .over(Window.partitionBy()))
      .withColumn("prev", lag(col("n_users"), 1).over(w))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        when(col("n1") > 0, expr("n_users * 1000 div n1"))
          .otherwise(0L).as("conv_permille"),
        when(col("prev").isNull, lit(1000L))
          .when(col("prev") > 0, expr("n_users * 1000 div prev"))
          .otherwise(0L).as("step_permille"))
  }

  /** Burst-bucket detection at the caller's time grain (`bucketSize` —
    * hours, days, …): buckets whose event count exceeds `k` × the
    * median bucket count (the robust rate-spike monitor — median, not
    * mean, so the burst can't mask itself). One bucket-count
    * aggregate; the median via the histogram trick over bucket counts
    * (buckets-bounded). Returns flagged buckets only:
    * (bucket, n, med, burst_permille = 1000·n div med).
    */
  def burstBuckets(events: DataFrame, tsCol: String, bucketSize: Long,
      k: Int = 3): DataFrame = {
    require(bucketSize > 0 && k >= 1, "bucketSize and k must be positive")
    val daily = events.select(
        expr(s"CAST(`$tsCol` AS BIGINT) div ${bucketSize}L").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .withColumn("g", lit("all"))
      .localCheckpoint(false) // feeds the median and the flag pass
    val med = graft.pipeline.Sketches.groupedMedian(daily, "n", "g")
      .select(col("med"))
    daily.crossJoin(broadcast(med))
      .filter(col("n") > col("med") * k)
      .select(col("bucket"), col("n"), col("med"),
        expr("n * 1000 div med").as("burst_permille"))
  }

  /** Hour-of-day activity profile per event type (the ops heatmap) with
    * the division-free uniformity deviation: per (type, hour) the count
    * n, `dev_scaled` = |24·n − total| (0 ⇔ perfectly flat) and
    * `share_permille` = 1000·n div total. One hash-aggregate; ≤
    * types·24 rows at any scale. Hours are UTC epoch hours mod 24.
    */
  def hourlyProfile(events: DataFrame, typeCol: String,
      tsCol: String): DataFrame = {
    val tot = Window.partitionBy(col("event_type"))
    events.select(col(typeCol).as("event_type"),
        expr(s"(CAST(`$tsCol` AS BIGINT) div 3600000000L) % 24").as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(tot))
      .select(col("event_type"), col("hour"), col("n"),
        abs(lit(24) * col("n") - col("total")).as("dev_scaled"),
        expr("n * 1000 div total").as("share_permille"))
  }

  /** Per-type inter-arrival statistics: consecutive same-type events of
    * the SAME user define the gaps (lag window per (user, type)); the
    * rollup is exact integers — count, max, and the histogram-trick
    * median / p90 ([[graft.pipeline.Sketches]] machinery — gaps are
    * bucketed to `unit` so the histogram obeys the bounded-domain
    * contract). Returns (event_type, n_gaps, med, p90, max_gap), gap
    * values in `unit`s of the input timestamp (floor).
    */
  def interArrivalStats(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, unit: Long = 1000000L): DataFrame = {
    require(unit > 0, s"unit $unit must be positive")
    // tie ordering at equal t is irrelevant: the sorted t-sequence is
    // unique as a multiset, so the gap multiset is deterministic
    val wOrd = Window.partitionBy(col("user"), col("et")).orderBy(col("t"))
    val gaps = events.select(col(userCol).as("user"),
        col(tsCol).cast("long").as("t"), col(typeCol).as("et"))
      .withColumn("prev", lag(col("t"), 1).over(wOrd))
      .filter(col("prev").isNotNull)
      .select(col("et"), expr(s"(t - prev) div ${unit}L").as("gap"))
      .localCheckpoint(false) // feeds median, p90 and the count rollup
    val q = graft.pipeline.Sketches.groupedQuantiles(gaps, "gap", "et",
      Seq(50, 90))
    gaps.groupBy(col("et").as("event_type"))
      .agg(count(lit(1)).as("n_gaps"), max(col("gap")).as("max_gap"))
      .join(q.select(col("grp").as("event_type"), col("q50").as("med"),
        col("q90").as("p90")), Seq("event_type"))
      .select(col("event_type"), col("n_gaps"), col("med"), col("p90"),
        col("max_gap"))
  }

  private def rollupStages(stages: Seq[String], frames: Seq[DataFrame])(
      agg: DataFrame => DataFrame): DataFrame =
    frames.zipWithIndex.map { case (df, i) =>
      val a = agg(df)
      a.select(
        lit(i + 1).cast("long").as("stage_idx") +: lit(stages(i)).as("stage") +:
          a.columns.toSeq.map(col): _*)
    }.reduce(_ unionByName _)

  /** UNKEYED time-window join: for every probe row, how many `events`
    * rows (ANY key) fall within ±`window` of its timestamp — "did the
    * purchase coincide with an error burst", both sides corpus-sized,
    * no equality key to shuffle on. Spark has no operator for this; the
    * naive range join is |probe|·|events| before the bound filter.
    *
    * Shape: time-bin decomposition with bin = t div window. A probe in
    * bin b can only meet events in bins {b−1, b, b+1} (|Δt| ≤ window ⇒
    * bin distance ≤ 1), so the probe side explodes 3× into its
    * neighbor bins and equi-joins the event side's SINGLE bin — each
    * (probe, event) pair meets exactly once (no dedup pass), the
    * shuffle is an ordinary hash exchange on the bin, and AQE's skew
    * split handles a hot bin. LEFT join: a probe near nothing reports
    * 0. Returns (id, t, n_near); the probe row itself is excluded when
    * it appears in `events` (matched by `idCol` equality).
    */
  def nearbyCount(probe: DataFrame, events: DataFrame, idCol: String,
      tsCol: String, window: Long): DataFrame = {
    require(window > 0, s"window $window must be positive")
    val p = probe.select(col(idCol).as("id"), col(tsCol).cast("long").as("t"))
      .withColumn("bin", explode(array(
        expr(s"t div ${window}L") - 1, expr(s"t div ${window}L"),
        expr(s"t div ${window}L") + 1)))
    val e = events.select(col(idCol).as("eid"),
        col(tsCol).cast("long").as("te"))
      .withColumn("bin", expr(s"te div ${window}L"))
    // the qualification predicate lives IN the join condition: a probe
    // whose bins are populated only by non-qualifying events must still
    // survive (as null-extended rows) and report 0 — a post-join filter
    // would silently DROP it instead
    p.join(e, p("bin") === e("bin") &&
        abs(col("te") - col("t")) <= window && col("eid") =!= col("id"),
        "left")
      .groupBy(col("id"), col("t"))
      .agg(count(col("eid")).as("n_near"))
  }

  /** [[nearbyCount]] recomputed DENSITY-PROOF through the event ECDF:
    * counting events in [t − w, t + w] never needs the (probe, event)
    * pairs — it is two rank lookups into the events' time order. Each
    * probe contributes two signed lookup points, (t + w, +1) and
    * (t − w − 1, −1); ONE [[graft.pipeline.TextAnalysis.exactPrefixSums]]
    * pass over events ∪ lookups (events sort BEFORE lookups at equal
    * time, so a lookup's running sum is exactly #events at-or-before
    * its x) makes the whole job an O((n+m) log) sort — no pair ever
    * materializes. The id-equality self-exclusion is a separate
    * ID-KEYED join correction (equi-join, cheap). Output is
    * row-identical to [[nearbyCount]] (p242 gates it under p149's
    * oracle, duplicate-probe double-count convention included).
    *
    * Why it exists: the bin decomposition's per-bin pair work is
    * QUADRATIC in event density — at 10× events over the same time
    * span it pays ~100× (measured: the sf1 slope table in SCALE.md ran
    * window_join at 54.8×/10×), while this path scales with rows, not
    * pairs. The bin path remains right when the caller needs the
    * matched PAIRS, not counts.
    */
  def nearbyCountRank(probe: DataFrame, events: DataFrame, idCol: String,
      tsCol: String, window: Long): DataFrame = {
    require(window > 0, s"window $window must be positive")
    val p = probe.select(col(idCol).as("id"), col(tsCol).cast("long").as("t"))
      .localCheckpoint(eager = false) // lookup explode + self-correction
    val e = events.select(col(idCol).as("eid"),
        col(tsCol).cast("long").as("te"))
      .localCheckpoint(eager = false) // ECDF union + self-correction
    val idType = p.schema("id").dataType
    val lookups = p.select(col("id"), col("t"), explode(array(
        struct((col("t") + window).as("x"), lit(1L).as("sgn")),
        struct((col("t") - window - 1L).as("x"), lit(-1L).as("sgn")))).as("l"))
      .select(col("l.x").as("x"), lit(1).as("kind"), lit(0L).as("v"),
        col("id"), col("t"), col("l.sgn").as("sgn"))
    val unioned = e.select(col("te").as("x"), lit(0).as("kind"),
        lit(1L).as("v"), lit(null).cast(idType).as("id"),
        lit(null).cast("long").as("t"), lit(0L).as("sgn"))
      .unionByName(lookups)
    val cum = graft.pipeline.TextAnalysis.exactPrefixSums(unioned,
      Seq(col("x").asc, col("kind").asc, col("sgn").asc, col("id").asc), "v")
    val raw = cum.filter(col("kind") === 1)
      .groupBy(col("id"), col("t"))
      .agg(sum(col("sgn") * col("cum")).as("n_raw"))
    // self-exclusion: events sharing the probe's id inside the window
    val selfCnt = p.join(e,
        col("eid") === col("id") && abs(col("te") - col("t")) <= window,
        "left")
      .groupBy(col("id"), col("t")).agg(count(col("eid")).as("n_self"))
    raw.join(selfCnt, Seq("id", "t"))
      .select(col("id"), col("t"),
        (col("n_raw") - col("n_self")).cast("long").as("n_near"))
  }

  /** KEYED ±window event count — [[nearbyCount]]'s keyed sibling: for
    * every row, how many OTHER rows of the SAME key fall within
    * ±`window` of its timestamp ("how bursty is this user around each
    * of their events"). With an equality key the engine-native answer
    * is a RANGE-frame window: one hash exchange on the key, a per-key
    * time sort, and count over rangeBetween(−w, w) — no bins, no pair
    * join, output exactly one row per input row. Skew boundary is the
    * usual per-key one (a hot key's rows sort in one task — salt
    * upstream if one key is a whole-corpus stream); there is no
    * unkeyed funnel anywhere.
    *
    * Contract: `idCol` must be unique per row (an event feed's id) —
    * the row itself is excluded by subtracting the self count, exactly
    * the `eid <> id` rule of the unkeyed sibling.
    */
  def windowCountByKey(df: DataFrame, keyCol: String, idCol: String,
      tsCol: String, window: Long): DataFrame = {
    require(window > 0, s"window $window must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("t"))
      .rangeBetween(-window, window)
    df.select(col(keyCol).as("k"), col(idCol).as("id"),
        col(tsCol).cast("long").as("t"))
      .withColumn("n_near", (count(lit(1)).over(w) - lit(1L)).cast("long"))
  }

  /** UNKEYED interval × point join: per interval, how many `points`
    * rows fall inside [start, end] — the second member of the
    * no-equality-key family next to [[nearbyCount]] ("how many error
    * events landed during each session", sessions and errors from
    * DIFFERENT keys). Same bin decomposition, mirrored: the INTERVAL
    * side explodes into every bin it covers (fanout = length/binSize,
    * bounded by the caller's bin choice), the point side keeps its one
    * bin, the join is a plain hash exchange on the bin, and each
    * (interval, point) pair meets exactly once (the point's bin is
    * unique). LEFT semantics via the predicate IN the join condition —
    * an interval covering no points reports 0, never drops. Returns
    * idCols… + (start, end, n_points).
    */
  def intervalPointCount(intervals: DataFrame, idCols: Seq[String],
      startCol: String, endCol: String, points: DataFrame, tsCol: String,
      binSize: Long, maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binSize > 0, s"binSize $binSize must be positive")
    require(idCols.nonEmpty, "intervalPointCount needs interval id columns")
    require(maxBinsPerInterval >= 1,
      s"maxBinsPerInterval $maxBinsPerInterval must be >= 1")
    val iv = intervals.select(idCols.map(col) ++ Seq(
        col(startCol).cast("long").as("start"),
        col(endCol).cast("long").as("end")): _*)
      // fanout bound: the explode emits (length div binSize + 1) rows
      // per interval, fine for gap-rule sessions but unbounded if
      // intervals come from user input — a months-long interval at an
      // hour bin would silently fan out thousands of rows. Fail LOUDLY
      // past the cap instead (assert_true returns NULL when the
      // predicate holds, so the filter keeps every compliant row).
      .filter(expr(
        s"""assert_true((`end` div ${binSize}L) - (start div ${binSize}L)
           | < ${maxBinsPerInterval}L,
           | 'intervalPointCount: interval spans more than
           | $maxBinsPerInterval bins; raise binSize or
           | maxBinsPerInterval') IS NULL""".stripMargin.replace("\n", "")))
      .withColumn("bin", explode(expr(
        s"sequence(start div ${binSize}L, `end` div ${binSize}L)")))
    val pt = points.select(col(tsCol).cast("long").as("t"))
      .withColumn("pbin", expr(s"t div ${binSize}L"))
    iv.join(pt, iv("bin") === pt("pbin") &&
        col("t") >= col("start") && col("t") <= col("end"), "left")
      .groupBy(idCols.map(col) ++ Seq(col("start"), col("end")): _*)
      .agg(count(col("t")).as("n_points"))
  }

  /** [[intervalPointCount]] through the point ECDF — the
    * [[nearbyCountRank]] move for the interval member of the unkeyed
    * family: #points in [start, end] is rank(end) − rank(start − 1), so
    * each interval contributes TWO signed lookups into one
    * [[graft.pipeline.TextAnalysis.exactPrefixSums]] pass over
    * points ∪ lookups (points sort before lookups at equal time) and
    * the whole job is an O((n+m) log) sort. Two structural wins over
    * the bin path: no per-bin pair work (quadratic in point density —
    * the sf1 window_join lesson), and NO fanout bound at all — a
    * months-long interval costs exactly 2 rows where the bin explode
    * needed a loud maxBinsPerInterval cap. LEFT semantics are free
    * (every interval emits its lookups; zero-point intervals report 0).
    * Row-identical to the bin path (p245 gates it under p180's oracle).
    */
  def intervalPointCountRank(intervals: DataFrame, idCols: Seq[String],
      startCol: String, endCol: String, points: DataFrame,
      tsCol: String): DataFrame = {
    require(idCols.nonEmpty, "intervalPointCountRank needs interval id columns")
    val iv = intervals.select(idCols.map(col) ++ Seq(
        col(startCol).cast("long").as("start"),
        col(endCol).cast("long").as("end")): _*)
    val lookups = iv.select(idCols.map(col) ++ Seq(col("start"), col("end"),
        explode(array(
          struct(col("end").as("x"), lit(1L).as("sgn")),
          struct((col("start") - 1L).as("x"), lit(-1L).as("sgn")))).as("l")): _*)
      .select(idCols.map(col) ++ Seq(col("start"), col("end"),
        col("l.x").as("x"), lit(1).as("kind"), lit(0L).as("v"),
        col("l.sgn").as("sgn")): _*)
    val ptRows = points.select(col(tsCol).cast("long").as("x"))
      .withColumn("kind", lit(0)).withColumn("v", lit(1L))
      .withColumn("sgn", lit(0L))
    val lkSchema = lookups.schema
    val ptFull = (idCols ++ Seq("start", "end")).foldLeft(ptRows) { (d, c) =>
      d.withColumn(c, lit(null).cast(lkSchema(c).dataType))
    }
    val unioned = ptFull.unionByName(lookups.select(ptFull.columns.map(col): _*))
    val cum = graft.pipeline.TextAnalysis.exactPrefixSums(unioned,
      Seq(col("x").asc, col("kind").asc, col("sgn").asc) ++
        idCols.map(c => col(c).asc), "v")
    cum.filter(col("kind") === 1)
      .groupBy(idCols.map(col) ++ Seq(col("start"), col("end")): _*)
      .agg(sum(col("sgn") * col("cum")).cast("long").as("n_points"))
  }

  /** Gap-rule session intervals — the [[sessionized]] lineage rolled to
    * one (user, sid, start, end, n_events) row per session, the
    * interval relation [[intervalPointCount]] and session-overlay
    * analyses consume.
    */
  def sessionIntervals(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, gap: Long): DataFrame =
    sessionized(events, userCol, tsCol, typeCol, gap)
      .groupBy(col("user"), col("sid"))
      .agg(min(col("t")).as("start"), max(col("t")).as("end"),
        count(lit(1)).as("n_events"))

  /** Association rules over session baskets — the directional readout
    * on top of [[sessionCooccurrence]]'s distinct (user, sid, type)
    * frame: for every ordered type pair a→b,
    * support = P(ab), confidence = P(b|a), lift = P(ab)/(P(a)·P(b)),
    * all as EXACT integer permille (support·1000 div N etc.; the lift
    * product runs in DECIMAL(38,0) so 1e11-session corpora can't
    * overflow, then lands in BIGINT because lift ≤ 1000·N). One
    * sessionize pass feeds the item counts, the pair counts, and the
    * session total. `minSessions` is the standard support floor (a
    * hapax pair's lift explodes). Returns (antecedent, consequent,
    * n_ab, n_a, n_b, support_permille, confidence_permille,
    * lift_permille).
    */
  def associationRules(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, gap: Long, minSessions: Long = 1L): DataFrame = {
    require(minSessions >= 1, s"minSessions $minSessions must be >= 1")
    val st = sessionized(events, userCol, tsCol, typeCol, gap)
      .select(col("user"), col("sid"), col("et")).distinct()
      .localCheckpoint(false) // totals, item counts, AND both pair sides
    val totals = st.select(col("user"), col("sid")).distinct()
      .agg(count(lit(1)).as("nn"))
    val items = st.groupBy(col("et")).agg(count(lit(1)).as("ni"))
      .localCheckpoint(false) // joined per rule end
    st.select(col("user"), col("sid"), col("et").as("antecedent"))
      .join(st.select(col("user"), col("sid"), col("et").as("consequent")),
        Seq("user", "sid"))
      .filter(col("antecedent") =!= col("consequent"))
      .groupBy(col("antecedent"), col("consequent"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSessions)
      .join(items.select(col("et").as("antecedent"), col("ni").as("n_a")),
        Seq("antecedent"))
      .join(items.select(col("et").as("consequent"), col("ni").as("n_b")),
        Seq("consequent"))
      .crossJoin(broadcast(totals))
      .select(col("antecedent"), col("consequent"), col("n_ab"),
        col("n_a"), col("n_b"),
        expr("n_ab * 1000 div nn").as("support_permille"),
        expr("n_ab * 1000 div n_a").as("confidence_permille"),
        // divisor promoted BEFORE its multiply: a long*long n_a*n_b
        // overflows past ~3e9-session types (ANSI throw / silent wrap)
        expr("CAST(CAST(n_ab AS DECIMAL(38,0)) * 1000 * nn DIV " +
          "(CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
          .as("lift_permille"))
  }

  /** Slowly-changing-dimension (type 2) intervals from a change log:
    * per key, consecutive runs of the same value collapse to one
    * VERSION with [valid_from, valid_to) validity — valid_to is the
    * next version's start, NULL for the current one. The classic
    * dimension-history build: two window passes on the key partitioning
    * (lag to find change points, lead/row_number on the change rows),
    * deterministic under the (t, value) tie order, null-safe value
    * comparison (NULL→X and X→NULL are changes; NULL→NULL is not).
    * Returns (key, value, version, valid_from, valid_to).
    */
  def scdIntervals(changes: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("v").asc_nulls_last)
    changes.select(col(keyCol).as("k"), col(tsCol).cast("long").as("t"),
        col(valueCol).as("v"))
      .withColumn("pv", lag(col("v"), 1).over(w))
      .withColumn("isFirst",
        row_number().over(w) === 1) // NULL value can't mark the run start
      .filter(col("isFirst") || !(col("v") <=> col("pv")))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("t"), 1).over(w))
      .select(col("k").as("key"), col("v").as("value"), col("version"),
        col("t").as("valid_from"), col("valid_to"))
  }

  /** CUPED variance-reduced [[abReadout]] — the covariate-adjusted
    * experiment metric, engine-portable because the one genuinely
    * fractional quantity (θ = Cov(Y,X)/Var(X)) is micro-quantized
    * FIRST and everything else is integer arithmetic:
    *   θ_micro = (N·Σxy − Σx·Σy)·1e6 div (N·Σx² − (Σx)²)
    *   adj_micro(v) = 1e6·Σy_v div n_v
    *                  − θ_micro·(N·Σx_v − n_v·Σx) div (n_v·N)
    * (the classic Ŷ − θ·(X − X̄) per variant, both divisions truncating
    * identically on both engines, negatives included). Y = converted
    * (0/1 on `goalType`), X = the user's `covariateType` event count —
    * the pre-period activity that soaks up between-user variance.
    * Zero-variance X degenerates to the raw metric (θ = 0 via
    * nullif/coalesce — not a crash, and never an engine-divergent x/0).
    * Products run in DECIMAL(38,0)/HUGEINT. Returns
    * (variant, n_users, sum_y, sum_x, theta_micro, raw_micro,
    * adj_micro).
    */
  def abReadoutCuped(events: DataFrame, userCol: String, typeCol: String,
      goalType: String, covariateType: String,
      variants: Int = 2): DataFrame = {
    require(variants >= 2, s"variants $variants must be >= 2")
    val perUser = events.select(col(userCol).as("k"), col(typeCol).as("et"))
      .groupBy(col("k"))
      .agg(max(when(col("et") === goalType, 1L).otherwise(0L)).as("y"),
        sum(when(col("et") === covariateType, 1L).otherwise(0L)).as("x"))
      .withColumn("variant",
        pmod(graft.pipeline.TextAnalysis.hash60(col("k")), lit(variants)))
      .localCheckpoint(false) // pooled moments AND per-variant rollup
    val pooled = perUser.agg(
      count(lit(1)).cast("decimal(38,0)").as("nn"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"),
      sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"))
      .withColumn("theta_micro", coalesce(expr(
        "CAST((nn * sxy - sx * sy) * 1000000 DIV " +
          "nullif(nn * sxx - sx * sx, 0) AS BIGINT)"), lit(0L)))
    perUser.groupBy(col("variant"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("nv"),
        sum(col("y")).cast("decimal(38,0)").as("syv"),
        sum(col("x")).cast("decimal(38,0)").as("sxv"))
      .crossJoin(broadcast(pooled))
      .select(col("variant"), col("nv").cast("long").as("n_users"),
        col("syv").cast("long").as("sum_y"),
        col("sxv").cast("long").as("sum_x"),
        col("theta_micro"),
        expr("CAST(syv * 1000000 DIV nv AS BIGINT)").as("raw_micro"),
        expr("CAST(syv * 1000000 DIV nv - " +
          "theta_micro * (nn * sxv - nv * sx) DIV (nv * nn) AS BIGINT)")
          .as("adj_micro"))
  }

  /** Point-in-time (AS OF) dimension enrichment — the standard
    * warehouse lookup against an SCD2 history, composed from two gated
    * lineages: the change log rolls to [[scdIntervals]] versions, and
    * each fact row picks the version whose validity covers its
    * timestamp via [[asOfJoin]] on (key, valid_from). Because SCD2
    * intervals TILE time per key (valid_to = the next valid_from), the
    * as-of pick IS the covering interval — no range join, one exchange
    * (the asOfJoin plan). Change observations dedupe to one per
    * (key, ts) by min(value) and NULL values are excluded (the
    * null-composite-key rule), so the pick is deterministic. Facts
    * before any observation null-extend. Output = fact columns +
    * `q_`-prefixed (tsCol → valid_from, value, version).
    */
  def pointInTimeLookup(facts: DataFrame, changeLog: DataFrame,
      keyCol: String, tsCol: String, valueCol: String): DataFrame = {
    val obs = changeLog.select(col(keyCol).as("key"),
        col(tsCol).cast("long").as("t"), col(valueCol).as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("key"), col("t")).agg(min(col("v")).as("v"))
    val dim = scdIntervals(obs, "key", "t", "v")
      .select(col("key").as(keyCol), col("valid_from").as(tsCol),
        col("value"), col("version"))
    asOfJoin(facts, dim, Seq(keyCol), tsCol)
  }

  /** Hash-split experiment readout (the A/B harness over the event
    * log): each user lands in variant = hash60(user) mod `variants` —
    * the SAME deterministic md5-prefix gate the sampling family uses,
    * so assignment is reproducible across engines and runs and
    * uncorrelated with user-id structure (a plain `id % k` split
    * inherits whatever the id sequence encodes). Per variant: distinct
    * users, distinct converters (≥1 `goalType` event), exact
    * conv_permille, and lift vs variant 0 in permille (DECIMAL(38,0)
    * product; NULL when variant 0 has no converters — engines disagree
    * on x/0 otherwise). Returns (variant, n_users, n_converted,
    * conv_permille, lift_permille).
    */
  def abReadout(events: DataFrame, userCol: String, typeCol: String,
      goalType: String, variants: Int = 2): DataFrame = {
    require(variants >= 2, s"variants $variants must be >= 2")
    val perUser = events.select(col(userCol).as("k"), col(typeCol).as("et"))
      .groupBy(col("k"))
      .agg(max(when(col("et") === goalType, 1L).otherwise(0L)).as("conv"))
      .withColumn("variant",
        pmod(graft.pipeline.TextAnalysis.hash60(col("k")), lit(variants)))
    val g = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_converted"))
      .localCheckpoint(false) // itself AND the variant-0 reference
    g.crossJoin(broadcast(g.filter(col("variant") === 0)
        .select(col("n_users").as("u0"), col("n_converted").as("c0"))))
      .select(col("variant"), col("n_users"), col("n_converted"),
        expr("n_converted * 1000 div n_users").as("conv_permille"),
        // divisor promoted BEFORE its multiply (same overflow law as
        // associationRules' lift divisor)
        expr("CAST(CAST(n_converted AS DECIMAL(38,0)) * 1000 * u0 DIV " +
          "nullif(CAST(n_users AS DECIMAL(38,0)) * c0, 0) AS BIGINT)")
          .as("lift_permille"))
  }

  /** Integer fixed-point PageRank over a weighted edge list (src, dst,
    * weight) — the behavior-graph centrality readout, engine-portable
    * because every step is integer floor arithmetic: ranks live at
    * `scale` micro-units, each iteration is
    *   r'(v) = ((1000−damp)·scale + damp·Σ_u (r(u)·w_uv div out_u))
    *           div 1000
    * with out_u = Σ_v w_uv. Exactly `iters` iterations (the production
    * convergence loop is a caller policy); dangling nodes keep
    * receiving teleport mass but forward nothing (their mass drops —
    * the simple-sink convention, documented rather than redistributed
    * so the oracle unrolls to pure SQL).
    *
    * Each iteration = one broadcast-or-shuffle join of the rank vector
    * (|V| rows) into the edge list + one hash-aggregate on dst — the
    * classic Pregel step as Catalyst relational algebra; the edge list
    * is read once and lazily checkpointed. Products run in
    * DECIMAL(38,0) so rank·weight cannot overflow at web-graph counts.
    * Returns (node, rank_micro).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int, dampPermille: Long = 850L,
      scale: Long = 1000000L): DataFrame =
    pageRankSteps(edges, srcCol, dstCol, weightCol, None, iters,
      dampPermille, scale)

  /** WARM-START PageRank — continue the [[pageRank]] iteration from a
    * prior (node, rank_micro) artifact instead of the uniform start:
    * the incremental-maintenance move for a slowly-changing graph
    * (yesterday's ranks + today's edge delta → a FEW iterations instead
    * of a cold rerun; power iteration converges from any start, and a
    * near-fixed-point start needs few steps to re-settle). Nodes absent
    * from `initRanks` (NEW nodes the delta introduced) start at the
    * uniform `scale`; `initRanks` nodes that left the graph drop out
    * (ranks are defined over the CURRENT edge set). The arithmetic is
    * the same integer fixed-point step, so the exact composition law
    * `pageRankFrom(edges, pageRank(edges, a), b) ≡ pageRank(edges,
    * a + b)` holds bit-for-bit — spec-pinned, and p220 gates the warm
    * path under the SAME unrolled SQL oracle as p150 through it.
    */
  def pageRankFrom(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, initRanks: DataFrame, iters: Int,
      dampPermille: Long = 850L, scale: Long = 1000000L): DataFrame =
    pageRankSteps(edges, srcCol, dstCol, weightCol, Some(initRanks), iters,
      dampPermille, scale)

  /** The standing edge ARTIFACT the [[pageRank]] iterations consume —
    * (src, dst, w, outw) with outw = Σ w over the src's rows (the
    * out-weight the per-edge contribution divides by). Callers persist
    * it and [[pageRankDelta]] maintains it under edge deltas without
    * re-aggregating the standing rows. Multigraph semantics: duplicate
    * (src, dst) rows each contribute (their weights effectively add).
    */
  def pageRankEdgeArtifact(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("decimal(38,0)").as("w"))
    e.join(e.groupBy(col("src")).agg(sum(col("w")).as("outw")), Seq("src"))
  }

  /** DELTA-MAINTAINED PageRank — fold a batch of new edge rows into a
    * standing [[pageRankEdgeArtifact]] and rank the combined graph,
    * never re-aggregating the standing edges (the p222 fold pattern
    * applied to the rank pipeline's edge-side state):
    *  1. sources the delta touches are extracted (≤ |Δ| keys,
    *     broadcast);
    *  2. untouched standing rows pass through in ONE streamed scan
    *     (broadcast anti-join — their outw is already correct: no
    *     delta row changes their out-weight);
    *  3. touched sources re-aggregate over (their standing rows ∪ the
    *     delta rows) only — work bounded by the touched sources'
    *     degree, not the corpus;
    *  4. iterations run the SAME integer fixed-point step over the
    *     folded artifact, warm-started from `initRanks` when given.
    * The folded artifact is row-identical to
    * `pageRankEdgeArtifact(standing ∪ delta)`, so ranks are
    * bit-identical to [[pageRank]] over the union (multigraph
    * union-all semantics) — oracle-gated (p224) under the SAME
    * unrolled SQL as p150. The iterations themselves remain
    * edge-linear per step (every edge contributes every round — that
    * is PageRank, not a fold artifact); what the fold buys at scale is
    * the artifact maintenance (no full-corpus groupBy per batch) and
    * the warm start (few re-settling steps instead of a cold rerun).
    * Bounded-Δ contract enforced loudly, like connectedComponentsDelta.
    */
  def pageRankDelta(standingArtifact: DataFrame, deltaEdges: DataFrame,
      srcCol: String, dstCol: String, weightCol: String,
      initRanks: Option[DataFrame] = None, iters: Int = 3,
      dampPermille: Long = 850L, scale: Long = 1000000L,
      maxDeltaEdges: Long = 50000000L): DataFrame = {
    val d = deltaEdges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("decimal(38,0)").as("w"))
      .localCheckpoint() // |Δ|-sized; counted, then reused
    val nDelta = d.count()
    require(nDelta <= maxDeltaEdges,
      s"pageRankDelta: |delta| = $nDelta edges exceeds maxDeltaEdges = " +
        s"$maxDeltaEdges — the fold broadcasts delta-derived keys; fold in " +
        "slices or rebuild the artifact in full")
    val standing = standingArtifact
      .select(col("src"), col("dst"), col("w"), col("outw"))
    val dSrc = d.select(col("src")).distinct()
    val untouched = standing.join(broadcast(dSrc), Seq("src"), "left_anti")
    val touched = standing.join(broadcast(dSrc), Seq("src"), "left_semi")
      .select(col("src"), col("dst"), col("w"))
      .unionByName(d)
    val ew = untouched.unionByName(
      touched.join(touched.groupBy(col("src")).agg(sum(col("w")).as("outw")),
        Seq("src")))
      .localCheckpoint(false) // read every iteration
    val nodes = ew.select(col("src").as("node"))
      .union(ew.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false) // the teleport term every iteration
    pageRankIterate(ew, nodes, initRanks, iters, dampPermille, scale)
  }

  private def pageRankSteps(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, init: Option[DataFrame], iters: Int,
      dampPermille: Long, scale: Long): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).cast("decimal(38,0)").as("w"))
      .localCheckpoint(false) // read every iteration
    val out = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val ew = e.join(out, Seq("src")).localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(false) // the teleport term every iteration
    pageRankIterate(ew, nodes, init, iters, dampPermille, scale)
  }

  /** The shared iteration core: `iters` integer fixed-point steps over
    * a prebuilt (src, dst, w, outw) artifact and node set — [[pageRank]]
    * / [[pageRankFrom]] build both from raw edges; [[pageRankDelta]]
    * folds a delta into a standing artifact first.
    */
  private def pageRankIterate(ew: DataFrame, nodes: DataFrame,
      init: Option[DataFrame], iters: Int,
      dampPermille: Long, scale: Long): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters $iters outside [1,20]")
    require(dampPermille >= 0 && dampPermille <= 1000,
      s"dampPermille $dampPermille outside [0,1000]")
    var ranks = init match {
      case None => nodes.withColumn("r", lit(scale).cast("decimal(38,0)"))
      case Some(ir) => nodes
        .join(ir.select(col("node"), col("rank_micro")), Seq("node"), "left")
        .select(col("node"), coalesce(
          col("rank_micro").cast("decimal(38,0)"),
          lit(scale).cast("decimal(38,0)")).as("r"))
        .localCheckpoint(false) // the warm start: materialized once
    }
    (1 to iters).foreach { _ =>
      val contrib = ew
        .join(ranks.select(col("node").as("src"), col("r")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("CAST(r * w DIV outw AS DECIMAL(38,0))")).as("m"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"CAST((${1000 - dampPermille} * CAST($scale AS DECIMAL(38,0))" +
            s" + $dampPermille * coalesce(m, CAST(0 AS DECIMAL(38,0))))" +
            " DIV 1000 AS DECIMAL(38,0))").as("r"))
        .localCheckpoint(false) // pin each iteration: feeds the next
    }
    ranks.select(col("node"), col("r").cast("long").as("rank_micro"))
  }

  /** Cohort LTV curves (the revenue companion to [[retentionCohorts]]):
    * users cohorted by first-event bucket, revenue micro-quantized
    * (round(1e6·v) — exact-integer sums, the p133 convention) and
    * rolled up per (cohort, offset), then the RUNNING cumulative
    * revenue and the per-acquired-user LTV
    * (cum div cohort_size, floor). Returns (cohort, offset, n_users,
    * rev_micro, cum_micro, ltv_micro) — n_users = active users at that
    * offset, ltv over the cohort's FULL acquired population.
    *
    * Corpus passes: the per-user first-bucket aggregate and the
    * (cohort, offset) rollup — both key-bounded; the cumulative window
    * partitions by cohort over ≤ buckets offsets (metrics space).
    */
  def cohortLtv(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, bucketSize: Long): DataFrame = {
    require(bucketSize > 0, s"bucketSize $bucketSize must be positive")
    val e = events.select(col(userCol).as("user"),
      expr(s"CAST(`$tsCol` AS BIGINT) div ${bucketSize}L").as("bucket"),
      round(col(valueCol) * 1e6).cast("long").as("rev"))
    val first = e.groupBy(col("user")).agg(min(col("bucket")).as("cohort"))
      .localCheckpoint(false) // joined into the rollup AND sized below
    val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_size"))
    val perOffset = e.join(first, Seq("user"))
      .groupBy(col("cohort"), (col("bucket") - col("cohort")).as("offset"))
      .agg(count_distinct(col("user")).as("n_users"),
        sum(col("rev")).as("rev_micro"))
    val wc = Window.partitionBy(col("cohort")).orderBy(col("offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perOffset.join(sizes, Seq("cohort"))
      .withColumn("cum_micro", sum(col("rev_micro")).over(wc))
      .select(col("cohort"), col("offset"), col("n_users"), col("rev_micro"),
        col("cum_micro"),
        // truncating div matches DuckDB's integer `//` exactly,
        // INCLUDING negative cums (refunds): both truncate toward zero
        // (measured; DuckDB floors only on float operands)
        expr("cum_micro div cohort_size").as("ltv_micro"))
  }

  /** k-core PEELING over an undirected graph — exactly `rounds` rounds
    * of the classic degeneracy peel (each round: compute degrees,
    * drop every node with degree < k, drop its edges), the subgraph
    * density primitive between triangles and communities (dense-cohort
    * extraction, spam-ring candidates). Exactly-`rounds` semantics like
    * [[pageRank]]'s exactly-`iters` (the fixpoint loop is a caller
    * policy; peeling removes ≥1 node per non-converged round, so
    * `rounds` ≥ the expected peel depth converges) — which also keeps
    * the SQL oracle a finite unroll. Directed/multi edges canonicalize
    * (self-loops drop, (u,v)/(v,u) collapse); each round is two
    * node-keyed semi-joins plus one degree aggregate — never an
    * adjacency materialization; lineage and carried stats reset per
    * round (the iterative-loop contract). Returns (node, degree) for
    * the surviving nodes with degrees over the SURVIVING edge set — a
    * survivor whose neighbors were all peeled this round reports what
    * round `rounds`+1 would see (possibly < k, even 0).
    */
  def kCorePeel(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame = {
    val e = canonicalUndirected(edges, srcCol, dstCol)
      .localCheckpoint() // rounds loop + survivors readout, canonical ONCE
    kCoreSurvivors(kCoreRoundsCanonical(e, k, rounds), e)
  }

  /** Canonical undirected edge view (x < y): self-loops drop,
    * (u,v)/(v,u)/multi edges collapse — the shared front of the k-core
    * family (and the same rule the triangle/CC ops apply).
    */
  private def canonicalUndirected(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    edges.select(col(srcCol).as("x0"), col(dstCol).as("y0"))
      .filter(col("x0") =!= col("y0"))
      .select(least(col("x0"), col("y0")).as("x"),
        greatest(col("x0"), col("y0")).as("y"))
      .distinct()

  private def undirectedDegrees(ed: DataFrame): DataFrame =
    ed.select(col("x").as("node")).union(ed.select(col("y").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("dg"))

  /** k-core peel with per-node removal ROUNDS — the MAINTAINABLE form
    * of [[kCorePeel]]: one row per node of the canonical graph with
    * `removed_round` = the 1-based peel round that removed it, or NULL
    * for survivors of all `rounds` rounds. A node alive at the start of
    * round r (removed_round IS NULL OR removed_round >= r) is exactly
    * what a neighbor's round-r degree counts, so this artifact carries
    * everything [[kCoreDelta]]'s boundary re-peel needs. [[kCorePeel]]
    * is the survivors readout over this loop — ONE peel definition.
    */
  def kCoreRounds(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int): DataFrame =
    kCoreRoundsCanonical(
      canonicalUndirected(edges, srcCol, dstCol).localCheckpoint(), k, rounds)

  /** [[kCoreRounds]] over an ALREADY-CANONICAL (x, y) edge frame —
    * callers holding the canonical view ([[kCorePeel]]) skip the second
    * least/greatest + distinct pass.
    */
  private def kCoreRoundsCanonical(canonical: DataFrame,
      k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(rounds >= 1 && rounds <= 20, s"rounds $rounds outside [1,20]")
    var e = canonical
    val allNodes = e.select(col("x").as("node"))
      .union(e.select(col("y").as("node"))).distinct().localCheckpoint()
    var alive = allNodes
    var removed: Option[DataFrame] = None
    (1 to rounds).foreach { r =>
      // isolated-but-alive nodes have no degree row: degree 0 < k removes
      val kept = alive.join(undirectedDegrees(e), Seq("node"), "left")
        .filter(coalesce(col("dg"), lit(0L)) >= k).select(col("node"))
        .localCheckpoint() // e joins it twice + the anti probe
      val rem = alive.join(kept, Seq("node"), "left_anti")
        .select(col("node"), lit(r).cast("int").as("removed_round"))
      removed = Some(removed.fold(rem)(_.unionByName(rem)))
      alive = kept
      e = graft.pipeline.Dedup.checkpointFreshStats(
        e.join(kept.select(col("node").as("x")), Seq("x"), "left_semi")
          .join(kept.select(col("node").as("y")), Seq("y"), "left_semi"))
    }
    allNodes.join(removed.get, Seq("node"), "left")
      .select(col("node"), col("removed_round"))
  }

  /** Survivors + in-core degrees readout from a rounds artifact: the
    * edges among survivors ARE the peeled graph (an edge survives every
    * round iff both endpoints do), so kCorePeel's (node, degree) shape
    * falls out of one semi-join pass + one aggregate.
    */
  def kCoreSurvivors(artifact: DataFrame, canonicalEdges: DataFrame): DataFrame = {
    val surv = artifact.filter(col("removed_round").isNull)
      .select(col("node")).localCheckpoint(eager = false) // 3 probes below
    val core = canonicalEdges
      .join(surv.select(col("node").as("x")), Seq("x"), "left_semi")
      .join(surv.select(col("node").as("y")), Seq("y"), "left_semi")
    surv.join(undirectedDegrees(core).withColumnRenamed("dg", "degree"),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("degree"), lit(0L)).cast("long")
        .as("degree"))
  }

  /** INCREMENTAL k-core — fold an edge DELTA into a standing
    * [[kCoreRounds]] artifact without re-peeling the whole graph.
    * Exactness comes from peel LOCALITY: with exactly `rounds` rounds,
    * a node's outcome depends only on its (rounds−1)-hop neighborhood
    * (round 1 reads incident edges; round r reads neighbors' round-r−1
    * status), so only the ball of radius rounds−1 around the delta
    * endpoints (grown over the UNION graph) can change. Nodes outside
    * the ball keep their standing rows verbatim; the ball re-peels with
    * BOUNDARY degrees read from the old artifact — an outside neighbor
    * of a ball node is ≥ rounds hops from every delta edge, so its old
    * per-round aliveness (removed_round IS NULL OR >= r) is exact for
    * every round ≤ rounds.
    *
    * Bounded-Δ contract, enforced loudly: the ball is broadcast on
    * every standing-side pass (BFS growth, subgraph and boundary
    * extraction — the standing edges never shuffle), so `maxBallNodes`
    * caps it; a delta whose cascade region approaches the graph should
    * re-peel in full instead — degrading silently to standing-side
    * shuffles would defeat the operator. Ball-sized frames do the
    * actual re-peel. Returns the new (node, removed_round) artifact,
    * row-identical to kCoreRounds(standing ∪ delta).
    */
  def kCoreDelta(artifact: DataFrame, standingEdges: DataFrame,
      deltaEdges: DataFrame, srcCol: String, dstCol: String,
      k: Int, rounds: Int, maxBallNodes: Long = 5000000L): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 20, "k >= 1; rounds in [1,20]")
    val stand = canonicalUndirected(standingEdges, srcCol, dstCol)
      .localCheckpoint(eager = false) // BFS passes + subgraph + boundary
    val delta = canonicalUndirected(deltaEdges, srcCol, dstCol)
      .join(stand, Seq("x", "y"), "left_anti") // genuinely new edges only
      .localCheckpoint()
    val union = stand.unionByName(delta).localCheckpoint(eager = false)
    def loudBall(b: DataFrame): DataFrame = {
      require(b.count() <= maxBallNodes,
        s"kCoreDelta: cascade ball exceeds maxBallNodes = $maxBallNodes — " +
          "the fold force-broadcasts the ball; re-peel in full instead")
      b
    }
    var ball = loudBall(delta.select(col("x").as("node"))
      .union(delta.select(col("y").as("node"))).distinct().localCheckpoint())
    (1 until rounds).foreach { _ =>
      val nbrs = union.join(broadcast(ball.select(col("node").as("x"))),
          Seq("x"), "left_semi").select(col("y").as("node"))
        .union(union.join(broadcast(ball.select(col("node").as("y"))),
          Seq("y"), "left_semi").select(col("x").as("node")))
      ball = loudBall(ball.union(nbrs).distinct().localCheckpoint())
    }
    val bx = broadcast(ball.select(col("node").as("x")))
    val by = broadcast(ball.select(col("node").as("y")))
    val ballEdges = union.join(bx, Seq("x"), "left_semi")
      .join(by, Seq("y"), "left_semi").localCheckpoint()
    // boundary edges (exactly one endpoint in the ball) with the out
    // node's OLD removal round; delta edges are always both-in-ball, so
    // every out node exists in the standing artifact
    val boundary = union.join(bx, Seq("x"), "left_semi")
      .join(by, Seq("y"), "left_anti")
      .select(col("x").as("node"), col("y").as("out"))
      .unionByName(union.join(by, Seq("y"), "left_semi")
        .join(bx, Seq("x"), "left_anti")
        .select(col("y").as("node"), col("x").as("out")))
      .join(artifact.select(col("node").as("out"),
        col("removed_round").as("out_round"), lit(1L).as("__cov")),
        Seq("out"), "left")
    // per-round boundary aliveness counts: out is alive entering round r
    // iff it survived or was removed at round >= r. `__cov` separates
    // "survivor" (artifact row, removed_round NULL) from "node ABSENT
    // from the artifact" — the left join alone conflates them, and an
    // artifact that doesn't cover every standing node would silently
    // count absentees as alive; the loud require below (the maxBallNodes
    // style) fails instead.
    val bndAggs = (1 to rounds).map(r =>
      sum(when(col("out_round").isNull || col("out_round") >= r, 1L)
        .otherwise(0L)).as(s"b$r")) :+
      sum(when(col("__cov").isNull, 1L).otherwise(0L)).as("__bad")
    val bnd = boundary.groupBy(col("node"))
      .agg(bndAggs.head, bndAggs.tail: _*).localCheckpoint()
    val uncovered = bnd.agg(coalesce(sum(col("__bad")), lit(0L))).head.getLong(0)
    require(uncovered == 0,
      s"kCoreDelta: $uncovered boundary edges reference nodes absent from " +
        "the standing artifact — the artifact must cover every standing " +
        "node (kCoreRounds emits all of them); rebuild it in full instead")
    // re-peel the ball with boundary degrees folded in per round
    var alive = ball
    var e = ballEdges
    var removed: Option[DataFrame] = None
    (1 to rounds).foreach { r =>
      val kept = alive.join(undirectedDegrees(e), Seq("node"), "left")
        .join(bnd, Seq("node"), "left")
        .filter(coalesce(col("dg"), lit(0L)) +
          coalesce(col(s"b$r"), lit(0L)) >= k)
        .select(col("node")).localCheckpoint()
      val rem = alive.join(kept, Seq("node"), "left_anti")
        .select(col("node"), lit(r).cast("int").as("removed_round"))
      removed = Some(removed.fold(rem)(_.unionByName(rem)))
      alive = kept
      e = graft.pipeline.Dedup.checkpointFreshStats(
        e.join(kept.select(col("node").as("x")), Seq("x"), "left_semi")
          .join(kept.select(col("node").as("y")), Seq("y"), "left_semi"))
    }
    val ballArt = ball.join(removed.get, Seq("node"), "left")
      .select(col("node"), col("removed_round"))
    artifact.join(broadcast(ball), Seq("node"), "left_anti")
      .select(col("node"), col("removed_round"))
      .unionByName(ballArt)
  }

  /** Per-node triangle counts over an undirected graph given as (src,
    * dst) edge rows (directed/multi edges are canonicalized: self-loops
    * drop, (u,v)/(v,u) collapse to one). The join-machinery shape is
    * the classic DEGREE-ORIENTED enumeration: orient every edge from
    * its lower (degree, node) endpoint to the higher, so each triangle
    * is discovered exactly once at its lowest-degree corner — the
    * wedge self-join's fanout is Σ outdeg² = O(m^1.5) instead of the
    * unoriented Σ deg² that a hub node makes quadratic. All joins are
    * equi-joins on node ids (hash exchanges; AQE handles residual
    * skew); no adjacency list ever materializes on one row. Returns
    * (node, degree, n_triangles) for EVERY node (0 when untouched).
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") &&
        col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint(false) // degrees AND orientation read it
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .localCheckpoint(false) // orientation (×2), wedge canon (×2), readout
    // oriented edge (s → t): s is the lexicographically-smaller
    // (degree, node); dt rides along so the wedge step can canonicalize
    // its closing pair without another degree join
    val ed = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("s"), col("b").as("t"), col("db").as("dt")))
          .otherwise(
            struct(col("b").as("s"), col("a").as("t"), col("da").as("dt")))
          .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
      .localCheckpoint(false) // wedge self-join (×2) + closure probe
    // wedges at the apex; closing pair canonicalized by (degree, node)
    // so it probes the oriented edge set directly
    val l = ed.select(col("s"), col("t").as("u"), col("dt").as("du"))
    val r = ed.select(col("s"), col("t").as("v"), col("dt").as("dv"))
    val tri = l.join(r, Seq("s")).filter(col("u") < col("v"))
      .select(col("s").as("apex"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("x"), col("v").as("y")))
          .otherwise(struct(col("v").as("x"), col("u").as("y"))).as("p"))
      .join(ed.select(col("s").as("x"), col("t").as("y")),
        col("p.x") === col("x") && col("p.y") === col("y"))
      .select(col("apex"), col("p.x").as("u"), col("p.y").as("v"))
    val perNode = tri.select(explode(array(col("apex"), col("u"),
        col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("n"), "left")
      .select(col("n").as("node"), col("d").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Incremental triangle maintenance — the per-node (Δdegree,
    * Δtriangles) increments a batch of NEW edges adds to a standing
    * graph, without re-running the superlinear wedge enumeration over
    * the whole graph. A new triangle contains ≥1 new edge; with edges
    * oriented by NODE ID (insertion-stable, unlike [[triangleCounts]]'
    * degree orientation, which flips edges as degrees grow) each
    * triangle x<y<z is the wedge (x,y),(x,z) closed by (y,z), found
    * exactly once, and the new ones split disjointly into
    *   A: a new WEDGE edge — new×union wedges at the shared apex (when
    *      both wedge edges are new, the lower-t one claims it), closed
    *      against the union; and
    *   B: both wedge edges old, CLOSING edge new — each new (u,v)
    *      probes old edges into u, then hash-checks (s,v) old.
    * Every join is an id equi-join whose delta side is |Δ|-sized: cost
    * is Σ_Δ deg-bounded plus LINEAR passes over the standing edges
    * (degree update, join probes) — never the Σ outdeg² wedge blowup
    * of a recompute (ScaleProbe measures the gap). At warehouse scale
    * the standing edge table would be bucketed by its join keys so the
    * linear probes are also shuffle-free. Returns (node, d_degree,
    * d_triangles) — one row per node any increment touches.
    */
  def triangleDelta(baseEdges: DataFrame, deltaEdges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    def canon(e: DataFrame, s: String, d: String): DataFrame = e
      .select(least(col(s), col(d)).as("a"), greatest(col(s), col(d)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val old = canon(baseEdges, srcCol, dstCol)
      .localCheckpoint(false) // anti-join, wedge sides, closure probes
    val nw = canon(deltaEdges, srcCol, dstCol)
      .join(old, Seq("a", "b"), "left_anti")
      .localCheckpoint(false) // degree inc, A wedges, B closings
    val ed = old.select(col("a"), col("b"), lit(false).as("nu"))
      .unionByName(nw.select(col("a"), col("b"), lit(true).as("nu")))
      .localCheckpoint(false) // A's any-side + both closure probes
    // A: wedge edge new. l = new (s, x); r = any (s, y); when r is new
    // too, x < y keeps exactly one of the two orderings.
    val aTri = nw.select(col("a").as("s"), col("b").as("x"))
      .join(ed.select(col("a").as("s"), col("b").as("y"), col("nu")), Seq("s"))
      .filter(col("x") =!= col("y") && (!col("nu") || col("x") < col("y")))
      .select(col("s"),
        least(col("x"), col("y")).as("u"), greatest(col("x"), col("y")).as("v"))
      .join(ed.select(col("a").as("u"), col("b").as("v")), Seq("u", "v"))
      .select(col("s"), col("u"), col("v"))
    // B: both wedge edges old, closing edge new: (u,v) ∈ Δ, s→u and
    // s→v old (s < u < v by orientation).
    val bTri = old.select(col("a").as("s"), col("b").as("u"))
      .join(nw.select(col("a").as("u"), col("b").as("v")), Seq("u"))
      .join(old.select(col("a").as("s"), col("b").as("v")), Seq("s", "v"))
      .select(col("s"), col("u"), col("v"))
    val dTri = aTri.unionByName(bTri)
      .select(explode(array(col("s"), col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("d_triangles"))
    val dDeg = nw.select(col("a").as("node"))
      .unionAll(nw.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d_degree"))
    dDeg.join(dTri, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("d_degree"), lit(0L)).as("d_degree"),
        coalesce(col("d_triangles"), lit(0L)).as("d_triangles"))
  }

  /** Apply [[triangleDelta]] increments to a maintained
    * [[triangleCounts]] artifact: full-outer merge so brand-new nodes
    * appear and untouched nodes pass through — the contract
    * `applyTriangleDelta(triangleCounts(base), triangleDelta(base, Δ))
    * ≡ triangleCounts(base ∪ Δ)` is oracle-gated (p213).
    */
  def applyTriangleDelta(baseCounts: DataFrame,
      increments: DataFrame): DataFrame =
    baseCounts.select(col("node"), col("degree"), col("n_triangles"))
      .join(increments, Seq("node"), "full_outer")
      .select(col("node"),
        (coalesce(col("degree"), lit(0L)) +
          coalesce(col("d_degree"), lit(0L))).as("degree"),
        (coalesce(col("n_triangles"), lit(0L)) +
          coalesce(col("d_triangles"), lit(0L))).as("n_triangles"))

  /** Standing-side layout for shuffle-free incremental triangle
    * maintenance: the SYMMETRIC adjacency — both directions (au→av and
    * av→au) of every canonical undirected edge — written as a catalog
    * table bucketed AND sorted by (au, av). Keying every edge by BOTH
    * endpoints is what lets each of [[triangleDeltaBucketed]]'s probes
    * (membership, wedge partners at the apex, closures, edges-into-u)
    * be an equi-join whose keys INCLUDE the bucket column `au`, so the
    * standing table is never exchanged — only Δ-derived (small) sides
    * shuffle, each onto the table's own bucketing. The in-bucket
    * (au, av) sort order matches every probe's sort-merge key order, so
    * the scans need no re-sort either. 2× the storage of a one-way edge
    * list — the price of never shuffling 100 TB of edges per
    * maintenance batch. Mirrors [[graft.sources.CellStore.writeBucketed]].
    */
  def writeAdjacencyBucketed(edges: DataFrame, srcCol: String,
      dstCol: String, tableName: String, buckets: Int): Unit = {
    require(buckets >= 1, s"buckets $buckets must be >= 1")
    // the in-memory catalog is per-session: a prior session's managed
    // location survives its DROP, so clear it first (same move as every
    // CellStore.writeBucketed call site)
    graft.sources.CellStore.dropManaged(edges.sparkSession, tableName)
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    und.select(col("a").as("au"), col("b").as("av"))
      .unionByName(und.select(col("b").as("au"), col("a").as("av")))
      .write
      .bucketBy(buckets, "au")
      .sortBy("au", "av")
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(tableName)
  }

  /** [[triangleDelta]] against a STANDING graph stored as a
    * [[writeAdjacencyBucketed]] table — the warehouse-scale variant the
    * plain version's doc comment promises: all three linear probes of
    * the standing edges (delta-membership anti-join, wedge partners at
    * each delta apex, closure lookups, plus case B's edges-into-u scan)
    * run WITHOUT exchanging the standing side. Every probe joins on
    * keys that include the bucket column `au`, which needs the SESSION
    * to run with `spark.sql.requireAllClusterKeysForCoPartition=false`
    * — required LOUDLY here rather than set behind the caller's back,
    * because the admission is session-wide planner behavior (it only
    * ever ADMITS subset co-partitioning when one side already satisfies
    * it, but partitioning on fewer keys can skew other queries' joins,
    * so the session owner opts in). Measured on this Spark: with the
    * conf false the bucketed scan plans `Bucketed: true` with zero
    * Exchange while the Δ side shuffles on `au` alone; with the default
    * `true` BOTH sides re-shuffle on the full key pair. The conf is
    * read at EXECUTION time, so it must stay set until the returned
    * frame's action completes. No `localCheckpoint` on the
    * standing side (executor-pinned lineage is what the plain variant
    * concedes at scale) — only the |Δ|-sized canonical delta is
    * checkpointed for its four reuses. Semantics are exactly
    * [[triangleDelta]]'s; the equivalence is spec-pinned.
    */
  def triangleDeltaBucketed(spark: org.apache.spark.sql.SparkSession,
      adjTable: String, deltaEdges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    require(spark.conf.get(
        "spark.sql.requireAllClusterKeysForCoPartition", "true") == "false",
      "triangleDeltaBucketed needs spark.sql.requireAllClusterKeysForCoPartition=false " +
        "(subset-key co-partitioning against the bucketed adjacency; " +
        "session-wide planner admission, so the session owner sets it — " +
        "and it must stay set until the returned frame's action runs)")
    val adj = spark.table(adjTable)
    // canonical (min-keyed) and max-keyed views of the same edge set —
    // standing columns KEEP the names au/av through every join below so
    // a plan audit can prove no Exchange ever repartitions them
    val old = adj.filter(col("au") < col("av"))
    val oldIn = adj.filter(col("av") < col("au"))
    val dn = deltaEdges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint(false) // |Δ|-sized; reused by anti-join + A + B
    val nw = dn.join(old, col("a") === col("au") && col("b") === col("av"),
        "left_anti")
      .localCheckpoint(false) // |Δ|-sized; degree inc, A wedges, closings
    // A: wedge edge new. Partner from the STANDING edges (keep all
    // x ≠ y) probed at the apex bucket…
    val aPairsOld = nw.select(col("a").as("s"), col("b").as("x"))
      .join(old, col("s") === col("au"))
      .select(col("s"), col("x"), col("av").as("y"))
      .filter(col("x") =!= col("y"))
    // …or from the delta itself (x < y keeps one of the two orderings)
    val aPairsNew = nw.select(col("a").as("s"), col("b").as("x"))
      .join(nw.select(col("a").as("s2"), col("b").as("y")),
        col("s") === col("s2"))
      .filter(col("x") < col("y"))
      .select(col("s"), col("x"), col("y"))
    val cand = aPairsOld.unionByName(aPairsNew)
      .select(col("s"), least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
    // closure: (u,v) stands (probed at its min-endpoint bucket) or is new
    // — nw is anti-joined, so a pair matches exactly one side, never both
    val aTri = cand.join(old, col("u") === col("au") && col("v") === col("av"))
      .select(col("s"), col("u"), col("v"))
      .unionByName(cand.join(
        nw.select(col("a").as("u2"), col("b").as("v2")),
        col("u") === col("u2") && col("v") === col("v2"))
        .select(col("s"), col("u"), col("v")))
    // B: both wedge edges old, closing (u,v) new — standing edges INTO u
    // come max-keyed from oldIn (au = u, av = s < u), then the (s,v) leg
    // is checked min-keyed
    val bTri = oldIn.join(nw, col("au") === col("a"))
      .select(col("av").as("s"), col("a").as("u"), col("b").as("v"))
      .join(old, col("s") === col("au") && col("v") === col("av"))
      .select(col("s"), col("u"), col("v"))
    val dTri = aTri.unionByName(bTri)
      .select(explode(array(col("s"), col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("d_triangles"))
    val dDeg = nw.select(col("a").as("node"))
      .unionAll(nw.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d_degree"))
    dDeg.join(dTri, Seq("node"), "full_outer")
      .select(col("node"), coalesce(col("d_degree"), lit(0L)).as("d_degree"),
        coalesce(col("d_triangles"), lit(0L)).as("d_triangles"))
  }

  /** STREAMING triangle maintenance — [[triangleDelta]] applied per
    * micro-batch, maintaining a (node, degree, n_triangles) artifact
    * that always equals the full recompute over everything ingested
    * (the exactness is p213's law, applied inductively). Layout under
    * `basePath`:
    *  - `edges/run=<batchId>`: each batch's raw edges, one run per
    *    batch, overwrite-by-batch-id idempotent (the zorderedIngest
    *    convention); the standing graph a batch maintains against is
    *    the union of runs with SMALLER ids, so a replayed batch sees
    *    the same standing set;
    *  - `counts/v=<batchId>`: the maintained artifact VERSIONED by
    *    batch — a replayed batch recomputes its version from the same
    *    predecessor (an in-place cumulative update would double-apply
    *    the delta on redelivery). Versions older than the predecessor
    *    are GC'd; the predecessor itself is kept so the
    *    crash-then-replay window can still recompute.
    * Duplicate edges across batches are absorbed by the delta's
    * anti-join; duplicates/reversals/self-loops inside a batch by its
    * canonicalizer. Cost per batch: the |Δ|-bounded joins plus linear
    * passes over the standing runs — at warehouse scale the standing
    * side graduates to the [[writeAdjacencyBucketed]] layout.
    *
    * Caller contract (the [[zorderedIngest]] rule, load-bearing here):
    * the stream's CHECKPOINT must live as long as the store. A fresh
    * checkpoint restarts batch ids at 0 against the existing runs —
    * batch 0 would see an empty standing set, clobber `edges/run=0`,
    * and GC every counts version: silent divergence, not an error.
    */
  /** The ONE version-directory listing shared by the maintenance loop
    * and [[readTriangleCounts]] (ids of `<prefix><long>` subdirs of
    * `base/<dir>`; non-parsing names — dot-temp dirs included — are
    * skipped).
    */
  private[graft] def listIdDirs(fs: org.apache.hadoop.fs.FileSystem,
      base: org.apache.hadoop.fs.Path, dir: String,
      prefix: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(base, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.isDirectory)
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix(prefix).toLong).toOption)
  }

  def triangleMaintainIngest(stream: DataFrame, basePath: String,
      srcCol: String, dstCol: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        val s = batch.sparkSession
        val base = new org.apache.hadoop.fs.Path(basePath)
        val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
        val priorRuns = listIdDirs(fs, base, "edges", "run=").filter(_ < id)
        val standing =
          if (priorRuns.isEmpty) batch.limit(0)
          else s.read.parquet(priorRuns.map(r =>
            s"$basePath/edges/run=$r"): _*)
        val inc = triangleDelta(standing, batch, srcCol, dstCol)
        val prevV = listIdDirs(fs, base, "counts", "v=").filter(_ < id) match {
          case Seq() => None
          case vs => Some(vs.max)
        }
        val prevCounts = prevV match {
          case None => inc.select(col("node"), lit(0L).as("degree"),
            lit(0L).as("n_triangles")).limit(0)
          case Some(v) => s.read.parquet(s"$basePath/counts/v=$v")
        }
        // publish the artifact ATOMICALLY: write to a dot-temp dir
        // (invisible to the version listing — its name never parses),
        // then rename into place, so readTriangleCounts' max-version
        // pick can never see a partially-written dir (the
        // compactZRuns/compactWithHorizons publish protocol)
        val tmp = new org.apache.hadoop.fs.Path(base, s"counts/.publishing-v=$id")
        fs.delete(tmp, true)
        applyTriangleDelta(prevCounts, inc)
          .write.mode("overwrite").parquet(tmp.toString)
        val dst = new org.apache.hadoop.fs.Path(base, s"counts/v=$id")
        fs.delete(dst, true) // a replayed batch republishes its version
        require(fs.rename(tmp, dst),
          s"triangleMaintainIngest: publish rename failed for v=$id")
        batch.write.mode("overwrite").parquet(s"$basePath/edges/run=$id")
        // GC: keep current and its predecessor (the replay window), drop
        // the rest
        listIdDirs(fs, base, "counts", "v=")
          .filter(v => v != id && !prevV.contains(v))
          .foreach(v => fs.delete(
            new org.apache.hadoop.fs.Path(base, s"counts/v=$v"), true))
      }
    }

  /** The current maintained artifact of a [[triangleMaintainIngest]]
    * store: the highest counts version (empty frame with the right
    * schema if nothing ingested yet). Versions publish by
    * rename-into-place, so the max version is always complete.
    */
  def readTriangleCounts(spark: org.apache.spark.sql.SparkSession,
      basePath: String): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(basePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val vs = listIdDirs(fs, base, "counts", "v=")
    if (vs.isEmpty)
      spark.range(0).select(col("id").as("node"), lit(0L).as("degree"),
        lit(0L).as("n_triangles"))
    else spark.read.parquet(s"$basePath/counts/v=${vs.max}")
  }

  /** Multi-touch LINEAR attribution — the position-agnostic counterpart
    * of the as-of (last-touch) attribution: each purchase's revenue
    * splits EQUALLY over every click of the same user at ctus ≤ ptus
    * within `lookback`, in exact integer micro-units: every touch gets
    * rev div n and the LATEST touch (max (ctus, click_id) — the
    * deterministic tie rule) additionally absorbs the division
    * remainder, so Σ attributed ≡ Σ revenue to the micro. Purchases
    * with NO in-window touch land in the `-1` day bucket whole (the
    * p133 convention). One equality join on user + per-purchase window
    * (purchase-id partitions are touch-count-sized); returns
    * (click_day, n_rows, attributed_micro).
    */
  def linearAttribution(purchases: DataFrame, clicks: DataFrame,
      userCol: String, purchaseTsCol: String, purchaseIdCol: String,
      revenueCol: String, clickTsCol: String, clickIdCol: String,
      lookback: Long, dayMicros: Long = 86400000000L): DataFrame = {
    require(lookback > 0, s"lookback $lookback must be positive")
    val p = purchases.select(col(userCol).as("user"),
      col(purchaseTsCol).cast("long").as("ptus"),
      col(purchaseIdCol).as("pid"), col(revenueCol).cast("long").as("rev"))
    val c = clicks.select(col(userCol).as("user"),
      col(clickTsCol).cast("long").as("ctus"),
      col(clickIdCol).as("cid"))
    val j = p.join(c,
      p("user") === c("user") && col("ctus") <= col("ptus") &&
        col("ptus") - col("ctus") <= lookback, "left")
    val w = Window.partitionBy(col("pid"))
    val wr = Window.partitionBy(col("pid"))
      .orderBy(col("ctus").desc_nulls_last, col("cid").desc_nulls_last)
    j.withColumn("nt", count(col("cid")).over(w))
      .withColumn("rn", row_number().over(wr).cast("long"))
      .withColumn("share", expr(
        "CASE WHEN nt = 0 THEN rev " +
          "WHEN rn = 1 THEN rev - (nt - 1) * (rev div nt) " +
          "ELSE rev div nt END"))
      .groupBy(coalesce(expr(s"ctus div ${dayMicros}L"), lit(-1L))
        .as("click_day"))
      .agg(count(lit(1)).as("n_rows"), sum(col("share")).as("attributed_micro"))
  }

  /** Key-skew profile — the shuffle-planning observability readout: the
    * top-k hottest keys with exact counts, per-key permille share, and
    * cumulative concentration. THE number to look at before keying a
    * 100 TB join/aggregation on a column: cum_permille(k) near 1000 at
    * small k means salting or a broadcast re-plan, flat shares mean the
    * hash exchange is fine. Count aggregate (map-side partial) →
    * distributed TakeOrdered of k rows → rank/cum windows on the
    * k-row result only (never a corpus-wide single-partition window).
    * Ties rank by key ascending (deterministic). Returns
    * (rank, key, n, share_permille, cum_permille).
    */
  def keySkewProfile(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k $k must be positive")
    val counts = df.select(col(keyCol).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // total AND top-k read it
    val total = counts.agg(sum(col("n")).as("t"))
    val top = counts
      .orderBy(col("n").desc, col("key").asc_nulls_last).limit(k)
    val wRank = Window.orderBy(col("n").desc, col("key").asc_nulls_last)
    top.withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("cum_n",
        sum(col("n")).over(wRank.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("key"), col("n"),
        expr("n * 1000 div t").as("share_permille"),
        expr("cum_n * 1000 div t").as("cum_permille"))
  }

  /** Exponentially-decayed per-key event scores with the transcendental
    * killed at PLAN BUILD (the p162 discount-table move): the per-age
    * weight w_d = floor(1e6 · (decayPermille/1000)^d) is computed
    * EXACTLY in BigDecimal here and embedded as a literal (age, weight)
    * table in the plan — so the distributed job is per-(key, day)
    * counts joined to a broadcast ≤`horizonDays`-row table and an
    * integer sum, bit-stable on any engine that embeds the same table
    * (the oracle does). Ages beyond the horizon weigh 0 (documented
    * cutoff — pick the horizon where the weight underflows 1 micro).
    * Returns (key, score_micro): Σ_d count_d · w_{refDay−d}.
    */
  def decayedEventScores(events: DataFrame, keyCol: String, dayCol: String,
      refDay: Long, decayPermille: Int, horizonDays: Int): DataFrame =
    decayedFromCounts(
      events.select(col(keyCol).as("key"), col(dayCol).cast("long").as("day"))
        .groupBy(col("key"), col("day")).agg(count(lit(1)).as("c")),
      refDay, decayPermille, horizonDays)

  /** The weight-apply half of [[decayedEventScores]], shared so the
    * streaming twin's readout (window-close per-(key, day) counts)
    * scores through the SAME literal weight table: input is a
    * (key, day, c) count relation, output (key, score_micro).
    */
  def decayedFromCounts(counts: DataFrame, refDay: Long,
      decayPermille: Int, horizonDays: Int): DataFrame = {
    require(decayPermille >= 1 && decayPermille <= 999,
      s"decayPermille $decayPermille outside [1,999]")
    require(horizonDays >= 1 && horizonDays <= 4096,
      s"horizonDays $horizonDays outside [1,4096]")
    val spark = counts.sparkSession
    import spark.implicits._
    val weights = decayWeightTable(decayPermille, horizonDays)
      .toDF("age", "w")
    counts.select(col("key"), col("day").cast("long").as("day"), col("c"))
      .filter(col("day") <= refDay && col("day") > refDay - horizonDays)
      .withColumn("age", lit(refDay) - col("day"))
      .join(broadcast(weights), Seq("age"))
      .groupBy(col("key"))
      .agg(sum(col("c") * col("w")).as("score_micro"))
  }

  /** The exact literal weight table both engines embed: age d →
    * floor(1e6 · r^d) with r = decayPermille/1000 evaluated in exact
    * decimal arithmetic (r^d is a terminating decimal, so floor is
    * exact — no float anywhere).
    */
  def decayWeightTable(decayPermille: Int,
      horizonDays: Int): Seq[(Long, Long)] = {
    val r = java.math.BigDecimal.valueOf(decayPermille.toLong, 3)
    val mega = new java.math.BigDecimal(1000000)
    (0 until horizonDays).map { d =>
      (d.toLong, r.pow(d).multiply(mega)
        .setScale(0, java.math.RoundingMode.FLOOR).longValueExact())
    }
  }

  /** Windowed telemetry dedup: collapse repeated (key, tumbling-window)
    * events to the FIRST occurrence (min (t, id) — deterministic under
    * any partitioning), counting the copies dropped — the
    * at-least-once-ingest repair every event pipeline runs before
    * analytics. One hash-aggregate on (keys, window); returns one row
    * per kept event: (keyCols…, wstart, id, t, n_dups).
    */
  def dedupEventsWindowed(events: DataFrame, keyCols: Seq[String],
      idCol: String, tsCol: String, window: Long): DataFrame = {
    require(window > 0, s"window $window must be positive")
    require(keyCols.nonEmpty, "dedupEventsWindowed needs key columns")
    events.select(keyCols.map(col) ++ Seq(
        col(idCol).as("id"), col(tsCol).cast("long").as("t")): _*)
      .groupBy(keyCols.map(col) :+
        (expr(s"t div ${window}L") * window).as("wstart"): _*)
      .agg(min(struct(col("t"), col("id"))).as("keep"),
        (count(lit(1)) - 1).as("n_dups"))
      .select(keyCols.map(col) ++ Seq(col("wstart"),
        col("keep.id").as("id"), col("keep.t").as("t"), col("n_dups")): _*)
  }
}
