package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.model._
import graft.operators._

/** The public query surface (SURVEY §2.1 Q1–Q11) over one column family's
  * cell store. Each method compiles to a single declarative Catalyst plan:
  * key/token predicates land on the parquet scan (pushdown + bloom +
  * min/max pruning), reconciliation is a codegen'd hash aggregate, slices
  * are window ranks — no driver-side iteration anywhere.
  *
  * Validation mirrors thrift/ThriftValidation.java:230-391.
  */
class CassandraLens(
    val cells: DataFrame,
    val meta: CfMeta,
    /** Precomputed tombstone horizons (row, supercolumn) from a sidecar
      * store (CellStore.writeWithHorizons). When present, reads join the
      * tiny horizon tables instead of re-aggregating marker cells from the
      * full store. Mutating operations drop the sidecar (it would be
      * stale) and fall back to self-computed horizons.
      */
    val horizons: Option[(DataFrame, DataFrame)] = None,
    /** Row-cache analog (ColumnFamilyStore.cacheRow / InstrumentedCache,
      * cache/InstrumentedCache.java): when set, keyed reads serve slices
      * from this cached reconciled view (InMemoryTableScan) instead of
      * re-running the reconcile. Built by [[withRowCache]]; valid only
      * while the underlying cells are unchanged — mutations return lenses
      * WITHOUT the cache, like the reference invalidating on write.
      */
    private val cachedLive: Option[DataFrame] = None,
    /** IStoreApplyListener analog (fork db/IStoreApplyListener.java:1-30,
      * invoked from db/Table.java:568-605 before the commit-log/memtable
      * critical section): a pre-apply chain run on every mutation batch
      * BEFORE it reaches the store. The reference hook can only veto
      * (preapply → false drops that row's CF mutation); a listener here is
      * a whole-batch transform, so a veto is a `filter` and rewrites (TTL
      * stamping, value normalization) compose in the same Catalyst plan —
      * strictly more expressive, still entirely pre-write. Like the
      * compaction RowProcessor chain, listeners run ONLY when attached:
      * the unhooked write path is byte-identical to before.
      */
    private val applyListeners: Seq[DataFrame => DataFrame] = Nil,
    /** The frame `.cache()` was actually called on when it differs from
      * the served view (the hot-key partial cache serves a union whose
      * cached child this tracks) — [[dropRowCache]] must unpersist the
      * real cache, not the derived union.
      */
    private val cachedFrame: Option[DataFrame] = None) {
  GraftFunctions.register(cells.sparkSession)

  def this(cells: DataFrame, meta: CfMeta, horizons: Option[(DataFrame, DataFrame)]) =
    this(cells, meta, horizons, None, Nil)

  def this(cells: DataFrame, meta: CfMeta) = this(cells, meta, None, None, Nil)

  /** Attach a pre-apply listener (ColumnFamilyStore.setStoreApplyListener
    * analog). Listeners are store configuration: they persist across
    * mutations and derived lenses, in attach order.
    */
  def withApplyListener(listener: DataFrame => DataFrame): CassandraLens =
    new CassandraLens(cells, meta, horizons, cachedLive,
      applyListeners :+ listener, cachedFrame)

  /** Run the attached listener chain over one mutation batch, then re-conform
    * to the canonical cell schema (a transform may add helper columns; the
    * store never sees them). No-op when nothing is attached.
    */
  private def preApply(mutation: DataFrame): DataFrame =
    if (applyListeners.isEmpty) mutation
    else Mutations.conform(
      applyListeners.foldLeft(Mutations.conform(mutation))((df, l) => l(df)))

  private def topCmp: ComparatorType.Value = meta.comparator
  private def subCmp: ComparatorType.Value = meta.subComparator

  /** Cache the reconciled live view in executor memory and serve keyed
    * reads from it — the row cache. All lens predicates at [[liveOf]]
    * call sites are key-scoped, so filtering the cached view is exactly
    * equivalent to reconciling the filtered cells.
    */
  def withRowCache(): CassandraLens =
    new CassandraLens(cells, meta, horizons, Some(live.cache()), applyListeners)

  /** HOT-KEY row cache — the PARTIAL cache the reference actually runs
    * (the row cache is sized, not total: cache/InstrumentedCache.java
    * capacity + ColumnFamilyStore.cacheRow admits per key): pin only
    * `hotKeys`' reconciled rows in executor memory; every other key
    * falls through to the reconcile path INSIDE the same plan (the
    * cached hot slice unioned with the cold remainder — Catalyst
    * pushes a keyed read's predicate into both branches, so a hot read
    * is an InMemoryTableScan hit and a cold read prunes the cached
    * side empty and runs the ordinary pruned scan+reconcile). At
    * 100 TB the whole reconciled view cannot be pinned; a bounded hot
    * set can — pair with [[saveCachedKeys]]/[[loadCachedKeys]] for
    * restart pre-warming. Hot sets up to the IN-list convention
    * (10,000 keys, the same bound as the range-scan page pick) become
    * one pushed-down IN predicate; larger sets split hot from cold by
    * a BROADCAST semi/anti join instead — a restart pre-warm from a
    * big saved key set must not build a mega-predicate the optimizer
    * re-walks on every plan. `MaxHotKeys` bounds the set loudly: the
    * hot set must stay cache-sized (driver list + broadcast +
    * executor-pinned rows), never corpus-sized.
    */
  def withRowCache(hotKeys: Seq[String]): CassandraLens = {
    require(hotKeys.nonEmpty, "withRowCache(hotKeys): empty hot set")
    require(hotKeys.size <= CassandraLens.MaxHotKeys,
      s"withRowCache(hotKeys): ${hotKeys.size} keys exceed MaxHotKeys = " +
        s"${CassandraLens.MaxHotKeys} — a hot set is cache-sized, not " +
        "corpus-sized; cache fewer keys or use withRowCache() on a " +
        "store small enough to pin whole")
    val (hot, cold) =
      if (hotKeys.size <= 10000)
        (live.filter(col("key").isin(hotKeys: _*)).cache(),
          live.filter(!col("key").isin(hotKeys: _*)))
      else {
        val spark = cells.sparkSession
        import spark.implicits._
        val keys = hotKeys.toDF("key")
        (live.join(broadcast(keys), Seq("key"), "left_semi").cache(),
          live.join(broadcast(keys), Seq("key"), "left_anti"))
      }
    new CassandraLens(cells, meta, horizons, Some(hot.unionByName(cold)),
      applyListeners, cachedFrame = Some(hot))
  }

  /** Persist the cached KEY SET (not the rows) — the reference's
    * key-cache save (db/ColumnFamilyStore.java:305 submitKeyCacheWrite
    * writes the cached keys at shutdown; :257-264 readSavedCache
    * pre-warms from them at startup). Saves exactly what is CACHED:
    * the hot set on a partial cache, every key on a full one. One tiny
    * sorted string column; a fresh session re-warms DETERMINISTICALLY
    * via [[loadCachedKeys]] + the hot-key `withRowCache` overload
    * without having observed the previous session's traffic.
    *
    * RE-WARM CONTRACT by cache kind: a PARTIAL cache's saved set is
    * hot-sized by construction — re-warm with `withRowCache(keys)`.
    * A FULL cache on a big store can save MORE than
    * [[CassandraLens.MaxHotKeys]] keys; such a store re-warms with the
    * no-arg `withRowCache()` (it fit in executor memory last session,
    * pin it whole again — the key list adds nothing) and the hot-key
    * overload's bound is deliberately NOT a path around that.
    */
  def saveCachedKeys(path: String): Unit = {
    require(cachedLive.nonEmpty, "no row cache attached — call withRowCache() first")
    cachedFrame.orElse(cachedLive).get.select(col("key")).distinct()
      .repartition(1).sortWithinPartitions("key")
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveCachedKeys]] hot-key set (readSavedCache analog).
    * Driver-side by design: the artifact is cache-sized, and the hot
    * set becomes an in-plan predicate.
    */
  def loadCachedKeys(path: String): Seq[String] =
    cells.sparkSession.read.parquet(path)
      .select(col("key")).collect().map(_.getString(0)).toSeq

  /** Release this lens's row cache (InstrumentedCache eviction analog).
    * Mutations drop the cache REFERENCE automatically but cannot unpersist
    * it — the caller owns the cache lifetime, exactly like the reference's
    * explicitly-sized row cache; call this before discarding a cached lens
    * in a long-lived session.
    */
  def dropRowCache(): CassandraLens = {
    cachedFrame.orElse(cachedLive).foreach(_.unpersist())
    new CassandraLens(cells, meta, horizons, None, applyListeners)
  }

  /** Persist the row cache's reconciled view next to the store — the
    * saved-cache analog (db/ColumnFamilyStore.java:305 submitKeyCacheWrite
    * writes cached keys at shutdown so a restart preloads instead of
    * starting cold). The engine's row cache holds the whole reconciled
    * view, so the natural save unit is that view: one sorted parquet
    * snapshot a reopening session can serve reads from WITHOUT re-running
    * the reconcile. Valid exactly as long as the in-memory cache would be
    * (same cells); writers must re-save after compaction/mutation.
    */
  def saveRowCache(path: String): Unit = {
    require(cachedLive.nonEmpty, "no row cache attached — call withRowCache() first")
    // a hot-key PARTIAL cache must not save here: cachedLive is the
    // hot∪cold union, so this write would materialize the whole
    // reconciled view (corpus-sized at 100 TB) and a later
    // withRowCacheFrom would serve ONLY the saved subset as if it were
    // the full view — the partial cache's save unit is its KEY SET
    require(cachedFrame.isEmpty, "partial hot-key cache: persist the key " +
      "set via saveCachedKeys and re-warm with withRowCache(hotKeys)")
    cachedLive.get.sortWithinPartitions("key", "super_name", "col_name")
      .write.mode("overwrite").parquet(path)
  }

  /** Reopen-preheat (db/ColumnFamilyStore.java:190-264 readSavedCache
    * analog): attach a row cache served from a [[saveRowCache]] snapshot —
    * the reconcile never re-runs; the snapshot parquet loads lazily into
    * executor memory on first read, exactly like the reference warming its
    * row cache from the saved key set at startup.
    */
  def withRowCacheFrom(path: String): CassandraLens =
    new CassandraLens(cells, meta, horizons,
      Some(cells.sparkSession.read.parquet(path).cache()), applyListeners)

  /** Reconciled live view of the whole CF. */
  def live: DataFrame = cachedLive.getOrElse(horizons match {
    case Some((rowDel, scDel)) => Reconcile.liveViewGiven(cells, rowDel, scDel)
    case None => Reconcile.liveView(cells)
  })

  /** Live view of a restricted cell set, using the sidecar when present. */
  private def liveFrom(restricted: DataFrame): DataFrame = horizons match {
    case Some((rowDel, scDel)) => Reconcile.liveViewGiven(restricted, rowDel, scDel)
    case None => Reconcile.liveView(restricted)
  }

  private def liveOf(pred: Column): DataFrame = cachedLive match {
    case Some(c) => c.filter(pred) // key-scoped predicate: filter the cached view
    case None => liveFromKeyed(cells.filter(pred))
  }

  /** Live view of a KEY-BOUNDED restriction: the single-exchange keyed
    * reconcile ([[Reconcile.liveViewKeyed]]) when horizons are
    * self-computed; sidecar lenses keep their precomputed-horizon join
    * shape (already one aggregate + two tiny-table joins), and a store
    * whose every leaf is BUCKETED by key already hands the reconcile its
    * distribution — adding the keyed repartition there would re-shuffle
    * a read that was exchange-FREE (PlanQualitySpec pins that contract).
    */
  private def liveFromKeyed(restricted: DataFrame): DataFrame = horizons match {
    case Some(_) => liveFrom(restricted)
    case None if CassandraLens.bucketedByKey(cells.queryExecution.analyzed) =>
      liveFrom(restricted)
    case None => Reconcile.liveViewKeyed(restricted)
  }

  /** domainSplit routing (fork CFMetaData.domainSplit): keyed reads derive
    * the 2-char domain of each requested key, so a domain-partitioned
    * store prunes directories via PartitionFilters.
    */
  private def domainPredicate(keys: Seq[String]): Column =
    // the domain column is a raw-scan pruning aid only: the cached live
    // view (row cache) does not carry it, and needs no directory pruning
    if (cachedLive.isEmpty && meta.domainSplit && cells.columns.contains("domain"))
      col("domain").isin(keys.map(_.takeRight(2)).distinct: _*)
    else lit(true)

  private def withToken(df: DataFrame): DataFrame =
    df.withColumn("token", Tokens.token(meta.partitioner, col("key")))

  // ---- validation (thrift/ThriftValidation.java) ----

  private def validateRange(r: SliceRange, cmp: ComparatorType.Value): Unit = {
    require(r.count >= 0, "get_slice requires non-negative count")
    if (r.start.nonEmpty && r.finish.nonEmpty) {
      val ord = JComparators.ordering(cmp)
      val (lo, hi) = if (r.reversed) (r.finish, r.start) else (r.start, r.finish)
      require(ord.compare(lo, hi) <= 0,
        "range finish must come after start in the comparator order (ThriftValidation:230-258)")
    }
  }

  private def validateNames(names: Seq[Array[Byte]]): Unit = {
    require(names.nonEmpty, "slice by names requires at least one name")
    names.foreach(n => require(n != null && n.nonEmpty, "zero-length column name"))
  }

  private def validatePredicate(p: SlicePredicate, cmp: ComparatorType.Value): Unit = p match {
    case r: SliceRange => validateRange(r, cmp)
    case SliceByNames(ns) => validateNames(ns)
  }

  // ---- Q1/Q2/Q3/Q4: point + slice reads ----

  /** Q1 `get` (thrift:300-304): one column / subcolumn / supercolumn. */
  def get(key: String, superName: Option[Array[Byte]], colName: Array[Byte]): DataFrame = {
    require(key.nonEmpty, "zero-length key")
    val base = liveOf(col("key") === key && domainPredicate(Seq(key)))
    superName match {
      case Some(sc) => base.filter(col("super_name") === lit(sc) && col("col_name") === lit(colName))
      case None => base.filter(col("super_name").isNull && col("col_name") === lit(colName))
    }
  }

  /** Q1 `get` with a ColumnPath naming only a SUPERCOLUMN (column unset):
    * returns the whole supercolumn — all live subcolumns
    * (CassandraServer.java:259-275 path for super_column-only ColumnPath).
    */
  def getSuperColumn(key: String, superName: Array[Byte]): DataFrame = {
    require(key.nonEmpty, "zero-length key")
    liveOf(col("key") === key && domainPredicate(Seq(key)))
      .filter(col("super_name") === lit(superName))
  }

  /** Q2 `get_slice` (thrift:310-315) for one key = Q4 over a single key. */
  def getSlice(key: String, superName: Option[Array[Byte]], pred: SlicePredicate): DataFrame =
    multigetSlice(Seq(key), superName, pred)

  /** Q3/Q4 `multiget_slice` (thrift:332-337): one slice per key.
    * For a super CF with no supercolumn parent, the sliced entities are the
    * supercolumns; with a parent, its subcolumns (subcomparator order).
    */
  def multigetSlice(keys: Seq[String], superName: Option[Array[Byte]], pred: SlicePredicate): DataFrame = {
    keys.foreach(k => require(k.nonEmpty, "zero-length key"))
    val keyPred = if (keys.size == 1) col("key") === keys.head else col("key").isin(keys: _*)
    sliceOver(liveOf(keyPred && domainPredicate(keys)), superName, pred)
  }

  /** multiget_slice for a LARGE key set carried as a DataFrame: a broadcast
    * LEFT SEMI JOIN replaces the literal isin list (which stops scaling
    * past a few thousand keys), keeping the probe fully distributed.
    */
  def multigetSlice(keysDf: DataFrame, superName: Option[Array[Byte]], pred: SlicePredicate): DataFrame = {
    val keySet = org.apache.spark.sql.functions.broadcast(keysDf.select(col("key")).distinct())
    val restricted = cachedLive match {
      // row cache serves this path too: semi-join the cached live view
      case Some(c) => c.join(keySet, Seq("key"), "left_semi")
      case None => liveFrom(cells.join(keySet, Seq("key"), "left_semi"))
    }
    sliceOver(restricted, superName, pred)
  }

  /** Slice machinery shared by point reads and range scans. */
  private def sliceOver(live: DataFrame, superName: Option[Array[Byte]], pred: SlicePredicate): DataFrame =
    superName match {
      case Some(sc) =>
        validatePredicate(pred, subCmp)
        Slice(live.filter(col("super_name") === lit(sc)), subCmp, "col_name", pred,
          perKey = Seq("key", "super_name"))
      case None if meta.isSuper =>
        validatePredicate(pred, topCmp)
        Slice(live, topCmp, "super_name", pred)
      case None =>
        validatePredicate(pred, topCmp)
        Slice(live.filter(col("super_name").isNull), topCmp, "col_name", pred)
    }

  /** Q5 `get_count` over every key (the hadoop-connector-style full scan
    * shape): live top-level-entity count per key. Counting never needs the
    * cell VALUES (liveness is decided by ts/tombstone/horizons alone), so
    * the uncached path counts over the value-free [[liveColumns]] frame —
    * the value column stays pruned out of the scan.
    */
  def getCountAll: DataFrame = cachedLive match {
    case Some(c) => Slice.count(c, meta.isSuper)
    case None => Slice.count(liveColumns(cells), meta.isSuper)
  }

  /** Q5 `get_count` (thrift:342-346): live column count per key —
    * value-free like [[getCountAll]] unless the row cache already holds
    * the reconciled view.
    */
  def getCount(keys: Seq[String], superName: Option[Array[Byte]]): DataFrame = {
    val keyPred = col("key").isin(keys: _*)
    val base = cachedLive match {
      case Some(c) => c.filter(keyPred)
      case None => liveColumns(cells.filter(keyPred))
    }
    superName match {
      case Some(sc) =>
        Slice.count(base.filter(col("super_name") === lit(sc)),
          isSuper = false, perKey = Seq("key", "super_name"))
      case None =>
        Slice.count(base, meta.isSuper)
    }
  }

  // ---- Q6: range scans ----

  /** Q6 `get_range_slices` over key BOUNDS (start/end inclusive).
    * The key predicate is applied to the RAW cells (it commutes with
    * per-key reconciliation), so it pushes down into the parquet scan;
    * only the restricted range is reconciled.
    */
  def rangeSliceByKeys(
      startKey: Option[String], endKey: Option[String],
      superName: Option[Array[Byte]], pred: SlicePredicate, maxKeys: Int): DataFrame = {
    require(maxKeys > 0, "get_range_slices requires a positive key count (thrift:240-246)")
    val bounds = RangeScan.keyBoundsPredicate(col("key"), startKey, endKey)
    val bounded = cachedLive match {
      // row cache: the bounds predicate commutes with per-key reconcile,
      // so filtering the cached reconciled view is the cache-hit range scan
      case Some(c) => restrictCachedToPickedKeys(c.filter(bounds), None, maxKeys)
      case None =>
        restrictToPickedKeys(cells.filter(bounds), None, maxKeys)
    }
    sliceOver(bounded, superName, pred)
  }

  /** Key-limited live view: pick the first maxKeys LIVE keys in ring order
    * (one reconcile over the range), then reconcile only the raw cells of
    * the picked keys — the broadcast semi-join lands on the parquet scan,
    * so the second pass reads and reconciles maxKeys keys, not the range.
    *
    * NOTE: for maxKeys <= 10000 the key list is materialized EAGERLY at
    * call time (one Spark job) — deliberately mirroring the reference,
    * whose coordinator materializes each get_range_slices page before
    * answering; the returned DataFrame then embeds the page as an In
    * filter instead of re-running the picking plan in every branch.
    * Above 10000 keys the plan stays fully lazy via a broadcast semi-join.
    * Consequence: the page is a SNAPSHOT — re-executing the returned
    * DataFrame after new runs land reuses the frozen key list (consistent
    * with the reference, where a served page never retro-updates).
    */
  private def restrictToPickedKeys(pre: DataFrame, startToken: Option[Column],
      maxKeys: Int): DataFrame = {
    if (maxKeys == Int.MaxValue) return withToken(liveFrom(pre))
    if (maxKeys <= 10000) {
      // single-phase pick: the value-free liveness aggregate over the
      // whole range, first maxKeys live keys in ring order (the r19 shape
      // — still the general path; the two-phase prefix pick below replaces
      // it where a key bound can express the prefix)
      def fullPick(): Seq[String] =
        withToken(liveKeySet(pre))
          .orderBy(RangeScan.ringOrder(col("token"), startToken), col("key"))
          .limit(maxKeys)
          .select(col("key")).collect().map(_.getString(0)).toSeq
      // Two-phase eager page pick (round 20, VERDICT r19 task 5; guide
      // §1.1 first-principles: a 1000-key page should not aggregate the
      // whole CF). OptProbe r20 measured the single-phase pick at 0.98 s
      // of rangeslice's 1.30 s — a cell-grain groupBy + horizon joins
      // over EVERY key in range just to keep the first 1000 live keys.
      // When the partitioner is order-preserving and the scan does not
      // wrap (no startToken arc), ring order IS key order, so the first
      // `overFetch` raw keys are exactly {key <= bound} for the
      // overFetch-th distinct key: phase 1 finds that BOUND with a
      // single-column distinct + limit + max (no liveness work); phase 2
      // runs the liveness aggregate only under the bound — ONE literal
      // predicate that prunes the range-laid store to its prefix row
      // groups (an In list of the over-fetch would plan 4000 literals
      // into every scan branch of the liveness plan — measured SLOWER
      // than the single-phase pick). Correctness: liveness of a key
      // depends only on that key's own cells and markers, all of which
      // pass the key bound; every key above the bound is ring-after
      // every key under it. If the page yields maxKeys live keys they
      // are exactly the single-phase pick's; if the raw prefix is
      // EXHAUSTED (fewer than overFetch distinct keys exist) the live
      // keys found are all there are; only a prefix where more than 3/4
      // of the over-fetch is dead falls back to the single-phase pick.
      // The page stays a SNAPSHOT and the final key list still lands as
      // an In filter, like the reference's coordinator materializing
      // each get_range_slices page. Size-gated: the prefix pick pays a
      // second Spark job to prune the first one's scan, which only wins
      // when the range is big enough that scanning it dominates job
      // latency — below spark.graft.range.twoPhasePickBytes (default
      // 1 GB; plan-statistics estimate, no job) the single-phase rollup
      // is faster (OptProbe r20: phase jobs ~0.5 s each at sf0.1 against
      // a 1-job pick of the same total cost).
      val twoPhaseBytes = BigInt(cells.sparkSession.conf
        .get("spark.graft.range.twoPhasePickBytes", (1L << 30).toString))
      val twoPhase = meta.partitioner == PartitionerType.OrderPreserving &&
        startToken.isEmpty &&
        pre.queryExecution.optimizedPlan.stats.sizeInBytes >= twoPhaseBytes
      val keys = graft.stat.StoreLatency.timed("range.page_pick") {
        if (!twoPhase) fullPick()
        else {
          val overFetch = math.min(4L * maxKeys, 10000L).toInt
          val raw = pre.select(col("key")).distinct()
            .orderBy(col("key")).limit(overFetch)
            .agg(count(lit(1)), max(col("key"))).head()
          val rawCount = raw.getLong(0)
          if (rawCount == 0L) Seq.empty[String]
          else {
            val bound = raw.getString(1)
            val pageLive = withToken(liveKeySet(pre.filter(col("key") <= bound)))
              .orderBy(RangeScan.ringOrder(col("token"), startToken), col("key"))
              .limit(maxKeys)
              .select(col("key")).collect().map(_.getString(0)).toSeq
            if (pageLive.size >= maxKeys || rawCount < overFetch) pageLive
            else fullPick() // too many dead keys under the bound
          }
        }
      }
      val restricted =
        if (keys.isEmpty) pre.filter(lit(false))
        else pre.filter(col("key").isin(keys: _*))
      withToken(liveFromKeyed(restricted))
    } else {
      // no pickKeys here: liveKeySet is already key-distinct, so a second
      // distinct() would add a redundant exchange+aggregate stage
      val picked = withToken(liveKeySet(pre))
        .orderBy(RangeScan.ringOrder(col("token"), startToken), col("key"))
        .limit(maxKeys)
        .select(col("key"))
      withToken(liveFrom(pre.join(broadcast(picked), Seq("key"), "left_semi")))
    }
  }

  /** [[restrictToPickedKeys]] for a row-cached lens: the cached view is
    * ALREADY reconciled (every row live), so the key page is a distinct()
    * over it and the restricted slice input is a plain filter — no
    * reconcile, no marker aggregates, the cache-hit path end to end.
    */
  private def restrictCachedToPickedKeys(c: DataFrame, startToken: Option[Column],
      maxKeys: Int): DataFrame = {
    if (maxKeys == Int.MaxValue) return withToken(c)
    val picked = withToken(c.select(col("key")).distinct())
      .orderBy(RangeScan.ringOrder(col("token"), startToken), col("key"))
      .limit(maxKeys)
      .select(col("key"))
    if (maxKeys <= 10000) {
      // same eager page materialization as the cold path (see NOTE above)
      val keys = graft.stat.StoreLatency.timed("range.page_pick_cached") {
        picked.collect().map(_.getString(0)).toSeq
      }
      if (keys.isEmpty) withToken(c.filter(lit(false)))
      else withToken(c.filter(col("key").isin(keys: _*)))
    } else withToken(c.join(broadcast(picked), Seq("key"), "left_semi"))
  }

  /** The set of LIVE keys of a raw cell range, computed WITHOUT values:
    * reconcile priority is (ts, tombstone, value) with the value bytes only
    * breaking ties BETWEEN live cells, so whether a column's winner is live
    * never depends on the value — compare per-column best live ts against
    * best tombstone ts and the container deletion horizons.
    *
    * Self-computing path (round 20): a three-level ROLLUP —
    * (key, super, col) → (key, super) → (key) — behind ONE exchange on
    * `key` (HashPartitioning(key) satisfies every level's clustering, so
    * the three aggregates stack in one stage). The r19 shape ran THREE
    * separate aggregates (winners + row horizons + supercolumn horizons,
    * each its own scan of the range and its own exchange) and joined
    * them back; OptProbe r20 measured the pick's cost as plan stages,
    * not data. The rollup reads the range once, value-free.
    *
    * Sidecar path: horizons are precomputed tiny tables — the win
    * aggregate + two broadcast joins of [[liveColumns]] is already the
    * minimal shape there.
    */
  private[graft] def liveKeySet(pre: DataFrame): DataFrame = horizons match {
    case Some(_) => liveColumns(pre).select(col("key")).distinct()
    case None => liveKeySetRollup(pre)
  }

  /** Three-level liveness rollup (see [[liveKeySet]]). Level 1 reduces
    * versions per (key, super_name, col_name) to best live / best
    * tombstone ts (marker cells — col_name null — reduce alongside, their
    * tmax IS the container horizon). Level 2 reduces each (key, super)
    * group to its best surviving column ts (`best`, strict > so the
    * tombstone wins ts ties) and its container horizon (`cdel` — the
    * supercolumn horizon for super groups, the ROW horizon for the
    * super-null group). Level 3 keeps per key the best ts that also
    * beats its group's container horizon, plus the row horizon; a key is
    * live iff that best strictly beats the row horizon. Equivalent to
    * [[liveColumns]].select(key).distinct() by construction (strict
    * compares throughout; max-over-survivors > h ⟺ ∃ survivor > h);
    * EquivalenceSpec-style law pinned in PlanQualitySpec against random
    * cell soups.
    */
  private[graft] def liveKeySetRollup(pre: DataFrame): DataFrame = {
    val negInf = lit(Long.MinValue)
    pre
      .select(col("key"), col("super_name"), col("col_name"),
        col("ts"), col("tombstone"))
      .repartition(col("key"))
      .groupBy(col("key"), col("super_name"), col("col_name"))
      .agg(
        max(when(!col("tombstone"), col("ts"))).as("lmax"),
        max(when(col("tombstone"), col("ts"))).as("tmax"))
      .groupBy(col("key"), col("super_name"))
      .agg(
        max(when(col("col_name").isNotNull &&
          col("lmax") > coalesce(col("tmax"), negInf), col("lmax"))).as("best"),
        max(when(col("col_name").isNull, col("tmax"))).as("cdel"))
      .groupBy(col("key"))
      .agg(
        max(when(col("best") > coalesce(col("cdel"), negInf), col("best")))
          .as("best"),
        max(when(col("super_name").isNull, col("cdel"))).as("rowdel"))
      .filter(col("best") > coalesce(col("rowdel"), negInf))
      .select(col("key"))
  }

  /** The live (key, super_name, col_name) set of a raw cell range,
    * computed WITHOUT values — the shared metadata-only liveness frame
    * behind [[liveKeySet]] and the value-free get_count paths. Tombstone
    * wins timestamp ties, so a column is live iff its best LIVE ts
    * strictly exceeds both its best tombstone ts and the container
    * horizons — two scalar max buffers (plain HashAggregate; a struct
    * buffer would be a SortAggregate, and a ts<<1|tomb bit-pack would
    * overflow for sentinel-huge timestamps like Long.MaxValue).
    */
  private[graft] def liveColumns(pre: DataFrame): DataFrame = {
    val win = pre
      .filter(col("col_name").isNotNull)
      .groupBy(col("key"), col("super_name"), col("col_name"))
      .agg(
        max(when(!col("tombstone"), col("ts"))).as("lmax"),
        max(when(col("tombstone"), col("ts"))).as("tmax"))
    val (rowH, scH) = horizons match {
      case Some((r, s)) =>
        (r.select(col("key"), col("row_del_ts")),
          s.select(col("key"), col("super_name"), col("sc_del_ts")))
      case None =>
        (Reconcile.rowTombstones(pre).select(col("key"), col("row_del_ts")),
          Reconcile.superTombstones(pre)
            .select(col("key"), col("super_name"), col("sc_del_ts")))
    }
    win
      .join(rowH, Seq("key"), "left")
      .join(scH, Seq("key", "super_name"), "left")
      .filter(col("lmax") > coalesce(col("tmax"), lit(Long.MinValue)) &&
        col("lmax") > coalesce(
          greatest(col("row_del_ts"), col("sc_del_ts")), lit(Long.MinValue)))
      .select(col("key"), col("super_name"), col("col_name"))
  }

  /** Q6 `get_range_slices` over a TOKEN range (start-exclusive,
    * end-inclusive; wrap-around splits into two scans). Token predicates
    * also evaluate on the raw cells before any shuffle.
    */
  def rangeSliceByToken(
      startToken: Option[Column], endToken: Option[Column],
      superName: Option[Array[Byte]], pred: SlicePredicate, maxKeys: Int): DataFrame = {
    require(maxKeys > 0, "get_range_slices requires a positive key count (thrift:240-246)")
    def inRange(df: DataFrame): DataFrame = withToken(df)
      .filter(RangeScan.tokenRangePredicate(col("token"), startToken, endToken))
      .drop("token")
    val bounded = cachedLive match {
      case Some(c) => restrictCachedToPickedKeys(inRange(c), startToken, maxKeys)
      case None => restrictToPickedKeys(inRange(cells), startToken, maxKeys)
    }
    sliceOver(bounded, superName, pred)
  }

  // ---- Q7/Q8/Q9: mutations (return the new store view) ----

  /** Q7 insert/batch_insert: timestamped upsert cells. */
  def insert(mutations: DataFrame): CassandraLens =
    new CassandraLens(Mutations(cells, preApply(Mutations.asInserts(mutations))),
      meta, None, None, applyListeners)

  /** Q8 batch_mutate: pre-built cell mutations (inserts + deletions). */
  def batchMutate(mutations: DataFrame*): CassandraLens =
    new CassandraLens(Mutations(cells, mutations.map(preApply): _*),
      meta, None, None, applyListeners)

  /** Q9 remove at column granularity. */
  def removeColumns(df: DataFrame, localDeletionTimeSec: Int): CassandraLens =
    batchMutate(Mutations.asColumnDeletes(df, localDeletionTimeSec))

  /** Q9 remove at row granularity. */
  def removeRows(df: DataFrame, localDeletionTimeSec: Int): CassandraLens =
    batchMutate(Mutations.asRowDeletes(df, localDeletionTimeSec))

  /** Q9 remove at supercolumn granularity. */
  def removeSuperColumns(df: DataFrame, localDeletionTimeSec: Int): CassandraLens =
    batchMutate(Mutations.asSuperDeletes(df, localDeletionTimeSec))

  // ---- Q11 / maintenance ----

  /** The live (key, super, col) name set without values: existence and
    * split computations only need NAMES, and running them through the full
    * `live` reconcile would scan the value column just to drop it (the
    * reconcile aggregate consumes values internally, so projection pruning
    * cannot remove the read). The row cache, when present, is already
    * materialized — use it directly.
    */
  private def liveNames: DataFrame = cachedLive match {
    case Some(c) => c.select(col("key"), col("super_name"), col("col_name"))
    case None => liveColumns(cells)
  }

  /** The (token, key) frame both split computations rank — exposed
    * package-private so PlanQualitySpec can assert its value-free scan
    * contract directly (describeSplits executes its ranking eagerly
    * behind a checkpoint, so the contract is no longer visible in the
    * RESULT frame's plan).
    */
  private[graft] def splitsKeyFrame: DataFrame =
    // no distinct here — describeSplits distincts (token, key) itself
    withToken(liveNames.select(col("key")))

  /** describe_splits(n) (thrift:429-463, CassandraServer.java:644-655) —
    * value-free: splits depend on the live key population only.
    * EXECUTES EAGERLY: the pid-offset ranking pins its range bounds and
    * reads per-partition counts when the frame is CONSTRUCTED (round
    * 14), so calling this runs jobs even if the result is never acted
    * on — the reference's describe_splits is likewise a served call,
    * not a deferred plan.
    */
  def describeSplits(n: Int): DataFrame =
    RangeScan.describeSplits(splitsKeyFrame, n)

  /** describe_splits from a deterministic key SAMPLE (the reference's
    * IndexSummary path, io/IndexSummary.java:1-150) — the 100× variant of
    * `describeSplits`: no global window over the full key population.
    */
  def describeSplitsSampled(n: Int, interval: Int = 128): DataFrame =
    RangeScan.describeSplitsSampled(splitsKeyFrame, n, interval)

  /** ColumnsMayExistQueryFilter (fork, db/filter/ColumnsMayExistQueryFilter
    * .java:28-157): bulk existence probe for (key, col_name) pairs. The
    * reference answers probabilistically from memtable + column blooms;
    * the exact LEFT SEMI JOIN here is a correct refinement ("may exist" ⊇
    * exact), with parquet blooms doing the probabilistic pruning below —
    * and the refinement never reads cell values.
    */
  def columnsExist(probe: DataFrame): DataFrame =
    probe.join(liveNames,
      probe.columns.toSeq.intersect(Seq("key", "super_name", "col_name")),
      "left_semi")

  /** FastRowMayExistQueryFilter (fork, :27-107): row-existence probe. */
  def rowsExist(keys: DataFrame): DataFrame =
    keys.join(liveNames.select("key").distinct(), Seq("key"), "left_semi")

  /** Commit-log point-in-time replay (db/commitlog/CommitLog.java:168-173
    * `recover(maxReplayTimestamp)`, tools/ReplayLogs.java): the store as of
    * mutation timestamp <= maxTs — mutations are timestamped cells, so
    * recovery is a timestamp-bounded reconcile.
    */
  def replayAt(maxTs: Long): CassandraLens =
    new CassandraLens(cells.filter(col("ts") <= maxTs), meta)

  /** Cleanup / anti-compaction (db/CompactionManager.java:453-612): keep
    * only cells whose token falls in the given predicate's ranges (drop
    * keys no longer owned), as a partitioned rewrite source.
    */
  def cleanup(tokenPredicate: Column => Column): CassandraLens =
    new CassandraLens(
      withToken(cells).filter(tokenPredicate(col("token"))).drop("token"), meta)

  /** Anti-entropy digests (read-only validation compaction). */
  def digests(buckets: Int): DataFrame = Validation.cellDigests(cells, buckets)

  /** Major compaction (SURVEY §2.7). */
  def compact(gcBeforeSeconds: Int, processors: Seq[Compaction.RowProcessor] = Nil): CassandraLens =
    new CassandraLens(Compaction.compact(cells, gcBeforeSeconds, processors), meta)

  /** Compact AND refresh the row cache in one step (the reference
    * invalidates and rewarms its row cache as compaction replaces
    * sstables — db/ColumnFamilyStore.java row-cache invalidation on
    * sstable replacement): the old cache (if any) is unpersisted, the
    * compacted lens comes back cache-attached, and when `savedCachePath`
    * is given the fresh snapshot is re-saved so a reopen preheats from
    * post-compaction state instead of a stale one (the [[saveRowCache]]
    * "writers must re-save after compaction" contract, automated).
    */
  def compactWithCacheRefresh(gcBeforeSeconds: Int,
      savedCachePath: Option[String] = None,
      processors: Seq[Compaction.RowProcessor] = Nil): CassandraLens = {
    // unpersist the REAL cache (the hot frame on a partial cache — the
    // served union was never .cache()d), same rule as dropRowCache
    cachedFrame.orElse(cachedLive).foreach(_.unpersist())
    val refreshed = compact(gcBeforeSeconds, processors).withRowCache()
    savedCachePath.foreach(refreshed.saveRowCache)
    refreshed
  }
}

/** Driver-side comparators mirroring the reference byte orders — used for
  * request validation and for property-testing the Column sort keys against
  * the same vectors (db/NameSortTest, db/TimeSortTest, TypeCompareTest).
  */
object CassandraLens {
  /** True iff every leaf relation of the plan is a parquet relation
    * bucketed by `key` — such a scan already satisfies the reconcile's
    * and the slice window's key clustering (the bucketed-layout
    * zero-exchange contract), so the keyed-read repartition must not
    * fire. A union with any non-bucketed leaf (e.g. an unflushed delta)
    * reports false and keeps the r19 shape.
    */
  private[api] def bucketedByKey(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    val leaves = plan.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.bucketSpec.exists(_.bucketColumnNames == Seq("key"))
          case _ => false
        }
      case _ => false
    }
  }

  /** Loud ceiling on a hot-key cache set ([[CassandraLens.withRowCache]]):
    * the set lives as a driver list, broadcasts to executors, and pins
    * its rows in memory — 1e6 keys is already ~10× the reference's
    * key-cache order and far past any sensible "hot" working set; a
    * larger ask is a corpus-sized mistake the require names instead of
    * an executor OOM hours later.
    */
  val MaxHotKeys = 1000000
}

object JComparators {
  private val unsignedLex: Ordering[Array[Byte]] = (a: Array[Byte], b: Array[Byte]) => {
    // FBUtilities.compareByteArrays semantics
    var i = 0
    val n = math.min(a.length, b.length)
    var r = 0
    while (i < n && r == 0) { r = (a(i) & 0xFF) - (b(i) & 0xFF); i += 1 }
    if (r != 0) r else a.length - b.length
  }

  def ordering(cmp: ComparatorType.Value): Ordering[Array[Byte]] = cmp match {
    case ComparatorType.Bytes | ComparatorType.Ascii | ComparatorType.Utf8 => unsignedLex
    case ComparatorType.Long_ => (a, b) =>
      if (a.isEmpty || b.isEmpty) a.length - b.length
      else java.lang.Long.compare(
        graft.functions.ExprHelpers.beLong(a), graft.functions.ExprHelpers.beLong(b))
    case ComparatorType.TimeUuid => (a, b) =>
      if (a.isEmpty || b.isEmpty) a.length - b.length
      else {
        val c = java.lang.Long.compare(
          graft.functions.ExprHelpers.timeUuidTimestamp(a),
          graft.functions.ExprHelpers.timeUuidTimestamp(b))
        if (c != 0) c else unsignedLex.compare(a, b)
      }
    case ComparatorType.LexicalUuid => (a, b) =>
      if (a.isEmpty || b.isEmpty) a.length - b.length
      else {
        val (am, al) = (java.nio.ByteBuffer.wrap(a).getLong(0), java.nio.ByteBuffer.wrap(a).getLong(8))
        val (bm, bl) = (java.nio.ByteBuffer.wrap(b).getLong(0), java.nio.ByteBuffer.wrap(b).getLong(8))
        val c = java.lang.Long.compare(am, bm)
        if (c != 0) c else java.lang.Long.compare(al, bl)
      }
    case ComparatorType.FreshTimestamp => (a, b) =>
      // descending, empty first (fork FreshTimestampType)
      if (a.isEmpty || b.isEmpty) a.length - b.length
      else -unsignedLex.compare(a, b)
    case ComparatorType.Collating => (a, b) =>
      graft.functions.CollatorHolder.collator.compare(
        new String(a, java.nio.charset.StandardCharsets.UTF_8),
        new String(b, java.nio.charset.StandardCharsets.UTF_8))
  }
}
