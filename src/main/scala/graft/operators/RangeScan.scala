package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.{PartitionerType, Tokens}

/** Key/token range scans (SURVEY §2.4 `getKeyRange`,
  * db/ColumnFamilyStore.java:1125-1239) and split computation
  * (`describe_splits` → StorageService.getSplits, consumed by
  * hadoop/ColumnFamilyInputFormat.java:147-192).
  *
  * Semantics (thrift:233-246): a KeyRange holds either
  *  - start_key/end_key — BOUNDS: start-inclusive, end-inclusive; or
  *  - start_token/end_token — RANGE: start-EXCLUSIVE, end-inclusive, and it
  *    may wrap around the ring (dht/Range.java `isWrapAround`), in which
  *    case the planner splits it into two ordinary scans (SURVEY §2.8
  *    `getRestrictedRanges`).
  * Keys surface in token order; `count` limits the number of KEYS.
  */
object RangeScan {

  /** Token-range predicate: start-EXCLUSIVE, end-inclusive; a wrap-around
    * range (start >= end — dht/Range.java `isWrapAround`) is split into two
    * ordinary ranges: (start, MAX] ∪ (MIN, end].
    */
  def tokenRangePredicate(token: Column, start: Option[Column], end: Option[Column]): Column =
    (start, end) match {
      case (None, None) => lit(true)
      case (Some(s), None) => token > s
      case (None, Some(e)) => token <= e
      case (Some(s), Some(e)) =>
        (s < e && token > s && token <= e) ||
          (s >= e && (token > s || token <= e))
    }

  /** Key-BOUNDS predicate: start-key-inclusive, end-key-inclusive
    * (thrift:233-239; dht/Bounds.java vs Range.java distinction).
    */
  def keyBoundsPredicate(key: Column, startKey: Option[String], endKey: Option[String]): Column = {
    val lo = startKey.filter(_.nonEmpty).map(key >= _).getOrElse(lit(true))
    val hi = endKey.filter(_.nonEmpty).map(key <= _).getOrElse(lit(true))
    lo && hi
  }

  /** Ring position of a token relative to a scan's start token: on a
    * wrap-around scan the reference walks the post-start arc FIRST, then
    * the wrapped arc past the ring origin (StorageProxy.getRangeSlice scans
    * restricted ranges sequentially, :805-864) — so the key limit must
    * consume keys in that order, not in global token order.
    */
  def ringOrder(token: Column, startToken: Option[Column]): Column =
    startToken match {
      case Some(s) => struct(when(token > s, 0).otherwise(1).as("arc"), token.as("t"))
      case None => struct(lit(0).as("arc"), token.as("t"))
    }

  /** The first `maxKeys` keys of `df` in (ring-)token order, as a
    * single-column DataFrame — the reference's per-scan key limit
    * (ColumnFamilyStore.getKeyRange maxResults, :1219-1222) as a
    * distributed top-K (TakeOrderedAndProject over the distinct keys),
    * never a global window over cells. Callers apply the picked set to
    * the RAW cell store (literal In page or broadcast semi-join —
    * CassandraLens.restrictToPickedKeys) so the expensive reconcile runs
    * once over the range for key selection and once over only the
    * selected keys — not twice over the full range (per-key reconcile
    * commutes with key restriction).
    */
  def pickKeys(df: DataFrame, maxKeys: Int, startToken: Option[Column] = None): DataFrame =
    df.select(col("token"), col("key"))
      .distinct()
      .orderBy(ringOrder(col("token"), startToken), col("key"))
      .limit(maxKeys)
      .select(col("key"))

  /** describe_splits(n): decompose the key population into n contiguous
    * token ranges of ~equal key count — exact ntile quantiles (deterministic,
    * so it is SQL-oracle checkable; the reference samples its key index
    * instead, StorageService.getSplits). The global window runs over the
    * DISTINCT KEY projection (|keys|, after a map-side distinct), not the
    * cells; at 100 TB the sampled path is `repartitionByRange(n, token)`,
    * which this method's output co-locates with.
    */
  def describeSplits(live: DataFrame, n: Int): DataFrame = {
    val keys = live.select(col("token"), col("key")).distinct()
    val w = Window.orderBy(col("token"), col("key"))
    keys
      .withColumn("split_id", ntile(n).over(w))
      .groupBy(col("split_id"))
      .agg(
        count(lit(1)).as("n_keys"),
        min(col("key")).as("start_key"),
        max(col("key")).as("end_key"))
  }

  /** describe_splits over a SAMPLED key population — the production path
    * at scale (the reference computes splits from its sampled key index,
    * io/IndexSummary.java:1-150 keeps every 128th index entry;
    * StorageService.getSplits walks that sample, never the full key set).
    *
    * The sample is content-deterministic — keys whose xxhash64 lands in
    * 1/interval of the hash space — so it is reproducible across runs and
    * engines, unbiased for any token order, and computed by a map-side
    * filter: the exact path's global window over ALL distinct keys shrinks
    * to one over |keys|/interval sampled rows, the same memory contract as
    * the reference's index summary (10^9 keys at interval 128 → ~8M
    * sample rows). Split i covers the token arc (end_{i-1}, end_i], with
    * split 1 open below and split n open above; `est_keys` estimates the
    * split's population as sample-count × interval.
    */
  def describeSplitsSampled(live: DataFrame, n: Int, interval: Int = 128): DataFrame = {
    val sample = live.select(col("token"), col("key")).distinct()
      .filter(pmod(xxhash64(col("key")), lit(interval)) === 0)
    val w = Window.orderBy(col("token"), col("key"))
    sample
      .withColumn("split_id", ntile(n).over(w))
      .groupBy(col("split_id"))
      .agg(
        (count(lit(1)) * interval).as("est_keys"),
        max(col("key")).as("end_key"))
  }
}
