package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** Streaming faces of the training-data pipeline operators: the same
  * semantics as the batch ops in graft.pipeline, expressed on unbounded
  * inputs with Structured Streaming's state machinery. Used when the
  * corpus arrives as a feed (crawl output, log tail) and dedup/quality
  * must gate ingestion, not run as a later batch pass.
  */
object PipelineStream {

  /** Streaming exact dedup, first-seen-wins: fingerprint each document
    * (md5 of the whitespace/lowercase-normalized text — identical to the
    * batch `Dedup.exact` grouping key) and keep only the first arrival of
    * each fingerprint. `dropDuplicates` carries the seen-fingerprint set
    * in the state store — at scale the state is one small row per
    * DISTINCT document, hash-partitioned like any aggregation.
    */
  def dedupExact(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .dropDuplicates("fp")

  /** Bounded-state variant: dedup only within the event-time watermark
    * (dropDuplicatesWithinWatermark) — the gcGrace analog for dedup
    * state. Use when the feed is unbounded and exact global dedup would
    * grow state forever; duplicates farther apart than the delay are
    * passed through (and caught by the periodic batch dedup pass).
    */
  def dedupExactWithinWatermark(docs: DataFrame, textCol: String,
      eventTimeCol: String, delay: String): DataFrame =
    docs.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming quality gate: the batch keep-flag + repetition-free checks
    * as a stateless filter (no state at all — quality signals are
    * per-document expressions, so the gate composes with any stream).
    */
  def qualityGate(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(TextAnalysis.keepFlag(col(textCol)))

  /** Streaming decontamination: emit the id of each arriving document
    * that shares a word n-gram with the (static) eval-set gram table —
    * once, on first discovery. Eval benchmarks are fixed while the crawl
    * streams, so this is a stream-STATIC left-semi equi-join (stateless,
    * broadcast below AQE's threshold) plus a `dropDuplicates(id)` state
    * row per CONTAMINATED doc only — contamination is rare by
    * construction, so state stays tiny on an unbounded feed.
    */
  def contaminatedIds(docs: DataFrame, evalGrams: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(array_distinct(TextAnalysis.wordNgrams(col(textCol), n))).as("gram"))
      .join(evalGrams.select(col("gram")), Seq("gram"), "left_semi")
      .select(col("id"))
      .dropDuplicates("id")

  /** Bounded-state decontamination: like [[contaminatedIds]] but the
    * per-contaminated-doc dedup row is dropped once the watermark passes —
    * the gcGrace analog for contamination state. For a feed where
    * contamination is NOT rare (an eval-overlapping crawl burst),
    * unwatermarked `dropDuplicates` would retain one state row per
    * contaminated doc forever; here state is bounded by the delay window.
    * A doc re-delivered farther apart than `delay` re-emits its id —
    * downstream sinks that need exactly-once over longer horizons dedup
    * idempotently on write (the id IS the key).
    */
  def contaminatedIdsWithinWatermark(docs: DataFrame, evalGrams: DataFrame,
      idCol: String, textCol: String, n: Int, eventTimeCol: String,
      delay: String): DataFrame =
    docs
      .withWatermark(eventTimeCol, delay)
      .select(col(idCol).as("id"), col(eventTimeCol),
        explode(array_distinct(TextAnalysis.wordNgrams(col(textCol), n))).as("gram"))
      .join(evalGrams.select(col("gram")), Seq("gram"), "left_semi")
      .dropDuplicatesWithinWatermark("id")
      .select(col("id"))

  /** Streaming mixture sampling: the batch `mixtureSample` decision is a
    * deterministic per-document hash, so it needs NO state on a stream —
    * the same document admits or rejects identically whether it arrives
    * in a feed or sits in a batch table (replays and retries included),
    * which is exactly why the sampler hashes ids instead of using RNG.
    */
  def sampleGate(docs: DataFrame, idCol: String, textCol: String,
      ratesPermille: Seq[(String, Int)], defaultPermille: Int): DataFrame =
    docs.filter(TextAnalysis.hash60(col(idCol)) % 1000 <
      TextAnalysis.rateFor(TextAnalysis.langId(col(textCol)), ratesPermille,
        defaultPermille))
}
