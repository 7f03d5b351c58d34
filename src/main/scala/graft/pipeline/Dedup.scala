package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *  - exact: one hash-aggregate on the normalized text (map-side combine);
  *  - n-gram Jaccard: candidates-by-shared-shingle join (never all-pairs);
  *  - MinHash+LSH: signature → banded buckets → candidate pairs → EXACT
  *    verification of candidates only (the classic recall/precision split);
  *  - SimHash: 64-bit sign-sum sketch + banded near-match.
  */
object Dedup {

  /** Exact dedup on normalized text: representative = min(id), plus the
    * duplicate count. One shuffle, partial-aggregated.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.normalized(col(textCol)).as("norm"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("norm")

  /** Exact dedup keeping the BEST copy instead of the min-id one: the
    * keeper per normalized-text group maximizes (score, id) — the
    * production pipelines' choice when duplicates differ in provenance
    * quality (keep the longest / highest-classifier-score crawl of a
    * page). Same one-shuffle cost model as [[exact]]; the argmax is a
    * single struct-max (the overflow-free argmin/argmax idiom), ties
    * break by id for determinism. Returns one row per distinct content:
    * (keep_id, score, n_copies).
    */
  def exactKeepBest(df: DataFrame, idCol: String, textCol: String,
      scoreCol: String): DataFrame =
    df.groupBy(TextAnalysis.normalized(col(textCol)).as("norm"))
      .agg(max(struct(col(scoreCol).cast("long").as("s"),
        col(idCol).as("i"))).as("m"),
        count(lit(1)).as("n_copies"))
      .select(col("m.i").as("keep_id"), col("m.s").as("score"),
        col("n_copies"))

  /** URL-level dedup (the RefinedWeb/CCNet crawl-frontier pass — the SAME
    * page arrives under tracking-param, port, fragment, case and
    * trailing-slash variants, and URL dedup removes them for free BEFORE
    * any content hash runs): canonicalize with
    * [[TextAnalysis.canonicalizeUrl]], then keeper = min(id) and the
    * variant count per canonical form. One window shuffle on the canonical
    * key (min+count share the partition — a single exchange), exactly the
    * [[exact]] cost model; a hot canonical URL (link-farm skew) lands in
    * one partition, which is the correct place for its variant census.
    * Returns every input row: (id, url_canon, keeper, n_variants).
    */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("url_canon"))
    df.select(col(idCol).as("id"),
        TextAnalysis.canonicalizeUrl(col(urlCol)).as("url_canon"))
      .withColumn("keeper", min(col("id")).over(w))
      .withColumn("n_variants", count(lit(1)).over(w))
  }

  /** Distinct (id, shingle) pairs using word n-grams of the normalized
    * text. Documents shorter than n tokens produce no shingles.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // tokenize+shingle+hash is the operator's dominant pre-shuffle cost:
    // run it wide even when the corpus arrives as one row group
    val toks = graft.util.Widen.widenNarrowScan(df)
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("_toks"))
    toks
      .filter(size(col("_toks")) >= n)
      .select(col("id"), explode(expr(
        s"transform(sequence(1, size(_toks) - ${n - 1}), i -> concat_ws(' ', slice(_toks, i, $n)))"
      )).as("sh"))
      .distinct()
  }

  /** Pairwise n-gram Jaccard stats for every pair sharing ≥1 shingle:
    * (ia, ib, inter, uni) with ia < ib. The shared-shingle equi-join is the
    * candidate generator — pairs sharing nothing never materialize, so cost
    * is Σ_shingle freq², not |docs|². (Skewed ultra-frequent shingles would
    * dominate at scale; `maxDocFreq` — the standard LSH-side stoplist,
    * ON by default at [[DefaultMaxDocFreq]] — drops them at the cost of
    * slightly under-counting inter. Pass `maxDocFreq = None` only for
    * brute-force-parity comparisons.)
    */
  /** Raw (id, shingle) pairs WITHOUT the distinct — set semantics are
    * recovered downstream by collect_set / count_distinct aggregates,
    * which dedup during map-side partial aggregation: one shuffle fewer
    * than distinct-then-group, on the operator's hottest path.
    */
  /** The corpus's k most frequent shingles as a stoplist artifact —
    * `TextAnalysis.ngramStats` output in shingle-column form, meant to be
    * persisted once (tiny) and fed to [[jaccardPairs]]' `stoplist` on
    * every subsequent dedup run.
    */
  def corpusStoplist(df: DataFrame, idCol: String, textCol: String, n: Int,
      k: Int): DataFrame =
    TextAnalysis.ngramStats(df, idCol, textCol, n, k).select(col("gram").as("sh"))

  /** Combination emission over per-shingle SORTED id sets: Σ_sh C(freq,2)
    * (ia < ib) pairs, never a doc self-join — the one pair-emission rule
    * both jaccardPairs and the edit-distance candidate set use, so the
    * two can never disagree on which pairs exist.
    */
  private def emitPairs(grouped: DataFrame): DataFrame =
    grouped.select(explode(expr(
      "flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), y -> struct(x AS ia, y AS ib))))"
    )).as("p"))
      .select(col("p.ia").as("ia"), col("p.ib").as("ib"))

  private def shinglesRaw(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    // same widening rationale as [[shingles]]
    val toks = graft.util.Widen.widenNarrowScan(df)
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("_toks"))
    toks
      .filter(size(col("_toks")) >= n)
      .select(col("id"), explode(expr(
        s"transform(sequence(1, size(_toks) - ${n - 1}), i -> concat_ws(' ', slice(_toks, i, $n)))"
      )).as("sh"))
  }

  /** Default document-frequency skew guard for the shared-shingle
    * candidate family: a shingle in f docs nominates C(f,2) pairs, so
    * boilerplate shared by 10k docs alone emits ~5e7 — superlinear
    * cost carrying no similarity signal. 500 is SCALE.md's production
    * contract value (the measured `jaccard_guarded` bench leg). The
    * guard is ON by default; brute-force-parity paths (oracle
    * comparisons, tiny corpora) opt OUT explicitly with
    * `maxDocFreq = None`.
    */
  val DefaultMaxDocFreq: Int = 500

  /** Band-bucket occupancy cap for the MinHash-LSH family — the
    * [[DefaultMaxDocFreq]] move at band grain. The sf1 slope table
    * (SCALE.md) measured the uncapped candidate self-join 30x
    * superlinear at 10x docs (bucket density owns a quadratic share of
    * the join) and cap 64 cut the sf1 leg 56.2 -> 22.0 s, so the guard
    * is ON by default everywhere a near-dup path buckets: batch
    * ([[lshCandidates]]/[[minhashNearDuplicates]]), the persisted
    * snapshot pair ([[saveMinhashSnapshot]]/[[nearDupsAgainstSnapshot]]),
    * and the streaming twins
    * ([[graft.streaming.PipelineStream.nearDupPairs]] /
    * `nearDupPairsWithinWatermark`). Oracle comparisons and tiny
    * corpora opt OUT explicitly with `maxBucket = None` (their DuckDB
    * twins are uncapped).
    */
  val DefaultMaxBucket: Int = 64

  /** @param hashShingles replace each shingle string with its xxhash64
    *   BEFORE the shuffles: the shuffle key shrinks from a ~20-byte
    *   3-gram string to 8 bytes — the scale path for 100 TB corpora.
    *   Counts are exact modulo 64-bit collisions (P ≈ m²/2⁶⁵ — about
    *   1e-13 even at a billion distinct shingles); keep it off when
    *   comparing against a string-keyed external oracle.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq), hashShingles: Boolean = false,
      stoplist: Option[DataFrame] = None): DataFrame = {
    val rawStr0 = shinglesRaw(df, idCol, textCol, n)
    // external stoplist (e.g. corpusStoplist's top-k frequent n-grams,
    // persisted once per corpus): broadcast anti-join BEFORE hashing, so
    // the artifact stays a readable string table either way. Unlike
    // maxDocFreq (computed per run), the artifact makes the cut
    // REPRODUCIBLE across incremental runs over a growing corpus.
    val rawStr = stoplist.map(s => rawStr0.join(
      broadcast(s.select(col(s.columns.head).as("sh"))), Seq("sh"), "left_anti"))
      .getOrElse(rawStr0)
    val raw = if (hashShingles) rawStr.withColumn("sh", xxhash64(col("sh"))) else rawStr
    setOverlapPairs(raw, maxDocFreq)
  }

  /** (ia, ib, inter, uni) for every id pair sharing ≥1 element of the
    * (id, sh) relation `raw` — the candidate-generation + exact-verify
    * core jaccardPairs is built on, exposed because ANY set-overlap
    * near-dup (text shingles, video frame hashes, …) is this same plan.
    * ONE explode+shuffle pass builds the per-element sorted id sets,
    * materialized once (lazy localCheckpoint) to feed sizes, the
    * frequency cap, and pair emission — previously each re-derived the
    * exploded elements (the subtree-duplication trap). The cap is a
    * plain size(ids) filter; pair count is Σ_element C(freq,2) via
    * sorted-set combination emission, never a self-join. LAZY
    * checkpoints (round 7): eager ones paid a standalone blocking job
    * per frame before the main action; lazy keeps the compute-once
    * guarantee without the extra jobs the bench was charged for.
    */
  def setOverlapPairs(raw: DataFrame, maxFreq: Option[Int] = None): DataFrame =
    setOverlapPairsWithSizes(raw, maxFreq)
      .select(col("ia"), col("ib"), col("inter"), col("uni"))

  /** [[setOverlapPairs]] keeping the per-side set sizes — the relation
    * asymmetric overlap measures (containment) need.
    */
  def setOverlapPairsWithSizes(raw: DataFrame,
      maxFreq: Option[Int] = None): DataFrame = {
    val grouped0 = raw.groupBy("sh").agg(sort_array(collect_set(col("id"))).as("ids"))
    val grouped = maxFreq
      .map(f => grouped0.filter(size(col("ids")) <= f)).getOrElse(grouped0)
      .localCheckpoint(eager = false)
    // one row per doc, referenced by BOTH size joins below — cache
    // once or the explode+aggregate over the element sets runs twice
    val sizes = grouped
      .select(explode(col("ids")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("sz"))
      .localCheckpoint(eager = false)
    val inter = emitPairs(grouped)
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("id" -> "ia", "sz" -> "sza")), Seq("ia"))
      .join(sizes.withColumnsRenamed(Map("id" -> "ib", "sz" -> "szb")), Seq("ib"))
      .select(col("ia"), col("ib"), col("inter"), col("sza"), col("szb"),
        (col("sza") + col("szb") - col("inter")).as("uni"))
  }

  /** Content-defined chunking (the rsync/LBFS boundary rule applied to
    * text): cut where the rolling window hash satisfies
    * hash60(window) mod `mask` == 0, chunks = the spans between cuts.
    * Unlike fixed token windows (p24/p90), the boundaries RE-SYNC after
    * an edit — inserting a sentence shifts every fixed chunk after it
    * but only perturbs the one CDC chunk containing the edit, so
    * chunk-grain dedup stays exact under insertion (the property
    * backup/dedup systems buy with this rule). Expected chunk length ≈
    * mask chars. Whole computation is one projection over the
    * normalized text (the p16 rolling-hash cost model: len window
    * hashes per doc, no shuffle); docs shorter than `window` (or
    * boundary-free) emit one whole-doc chunk. Returns one row per
    * chunk: (id, start, fp).
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int = 16, mask: Int = 64): DataFrame = {
    require(window >= 2 && mask >= 2, s"window=$window mask=$mask out of range")
    val norm = TextAnalysis.normalized(col(textCol))
    val base = df.select(col(idCol).as("id"), norm.as("t"))
      .withColumn("l", length(col("t")).cast("long"))
    // Spark's sequence(1, 0) counts DOWN — guard the short-doc case
    val positions = when(col("l") >= window,
      sequence(lit(1L), col("l") - (window - 1)))
      .otherwise(array().cast("array<bigint>"))
    base
      .withColumn("cuts", filter(positions, i =>
        i > 1L && TextAnalysis.hash60(
          col("t").substr(i.cast("int"), lit(window))) % mask === 0L))
      .withColumn("starts", concat(array(lit(1L)), col("cuts")))
      .withColumn("ends", concat(
        transform(col("cuts"), c => c - 1L), array(col("l"))))
      .select(col("id"), posexplode(zip_with(col("starts"), col("ends"),
        (s, e) => struct(s.as("start"),
          md5(encode(col("t").substr(s.cast("int"),
            (e - s + 1L).cast("int")), "UTF-8")).as("fp")))).as(Seq("_p", "ch")))
      .select(col("id"), col("ch.start").as("start"), col("ch.fp").as("fp"))
  }

  /** Containment near-dup (Broder): flag pairs where the SMALLER
    * shingle set sits mostly inside the larger —
    * inter/min(|A|,|B|) ≥ τ. Catches quote-inclusion and
    * page-plus-boilerplate duplication that symmetric Jaccard
    * structurally misses (a short doc embedded in a long one has low
    * union overlap but full containment). Same candidate plan as
    * [[jaccardPairs]] (shared-shingle emission, Σfreq², never
    * all-pairs); the gate is integer (inter·1000 ≥ τ·min). Returns
    * (ia, ib, inter, sza, szb, containment_permille).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int, tauPermille: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq),
      hashShingles: Boolean = false): DataFrame = {
    val raw0 = shinglesRaw(df, idCol, textCol, n)
    val raw = if (hashShingles) raw0.withColumn("sh", xxhash64(col("sh"))) else raw0
    setOverlapPairsWithSizes(raw, maxDocFreq)
      .filter(col("inter") * 1000 >= least(col("sza"), col("szb")) * tauPermille)
      .select(col("ia"), col("ib"), col("inter"), col("sza"), col("szb"),
        expr("inter * 1000 DIV least(sza, szb)").as("containment_permille"))
  }

  /** Near-duplicate pairs with Jaccard ≥ num/den (integer arithmetic — no
    * float threshold drift between engines). `maxDocFreq` passes through
    * to [[jaccardPairs]]'s skew guard — the production contract at scale
    * (a shingle in f docs emits C(f,2) candidate pairs; ultra-frequent
    * shingles carry no similarity signal and only quadratic cost).
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String, n: Int,
      num: Int, den: Int, hashShingles: Boolean = false,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame =
    jaccardPairs(df, idCol, textCol, n, maxDocFreq = maxDocFreq,
        hashShingles = hashShingles)
      .filter(col("inter") * den >= col("uni") * num)

  /** MinHash signatures: numHashes seeded xxhash64 min-aggregates over the
    * shingle set — one shuffle, all partial-aggregated, no UDFs.
    */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame =
    sh.groupBy("id").agg(
      min(xxhash64(lit(0), col("sh"))).as("h0"),
      (1 until numHashes).map(k => min(xxhash64(lit(k), col("sh"))).as(s"h$k")): _*)

  /** (id, band, bh) banded bucket rows of a signature table — the join key
    * LSH candidates bucket on, and the corpus-side artifact a snapshot
    * persists.
    */
  private def bandedBuckets(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    val r = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(((b * r) until ((b + 1) * r)).map(k => col(s"h$k")): _*).as("bh"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bd"))
      .select(col("id"), col("bd.band").as("band"), col("bd.bh").as("bh"))
  }

  /** LSH candidate pairs: split the signature into `bands` bands of
    * numHashes/bands rows, hash each band, bucket-join — pairs agreeing on
    * at least one full band become candidates.
    *
    * `maxBucket` is the bucket-grain SKEW GUARD (the [[jaccardPairs]]
    * maxDocFreq move at band grain): a bucket holding m members yields
    * C(m, 2) candidate pairs, so one degenerate bucket — boilerplate-
    * heavy shards, near-constant documents, a template flood — owns a
    * quadratic share of the whole join (measured: the sf1 slope table
    * ran the uncapped leg at 30× for 10× docs). Buckets larger than the
    * cap are dropped WHOLE before the self-join. Recall contract, stated
    * honestly: a true near-dup pair is missed only if EVERY band bucket
    * it shares is over the cap — for genuinely near-duplicate pairs that
    * means every band collides with ≥ maxBucket other docs, i.e. the
    * pair sits inside a duplication blob the size of the cap, which is
    * exact-dedup's domain (run [[exact]] first), not near-dup's. ON by
    * default at [[DefaultMaxBucket]] (the measured sf1 knob); oracle-
    * gated call sites pass None (the DuckDB twins are uncapped).
    */
  def lshCandidates(sig: DataFrame, numHashes: Int, bands: Int,
      maxBucket: Option[Int] = Some(DefaultMaxBucket)): DataFrame = {
    // materialize the banded signatures once: the bucket self-join below
    // references them on BOTH sides, and without this the full signature
    // aggregation (the min-hash pass over every shingle) is in two plan
    // branches — tiny table (docs × bands rows), big recompute saved
    val exploded = bandedBuckets(sig, numHashes, bands).localCheckpoint(eager = false)
    val src = maxBucket match {
      case Some(m) =>
        require(m >= 2, s"maxBucket $m must be >= 2 (a pair needs a bucket of 2)")
        val ok = exploded.groupBy(col("band"), col("bh"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") <= m)
          .select(col("band"), col("bh"))
        exploded.join(ok, Seq("band", "bh"), "left_semi")
          .localCheckpoint(eager = false) // both self-join sides
      case None => exploded
    }
    src.select(col("id").as("ia"), col("band"), col("bh"))
      .join(src.select(col("id").as("ib"), col("band"), col("bh")), Seq("band", "bh"))
      .filter(col("ia") < col("ib"))
      .select("ia", "ib").distinct()
  }

  /** Exact verification of candidate pairs only: join candidates back to
    * the shingle sets, count intersections, attach set sizes. This is what
    * keeps MinHash honest — reported pairs carry TRUE Jaccard stats.
    */
  def verifyCandidates(cand: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select(col("id").as("ia"), col("sh")), Seq("ia"))
      .join(sh.select(col("id").as("ib"), col("sh")), Seq("ib", "sh"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnsRenamed(Map("id" -> "ia", "sz" -> "sza")), Seq("ia"))
      .join(sizes.withColumnsRenamed(Map("id" -> "ib", "sz" -> "szb")), Seq("ib"))
      .select(col("ia"), col("ib"), col("inter"),
        (col("sza") + col("szb") - col("inter")).as("uni"))
  }

  /** Full MinHash-LSH near-dup pipeline: shingle → sign → band → candidate
    * → exact-verify → threshold.
    */
  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, num: Int, den: Int,
      maxBucket: Option[Int] = Some(DefaultMaxBucket)): DataFrame = {
    // one tokenize+explode+distinct pass: the shingle set feeds the
    // signature aggregation AND three joins inside verification — without
    // the checkpoint it re-derives in every branch
    val sh = shingles(df, idCol, textCol, n).localCheckpoint(eager = false)
    val cand = lshCandidates(minhashSignatures(sh, numHashes), numHashes,
      bands, maxBucket)
    verifyCandidates(cand, sh)
      .filter(col("inter") * den >= col("uni") * num)
  }

  /** Persist the corpus-side MinHash-LSH state for incremental NEAR-dup
    * ingest (the fuzzy twin of [[snapshotFingerprints]]):
    *   buckets/  (id, band, bh) — the LSH bucket table new shards probe
    *   shingles/ (id, sh)       — read ONLY for candidate ids at verify
    *   sizes/    (id, sz)       — shingle-set sizes (exact Jaccard denom)
    * The corpus text itself is never needed again: one ingest batch costs
    * the bucket join plus the matched candidates' shingle rows.
    *
    * `maxBucket` (ON by default, [[lshCandidates]]' skew guard) drops
    * corpus buckets over the cap WHOLE before the write: a degenerate
    * bucket in the ARTIFACT would otherwise tax every future ingest
    * batch that touches it. Must match the probe side's cap — a capped
    * snapshot probed uncapped silently under-counts combined occupancy.
    */
  def saveMinhashSnapshot(df: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, bands: Int, path: String,
      maxBucket: Option[Int] = Some(DefaultMaxBucket)): Unit = {
    val sh = shingles(df, idCol, textCol, n).localCheckpoint(eager = false)
    val bk0 = bandedBuckets(minhashSignatures(sh, numHashes), numHashes, bands)
    val bk = maxBucket match {
      case Some(m) =>
        require(m >= 2, s"maxBucket $m must be >= 2 (a pair needs a bucket of 2)")
        val bkc = bk0.localCheckpoint(eager = false) // guard agg + semi-join sides
        val ok = bkc.groupBy(col("band"), col("bh"))
          .agg(count(lit(1)).as("__n")).filter(col("__n") <= m)
          .select(col("band"), col("bh"))
        bkc.join(ok, Seq("band", "bh"), "left_semi")
      case None => bk0
    }
    // both artifacts are laid out range-partitioned + sorted on their join
    // key: parquet row-group min/max stats then let the ingest-side joins
    // (and Spark's injected runtime bloom filters) SKIP the corpus rows a
    // given shard never touches, instead of scanning the whole artifact
    bk
      .repartitionByRange(col("bh")).sortWithinPartitions("bh")
      .write.mode("overwrite").parquet(s"$path/buckets")
    sh.repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$path/shingles")
    sh.groupBy("id").agg(count(lit(1)).as("sz"))
      .write.mode("overwrite").parquet(s"$path/sizes")
    // the sketch params AND the write-time cap travel WITH the artifact:
    // a probe under different params silently mis-buckets / mis-guards,
    // so nearDupsAgainstSnapshot require-matches this row (loud-guard
    // style). maxBucket encodes None as -1.
    df.sparkSession.range(1).select(lit(n).as("n"),
        lit(numHashes).as("num_hashes"), lit(bands).as("bands"),
        lit(maxBucket.map(_.toLong).getOrElse(-1L)).as("max_bucket"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Near-dup pairs (new doc, corpus doc) of a new shard against a
    * persisted [[saveMinhashSnapshot]] corpus, exact-verified at
    * Jaccard ≥ num/den. The 100 TB ingest shape: the corpus contributes
    * its (tiny) bucket rows to the candidate join and the shingle rows of
    * MATCHED candidates only (left-semi pruning) — never a rescan, never
    * an all-pairs product. Sketch parameters must match the snapshot's.
    *
    * `maxBucket` (ON by default) guards COMBINED occupancy: per touched
    * (band, bh), shard members + surviving corpus members must fit the
    * cap or the bucket drops whole before the candidate join — the same
    * quadratic-share argument as [[lshCandidates]], here paid per ingest
    * batch. With the snapshot saved at the same cap this reproduces the
    * full-corpus guard's view of any bucket the shard touches.
    */
  def nearDupsAgainstSnapshot(newDf: DataFrame, idCol: String, textCol: String,
      path: String, n: Int, numHashes: Int, bands: Int,
      num: Int, den: Int,
      maxBucket: Option[Int] = Some(DefaultMaxBucket)): DataFrame = {
    val spark = newDf.sparkSession
    // the artifact's persisted SKETCH params must match the probe's —
    // a mismatch silently mis-buckets (different signatures never
    // collide) and returns plausible-but-wrong pairs; enforced loudly
    // (snapshots predating the meta row fail loudly too). The CAP is
    // deliberately NOT required to match: the effective guard composes
    // (write-time cap on the artifact ∩ probe-time cap on combined
    // occupancy — both directions spec-pinned); the meta row records
    // the write-time cap as provenance for exactly that reasoning.
    val m = spark.read.parquet(s"$path/meta").head()
    require(m.getAs[Int]("n") == n && m.getAs[Int]("num_hashes") == numHashes &&
        m.getAs[Int]("bands") == bands,
      s"snapshot sketch params (n=${m.getAs[Int]("n")}, " +
        s"numHashes=${m.getAs[Int]("num_hashes")}, bands=${m.getAs[Int]("bands")}) " +
        s"do not match probe params (n=$n, numHashes=$numHashes, bands=$bands) — " +
        "re-save the snapshot or probe with the saved params")
    val newSh = shingles(newDf, idCol, textCol, n).localCheckpoint(eager = false)
    val newBk0 = bandedBuckets(minhashSignatures(newSh, numHashes), numHashes, bands)
    val corpusBk0 = spark.read.parquet(s"$path/buckets")
    val (newBk, corpusBk) = maxBucket match {
      case Some(m) =>
        require(m >= 2, s"maxBucket $m must be >= 2 (a pair needs a bucket of 2)")
        val nbk = newBk0.localCheckpoint(eager = false) // occupancy agg + join side
        // corpus rows only matter in buckets the shard touches — prune
        // before counting so the guard never aggregates the whole artifact
        val cbk = corpusBk0
          .join(nbk.select("band", "bh").distinct(), Seq("band", "bh"), "left_semi")
          .localCheckpoint(eager = false)
        val ok = nbk.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("__nn"))
          .join(cbk.groupBy(col("band"), col("bh")).agg(count(lit(1)).as("__nc")),
            Seq("band", "bh"), "left")
          .filter(col("__nn") + coalesce(col("__nc"), lit(0L)) <= m)
          .select(col("band"), col("bh"))
        (nbk.join(ok, Seq("band", "bh"), "left_semi"),
          cbk.join(ok, Seq("band", "bh"), "left_semi"))
      case None => (newBk0, corpusBk0)
    }
    // candidate pairs feed the semi-join AND the intersection count —
    // lazy-checkpointed so the bucket join runs once in the final action
    val cand = newBk.select(col("id").as("nid"), col("band"), col("bh"))
      .join(corpusBk
        .select(col("id").as("cid"), col("band"), col("bh")), Seq("band", "bh"))
      .select("nid", "cid").distinct()
      .localCheckpoint(eager = false)
    val corpusSh = spark.read.parquet(s"$path/shingles")
      .join(cand.select(col("cid").as("id")), Seq("id"), "left_semi")
    val inter = cand
      .join(newSh.select(col("id").as("nid"), col("sh")), Seq("nid"))
      .join(corpusSh.select(col("id").as("cid"), col("sh")), Seq("cid", "sh"))
      .groupBy("nid", "cid").agg(count(lit(1)).as("inter"))
    val newSz = newSh.groupBy("id").agg(count(lit(1)).as("sz"))
    inter
      .join(newSz.withColumnsRenamed(Map("id" -> "nid", "sz" -> "szn")), Seq("nid"))
      .join(spark.read.parquet(s"$path/sizes")
        .withColumnsRenamed(Map("id" -> "cid", "sz" -> "szc")), Seq("cid"))
      .select(col("nid"), col("cid"), col("inter"),
        (col("szn") + col("szc") - col("inter")).as("uni"))
      .filter(col("inter") * den >= col("uni") * num)
  }

  /** Distinct shared-shingle candidate pairs — the jaccardPairs candidate
    * rule without its size/intersection branches: per-shingle sorted id
    * sets, combination emission (Σ_sh C(freq,2), never a doc self-join),
    * distinct. The recall set for any verify metric over candidates.
    * `maxDocFreq` is the same skew guard jaccardPairs exposes: a shingle
    * in f docs emits C(f,2) pairs, so a stock phrase shared by 10k docs
    * would alone emit ~5·10⁷ — cap f and boilerplate shingles stop
    * nominating pairs at all.
    */
  def sharedShingleCandidates(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val grouped0 = shinglesRaw(df, idCol, textCol, n)
      .groupBy("sh").agg(sort_array(collect_set(col("id"))).as("ids"))
    emitPairs(
      maxDocFreq.map(f => grouped0.filter(size(col("ids")) <= f)).getOrElse(grouped0))
      .distinct()
  }

  /** Shingle-CONTAINMENT near-dups — Broder's containment next to the
    * resemblance the Jaccard ops measure (AltaVista dedup, 1997):
    * directed pairs where at least num/den of the SUB document's
    * shingle set occurs in the SUP document. This is the
    * quote/excerpt/superset detector symmetric Jaccard under-scores: a
    * paragraph quoted verbatim inside a book has J ≈ 0 against it but
    * containment 1 — exactly the "document A is inside document B"
    * signal a training-data pipeline needs before dropping the
    * fragment and keeping the superset.
    *
    * Shape: ONE [[setOverlapPairsWithSizes]] pass (the shared
    * candidate-emission + exact-intersection core every set-overlap op
    * here rides — never a doc self-join; `maxDocFreq` skew guard ON by
    * default; `hashShingles` = the 8-byte-key scale path), then both
    * directions emit from the checkpointed pair frame. Containment ≥
    * resemblance always, so at equal thresholds the result is a
    * superset of the Jaccard pairs (each as two directed rows). Unlike
    * [[containmentPairs]]' symmetric min-side permille gate, the
    * directed rows say WHICH doc is the fragment — the drop decision.
    * Returns (sub_id, sup_id, inter, sub_sz).
    */
  def containmentNearDuplicates(df: DataFrame, idCol: String,
      textCol: String, n: Int, num: Int, den: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq),
      hashShingles: Boolean = false): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den, "need 0 < num/den <= 1")
    val raw0 = shinglesRaw(df, idCol, textCol, n)
    val raw = if (hashShingles) raw0.withColumn("sh", xxhash64(col("sh"))) else raw0
    val p = setOverlapPairsWithSizes(raw, maxDocFreq)
      .localCheckpoint(eager = false) // both directed emissions below
    p.filter(col("inter") * den >= col("sza") * num)
      .select(col("ia").as("sub_id"), col("ib").as("sup_id"),
        col("inter"), col("sza").as("sub_sz"))
      .unionByName(p.filter(col("inter") * den >= col("szb") * num)
        .select(col("ib").as("sub_id"), col("ia").as("sup_id"),
          col("inter"), col("szb").as("sub_sz")))
  }

  /** The keep/drop decision a pipeline executes over
    * [[containmentNearDuplicates]]: drop every doc that appears as a
    * contained FRAGMENT — strictly contained in anything, or mutually
    * contained (both directions ≥ the bar, i.e. near-identical sets)
    * with a SMALLER-id partner (the exact-dedup first-wins convention).
    * A deterministic LOCAL rule, not an iterative fixpoint: in a chain
    * A ⊂ B ⊂ C both A and B drop and C survives; at thresholds < 1 a
    * fragment's superset may itself drop without a transitive pair
    * guaranteeing the fragment's content survives — the same
    * representativeness caveat every near-dedup keeper rule carries
    * (at threshold = 1 set-containment IS transitive and one full copy
    * always survives). Returns the surviving ids as (id).
    */
  def dropContainedFragments(df: DataFrame, idCol: String,
      textCol: String, n: Int, num: Int, den: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq),
      hashShingles: Boolean = false): DataFrame = {
    val pairs = containmentNearDuplicates(df, idCol, textCol, n, num, den,
      maxDocFreq, hashShingles)
      .select(col("sub_id"), col("sup_id"))
      .localCheckpoint(eager = false) // mutual intersect + strict except
    val mutual = pairs.intersect(pairs
      .select(col("sup_id").as("sub_id"), col("sub_id").as("sup_id")))
    val drops = pairs.except(mutual).select(col("sub_id").as("id"))
      .unionByName(mutual.filter(col("sub_id") > col("sup_id"))
        .select(col("sub_id").as("id")))
      .distinct()
    df.select(col(idCol).as("id")).distinct()
      .join(drops, Seq("id"), "left_anti")
  }

  /** Persisted shingle-POSTING corpus artifact for incremental
    * containment: (sh, id) postings range-laid-out by sh (row-group
    * min/max stats + Spark's runtime bloom filters let a shard probe
    * skip postings it never touches) plus per-doc distinct-shingle
    * sizes. This is the correct standing index for ASYMMETRIC
    * containment — minhash LSH buckets ([[saveMinhashSnapshot]])
    * nominate by resemblance and structurally miss the quote-in-book
    * pairs containment exists to catch (J ≈ 0, containment ≈ 1) —
    * so the probe joins postings directly and the df guard bounds
    * fan-out the way LSH caps bound buckets.
    */
  def saveShinglePostings(df: DataFrame, idCol: String, textCol: String,
      n: Int, path: String): Unit = {
    val sh = shingles(df, idCol, textCol, n).localCheckpoint(eager = false)
    sh.select(col("sh"), col("id"))
      .repartitionByRange(col("sh")).sortWithinPartitions("sh")
      .write.mode("overwrite").parquet(s"$path/postings")
    sh.groupBy("id").agg(count(lit(1)).as("sz"))
      .write.mode("overwrite").parquet(s"$path/sizes")
  }

  /** Directed containment pairs of a new shard against a persisted
    * [[saveShinglePostings]] corpus, never rescanning corpus text: the
    * shard's shingles key into the posting layout, candidates AND exact
    * intersections come out of ONE posting join, and both directions
    * emit — (shard ⊆ corpus) catches a re-crawled fragment of a
    * standing superset, (corpus ⊆ shard) a standing fragment now
    * arriving inside its superset. `maxDocFreq` guards COMBINED df per
    * TOUCHED shingle (shard + corpus occurrences, the corpus side
    * pruned by the shard's shingles BEFORE counting — the
    * [[nearDupsAgainstSnapshot]] pattern) so a stock phrase never fans
    * out quadratically at probe time. Guarded-mode honesty: sizes stay
    * the artifact's FULL distinct counts (the artifact cannot re-count
    * under a shard-dependent cut), where the batch twin's sizes are
    * post-guard — denominators here are ≥ batch, so a guarded probe
    * only under-flags, never over-flags. With `maxDocFreq = None` the
    * fold law is exact: probe rows ≡ the full-corpus
    * [[containmentNearDuplicates]] rows crossing the shard/corpus
    * split (spec + oracle-gated, p251). Returns
    * (sub_id, sup_id, inter, sub_sz).
    */
  def containmentAgainstSnapshot(newDf: DataFrame, idCol: String,
      textCol: String, path: String, n: Int, num: Int, den: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    require(num >= 1 && den >= 1 && num <= den, "need 0 < num/den <= 1")
    val spark = newDf.sparkSession
    val newSh = shingles(newDf, idCol, textCol, n).localCheckpoint(eager = false)
    val touched = spark.read.parquet(s"$path/postings")
      .join(newSh.select("sh").distinct(), Seq("sh"), "left_semi")
      .localCheckpoint(eager = false) // guard agg + posting join sides
    val (shardSh, corpSh) = maxDocFreq match {
      case Some(f) =>
        require(f >= 1, s"maxDocFreq $f must be >= 1")
        val ok = newSh.groupBy("sh").agg(count(lit(1)).as("__nn"))
          .join(touched.groupBy("sh").agg(count(lit(1)).as("__nc")),
            Seq("sh"), "left")
          .filter(col("__nn") + coalesce(col("__nc"), lit(0L)) <= f)
          .select("sh")
        (newSh.join(ok, Seq("sh"), "left_semi"),
          touched.join(ok, Seq("sh"), "left_semi"))
      case None => (newSh, touched)
    }
    val inter = shardSh.select(col("id").as("nid"), col("sh"))
      .join(corpSh.select(col("id").as("cid"), col("sh")), Seq("sh"))
      .groupBy("nid", "cid").agg(count(lit(1)).as("inter"))
      .localCheckpoint(eager = false) // sizes semi-join + both emissions
    val nsz = newSh.groupBy("id").agg(count(lit(1)).as("sz"))
    val csz = spark.read.parquet(s"$path/sizes")
      .join(inter.select(col("cid").as("id")), Seq("id"), "left_semi")
    val sized = inter
      .join(nsz.withColumnsRenamed(Map("id" -> "nid", "sz" -> "szn")), Seq("nid"))
      .join(csz.withColumnsRenamed(Map("id" -> "cid", "sz" -> "szc")), Seq("cid"))
      .localCheckpoint(eager = false) // both directed emissions below
    sized.filter(col("inter") * den >= col("szn") * num)
      .select(col("nid").as("sub_id"), col("cid").as("sup_id"),
        col("inter"), col("szn").as("sub_sz"))
      .unionByName(sized.filter(col("inter") * den >= col("szc") * num)
        .select(col("cid").as("sub_id"), col("nid").as("sup_id"),
          col("inter"), col("szc").as("sub_sz")))
  }

  /** Edit-distance fuzzy near-dup: shared-shingle candidates verified by
    * levenshtein over the first `prefixChars` chars of the
    * token-normalized text (lowercased, single-spaced — the same
    * normalization the shingles see). The candidates-then-verify shape of
    * MinHash with an edit metric instead of a set metric: it scores
    * in-place character edits that token-level Jaccard over-penalizes
    * (one typo kills n shingles). Bounding the prefix bounds the O(p²)
    * verify cost per pair regardless of document length, and `maxDocFreq`
    * bounds how many pairs a boilerplate shingle may nominate — the two
    * knobs that keep the metric affordable when documents are megabytes.
    */
  def editDistanceNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      n: Int, maxDist: Int, prefixChars: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val cand = sharedShingleCandidates(df, idCol, textCol, n, maxDocFreq)
    // tiny (id, prefix) frame referenced on BOTH sides of the pair join —
    // lazy-checkpointed or the tokenize runs in two plan branches
    val norm = df.select(col(idCol).as("id"),
      substring(concat_ws(" ", TextAnalysis.tokens(col(textCol))), 1, prefixChars).as("txt"))
      .localCheckpoint(eager = false)
    cand
      .join(norm.select(col("id").as("ia"), col("txt").as("ta")), Seq("ia"))
      .join(norm.select(col("id").as("ib"), col("txt").as("tb")), Seq("ib"))
      .withColumn("dist", levenshtein(col("ta"), col("tb")))
      .filter(col("dist") <= maxDist)
      .select(col("ia"), col("ib"), col("dist").cast("long").as("dist"))
  }

  /** Connected components over an undirected pair list (ia, ib) →
    * (id, comp) with comp = min id reachable; self-loop pairs label
    * their node a singleton. Alternating large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014): each round CONTRACTS the edge set toward a forest of
    * min-rooted stars —
    *  - large-star(u): hang every LARGER neighbor of u onto
    *    m = min(Γ(u) ∪ {u});
    *  - small-star(u): hang u and all its SMALLER neighbors onto their
    *    minimum.
    * Unlike the pointer-jumping label propagation this replaced (round
    * 14), the rounds rewrite EDGES, not id-pointers, so convergence is
    * O(log² n) worst-case (≈ log n in practice) REGARDLESS of how ids
    * correlate with graph position — the shape that broke the old code
    * (a deep path with position-uncorrelated random ids: >200 rounds,
    * measured; ScaleProbe's cc-path leg now closes it in default
    * maxIter). Converged = the edge set is a star forest (no parent is
    * also a child — one semi-join probe per round); the maxIter guard
    * still refuses loudly rather than ship partial labels. Each round
    * is a handful of edge-proportional shuffles; lineage is truncated
    * with [[checkpointFreshStats]] so neither plans nor carried
    * statistics grow with iterations.
    */
  /** Eager localCheckpoint that DROPS the carried plan statistics.
    * Spark 4's `localCheckpoint` copies the child plan's stats onto the
    * LogicalRDD (`rewriteStatsAndConstraints`), so in an iterative
    * SELF-JOIN loop the carried sizeInBytes SQUARES every round —
    * planning cost grows exponentially with the round count and the
    * BigInt stats overflow `BigInteger`'s supported range around round
    * 25 (measured: the cc-delta probe's long-chain closure died inside
    * round-~25 stats estimation before any result). Rebuilding the
    * frame from the checkpointed RDD resets to default stats; the loop
    * frames are corpus-sized, so losing broadcast eligibility for them
    * is the correct conservative outcome anyway.
    */
  private[graft] def checkpointFreshStats(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** large-star: for every node u (over the symmetrized edge view),
    * attach each neighbor v > u to m = min(Γ(u) ∪ {u}). Every output
    * edge has child > parent; connectivity is preserved (each input
    * edge is re-emitted from its smaller endpoint's group).
    *
    * The per-node minimum is a groupBy aggregate joined back, NOT a
    * `Window.partitionBy(x)`: a window funnels a high-degree hub's whole
    * symmetrized adjacency through ONE sorting task every round (a large
    * dup-cluster's min node has degree ≈ cluster size), while the
    * aggregate map-side-combines to one row per node per map partition
    * and the join-back is an equi join AQE can skew-split.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("y").as("x"), col("x").as("y")))
    val mins = sym.groupBy(col("x")).agg(min(col("y")).as("__mn"))
    sym.join(mins, Seq("x"))
      .filter(col("y") > col("x"))
      .select(col("y").as("x"), least(col("__mn"), col("x")).as("y"))
      .distinct()
  }

  /** small-star: orient each edge child-from-larger, then attach every
    * node and its smaller neighbors onto the minimum of that group.
    * Same map-side-combined min + join-back shape as [[largeStar]].
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("x"), col("y")).as("x"),
      least(col("x"), col("y")).as("y"))
    val withM = dir.join(
      dir.groupBy(col("x")).agg(min(col("y")).as("__mn")), Seq("x"))
    withM.select(col("y").as("x"), col("__mn").as("y"))
      .union(withM.select(col("x"), col("__mn").as("y")))
      .filter(col("x") =!= col("y"))
      .distinct()
  }

  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    // node set from the RAW pairs (self-loop-only nodes included), edges
    // with self-loops dropped — a singleton labels itself at the end
    val nodes = pairs.select(col("ia").as("id"))
      .union(pairs.select(col("ib").as("id"))).distinct().localCheckpoint()
    var edges = pairs.select(col("ia").as("x"), col("ib").as("y"))
      .filter(col("x") =!= col("y")).distinct().localCheckpoint()
    var iter = 0
    var converged = edges.isEmpty
    var edgeCnt = if (converged) 0L else edges.count()
    while (!converged && iter < maxIter) {
      val next = checkpointFreshStats(smallStar(largeStar(edges)))
      val nextCnt = next.count()
      // the paper's criterion: the round changed nothing (set equality —
      // count match short-circuits the except probe in early rounds)
      converged = nextCnt == edgeCnt && next.except(edges).isEmpty
      edges = next
      edgeCnt = nextCnt
      iter += 1
    }
    // partial labels would silently split real clusters downstream —
    // refuse them (star rounds close n nodes within ~log² n rounds, so
    // this fires only at a genuinely absurd scale or a too-small cap)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds")
    if (edgeCnt > 0L) {
      // one-time structural validation of the fixed point: a min-rooted
      // star forest has one parent per child and no parent that is also
      // a child — anything else must refuse loudly, never mislabel
      val multiParent = !edges.groupBy(col("x"))
        .agg(countDistinct(col("y")).as("np")).filter(col("np") > 1).isEmpty
      val parentIsChild = !edges
        .join(edges.select(col("x").as("y")).distinct(), Seq("y"), "left_semi")
        .isEmpty
      if (multiParent || parentIsChild) throw new IllegalStateException(
        "connectedComponents: converged edge set is not a star forest")
    }
    nodes
      .join(edges.select(col("x").as("id"), col("y").as("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** INCREMENTAL connected components — fold a batch of NEW pairs into
    * a standing (id, comp) labeling without re-closing the whole graph
    * (the cluster-maintenance move for a continuously-ingested corpus:
    * yesterday's dedup clusters + today's near-dup pairs):
    *  1. map each delta endpoint to its standing component rep (left
    *     join; an unseen node is its own rep),
    *  2. close the REP-GRAPH delta with [[connectedComponents]] — a
    *     graph of ≤ 2|Δ| nodes (the merge structure, never the corpus),
    *     so transitive merges across several standing components
    *     resolve there,
    *  3. compose: standing ids relabel through one comp-keyed join
    *     (only swallowed components change), delta-introduced nodes
    *     append.
    * Labels stay min-id (a standing rep IS its component's min, so the
    * rep-graph min is the union's min) — the incremental labeling is
    * IDENTICAL to `connectedComponents(basePairs ∪ newPairs)`, not
    * merely isomorphic (self-loop pairs (x, x) included: a delta node
    * seen only in a self-loop appends as its own singleton, same as the
    * full closure labels it); spec-pinned and oracle-gated (p222).
    * Cost: one linear pass over the standing labels plus the |Δ|-sized
    * closure — never the O(log n) star rounds over the full corpus.
    *
    * Bounded-Δ contract, enforced loudly: every Δ-derived frame (ends,
    * endReps, merged — each ≤ 2|Δ| two-long rows) is force-broadcast so
    * the standing side never shuffles; `maxDeltaPairs` caps |Δ| well
    * under the 8 GB broadcast hard limit (50M pairs → ≤100M broadcast
    * rows ≈ low-GB hash maps). A larger batch should be folded in
    * slices or re-closed in full — degrading silently to a standing-
    * side shuffle join would defeat the operator's whole point.
    */
  def connectedComponentsDelta(labels: DataFrame, newPairs: DataFrame,
      maxIter: Int = 25, maxDeltaPairs: Long = 50000000L): DataFrame = {
    val lab = labels.select(col("id"), col("comp"))
      .localCheckpoint(eager = false) // endpoint-rep pass + relabel pass
    val dn = newPairs.select(col("ia"), col("ib"))
      .localCheckpoint() // |Δ|-sized, reused thrice; eager: counted next
    val nDelta = dn.count()
    require(nDelta <= maxDeltaPairs,
      s"connectedComponentsDelta: |delta| = $nDelta pairs exceeds " +
        s"maxDeltaPairs = $maxDeltaPairs — the fold force-broadcasts " +
        "delta-derived frames; fold this batch in slices or re-close in full")
    // The standing side must never SHUFFLE — a naive `delta LEFT JOIN
    // labels` cannot broadcast its (big) right side, so Spark would
    // sort-merge the whole label table per endpoint column (measured:
    // the fold's cost grew with corpus size through exactly that).
    // Instead every standing access is a streamed pass probing a
    // broadcast Δ-derived build side:
    //   pass 1 — the delta endpoints' standing reps (≤ 2|Δ| rows out);
    //   pass 2 — the relabel, probing the merged rep map.
    val ends = dn.select(col("ia").as("id"))
      .union(dn.select(col("ib").as("id"))).distinct()
      .localCheckpoint(eager = false)
    val endReps = lab.join(broadcast(ends), Seq("id"))
      .localCheckpoint(eager = false) // standing pass 1
    val repPairs = dn
      .join(broadcast(endReps.select(col("id").as("ia"), col("comp").as("ra"))),
        Seq("ia"), "left")
      .join(broadcast(endReps.select(col("id").as("ib"), col("comp").as("rb"))),
        Seq("ib"), "left")
      .select(coalesce(col("ra"), col("ia")).as("ia"),
        coalesce(col("rb"), col("ib")).as("ib"))
      .filter(col("ia") =!= col("ib")) // intra-component pairs are no-ops
    val merged = connectedComponents(repPairs, maxIter)
      .localCheckpoint(eager = false) // relabel map + new-node pick
    // delta endpoints the standing labeling has never seen — their
    // merged rows append as brand-new membership (all-small frames)
    val newEndIds = ends.join(broadcast(endReps.select(col("id"))),
      Seq("id"), "left_anti")
    lab
      .join(broadcast(merged.select(col("id").as("comp"), col("comp").as("ncomp"))),
        Seq("comp"), "left") // standing pass 2
      .select(col("id"), coalesce(col("ncomp"), col("comp")).as("comp"))
      // left join, not semi: a new node seen ONLY in a self-loop pair has
      // no repPairs row (the ia ≠ ib filter drops (x, x)), so it is absent
      // from `merged` — it still gets its singleton (id, id) row here,
      // exactly as the full closure labels it
      .unionByName(newEndIds.join(broadcast(merged), Seq("id"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("comp")))
  }

  /** Near-duplicate clusters: Jaccard pairs → connected components →
    * every document labeled with its cluster representative (min doc id;
    * docs with no near-dup are their own singleton cluster). This is the
    * "keep one per cluster" step of corpus dedup.
    */
  def dupClusters(df: DataFrame, idCol: String, textCol: String, n: Int,
      num: Int, den: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val cc = connectedComponents(
      nearDuplicates(df, idCol, textCol, n, num, den, maxDocFreq = maxDocFreq))
    df.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("comp"), col("id")).as("cluster"))
  }

  /** Corpus duplication profile (the data-card stat every dedup run
    * reports): cluster-size histogram over the near-dup clusters —
    * (cluster_size, n_clusters, n_docs). n_docs − n_clusters summed over
    * rows is exactly the document count a keep-one dedup would remove;
    * size-1 rows are the unique tail. Two tiny aggregations over the
    * cluster assignment — the histogram is at most |distinct sizes| rows.
    */
  def duplicationProfile(df: DataFrame, idCol: String, textCol: String,
      n: Int, num: Int, den: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame =
    dupClusters(df, idCol, textCol, n, num, den, maxDocFreq)
      .groupBy(col("cluster")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz"))
      .agg(count(lit(1)).as("n_clusters"))
      .select(col("sz").cast("long").as("cluster_size"),
        col("n_clusters"),
        (col("sz") * col("n_clusters")).cast("long").as("n_docs"))

  /** Leakage-safe train/val/test split: the split decision hashes the
    * near-dup CLUSTER representative, not the document, so near-duplicates
    * can never straddle train and eval — the contamination mode a plain
    * per-doc hash split ships (an eval doc whose near-twin trains).
    * Fractions are exact per-mille on the deterministic 60-bit md5 hash:
    * reproducible, resumable, engine-independent (same contract as
    * mixtureSample). Output: (id, cluster, split).
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String, n: Int,
      num: Int, den: Int, trainPermille: Int, valPermille: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0
      && trainPermille + valPermille <= 1000, "permille fractions must fit in 1000")
    val h = TextAnalysis.hash60(col("cluster")) % 1000
    dupClusters(df, idCol, textCol, n, num, den, maxDocFreq)
      .select(col(idCol), col("cluster"),
        when(h < trainPermille, "train")
          .when(h < trainPermille + valPermille, "val")
          .otherwise("test").as("split"))
  }

  /** Deduplicate the corpus: keep exactly one document per near-dup
    * cluster (the representative = min doc id). The end-to-end "drop the
    * duplicates" operator: shingle → candidate pairs → connected
    * components → anti-join the non-representatives away.
    */
  /** Passage-granular exact dedup (the RAG / context-window unit): chunk
    * every document with [[graft.pipeline.TextAnalysis.chunkByTokens]]
    * (sliding token windows), fingerprint each chunk, keep the FIRST
    * occurrence in (doc, chunk) order and flag every other copy. Returns
    * (id, chunk_id, dup, n_copies) — the downstream pipeline drops
    * dup=1 passages before indexing/packing, and n_copies is the
    * boilerplate census (navigation chrome, license headers, repeated
    * footers surface as high-copy fingerprints).
    *
    * Scale: one tokenize+chunk projection, then one hash-partitioned
    * window per fingerprint — the [[exact]]/[[deduplicated]] shuffle
    * shape on the chunk key. A boilerplate chunk shared by millions of
    * docs concentrates its fingerprint in one partition (same cost model
    * as exact doc dedup: the census belongs where the copies are); AQE
    * skew split handles pathological fingerprints.
    */
  def dedupChunks(df: DataFrame, idCol: String, textCol: String,
      maxTokens: Int = 32, stride: Int = 16): DataFrame = {
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("id"), col("chunk_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    graft.pipeline.TextAnalysis.chunkByTokens(df, idCol, textCol, maxTokens, stride)
      .withColumn("fp", md5(col("chunk_text")))
      .withColumn("chunk_id", col("chunk_id").cast("long"))
      .withColumn("dup", (row_number().over(wOrd) > 1).cast("long"))
      .withColumn("n_copies", count(lit(1)).over(wAll))
      .select(col("id"), col("chunk_id"), col("dup"), col("n_copies"))
  }

  def deduplicated(df: DataFrame, idCol: String, textCol: String, n: Int,
      num: Int, den: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val clusters = dupClusters(df, idCol, textCol, n, num, den, maxDocFreq)
    df.join(
      clusters.filter(col(idCol) === col("cluster")).select(idCol),
      Seq(idCol), "left_semi")
  }

  /** Keep-BEST dedup: one document per near-dup cluster, the keeper
    * chosen by an integer quality column (argmax; ties → min id)
    * instead of [[deduplicated]]'s blind min-id representative — real
    * pipelines keep the longest / highest-quality copy, not whichever
    * crawled first. One max-struct aggregate at cluster grain (the
    * derandomized-race idiom: no per-cluster sort, map-side combined),
    * then a keeper semi-join. Same scale shape as [[deduplicated]].
    * (The min-struct negates the QUALITY — already contract-cast to
    * long, so any orderable id type works, unlike an id negation;
    * quality must exceed Long.MinValue, trivially true for scores.)
    */
  def deduplicatedKeepBest(df: DataFrame, idCol: String, textCol: String,
      qualityCol: String, n: Int, num: Int, den: Int,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val clusters = dupClusters(df, idCol, textCol, n, num, den, maxDocFreq)
    val keepers = clusters
      .join(df.select(col(idCol), col(qualityCol).cast("long").as("__q")),
        Seq(idCol))
      .groupBy(col("cluster"))
      .agg(min(struct((-col("__q")).as("nq"), col(idCol).as("kid"))).as("__w"))
      .select(col("__w.kid").as(idCol))
    df.join(keepers, Seq(idCol), "left_semi")
  }

  /** Corpus snapshot DELTA census — the crawl-to-crawl diff a recurring
    * ingestion run reports before reprocessing: fingerprint both corpus
    * versions at the exact-dedup grain ([[TextAnalysis.fingerprint]])
    * and full-outer join the two distinct-fingerprint censuses. Status
    * per fingerprint: 'added' (only in next), 'removed' (only in base),
    * 'retained' (both, with copy counts on each side — a count change
    * at 'retained' is re-crawled duplication, not new content). Two
    * hash aggregates + one fp-keyed join, each side one pass; at 100 TB
    * the join carries one row per DISTINCT document, not per document.
    */
  def corpusDelta(base: DataFrame, next: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def census(df: DataFrame) = df
      .select(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp")).agg(count(lit(1)).as("n"))
    census(base).withColumnRenamed("n", "n_base")
      .join(census(next).withColumnRenamed("n", "n_next"), Seq("fp"), "full_outer")
      .select(col("fp"),
        when(col("n_base").isNull, lit("added"))
          .when(col("n_next").isNull, lit("removed"))
          .otherwise(lit("retained")).as("status"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_next"), lit(0L)).as("n_next"))
  }

  /** The corpus-cleanse FUNNEL — the composite every pipeline actually
    * runs, as one reportable table: exact keep-one → near-dup cluster
    * reps ([[deduplicated]]) → token-count floor → decontamination
    * ([[TextAnalysis.decontaminate]] against `evalDocs`), with per-stage
    * (n_in, n_out, n_removed). All four stage frames are lazily
    * checkpointed, so each shared subplan computes once even though
    * every stage feeds both its own count and the next stage — the
    * funnel is ONE job over a union of four tiny aggregates, not four
    * recomputations. Returns (stage, stage_name, n_in, n_out, n_removed)
    * ordered by stage.
    */
  def cleanseFunnel(docs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int = 3, num: Int = 4, den: Int = 5,
      minTokens: Int = 15, evalGramN: Int = 5,
      maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val s0 = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .localCheckpoint(eager = false)
    val s1 = s0.withColumn("_k", min(col("id")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(TextAnalysis.normalized(col("text")))))
      .filter(col("id") === col("_k")).select(col("id"), col("text"))
      .localCheckpoint(eager = false)
    val s2 = deduplicated(s1, "id", "text", n, num, den, maxDocFreq)
      .localCheckpoint(eager = false)
    val s3 = s2.filter(size(TextAnalysis.tokens(col("text"))) >= minTokens)
      .localCheckpoint(eager = false)
    // normalize the eval side to the same canonical column names as docs:
    // decontaminate addresses BOTH frames via textCol, which here is the
    // literal "text" — a caller whose textCol differs would otherwise get
    // an AnalysisException on the eval frame (id is optional there)
    val evalNorm =
      if (evalDocs.columns.contains(idCol))
        evalDocs.select(col(idCol).as("id"), col(textCol).as("text"))
      else evalDocs.select(col(textCol).as("text"))
    val contaminated = TextAnalysis
      .decontaminate(s3, evalNorm, "id", "text", evalGramN).select(col("id"))
    val s4 = s3.join(contaminated, Seq("id"), "left_anti")
      .localCheckpoint(eager = false)
    Seq(("1_exact", s0, s1), ("2_neardup", s1, s2),
        ("3_quality", s2, s3), ("4_decontaminate", s3, s4))
      .zipWithIndex.map { case ((name, in, out), i) =>
        in.agg(count(lit(1)).as("n_in"))
          .crossJoin(out.agg(count(lit(1)).as("n_out")))
          .select(lit((i + 1).toLong).as("stage"), lit(name).as("stage_name"),
            col("n_in"), col("n_out"),
            (col("n_in") - col("n_out")).as("n_removed"))
      }.reduce(_.unionByName(_))
  }

  /** Distinct fingerprint table of a corpus — the tiny persisted artifact
    * (≈32 bytes/distinct doc) that incremental dedup joins against, so
    * the corpus itself is NEVER rescanned on later ingests.
    */
  def snapshotFingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(TextAnalysis.fingerprint(col(textCol)).as("fp")).distinct()

  /** Incremental exact dedup of a NEW batch against a persisted corpus
    * snapshot: keep the batch rows whose text is unseen BOTH in the
    * snapshot (anti-join on the fingerprint) and within the batch
    * (first-seen = min id, a rank-1 window so WindowGroupLimit prunes
    * map-side — no second scan of the anti-join subtree). This is the
    * realistic 100 TB dedup mode — each crawl increment joins the
    * fingerprint artifact, hash-partitioned on fp on both sides, instead
    * of re-deduping the whole corpus; advance the snapshot by unioning
    * the survivors' fingerprints back in.
    */
  def dedupAgainstSnapshot(newDocs: DataFrame, idCol: String, textCol: String,
      snapshot: DataFrame): DataFrame =
    newDocs
      .withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .join(snapshot.select(col(snapshot.columns.head).as("_fp")), Seq("_fp"), "left_anti")
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("_fp")).orderBy(col(idCol))))
      .filter(col("_rn") === 1)
      .drop("_fp", "_rn")

  /** Documents exploded into trimmed, position-tagged paragraphs:
    * (id, pos, para), split on `delimRegex`, empty fragments dropped.
    */
  def paragraphs(df: DataFrame, idCol: String, textCol: String,
      delimRegex: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), delimRegex)).as(Seq("pos", "para")))
      .withColumn("para", trim(col("para")))
      .filter(col("para") =!= "")

  /** Corpus-wide paragraph-level exact dedup (the repeated-paragraph
    * removal pass of C4/RefinedWeb-style pipelines): every distinct
    * paragraph survives only at its FIRST occurrence — argmin (id, pos)
    * across the whole corpus — and each document is reassembled from its
    * surviving paragraphs in original order, joined with `joinWith`.
    * Documents left with no surviving paragraphs drop out.
    *
    * Two shuffles at any scale, ONE scan: winner selection is a
    * rank-1-per-paragraph window (row_number ≡ argmin (id, pos)), so the
    * exploded paragraphs are consumed once — no self-join, no duplicated
    * explode subtree — and WindowGroupLimit prunes each map partition to
    * one candidate per paragraph before the shuffle, which also defuses
    * the hot-boilerplate-paragraph skew case. Reassembly is the second
    * shuffle (by doc id).
    */
  def dedupParagraphs(df: DataFrame, idCol: String, textCol: String,
      delimRegex: String, joinWith: String = "\n"): DataFrame =
    paragraphs(df, idCol, textCol, delimRegex)
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("para")).orderBy(col("id"), col("pos"))))
      .filter(col("_rn") === 1)
      .groupBy(col("id"))
      .agg(concat_ws(joinWith,
        expr("transform(sort_array(collect_list(struct(pos, para))), s -> s.para)"))
        .as("text_dedup"))

  /** Per-source boilerplate removal (the CCNet/RefinedWeb "strip lines
    * repeated across many documents of a site" pass): a paragraph is
    * boilerplate WITHIN its source when it appears in ≥ `minDocs`
    * DISTINCT documents of that source, and every occurrence strips —
    * unlike [[dedupParagraphs]] (keep FIRST occurrence corpus-wide),
    * boilerplate keeps NONE, and the doc-frequency is per-source, so a
    * navigation footer on site A never affects site B. Documents
    * reassemble from surviving paragraphs in original order; docs left
    * empty drop (the dedupParagraphs convention). Cost: one paragraph
    * explode feeding BOTH the (source, para) distinct-doc aggregate and
    * the strip anti-join — boilerplate tables are (distinct
    * paragraphs)-sized and the anti-join keys on (source, para), so
    * nothing is ever all-pairs. Returns (id, src, text_clean).
    */
  /** The ONE boilerplate rule both the batch strip and the standing
    * artifact derive from: (src, para) pairs whose paragraph appears in
    * ≥ `minDocs` DISTINCT documents of that source. `paras` must be the
    * exploded (id, src, pos, para) frame (trimmed, empties dropped).
    */
  private def boilerplateTable(paras: DataFrame, minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs $minDocs must be >= 2 (1 strips everything)")
    paras.groupBy(col("src"), col("para"))
      .agg(countDistinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("src"), col("para"))
  }

  /** Documents exploded into the (id, src, pos, para) frame the
    * boilerplate family shares (trimmed, empty fragments dropped).
    */
  private def sourceParagraphs(df: DataFrame, idCol: String,
      sourceCol: String, textCol: String, delimRegex: String): DataFrame =
    df.select(col(idCol).as("id"), col(sourceCol).as("src"),
        posexplode(split(col(textCol), delimRegex)).as(Seq("pos", "para")))
      .withColumn("para", trim(col("para")))
      .filter(col("para") =!= "")

  def stripBoilerplate(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, delimRegex: String, minDocs: Long,
      joinWith: String = "\n"): DataFrame = {
    val p = sourceParagraphs(df, idCol, sourceCol, textCol, delimRegex)
      .localCheckpoint(eager = false) // feeds the df aggregate + the strip
    val bp = boilerplateTable(p, minDocs)
      .select(col("src").as("__bsrc"), col("para").as("__bpara"))
    // null-safe source match: a NULL source is a source like any other
    // (the exactGroupPrefixSums convention) — a plain equi-anti-join
    // would keep NULL-source boilerplate forever
    p.join(bp,
        col("src") <=> col("__bsrc") && col("para") === col("__bpara"),
        "left_anti")
      .groupBy(col("id"), col("src"))
      .agg(concat_ws(joinWith,
        expr("transform(sort_array(collect_list(struct(pos, para))), s -> s.para)"))
        .as("text_clean"))
  }

  /** The standing boilerplate artifact for the STREAMING strip gate:
    * one row per source with its boilerplate paragraphs collected
    * sorted (≤ distinct-boilerplate-sized — broadcastable by the same
    * premise as every threshold artifact). The batch [[stripBoilerplate]]
    * df rule is the ONE definition; this just pivots it per source.
    */
  def boilerplateArtifact(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, delimRegex: String, minDocs: Long): DataFrame =
    boilerplateTable(
      sourceParagraphs(df, idCol, sourceCol, textCol, delimRegex), minDocs)
      .groupBy(col("src"))
      .agg(sort_array(collect_list(col("para"))).as("bp"))

  /** The MAINTAINABLE form of the boilerplate rule: the UNthresholded
    * (src, para, nd) doc-frequency table. Under new-document batches it
    * folds by ADDITION (doc ids are disjoint across batches — the
    * document-feed contract — so per-batch distinct-doc counts sum
    * exactly), and thresholding to the strip table is a READOUT policy
    * ([[boilerplateArtifactFromDf]]) — folds compose under any future
    * minDocs.
    */
  def boilerplateDfTable(df: DataFrame, idCol: String, sourceCol: String,
      textCol: String, delimRegex: String): DataFrame =
    sourceParagraphs(df, idCol, sourceCol, textCol, delimRegex)
      .groupBy(col("src"), col("para"))
      .agg(countDistinct(col("id")).as("nd"))

  /** Fold a delta batch's df table into the standing one WITHOUT
    * shuffling the standing side (the p224 artifact-fold shape):
    * untouched (src, para) rows stream through a broadcast anti-join —
    * no delta row changes their count — and only the touched keys
    * re-sum over (their standing row ∪ the delta rows). Row-identical
    * to `boilerplateDfTable(standing docs ∪ delta docs)` when doc ids
    * are disjoint; bounded-Δ contract enforced loudly.
    */
  def foldBoilerplateDf(standing: DataFrame, delta: DataFrame,
      maxDeltaRows: Long = 50000000L): DataFrame = {
    val d = delta.select(col("src"), col("para"), col("nd"))
      .localCheckpoint() // counted, then keys + merge
    val nDelta = d.count()
    require(nDelta <= maxDeltaRows,
      s"foldBoilerplateDf: |delta| = $nDelta rows exceeds maxDeltaRows = " +
        s"$maxDeltaRows — fold in slices or rebuild the table in full")
    val dKeys = d.select(col("src").as("__dsrc"), col("para").as("__dpara"))
      .distinct()
    val matchKeys = col("src") <=> col("__dsrc") && col("para") === col("__dpara")
    val s = standing.select(col("src"), col("para"), col("nd"))
    val untouched = s.join(broadcast(dKeys), matchKeys, "left_anti")
    val touched = s.join(broadcast(dKeys), matchKeys, "left_semi")
      .unionByName(d)
      .groupBy(col("src"), col("para"))
      .agg(sum(col("nd")).cast("long").as("nd"))
    untouched.unionByName(touched)
  }

  /** Readout: threshold a (src, para, nd) df table into the per-source
    * strip artifact [[stripBoilerplateGate]] consumes.
    */
  def boilerplateArtifactFromDf(dfTable: DataFrame, minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs $minDocs must be >= 2 (1 strips everything)")
    dfTable.filter(col("nd") >= minDocs)
      .groupBy(col("src"))
      .agg(sort_array(collect_list(col("para"))).as("bp"))
  }

  /** Streaming twin of [[stripBoilerplate]]: arriving docs strip their
    * source's standing boilerplate STATELESSLY — a broadcast join to
    * the per-source [[boilerplateArtifact]] (null-safe: a NULL source
    * is a source like any other; sources with no boilerplate row keep
    * everything) plus one per-row array filter, so arrival order and
    * batch slicing cannot change any output row. Docs left empty drop
    * (the batch convention). Returns (id, src, text_clean) — identical
    * to the batch strip over the same corpus (p230 gates under p229's
    * oracle) UNDER the document-feed contract every ingest twin here
    * assumes: one input row per (id, source). A duplicated id is one
    * merged document to the batch GROUP BY but two rows to a stateless
    * gate — dedupe upstream if the feed can repeat ids. Per-row cost is
    * |paras| × |source's boilerplate| — the artifact is tiny by
    * construction, and the gate never shuffles.
    */
  def stripBoilerplateGate(docs: DataFrame, idCol: String,
      sourceCol: String, textCol: String, delimRegex: String,
      artifact: DataFrame, joinWith: String = "\n"): DataFrame =
    docs.select(col(idCol).as("id"), col(sourceCol).as("src"),
        split(col(textCol), delimRegex).as("paras"))
      .join(broadcast(artifact.select(col("src").as("__bsrc"), col("bp"))),
        col("src") <=> col("__bsrc"), "left")
      .select(col("id"), col("src"),
        concat_ws(joinWith, filter(
          transform(col("paras"), p => trim(p)),
          p => p =!= "" && !coalesce(
            array_contains(col("bp"), p), lit(false))))
          .as("text_clean"))
      .filter(col("text_clean") =!= "")

  /** Exact repeated-SPAN dedup (substring-level — the "deduplicating
    * training data makes LMs better" pass; Lee et al. 2022 operate on raw
    * byte suffixes, this is the token-window variant every Spark-shaped
    * pipeline ships): a window of `k` consecutive tokens occurring in at
    * least `minDocs` DISTINCT documents is removed from every document
    * except the lowest-id one (the kept "first copy" — deterministic,
    * order-free). Documents are reassembled from their surviving tokens
    * in original order (whitespace-tokenized and lowercased, so output
    * text is single-spaced lowercase — the standard lossy normalization
    * of token-level span dedup).
    *
    * Scale shape: one tokenize pass feeds positions AND spans; the span
    * stats (distinct-doc count + min doc) are ONE aggregate keyed by the
    * span (8-byte hash on the scale path); only REPEATED span occurrences
    * explode into covered positions (rare by construction), and removal
    * is a left-anti join on (doc, pos) — never a self-join, never
    * all-pairs. Intra-doc repetition (nd=1) is deliberately untouched:
    * that is repetitionSignals' domain.
    *
    * @param hashSpans 8-byte xxhash64 span keys (the 100 TB shuffle-key
    *   path); keep off when comparing against a string-keyed external
    *   oracle. Spec asserts both paths produce identical output.
    */
  /** Shared token/position/window lineage of the span-dedup family
    * ([[removeRepeatedSpans]], [[maximalRepeatedSpans]],
    * [[removeRepeatedSpansMaximal]]): ONE tokenize pass feeds the
    * position explode AND the span explode; toks and spans each feed two
    * branches, so both lazy-checkpoint (the subtree-duplication trap
    * jaccardPairs documents). `pos` is cheap re-derivation over the
    * checkpointed toks, so consumers may use it more than once without
    * materializing the token-grain frame. Span `start` is the 0-based
    * token position of the window's first token; `sp` the window key
    * (string, or 8-byte xxhash64 on the 100 TB shuffle path).
    */
  private def spanLineage(df: DataFrame, idCol: String, textCol: String,
      k: Int, hashSpans: Boolean): (DataFrame, DataFrame) = {
    val toks = df.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("_toks"))
      .localCheckpoint(eager = false)
    val pos = toks.select(col("id"),
      posexplode(col("_toks")).as(Seq("pos", "tok")))
    val spanStr = toks.filter(size(col("_toks")) >= k)
      .select(col("id"), posexplode(expr(
        s"transform(sequence(1, size(_toks) - ${k - 1}), i -> concat_ws(' ', slice(_toks, i, $k)))"
      )).as(Seq("start", "sp")))
    val spans = (if (hashSpans) spanStr.withColumn("sp", xxhash64(col("sp"))) else spanStr)
      .localCheckpoint(eager = false)
    (pos, spans)
  }

  /** Positions covered by ≥ `minDocs`-duplicated k-windows — every
    * occurrence, keeper docs included (the coverage the maximal-span
    * ops merge into islands).
    */
  private def dupCoverage(spans: DataFrame, k: Int, minDocs: Int): DataFrame = {
    val repeated = spans.groupBy("sp")
      .agg(count_distinct(col("id")).as("nd"))
      .filter(col("nd") >= minDocs)
    spans.join(repeated.select("sp"), Seq("sp"))
      .select(col("id"),
        explode(sequence(col("start"), col("start") + lit(k - 1))).as("pos"))
      .distinct()
  }

  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int, minDocs: Int = 2, hashSpans: Boolean = true): DataFrame = {
    require(k >= 1 && minDocs >= 2, "k >= 1; minDocs >= 2")
    val (pos, spans) = spanLineage(df, idCol, textCol, k, hashSpans)
    // one aggregate per span: how many distinct docs carry it + who keeps it
    val repeated = spans.groupBy("sp")
      .agg(count_distinct(col("id")).as("nd"), min(col("id")).as("mind"))
      .filter(col("nd") >= minDocs)
    // positions to remove: occurrences of repeated spans OUTSIDE the
    // keeper doc, exploded to their k covered token positions
    val remove = spans.join(repeated.select("sp", "mind"), Seq("sp"))
      .filter(col("id") =!= col("mind"))
      .select(col("id"),
        explode(sequence(col("start"), col("start") + lit(k - 1))).as("pos"))
      .distinct()
    val cleaned = pos.join(remove, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(concat_ws(" ",
        expr("transform(sort_array(collect_list(struct(pos, tok))), s -> s.tok)"))
        .as("clean_text"))
    // fully-removed (or token-less) docs survive as empty strings
    df.select(col(idCol).as("id"))
      .join(cleaned, Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** MAXIMAL repeated spans — the Lee et al. 2022 reporting grain
    * ("Deduplicating Training Data Makes Language Models Better" removes
    * maximal duplicated substrings ≥ minTokens, not fixed windows):
    * positions covered by ≥ `minDocs`-duplicated `minTokens`-windows,
    * merged per document into maximal contiguous islands by a
    * gaps-and-islands pass (covered window starts are consecutive inside
    * a duplicated region, so pos − row_number is constant per island).
    * Returns (idCol, span_start, span_end, n_tokens), one row per
    * maximal duplicated region per document — the duplication-surface
    * report [[removeRepeatedSpansMaximal]] cuts by.
    *
    * Scale shape: the only window is per-DOCUMENT (bounded by document
    * length — millions of tiny groups, never a corpus funnel); coverage
    * is the p39 lineage's aggregate + join, never a self-join.
    */
  def maximalRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int, minDocs: Int = 2, hashSpans: Boolean = true): DataFrame = {
    require(minTokens >= 1 && minDocs >= 2, "minTokens >= 1; minDocs >= 2")
    val (_, spans) = spanLineage(df, idCol, textCol, minTokens, hashSpans)
    coverageIslands(dupCoverage(spans, minTokens, minDocs))
      .withColumnRenamed("id", idCol)
  }

  /** Merge covered (id, pos) rows into maximal contiguous islands per
    * document — the ONE gaps-and-islands definition (pos − row_number
    * per doc) [[maximalRepeatedSpans]] and the registry probe share, so
    * the incremental path can never diverge from the batch report.
    * Returns (id, span_start, span_end, n_tokens).
    */
  private def coverageIslands(covered: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    covered
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("id"), col("__grp"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        max(col("pos")).cast("long").as("span_end"),
        count(lit(1)).as("n_tokens"))
      .select(col("id"), col("span_start"), col("span_end"), col("n_tokens"))
  }

  /** Persist the standing state of incremental maximal-span reporting —
    * the [[saveMinhashSnapshot]] move at span grain:
    *   windows_by_sp/ (sp, id, start) — window occurrences laid out by
    *     window key: an ingest batch reads ONLY the rows of windows its
    *     delta pushed over the threshold (row-group pruning + runtime
    *     filters on sp);
    *   windows_by_id/ (sp, id, start) — the same rows laid out by doc,
    *     for rebuilding the touched documents' coverage without
    *     re-tokenizing corpus text;
    *   dfs/     (sp, nd) — per-window distinct-doc counts, the fold's
    *     additive half (doc ids are disjoint across batches, so
    *     nd_total = nd_standing + nd_delta);
    *   islands/ (id, span_start, span_end, n_tokens) — the standing
    *     report, carried verbatim for every untouched document;
    *   ids/     (id) — the standing doc ids, for the loud disjointness
    *     probe (a re-ingested id would double-count every window df).
    * Sketch parameters (minTokens, hashSpans) must match the probe's.
    */
  def saveSpanRegistry(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int, minDocs: Int, path: String,
      hashSpans: Boolean = true): Unit = {
    require(minTokens >= 1 && minDocs >= 2, "minTokens >= 1; minDocs >= 2")
    val (_, spans0) = spanLineage(df, idCol, textCol, minTokens, hashSpans)
    val spans = spans0.select(col("sp"), col("id"), col("start"))
      .localCheckpoint(eager = false) // four artifacts, one window pass
    spans.repartitionByRange(col("sp")).sortWithinPartitions("sp")
      .write.mode("overwrite").parquet(s"$path/windows_by_sp")
    spans.repartitionByRange(col("id")).sortWithinPartitions("id")
      .write.mode("overwrite").parquet(s"$path/windows_by_id")
    spans.groupBy(col("sp")).agg(count_distinct(col("id")).as("nd"))
      .write.mode("overwrite").parquet(s"$path/dfs")
    coverageIslands(dupCoverage(spans, minTokens, minDocs))
      .write.mode("overwrite").parquet(s"$path/islands")
    df.select(col(idCol).as("id")).distinct()
      .write.mode("overwrite").parquet(s"$path/ids")
  }

  /** Incremental maximal-span report: the [[maximalRepeatedSpans]] of
    * corpus ∪ shard, computed from a [[saveSpanRegistry]] artifact and
    * the new shard ONLY — the corpus text is never re-read. The fold
    * law at span grain:
    *
    *  - window doc-frequencies are ADDITIVE over disjoint doc ids, so
    *    the shard's per-window counts fold onto dfs/ by one join;
    *  - coverage never shrinks on append, and a standing document's
    *    coverage changes ONLY where a window it carries CROSSED the
    *    minDocs threshold because of the shard — so exactly the docs
    *    holding a crossing window re-derive their islands (from
    *    windows_by_id/, a pruned keyed read), every other standing doc
    *    keeps its islands/ row verbatim, and shard docs derive fresh
    *    against the folded counts.
    *
    * `maxTouchedDocs` bounds the re-derive set loudly (the kCoreDelta
    * move): a shard that re-opens more standing docs than the bound —
    * a boilerplate flood crossing thousands of windows at once — fails
    * with instructions to rebuild, never silently explodes the probe.
    * Returns (idCol, span_start, span_end, n_tokens), row-identical to
    * the full-corpus recompute.
    */
  def spanIslandsAgainstRegistry(newDf: DataFrame, idCol: String,
      textCol: String, path: String, minTokens: Int, minDocs: Int,
      hashSpans: Boolean = true, maxTouchedDocs: Long = 100000L): DataFrame = {
    require(minTokens >= 1 && minDocs >= 2, "minTokens >= 1; minDocs >= 2")
    val spark = newDf.sparkSession
    val (_, newSpans0) = spanLineage(newDf, idCol, textCol, minTokens, hashSpans)
    val newSpans = newSpans0.localCheckpoint(eager = false) // dfs + coverage
    require(spark.read.parquet(s"$path/ids")
        .join(newDf.select(col(idCol).as("id")).distinct(), Seq("id"), "left_semi")
        .isEmpty,
      "spanIslandsAgainstRegistry: shard doc ids collide with the standing " +
        "registry — dedupe the batch or rebuild the registry")
    val newDfs = newSpans.groupBy(col("sp"))
      .agg(count_distinct(col("id")).as("nd_new"))
      .localCheckpoint(eager = false) // shard coverage + crossing probe
    val stdDfs = spark.read.parquet(s"$path/dfs")
    // folded counts for every window the shard touches (standing windows
    // the shard never mentions keep their coverage status unchanged)
    val folded = newDfs
      .join(stdDfs.withColumnRenamed("nd", "nd_std"), Seq("sp"), "left")
      .select(col("sp"), coalesce(col("nd_std"), lit(0L)).as("nd_std"),
        (col("nd_new") + coalesce(col("nd_std"), lit(0L))).as("nd_tot"))
      .localCheckpoint(eager = false) // shard coverage + crossing windows
    // shard docs: covered where the FOLDED count clears the threshold
    val newCovered = newSpans
      .join(folded.filter(col("nd_tot") >= minDocs).select("sp"), Seq("sp"))
      .select(col("id"),
        explode(sequence(col("start"), col("start") + lit(minTokens - 1))).as("pos"))
      .distinct()
    // windows the shard pushed over the threshold → the touched docs
    val crossing = folded
      .filter(col("nd_std") < minDocs && col("nd_tot") >= minDocs)
      .select(col("sp"))
    val touched = spark.read.parquet(s"$path/windows_by_sp")
      .join(crossing, Seq("sp"), "left_semi")
      .select(col("id")).distinct().localCheckpoint()
    val nTouched = touched.count()
    require(nTouched <= maxTouchedDocs,
      s"spanIslandsAgainstRegistry: shard re-opens $nTouched standing docs " +
        s"> maxTouchedDocs = $maxTouchedDocs — the re-derive set broadcasts; " +
        "rebuild the registry in full instead")
    // touched standing docs re-derive coverage from their own window
    // rows (keyed pruned read) against the folded counts; their windows
    // all exist in dfs/, so only the shard delta needs the left join
    val touchedCovered = spark.read.parquet(s"$path/windows_by_id")
      .join(broadcast(touched), Seq("id"), "left_semi")
      .join(stdDfs, Seq("sp"))
      .join(newDfs, Seq("sp"), "left")
      .filter(col("nd") + coalesce(col("nd_new"), lit(0L)) >= minDocs)
      .select(col("id"),
        explode(sequence(col("start"), col("start") + lit(minTokens - 1))).as("pos"))
      .distinct()
    spark.read.parquet(s"$path/islands")
      .join(broadcast(touched), Seq("id"), "left_anti")
      .unionByName(coverageIslands(newCovered.unionByName(touchedCovered)))
      .withColumnRenamed("id", idCol)
  }

  /** Maximal-span dedup — [[removeRepeatedSpans]] lifted to the
    * [[maximalRepeatedSpans]] grain: island occurrences are grouped by
    * their exact CONTENT (the covered token sequence) and every
    * occurrence except the lexicographically first (min (doc, start))
    * is removed WHOLE. Two guarantees window-grain removal cannot give:
    *
    *  - island-atomic cuts: a document never keeps a mid-span FRAGMENT.
    *    Window-grain keeps each window in that window's own min-id doc,
    *    so when doc 1 shares only a long span's PREFIX while docs 2 and
    *    3 share the whole span, doc 2 keeps a fluency-destroying
    *    mid-span suffix and no document keeps the full span;
    *  - one full copy always survives: the keeper of every island
    *    content is untouched, so no duplicated region's text can be
    *    split across documents or lost entirely.
    *
    * The price, stated honestly: removal is exact at island grain — an
    * occurrence is removed only when an IDENTICAL island occurs
    * elsewhere, so nested/extended variants (doc A carrying S1·S2
    * adjacent where B carries S1 and C carries S2) are distinct
    * contents and each keeps one copy — strictly conservative,
    * never removing the last copy of anything. Output is
    * (idCol, clean_text), reassembled like [[removeRepeatedSpans]]
    * (single-spaced lowercase; emptied docs survive as "").
    *
    * Scale shape: per-document windows only; the island content key is
    * an 8-byte hash on the scale path (`hashSpans`) so the
    * occurrence-group shuffle never carries span text; removal is a
    * left-anti join at (doc, pos) grain.
    */
  def removeRepeatedSpansMaximal(df: DataFrame, idCol: String,
      textCol: String, minTokens: Int, minDocs: Int = 2,
      hashSpans: Boolean = true): DataFrame = {
    require(minTokens >= 1 && minDocs >= 2, "minTokens >= 1; minDocs >= 2")
    val (pos, spans) = spanLineage(df, idCol, textCol, minTokens, hashSpans)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    // island occurrences with their content (the covered token sequence)
    val occ = dupCoverage(spans, minTokens, minDocs)
      .join(pos, Seq("id", "pos"))
      .withColumn("__grp", col("pos") - row_number().over(w))
      .groupBy(col("id"), col("__grp"))
      .agg(min(col("pos")).as("s"), max(col("pos")).as("e"),
        concat_ws(" ",
          expr("transform(sort_array(collect_list(struct(pos, tok))), x -> x.tok)"))
          .as("content"))
    val keyed = (if (hashSpans) occ.withColumn("content", xxhash64(col("content")))
      else occ).localCheckpoint(eager = false) // keeper pass + removal join
    val keeper = keyed.groupBy(col("content"))
      .agg(min(struct(col("id"), col("s"))).as("kp"))
    val removePos = keyed.join(keeper, Seq("content"))
      .filter(!(col("id") === col("kp.id") && col("s") === col("kp.s")))
      .select(col("id"), explode(sequence(col("s"), col("e"))).as("pos"))
    val cleaned = pos.join(removePos, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(concat_ws(" ",
        expr("transform(sort_array(collect_list(struct(pos, tok))), s -> s.tok)"))
        .as("clean_text"))
    df.select(col(idCol).as("id"))
      .join(cleaned, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** 64-bit token hash from the first 16 hex chars of md5, decoded
    * big-endian — reproducible in any SQL engine with an md5 function
    * (the DuckDB oracle twin), unlike xxhash64. Slower than xxhash64;
    * use it when cross-engine verifiability matters more than speed.
    */
  def md5Hash64(c: Column): Column =
    graft.functions.GraftFunctions.beLong(unhex(substring(md5(c), 1, 16)))

  /** 64-bit SimHash of the token multiset: per-bit sign sums of token
    * hashes. 64 partial-aggregated sums — a single shuffle.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    val tok = df.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", tokenHash(col("tok")))
    val sums = tok.groupBy("id").agg(
      sum(when(col("h").bitwiseAND(lit(1L)) =!= 0, 1).otherwise(-1)).as("b0"),
      (1 until 64).map(j =>
        sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"b$j")): _*)
    sums.select(col("id"),
      (0 until 64).map(j => when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** SimHash near-dup pairs: bucket by 16-bit bands (any matching band →
    * candidate), then keep pairs within `maxHamming` (bit_count of xor).
    */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, tokenHash: Column => Column = xxhash64(_)): DataFrame =
    hammingPairs(simhash(df, idCol, textCol, tokenHash), "id", "simhash", maxHamming)

  /** Perceptual-hash CLUSTERS with the identical-hash masses collapsed
    * FIRST — the scale fix [[hammingPairs]] alone does not have: a
    * corpus full of blank pages / black frames produces thousands of
    * ids with the SAME sketch, and pairing them directly is C(N,2)
    * rows in one band bucket. Here each distinct hash elects its min-id
    * representative, ONLY representatives pair (candidate count bounded
    * by DISTINCT hashes, not ids), rep pairs chain through
    * [[connectedComponents]], and every id inherits its hash's rep
    * cluster. With `maxHamming` ≤ 3 recall is certain (pigeonhole on
    * the 4 bands), so the output is exactly "ids whose sketches chain
    * within maxHamming" — SQL-expressible and oracle-gated (p58).
    */
  def hammingClusters(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int): DataFrame = {
    val h = hashes.select(col(idCol).as("id"), col(hashCol).cast("long").as("h"))
      .localCheckpoint(eager = false) // shared by reps + final label join
    val reps = h.groupBy(col("h")).agg(min(col("id")).as("rep"))
      .localCheckpoint(eager = false)
    val pairs = hammingPairs(reps.select(col("rep").as("id"), col("h")),
      "id", "h", maxHamming).select(col("ia"), col("ib"))
    val cc = connectedComponents(pairs)
    h.join(reps, Seq("h"))
      .join(cc.withColumnRenamed("id", "rep"), Seq("rep"), "left")
      .select(col("id"), coalesce(col("comp"), col("rep")).as("cluster"))
  }

  /** Banded hamming-distance pairs over ANY 64-bit sketch column (text
    * SimHash, image dHash, …): 16-bit bands recall (maxHamming ≤ 3 is
    * certain by pigeonhole — 4 bands, ≤3 flipped bits leave one band
    * intact; beyond 3 recall is the banding heuristic), exact bit_count
    * verification of candidates only. Never all-pairs.
    */
  /** The 4×16-bit band expansion of a 64-bit sketch table — (id, h,
    * band, bh), 4 rows per id. ONE definition for the batch pair join
    * and the persisted band store.
    */
  private def bandExpand(hashes: DataFrame, idCol: String,
      hashCol: String): DataFrame =
    hashes.select(col(idCol).as("id"), col(hashCol).cast("long").as("h"))
      .select(col("id"), col("h"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band"),
            col("h").bitwiseAND(lit(0xFFFFL << (16 * b))).as("bh"))): _*)).as("bd"))
      .select(col("id"), col("h"), col("bd.band").as("band"), col("bd.bh").as("bh"))

  def hammingPairs(hashes: DataFrame, idCol: String, hashCol: String,
      maxHamming: Int): DataFrame = {
    val banded = bandExpand(hashes, idCol, hashCol)
    banded.select(col("id").as("ia"), col("h").as("sa"), col("band"), col("bh"))
      .join(banded.select(col("id").as("ib"), col("h").as("sb"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("ia") < col("ib"))
      .select(col("ia"), col("ib"),
        bit_count(col("sa").bitwiseXOR(col("sb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Persist the simhash CORPUS artifact for incremental near-dup
    * ingest — the dedup-maintenance trio's third member (next to
    * [[saveMinhashSnapshot]] and [[saveShinglePostings]]): the 4-band
    * sketch expansion (band, bh, id, simhash) range-laid by (band, bh)
    * so a probe batch's bucket join prunes to its own buckets' row
    * groups, plus the raw (id, text) store the exact confirm re-reads
    * at PAIR grain only. Corpus text is never re-sketched at probe
    * time.
    */
  def saveSimhashCorpus(df: DataFrame, idCol: String, textCol: String,
      path: String, tokenHash: Column => Column = xxhash64(_)): Unit = {
    bandExpand(simhash(df, idCol, textCol, tokenHash), "id", "simhash")
      .select(col("band"), col("bh"), col("id"), col("h").as("simhash"))
      .repartitionByRange(col("band"), col("bh"))
      .sortWithinPartitions("band", "bh")
      .write.mode("overwrite").parquet(s"$path/bands")
    df.select(col(idCol).as("id"), col(textCol).as("text"))
      .write.mode("overwrite").parquet(s"$path/texts")
  }

  /** Incremental near-dup ingest with EXACT confirm — nominate by
    * sketch, confirm by edit distance, against a persisted
    * [[saveSimhashCorpus]] artifact: the batch sketches itself
    * (batch-sized work), bucket-joins the band store (matching buckets
    * only), hamming-filters candidates, then runs the banded
    * Levenshtein against the corpus TEXT store at pair grain — the
    * [[editVerifiedPairs]] report shape with ia = corpus id, ib =
    * batch id, edit_dist −1 = refuted. With disjoint batch/corpus ids
    * the probe's pairs ≡ the full-corpus nominate+confirm restricted
    * to pairs crossing the split (spec + oracle-gated, p279).
    */
  def editVerifyAgainstSnapshot(batch: DataFrame, idCol: String,
      textCol: String, path: String, maxHamming: Int, maxDist: Int,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val spark = batch.sparkSession
    val bsk = bandExpand(simhash(batch, idCol, textCol, tokenHash),
      "id", "simhash")
    val cand = spark.read.parquet(s"$path/bands")
      .join(bsk.select(col("band"), col("bh"), col("id").as("ib"),
        col("h").as("sb")), Seq("band", "bh"))
      .filter(col("id") =!= col("ib")) // identity guard if ids overlap
      .select(col("id").as("ia"), col("ib"),
        bit_count(col("simhash").bitwiseXOR(col("sb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
    cand
      .join(spark.read.parquet(s"$path/texts")
        .select(col("id").as("ia"), col("text").as("__ta")), Seq("ia"))
      .join(batch.select(col(idCol).as("ib"), col(textCol).as("__tb")),
        Seq("ib"))
      .select(col("ia"), col("ib"),
        levenshtein(col("__ta"), col("__tb"), maxDist).cast("long").as("edit_dist"))
  }

  /** Exact edit-distance VERIFICATION of candidate near-dup pairs — the
    * confirm stage every sketch-nominated dedup pipeline ends with:
    * sketches (minhash/simhash bands) NOMINATE cheaply with false
    * positives, Levenshtein CONFIRMS exactly. `pairs` carries (ia, ib);
    * each id joins back to its text through a keyed hash join, and the
    * distance runs BANDED at `maxDist` (O(len·maxDist), not O(len²):
    * the engine's thresholded levenshtein early-exits — a length
    * difference beyond maxDist alone refutes in O(1), since every edit
    * changes length by at most 1). Returns a verification REPORT
    * (ia, ib, edit_dist): the exact distance when ≤ maxDist, −1 when
    * refuted — refuted pairs stay visible (filtering them is the
    * caller's one-line readout), so "nothing confirmed" is
    * distinguishable from "nothing nominated".
    *
    * Scale shape: work is candidate-pair-bounded (the nominating
    * sketch's maxBucket/maxDocFreq guards bound it), never corpus
    * all-pairs; the text column rides exactly two hash joins at pair
    * grain.
    */
  def editVerifiedPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val texts = docs.select(col(idCol).as("__vid"), col(textCol).as("__vt"))
    pairs.select(col("ia"), col("ib"))
      .join(texts.select(col("__vid").as("ia"), col("__vt").as("__ta")), Seq("ia"))
      .join(texts.select(col("__vid").as("ib"), col("__vt").as("__tb")), Seq("ib"))
      .select(col("ia"), col("ib"),
        levenshtein(col("__ta"), col("__tb"), maxDist).cast("long").as("edit_dist"))
  }
}
