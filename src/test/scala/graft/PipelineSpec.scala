package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators: planted near-dups must be found by
  * every dedup family; ANN sanity; text features; multimodal stub.
  */
class PipelineSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
      (2L, "completely different content about spark catalyst optimizer rules engine"),
      (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
      (4L, "yet another unrelated document mentioning parquet bloom filters and scans"))
      .toDF("doc_id", "text")
  }

  test("exact dedup groups identical normalized texts") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 2L) // doc 0 representative covers docs {0,3}
    assert(out.values.sum == 5L)
  }

  test("ngram jaccard finds the planted near-dup pair and the exact dup") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text", n = 3, num = 4, den = 5)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 3L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("jaccard maxDocFreq stoplist drops ultra-frequent shingles from candidates") {
    // every doc shares the planted shingle; capping doc-freq at 2 removes it
    import spark.implicits._
    val d = Seq(
      (0L, "common shared phrase alpha beta gamma"),
      (1L, "common shared phrase delta epsilon zeta"),
      (2L, "common shared phrase eta theta iota")).toDF("doc_id", "text")
    val all = Dedup.jaccardPairs(d, "doc_id", "text", n = 3)
    val capped = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, maxDocFreq = Some(2))
    assert(all.count() == 3) // all pairs share "common shared phrase"
    assert(capped.count() == 0) // the only shared shingle has doc-freq 3
  }

  test("skew guard is ON by default: a boilerplate flood past DefaultMaxDocFreq nominates no pairs") {
    import spark.implicits._
    // DefaultMaxDocFreq + 100 docs all sharing ONE boilerplate trigram;
    // everything else unique. Unguarded, that single shingle nominates
    // C(600,2) = 179,700 pairs — the Σ C(df,2) blowup. The DEFAULT call
    // must bound it to zero; the brute-force-parity path opts out with
    // an explicit None and sees the flood.
    val nDocs = Dedup.DefaultMaxDocFreq + 100
    val d = spark.range(nDocs.toLong).selectExpr("id AS doc_id",
      "concat('shared boiler plate u', id, ' v', id) AS text")
    assert(Dedup.sharedShingleCandidates(d, "doc_id", "text", 3).count() == 0L)
    assert(Dedup.jaccardPairs(d, "doc_id", "text", n = 3).count() == 0L)
    val unguarded = Dedup.sharedShingleCandidates(d, "doc_id", "text", 3,
      maxDocFreq = None).count()
    assert(unguarded == nDocs.toLong * (nDocs - 1) / 2, s"$unguarded")
  }

  test("persisted corpus stoplist artifact cuts jaccard candidates like maxDocFreq") {
    import spark.implicits._
    val d = Seq(
      (0L, "common shared phrase alpha beta gamma"),
      (1L, "common shared phrase delta epsilon zeta"),
      (2L, "common shared phrase eta theta iota")).toDF("doc_id", "text")
    // the artifact: corpus top-1 trigram IS the planted connector
    val stop = Dedup.corpusStoplist(d, "doc_id", "text", n = 3, k = 1)
    assert(stop.head().getString(0) == "common shared phrase")
    val cut = Dedup.jaccardPairs(d, "doc_id", "text", n = 3, stoplist = Some(stop))
    assert(cut.count() == 0) // nothing else is shared
    // and it composes with the hashed-shingle scale path
    val cutHashed = Dedup.jaccardPairs(d, "doc_id", "text", n = 3,
      hashShingles = true, stoplist = Some(stop))
    assert(cutHashed.count() == 0)
  }

  test("incremental dedup vs snapshot: seen text dropped, batch keeps first-seen") {
    import spark.implicits._
    // snapshot corpus contains doc 0's text; batch re-delivers it (id 10),
    // carries an in-batch dup pair (11, 13), and one genuinely new doc 12
    val corpus = docs.filter($"doc_id" <= 1)
    val snap = Dedup.snapshotFingerprints(corpus, "doc_id", "text")
    assert(snap.count() == 2)
    val batch = Seq(
      (10L, "The  quick brown fox jumps over the lazy dog near the river bank today"),
      (11L, "brand new crawl content for the incremental pass"),
      (12L, "another brand new document arriving in this increment"),
      (13L, "brand  NEW crawl content for the incremental pass"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupAgainstSnapshot(batch, "doc_id", "text", snap)
    assert(out.columns.toSeq == Seq("doc_id", "text"), "full rows survive")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(11L, 12L))
    // advancing the snapshot with the survivors makes a re-run a no-op
    val snap2 = snap.unionByName(Dedup.snapshotFingerprints(out, "doc_id", "text"))
    assert(Dedup.dedupAgainstSnapshot(batch, "doc_id", "text", snap2).isEmpty)
  }

  test("leakage-safe split: a near-dup cluster never straddles splits") {
    val out = Dedup.leakageSafeSplit(docs, "doc_id", "text", n = 3, num = 4,
      den = 5, trainPermille = 800, valPermille = 100)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // docs 0/1/3 are one near-dup cluster: same cluster, same split
    assert(Set(0L, 1L, 3L).map(out(_)).size == 1)
    assert(out.values.map(_._2).forall(Set("train", "val", "test")))
    // the split is the hash of the CLUSTER representative, per-mille exact
    val expected = spark.range(1).select(
      (graft.pipeline.TextAnalysis.hash60(
        org.apache.spark.sql.functions.lit(out(0L)._1)) % 1000).as("h"))
      .head().getLong(0)
    val want = if (expected < 800) "train" else if (expected < 900) "val" else "test"
    assert(out(0L)._2 == want)
    // deterministic across runs and input order
    val again = Dedup.leakageSafeSplit(docs.orderBy(col("doc_id").desc),
      "doc_id", "text", n = 3, num = 4, den = 5, trainPermille = 800,
      valPermille = 100)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(again == out)
  }

  test("repeated-span dedup: first doc keeps the span, others lose exactly it") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon unique zero tail"),
      (1L, "intro words alpha beta gamma delta epsilon more stuff"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different text here now")).toDF("doc_id", "text")
    def run(hash: Boolean): Map[Long, String] =
      Dedup.removeRepeatedSpans(corpus, "doc_id", "text", k = 5, minDocs = 2,
        hashSpans = hash)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = run(hash = false)
    assert(out(0L) == "alpha beta gamma delta epsilon unique zero tail",
      "lowest-id doc keeps the first copy")
    assert(out(1L) == "intro words more stuff", s"got '${out(1L)}'")
    assert(out(2L) == "", "fully-covered doc empties but stays present")
    assert(out(3L) == "totally different text here now")
    // scale path (hashed 8-byte span keys) is output-identical
    assert(run(hash = true) == out)
    // intra-doc repetition alone (nd=1) is NOT removed
    val solo = Seq((7L, "x y z w v x y z w v")).toDF("doc_id", "text")
    val soloOut = Dedup.removeRepeatedSpans(solo, "doc_id", "text", k = 5)
      .head().getString(1)
    assert(soloOut == "x y z w v x y z w v")
  }

  test("maximal-span dedup: island-atomic cuts where window grain leaves fragments") {
    import spark.implicits._
    // the planted long-span fixture: doc 1 shares only the PREFIX of the
    // span docs 2 and 3 carry in full — per-window keepers split between
    // doc 1 (prefix windows) and doc 2 (suffix windows)
    val corpus = Seq(
      (1L, "a1 a2 a3 a4 a5"),
      (2L, "x2 a1 a2 a3 a4 a5 a6 a7 a8 y2"),
      (3L, "x3 a1 a2 a3 a4 a5 a6 a7 a8 y3")).toDF("doc_id", "text")
    // window grain: doc 2 keeps a mid-span FRAGMENT (a6 a7 a8) and no
    // document keeps the full span — the defect the maximal grain fixes
    val frag = Dedup.removeRepeatedSpans(corpus, "doc_id", "text",
      k = 3, minDocs = 2, hashSpans = false)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(frag(2L) == "x2 a6 a7 a8 y2", s"got '${frag(2L)}'")
    // maximal islands report: one merged region per doc, not windows
    val islands = Dedup.maximalRepeatedSpans(corpus, "doc_id", "text",
      minTokens = 3, minDocs = 2, hashSpans = false)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(islands == Map(1L -> ((0L, 4L, 5L)), 2L -> ((1L, 8L, 8L)),
      3L -> ((1L, 8L, 8L))), s"got $islands")
    def runMax(hash: Boolean): Map[Long, String] =
      Dedup.removeRepeatedSpansMaximal(corpus, "doc_id", "text",
        minTokens = 3, minDocs = 2, hashSpans = hash)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = runMax(hash = false)
    // island-atomic: doc 2 (the full span's keeper) stays INTACT, doc 3's
    // identical island is removed whole, doc 1 keeps its distinct prefix
    assert(out == Map(
      1L -> "a1 a2 a3 a4 a5",
      2L -> "x2 a1 a2 a3 a4 a5 a6 a7 a8 y2",
      3L -> "x3 y3"), s"got $out")
    // the hashed-content scale path is output-identical
    assert(runMax(hash = true) == out)
  }

  test("unigram-LM Viterbi EM step: best segmentation counts, char fallback, conservation") {
    import spark.implicits._
    val docs = Seq((0L, "abab abab ab"), (1L, "abab cd cd"), (2L, "qq xy"))
      .toDF("doc_id", "text")
    val words = TextAnalysis.unigramWords(docs, "text", maxWordLen = 12)
    val wm = words.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wm == Map("abab" -> 3L, "ab" -> 1L, "cd" -> 2L, "qq" -> 1L, "xy" -> 1L))
    val vocab = TextAnalysis.unigramSeedVocab(words, maxPieceLen = 2, minCount = 2)
    val vm = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sub-minCount multi-char pieces (qq, xy) drop; chars always survive
    assert(vm("ab") == 7L && vm("ba") == 3L && vm("cd") == 2L)
    assert(!vm.contains("qq") && !vm.contains("xy") && vm.contains("q") && vm.contains("x"))
    val counts = TextAnalysis.unigramViterbiCounts(
      words, TextAnalysis.unigramWeights(vocab), maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'abab' segments ab|ab (2 pieces of mass 7 beat 4 chars of mass 7),
    // 'cd' keeps its bigram, 'qq'/'xy' fall back to chars
    assert(counts("ab") == 7L && counts("cd") == 2L, s"got $counts")
    assert(counts("q") == 2L && counts("x") == 1L && counts("y") == 1L)
    assert(!counts.contains("ba") && !counts.contains("a"))
    // conservation: every char of every word occurrence covered exactly once
    val covered = counts.map { case (p, c) => p.length * c }.sum
    val chars = wm.map { case (w, f) => w.length * f }.sum
    assert(covered == chars, s"covered $covered != corpus chars $chars")
    // trained loop: unused pieces prune, char fallbacks persist at floor 1,
    // the winning subwords keep their expected counts (stable fixed point)
    val trained = TextAnalysis.unigramTrainLoop(words, 2, 2, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(trained("ab") == 7L && trained("cd") == 2L)
    assert(!trained.contains("ba") && trained("a") == 1L && trained("q") == 2L)
  }

  test("IVF index fold: append law, probe ≡ full index, loud collision and bound") {
    import spark.implicits._
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val base = Seq((1L, v(1, 0)), (2L, v(0.9, 0.1)), (3L, v(0, 1)),
      (4L, v(0.1, 0.9))).toDF("vec_id", "embedding")
    val delta = Seq((5L, v(0.95, 0.05)), (6L, v(0.05, 0.95)))
      .toDF("vec_id", "embedding")
    val codebook = Similarity.refinedCentroids(
      Similarity.kmeansStepExact(base, "vec_id", "embedding", 2)).localCheckpoint()
    val idx = Similarity.ivfIndexTable(base, "vec_id", "embedding", codebook, 2)
    val folded = Similarity.foldIvfIndex(idx,
      Similarity.ivfIndexTable(delta, "vec_id", "embedding", codebook, 2))
    val full = Similarity.ivfIndexTable(base.unionByName(delta),
      "vec_id", "embedding", codebook, 2)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.get(1).toString).toSet
    assert(cells(folded) == cells(full)) // fold ≡ full under the frozen codebook
    // probe the query's cell through both indexes — identical ranking,
    // and only the x-cluster's vectors are candidates
    val q0 = Seq((0L, v(0.98, 0.02))).toDF("vec_id", "embedding")
    val q = Similarity.assignExact(q0, "vec_id", "embedding", codebook, 2)
      .join(q0.select(col("vec_id").as("id"), col("embedding")), Seq("id"))
      .select(col("embedding").as("q"), col("cluster").as("qcell"))
      .localCheckpoint()
    def probe(ix: org.apache.spark.sql.DataFrame) =
      Similarity.ivfTopK(ix, "id", "embedding", "cell", q, 3)
        .collect().map(r => r.getAs[Long]("id")).toSeq
    val got = probe(folded)
    assert(got == probe(full))
    assert(got.toSet.subsetOf(Set(1L, 2L, 5L)), s"got $got")
    // colliding ids refuse loudly (an append fold must never double-count)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.foldIvfIndex(folded, idx).count()
    }
    assert(e1.getMessage.contains("collide"))
    // the delta bound refuses loudly
    val e2 = intercept[IllegalArgumentException] {
      Similarity.foldIvfIndex(idx, Similarity.ivfIndexTable(delta,
        "vec_id", "embedding", codebook, 2), maxDeltaRows = 1L)
    }
    assert(e2.getMessage.contains("maxDeltaRows"))
  }

  test("unigram-LM soft-EM: marginals equal brute-force posterior enumeration; conservation") {
    import spark.implicits._
    val docs = Seq((0L, "abab abab ab"), (1L, "abab cd cd"), (2L, "qq xy"))
      .toDF("doc_id", "text")
    val words = TextAnalysis.unigramWords(docs, "text", maxWordLen = 12)
    val vocab = TextAnalysis.unigramSeedVocab(words, maxPieceLen = 2, minCount = 2)
    val weights = TextAnalysis.unigramWeights(vocab)
    val got = TextAnalysis.unigramSoftCounts(words, weights, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // brute-force posterior enumeration over all segmentations
    val cnt = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = cnt.values.sum.toDouble
    val probs = cnt.map { case (p, c) => p -> c / tot }
    def segs(w: String): Seq[(Seq[String], Double)] =
      if (w.isEmpty) Seq((Nil, 1.0))
      else (1 to math.min(2, w.length)).flatMap { l =>
        val p = w.take(l)
        probs.get(p).toSeq.flatMap(pp =>
          segs(w.drop(l)).map { case (ps, m) => (p +: ps, pp * m) })
      }
    val freqs = words.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    freqs.foreach { case (w, f) =>
      val ss = segs(w)
      val z = ss.map(_._2).sum
      ss.foreach { case (ps, m) =>
        ps.foreach(p => want(p) += f * m / z) }
    }
    assert(got.keySet == want.keySet, s"pieces ${got.keySet} vs ${want.keySet}")
    got.foreach { case (p, v) =>
      assert(math.abs(v - want(p)) < 1e-9, s"$p: $v vs ${want(p)}") }
    // conservation: every char of every word occurrence covered once in
    // expectation — Σ e_soft · len(piece) = corpus chars
    val covered = got.map { case (p, v) => p.length * v }.sum
    val chars = freqs.map { case (w, f) => w.length * f }.sum
    assert(math.abs(covered - chars) < 1e-6, s"covered $covered vs $chars")
    // a word with a piece-less char contributes nothing (no NaN), and
    // the conservation deficit is exactly its chars
    val gotNoQ = TextAnalysis.unigramSoftCounts(words,
      weights.filter(col("piece") =!= "q"), maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gotNoQ.values.forall(v => !v.isNaN))
    assert(!gotNoQ.contains("q"))
    val coveredNoQ = gotNoQ.map { case (p, v) => p.length * v }.sum
    assert(math.abs(coveredNoQ - (chars - 2)) < 1e-6, s"got $coveredNoQ")
  }

  test("unigramTrainLoop soft mode: per-iteration conservation, sharpening, fixed point") {
    import spark.implicits._
    val docs = Seq((0L, "abab abab ab"), (1L, "abab cd cd"), (2L, "qq xy"))
      .toDF("doc_id", "text")
    val words = TextAnalysis.unigramWords(docs, "text", maxWordLen = 12)
    val freqs = words.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val chars = freqs.map { case (w, f) => w.length * f }.sum
    def trained(iters: Int) =
      TextAnalysis.unigramTrainLoop(words, 2, 2, iters, em = "soft")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the conservation law holds at EVERY iterate's model: expected
    // counts generated FROM each trained vocab cover each corpus char
    // exactly once in expectation (the floored chars add vocab mass but
    // the law is a property of the E-step over that vocab)
    (1 to 3).foreach { it =>
      val v = TextAnalysis.unigramTrainLoop(words, 2, 2, it, em = "soft")
      val cov = TextAnalysis.unigramSoftCounts(
          words, TextAnalysis.unigramWeights(v), maxPieceLen = 2)
        .collect().map(r => r.getString(0).length * r.getDouble(1)).sum
      assert(math.abs(cov - chars) < 1e-6, s"iter $it: covered $cov vs $chars")
    }
    val t1 = trained(1)
    val t3 = trained(3)
    // soft keeps fractional mass on every REACHED piece (ba survives,
    // unlike hard-EM's all-or-nothing prune) and re-weighting sharpens:
    // the dominant subword's expected count grows round over round
    assert(t1.contains("ba") && t1("ab") < 7.0)
    assert(t3("ab") > t1("ab") - 1e-9 && t3("ab") < 7.0 + 1e-9,
      s"ab: ${t1("ab")} -> ${t3("ab")}")
    // fixed point: an unambiguous corpus (maxPieceLen 1 — one
    // segmentation per word) converges in one round, exactly; soft
    // counts there equal the hard-EM integers
    val plainWords = TextAnalysis.unigramWords(
      Seq((0L, "a b c a"), (1L, "b a")).toDF("doc_id", "text"), "text")
    def plain(iters: Int) =
      TextAnalysis.unigramTrainLoop(plainWords, 1, 1, iters, em = "soft")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(plain(1) == plain(3))
    assert(plain(1) == Map("a" -> 3.0, "b" -> 2.0, "c" -> 1.0))
  }

  test("trained weight artifact: contrast weights, broadcast scoring, unseen weighs 0") {
    import spark.implicits._
    val labeled = Seq(
      (0L, "good good fine", true),
      (1L, "bad bad good", false)).toDF("doc_id", "text", "y")
    val w = TextAnalysis.trainClassifierWeights(labeled, "doc_id", "text", "y", dim = 4096)
    val buckets = Seq("good", "bad", "fine", "zzz").map { tok =>
      tok -> spark.range(1).select((TextAnalysis.hash60(lit(tok)) % 4096).as("b"))
        .head().getLong(0)
    }.toMap
    assert(buckets.values.toSet.size == 4, "fixture tokens must not collide")
    val wm = w.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wm(buckets("good")) == 1L) // 2 pos occurrences - 1 neg
    assert(wm(buckets("bad")) == -2L)
    assert(wm(buckets("fine")) == 1L)
    assert(!wm.contains(buckets("zzz")))
    // scoring through a PERSISTED artifact; unseen token weighs 0
    val dir = java.nio.file.Files.createTempDirectory("graft_clfw").toString
    w.write.mode("overwrite").parquet(s"$dir/w")
    val docs = Seq((10L, "good bad zzz")).toDF("doc_id", "text")
    val scored = TextAnalysis.classifierScoreWith(docs, "doc_id", "text",
      spark.read.parquet(s"$dir/w"))
    val out = scored.head()
    assert(out.getAs[Long]("score_sum") == 1L - 2L + 0L)
    assert(out.getAs[Long]("n_tokens") == 3L)
    // the model lookup is a broadcast join, not a shuffle
    assert(scored.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("classifier stub score: exact integers, reproducible, order-independent") {
    import spark.implicits._
    val out = TextAnalysis.classifierScoreStub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // exact dups score identically; every doc scores all its tokens
    assert(out(0L) == out(3L))
    assert(out(0L)._2 == 14L, s"token count ${out(0L)._2}")
    // per-mille weights bound the sum by ±1000 per token
    out.values.foreach { case (s, n) => assert(math.abs(s) <= 1000L * n) }
    // deterministic across runs and input order
    val again = TextAnalysis.classifierScoreStub(
      docs.orderBy(col("doc_id").desc), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == out)
    // a different seed is a different model
    val reseeded = TextAnalysis.classifierScoreStub(docs, "doc_id", "text", seed = "w1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.exists { case (id, (s, _)) => reseeded(id) != s })
  }

  test("classifier score DEFAULT = trained on the keepFlag heuristic label") {
    import spark.implicits._
    val out = TextAnalysis.classifierScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // the default path IS train-then-score: equals the explicit composition
    val labeled = docs.withColumn("y", TextAnalysis.keepFlag(col("text")))
    val w = TextAnalysis.trainClassifierWeights(labeled, "doc_id", "text", "y")
    val explicitly = TextAnalysis.classifierScoreWith(docs, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == explicitly)
    // exact dups score identically; tokens all counted
    assert(out(0L) == out(3L))
    assert(out(0L)._2 == 14L)
    // the weak-supervision signal must actually SEPARATE: on a corpus
    // whose kept and dropped docs use disjoint vocabularies, every kept
    // doc's per-token mean score exceeds every dropped doc's (a
    // sign-flip or junk-weights regression fails this, not just
    // constancy)
    val keepText = "quality content flows with proper sentences and many letters here"
    val dropText = "0 1 2 3 44 55"
    val sep = (
      (0L until 4L).map(i => (i, s"$keepText v$i")) ++
      (10L until 14L).map(i => (i, s"$dropText $i"))).toDF("doc_id", "text")
    val sepScores = TextAnalysis.classifierScore(sep, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1).toDouble / r.getLong(2))).toMap
    val keptMin = (0L until 4L).map(sepScores).min
    val dropMax = (10L until 14L).map(sepScores).max
    assert(keptMin > dropMax, s"kept min $keptMin vs dropped max $dropMax")
  }

  test("weightedSample race: P(win) = w/Σw on 2-horse toys; no global sort; zero weight loud") {
    import spark.implicits._
    // 4000 independent 2-horse races with weights 1 vs 3 — the min of
    // Exp(1) and Exp(3) clocks picks the heavy horse with P = 3/4
    // (closed form). The race is hash-derandomized, so this is a FIXED
    // number, not a flaky draw; the band is ±4σ around 3000.
    val horses = spark.range(4000L).select(explode(array(
      struct(concat(lit("L"), $"id").as("rid"), lit(1L).as("w")),
      struct(concat(lit("H"), $"id").as("rid"), lit(3L).as("w")))).as("s"))
      .select($"s.rid".as("rid"), $"s.w".as("w"))
    val keys = graft.pipeline.TextAnalysis
      .weightedSampleKeys(horses, "rid", "w")
      .withColumn("g", substring($"id", 2, 10))
    val heavyWins = keys.groupBy($"g")
      .agg(min(struct($"key", $"id")).getField("id").as("winner"))
      .filter($"winner".startsWith("H")).count()
    assert(heavyWins >= 2880 && heavyWins <= 3120, s"heavy won $heavyWins/4000")
    // top-k is a TakeOrderedAndProject (per-partition heaps), never a
    // global sort
    val sample = graft.pipeline.TextAnalysis
      .weightedSample(horses, "rid", "w", k = 10)
    assert(sample.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    assert(sample.count() == 10L)
    // picks are the k smallest keys in (key, id) order
    val picks = sample.orderBy($"pick").collect().map(_.getLong(3))
    assert(picks.sameElements(picks.sorted))
    // a zero weight fails loudly instead of silently diverging engines
    val bad = Seq(("a", 0L)).toDF("rid", "w")
    val e = intercept[Exception] {
      graft.pipeline.TextAnalysis.weightedSampleKeys(bad, "rid", "w").collect()
    }
    assert(e.getMessage != null)
  }

  test("weightedSampleByGroup: per-group k winners ≡ per-group global race; WindowGroupLimit plan") {
    import spark.implicits._
    // 3 groups of distinct sizes (one below k) with varied weights
    val docs = (0L until 120L).map(i =>
      (i, if (i < 60) "a" else if (i < 115) "b" else "c", i % 7L + 1L))
      .toDF("doc_id", "grp0", "w0")
    val grouped = graft.pipeline.TextAnalysis.weightedSampleByGroup(
      docs, "doc_id", "grp0", "w0", k = 8)
    val got = grouped.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // law: each group's winners are exactly weightedSample run on that
    // group alone (same keys — the group never enters the race key)
    val want = Seq("a", "b", "c").flatMap { g =>
      graft.pipeline.TextAnalysis.weightedSample(
        docs.filter($"grp0" === g), "doc_id", "w0", k = 8)
        .collect().map(r => (g, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(got == want, s"extra=${got.diff(want)} missing=${want.diff(got)}")
    // the under-k group returns all its rows
    assert(got.count(_._1 == "c") == 5)
    // the rank filter plans as WindowGroupLimit (map-side k-heaps — a
    // whale group costs k state, never a group-wide sort buffer)
    assert(grouped.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
    // thresholds are each group's k-th (or last) winner
    val th = graft.pipeline.TextAnalysis.weightedSampleGroupThresholds(
      docs, "doc_id", "grp0", "w0", k = 8)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val lastPick = grouped.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)._3).toMap
    assert(th == lastPick, s"$th vs $lastPick")
  }

  test("connectedComponentsDelta: incremental labels identical to full closure on adversarial merges") {
    import spark.implicits._
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // standing: {1,2,3}, {10,11}, {20,21}, {30} (via 30-31? no — 30,31}
    val base = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (30L, 31L))
      .toDF("ia", "ib")
    val standing = graft.pipeline.Dedup.connectedComponents(base)
    // delta exercises every branch at once:
    //  (3,10): merges two standing components through NON-rep endpoints
    //  (11,20): chains a THIRD component in — transitive through the
    //           rep graph, {1,2,3,10,11,20,21} must all land on comp 1
    //  (40,41): a brand-new component from unseen nodes
    //  (21,40): ...which then merges into the big one transitively
    //  (30,31): entirely internal to a standing component (no-op)
    //  (2,3):   internal duplicate of a base pair (no-op)
    val delta = Seq((3L, 10L), (11L, 20L), (40L, 41L), (21L, 40L),
      (30L, 31L), (2L, 3L)).toDF("ia", "ib")
    val inc = labelsOf(
      graft.pipeline.Dedup.connectedComponentsDelta(standing, delta))
    val full = labelsOf(
      graft.pipeline.Dedup.connectedComponents(base.unionByName(delta)))
    assert(inc == full, s"extra=${inc.toSet.diff(full.toSet)} missing=${full.toSet.diff(inc.toSet)}")
    assert(inc(41L) == 1L && inc(21L) == 1L && inc(30L) == 30L)
    // an all-internal delta is a fixed point
    val noop = labelsOf(graft.pipeline.Dedup.connectedComponentsDelta(
      standing, Seq((1L, 3L)).toDF("ia", "ib")))
    assert(noop == labelsOf(standing))
    // self-loop pairs: a delta node seen ONLY in (x, x) still gets its
    // singleton row, identical to the full closure (and a standing
    // node's self-loop stays a no-op)
    val selfDelta = Seq((50L, 50L), (1L, 1L)).toDF("ia", "ib")
    val incSelf = labelsOf(
      graft.pipeline.Dedup.connectedComponentsDelta(standing, selfDelta))
    val fullSelf = labelsOf(
      graft.pipeline.Dedup.connectedComponents(base.unionByName(selfDelta)))
    assert(incSelf == fullSelf && incSelf(50L) == 50L, s"$incSelf")
    // bounded-Δ broadcast contract is loud, not a silent shuffle
    val tooBig = intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.connectedComponentsDelta(standing, delta,
        maxDeltaPairs = 2L)
    }
    assert(tooBig.getMessage.contains("maxDeltaPairs"))
    // plan shape: the standing labels must never shuffle — every standing
    // access streams against a broadcast Δ-derived build side, so the
    // fold's plan contains no sort-merge join at any size (a naive
    // delta-LEFT-JOIN-labels shape would SMJ the whole label table)
    val plan = graft.pipeline.Dedup
      .connectedComponentsDelta(standing, delta)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("weightedDraws: P(win) = w/Σw per draw; repeats allowed; map-side collapse; bounds loud") {
    import spark.implicits._
    // 2 items, weights 1 vs 3: over 4000 independent draws the heavy
    // item wins ~3000 (derandomized — a FIXED count; band ±4σ)
    val two = Seq(("L", 1L), ("H", 3L)).toDF("rid", "w0")
    val draws = graft.pipeline.TextAnalysis.weightedDraws(
      two, "rid", "w0", nDraws = 4000)
    val rows = draws.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length == 4000 && rows.map(_._1).toSet.size == 4000)
    val heavy = rows.count(_._2 == "H")
    assert(heavy >= 2880 && heavy <= 3120, s"heavy won $heavy/4000")
    // WITH replacement: both items repeat across draws
    assert(rows.map(_._2).toSet == Set("L", "H"))
    // the fan-out collapses map-side: a partial-mode aggregate sits
    // below the exchange (shuffle carries nDraws-sized data, not
    // corpus × draws)
    val plan = draws.queryExecution.executedPlan.toString
    assert(plan.contains("partial_min") || plan.contains("Partial"),
      plan.take(2000))
    // draw-count contract is loud
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.TextAnalysis.weightedDraws(two, "rid", "w0", 100001)
    }
    assert(e.getMessage.contains("nDraws"))
  }

  test("trainCodebook is a small-k tool: k past SmallKMax fails loudly toward the integer path") {
    import spark.implicits._
    val vecs = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.trainCodebook(vecs, "vec_id", "embedding",
        k = Similarity.SmallKMax + 1, iters = 1)
    }
    assert(e.getMessage.contains("kmeansStepExact"), e.getMessage)
  }

  test("semantic dedup: planted twin collapses within its IVF cell, rest survive") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // 4 well-separated centers, 20 members each; vec 100 is a near-copy
    // of vec 0 (same cell by construction), vec 101 a near-copy of vec 1
    val centers = Array.fill(4)(Array.fill(16)(rnd.nextFloat() * 10 - 5))
    val base = (0 until 80).map { i =>
      (i.toLong, centers(i % 4).map(v => v + rnd.nextFloat() * 0.5f - 0.25f))
    }
    val twins = Seq(
      (100L, base(0)._2.map(v => v + rnd.nextFloat() * 0.005f)),
      (101L, base(1)._2.map(v => v + rnd.nextFloat() * 0.005f)))
    val vecs = (base ++ twins).toDF("vec_id", "embedding")
    val coarse = Similarity.trainCodebook(vecs, "vec_id", "embedding", k = 4, iters = 3)
    val clusters = Similarity.semanticClustersIvf(vecs, "vec_id", "embedding",
      coarse, tauPermille = 999)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(100L) == 0L && clusters(101L) == 1L,
      s"twins must join their originals: ${clusters(100L)}, ${clusters(101L)}")
    assert(clusters(2L) == 2L, "non-dup stays its own singleton")
    // keep-one: the twins drop, their originals and everyone else survive
    val assigned = Similarity.assignCell(vecs, "embedding", coarse)
    val kept = Similarity.semanticDedup(assigned, "vec_id", "embedding",
      col("cell"), tauPermille = 999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val reps = clusters.values.toSet // cluster label IS the min-id representative
    assert(kept == reps, s"keep-one must keep exactly the representatives")
    assert(!kept.contains(100L) && !kept.contains(101L) && kept.contains(0L) && kept.contains(1L))
  }

  test("cell-size guard: a planted mega-cell splits, bounded pairs, others unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val center = Array.fill(16)(rnd.nextFloat() * 10 - 5)
    def near(c: Array[Float]): Array[Float] = c.map(v => v + rnd.nextFloat() * 0.004f)
    // one degenerate cell attracting 40 near-identical vectors, plus two
    // healthy cells with one near-dup pair each
    val c1 = Array.fill(16)(rnd.nextFloat() * 10 - 5)
    val c2 = Array.fill(16)(rnd.nextFloat() * 10 - 5)
    val mega = (0L until 40L).map(i => (i, near(center)))
    val small = Seq((100L, near(c1)), (101L, near(c1)), (102L, c2.map(-_)),
      (200L, near(c2)), (201L, near(c2)))
    val vecs = (mega ++ small).toDF("vec_id", "embedding")
    val cellOf = when(col("vec_id") < 100L, 0).otherwise((col("vec_id") / 100L).cast("int"))

    def pairSet(cap: Int): Set[(Long, Long)] =
      Similarity.semanticPairs(vecs, "vec_id", "embedding", cellOf,
        tauPermille = 999, maxCellSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unguarded = pairSet(0)
    val guarded = pairSet(8)

    // the mega-cell's quadratic term is bounded: exactly sum nc-choose-2
    // over the ceil(40/8)=5 hash subcells, strictly below 40*39/2
    val subSizes = vecs.filter(col("vec_id") < 100L)
      .groupBy(pmod(xxhash64(col("vec_id")), lit(5L))).count()
      .collect().map(_.getLong(1))
    val expectedMega = subSizes.map(n => n * (n - 1) / 2).sum
    assert(unguarded.count(_._1 < 100L) == 40L * 39 / 2)
    assert(guarded.count(_._1 < 100L) == expectedMega,
      s"mega pairs must be hash-subcell-bounded: got ${guarded.count(_._1 < 100L)}")
    assert(expectedMega < 40L * 39 / 2)

    // non-skewed cells are completely unaffected by the guard
    assert(guarded.filter(_._1 >= 100L) == unguarded.filter(_._1 >= 100L))
    assert(guarded.contains((100L, 101L)) && guarded.contains((200L, 201L)))
    assert(!guarded.exists(p => p._1 == 102L || p._2 == 102L),
      "opposed vector stays pairless")

    // clusters: healthy cells unchanged; every mega cluster fits a subcell
    val clusters = Similarity.semanticClusters(vecs, "vec_id", "embedding",
      cellOf, tauPermille = 999, maxCellSize = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(101L) == 100L && clusters(201L) == 200L && clusters(102L) == 102L)
    val megaSizes = clusters.filter(_._1 < 100L).groupBy(_._2).map(_._2.size)
    assert(megaSizes.sum == 40 && megaSizes.max <= subSizes.max,
      s"mega clusters bounded by their subcells: $megaSizes vs ${subSizes.toSeq}")
  }

  test("semantic pair prefilter: identical pairs with the head-dot bound on or off") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // decaying spectrum (prefilter-favorable) + a planted twin + an
    // adversarial pair sitting just above/below the threshold
    def vec(): Array[Float] =
      Array.tabulate(32)(i => ((rnd.nextFloat() - 0.5f) / (1f + i / 4f)))
    val base = (0L until 200L).map(i => (i, vec()))
    val twin = (503L, base(7)._2.clone()) // 503 % 4 == 7 % 4: same cell
    val all = (base :+ twin).toDF("id", "vec")
    val cell = pmod(col("id"), lit(4))
    def pairs(head: Int, order: Array[Int]): Set[(Long, Long)] =
      Similarity.semanticPairs(all, "id", "vec", cell, tauPermille = 420,
        maxCellSize = 0, prefilterHeadDims = head, headOrder = order)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(0, Array.empty)
    assert(exact.contains((7L, 503L)), "planted twin must qualify")
    // bound is exact math: same pairs with identity order AND variance order
    assert(pairs(8, Array.empty) == exact)
    val order = Similarity.varianceOrder(all, "vec")
    assert(order.length == 32 && order.toSet == (1 to 32).toSet)
    assert(pairs(8, order) == exact)

    // misconfiguration fails LOUDLY, not by silently weakening the bound:
    // head dims past the vector end raise at execution; a short headOrder
    // and non-1-based positions are rejected at plan build
    val oob = intercept[Exception](pairs(40, Array.empty))
    assert(oob.getMessage != null) // SparkRuntimeException from raise_error
    intercept[IllegalArgumentException](pairs(8, Array(1, 2, 3)))
    intercept[IllegalArgumentException](pairs(2, Array(0, 1)))
  }

  test("hashed-shingle jaccard equals the string-keyed computation") {
    def stats(hash: Boolean): Set[(Long, Long, Long, Long)] =
      Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, hashShingles = hash)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(stats(hash = true) == stats(hash = false))
  }

  test("minhash-LSH verified pairs equal brute-force at the same threshold") {
    val brute = Dedup.nearDuplicates(docs, "doc_id", "text", 3, 4, 5)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDuplicates(docs, "doc_id", "text", 3, 32, 8, 4, 5)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute)
  }

  test("minhash-LSH recall on the realistic corpus: equals brute force (margin regression)") {
    // 32x8 banding recalls an exactly-at-threshold pair only with
    // probability ~0.985, so oracle equality (p07/p45/p48) rests on the
    // FIXTURE's margin: the sf0.001 gate corpus has no qualifying pair
    // below J=0.889 (measured round 8). This pins that fact against
    // regenerated testdata or a reseeded hash family — if it ever fails,
    // loosen the p45/p48 oracles instead of chasing the seed.
    val dir = new java.io.File("/root/testdata/sf0.001/documents.parquet")
    assume(dir.exists(), "driver testdata not present")
    val real = spark.read.parquet(dir.toString)
    val brute = Dedup.nearDuplicates(real, "doc_id", "text", 3, 4, 5)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashNearDuplicates(real, "doc_id", "text", 3, 32, 8, 4, 5)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture should contain near-dup pairs")
    assert(lsh == brute, s"LSH missed ${(brute -- lsh).take(5)}")
  }

  test("minhash maxBucket guard: degenerate blob skipped whole, honest pairs survive") {
    import spark.implicits._
    // a 12-doc IDENTICAL blob (every band bucket holds all 12 — C(12,2)
    // pairs per band uncapped) next to one honest near-dup pair
    val blob = (0 until 12).map(i =>
      (100L + i, "zig zag zog zeb zub zam zin zon zur zat"))
    val pairDocs = Seq( // J = 12/14 ≈ 0.857 ≥ 4/5
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi omicron pi"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu xi omicron rho"))
    val corpus = (blob ++ pairDocs).toDF("doc_id", "text")
    def pairs(cap: Option[Int]) =
      Dedup.minhashNearDuplicates(corpus, "doc_id", "text", 3, 32, 8, 4, 5,
        maxBucket = cap)
        .select("ia", "ib").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = pairs(None)
    assert(uncapped.size == 66 + 1, s"got ${uncapped.size}") // C(12,2) + the pair
    val capped = pairs(Some(8))
    // the blob's buckets (12 members) exceed the cap and are dropped
    // whole — exact-dedup's domain; the honest pair's buckets (2) stay
    assert(capped == Set((1L, 2L)), s"got $capped")
    // cap above every bucket size = identical to uncapped
    assert(pairs(Some(100)) == uncapped)
  }

  test("simhash: near-dups land within small hamming distance, unrelated far") {
    val pairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 8)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup: hamming 0
    assert(pairs.contains((0L, 1L))) // near dup
  }

  test("simhash of identical docs is identical; deterministic across runs") {
    val s1 = Dedup.simhash(docs, "doc_id", "text").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Dedup.simhash(docs, "doc_id", "text").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2 && s1(0L) == s1(3L))
  }

  test("connected components: chain needs propagation, min label wins") {
    import spark.implicits._
    // path 1-2-3-4 (only CC propagation links 1 and 4) + isolated pair 7-6
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 6L)).toDF("ia", "ib")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L))
    assert(comps(6L) == 6L && comps(7L) == 6L)
  }

  test("connected components close a deep path with position-uncorrelated ids") {
    import spark.implicits._
    // the measured round-13 failure shape: a 400-segment path whose node
    // ids are a random permutation (no id/position correlation) — the old
    // pointer-jumping label propagation did not close this in 200 rounds;
    // star rounds must close it within the DEFAULT maxIter
    val rnd = new scala.util.Random(11)
    val ids = rnd.shuffle((0L to 400L).toVector)
    val pairs = (0 until 400).map(i => (ids(i), ids(i + 1))).toDF("ia", "ib")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.size == 401 && comps.values.toSet == Set(0L))
  }

  test("connected components match driver-side union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 3) {
      val n = 60
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      // reference: union-find with min-label roots
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = Dedup.connectedComponents(edges.toDF("ia", "ib"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected)
    }
  }

  test("ngram stats fold: standing + delta census ≡ full table; top-k readout stable") {
    import spark.implicits._
    val d = (0L until 24L).map { i =>
      (i, Seq.fill(5)(s"w${i % 4}").mkString(" ") + " shared tail gram")
    }.toDF("doc_id", "text")
    def tbl(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.ngramStatsTable(df, "doc_id", "text", 3)
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val folded = TextAnalysis.foldNgramStats(
      tbl(d.filter(col("doc_id") % 3 === 0)),
      tbl(d.filter(col("doc_id") % 3 =!= 0)))
    assert(m(folded) == m(tbl(d)))
    // readout top-k over the folded table ≡ ngramStats over the corpus
    val a = TextAnalysis.ngramTopK(folded, 4).collect().map(_.getString(0)).toSeq
    val b = TextAnalysis.ngramStats(d, "doc_id", "text", 3, 4)
      .collect().map(_.getString(0)).toSeq
    assert(a == b, s"$a vs $b")
    val big = intercept[IllegalArgumentException] {
      TextAnalysis.foldNgramStats(tbl(d), tbl(d), maxDeltaRows = 1L)
    }
    assert(big.getMessage.contains("maxDeltaRows"))
  }

  test("sourceVocabOverlap: exact jaccard per pair; zero-overlap pair still reported") {
    import spark.implicits._
    val d = Seq(
      (1L, "A", "alpha beta gamma"),
      (2L, "A", "beta delta"),          // A vocab: {alpha,beta,gamma,delta}
      (3L, "B", "beta gamma zeta"),     // B vocab: {beta,gamma,zeta}
      (4L, "C", "omega")).toDF("doc_id", "source", "text")
    val got = graft.pipeline.TextAnalysis.sourceVocabOverlap(d, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // A∩B = {beta,gamma} = 2; |A∪B| = 4+3-2 = 5 → 400‰
    assert(got(("A", "B")) == ((2L, 5L, 400L)), got.toString)
    // zero overlap still gets its row (C shares nothing)
    assert(got(("A", "C")) == ((0L, 5L, 0L)) && got(("B", "C")) == ((0L, 4L, 0L)))
    assert(got.size == 3)
  }

  test("stripBoilerplate: per-source footer strips everywhere; other sources untouched; emptied docs drop") {
    import spark.implicits._
    val d = Seq(
      (1L, "A", "intro|FOOTER|body one"),
      (2L, "A", "FOOTER|body two"),
      (3L, "A", "body three"),
      (4L, "B", "FOOTER|other site"),     // FOOTER unique WITHIN B — stays
      (5L, "A", "FOOTER"),                // all-boilerplate doc → drops
      (6L, "B", "x|y"),
      (7L, null, "NFOOT|seven"),          // NULL source is a source like
      (8L, null, "NFOOT|eight")).toDF("doc_id", "source", "text") // any other
    val got = graft.pipeline.Dedup.stripBoilerplate(
      d, "doc_id", "source", "text", delimRegex = "\\|", minDocs = 2,
      joinWith = "|")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got == Map(
      1L -> ("A", "intro|body one"),
      2L -> ("A", "body two"),
      3L -> ("A", "body three"),
      4L -> ("B", "FOOTER|other site"), // B's df for FOOTER is 1
      6L -> ("B", "x|y"),
      7L -> ((null, "seven")),          // NULL-source boilerplate strips too
      8L -> ((null, "eight"))), got.toString)
    // minDocs floor is loud
    val e = intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.stripBoilerplate(d, "doc_id", "source", "text",
        "\\|", minDocs = 1)
    }
    assert(e.getMessage.contains("minDocs"))
    // the stateless gate against the standing artifact strips the SAME
    // rows (per-row expression — arrival order can't matter; p230's law)
    val art = graft.pipeline.Dedup.boilerplateArtifact(
      d, "doc_id", "source", "text", "\\|", minDocs = 2)
    val gated = graft.pipeline.Dedup.stripBoilerplateGate(
      d, "doc_id", "source", "text", "\\|", art, joinWith = "|")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(gated == got, s"$gated vs $got")
    // df-table fold law: standing(evens) + delta(odds) ≡ the full table
    // (touched keys re-sum, untouched stream; NULL-source keys fold too)
    def tbl(df: org.apache.spark.sql.DataFrame) = graft.pipeline.Dedup
      .boilerplateDfTable(df, "doc_id", "source", "text", "\\|")
    val folded = graft.pipeline.Dedup.foldBoilerplateDf(
      tbl(d.filter(col("doc_id") % 2 === 0)),
      tbl(d.filter(col("doc_id") % 2 === 1)))
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(2)).toMap
    val full = tbl(d)
      .collect().map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(2)).toMap
    assert(folded == full, s"extra=${folded.toSet.diff(full.toSet)} missing=${full.toSet.diff(folded.toSet)}")
    // and the loud delta bound
    val big = intercept[IllegalArgumentException] {
      graft.pipeline.Dedup.foldBoilerplateDf(tbl(d), tbl(d), maxDeltaRows = 1L)
    }
    assert(big.getMessage.contains("maxDeltaRows"))
  }

  test("dup clusters: planted dups share a cluster, singletons keep their id") {
    val cl = Dedup.dupClusters(docs, "doc_id", "text", n = 3, num = 4, den = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(0L) == 0L && cl(1L) == 0L && cl(3L) == 0L) // near/exact dups of 0
    assert(cl(2L) == 2L && cl(4L) == 4L)                 // singletons
    assert(cl.size == 5)
  }

  test("persisted IVF index: search equals in-memory ivfSearch and prunes partitions") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val centroids = Similarity.trainCodebook(vecs, "vec_id", "embedding", k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.saveIndex(vecs, "vec_id", "embedding", centroids, s"$dir/idx")
    val qv = vecs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).toArray
    val fromIndex = Similarity.searchIndex(spark, s"$dir/idx", qv, k = 5, nprobe = 2)
    val direct = Similarity.ivfSearch(vecs, "vec_id", "embedding", centroids, qv, k = 5, nprobe = 2)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rank").select("id").collect().map(_.getLong(0)).toSeq
    assert(ids(fromIndex) == ids(direct))
    // the probed-cell filter reaches PartitionFilters (directory pruning)
    val plan = fromIndex.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan.take(2000))
  }

  test("PII redaction: URLs, emails, phones replaced; order protects URL userinfo") {
    import spark.implicits._
    val rows = Seq(
      (1L, "mail me at jo.doe+x@corp-mail.co or visit https://a.b/c?d=e#f today"),
      (2L, "ftp://not-a-match and user@@bad and 12-345-6789x"),
      (3L, "call +44-202-5551 0199 or 1-555-123-4567"),
      (4L, "creds http://user:pw@host.com/p kept whole"))
      .toDF("id", "text")
    val out = rows.select($"id", TextAnalysis.redactPii($"text").as("clean"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail me at <EMAIL> or visit <URL> today")
    // ftp scheme and the malformed email stay; the dashed 3+4 group redacts
    assert(out(2L) == "ftp://not-a-match and user@@bad and <PHONE>x")
    // space-separated tail group doesn't extend the match; the NANP-style
    // number redacts from its 3-digit group (leading '1-' is not consumed)
    assert(out(3L) == "call <PHONE> 0199 or 1-<PHONE>")
    // URL-first ordering: the email-shaped userinfo redacts as URL, not EMAIL
    assert(out(4L) == "creds <URL> kept whole")
  }

  test("paragraph dedup: first occurrence wins corpus-wide, docs reassemble in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha\n\nshared para\n\nbeta"),
      (2L, "shared para\n\ngamma\n\nshared para"),
      (3L, "shared para"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, "doc_id", "text", delimRegex = "\n\n")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "alpha\nshared para\nbeta") // owns the first occurrence
    assert(out(2L) == "gamma")                    // both copies lose to doc 1
    assert(!out.contains(3L))                     // nothing survives
    // plan shape: winner selection is a rank-1 window, so the hot-paragraph
    // skew case is pre-filtered map-side (WindowGroupLimit), and the
    // explode subtree exists ONCE (no self-join)
    val plan = Dedup.dedupParagraphs(docs, "doc_id", "text", delimRegex = "\n\n")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
    assert(!plan.contains("Join"), plan.take(1500))
  }

  test("token chunking: stride windows, partial tail kept, empty doc dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 tokens
      (2L, "a b"),
      (3L, "   "))
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunkByTokens(docs, "doc_id", "text", maxTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(out == Map(
      (1L, 0) -> "t0 t1 t2 t3", (1L, 1) -> "t3 t4 t5 t6", (1L, 2) -> "t6",
      (2L, 0) -> "a b"))
  }

  test("repetition signals: dup-token and top-bigram per-mille are exact") {
    import spark.implicits._
    // "x y x y x": n=5, distinct=2 -> dup=600; bigrams: "x y"×2,"y x"×2 -> 2*1000/4=500
    val docs = Seq((1L, "x y x y x"), (2L, "all words differ here"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((5L, 600L, 500L)))
    assert(out(2L) == ((4L, 0L, 333L))) // every bigram unique: 1000/3
    assert(!out.contains(3L))           // <2 tokens: no bigram denominator
  }

  test("sequence packing: running offsets per shard, bins cut every binTokens") {
    import spark.implicits._
    val chunks = Seq(
      // shard 0: offsets 0,3,7 -> bins 0,0,1 with binTokens=5
      (0L, 1L, 0, 3L), (0L, 1L, 1, 4L), (0L, 2L, 0, 2L),
      // shard 1: independent stream
      (1L, 3L, 0, 6L), (1L, 4L, 0, 1L))
      .toDF("shard", "doc_id", "chunk_id", "n_tokens")
    val out = TextAnalysis.packChunks(chunks, "shard",
      Seq("doc_id", "chunk_id"), "n_tokens", binTokens = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) ->
        (r.getAs[Long]("off"), r.getAs[Long]("bin_id"))).toMap
    assert(out((0L, 1L, 0)) == ((0L, 0L)))
    assert(out((0L, 1L, 1)) == ((3L, 0L)))
    assert(out((0L, 2L, 0)) == ((7L, 1L)))
    assert(out((1L, 3L, 0)) == ((0L, 0L)))
    assert(out((1L, 4L, 0)) == ((6L, 1L)))
  }

  test("IVF-PQ: full-rerank equals ivfSearch; codes-only scan; self-query recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val coarse = Similarity.trainCodebook(vecs, "vec_id", "embedding", k = 4, iters = 2)
    val pq = Similarity.trainProductCodebook(vecs, "vec_id", "embedding",
      coarse, m = 4, ksub = 8, iters = 2)
    val qv = vecs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).toArray
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rank").select("id").collect().map(_.getLong(0)).toSeq

    // rerank covering the probed cells => exact-rerank restores ivfSearch exactly
    val exact = ids(Similarity.ivfSearch(vecs, "vec_id", "embedding", coarse, qv, k = 5, nprobe = 2))
    val pqFull = ids(Similarity.pqSearch(vecs, "vec_id", "embedding", coarse, pq, qv,
      k = 5, nprobe = 2, rerank = 200))
    assert(pqFull == exact, s"full-rerank PQ must equal exact IVF: $pqFull vs $exact")

    // modest rerank: the query's own vector must surface at rank 1, sim 1.0
    val self = Similarity.pqSearch(vecs, "vec_id", "embedding", coarse, pq, qv,
      k = 3, nprobe = 2, rerank = 20)
    val top = self.orderBy("rank").head()
    assert(top.getLong(top.fieldIndex("id")) == 0L &&
      math.abs(top.getDouble(top.fieldIndex("sim")) - 1.0) < 1e-9)

    // persisted index: same results, and the candidate scan reads codes, not vectors
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString
    Similarity.savePqIndex(vecs, "vec_id", "embedding", coarse, pq, s"$dir/idx")
    assert(ids(Similarity.searchPqIndex(spark, s"$dir/idx", qv, k = 5, nprobe = 2, rerank = 200))
      == exact)
    val codes = spark.read.parquet(s"$dir/idx/vectors").select("id", "code", "cell")
    val candPlan = Similarity.pqCandidates(codes, "id", coarse, pq, qv, nprobe = 2, rerank = 20)
      .queryExecution.executedPlan.toString
    val scanLines = candPlan.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(scanLines.exists(l => l.contains("code") && !l.contains("vec:")),
      s"candidate scan must not read the vector column:\n${scanLines.mkString("\n")}")
  }

  test("IVF-PQ on clustered vectors: high recall at small rerank") {
    import spark.implicits._
    // 8 well-separated cluster centers, 40 members each with small noise —
    // the realistic embedding shape (uniform-random is PQ's worst case)
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextFloat() * 10 - 5))
    val vecs = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(v => v + rnd.nextFloat() * 0.5f - 0.25f))
    }.toDF("vec_id", "embedding")
    val coarse = Similarity.trainCodebook(vecs, "vec_id", "embedding", k = 8, iters = 3)
    val pq = Similarity.trainProductCodebook(vecs, "vec_id", "embedding",
      coarse, m = 4, ksub = 16, iters = 3)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("id").collect().map(_.getLong(0)).toSet
    val recalls = (0L until 5L).map { qid =>
      val qv = vecs.filter($"vec_id" === qid).select($"embedding").head().getSeq[Float](0).toArray
      val rest = vecs.filter($"vec_id" =!= qid)
      val truth = ids(Similarity.bruteForceTopK(rest, "vec_id", "embedding",
        Seq(Tuple1(qv)).toDF("q"), 10))
      val got = ids(Similarity.pqSearch(rest, "vec_id", "embedding", coarse, pq, qv,
        k = 10, nprobe = 2, rerank = 20))
      got.intersect(truth).size / 10.0
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.8, s"clustered-data PQ recall@10 should be high, got $mean ($recalls)")
  }

  test("kNN graph: single-probe degenerate law and full-probe exactness") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 18).map { i =>
      (i.toLong, Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val codebook = Similarity.refinedCentroids(
      Similarity.kmeansStepExact(df, "vec_id", "embedding", k = 3))
      .localCheckpoint()
    val index = Similarity.ivfIndexTable(df, "vec_id", "embedding", codebook, 3)
      .localCheckpoint()
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // nProbe = 1 degenerates to the single-probe graph exactly
    assert(rows(Similarity.knnGraphMultiProbe(index, codebook, 3, 1, 2)) ==
      rows(Similarity.knnGraphIvf(index, 2)))
    // nProbe = k probes every cell → the EXACT kNN graph (Scala brute
    // force with the same double cosine + (sim desc, nbr) order)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val exact = vecs.flatMap { case (id, v) =>
      vecs.filter(_._1 != id)
        .map { case (nbr, w) => (nbr, cos(v, w)) }
        .sortBy { case (nbr, sim) => (-sim, nbr) }
        .take(2).zipWithIndex
        .map { case ((nbr, _), i) => (id, (i + 1).toLong, nbr) }
    }.toSet
    assert(rows(Similarity.knnGraphMultiProbe(index, codebook, 3, 3, 2)) == exact)
  }

  test("mutualKnnEdges: reciprocal pairs only, one row per pair, hub edges vanish") {
    import spark.implicits._
    // top-k lists: 1→[2,9], 2→[1,9], 9→[3,4] (9 is a hub others rank
    // but that ranks none of them back), 3→[9,4], 4→[3,9]
    val g = Seq(
      (1L, 1L, 2L), (1L, 2L, 9L),
      (2L, 1L, 1L), (2L, 2L, 9L),
      (9L, 1L, 3L), (9L, 2L, 4L),
      (3L, 1L, 9L), (3L, 2L, 4L),
      (4L, 1L, 3L), (4L, 2L, 9L)).toDF("id", "rank", "nbr")
    val mu = Similarity.mutualKnnEdges(g).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // mutual: (1,2); (9,3) and (9,4) reciprocal; (3,4) reciprocal;
    // (1,9)/(2,9) one-directional — gone
    assert(mu == Set((1L, 2L), (3L, 9L), (4L, 9L), (3L, 4L)), s"got $mu")
  }

  test("knnGraphDelta: touched-cells fold ≡ full rebuild; loud collision and touched bounds") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val all = (0 until 24).map { i =>
      (i.toLong, Array.fill(4)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding").localCheckpoint()
    val base = all.filter($"vec_id" % 4 =!= 0)
    val delta = all.filter($"vec_id" % 4 === 0)
    val codebook = Similarity.refinedCentroids(
      Similarity.kmeansStepExact(base, "vec_id", "embedding", k = 3))
      .localCheckpoint()
    val idx = Similarity.ivfIndexTable(base, "vec_id", "embedding", codebook, 3)
      .localCheckpoint()
    val dIdx = Similarity.ivfIndexTable(delta, "vec_id", "embedding", codebook, 3)
      .localCheckpoint()
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
      d.select("cell", "id", "rank", "nbr").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val g0 = Similarity.knnGraphTable(idx, 2)
    val folded = rows(Similarity.knnGraphTable(
      Similarity.foldIvfIndex(idx, dIdx), 2))
    assert(rows(Similarity.knnGraphDelta(g0, idx, dIdx, 2)) == folded)
    // the readout drops the artifact cell and nothing else
    assert(Similarity.knnGraphIvf(idx, 2).columns.toSeq == Seq("id", "rank", "nbr"))
    // colliding delta ids fail loudly (the foldIvfIndex wording)
    val boom = intercept[IllegalArgumentException] {
      Similarity.knnGraphDelta(g0, idx, idx.limit(1), 2)
    }
    assert(boom.getMessage.contains("collide"))
    // a hot touched cell trips the quadratic bound, never a silent join
    val hot = intercept[IllegalArgumentException] {
      Similarity.knnGraphDelta(g0, idx, dIdx, 2, maxTouchedRows = 1L)
    }
    assert(hot.getMessage.contains("maxTouchedRows"))
    // empty delta is the identity fold
    assert(rows(Similarity.knnGraphDelta(g0, idx, dIdx.limit(0), 2)) == rows(g0))
  }

  test("knnGraphTable: Σ|cell|² occupancy guard trips loudly; suggestK policy") {
    import spark.implicits._
    // 6 vectors all in ONE cell → Σ|cell|² = 36 pairs
    val idx = (0 until 6).map(i => (i.toLong, 0L, Array(i.toFloat, 1f)))
      .toDF("id", "cell", "embedding")
    val boom = intercept[IllegalArgumentException] {
      Similarity.knnGraphTable(idx, 2, maxPairs = 35L)
    }
    assert(boom.getMessage.contains("maxPairs"))
    assert(boom.getMessage.contains("36"), s"measured pair count: $boom")
    assert(boom.getMessage.contains("suggestK"))
    // at the bound exactly, the build runs (6 ids × 2 nbrs)
    assert(Similarity.knnGraphTable(idx, 2, maxPairs = 36L).count() == 12L)
    // suggestK: balanced-cell policy — k cells of n/k rows hold
    // skew·n²/k ≤ maxPairs
    assert(Similarity.suggestK(0) == 1)
    assert(Similarity.suggestK(2000000L) == 1200) // the scaladoc example
    val k = Similarity.suggestK(100000L, maxPairs = 1000000L, skew = 1.0)
    assert(k.toLong * 1000000L >= 100000L * 100000L) // n²/k ≤ maxPairs
    // never more cells than vectors
    assert(Similarity.suggestK(3L, maxPairs = 1L, skew = 1.0) == 3)
  }

  test("recallAtK: cell restriction misses cross-cell neighbors honestly") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Array(1f, 0.10f, 0f, 0f), 0),
      (1L, Array(1f, 0.20f, 0f, 0f), 0),
      (2L, Array(1f, 0.30f, 0f, 0f), 0),
      (3L, Array(0f, 1f, 0f, 0f), 0),
      (4L, Array(1f, 0f, 0f, 0f), 1)) // the true best match, in the wrong cell
      .toDF("vec_id", "embedding", "label")
    val q = Seq((99L, Array(1f, 0f, 0f, 0f), 0)).toDF("qid", "qv", "qc")
    // exact top-3 = {4, 0, 1}; cell-0 top-3 = {0, 1, 2} -> hits 2 of 3
    val r = Similarity.recallAtK(corpus, "vec_id", "embedding", "label",
      q, "qid", "qv", "qc", k = 3).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("hits") == 2L)
    assert(r.head.getAs[Long]("recall_permille") == 666L)
    // a single cell restricts to the whole corpus: recall is exactly 1
    val one = Similarity.recallAtK(corpus.withColumn("label", lit(0)),
      "vec_id", "embedding", "label", q, "qid", "qv", "qc", k = 3).collect().head
    assert(one.getAs[Long]("hits") == 3L)
    assert(one.getAs[Long]("recall_permille") == 1000L)
  }

  test("OPQ-lite: valid permutation, balanced subspace variance, exactness kept") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // dims 0-3 carry 100x the variance of dims 4-15: the contiguous split
    // would put ALL of it in subspace 0
    val vecs = (0L until 200L).map { i =>
      (i, Array.tabulate(16)(d =>
        if (d < 4) rnd.nextFloat() * 10 else rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding")
    val coarse = Similarity.trainCodebook(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val pq = Similarity.trainProductCodebook(vecs, "vec_id", "embedding",
      coarse, m = 4, ksub = 8, iters = 2, opq = true)
    val perm = pq.perm.get
    assert(perm.sorted.toSeq == (0 until 16), s"not a permutation: ${perm.mkString(",")}")
    // the four high-variance dims must spread across the four subspaces
    val highVarHomes = (0 until 4).map(d => perm.indexOf(d) / 4)
    assert(highVarHomes.toSet.size == 4,
      s"high-variance dims all in subspaces $highVarHomes — not balanced")
    // full-rerank search stays exact under the permutation
    val qv = vecs.filter($"vec_id" === 3).select($"embedding").head().getSeq[Float](0).toArray
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rank").select("id").collect().map(_.getLong(0)).toSeq
    val exact = ids(Similarity.ivfSearch(vecs, "vec_id", "embedding", coarse, qv, k = 5, nprobe = 2))
    assert(ids(Similarity.pqSearch(vecs, "vec_id", "embedding", coarse, pq, qv,
      k = 5, nprobe = 2, rerank = 200)) == exact)
    // permutation survives the save/load round-trip
    val dir = java.nio.file.Files.createTempDirectory("graft_opq").toString
    Similarity.savePqIndex(vecs, "vec_id", "embedding", coarse, pq, s"$dir/idx")
    assert(ids(Similarity.searchPqIndex(spark, s"$dir/idx", qv, k = 5, nprobe = 2,
      rerank = 200)) == exact)
  }

  test("per-cell OPQ: each cell balances its own variance, exactness and round-trip kept") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    // two well-separated clusters with DIFFERENT dominant dims: cluster A
    // (even ids) carries its variance in dims 0-3, cluster B (odd ids) in
    // dims 12-15. One global permutation can only balance their average;
    // per-cell permutations must balance each cell's own spectrum.
    val ca = Array.tabulate(16)(d => if (d < 8) 20f else -20f)
    val cb = ca.map(-_)
    val vecs = (0L until 200L).map { i =>
      val (c, lo, hi) = if (i % 2 == 0) (ca, 0, 4) else (cb, 12, 16)
      (i, Array.tabulate(16) { d =>
        c(d) + (if (d >= lo && d < hi) rnd.nextFloat() * 10 - 5
                else rnd.nextFloat() * 0.1f - 0.05f)
      })
    }.toDF("vec_id", "embedding")
    val coarse = Similarity.trainCodebook(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val pq = Similarity.trainProductCodebook(vecs, "vec_id", "embedding",
      coarse, m = 4, ksub = 8, iters = 2, opqPerCell = true)
    val perms = pq.cellPerms.get
    perms.foreach(p => assert(p.sorted.toSeq == (0 until 16),
      s"not a permutation: ${p.mkString(",")}"))

    val dir = java.nio.file.Files.createTempDirectory("graft_cell_opq").toString
    Similarity.savePqIndex(vecs, "vec_id", "embedding", coarse, pq, s"$dir/idx")
    val enc = spark.read.parquet(s"$dir/idx/vectors")
    val cellA = enc.filter($"id" === 0L).head().getAs[Int]("cell")
    val cellB = enc.filter($"id" === 1L).head().getAs[Int]("cell")
    assert(cellA != cellB, "clusters must land in different coarse cells")
    // cell A's high-variance dims (0-3) spread across the 4 subspaces
    // under ITS permutation; cell B's (12-15) under its own
    val homesA = (0 until 4).map(d => perms(cellA).indexOf(d) / 4)
    val homesB = (12 until 16).map(d => perms(cellB).indexOf(d) / 4)
    assert(homesA.toSet.size == 4, s"cell A high-var dims in subspaces $homesA")
    assert(homesB.toSet.size == 4, s"cell B high-var dims in subspaces $homesB")
    assert(!perms(cellA).sameElements(perms(cellB)),
      "the two cells' spectra differ — so must their permutations")

    // full-rerank search stays exact under per-cell permutations, both
    // in-memory and through the persisted per-cell pq_perm (cell column)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rank").select("id").collect().map(_.getLong(0)).toSeq
    val qv = vecs.filter($"vec_id" === 3).select($"embedding").head().getSeq[Float](0).toArray
    val exact = ids(Similarity.ivfSearch(vecs, "vec_id", "embedding", coarse, qv, k = 5, nprobe = 2))
    assert(ids(Similarity.pqSearch(vecs, "vec_id", "embedding", coarse, pq, qv,
      k = 5, nprobe = 2, rerank = 200)) == exact)
    assert(spark.read.parquet(s"$dir/idx/pq_perm").columns.contains("cell"))
    assert(ids(Similarity.searchPqIndex(spark, s"$dir/idx", qv, k = 5, nprobe = 2,
      rerank = 200)) == exact)

    // a permutation-less save over the per-cell index removes pq_perm too
    val plain = Similarity.trainProductCodebook(vecs, "vec_id", "embedding",
      coarse, m = 4, ksub = 8, iters = 2)
    Similarity.savePqIndex(vecs, "vec_id", "embedding", coarse, plain, s"$dir/idx")
    assert(!new java.io.File(s"$dir/idx/pq_perm").exists())
  }

  test("perm-less save over an OPQ index removes the stale pq_perm") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vecs = (0L until 100L).map { i =>
      (i, Array.tabulate(16)(d =>
        if (d < 4) rnd.nextFloat() * 10 else rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding")
    val coarse = Similarity.trainCodebook(vecs, "vec_id", "embedding", k = 2, iters = 2)
    val opq = Similarity.trainProductCodebook(vecs, "vec_id", "embedding",
      coarse, m = 4, ksub = 8, iters = 2, opq = true)
    val plain = Similarity.trainProductCodebook(vecs, "vec_id", "embedding",
      coarse, m = 4, ksub = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_stale_perm").toString
    Similarity.savePqIndex(vecs, "vec_id", "embedding", coarse, opq, s"$dir/idx")
    assert(new java.io.File(s"$dir/idx/pq_perm").exists())
    // overwrite the SAME path with a permutation-less index: the stale
    // permutation must not survive to be applied against unpermuted codes
    Similarity.savePqIndex(vecs, "vec_id", "embedding", coarse, plain, s"$dir/idx")
    assert(!new java.io.File(s"$dir/idx/pq_perm").exists(),
      "stale pq_perm from the previous OPQ save must be deleted")
    val qv = vecs.filter($"vec_id" === 3).select($"embedding").head().getSeq[Float](0).toArray
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.orderBy("rank").select("id").collect().map(_.getLong(0)).toSeq
    assert(ids(Similarity.searchPqIndex(spark, s"$dir/idx", qv, k = 5, nprobe = 2,
      rerank = 100))
      == ids(Similarity.ivfSearch(vecs, "vec_id", "embedding", coarse, qv, k = 5, nprobe = 2)))
  }

  test("hyperplane-LSH near-dup: planted pairs found, verification exact") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // 40 random base vectors; 5 of them get a tiny-perturbation twin
    val base = (0 until 40).map(i => (i.toLong, Array.fill(32)(rnd.nextFloat() * 2 - 1)))
    val twins = (0 until 5).map { i =>
      (100L + i, base(i)._2.map(v => v + rnd.nextFloat() * 0.01f))
    }
    val vecs = (base ++ twins).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupLsh(vecs, "vec_id", "embedding",
      minCosine = 0.99, nPlanes = 32, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted twin pair survives (banding recall + exact verify)
    (0 until 5).foreach(i => assert(pairs.contains((i.toLong, 100L + i)), s"missing twin $i"))
    // nothing else passes the exact cosine >= 0.99 verification
    assert(pairs.size == 5, s"unexpected pairs: $pairs")
  }

  test("batched index search equals per-query searchIndex") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val vecs = (0L until 200L).map(i => (i, Array.fill(16)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val centroids = Similarity.trainCodebook(vecs, "vec_id", "embedding", k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfb").toString
    Similarity.saveIndex(vecs, "vec_id", "embedding", centroids, s"$dir/idx")
    val queries = vecs.filter($"vec_id" < 3).select($"vec_id".as("qid"), $"embedding".as("qv"))
    val batch = Similarity.searchIndexBatch(spark, s"$dir/idx", queries, "qid", "qv", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val perQuery = queries.collect().flatMap { r =>
      val qid = r.getLong(0)
      val qv = r.getSeq[Float](1).toArray
      Similarity.searchIndex(spark, s"$dir/idx", qv, k = 5, nprobe = 2)
        .collect().map(x => (qid, x.getAs[Int]("rank"), x.getAs[Long]("id")))
    }.toSet
    assert(batch == perQuery)
  }

  test("native rolling fingerprint is bit-identical to the SQL formulation") {
    import spark.implicits._
    val texts = Seq(
      "", "a", "short", "exactly sixteen!", "a longer document with many sliding windows inside it",
      "unicode: äöü 漢字 🙂 mixed with ascii", "repeat " * 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val t = graft.pipeline.TextAnalysis
    val diff = texts.select(
      (t.rollingFingerprint("t", 16) - t.rollingFingerprintSql("t", 16)).as("d"))
      .agg(max(abs($"d"))).head().getLong(0)
    assert(diff == 0L, s"native vs SQL rolling fingerprint diverged by $diff")
  }

  test("native cosine expression is bit-identical to the SQL formulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1))).toDF("id", "v")
    val paired = vecs.crossJoin(vecs.select($"v".as("w")).limit(1))
    val diff = paired.select(
      (Similarity.cosine("v", "w") - Similarity.cosineSql("v", "w")).as("d"))
      .agg(max(abs($"d"))).head().getDouble(0)
    assert(diff == 0.0, s"native vs SQL cosine diverged by $diff")
  }

  test("brute-force ANN ranks the identical vector first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)), (3L, Array(1.0f, 0.0f, 0.001f)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter($"vec_id" === 0).select($"embedding".as("q"))
    val top = Similarity.bruteForceTopK(vecs.filter($"vec_id" =!= 0), "vec_id", "embedding", q, 2)
      .orderBy("rank").select("id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(3L, 1L))
  }

  test("IVF: trained codebook separates clusters; nprobe search finds the neighbor") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // two well-separated gaussian blobs around (±5, 0, 0, ...)
    def blob(center: Float, n: Int, base: Long) = (0 until n).map { i =>
      (base + i, Array.tabulate(8)(d =>
        (if (d == 0) center else 0f) + rnd.nextFloat() * 0.2f))
    }
    val vecs = (blob(5f, 30, 0L) ++ blob(-5f, 30, 100L)).toDF("vec_id", "embedding")
    val codebook = Similarity.trainCodebook(vecs, "vec_id", "embedding", k = 2, iters = 3)
    val assigned = Similarity.assignCell(vecs, "embedding", codebook)
      .select($"vec_id", $"cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // each blob lands in one cell
    assert((0L until 30L).map(assigned).toSet.size == 1)
    assert((100L until 130L).map(assigned).toSet.size == 1)
    assert(assigned(0L) != assigned(100L))
    // nprobe=1 search for a query near the positive blob returns positive ids only
    val query = Array.tabulate(8)(d => if (d == 0) 5f else 0f)
    val top = Similarity.ivfSearch(vecs, "vec_id", "embedding", codebook, query, k = 5, nprobe = 1)
      .select("id").collect().map(_.getLong(0))
    assert(top.length == 5 && top.forall(_ < 100L))
  }

  test("language id picks the stopword-heavy language deterministically") {
    import spark.implicits._
    val d = Seq(
      (1L, "el perro y el gato de la casa que ladra en la noche"),
      (2L, "the cat and the dog of the house in the night"),
      (3L, "der hund und die katze ist ein tier das bellt")).toDF("doc_id", "text")
    val out = d.select($"doc_id", TextAnalysis.langId($"text").as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "es", 2L -> "en", 3L -> "de"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    import spark.implicits._
    val d = Seq((1L, "Hello   World"), (2L, "hello world"), (3L, "hello worlds")).toDF("id", "text")
    val fps = d.select(TextAnalysis.fingerprint($"text")).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("decontamination flags exactly the docs sharing an eval n-gram") {
    import spark.implicits._
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // shares the eval 5-gram
      (11L, "alpha beta gamma DELTA epsilon zeta"), // case-insensitive match
      (12L, "one two three four five six seven"), // clean
      (13L, "short text")) // below n tokens
      .toDF("doc_id", "text")
    val eval = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 1L, 11L -> 1L))
  }

  test("mixture sampling is a deterministic per-language hash filter") {
    import spark.implicits._
    val d = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "the cat and the dog of the house in the night"
          else "el perro y el gato de la casa que ladra en la noche"))
      .toDF("doc_id", "text")
    val keep = TextAnalysis.mixtureSample(d, "doc_id", "text",
      Seq("en" -> 1000, "es" -> 0), defaultPermille = 0)
    val kept = keep.collect()
    // es rate 0 => only english docs survive; en rate 1000 => ALL of them
    assert(kept.forall(_.getString(1) == "en"))
    assert(kept.length == 100)
    // deterministic: a second run yields the identical id set
    assert(keep.collect().map(_.getLong(0)).toSet == kept.map(_.getLong(0)).toSet)
    // buckets come from hash60 mod 1000
    assert(kept.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 1000))
  }

  test("shuffle-shard assigns every doc a unique (shard, pos) with dense pos") {
    import spark.implicits._
    val d = (0L until 500L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = TextAnalysis.shuffleShard(d, "doc_id", nShards = 8).collect()
    assert(out.length == 500)
    val byShard = out.groupBy(_.getLong(1))
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    // positions within a shard are 1..n (dense ranks, no gaps/dupes)
    byShard.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // the order is a real permutation: not simply sorted by doc_id
    val shard0 = out.filter(_.getLong(1) == 0L).sortBy(_.getLong(2)).map(_.getLong(0))
    assert(shard0.length > 2 && shard0.toSeq != shard0.sorted.toSeq)
  }

  test("distinctive terms rank the document-specific token first") {
    import spark.implicits._
    val d = Seq(
      (1L, "the the the zebra"), // 'zebra' unique to doc 1, 'the' everywhere
      (2L, "the the quokka"),
      (3L, "the wombat wombat")).toDF("doc_id", "text")
    val out = TextAnalysis.distinctiveTerms(d, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(2L) == (("quokka", 1L, 1L))) // 1/1 = 1e9 beats the's 2/3
    assert(out(3L) == (("wombat", 2L, 1L))) // 2/1 = 2e9 tops
    assert(out(1L) == (("the", 3L, 3L))) // zebra ties at 1e9; term-asc tiebreak
  }

  test("ngram stats count occurrences and doc frequency with deterministic top-k") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c a b c"), // 'a b c' twice ('a b' twice, 'b c' twice too)
      (2L, "a b c x y z"),
      (3L, "x y z only here")).toDF("doc_id", "text")
    val out = TextAnalysis.ngramStats(d, "doc_id", "text", n = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 'a b c': 3 occurrences across 2 docs tops; then ties at 2 break on gram asc
    assert(out.head == (("a b c", 3L, 2L)), out.mkString("; "))
    assert(out.length == 2 && out(1)._2 <= 3L)
  }

  test("corpus profile: per-language counts and the exact lower median") {
    import spark.implicits._
    val d = Seq(
      (1L, "the cat and the dog"), // en, 5 tokens
      (2L, "the cat and the dog of the house in the night today now"), // en, 13
      (3L, "the and of to in is"), // en, 6
      (4L, "el perro y el gato de la casa que ladra")) // es, 10
      .toDF("doc_id", "text")
    val out = TextAnalysis.corpusProfile(d, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // en lengths sorted: 5, 6, 13 -> median rank (3+1) DIV 2 = 2 -> 6
    assert(out("en") == ((3L, 24L, 6L)), out)
    assert(out("es") == ((1L, 10L, 10L)), out)
  }

  test("multimodal resize/frame-sample stubs keep plumbing shape") {
    import spark.implicits._
    val items = Seq(Multimodal.MediaItem(1L, "video", Array.tabulate(1000)(_.toByte))).toDS()
    val resized = Multimodal.resizeStub(items, 8, 8).head()
    assert(resized.media.length == 64)
    val frames = Multimodal.sampleFramesStub(items, frames = 4, frameBytes = 100)
    assert(frames.count() == 4)
    val lens = frames.select(length($"frame_bytes")).collect().map(_.getInt(0))
    assert(lens.forall(_ == 100))
  }

  test("multimodal stub features are deterministic and length-faithful") {
    import spark.implicits._
    val media = Seq((1L, "img", "abcdefghij".getBytes("UTF-8"))).toDF("id", "kind", "media")
    val f = Multimodal.featurize(media).head()
    assert(f.getAs[Long]("n_bytes") == 10L)
    assert(f.getAs[String]("header_hex") == "6162636465666768")
    assert(f.getAs[String]("content_hash").length == 32)
  }

  test("real PNG decode: known pixels round-trip bit-exactly through imageio") {
    import spark.implicits._
    // 3x2 gray PNG with explicit pixel values
    val px = Array(Array(0, 255, 17), Array(128, 64, 200)) // [y][x]
    val png = Multimodal.encodeGrayPng(3, 2, (x, y) => px(y)(x))
    val d = Multimodal.extractDecoded(
      Seq(Multimodal.MediaItem(7L, "png", png)).toDS()).head()
    assert(d.decoder == "imageio")
    assert(d.width == 3 && d.height == 2)
    assert(d.gray_sum == px.flatten.sum.toLong)
    // undecodable media falls back to the stub (hash/length real, dims -1)
    // — driven through the DataFrame-shaped decodeFrame twin
    val junk = Multimodal.decodeFrame(
      Seq((8L, "bin", "notanimage".getBytes("UTF-8"))).toDF("id", "kind", "media"))
      .head()
    assert(junk.getAs[String]("decoder") == "stub" &&
      junk.getAs[Long]("width") == -1L && junk.getAs[Long]("gray_sum") == -1L)
    assert(junk.getAs[String]("content_hash") ==
      Multimodal.decodeStub(Multimodal.MediaItem(8L, "bin",
        "notanimage".getBytes("UTF-8"))).content_hash)
  }

  test("image dHash: hand-computed bits, scale/noise robustness, banded pairs") {
    import spark.implicits._
    // identity grid: a 9x8 image samples onto itself, so every bit is a
    // direct neighbor comparison. Even rows alternate 0,200,0,200,…:
    // g(x+1) > g(x) exactly at even x, so bits {0,2,4,6} set = 0x55 per
    // even row; odd rows are flat (7) -> 0x00
    val alt = Multimodal.MediaItem(1L, "png",
      Multimodal.encodeGrayPng(9, 8, (x, y) => if (y % 2 == 0) (x % 2) * 200 else 7))
    val h1 = Multimodal.dHashImage(alt).get
    val expected = (0 until 8).filter(_ % 2 == 0)
      .map(y => 0x55L << (y * 8)).reduce(_ | _)
    assert(h1 == expected, s"got ${h1.toHexString}, want ${expected.toHexString}")
    // scale invariance: the same pattern at 2x size hashes identically
    // (nearest-neighbor sampling lands on the same logical pixels)
    val big = Multimodal.MediaItem(2L, "png",
      Multimodal.encodeGrayPng(18, 16, (x, y) => if ((y / 2) % 2 == 0) ((x / 2) % 2) * 200 else 7))
    assert(Multimodal.dHashImage(big).get == h1)
    // corrupt blob: no hash, not a crash
    assert(Multimodal.dHashImage(Multimodal.MediaItem(3L, "png",
      Array[Byte](1, 2, 3))).isEmpty)
    // near-dup mining: a mild-noise copy stays within small hamming of
    // its source; an unrelated gradient is far
    val rnd = new scala.util.Random(5)
    val base = (x: Int, y: Int) => ((x * 29 + y * 53) % 256)
    val noisy = (x: Int, y: Int) => math.min(255, math.max(0,
      base(x, y) + (if (rnd.nextInt(20) == 0) 3 else 0)))
    val items = Seq(
      Multimodal.MediaItem(10L, "png", Multimodal.encodeGrayPng(36, 32, base)),
      Multimodal.MediaItem(11L, "png", Multimodal.encodeGrayPng(36, 32, noisy)),
      Multimodal.MediaItem(12L, "png", Multimodal.encodeGrayPng(36, 32, (x, y) => 255 - base(x, y))))
    val pairs = Multimodal.imageNearDuplicates(items.toDS(), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 11L)), s"got $pairs")
    // hammingPairs vs a driver-side brute-force reference: candidates
    // must share a 16-bit band (banding recall), survivors are exactly
    // the <= maxHamming pairs among those (exact verify + distinct)
    val docsHash = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    def bands(h: Long): Set[(Int, Long)] =
      (0 until 4).map(b => b -> (h & (0xFFFFL << (16 * b)))).toSet
    val brute = (for {
      (ia, ha) <- docsHash; (ib, hb) <- docsHash
      if ia < ib && bands(ha).intersect(bands(hb)).nonEmpty &&
        java.lang.Long.bitCount(ha ^ hb) <= 8
    } yield (ia, ib)).toSet
    val viaShared = Dedup.hammingPairs(
      Dedup.simhash(docs, "doc_id", "text"), "id", "simhash", 8)
      .select("ia", "ib").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaShared == brute, s"got $viaShared want $brute")
  }

  test("hamming clusters: identical-hash mass collapses to reps; chains transitive") {
    import spark.implicits._
    // 100 ids share hash A (the blank-page mass), B is 2 bits from A,
    // C is 2 bits from B but 4 from A (chain: A-B-C connects only
    // transitively), D is far from everything
    val A = 0x0F0F0F0FL
    val B = A ^ 0x3L          // hamming(A,B) = 2
    val C = B ^ 0x30L         // hamming(B,C) = 2, hamming(A,C) = 4
    val D = 0x7FFFFFFFFFL
    val hashes = ((0L until 100L).map(i => (i, A)) ++
      Seq((200L, B), (201L, C), (300L, D))).toDF("id", "hash")
    val clusters = Dedup.hammingClusters(hashes, "id", "hash", maxHamming = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the whole A-mass + B + C chain labels with the global min id 0
    (0L until 100L).foreach(i => assert(clusters(i) == 0L, s"id $i"))
    assert(clusters(200L) == 0L && clusters(201L) == 0L)
    assert(clusters(300L) == 300L) // far hash stays its own singleton
    // pairing happened over DISTINCT hashes only: 4 reps -> at most
    // C(4,2)=6 candidate pairs regardless of the 100-id mass
    val repPairs = Dedup.hammingPairs(
      Seq((0L, A), (200L, B), (201L, C), (300L, D)).toDF("id", "hash"),
      "id", "hash", 3).count()
    assert(repPairs == 2L) // (A,B) and (B,C) only
  }

  test("audio dHash: hand-computed envelope bits; noise-robust pairing") {
    import spark.implicits._
    // 4 non-overlapping windows of 4, L1 envelope [8, 100, 12, 120]:
    // bits = [1 (100>8), 0 (12<100), 1 (120>12)] -> 0b101 = 5
    val env = Array(2, 25, 3, 30).flatMap(v => Array.fill(4)(v.toShort))
    val clip = Multimodal.MediaItem(1L, "wav", Multimodal.encodePcmWav(8000, env))
    assert(Multimodal.audioDHash(clip, window = 4, hop = 4).contains(5L))
    // corrupt blob: no hash
    assert(Multimodal.audioDHash(
      Multimodal.MediaItem(2L, "wav", Array[Byte](9, 9)), 4, 4).isEmpty)
    // near-dup mining: same loudness envelope with small sample noise
    // hashes identically; an inverted envelope is far
    val rnd = new scala.util.Random(3)
    val base = Array.tabulate(256)(i => (math.sin(i / 8.0) * 1000).toInt)
    def wav(f: Int => Int): Array[Byte] =
      Multimodal.encodePcmWav(8000, Array.tabulate(256)(i => f(i).toShort))
    val items = Seq(
      Multimodal.MediaItem(10L, "wav", wav(i => base(i))),
      Multimodal.MediaItem(11L, "wav", wav(i => base(i) + rnd.nextInt(7) - 3)),
      Multimodal.MediaItem(12L, "wav", wav(i => 1500 - math.abs(base(i)))))
    val hashes = Multimodal.audioDHashes(items.toDS(), window = 16, hop = 8)
    val pairs = Dedup.hammingPairs(hashes, "id", "ahash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L)) && !pairs.contains((10L, 12L)), s"got $pairs")
  }

  test("gray+alpha PNG decode excludes the alpha band from the gray value") {
    // PNG color type 4 → 2-band raster (gray, alpha). Averaging both
    // bands would report (0+255)/2 = 127 per pixel on opaque black.
    val cs = java.awt.color.ColorSpace.getInstance(java.awt.color.ColorSpace.CS_GRAY)
    val cm = new java.awt.image.ComponentColorModel(cs, true, false,
      java.awt.Transparency.TRANSLUCENT, java.awt.image.DataBuffer.TYPE_BYTE)
    val raster = cm.createCompatibleWritableRaster(3, 1)
    val img = new java.awt.image.BufferedImage(cm, raster, false, null)
    val grays = Seq(0, 17, 200)
    grays.zipWithIndex.foreach { case (g, x) =>
      raster.setSample(x, 0, 0, g)
      raster.setSample(x, 0, 1, 255) // fully opaque
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val d = Multimodal.decodeImage(Multimodal.MediaItem(13L, "png", bos.toByteArray))
    assert(d.decoder == "imageio" && d.width == 3 && d.height == 1)
    assert(d.gray_sum == grays.sum.toLong,
      s"got ${d.gray_sum} — alpha band averaged in?")
  }

  test("palette-indexed GIF decodes palette COLORS, not palette indices") {
    import spark.implicits._
    // 2-entry palette: index 0 -> white, index 1 -> black. A raster-sample
    // reader would sum indices (≈ black-pixel count); the decoder must
    // resolve through the IndexColorModel
    val palette = new java.awt.image.IndexColorModel(1, 2,
      Array(255.toByte, 0.toByte), Array(255.toByte, 0.toByte),
      Array(255.toByte, 0.toByte))
    val img = new java.awt.image.BufferedImage(4, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, palette)
    // pixels: white, black, white, white → gray_sum 3*255
    img.getRaster.setSample(1, 0, 0, 1)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    val d = Multimodal.decodeImage(Multimodal.MediaItem(11L, "gif", bos.toByteArray))
    assert(d.decoder == "imageio" && d.width == 4 && d.height == 1)
    assert(d.gray_sum == 3L * 255L, s"got ${d.gray_sum} — palette indices summed?")
    // empty/headerless frame containers yield zero frames, not a crash
    assert(Multimodal.sampleDecodedFrames(
      Seq(Multimodal.MediaItem(12L, "video", Array.emptyByteArray)).toDS(), 3).count() == 0L)
  }

  test("real JPEG decode: JDK reader reports exact dimensions") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val d = Multimodal.extractDecoded(
      Seq(Multimodal.MediaItem(9L, "jpg", bos.toByteArray)).toDS()).head()
    assert(d.decoder == "imageio" && d.width == 5 && d.height == 4)
  }

  test("real nearest-neighbor resize picks floor((dst*src)/dstDim) sources") {
    import spark.implicits._
    // 4x4 source where pixel = 16*y + x: resize to 2x2 must pick
    // sources (0,0),(2,0),(0,2),(2,2) -> values 0, 2, 32, 34
    val src = Multimodal.encodeGrayPng(4, 4, (x, y) => 16 * y + x)
    val out = Multimodal.resizeImage(
      Seq(Multimodal.MediaItem(1L, "png", src)).toDS(), 2, 2)
    val d = Multimodal.extractDecoded(out).head()
    assert(d.width == 2 && d.height == 2)
    assert(d.gray_sum == (0 + 2 + 32 + 34).toLong)
    // undecodable media passes through resize unchanged
    val junkIn = Multimodal.MediaItem(2L, "bin", Array[Byte](1, 2, 3))
    val junkOut = Multimodal.resizeImage(Seq(junkIn).toDS(), 2, 2).head()
    assert(junkOut.media.toSeq == junkIn.media.toSeq)
  }

  test("frame container: pack/unpack round-trip, evenly spaced real decode") {
    import spark.implicits._
    // 4 one-pixel frames with values 10,20,30,40; sampling 3 picks
    // indices floor(3*j/2) = 0, 1, 3
    val frames = Seq(10, 20, 30, 40).map(v =>
      Multimodal.encodeGrayPng(1, 1, (_, _) => v))
    val blob = Multimodal.packFrames(frames)
    assert(Multimodal.unpackFrames(blob).map(_.toSeq) == frames.map(_.toSeq))
    val out = Multimodal.sampleDecodedFrames(
      Seq(Multimodal.MediaItem(3L, "video", blob)).toDS(), frames = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(5))).toSet
    assert(out == Set((0L, 0L, 10L), (1L, 1L, 20L), (2L, 3L, 40L)), s"got $out")
    // corrupt container refuses instead of decoding garbage
    intercept[Exception] {
      Multimodal.unpackFrames(Array[Byte](0, 0, 0, 99, 1, 2))
    }
  }

  test("BPE merge learning: greedy pair fusion with deterministic tie-breaks") {
    import spark.implicits._
    // "ab ab ab cd cd abd": char pairs a-b x4 (3 + one in abd), c-d x2,
    // b-d x1 → merge 1 = (a,b,4). After fusing: "ab ab ab c d c d ab d":
    // pairs c-d x2, ab-d x1 → merge 2 = (c,d,2). Then ab-d occurs once
    // (< 2) → early stop despite merges=5.
    val docs = Seq((1L, "ab ab ab cd cd abd")).toDF("doc_id", "text")
    val merges = TextAnalysis.trainBpeMerges(docs, "text", merges = 5)
    assert(merges == Seq(("a", "b", 4L), ("c", "d", 2L)), s"got $merges")

    // greedy left-to-right fusion on overlapping runs: "aaa" has a-a x2;
    // fusing (a,a) pairs the FIRST two, leaving "aa a" — classic BPE
    val runs = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val m2 = TextAnalysis.trainBpeMerges(runs, "text", merges = 2)
    // step 1: a-a count 6 (2 per token) → merge. repr: "aa a" x3 →
    // step 2: aa-a count 3 → merge
    assert(m2 == Seq(("a", "a", 6L), ("aa", "a", 3L)), s"got $m2")

    // the oracle-gated stats: rank 1 must be the corpus argmax pair
    val stats = TextAnalysis.bpePairStats(
      TextAnalysis.bpeInitRepr(docs, "text"), "repr", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(stats.head == ((1, "a", "b", 4L)), s"got ${stats.head}")

    // back-to-back NON-overlapping occurrences all merge in one step:
    // "abab" symbolizes to [a,b,a,b] — classic BPE fuses BOTH a-b pairs
    // ("ab ab"), so step 2 sees ab-ab x2 (plus the standalone "ab" docs)
    val backToBack = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val m3 = TextAnalysis.trainBpeMerges(backToBack, "text", merges = 2)
    // a-b x5 (2+2+1) → fuse ALL → "ab ab", "ab ab", "ab"; ab-ab x2 → merge
    assert(m3 == Seq(("a", "b", 5L), ("ab", "ab", 2L)), s"got $m3")

    // corpus symbols that are SQL-hostile (quote, backslash) flow through
    // the literal replace unharmed — no expr-string parsing anywhere
    val quoted = Seq((1L, "d's d's it's a\\b a\\b")).toDF("doc_id", "text")
    val mq = TextAnalysis.trainBpeMerges(quoted, "text", merges = 1)
    assert(mq.nonEmpty && mq.head._3 >= 2L, s"got $mq")
  }

  test("BPE apply: rank-greedy fold, hierarchical merges, train-apply consistency") {
    import spark.implicits._
    val docs = Seq((1L, "hello world")).toDF("doc_id", "text")
    // (l,l): "h e ll o"; (h,e): "he ll o"; (he,ll): "hell o" — later merges
    // build on earlier merges' symbols (rank-greedy, like training)
    val sub = TextAnalysis.applyBpe(docs, "doc_id", "text",
      Seq("l" -> "l", "h" -> "e", "he" -> "ll"))
      .collect().map(r => r.getSeq[String](1).toList).toSet
    assert(sub == Set(List("hell", "o"), List("w", "o", "r", "l", "d")), s"got $sub")
    val counts = TextAnalysis.bpeTokenCount(docs, "doc_id", "text",
      Seq("l" -> "l", "h" -> "e", "he" -> "ll")).head()
    assert(counts.getLong(1) == 7L && counts.getLong(2) == 2L)
    // applying the TRAINED merges reproduces training's fused end state
    val runs = Seq((1L, "aaa aaa aaa")).toDF("doc_id", "text")
    val trained = TextAnalysis.trainBpeMerges(runs, "text", merges = 2)
      .map { case (l, r, _) => (l, r) }
    val applied = TextAnalysis.bpeTokenCount(runs, "doc_id", "text", trained).head()
    assert(applied.getLong(1) == 3L && applied.getLong(2) == 3L) // "aaa" x3, 1 subword each
    // checkpointEvery must not change results (plan-depth bounding only)
    val chunked = TextAnalysis.bpeTokenCount(docs, "doc_id", "text",
      Seq("l" -> "l", "h" -> "e", "he" -> "ll")).collect().toSeq
    val chunked1 = TextAnalysis.applyBpe(docs, "doc_id", "text",
      Seq("l" -> "l", "h" -> "e", "he" -> "ll"), checkpointEvery = 1)
      .groupBy("id").agg(sum(size(col("subwords"))).cast("long").as("n_subwords"),
        count(lit(1)).as("n_words")).collect().toSeq
    assert(chunked.map(_.toSeq) == chunked1.map(_.toSeq))
  }

  test("BPE training on a content-hashed sample reproduces the full-corpus merges") {
    import spark.implicits._
    // every doc carries the SAME token multiset (orderings differ, so the
    // content hash differs per doc and the sample keeps a strict subset);
    // pair counts then scale proportionally and the merge sequence —
    // argmax by (count desc, pair asc) — is identical on any subset
    val perms = Seq("ab ab cd abd", "ab cd ab abd", "cd ab abd ab",
      "abd ab ab cd", "ab abd cd ab", "cd abd ab ab",
      "ab ab abd cd", "abd cd ab ab")
    val docs = perms.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val full = TextAnalysis.trainBpeMerges(docs, "text", merges = 3)
      .map { case (l, r, _) => (l, r) }
    val sampled = TextAnalysis.trainBpeMerges(docs, "text", merges = 3,
      samplePermille = 500)
    // the sample must be a real subset for the test to mean anything
    val kept = docs.filter(TextAnalysis.hash60(col("text")) % 1000 < 500).count()
    assert(kept > 0 && kept < perms.size, s"degenerate sample: $kept/${perms.size}")
    assert(sampled.map { case (l, r, _) => (l, r) } == full,
      s"sampled $sampled vs full $full")
    // and the sampled counts are the per-doc counts × kept docs (a-b x3/doc)
    assert(sampled.head._3 == kept * 3, s"got ${sampled.head}")
  }

  test("batched BPE training: overlap-free prefix ≡ sequential greedy; prefix stops at overlap") {
    import spark.implicits._
    // three DISJOINT top pairs: (x,y)=10, (q,r)=8, (x,z)=5 — the third
    // shares x with the first, so a batch of 3 admits exactly 2
    val docs = (
      Seq.fill(10)("xy") ++ Seq.fill(8)("qr") ++ Seq.fill(5)("xz")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val seqG = TextAnalysis.trainBpeMerges(docs, "text", merges = 3)
    val batched = TextAnalysis.trainBpeMerges(docs, "text", merges = 3,
      batchSize = 3)
    assert(seqG.map(m => (m._1, m._2)) == Seq(("x", "y"), ("q", "r"), ("x", "z")))
    assert(batched == seqG, s"batched $batched vs sequential $seqG")
    // the NEW-PAIR case: "abc" makes (a,b) and (b,c) tie at 6; the
    // prefix stops after (a,b) (shared b), and the next pass sees the
    // CREATED pair ("ab","c") — exactly what sequential greedy picks.
    // Skipping-instead-of-stopping would have admitted the stale (b,c).
    val abc = (0 until 6).map(i => (i.toLong, "abc")).toDF("doc_id", "text")
    val seqAbc = TextAnalysis.trainBpeMerges(abc, "text", merges = 2)
    val batAbc = TextAnalysis.trainBpeMerges(abc, "text", merges = 2,
      batchSize = 4)
    assert(seqAbc.map(m => (m._1, m._2)) == Seq(("a", "b"), ("ab", "c")))
    assert(batAbc == seqAbc, s"batched $batAbc vs sequential $seqAbc")
    // byte-level twin threads the same knob through the same loop
    val bSeq = TextAnalysis.trainByteBpeMerges(docs, "text", merges = 3)
    val bBat = TextAnalysis.trainByteBpeMerges(docs, "text", merges = 3,
      batchSize = 3)
    assert(bBat == bSeq, s"byte batched $bBat vs sequential $bSeq")
    // WordPiece: the likelihood score cnt/(cl·cr) is just as immobile
    // under disjoint fuses — same prefix rule, same equality
    val wSeq = TextAnalysis.wordpieceTrainVocab(docs, "text", merges = 3)
    val wBat = TextAnalysis.wordpieceTrainVocab(docs, "text", merges = 3,
      batchSize = 3)
    assert(wBat == wSeq, s"wordpiece batched $wBat vs sequential $wSeq")
    assert(wSeq.takeRight(3) == Seq("qr", "xy", "xz"), wSeq.toString)
  }

  test("n-gram novelty: occurrence-weighted overlap against a census") {
    import spark.implicits._
    val census = TextAnalysis.ngramStatsTable(
      Seq((0L, "a b c d")).toDF("doc_id", "text"), "doc_id", "text", 3)
    val probes = Seq(
      (1L, "a b c x y"), // grams: "a b c"(seen), "b c x", "c x y" → 1/3
      (2L, "a b c d"), // both grams seen → novelty 0
      (3L, "p q r"), // fully novel → 1000
      (4L, "a b") // < n tokens: no grams, no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramNovelty(probes, "doc_id", "text", census, 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(1L -> ((3L, 1L, 666L)), 2L -> ((2L, 2L, 0L)),
      3L -> ((1L, 0L, 1000L))), s"got $out")
    // repeated grams weigh by OCCURRENCE: "a b c a b c" has "a b c" x2
    // (seen) + "b c a" + "c a b" → 2 seen of 4
    val rep = TextAnalysis.ngramNovelty(
      Seq((7L, "a b c a b c")).toDF("doc_id", "text"), "doc_id", "text",
      census, 3).head()
    assert((rep.getLong(1), rep.getLong(2), rep.getLong(3)) == ((4L, 2L, 500L)),
      s"got $rep")
  }

  test("keep-best dedup: argmax-quality keeper, min-id tie, singleton kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "w x y z w x y z", 5L), (2L, "w x y z w x y z", 9L), // keeper 2 (quality)
      (5L, "m n o p q r", 7L), (6L, "m n o p q r", 7L), // tie → keeper 5 (min id)
      (9L, "solo text never repeated here", 1L) // singleton kept
    ).toDF("doc_id", "text", "q")
    val kept = Dedup.deduplicatedKeepBest(docs, "doc_id", "text", "q",
        n = 3, num = 4, den = 5, maxDocFreq = None)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 5L, 9L), s"got $kept")
  }

  test("PII scrub: typed placeholders, progressive counts, no double-count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail a.b+c@ex-1.co.uk or x@y.io call 555-123-4567 from 10.0.0.1"),
      (2L, "no pii here, just version 1.2 and pi 3.14"),
      (3L, "digits in email u123@h99.net must not count as phone/ip"),
      (4L, "mixed case John.Doe@Example.COM is the common real shape")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(out(1L) == ((2L, 1L, 1L,
      "mail <EMAIL> or <EMAIL> call <PHONE> from <IP>")), s"got ${out(1L)}")
    // a privacy operator can't be lowercase-only (ADVICE r16)
    assert(out(4L) == ((1L, 0L, 0L,
      "mixed case <EMAIL> is the common real shape")), s"got ${out(4L)}")
    assert(out(2L) == ((0L, 0L, 0L,
      "no pii here, just version 1.2 and pi 3.14")), s"got ${out(2L)}")
    // the email's digits are scrubbed BEFORE phone/IP counting runs
    assert(out(3L) == ((1L, 0L, 0L,
      "digits in email <EMAIL> must not count as phone/ip")), s"got ${out(3L)}")
  }

  test("edit-verify snapshot probe ≡ cross-split one-shot nominate+confirm") {
    import spark.implicits._
    // near-dup pairs must clear a 16-bit band: identical docs guarantee
    // it; the cross pair (2, 3) differs by one token
    val docs = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),
      (4L, "one two three four five six seven eight"),
      (5L, "one two three four five six seven eight"),
      (6L, "totally unrelated content nothing shared here at all"),
      (7L, "other text entirely different again nothing common")
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ev_snap").toString
    Dedup.saveSimhashCorpus(docs.filter($"doc_id" % 2 === 0), "doc_id", "text",
      s"$tmp/snap")
    val probe = Dedup.editVerifyAgainstSnapshot(
      docs.filter($"doc_id" % 2 === 1), "doc_id", "text", s"$tmp/snap",
      maxHamming = 10, maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // one-shot: nominate over ALL docs, confirm, keep cross-split pairs
    // reoriented (corpus=even first)
    val oneShot = Dedup.editVerifiedPairs(
      Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 10),
      docs, "doc_id", "text", maxDist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter { case (a, b, _) => (a % 2 == 0) != (b % 2 == 0) }
      .map { case (a, b, d) => if (a % 2 == 0) (a, b, d) else (b, a, d) }
      .toSet
    assert(probe == oneShot && probe.contains((4L, 5L, 0L)), s"got $probe vs $oneShot")
  }

  test("edit-distance verification: banded confirm/refute report over candidate pairs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdef"), (2L, "abcxef"), // d=1 substitution
      (3L, "abcdef"), // d=0 exact dup
      (4L, "zzzzzz"), // d=6, refuted at maxDist=4
      (5L, "ab") // d=4 via length alone — the length-prune boundary
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("ia", "ib")
    val out = Dedup.editVerifiedPairs(pairs, docs, "doc_id", "text", maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // refuted pairs stay VISIBLE as -1 (report, not filter)
    assert(out == Set((1L, 2L, 1L), (1L, 3L, 0L), (1L, 4L, -1L), (1L, 5L, 4L)),
      s"got $out")
    // boundary: distance EXACTLY maxDist confirms (<=, not <)
    val b = Dedup.editVerifiedPairs(Seq((1L, 4L)).toDF("ia", "ib"), docs,
      "doc_id", "text", maxDist = 6).head().getLong(2)
    assert(b == 6L, s"got $b")
  }

  test("byte-level BPE: GPT-2 remap, Ġ-boundary merges, lossless roundtrip, ids") {
    import spark.implicits._
    // the remap table pins GPT-2's bytes_to_unicode: printable bytes map
    // to themselves, space → Ġ (U+0120), and multi-byte UTF-8 splits
    // ("é" = C3 A9 → Ã ©)
    assert(TextAnalysis.ByteSymbols(97) == "a")
    assert(TextAnalysis.ByteSymbols(32) == "Ġ") // Ġ
    assert(TextAnalysis.ByteSymbols.distinct.size == 256)
    val symRow = Seq(Tuple1("é")).toDF("s")
      .select(TextAnalysis.byteSymbols(col("s"))).head()
    assert(symRow.getSeq[String](0) == Seq("Ã", "©"), s"got $symRow")

    // trainer at byte grain: " ab" symbolizes to [Ġ a b] — boundary
    // pairs COUNT. a-b ties Ġ-a at 4 and wins the pair-asc tie-break
    // ("a" < "Ġ" in UTF-8 byte order); merge 2 is the boundary fuse
    // (Ġ, ab) — the word-initial vocabulary GPT-2 actually learns
    val docs = Seq((1L, "ab ab ab cd cd abd")).toDF("doc_id", "text")
    val merges = TextAnalysis.trainByteBpeMerges(docs, "text", merges = 3)
    assert(merges == Seq(("a", "b", 4L), ("Ġ", "ab", 4L), ("c", "d", 2L)),
      s"got $merges")

    // lossless roundtrip on non-ASCII + emoji, AFTER merges: decoding a
    // token's concatenated subwords reproduces ' ' ++ token exactly —
    // byte-level has no <unk>, any input is in-vocab
    val uni = Seq((1L, "héllo wörld 😀 ab")).toDF("doc_id", "text")
    val rt = TextAnalysis.applyByteBpe(uni, "doc_id", "text",
        merges.map { case (l, r, _) => (l, r) })
      .select(TextAnalysis.byteBpeDecode(col("subwords")).as("back"))
      .collect().map(_.getString(0)).toSet
    assert(rt == Set(" héllo", " wörld", " 😀", " ab"), s"got $rt")

    // integer ids: base symbols carry their byte value (a=0x61=97,
    // Ġ=32), merged symbols take 256+rank in merge order
    val enc = TextAnalysis.byteBpeEncode(Seq((7L, "ab cd x")).toDF("doc_id", "text"),
        "doc_id", "text", Seq("a" -> "b", "Ġ" -> "ab"))
      .orderBy(col("tok_pos"), col("ord"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(enc == List((0L, 0L, 257L), // " ab" → [Ġab]
      (1L, 0L, 32L), (1L, 1L, 99L), (1L, 2L, 100L), // " cd" → [Ġ c d]
      (2L, 0L, 32L), (2L, 1L, 120L)), s"got $enc") // " x" → [Ġ x]

    // duplicate fused symbol (two paths to "abc") refuses loudly
    intercept[IllegalArgumentException] {
      TextAnalysis.byteBpeEncode(uni, "doc_id", "text",
        Seq("a" -> "b", "ab" -> "c", "b" -> "c", "a" -> "bc"))
    }

    // tokcount = char-level count + nothing surprising on pure ASCII
    // with no merges beyond the Ġ prefix: every token costs its byte
    // length + 1 (the Ġ)
    val tc = TextAnalysis.byteBpeTokenCount(docs, "doc_id", "text", Seq.empty)
      .head()
    assert(tc.getLong(1) == 13L + 6L && tc.getLong(2) == 6L, s"got $tc")
  }

  test("bigram LM: hand-computed conditionals; fluent beats shuffled; hard-zero unseen") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the dog sat"),
      (4L, "one")) // <2 tokens: no transitions, no row
    val docs = corpus.toDF("doc_id", "text")
    val model = TextAnalysis.trainBigramLm(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // c(the ·)=3: the->cat 2/3 -> 666, the->dog 1/3 -> 333
    // c(cat ·)=2: cat->sat 500, cat->ran 500; dog->sat 1000
    assert(model == Map("the cat" -> 666L, "the dog" -> 333L,
      "cat sat" -> 500L, "cat ran" -> 500L, "dog sat" -> 1000L), s"got $model")
    val scores = TextAnalysis.bigramLmScoreSelf(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(scores(1L) == ((666L + 500L, 2L)))
    assert(scores(3L) == ((333L + 1000L, 2L)))
    assert(!scores.contains(4L))
    // scoring NEW text against the trained model: unseen bigrams weigh 0
    val probe = Seq((9L, "the cat zzz")).toDF("doc_id", "text")
    val m = TextAnalysis.trainBigramLm(docs, "text")
    val p9 = TextAnalysis.bigramLmScore(probe, "doc_id", "text", m).head()
    assert(p9.getLong(1) == 666L && p9.getLong(2) == 2L)
    // the filtering property: a doc of corpus-fluent transitions
    // outscores its own shuffled (gibberish) permutation per transition
    val fluent = TextAnalysis.bigramLmScore(
      Seq((10L, "the cat sat")).toDF("doc_id", "text"), "doc_id", "text", m).head()
    val garbled = TextAnalysis.bigramLmScore(
      Seq((11L, "sat the cat")).toDF("doc_id", "text"), "doc_id", "text", m).head()
    assert(fluent.getLong(1) * garbled.getLong(2) > garbled.getLong(1) * fluent.getLong(2))
  }

  test("vocabRichness: hand-computed Chao1 and Good-Turing mass; zero-doubleton case defined") {
    import spark.implicits._
    // group g: counts a=1 b=1 c=2 d=3 → N=7 D=4 f1=2 f2=1
    //   chao1 = 4 + 2·1/(2·2) = 4.5 → 4,500,000 micro; unseen = 2000/7 = 285
    // group h: counts x=1 y=1 → N=2 D=2 f1=2 f2=0
    //   chao1 = 2 + 2·1/2 = 3.0 (the +1 keeps f2=0 defined); unseen 1000
    val docs = Seq(
      ("g", "a b c"), ("g", "c d d d"),
      ("h", "x y")).toDF("source", "text")
    val got = TextAnalysis.vocabRichness(docs, "source", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(got("g") == ((7L, 4L, 2L, 1L, 4500000L, 285L)), got.toString)
    assert(got("h") == ((2L, 2L, 2L, 0L, 3000000L, 1000L)))
  }

  test("zipfSlope: exact integer least squares matches a BigInt reference; singleton group emits no row") {
    import spark.implicits._
    // group g: counts a=4 b=2 c=1 (ranks 1,2,3); group h: one type only
    val docs = Seq(("g", "a a a a b b c"), ("h", "solo")).toDF("source", "text")
    val rows = TextAnalysis.zipfSlope(docs, "source", "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def mi(d: Double) = BigInt(math.round(d * 1e6))
    val x = Seq(1, 2, 3).map(r => mi(math.log(r)))
    val y = Seq(4, 2, 1).map(c => mi(math.log(c)))
    val n = BigInt(3)
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val sxx = x.map(a => a * a).sum
    val num = BigInt(1000000) * (n * sxy - sx * sy)
    val den = n * sxx - sx * sx
    val expected = (num - ((num % den + den) % den)) / den
    assert(rows("g") == ((3L, expected.toLong)), s"got $rows expected $expected")
    assert(expected < 0, "zipf slope must be negative")
    assert(!rows.contains("h"))
  }

  test("stupid backoff: hand-computed cascade through all three orders") {
    import spark.implicits._
    // reference corpus: toks a b c a b d  (N=6)
    // trigrams: "a b c" 1, "b c a" 1, "c a b" 1, "a b d" 1
    //   ctx "a b" den=2; ctx "b c" den=1; ctx "c a" den=1
    // bigrams: "a b" 2, "b c" 1, "c a" 1, "b d" 1
    //   ctx a den=2; ctx b den=2; ctx c den=1
    // unigrams: a 2, b 2, c 1, d 1
    val ref = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val model = TextAnalysis.trainBackoffLm(ref, "text")
    val m = model.collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m((3, "a b c")) == 500L && m((3, "a b d")) == 500L &&
      m((3, "b c a")) == 1000L, s"got $m")
    assert(m((2, "a b")) == 400L && m((2, "b c")) == 200L &&
      m((2, "b d")) == 200L && m((2, "c a")) == 400L)
    assert(m((1, "a")) == 53L && m((1, "c")) == 26L)
    // scored doc "c x a b c": transitions
    //  "c x a": g3 miss, g2 "x a" miss, g1 "a" -> 53
    //  "x a b": g3 miss, g2 "a b" -> 400
    //  "a b c": g3 hit -> 500
    val got = TextAnalysis.backoffLmScore(
      Seq((1L, "c x a b c")).toDF("doc_id", "text"), "doc_id", "text",
      model).head()
    assert(got.getLong(1) == 53L + 400L + 500L && got.getLong(2) == 3L,
      s"got $got")
    // fully-unseen transition scores 0; <3 tokens -> no row
    val zero = TextAnalysis.backoffLmScore(
      Seq((2L, "x y z"), (3L, "a b")).toDF("doc_id", "text"), "doc_id",
      "text", model).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zero == Map(2L -> 0L))
  }

  test("lexical + hybrid retrieval: integer idf, rank-sum fusion with penalties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana"),
      (3L, "apple zebra"),
      (4L, "unrelated words here")).toDF("doc_id", "text")
    // N=4; df: apple 3, banana 2, cherry 1 → weights 1333, 2000, 4000
    val lex = TextAnalysis.lexicalTopK(docs, "doc_id", "text", "apple banana cherry", 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(lex == Set((1, 1L, 7333L), (2, 2L, 3333L), (3, 3L, 1333L)), s"got $lex")

    // vector pool ranks id4 then id3; lexical pool (poolK=2) ranks id1
    // then id2 — fusion with penalty 3: id1=1+3, id4=3+1, id2=2+3, id3=3+2
    val emb = Seq(
      (1L, Array(0f, 1f)), (2L, Array(0.5f, 0.5f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val hyb = Similarity.hybridTopK(docs, "doc_id", "text", emb, "vec_id", "embedding",
      "apple banana cherry", Array(1f, 0f), k = 3, poolK = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(hyb == Set((1, 1L, 4L), (2, 4L, 4L), (3, 2L, 5L)), s"got $hyb")

    // IVF-pooled variant: cell 0 = {3, 4}, cell 1 = {1, 2}; a query in
    // cell 0 can only pool vectors 4 and 3 — vector ranks 1 and 2 stay,
    // but ids 1/2 now take the vector-absence penalty instead of ranking
    val embCells = Seq(
      (1L, Array(0f, 1f), 1L), (2L, Array(0.5f, 0.5f), 1L),
      (3L, Array(0.9f, 0.1f), 0L), (4L, Array(1f, 0f), 0L))
      .toDF("vec_id", "embedding", "cell")
    val q = Seq((Array(1f, 0f), 0L)).toDF("q", "qcell")
    val hybIvf = Similarity.hybridTopKIvf(docs, "doc_id", "text",
      embCells, "vec_id", "embedding", "cell",
      "apple banana cherry", q, k = 4, poolK = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // lex pool: id1 r1, id2 r2; vec pool (cell 0): id4 r1, id3 r2
    // sums: id1 1+3=4, id2 2+3=5, id3 3+2=5, id4 3+1=4
    assert(hybIvf == Set((1, 1L, 4L), (2, 4L, 4L), (3, 2L, 5L), (4, 3L, 5L)),
      s"got $hybIvf")
  }

  test("trained langid: reproduces heuristic labels and generalizes past stopwords") {
    import spark.implicits._
    val docs = Seq(
      (1L, "der hund und die katze ist ein tier das"),
      (2L, "the quick fox and the dog of to in is"),
      (3L, "el perro que corre y la casa en madrid"),
      (4L, "le chien et les chats un paris de")).toDF("doc_id", "text")
    val out = TextAnalysis.langIdTrained(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val heur = docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == heur, s"trained $out vs heuristic $heur")
    // the trained model generalizes: a probe of purely NON-stopword tokens
    // seen only under one language's docs still classifies to that language
    // (the heuristic scores it 0-0-0-0 and defaults to 'de' only by
    // tie-break; here the model has real evidence)
    val w = TextAnalysis.trainLangIdWeights(
      docs.withColumn("__lang", TextAnalysis.langId(col("text"))), "text", "__lang",
      TextAnalysis.langStopwords.map(_._1))
    val probe = Seq((9L, "perro corre casa madrid")).toDF("doc_id", "text")
    val p = TextAnalysis.langIdScoreWith(probe, "doc_id", "text", w)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(p == Map(9L -> "es"), s"got $p")
  }

  test("batched hybrid retrieval: batch == per-query singles") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana cherry"),
      (2L, "apple banana"),
      (3L, "apple zebra"),
      (4L, "unrelated words here")).toDF("doc_id", "text")
    val embCells = Seq(
      (1L, Array(0f, 1f), 1L), (2L, Array(0.5f, 0.5f), 1L),
      (3L, Array(0.9f, 0.1f), 0L), (4L, Array(1f, 0f), 0L))
      .toDF("vec_id", "embedding", "cell")
    val qs = Seq(
      (100L, Seq("apple", "banana", "cherry"), Array(1f, 0f), 0L),
      (200L, Seq("zebra", "words"), Array(0f, 1f), 1L))
      .toDF("qid", "qterms", "q", "qcell")
    val batch = Similarity.hybridTopKIvfBatch(docs, "doc_id", "text",
      embCells, "vec_id", "embedding", "cell", qs, k = 4, poolK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val singles = Seq(
      (100L, "apple banana cherry", Array(1f, 0f), 0L),
      (200L, "zebra words", Array(0f, 1f), 1L)).flatMap { case (qid, qt, qv, qc) =>
      val q = Seq((qv, qc)).toDF("q", "qcell")
      Similarity.hybridTopKIvf(docs, "doc_id", "text", embCells, "vec_id", "embedding",
        "cell", qt, q, k = 4, poolK = 2)
        .collect().map(r => (qid, r.getInt(0), r.getLong(1), r.getLong(2)))
    }.toSet
    assert(batch == singles, s"batch $batch vs singles $singles")
  }

  test("minhash snapshot: incremental shard-vs-corpus near-dups, exact verified") {
    import spark.implicits._
    // corpus doc 2 vs shard doc 1: 30 tokens, last one edited — 28
    // 3-gram shingles each, exactly one differs → inter 27, uni 29
    val base = (1 to 30).map(i => s"a$i").mkString(" ")
    val edited = ((1 to 29).map(i => s"a$i") :+ "zz").mkString(" ")
    val corpus = Seq((2L, base),
      (4L, (1 to 30).map(i => s"b$i").mkString(" "))).toDF("doc_id", "text")
    val shard = Seq((1L, edited),
      (3L, (1 to 30).map(i => s"c$i").mkString(" "))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_snap_spec").toString
    Dedup.saveMinhashSnapshot(corpus, "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, path = s"$dir/snap")
    assert(new java.io.File(s"$dir/snap/buckets").exists)
    assert(new java.io.File(s"$dir/snap/shingles").exists)
    assert(new java.io.File(s"$dir/snap/sizes").exists)
    val out = Dedup.nearDupsAgainstSnapshot(shard, "doc_id", "text", s"$dir/snap",
      n = 3, numHashes = 32, bands = 8, num = 4, den = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // (1,2) found with TRUE Jaccard stats; unrelated docs 3/4 pair with
    // nothing; corpus-corpus and shard-shard pairs are out of scope by
    // construction (the snapshot holds only the corpus side)
    assert(out == Set((1L, 2L, 27L, 29L)), s"got $out")
  }

  test("containment near-dups: quote found directed, invisible to Jaccard, guard applies") {
    import spark.implicits._
    val book = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15 t16 t17 t18 t19 t20"
    val quote = "t5 t6 t7 t8 t9 t10" // contiguous excerpt: all 4 of its 3-shingles in the book
    val docs = Seq((1L, book), (2L, quote),
      (3L, "u1 u2 u3 u4 u5")).toDF("doc_id", "text")
    val got = Dedup.containmentNearDuplicates(docs, "doc_id", "text",
      n = 3, num = 4, den = 5, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // quote ⊆ book: containment 4/4 = 1; book ⊄ quote (4/18); doc 3 nowhere
    assert(got == Set((2L, 1L, 4L, 4L)), s"got $got")
    // the same pair is INVISIBLE to symmetric Jaccard at the same bar
    assert(Dedup.nearDuplicates(docs, "doc_id", "text", 3, 4, 5,
      maxDocFreq = None).isEmpty)
    // the df skew guard gates candidate nomination here too
    assert(Dedup.containmentNearDuplicates(docs, "doc_id", "text",
      n = 3, num = 4, den = 5, maxDocFreq = Some(1)).isEmpty)
  }

  test("unigramSegment: reading-order pieces; counts are the freq-weighted aggregate") {
    import spark.implicits._
    val docs = Seq((0L, "abab abab ab"), (1L, "abab cd cd"), (2L, "qq xy"))
      .toDF("doc_id", "text")
    val words = TextAnalysis.unigramWords(docs, "text", maxWordLen = 12)
    val weights = TextAnalysis.unigramWeights(
      TextAnalysis.unigramSeedVocab(words, maxPieceLen = 2, minCount = 2))
    val seg = TextAnalysis.unigramSegment(words, weights, maxPieceLen = 2)
    val got = seg.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      ("abab", 0L, "ab"), ("abab", 1L, "ab"),
      ("ab", 0L, "ab"), ("cd", 0L, "cd"),
      ("qq", 0L, "q"), ("qq", 1L, "q"),
      ("xy", 0L, "x"), ("xy", 1L, "y")), s"got $got")
    // one definition: the count step equals Σ freq over segment rows
    val viaSeg = seg.join(words, Seq("word"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("e_cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = TextAnalysis.unigramViterbiCounts(words, weights, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaSeg == counts, s"$viaSeg vs $counts")
  }

  test("phraseMatches: overlapping occurrences, repeated terms, indexed twin identical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),   // "a b a" matches at 0 AND 2 (overlap)
      (2L, "x a b a y"),   // at 1
      (3L, "a b c"),       // prefix only: no match
      (4L, "the the the")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows(TextAnalysis.phraseMatches(docs, "doc_id", "text", "a b a"))
    assert(got == Set((1L, 0L), (1L, 2L), (2L, 1L)), s"got $got")
    // repeated-term phrase: anchors must not self-collide
    val rep = rows(TextAnalysis.phraseMatches(docs, "doc_id", "text", "the the"))
    assert(rep == Set((4L, 0L), (4L, 1L)), s"got $rep")
    // the persisted-artifact twin is row-identical
    val tmp = java.nio.file.Files.createTempDirectory("phrix").toString
    TextAnalysis.positionalPostings(docs, "doc_id", "text")
      .write.parquet(s"$tmp/postings")
    val idx = rows(TextAnalysis.phraseMatchesIndexed(
      spark.read.parquet(s"$tmp/postings"), "a b a"))
    assert(idx == got, s"indexed $idx vs adhoc $got")
    // NEAR/k: either order inside the window — y@4 and x@0 in doc 2 sit
    // at distance 4: outside window 3, inside window 4
    val near = TextAnalysis.proximityMatches(
      TextAnalysis.positionalPostings(docs, "doc_id", "text"), "y", "x", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(near == Set.empty, s"got $near")
    val near4 = TextAnalysis.proximityMatches(
      TextAnalysis.positionalPostings(docs, "doc_id", "text"), "y", "x", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(near4 == Set((2L, 4L, 0L)), s"got $near4")
    // same term NEAR itself: pairs exist, self-position excluded
    val selfN = TextAnalysis.proximityMatches(
      TextAnalysis.positionalPostings(docs, "doc_id", "text"), "the", "the", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(selfN == Set((4L, 0L, 1L), (4L, 0L, 2L), (4L, 1L, 0L), (4L, 1L, 2L),
      (4L, 2L, 0L), (4L, 2L, 1L)), s"got $selfN")
    // append-only fold: two disjoint runs probe ≡ ad-hoc; a colliding
    // re-ingest fails loudly instead of doubling positions
    val fb = java.nio.file.Files.createTempDirectory("phrfold").toString
    TextAnalysis.appendPositionalPostings(
      docs.filter(col("doc_id") <= 2L), "doc_id", "text", s"$fb/p", "0")
    TextAnalysis.appendPositionalPostings(
      docs.filter(col("doc_id") > 2L), "doc_id", "text", s"$fb/p", "1")
    val folded = rows(TextAnalysis.phraseMatchesIndexed(
      spark.read.parquet(s"$fb/p"), "a b a"))
    assert(folded == got, s"folded $folded vs adhoc $got")
    val clash = intercept[IllegalArgumentException] {
      TextAnalysis.appendPositionalPostings(
        docs.filter(col("doc_id") === 1L), "doc_id", "text", s"$fb/p", "2")
    }
    assert(clash.getMessage.contains("collide"), clash.getMessage)
    // redelivery of the SAME run tag is idempotent: the probe excludes
    // the tag being overwritten, and the store's rows don't double
    TextAnalysis.appendPositionalPostings(
      docs.filter(col("doc_id") <= 2L), "doc_id", "text", s"$fb/p", "0")
    val redelivered = rows(TextAnalysis.phraseMatchesIndexed(
      spark.read.parquet(s"$fb/p"), "a b a"))
    assert(redelivered == got, s"redelivered $redelivered vs adhoc $got")
    // compaction is layout-only: runs fold to the single run=compacted
    // partition, probe unchanged, and the lifecycle CONTINUES — a fresh
    // append + its collision probe still work against the compacted store
    TextAnalysis.compactPositionalPostings(spark, s"$fb/p")
    val compacted = spark.read.parquet(s"$fb/p")
    assert(compacted.select("run").distinct().collect()
      .map(_.get(0).toString).toSet == Set("compacted"))
    assert(rows(TextAnalysis.phraseMatchesIndexed(compacted, "a b a")) == got)
    TextAnalysis.appendPositionalPostings(
      Seq((9L, "a b a")).toDF("doc_id", "text"), "doc_id", "text", s"$fb/p", "5")
    val grown = rows(TextAnalysis.phraseMatchesIndexed(
      spark.read.parquet(s"$fb/p"), "a b a"))
    assert(grown == got + ((9L, 0L)), s"got $grown")
  }

  test("dropContainedFragments: strict drops, mutual keeps smaller id, chain collapses") {
    import spark.implicits._
    val book = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15 t16 t17 t18 t19 t20"
    val docs = Seq(
      (1L, book),
      (2L, "t5 t6 t7 t8 t9 t10"), // strict fragment of 1 -> drops
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8"),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8"), // mutual with 3 -> larger id drops
      (6L, "u3 u4 u5 u6 u7"), // fragment of BOTH 3 and 4 -> drops
      (5L, "x1 x2 x3 x4 x5")).toDF("doc_id", "text")
    val got = Dedup.dropContainedFragments(docs, "doc_id", "text",
      n = 3, num = 4, den = 5, maxDocFreq = None)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L, 5L), s"got $got")
  }

  test("containment snapshot probe: both directions, fold law, combined-df guard") {
    import spark.implicits._
    val book = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15 t16 t17 t18 t19 t20"
    val frag = "u5 u6 u7 u8 u9"
    val corpus = Seq( // even ids = the standing corpus
      (2L, book), // superset of the arriving quote (shard ⊆ corpus)
      (4L, frag), // fragment of an arriving superset (corpus ⊆ shard)
      (6L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    val shard = Seq( // odd ids = the arriving shard
      (1L, "t5 t6 t7 t8 t9 t10"), // quote from the book
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13 u14 u15"),
      (5L, "x1 x2 x3 x4 x5")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("contsnap").toString
    Dedup.saveShinglePostings(corpus, "doc_id", "text", n = 3, path = path)
    val got = Dedup.containmentAgainstSnapshot(shard, "doc_id", "text", path,
      n = 3, num = 4, den = 5, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 2L, 4L, 4L), (4L, 3L, 3L, 3L)), s"got $got")
    // fold law: probe ≡ the batch rows crossing the shard/corpus split
    val batch = Dedup.containmentNearDuplicates(corpus.unionByName(shard),
      "doc_id", "text", n = 3, num = 4, den = 5, maxDocFreq = None)
      .filter(col("sub_id") % 2 =!= col("sup_id") % 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == batch, s"probe $got vs batch $batch")
    // combined-df guard: cap 1 kills every shared shingle -> no pairs
    assert(Dedup.containmentAgainstSnapshot(shard, "doc_id", "text", path,
      n = 3, num = 4, den = 5, maxDocFreq = Some(1)).isEmpty)
  }

  test("wordpieceSegment: greedy longest match, all-or-nothing UNK, continuation marks") {
    import spark.implicits._
    val words = Seq(("abc", 1L), ("aba", 1L), ("xyz", 1L)).toDF("word", "freq")
    val vocab = Seq("a", "ab", "##b", "##c").toDF("piece")
    val got = TextAnalysis.wordpieceSegment(words, vocab, maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      // greedy takes "ab" (longest at cursor 1), then the continuation
      ("abc", 0L, "ab"), ("abc", 1L, "##c"),
      // greedy dead end: "ab" consumes, "##a" missing -> NO backtrack to
      // "a"+"##b"+... : the whole word is [UNK] (BERT's rule)
      ("aba", 0L, "[UNK]"),
      // no vocab edge at all (chars unseen): still one [UNK] row
      ("xyz", 0L, "[UNK]")), s"got $got")
  }

  test("wordpieceVocab: position marking + marked-string single-char fallback") {
    import spark.implicits._
    val words = Seq(("aab", 2L)).toDF("word", "freq")
    val got = TextAnalysis.wordpieceVocab(words, maxPieceLen = 2, minCount = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // all counts are 2 < minCount: only the single-char fallbacks stay,
    // in marked form ("a" word-initial; "##a"/"##b" continuations)
    assert(got == Set(("a", 2L), ("##a", 2L), ("##b", 2L)), s"got $got")
  }

  test("wordpieceTrainVocab: likelihood argmax beats raw count; vocab feeds segment") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab ab cd cd az zb")).toDF("doc_id", "text")
    // pair counts: (a,##b)=3, (c,##d)=2, (a,##z)=1, (z,##b)=1
    // symbol counts: a=4, ##b=4, c=2, ##d=2, z=1, ##z=1
    // BPE would fuse (a,##b) (count 3); WordPiece scores
    // 3/(4*4)=0.1875 < 2/(2*2)=0.5 and fuses "cd" FIRST
    val vocab = TextAnalysis.wordpieceTrainVocab(docs, "text", merges = 2)
    assert(vocab == Seq("##b", "##d", "##z", "a", "c", "z", "cd", "ab"),
      s"got $vocab")
    // the learned vocab drives greedy apply directly
    val seg = TextAnalysis.wordpieceSegment(
      Seq(("cd", 1L), ("az", 1L)).toDF("word", "freq"),
      vocab.toDF("piece"), maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(seg == Set(("cd", 0L, "cd"), ("az", 0L, "a"), ("az", 1L, "##z")),
      s"got $seg")
  }

  test("unigramTokenCount/unigramEncode: <unk> word counts 1 and encodes id 0") {
    import spark.implicits._
    val docs = Seq((1L, "abab zz abab")).toDF("doc_id", "text")
    // weights trained on a DIFFERENT corpus without 'z': "zz" is
    // unreachable (no segment rows) -> counts 1, encodes (0, 0)
    val trainWords = TextAnalysis.unigramWords(
      Seq((9L, "abab abab ab")).toDF("doc_id", "text"), "text", maxWordLen = 12)
    val weights = TextAnalysis.unigramWeights(
      TextAnalysis.unigramSeedVocab(trainWords, maxPieceLen = 2, minCount = 2))
    val tc = TextAnalysis.unigramTokenCount(docs, "doc_id", "text", weights,
      maxPieceLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // abab -> 2 pieces ("ab","ab") x2 occurrences + zz -> 1 = 5 over 3
    assert(tc == Set((1L, 5L, 3L)), s"got $tc")
    val enc = TextAnalysis.unigramEncode(docs, "doc_id", "text", weights,
      maxPieceLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // vocab sort order: a=1, ab=2, b=3 ('a' < 'ab' < 'b')
    assert(enc == Set(
      (1L, 0L, 0L, 2L), (1L, 0L, 1L, 2L),
      (1L, 1L, 0L, 0L),
      (1L, 2L, 0L, 2L), (1L, 2L, 1L, 2L)), s"got $enc")
  }

  test("wordpieceEncode: sort-order ids, [UNK]=0 wins even over a literal piece") {
    import spark.implicits._
    val docs = Seq((1L, "abc xyz abc")).toDF("doc_id", "text")
    // binary sort order ('#'=35 < '['=91 < 'a'=97): ##c=1, [UNK]=2,
    // a=3, ab=4; the engine's [UNK] ROWS must encode 0, NOT the literal
    // "[UNK]" piece's own id 2
    val vocab = Seq("a", "ab", "##c", "[UNK]").toDF("piece")
    val got = TextAnalysis.wordpieceEncode(docs, "doc_id", "text", vocab,
      maxPieceLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // abc -> ab(4) + ##c(1); xyz -> [UNK](0)
    assert(got == Set(
      (1L, 0L, 0L, 4L), (1L, 0L, 1L, 1L),
      (1L, 1L, 0L, 0L),
      (1L, 2L, 0L, 4L), (1L, 2L, 1L, 1L)), s"got $got")
  }

  test("wordpieceTokenCount: per-doc piece totals; [UNK] counts 1") {
    import spark.implicits._
    val docs = Seq((1L, "abc abc xyz"), (2L, "ab")).toDF("doc_id", "text")
    val vocab = Seq("a", "ab", "##b", "##c").toDF("piece")
    val got = TextAnalysis.wordpieceTokenCount(docs, "doc_id", "text",
      vocab, maxPieceLen = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1: abc=2 pieces x2 occurrences + xyz=[UNK]=1 -> 5 over 3 words
    assert(got == Set((1L, 5L, 3L), (2L, 1L, 1L)), s"got $got")
  }

  test("span registry: fold ≡ full recompute, crossing re-derives, loud bounds") {
    import spark.implicits._
    // corpus: doc 1 holds a span UNIQUE in the corpus (no island yet);
    // docs 2/3 share one (standing islands); doc 5 shares nothing
    val corpus = Seq(
      (1L, "a b c d e x1 x2 x3"),
      (2L, "p q r s t u"),
      (3L, "p q r s t v"),
      (5L, "w1 w2 w3 w4 w5")).toDF("doc_id", "text")
    // shard: doc 11 CROSSES doc 1's span over the threshold; docs 13/15
    // repeat a span within the shard alone; doc 17 is clean
    val shard = Seq(
      (11L, "a b c d e y1 y2"),
      (13L, "m n o k1"),
      (15L, "m n o k2"),
      (17L, "z1 z2 z3 z4")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_spanreg_spec").toString
    Dedup.saveSpanRegistry(corpus, "doc_id", "text",
      minTokens = 3, minDocs = 2, path = s"$dir/reg")
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val folded = toSet(Dedup.spanIslandsAgainstRegistry(shard, "doc_id", "text",
      s"$dir/reg", minTokens = 3, minDocs = 2))
    val full = toSet(Dedup.maximalRepeatedSpans(corpus.unionByName(shard),
      "doc_id", "text", minTokens = 3, minDocs = 2))
    assert(folded == full, s"folded $folded != full $full")
    // the crossing actually happened: doc 1's island exists ONLY after
    // the fold (the standing report had no row for it)
    assert(spark.read.parquet(s"$dir/reg/islands")
      .filter(col("id") === 1L).isEmpty)
    assert(folded.contains((1L, 0L, 4L, 5L)) && folded.contains((11L, 0L, 4L, 5L)))
    assert(folded.contains((13L, 0L, 2L, 3L)) && folded.contains((15L, 0L, 2L, 3L)))
    assert(!folded.exists(r => r._1 == 5L || r._1 == 17L))
    // loud bound: the crossing re-opens one standing doc, cap 0 refuses
    val e1 = intercept[IllegalArgumentException] {
      Dedup.spanIslandsAgainstRegistry(shard, "doc_id", "text", s"$dir/reg",
        minTokens = 3, minDocs = 2, maxTouchedDocs = 0L)
    }
    assert(e1.getMessage.contains("maxTouchedDocs"))
    // loud disjointness: a re-ingested standing id refuses
    val e2 = intercept[IllegalArgumentException] {
      Dedup.spanIslandsAgainstRegistry(
        Seq((2L, "p q r s t u")).toDF("doc_id", "text"), "doc_id", "text",
        s"$dir/reg", minTokens = 3, minDocs = 2)
    }
    assert(e2.getMessage.contains("collide"))
  }

  test("minhash snapshot maxBucket: combined occupancy drops blob, capped snapshot prunes artifact") {
    import spark.implicits._
    // 12-doc identical blob split 6 corpus / 6 shard: every blob bucket's
    // COMBINED occupancy is 12 even though each side alone is 6 — the
    // guard must count both sides. One honest cross pair rides along.
    val blobText = "zig zag zog zeb zub zam zin zon zur zat"
    val base = (1 to 30).map(i => s"a$i").mkString(" ")
    val edited = ((1 to 29).map(i => s"a$i") :+ "zz").mkString(" ")
    val corpus = ((200 until 206).map(i => (i.toLong, blobText)) :+ ((2L, base)))
      .toDF("doc_id", "text")
    val shard = ((300 until 306).map(i => (i.toLong, blobText)) :+ ((1L, edited)))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mh_snapcap_spec").toString
    Dedup.saveMinhashSnapshot(corpus, "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, path = s"$dir/full", maxBucket = None)
    def probe(snap: String, cap: Option[Int]) =
      Dedup.nearDupsAgainstSnapshot(shard, "doc_id", "text", s"$dir/$snap",
        n = 3, numHashes = 32, bands = 8, num = 4, den = 5, maxBucket = cap)
        .select("nid", "cid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cross = (for (a <- 300 until 306; b <- 200 until 206)
      yield (a.toLong, b.toLong)).toSet
    assert(probe("full", None) == cross + ((1L, 2L)))
    // probe-side guard: 6 shard + 6 corpus members > 8 → blob buckets
    // drop whole before the candidate join; the honest pair (2 members)
    // survives untouched
    assert(probe("full", Some(8)) == Set((1L, 2L)))
    // snapshot-side guard: corpus blob buckets (occupancy 6 > 4) never
    // reach the artifact, so even an UNCAPPED probe can't pair into them
    Dedup.saveMinhashSnapshot(corpus, "doc_id", "text",
      n = 3, numHashes = 32, bands = 8, path = s"$dir/capped", maxBucket = Some(4))
    assert(probe("capped", None) == Set((1L, 2L)))
    // sketch-param provenance: probing under different n/hashes/bands
    // would mis-bucket silently — the persisted meta row fails it loudly
    // (cap mismatch stays legal: both directions asserted above)
    val e = intercept[IllegalArgumentException] {
      Dedup.nearDupsAgainstSnapshot(shard, "doc_id", "text", s"$dir/full",
        n = 3, numHashes = 32, bands = 4, num = 4, den = 5,
        maxBucket = None).collect()
    }
    assert(e.getMessage.contains("sketch params"), e.getMessage)
  }

  test("normalizeText: NFC composes, case folds, whitespace collapses") {
    import spark.implicits._
    // "é" decomposed (e + U+0301) must compose to the single NFC code
    // point; tabs/newlines/runs collapse; ends trim
    val docs = Seq(
      (1L, "  Café \t du\n\n Parc  "),
      (2L, "Café du Parc"),
      (3L, "ALL  CAPS")
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      TextAnalysis.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "café du parc", s"got '${out(1L)}'")
    assert(out(1L) == out(2L), "decomposed and precomposed must normalize identically")
    assert(out(3L) == "all caps")
  }

  test("edit-distance near-dup: verified dist exact, candidate-bound pins recall") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"), // dist 3 (dog→cat)
      (3L, "the quick brown creature of unrelated verbiage keeps talking about entirely different things at considerable length"),
      (4L, "aa bb cc"), // single 3-gram, not shared with doc 5
      (5L, "aa bb cd")  // dist 1 to doc 4 but ZERO shared shingles → no pair
    ).toDF("doc_id", "text")
    val out = Dedup.editDistanceNearDuplicates(docs, "doc_id", "text",
      n = 3, maxDist = 5, prefixChars = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // (1,2): shares shingles, levenshtein 3. (1,3)/(2,3): share "the quick
    // brown" but dist >> 5. (4,5): dist 1 yet never a candidate — the
    // operator is explicitly "edit-close AMONG shingle-sharing candidates"
    assert(out == Set((1L, 2L, 3L)), s"got $out")
    // maxDocFreq skew guard: docs 1-3 all share "the quick brown" (df=3);
    // capping df at 2 stops that boilerplate shingle nominating pairs, and
    // (1,2) must survive via their OTHER (df=2) shared shingles
    val guarded = Dedup.editDistanceNearDuplicates(docs, "doc_id", "text",
      n = 3, maxDist = 5, prefixChars = 200, maxDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == Set((1L, 2L)), s"got $guarded")
    assert(Dedup.sharedShingleCandidates(docs, "doc_id", "text", 3, Some(1)).count() == 0L)
  }

  test("real WAV decode: known samples round-trip bit-exactly through javasound") {
    import spark.implicits._
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 17)
    val wav = Multimodal.encodePcmWav(8000, samples)
    val d = Multimodal.extractAudio(
      Seq(Multimodal.MediaItem(1L, "wav", wav)).toDS()).head()
    assert(d.decoder == "javasound")
    assert(d.sample_rate == 8000L && d.n_channels == 1L && d.n_samples == 6L)
    assert(d.sample_sum == samples.map(_.toLong).sum)
    assert(d.abs_max == 32768L)
    // non-audio bytes fall back to the stub (hash/length real, metrics -1)
    val junk = Multimodal.extractAudio(
      Seq(Multimodal.MediaItem(2L, "bin", "notaudio".getBytes("UTF-8"))).toDS()).head()
    assert(junk.decoder == "stub" && junk.n_samples == -1L)
    assert(junk.content_hash ==
      Multimodal.decodeStub(Multimodal.MediaItem(2L, "bin",
        "notaudio".getBytes("UTF-8"))).content_hash)
  }

  test("PCM16 WAV round-trips random sample arrays bit-exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(2029)
    val fixtures = (1L to 8L).map { id =>
      val n = 1 + rnd.nextInt(300)
      id -> Array.fill(n)((rnd.nextInt(65536) - 32768).toShort)
    }
    val decoded = Multimodal.extractAudio(fixtures.map { case (id, s) =>
      Multimodal.MediaItem(id, "wav", Multimodal.encodePcmWav(16000, s))
    }.toDS()).collect().map(d => d.id -> d).toMap
    fixtures.foreach { case (id, s) =>
      val d = decoded(id)
      assert(d.decoder == "javasound" && d.sample_rate == 16000L)
      assert(d.n_samples == s.length.toLong, s"doc $id length")
      assert(d.sample_sum == s.map(_.toLong).sum, s"doc $id sum")
      assert(d.abs_max == s.map(v => math.abs(v.toLong)).max, s"doc $id peak")
    }
  }

  test("µ-law WAV expands through the JDK's real companding decoder") {
    // PCM16 → µ-law WAV (8-bit log compressed) → decodeAudio must expand
    // it back: lossy by design, so assert structure exactly and amplitude
    // within µ-law's quantization error (~3% near peak)
    val peak = 8000
    val samples = Array.tabulate(64)(i => (peak * math.sin(i / 4.0)).toShort)
    val pcmFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples.flatMap(s =>
        Array((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte))),
      pcmFmt, samples.length.toLong)
    val ulawFmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val ulaw = javax.sound.sampled.AudioSystem.getAudioInputStream(ulawFmt, pcm)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ulaw,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val d = Multimodal.decodeAudio(Multimodal.MediaItem(3L, "wav", bos.toByteArray))
    assert(d.decoder == "javasound")
    assert(d.sample_rate == 8000L && d.n_samples == 64L)
    assert(math.abs(d.abs_max - peak) <= peak / 16,
      s"µ-law peak ${d.abs_max} too far from $peak")
  }

  test("audio window framing: exact stats per window, last partial dropped") {
    import spark.implicits._
    val wav = Multimodal.encodePcmWav(8000, Array.tabulate[Short](10)(_.toShort))
    val rows = Multimodal.audioWindows(
      Seq(Multimodal.MediaItem(5L, "wav", wav)).toDS(), window = 4, hop = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // starts 0,3,6 (9+4 > 10 drops the partial); sums 6, 18, 30
    assert(rows == Set((0L, 0L, 6L, 3L), (1L, 3L, 18L, 6L), (2L, 6L, 30L, 9L)),
      s"got $rows")
    // junk media yields no windows rather than garbage
    assert(Multimodal.audioWindows(
      Seq(Multimodal.MediaItem(6L, "bin", Array[Byte](1, 2))).toDS(), 4, 3).count() == 0L)
  }

  test("duplicationProfile: histogram over dup clusters; removal count derivable") {
    // docs: {0,1,3} one near-dup cluster, {2} and {4} unique singletons
    val prof = Dedup.duplicationProfile(docs, "doc_id", "text", n = 3, num = 4, den = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(prof == Map(3L -> ((1L, 3L)), 1L -> ((2L, 2L))), s"got $prof")
    // keep-one dedup removes n_docs - n_clusters = (3-1) + (2-2) = 2 docs
    val removed = prof.map { case (_, (nc, nd)) => nd - nc }.sum
    assert(removed == 2L)
  }

  test("extractHtmlText: blocks dropped, tags split words, entities decode after strip") {
    import spark.implicits._
    val cases = Seq(
      // script/style contents vanish INCLUDING embedded '<'; tag boundary
      // becomes a word boundary; five entities + nbsp/#39 decode
      (1L, "<p>a</p><p>b</p><script>if (1 < 2) alert('x');</script>" +
        "<style>p>em { x: y }</style>c &amp; d&nbsp;&#39;e&quot;"),
      // encoded markup in TEXT stays literal text — decode must run after
      // stripping or &lt;b&gt; would become a strippable tag
      (2L, "<div>say &lt;b&gt;hi&lt;/b&gt; &amp;lt;never twice&amp;gt;</div>"),
      // whitespace runs (incl. the spaces tags leave behind) collapse
      (3L, "  <br/>x   y\t z  <hr>  "))
    val out = cases.toDF("id", "html")
      .select(col("id"), TextAnalysis.extractHtmlText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "a b c & d 'e\"", s"got '${out(1L)}'")
    assert(out(2L) == "say <b>hi</b> &lt;never twice&gt;", s"got '${out(2L)}'")
    assert(out(3L) == "x y z", s"got '${out(3L)}'")
  }

  test("charEntropy: uniform alphabet hits log2(k) exactly; single-char floods to 0") {
    import spark.implicits._
    val out = TextAnalysis.charEntropy(
      Seq((1L, "abcdabcdabcdabcd"), (2L, "zzzzzzzz"), (3L, "ab")).toDF("id", "t"),
      "id", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((16L, 2.0)), s"got ${out(1L)}") // 4 chars uniform = 2 bits
    assert(out(2L) == ((8L, 0.0)), s"got ${out(2L)}")
    assert(out(3L) == ((2L, 1.0)), s"got ${out(3L)}")
  }

  test("groupQuota: cap enforced per group, deterministic picks, WindowGroupLimit plan") {
    import spark.implicits._
    val d = (0L until 40L).map(i => (i, if (i < 30) "big" else "small")).toDF("id", "src")
    val q = TextAnalysis.groupQuota(d, "id", "src", k = 5)
    val rows = q.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.count(_._2 == "big") == 5 && rows.count(_._2 == "small") == 5)
    assert(rows.forall(_._3 <= 5L))
    // same picks on a different partitioning (hash order, not arrival order)
    val again = TextAnalysis.groupQuota(d.repartition(7), "id", "src", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
    // the rank<=k predicate must prune map-side at 100 TB
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      q.queryExecution.executedPlan.toString.take(2000))
  }

  test("semanticDecontaminate: paraphrase-leak flagged, orthogonal doc clean") {
    import spark.implicits._
    val evalSet = Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(0.99f, 0.14f, 0f, 0f)), // near-copy of the eval vector
      (2L, Array(0f, 1f, 0f, 0f)),       // orthogonal
      (3L, Array(-1f, 0f, 0f, 0f)))      // opposite
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(train, evalSet,
      "vec_id", "embedding", tauPermille = 900)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L), s"got $out")
  }

  test("cleanLines: short/badword lines dropped, first occurrence kept, order preserved") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma|x y|alpha beta gamma|bad slow line here|delta epsilon zeta"),
      (2L, "slow one two|a b")) // everything filtered
      .toDF("id", "t")
    val out = TextAnalysis.cleanLines(d, "id", "t", delim = "|",
      minWords = 3, dropRegex = "\\bslow\\b")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // dup "alpha beta gamma" keeps its FIRST slot; "x y" short; slow line dropped
    assert(out(1L) == (("alpha beta gamma|delta epsilon zeta", 2L, 3L)), s"got ${out(1L)}")
    assert(out(2L) == (("", 0L, 2L)), s"got ${out(2L)}")
  }

  test("quantizeInt8: max maps to ±127, zero vector to zero codes, floor-half-up") {
    import spark.implicits._
    val d = Seq(
      (1L, Array(2.0f, -1.0f, 0.5f)),  // scale 63.5: codes 127, -63 (floor(-63)), 32 (floor 32.25)
      (2L, Array(0f, 0f, 0f)))         // zero vector: guard, all 0
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(d, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      (1L, 1L) -> 127L, (1L, 2L) -> -63L, (1L, 3L) -> 32L,
      (2L, 1L) -> 0L, (2L, 2L) -> 0L, (2L, 3L) -> 0L), s"got $out")
    // codes bounded by construction
    assert(out.values.forall(q => q >= -127L && q <= 127L))
  }

  test("semanticDupsAgainstSnapshot: planted twin found, cross-cell twin invisible, pruned scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_semsnap").toString
    val corpus = Seq(
      (0L, Array(1f, 0f, 0f), 0),   // snapshot, cell 0
      (2L, Array(0f, 1f, 0f), 1),   // snapshot, cell 1
      (4L, Array(0f, 0f, 1f), 2))   // snapshot, cell 2 — shard never probes it
      .toDF("id", "vec", "cell")
    Similarity.saveSemanticSnapshot(corpus, "id", "vec", col("cell"), s"$dir/snap")
    val shard = Seq(
      (1L, Array(0.99f, 0.1f, 0f), 0), // twin of 0 in the right cell
      (3L, Array(1f, 0f, 0f), 1),      // twin of 0 but WRONG cell: invisible by contract
      (5L, Array(0f, -1f, 0f), 1))     // anti-twin of 2: below threshold
      .toDF("id", "vec", "cell")
    val q = Similarity.semanticDupsAgainstSnapshot(shard, "id", "vec",
      col("cell"), s"$dir/snap", tauPermille = 900)
    val pairs = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)), s"got $pairs")
    // the snapshot layout prunes by cell at the directory level: a shard
    // restricted to cell 0 must scan only that partition
    val restricted = Similarity.semanticDupsAgainstSnapshot(
      shard.filter(col("cell") === 0), "id", "vec", col("cell"),
      s"$dir/snap", tauPermille = 900)
    restricted.collect()
    // not just the (always-printed) header: the filter list must actually
    // name the cell column
    val scan = restricted.queryExecution.executedPlan.toString
    assert(scan.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      scan.take(3000))
  }

  test("vocabCoverage: OOV counted per occurrence; all-OOV doc at 1000 permille") {
    import spark.implicits._
    val d = Seq(
      (1L, "aa aa aa bb"),  // aa,bb make the top-2 vocab
      (2L, "aa bb xx"),     // one OOV occurrence of three
      (3L, "xx yy zz"))     // fully OOV
      .toDF("id", "t")
    val out = TextAnalysis.vocabCoverage(d, "id", "t", vocabSize = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((4L, 0L, 0L)), s"got ${out(1L)}")
    assert(out(2L) == ((3L, 1L, 333L)), s"got ${out(2L)}")
    assert(out(3L) == ((3L, 3L, 1000L)), s"got ${out(3L)}")
  }

  /** Plain-Scala twin of TextAnalysis.hash60 (first 15 md5 hex chars). */
  private def h60(s: String): Long =
    java.lang.Long.parseLong(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)

  test("memorizationRisk: duplicated grams counted, unique docs at 0") {
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon"
    val d = Seq(
      (1L, s"$shared one two"),   // grams: 3 distinct, 1 shared with 2 and 3
      (2L, s"$shared six seven"),
      (3L, s"$shared eight nine"),
      (4L, "ten eleven twelve thirteen fourteen fifteen")) // all unique grams
      .toDF("id", "t")
    val out = TextAnalysis.memorizationRisk(d, "id", "t", n = 5, minDf = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((3L, 1L, 333L)), s"got ${out(1L)}") // only the shared gram is in >=3 docs
    assert(out(4L) == ((2L, 0L, 0L)), s"got ${out(4L)}")
  }

  test("cleanseFunnel: each stage removes exactly its planted victim") {
    import spark.implicits._
    val a = (1 to 20).map(i => s"w$i").mkString(" ")          // 20 tokens
    val aNear = (1 to 19).map(i => s"w$i").mkString(" ") + " zz" // last token differs
    val evalGram = "alpha beta gamma delta epsilon"
    val train = Seq(
      (1L, a), (2L, a),                                   // 2 = exact dup of 1
      (3L, aNear),                                        // near-dup of 1 (J≈0.89)
      (4L, "tiny doc"),                                   // under the 15-token floor
      (5L, s"$evalGram " + (1 to 11).map(i => s"x$i").mkString(" ")), // leaks eval gram
      (6L, (1 to 16).map(i => s"y$i").mkString(" ")))     // clean survivor
      .toDF("doc_id", "text")
    val evalDocs = Seq((100L, evalGram)).toDF("doc_id", "text")
    val rows = Dedup.cleanseFunnel(train, evalDocs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "1_exact", 6L, 5L, 1L),
      (2L, "2_neardup", 5L, 4L, 1L),
      (3L, "3_quality", 4L, 3L, 1L),
      (4L, "4_decontaminate", 3L, 2L, 1L)), rows.mkString(","))
  }

  test("videoDupPairs: frame-hash overlap pairs exactly the planted groups") {
    import spark.implicits._
    val frames = spark.range(8).as[Long].flatMap { vid =>
      val g = vid - vid % 4
      (0L to (4 + vid % 2)).map { f =>
        val key = if (f < 4) g * 131 + f else vid * 977 + f
        val w = (8 + key % 9).toInt
        val h = (8 + key % 7).toInt
        Multimodal.MediaItem(vid * 1000 + f, "png",
          Multimodal.encodeGrayPng(w, h,
            (x, y) => ((key * 31 + x * 7 + y * 13) % 256).toInt))
      }
    }
    val fh = Multimodal.dHashes(frames)
      .select(expr("id DIV 1000").as("vid"), col("dhash"))
    val pairs = Multimodal.videoDupPairs(fh, "vid", "dhash", 400)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val want = (for {
      g <- Seq(0L, 4L); a <- g until g + 4; b <- (a + 1) until g + 4
    } yield (a, b)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == want, pairs.mkString(","))
    // nominal overlap is 4 shared frames of 5-6, but 8x8 dHashes can
    // collide WITHIN a video (shrinking its distinct-hash set), so only
    // the filter's own bound is a stable fact here
    assert(pairs.forall(p => p._3 >= 400 && p._3 <= 1000), pairs.mkString(","))
  }

  test("mixturePlan: shares, epochs, and the zero-weight census row") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d", "web"), (2L, "e f g", "web"), // web: 2 docs, 7 tokens
      (3L, "h i", "code"))                          // code: unweighted
      .toDF("id", "t", "src")
    val out = TextAnalysis.mixturePlan(d, "id", "t", "src",
      Map("web" -> 600L, "ghost" -> 400L), budgetTokens = 1000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // share = 1000·600/1000 = 600 tokens; epochs = 600·1000/7 = 85714 milli
    assert(out("web") == ((2L, 7L, 600L, 600L, 85714L)), s"got ${out("web")}")
    assert(out("code") == ((1L, 2L, 0L, 0L, 0L)), s"got ${out("code")}")
    // a weight entry with NO corpus rows surfaces as zero inventory —
    // 40% of the budget visibly unfillable, not silently dropped
    assert(out("ghost") == ((0L, 0L, 400L, 400L, 0L)), s"got ${out("ghost")}")
  }

  test("contaminationReport: per-eval distinct train counts, clean evals report 0") {
    import spark.implicits._
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma DELTA epsilon zeta"), // case-folds to the same gram
      (12L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val eval = Seq(
      (1L, "alpha beta gamma delta epsilon"), // leaked into 10 and 11
      (2L, "eight nine ten eleven twelve"))   // clean — must still appear
      .toDF("doc_id", "text")
    val out = TextAnalysis.contaminationReport(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 0L), s"got $out")
  }

  test("dsirModel: total over the bucket domain; scoreBuckets reproduces dsirWeights") {
    import spark.implicits._
    val src = Seq((1L, "good clean prose"), (2L, "junk spam words")).toDF("id", "t")
    val tgt = src.filter(col("id") === 1L)
    val model = TextAnalysis.dsirModel(src, tgt, "t", buckets = 64)
    assert(model.count() == 64L) // unseen buckets carry the smoothing floor
    assert(model.select(count_distinct(col("llr_micro"))).first().getLong(0) >= 2L)
    val viaModel = graft.streaming.PipelineStream.scoreBuckets(src, "id", "t", model)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n"), sum(col("llr_micro")).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val direct = TextAnalysis.dsirWeights(src, tgt, "id", "t", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaModel == direct, s"model path $viaModel vs direct $direct")
  }

  test("dsirResample: partition-invariant Gumbel-top-k, key lineage, TakeOrdered plan") {
    import spark.implicits._
    val src = (0L until 40L)
      .map(i => (i, if (i % 4 == 0) "good clean prose" else "junk spam words"))
      .toDF("id", "t")
    val tgt = src.filter(col("id") % 4 === 0)
    val sel = TextAnalysis.dsirResample(src, tgt, "id", "t", k = 10)
    val rows = sel.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq == (1L to 10L))
    assert(rows.sortBy(r => (-r._3, r._2)).map(_._1).toSeq == (1L to 10L).toSeq)
    val again = TextAnalysis.dsirResample(src.repartition(7), tgt, "id", "t", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
    // key lineage: key_micro − weight_micro is exactly the seeded Gumbel
    val w = TextAnalysis.dsirWeights(src, tgt, "id", "t").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    def gum(id: Long): Long = math.round(-math.log(-math.log(
      (h60(s"dsir|$id") + 0.5) / math.pow(2, 60))) * 1e6)
    rows.foreach { case (_, id, key) => assert(key == w(id) + gum(id), s"id $id") }
    // per-partition heaps + driver merge, never a global sort
    assert(sel.queryExecution.executedPlan.toString.contains("TakeOrdered"))
  }

  test("gopherRules: paper thresholds; each rule flips keep alone; no shuffle") {
    import spark.implicits._
    val stop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val good = (stop ++ Seq.fill(42)("quality")).mkString(" ") // 50 words
    val bulletDoc = (1 to 10)
      .map(_ => "- " + (stop ++ Seq.fill(2)("quality")).mkString(" ")).mkString("\n")
    val ellLine = (stop ++ Seq.fill(5)("quality")).mkString(" ") + " more..."
    val plainLine = Seq.fill(12)("quality").mkString(" ")
    val ellipsisDoc = Seq(ellLine, ellLine, plainLine, plainLine).mkString("\n")
    val d = Seq(
      (1L, good),                                           // passes everything
      (2L, Seq.fill(49)("the").mkString(" ")),              // word-count floor
      (3L, Seq.fill(50)("a b").mkString(" ")),              // mean word length 1.0
      (4L, good + " " + Seq.fill(6)("####").mkString(" ")), // symbol ratio
      (5L, Seq.fill(50)("12345").mkString(" ")),            // no alphabetic words
      (6L, bulletDoc),                                      // all-bullet lines
      (7L, ellipsisDoc))                                    // half lines end ...
      .toDF("id", "t")
    val out = TextAnalysis.gopherRules(d, "id", "t")
    val rows = out.collect().map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    assert(rows(1L) == ((50L, 6360L, 0L, 0L, 0L, 1000L, 8L, 1L)), s"got ${rows(1L)}")
    assert(rows.filter(_._2._8 == 1L).keySet == Set(1L), s"keeps: $rows")
    assert(rows(4L)._3 > 100L)    // symbol permille is the failing rule
    assert(rows(6L)._4 == 1000L)  // bullet fraction
    assert(rows(7L)._5 == 500L)   // ellipsis fraction
    assert(rows(5L)._6 == 0L)     // alpha fraction
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("canonicalizeUrl: variant axes collapse, semantic distinctions survive") {
    import spark.implicits._
    val urls = Seq(
      (1L, "HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&id=3&utm_campaign=y#frag"),
      (2L, "https://ex.com/A/b?id=3"),   // canonical twin of 1
      (3L, "https://ex.com/A/b?id=4"),   // different query VALUE: distinct
      (4L, "https://ex.com/a/b?id=3"),   // path case differs: distinct
      (5L, "http://ex.com:80/A/b?id=3"),  // scheme differs: distinct, port stripped
      (6L, "https://ex.com:80/A/b?id=3"), // NON-default port survives
      (7L, "https://ex.com/a?next=/b/?x=1"), // '/?' inside a query VALUE survives
      (8L, "https://ex.com/a?d=/tmp/"))      // trailing '/' in a query VALUE survives
      .toDF("id", "url")
    val byId = Dedup.urlDedup(urls, "id", "url")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byId(1L)._1 == "https://ex.com/A/b?id=3", byId(1L)._1)
    assert(byId(2L)._1 == byId(1L)._1 && byId(1L)._2 == 1L && byId(1L)._3 == 2L)
    assert(byId(3L) == (("https://ex.com/A/b?id=4", 3L, 1L)))
    assert(byId(4L)._1 == "https://ex.com/a/b?id=3")
    assert(byId(5L)._1 == "http://ex.com/A/b?id=3")
    assert(byId(6L)._1 == "https://ex.com:80/A/b?id=3", byId(6L)._1)
    assert(byId(7L)._1 == "https://ex.com/a?next=/b/?x=1", byId(7L)._1)
    assert(byId(8L)._1 == "https://ex.com/a?d=/tmp/", byId(8L)._1)
  }

  test("blocklistSignals: occurrence counting, zero-hit and token-less docs, no shuffle") {
    import spark.implicits._
    val d = Seq((1L, "spam and SPAM again"), (2L, "clean text only"), (3L, "  "))
      .toDF("id", "t")
    val sig = TextAnalysis.blocklistSignals(d, "id", "t", Seq("Spam"))
    val out = sig.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((4L, 2L, 500L)), s"got ${out(1L)}") // case-folded both sides
    assert(out(2L) == ((3L, 0L, 0L)))
    assert(out(3L) == ((0L, 0L, 0L)))
    // pure projection: the blocklist inlines, nothing shuffles
    assert(!sig.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("dsirWeights: matches a collision-aware reference model; partition-invariant; broadcast scoring join") {
    import spark.implicits._
    val src = Seq(
      (1L, "good clean prose good clean prose"),
      (2L, "junk junk junk spam junk"),
      (3L, "good prose spam"))
      .toDF("id", "t")
    val tgt = src.filter(col("id") === 1L) // the "domain we want" sample
    val buckets = 64
    val out = TextAnalysis.dsirWeights(src, tgt, "id", "t", buckets)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // reference model in plain Scala, sharing nothing with the Spark path
    // but the spec of hash60 (first 15 md5 hex chars) — collision-aware
    def toks(s: String) = s.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val srcDocs = Map(1L -> "good clean prose good clean prose",
      2L -> "junk junk junk spam junk", 3L -> "good prose spam")
    val bkt = (s: String) => h60(s) % buckets
    val sCnt = srcDocs.values.flatMap(toks).groupBy(bkt).map { case (b, g) => b -> g.size }
    val tCnt = toks(srcDocs(1L)).groupBy(bkt).map { case (b, g) => b -> g.size }
    val (tt, st) = (tCnt.values.sum, sCnt.values.sum)
    def lm(b: Long): Long = math.round(
      (math.log((tCnt.getOrElse(b, 0) + 1.0) / (tt + buckets)) -
        math.log((sCnt.getOrElse(b, 0) + 1.0) / (st + buckets))) * 1e6)
    val expected = srcDocs.map { case (id, t) =>
      id -> ((toks(t).size.toLong, toks(t).map(w => lm(bkt(w))).sum))
    }
    assert(out == expected, s"got $out expected $expected")
    // target-like doc outranks the off-domain doc
    assert(out(1L)._2 > out(2L)._2)

    // bit-identical on any partitioning (integer micro-nat sums)
    val again = TextAnalysis.dsirWeights(src.repartition(7), tgt, "id", "t", buckets)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(again == out)

    // the LLR table must broadcast back onto the token stream
    val plan = TextAnalysis.dsirWeights(src, tgt, "id", "t", buckets)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("temperature rates: α=0.5 flattens the head, exact integers, expected total ≤ budget") {
    import spark.implicits._
    // 80/15/5 split: α=0.5 should keep a LARGER fraction of the tail
    val d = (0 until 80).map(i => (i.toLong, "en")) ++
      (80 until 95).map(i => (i.toLong, "de")) ++ (95 until 100).map(i => (i.toLong, "fr"))
    val docs = d.toDF("doc_id", "lang")
    val rates = TextAnalysis.temperatureRates(docs, "lang", alpha = 0.5, targetDocs = 50L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // reference model in plain Scala (same integer contract)
    val n = Map("en" -> 80L, "de" -> 15L, "fr" -> 5L)
    val w = n.map { case (g, c) => g -> math.floor(1e6 * math.sqrt(c.toDouble)).toLong }
    val z = w.values.sum
    val exp = n.map { case (g, c) => g -> ((c, math.min(1000L, 1000L * 50L * w(g) / (z * c)))) }
    assert(rates == exp, s"got $rates expected $exp")
    // flattening: tail keep-rate strictly above head keep-rate
    assert(rates("fr")._2 > rates("de")._2 && rates("de")._2 > rates("en")._2)
    // expected kept total Σ n_g·r_g/1000 lands at/under the budget
    val expTotal = rates.map { case (_, (c, r)) => c * r / 1000.0 }.sum
    assert(expTotal <= 50.0 + 1e-9 && expTotal > 40.0, s"expected-kept $expTotal")
    // the gate only ever keeps a subset, deterministically
    val kept = TextAnalysis.temperatureSample(docs, "doc_id", "lang", 0.5, 50L)
    val a = kept.collect().map(_.getLong(0)).toSet
    val b = TextAnalysis.temperatureSample(docs.repartition(7), "doc_id", "lang", 0.5, 50L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.size <= 100)
  }

  test("temperature rates rational: α=3/4 weights are exact integer 4th roots, boundary-safe") {
    import spark.implicits._
    // n=10000 makes 1e12·n³ = (1e6)^4 a PERFECT 4th power — the exact
    // boundary where a float candidate one ulp low would floor wrong;
    // 9999/10001 bracket it; 7 and 1 exercise the small-n end.
    val sizes = Seq("en" -> 10000, "de" -> 10001, "fr" -> 9999, "it" -> 7, "zz" -> 1)
    val docs = sizes.zipWithIndex.flatMap { case ((g, c), gi) =>
      (0 until c).map(i => (gi * 1000000L + i, g)) }.toDF("doc_id", "lang")
    val rates = TextAnalysis.temperatureRatesRational(
      docs, "lang", alphaNum = 3, alphaDen = 4, targetDocs = 5000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // plain-BigInt reference: w = floor((1e12·n³)^¼) by binary search
    def iroot4(x: BigInt): BigInt = {
      var lo = BigInt(0); var hi = BigInt(1)
      while (hi * hi * hi * hi <= x) hi *= 2
      while (lo < hi - 1) { val m = (lo + hi) / 2
        if (m * m * m * m <= x) lo = m else hi = m }
      lo
    }
    val w = sizes.map { case (g, c) =>
      g -> iroot4(BigInt("1000000000000") * BigInt(c).pow(3)) }.toMap
    assert(w("en") == BigInt(1000000)) // the perfect-power case, exactly
    val z = w.values.sum
    val exp = sizes.map { case (g, c) =>
      g -> ((c.toLong,
        (BigInt(1000) * 5000 * w(g) / (z * c)).min(1000).toLong)) }.toMap
    assert(rates == exp, s"got $rates expected $exp")
    // α<1 flattening: the 1-doc tail group keeps a higher rate than the head
    assert(rates("zz")._2 > rates("en")._2)
    // the α=1/2 rational path must agree with the IEEE-exact float path
    val d2 = ((0 until 80).map(i => (i.toLong, "en")) ++
      (80 until 95).map(i => (i.toLong, "de")) ++
      (95 until 100).map(i => (i.toLong, "fr"))).toDF("doc_id", "lang")
    val viaFloat = TextAnalysis.temperatureRates(d2, "lang", 0.5, 50L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaRoot = TextAnalysis.temperatureRatesRational(d2, "lang", 1, 2, 50L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaFloat == viaRoot)
    // 2/4 reduces to 1/2 — same result again
    val via24 = TextAnalysis.temperatureRatesRational(d2, "lang", 2, 4, 50L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(via24 == viaFloat)
    // partitioning invariance of the full sample
    val a = TextAnalysis.temperatureSampleRational(docs, "doc_id", "lang", 3, 4, 5000L)
      .collect().map(_.getLong(0)).toSet
    val b = TextAnalysis.temperatureSampleRational(
      docs.repartition(7), "doc_id", "lang", 3, 4, 5000L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    intercept[IllegalArgumentException] {
      TextAnalysis.temperatureRatesRational(docs, "lang", 1, 3, 100L)
    }
  }

  test("exactGroupRanks: ranks equal the per-group sort order; empty in, empty out") {
    import spark.implicits._
    val d = Seq((1L, "a", 30L), (2L, "a", 10L), (3L, "a", 20L),
      (4L, "b", 5L), (5L, "b", 1L)).toDF("id", "g", "k")
    val out = TextAnalysis.exactGroupRanks(d, "g", Seq(col("k"), col("id")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(out == Map(2L -> ((1L, 3L)), 3L -> ((2L, 3L)), 1L -> ((3L, 3L)),
      5L -> ((1L, 2L)), 4L -> ((2L, 2L))), s"got $out")
    // invariant under input partitioning
    val again = TextAnalysis.exactGroupRanks(
      d.repartition(7), "g", Seq(col("k"), col("id")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(again == out)
    assert(TextAnalysis.exactGroupRanks(
      d.filter(col("id") > 100), "g", Seq(col("k"))).count() == 0L)
    // a NULL group is a group like any other (the null-safe join): no
    // silent row loss, ranks within the NULL group
    val dn = Seq((1L, Some("a"), 30L), (2L, None, 10L), (3L, None, 20L))
      .toDF("id", "g", "k")
    val outN = TextAnalysis.exactGroupRanks(dn, "g", Seq(col("k"), col("id")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(outN == Map(1L -> ((1L, 1L)), 2L -> ((1L, 2L)), 3L -> ((2L, 2L))),
      s"got $outN")
  }

  test("grouped pid-offset family refuses unbounded group cardinality loudly") {
    import spark.implicits._
    // every row its own group: #offset cells >= #groups = 6 > the bound —
    // the driver collect must refuse, not silently grow with cardinality
    val d = (1L to 6L).map(i => (i, s"host$i", i)).toDF("id", "g", "k")
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.exactGroupRanks(d, "g", Seq(col("k")), maxOffsetCells = 3L)
    }
    assert(e1.getMessage.contains("offset cells"))
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.exactGroupPrefixSums(d, "g", Seq(col("k")), "k",
        maxOffsetCells = 3L)
    }
    assert(e2.getMessage.contains("offset cells"))
    // at the default bound the same input ranks fine
    assert(TextAnalysis.exactGroupRanks(d, "g", Seq(col("k"))).count() == 6L)
  }

  test("stratified exact split: per-group counts hit the floored permille marks exactly") {
    import spark.implicits._
    val sizes = Seq("en" -> 137, "de" -> 40, "fr" -> 7, "zz" -> 1)
    val docs = sizes.zipWithIndex.flatMap { case ((g, c), gi) =>
      (0 until c).map(i => (gi * 1000L + i, g)) }.toDF("doc_id", "lang")
    val splits = Seq("train" -> 800, "val" -> 100, "test" -> 100)
    val out = TextAnalysis.stratifiedExactSplit(docs, "doc_id", "lang", splits)
      .localCheckpoint()
    val counts = out.groupBy("grp", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    sizes.foreach { case (g, n) =>
      val b1 = n * 800 / 1000; val b2 = n * 900 / 1000
      assert(counts.getOrElse((g, "train"), 0L) == b1, s"$g train")
      assert(counts.getOrElse((g, "val"), 0L) == b2 - b1, s"$g val")
      assert(counts.getOrElse((g, "test"), 0L) == n - b2, s"$g test")
    }
    // the floor-cumulative rule sends a 1-doc group's doc to the LAST split
    assert(counts((("zz", "test"))) == 1L)
    // exactly one split per doc
    assert(out.count() == docs.count() &&
      out.select("id").distinct().count() == docs.count())
    // deterministic on any partitioning
    val a = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = TextAnalysis.stratifiedExactSplit(
      docs.repartition(7), "doc_id", "lang", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      TextAnalysis.stratifiedExactSplit(docs, "doc_id", "lang", Seq("a" -> 500))
    }
  }

  test("kmeans drift matrix: rollup of the refine delta, mass conserved") {
    import spark.implicits._
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(j => (math.sin(i * 3 + j) * (1 + i % 4)).toFloat))
    }.toDF("vec_id", "embedding")
    val delta = Similarity.kmeansRefineDelta(vecs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val matrix = Similarity.kmeansDriftMatrix(vecs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = delta.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(matrix == expected, s"got $matrix expected $expected")
    assert(matrix.values.sum == 60L) // every vector lands in exactly one cell
  }

  test("classifier agreement: 2x2 table against the teacher label, counts conserved") {
    import spark.implicits._
    // separable corpus: long clean prose (keep) vs short/symbol junk (drop)
    val docs = ((0 until 12).map(i =>
      (i.toLong, s"this is a long and perfectly ordinary sentence number $i " +
        "with plenty of alphabetic words to clear the keep heuristic easily")) ++
      (12 until 20).map(i => (i.toLong, s"@@## $i ++__ ~~"))).toDF("doc_id", "text")
    val out = TextAnalysis.classifierAgreement(docs, "doc_id", "text", dim = 512)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.values.sum == 20L)
    // on separable data the distilled model reproduces its teacher:
    // only diagonal cells
    assert(out.keySet.forall { case (l, p) => l == p }, s"got $out")
    assert(out((1L, 1L)) == 12L && out((0L, 0L)) == 8L)
  }

  test("corpus delta: added/removed/retained at fingerprint grain with copy counts") {
    import spark.implicits._
    val base = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "  ALPHA   beta "),
      (4L, "going away")).toDF("doc_id", "text")
    val next = Seq((10L, "alpha beta"), (11L, "gamma"), (12L, "brand new"),
      (13L, "gamma")).toDF("doc_id", "text")
    val out = Dedup.corpusDelta(base, next, "doc_id", "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    def fp(t: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // "alpha beta" retained — base has TWO normalization-equal copies
    assert(out(fp("alpha beta")) == (("retained", 2L, 1L)))
    // "gamma" retained, duplicated in next
    assert(out(fp("gamma")) == (("retained", 1L, 2L)))
    assert(out(fp("going away")) == (("removed", 1L, 0L)))
    assert(out(fp("brand new")) == (("added", 0L, 1L)))
    assert(out.size == 4)
  }

  test("scene cuts: boundaries where consecutive frame hashes differ, running scene ids") {
    import spark.implicits._
    // video 5: frames 0-2 / 3-5 / 6-7 share per-scene keys (identical
    // pixels within a scene); video 9: a single frame
    def frame(vid: Long, f: Long): Multimodal.MediaItem = {
      val key = vid * 977 + (f / 3) * 131
      val w = (8 + key % 9).toInt
      val h = (8 + key % 7).toInt
      Multimodal.MediaItem(vid * 1000 + f, "png",
        Multimodal.encodeGrayPng(w, h,
          (x, y) => ((key * 31 + x * 7 + y * 13) % 256).toInt))
    }
    val items = (0L to 7L).map(frame(5L, _)) :+ frame(9L, 0L)
    val fh = Multimodal.dHashes(items.toDS())
      .select(expr("id DIV 1000").as("vid"), expr("id % 1000").as("f"), col("dhash"))
    val out = Multimodal.sceneCuts(fh, "vid", "f", "dhash", minHamming = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // within-scene frames are pixel-identical → hamming 0, no cut
    Seq(0L, 1L, 2L, 4L, 5L, 7L).foreach { f =>
      assert(out((5L, f))._1 == 0L && out((5L, f))._2 == 0L, s"f=$f") }
    // the planted boundaries really differ (factual, not assumed)
    assert(out((5L, 3L))._1 > 0L && out((5L, 6L))._1 > 0L)
    // scene = running cut count: 0,0,0,1,1,1,2,2
    assert((0L to 7L).map(f => out((5L, f))._3) == Seq(0L, 0L, 0L, 1L, 1L, 1L, 2L, 2L))
    // single-frame video: one row, scene 0, no cut
    assert(out((9L, 0L)) == ((0L, 0L, 0L)))
    // frame arrival order doesn't matter (the window orders by frame)
    val again = Multimodal.sceneCuts(fh.orderBy(col("dhash")).repartition(7),
      "vid", "f", "dhash", minHamming = 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(again == out)
    // keyframes = the first frame of each scene
    val kf = Multimodal.keyframes(fh, "vid", "f", "dhash", minHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(kf == Map((5L, 0L) -> 0L, (5L, 1L) -> 3L, (5L, 2L) -> 6L,
      (9L, 0L) -> 0L), s"got $kf")
  }

  test("epoch expand: full epochs unconditional, fractional tail hash-gated with per-epoch salt") {
    import spark.implicits._
    val docs = ((0 until 20).map(i => (i.toLong, "a")) ++
      (20 until 40).map(i => (i.toLong, "b")) ++
      (40 until 45).map(i => (i.toLong, "c"))).toDF("doc_id", "src")
    val plan = Seq(("a", 2500L), ("b", 700L), ("c", 0L)).toDF("source", "epochs_milli")
    val out = TextAnalysis.epochExpand(docs, "doc_id", "src", plan)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // independent reference: the same md5-nibble hash in plain Java
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15), 16)
    val milli = Map("a" -> 2500L, "b" -> 700L, "c" -> 0L)
    val expected = (for {
      (id, src) <- (0 until 20).map(i => (i.toLong, "a")) ++
        (20 until 40).map(i => (i.toLong, "b")) ++
        (40 until 45).map(i => (i.toLong, "c"))
      m = milli(src)
      e <- 0L until (m + 999L) / 1000L
      if e * 1000L + h60(s"$id:$e") % 1000L < m
    } yield (id, src, e)).toSet
    assert(out == expected, s"diff ${out.diff(expected)} / ${expected.diff(out)}")
    // structure: a-docs carry epochs 0 and 1 unconditionally
    (0 until 20).foreach { i =>
      assert(out.contains((i.toLong, "a", 0L)) && out.contains((i.toLong, "a", 1L))) }
    // zero-epoch source emits nothing
    assert(!out.exists(_._2 == "c"))
    // fractional tails are proper subsets (gates are real, not all-pass)
    assert(out.count(t => t._2 == "a" && t._3 == 2L) < 20)
    assert(out.count(_._2 == "b") < 20 && out.exists(_._2 == "b"))
  }

  test("budget select: kept set is the exact hash-order prefix, overrun at most one doc") {
    import spark.implicits._
    val d = (0 until 50).map(i =>
      (i.toLong, Seq.fill(3 + i % 7)("w").mkString(" "))).toDF("doc_id", "text")
    val budget = 60L
    val out = TextAnalysis.budgetSelect(d, "doc_id", "text", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: hash order + running sum in plain Scala (hash values
    // read back through the engine's own hash60 expression)
    val hashed = d.select(col("doc_id"),
        TextAnalysis.hash60(col("doc_id")).as("hk"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val expected = hashed.scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (_, id, n)) =>
      (id, n, cum + n) }.tail
      .takeWhile { case (_, n, cum) => cum - n < budget }
      .map { case (id, n, cum) => (id, n, cum) }
    assert(out.sortBy(_._3).toSeq == expected.toSeq,
      s"got ${out.sortBy(_._3).toSeq} expected ${expected.toSeq}")
    // budget semantics: the kept set covers the budget, overrunning by
    // less than the last doc
    val total = out.map(_._2).sum
    assert(total >= budget && total - out.sortBy(_._3).last._2 < budget)
    // deterministic on any partitioning
    val again = TextAnalysis.budgetSelect(d.repartition(7), "doc_id", "text", budget)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(_._3).toSeq == out.sortBy(_._3).toSeq)
    // empty input → empty output (the exactPrefixSums empty branch)
    assert(TextAnalysis.budgetSelect(
      d.filter(col("doc_id") < 0), "doc_id", "text", budget).count() == 0L)
  }

  test("quality budget select: best-first prefix, id tie-break, overrun at most one doc") {
    import spark.implicits._
    // quality descending 9..0, each doc 4 tokens; ties planted at q=7
    val d = (0 until 12).map { i =>
      (i.toLong, (if (i < 10) 9 - i else 7).toLong, "w w w w")
    }.toDF("doc_id", "q", "text")
    val out = TextAnalysis.budgetSelectByQuality(d, "doc_id", "text", "q",
        tokenBudget = 18L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(_._3)
    // order: q=9 (doc 0), 8 (1), 7 (2, then ties 10, 11 by id), 6 (3)…
    // cums 4,8,12,16,20 — doc 20 starts at 16 < 18 → kept (overrun ≤ 1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 10L, 11L), s"got ${out.toSeq}")
    assert(out.last._3 == 20L)
    // deterministic on any partitioning
    val again = TextAnalysis.budgetSelectByQuality(d.repartition(5),
        "doc_id", "text", "q", tokenBudget = 18L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._3)
    assert(again.toSeq == out.toSeq)
  }

  test("grouped budget select: per-group hash-order prefix; groups isolated; null group kept") {
    import spark.implicits._
    val d = (0 until 60).map { i =>
      val grp = i % 3 match {
        case 0 => "en"; case 1 => "de"; case 2 => null
      }
      (i.toLong, grp, Seq.fill(3 + i % 7)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val budget = 40L
    val out = TextAnalysis.budgetSelectByGroup(d, "doc_id", "lang", "text", budget)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference per group: hash order + running sum in plain Scala
    val hashed = d.select(col("lang"), col("doc_id"),
        TextAnalysis.hash60(col("doc_id")).as("hk"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = hashed.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      rows.sortBy(t => (t._3, t._2))
        .scanLeft((Option.empty[String], 0L, 0L, 0L)) {
          case ((_, _, _, cum), (gg, id, _, n)) => (gg, id, n, cum + n)
        }.tail
        .takeWhile { case (_, _, n, cum) => cum - n < budget }
    }.toSet
    assert(out.toSet == expected, s"extra=${out.toSet.diff(expected)} missing=${expected.diff(out.toSet)}")
    // every group (the NULL one included) covers its budget independently
    Seq(Some("en"), Some("de"), None).foreach { g =>
      val tok = out.filter(_._1 == g).map(_._3).sum
      assert(tok >= budget, s"group $g under budget: $tok")
    }
    // deterministic on any partitioning
    val again = TextAnalysis.budgetSelectByGroup(
      d.repartition(7), "doc_id", "lang", "text", budget)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSet == out.toSet)
  }

  test("length quantiles: exact equi-depth tiers with boundary lengths from the sorted order") {
    import spark.implicits._
    val lens = Seq(0, 1, 1, 2, 3, 5, 8, 8, 8, 13, 21, 34, 55)
    val d = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" ")) }.toDF("doc_id", "text")
    val out = TextAnalysis.lengthQuantiles(d, "doc_id", "text", nBuckets = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // reference: sort by (len, id), bucket = (rank-1)*4 DIV n
    val ref = lens.zipWithIndex.map { case (n, i) => (n.toLong, i.toLong) }
      .sorted.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 4 / lens.size }
      .view.mapValues { rows =>
        (rows.size.toLong, rows.map(_._1._1).min, rows.map(_._1._1).max) }.toMap
    assert(out == ref, s"got $out expected $ref")
    assert(out.values.map(_._1).sum == lens.size.toLong)
    // deterministic on any partitioning
    val again = TextAnalysis.lengthQuantiles(d.repartition(5), "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(again == out)
  }

  test("token-length histogram: buckets follow the EstimatedHistogram add rule, totals conserved") {
    import spark.implicits._
    val off = graft.util.EstimatedHistogram.bucketOffsets
    val lens = Seq(0, 1, 2, 9, 10, 11, 12, 100, 100, 144)
    val d = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" ")) }.toDF("doc_id", "text")
    val out = TextAnalysis.tokenLengthHistogram(d, "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.values.map(_._2).sum == lens.size) // every doc lands somewhere
    // drive the ACTUAL histogram class with the same values: the
    // DataFrame bucket vector must equal the instance's snapshot —
    // per-bucket counts included, not just the bucket rule
    val h = new graft.util.EstimatedHistogram
    lens.foreach(v => h.add(v.toLong))
    val snap = h.snapshot()
    snap.zipWithIndex.filter(_._1 > 0).foreach { case (c, b) =>
      assert(out(b.toLong)._2 == c, s"bucket $b: df=${out.get(b.toLong)} hist=$c")
    }
    assert(out.keySet == snap.zipWithIndex.filter(_._1 > 0).map(_._2.toLong).toSet)
    // hi = the bucket's upper boundary from the shared offsets table
    out.foreach { case (b, (hi, _)) =>
      assert(hi == off(math.min(b, off.length - 1).toInt), s"bucket $b hi=$hi")
    }
  }

  test("chunk dedup: shared boilerplate flags every copy after the first, copies counted") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"boiler$i").mkString(" ") // one full chunk
    val d = Seq(
      (1L, boiler + " unique one text here"),
      (2L, boiler + " other content entirely"),
      (3L, "standalone document with no shared passage at all"))
      .toDF("doc_id", "text")
    // maxTokens=8, stride=8: doc 1/2 chunk 0 = the boilerplate, identical
    val out = Dedup.dedupChunks(d, "doc_id", "text", maxTokens = 8, stride = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out((1L, 0L)) == ((0L, 2L))) // first occurrence kept, 2 copies
    assert(out((2L, 0L)) == ((1L, 2L))) // second copy flagged
    assert(out((3L, 0L)) == ((0L, 1L))) // unshared chunk untouched
    // doc 1/2 tail chunks are distinct → not dup
    assert(out((1L, 1L))._1 == 0L && out((2L, 1L))._1 == 0L)
  }

  test("quality audit bitmap: reasons decompose into the standalone rule lineages") {
    import spark.implicits._
    // 60 distinct content words + each stopword once: zero token dup,
    // every bigram unique, all gopher bounds satisfied
    val en = ("the and of to in is that have be with" +:
      (1 to 60).map(i => s"word$i")).mkString(" ")
    val d = Seq(
      (1L, en),
      (2L, en + " spam"),
      (3L, ("spam " * 60).trim), // repetition + blocklist + gopher + stopword
      (4L, "alpha beta gamma delta " * 15), // no stopwords → stopword + gopher bits
      (5L, "solo")) // <2 tokens: still audited, repetition bit simply 0
      .toDF("doc_id", "text")
    val t = TextAnalysis
    val out = t.qualityAudit(d, "doc_id", "text",
      blockWords = Seq("spam"), stopwords = t.langStopwords.toMap.apply("en"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((0L, 1L))) // clean doc keeps
    assert(out(2L)._1 == 4L && out(2L)._2 == 0L) // blocklist bit only
    assert((out(3L)._1 & 2L) == 2L && (out(3L)._1 & 4L) == 4L && out(3L)._2 == 0L)
    assert((out(4L)._1 & 8L) == 8L && out(4L)._2 == 0L)
    // one-token doc: one audit row, gopher+stopword bits, repetition 0
    assert(out(5L)._1 == 9L && out(5L)._2 == 0L)
    // bit decomposition ≡ the standalone lineages, doc by doc
    val g = t.gopherRules(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (1L - r.getLong(8))).toMap
    val bl = t.blocklistSignals(d, "doc_id", "text", Seq("spam"))
      .collect().map(r => r.getLong(0) -> (if (r.getLong(2) > 0) 1L else 0L)).toMap
    out.foreach { case (id, (reasons, _)) =>
      assert((reasons & 1L) == g(id), s"gopher bit for $id")
      assert(((reasons >> 2) & 1L) == bl(id), s"blocklist bit for $id")
    }
  }

  test("fused audit ≡ lineage audit doc-for-doc, with half the source scans") {
    import spark.implicits._
    val en = ("the and of to in is that have be with" +:
      (1 to 60).map(i => s"word$i")).mkString(" ")
    val d = Seq((1L, en), (2L, en + " spam"), (3L, ("spam " * 60).trim),
      (4L, "alpha beta gamma delta " * 15), (5L, "solo"))
      .toDF("doc_id", "text")
    val t = TextAnalysis
    val fused = t.qualityAuditFused(d, "doc_id", "text",
      Seq("spam"), t.langStopwords.toMap.apply("en"))
    val lineage = t.qualityAudit(d, "doc_id", "text",
      Seq("spam"), t.langStopwords.toMap.apply("en"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(fused) == rows(lineage))
    // the SAME fused plan reads the source twice (flags pass +
    // repetition), the lineage plan four times — count source relations
    // in the optimized plan (stable before/after AQE finalization)
    def scans(df: org.apache.spark.sql.DataFrame) =
      "LocalRelation".r.findAllIn(df.queryExecution.optimizedPlan.toString).size
    assert(scans(fused) == 2 && scans(lineage) == 4,
      s"${scans(fused)} vs ${scans(lineage)}")
  }

  test("source report: keep rates roll up the audit verdicts exactly") {
    import spark.implicits._
    val en = ("the and of to in is that have be with" +:
      (1 to 60).map(i => s"word$i")).mkString(" ")
    val d = Seq((1L, en, "a"), (2L, en + " junk", "a"),
      (3L, ("spam " * 60).trim, "b"), (4L, en, "b"), (5L, en, "b"))
      .toDF("doc_id", "text", "source")
    val t = TextAnalysis
    val out = t.sourceQualityReport(d, "doc_id", "text", "source",
      Seq("spam"), t.langStopwords.toMap.apply("en"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("a") == ((2L, 2L, 1000L))) // both clean docs keep
    assert(out("b") == ((3L, 2L, 666L)))  // the spam doc drops, floor permille
  }

  test("temperature gate corpus pass is shuffle-free: broadcast join + filter only") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val rates = Seq(("en", 90L, 500L), ("de", 110L, 700L))
      .toDF("grp", "n", "rate_permille")
    val plan = TextAnalysis.applyTemperatureRates(docs, "doc_id", "lang", rates)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the 100 TB contract: the corpus side never repartitions — the only
    // exchange anywhere is the broadcast of the tiny rate table
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"), plan.take(3000))
  }

  test("temperature gate: applies trained rates, drops groups without a budget") {
    import spark.implicits._
    val hist = ((0 until 90).map(i => (i.toLong, "en")) ++
      (90 until 100).map(i => (i.toLong, "de"))).toDF("doc_id", "lang")
    val rates = TextAnalysis.temperatureRates(hist, "lang", 0.5, 40L)
    val feed = Seq((200L, "en"), (201L, "de"), (202L, "fr")).toDF("doc_id", "lang")
    val out = graft.streaming.PipelineStream.temperatureGate(feed, "doc_id", "lang", rates)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!out.values.toSet.contains("fr")) // no trained budget → dropped
    // gate decision ≡ the batch sampler's on the same rates
    val batch = feed.select(col("doc_id").as("id"), col("lang").as("grp"),
        (TextAnalysis.hash60(col("doc_id")) % 1000).as("bucket"))
      .join(rates, Seq("grp")).filter(col("bucket") < col("rate_permille"))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(out.keySet == batch)
  }

  test("exactRankBuckets equals the global-window rank without a global window") {
    import spark.implicits._
    val df = (0 until 97).map(i => (i.toLong, (i * 37 % 13).toLong)).toDF("id", "score")
    val out = TextAnalysis.exactRankBuckets(
      df, Seq(col("score").desc, col("id").asc), nBuckets = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    // reference: plain Scala global sort
    val sorted = (0 until 97).map(i => (i.toLong, (i * 37 % 13).toLong))
      .sortBy { case (id, s) => (-s, id) }
    val exp = sorted.zipWithIndex.map { case ((id, _), ix) =>
      id -> (((ix + 1).toLong, (ix.toLong * 3) / 97)) }.toMap
    assert(out == exp)
    // equi-depth: bucket sizes differ by at most 1
    val sizes = out.values.groupBy(_._2).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"bucket sizes $sizes")
    // empty input → empty output with the rank/bucket schema, no throw
    val empty = TextAnalysis.exactRankBuckets(
      df.filter(col("id") < 0), Seq(col("score").asc), 3)
    assert(empty.columns.contains("rank") && empty.count() == 0)
    // the plan must NOT contain a single-partition global sort window:
    // every Window sees the pid-partitioned frame (SinglePartition absent)
    val plan = TextAnalysis.exactRankBuckets(
      df, Seq(col("score").desc, col("id").asc), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(3000))
  }

  test("kmeans exact step: planted clusters separate, stats bit-stable, codebook broadcasts") {
    import spark.implicits._
    // two tight planted clusters around (0,0,0,0) and (10,10,10,10);
    // seeds = ids 0,1 land one in each cluster
    val vecs = Seq(
      (0L, Seq(0.1f, 0.2f, 0.0f, 0.1f)), (1L, Seq(10.0f, 9.9f, 10.1f, 10.0f)),
      (2L, Seq(0.0f, 0.1f, 0.2f, 0.0f)), (3L, Seq(9.8f, 10.2f, 10.0f, 9.9f)),
      (4L, Seq(0.2f, 0.0f, 0.1f, 0.2f)), (5L, Seq(10.1f, 10.0f, 9.9f, 10.1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kmeansStepExact(vecs, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 8) // 2 clusters × 4 dims
    // each cluster holds exactly its 3 planted members
    assert(out.values.forall(_._2 == 3L))
    // cluster means recover the planted centers (micro-sums / (1e6·n))
    val mean0 = out((0L, 0L))._1 / (1e6 * 3)
    val mean1 = out((1L, 0L))._1 / (1e6 * 3)
    assert(math.abs(mean0 - 0.1) < 0.2 && math.abs(mean1 - 9.97) < 0.2, s"$mean0 $mean1")
    // bit-stable on any partitioning (pure-integer distances and sums)
    val again = Similarity.kmeansStepExact(vecs.repartition(7), "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(again == out)
    // the seed component table must broadcast onto the corpus side
    val plan = Similarity.kmeansStepExact(vecs, "vec_id", "embedding", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
  }

  test("kmeans stats merge law: shard partials sum to the whole-corpus statistics") {
    import spark.implicits._
    val vecs = (0L until 20L).map(i =>
      (i, Seq((i % 4).toFloat, (i % 3).toFloat, (i % 5).toFloat)))
      .toDF("vec_id", "embedding")
    // centroids must be IDENTICAL across shards for partials to merge:
    // fix them to the global seeds by keeping ids 0..k-1 in every shard
    val k = 2
    val whole = Similarity.kmeansStepExact(vecs, "vec_id", "embedding", k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val seeds = vecs.filter(col("vec_id") < k)
    val shardA = Similarity.kmeansStepExact(
      seeds.unionByName(vecs.filter(col("vec_id") >= k && col("vec_id") % 2 === 0)),
      "vec_id", "embedding", k)
    val shardB = Similarity.kmeansStepExact(
      seeds.unionByName(vecs.filter(col("vec_id") >= k && col("vec_id") % 2 === 1)),
      "vec_id", "embedding", k)
    // merge = element-wise sum, minus one double-counted seed contribution
    val merged = shardA.unionByName(shardB)
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("sum_micro")).as("s"), sum(col("n")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val seedComp = seeds.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        round(col("x").cast("double") * lit(1e6)).cast("long").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    whole.foreach { case ((c, p), (s, n)) =>
      val (ms, mn) = merged((c, p))
      // each seed assigns to its own cluster in every shard → subtract one copy
      assert(ms - seedComp((c, p)) == s && mn - 1 == n,
        s"cluster $c pos $p: merged ($ms,$mn) vs whole ($s,$n)")
    }
  }

  test("kmeans refine delta: tight clusters don't move; assignExact agrees with the refine pass") {
    import spark.implicits._
    // seeds 0,1 start inside the two tight planted clusters → the refined
    // centroids stay inside them and NO vector migrates
    val vecs = Seq(
      (0L, Seq(0.1f, 0.2f, 0.0f, 0.1f)), (1L, Seq(10.0f, 9.9f, 10.1f, 10.0f)),
      (2L, Seq(0.0f, 0.1f, 0.2f, 0.0f)), (3L, Seq(9.8f, 10.2f, 10.0f, 9.9f)),
      (4L, Seq(0.2f, 0.0f, 0.1f, 0.2f)), (5L, Seq(10.1f, 10.0f, 9.9f, 10.1f)))
      .toDF("vec_id", "embedding")
    val delta = Similarity.kmeansRefineDelta(vecs, "vec_id", "embedding", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(delta.size == 6 && delta.values.forall(!_._3)) // nothing moved
    assert(delta.values.count(_._1 == 0L) == 3)
    // assignExact against the refined integer centroid table reproduces
    // the refine pass's second assignment (the persisted-codebook path)
    val refined = Similarity.refinedCentroids(
      Similarity.kmeansStepExact(vecs, "vec_id", "embedding", 2))
    val re = Similarity.assignExact(vecs, "vec_id", "embedding", refined, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == delta.view.mapValues(_._2).toMap)
    // a NEW vector near the second cluster assigns there
    val nu = Seq((99L, Seq(9.9f, 10.0f, 10.0f, 10.0f))).toDF("vec_id", "embedding")
    val c = Similarity.assignExact(nu, "vec_id", "embedding", refined, 2)
      .collect().head
    assert(c.getLong(1) == delta(1L)._2)
  }

  test("perplexity buckets: deterministic exact-rank tiers; singleton transitions top out") {
    import spark.implicits._
    val fluent = "the cat sat on the mat and the cat sat on the mat again"
    val d = Seq((1L, fluent), (2L, fluent),
      (3L, "zebra quartz vortex nymph jigsaw phlegm crwth zest blitz fjord"),
      (4L, "one two three four five six seven eight nine ten eleven twelve"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (6L, "the cat sat on a mat near the cat on the mat"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.perplexityBuckets(d, "doc_id", "text", nBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(4)))
    assert(out.map(_._3).sorted.toSeq == (1L to 6L).toSeq) // ranks are a permutation
    val byId = out.map(t => t._1 -> t._4).toMap
    // singleton-transition docs have P(w2|w1)=1 everywhere → mean 1000, the
    // exact top of the unsmoothed bigram LM; ids 3,4 take the head tier
    assert(byId(3L) == "head" && byId(4L) == "head" && byId(5L) == "middle")
    // identical texts: identical mean, adjacent ranks (id tie-break)
    val m = out.map(t => t._1 -> t._2).toMap
    val rk = out.map(t => t._1 -> t._3).toMap
    assert(m(1L) == m(2L) && rk(2L) == rk(1L) + 1)
    assert(Set("head", "middle", "tail").subsetOf(out.map(_._4).toSet))
  }

  test("clusterTopics: separable clusters surface their own vocabulary, sizes exact") {
    import spark.implicits._
    def v(x: Double): Array[Float] = Array(x.toFloat, (1 - x).toFloat, 0f, 0f)
    // ids 0..9 near (1,0): "alpha" docs; ids 10..19 near (0,1): "omega" docs
    val emb = ((0L to 9L).map(i => (i, v(0.9 + 0.01 * i))) ++
      (10L to 19L).map(i => (i, v(0.01 * (i - 10))))).toDF("vec_id", "embedding")
    val docs = ((0L to 9L).map(i => (i, s"alpha beam common$i shared")) ++
      (10L to 19L).map(i => (i, s"omega wave common$i shared"))).toDF("doc_id", "text")
    val got = Similarity.clusterTopics(emb, "vec_id", "embedding",
      docs, "doc_id", "text", k = 2, topTerms = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.map(_._2).forall(_ == 10L), got.mkString(","))  // 10 docs per cluster
    val byCluster = got.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byCluster.size == 2)
    // each cluster's distinctive pair is its exclusive vocabulary, never
    // the corpus-wide 'shared' term
    assert(byCluster.values.toSet == Set(Set("alpha", "beam"), Set("omega", "wave")),
      byCluster.toString)
  }

  test("bm25: idf ranks rare above common, length norm ranks short above long, saturating tf, positive stopword idf") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "rare filler filler filler"),          // rare term, short doc
      (2L, "rare filler filler filler extra extra extra extra"), // rare, longer
      (3L, "common filler filler filler"),
      (4L, "common common filler filler"),        // tf 2
      (5L, "common common common common filler filler"), // tf 4
      (6L, "filler junk junk junk")) ++
      (7L to 12L).map(i => (i, "common pad pad pad")) // make 'common' common
    val docs = corpus.toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, "doc_id", "text", "rare common", k = 12)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // idf: doc 1 (rare) outscores every common-only doc
    assert(out(1L) > out(4L) && out(1L) > out(5L), out.toString)
    // length normalization: same tf=1 of 'rare', shorter doc wins
    assert(out(1L) > out(2L), out.toString)
    // tf saturation: more tf still helps but with diminishing returns
    // (per-unit gain shrinks)
    assert(out(4L) > out(3L) && out(5L) > out(4L))
    assert(out(4L) - out(3L) > (out(5L) - out(4L)) / 2)
    // 'common' appears in 9 of 12 docs — Lucene idf stays positive
    assert(out(3L) > 0L)
    // no 'junk'-only doc sneaks in
    assert(!out.contains(6L))
  }

  test("bm25 standing index: indexed ≡ ad-hoc; delta fold is a pure append; empty docs weight N") {
    import spark.implicits._
    val corpus = (Seq(
      (1L, "rare filler filler filler"),
      (2L, "rare filler filler filler extra extra extra extra"),
      (3L, "common filler filler filler"),
      (4L, "common common filler filler"),
      (5L, ""), // token-less doc: no postings, still weights N
      (6L, "filler junk junk junk")) ++
      (7L to 12L).map(i => (i, "common pad pad pad"))).toDF("doc_id", "text")
    val adhoc = TextAnalysis.bm25TopK(corpus, "doc_id", "text", "rare common", k = 12)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // standing 3/4 + delta 1/4 fold ≡ index built on the whole corpus
    val standing = corpus.filter(col("doc_id") % 4 =!= 0)
    val delta = corpus.filter(col("doc_id") % 4 === 0)
    val foldedP = TextAnalysis.bm25Postings(standing, "doc_id", "text")
      .unionByName(TextAnalysis.bm25Postings(delta, "doc_id", "text"))
    val foldedL = TextAnalysis.bm25DocLens(standing, "doc_id", "text")
      .unionByName(TextAnalysis.bm25DocLens(delta, "doc_id", "text"))
    val indexed = TextAnalysis.bm25TopKIndexed(foldedP, foldedL, "rare common", k = 12)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(indexed == adhoc, s"$indexed vs $adhoc")
    // N counts the token-less doc through docLens (12 docs, 1 empty)
    assert(foldedL.count() == 12 &&
      foldedP.select(col("id")).distinct().count() == 11)
  }

  test("readability: exact fixed-point Flesch, easy text above dense text, guards null") {
    import spark.implicits._
    val d = Seq(
      (1L, "The cat sat. The dog ran. It is fun."),   // short words, short sentences
      (2L, "Extraordinarily complicated terminological considerations " +
        "necessitate exhaustive interdisciplinary collaboration."), // 1 sentence, long words
      (3L, "no terminator here"),
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.readability(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    // doc 1: W=9, S=3, Y=9 -> 206835 - 3045 - 84600 = 119190
    assert(got(1L) == ((9L, Some(119190L))), got.toString)
    assert(got(2L)._2.get < got(1L)._2.get) // dense text reads harder
    assert(got(3L)._2.isEmpty && got(4L)._2.isEmpty) // no sentences / no words
  }

  test("language consistency: embedded foreign paragraph flags, pure docs stay clean") {
    import spark.implicits._
    val en = "the cat and the dog in the house is big and the end"
    val de = "der hund und die katze ist ein tier und das haus"
    val d = Seq(
      (1L, s"$en ||| $en ||| $de"), // mixed: 2 en + 1 de, doc label en
      (2L, s"$en ||| $en"),
      (3L, de))
      .toDF("doc_id", "text")
    val got = TextAnalysis.languageConsistency(d, "doc_id", "text", "\\|\\|\\|")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (("en", 3L, 1L)), got.toString)
    assert(got(2L) == (("en", 2L, 0L)))
    assert(got(3L) == (("de", 1L, 0L)))
  }

  test("margin mining: planted alignment passes, hub region fails, cells prune") {
    import spark.implicits._
    // cell 0: src 1 aligns with dst 11 (identical direction), while dst
    // 12/13 are its other neighborhood (orthogonal-ish) — high margin.
    // cell 1: a HUB — src 2 and all dsts nearly identical, so the best
    // score barely exceeds the neighborhood average → margin ≈ 1 < τ.
    // cell 2: src only (no dst) — pruned by the cell join, no output.
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val src = Seq(
      (1L, 0L, v(1, 0, 0, 0)), (2L, 1L, v(1, 1, 1, 0)), (3L, 2L, v(0, 0, 0, 1)))
      .toDF("vec_id", "label", "embedding")
    val dst = Seq(
      (11L, 0L, v(0.99, 0.1, 0, 0)), (12L, 0L, v(0.1, 0.99, 0, 0)),
      (13L, 0L, v(0, 0.1, 0.99, 0)),
      (21L, 1L, v(1, 1, 0.99, 0)), (22L, 1L, v(1, 0.99, 1, 0)),
      (23L, 1L, v(0.99, 1, 1, 0)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.marginMine(src, dst, "vec_id", "embedding", "label",
      kMargin = 3, tauPermille = 1100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(got.map(_._1).toSet == Set(1L), got.mkString(","))
    assert(got.head._2 == 11L && got.head._3 >= 1100L)
    // hub margin really was computed and rejected (≈1000‰), not missing
    val all = Similarity.marginMine(src, dst, "vec_id", "embedding", "label",
      kMargin = 3, tauPermille = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(all.keySet == Set(1L, 2L) && all(2L) < 1100L)
  }
}
