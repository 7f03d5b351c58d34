package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  * All pure `functions._` / codegen'd expressions — no UDFs — so they run
  * inside whole-stage codegen and scale linearly with input splits.
  * ([[rollingFingerprint]] resolves through the graft function registry —
  * `GraftFunctions.register(spark)` must have run, which every engine
  * entry point does; [[rollingFingerprintSql]] is the registration-free
  * equivalent.)
  */
object TextAnalysis {

  /** Whitespace-collapse + lowercase normalization (dedup canonical form). */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), lit("\\s+"), lit(" ")))

  /** Deterministic document fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(encode(normalized(text), "UTF-8"))

  /** Non-empty whitespace-separated tokens. (`\S` differs between Java
    * and RE2 only on U+000B; the test corpus is printable ASCII — verified
    * across all SFs — where the two agree. For adversarial input use an
    * explicit char class, as tokensBpeIsh does.)
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  /** Canonical text normalization — the ingest front door every dedup /
    * fingerprint / shingle stage assumes has already run: Unicode NFC
    * (composed forms, so "é" and "e"+combining-accent fingerprint
    * identically), lowercase, whitespace runs collapsed to single spaces,
    * trimmed. Expression-only (NFC is the native graft_nfc expression
    * with an allocation-free ASCII fast path), codegen'd end to end.
    */
  def normalizeText(text: Column): Column =
    normalized(graft.functions.GraftFunctions.nfc(text))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword pre-tokenization: letter runs, digit runs, and single
    * non-alphanumeric marks as separate tokens (the GPT-2-style pre-split
    * that BPE merges start from, without the learned merges). Whitespace
    * is an EXPLICIT char class, not `\s` — Java's `\s` includes U+000B
    * where RE2's does not, and the explicit class has identical semantics
    * in both, so a SQL oracle reproduces the split exactly on any input.
    */
  def tokensBpeIsh(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]"), lit(0))

  def tokenCountBpeIsh(text: Column): Column = size(tokensBpeIsh(text))

  /** Winnowing-style rolling-hash fingerprint (Schleimer et al.: min over
    * the hashes of every k-char sliding window — robust to reordering and
    * local edits in a way the whole-document md5 is not). The window hash
    * is the 60-bit value of md5's first 15 hex chars, so any SQL engine
    * reproduces it; the whole computation is one codegen'd expression —
    * no shuffle, no UDF. `textCol` must reference an (already normalized)
    * string column by name.
    */
  def rollingFingerprint(textCol: String, k: Int = 16): Column =
    graft.functions.GraftFunctions.rollingMinHash(col(textCol), k)

  /** SQL formulation of [[rollingFingerprint]] — kept for the equivalence
    * spec (the native RollingMinHash expression must match it bit-for-bit;
    * this is also the shape the DuckDB oracle mirrors).
    */
  def rollingFingerprintSql(textCol: String, k: Int = 16): Column =
    expr(
      s"""array_min(transform(
         |  sequence(1, greatest(length($textCol) - ${k - 1}, 1)),
         |  i -> cast(conv(substring(md5(substring($textCol, i, $k)), 1, 15), 16, 10) as bigint)))""".stripMargin)

  /** Count of matches of a word-alternation regex (language scoring). */
  def stopwordScore(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text), lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Tiny deterministic stopword-based language id over {de,en,es,fr}:
    * argmax of stopword hits, ties resolved alphabetically-first (the CASE
    * chain makes the tie-break explicit and portable to any SQL oracle).
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un"))

  def langId(text: Column): Column = {
    val s = langStopwords.map { case (l, ws) => l -> stopwordScore(text, ws) }.toMap
    when(s("de") >= s("en") && s("de") >= s("es") && s("de") >= s("fr"), "de")
      .when(s("en") >= s("es") && s("en") >= s("fr"), "en")
      .when(s("es") >= s("fr"), "es")
      .otherwise("fr")
  }

  /** Flesch reading-ease in exact MILLI-points — the classic
    * readability quality feature with its rational coefficients kept in
    * fixed point: flesch_milli = 206835 − (1015·W) div S − (84600·Y)
    * div W, where W = whitespace words, S = sentence terminators
    * ([.!?] runs), Y = syllable proxy (vowel-group [aeiouy]+ runs, the
    * standard heuristic). Each term truncates (defined fixed-point
    * semantics a SQL `//` mirrors on these non-negative counts);
    * word-free or sentence-free docs yield NULL rather than an
    * engine-dependent division error. Pure projection, no shuffle.
    */
  def readability(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("id"),
        tokenCount(col(textCol)).cast("long").as("n_words"),
        size(regexp_extract_all(col(textCol), lit("[.!?]+"), lit(0)))
          .cast("long").as("n_sentences"),
        size(regexp_extract_all(lower(col(textCol)), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syllables"))
      .withColumn("flesch_milli",
        when(col("n_words") > 0 && col("n_sentences") > 0,
          lit(206835L) - expr("1015 * n_words div n_sentences")
            - expr("84600 * n_syllables div n_words")))

  /** Segment-level language consistency (the CCNet practice of
    * language-identifying PARAGRAPHS, because web documents mix
    * languages and a doc-level label hides embedded foreign passages):
    * each document's segments run the same [[langId]] heuristic, and
    * the report counts segments disagreeing with the doc-level label.
    * Returns (id, doc_lang, n_segments, n_disagree) — n_disagree > 0 is
    * the mixed-language review queue. One split explode + one per-doc
    * aggregate; every scoring expression is the shared langId
    * definition, so doc and segment labels cannot drift.
    */
  def languageConsistency(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, delimRegex: String): org.apache.spark.sql.DataFrame =
    Dedup.paragraphs(
        df.select(col(idCol).as("id"), col(textCol).as("text")),
        "id", "text", delimRegex)
      .join(df.select(col(idCol).as("id"), langId(col(textCol)).as("doc_lang")),
        Seq("id"))
      .groupBy(col("id"), col("doc_lang"))
      .agg(count(lit(1)).as("n_segments"),
        sum((langId(col("para")) =!= col("doc_lang")).cast("long"))
          .as("n_disagree"))

  /** Integer quality features (exact, no float drift): char/alpha/digit/
    * whitespace counts + a keep flag (≥50 chars and ≥50% alphabetic).
    */
  def nChars(text: Column): Column = length(text).cast("long")
  def nAlpha(text: Column): Column = length(regexp_replace(text, lit("[^a-zA-Z]"), lit(""))).cast("long")
  def nDigit(text: Column): Column = length(regexp_replace(text, lit("[^0-9]"), lit(""))).cast("long")
  def nWhitespace(text: Column): Column = (length(text) - length(regexp_replace(text, lit("\\s"), lit("")))).cast("long")
  def keepFlag(text: Column): Column = nChars(text) >= 50 && nAlpha(text) * 2 >= nChars(text)

  // ---- PII redaction (training-data scrubbing pass) ----
  //
  // All three patterns use only constructs with identical semantics in
  // Java regex and RE2 (char classes, bounded repeats, alternation-free),
  // so a SQL oracle reproduces the redaction byte-for-byte. Whitespace is
  // an explicit class, not \s (see tokensBpeIsh). Order matters: URLs
  // first (an email-shaped userinfo inside a URL must redact as part of
  // the URL), then emails, then phone numbers.

  def redactUrls(text: Column): Column =
    regexp_replace(text, lit("https?://[^ \\t\\n\\r]+"), lit("<URL>"))

  def redactEmails(text: Column): Column =
    regexp_replace(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>"))

  /** International-ish phone shapes: optional +CC, dash/space separated
    * 3+4 groups (the common NANP writing). Deliberately conservative —
    * a looser digit-run pattern would eat ids and timestamps.
    */
  def redactPhones(text: Column): Column =
    regexp_replace(text,
      lit("\\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{4}"), lit("<PHONE>"))

  /** Full scrub: URL → email → phone, each replaced by a typed tag. */
  def redactPii(text: Column): Column =
    redactPhones(redactEmails(redactUrls(text)))

  /** Fixed-size token-window chunking (context-length preparation for
    * training pipelines): windows of `maxTokens` whitespace tokens
    * starting every `stride` tokens, final partial window kept, empty
    * documents dropped. Output (id, chunk_id, chunk_text). Pure
    * expressions — the 1→N fan-out is a posexplode over a transform'd
    * window list, no shuffle at all.
    */
  def chunkByTokens(df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      maxTokens: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(maxTokens >= 1 && stride >= 1, "maxTokens and stride must be >= 1")
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) >= 1)
      .select(col("id"),
        posexplode(expr(
          s"""transform(sequence(0, (size(_toks) - 1) DIV $stride),
             | i -> array_join(slice(_toks, i * $stride + 1, $maxTokens), ' '))""".stripMargin))
          .as(Seq("chunk_id", "chunk_text")))
  }

  /** Concat-and-split sequence packing: within each shard, chunks are
    * laid out in a deterministic order, each at the running token offset
    * of everything before it, and bin_id = offset DIV binTokens — the
    * "concatenate the stream, cut every binTokens tokens" packing that
    * training pipelines run after chunking. Whole chunks are assigned to
    * the bin their span STARTS in.
    *
    * The running sum is a window per SHARD, not a global one — a global
    * total order is a single-task bottleneck at scale, so callers shard
    * (doc hash, domain, worker id) exactly like real packing runs do.
    */
  def packChunks(chunks: org.apache.spark.sql.DataFrame, shardCol: String,
      orderCols: Seq[String], tokenCol: String, binTokens: Int): org.apache.spark.sql.DataFrame = {
    require(binTokens >= 1, "binTokens must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(shardCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("off", coalesce(sum(col(tokenCol)).over(w), lit(0L)).cast("long"))
      .withColumn("bin_id", expr(s"off DIV $binTokens"))
  }

  /** Gopher-style repetition signals per document (integer per-mille —
    * no float drift, SQL-oracle exact): duplicate-token fraction and the
    * share of bigram slots taken by the single most repeated bigram.
    * Documents under 2 tokens are dropped (no bigram denominator).
    * ONE scan, two partial-aggregated shuffles (per-(doc,bigram) count,
    * then per-doc max): n/nd ride along as grouping-invariant firsts, so
    * the tokenization never runs twice.
    */
  def repetitionSignals(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) >= 2)
      .select(col("id"),
        size(col("_toks")).as("n"),
        size(array_distinct(col("_toks"))).as("nd"),
        explode(expr(
          """transform(sequence(1, size(_toks) - 1),
            | i -> concat(element_at(_toks, i), ' ', element_at(_toks, i + 1)))""".stripMargin))
          .as("bg"))
      .groupBy(col("id"), col("bg"))
      .agg(count(lit(1)).as("c"), first(col("n")).as("n"), first(col("nd")).as("nd"))
      .groupBy(col("id"))
      .agg(max(col("c")).as("top"), first(col("n")).as("n"), first(col("nd")).as("nd"))
      .select(col("id"),
        col("n").cast("long").as("n_tokens"),
        expr("(CAST(n AS BIGINT) - CAST(nd AS BIGINT)) * 1000L DIV CAST(n AS BIGINT)")
          .as("dup_token_permille"),
        expr("CAST(top AS BIGINT) * 1000L DIV (CAST(n AS BIGINT) - 1L)")
          .as("top_bigram_permille"))

  // ---- corpus-level training-data operators ----

  /** 60-bit deterministic hash of any column (md5 of its string form, first
    * 15 hex chars) — the cross-engine-reproducible sampling/sharding hash
    * (same trick as [[rollingFingerprint]]; always non-negative).
    */
  def hash60(c: Column): Column =
    conv(substring(md5(encode(c.cast("string"), "UTF-8")), 1, 15), 16, 10).cast("long")

  /** Word n-grams (space-joined) of the whitespace tokenization as one
    * expression; docs shorter than n yield an empty array. (The explicit
    * short-doc guard matters: Spark's sequence(1, 0) counts DOWN.)
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark decontamination (GPT-3 appx C / The Pile style): flag every
    * training document sharing at least one word n-gram with the eval set.
    * Returns (id, n_matched_grams) for CONTAMINATED docs only. The eval
    * set is tiny next to the corpus, so its distinct n-grams BROADCAST and
    * the train side stays a single pass: tokenize → explode distinct
    * n-grams → broadcast semi-join → per-doc count. The only shuffle is the
    * per-doc count of MATCHED rows (rare by construction at 100 TB).
    */
  def decontaminate(docs: org.apache.spark.sql.DataFrame,
      evalDocs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    // the eval side needs no ids here — tolerate text-only eval frames
    val evalWithId =
      if (evalDocs.columns.contains(idCol)) evalDocs
      else evalDocs.withColumn(idCol, lit(0L))
    docGrams(docs, idCol, textCol, n)
      .join(broadcast(docGrams(evalWithId, idCol, textCol, n)
        .select(col("gram")).distinct()), Seq("gram"), "left_semi")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_matched_grams"))
  }

  /** Distinct (id, word-n-gram) pairs — the candidate unit both
    * decontamination directions share, on the one [[wordNgrams]]
    * definition (short docs yield the empty array, which explode drops).
    */
  private def docGrams(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("id"),
      explode(array_distinct(wordNgrams(col(textCol), n))).as("gram"))

  /** Memorization-risk scoring (the dedup↔memorization link of Lee et
    * al. 2022 / Carlini et al.: text repeated across many training docs
    * is what models regurgitate): per document, the share of its
    * distinct word n-grams that occur in at least `minDf` documents
    * corpus-wide. ONE gram pass (lazy localCheckpoint) feeds the
    * document-frequency aggregate AND both per-doc counts; the risky
    * set joins back by gram — a plain shuffle semi-join, NOT broadcast,
    * because common phrases make the risky set corpus-scale in real
    * data. Returns (id, n_grams, n_risky, risky_permille) for docs with
    * ≥n tokens (gram-less docs drop, as in [[decontaminate]]).
    */
  def memorizationRisk(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int, minDf: Int): org.apache.spark.sql.DataFrame = {
    require(minDf >= 2, "minDf >= 2")
    val g = docGrams(docs, idCol, textCol, n).localCheckpoint(eager = false)
    val risky = g.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf).select(col("gram"))
    g.join(risky.withColumn("_r", lit(1L)), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), count(col("_r")).as("n_risky"))
      .select(col("id"), col("n_grams"), col("n_risky"),
        expr("n_risky * 1000 DIV n_grams").as("risky_permille"))
  }

  /** The eval-owner's view of decontamination — for each EVAL document,
    * how many distinct TRAIN documents share at least one word n-gram
    * (the report that decides whether a benchmark is burned and which
    * items to retire). [[decontaminate]] transposed: the eval (gram, id)
    * pairs are benchmark-sized and BROADCAST with their ids kept; the
    * train side is the same single tokenize pass; only MATCHED
    * (train-id, eval-id) rows shuffle into the per-eval distinct count
    * (map-side partial dedup). Eval docs with no leak report 0 via the
    * left join — absence of a row and "clean" must not be conflated in
    * a contamination report. Returns (eval_id, n_train_docs).
    */
  def contaminationReport(docs: org.apache.spark.sql.DataFrame,
      evalDocs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    val hits = docGrams(docs, idCol, textCol, n)
      .join(broadcast(docGrams(evalDocs, idCol, textCol, n)
        .select(col("id").as("eval_id"), col("gram"))), Seq("gram"))
      .groupBy(col("eval_id"))
      .agg(count_distinct(col("id")).as("n_train_docs"))
    evalDocs.select(col(idCol).as("eval_id"))
      .join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"))
  }

  /** Deterministic mixture sampling (training-data domain mixing): keep a
    * document iff hash60(id) mod 1000 falls under its language's per-mille
    * rate. Pure map-side filter — NO shuffle, no randomness, reproducible
    * and resumable at any scale; rates are a literal CASE chain so the
    * filter stays inside whole-stage codegen.
    */
  /** Per-language keep rate as ONE map-literal lookup: a when-chain would
    * mention the language expression once per configured language, and
    * predicate pushdown inlines whatever it references — with langId (4
    * regex scans) that multiplies real work. Languages must be unique in
    * `ratesPermille` (Spark map literals reject duplicate keys).
    */
  def rateFor(lang: Column, ratesPermille: Seq[(String, Int)],
      defaultPermille: Int): Column =
    if (ratesPermille.isEmpty) lit(defaultPermille)
    else coalesce(
      element_at(map(ratesPermille.flatMap { case (l, r) => Seq(lit(l), lit(r)) }: _*),
        lang),
      lit(defaultPermille))

  def mixtureSample(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, ratesPermille: Seq[(String, Int)],
      defaultPermille: Int): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("id"), langId(col(textCol)).as("lang"),
        (hash60(col(idCol)) % 1000).as("bucket"))
      .filter(col("bucket") < rateFor(col("lang"), ratesPermille, defaultPermille))

  /** Corpus token-length histogram in the [[graft.util.EstimatedHistogram]]
    * bucket space — the reference's ~20%-resolution geometric buckets
    * (utils/EstimatedHistogram.java growth rule) applied to a corpus
    * statistic instead of latencies: the data-card length distribution at
    * a resolution that stays ~90 rows whether the corpus is 1 GB or
    * 100 TB, element-wise summable across shards like the histogram's
    * snapshot vectors. bucket(v) = #{offsets ≤ v} (the class's binary-
    * search `add` rule, spelled as a filter over the literal boundary
    * array — a ~90-element interpreted lambda per row, fine in a
    * projection feeding an aggregate; never reference it from a join
    * condition, where pushdown would inline it into scans); `hi` is the
    * bucket's upper boundary, overflow reporting the last boundary
    * exactly as `percentile` does.
    */
  def tokenLengthHistogram(docs: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val off = graft.util.EstimatedHistogram.bucketOffsets
    val offArr = array(off.map(lit(_)): _*)
    docs
      .select(tokenCount(col(textCol)).cast("long").as("v"))
      .select(size(filter(offArr, o => o <= col("v"))).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("hi",
        element_at(offArr, least(col("bucket") + 1, lit(off.length.toLong)).cast("int")))
      .select(col("bucket"), col("hi"), col("n_docs"))
  }

  /** Quality-audit bitmap: ONE keep/drop decision per document with a
    * per-rule-family REASONS bitmask — the corpus-debugging view a
    * curation run ships next to its filtered output (why did this doc
    * drop; which rule family dominates; how do families overlap). Bits:
    * 1 = Gopher bundle rejects ([[gopherRules]] keep=0), 2 = repetition
    * ([[repetitionSignals]] thresholds), 4 = blocklist hit
    * ([[blocklistSignals]]), 8 = stopword ratio under `stopMinPermille`
    * (the p19 lineage). keep = (reasons == 0). Each family is computed by
    * the SAME gated lineage as its standalone operator (reuse over
    * fusion: auditability beats saving re-scans; each extra pass is a
    * linear map-side scan). The only shuffles are the per-doc-id joins
    * plus repetition's bigram aggregate. Docs with <2 tokens have no
    * repetition signal (the p25 contract) — they join LEFT with the bit
    * at 0, so every document gets exactly one audit row.
    */
  def qualityAudit(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, blockWords: Seq[String], stopwords: Seq[String],
      stopMinPermille: Int = 10, dupMaxPermille: Int = 300,
      topBigramMaxPermille: Int = 180): org.apache.spark.sql.DataFrame = {
    val g = gopherRules(docs, idCol, textCol)
      .select(col("id"), (lit(1L) - col("keep")).as("f_gopher"))
    val rep = repetitionSignals(docs, idCol, textCol)
      .select(col("id"),
        (col("dup_token_permille") > dupMaxPermille ||
          col("top_bigram_permille") > topBigramMaxPermille)
          .cast("long").as("f_rep"))
    val bl = blocklistSignals(docs, idCol, textCol, blockWords)
      .select(col("id"), (col("n_flagged") > 0L).cast("long").as("f_block"))
    val sw = docs.select(col(idCol).as("id"),
        stopwordScore(col(textCol), stopwords).cast("long").as("_stop"),
        tokenCount(col(textCol)).cast("long").as("_n"))
      .select(col("id"),
        (expr("_stop * 1000 div greatest(_n, 1)") < stopMinPermille)
          .cast("long").as("f_stop"))
    g.join(rep, Seq("id"), "left").join(bl, Seq("id")).join(sw, Seq("id"))
      .withColumn("reasons",
        col("f_gopher") + coalesce(col("f_rep"), lit(0L)) * 2 +
          col("f_block") * 4 + col("f_stop") * 8)
      .select(col("id"), col("reasons"),
        (col("reasons") === 0L).cast("long").as("keep"))
  }

  /** FUSED variant of [[qualityAudit]]: the three projection-family rule
    * bits (Gopher, blocklist, stopword) computed in ONE pass over a
    * single tokenize, with only the repetition lineage joined in (its
    * bigram aggregate is irreducible). Same output, half the corpus
    * scans — the production shape once the audit definition is frozen;
    * [[qualityAudit]] remains the default because its bits are literally
    * the standalone operators (auditability). Output equality with the
    * default path is spec-pinned and both gate under the SAME oracle
    * (the p52/p55 shared-definition pattern applied to a fusion).
    */
  def qualityAuditFused(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, blockWords: Seq[String], stopwords: Seq[String],
      stopMinPermille: Int = 10, dupMaxPermille: Int = 300,
      topBigramMaxPermille: Int = 180): org.apache.spark.sql.DataFrame = {
    require(blockWords.nonEmpty, "empty blocklist")
    val required = gopherRequired
    val blockList = array(blockWords.map(w => lit(w.toLowerCase)): _*)
    val rep = repetitionSignals(docs, idCol, textCol)
      .select(col("id"),
        (col("dup_token_permille") > dupMaxPermille ||
          col("top_bigram_permille") > topBigramMaxPermille)
          .cast("long").as("f_rep"))
    docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"),
        transform(split(col(textCol), "\n"), l => trim(l)).as("_lines"),
        stopwordScore(col(textCol), stopwords).cast("long").as("_stop"))
      .select(col("id"), col("_stop"),
        size(col("_toks")).cast("long").as("_nw"),
        length(array_join(col("_toks"), "")).cast("long").as("_chars"),
        size(filter(col("_toks"), t =>
          t.contains("#") || t.contains("..."))).cast("long").as("_sym"),
        size(filter(col("_lines"), l =>
          l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
          .cast("long").as("_bul"),
        size(filter(col("_lines"), l => l.endsWith("..."))).cast("long").as("_ell"),
        size(col("_lines")).cast("long").as("_nl"),
        size(filter(col("_toks"), t => t.rlike("[a-z]"))).cast("long").as("_alpha"),
        size(array_intersect(array_distinct(col("_toks")),
          array(required.map(lit(_)): _*))).cast("long").as("_stw"),
        size(filter(col("_toks"), t => array_contains(blockList, t)))
          .cast("long").as("_blocked"))
      .select(col("id"),
        (lit(1L) - (col("_nw") >= GopherBounds.minWords &&
          col("_nw") <= GopherBounds.maxWords &&
          when(col("_nw") === 0, lit(0L))
            .otherwise(expr("_chars * 1000 DIV _nw"))
            .between(GopherBounds.minMeanWordLenPermille,
              GopherBounds.maxMeanWordLenPermille) &&
          when(col("_nw") === 0, lit(0L))
            .otherwise(expr("_sym * 1000 DIV _nw")) <= GopherBounds.maxSymbolPermille &&
          when(col("_nl") === 0, lit(0L))
            .otherwise(expr("_bul * 1000 DIV _nl")) <= GopherBounds.maxBulletPermille &&
          when(col("_nl") === 0, lit(0L))
            .otherwise(expr("_ell * 1000 DIV _nl")) <= GopherBounds.maxEllipsisPermille &&
          when(col("_nw") === 0, lit(0L))
            .otherwise(expr("_alpha * 1000 DIV _nw")) >= GopherBounds.minAlphaPermille &&
          col("_stw") >= GopherBounds.minRequiredStopwords).cast("long")).as("f_gopher"),
        (col("_blocked") > 0L).cast("long").as("f_block"),
        (expr("_stop * 1000 div greatest(_nw, 1)") < stopMinPermille)
          .cast("long").as("f_stop"))
      .join(rep, Seq("id"), "left")
      .withColumn("reasons",
        col("f_gopher") + coalesce(col("f_rep"), lit(0L)) * 2 +
          col("f_block") * 4 + col("f_stop") * 8)
      .select(col("id"), col("reasons"),
        (col("reasons") === 0L).cast("long").as("keep"))
  }

  /** Per-source curation report (the data-card / dashboard aggregate):
    * the [[qualityAudit]] verdicts rolled up by a grouping column —
    * docs, kept docs, exact keep-permille per source. One id-keyed join
    * of the audit onto the (id, source) projection, then a |sources|-row
    * aggregate; every number is an exact integer.
    */
  def sourceQualityReport(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, sourceCol: String, blockWords: Seq[String],
      stopwords: Seq[String]): org.apache.spark.sql.DataFrame =
    qualityAudit(docs, idCol, textCol, blockWords, stopwords)
      .join(docs.select(col(idCol).as("id"), col(sourceCol).as("source")), Seq("id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_keep"))
      .withColumn("keep_permille", expr("n_keep * 1000 DIV n_docs"))

  /** Temperature-based mixture rates (multilingual rebalancing, the
    * XLM-R / mT5 recipe: sample group g with probability ∝ (n_g/N)^α,
    * α<1 flattening the head): per-group keep-rate in PERMILLE such that
    * the expected kept total is `targetDocs`. Rates can only downsample
    * (cap 1000‰); α-upsampling of tail groups is expressed as the head
    * groups' rates shrinking relative to the tail's.
    *
    * Exactness contract (the DSIR micro-quantization pattern): the only
    * float step is the per-group weight w_g = floor(1e6·n_g^α); everything
    * after — Z = Σw_g, rate = min(1000, 1000·T·w_g DIV (Z·n_g)) — is exact
    * BIGINT arithmetic, so the result is bit-stable across engines and
    * partitionings. For α = 0.5 the weight uses `sqrt`, which IEEE-754
    * requires correctly rounded in every engine, making even the float
    * step cross-engine exact; other α go through `pow` (≤1 ulp, not
    * guaranteed identical across engines — fine for production; for
    * cross-engine-exact quarter-power α use
    * [[temperatureRatesRational]]).
    *
    * Scale: one count aggregate over the corpus → a #groups-row frame;
    * Z is summed over that tiny frame. No corpus-sized shuffle beyond the
    * group count itself.
    */
  def temperatureRates(docs: org.apache.spark.sql.DataFrame, groupCol: String,
      alpha: Double, targetDocs: Long): org.apache.spark.sql.DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    val counts = docs.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"))
    val wExpr = if (alpha == 0.5) sqrt(col("n").cast("double"))
      else pow(col("n").cast("double"), alpha)
    ratesFromWeights(
      counts.withColumn("w", floor(lit(1e6) * wExpr).cast("long")), targetDocs)
  }

  /** Rate step shared by the float-α ([[temperatureRates]]) and
    * exact-rational-α ([[temperatureRatesRational]]) paths: given
    * (grp, n, w) weights, rate_g = min(1000, 1000·T·w_g DIV (Z·n_g))
    * with Z = Σw. Arithmetic in DECIMAL(38,0) (int128 on the DuckDB
    * side): the BIGINT products 1000·T·w and z·n overflow 2^63 once a
    * group holds ~4e8 docs (z·n ~ 1e6·n^1.5) — exactly the scale the
    * operator is for. 38 digits cover n,T ≤ 1e12 with room; result
    * still an exact integer division, so bit-stability is preserved.
    */
  private def ratesFromWeights(weighted: org.apache.spark.sql.DataFrame,
      targetDocs: Long): org.apache.spark.sql.DataFrame = {
    require(targetDocs > 0, "targetDocs > 0")
    val z = weighted.agg(sum(col("w")).as("z"))
    weighted.crossJoin(broadcast(z))
      .select(col("grp"), col("n"),
        least(lit(1000L),
          expr("CAST(CAST(1000 AS DECIMAL(38,0)) * " +
            s"${targetDocs}L * w DIV (CAST(z AS DECIMAL(38,0)) * n) AS BIGINT)"))
          .as("rate_permille"))
  }

  /** Exact-rational-α temperature rates — the oracle-safe path for
    * α ≠ 1/2 that [[temperatureRates]]'s scaladoc promises is possible:
    * for α = p/q (q ∈ {2,4}) the weight floor(S·n^(p/q)) equals the
    * integer q-th root of the exact integer S^q·n^p, and an integer
    * root is computable bit-identically in ANY engine as a float
    * candidate plus exact integer correction — floor(x^(1/q)) is the
    * largest r in [cand−2, cand+2] with r^q ≤ x, because the candidate
    * (double pow over an x ≤ 1e38, root ≤ 3.2e12 « 2^53) carries
    * absolute error « 1. No step depends on pow being correctly
    * rounded, so the contract that only α = 1/2 is cross-engine exact
    * is lifted to every quarter-power α.
    *
    * Scale S per α keeps S^q·n^p inside DECIMAL(38,0)/HUGEINT:
    * α=1/2 → S=1e6 (any BIGINT n); α=1/4 → S=1e6 (n ≤ 9.9e13);
    * α=3/4 → S=1e3 (n ≤ 4.6e8 docs PER GROUP — the corpus can be any
    * size across groups). S cancels in rate = 1000·T·w DIV (Z·n), so
    * mixing S across α never matters within one rate table, and at
    * S=1e3 the floor granularity is ≤ 1/(1e3·2^{3/4}) ≈ 0.06 % for
    * n ≥ 2 — below the permille resolution of the rate itself. A group
    * beyond its bound raises (raise_error) instead of silently
    * overflowing to null.
    */
  def temperatureRatesRational(docs: org.apache.spark.sql.DataFrame,
      groupCol: String, alphaNum: Int, alphaDen: Int,
      targetDocs: Long): org.apache.spark.sql.DataFrame = {
    require(alphaDen == 2 || alphaDen == 4, "alphaDen in {2, 4}")
    require(alphaNum >= 1 && alphaNum < alphaDen, "alpha in (0, 1)")
    val (p, q) = if (alphaNum % 2 == 0 && alphaDen % 2 == 0)
      (alphaNum / 2, alphaDen / 2) else (alphaNum, alphaDen)
    // S^q · n^p as DECIMAL(38,0), with the per-α group-count bound that
    // keeps the product (and the correction candidates' q-th powers)
    // inside 38 digits. (1,2) needs no guard: n ≤ Long.Max < 8.1e19.
    val (xSql, nBound) = (p, q) match {
      case (1, 2) => ("CAST(n AS DECIMAL(38,0)) * 1000000000000", 0L)
      case (1, 4) => ("CAST(n AS DECIMAL(38,0)) * 1000000000000000000000000",
        99000000000000L)
      case (3, 4) => ("CAST(n AS DECIMAL(38,0)) * n * n * 1000000000000",
        460000000L)
      case other => throw new IllegalArgumentException(
        s"unsupported reduced alpha $other")
    }
    val guarded = if (nBound == 0L) s"($xSql)"
      else s"(CASE WHEN n <= ${nBound}L THEN ($xSql) ELSE " +
        s"CAST(raise_error('temperatureRatesRational: group count exceeds " +
        s"the exact-arithmetic bound $nBound for alpha $p/$q') " +
        "AS DECIMAL(38,0)) END)"
    val candSql = if (q == 2) "CAST(FLOOR(SQRT(CAST(x AS DOUBLE))) AS DECIMAL(38,0))"
      else "CAST(FLOOR(POWER(CAST(x AS DOUBLE), 0.25)) AS DECIMAL(38,0))"
    def pw(r: String) = Seq.fill(q)(s"($r)").mkString(" * ")
    val rootSql =
      s"""CASE WHEN ${pw("c + 2")} <= x THEN c + 2
         |     WHEN ${pw("c + 1")} <= x THEN c + 1
         |     WHEN ${pw("c")} <= x THEN c
         |     WHEN ${pw("c - 1")} <= x THEN c - 1
         |     ELSE c - 2 END""".stripMargin
    val weighted = docs.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"))
      .withColumn("x", expr(guarded))
      .withColumn("c", expr(candSql))
      .withColumn("w", expr(rootSql).cast("long"))
      .drop("x", "c")
    ratesFromWeights(weighted, targetDocs)
  }

  /** [[temperatureSample]] on the exact-rational-α rates: same hash
    * gate, same broadcast shape — only the weight arithmetic differs.
    */
  def temperatureSampleRational(docs: org.apache.spark.sql.DataFrame,
      idCol: String, groupCol: String, alphaNum: Int, alphaDen: Int,
      targetDocs: Long): org.apache.spark.sql.DataFrame =
    applyTemperatureRates(docs, idCol, groupCol,
      temperatureRatesRational(docs, groupCol, alphaNum, alphaDen, targetDocs))

  /** The deterministic admission decision shared by the batch sampler
    * ([[temperatureSample]]) and the streaming gate
    * ([[graft.streaming.PipelineStream.temperatureGate]]) — one
    * definition so batch and feed can never desynchronize: keep a doc
    * iff hash60(id) mod 1000 falls under its group's broadcast rate;
    * groups absent from the rate table drop (no budget → no quota).
    */
  def applyTemperatureRates(docs: org.apache.spark.sql.DataFrame, idCol: String,
      groupCol: String, rates: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
        (hash60(col(idCol)) % 1000).as("bucket"))
      .join(broadcast(rates.select(col("grp"), col("rate_permille"))), Seq("grp"))
      .filter(col("bucket") < col("rate_permille"))
      .select(col("id"), col("grp"), col("bucket"), col("rate_permille"))

  /** Deterministic temperature-mixture sampling: [[temperatureRates]] per
    * `groupCol`, then the [[mixtureSample]] hash gate — keep a doc iff
    * hash60(id) mod 1000 falls under its group's rate. The rate table is
    * #groups rows and BROADCASTS; the corpus side is one map-side join +
    * filter, no shuffle, resumable at any scale.
    */
  def temperatureSample(docs: org.apache.spark.sql.DataFrame, idCol: String,
      groupCol: String, alpha: Double, targetDocs: Long): org.apache.spark.sql.DataFrame =
    applyTemperatureRates(docs, idCol, groupCol,
      temperatureRates(docs, groupCol, alpha, targetDocs))

  /** Exact global rank + equi-depth bucket WITHOUT a single-partition
    * window — the scalable form of `ntile`. Range-repartition on the sort
    * key, pin the partitioning (eager localCheckpoint — range bounds are
    * sampled per execution, so the offsets read below and the final pass
    * must see the SAME partitioning), read the per-partition counts
    * (#partitions rows — bounded driver collect), then rank = partition
    * offset + within-partition row_number. The within-partition window
    * shuffles by partition id only — every partition sorts locally in
    * parallel, nothing funnels through one task, which is what `ntile`
    * over a global ORDER BY would do (the describeSplits lesson).
    * Bucket b = (rank-1)·nBuckets DIV n ∈ [0, nBuckets).
    *
    * Ties: callers must pass a total order (append a unique id to the
    * sort key) or ranks within a tie are partition-placement-dependent.
    */
  /** Shared skeleton of the pid-offset family ([[exactRankBuckets]] /
    * [[exactPrefixSums]] / [[exactGroupRanks]]): range-repartition on
    * the sort key and PIN the partitioning (eager localCheckpoint —
    * range bounds are resampled per execution, so every later pass must
    * observe the SAME partition assignment), with the partition id
    * materialized as `__pid`. The pin is load-bearing: without it the
    * driver-read offsets and the final pass can see different bounds
    * and silently corrupt results.
    */
  private def pinnedRanged(df: org.apache.spark.sql.DataFrame,
      sortExprs: Seq[Column]): org.apache.spark.sql.DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartitionByRange(parts, sortExprs: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
  }

  /** Exclusive prefix offsets of a per-partition Long aggregate, in pid
    * order — the #partitions-row driver-side step the family shares.
    */
  private def pidOffsets(perPid: Array[(Int, Long)]): Array[(Int, Long)] = {
    val sorted = perPid.sortBy(_._1)
    sorted.map(_._1).zip(sorted.map(_._2).scanLeft(0L)(_ + _).init)
  }

  /** The rank half of [[exactRankBuckets]], with the population size it
    * already derived from the per-partition counts exposed to callers
    * that need N for their own fill rule (describe_splits' exact NTILE)
    * — no second pass over the ranked frame to recount.
    */
  def exactRanksWithTotal(df: org.apache.spark.sql.DataFrame,
      sortExprs: Seq[Column]): (org.apache.spark.sql.DataFrame, Long) = {
    val ranged = pinnedRanged(df, sortExprs)
    val cnts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val n = cnts.map(_._2).sum
    if (n == 0) // empty in, empty out — like every other operator (and the SQL twin)
      return (ranged.withColumn("rank", lit(0L)).drop("__pid"), 0L)
    val offMap = map(pidOffsets(cnts)
      .flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(sortExprs: _*)
    (ranged
      .withColumn("rank",
        row_number().over(w).cast("long") + element_at(offMap, col("__pid")))
      .drop("__pid"), n)
  }

  def exactRankBuckets(df: org.apache.spark.sql.DataFrame,
      sortExprs: Seq[Column], nBuckets: Int): org.apache.spark.sql.DataFrame = {
    require(nBuckets >= 1, "nBuckets >= 1")
    val (ranked, n) = exactRanksWithTotal(df, sortExprs)
    if (n == 0) ranked.withColumn("bucket", lit(0L))
    else ranked.withColumn("bucket",
      expr(s"CAST((rank - 1) * $nBuckets DIV ${n}L AS BIGINT)"))
  }

  /** Exact global (inclusive) prefix sum WITHOUT a single-partition
    * window — the running-total sibling of [[exactRankBuckets]], same
    * skeleton: range-repartition on the sort key, PIN the partitioning
    * (range bounds resample per execution), read per-partition VALUE
    * SUMS (#partitions rows — driver-bounded by configuration), then
    * cum = partition offset + within-partition running sum. A
    * `SUM OVER (ORDER BY …)` window would serialize the whole corpus
    * through one task; here each range partition accumulates locally.
    * Appends `cum` (inclusive: includes the row's own value). Callers
    * pass a total order; `valueCol` must be integral (sums are exact
    * BIGINTs).
    */
  def exactPrefixSums(df: org.apache.spark.sql.DataFrame,
      sortExprs: Seq[Column], valueCol: String): org.apache.spark.sql.DataFrame = {
    val ranged = pinnedRanged(df, sortExprs)
    val sums = ranged.groupBy(col("__pid"))
      .agg(sum(col(valueCol)).cast("long").as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    if (sums.isEmpty) // empty in, empty out
      return ranged.withColumn("cum", lit(0L)).drop("__pid")
    val offMap = map(pidOffsets(sums)
      .flatMap { case (p, o) => Seq(lit(p), lit(o)) }: _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(sortExprs: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranged
      .withColumn("cum",
        sum(col(valueCol)).over(w).cast("long") + element_at(offMap, col("__pid")))
      .drop("__pid")
  }

  /** Budget-constrained deterministic selection: take documents in
    * hash order (hash60(id), id — the reproducible shuffle every
    * sampler here uses) until the running token total reaches
    * `tokenBudget` — "give me a B-token subset of the corpus,
    * reproducibly" (scaling-law subsets, pilot corpora, eval slices).
    * A document is kept iff it STARTS strictly inside the budget
    * (cum − n_tokens < B), so the kept set is a prefix of the hash
    * order and exceeds B by at most one document — the concat-and-cut
    * convention [[packChunks]] uses for bins. Running totals come from
    * [[exactPrefixSums]]: exact BIGINTs, no global-window funnel,
    * deterministic on any partitioning.
    */
  def budgetSelect(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, tokenBudget: Long): org.apache.spark.sql.DataFrame = {
    require(tokenBudget > 0, "tokenBudget > 0")
    val src = docs.select(col(idCol).as("id"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"),
      hash60(col(idCol)).as("hk"))
    exactPrefixSums(src, Seq(col("hk").asc, col("id").asc), "n_tokens")
      .filter(col("cum") - col("n_tokens") < tokenBudget)
      .select(col("id"), col("n_tokens"), col("cum"))
  }

  /** QUALITY-ordered budget selection — [[budgetSelect]] with "best
    * first" instead of "hash order": take documents by (quality DESC,
    * id ASC) until the running token total reaches the budget — the
    * "top-quality B-token subset" selection of classifier-filtered
    * pretraining pipelines (score every doc, keep the best mass that
    * fits). Same exact-prefix-sum machinery (range repartition +
    * per-partition offsets, no global-window funnel), same
    * starts-strictly-inside-budget cut convention (the kept set
    * exceeds B by at most one document). Quality is the caller's
    * integer score column — a float score micro-quantizes first (the
    * house integer contract). Returns (id, q, n_tokens, cum).
    */
  def budgetSelectByQuality(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, qualityCol: String,
      tokenBudget: Long): org.apache.spark.sql.DataFrame = {
    require(tokenBudget > 0, "tokenBudget > 0")
    val src = docs.select(col(idCol).as("id"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"),
      col(qualityCol).cast("long").as("q"))
    exactPrefixSums(src, Seq(col("q").desc, col("id").asc), "n_tokens")
      .filter(col("cum") - col("n_tokens") < tokenBudget)
      .select(col("id"), col("q"), col("n_tokens"), col("cum"))
  }

  /** Per-GROUP exact rank, scalably — [[exactRankBuckets]] generalized
    * to a partitioned rank: range-repartition on (group, sort key), pin
    * the partitioning, read per-(partition, group) counts (≤ #partitions
    * × #groups rows — mixture-sized group cardinalities, the same
    * premise as [[temperatureRates]], enforced LOUDLY by the
    * `maxOffsetCells` bound on the driver collect), then rank =
    * (pid, group) offset +
    * within-(pid, group) row_number. A plain `PARTITION BY group` window
    * would funnel each group through ONE task — a head group holding
    * half the corpus becomes a half-corpus sort on one core; here every
    * range partition sorts locally and a group spans as many partitions
    * as its mass needs. Offsets and group totals come back via a
    * broadcast join (no key-encoding games). Appends `rank` (1-based
    * within group) and `n` (group total). Callers pass a total order
    * (append a unique id to the sort key) for deterministic ranks.
    */
  /** Shared driver-side step of the GROUPED pid-offset family
    * ([[exactGroupRanks]] / [[exactGroupPrefixSums]]): turn the
    * collected per-(pid, group) Long aggregate into the broadcastable
    * offsets frame (__opid, __ogrp, __off, n) — exclusive running
    * offsets in pid order within each group plus the group total.
    */
  /** Driver-bounded collect of the per-(pid, group) Long aggregate that
    * feeds [[pidGroupOffsets]]. The grouped pid-offset family serves
    * MIXTURE-sized group cardinalities (languages, sources, quality
    * buckets): the collect is ≤ #partitions × #groups rows, which is tiny
    * under that premise — but the premise must fail LOUDLY, not blow the
    * driver: a caller grouping by URL host or fingerprint would otherwise
    * silently collect millions of rows. The limit+1 probe bounds driver
    * memory to the cap itself; above the cap, reduce the group
    * cardinality first (bucket the groups) or rank per-group slices.
    */
  private def boundedPidGroupCollect(agg: org.apache.spark.sql.DataFrame,
      op: String, groupCol: String, maxCells: Long): Array[(Int, Any, Long)] = {
    require(maxCells > 0 && maxCells < Int.MaxValue, "maxOffsetCells out of range")
    val rows = agg.limit(maxCells.toInt + 1).collect()
    require(rows.length <= maxCells,
      s"$op: more than $maxCells (partition, $groupCol) offset cells — the " +
        "grouped pid-offset family collects #partitions x #groups rows to " +
        "the driver and serves mixture-sized group cardinalities; bucket " +
        "the groups below the bound or raise maxOffsetCells deliberately")
    rows.map(r => (r.getInt(0), r.get(1), r.getLong(2)))
  }

  private def pidGroupOffsets(spark: org.apache.spark.sql.SparkSession,
      gField: org.apache.spark.sql.types.StructField,
      agg: Array[(Int, Any, Long)]): org.apache.spark.sql.DataFrame = {
    val totals = agg.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val offRows = agg.sortBy(_._1).groupBy(_._2).toSeq.flatMap {
      case (g, rows) =>
        rows.map(_._3).scanLeft(0L)(_ + _).init.zip(rows).map {
          case (off, (pid, _, _)) => org.apache.spark.sql.Row(
            pid, g, off, totals(g))
        }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__opid",
          org.apache.spark.sql.types.IntegerType),
        gField.copy(name = "__ogrp", nullable = true),
        org.apache.spark.sql.types.StructField("__off",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
  }

  def exactGroupRanks(df: org.apache.spark.sql.DataFrame, groupCol: String,
      sortExprs: Seq[Column], maxOffsetCells: Long = 1000000L)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val ranged = pinnedRanged(df, col(groupCol) +: sortExprs)
    val cnts = boundedPidGroupCollect(
      ranged.groupBy(col("__pid"), col(groupCol)).agg(count(lit(1)).as("c")),
      "exactGroupRanks", groupCol, maxOffsetCells)
    val outCols = df.columns.map(col).toSeq :+ col("rank") :+ col("n")
    if (cnts.isEmpty) // empty in, empty out
      return ranged.withColumn("rank", lit(0L)).withColumn("n", lit(0L))
        .select(outCols: _*)
    val offs = pidGroupOffsets(spark, df.schema(groupCol), cnts)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col(groupCol)).orderBy(sortExprs: _*)
    // null-safe group equality: a NULL group is a group like any other
    // (windows and the SQL twin's PARTITION BY agree) — a plain equi-join
    // would silently drop those rows
    ranged.join(broadcast(offs),
      col("__pid") === col("__opid") && col(groupCol) <=> col("__ogrp"))
      .withColumn("rank", row_number().over(w).cast("long") + col("__off"))
      .select(outCols: _*)
  }

  /** Pairwise vocabulary overlap between sources — the corpus-mix
    * redundancy report (is crawl B lexically novel against crawl A, or
    * the same sites again?): per source the DISTINCT token set, then
    * per ordered pair (sa < sb) the intersection size via a token-keyed
    * self-join of the (source, token) projection — pair work is Σ over
    * tokens of C(sources-with-token, 2), bounded by the SOURCE count
    * squared per token, never document pairs — union by
    * |A| + |B| − |A∩B|, and exact integer Jaccard permille. Sources
    * with no shared token still get their row (cross of the per-source
    * size table, inter = 0). Returns
    * (src_a, src_b, inter, uni, jaccard_permille).
    */
  def sourceVocabOverlap(docs: org.apache.spark.sql.DataFrame,
      sourceCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val st = docs.select(col(sourceCol).as("src"),
        explode(tokens(col(textCol))).as("tok"))
      .distinct()
      .localCheckpoint(eager = false) // sizes + the pair join
    val sizes = st.groupBy(col("src")).agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // pair frame + two lookups
    val pairs = sizes.select(col("src").as("src_a"), col("n").as("na"))
      .join(sizes.select(col("src").as("src_b"), col("n").as("nb")),
        col("src_a") < col("src_b"))
    val inter = st.select(col("src").as("src_a"), col("tok"))
      .join(st.select(col("src").as("src_b"), col("tok")), Seq("tok"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("inter"))
    pairs.join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("inter"), lit(0L)).as("inter"),
        (col("na") + col("nb") - coalesce(col("inter"), lit(0L))).as("uni"),
        expr("coalesce(inter, 0L) * 1000 DIV (na + nb - coalesce(inter, 0L))")
          .as("jaccard_permille"))
  }

  /** Per-GROUP exact inclusive prefix sums, scalably —
    * [[exactPrefixSums]] generalized the way [[exactGroupRanks]]
    * generalizes [[exactRankBuckets]]: range-repartition on
    * (group, sort key), pin the partitioning, read per-(partition,
    * group) VALUE sums (≤ #partitions × #groups rows — driver-bounded
    * for mixture-sized group cardinalities), then cum = (pid, group)
    * offset + within-(pid, group) running sum. A `PARTITION BY group`
    * window would funnel each group through one task; here a head group
    * spans as many range partitions as its mass needs. Appends `cum`
    * (inclusive). Callers pass a total order; `valueCol` must be
    * integral. NULL groups are a group like any other (null-safe join).
    */
  def exactGroupPrefixSums(df: org.apache.spark.sql.DataFrame,
      groupCol: String, sortExprs: Seq[Column],
      valueCol: String, maxOffsetCells: Long = 1000000L)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    val ranged = pinnedRanged(df, col(groupCol) +: sortExprs)
    val sums = boundedPidGroupCollect(
      ranged.groupBy(col("__pid"), col(groupCol))
        .agg(sum(col(valueCol)).cast("long").as("s")),
      "exactGroupPrefixSums", groupCol, maxOffsetCells)
    val outCols = df.columns.map(col).toSeq :+ col("cum")
    if (sums.isEmpty) // empty in, empty out
      return ranged.withColumn("cum", lit(0L)).select(outCols: _*)
    // shared offsets scaffold; the group-total column `n` rides along
    // unused (outCols excludes it)
    val offs = pidGroupOffsets(spark, df.schema(groupCol), sums)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid"), col(groupCol)).orderBy(sortExprs: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    ranged.join(broadcast(offs),
      col("__pid") === col("__opid") && col(groupCol) <=> col("__ogrp"))
      .withColumn("cum",
        sum(col(valueCol)).over(w).cast("long") + col("__off"))
      .select(outCols: _*)
  }

  /** Per-group budget-constrained selection — [[budgetSelect]] with the
    * budget applied WITHIN each group ("B tokens per language/source",
    * the mixture-building cut): docs order by the reproducible hash
    * (hash60(id), id) within their group and a doc is kept iff it
    * STARTS strictly inside its group's budget (cum − n_tokens < B), so
    * each group's kept set is a prefix of its hash order exceeding B by
    * at most one document. Running totals per group via
    * [[exactGroupPrefixSums]] — no per-group window funnel. Returns
    * (grp, id, n_tokens, cum).
    */
  def budgetSelectByGroup(docs: org.apache.spark.sql.DataFrame,
      idCol: String, groupCol: String, textCol: String,
      tokenBudgetPerGroup: Long): org.apache.spark.sql.DataFrame = {
    require(tokenBudgetPerGroup > 0, "tokenBudgetPerGroup > 0")
    val src = docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"),
      hash60(col(idCol)).as("hk"))
    exactGroupPrefixSums(src, "grp", Seq(col("hk").asc, col("id").asc),
      "n_tokens")
      .filter(col("cum") - col("n_tokens") < tokenBudgetPerGroup)
      .select(col("grp"), col("id"), col("n_tokens"), col("cum"))
  }

  /** Per-group admission thresholds for the STREAMING budget gate
    * ([[graft.streaming.PipelineStream.budgetGateByGroup]]): each
    * group's LAST admitted (hk, id). [[budgetSelectByGroup]]'s kept set
    * is a PREFIX of the (hash60(id), id) order within its group, so
    * "(hk, id) ≤ threshold lexicographically" IS batch membership —
    * the weightedSampleThreshold move for budgets. ≤ one row per group.
    */
  def budgetGroupThresholds(docs: org.apache.spark.sql.DataFrame,
      idCol: String, groupCol: String, textCol: String,
      tokenBudgetPerGroup: Long): org.apache.spark.sql.DataFrame =
    budgetSelectByGroup(docs, idCol, groupCol, textCol, tokenBudgetPerGroup)
      .groupBy(col("grp"))
      .agg(max(struct(hash60(col("id")).as("t_hk"), col("id").as("t_id"))).as("m"))
      .select(col("grp"), col("m.t_hk").as("t_hk"), col("m.t_id").as("t_id"))

  /** The shared readout ordering for a gate-admitted budget set:
    * running totals re-derived over the admitted rows — the admitted
    * set is a per-group prefix of the (hk, id) order, so prefix sums
    * over it EQUAL the full batch's cums (the one ordering batch and
    * stream share). Input: (grp, id, n_tokens).
    */
  def assignGroupBudgetCums(admitted: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    exactGroupPrefixSums(
      admitted.select(col("grp"), col("id"), col("n_tokens"),
        hash60(col("id")).as("hk")),
      "grp", Seq(col("hk").asc, col("id").asc), "n_tokens")
      .select(col("grp"), col("id"), col("n_tokens"), col("cum"))

  /** Exact-count stratified split (train/val/test): within each group,
    * docs order by the deterministic hash (hash60(id), id — a total
    * order) and split boundaries sit at the FLOORED CUMULATIVE permille
    * marks, so split i holds ranks (floor(n·cum_{i-1}/1000),
    * floor(n·cum_i/1000)] and the counts are exact to the floor rule
    * with the last split absorbing the remainder (cum_last = 1000 ⇒
    * boundary = n). Unlike the hash-threshold split
    * ([[mixtureSample]]'s gate), the proportions here are EXACT per
    * group, not expected values — the shape eval suites need. Ranks
    * come from [[exactGroupRanks]]: no per-group single-task window,
    * deterministic on any partitioning.
    */
  def stratifiedExactSplit(docs: org.apache.spark.sql.DataFrame,
      idCol: String, groupCol: String,
      splits: Seq[(String, Int)]): org.apache.spark.sql.DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      splits.map(_._2).sum == 1000, "split permilles must be > 0 and sum to 1000")
    val src = docs.select(col(idCol).as("id"), col(groupCol).as("grp"),
      hash60(col(idCol)).as("hk"))
    val ranked = exactGroupRanks(src, "grp", Seq(col("hk"), col("id")))
    val cums = splits.map(_._2).scanLeft(0)(_ + _).tail
    // when-chain, not an interpolated CASE string: split names are
    // caller data and must never pass through the SQL parser
    val splitCol = splits.zip(cums).init
      .foldRight(lit(splits.last._1): Column) { case (((name, _), c), rest) =>
        when(col("rank") <= expr(s"n * $c DIV 1000"), lit(name)).otherwise(rest)
      }
    ranked.withColumn("split", splitCol)
      .select(col("id"), col("grp"), col("split"))
  }

  /** CCNet-style perplexity bucketing: score every doc with the
    * self-trained bigram LM ([[bigramLmScoreSelf]] — higher mean
    * transition weight ≈ lower perplexity), then split the scored corpus
    * into `nBuckets` equi-depth tiers by exact rank (head = most fluent).
    * mean_milli = lm_sum·1000 DIV n_bigrams keeps the sort key an exact
    * BIGINT; (mean_milli DESC, id) is a total order so ranks are
    * deterministic. Docs with no bigrams carry no score and are excluded
    * (consistent with p52). Scale: the LM train+score passes are the p52
    * plan; the bucketing adds one range shuffle + one pid-local window
    * ([[exactRankBuckets]] — no global-window funnel).
    */
  def perplexityBuckets(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 3): org.apache.spark.sql.DataFrame = {
    val scored = bigramLmScoreSelf(docs, idCol, textCol)
      .withColumn("mean_milli",
        expr("CAST(lm_sum * 1000 DIV n_bigrams AS BIGINT)"))
    val tierExpr =
      if (nBuckets == 3)
        element_at(map(Seq(lit(0L), lit("head"), lit(1L), lit("middle"),
          lit(2L), lit("tail")): _*), col("bucket"))
      else col("bucket").cast("string")
    exactRankBuckets(scored, Seq(col("mean_milli").desc, col("id").asc), nBuckets)
      .withColumn("tier", tierExpr)
      .select(col("id"), col("mean_milli"), col("rank"), col("bucket"), col("tier"))
  }

  /** Data-card length-quantile table: exact equi-depth tiers of the
    * per-doc token count — (bucket, n_docs, lo, hi), where [lo, hi] are
    * the tier's exact boundary lengths. Complements the p91 histogram
    * (fixed geometric buckets, counts) with the inverse view (fixed
    * depths, exact boundaries) — the "p10/p50/p90 length" row a corpus
    * data card reports. (n_tokens, id) is a total order so the tiers
    * are deterministic; ranks come from [[exactRankBuckets]] (range
    * shuffle + pid-local windows, no global-window funnel), then an
    * `nBuckets`-row aggregate.
    */
  def lengthQuantiles(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, nBuckets: Int = 10): org.apache.spark.sql.DataFrame =
    exactRankBuckets(
      docs.select(col(idCol).as("id"),
        size(tokens(col(textCol))).cast("long").as("n_tokens")),
      Seq(col("n_tokens").asc, col("id").asc), nBuckets)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("lo"), max(col("n_tokens")).as("hi"))

  /** Distillation-fidelity report for the trained quality classifier:
    * the 2×2 agreement table between the heuristic teacher label
    * ([[keepFlag]] — what [[classifierScore]] trains on) and the
    * model's prediction (score_sum > 0). The table every classifier
    * hand-off ships: diagonal = recovered labels, off-diagonal = where
    * the distilled model disagrees with its teacher (which is where a
    * human looks first). ≤ 4 rows; one extra label projection over the
    * scoring lineage.
    */
  def classifierAgreement(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int = 4096): org.apache.spark.sql.DataFrame =
    classifierScore(docs, idCol, textCol, dim)
      .join(docs.select(col(idCol).as("id"),
        keepFlag(col(textCol)).cast("long").as("label")), Seq("id"))
      .groupBy(col("label"), (col("score_sum") > 0).cast("long").as("pred"))
      .agg(count(lit(1)).as("n_docs"))

  /** Quality-classifier scoring with TRAINED weights as the DEFAULT path:
    * weakly-supervised distillation of the heuristic keep signal
    * ([[keepFlag]]) into a hashed-feature linear model — the CCNet/DCLM
    * recipe of bootstrapping a quality classifier from a rule-based label.
    * One training pass builds the bucket-contrast weight table
    * ([[trainClassifierWeights]] on the heuristic label), then every doc
    * scores through the broadcast model join ([[classifierScoreWith]]).
    * Two corpus scans as written; production callers with a recurring
    * scoring workload persist the ≤`dim`-row weight artifact once (the
    * p38 pattern) and pay only the scoring scan. Externally-labeled data
    * goes through [[trainClassifierWeights]]+[[classifierScoreWith]]
    * directly; the seeded stub ([[classifierScoreStub]]) is an explicit
    * opt-in for weight-free plumbing tests only.
    */
  def classifierScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int = 4096): org.apache.spark.sql.DataFrame = {
    val labeled = docs.select(col(idCol), col(textCol))
      .withColumn("__y", keepFlag(col(textCol)))
    classifierScoreWith(docs, idCol, textCol,
      trainClassifierWeights(labeled, idCol, textCol, "__y", dim), dim)
  }

  /** Hashed-feature linear classifier INFERENCE with a seeded STUB weight
    * table (hash of `seed:bucket` mapped to [-1000, 1000] per-mille):
    * each token hashes into one of `dim` weight buckets, the document
    * score is the weight sum over its tokens — tokenize → bucket → weight
    * as pure EXPRESSIONS, one partial-aggregated sum per doc, so the whole
    * pass is map-side until the final per-doc reduce and stays inside
    * whole-stage codegen. Explicit OPT-IN for weight-free plumbing/perf
    * tests; real scoring is [[classifierScore]] (trained default) or
    * [[classifierScoreWith]] (persisted artifact) — same plan shape with
    * the weight expression swapped for the model lookup. Integer per-mille
    * weights make the score an exact BIGINT, reproducible across engines
    * (no float-sum order drift); consumers threshold on
    * `score_sum * 1000 >= min_mean * n_tokens`. Docs with no tokens
    * produce no row (they have no score).
    */
  def classifierScoreStub(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int = 4096, seed: String = "w0"): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .withColumn("w",
        hash60(concat_ws(":", lit(seed), hash60(col("tok")) % dim)) % 2001 - 1000)
      .groupBy(col("id"))
      .agg(sum(col("w")).as("score_sum"), count(lit(1)).as("n_tokens"))

  /** Weight-table trainer for [[classifierScoreWith]]: per hashed bucket,
    * the signed occurrence contrast between positive- and negative-labeled
    * docs (w = pos occurrences − neg occurrences). Division-free integer
    * weights stay exact BIGINTs across engines — Spark's `div` truncates
    * toward zero while DuckDB's `//` floors, so avoiding division
    * sidesteps the negative-weight rounding mismatch entirely. The
    * artifact is tiny (≤ dim rows): persist it once (parquet, like
    * [[graft.pipeline.Dedup.corpusStoplist]]) and feed every scoring run.
    */
  def trainClassifierWeights(labeled: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, labelCol: String,
      dim: Int = 4096): org.apache.spark.sql.DataFrame =
    labeled
      .select(col(labelCol).cast("boolean").as("y"),
        explode(tokens(col(textCol))).as("tok"))
      .withColumn("bucket", hash60(col("tok")) % dim)
      .groupBy(col("bucket"))
      .agg(sum(when(col("y"), 1L).otherwise(-1L)).as("w"))

  /** [[classifierScore]] with TRAINED weights from a persisted (bucket, w)
    * artifact: one broadcast hash-join on the bucket id, so the scoring
    * pass stays a single map-side join + per-doc sum — the same plan shape
    * as the stub-weight path with the weight expression swapped for the
    * model lookup. Buckets absent from the artifact weigh 0 (a pruned or
    * partially trained table is a valid model).
    */
  def classifierScoreWith(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, weights: org.apache.spark.sql.DataFrame,
      dim: Int = 4096): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .withColumn("bucket", hash60(col("tok")) % dim)
      .join(broadcast(weights.select(col("bucket"), col("w"))), Seq("bucket"), "left")
      .groupBy(col("id"))
      .agg(sum(coalesce(col("w"), lit(0L))).as("score_sum"),
        count(lit(1)).as("n_tokens"))

  /** MULTI-CLASS weight trainer for [[langIdTrained]] — the one-vs-rest
    * generalization of [[trainClassifierWeights]]: for each hashed token
    * bucket b and language l, w(b,l) = occurrences of b under label l
    * minus occurrences under every other label (= 2·c(b,l) − T(b)).
    * The table is TOTAL over (observed bucket) × (declared language set)
    * — the DSIR total-model pattern: an unseen (bucket, language) cell
    * carries w = −T(b), not an implicit 0, so the scoring join stays
    * INNER without dropping per-class mass. Division-free integer
    * weights: exact BIGINTs, reproducible across engines. Artifact size
    * ≤ dim × |langs| rows — broadcastable at any corpus scale; persist
    * it once (p38 pattern) for recurring scoring runs.
    */
  def trainLangIdWeights(labeled: org.apache.spark.sql.DataFrame,
      textCol: String, langCol: String, langs: Seq[String],
      dim: Int = 4096): org.apache.spark.sql.DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val occ = labeled
      .select(col(langCol).as("lang"), explode(tokens(col(textCol))).as("tok"))
      .withColumn("bucket", hash60(col("tok")) % dim)
      .localCheckpoint(eager = false) // feeds the per-lang AND total aggs
    val perLang = occ.groupBy(col("bucket"), col("lang")).agg(count(lit(1)).as("c"))
    val total = occ.groupBy(col("bucket")).agg(count(lit(1)).as("t"))
    total
      .crossJoin(broadcast(langs.toDF("lang"))) // bucket × lang grid
      .join(perLang, Seq("bucket", "lang"), "left")
      .select(col("bucket"), col("lang"),
        (coalesce(col("c"), lit(0L)) * 2 - col("t")).as("w"))
  }

  /** Language-id scoring through a [[trainLangIdWeights]] model: tokenize
    * → bucket → broadcast model join (INNER — the model is total per
    * bucket, so a bucket absent from it contributes 0 to EVERY class
    * equally and dropping it cannot change the argmax) → per-(doc, lang)
    * integer sum → per-doc argmax with the alphabetically-first tie-break
    * (the same convention as the heuristic [[langId]] CASE chain). The
    * per-doc rank is a window PARTITIONED BY doc over ≤|langs| rows.
    * Docs with no model-bucketed tokens produce no row (no evidence, no
    * prediction — callers fall back to [[langId]]). Returns
    * (id, pred_lang, score).
    */
  def langIdScoreWith(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, weights: org.apache.spark.sql.DataFrame,
      dim: Int = 4096): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .withColumn("bucket", hash60(col("tok")) % dim)
      .join(broadcast(weights.select(col("bucket"), col("lang"), col("w"))),
        Seq("bucket"))
      .groupBy(col("id"), col("lang"))
      .agg(sum(col("w")).as("score"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("score").desc, col("lang"))))
      .filter(col("rn") === 1)
      .select(col("id"), col("lang").as("pred_lang"), col("score"))

  /** TRAINED language id as the default path — the CCNet weak-supervision
    * recipe applied to langid exactly as [[classifierScore]] applies it
    * to quality: the stopword heuristic [[langId]] provides the weak
    * label, one training pass distills it into hashed-unigram one-vs-rest
    * weights over the WHOLE vocabulary ([[trainLangIdWeights]]), then
    * every doc scores through the broadcast model join. The trained model
    * generalizes past the 6-stopword lists (any token whose usage skews
    * by language becomes evidence). Two corpus scans as written;
    * recurring workloads persist the weight artifact once. The heuristic
    * [[langId]] stays available as the explicit model-free fallback.
    */
  def langIdTrained(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int = 4096): org.apache.spark.sql.DataFrame = {
    val labeled = docs.select(col(idCol), col(textCol))
      .withColumn("__lang", langId(col(textCol)))
    langIdScoreWith(docs, idCol, textCol,
      trainLangIdWeights(labeled, textCol, "__lang", langStopwords.map(_._1), dim),
      dim)
  }

  /** Bigram-LM training — the perplexity-filtering shape of the CCNet /
    * RedPajama quality pipelines (a KenLM scores docs; low-probability
    * docs are gibberish/OOD), reduced to exact integer arithmetic. One
    * tokenize pass: corpus bigram counts c(w1,w2), conditioned on the
    * bigram-FIRST occurrence count c(w1·) = Σ_w2 c(w1,w2) (so the
    * conditional masses sum to ≤1000 exactly — no end-of-doc fudge), and
    * the model row is (gram, floor(1000·c2/c1)). Non-negative operands
    * make Spark's truncating `div` equal DuckDB's flooring `//`. The
    * artifact is corpus-vocabulary-sized: persist it like the classifier
    * weights (p38 pattern) and feed every scoring run.
    */
  def trainBigramLm(docs: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val bi = docs
      .select(explode(wordNgrams(col(textCol), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c2"))
    val byW1 = bi
      .withColumn("w1", element_at(split(col("gram"), " "), 1))
      .groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    bi.withColumn("w1", element_at(split(col("gram"), " "), 1))
      .join(byW1, Seq("w1"))
      .select(col("gram"), expr("c2 * 1000L div c1").as("w_permille"))
  }

  /** Bigram-LM scoring: each doc's transitions join the model on the
    * bigram key (a plain shuffle join — the model is corpus-vocabulary-
    * sized, NOT broadcastable at 100 TB) and sum their integer
    * conditional probabilities; consumers threshold on the per-transition
    * mean `lm_sum * 1 >= min_mean * n_bigrams`. Unseen bigrams weigh 0 —
    * the hard-zero MLE; smoothing would need float logs and is exactly
    * what the integer contract trades away (rank order at the filtering
    * threshold is what matters, and hard-zero PENALIZES unseen
    * transitions harder than any smoothing). Docs with <2 tokens have no
    * transitions and produce no row.
    */
  def bigramLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String,
      model: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("id"), explode(wordNgrams(col(textCol), 2)).as("gram"))
      .join(model.select(col("gram"), col("w_permille")), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(sum(coalesce(col("w_permille"), lit(0L))).as("lm_sum"),
        count(lit(1)).as("n_bigrams"))

  /** Self-trained bigram-LM scoring: train on the corpus, score the
    * corpus — the one-shot audit shape (production persists the model).
    */
  def bigramLmScoreSelf(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    bigramLmScore(docs, idCol, textCol, trainBigramLm(docs, textCol))

  /** Stupid-backoff trigram LM training (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the web-scale score
    * KenLM-style perplexity filters approximate): one model table
    * (n, gram, w_permille) holding all three orders with the backoff
    * factor PRE-APPLIED in exact integers —
    * n=3: 1000·c3(w1w2w3) div Σ_w3'c3(w1w2w3'),
    * n=2: 400·c2(w2w3) div Σ_w3'c2(w2w3') (α=0.4 → ×400),
    * n=1: 160·c1(w3) div N (α² → ×160).
    * Denominators are CONTINUATION sums (the [[trainBigramLm]]
    * conditioning — each context's masses total ≤ the scale exactly,
    * no end-of-doc fudge), and non-negative operands make Spark's
    * truncating `div` equal DuckDB's flooring `//`. The artifact is
    * corpus-vocabulary-sized (one row per distinct 1/2/3-gram):
    * persist once, feed every scoring run.
    */
  def trainBackoffLm(docs: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val d = docs.select(col(textCol))
      .localCheckpoint(eager = false) // three n-gram passes
    def counts(n: Int): org.apache.spark.sql.DataFrame = d
      .select(explode(wordNgrams(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c"))
    def scaled(cnt: org.apache.spark.sql.DataFrame, n: Int, scale: Int,
        ctx: Column): org.apache.spark.sql.DataFrame = {
      val den = cnt.withColumn("ctx", ctx)
        .groupBy(col("ctx")).agg(sum(col("c")).as("den"))
      cnt.withColumn("ctx", ctx).join(den, Seq("ctx"))
        .select(lit(n).as("n"), col("gram"),
          expr(s"c * ${scale}L div den").as("w_permille"))
    }
    val uni = counts(1)
    scaled(counts(3), 3, 1000,
        concat_ws(" ", slice(split(col("gram"), " "), 1, 2)))
      .unionByName(scaled(counts(2), 2, 400,
        element_at(split(col("gram"), " "), 1)))
      .unionByName(scaled(uni, 1, 160, lit("")))
  }

  /** Stupid-backoff scoring: each doc's trigram transitions take the
    * HIGHEST-order model hit — seen trigram, else α·bigram, else
    * α²·unigram, else 0 (all pre-scaled in the artifact, so the pick
    * is one coalesce over three left joins on vocab-sized model
    * slices; absence of a row IS the zero count, which is exactly the
    * backoff condition). A self-trained corpus never backs off (every
    * trigram is its own evidence) — the production shape trains on a
    * REFERENCE corpus and scores candidates, where unseen transitions
    * cascade down the orders. Docs with <3 tokens have no transitions
    * and produce no row. Returns (id, lm_sum, n_trigrams).
    */
  def backoffLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String,
      model: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val m = model.localCheckpoint(eager = false) // sliced three ways
    def slice(n: Int, out: String): org.apache.spark.sql.DataFrame =
      m.filter(col("n") === n)
        .select(col("gram").as(s"g$n"), col("w_permille").as(out))
    docs
      .select(col(idCol).as("id"),
        explode(wordNgrams(col(textCol), 3)).as("g3"))
      .withColumn("g2",
        concat_ws(" ", org.apache.spark.sql.functions.slice(
          split(col("g3"), " "), 2, 2)))
      .withColumn("g1", element_at(split(col("g3"), " "), 3))
      .join(slice(3, "s3"), Seq("g3"), "left")
      .join(slice(2, "s2"), Seq("g2"), "left")
      .join(slice(1, "s1"), Seq("g1"), "left")
      .groupBy(col("id"))
      .agg(sum(coalesce(col("s3"), col("s2"), col("s1"), lit(0L)))
          .as("lm_sum"),
        count(lit(1)).as("n_trigrams"))
  }

  /** Deterministic global shuffle + sharding (training-order
    * randomization): shard = hash60(id) mod nShards, position = rank of
    * (hash60, id) WITHIN the shard. Per-shard windows, never a global
    * sort — each shard sorts independently, so the operation scales out
    * with executors instead of funnelling into one partition.
    */
  def shuffleShard(docs: org.apache.spark.sql.DataFrame, idCol: String,
      nShards: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col("id"))
    docs
      .select(col(idCol).as("id"), hash60(col(idCol)).as("h"))
      .withColumn("shard", col("h") % nShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("h")
  }

  /** Corpus n-gram statistics: the k most frequent word n-grams overall,
    * with total occurrences and document frequency. One tokenize pass:
    * per-(doc, gram) counts partial-aggregate map-side, the per-gram
    * rollup sums them and counts the carrying docs in the same aggregate,
    * and the global top-k is a TakeOrdered merge — no global sort, no
    * second scan. The workhorse for stopword mining / contamination-risk
    * audits over a whole corpus.
    */
  def ngramStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int, k: Int): org.apache.spark.sql.DataFrame =
    ngramTopK(ngramStatsTable(docs, idCol, textCol, n), k)

  /** The MAINTAINABLE form of [[ngramStats]]: the full
    * (gram, occurrences, doc_freq) table, both columns ADDITIVE under
    * disjoint-document batches (the document-feed contract), so a
    * standing corpus's gram census folds a crawl batch without
    * re-tokenizing past docs ([[foldNgramStats]]); ranking/top-k is a
    * READOUT policy ([[ngramTopK]]) so folds compose under any k.
    */
  def ngramStatsTable(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    docGramCounts(docs, idCol, textCol, n)
      .groupBy(col("gram"))
      .agg(sum(col("c")).as("occurrences"), count(lit(1)).as("doc_freq"))

  /** Per-doc n-gram occurrence counts (id, gram, c) — the doc-grain
    * half of [[ngramStatsTable]], shared with the novelty readout.
    */
  def docGramCounts(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) >= n)
      .select(col("id"), explode(
        transform(sequence(lit(1), size(col("_toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("_toks"), i, lit(n))))).as("gram"))
      .groupBy(col("id"), col("gram"))
      .agg(count(lit(1)).as("c"))

  /** N-gram NOVELTY against a standing census — the decontamination /
    * "how much of this batch is actually new text" readout (the
    * GPT-3-style n-gram overlap check, occurrence-weighted): per doc,
    * the share of its n-gram occurrences ABSENT from the reference
    * census (any (gram, …) table — [[ngramStatsTable]] or a
    * [[foldNgramStats]]-maintained standing artifact, so contamination
    * reports come off the fold without re-scanning the reference).
    * Returns (id, n_grams, n_seen, novelty_permille); 1000 = fully
    * novel, 0 = fully seen. Docs with < n tokens have no grams and
    * report no row. One gram-keyed hash join at batch-gram grain; the
    * census side reduces to DISTINCT gram keys first — a census whose
    * gram appears on multiple rows (e.g. an ngramCensusIngest run
    * store read raw, one row per run) would otherwise multiply each
    * matching doc-gram row once per duplicate and silently inflate
    * both counters (review-caught).
    */
  def ngramNovelty(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, census: org.apache.spark.sql.DataFrame,
      n: Int): org.apache.spark.sql.DataFrame =
    docGramCounts(docs, idCol, textCol, n)
      .join(census.select(col("gram")).distinct()
        .withColumn("__seen", lit(1L)), Seq("gram"), "left")
      .groupBy(col("id"))
      .agg(sum(col("c")).cast("long").as("n_grams"),
        sum(col("c") * coalesce(col("__seen"), lit(0L))).cast("long").as("n_seen"))
      .withColumn("novelty_permille",
        expr("1000 * (n_grams - n_seen) DIV n_grams"))

  /** Fold a delta batch's gram table into the standing one without
    * shuffling the standing side (the p224/p233 artifact-fold shape):
    * untouched grams stream through a broadcast anti-join, touched
    * grams re-sum both counters over (standing row ∪ delta rows).
    * Row-identical to `ngramStatsTable(standing ∪ delta docs)` for
    * disjoint doc ids; bounded-Δ contract enforced loudly.
    */
  def foldNgramStats(standing: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame,
      maxDeltaRows: Long = 50000000L): org.apache.spark.sql.DataFrame = {
    val d = delta.select(col("gram"), col("occurrences"), col("doc_freq"))
      .localCheckpoint() // counted, then keys + merge
    val nDelta = d.count()
    require(nDelta <= maxDeltaRows,
      s"foldNgramStats: |delta| = $nDelta rows exceeds maxDeltaRows = " +
        s"$maxDeltaRows — fold in slices or rebuild the table in full")
    val dKeys = d.select(col("gram")).distinct()
    val s = standing.select(col("gram"), col("occurrences"), col("doc_freq"))
    s.join(broadcast(dKeys), Seq("gram"), "left_anti")
      .unionByName(
        s.join(broadcast(dKeys), Seq("gram"), "left_semi")
          .unionByName(d)
          .groupBy(col("gram"))
          .agg(sum(col("occurrences")).cast("long").as("occurrences"),
            sum(col("doc_freq")).cast("long").as("doc_freq")))
  }

  /** Readout: deterministic top-k of a gram table — occurrences desc,
    * gram asc ties (the [[ngramStats]] order).
    */
  def ngramTopK(table: org.apache.spark.sql.DataFrame,
      k: Int): org.apache.spark.sql.DataFrame =
    table.orderBy(col("occurrences").desc, col("gram")).limit(k)

  /** Corpus profile (the data-card numbers): per detected language, doc
    * count, total token count, and the EXACT median doc length (lower
    * median — rank (n+1) DIV 2 of the per-language length order, so any
    * SQL engine reproduces it bit-for-bit; interpolating percentile
    * functions differ across engines). One pass + one per-language window
    * sort; exact medians inherently sort each group — swap in
    * percentile_approx for a shuffle-free estimate when profiling at full
    * corpus scale.
    */
  def corpusProfile(docs: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    val ws = w.orderBy(col("nt"))
    docs
      // NULL text counts as 0 tokens: leaving nt NULL would rank it
      // nulls-first in Spark but nulls-last in DuckDB, shifting the median
      .select(langId(col(textCol)).as("lang"),
        coalesce(tokenCount(col(textCol)).cast("long"), lit(0L)).as("nt"))
      .withColumn("rn", row_number().over(ws))
      .withColumn("cnt", count(lit(1)).over(w))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("total_tokens"),
        max(when(col("rn") === expr("(cnt + 1) DIV 2"), col("nt")))
          .as("median_tokens"))
  }

  /** Vocabulary-richness estimators per group (the data-card "how much
    * MORE vocabulary is out there" numbers): bias-corrected Chao1
    * species-richness estimate D + f1(f1−1)/(2(f2+1)) (Chao 1984 —
    * singletons/doubletons predict the unseen-type count; the +1 keeps
    * it defined with no doubletons) and the Good–Turing unseen
    * probability mass f1/N (the chance the NEXT token is a new type —
    * the classic coverage diagnostic for "have we tokenized enough of
    * this source"). Exact integers: chao1_micro floors the correction
    * term once; unseen_permille = 1000·f1 div N. One (group, term)
    * count pass, then group-sized aggregates — never a sort. Returns
    * (grp, n_tokens, n_types, f1, f2, chao1_micro, unseen_permille);
    * token-less groups emit no row (no tokens, nothing to estimate).
    */
  def vocabRichness(docs: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    vocabRichnessFromCensus(termCensus(docs, groupCol, textCol))

  /** The per-group TERM census — [[graft.pipeline.Sketches
    * .categoryCensusTable]] at (group, token) grain: (g, cat, c) with
    * cat = the token. ADDITIVE over disjoint doc batches (plain
    * sums), so a standing artifact folds by
    * [[graft.pipeline.Sketches.foldCategoryCensus]] and the vocabulary
    * diagnostics ([[vocabRichnessFromCensus]],
    * [[zipfSlopeFromCensus]]) are READOUTS over the folded table —
    * corpus-language monitoring without re-tokenizing per report.
    */
  def termCensus(docs: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    graft.pipeline.Sketches.categoryCensusTable(
      docs.select(col(groupCol).as("g"),
        explode(tokens(col(textCol))).as("cat")),
      "cat", "g")

  /** [[vocabRichness]] as a readout over a (folded) standing term
    * census (p295 gates fold-then-readout ≡ direct).
    */
  def vocabRichnessFromCensus(census: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    census.select(col("g").as("grp"), col("cat").as("term"), col("c"))
      .groupBy(col("grp"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("grp"), col("n_tokens"), col("n_types"), col("f1"),
        col("f2"),
        // f1² · 1e6 overflows BIGINT past f1 ≈ 3M singletons — the
        // correction runs in DECIMAL(38,0) (the temperatureRates move)
        expr("CAST(n_types * 1000000 + CAST(f1 AS DECIMAL(38,0)) * (f1 - 1)" +
          " * 1000000 DIV (2 * (f2 + 1)) AS BIGINT)").as("chao1_micro"),
        expr("f1 * 1000 div n_tokens").as("unseen_permille"))

  /** Zipf rank–frequency slope per group — the data-card "is this
    * source natural language" diagnostic (natural text slopes ≈ −1;
    * boilerplate/spam/code deviate): least-squares slope of
    * ln(freq) on ln(rank) over the group's term distribution, EXACT
    * in integers — both logs micro-quantize per term first, the
    * normal-equation sums run in DECIMAL(38,0), and the final division
    * uses the engine-portable floored spelling (negative slopes:
    * Spark's DIV truncates toward zero, DuckDB's // floors — the
    * refinedCentroids rule). Ranks come from [[exactGroupRanks]]
    * (range-partitioned + pid offsets — a head group never funnels
    * through one task; loud `maxOffsetCells`). Groups with < 2 types
    * emit no row (slope undefined). Returns (grp, n_types,
    * slope_micro) — slope_micro ≈ −1000000 is the Zipf ideal.
    */
  def zipfSlope(docs: org.apache.spark.sql.DataFrame, groupCol: String,
      textCol: String,
      maxOffsetCells: Long = 1000000L): org.apache.spark.sql.DataFrame =
    zipfSlopeFromCensus(termCensus(docs, groupCol, textCol), maxOffsetCells)

  /** [[zipfSlope]] as a readout over a (folded) standing term census
    * (p296 gates fold-then-readout ≡ direct).
    */
  def zipfSlopeFromCensus(census: org.apache.spark.sql.DataFrame,
      maxOffsetCells: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    val counts = census
      .select(col("g").as("grp"), col("cat").as("term"), col("c"))
    exactGroupRanks(counts, "grp", Seq(col("c").desc, col("term").asc),
        maxOffsetCells)
      .select(col("grp"),
        expr("CAST(round(1000000 * ln(rank)) AS BIGINT)").as("x"),
        expr("CAST(round(1000000 * ln(c)) AS BIGINT)").as("y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
      .filter(col("n_types") >= 2)
      .withColumn("num",
        expr("CAST(1000000 AS DECIMAL(38,0)) * (n_types * sxy - sx * sy)"))
      .withColumn("den", expr("n_types * sxx - sx * sx"))
      .select(col("grp"), col("n_types"),
        expr("CAST((num - ((num % den + den) % den)) DIV den AS BIGINT)")
          .as("slope_micro"))
  }

  /** Top-k distinctive terms per document, scored by the EXACT rational
    * tf/df (integer-scaled; tf and df ride along so any idf weighting is
    * derivable downstream — a float tf·idf would not survive cross-engine
    * hash comparison). ONE tokenize pass: tf aggregation, then df as a
    * count over a term-partitioned window (re-joining the tf aggregate
    * would run it twice — the subtree-duplication gotcha), then a per-doc
    * rank that WindowGroupLimit prunes map-side.
    */
  def distinctiveTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val wDf = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("term"))
    docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(wDf))
      .withColumn("score", expr("tf * 1000000000L DIV df"))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Corpus data-card CUBE: doc counts and token totals per (dimA ×
    * dimB) WITH all subtotal planes — per-dimA, per-dimB, and the grand
    * total — in one pass (Catalyst expands the cube into grouping sets;
    * one shuffle, map-side partial aggregation for every plane).
    * Subtotal rows label the collapsed dimension `<all>` (real values
    * are never null in a curated card, so the label is unambiguous and
    * the SQL-oracle compare needs no grouping-id plumbing). The data
    * card every corpus release ships, as a relation.
    */
  def corpusCube(docs: org.apache.spark.sql.DataFrame, dimA: String,
      dimB: String, textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(dimA).as("a"), col(dimB).as("b"),
        size(tokens(col(textCol))).cast("long").as("ntok"))
      // A NULL dim value would be indistinguishable from the cube's
      // collapsed-dimension subtotal plane once both are labelled
      // '<all>' — fail loudly instead of silently folding real rows
      // into subtotals. (Filter form: Catalyst DELETES the self-equal
      // IF(assert_true..) column form.)
      .filter(expr(
        "assert_true(a IS NOT NULL AND b IS NOT NULL, " +
          "'corpusCube: NULL dimension value would collide with the " +
          "<all> subtotal label; clean or relabel dims first') IS NULL"))
      .cube(col("a"), col("b"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("sum_tokens"))
      .select(coalesce(col("a"), lit("<all>")).as(dimA),
        coalesce(col("b"), lit("<all>")).as(dimB),
        col("n_docs"), col("sum_tokens"))

  /** Collocation mining by EXACT integer lift (the division-free PMI):
    * for adjacent word pairs, lift = P(ab) / (P(a)·P(b)) =
    * n_ab·N² / (B·n_a·n_b), reported as `lift_permille` =
    * 1000·n_ab·N² div (B·n_a·n_b) in DECIMAL(38,0) — the log of PMI is
    * monotone in this, so thresholding lift IS thresholding PMI with
    * zero transcendentals. Pairs need n_ab ≥ `minCount` (rare-pair
    * noise gate — lift explodes on hapax pairs) and lift_permille ≥
    * `minLiftPermille` (1000 = independence). One tokenize pass feeds
    * both the unigram and bigram aggregates; the unigram table joins by
    * term (vocab-sized, deliberately NOT broadcast — the bigram-LM
    * convention). Returns (w1, w2, n_ab, n_a, n_b, lift_permille).
    */
  def collocations(docs: org.apache.spark.sql.DataFrame, textCol: String,
      minCount: Long = 5L, minLiftPermille: Long = 3000L):
      org.apache.spark.sql.DataFrame = {
    val toks = docs.select(tokens(col(textCol)).as("toks"))
      .localCheckpoint(false) // unigram AND bigram aggregates read it
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // joined twice + the N rollup
    // Corpus-size bound: the lift numerator is 1000·n_ab·N² with
    // n_ab < N, so N ≤ 4.6e11 tokens guarantees it fits DECIMAL(38,0)
    // for EVERY pair. Past that, Spark would silently NULL the product
    // (dropping pairs) while DuckDB raises — divergent failure modes —
    // so the guard makes Spark fail loudly too. Larger corpora should
    // shard (lift is a ratio of per-shard-summable counts).
    val totals = uni.agg(sum(col("n")).cast("decimal(38,0)").as("nn"))
      .crossJoin(
        toks.select((size(col("toks")) - 1).as("b")).filter(col("b") > 0)
          .agg(sum(col("b")).cast("decimal(38,0)").as("bb")))
      // FILTER form, not an IF-wrapped column: Catalyst's
      // SimplifyConditionals deletes IF(assert_true(..) IS NULL, nn, nn)
      // because both branches are equal, silently disarming the guard
      // (measured — round-11 review); the filter's assert survives
      // optimization and fires.
      .filter(expr(
        "assert_true(nn <= CAST(460000000000 AS DECIMAL(38,0)), " +
          "'collocations: corpus exceeds 4.6e11 tokens; " +
          "lift numerator would overflow DECIMAL(38,0)') IS NULL"))
    val bi = toks
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks) - 1), i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"
      )).as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    bi.join(uni.select(col("w").as("w1"), col("n").as("n_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n").as("n_b")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .withColumn("lift_permille", expr(
        "CAST(CAST(n_ab AS DECIMAL(38,0)) * nn * nn * 1000 DIV " +
          "(bb * n_a * n_b) AS BIGINT)"))
      .filter(col("lift_permille") >= minLiftPermille)
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        col("lift_permille"))
  }

  // ---- BPE tokenizer training (merge learning) ----

  /** Character-level BPE start state: one row per TOKEN OCCURRENCE, the
    * token's characters space-joined ("hello" → "h e l l o") — the
    * symbolization every merge step rewrites in place.
    */
  def bpeInitRepr(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(explode(tokens(col(textCol))).as("tok"))
      .select(concat_ws(" ", expr(
        "transform(sequence(1, length(tok)), i -> substring(tok, i, 1))")).as("repr"))

  /** Adjacent-symbol pair counts of a symbolization — THE aggregation a
    * BPE trainer runs once per merge: top-k pairs by (count desc, pair
    * asc), exact integers, distributed TakeOrdered. One corpus pass per
    * call; the trainer's total cost is merges × this.
    */
  def bpePairStats(repr: org.apache.spark.sql.DataFrame, reprCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val ordered = pairCountsOrdered(repr, reprCol).limit(k)
    ordered.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("sym_l"), col("sym_r"))))
      .select(col("rank"), col("sym_l"), col("sym_r"), col("cnt"))
  }

  /** The (count desc, pair asc)-ordered adjacent-pair counts behind
    * [[bpePairStats]] — shared with the trainer's internal top-k collect
    * (which skips the rank window: orderBy+limit+collect plans as ONE
    * TakeOrdered job, and the rank is implied by array order).
    */
  private def pairCountsOrdered(repr: org.apache.spark.sql.DataFrame,
      reprCol: String): org.apache.spark.sql.DataFrame =
    repr.select(split(col(reprCol), " ").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"
      )).as("p"))
      .groupBy(col("p.l").as("sym_l"), col("p.r").as("sym_r"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("sym_l"), col("sym_r"))

  /** Learn up to `merges` BPE merges: count adjacent symbol pairs, fuse
    * the (count desc, pair asc) argmax corpus-wide, repeat. The fuse
    * DOUBLES every separator first so adjacent occurrences never share a
    * delimiter space — one non-overlapping left-to-right `replace` then
    * merges EVERY occurrence ("x y x y" → "xy xy", and an overlapping run
    * "a a a" still pairs greedily to "aa a" — exactly classic BPE). All
    * three rewrite steps take the corpus-derived symbols as Column
    * LITERALS (never interpolated into parsed SQL text, so quotes and
    * backslashes in real text can't break or alter the pattern). Each
    * step localCheckpoints the rewritten symbolization (the driver loop
    * reads pair stats immediately, and plans must not grow with merge
    * count). Stops early when no pair occurs at least twice (singleton
    * pairs are noise, not vocabulary).
    *
    * Cost contract at scale: each merge is ONE full pass over the
    * (sampled) symbolization, so a V-merge vocabulary costs V passes —
    * fine for corpus analysis, but a production 30k-merge vocab is
    * trained on a SAMPLE (the standard practice: merge ranks stabilize
    * long before the full corpus is counted). `samplePermille` keeps a
    * deterministic content-hashed fraction of the docs
    * (hash60(text) mod 1000 < samplePermille) — reproducible across
    * engines, partitionings, and reruns, never a row-order coin flip.
    */
  /** One BPE merge applied to a space-separated symbolization column:
    * " a b a b " –double→ "  a  b  a  b  " –fuse→ "  ab  ab  "
    * –undouble→ " ab ab ". Doubling the separators means adjacent
    * occurrences never share a delimiter, so ONE non-overlapping
    * left-to-right replace merges every occurrence; the fused "␣xy␣"
    * keeps one space per side so the doubled-delimiter invariant holds
    * for later occurrences in the same pass. Column LITERALS throughout —
    * corpus symbols never reach a SQL parser.
    */
  private def fuseMerge(c: Column, l: String, r: String): Column =
    fuseMergeAs(c, l, r, s"$l$r")

  /** The same doubled-delimiter fuse with an explicit fused symbol —
    * WordPiece merges rename ("h" + "##e" → "he"), BPE concatenates.
    */
  private def fuseMergeAs(c: Column, l: String, r: String,
      fused: String): Column = {
    val rep = (src: Column, search: String, to: String) =>
      org.apache.spark.sql.functions.replace(src, lit(search), lit(to))
    val doubled = concat(lit(" "), rep(c, " ", "  "), lit(" "))
    trim(rep(rep(doubled, s" $l  $r ", s" $fused "), "  ", " "))
  }

  def trainBpeMerges(df: org.apache.spark.sql.DataFrame, textCol: String,
      merges: Int, samplePermille: Int = 1000,
      batchSize: Int = 1): Seq[(String, String, Long)] =
    trainMergesOverRepr(
      bpeInitRepr(sampleByContent(df, textCol, samplePermille), textCol),
      merges, batchSize)

  /** The deterministic content-hashed doc sample every tokenizer trainer
    * uses (hash60(text) mod 1000 < samplePermille — reproducible across
    * engines, partitionings, and reruns, never a row-order coin flip).
    */
  private def sampleByContent(df: org.apache.spark.sql.DataFrame,
      textCol: String, samplePermille: Int): org.apache.spark.sql.DataFrame = {
    require(samplePermille > 0 && samplePermille <= 1000,
      "samplePermille must be in (0, 1000]")
    if (samplePermille >= 1000) df
    else df.filter(hash60(col(textCol)) % 1000 < samplePermille)
  }

  /** The merge-learning driver loop shared by [[trainBpeMerges]] and
    * [[trainByteBpeMerges]]: count adjacent symbol pairs, fuse the
    * (count desc, pair asc) argmax corpus-wide, repeat; stop early when
    * no pair occurs at least twice (singleton pairs are noise, not
    * vocabulary). Each step localCheckpoints the rewritten
    * symbolization (the driver loop reads pair stats immediately, and
    * plans must not grow with merge count).
    *
    * `batchSize` is the multi-merge throttle on the loop's ONE scale
    * hazard — one Spark job per merge, so a 30k-merge production vocab
    * at batchSize = 1 is 30k sequential jobs. Each pass ranks the top
    * `batchSize` pairs and admits the maximal RANK-PREFIX of pairwise
    * symbol-disjoint pairs (classic batched greedy): a pair joins the
    * batch only while its left, right, AND fused string collide with no
    * earlier admitted pair's left/right/fused — disjoint merges commute
    * (each one's occurrences and counts are untouched by the others),
    * so fusing the whole batch in one pass rewrites the corpus exactly
    * as applying them one-by-one would. The prefix STOPS at the first
    * overlap (never skips past it): an overlapping pair's count is
    * stale after the earlier fuse, and — the subtler case — the fuse
    * can create a NEW pair (e.g. ("ab", "c") after ("a", "b")) that
    * outranks the stale one; stopping lets the next pass re-rank both.
    * Equality contract, spec-pinned: on the admitted overlap-free
    * prefix, batched ≡ sequential greedy. Across passes the sequences
    * can diverge from exact sequential ONLY where a newly-created pair
    * would out-count a later ADMITTED batch member — the standard
    * distributed-BPE approximation; train with batchSize = 1 when
    * merge-rank fidelity to reference tokenizers matters (the oracle
    * entries do).
    */
  private def trainMergesOverRepr(init: org.apache.spark.sql.DataFrame,
      merges: Int, batchSize: Int = 1): Seq[(String, String, Long)] = {
    require(batchSize >= 1, "batchSize >= 1")
    var repr = init.localCheckpoint()
    // fused merges materialize every [[TrainFuseCheckpointEvery]]
    // admitted merges (default: every merge — the measured-fastest
    // cadence; see that val's doc for the lazy-chain A/B)
    var pendingFuses = 0
    val out = Seq.newBuilder[(String, String, Long)]
    var learned = 0
    var done = false
    while (learned < merges && !done) {
      val want = math.min(batchSize, merges - learned)
      // orderBy+limit+collect = one TakeOrdered job; the public
      // bpePairStats adds a rank window (an extra stage) the loop
      // never needed — rank order IS the array order here
      val top = pairCountsOrdered(repr, "repr").limit(want).collect()
        .filter(_.getAs[Long]("cnt") >= 2L)
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val admitted = Seq.newBuilder[(String, String, Long)]
        var stop = false
        for (row <- top if !stop) {
          val l = row.getAs[String]("sym_l")
          val r = row.getAs[String]("sym_r")
          if (used(l) || used(r) || used(l + r)) stop = true
          else {
            admitted += ((l, r, row.getAs[Long]("cnt")))
            used += l += r += (l + r)
          }
        }
        val adm = admitted.result()
        out ++= adm
        learned += adm.size
        // disjoint merges fold into ONE map-only expression chain —
        // one corpus pass per batch, not per merge
        val folded = adm.foldLeft(col("repr")) {
          case (c, (l, r, _)) => fuseMerge(c, l, r)
        }
        repr = repr.select(folded.as("repr"))
        pendingFuses += adm.size
        if (pendingFuses >= TrainFuseCheckpointEvery && learned < merges) {
          repr = repr.localCheckpoint()
          pendingFuses = 0
        }
      }
    }
    out.result()
  }

  /** How many admitted merges may stay un-materialized between the
    * trainer's eager checkpoints. Round-19 A/B'd 8 (lazy chains, half
    * the jobs) against 1 (the original eager-per-merge cadence): the
    * lazy form re-evaluates up to 7 pending fuse chains inside every
    * stats pass — O(merges²) string churn between checkpoints — and
    * measured ~15-20% SLOWER on the bench train despite fewer jobs, so
    * the default stays 1. Production multi-merge training throttles by
    * `batchSize` (one fold+checkpoint per BATCH) where the job count
    * actually bites; the cadence stays overridable for experiments.
    */
  private def TrainFuseCheckpointEvery: Int =
    sys.props.get("graft.train.ckptEvery").map(_.toInt).getOrElse(1)

  /** BPE tokenizer APPLICATION — the inference side of
    * [[trainBpeMerges]]: symbolize each token occurrence to characters
    * and fold the learned merges over it IN RANK ORDER (BPE apply is
    * rank-greedy: earlier merges rewrite before later ones see the
    * string — the same order training discovered them), then join the
    * fused repr back to the occurrences. The fuse is a pure function
    * of the token string, so the merge passes run at VOCABULARY grain
    * ([[fusePerDistinctTok]] — the wordpiece/unigram distinct-word
    * rule): a 30k-merge production vocab costs ~500 map-only
    * expression passes over the vocab plus ONE corpus join, not ~500
    * corpus-sized passes. `checkpointEvery` bounds plan depth per
    * chunk.
    */
  def applyBpe(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)],
      checkpointEvery: Int = 64): org.apache.spark.sql.DataFrame =
    fusePerDistinctTok(
      df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok")),
      concat_ws(" ", expr(
        "transform(sequence(1, length(tok)), i -> substring(tok, i, 1))")),
      merges, checkpointEvery)
      .select(col("id"), split(col("repr"), " ").as("subwords"))

  /** Rank-order merge fold shared by every BPE apply surface: each
    * `checkpointEvery`-sized chunk of merges folds into ONE expression
    * chain over the `repr` column (map-only, codegen'd), then
    * localCheckpoints so plan depth stays bounded for long merge lists.
    * `carryCols` pass through untouched.
    */
  private def foldMergeChunks(repr0: org.apache.spark.sql.DataFrame,
      carryCols: Seq[String], merges: Seq[(String, String)],
      checkpointEvery: Int): org.apache.spark.sql.DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    var repr = repr0
    merges.grouped(checkpointEvery).foreach { chunk =>
      val folded = chunk.foldLeft(col("repr")) { case (c, (l, r)) => fuseMerge(c, l, r) }
      repr = repr.select(carryCols.map(col) :+ folded.as("repr"): _*)
        .localCheckpoint(eager = false)
    }
    repr
  }

  /** Fold a merge list over each DISTINCT token's symbolization, then
    * join the fused repr back to the occurrence rows — the shared
    * vocabulary-grain core of every BPE apply surface: the fuse chain
    * (merges × regex passes) runs over |vocab| rows, and the corpus
    * pays exactly ONE equi-join on the token string (broadcast when
    * the vocab is small, shuffle otherwise — either is dwarfed by
    * per-occurrence fusing at production merge counts). `occ` carries
    * any caller columns plus `tok`; rows multiply only by the join's
    * 1:1 vocab match, so per-occurrence counts are preserved.
    */
  private def fusePerDistinctTok(occ: org.apache.spark.sql.DataFrame,
      tokRepr: Column, merges: Seq[(String, String)],
      checkpointEvery: Int): org.apache.spark.sql.DataFrame =
    // NOT widened (round-19 A/B): the occurrence explode is cheap next
    // to the join+aggregate exchanges that follow, and the extra
    // round-robin shuffle of every token occurrence cost more than the
    // parallel tokenize saved on the bench corpus
    occ.join(
      foldMergeChunks(
        occ.select(col("tok")).distinct().select(col("tok"),
          tokRepr.as("repr")),
        Seq("tok"), merges, checkpointEvery),
      Seq("tok"))

  /** Per-doc subword count under a trained merge list — the exact
    * training-cost estimator ("how many tokens is this corpus under MY
    * tokenizer"), one aggregation over [[applyBpe]].
    */
  def bpeTokenCount(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame =
    applyBpe(df, idCol, textCol, merges)
      .groupBy(col("id"))
      .agg(sum(size(col("subwords"))).cast("long").as("n_subwords"),
        count(lit(1)).as("n_words"))

  // ---- Byte-level BPE (GPT-2-style byte remapping) ----

  /** GPT-2's byte→unicode remap (Radford et al. 2019 `encoder.py`
    * `bytes_to_unicode`, public): printable/latin bytes (33–126,
    * 161–172, 174–255) map to their own codepoint, the rest to
    * U+0100+n in ascending byte order — so EVERY byte has a printable
    * single-char symbol (space 0x20 → 'Ġ' U+0120) and byte-level BPE
    * is CLOSED over any input: no <unk> exists, decode is lossless
    * (the p253 [UNK] contrast). Index = byte value.
    */
  val ByteSymbols: IndexedSeq[String] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) new String(Character.toChars(b))
      else { val s = new String(Character.toChars(256 + n)); n += 1; s }
    }
  }

  // 512-entry literal maps (hex pair ↔ symbol); pure expression trees,
  // safe to share across plans and sessions
  private lazy val byteSymMap: Column =
    map((0 until 256).flatMap(b =>
      Seq(lit(f"$b%02X"), lit(ByteSymbols(b)))): _*)
  private lazy val symByteHexMap: Column =
    map((0 until 256).flatMap(b =>
      Seq(lit(ByteSymbols(b)), lit(f"$b%02X"))): _*)

  /** The UTF-8 bytes of a string column as GPT-2 byte symbols
    * (array<string>), via the hex rendering — two hex chars per byte
    * looked up in the 256-entry literal table. Expression-only (no
    * UDF); `upper` on both engines' hex keeps the key casing pinned.
    */
  def byteSymbols(c: Column): Column = {
    val bin = encode(c, "UTF-8")
    val hx = upper(hex(bin))
    when(octet_length(bin) === 0, typedLit(Seq.empty[String]))
      .otherwise(transform(sequence(lit(1), octet_length(bin)),
        i => element_at(byteSymMap, hx.substr(i * 2 - 1, lit(2)))))
  }

  /** The byte symbolization of one token column `tok` with a LEADING
    * SPACE (add_prefix_space — the Ġ-marking convention: word
    * boundaries become part of the learned vocabulary, so "Ġthe" and
    * mid-word "the" are distinct merge targets exactly as in GPT-2).
    * ONE definition of the convention — init/apply/encode all read it.
    */
  private def byteTokRepr: Column =
    concat_ws(" ", byteSymbols(concat(lit(" "), col("tok"))))

  /** Byte-level BPE start state: one row per TOKEN OCCURRENCE, the
    * space-prefixed token's UTF-8 bytes space-joined as symbols
    * ([[byteTokRepr]]). Reuses [[bpePairStats]] / [[fuseMerge]]
    * unchanged — byte-level differs from char-level ONLY in the start
    * symbolization.
    */
  def byteBpeInitRepr(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame =
    // deliberately NOT widened (round-19 in-session A/B: widening the
    // trainer's sample-sized input made the 6-merge train 2x SLOWER —
    // the trainer is many tiny sequential jobs whose per-pass task
    // overhead dominates; the sample is permille-bounded by contract)
    df.select(explode(tokens(col(textCol))).as("tok"))
      .select(byteTokRepr.as("repr"))

  /** Learn up to `merges` byte-level BPE merges — [[trainBpeMerges]]
    * over the byte symbolization (same loop, same early stop, same
    * deterministic content-hash sampling contract).
    */
  def trainByteBpeMerges(df: org.apache.spark.sql.DataFrame,
      textCol: String, merges: Int,
      samplePermille: Int = 1000,
      batchSize: Int = 1): Seq[(String, String, Long)] =
    trainMergesOverRepr(
      byteBpeInitRepr(sampleByContent(df, textCol, samplePermille), textCol),
      merges, batchSize)

  /** Byte-level BPE application: symbolize each (space-prefixed)
    * DISTINCT token to byte symbols, fold the learned merges in rank
    * order at vocabulary grain, and join back
    * ([[fusePerDistinctTok]]). Returns (id, subwords) per token
    * occurrence — the byte twin of [[applyBpe]].
    */
  def applyByteBpe(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)],
      checkpointEvery: Int = 64): org.apache.spark.sql.DataFrame =
    fusePerDistinctTok(
      df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok")),
      byteTokRepr, merges, checkpointEvery)
      .select(col("id"), split(col("repr"), " ").as("subwords"))

  /** Per-doc subword count under a byte-level merge list — the exact
    * "how many tokens is this corpus under MY tokenizer" estimator at
    * byte grain (fertility readouts divide n_subwords by n_words).
    */
  def byteBpeTokenCount(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame =
    applyByteBpe(df, idCol, textCol, merges)
      .groupBy(col("id"))
      .agg(sum(size(col("subwords"))).cast("long").as("n_subwords"),
        count(lit(1)).as("n_words"))

  /** Integer-id encoding under a byte-level merge list: ids 0–255 are
    * the base byte symbols in BYTE order (always present — byte-level
    * BPE is closed over any input, so unlike [[wordpieceEncode]] no
    * id-0 <unk> convention is needed), merged symbols take 256+rank in
    * merge order — exactly GPT-2's vocabulary numbering. Returns
    * (id, tok_pos, ord, piece_id); every piece is in-vocab by
    * construction (a subword is either a base symbol or a fused merge
    * output), so a NULL piece_id can only mean a broken merge list —
    * and would fail the hash gate rather than pass silently.
    */
  def byteBpeEncode(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, merges: Seq[(String, String)],
      checkpointEvery: Int = 64): org.apache.spark.sql.DataFrame = {
    val vocabPairs: Seq[(String, Long)] =
      ByteSymbols.zipWithIndex.map { case (s, i) => (s, i.toLong) } ++
        merges.zipWithIndex.map { case ((l, r), i) => (l + r, 256L + i) }
    require(vocabPairs.map(_._1).distinct.size == vocabPairs.size,
      "byteBpeEncode: two merges fuse to the same symbol — ids would " +
        "be ambiguous (and CreateMap would reject the duplicate key)")
    val vmap = map(vocabPairs.flatMap { case (s, id) =>
      Seq(lit(s), lit(id)) }: _*)
    fusePerDistinctTok(
      df.select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("tok_pos", "tok")))
        .select(col("id"), col("tok_pos").cast("long").as("tok_pos"),
          col("tok")),
      byteTokRepr, merges, checkpointEvery)
      .select(col("id"), col("tok_pos"),
        posexplode(split(col("repr"), " ")).as(Seq("ord", "piece")))
      .select(col("id"), col("tok_pos"), col("ord").cast("long").as("ord"),
        element_at(vmap, col("piece")).as("piece_id"))
  }

  /** Lossless inverse of the byte symbolization: each subword (base or
    * merged — merges CONCATENATE, so any subword is a char string of
    * base symbols) maps char-by-char back to its bytes, and the byte
    * string decodes as UTF-8. `byteBpeDecode(concat of a token's
    * subwords) == ' ' ++ token` for ANY input — the no-<unk> roundtrip
    * law the spec pins (PipelineSpec, incl. non-ASCII + emoji).
    */
  def byteBpeDecode(subwords: Column): Column = {
    val chars = flatten(transform(subwords, w => split(w, "(?!^)")))
    decode(unhex(concat_ws("",
      transform(chars, ch => element_at(symByteHexMap, ch)))), "UTF-8")
  }

  /** Tokenizer FERTILITY by group (source/language) — the
    * data-mixing readout "how many subwords does a word cost HERE":
    * per-group doc/word/subword totals under a byte-level merge list
    * plus integer permille fertility (1000·subwords DIV words). High
    * fertility marks a group the tokenizer serves badly (each word
    * shatters into many pieces) — the standard signal for rebalancing
    * mixture weights or retraining the vocab. Counts cover
    * token-bearing docs (a whitespace-only doc has no occurrences on
    * either engine). Group-grain output: vocabulary-of-groups-sized,
    * never corpus-sized.
    */
  def byteBpeFertility(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, groupCol: String,
      merges: Seq[(String, String)]): org.apache.spark.sql.DataFrame =
    byteBpeTokenCount(df, idCol, textCol, merges)
      .join(df.select(col(idCol).as("id"), col(groupCol).as("grp")), Seq("id"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).cast("long").as("n_words"),
        sum(col("n_subwords")).cast("long").as("n_subwords"))
      .withColumn("fertility_permille",
        expr("1000 * n_subwords DIV n_words"))

  // ---- PII scrubbing ----

  /** Conservative ASCII PII patterns with IDENTICAL semantics in Java
    * regex and RE2 (no \d, \b, or lookaround — the dialect-divergence
    * traps): email local@domain.tld, dashed phone 3-3/4-4, IPv4.
    * Public-knowledge shapes (the C4/CCNet-style scrub list), not
    * exhaustive validators — a scrub pass wants recall on the common
    * shapes, downstream audits catch the rest. Email matches BOTH cases
    * via explicit A-Za-z classes (not `(?i)`, the most dialect-inert
    * spelling): John.Doe@Example.COM is among the commonest real shapes,
    * and a case-blind miss would also let its digits re-count as
    * phone/IP downstream — a privacy operator can't be lowercase-only.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "[0-9]{3}-[0-9]{3,4}-[0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII scrub pass: replace emails, then dashed phones, then IPv4s
    * with typed placeholders, counting each kind ON THE PROGRESSIVELY
    * SCRUBBED text (phones are counted after emails are gone, IPs
    * after both) — so a digit run inside an email never double-counts
    * as a phone/IP, and the counts are exactly "placeholders
    * inserted". Returns (id, n_emails, n_phones, n_ips, text_clean).
    * Expression-only (regexp_extract_all + regexp_replace, codegen'd);
    * embarrassingly parallel over docs — no shuffle anywhere.
    */
  def piiScrub(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("id"), col(textCol).as("t"))
      .withColumn("n_emails",
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("t1", regexp_replace(col("t"), EmailRe, "<EMAIL>"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("t1"), lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("t2", regexp_replace(col("t1"), PhoneRe, "<PHONE>"))
      .withColumn("n_ips",
        size(regexp_extract_all(col("t2"), lit(Ipv4Re), lit(0))).cast("long"))
      .select(col("id"), col("n_emails"), col("n_phones"), col("n_ips"),
        regexp_replace(col("t2"), Ipv4Re, "<IP>").as("text_clean"))

  /** Word-frequency table for subword training: whitespace-lowercased
    * token occurrences truncated to `maxWordLen` chars (the truncation
    * bounds every per-word DP below to a fixed depth — the standard
    * long-token clamp), rolled to (word, freq). Vocabulary-sized, not
    * corpus-sized: the whole training pipeline downstream works at word
    * grain weighted by freq, the move that makes tokenizer training
    * cheap at any corpus scale.
    */
  def unigramWords(df: org.apache.spark.sql.DataFrame, textCol: String,
      maxWordLen: Int = 12): org.apache.spark.sql.DataFrame = {
    require(maxWordLen >= 1, "maxWordLen >= 1")
    // NOT widened (round-19 bench A/B): the groupBy's map-side partial
    // aggregation compresses occurrences to vocab grain BEFORE the
    // exchange, so pre-shuffling every occurrence cost more than the
    // parallel tokenize saved (wordpiece legs read slower widened)
    df.select(explode(tokens(col(textCol))).as("tok"))
      .select(substring(col("tok"), 1, maxWordLen).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
  }

  /** Unigram-LM SEED vocabulary — the candidate set EM prunes (Kudo
    * 2018, "Subword Regularization", the SentencePiece unigram model):
    * every substring of length 1..maxPieceLen of every word, counted
    * with positional multiplicity weighted by word freq; substrings
    * under `minCount` drop EXCEPT single chars (the fallback that keeps
    * every word segmentable). Returns (piece, cnt).
    */
  def unigramSeedVocab(words: org.apache.spark.sql.DataFrame,
      maxPieceLen: Int, minCount: Long): org.apache.spark.sql.DataFrame = {
    require(maxPieceLen >= 1 && minCount >= 1, "maxPieceLen >= 1; minCount >= 1")
    words.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), j ->
           |    substring(word, i, j - i + 1))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .filter(col("cnt") >= minCount || length(col("piece")) === 1)
  }

  /** Micro-quantized unigram log-probabilities — the model cells of the
    * EM step, quantized AT THE MODEL BOUNDARY (round(1e6·ln(cnt/total)),
    * the BM25-idf move) so every comparison downstream is integer-exact
    * and one oracle covers the whole step. Returns (piece, cnt, w).
    */
  def unigramWeights(vocab: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // double total: value-identical for integer vocabs (corpus sums sit
    // far below 2^53) and keeps the soft-EM loop's fractional counts
    // un-truncated when its vocab feeds back in
    val tot = vocab.agg(sum(col("cnt")).cast("double").as("__tot"))
    vocab.crossJoin(broadcast(tot))
      .select(col("piece"), col("cnt"),
        round(log(col("cnt").cast("double") / col("__tot").cast("double")) * 1e6)
          .cast("long").as("w"))
  }

  private val UnigramMinScore = -1152921504606846976L // -(2^60): unreachable

  /** One VITERBI HARD-EM step of unigram-LM training: segment every
    * word by the max-likelihood segmentation under the current weighted
    * vocab (per-word DP over candidate pieces ≤ maxPieceLen maximizing
    * Σ w; ties broken toward the LONGEST last piece — the smallest
    * start among maximizers — deterministically in both engines), then
    * expected counts e_cnt(piece) = Σ word-freq over chosen pieces.
    * This is the hard-EM E+M count pass (SentencePiece's soft-EM
    * forward–backward marginals are float-valued and not oracle-exact;
    * the Viterbi variant is count-exact, and is also exactly the
    * tokenizer's INFERENCE rule, so the gated step doubles as the
    * apply-side contract).
    *
    * Scale shape: the DP is a per-ROW expression over each word's
    * candidate-edge list (bounded: maxWordLen × maxPieceLen edges) on
    * the vocabulary-sized words frame — no shuffle beyond the edge join
    * (keyed by piece, the token-like volume) and the final count
    * aggregate; the dp column is checkpointed so project-collapse
    * cannot inline its aggregate into every backtrace reference. Words
    * containing a char absent from the vocab contribute nothing (guard
    * sentinel; the seed vocab of the same corpus always carries its
    * chars). Returns (piece, e_cnt).
    */
  def unigramViterbiCounts(words: org.apache.spark.sql.DataFrame,
      weights: org.apache.spark.sql.DataFrame,
      maxPieceLen: Int): org.apache.spark.sql.DataFrame =
    viterbiSegments(words, weights, maxPieceLen)
      .select(col("freq"), explode(col("seg.ps")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).cast("long").as("e_cnt"))

  /** Viterbi SEGMENTATION readout — the tokenizer's apply/inference
    * surface over a trained weighted vocab: each distinct word's
    * max-likelihood segmentation as (word, ord, piece) rows, ord the
    * 0-based piece position from the word's start. Same DP + backtrace
    * as [[unigramViterbiCounts]] (one definition via the shared seg
    * frame — counts are exactly the freq-weighted aggregate of these
    * rows), so the oracle-gated count step doubles as this op's
    * correctness anchor and both are gated directly. Vocabulary-sized
    * work: segment the distinct-words frame once, then apply to a
    * corpus by joining tokens → words — never re-run the DP per token
    * occurrence. Words containing a vocab-less char emit no rows
    * (unreachable DP — the count op's rule).
    */
  def unigramSegment(words: org.apache.spark.sql.DataFrame,
      weights: org.apache.spark.sql.DataFrame,
      maxPieceLen: Int): org.apache.spark.sql.DataFrame =
    viterbiSegments(words, weights, maxPieceLen)
      // ps is built walking from the END of the word; reverse for
      // reading order before numbering
      .select(col("word"),
        posexplode(reverse(col("seg.ps"))).as(Seq("ord", "piece")))
      .select(col("word"), col("ord").cast("long").as("ord"), col("piece"))

  /** Per-doc piece count under a weighted unigram vocab — the
    * SentencePiece twin of [[wordpieceTokenCount]]: distinct words
    * segment once via the Viterbi DP, token occurrences join the
    * per-word piece counts. A word with a vocab-less char (unreachable
    * DP — no segment rows) counts 1, the <unk> convention, matching
    * the WordPiece surface's [UNK]=1. Returns (id, n_pieces, n_words).
    */
  def unigramTokenCount(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      weights: org.apache.spark.sql.DataFrame, maxPieceLen: Int,
      maxWordLen: Int = 12,
      words: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val wordsDf = words.getOrElse(unigramWords(docs, textCol, maxWordLen))
    val np = unigramSegment(wordsDf, weights, maxPieceLen)
      .groupBy(col("word")).agg(count(lit(1)).as("np"))
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .select(col("id"), substring(col("tok"), 1, maxWordLen).as("word"))
      .join(np, Seq("word"), "left")
      .groupBy(col("id"))
      .agg(sum(coalesce(col("np"), lit(1L))).cast("long").as("n_pieces"),
        count(lit(1)).as("n_words"))
  }

  /** Corpus ENCODING under a weighted unigram vocab — the SentencePiece
    * twin of [[wordpieceEncode]]: (doc, token pos, piece pos, integer
    * id); vocab pieces numbered 1..V in binary sort order, a word with
    * a vocab-less char encodes as the single id-0 row (the <unk>
    * convention). Distinct words segment once; one token join fans the
    * per-word rows onto occurrences. Returns (id, tok_pos, ord,
    * piece_id), both positions 0-based.
    */
  def unigramEncode(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      weights: org.apache.spark.sql.DataFrame, maxPieceLen: Int,
      maxWordLen: Int = 12,
      words: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val wordsDf = words.getOrElse(unigramWords(docs, textCol, maxWordLen))
      .localCheckpoint(eager = false) // segment + the unk anti-join
    val pieceIds = weights.select(col("piece")).distinct()
      .withColumn("piece_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("piece")))
        .cast("long"))
    val seg = unigramSegment(wordsDf, weights, maxPieceLen)
      .join(broadcast(pieceIds), Seq("piece")) // every chosen piece is in-vocab
      .select(col("word"), col("ord"), col("piece_id"))
      .localCheckpoint(eager = false) // read twice: rows + the unk anti-join
    val unk = wordsDf.select(col("word"))
      .join(seg.select(col("word")), Seq("word"), "left_anti")
      .select(col("word"), lit(0L).as("ord"), lit(0L).as("piece_id"))
    docs.select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("tok_pos", "tok")))
      .select(col("id"), col("tok_pos").cast("long").as("tok_pos"),
        substring(col("tok"), 1, maxWordLen).as("word"))
      .join(seg.unionByName(unk), Seq("word"))
      .select(col("id"), col("tok_pos"), col("ord"), col("piece_id"))
  }

  /** The shared per-word Viterbi DP + backtrace: (word, freq, seg)
    * where seg.ps lists the chosen pieces END-first. The ONE
    * segmentation definition [[unigramViterbiCounts]] and
    * [[unigramSegment]] read.
    */
  private def viterbiSegments(words: org.apache.spark.sql.DataFrame,
      weights: org.apache.spark.sql.DataFrame,
      maxPieceLen: Int): org.apache.spark.sql.DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen >= 1")
    val MIN = UnigramMinScore
    val cand = words.select(col("word"), col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), j ->
           |    named_struct('i', i - 1, 'j', j,
           |      'piece', substring(word, i, j - i + 1)))))""".stripMargin)).as("e"))
      .select(col("word"), col("freq"),
        col("e.i").as("i"), col("e.j").as("j"), col("e.piece").as("piece"))
    val edges = cand.join(weights.select(col("piece"), col("w")), Seq("piece"))
      .groupBy(col("word"), col("freq"))
      .agg(collect_list(struct(col("i"), col("j"), col("w"), col("piece")))
        .as("edges"))
    // forward DP: dp[pos+1] = best score of word[0..pos), MIN = unreachable
    val dp = edges.withColumn("dp", expr(
      s"""aggregate(sequence(1, length(word)), array(0L),
         |  (acc, j) -> array_append(acc,
         |    coalesce(array_max(transform(
         |      filter(edges, e -> e.j = j AND element_at(acc, e.i + 1) > ${MIN}L),
         |      e -> element_at(acc, e.i + 1) + e.w)), ${MIN}L)))""".stripMargin))
      .localCheckpoint(eager = false) // pin dp: referenced 2× per backtrace step
    // backtrace: walk from the end, taking the maximizer with the
    // smallest start (array_sort on the edge struct orders by i first)
    val seg = dp.withColumn("seg", expr(
      s"""aggregate(sequence(1, length(word)),
         |  named_struct(
         |    'pos', IF(element_at(dp, length(word) + 1) <= ${MIN}L, -1, length(word)),
         |    'ps', cast(array() as array<string>)),
         |  (acc, x) -> IF(acc.pos <= 0, acc,
         |    named_struct(
         |      'pos', element_at(array_sort(filter(edges,
         |          e -> e.j = acc.pos AND element_at(dp, e.i + 1) > ${MIN}L
         |               AND element_at(dp, e.i + 1) + e.w = element_at(dp, acc.pos + 1))), 1).i,
         |      'ps', array_append(acc.ps, element_at(array_sort(filter(edges,
         |          e -> e.j = acc.pos AND element_at(dp, e.i + 1) > ${MIN}L
         |               AND element_at(dp, e.i + 1) + e.w = element_at(dp, acc.pos + 1))), 1).piece))))"""
        .stripMargin))
    seg.select(col("word"), col("freq"), col("seg"))
  }

  /** SOFT-EM expected counts — the forward–backward E-step of
    * SentencePiece's unigram trainer proper, next to the oracle-gated
    * Viterbi hard-EM ([[unigramViterbiCounts]]): per word, alpha[j] =
    * Σ over segmentations of the prefix (product of piece
    * probabilities), beta[i] the suffix mirror, and each candidate
    * piece occurrence contributes its POSTERIOR marginal
    * alpha[i]·p·beta[j]/alpha[n] instead of an all-or-nothing Viterbi
    * pick. Expected counts are corpus sums of freq-weighted marginals.
    *
    * Float contract, stated honestly: marginals are double-valued —
    * products over ≤ maxWordLen pieces of probabilities ≥ 1/Σcnt never
    * underflow a double at the clamped word lengths. The per-word edge
    * lists are SORTED so each word's marginals are order-pinned, but
    * the final corpus aggregate sums doubles across words in
    * partition-dependent order like any distributed float sum — e_soft
    * is reproducible only to float-accumulation order (last-ulp
    * wobble across partitionings), so comparisons are tolerance-based,
    * never byte-exact, and a cross-engine oracle would need
    * transcendental-free arithmetic anyway; this variant is SPEC-gated
    * (brute-force posterior enumeration on small words + the
    * conservation law Σ e_soft·len(piece) = corpus chars), the same
    * batch/spec split every float-model op here uses. Words containing a piece-less char (alpha[n] = 0)
    * contribute nothing, loudly visible as missing mass against the
    * conservation law. Returns (piece, e_soft DOUBLE).
    */
  def unigramSoftCounts(words: org.apache.spark.sql.DataFrame,
      weights: org.apache.spark.sql.DataFrame,
      maxPieceLen: Int): org.apache.spark.sql.DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen >= 1")
    val tot = weights.agg(sum(col("cnt")).cast("double").as("__tot"))
    val wp = weights.crossJoin(broadcast(tot))
      .select(col("piece"), (col("cnt").cast("double") / col("__tot")).as("p"))
    val cand = words.select(col("word"), col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), j ->
           |    named_struct('i', i - 1, 'j', j,
           |      'piece', substring(word, i, j - i + 1)))))""".stripMargin)).as("e"))
      .select(col("word"), col("freq"),
        col("e.i").as("i"), col("e.j").as("j"), col("e.piece").as("piece"))
    // sorted edge lists pin float summation order (determinism)
    val edges = cand.join(wp, Seq("piece"))
      .groupBy(col("word"), col("freq"))
      .agg(sort_array(collect_list(
        struct(col("i"), col("j"), col("p"), col("piece")))).as("edges"))
    val fb = edges.withColumn("alpha", expr(
      """aggregate(sequence(1, length(word)), array(cast(1.0 as double)),
        |  (acc, j) -> array_append(acc,
        |    aggregate(filter(edges, e -> e.j = j), cast(0.0 as double),
        |      (s, e) -> s + element_at(acc, e.i + 1) * e.p)))""".stripMargin))
      .withColumn("beta", expr(
      """aggregate(sequence(length(word) - 1, 0, -1), array(cast(1.0 as double)),
        |  (acc, i) -> concat(array(
        |    aggregate(filter(edges, e -> e.i = i), cast(0.0 as double),
        |      (s, e) -> s + e.p * element_at(acc, e.j - i))), acc))""".stripMargin))
      .localCheckpoint(eager = false) // alpha/beta referenced per edge below
    fb.filter(expr("element_at(alpha, length(word) + 1) > 0"))
      .select(col("freq"), explode(expr(
        """transform(edges, e -> named_struct(
          |  'piece', e.piece,
          |  'm', element_at(alpha, e.i + 1) * e.p * element_at(beta, e.j + 1)
          |       / element_at(alpha, length(word) + 1)))""".stripMargin)).as("em"))
      .groupBy(col("em.piece").as("piece"))
      .agg(sum(col("freq").cast("double") * col("em.m")).as("e_soft"))
  }

  /** Unigram-LM training loop — EM steps composed: each round
    * re-weights the vocab from the last round's expected counts and
    * re-segments (M then E). Unused multi-char pieces PRUNE (they drew
    * zero expected count — the SentencePiece prune analog at its
    * harshest); single-char fallbacks persist at a count floor of 1 so
    * every word stays segmentable forever.
    *
    * `em` selects the E-step: `"viterbi"` (default) composes the
    * oracle-gated hard-EM [[unigramViterbiCounts]] — integer counts,
    * cnt LONG; `"soft"` composes [[unigramSoftCounts]] — SentencePiece's
    * production forward–backward expected counts, cnt DOUBLE under that
    * op's float contract (order-pinned per word, corpus sums to
    * float-accumulation order), so the soft loop is spec-gated like
    * BPE's trainer with the conservation law asserted per iteration,
    * never hash-oracled. Returns the trained (piece, cnt) vocab.
    */
  def unigramTrainLoop(words: org.apache.spark.sql.DataFrame,
      maxPieceLen: Int, minCount: Long, iters: Int,
      em: String = "viterbi")
      : org.apache.spark.sql.DataFrame = {
    require(iters >= 1, "iters >= 1")
    require(em == "viterbi" || em == "soft", s"em must be viterbi|soft, got $em")
    var vocab = unigramSeedVocab(words, maxPieceLen, minCount).localCheckpoint()
    var i = 0
    while (i < iters) {
      val counts = (if (em == "soft")
          unigramSoftCounts(words, unigramWeights(vocab), maxPieceLen)
            .select(col("piece"), col("e_soft").as("e_cnt"))
        else unigramViterbiCounts(words, unigramWeights(vocab), maxPieceLen))
        .localCheckpoint() // chars pass + multi-char pass below
      val chars = vocab.filter(length(col("piece")) === 1).select(col("piece"))
      // the char floor in the E-step's own count type (LONG hard-EM,
      // DOUBLE soft-EM); the union below then stays type-homogeneous
      val floor = if (em == "soft") lit(1.0d) else lit(1L)
      vocab = chars.join(counts, Seq("piece"), "left")
        .select(col("piece"), coalesce(col("e_cnt"), floor).as("cnt"))
        .unionByName(counts.filter(length(col("piece")) > 1)
          .select(col("piece"), col("e_cnt").as("cnt")))
        .localCheckpoint()
      i += 1
    }
    vocab
  }

  // ---- WordPiece tokenizer (BERT-style greedy longest-match) ----

  /** WordPiece frequency vocabulary over [[unigramWords]] — the
    * position-MARKED analog of [[unigramSeedVocab]] (Schuster &
    * Nakajima 2012, the BERT tokenizer family): every substring of
    * length 1..maxPieceLen of every word, word-INITIAL occurrences kept
    * raw and word-INTERNAL ones "##"-prefixed (the continuation marker
    * that makes greedy longest-match position-aware), counted with
    * positional multiplicity weighted by word freq. Pieces under
    * `minCount` drop EXCEPT the single-char fallbacks that keep every
    * in-corpus word segmentable; the fallback rule keys on the MARKED
    * string (length 1, or ##-prefixed length 3) — a literal
    * word-initial "##x" substring rides along, the same stringly grain
    * BERT vocab files live at. Vocabulary-sized output from one
    * token-grain pass. Returns (piece, cnt).
    */
  def wordpieceVocab(words: org.apache.spark.sql.DataFrame,
      maxPieceLen: Int, minCount: Long): org.apache.spark.sql.DataFrame = {
    require(maxPieceLen >= 1 && minCount >= 1, "maxPieceLen >= 1; minCount >= 1")
    words.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), j ->
           |    IF(i = 1, substring(word, i, j - i + 1),
           |       concat('##', substring(word, i, j - i + 1))))))""".stripMargin))
        .as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      .filter(col("cnt") >= minCount || length(col("piece")) === 1 ||
        (col("piece").startsWith("##") && length(col("piece")) === 3))
  }

  /** WordPiece APPLY — BERT's greedy longest-match-first tokenization
    * of each distinct word under a piece vocabulary: from the word
    * start, repeatedly take the LONGEST vocab piece matching at the
    * cursor (word-initial raw, continuations ##-marked); if no piece
    * matches at some cursor the WHOLE word maps to a single [UNK] row —
    * the all-or-nothing no-backtrack rule of the reference
    * implementation (a greedy dead end is NOT retried shorter).
    * Returns (word, ord, piece), ord 0-based reading order.
    *
    * Scale shape mirrors [[unigramSegment]]: candidate edges join the
    * vocab keyed by piece, per-word edge lists array_sort (start asc,
    * end desc) so the greedy pick is element_at(filter(..), 1), and the
    * cursor walk is one bounded aggregate HOF over the
    * VOCABULARY-sized words frame — apply to a corpus by joining tokens
    * → words, never re-running the walk per occurrence.
    */
  def wordpieceSegment(words: org.apache.spark.sql.DataFrame,
      vocab: org.apache.spark.sql.DataFrame,
      maxPieceLen: Int): org.apache.spark.sql.DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen >= 1")
    val cand = words.select(col("word"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), i ->
           |  transform(sequence(i, least(length(word), i + ${maxPieceLen - 1})), j ->
           |    named_struct('i', i, 'j', j,
           |      'piece', IF(i = 1, substring(word, i, j - i + 1),
           |        concat('##', substring(word, i, j - i + 1)))))))""".stripMargin))
        .as("e"))
      .select(col("word"), col("e.i").as("i"), col("e.j").as("j"),
        col("e.piece").as("piece"))
    val edges = cand.join(vocab.select(col("piece")), Seq("piece"))
      .groupBy(col("word"))
      .agg(expr("array_sort(collect_list(struct(i, -j AS nj, j, piece))) AS edges"))
    // left join + typed empty fallback: a word with NO vocab edge at all
    // (chars unseen by the vocab's corpus) must still emit its [UNK] row
    val seg = words.select(col("word")).join(edges, Seq("word"), "left")
      .withColumn("edges", coalesce(col("edges"),
        expr("cast(array() as array<struct<i:int,nj:int,j:int,piece:string>>)")))
      .withColumn("seg", expr(
        s"""aggregate(sequence(1, length(word)),
           |  named_struct('pos', 1, 'ps', cast(array() as array<string>)),
           |  (acc, x) -> CASE
           |    WHEN acc.pos <= 0 OR acc.pos > length(word) THEN acc
           |    WHEN size(filter(edges, e -> e.i = acc.pos)) = 0 THEN
           |      named_struct('pos', -1, 'ps', cast(array() as array<string>))
           |    ELSE named_struct(
           |      'pos', element_at(filter(edges, e -> e.i = acc.pos), 1).j + 1,
           |      'ps', array_append(acc.ps,
           |        element_at(filter(edges, e -> e.i = acc.pos), 1).piece))
           |  END)""".stripMargin))
    seg.select(col("word"), posexplode(
        when(col("seg.pos") < 0, array(lit("[UNK]"))).otherwise(col("seg.ps")))
        .as(Seq("ord", "piece")))
      .select(col("word"), col("ord").cast("long").as("ord"), col("piece"))
  }

  /** Per-doc piece count under a WordPiece vocab — the training-cost
    * estimator ("how many tokens is this corpus under MY BERT
    * tokenizer"): segment the DISTINCT words once via
    * [[wordpieceSegment]], then join token occurrences → per-word piece
    * counts and sum per doc ([UNK] counts as 1, like the real
    * tokenizer's output length). Returns (id, n_pieces, n_words).
    */
  def wordpieceTokenCount(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      vocab: org.apache.spark.sql.DataFrame, maxPieceLen: Int,
      maxWordLen: Int = 12): org.apache.spark.sql.DataFrame = {
    val words = unigramWords(docs, textCol, maxWordLen)
    val np = wordpieceSegment(words, vocab, maxPieceLen)
      .groupBy(col("word")).agg(count(lit(1)).as("np"))
    docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .select(col("id"), substring(col("tok"), 1, maxWordLen).as("word"))
      .join(np, Seq("word"))
      .groupBy(col("id"))
      .agg(sum(col("np")).cast("long").as("n_pieces"),
        count(lit(1)).as("n_words"))
  }

  /** Positional postings — the phrase-search artifact next to the BM25
    * bag-of-words index: one row per token OCCURRENCE as (term, id,
    * pos). Persist range-laid by `term` (repartitionByRange + sort) and
    * a k-term phrase probe reads only its k terms' row groups.
    */
  def positionalPostings(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame =
    graft.util.Widen.widenNarrowScan(docs)
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .select(col("term"), col("id"), col("pos").cast("long").as("pos"))

  /** Exact phrase search — consecutive-position conjunction over a
    * positional posting relation (the classic positional-index phrase
    * algorithm): occurrences of term_i anchor at (id, pos − i), and a
    * phrase match is the k-way equi-join of the anchors. k−1 joins on
    * (id, start), each side pre-filtered to ONE term's postings —
    * never a scan-per-term of raw text, and overlapping matches and
    * repeated phrase terms fall out of the join semantics. Returns
    * (id, start), one row per occurrence, start 0-based.
    */
  def phraseMatchesIndexed(postings: org.apache.spark.sql.DataFrame,
      phrase: String): org.apache.spark.sql.DataFrame = {
    val terms = phrase.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    require(terms.nonEmpty, "phrase must contain at least one token")
    terms.zipWithIndex.map { case (t, i) =>
      postings.filter(col("term") === t)
        .select(col("id"), (col("pos") - i).as("start"))
    }.reduce(_.join(_, Seq("id", "start")))
      .select(col("id"), col("start"))
  }

  /** Append a disjoint doc batch to a standing positional-postings
    * store as its own run directory (`base/run=<tag>`) — the
    * bm25IndexIngest maintenance law at position grain: postings of
    * disjoint docs are disjoint ROWS, so the standing index is the
    * plain union over runs, folds never rewrite, and
    * overwrite-by-run-tag keeps redelivery idempotent. A loud
    * disjointness probe (broadcast semi-join of the batch's ids against
    * the store) fails an id collision instead of silently doubling a
    * doc's positions. Probe with
    * [[phraseMatchesIndexed]](spark.read.parquet(base), phrase) —
    * row-identical to the ad-hoc search over everything appended
    * (p259 gates under p256's oracle).
    */
  def appendPositionalPostings(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, base: String, runTag: String): Unit = {
    val spark = docs.sparkSession
    val ids = docs.select(col(idCol).as("id")).distinct()
      .localCheckpoint(eager = false) // collision probe + nothing else
    // explicit existence check — only path-absence may skip the probe; a
    // transient FS/footer error must propagate, never silently disable
    // the guard (a swallowed error here would double positions silently)
    val basePath = new org.apache.hadoop.fs.Path(base)
    val fs = basePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(basePath)) {
      // exclude THIS tag's run: redelivering the same tag must stay
      // idempotent (overwrite-by-run-tag), so only OTHER runs' ids count
      val others = spark.read.parquet(base)
        .filter(col("run").cast("string") =!= runTag)
      val clash = others.select(col("id"))
        .join(broadcast(ids), Seq("id"), "left_semi").limit(1).count()
      require(clash == 0L,
        s"appendPositionalPostings: batch ids collide with the standing " +
          s"store at $base — folds must be disjoint (re-ingest under a new id space)")
    }
    positionalPostings(docs, idCol, textCol)
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$base/run=$runTag")
  }

  /** Major compaction for a positional-postings store: fold the
    * accumulated `run=` directories back into ONE range-laid store —
    * the append-only lifecycle's other half (the cell store's
    * publish-then-delete healing shape): many small runs re-sort into
    * term-contiguous row groups so probes stop paying per-run scan
    * overhead, rows byte-identical (postings are immutable facts — no
    * reconcile, only layout). The result keeps the `run=` layout as the
    * single `run=compacted` partition so later appends (and their
    * collision probe, which reads `run`) keep working — a flat rewrite
    * would break partition discovery for the next fold. Publishes to
    * `<base>__compact` first, swaps by rename, deletes the old store
    * LAST — a crash leaves either the old runs or the full compacted
    * store, never neither. `_snapshots`
    * ([[graft.streaming.PipelineStream.snapshotRunStore]] lives INSIDE
    * the store) is carried across the swap before `__old` is deleted —
    * routine compaction must not destroy the store's backups; a crash
    * between publish and carry leaves them intact in `__old`, and the
    * next compaction's entry heal merges `__old/_snapshots` forward
    * before collecting the residue.
    * (The swap's atomicity is the filesystem's
    * directory rename — real on HDFS/POSIX; on an object store rename
    * is copy+delete, so run compaction there behind the same external
    * coordination any rename-swap pattern needs.)
    */
  def compactPositionalPostings(spark: org.apache.spark.sql.SparkSession,
      base: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val basePath0 = new org.apache.hadoop.fs.Path(base)
    val old0 = new org.apache.hadoop.fs.Path(base + "__old")
    // heal a previous run's crash-after-publish residue: the store is
    // live but __old (holding the pre-compaction runs AND possibly the
    // uncarried _snapshots) was never collected — carry snapshots whose
    // names the live store doesn't already have, then collect. A crash
    // BETWEEN retire and publish (base missing) stays a loud manual
    // heal (rename __old back), as before.
    if (fs.exists(old0) && fs.exists(basePath0)) {
      val oldSnaps0 = new org.apache.hadoop.fs.Path(old0, "_snapshots")
      if (fs.exists(oldSnaps0)) {
        val liveSnaps = new org.apache.hadoop.fs.Path(basePath0, "_snapshots")
        fs.mkdirs(liveSnaps)
        fs.listStatus(oldSnaps0).foreach { st =>
          val dst = new org.apache.hadoop.fs.Path(liveSnaps, st.getPath.getName)
          if (!fs.exists(dst))
            require(fs.rename(st.getPath, dst),
              s"compact: could not carry snapshot ${st.getPath}")
        }
      }
      fs.delete(old0, true)
    }
    val tmpOut = new org.apache.hadoop.fs.Path(base + "__compact")
    spark.read.parquet(base)
      .select(col("term"), col("id"), col("pos"))
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$tmpOut/run=compacted")
    val basePath = new org.apache.hadoop.fs.Path(base)
    val old = new org.apache.hadoop.fs.Path(base + "__old")
    require(fs.rename(basePath, old), s"compact: could not retire $base")
    require(fs.rename(tmpOut, basePath), s"compact: could not publish $tmpOut")
    // carry the store's snapshots across the swap BEFORE deleting the
    // retired tree — they ride inside the base dir, and deleting __old
    // with them still in it would silently destroy every backup
    val oldSnaps = new org.apache.hadoop.fs.Path(old, "_snapshots")
    if (fs.exists(oldSnaps))
      require(fs.rename(oldSnaps,
        new org.apache.hadoop.fs.Path(basePath, "_snapshots")),
        s"compact: could not carry _snapshots from $oldSnaps")
    fs.delete(old, true) // last — the published store is already live
  }

  /** Proximity search — the positional index's NEAR/k query: every
    * occurrence pair of `termA` and `termB` within `window` token
    * positions of each other (either order; same-position excluded so
    * termA == termB doesn't self-pair). One equi-join on id, each side
    * one term's postings; per-doc cost is tf_a·tf_b — the classic
    * merge-of-sorted-lists bound, paid here as a join the per-term
    * filters keep tiny. Returns (id, pos_a, pos_b).
    */
  def proximityMatches(postings: org.apache.spark.sql.DataFrame,
      termA: String, termB: String,
      window: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1, "window >= 1")
    postings.filter(col("term") === termA.toLowerCase(java.util.Locale.ROOT))
      .select(col("id"), col("pos").as("pos_a"))
      .join(postings.filter(col("term") === termB.toLowerCase(java.util.Locale.ROOT))
        .select(col("id"), col("pos").as("pos_b")), Seq("id"))
      .filter(abs(col("pos_a") - col("pos_b")) <= window &&
        col("pos_a") =!= col("pos_b"))
  }

  /** Ad-hoc phrase search: [[phraseMatchesIndexed]] over postings built
    * in-line — ONE tokenize pass, then the same k-way anchor join.
    */
  def phraseMatches(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, phrase: String): org.apache.spark.sql.DataFrame =
    phraseMatchesIndexed(
      positionalPostings(docs, idCol, textCol).localCheckpoint(eager = false),
      phrase)

  /** Corpus ENCODING under a WordPiece vocab — the artifact a
    * pretraining run actually consumes: one row per (doc, token
    * position, piece position) carrying the piece's integer id. Ids
    * follow the vocab-file convention: [UNK] = 0 (ALWAYS — a literal
    * "[UNK]" vocab piece also encodes 0), vocab pieces numbered 1..V in
    * piece sort order. Work shape: segment the DISTINCT words once
    * (vocabulary-sized), number the vocab once (a window over the
    * V-row piece frame — model-sized, never corpus-sized), then ONE
    * token-grain join fans per-word rows onto occurrences.
    * Returns (id, tok_pos, ord, piece_id), both positions 0-based.
    */
  def wordpieceEncode(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      vocab: org.apache.spark.sql.DataFrame, maxPieceLen: Int,
      maxWordLen: Int = 12,
      words: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    // the segment walk reads the words frame twice (edges + the UNK
    // left join) — checkpoint so the corpus tokenize never runs twice;
    // callers that already hold the frame (a vocab trained on the SAME
    // corpus) pass it in instead of paying a second derivation
    val wordsDf = words.getOrElse(unigramWords(docs, textCol, maxWordLen))
      .localCheckpoint(eager = false)
    val pieceIds = vocab.select(col("piece")).distinct()
      .withColumn("piece_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("piece")))
        .cast("long"))
    val seg = wordpieceSegment(wordsDf, vocab, maxPieceLen)
      .join(broadcast(pieceIds), Seq("piece"), "left")
      .select(col("word"), col("ord"),
        when(col("piece") === "[UNK]", 0L)
          .otherwise(col("piece_id")).as("piece_id"))
    docs.select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("tok_pos", "tok")))
      .select(col("id"), col("tok_pos").cast("long").as("tok_pos"),
        substring(col("tok"), 1, maxWordLen).as("word"))
      .join(seg, Seq("word"))
      .select(col("id"), col("tok_pos"), col("ord"), col("piece_id"))
  }

  /** WordPiece TRAINING — likelihood-scored merges over the ##-marked
    * character symbolization (Schuster & Nakajima 2012 §III; the rule
    * HuggingFace's trainer implements): repeatedly fuse the adjacent
    * symbol pair maximizing score = cnt(pair) / (cnt(l) · cnt(r)) — the
    * corpus-likelihood GAIN of the merge — where BPE argmaxes raw
    * cnt(pair); rare-but-exclusive pairs beat frequent coincidences.
    * Fusing drops the right symbol's continuation marker ("h" + "##e" →
    * "he"). Scores are double ratios of exact counts (ties broken score
    * desc, pair asc — deterministic within the engine; the trainer is
    * SPEC-gated like the BPE/unigram loops, the float-model split).
    * Stops early when no pair occurs twice. Returns the learned
    * vocabulary — base symbols (corpus chars, raw + ##-marked) sorted,
    * then each merge's fused symbol in learn order: exactly the vocab
    * file a BERT tokenizer ships, ready for [[wordpieceSegment]].
    *
    * Cost contract mirrors [[trainBpeMerges]]: two aggregations per
    * merge over the (sampled) symbolization; production vocabs train on
    * the deterministic content-hashed `samplePermille` sample.
    * `batchSize` is the BPE trainer's multi-merge throttle applied to
    * the likelihood score: a pair's score cnt/(cl·cr) depends only on
    * its own pair count and its two symbols' unigram counts, so pairs
    * whose left/right/fused strings are mutually fresh have scores the
    * other fuses cannot move — the admitted rank-prefix commutes
    * exactly as in [[trainMergesOverRepr]], the prefix stops at the
    * first overlap, and all admitted merges fold in ONE pass.
    */
  def wordpieceTrainVocab(df: org.apache.spark.sql.DataFrame,
      textCol: String, merges: Int,
      samplePermille: Int = 1000, batchSize: Int = 1): Seq[String] = {
    require(samplePermille > 0 && samplePermille <= 1000,
      "samplePermille must be in (0, 1000]")
    require(batchSize >= 1, "batchSize >= 1")
    val sampled =
      if (samplePermille >= 1000) df
      else df.filter(hash60(col(textCol)) % 1000 < samplePermille)
    var repr = sampled.select(explode(tokens(col(textCol))).as("tok"))
      .select(concat_ws(" ", expr(
        """transform(sequence(1, length(tok)), i ->
          |  IF(i = 1, substring(tok, i, 1),
          |     concat('##', substring(tok, i, 1))))""".stripMargin)).as("repr"))
      .localCheckpoint()
    val base = repr.select(explode(split(col("repr"), " ")).as("s"))
      .distinct().orderBy(col("s")).collect().map(_.getString(0)).toSeq
    val out = Seq.newBuilder[String]
    var learned = 0
    var done = false
    while (learned < merges && !done) {
      val want = math.min(batchSize, merges - learned)
      val syms = repr.select(explode(split(col("repr"), " ")).as("s"))
        .groupBy(col("s")).agg(count(lit(1)).as("c"))
      val top = repr.select(split(col("repr"), " ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"
        )).as("p"))
        .groupBy(col("p.l").as("sym_l"), col("p.r").as("sym_r"))
        .agg(count(lit(1)).as("cnt"))
        // singleton pairs are noise, not vocabulary — and their scores
        // are deceptively high (cnt/(cl·cr) favors the rare), so the
        // floor must come BEFORE the argmax, not after
        .filter(col("cnt") >= 2)
        .join(syms.select(col("s").as("sym_l"), col("c").as("cl")), Seq("sym_l"))
        .join(syms.select(col("s").as("sym_r"), col("c").as("cr")), Seq("sym_r"))
        .withColumn("score", col("cnt").cast("double") /
          (col("cl").cast("double") * col("cr").cast("double")))
        .orderBy(col("score").desc, col("sym_l"), col("sym_r")).limit(want)
        .collect()
      if (top.isEmpty) done = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val adm = Seq.newBuilder[(String, String, String)]
        var stop = false
        for (row <- top if !stop) {
          val l = row.getAs[String]("sym_l")
          val r = row.getAs[String]("sym_r")
          val fused = l + (if (r.startsWith("##")) r.drop(2) else r)
          if (used(l) || used(r) || used(fused)) stop = true
          else { adm += ((l, r, fused)); used += l += r += fused }
        }
        val admitted = adm.result()
        out ++= admitted.map(_._3)
        learned += admitted.size
        val folded = admitted.foldLeft(col("repr")) {
          case (c, (l, r, fused)) => fuseMergeAs(c, l, r, fused)
        }
        repr = repr.select(folded.as("repr")).localCheckpoint()
      }
    }
    base ++ out.result()
  }

  /** BM25 top-k retrieval — the de facto lexical ranking standard
    * (Robertson–Spärck Jones idf, tf saturation k1, length
    * normalization b), in FIXED-POINT integer arithmetic so the ranking
    * is bit-identical across engines:
    *
    *   idf_micro(t) = round(1e6·ln(1 + (N − df + 0.5)/(df + 0.5)))
    *     [the Lucene variant — ALWAYS positive, which matters twice: no
    *     stopword-penalty sign flips, and a negative numerator would
    *     split Spark's truncating div from a flooring SQL `//`; the one
    *     float, micro-quantized at the model boundary — the DSIR
    *     contract];
    *   with k1 = 6/5 and b = 3/4 (the standard parameters as exact
    *     rationals), multiplying the per-term fraction through by 20·T
    *     (T = total corpus tokens) clears all denominators:
    *   score(t, d) = idf_micro · (44·T·tf) div (20·T·tf + 6·T + 18·len·N)
    *
    * summed over matched query terms in DECIMAL(38,0) (44·T·tf·idf
    * exceeds 2^63 on big corpora). Corpus pass mirrors [[lexicalTopK]]:
    * one tokenize explode filtered to the broadcast query terms, tf per
    * (doc, term), df over matched terms only, doc lengths ride along,
    * distributed TakeOrdered — no corpus-wide state beyond N and T
    * (two scalars).
    */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryText: String, k: Int): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qTerms = parseQueryTerms(queryText)
    // not widened (round-19 bench A/B: bm25_adhoc read slower widened —
    // the query-term semi-join drops most occurrences map-side)
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
      .select(col("id"), size(col("tk")).cast("long").as("len"), col("tk"))
      .localCheckpoint(eager = false) // feeds N/T scalars + the match pass
    val nt = toks.agg(count(lit(1)), sum(col("len"))).head()
    val nDocs = nt.getLong(0)
    val totTok = nt.getLong(1)
    val matched = toks
      .select(col("id"), col("len"), explode(col("tk")).as("term"))
      .join(broadcast(qTerms.toDF("term")), Seq("term"))
      .groupBy(col("id"), col("term"))
      .agg(first(col("len")).as("len"), count(lit(1)).as("tf"))
    bm25Rank(matched, nDocs, totTok, k)
  }

  private def parseQueryTerms(queryText: String): Seq[String] = {
    val qTerms = queryText.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "query must contain at least one term")
    qTerms
  }

  /** The shared BM25 scoring tail over a matched postings probe
    * (id, term, len, tf): df per query term, Lucene-positive idf
    * micro-quantized, the all-integer k1=6/5 b=3/4 score, distributed
    * top-k. [[bm25TopK]] feeds it from a per-query tokenize pass;
    * [[bm25TopKIndexed]] from a standing postings artifact.
    */
  private def bm25Rank(matchedIn: org.apache.spark.sql.DataFrame,
      nDocs: Long, totTok: Long, k: Int): org.apache.spark.sql.DataFrame = {
    val matched = matchedIn
      .localCheckpoint(eager = false) // feeds df aggregate + score join
    val dfreq = matched.groupBy("term")
      .agg(count(lit(1)).as("df"))
      .withColumn("idf_micro", expr(
        s"CAST(round(1000000 * ln(1 + (${nDocs}L - df + 0.5) / (df + 0.5))) AS BIGINT)"))
    val scored = matched
      .join(broadcast(dfreq), Seq("term"))
      // every factor lifts to DECIMAL(38,0) BEFORE multiplying — 44·T·tf
      // alone passes 2^63 on a 100 TB corpus
      .withColumn("ts", expr(
        s"CAST(idf_micro AS DECIMAL(38,0)) * 44 * ${totTok}L * tf DIV " +
          s"(CAST(20 AS DECIMAL(38,0)) * ${totTok}L * tf " +
          s"+ CAST(6 AS DECIMAL(38,0)) * ${totTok}L " +
          s"+ CAST(18 AS DECIMAL(38,0)) * len * ${nDocs}L)"))
      .groupBy("id").agg(sum(col("ts")).cast("long").as("score"))
    scored.orderBy(col("score").desc, col("id")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("score").desc, col("id"))))
      .select(col("rank"), col("id"), col("score"))
  }

  /** Standing BM25 index artifacts — the persisted inverted-index form
    * of the tokenize pass [[bm25TopK]] pays per query: postings
    * (term, id, tf, len), one row per (doc, distinct term). New-document
    * maintenance is a pure APPEND (doc ids are disjoint, so no standing
    * row or aggregate ever rewrites — the index analog of the engine's
    * flush-new-runs story); df / N / T are read from the folded
    * artifacts at query time, and only over the query's terms.
    */
  def bm25Postings(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
      .select(col("id"), size(col("tk")).cast("long").as("len"),
        explode(col("tk")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(first(col("len")).as("len"), count(lit(1)).as("tf"))
      .select(col("term"), col("id"), col("tf"), col("len"))

  /** The postings' sibling artifact: (id, len) for EVERY document —
    * token-less docs carry no postings but still weight N and T
    * (bm25TopK counts them), so the corpus stats live here.
    */
  def bm25DocLens(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("id"),
      size(tokens(col(textCol))).cast("long").as("len"))

  /** BM25 top-k over a standing (delta-folded) index: N/T from the
    * docLens artifact, postings probed on the query terms only
    * (broadcast — a term-keyed index scan, never a corpus tokenize),
    * then the SAME integer scoring tail as [[bm25TopK]] — ranks are
    * bit-identical to the ad-hoc path over the same documents, so the
    * index+fold composition gates under p120's oracle (p225).
    */
  def bm25TopKIndexed(postings: org.apache.spark.sql.DataFrame,
      docLens: org.apache.spark.sql.DataFrame, queryText: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val spark = postings.sparkSession
    import spark.implicits._
    val qTerms = parseQueryTerms(queryText)
    val nt = docLens.agg(count(lit(1)), sum(col("len"))).head()
    val nDocs = nt.getLong(0)
    require(nDocs > 0, "empty index: no documents in docLens")
    val matched = postings.select(col("id"), col("term"), col("len"), col("tf"))
      .join(broadcast(qTerms.toDF("term")), Seq("term"))
    bm25Rank(matched, nDocs, nt.getLong(1), k)
  }

  /** Lexical top-k retrieval (the keyword search primitive): docs scored
    * by Σ over matched DISTINCT query terms of the integer idf weight
    * floor(1000·N / df) — rare terms dominate, exact integers keep the
    * ranking reproducible across engines. One explode pass filtered to
    * query terms (broadcast), df computed over those terms only,
    * distributed TakeOrdered top-k — no global sort, no corpus-wide
    * aggregation beyond the handful of query terms.
    */
  def lexicalTopK(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryText: String, k: Int): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qTerms = queryText.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "query must contain at least one term")
    val nDocs = docs.count()
    // (doc, matched query term) pairs feed BOTH the df aggregate and the
    // score join — lazy checkpoint keeps the tokenize single-pass
    val matched = docs
      .select(col(idCol).as("id"), explode(array_distinct(tokens(col(textCol)))).as("term"))
      .join(broadcast(qTerms.toDF("term")), Seq("term"))
      .localCheckpoint(eager = false)
    val df = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = matched
      .join(broadcast(df), Seq("term"))
      .withColumn("w", expr(s"(${nDocs}L * 1000L) div df"))
      .groupBy("id").agg(sum(col("w")).as("score"))
    scored.orderBy(col("score").desc, col("id")).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("score").desc, col("id"))))
      .select(col("rank"), col("id"), col("score"))
  }

  /** HTML → text extraction (the web-crawl ingest front door; what
    * trafilatura/jusText do before any quality/dedup stage runs): drop
    * `<script>`/`<style>` blocks WITH their contents (their text is code,
    * not prose), strip remaining tags to spaces (a tag boundary separates
    * words — `</p><p>` must not glue sentences), decode the five XML
    * entities + `&nbsp;`/`&#39;`, collapse whitespace, trim. Pure
    * chained regexp_replace/replace — codegen'd, linear per row, and the
    * regexes (`(?s)`, lazy `.*?`, `[^>]*`) mean the same thing in Java
    * regex and RE2 so a SQL oracle reproduces the extraction exactly.
    * Entity decode runs AFTER tag stripping, so `&lt;p&gt;` in the source
    * text stays literal text (never becomes a strippable tag) — the
    * order a correct extractor requires.
    */
  def extractHtmlText(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, lit("(?s)<script[^>]*>.*?</script>"), lit(" ")),
      lit("(?s)<style[^>]*>.*?</style>"), lit(" "))
    val noTags = regexp_replace(noBlocks, lit("<[^>]*>"), lit(" "))
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
      "&nbsp;" -> " ", "&amp;" -> "&" // ampersand LAST: &amp;lt; → &lt; literal
    ).foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, lit("\\s+"), lit(" ")))
  }

  /** Per-document character-level Shannon entropy in bits — the cheap
    * gibberish/binary-spill detector (natural prose sits ~4 bits/char;
    * base64 blobs ~6; single-char floods ~0). Computed as
    * log2(n) − Σ c·log2(c)/n over per-character counts: explode to one
    * row per character, but the (id, char) partial aggregate combines
    * map-side, so the shuffle carries ≤ |alphabet| rows per doc per
    * partition — at 100 TB that is the distinct-char profile, not the
    * character stream. Returns (id, n_chars, entropy).
    */
  def charEntropy(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("id"), explode(split(col(textCol), "")).as("ch"))
      .filter(length(col("ch")) === 1) // guard split("")'s empty-string edge
      .groupBy(col("id"), col("ch"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(sum(col("c")).as("n_chars"),
        (log2(sum(col("c")).cast("double")) -
          sum(col("c").cast("double") * log2(col("c").cast("double"))) /
            sum(col("c")).cast("double")).as("entropy"))

  /** Per-group quota sampling (domain/source balancing — cap any one
    * crawl source's share of the mixture): keep at most `k` docs per
    * group, chosen by the deterministic cross-engine [[hash60]] order
    * (id tie-break), so the SAME docs survive on any engine and any
    * partitioning. The rank-≤-k predicate compiles to WindowGroupLimit:
    * each map task keeps only its local top-k per group BEFORE the
    * shuffle, so a 100 TB group costs k rows per upstream partition, not
    * a full-group sort. Returns (id, group, pick) with pick ∈ [1, k].
    */
  def groupQuota(docs: org.apache.spark.sql.DataFrame, idCol: String,
      groupCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"), col("id"))
    docs
      .select(col(idCol).as("id"), col(groupCol).as("grp"),
        hash60(col(idCol)).as("h"))
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= k)
      .select(col("id"), col("grp"), col("pick").cast("long").as("pick"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2 — the cleanup
    * pass every web corpus runs before doc-level quality filters): split
    * on `delim`, trim each line, drop lines under `minWords` words or
    * matching `dropRegex` (the "javascript"/policy-boilerplate filter),
    * keep only each surviving line's FIRST occurrence within the doc, and
    * reassemble in order. Expression-only — the per-doc line work rides
    * the projection (no explode, no shuffle; lines-per-doc is bounded, so
    * the O(L²) first-occurrence array_position is constant per row).
    * Returns (id, text_clean, n_kept, n_dropped); a fully-cleaned doc
    * keeps an empty string, not a dropped row.
    */
  def cleanLines(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, delim: String, minWords: Int,
      dropRegex: String): org.apache.spark.sql.DataFrame =
    df
      .select(col(idCol).as("id"),
        // delim is a LITERAL separator: quoted for the split regex, used
        // verbatim for the reassembly join below
        transform(split(col(textCol), java.util.regex.Pattern.quote(delim)),
          x => trim(x)).as("_lines"))
      .withColumn("_kept", filter(col("_lines"), l =>
        size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= minWords &&
          !(l rlike dropRegex)))
      .withColumn("_dedup", filter(col("_kept"), (l, i) =>
        array_position(col("_kept"), l) === i + 1))
      .select(col("id"),
        array_join(col("_dedup"), delim).as("text_clean"),
        size(col("_dedup")).cast("long").as("n_kept"),
        (size(col("_lines")) - size(col("_dedup"))).cast("long").as("n_dropped"))

  /** Per-document coverage of the top-`vocabSize` corpus vocabulary — the
    * tokenizer-fit check (a slice whose OOV rate spikes is the wrong
    * corpus for the vocab): vocab = the `vocabSize` most frequent
    * whitespace tokens (count desc, token asc — deterministic), coverage
    * = how many of a doc's token OCCURRENCES are in it. The vocab is
    * driver-small by construction (`vocabSize` rows out of a TakeOrdered
    * over the token aggregate) and BROADCASTS back; the doc side is one
    * tokenize + explode with map-side (id, in-vocab) counting. Returns
    * (id, n_tokens, n_oov, oov_permille) with the rate an exact integer.
    */
  def vocabCoverage(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .localCheckpoint(eager = false) // feeds vocab AND coverage: one pass
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(vocabSize)
      .select(col("tok"))
    toks
      .join(broadcast(vocab.withColumn("inv", lit(1L))), Seq("tok"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        (count(lit(1)) - count(col("inv"))).as("n_oov"))
      .select(col("id"), col("n_tokens"), col("n_oov"),
        expr("n_oov * 1000 DIV n_tokens").as("oov_permille"))
  }

  /** Data-recipe planning (the mixture table of LLaMA-style training
    * runs — given target mixture weights per source and a total token
    * budget, how much of each source do we need and how many EPOCHS of it
    * exist to be had): per-source inventory (docs, tokens) joined with
    * the literal weight table, share_tokens = budget·weight/1000 and
    * epochs_milli = 1000·share/inventory, all integer division — repeat
    * counts over 1000 milli-epochs mean the source must be upsampled.
    * ONE partial-aggregated shuffle to |sources| rows, then a broadcast
    * of the weight literals; sources absent from `weightsPermille` plan
    * at weight 0 (the census still shows their inventory).
    */
  def mixturePlan(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, sourceCol: String,
      weightsPermille: Map[String, Long],
      budgetTokens: Long): org.apache.spark.sql.DataFrame = {
    require(weightsPermille.nonEmpty && budgetTokens > 0, "weights + budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weightsPermille.toSeq.toDF("source", "wp")
    // FULL outer: a weight entry whose source has no corpus rows must
    // surface as a zero-inventory row, not silently drop its share of
    // the budget (the typo'd-source failure mode)
    docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col(textCol)))).cast("long").as("n_tokens"))
      .join(broadcast(w), Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("wp"), lit(0L)).as("weight_permille"))
      .withColumn("share_tokens",
        expr(s"${budgetTokens}L * weight_permille DIV 1000L"))
      .withColumn("epochs_milli",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("share_tokens * 1000L DIV n_tokens")))
  }

  /** Realize a [[mixturePlan]] into the training list: one output row
    * per (document, epoch) the plan calls for. A source planned at
    * epochs_milli = 2500 repeats every doc twice and keeps a
    * deterministic half for the third pass: epoch e survives iff
    * e·1000 + hash60(id:e) mod 1000 < epochs_milli — full epochs pass
    * unconditionally, the fractional tail is the same hash gate as
    * every sampler here (per-epoch salt, so different epochs keep
    * DIFFERENT doc subsets — a repeat of the identical subset would
    * double those docs' gradient weight instead of approximating the
    * fractional epoch). Zero-epoch sources emit nothing. The plan
    * broadcasts (|sources| rows); the corpus pass is one map-side
    * join + bounded explode (ceil(epochs) ≤ plan maximum), no shuffle.
    */
  def epochExpand(docs: org.apache.spark.sql.DataFrame, idCol: String,
      sourceCol: String,
      plan: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("id"), col(sourceCol).as("source"))
      .join(broadcast(plan.select(col("source"), col("epochs_milli"))),
        Seq("source"))
      .withColumn("epoch", explode(
        when(col("epochs_milli") > 0,
          expr("sequence(0L, (epochs_milli + 999) DIV 1000 - 1)"))
          .otherwise(array().cast("array<bigint>"))))
      .filter(col("epoch") * 1000 +
        hash60(concat_ws(":", col("id"), col("epoch"))) % 1000 <
        col("epochs_milli"))
      .select(col("id"), col("source"), col("epoch"))

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — the hashed-n-gram
    * data-selection pass): score every source document by the
    * log-likelihood ratio of its hashed-UNIGRAM features under
    * bag-of-buckets models of the target vs the source distribution.
    * A token's feature is [[hash60]](token) % `buckets` (the paper's
    * hashing trick — model size is bounded by `buckets` regardless of
    * vocabulary); bucket counts are Laplace-smoothed (+1 count, +`buckets`
    * total). Each bucket's LLR is quantized to integer MICRO-nats
    * (round(llr·1e6)) BEFORE the per-doc sum, so the distributed sum is
    * exact integer arithmetic — no FP-summation-order noise, bit-stable
    * across engines and partitionings (a flip needs a bucket's llr·1e6
    * within ~1e-11 of a .5 rounding boundary). Returns
    * (id, n_tokens, weight_micro); rank / Gumbel-top-k on weight_micro is
    * the actual selection step. Token-less docs drop out (no features →
    * no weight), as in [[vocabCoverage]].
    *
    * Scale shape: ONE tokenize+bucket pass over the source feeds both the
    * source bucket counts and the scoring join (lazy localCheckpoint —
    * the subtree-duplication trap); both count aggregates partial-combine
    * map-side to ≤ `buckets` rows per upstream partition; the
    * ≤`buckets`-row LLR table BROADCASTS back onto the token stream, so
    * the only full shuffle is the per-doc weight sum. The target corpus
    * is benchmark/domain-sized by contract but is never collected — only
    * its `buckets`-row count profile is.
    */
  def dsirWeights(source: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(buckets >= 2, "buckets >= 2")
    val srcToks = source
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
      .select(col("id"), (hash60(col("tok")) % buckets).as("b"))
      .localCheckpoint(eager = false) // feeds source counts AND scoring
    srcToks.join(broadcast(dsirLlr(srcToks, target, textCol, buckets)), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("llr_micro")).as("weight_micro"))
  }

  /** The `buckets`-row DSIR model on its own — per-bucket micro-nat LLRs,
    * TOTAL over the bucket domain (never-seen buckets carry their
    * smoothing-floor LLR, so a scoring join can be inner without dropping
    * tokens). Train once, persist/broadcast anywhere — the static side of
    * streaming DSIR scoring; [[dsirWeights]] builds the same table but
    * shares its source tokenize pass with the scoring join.
    */
  def dsirModel(source: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame, textCol: String,
      buckets: Int = 1024): org.apache.spark.sql.DataFrame =
    dsirLlr(source.select(explode(tokens(col(textCol))).as("tok"))
      .select((hash60(col("tok")) % buckets).as("b")), target, textCol, buckets)

  private def dsirLlr(srcB: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame, textCol: String,
      buckets: Int): org.apache.spark.sql.DataFrame = {
    val tgtCnt = target
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy((hash60(col("tok")) % buckets).as("b"))
      .agg(count(lit(1)).as("tc"))
    val srcCnt = srcB.groupBy(col("b")).agg(count(lit(1)).as("sc"))
    // complete the bucket domain so the model is TOTAL (buckets rows)
    val cnts = target.sparkSession.range(buckets).select(col("id").as("b"))
      .join(tgtCnt, Seq("b"), "left").join(srcCnt, Seq("b"), "left")
      .select(col("b"), coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("sc"), lit(0L)).as("sc"))
      .localCheckpoint(eager = false) // feeds totals AND the LLR table
    val totals = cnts.agg(sum(col("tc")).as("tt"), sum(col("sc")).as("st"))
    cnts.crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((col("tc") + 1).cast("double") /
                   (col("tt") + buckets).cast("double")) -
               log((col("sc") + 1).cast("double") /
                   (col("st") + buckets).cast("double"))) * 1e6)
          .cast("long").as("llr_micro"))
  }

  /** DSIR selection step — Gumbel-top-k importance resampling over
    * [[dsirWeights]] (sampling WITHOUT replacement ∝ exp(weight) is
    * exactly "add independent Gumbel noise to each log-weight and take
    * the top k" — the Gumbel-max trick, so one distributed TakeOrdered
    * replaces sequential sampling). The noise is derandomized:
    * u = (hash60(seed‖id)+0.5)/2^60 ∈ (0,1), g = −ln(−ln(u)), and g is
    * quantized to integer micro-nats like the weights, so the selection
    * key (weight_micro + g_micro) is a BIGINT — bit-stable across
    * engines, partitionings and reruns. orderBy+limit compiles to
    * TakeOrderedAndProject (per-partition heaps, merge of k×partitions
    * rows at the driver — no global sort at any corpus size). Returns the
    * k selected docs as (pick ∈ [1,k], id, key_micro), pick ordered by
    * (key desc, id).
    */
  def dsirResample(source: org.apache.spark.sql.DataFrame,
      target: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 1024,
      seed: String = "dsir"): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k >= 1")
    val u = (hash60(concat(lit(seed + "|"), col("id").cast("string")))
      .cast("double") + 0.5) / math.pow(2.0, 60)
    val keyed = dsirWeights(source, target, idCol, textCol, buckets)
      .withColumn("key_micro",
        col("weight_micro") + round(-log(-log(u)) * 1e6).cast("long"))
      .orderBy(col("key_micro").desc, col("id"))
      .limit(k)
    keyed.select(
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("key_micro").desc, col("id"))).cast("long").as("pick"),
      col("id"), col("key_micro"))
  }

  /** Per-item race keys for [[weightedSample]] — Efraimidis–Schwenk
    * (2006) weighted sampling WITHOUT replacement ∝ w, in its
    * exponential-race form: item i draws E_i = −ln(u_i)/w_i and the k
    * SMALLEST win (equivalently the classic u^(1/w) top-k; P(i wins the
    * race) = w_i/Σw — the min of independent Exp(w_i) clocks). The race
    * is derandomized and integerized the way every sampling gate here
    * is: u = (hash60(seed‖id)+0.5)/2^60, the log micro-quantized ONCE
    * (l_micro = round(1e6·(−ln u)) — the [[dsirResample]] Gumbel-key
    * move), then the division is pure integer arithmetic:
    * key = l_micro·1e9 DIV w. No float ever crosses an engine boundary
    * un-quantized, so the selected set and its order are bit-stable
    * across engines, partitionings and reruns. (An exact integer ln is
    * impossible; quantize-then-integer-divide is the p95 rational-α
    * pattern applied to the log — the one float step is the same one
    * the gated DSIR key already takes.) Bounds: l_micro ≤ ~4.3e7
    * (−ln(0.5/2^60) ≈ 42.2), ×1e9 ≈ 4.3e16 < 2^63 — no overflow at any
    * weight. Weights must be ≥ 1 (loud guard: a zero weight would make
    * DIV by w undefined-by-zero on one engine and an error on the
    * other). Residual boundary risk (shared with every dsirResample-
    * family gate): JVM Math.log and DuckDB's libm ln are each ~1-ulp
    * accurate, so a −ln(u) landing within ~1e-11 of a .5·1e-6 rounding
    * boundary COULD quantize to adjacent micros on the two engines and
    * flip a key; with hash-derandomized u the event is data-independent
    * and has never fired across the gated corpora, but strict
    * cross-engine stability at adversarial inputs would need an
    * integer-only ln approximation (documented, not implemented).
    */
  /** The ONE race-key derivation every weighted sampler shares: u from
    * hash60 of the caller's tag, −ln u micro-quantized once, then pure
    * integer division by the `w` column. Appends `key` (and the
    * intermediate `lmicro`).
    */
  private def withRaceKey(df: org.apache.spark.sql.DataFrame,
      tag: Column): org.apache.spark.sql.DataFrame =
    df.withColumn("lmicro",
        round(-log((hash60(tag).cast("double") + 0.5) / math.pow(2.0, 60))
          * 1e6).cast("long"))
      .withColumn("key", expr("lmicro * 1000000000L DIV w"))

  /** Loud ≥1 weight guard shared by the samplers (a zero weight would
    * make DIV-by-w engine-divergent instead of an error).
    */
  private def positiveWeights(df: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    df.filter(expr(
      "assert_true(w >= 1, 'weightedSample: weights must be >= 1 " +
        "(shift or clamp zero/negative weights before sampling)') IS NULL"))

  def weightedSampleKeys(df: org.apache.spark.sql.DataFrame, idCol: String,
      weightCol: String, seed: String = "wswr",
      carry: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    val base = positiveWeights(df.select((col(idCol).as("id") +:
      col(weightCol).cast("long").as("w") +: carry.map(col)): _*))
    withRaceKey(base, concat(lit(seed + "|"), col("id").cast("string")))
      .select((col("id") +: col("w") +: col("key") +: carry.map(col)): _*)
  }

  /** Weighted sampling without replacement — the k winners of the
    * [[weightedSampleKeys]] race, ordered (key asc, id asc — the id
    * tie-break makes equal-key picks deterministic). orderBy+limit
    * compiles to TakeOrderedAndProject (per-partition k-heaps, driver
    * merges k×partitions rows — no global sort at any corpus size).
    * Returns (pick ∈ [1,k], id, w, key).
    */
  def weightedSample(df: org.apache.spark.sql.DataFrame, idCol: String,
      weightCol: String, k: Int, seed: String = "wswr"):
      org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k >= 1")
    assignSamplePicks(
      weightedSampleKeys(df, idCol, weightCol, seed)
        .orderBy(col("key"), col("id"))
        .limit(k))
  }

  /** Pick assignment over an admitted race set — the ONE ordering
    * definition [[weightedSample]] and the streaming gate's readout
    * share: (key asc, id asc), pick ∈ [1, n]. Input contract: already
    * bounded (≤ k rows) — the single-partition window is the readout of
    * a tiny winner set, never a corpus-wide sort.
    */
  def assignSamplePicks(keyed: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    keyed.select(
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("key"), col("id"))).cast("long").as("pick"),
      col("id"), col("w"), col("key"))

  /** Admission-threshold artifact for the STREAMING weighted-sample
    * gate ([[graft.streaming.PipelineStream.weightedSampleGate]]): the
    * k-th winner's (key, id) from the standing batch race. The race is
    * hash-derandomized, so membership in the batch top-k is exactly the
    * stateless predicate (key, id) ≤ (t_key, t_id) lexicographically —
    * the same one-artifact-then-gate move as the p88 temperature rates
    * and p130 MAD thresholds. One row; a corpus smaller than k yields
    * its maximum (the gate then admits everything, which IS the batch
    * sample).
    */
  def weightedSampleThreshold(df: org.apache.spark.sql.DataFrame,
      idCol: String, weightCol: String, k: Int, seed: String = "wswr"):
      org.apache.spark.sql.DataFrame =
    weightedSample(df, idCol, weightCol, k, seed)
      .orderBy(col("pick").desc)
      .limit(1)
      .select(col("key").as("t_key"), col("id").as("t_id"))

  /** Per-GROUP Efraimidis–Schwenk sampling without replacement — k
    * winners per group ∝ weight (stratified corpus sampling: "50 docs
    * per language, long docs favored"). SAME race keys as
    * [[weightedSample]] (one key definition, shared seed namespace);
    * the per-group top-k is a rank-filtered window that Catalyst
    * executes as WindowGroupLimit (map-side per-group k-heaps before
    * the shuffle — the p176 heavy-hitters shape), so a whale group
    * costs k state, never a group-wide sort buffer. Returns
    * (grp, pick ∈ [1, k], id, w, key), deterministic ((key, id) order).
    */
  def weightedSampleByGroup(df: org.apache.spark.sql.DataFrame,
      idCol: String, groupCol: String, weightCol: String, k: Int,
      seed: String = "wswr"): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k >= 1")
    weightedSampleKeys(df, idCol, weightCol, seed, carry = Seq(groupCol))
      .withColumn("pick",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol)).orderBy(col("key"), col("id")))
          .cast("long"))
      .filter(col("pick") <= k)
      .select(col(groupCol).as("grp"), col("pick"), col("id"), col("w"),
        col("key"))
  }

  /** Grouped sibling of [[assignSamplePicks]] — the shared readout
    * ordering for a per-group admitted set (expects a `grp` column;
    * input bounded at ≤ k rows per group).
    */
  def assignGroupSamplePicks(keyed: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame =
    keyed.select(col("grp"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("key"), col("id")))
        .cast("long").as("pick"),
      col("id"), col("w"), col("key"))

  /** Weighted sampling WITH replacement — `nDraws` INDEPENDENT
    * derandomized races (multinomial ∝ w: the same document may win
    * several draws — epoch/mixture draws, bootstrap resamples). Draw
    * d's winner is argmin over items of the race key tagged
    * (seed, d, id); independence across draws comes from d entering
    * the hash, and per draw P(i wins) = w_i/Σw is the same
    * min-of-Exp(w) law [[weightedSampleKeys]] documents. Shape: the
    * per-item key fan-out is ×nDraws BEFORE the aggregate, but the
    * min-struct aggregate collapses every partition to nDraws rows
    * map-side — CPU amplification only, never shuffle amplification;
    * bounded-draw contract enforced loudly. Returns
    * (draw ∈ [1, nDraws], id, w, key), deterministic.
    */
  def weightedDraws(df: org.apache.spark.sql.DataFrame, idCol: String,
      weightCol: String, nDraws: Int, seed: String = "wswr"):
      org.apache.spark.sql.DataFrame = {
    require(nDraws >= 1 && nDraws <= 100000,
      s"nDraws $nDraws outside [1, 100000] — the per-row fan-out is " +
        "×nDraws; larger draw counts want a different plan")
    val base = positiveWeights(df.select(col(idCol).as("id"),
      col(weightCol).cast("long").as("w")))
      .select(col("id"), col("w"),
        explode(expr(s"sequence(1L, ${nDraws}L)")).as("draw"))
    withRaceKey(base, concat(lit(seed + "|"), col("draw").cast("string"),
        lit("|"), col("id").cast("string")))
      .groupBy(col("draw"))
      .agg(min(struct(col("key"), col("id"), col("w"))).as("m"))
      .select(col("draw"), col("m.id").as("id"), col("m.w").as("w"),
        col("m.key").as("key"))
  }

  /** Per-group admission thresholds for the STREAMING grouped-sample
    * gate: each group's k-th winner (grp, t_key, t_id) — the grouped
    * sibling of [[weightedSampleThreshold]] (≤ one row per group; a
    * group smaller than k thresholds at its maximum, admitting all of
    * it, which is that group's whole batch sample).
    */
  def weightedSampleGroupThresholds(df: org.apache.spark.sql.DataFrame,
      idCol: String, groupCol: String, weightCol: String, k: Int,
      seed: String = "wswr"): org.apache.spark.sql.DataFrame =
    weightedSampleByGroup(df, idCol, groupCol, weightCol, k, seed)
      .withColumn("last",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp")).orderBy(col("pick").desc)))
      .filter(col("last") === 1)
      .select(col("grp"), col("key").as("t_key"), col("id").as("t_id"))

  /** Blocklist safety signals (the C4 "bad words" pass — Raffel et al.
    * 2020 §2.2 drop documents containing any listed word; shipping the
    * counts instead of a hard drop lets the caller pick drop vs downweight
    * vs route-to-review): per-doc count of token OCCURRENCES whose exact
    * lowercased form is in `blockWords`. Pure expression projection — the
    * list inlines as an array literal into whole-stage codegen, so there
    * is NO join, NO shuffle, and the cost is one array-contains per token
    * at any corpus size (blocklists are hundreds of words by contract;
    * for 100k-word lists switch to a broadcast join on the token hash).
    * Returns (id, n_tokens, n_flagged, flagged_permille) — a token-less
    * doc reports 0 tokens / 0 permille.
    */
  def blocklistSignals(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, blockWords: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(blockWords.nonEmpty, "empty blocklist")
    val list = array(blockWords.map(w => lit(w.toLowerCase)): _*)
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"))
      .select(col("id"),
        size(col("_toks")).cast("long").as("n_tokens"),
        size(filter(col("_toks"), t => array_contains(list, t)))
          .cast("long").as("n_flagged"))
      .withColumn("flagged_permille",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("n_flagged * 1000 DIV n_tokens")))
  }

  /** Gopher quality rules (Rae et al. 2021, Appendix A1.1 — the published
    * rule bundle MassiveWeb shipped and later web corpora reuse): word
    * count bounds, mean word length bounds, symbol-to-word ratio
    * ("#"/"..." tokens), bullet-start and ellipsis-end line fractions,
    * alphabetic-word fraction, and the ≥2-required-stopwords rule. Every
    * signal is an exact integer (counts / permille ratios via integer
    * division), so the cross-engine gate is bit-stable, and `keep` is the
    * conjunction at the paper's thresholds. Expression-only projection —
    * NO join, NO shuffle at any corpus size (the per-token filter lambdas
    * are interpreted HOFs, fine in a projection; the char total uses
    * codegen'd array_join instead of an aggregate lambda). `lineDelim` is
    * a literal line separator (corpora that kept real newlines pass "\n").
    * Returns (id, n_words, mean_word_len_permille, symbol_word_permille,
    * bullet_line_permille, ellipsis_line_permille, alpha_word_permille,
    * n_required_stopwords, keep∈{0,1}).
    */
  /** The Gopher A1.1 bundle's constants — ONE definition shared by the
    * lineage path ([[gopherRules]]) and the fused audit
    * ([[qualityAuditFused]]) so a tuning change cannot desynchronize them.
    */
  private[pipeline] val gopherRequired: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")
  private[pipeline] object GopherBounds {
    val minWords = 50L; val maxWords = 100000L
    val minMeanWordLenPermille = 3000L; val maxMeanWordLenPermille = 10000L
    val maxSymbolPermille = 100L; val maxBulletPermille = 900L
    val maxEllipsisPermille = 300L; val minAlphaPermille = 800L
    val minRequiredStopwords = 2L
  }

  def gopherRules(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, lineDelim: String = "\n"): org.apache.spark.sql.DataFrame = {
    val required = gopherRequired
    df.select(col(idCol).as("id"), tokens(col(textCol)).as("_toks"),
        transform(split(col(textCol),
          java.util.regex.Pattern.quote(lineDelim)), l => trim(l)).as("_lines"))
      .select(col("id"),
        size(col("_toks")).cast("long").as("n_words"),
        length(array_join(col("_toks"), "")).cast("long").as("_chars"),
        size(filter(col("_toks"), t =>
          t.contains("#") || t.contains("..."))).cast("long").as("_sym"),
        size(filter(col("_lines"), l =>
          l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
          .cast("long").as("_bul"),
        size(filter(col("_lines"), l => l.endsWith("..."))).cast("long").as("_ell"),
        size(col("_lines")).cast("long").as("_nl"),
        size(filter(col("_toks"), t => t.rlike("[a-z]"))).cast("long").as("_alpha"),
        size(array_intersect(array_distinct(col("_toks")),
          array(required.map(lit(_)): _*))).cast("long").as("n_required_stopwords"))
      .select(col("id"), col("n_words"),
        when(col("n_words") === 0, lit(0L))
          .otherwise(expr("_chars * 1000 DIV n_words")).as("mean_word_len_permille"),
        when(col("n_words") === 0, lit(0L))
          .otherwise(expr("_sym * 1000 DIV n_words")).as("symbol_word_permille"),
        when(col("_nl") === 0, lit(0L))
          .otherwise(expr("_bul * 1000 DIV _nl")).as("bullet_line_permille"),
        when(col("_nl") === 0, lit(0L))
          .otherwise(expr("_ell * 1000 DIV _nl")).as("ellipsis_line_permille"),
        when(col("n_words") === 0, lit(0L))
          .otherwise(expr("_alpha * 1000 DIV n_words")).as("alpha_word_permille"),
        col("n_required_stopwords"))
      .withColumn("keep",
        (col("n_words") >= GopherBounds.minWords &&
          col("n_words") <= GopherBounds.maxWords &&
          col("mean_word_len_permille") >= GopherBounds.minMeanWordLenPermille &&
          col("mean_word_len_permille") <= GopherBounds.maxMeanWordLenPermille &&
          col("symbol_word_permille") <= GopherBounds.maxSymbolPermille &&
          col("bullet_line_permille") <= GopherBounds.maxBulletPermille &&
          col("ellipsis_line_permille") <= GopherBounds.maxEllipsisPermille &&
          col("alpha_word_permille") >= GopherBounds.minAlphaPermille &&
          col("n_required_stopwords") >= GopherBounds.minRequiredStopwords).cast("long"))
  }

  /** Canonical URL form (the RefinedWeb/CCNet URL-dedup key — crawls see
    * the same page under tracking-param, port, fragment, case and
    * trailing-slash variants): lowercase the scheme+authority, drop the
    * default :443/:80 port and a leading www., strip the fragment, remove
    * utm_* tracking params, and strip a trailing path slash. Pure chained
    * regexp/replace expression (RE2-compatible, NO replacement
    * backreferences — Spark says `$1` where DuckDB says `\\1`, so
    * portable canonicalization must avoid them); rides the projection,
    * nothing to shuffle. Query-param ORDER is preserved (sorting params
    * can change semantics; out of scope by design).
    */
  def canonicalizeUrl(url: Column): Column = {
    // fragment first: nothing after it matters
    val noFrag = regexp_replace(url, lit("#.*"), lit(""))
    // lowercase ONLY scheme://host[:port] — path and query are case-significant
    val auth = lower(regexp_extract(noFrag, "^[^/]*//[^/?#]*", 0))
    val rest = regexp_replace(noFrag, lit("^[^/]*//[^/?#]*"), lit(""))
    // default port is SCHEME-relative: https:80 / http:443 are real
    // distinctions and must survive
    val authNoPort = when(auth.startsWith("https://"),
        regexp_replace(auth, lit(":443$"), lit("")))
      .when(auth.startsWith("http://"),
        regexp_replace(auth, lit(":80$"), lit("")))
      .otherwise(auth)
    val authNoWww = org.apache.spark.sql.functions.replace(
      authNoPort, lit("://www."), lit("://"))
    // split path from query BEFORE touching either: a query VALUE may
    // contain '/?' or end in '/', and those are semantics, not noise
    val path0 = regexp_extract(rest, "^[^?]*", 0)
    val query0 = regexp_replace(rest, lit("^[^?]*"), lit(""))
    // utm params: interior (&utm_x=..), leading-with-follower (?utm_x=..&), lone (?utm_x=..$)
    val q1 = regexp_replace(query0, lit("&utm_[^&#]*"), lit(""))
    val q2 = regexp_replace(q1, lit("\\?utm_[^&#]*&"), lit("?"))
    val q3 = regexp_replace(q2, lit("\\?utm_[^&#]*$"), lit(""))
    // trailing slash: PATH-only (the query keeps its bytes)
    concat(authNoWww, regexp_replace(path0, lit("/$"), lit("")), q3)
  }
}
