package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for training-data pipelines. Everything is
  * built from codegen'd `functions._` (no UDFs), so the whole pipeline
  * stays inside WholeStageCodegen and scales linearly with executors —
  * each metric is a per-row map-side expression with no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenization (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram array over a pre-split token array — the ONE shared
    * convention for every gram-keyed operator and oracle: documents
    * shorter than n contribute their whole text as a single gram;
    * callers filter NULL/empty text first. */
  def wordGrams(toks: Column, text: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array(text))

  /** Mean token length, exploiting single-space separation:
    * (chars - (n-1)) / n.
    */
  def avgTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - n + 1).cast("double") / n.cast("double")
  }

  /** Ratio of punctuation characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", "")).cast("double") /
      length(text).cast("double")

  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** Stopword hits for one language list. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t =>
      words.map(w => t === w).reduce(_ || _)))

  def stopwordRatio(text: Column, words: Seq[String] = langStopwords.head._2): Column =
    stopwordHits(text, words).cast("double") / tokenCount(text).cast("double")

  /** N-gram-free language-ID heuristic: argmax of per-language stopword
    * hit counts with a deterministic tie order (first list wins), "unk"
    * when nothing matches. A real n-gram profile model slots in here
    * later; the mechanism (per-row scoring, no shuffle) is the point.
    */
  def langId(text: Column): Column = {
    val scored = langStopwords.map { case (lang, ws) => lang -> stopwordHits(text, ws) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("unk"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Composite quality score in [0,1]: favors mid-length docs with a sane
    * token-length profile — the usual cheap pre-filter before expensive
    * model-based scoring.
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val lenScore = least(n / 100.0, lit(1.0))
    val wordScore = when(avgTokenLen(text).between(3.0, 8.0), 1.0).otherwise(0.5)
    val punctScore = lit(1.0) - least(punctRatio(text) * 10.0, lit(1.0))
    (lenScore * 0.4 + wordScore * 0.4 + punctScore * 0.2)
  }

  /** BPE-ish subword-aware token count: a simplified GPT-2-style pattern
    * (space-prefixed letter runs, digit runs, punctuation singletons).
    * Kept to constructs with identical semantics in Java regex and RE2 so
    * the DuckDB oracle matches.
    */
  val bpePattern = " ?[a-z]+| ?[0-9]+|[^a-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Order-sensitive 64-bit document fingerprint: chained xxhash64 over
    * tokens (hash of previous state + token). Avoids multiplicative
    * rolling hashes entirely — Spark 4's ANSI mode makes long wraparound
    * an error, and hash chaining has the same streaming shape with better
    * collision behavior.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => xxhash64(concat(acc.cast("string"), lit("|"), t)))

  /** Deterministic hash-based sampling predicate: keep a row iff the
    * first hex digit of md5(key) falls in the first `sixteenths` of the
    * hex alphabet — a keep-rate of sixteenths/16. THE way to sample at
    * 100 TB: reproducible across runs, engines and partitionings (md5 is
    * engine-portable, unlike xxhash64/rand), trivially pushed into any
    * scan, and stable under re-partitioning, so a training corpus sample
    * is re-derivable forever from the same keys.
    */
  def hashSampled(key: Column, sixteenths: Int): Column = {
    require(sixteenths >= 1 && sixteenths <= 16,
      s"sixteenths must be in 1..16, got $sixteenths")
    // 16/16 must keep everything; toHexString(16) is the TWO-char "10",
    // which single hex digits '2'..'f' compare above lexicographically
    if (sixteenths == 16) lit(true)
    else substring(md5(key.cast("string")), 1, 1) <
      lit(java.lang.Integer.toHexString(sixteenths))
  }

  /** Stratified variant of [[hashSampled]]: the keep rate (in sixteenths)
    * comes from a per-row column, so different strata (languages, sources,
    * quality buckets) sample at different rates in ONE map-side pass —
    * the standard corpus-mixing move (upsample rare languages, downsample
    * boilerplate-heavy sources) with the same engine-portable md5
    * determinism. Rates outside 1..15 mean keep-all (>=16) / drop-all (<=0).
    */
  def hashSampledBy(key: Column, sixteenths: Column): Column =
    when(sixteenths >= 16, lit(true))
      .when(sixteenths <= 0, lit(false))
      .otherwise(substring(md5(key.cast("string")), 1, 1) <
        lower(conv(sixteenths.cast("string"), 10, 16)))

  /** Overlapping token windows (size `size`, step `stride`) — the
    * context-window chunking pass of every embedding/pretraining
    * pipeline. Emits (chunk_idx, n_chunk_tokens, chunk) per input row.
    * The final window may be shorter than `size` (the document tail is
    * data too), but a window is only emitted if it covers at least one
    * token the previous window did not — start positions stop at
    * `n - size + stride` (clamped to [1, n]), so no chunk is a pure
    * suffix of its predecessor (duplicate content is poison in a dedup
    * pipeline). Pure codegen built-ins: split once, then
    * slice/array_join over a generated start sequence — no UDF, no
    * shuffle; chunking is embarrassingly map-side at any scale.
    */
  def chunked(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      size: Int = 8,
      stride: Int = 4): org.apache.spark.sql.DataFrame = {
    require(size >= 1 && stride >= 1, s"size/stride must be >= 1")
    // Collision-resistant internals: posexplode's outputs are aliased and
    // the token array gets a __chunk_ prefix, so an input named `toks`,
    // `pos` or `col` cannot shadow them (same convention as packedBins).
    val n = org.apache.spark.sql.functions.size(col("__chunk_toks"))
    val lastStart = greatest(least(n - size + stride, n), lit(1))
    df.select(col(idCol), split(col(textCol), " ").as("__chunk_toks"))
      .select(col(idCol), col("__chunk_toks"),
        posexplode(sequence(lit(1), lastStart, lit(stride)))
          .as(Seq("__chunk_pos", "__chunk_start")))
      .select(col(idCol),
        col("__chunk_pos").cast("int").as("chunk_idx"),
        org.apache.spark.sql.functions.size(
          slice(col("__chunk_toks"), col("__chunk_start"), lit(size)))
          .as("n_chunk_tokens"),
        array_join(slice(col("__chunk_toks"), col("__chunk_start"), lit(size)), " ")
          .as("chunk"))
  }

  /** Duplicated n-gram coverage — the corpus-level substring-duplication
    * signal (the scalable cousin of exact-substring dedup a la "Deduplicating
    * Training Data Makes Language Models Better"): for each document, the
    * fraction of its distinct `n`-gram windows that also occur in at
    * least one OTHER document. High coverage marks boilerplate,
    * templates and memorization risk that pairwise Jaccard (p07) misses
    * when no single pair clears its threshold. Documents shorter than
    * `n` tokens contribute their whole text as one gram (same floor as
    * the shingle dedup family). NULL/empty documents are dropped up
    * front (both engines then agree on the NULL edge — a NULL gram row
    * survives Spark's groupBy but not a SQL JOIN USING (gram)).
    *
    * Shape at 100 TB: explode + per-doc distinct (map-side heavy), then
    * per-gram document frequency via `groupBy(__gram).agg(count)` —
    * partial aggregation combines map-side, so a boilerplate gram
    * present in 10^9 documents reduces to per-partition partial counts,
    * never a single-task posting list (the window-partitioned-by-gram
    * alternative funnels exactly that way). All the coverage ratio
    * needs per gram is the BOOLEAN df > 1, so the join-back carries one
    * bit per distinct gram; AQE skew-split handles the hot-gram join
    * side. The final per-doc rollup shuffles only (id, counts). An
    * inverted index, never a pairwise product, never a per-key funnel.
    */
  def dupNgramCoverage(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): org.apache.spark.sql.DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toks = tokens(col(textCol))
    // r15: fan-out before the 8-gram string build (guide 2.5; no-op at
    // scale) — the per-row slice/array_join work was a serial stage
    val grams = graft.plans.FanOut.byKey(
        df.filter(col(textCol).isNotNull && col(textCol) =!= ""),
        col(idCol))
      .select(col(idCol),
        explode(wordGrams(toks, col(textCol), n)).as("__gram"))
      .distinct()
    val gramDf = grams.groupBy(col("__gram"))
      .agg((count(lit(1)) > 1).as("__shared"))
    grams.join(gramDf, Seq("__gram"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__shared"), 1L).otherwise(0L)).as("n_shared"))
      .select(col(idCol), col("n_grams"), col("n_shared"),
        round(col("n_shared").cast("double") / col("n_grams"), 6)
          .as("dup_coverage"))
  }

  /** Duplicated-substring SPANS — the positional refinement of
    * [[dupNgramCoverage]] and the Spark-native shape of exact substring
    * dedup ("Deduplicating Training Data Makes Language Models Better"):
    * instead of one coverage ratio, report per document the MAXIMAL
    * duplicated token spans — how many disjoint runs, how many tokens
    * they cover, and the covered fraction — so a downstream pass can cut
    * the spans out rather than drop whole documents. A position is
    * duplicated when its `k`-token window occurs more than once in the
    * corpus (across documents OR repeated within one — within-doc
    * repetition is duplication too); overlapping/adjacent duplicated
    * windows merge into one span (positions `p1 < p2` merge when
    * `p2 - p1 <= k`). Documents shorter than `k` tokens report zero
    * spans: a sub-`k` run is below the match floor by definition.
    *
    * Shape at 100 TB: positional k-grams explode map-side; the
    * occurrence count is ONE gram-keyed partial aggregation whose
    * join-back carries a single bit (never a posting list — a
    * boilerplate gram shared by 10^9 documents reduces to partial
    * counts, and AQE skew-split covers the hot join key); the span
    * merge is a gaps-and-islands window PARTITIONED BY document, so its
    * partitions are bounded by document length, never corpus size.
    */
  /** (id, __ts token array) for non-empty docs — shared front of the
    * positional-gram family.
    */
  private def tokenized(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    // r15: fan a too-few-splits scan out before the per-row gram work
    // (single-file local input = ONE task; no-op at scale — guide 2.5)
    graft.plans.FanOut.byKey(
        df.filter(col(textCol).isNotNull && col(textCol) =!= ""),
        col(idCol))
      .withColumn("__ts", tokens(col(textCol)))

  /** Positional k-grams (…, __pos 1-based, __gram) for docs of >= k
    * tokens. `extraCols` of `base` ride along map-side.
    */
  private def positionalGrams(
      base: org.apache.spark.sql.DataFrame,
      idCol: String,
      k: Int,
      extraCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame =
    base.filter(size(col("__ts")) >= k)
      .select(col(idCol) +: extraCols.map(col) :+ col("__ts") :+
        posexplode(transform(sequence(lit(1), size(col("__ts")) - (k - 1)),
          i => array_join(slice(col("__ts"), i, lit(k)), " ")))
          .as(Seq("__i", "__gram")): _*)
      .select(col(idCol) +: extraCols.map(col) :+
        (col("__i") + 1).cast("long").as("__pos") :+ col("__gram"): _*)

  /** Gaps-and-islands merge of flagged positions into maximal spans
    * [__s, __e] (windows [p, p+k-1]; p2 joins p1 when p2 - p1 <= k).
    * The window partitions by document — bounded by doc length.
    */
  private def mergeSpans(
      flaggedPos: org.apache.spark.sql.DataFrame,
      idCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    flaggedPos
      .withColumn("__prev", lag(col("__pos"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull || col("__pos") - col("__prev") > k, 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(w))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__pos")).as("__s"), (max(col("__pos")) + (k - 1)).as("__e"))
  }

  /** Shared front of the report/apply pair ([[dupSpans]] /
    * [[stripDupSpans]]): (base tokens, corpus-duplicated window start
    * positions). Single-sourced so the two can never disagree on what
    * counts as duplicated.
    */
  private def dupPositions(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(k >= 1, "k must be >= 1")
    val base = tokenized(df, idCol, textCol)
      .select(col(idCol), col("__ts"))
    val pos = positionalGrams(base, idCol, k)
    val gramDup = pos.groupBy(col("__gram"))
      .agg((count(lit(1)) > 1).as("__dup"))
    val dupPos = pos.join(gramDup, Seq("__gram"))
      .filter(col("__dup")).select(col(idCol), col("__pos"))
    (base, dupPos)
  }

  def dupSpans(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): org.apache.spark.sql.DataFrame = {
    val (base, dupPos) = dupPositions(df, idCol, textCol, k)
    val perDoc = mergeSpans(dupPos, idCol, k).groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("__e") - col("__s") + 1).as("dup_tokens"))
    base.select(col(idCol), size(col("__ts")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") /
          col("n_tokens"), 6).as("dup_token_fraction"))
  }

  /** Boilerplate STRIP — the removal pass [[dupSpans]] only reports:
    * rebuild each document with every corpus-duplicated token span cut
    * out (license headers, nav bars, repeated templates), keeping the
    * surviving tokens in their original order. The covered-position
    * rule is exactly [[dupSpans]]'s — a position is cut when some
    * `k`-token window containing it occurs more than once in the corpus
    * (across documents or repeated within one) — so `n_removed` here
    * equals `dup_tokens` there and the two operators stay consistent as
    * a report/apply pair. Documents shorter than `k` tokens pass
    * through unchanged; NULL/empty documents are dropped up front (the
    * p38 discipline — both engines must agree on the NULL edge).
    *
    * Scale shape: gram duplication is ONE gram-keyed partial
    * aggregation whose join-back carries a single bit (never a posting
    * list); flagged positions merge into maximal spans with a window
    * partitioned by document (bounded by doc length, never corpus
    * size); spans collapse to one array row per document (at most
    * len/k spans), and the rebuild is a per-row codegen'd
    * higher-order expression — token x span tests stay inside
    * WholeStageCodegen with no further shuffle. A boilerplate gram
    * shared by 10^9 documents costs partial counts plus one bit per
    * holder, exactly like p38/p45.
    */
  def stripDupSpans(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8): org.apache.spark.sql.DataFrame = {
    val (base, dupPos) = dupPositions(df, idCol, textCol, k)
    // Maximal spans are disjoint by construction (mergeSpans splits
    // islands on gaps > k, and consecutive starts <= k apart leave no
    // uncovered hole), so per-token membership needs no dedup.
    val spans = mergeSpans(dupPos, idCol, k)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("__s"), col("__e"))).as("__spans"))
    val withSpans = base.join(spans, Seq(idCol), "left")
    val kept = when(col("__spans").isNull, col("__ts"))
      .otherwise(filter(
        transform(col("__ts"), (t, i) =>
          when(!exists(col("__spans"), sp =>
            sp.getField("__s") <= i + 1 && i + 1 <= sp.getField("__e")),
            t)),
        x => x.isNotNull))
    withSpans.select(col(idCol),
      size(col("__ts")).cast("long").as("n_tokens"),
      (size(col("__ts")) - size(kept)).cast("long").as("n_removed"),
      array_join(kept, " ").as("clean_text"))
  }

  /** Cross-source LEAK SPANS — contamination depth, the positional
    * refinement of the p39 leak matrix: per document, the LONGEST
    * contiguous token run whose `k`-gram windows all occur in at least
    * one OTHER source. A 200-token verbatim benchmark answer inside a
    * training shard scores 200 here while the p39 count can't tell it
    * from 200 scattered boilerplate grams — span depth is what decides
    * "remove the document" vs "cut the span". A position is leaky iff
    * its gram occurs in >= 2 distinct sources (if it does, every holder
    * has a foreign witness; if not, none does — so one bit per gram
    * covers every document uniformly).
    *
    * Scale shape: the source-distinct count is TWO stacked partial
    * aggregations — (gram, source) then gram — so a boilerplate gram
    * reduces map-side and its join-back carries one bit (the p38/p45
    * discipline); the span merge windows by document only.
    */
  def crossSourceLeakSpans(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      srcCol: String,
      textCol: String,
      k: Int = 8,
      maxDocTokens: Long = 1L << 20): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k must be >= 1")
    // persisted: THREE consumers read the tokenized frame — the
    // violation witness below, the positional-gram pass, and the final
    // per-doc length projection. Unpersisted, each re-runs the
    // tokenizer over the whole corpus (measured +1.3s at sf0.1 when
    // the round-11 witness guard added the third pass). Lazy cache
    // contract: Verify/Bench clearCache per query (CacheHygieneSpec).
    val base0 = tokenized(df, idCol, textCol)
      .select(col(idCol), col(srcCol), col("__ts"))
      .persist()
    // The span merge windows PARTITION BY document — bounded by doc
    // length, which the prose calls fine. Make the bound a contract: a
    // pathological unsplit document (a concatenated dump, a 10 GB
    // crawl artifact) would funnel its whole positional-gram list
    // through one window partition, so past `maxDocTokens` tokens the
    // guard raises with the remedy named (budget = 0: ANY violator).
    val base = graft.operators.ScaleGuards.witnessGuard(
      base0, base0.filter(size(col("__ts")) > maxDocTokens),
      what = s"crossSourceLeakSpans($idCol)", budget = 0L,
      remedy = s"split documents past $maxDocTokens tokens before " +
        "span analysis (the per-doc span-merge window is " +
        "doc-length-bounded; pre-chunk the outliers and merge spans " +
        "across chunk seams downstream)")
    val pos = positionalGrams(base, idCol, k, extraCols = Seq(srcCol))
    val gramLeak = pos.select(col("__gram"), col(srcCol)).distinct()
      .groupBy(col("__gram"))
      .agg((count(lit(1)) >= 2).as("__leak"))
    val leakPos = pos.join(gramLeak, Seq("__gram"))
      .filter(col("__leak")).select(col(idCol), col("__pos"))
    val perDoc = mergeSpans(leakPos, idCol, k).groupBy(col(idCol))
      .agg(max(col("__e") - col("__s") + 1).as("max_leak_span"))
    base.select(col(idCol), col(srcCol),
        size(col("__ts")).cast("long").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col(srcCol), col("n_tokens"),
        coalesce(col("max_leak_span"), lit(0L)).as("max_leak_span"))
  }

  /** Rare-token ratio — the corpus-relative gibberish/noise signal: per
    * document, the fraction of token OCCURRENCES whose corpus-wide
    * occurrence count is at most `maxCount`. Complements the
    * document-local quality scores (p03) and repetition stats (p27)
    * with a signal only the corpus can give: OCR garbage, mojibake and
    * random identifiers are exactly the tokens the rest of the corpus
    * never repeats. Integer counts and an exact ratio — no logs, so the
    * result is bit-identical across engines (a unigram log-prob score
    * would ride on libm rounding). Shape: explode + one token-keyed
    * partial-aggregated shuffle + join back by token — dictionary-sized
    * state, never a document product.
    */
  def rareTokenRatio(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      maxCount: Long = 2L): org.apache.spark.sql.DataFrame = {
    require(maxCount >= 1, "maxCount must be >= 1")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("__t"))
    val vocab = toks.groupBy(col("__t")).agg(count(lit(1)).as("__n"))
    toks.join(vocab, Seq("__t"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__n") <= maxCount, 1L).otherwise(0L)).as("n_rare"))
      .select(col(idCol), col("n_tokens"), col("n_rare"),
        round(col("n_rare").cast("double") / col("n_tokens"), 6)
          .as("rare_ratio"))
  }

  /** Cross-source n-gram leakage matrix — contamination auditing between
    * corpus partitions (the train/test-leak analysis run before any
    * split is trusted): for every unordered source pair, how many
    * distinct `n`-gram windows occur in BOTH. Grams present in more
    * than `maxDocDf` documents are dropped first (boilerplate cap, the
    * same discipline as the Jaccard dedup family — ubiquitous grams say
    * nothing about leakage and are exactly the skew that would melt the
    * gram shuffle at 100 TB). Output is one row per source pair with
    * shared-gram counts: tiny, whatever the corpus size. Shape: explode
    * + distinct, then ONE gram-keyed aggregation computing the doc-df
    * cap AND the per-gram source set together; source pairs expand
    * map-side from that set (bounded by the number of sources), so the
    * gram strings shuffle exactly once and no self-join or document
    * product ever forms.
    */
  def crossSourceNgramLeak(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      srcCol: String,
      textCol: String,
      n: Int = 8,
      maxDocDf: Int = 50,
      maxSources: Long = 4096L): org.apache.spark.sql.DataFrame = {
    require(n >= 1 && maxDocDf >= 1, "n/maxDocDf must be >= 1")
    val toks = tokens(col(textCol))
    // The plan's boundedness rests on the source DICTIONARY: the output
    // is one row per source PAIR and each gram's collect_set is
    // source-bounded, both fine for catalog-style labels (web/book/
    // code) and quadratic death for corpus-order labels (a URL-domain
    // srcCol at 100 TB). Enforce the assumption in-plan instead of in
    // prose: past `maxSources` the guard raises with the remedy named.
    val guarded = graft.operators.ScaleGuards.witnessGuard(
      df, df.select(col(srcCol)).distinct(),
      what = s"crossSourceNgramLeak($srcCol)", budget = maxSources,
      remedy = "the pair matrix is sources^2 — roll corpus-order " +
        "source labels up to a bounded family (domain -> registrar, " +
        "shard -> dataset) before the leak audit")
    val docGrams = graft.plans.FanOut.byKey( // r15: guide 2.5 fan-out
        guarded.filter(col(textCol).isNotNull && col(textCol) =!= ""),
        col(idCol))
      .select(col(idCol), col(srcCol).as("__src"),
        explode(wordGrams(toks, col(textCol), n)).as("__gram"))
      .distinct()
    val perGram = docGrams.groupBy(col("__gram"))
      .agg(count(lit(1)).as("__df"),
        array_sort(collect_set(col("__src"))).as("__srcs"))
      .filter(col("__df") <= maxDocDf && size(col("__srcs")) >= 2)
    // all ordered source pairs of the (sorted) per-gram source set
    val pairsOfGram = flatten(transform(col("__srcs"), (a, i) =>
      transform(slice(col("__srcs"), i + lit(2),
          size(col("__srcs"))),
        b => struct(a.as("src_a"), b.as("src_b")))))
    perGram.select(explode(pairsOfGram).as("__pair"))
      .groupBy(col("__pair.src_a").as("src_a"), col("__pair.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** Per-document token-repetition profile (the Gopher-style repetition
    * quality signals): token count, distinct count, duplicate-token
    * ratio, and the top token's frequency. Explode + two-level aggregate
    * (never array_distinct: O(n^2) per row) — partial aggregation keeps
    * the shuffle at (id, token) cardinality.
    */
  def repetitionStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("t"))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("tf"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("tf")).as("max_tf"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        round((col("n_tokens") - col("n_distinct")).cast("double") /
          col("n_tokens"), 6).as("dup_ratio"),
        col("max_tf"))

  /** Sequence packing (concat-and-chunk): lay documents end to end in
    * `idCol` order and assign each to the training bin its FIRST token
    * lands in (`bin = floor(start_offset / budget)`) — the standard
    * pretraining move that turns a corpus into fixed-budget sequences
    * with minimal padding.
    *
    * The global exclusive prefix sum is computed in THREE deterministic
    * levels so no level ever funnels the corpus through one partition:
    * a within-group running sum (window partitioned by `floor(id /
    * groupSize)`), a within-SUPER-group running sum over the per-group
    * totals (window partitioned by `floor(g / groupSize)` — one row per
    * group, never unpartitioned), and an exclusive sum over the
    * super-group totals. That last level carries one row per
    * groupSize^2 documents — ~6,000 rows at 10^11 docs — so it is
    * folded on the driver and broadcast back, the same
    * bounded-metadata-to-driver shape as an IVF codebook: the DATA
    * never leaves the executors, only per-super-group totals do.
    * Grouping keys derive from ids, not sampled range boundaries, so
    * the result is reproducible across engines and partitionings
    * (`repartitionByRange` samples its bounds; this must not).
    */
  def packedBins(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      groupSize: Long = 4096L): org.apache.spark.sql.DataFrame = {
    require(budget >= 1 && groupSize >= 1, "budget/groupSize must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val g = floor(col(idCol) / groupSize).as("g")
    val within = Window.partitionBy(col("g")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withinSuper = Window.partitionBy(col("sg")).orderBy(col("g"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perDoc = df.select(col(idCol), col(tokenCol).cast("long").as("t"), g)
      .withColumn("w_start", coalesce(sum(col("t")).over(within), lit(0L)))
    // one row per group (metadata-sized, like the memoized stages) —
    // checkpointed because it feeds TWO consumers, the driver-side
    // super-total fold below and the final join: without it the corpus
    // scan + group aggregation would execute twice (the collect is a
    // separate job, so ReuseExchange cannot share the scan)
    val gOffsets = perDoc.groupBy(col("g"))
      .agg(sum(col("t")).as("g_total"))
      .withColumn("sg", floor(col("g") / groupSize))
      .withColumn("g_start_in_sg",
        coalesce(sum(col("g_total")).over(withinSuper), lit(0L)))
      .localCheckpoint(true)
    val superTotals = gOffsets.groupBy(col("sg"))
      .agg(sum(col("g_total")).as("sg_total"))
      .orderBy(col("sg")).collect()
    var acc = 0L
    val sgStarts = superTotals.map { r =>
      val row = (r.getLong(0), acc); acc += r.getLong(1); row
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val sgStartDf = sgStarts.toDF("sg", "sg_start")
    val gStarts = gOffsets.join(broadcast(sgStartDf), Seq("sg"))
      .select(col("g"), (col("sg_start") + col("g_start_in_sg")).as("g_start"))
    perDoc.join(broadcast(gStarts), Seq("g"))
      .select(col(idCol),
        col("t"),
        (col("g_start") + col("w_start")).as("start_offset"),
        floor((col("g_start") + col("w_start")) / budget).as("bin"))
  }

  /** Attach corpus data-quality metrics computed DURING the next action
    * over the frame — `Dataset.observe` evaluates them inside the
    * existing pass, so a 100 TB pipeline gets its circuit-breaker
    * numbers (row count, null keys, empty docs, token total) for free
    * instead of via a second scan. Read the values from the returned
    * [[org.apache.spark.sql.Observation]] after any action:
    * `obs.get("n_rows")`.
    */
  def corpusMetrics(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(idCol).isNull, 1L).otherwise(0L)).as("null_ids"),
      sum(when(col(textCol).isNull || col(textCol) === "", 1L).otherwise(0L))
        .as("empty_docs"),
      sum(tokenCount(col(textCol)).cast("long")).as("total_tokens"))
    (observed, obs)
  }

  /** Text normalization for dedup/tokenizer front-ends: lowercase,
    * collapse whitespace runs, trim. Pure per-row expressions with exact
    * DuckDB equivalents, so normalized-corpus pipelines stay
    * oracle-checkable.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** HTML/markup -> text extraction — the first step of every
    * web-crawl corpus pipeline. Regex-grade (NOT an HTML parser):
    * script/style blocks strip wholesale FIRST (their bodies legally
    * contain naked `<`, which the tag pass would mangle), then tags,
    * then the five predefined entities decode with `&amp;` LAST (else
    * `&amp;lt;` double-decodes to `<` instead of the literal `&lt;` it
    * encodes), then whitespace collapses. A quoted `>` inside an
    * attribute value is out of scope for the tag regex — the honest
    * limit of regex extraction, documented rather than half-handled.
    * Every pattern is restricted to constructs with identical
    * Java-regex/RE2 semantics (non-greedy dot under `(?is)`, no
    * backreferences), so the DuckDB oracle replays byte-for-byte.
    * Pure per-row codegen'd expressions: at 100 TB this is a map-only
    * pass, no shuffle.
    */
  def stripMarkup(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&").foldLeft(noTags) {
      case (c, (e, v)) => replace(c, lit(e), lit(v))
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Link density — the navigation/boilerplate-page signal (CCNet /
    * RefinedWeb quality rule): the fraction of extracted text that sat
    * inside anchor tags. A nav page or link farm scores near 1, prose
    * near 0. Anchor bodies are captured BEFORE any stripping (group 1
    * of an RE2-safe non-greedy pattern), then themselves markup/entity
    * cleaned via [[stripMarkup]] so nested tags inside an anchor don't
    * count as text. Integer char counts and one exact ratio — map-only,
    * oracle-replayable.
    */
  def linkDensity(html: Column): Column = {
    val anchorChars = aggregate(
      transform(regexp_extract_all(html, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)),
        a => length(stripMarkup(a))),
      lit(0L), (acc, n) => acc + n)
    val textChars = length(stripMarkup(html)).cast("long")
    when(textChars > 0,
      round(anchorChars.cast("double") / textChars, 6)).otherwise(lit(0.0))
  }

  /** PII redaction: mask email addresses and URLs (the two scrubbing
    * passes every public-corpus pipeline runs first). Patterns are kept
    * to constructs with identical Java-regex/RE2 semantics so the
    * DuckDB oracle matches byte-for-byte.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text,
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "https?://[^ ]+", "<URL>")
  }

  /** [[redactPii]] plus the phone / IPv4 / card-number classes a
    * production scrub also carries (p93 oracles the full chain). Order
    * matters: URLs and emails go first so their digit runs cannot be
    * re-matched as phone numbers; the card pattern (13-16 digits with
    * optional separators) runs before the phone pattern, which would
    * otherwise claim its prefix.
    */
  def redactPiiExtended(text: Column): Column = {
    val base = redactPii(text)
    val noCard = regexp_replace(base,
      "\\b(?:\\d[ -]?){13,16}\\b", "<CARD>")
    val noPhone = regexp_replace(noCard,
      "\\+?\\d{1,3}[ -]\\(?\\d{2,4}\\)?[ -]\\d{3}[ -]?\\d{2,4}\\b",
      "<PHONE>")
    regexp_replace(noPhone,
      "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>")
  }

  /** Bigram language-model quality score — the perplexity-family signal
    * (docs whose token transitions are common in the corpus score high,
    * gibberish scores low), made INTEGER-EXACT with the PageRank
    * discipline so a DuckDB replay is bit-identical: the add-1-smoothed
    * transition probability is the scaled floor quotient
    *   p(cur|prev) = ((bc + 1) * scale) DIV (cc + V)
    * (bc = corpus bigram count, cc = corpus count of bigrams with that
    * context token, V = corpus distinct-token count) and the per-doc
    * score is `sum(p) DIV n_bigrams` — the arithmetic-mean scaled
    * probability. No float log / no summation-order sensitivity; the
    * log-perplexity view is a monotone transform the caller can apply.
    * Overflow contract: (bc + 1) * scale must fit a Long, i.e. the
    * hottest bigram count < 2^63/scale (~9.2e9 at the default scale) —
    * beyond that, lower `scale`.
    *
    * Scale shape: the bigram/context count frames are
    * dictionary-vs-corpus aggregations (map-side partial agg, same
    * discipline as rareTokenRatio) joined back on their keys — AQE
    * splits a hot boilerplate bigram; V is a 1-row broadcast. The
    * corpus-sized bigram frame is derived THREE times (probe side + two
    * count dictionaries) — declaratively correct everywhere; at 100 TB
    * snapshot it to a table first so the tokenize pass runs once.
    *
    * Output: one row per doc with >= 1 bigram:
    * (idCol, n_bigrams, lm_score).
    */
  def bigramLmScore(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      scale: Long = 1000000000L): org.apache.spark.sql.DataFrame = {
    val toks = df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol), tokens(col(textCol)).as("__ts"))
    val bi = toks.filter(size(col("__ts")) >= 2)
      .select(col(idCol),
        explode(zip_with(
          slice(col("__ts"), lit(1), size(col("__ts")) - 1),
          slice(col("__ts"), lit(2), size(col("__ts")) - 1),
          (a, b) => struct(a.as("p"), b.as("c")))).as("__bg"))
      .select(col(idCol),
        col("__bg.p").as("__prev"), col("__bg.c").as("__cur"))
    val bc = bi.groupBy(col("__prev"), col("__cur"))
      .agg(count(lit(1)).as("__bc"))
    val cc = bi.groupBy(col("__prev")).agg(count(lit(1)).as("__cc"))
    val v = toks.select(explode(col("__ts")).as("__t"))
      .agg(countDistinct(col("__t")).as("__v"))
    bi.join(bc, Seq("__prev", "__cur"))
      .join(cc, Seq("__prev"))
      .crossJoin(broadcast(v))
      .select(col(idCol),
        expr(s"((__bc + 1) * ${scale}L) DIV (__cc + __v)").as("__p"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__p")).as("__sp"))
      .select(col(idCol), col("n_bigrams"),
        expr("__sp DIV n_bigrams").as("lm_score"))
  }

  /** Pairwise source drift matrix — corpus-composition monitoring: the
    * squared L2 distance between every two sources' token probability
    * distributions, INTEGER-EXACT so the hash gate applies. Per source,
    * each token's probability is the scaled floor quotient
    * `p_s(t) = (c_s(t) * scale) DIV n_s`; the pair distance uses the
    * sum-of-squares identity
    *   ||p_a - p_b||^2 = SUM p_a^2 + SUM p_b^2 - 2 * SUM_shared p_a*p_b
    * so tokens present in only ONE source are priced by the per-source
    * square totals and the only join is an INNER join on SHARED tokens —
    * no outer join, no union-dictionary materialization. Everything
    * stays in Long ([[dsirScore]] discipline). Overflow contract: the
    * per-source sum of squared scaled probabilities is bounded by
    * scale^2 * (distinct tokens), so the default scale 1e6 is safe to
    * ~9e6 distinct tokens per source; at web-corpus vocabularies lower
    * `scale` (1e3 covers ~9e12 distinct tokens).
    *
    * A pipeline watches this matrix across snapshots: a source whose
    * distance to its own previous snapshot jumps has drifted (crawler
    * change, spam influx); two sources collapsing toward zero distance
    * signal duplicated ingestion.
    *
    * Scale shape: token-count frames are dictionary-vs-corpus
    * aggregations (map-side partial agg); per-source square totals are
    * dictionary-sized rollups; the shared-token join is token-keyed
    * (AQE splits hot stopwords) and immediately collapses to one row
    * per source pair. No window, no driver-side data.
    *
    * Output: (source_a, source_b, n_shared_tokens, l2_drift) for every
    * source pair sharing >= 1 token, l2_drift = ||p_a - p_b||^2 DIV scale.
    */
  def sourceDriftMatrix(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      sourceCol: String,
      scale: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    require(scale >= 1, "scale must be >= 1")
    val toks = df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(sourceCol).as("__s"), explode(tokens(col(textCol))).as("__t"))
    val counts = toks.groupBy(col("__s"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val totals = toks.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
    val probs = counts.join(totals, Seq("__s"))
      .select(col("__s"), col("__t"),
        expr(s"(__c * ${scale}L) DIV __n").as("__p"))
    val sq = probs.groupBy(col("__s"))
      .agg(sum(col("__p") * col("__p")).as("__sq"))
    val cross = probs.select(col("__s").as("__sa"), col("__t"), col("__p").as("__pa"))
      .join(probs.select(col("__s").as("__sb"), col("__t"), col("__p").as("__pb")),
        Seq("__t"))
      .filter(col("__sa") < col("__sb"))
      .groupBy(col("__sa"), col("__sb"))
      .agg(count(lit(1)).as("n_shared_tokens"),
        sum(col("__pa") * col("__pb")).as("__x"))
    cross
      .join(sq.select(col("__s").as("__sa"), col("__sq").as("__sqa")), Seq("__sa"))
      .join(sq.select(col("__s").as("__sb"), col("__sq").as("__sqb")), Seq("__sb"))
      .select(col("__sa").as("source_a"), col("__sb").as("source_b"),
        col("n_shared_tokens"),
        expr(s"(__sqa + __sqb - 2L * __x) DIV ${scale}L").as("l2_drift"))
  }

  /** DSIR-style importance score — data selection by distribution
    * matching (Xie et al., "Data Selection for Language Models via
    * Importance Resampling"): score each raw-corpus document by how
    * target-like its token distribution is, so the pipeline can resample
    * the raw pool toward a high-quality target slice. The per-token
    * signal is the add-1-smoothed likelihood ratio
    *   r(t) = (tc_target(t) + 1) / (tc_raw(t) + 1)
    * and the per-doc score is the mean scaled ratio — INTEGER-EXACT with
    * the [[bigramLmScore]] discipline: each ratio is the scaled floor
    * quotient ((tc_t + 1) * scale) DIV (tc_r + 1), the doc score
    * `sum DIV n_tokens`, so a DuckDB replay is bit-identical and the
    * hash gate applies. The constant global normalizer
    * (N_raw + V)/(N_target + V) is deliberately dropped: it is the same
    * for every document, so ranking and resampling weights are
    * unchanged and every remaining division stays Long-safe. Overflow
    * contract: (hottest target token count + 1) * scale must fit a
    * Long — at the default scale 1e6 that allows per-token target
    * counts up to ~9.2e12; lower `scale` beyond that.
    *
    * Scale shape: both count frames are dictionary-vs-corpus
    * aggregations (map-side partial agg) joined back on the token key —
    * AQE splits a hot stopword; no window, no driver-side data. Target
    * docs are scored 0-cost (excluded) — DSIR only ever scores the raw
    * pool.
    *
    * Output: one row per non-target doc with >= 1 token:
    * (idCol, n_tokens, dsir_score).
    */
  /** Per-source token-budget cut — deterministic budget sampling: walk
    * each source's documents in doc-id order and keep them while the
    * source's running token total stays within `budget`. The standard
    * "cap every domain's contribution" mixing step, made exact (a rate-
    * based sample like p44 only hits a budget in expectation; this hits
    * it exactly, same docs every run).
    *
    * Scale shape — the [[packedBins]] two-level prefix-sum discipline,
    * NOT one window per source (a 10^9-doc source would funnel into a
    * single window task): level 1 aggregates token totals per
    * (source, chunk of `chunkSize` ids) map-side; the chunk-level
    * running sum is a window over N/chunkSize rows per source; the
    * doc-level window runs inside bounded (source, chunk) partitions
    * and adds the chunk offset. Both windows are partitioned; no
    * unpartitioned window, no single-source funnel.
    *
    * Returns kept docs: (sourceCol, idCol, n_tokens, cum_tokens).
    */
  def tokenBudgetCut(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      budget: Long,
      chunkSize: Long = 4096L): org.apache.spark.sql.DataFrame = {
    require(budget >= 1 && chunkSize >= 1, "budget/chunkSize must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val toks = df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(sourceCol), col(idCol),
        tokenCount(col(textCol)).cast("long").as("__t"),
        floor(col(idCol) / chunkSize).as("__chunk"))
    val chunkTotals = toks.groupBy(col(sourceCol), col("__chunk"))
      .agg(sum(col("__t")).as("__chunk_t"))
    val chunkW = Window.partitionBy(col(sourceCol)).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = chunkTotals.withColumn("__before",
      coalesce(sum(col("__chunk_t")).over(chunkW), lit(0L)))
    val docW = Window.partitionBy(col(sourceCol), col("__chunk"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(offsets.select(col(sourceCol), col("__chunk"), col("__before")),
        Seq(sourceCol, "__chunk"))
      .withColumn("__cum", col("__before") + sum(col("__t")).over(docW))
      .filter(col("__cum") <= budget)
      .select(col(sourceCol), col(idCol), col("__t").as("n_tokens"),
        col("__cum").as("cum_tokens"))
  }

  /** Integer-exact linear text classifier — the fasttext-shaped
    * in-pipeline domain/language gate, trained and applied in one
    * declarative flow. Training is the token-class count dictionary
    * (per-class add-1-smoothed token likelihoods); scoring uses the
    * mean-scaled-likelihood variant of naive Bayes — per token,
    *   l(t, c) = ((tc(c,t) + 1) * scale) DIV (n_c + V)
    * and a document's class score is sum(l) DIV n_tokens. Summing
    * scaled likelihoods instead of log-likelihoods keeps every
    * operation in Long (the [[dsirScore]]/[[bigramLmScore]] discipline)
    * so prediction — argmax with a deterministic (score DESC, class)
    * tie-break — is bit-identical under a DuckDB replay. The log-space
    * product variant needs floats and is NOT replayable; this
    * integerized form is the price of a hash gate, and behaves like any
    * linear bag-of-words classifier in practice.
    *
    * Scale shape: the model IS a DataFrame (class x token counts) —
    * dictionary-sized, partial-aggregated, joined back on the token
    * key; scoring explodes (doc-token, class) via the dictionary join
    * (fan-out = |classes|), aggregates per (doc, class) map-side, and
    * the argmax window partitions by doc over |classes| rows. No
    * driver-side model object, no funnel.
    *
    * Returns one row per test doc: (idCol, labelCol actual, predicted).
    */
  /** The scored frame behind [[classifyByTokens]]: one row per
    * (test doc, class) with the integer mean-scaled-likelihood score —
    * exposed so calibration audits (p131) can read the classifier's
    * REAL confidence (top score over the class-score sum) rather than
    * a proxy feature. Train/score semantics identical to
    * [[classifyByTokens]]; that method is now argmax over this frame.
    */
  def classifierScores(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      isTrain: Column,
      scale: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    val toks = df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol), col(labelCol), isTrain.as("__tr"),
        explode(tokens(col(textCol))).as("__t"))
    val tc = toks.filter(col("__tr"))
      .groupBy(col(labelCol).as("__c"), col("__t"))
      .agg(count(lit(1)).as("__tc"))
    val nc = toks.filter(col("__tr"))
      .groupBy(col(labelCol).as("__c")).agg(count(lit(1)).as("__nc"))
    val v = toks.filter(col("__tr"))
      .agg(countDistinct(col("__t")).as("__v"))
    // the model frame: every (class, token) likelihood, incl. unseen
    // tokens handled at score time via the left join's +1 smoothing
    val model = tc.join(nc, Seq("__c")).crossJoin(broadcast(v))
      .select(col("__c"), col("__t"),
        expr(s"((__tc + 1) * ${scale}L) DIV (__nc + __v)").as("__l"))
    val classes = nc.crossJoin(broadcast(v))
      .select(col("__c"), expr(s"${scale}L DIV (__nc + __v)").as("__l0"))
    val test = toks.filter(!col("__tr"))
    test
      .crossJoin(broadcast(classes))
      .join(model, Seq("__c", "__t"), "left")
      .select(col(idCol), col(labelCol), col("__c"),
        coalesce(col("__l"), col("__l0")).as("__l"))
      .groupBy(col(idCol), col(labelCol), col("__c"))
      .agg(count(lit(1)).as("__n"), sum(col("__l")).as("__sl"))
      .select(col(idCol), col(labelCol), col("__c"),
        expr("__sl DIV __n").as("__score"))
  }

  def classifyByTokens(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      isTrain: Column,
      scale: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored =
      classifierScores(df, idCol, textCol, labelCol, isTrain, scale)
    // per-doc argmax: partitions are class-count-sized (one row per
    // class per doc), so the window never sees a corpus-sized partition
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__score").desc, col("__c"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(labelCol), col("__c").as("predicted"))
  }

  def dsirScore(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      scale: Long = 1000000L): org.apache.spark.sql.DataFrame = {
    val toks = df.filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol), isTarget.as("__tgt"),
        explode(tokens(col(textCol))).as("__t"))
    val tcT = toks.filter(col("__tgt"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__tc_t"))
    val tcR = toks.filter(!col("__tgt"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__tc_r"))
    toks.filter(!col("__tgt")).drop("__tgt")
      .join(tcT, Seq("__t"), "left")
      .join(tcR, Seq("__t"))
      .select(col(idCol),
        expr(s"((coalesce(__tc_t, 0L) + 1) * ${scale}L) DIV (__tc_r + 1)")
          .as("__r"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__r")).as("__sr"))
      .select(col(idCol), col("n_tokens"),
        expr("__sr DIV n_tokens").as("dsir_score"))
  }
}
