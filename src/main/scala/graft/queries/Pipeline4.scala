package graft.queries

import graft.QueryDef
import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fourth pipeline batch: bounded per-key reservoir sampling, corpus
  * n-gram novelty, per-dimension feature standardization, degree-ordered
  * triangle counting, and asymmetric n-gram containment decontamination.
  */
object Pipeline4 {
  import graft.Tables.t

  import graft.operators.TextAnalysis.wordGrams

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // PER-KEY RESERVOIR SAMPLE via a BOUNDED typed Aggregator — the
      // scale answer to "keep k example docs per source for a manifest":
      // TopKByOrd holds at most k (hash, id) rows per partition per key,
      // so map-side partial aggregation ships k rows per upstream
      // partition through the shuffle where rank-then-filter pays a full
      // per-key sort and collect_list pays unbounded state. Selection is
      // by md5(doc_id) order — deterministic across runs, engines and
      // partitionings (no RNG state), and uniform in expectation because
      // the hash is key-equidistributed. The oracle replays it as a
      // row_number over the same hash order.
      "p78_reservoir_per_key",
      (s, dir) => {
        import s.implicits._
        val topk = udaf(new graft.functions.Aggregators.TopKByOrd(5))
        t(s, dir, "documents")
          .select($"source",
            md5($"doc_id".cast("string")).as("h"), $"doc_id")
          .groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            topk($"h", $"doc_id").as("ids"))
          .select($"source", $"n_docs",
            concat_ws(",", $"ids".cast("array<string>")).as("sample_ids"))
          .orderBy($"source")
      },
      Some("""WITH h AS (
             |  SELECT source, doc_id,
             |    md5(CAST(doc_id AS VARCHAR)) AS h
             |  FROM documents),
             |r AS (
             |  SELECT source, doc_id,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY h, doc_id) AS rn,
             |    COUNT(*) OVER (PARTITION BY source) AS n_docs
             |  FROM h)
             |SELECT source, CAST(MIN(n_docs) AS BIGINT) AS n_docs,
             |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn)
             |    AS sample_ids
             |FROM r WHERE rn <= 5
             |GROUP BY source
             |ORDER BY source""".stripMargin)),

    QueryDef(
      // N-GRAM NOVELTY PER SOURCE — how much of each crawl snapshot is
      // genuinely new text: the fraction of a source's distinct 3-gram
      // types it is the FIRST holder of (sources ordered by name, the
      // snapshot order). The dedupe-adjacent signal mixture planners use
      // to decide whether another snapshot of a domain is worth
      // ingesting. Shapes: one DISTINCT (source, gram) aggregation, one
      // gram-keyed min(source) aggregation (both map-side partial), one
      // gram-keyed join back — never a window, never a posting list in
      // one task; integer-ppm output is bit-stable across engines.
      "p79_ngram_novelty",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .filter($"text".isNotNull && $"text" =!= "")
          .select($"source", split($"text", " ").as("tk"), $"text")
        val grams = toks
          .select($"source",
            explode(wordGrams($"tk", $"text", 3)).as("gram"))
          .distinct()
        val first = grams.groupBy($"gram")
          .agg(min($"source").as("first_src"))
        grams.join(first, Seq("gram"))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_grams"),
            sum(when($"first_src" === $"source", 1L).otherwise(0L))
              .as("n_novel"))
          .withColumn("novel_ppm", expr("n_novel * 1000000 DIV n_grams"))
          .orderBy($"source")
      },
      Some("""WITH toks AS (
             |  SELECT source, text, string_split(text, ' ') AS tk
             |  FROM documents
             |  WHERE text IS NOT NULL AND text <> ''),
             |g AS (
             |  SELECT DISTINCT source,
             |    unnest(CASE WHEN len(tk) >= 3
             |      THEN list_transform(generate_series(1, len(tk) - 2),
             |        i -> array_to_string(tk[i:i+2], ' '))
             |      ELSE [text] END) AS gram
             |  FROM toks),
             |f AS (SELECT gram, MIN(source) AS first_src
             |      FROM g GROUP BY gram)
             |SELECT source, COUNT(*) AS n_grams,
             |  CAST(SUM(CASE WHEN first_src = source THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_novel,
             |  CAST(SUM(CASE WHEN first_src = source THEN 1 ELSE 0 END)
             |    * 1000000 // COUNT(*) AS BIGINT) AS novel_ppm
             |FROM g JOIN f USING (gram)
             |GROUP BY source
             |ORDER BY source""".stripMargin)),

    QueryDef(
      // PER-DIMENSION FEATURE STANDARDIZATION STATS — the (mean,
      // variance) table a feature store computes once and every
      // training job joins back to z-score its embeddings. Sums run in
      // DECIMAL (order-independent, so partial aggregation across any
      // partitioning is exact); the variance finishes in double with
      // ONE fixed expression both engines evaluate identically. One
      // posexplode pass; output is dims-sized (a dictionary), and the
      // per-dim aggregation partial-combines map-side — no vector ever
      // funnels anywhere.
      "p80_dim_standardize",
      (s, dir) => {
        import s.implicits._
        val el = t(s, dir, "embeddings")
          .select(posexplode($"embedding").as(Seq("dim", "xf")))
          .select($"dim", $"xf".cast(DecimalType(18, 9)).as("x"))
        el.groupBy($"dim")
          .agg(count(lit(1)).as("n"),
            sum($"x").as("sx"),
            sum($"x" * $"x").as("sxx"))
          .select($"dim", $"n",
            round($"sx".cast("double") / $"n", 6).as("mean"),
            round(($"sxx".cast("double") -
              $"sx".cast("double") * $"sx".cast("double") / $"n") / $"n",
              6).as("variance"))
          .orderBy($"dim")
      },
      Some("""WITH el AS (
             |  SELECT i - 1 AS dim,
             |    CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9)) AS x
             |  FROM embeddings,
             |    unnest(generate_series(1, len(embedding))) AS g(i)),
             |st AS (
             |  SELECT dim, COUNT(*) AS n, SUM(x) AS sx, SUM(x*x) AS sxx
             |  FROM el GROUP BY dim)
             |SELECT CAST(dim AS INT) AS dim, CAST(n AS BIGINT) AS n,
             |  round(CAST(sx AS DOUBLE) / n, 6) AS mean,
             |  round((CAST(sxx AS DOUBLE) -
             |    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n, 6)
             |    AS variance
             |FROM st
             |ORDER BY dim""".stripMargin)),

    QueryDef(
      // TRIANGLE COUNTING, degree-ordered — the graph-locality statistic
      // (clustering coefficient numerator) over a deterministic synthetic
      // graph derived from order keys by public congruential arithmetic,
      // so both engines build the identical edge set with no float or
      // hash portability concerns. The Spark plan is the scalable shape:
      // orient every edge from its lower-(degree, id) endpoint, so each
      // node's out-degree is O(sqrt(m)) and the wedge self-join fan-out
      // is bounded by it — never deg^2 of a hub — then close wedges with
      // one equi-join against the oriented edge set. The oracle counts
      // the same triangles with the naive a<b<c three-way join (fine at
      // oracle scale, quadratic on hubs at ours — which is the point of
      // the orientation).
      "p81_triangle_count",
      (s, dir) => {
        import s.implicits._
        import graft.operators.GraphOps
        val e0 = t(s, dir, "orders")
          .select(($"o_orderkey" % 997).as("u"),
            (($"o_orderkey" * 31 + 7) % 997).as("v"))
          .filter($"u" =!= $"v")
          .select(least($"u", $"v").as("a"), greatest($"u", $"v").as("b"))
          .distinct()
        val deg = GraphOps.degrees(e0)
        val nodes = deg.agg(count(lit(1)).as("n_nodes"))
        val edges = e0.agg(count(lit(1)).as("n_edges"))
        nodes.crossJoin(broadcast(edges))
          .crossJoin(broadcast(GraphOps.triangleCount(e0, Some(deg))))
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT
             |    least(o_orderkey % 997, (o_orderkey * 31 + 7) % 997)
             |      AS a,
             |    greatest(o_orderkey % 997, (o_orderkey * 31 + 7) % 997)
             |      AS b
             |  FROM orders
             |  WHERE (o_orderkey % 997) <> ((o_orderkey * 31 + 7) % 997))
             |SELECT
             |  (SELECT COUNT(*) FROM
             |    (SELECT a AS n FROM e0 UNION SELECT b FROM e0)) AS n_nodes,
             |  (SELECT COUNT(*) FROM e0) AS n_edges,
             |  (SELECT COUNT(*) FROM e0 xy
             |    JOIN e0 xz ON xy.a = xz.a AND xy.b < xz.b
             |    JOIN e0 yz ON yz.a = xy.b AND yz.b = xz.b) AS n_triangles
             |""".stripMargin)),

    QueryDef(
      // ASYMMETRIC CONTAINMENT DECONTAMINATION — the eval-in-train
      // detector Jaccard misses: a short benchmark doc pasted into a
      // long web page has low Jaccard but containment ~1
      // (|grams(eval) ∩ grams(train)| / |grams(eval)|). For every
      // src0 (benchmark) doc, the best-containing train doc at >= 20%
      // containment. Scale shapes: distinct (doc, gram) frames, a
      // train-side document-frequency cap (grams in > 50 train docs are
      // boilerplate, excluded from matching — mirrored EXACTLY in the
      // oracle so the cap is part of the contract, not an
      // approximation), a gram-keyed equi-join carrying ids only, and a
      // partial-aggregable max(struct) argmax — no window, no pair
      // blow-up beyond the capped posting lists, and the eval-side
      // fan-out bound is witness-guarded in-plan since round 12 (the
      // guard is a no-op under budget, so the oracle is unaffected).
      // Integer-ppm scoring.
      "p82_containment_decon",
      (s, dir) => {
        import s.implicits._
        // r15: fan-out before the gram build (guide 2.5; no-op at
        // scale). The r15 persist of the exploded-distinct gram frame
        // (four consumers) was REVERTED in r16: the clean suite stamp
        // measured it at 3.36 s vs the r14 unpersisted 2.45 s, and
        // interleaved isolated A/Bs had unpersisted winning every pair
        // (2.5/3.2/2.6/2.9 vs 3.4/3.7/3.8) — the materialization
        // barrier serializes the four consumers behind one columnar
        // write where the recomputed subtree overlaps them.
        val docs = graft.plans.FanOut.byKey(
            t(s, dir, "documents")
              .filter($"text".isNotNull && $"text" =!= ""), $"doc_id")
          .select($"doc_id", $"source", split($"text", " ").as("tk"),
            $"text")
        val grams = docs
          .select($"doc_id", $"source",
            explode(wordGrams($"tk", $"text", 3)).as("gram"))
          .distinct()
        val eval0 = grams.filter($"source" === "src0")
          .select($"doc_id".as("e_id"), $"gram")
        // the train side is DF-capped at 50 below, so per-gram pair
        // fan-out is eval_df x 50 — bounded ONLY if no eval gram is
        // itself corpus-order. That was prose; contract it (the
        // p39/p48 witnessGuard pattern): an eval gram in > 2^20
        // benchmark docs would fan out > 50M candidate pairs from one
        // key, so the plan raises with the remedy named. The witness
        // is one partial-aggregable count over the (small) eval side.
        val eval = graft.operators.ScaleGuards.witnessGuard(
          eval0,
          eval0.groupBy($"gram").agg(count(lit(1)).as("df"))
            .filter($"df" > (1L << 20)),
          what = "p82 eval posting lists", budget = 0L,
          remedy = "stop-list benchmark boilerplate grams or raise the " +
            "gram order (the train side is DF-capped at 50; an eval " +
            "gram in >2^20 eval docs fans out >50M pairs from one key)")
        val train = grams.filter($"source" =!= "src0")
          .select($"doc_id".as("t_id"), $"gram")
        val okGrams = train.groupBy($"gram")
          .agg(count(lit(1)).as("df")).filter($"df" <= 50)
          .select($"gram")
        val matches = eval
          .join(train.join(okGrams, Seq("gram")), Seq("gram"))
          .groupBy($"e_id", $"t_id").agg(count(lit(1)).as("n_match"))
        val evalSize = eval.groupBy($"e_id")
          .agg(count(lit(1)).as("n_grams"))
        matches.join(evalSize, Seq("e_id"))
          .withColumn("ppm", expr("n_match * 1000000 DIV n_grams"))
          .filter($"ppm" >= 200000)
          .groupBy($"e_id", $"n_grams")
          .agg(max(struct($"ppm", (-$"t_id").as("nt"))).as("b"))
          .select($"e_id".as("eval_doc"), $"n_grams",
            (-$"b.nt").as("train_doc"), $"b.ppm".as("containment_ppm"))
          .orderBy($"eval_doc")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, source, text, string_split(text, ' ') AS tk
             |  FROM documents
             |  WHERE text IS NOT NULL AND text <> ''),
             |g AS (
             |  SELECT DISTINCT doc_id, source,
             |    unnest(CASE WHEN len(tk) >= 3
             |      THEN list_transform(generate_series(1, len(tk) - 2),
             |        i -> array_to_string(tk[i:i+2], ' '))
             |      ELSE [text] END) AS gram
             |  FROM toks),
             |ev AS (SELECT doc_id AS e_id, gram FROM g
             |       WHERE source = 'src0'),
             |tr AS (SELECT doc_id AS t_id, gram FROM g
             |       WHERE source <> 'src0'),
             |ok AS (SELECT gram FROM tr GROUP BY gram
             |       HAVING COUNT(*) <= 50),
             |m AS (
             |  SELECT e_id, t_id, COUNT(*) AS n_match
             |  FROM ev JOIN (SELECT tr.* FROM tr JOIN ok USING (gram)) tc
             |    USING (gram)
             |  GROUP BY e_id, t_id),
             |es AS (SELECT e_id, COUNT(*) AS n_grams FROM ev GROUP BY e_id),
             |sc AS (
             |  SELECT m.e_id, es.n_grams, m.t_id,
             |    m.n_match * 1000000 // es.n_grams AS ppm
             |  FROM m JOIN es USING (e_id)
             |  WHERE m.n_match * 1000000 // es.n_grams >= 200000),
             |r AS (
             |  SELECT e_id, n_grams, t_id, ppm,
             |    row_number() OVER (PARTITION BY e_id
             |      ORDER BY ppm DESC, t_id) AS rn
             |  FROM sc)
             |SELECT e_id AS eval_doc, CAST(n_grams AS BIGINT) AS n_grams,
             |  t_id AS train_doc, CAST(ppm AS BIGINT) AS containment_ppm
             |FROM r WHERE rn = 1
             |ORDER BY eval_doc""".stripMargin)),

    QueryDef(
      // TWO-SAMPLE KS DISTRIBUTION DRIFT — for every source, the exact
      // Kolmogorov-Smirnov statistic between its doc-length (token
      // count) distribution and the REST of the corpus: the
      // distribution-level drift alarm p62's token-frequency L2 cannot
      // raise (a source can keep every token frequency and still shift
      // its length profile). Exact integer arithmetic throughout: with
      // cum_rest = cum_all - cum_src the KS numerator is
      // max |cum_src*n_all - cum_all*n_src| over the merged value
      // domain, reported with an integer-ppm normalization — no float
      // ECDFs, no epsilon. Shapes: the corpus folds into a
      // (source, length) histogram first (partial-aggregable,
      // dictionary x dictionary rows); the evaluation grid is that
      // dictionary cross the value dictionary (both bounded aggregates
      // — the ONLY fact-sized pass is the token count); the cumsum
      // window partitions by source over the value domain, never rows.
      "p83_ks_drift",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val nt = t(s, dir, "documents")
          .filter($"text".isNotNull && $"text" =!= "")
          .select($"source",
            graft.operators.TextAnalysis.tokenCount($"text").as("v"))
        val hist = nt.groupBy($"source", $"v").agg(count(lit(1)).as("c"))
        val vals = nt.groupBy($"v").agg(count(lit(1)).as("ct"))
        val ns = nt.groupBy($"source").agg(count(lit(1)).as("n_src"))
        val nAll = nt.agg(count(lit(1)).as("n_all"))
        val grid = ns.select($"source", $"n_src")
          .crossJoin(broadcast(vals)) // dictionary x dictionary, bounded
          .join(hist, Seq("source", "v"), "left")
          .na.fill(0L, Seq("c"))
        val w = Window.partitionBy($"source").orderBy($"v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid
          .withColumn("cum_src", sum($"c").over(w))
          .withColumn("cum_all", sum($"ct").over(w))
          .crossJoin(broadcast(nAll))
          .groupBy($"source", $"n_src", $"n_all")
          .agg(max(abs($"cum_src" * $"n_all" - $"cum_all" * $"n_src"))
            .as("ks_num"))
          // a source holding the entire corpus has no "rest" to drift
          // from — excluded on BOTH engines (Spark DIV 0 yields NULL
          // where DuckDB's integer division errors)
          .filter($"n_all" > $"n_src")
          .select($"source", $"n_src", ($"n_all" - $"n_src").as("n_rest"),
            $"ks_num",
            expr("ks_num * 1000000 DIV (n_src * (n_all - n_src))")
              .as("ks_ppm"))
          .orderBy($"source")
      },
      Some("""WITH nt AS (
             |  SELECT source, len(string_split(text, ' ')) AS v
             |  FROM documents
             |  WHERE text IS NOT NULL AND text <> ''),
             |hist AS (SELECT source, v, COUNT(*) AS c
             |         FROM nt GROUP BY 1, 2),
             |vals AS (SELECT v, COUNT(*) AS ct FROM nt GROUP BY 1),
             |ns AS (SELECT source, COUNT(*) AS n_src FROM nt GROUP BY 1),
             |na AS (SELECT COUNT(*) AS n_all FROM nt),
             |grid AS (
             |  SELECT ns.source, ns.n_src, vals.v, vals.ct,
             |    COALESCE(hist.c, 0) AS c
             |  FROM ns CROSS JOIN vals
             |  LEFT JOIN hist ON hist.source = ns.source
             |    AND hist.v = vals.v),
             |cum AS (
             |  SELECT source, n_src, v,
             |    SUM(c) OVER (PARTITION BY source ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum_src,
             |    SUM(ct) OVER (PARTITION BY source ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS cum_all
             |  FROM grid)
             |SELECT source, CAST(n_src AS BIGINT) AS n_src,
             |  CAST(n_all - n_src AS BIGINT) AS n_rest,
             |  CAST(MAX(ABS(cum_src * n_all - cum_all * n_src)) AS BIGINT)
             |    AS ks_num,
             |  CAST(MAX(ABS(cum_src * n_all - cum_all * n_src)) * 1000000
             |    // (n_src * (n_all - n_src)) AS BIGINT) AS ks_ppm
             |FROM cum CROSS JOIN na
             |WHERE n_all > n_src
             |GROUP BY source, n_src, n_all
             |ORDER BY source""".stripMargin)),

    QueryDef(
      // PERCEPTUAL IMAGE DEDUP via dHash, oracle-checked through a REAL
      // BMP decode: payloads are deterministic 9x8 patterned rasters
      // (pixel (x,y) of seed s has grey (s*31 + x*7 + y*13) mod 256,
      // seed = doc_id mod 50, so every seed group is a byte-identical
      // image family). The engine parses the actual BMP bytes, grids,
      // and hashes; DuckDB replays the closed-form pixel arithmetic and
      // must land on the SAME 64-char hash strings and the same dedup
      // groups. The hash is emitted as a bit string (engine-portable,
      // no sign/overflow), the grouping is one hash-keyed aggregation,
      // and payloads never shuffle — image dedup at 100 TB is exactly
      // this: map-side hash, dictionary-sized hash groups.
      "p84_image_dhash_dedup",
      (s, dir) => {
        import s.implicits._
        val imgs = graft.plans.FanOut.byKey( // r15: single-split scan -> serial payload stage (guide 2.5)
            t(s, dir, "documents").select($"doc_id"), $"doc_id").as[Long]
          .mapPartitions(_.map(id =>
            (id, Multimodal.syntheticBmpPattern(id % 50))))
          .toDF("doc_id", "payload")
        Multimodal.dHash(imgs)
          .groupBy($"dhash")
          .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("rep_id"))
          .filter($"n_copies" > 1)
          .orderBy($"dhash")
      },
      Some("""WITH d AS (SELECT doc_id, doc_id % 50 AS seed
             |          FROM documents),
             |seeds AS (SELECT DISTINCT seed FROM d),
             |bits AS (
             |  SELECT seed, y, x,
             |    CASE WHEN (seed*31 + x*7 + y*13) % 256 >
             |              (seed*31 + (x+1)*7 + y*13) % 256
             |      THEN '1' ELSE '0' END AS bit
             |  FROM seeds,
             |    unnest(generate_series(0, 7)) AS gy(y),
             |    unnest(generate_series(0, 7)) AS gx(x)),
             |h AS (SELECT seed, string_agg(bit, '' ORDER BY y, x)
             |        AS dhash
             |      FROM bits GROUP BY seed),
             |g AS (SELECT d.doc_id, h.dhash FROM d JOIN h USING (seed))
             |SELECT dhash, COUNT(*) AS n_copies, MIN(doc_id) AS rep_id
             |FROM g GROUP BY dhash HAVING COUNT(*) > 1
             |ORDER BY dhash""".stripMargin)),

    QueryDef(
      // ACOUSTIC-FINGERPRINT AUDIO DEDUP, oracle-checked through a REAL
      // PCM WAV decode — the audio leg of the perceptual-dedup trio
      // (p84 images, p71 video): payloads are deterministic 17-block
      // clips (block w of seed s has amplitude ((s*37 + w*11) mod 100)
      // * 300, seed = doc_id mod 40), the engine parses actual RIFF
      // bytes and hashes the loudness contour, and DuckDB replays the
      // closed-form amplitude arithmetic to the SAME 16-char bit
      // strings and dedup groups. Window slices align 1:1 with the
      // blocks (17*64 frames), so the contour comparisons are exact
      // integer; payloads never shuffle, the dedup is one hash-keyed
      // aggregation.
      "p85_audio_fingerprint_dedup",
      (s, dir) => {
        import s.implicits._
        val clips = graft.plans.FanOut.byKey( // r15: single-split scan -> serial payload stage (guide 2.5)
            t(s, dir, "documents").select($"doc_id"), $"doc_id").as[Long]
          .mapPartitions(_.map(id =>
            (id, Multimodal.syntheticWavPattern(id % 40))))
          .toDF("doc_id", "payload")
        Multimodal.audioFingerprint(clips, nWindows = 17)
          .groupBy($"afp")
          .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("rep_id"))
          .filter($"n_copies" > 1)
          .orderBy($"afp")
      },
      Some("""WITH d AS (SELECT doc_id, doc_id % 40 AS seed
             |          FROM documents),
             |seeds AS (SELECT DISTINCT seed FROM d),
             |bits AS (
             |  SELECT seed, w,
             |    CASE WHEN (seed*37 + w*11) % 100 >
             |              (seed*37 + (w+1)*11) % 100
             |      THEN '1' ELSE '0' END AS bit
             |  FROM seeds, unnest(generate_series(0, 15)) AS g(w)),
             |h AS (SELECT seed, string_agg(bit, '' ORDER BY w) AS afp
             |      FROM bits GROUP BY seed),
             |g2 AS (SELECT d.doc_id, h.afp FROM d JOIN h USING (seed))
             |SELECT afp, COUNT(*) AS n_copies, MIN(doc_id) AS rep_id
             |FROM g2 GROUP BY afp HAVING COUNT(*) > 1
             |ORDER BY afp""".stripMargin)),

    QueryDef(
      // IMAGE NEAR-DUP (hamming <= 2 over dHash) — p84 catches
      // byte-identical images; this catches the retouched copy: docs
      // with doc_id % 7 == 0 carry a one-cell-brightened variant of
      // their base pattern (seed = doc_id % 30), which flips at most
      // the two dHash comparisons touching that cell. Pairing runs at
      // HASH granularity (the corpus first collapses to its distinct
      // hash dictionary) with the SimHash pigeonhole: 4 chunks of 16
      // bits — any two hashes within hamming 3 share >= 1 chunk, so
      // the candidate join is chunk-keyed EQUI, never all-pairs; exact
      // hamming then filters to <= 2. The oracle replays the perturbed
      // pixel arithmetic and does the naive all-pairs hamming (fine at
      // oracle scale — which is the point of the chunk index). Both
      // engines must produce the identical pair set.
      "p86_image_neardup",
      (s, dir) => {
        import s.implicits._
        val imgs = graft.plans.FanOut.byKey( // r15: single-split scan -> serial payload stage (guide 2.5)
            t(s, dir, "documents").select($"doc_id"), $"doc_id").as[Long]
          .mapPartitions(_.map { id =>
            val seed = id % 30
            val payload =
              if (id % 7 == 0) Multimodal.syntheticBmpPattern(seed, 3, 4, 64)
              else Multimodal.syntheticBmpPattern(seed)
            (id, payload)
          })
          .toDF("doc_id", "payload")
        val groups = Multimodal.dHash(imgs)
          .groupBy($"dhash")
          .agg(count(lit(1)).as("n"), min($"doc_id").as("rep"))
        val chunks = groups.select($"dhash")
          .select($"dhash", explode(sequence(lit(0), lit(3))).as("pos"))
          .select($"dhash", $"pos",
            expr("substring(dhash, pos * 16 + 1, 16)").as("chunk"))
        val cand = chunks.as("a").join(chunks.as("b"),
            col("a.pos") === col("b.pos") &&
              col("a.chunk") === col("b.chunk") &&
              col("a.dhash") < col("b.dhash"))
          .select(col("a.dhash").as("ha"), col("b.dhash").as("hb"))
          .distinct()
        // native codegen'd byte loop (StringHamming) — the HOF
        // aggregate over 64 positions is CodegenFallback, which counts
        // when the candidate frame is billions of pairs
        val pairs = cand.withColumn("hamming",
          graft.functions.VectorFunctions.bits_hamming($"ha", $"hb"))
          .filter($"hamming" <= 2)
        pairs
          .join(groups.select($"dhash".as("ha"), $"n".as("n_a"),
            $"rep".as("rep_a")), Seq("ha"))
          .join(groups.select($"dhash".as("hb"), $"n".as("n_b"),
            $"rep".as("rep_b")), Seq("hb"))
          .select($"rep_a", $"rep_b", $"hamming", $"n_a", $"n_b")
          .orderBy($"rep_a", $"rep_b")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, doc_id % 30 AS seed,
             |    doc_id % 7 = 0 AS pert
             |  FROM documents),
             |variants AS (SELECT DISTINCT seed, pert FROM d),
             |px AS (
             |  SELECT seed, pert, y, x,
             |    CASE WHEN pert AND x = 3 AND y = 4
             |      THEN (seed*31 + x*7 + y*13 + 64) % 256
             |      ELSE (seed*31 + x*7 + y*13) % 256 END AS v
             |  FROM variants,
             |    unnest(generate_series(0, 7)) AS gy(y),
             |    unnest(generate_series(0, 8)) AS gx(x)),
             |bits AS (
             |  SELECT a.seed, a.pert, a.y, a.x,
             |    CASE WHEN a.v > c.v THEN '1' ELSE '0' END AS bit
             |  FROM px a JOIN px c ON c.seed = a.seed AND c.pert = a.pert
             |    AND c.y = a.y AND c.x = a.x + 1
             |  WHERE a.x < 8),
             |h AS (
             |  SELECT seed, pert, string_agg(bit, '' ORDER BY y, x)
             |    AS dhash
             |  FROM bits GROUP BY seed, pert),
             |dh AS (
             |  SELECT d.doc_id, h.dhash
             |  FROM d JOIN h ON h.seed = d.seed AND h.pert = d.pert),
             |groups AS (
             |  SELECT dhash, COUNT(*) AS n, MIN(doc_id) AS rep
             |  FROM dh GROUP BY dhash),
             |ham AS (
             |  SELECT a.dhash AS ha, b.dhash AS hb,
             |    SUM(CASE WHEN substr(a.dhash, i, 1) <>
             |      substr(b.dhash, i, 1) THEN 1 ELSE 0 END) AS hamming
             |  FROM groups a JOIN groups b ON a.dhash < b.dhash,
             |    unnest(generate_series(1, 64)) AS g(i)
             |  GROUP BY 1, 2)
             |SELECT ga.rep AS rep_a, gb.rep AS rep_b,
             |  CAST(hamming AS INT) AS hamming,
             |  ga.n AS n_a, gb.n AS n_b
             |FROM ham
             |  JOIN groups ga ON ga.dhash = ham.ha
             |  JOIN groups gb ON gb.dhash = ham.hb
             |WHERE hamming <= 2
             |ORDER BY rep_a, rep_b""".stripMargin)),

    QueryDef(
      // DETERMINISTIC MASK AUGMENTATION — the (input, target) pair
      // factory for masked-LM pretraining, with NO RNG state: token i
      // of a doc is masked iff the first hex char of
      // md5(doc_id || '_' || i) is '0' or '1' (a 12.5% rate decided by
      // key-equidistributed hashing), so two runs — or two engines —
      // produce byte-identical corpora. The proof compares md5 digests
      // of the rebuilt input (masked tokens replaced by <mask>) and
      // target (the masked tokens, in order): DuckDB must reconstruct
      // the exact same strings from the same arithmetic. Pure per-row
      // work — tokens never shuffle (the only aggregation is per-doc,
      // bounded by document length), augmentation at 100 TB is
      // embarrassingly map-side.
      "p87_mask_augmentation",
      (s, dir) => {
        import s.implicits._
        val toks = t(s, dir, "documents")
          .filter($"text".isNotNull && $"text" =!= "")
          .select($"doc_id",
            posexplode(split($"text", " ")).as(Seq("i", "tok")))
          .withColumn("m",
            substring(md5(concat_ws("_", $"doc_id", $"i")), 1, 1)
              .isin("0", "1"))
        toks.groupBy($"doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when($"m", 1L).otherwise(0L)).as("n_masked"),
            md5(array_join(transform(
              array_sort(collect_list(struct($"i",
                when($"m", lit("<mask>")).otherwise($"tok").as("v")))),
              x => x.getField("v")), " ")).as("input_hash"),
            md5(array_join(transform(
              array_sort(collect_list(when($"m",
                struct($"i", $"tok".as("v"))))),
              x => x.getField("v")), " ")).as("target_hash"))
          .withColumn("mask_ppm", expr("n_masked * 1000000 DIV n_tokens"))
          .orderBy($"doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, string_split(text, ' ') AS ts
             |  FROM documents
             |  WHERE text IS NOT NULL AND text <> ''),
             |tok AS (
             |  SELECT doc_id, i - 1 AS i, ts[i] AS t,
             |    substr(md5(CAST(doc_id AS VARCHAR) || '_' ||
             |      CAST(i - 1 AS VARCHAR)), 1, 1) IN ('0', '1') AS m
             |  FROM d, unnest(generate_series(1, len(ts))) AS g(i))
             |SELECT doc_id, COUNT(*) AS n_tokens,
             |  CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_masked,
             |  md5(string_agg(CASE WHEN m THEN '<mask>' ELSE t END,
             |    ' ' ORDER BY i)) AS input_hash,
             |  md5(COALESCE(string_agg(CASE WHEN m THEN t END,
             |    ' ' ORDER BY i), '')) AS target_hash,
             |  CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) * 1000000
             |    // COUNT(*) AS BIGINT) AS mask_ppm
             |FROM tok
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin))
  )
}
