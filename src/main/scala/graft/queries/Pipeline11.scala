package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Eleventh pipeline batch — audit-surface completions, all
  * integer-exact on both engines (the p124/p153 release-gate family and
  * the p136 quantizer-ladder discipline):
  *
  *  - t-closeness (Li, Li & Venkatasubramanian ICDE 2007, public): the
  *    privacy gate PAST l-diversity — a class can be diverse yet still
  *    leak when its sensitive-attribute DISTRIBUTION deviates from the
  *    corpus's. For a categorical attribute the earth-mover distance
  *    reduces to total variation, which is exact integer arithmetic.
  *  - PSI drift (population stability index — the standard model-ops
  *    distribution-shift score, public): Σ (p−q)·ln(p/q) between the
  *    baseline and current bin shares, made EXACT by scoring in ppm
  *    shares and the shared square-and-extract log2 quantizer instead
  *    of libm logs.
  *  - Flesch–Kincaid readability (Kincaid et al. 1975, public): the
  *    grade-level quality signal every curriculum/mixing planner wants
  *    next to the Gopher-style stats — exact via integer milli-grades
  *    and a regex vowel-run syllable count both engines replay.
  *  - HITS hubs/authorities (Kleinberg 1999, public): the bipartite
  *    centrality complement of p49's PageRank — replayed EXACTLY by
  *    integer max-normalized iterations as chained CTEs.
  */
object Pipeline11 {
  import graft.Tables.t

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // T-CLOSENESS AUDIT: per quasi-identifier class (p124's
      // (source, length-bucket) convention), the total-variation
      // distance between the class's lang distribution and the
      // corpus-global one, in ppm — the release gate past p153's
      // l-diversity (a class can hold 3 distinct langs and still be
      // 95% one of them while the corpus is uniform; t-closeness is
      // what catches that). EXACT: tv = Σ_lang |c_l·N − g_l·n| ·10^6
      // DIV (2·n·N) — one cross-multiplied absolute sum, ONE floor
      // division at the end, mirrored. Products ride DECIMAL(38,0) /
      // HUGEINT (c·N reaches N² ≈ 10^18 at 10^9 docs — the p152
      // wide-integer discipline), so the arithmetic is exact at any
      // corpus size. Scale shape: one (source, bucket, lang) count
      // shuffle; the class × lang expansion is (identifier domain ×
      // lang dictionary)-sized, broadcast-joined; rollup per source.
      "p156_t_closeness",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val cells = docs
          .groupBy($"source", expr("n_chars DIV 100").as("bucket"), $"lang")
          .agg(count(lit(1)).as("c"))
        val classes = cells.groupBy($"source", $"bucket")
          .agg(sum($"c").as("n"))
        val global = docs.groupBy($"lang").agg(count(lit(1)).as("g"))
        val corpus = docs.agg(count(lit(1)).as("nn"))
        val tcls = classes.crossJoin(broadcast(global))
          .join(cells, Seq("source", "bucket", "lang"), "left")
          .crossJoin(broadcast(corpus))
          .select($"source", $"bucket", $"n", $"nn",
            abs(coalesce($"c", lit(0L)).cast("decimal(38,0)") * $"nn" -
              $"g".cast("decimal(38,0)") * $"n").as("term"))
          .groupBy($"source", $"bucket", $"n", $"nn")
          .agg(sum($"term").as("emd_num"))
          .select($"source", $"bucket", $"n",
            expr("CAST((emd_num * 1000000) DIV " +
              "(CAST(nn AS DECIMAL(38,0)) * n * 2) AS BIGINT)").as("t_ppm"))
        tcls.groupBy($"source")
          .agg(count(lit(1)).as("n_classes"),
            sum($"n").as("n_rows"),
            max($"t_ppm").as("worst_t_ppm"),
            sum(when($"t_ppm" > 300000, 1L).otherwise(0L))
              .as("n_wide_classes"),
            sum(when($"t_ppm" > 300000, $"n").otherwise(0L))
              .as("n_wide_rows"))
          .select($"source", $"n_classes", $"n_rows", $"worst_t_ppm",
            $"n_wide_classes", $"n_wide_rows",
            expr("n_wide_rows * 1000000 DIV n_rows").as("risk_ppm"))
          .orderBy($"source")
      },
      Some("""WITH cells AS (
             |  SELECT source, n_chars // 100 AS bucket, lang,
             |    COUNT(*) AS c
             |  FROM documents GROUP BY 1, 2, 3),
             |cls AS (SELECT source, bucket, SUM(c) AS n
             |        FROM cells GROUP BY 1, 2),
             |gl AS (SELECT lang, COUNT(*) AS g FROM documents GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS nn FROM documents),
             |term AS (
             |  SELECT cl.source, cl.bucket, cl.n, t.nn,
             |    ABS(CAST(COALESCE(ce.c, 0) AS HUGEINT) * t.nn
             |        - CAST(gl.g AS HUGEINT) * cl.n) AS term
             |  FROM cls cl CROSS JOIN gl CROSS JOIN tot t
             |  LEFT JOIN cells ce ON ce.source = cl.source
             |    AND ce.bucket = cl.bucket AND ce.lang = gl.lang),
             |tp AS (
             |  SELECT source, bucket, n,
             |    CAST(SUM(term) * 1000000
             |      // (CAST(MAX(nn) AS HUGEINT) * n * 2) AS BIGINT)
             |      AS t_ppm
             |  FROM term GROUP BY 1, 2, 3)
             |SELECT source,
             |  CAST(COUNT(*) AS BIGINT) AS n_classes,
             |  CAST(SUM(n) AS BIGINT) AS n_rows,
             |  CAST(MAX(t_ppm) AS BIGINT) AS worst_t_ppm,
             |  CAST(SUM(CASE WHEN t_ppm > 300000 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_wide_classes,
             |  CAST(SUM(CASE WHEN t_ppm > 300000 THEN n ELSE 0 END)
             |    AS BIGINT) AS n_wide_rows,
             |  CAST(SUM(CASE WHEN t_ppm > 300000 THEN n ELSE 0 END)
             |    * 1000000 // SUM(n) AS BIGINT) AS risk_ppm
             |FROM tp GROUP BY source
             |ORDER BY source""".stripMargin)),

    QueryDef(
      // PSI DISTRIBUTION-DRIFT SCORE per source: the population
      // stability index between the even-doc baseline ("yesterday")
      // and the odd-doc current slice over length-decile bins — the
      // model-ops drift gate that complements p146's KS (KS reads the
      // worst single gap; PSI weights every bin's shift by its log
      // ratio, the industry 0.1/0.25 alert convention). EXACT:
      // shares in ppm (floor DIV, clamped at 1 ppm so the log is
      // defined — GREATEST spelled in both engines), log2 via the
      // shared square-and-extract quantizer, so psi_fix =
      // Σ (p−q)·(lg p − lg q) is integer-identical cross-engine (in
      // ppm·2⁻¹⁶ log2 units; ln-PSI = psi_fix·ln2/(65536·10^6)).
      // Every term is ≥ 0: the quantizer is monotone, so (p−q) and
      // (lg p − lg q) never disagree in sign — the DIV-floor
      // asymmetry on negatives can't bite. Scale shape: bin counts
      // and totals are two partial-aggregable shuffles over
      // (source × bucket)-sized frames; the quantizer is map-side.
      "p157_psi_drift",
      (s, dir) => {
        import s.implicits._
        import graft.functions.UnigramFunctions.ilog2_fix
        val binc = t(s, dir, "documents")
          .select($"source", expr("n_chars DIV 100").as("bucket"),
            ($"doc_id" % 2 === 0).as("is_base"))
          .groupBy($"source", $"bucket", $"is_base")
          .agg(count(lit(1)).as("c"))
        val shares = binc
          .join(binc.groupBy($"source", $"is_base")
            .agg(sum($"c").as("nt")), Seq("source", "is_base"))
          .select($"source", $"bucket", $"is_base",
            greatest(expr("c * 1000000 DIV nt"), lit(1L)).as("ppm"))
        val base = shares.filter($"is_base")
          .select($"source", $"bucket", $"ppm".as("p"))
        val cur = shares.filter(!$"is_base")
          .select($"source", $"bucket", $"ppm".as("q"))
        // a bin present in only one half scores against the 1-ppm
        // clamp on the other side (full outer, the PSI convention for
        // new/vanished bins)
        val terms = base.join(cur, Seq("source", "bucket"), "full")
          .select($"source", $"bucket",
            coalesce($"p", lit(1L)).as("p"), coalesce($"q", lit(1L)).as("q"))
          .select($"source", $"bucket",
            (($"p" - $"q") *
              (ilog2_fix($"p") - ilog2_fix($"q"))).as("term"))
        terms.groupBy($"source")
          .agg(count(lit(1)).as("n_bins"),
            sum($"term").as("psi_fix"),
            max($"term").as("worst_bin_fix"))
          .select($"source", $"n_bins", $"psi_fix",
            expr("psi_fix DIV 65536").as("psi_micro_log2"),
            $"worst_bin_fix")
          .orderBy($"source")
      },
      Some(s"""WITH pw2(k, v) AS (VALUES ${Pipeline9.pw2Values}),
              |binc AS (
              |  SELECT source, n_chars // 100 AS bucket,
              |    doc_id % 2 = 0 AS is_base, COUNT(*) AS c
              |  FROM documents GROUP BY 1, 2, 3),
              |st AS (SELECT source, is_base, SUM(c) AS nt
              |       FROM binc GROUP BY 1, 2),
              |sh AS (
              |  SELECT b.source, b.bucket, b.is_base,
              |    GREATEST(b.c * 1000000 // s.nt, 1) AS ppm
              |  FROM binc b JOIN st s USING (source, is_base)),
              |pb AS MATERIALIZED (
              |  SELECT COALESCE(p.source, q.source) AS source,
              |    COALESCE(p.bucket, q.bucket) AS bucket,
              |    COALESCE(p.ppm, 1) AS p, COALESCE(q.ppm, 1) AS q
              |  FROM (SELECT source, bucket, ppm FROM sh WHERE is_base) p
              |  FULL JOIN (SELECT source, bucket, ppm FROM sh
              |             WHERE NOT is_base) q
              |    ON q.source = p.source AND q.bucket = p.bucket),
              |psrc AS MATERIALIZED (
              |  SELECT source, bucket, p AS x FROM pb),
              |qsrc AS MATERIALIZED (
              |  SELECT source, bucket, q AS x FROM pb),
              |${Pipeline9.ilogCtes("psrc", "source, bucket", "p")},
              |${Pipeline9.ilogCtes("qsrc", "source, bucket", "q")},
              |term AS (
              |  SELECT pb.source, pb.bucket,
              |    (pb.p - pb.q) * (pl.lgf - ql.lgf) AS term
              |  FROM pb
              |  JOIN plg pl ON pl.source = pb.source
              |    AND pl.bucket = pb.bucket
              |  JOIN qlg ql ON ql.source = pb.source
              |    AND ql.bucket = pb.bucket)
              |SELECT source,
              |  CAST(COUNT(*) AS BIGINT) AS n_bins,
              |  CAST(SUM(term) AS BIGINT) AS psi_fix,
              |  CAST(SUM(term) // 65536 AS BIGINT) AS psi_micro_log2,
              |  CAST(MAX(term) AS BIGINT) AS worst_bin_fix
              |FROM term GROUP BY source
              |ORDER BY source""".stripMargin)),

    QueryDef(
      // FLESCH-KINCAID READING GRADE per source, integer-exact: the
      // readability tier a curriculum planner orders training phases
      // by (simple → hard) and a quality gate screens on — computed
      // as milli-grades with every division a mirrored floor DIV.
      // Syllables = vowel-RUN count ([aeiouy]+, the classic
      // approximation), counted by length difference between
      // replacing each run with one '#' and deleting it — pure
      // regexp_replace arithmetic both engines execute identically on
      // this lowercase-ASCII corpus. The corpus has no sentence
      // punctuation, so the sentence unit is the fixed 16-token
      // chunk, S = ceil(W/16) (the p58-family windowing convention) —
      // documented, deterministic, identical on both engines. The
      // per-doc grade sum stays NON-NEGATIVE (raw = 390·W DIV S +
      // 11800·Y DIV W, offset −15590 applied after the mean) so the
      // DIV-vs-floor asymmetry on negatives never appears in a
      // division. Scale shape: map-side scoring, one source-keyed
      // partial-aggregable rollup.
      "p158_readability",
      (s, dir) => {
        import s.implicits._
        val scored = t(s, dir, "documents")
          .filter($"text".isNotNull && $"text" =!= "")
          .select($"source",
            size(split($"text", " ")).cast("long").as("w"),
            (length(regexp_replace($"text", "[aeiouy]+", "#")) -
              length(regexp_replace($"text", "[aeiouy]+", "")))
              .cast("long").as("y"))
          .select($"source", $"w", $"y",
            expr("390 * w DIV ((w + 15) DIV 16) + 11800 * y DIV w")
              .as("raw"))
        scored.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"),
            sum($"raw").as("sraw"),
            min($"raw").as("minraw"),
            max($"raw").as("maxraw"),
            sum(when($"raw" > 27590, 1L).otherwise(0L)).as("hard"))
          .select($"source", $"n_docs",
            expr("sraw DIV n_docs - 15590").as("mean_fk_milli"),
            ($"minraw" - 15590).as("min_fk_milli"),
            ($"maxraw" - 15590).as("max_fk_milli"),
            // grade > 12 (raw > 12000 + 15590): the "hard text" share
            expr("hard * 1000000 DIV n_docs").as("hard_ppm"))
          .orderBy($"source")
      },
      Some("""WITH d AS (
             |  SELECT source, len(string_split(text, ' ')) AS w,
             |    length(regexp_replace(text, '[aeiouy]+', '#', 'g'))
             |      - length(regexp_replace(text, '[aeiouy]+', '', 'g'))
             |      AS y
             |  FROM documents WHERE text IS NOT NULL AND text <> ''),
             |f AS (
             |  SELECT source,
             |    390 * w // ((w + 15) // 16) + 11800 * y // w AS raw
             |  FROM d)
             |SELECT source,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(raw) // COUNT(*) - 15590 AS BIGINT)
             |    AS mean_fk_milli,
             |  CAST(MIN(raw) - 15590 AS BIGINT) AS min_fk_milli,
             |  CAST(MAX(raw) - 15590 AS BIGINT) AS max_fk_milli,
             |  CAST(SUM(CASE WHEN raw > 27590 THEN 1 ELSE 0 END)
             |    * 1000000 // COUNT(*) AS BIGINT) AS hard_ppm
             |FROM f GROUP BY source
             |ORDER BY source""".stripMargin)),

    QueryDef(
      // HITS HUBS/AUTHORITIES over the customer→supplier commerce
      // graph, ORACLE-EXACT (the p49 PageRank discipline applied to
      // Kleinberg's bipartite centrality): customers are pure hubs,
      // suppliers pure authorities, so two half-iterations alternate
      // a_k = Eᵀh_{k-1}, h_k = E·a_k, each max-normalized to the
      // integer milli scale (v·1000 DIV max — floor division, the
      // exact-replay normalizer where a float L2 norm would ride
      // libm). Two full rounds; top-20 authorities by (score, key).
      // Scale shape: each half-iteration is ONE edge-keyed
      // partial-aggregable shuffle + a 1-row max broadcast — node
      // frames only, the graph's payload never moves; degree skew
      // reduces map-side like any count.
      "p159_hits_authorities",
      (s, dir) => {
        import s.implicits._
        // r15: the distinct (c, sp) edge frame now comes from the
        // commercePairs cross-entry memo shared with p49 (at scale the
        // pair graph is computed once and feeds every graph consumer);
        // already materialized by localCheckpoint — the old per-entry
        // .persist() is redundant
        val eu = graft.operators.PageRankOp.commercePairs(s, dir)
        // each score frame feeds its own max aggregate AND the next
        // half-iteration: the shared operator persists it
        // (node-dictionary-sized) or the recomputation DOUBLES per
        // level — measured 5.2s -> 3.8s at sf0.1 (a1 was evaluated 8x
        // through the a2 chain unpersisted; the remaining cost is the
        // edge build itself, shared with p49). The golden spec drives
        // the SAME operator, so helper drift cannot dodge it.
        def normalized(scores0: org.apache.spark.sql.DataFrame,
            valCol: String): org.apache.spark.sql.DataFrame =
          graft.operators.GraphOps.maxNormalizedMilli(scores0, valCol)
        val a1 = normalized(
          eu.groupBy($"sp").agg((count(lit(1)) * 1000L).as("a")), "a")
        val h1 = normalized(
          eu.join(a1, Seq("sp")).groupBy($"c").agg(sum($"a").as("h")), "h")
        val a2 = normalized(
          eu.join(h1, Seq("c")).groupBy($"sp").agg(sum($"h").as("a")), "a")
        a2.select($"sp".cast("long").as("supp_key"),
            $"a".cast("long").as("auth_milli"))
          .orderBy($"auth_milli".desc, $"supp_key")
          .limit(20)
      },
      Some("""WITH eu AS (
             |  SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |a1 AS (SELECT sp, 1000 * COUNT(*) AS a FROM eu GROUP BY sp),
             |a1m AS (SELECT MAX(a) AS m FROM a1),
             |a1n AS (SELECT sp, a * 1000 // m AS a FROM a1, a1m),
             |h1 AS (SELECT eu.c, SUM(a1n.a) AS h
             |       FROM eu JOIN a1n USING (sp) GROUP BY eu.c),
             |h1m AS (SELECT MAX(h) AS m FROM h1),
             |h1n AS (SELECT c, h * 1000 // m AS h FROM h1, h1m),
             |a2 AS (SELECT eu.sp, SUM(h1n.h) AS a
             |       FROM eu JOIN h1n USING (c) GROUP BY eu.sp),
             |a2m AS (SELECT MAX(a) AS m FROM a2),
             |a2n AS (SELECT sp, a * 1000 // m AS a FROM a2, a2m)
             |SELECT CAST(sp AS BIGINT) AS supp_key,
             |  CAST(a AS BIGINT) AS auth_milli
             |FROM a2n
             |ORDER BY auth_milli DESC, supp_key
             |LIMIT 20""".stripMargin)),

    QueryDef(
      // ASYMMETRIC CONTAINMENT DEDUP (Broder 1997's second resemblance
      // measure, public): doc-in-doc pairs — a quote embedded verbatim
      // in a much larger article scores containment 1.0 while its
      // Jaccard sits under every p07-family threshold. The fixture
      // carries 25 fully-contained pairs at sf0.01 that NO symmetric
      // entry reports; this is the operator that catches
      // quote-inclusion, page-within-crawl and version-superset dups.
      // Output is oriented (id_in = the contained side) with exact
      // integer ppm containment and Jaccard — floor divisions
      // mirrored, so the entry hash-gates at any scale. Scale shape:
      // the p07 inverted index (DF-capped, ids-only candidate pairs,
      // singleton shingles pruned); the orientation pick is
      // integer-compare map-side, no extra shuffle.
      "p160_containment_dedup",
      (s, dir) => {
        import s.implicits._
        graft.operators.Dedup.containmentPairs(t(s, dir, "documents"),
            "doc_id", "text", minContainmentPpm = 250000L,
            maxShingleDf = Pipeline.JaccardMaxDf)
          .orderBy($"id_in", $"id_of")
      },
      Some(s"""WITH ${Pipeline.jaccardCommonCtes},
              |sc AS (
              |  SELECT id_a, id_b, n_common,
              |    na.n_sh AS n_a, nb.n_sh AS n_b,
              |    n_common * 1000000 // na.n_sh AS ca,
              |    n_common * 1000000 // nb.n_sh AS cb
              |  FROM common
              |  JOIN nsh na ON na.id = id_a
              |  JOIN nsh nb ON nb.id = id_b)
              |SELECT
              |  CASE WHEN ca >= cb THEN id_a ELSE id_b END AS id_in,
              |  CASE WHEN ca >= cb THEN id_b ELSE id_a END AS id_of,
              |  CAST(CASE WHEN ca >= cb THEN n_a ELSE n_b END AS BIGINT)
              |    AS n_in,
              |  CAST(CASE WHEN ca >= cb THEN n_b ELSE n_a END AS BIGINT)
              |    AS n_of,
              |  CAST(GREATEST(ca, cb) AS BIGINT) AS cont_ppm,
              |  CAST(n_common * 1000000 // (n_a + n_b - n_common)
              |    AS BIGINT) AS jacc_ppm
              |FROM sc
              |WHERE GREATEST(ca, cb) >= 250000
              |ORDER BY id_in, id_of""".stripMargin)),

    QueryDef(
      // MAUVE-STYLE DIVERGENCE FRONTIER (Pillutla et al. NeurIPS 2021,
      // public — the two-corpus distributional-similarity score): the
      // even-id embedding half plays the "model sample" P, the odd
      // half the "reference" Q; both histogram over the SHARED k-means
      // quantization (the memoized k=4/iters=3 model p47/p99/p107
      // read), and the score is the pair of KL divergences to the
      // mixture M = (P+Q)/2 — the frontier point at mixture weight
      // 1/2. EXACT: cluster shares in ppm clamped ≥ 1, M by integer
      // mean (clamped), logs through the shared ilog2 quantizer,
      // per-cluster signed terms p·(lg p − lg m) (quantization can dip
      // a term slightly negative — the p136 precedent; no division
      // ever sees a negative). Scale shape: histograms are ONE
      // cluster-keyed count shuffle over the assignment frame; the
      // k-row dictionary does everything else map-side.
      "p161_mauve_frontier",
      (s, dir) => {
        import s.implicits._
        import graft.functions.UnigramFunctions.ilog2_fix
        val counts = Pipeline.fittedKmeansAssigned(s, dir, 4, 3)
          .select($"cluster".cast("long").as("cluster"),
            ($"vec_id" % 2 === 0).as("is_p"))
          .groupBy($"cluster", $"is_p").agg(count(lit(1)).as("c"))
        val shares = counts
          .join(counts.groupBy($"is_p").agg(sum($"c").as("nt")),
            Seq("is_p"))
          .select($"cluster", $"is_p",
            greatest(expr("c * 1000000 DIV nt"), lit(1L)).as("ppm"))
        val pq = shares.filter($"is_p")
          .select($"cluster", $"ppm".as("p"))
          .join(shares.filter(!$"is_p")
            .select($"cluster", $"ppm".as("q")), Seq("cluster"), "full")
          .select($"cluster",
            coalesce($"p", lit(1L)).as("p"), coalesce($"q", lit(1L)).as("q"))
          .select($"cluster", $"p", $"q",
            greatest(expr("(p + q) DIV 2"), lit(1L)).as("m"))
        val terms = pq.select($"cluster", $"p", $"q", $"m",
          ($"p" * (ilog2_fix($"p") - ilog2_fix($"m"))).as("kp_term"),
          ($"q" * (ilog2_fix($"q") - ilog2_fix($"m"))).as("kq_term"))
        terms.crossJoin(broadcast(terms.agg(
            sum($"kp_term").as("kl_p_fix"), sum($"kq_term").as("kl_q_fix"))))
          .select($"cluster", $"p", $"q", $"m", $"kp_term", $"kq_term",
            $"kl_p_fix", $"kl_q_fix")
          .orderBy($"cluster")
      },
      Some {
        val (ctes, asg) = graft.operators.KMeansOp.assignCtes(4, 3)
        s"""WITH pw2(k, v) AS (VALUES ${Pipeline9.pw2Values}),
           |$ctes,
           |cnt AS (
           |  SELECT CAST(cell AS BIGINT) AS cluster,
           |    vec_id % 2 = 0 AS is_p, COUNT(*) AS c
           |  FROM $asg GROUP BY 1, 2),
           |tt AS (SELECT is_p, SUM(c) AS nt FROM cnt GROUP BY 1),
           |shr AS (
           |  SELECT cluster, is_p,
           |    GREATEST(c * 1000000 // nt, 1) AS ppm
           |  FROM cnt JOIN tt USING (is_p)),
           |pq AS MATERIALIZED (
           |  SELECT COALESCE(pp.cluster, qq.cluster) AS cluster,
           |    COALESCE(pp.ppm, 1) AS p, COALESCE(qq.ppm, 1) AS q,
           |    GREATEST((COALESCE(pp.ppm, 1) + COALESCE(qq.ppm, 1)) // 2,
           |      1) AS m
           |  FROM (SELECT cluster, ppm FROM shr WHERE is_p) pp
           |  FULL JOIN (SELECT cluster, ppm FROM shr WHERE NOT is_p) qq
           |    ON qq.cluster = pp.cluster),
           |lsrc AS MATERIALIZED (
           |  SELECT cluster, 'p' AS wh, p AS x FROM pq
           |  UNION ALL SELECT cluster, 'q', q FROM pq
           |  UNION ALL SELECT cluster, 'm', m FROM pq),
           |${Pipeline9.ilogCtes("lsrc", "cluster, wh", "l")},
           |lg3 AS (
           |  SELECT cluster,
           |    MAX(CASE WHEN wh = 'p' THEN lgf END) AS lp,
           |    MAX(CASE WHEN wh = 'q' THEN lgf END) AS lq,
           |    MAX(CASE WHEN wh = 'm' THEN lgf END) AS lm
           |  FROM llg GROUP BY cluster),
           |term AS (
           |  SELECT pq.cluster, pq.p, pq.q, pq.m,
           |    pq.p * (g.lp - g.lm) AS kp_term,
           |    pq.q * (g.lq - g.lm) AS kq_term
           |  FROM pq JOIN lg3 g USING (cluster)),
           |tot AS (
           |  SELECT CAST(SUM(kp_term) AS BIGINT) AS kl_p_fix,
           |    CAST(SUM(kq_term) AS BIGINT) AS kl_q_fix
           |  FROM term)
           |SELECT cluster, CAST(p AS BIGINT) AS p, CAST(q AS BIGINT) AS q,
           |  CAST(m AS BIGINT) AS m,
           |  CAST(kp_term AS BIGINT) AS kp_term,
           |  CAST(kq_term AS BIGINT) AS kq_term,
           |  tot.kl_p_fix, tot.kl_q_fix
           |FROM term CROSS JOIN tot
           |ORDER BY cluster""".stripMargin
      }),

    QueryDef(
      // DOMINANT PRINCIPAL DIRECTION of the embedding corpus via EXACT
      // integer power iteration (the PCA-lite every embedding-quality
      // audit wants: a corpus whose top direction eats most of the
      // variance is anisotropic/collapsed — Ethayarajh 2019's finding,
      // public — and mean-centering + top-direction removal is the
      // standard embedding post-process). Centering WITHOUT division:
      // iterate on the SCATTER matrix M = n·Σxxᵀ − SSᵀ (= n²·Cov, and
      // positive scaling does not move eigenvectors). Everything is
      // integer end-to-end: components quantize to micro-units
      // x_u = floor(x·10⁶) FIRST (one FLOOR both engines own), so
      // every downstream sum/product is exact integer — no decimal
      // ladder semantics to mismatch. Two iterations from the all-ones
      // vector; normalization is max-|component| to milli scale with
      // the SIGN-SAFE floor (negate-divide-negate, because DIV
      // truncates toward zero while // floors — on negatives they
      // disagree, so neither ever sees one). Scale shape: the 64×64
      // cell frame builds MAP-SIDE from each row's own array (4096
      // partial-aggregable cells, the p152 scatter discipline);
      // iterations run on the 4096-row dictionary; sums ride
      // DECIMAL(38,0)/HUGEINT (n·Σx_u² reaches ~10¹⁸ at sf0.1 —
      // BIGINT would already be on the edge, and 100 TB is ~10²⁴).
      "p162_principal_direction",
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "embeddings")
          .filter($"embedding".isNotNull)
          .withColumn("xu", expr(
            "transform(embedding, x -> " +
              "CAST(FLOOR(CAST(x AS DECIMAL(18,9)) * 1000000) AS BIGINT))"))
          .persist() // three corpus reads: n, per-dim sums, pair cells
        val nn = base.agg(count(lit(1)).cast("decimal(38,0)").as("n"))
        val sx = base
          .select(posexplode($"xu").as(Seq("d", "x")))
          .groupBy($"d").agg(sum($"x").cast("decimal(38,0)").as("sx"))
        // pair cells via a SELF-JOIN on vec_id, not a nested
        // transform/flatten lambda: higher-order functions are
        // CodegenFallback (interpreted, one GenericInternalRow per
        // struct — measured 8s for the 8.2M structs at sf0.1) while
        // the join + hash aggregate stay inside whole-stage codegen.
        // The join fans each vector's 64 rows to 4096 pair rows that
        // reduce map-side into the 4096-cell dictionary. Exactness at
        // scale WITHOUT a per-row decimal accumulator (measured ~1s of
        // the stage): TWO-LEVEL sum — long partials per 4096-vector
        // id-group (|x_u| ≤ 10⁶ ⇒ group partial ≤ 4096·10¹² ≈ 4·10¹⁵,
        // long-safe), then the group partials sum in DECIMAL(38,0),
        // which is what 10⁹-vector totals need (the packedBins
        // prefix-sum discipline applied to a matrix sum).
        val elx = base.select($"vec_id",
          expr("vec_id DIV 4096").as("g"),
          posexplode($"xu").as(Seq("d", "x")))
        val sxx = elx.as("a").join(elx.as("b"), "vec_id")
          .groupBy($"a.g".as("g"), $"a.d".as("di"), $"b.d".as("dj"))
          .agg(sum($"a.x" * $"b.x").as("ps"))
          .groupBy($"di", $"dj")
          .agg(sum($"ps".cast("decimal(38,0)")).as("sxx"))
        val m = sxx
          .join(sx.select($"d".as("di"), $"sx".as("sxi")), Seq("di"))
          .join(sx.select($"d".as("dj"), $"sx".as("sxj")), Seq("dj"))
          .crossJoin(broadcast(nn))
          .select($"di", $"dj", ($"n" * $"sxx" - $"sxi" * $"sxj").as("m"))
          .persist() // both iterations read the 4096-cell dictionary
        def step(v: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame = {
          val w = m.join(v.select($"d".as("dj"), $"v"), Seq("dj"))
            .groupBy($"di".as("d"))
            .agg(sum($"m" * $"v").as("w"))
            .persist() // feeds its own max-abs AND the normalize
          w.crossJoin(broadcast(
              w.agg(greatest(max(abs($"w")), lit(1L).cast("decimal(38,0)"))
                .as("mx"))))
            .select($"d", expr(
              "CASE WHEN w < 0 THEN -(((-w) * 1000) DIV mx) " +
                "ELSE (w * 1000) DIV mx END").as("v"))
        }
        val v0 = sx.select($"d", lit(1000L).cast("decimal(38,0)").as("v"))
        val v1 = step(v0)
        val v2 = step(v1.select($"d", $"v".cast("decimal(38,0)").as("v")))
        v1.select($"d".cast("long").as("dim"),
            $"v".cast("long").as("v1_milli"))
          .join(v2.select($"d".cast("long").as("dim"),
            $"v".cast("long").as("v2_milli")), Seq("dim"))
          .orderBy($"dim")
      },
      Some("""WITH el AS (
             |  SELECT vec_id,
             |    CAST(generate_subscripts(embedding, 1) AS INT) - 1 AS d,
             |    CAST(FLOOR(CAST(unnest(embedding) AS DECIMAL(18,9))
             |      * 1000000) AS BIGINT) AS xu
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n
             |       FROM embeddings WHERE embedding IS NOT NULL),
             |sx AS (SELECT d, CAST(SUM(xu) AS HUGEINT) AS sx
             |       FROM el GROUP BY d),
             |sxx AS (
             |  SELECT a.d AS di, b.d AS dj,
             |    CAST(SUM(CAST(a.xu AS HUGEINT) * b.xu) AS HUGEINT) AS sxx
             |  FROM el a JOIN el b USING (vec_id) GROUP BY 1, 2),
             |m AS MATERIALIZED (
             |  SELECT s.di, s.dj, nn.n * s.sxx - a.sx * b.sx AS m
             |  FROM sxx s
             |  JOIN sx a ON a.d = s.di
             |  JOIN sx b ON b.d = s.dj, nn),
             |v0 AS (SELECT d, CAST(1000 AS HUGEINT) AS v FROM sx),
             |w1 AS (SELECT m.di AS d, SUM(m.m * v.v) AS w
             |       FROM m JOIN v0 v ON v.d = m.dj GROUP BY 1),
             |w1m AS (SELECT GREATEST(MAX(ABS(w)), 1) AS mx FROM w1),
             |v1 AS (SELECT d,
             |    CASE WHEN w < 0 THEN -(((-w) * 1000) // mx)
             |         ELSE (w * 1000) // mx END AS v
             |  FROM w1, w1m),
             |w2 AS (SELECT m.di AS d, SUM(m.m * v.v) AS w
             |       FROM m JOIN v1 v ON v.d = m.dj GROUP BY 1),
             |w2m AS (SELECT GREATEST(MAX(ABS(w)), 1) AS mx FROM w2),
             |v2 AS (SELECT d,
             |    CASE WHEN w < 0 THEN -(((-w) * 1000) // mx)
             |         ELSE (w * 1000) // mx END AS v
             |  FROM w2, w2m)
             |SELECT CAST(v1.d AS BIGINT) AS dim,
             |  CAST(v1.v AS BIGINT) AS v1_milli,
             |  CAST(v2.v AS BIGINT) AS v2_milli
             |FROM v1 JOIN v2 USING (d)
             |ORDER BY dim""".stripMargin)),

    QueryDef(
      // HOURLY PSI DRIFT (p157 run as a MONITOR — the p154/p126
      // convention applied to the distribution-shift score): baseline
      // bucket shares from the even-doc split ("yesterday"), PSI per
      // synthetic ingest hour over the odd-doc arrivals. Buckets are
      // the CLOSED 10-bucket domain least(9, n_chars DIV 100) — the
      // fixed dictionary that lets the streaming twin
      // (TokenStreams.psiDriftStream, pinned stream == batch against
      // THIS entry) compute the whole score inside one watermarked
      // windowed aggregation. Absent buckets score through the 1-ppm
      // clamp on either side. Same exactness as p157: ppm floor
      // shares, shared ilog2 ladders, every term ≥ 0. Scale shape:
      // one (hour, bucket) count shuffle; the hour × 10-bucket spine
      // is dictionary-sized.
      "p163_psi_drift_hourly",
      (s, dir) => {
        import s.implicits._
        import graft.functions.UnigramFunctions.ilog2_fix
        val docs = t(s, dir, "documents")
          .select($"doc_id", expr("least(9L, n_chars DIV 100)").as("bucket"))
        val base = docs.filter($"doc_id" % 2 === 0)
        val buckets = (0L to 9L).toDF("b")
        val bq = buckets
          .join(base.groupBy($"bucket".as("b"))
            .agg(count(lit(1)).as("bc")), Seq("b"), "left")
          .crossJoin(broadcast(base.agg(count(lit(1)).as("bn"))))
          .select($"b",
            greatest(expr("coalesce(bc, 0) * 1000000 DIV bn"), lit(1L))
              .as("q"))
        val cnt = docs.filter($"doc_id" % 2 === 1)
          .withColumn("w", expr(
            "date_trunc('hour', timestamp_seconds(" +
              "1767225600 + (doc_id * 97) % 172800))"))
          .groupBy($"w", $"bucket").agg(count(lit(1)).as("c"))
        val cell = cnt.groupBy($"w").agg(sum($"c").as("n"))
          .crossJoin(broadcast(buckets))
          .join(cnt.select($"w", $"bucket".as("b"), $"c"),
            Seq("w", "b"), "left")
          .select($"w", $"b", $"n",
            greatest(expr("coalesce(c, 0) * 1000000 DIV n"), lit(1L))
              .as("p"))
        cell.join(broadcast(bq), Seq("b"))
          .select($"w", $"n",
            (($"p" - $"q") * (ilog2_fix($"p") - ilog2_fix($"q")))
              .as("term"))
          .groupBy($"w")
          .agg(max($"n").as("n_docs"), sum($"term").as("psi_fix"))
          .select($"w".as("w_start"), $"n_docs", $"psi_fix",
            expr("psi_fix DIV 65536").as("psi_micro_log2"))
          .orderBy($"w_start")
      },
      Some(s"""WITH pw2(k, v) AS (VALUES ${Pipeline9.pw2Values}),
              |d AS (SELECT doc_id, LEAST(9, n_chars // 100) AS bucket
              |      FROM documents),
              |bb AS (SELECT bucket, COUNT(*) AS bc FROM d
              |       WHERE doc_id % 2 = 0 GROUP BY 1),
              |bt AS (SELECT COUNT(*) AS bn FROM d WHERE doc_id % 2 = 0),
              |sp(b) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9)),
              |bq AS (
              |  SELECT sp.b,
              |    GREATEST(COALESCE(bb.bc, 0) * 1000000 // bt.bn, 1) AS q
              |  FROM sp CROSS JOIN bt LEFT JOIN bb ON bb.bucket = sp.b),
              |cnt AS (
              |  SELECT date_trunc('hour',
              |      to_timestamp(1767225600 + (doc_id * 97) % 172800)
              |        ::TIMESTAMP) AS w,
              |    bucket, COUNT(*) AS c
              |  FROM d WHERE doc_id % 2 = 1 GROUP BY 1, 2),
              |ht AS (SELECT w, SUM(c) AS n FROM cnt GROUP BY 1),
              |cell AS MATERIALIZED (
              |  SELECT ht.w, sp.b, ht.n,
              |    GREATEST(COALESCE(c.c, 0) * 1000000 // ht.n, 1) AS p
              |  FROM ht CROSS JOIN sp
              |  LEFT JOIN cnt c ON c.w = ht.w AND c.bucket = sp.b),
              |psrc AS MATERIALIZED (SELECT w, b, p AS x FROM cell),
              |${Pipeline9.ilogCtes("psrc", "w, b", "p")},
              |qsrc AS MATERIALIZED (SELECT b, q AS x FROM bq),
              |${Pipeline9.ilogCtes("qsrc", "b", "q")},
              |term AS (
              |  SELECT cell.w, cell.n,
              |    (cell.p - bq.q) * (pl.lgf - ql.lgf) AS term
              |  FROM cell JOIN bq USING (b)
              |  JOIN plg pl ON pl.w = cell.w AND pl.b = cell.b
              |  JOIN qlg ql ON ql.b = cell.b)
              |SELECT w AS w_start, CAST(MAX(n) AS BIGINT) AS n_docs,
              |  CAST(SUM(term) AS BIGINT) AS psi_fix,
              |  CAST(SUM(term) // 65536 AS BIGINT) AS psi_micro_log2
              |FROM term GROUP BY w
              |ORDER BY w_start""".stripMargin)),

    QueryDef(
      // SPLIT-CONFORMAL COVERAGE AUDIT (Vovk et al.; Lei et al. JASA
      // 2018, public — the distribution-free uncertainty wrapper every
      // model-serving gate wants): calibrate a per-lang nonconformity
      // threshold on the even-doc split at α = 0.1, then measure
      // EMPIRICAL coverage on the odd docs — the audit that a claimed
      // "90% interval" actually covers 90%. The underlying model is
      // deliberately the simplest thing possible (the per-lang integer
      // mean of n_chars; conformal's point is that the GUARANTEE holds
      // for any model). EXACT: scores are integer |n_chars − mean|,
      // q̂ = the k-th smallest calibration score with k =
      // ceil((n_cal+1)·0.9) — an integer RANK SELECTION via
      // rankWithinKey, no percentile buffer — clamped to n_cal (the
      // documented small-calibration caveat: the finite-sample
      // guarantee needs n_cal ≥ 9; below it the threshold is the max
      // score). Scale shape: one (lang) mean aggregate, the
      // three-level rank machinery, one test-side count — no window
      // ever holds a whole lang.
      "p164_conformal_coverage",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select($"doc_id", $"lang", $"n_chars")
        val mu = docs.filter($"doc_id" % 2 === 0)
          .groupBy($"lang")
          .agg(expr("sum(n_chars) DIV count(1)").as("mu"),
            count(lit(1)).as("n_cal"))
        val calScores = docs.filter($"doc_id" % 2 === 0)
          .join(broadcast(mu), Seq("lang"))
          .select($"lang", $"doc_id", abs($"n_chars" - $"mu").as("sc"))
        val qhat = graft.operators.RankOps
          .rankWithinKey(calScores, "lang",
            Seq(col("sc"), col("doc_id")), "r")
          .join(broadcast(mu), Seq("lang"))
          .filter($"r" ===
            expr("least(((n_cal + 1) * 9 + 9) DIV 10, n_cal)"))
          .select($"lang", $"sc".as("qhat"))
        docs.filter($"doc_id" % 2 === 1)
          .join(broadcast(mu), Seq("lang"))
          .join(broadcast(qhat), Seq("lang"))
          .select($"lang", $"n_cal", $"qhat",
            when(abs($"n_chars" - $"mu") <= $"qhat", 1L).otherwise(0L)
              .as("cov"))
          .groupBy($"lang")
          .agg(max($"n_cal").as("n_cal"), max($"qhat").as("qhat"),
            count(lit(1)).as("n_test"), sum($"cov").as("covered"))
          .select($"lang", $"n_cal", $"qhat", $"n_test", $"covered",
            expr("covered * 1000000 DIV n_test").as("coverage_ppm"))
          .orderBy($"lang")
      },
      Some("""WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
             |mu AS (
             |  SELECT lang, SUM(n_chars) // COUNT(*) AS mu,
             |    COUNT(*) AS n_cal
             |  FROM d WHERE doc_id % 2 = 0 GROUP BY 1),
             |cal AS (
             |  SELECT d.lang, ABS(d.n_chars - mu.mu) AS sc,
             |    ROW_NUMBER() OVER (PARTITION BY d.lang
             |      ORDER BY ABS(d.n_chars - mu.mu), d.doc_id) AS r
             |  FROM d JOIN mu USING (lang) WHERE doc_id % 2 = 0),
             |qh AS (
             |  SELECT cal.lang, cal.sc AS qhat
             |  FROM cal JOIN mu USING (lang)
             |  WHERE r = LEAST(((n_cal + 1) * 9 + 9) // 10, n_cal)),
             |tst AS (
             |  SELECT d.lang,
             |    CASE WHEN ABS(d.n_chars - mu.mu) <= qh.qhat
             |      THEN 1 ELSE 0 END AS cov
             |  FROM d JOIN mu USING (lang) JOIN qh USING (lang)
             |  WHERE doc_id % 2 = 1)
             |SELECT t.lang, CAST(MAX(mu.n_cal) AS BIGINT) AS n_cal,
             |  CAST(MAX(qh.qhat) AS BIGINT) AS qhat,
             |  COUNT(*) AS n_test,
             |  CAST(SUM(cov) AS BIGINT) AS covered,
             |  CAST(SUM(cov) * 1000000 // COUNT(*) AS BIGINT)
             |    AS coverage_ppm
             |FROM tst t JOIN mu ON mu.lang = t.lang
             |JOIN qh ON qh.lang = t.lang
             |GROUP BY t.lang
             |ORDER BY t.lang""".stripMargin)),

    QueryDef(
      // VOCABULARY CONCENTRATION per source: the Gini coefficient of
      // the token-frequency distribution plus head-90 coverage (how
      // many vocabulary types cover 90% of token mass) — the
      // concentration read next to Zipf's slope (p132): a source whose
      // Gini spikes or whose head-90 collapses to a handful of types
      // is template/boilerplate-dominated long before a dup detector
      // names the template. EXACT: Gini from the rank identity
      // G = (2·Σ i·c_i − (n+1)·T) / (n·T) over ascending-count ranks —
      // one rankWithinKey (the three-level no-window machinery) and
      // one aggregate; head-90 via prefixSumWithinKey over descending
      // counts and an integer ceil threshold. Products ride
      // DECIMAL(38,0)/HUGEINT (i·c and n·T are corpus² at 100 TB).
      // Scale shape: token counts are one partial-aggregable shuffle;
      // rank and prefix machinery never hold a whole source in one
      // task; everything after is source-dictionary-sized.
      "p165_vocab_gini",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "documents")
          .filter($"text".isNotNull && $"text" =!= "")
          .select($"source", explode(split($"text", " ")).as("t"))
          .groupBy($"source", $"t").agg(count(lit(1)).as("c"))
          .persist() // rank, prefix and totals all read it
        val st = c.groupBy($"source")
          .agg(sum($"c").as("tt"), count(lit(1)).as("n"))
        val sic = graft.operators.RankOps
          .rankWithinKey(c, "source", Seq(col("c"), col("t")), "i")
          .groupBy($"source")
          .agg(sum($"i".cast("decimal(38,0)") * $"c").as("sic"))
        val m90 = graft.operators.RankOps
          .prefixSumWithinKey(c, Seq("source"),
            Seq(col("c").desc, col("t")), col("c"), "cum")
          .join(broadcast(st), Seq("source"))
          .groupBy($"source")
          .agg((sum(when($"cum" < expr("(9 * tt + 9) DIV 10"), 1L)
            .otherwise(0L)) + 1L).as("m90"))
        st.join(sic, Seq("source")).join(m90, Seq("source"))
          .select($"source", $"tt".as("total_tokens"),
            $"n".as("n_vocab"),
            expr("CAST((2 * sic - (CAST(n AS DECIMAL(38,0)) + 1) * tt)" +
              " * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * tt) AS BIGINT)")
              .as("gini_ppm"),
            $"m90".as("head90"),
            expr("m90 * 1000000 DIV n").as("head90_ppm"))
          .orderBy($"source")
      },
      Some("""WITH tok AS (
             |  SELECT source, unnest(string_split(text, ' ')) AS t
             |  FROM documents WHERE text IS NOT NULL AND text <> ''),
             |c AS (SELECT source, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
             |st AS (SELECT source, SUM(c) AS tt, COUNT(*) AS n
             |       FROM c GROUP BY 1),
             |r AS (
             |  SELECT source, c,
             |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY c, t)
             |      AS i
             |  FROM c),
             |g AS (SELECT source, SUM(CAST(i AS HUGEINT) * c) AS sic
             |      FROM r GROUP BY 1),
             |dsc AS (
             |  SELECT source, c,
             |    SUM(c) OVER (PARTITION BY source ORDER BY c DESC, t)
             |      AS cum
             |  FROM c),
             |h AS (
             |  SELECT dsc.source,
             |    SUM(CASE WHEN cum < (9 * st.tt + 9) // 10
             |      THEN 1 ELSE 0 END) + 1 AS m90
             |  FROM dsc JOIN st USING (source) GROUP BY 1)
             |SELECT s.source, CAST(s.tt AS BIGINT) AS total_tokens,
             |  CAST(s.n AS BIGINT) AS n_vocab,
             |  CAST((2 * g.sic - (CAST(s.n AS HUGEINT) + 1) * s.tt)
             |    * 1000000 // (CAST(s.n AS HUGEINT) * s.tt) AS BIGINT)
             |    AS gini_ppm,
             |  CAST(h.m90 AS BIGINT) AS head90,
             |  CAST(h.m90 * 1000000 // s.n AS BIGINT) AS head90_ppm
             |FROM st s JOIN g USING (source) JOIN h USING (source)
             |ORDER BY s.source""".stripMargin)),

    QueryDef(
      // K-FOLD ASSIGNMENT BALANCE AUDIT: the check a cross-validation
      // or train/val/test split runs before it is trusted — folds must
      // be deterministic (re-derivable from keys on any engine, stable
      // under repartitioning: the p19 hash-sampling rationale) AND
      // balanced in size and label mix, or every downstream metric
      // carries split bias. Fold = arithmetic on the first two md5 hex
      // chars (ascii()·16 + ascii(), mod 5 — engine-portable where a
      // 64-bit multiplicative hash is not: DuckDB errors on BIGINT
      // overflow where Spark wraps). Per fold: size and its corpus
      // share, mean doc length, and the WORST per-lang composition
      // drift vs the corpus in ppm — cross-multiplied |c·N − g·n|
      // exact integers (the p156 discipline, DECIMAL(38,0)/HUGEINT).
      // Scale shape: one (fold, lang) count shuffle; everything after
      // is (5 × langs)-dictionary-sized.
      "p166_fold_balance",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select(expr("pmod(ascii(substring(md5(CAST(doc_id AS STRING))" +
            ", 1, 1)) * 16 + ascii(substring(md5(CAST(doc_id AS STRING))" +
            ", 2, 1)), 5)").as("fold"),
            $"lang", $"n_chars")
        val cells = docs.groupBy($"fold", $"lang")
          .agg(count(lit(1)).as("c"), sum($"n_chars").as("ch"))
        val folds = cells.groupBy($"fold")
          .agg(sum($"c").as("n"), sum($"ch").as("chars"))
        val gl = cells.groupBy($"lang").agg(sum($"c").as("g"))
        val tot = cells.agg(sum($"c").as("nn"))
        val drift = folds.crossJoin(broadcast(gl))
          .join(cells.select($"fold", $"lang", $"c"),
            Seq("fold", "lang"), "left")
          .crossJoin(broadcast(tot))
          .select($"fold", $"nn",
            abs(coalesce($"c", lit(0L)).cast("decimal(38,0)") * $"nn" -
              $"g".cast("decimal(38,0)") * $"n").as("num"),
            ($"nn".cast("decimal(38,0)") * $"n").as("den"))
          .groupBy($"fold", $"nn")
          .agg(max(expr("CAST(num * 1000000 DIV den AS BIGINT)"))
            .as("worst_lang_drift_ppm"))
        folds.join(drift, Seq("fold"))
          .select($"fold", $"n".as("n_docs"),
            expr("n * 1000000 DIV nn").as("share_ppm"),
            expr("chars DIV n").as("mean_chars"),
            $"worst_lang_drift_ppm")
          .orderBy($"fold")
      },
      Some("""WITH d AS (
             |  SELECT (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
             |      * 16
             |      + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)))
             |      % 5 AS fold,
             |    lang, n_chars
             |  FROM documents),
             |cells AS (SELECT fold, lang, COUNT(*) AS c,
             |    SUM(n_chars) AS ch
             |  FROM d GROUP BY 1, 2),
             |folds AS (SELECT fold, SUM(c) AS n, SUM(ch) AS chars
             |          FROM cells GROUP BY 1),
             |gl AS (SELECT lang, SUM(c) AS g FROM cells GROUP BY 1),
             |tot AS (SELECT SUM(c) AS nn FROM cells),
             |drift AS (
             |  SELECT f.fold, MAX(t.nn) AS nn,
             |    MAX(ABS(CAST(COALESCE(ce.c, 0) AS HUGEINT) * t.nn
             |        - CAST(gl.g AS HUGEINT) * f.n)
             |      * 1000000 // (CAST(t.nn AS HUGEINT) * f.n))
             |      AS worst_lang_drift_ppm
             |  FROM folds f CROSS JOIN gl CROSS JOIN tot t
             |  LEFT JOIN cells ce ON ce.fold = f.fold
             |    AND ce.lang = gl.lang
             |  GROUP BY f.fold)
             |SELECT f.fold, CAST(f.n AS BIGINT) AS n_docs,
             |  CAST(f.n * 1000000 // dr.nn AS BIGINT) AS share_ppm,
             |  CAST(f.chars // f.n AS BIGINT) AS mean_chars,
             |  CAST(dr.worst_lang_drift_ppm AS BIGINT)
             |    AS worst_lang_drift_ppm
             |FROM folds f JOIN drift dr USING (fold)
             |ORDER BY f.fold""".stripMargin))
  )
}
