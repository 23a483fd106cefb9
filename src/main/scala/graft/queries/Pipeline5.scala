package graft.queries

import graft.QueryDef
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Fifth pipeline batch — the storage/mixture/audit levers a 100-TB
  * training pipeline pulls after dedup and selection: int8 embedding
  * quantization with its reconstruction-error audit (p88),
  * temperature-weighted source mixing on exact integer sqrt weights
  * (p89), raw-file corpus ingest via binaryFile (p90), fuzzy entity
  * matching (p91), Wilson lower-bound quality ranking (p92), extended
  * PII scrub (p93), the dedup threshold operating curve (p94), KMV
  * bottom-k sketch overlap with an in-frame exact audit (p95), and the
  * padding-waste curve for length-bucketed batching (p97).
  */
object Pipeline5 {
  import graft.Tables.t

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // INT8 AFFINE EMBEDDING QUANTIZATION + reconstruction-error audit —
      // the 4x storage cut (float32 -> uint8 + per-dim scale/offset)
      // every embedding store takes before ANN indexing, with the audit
      // that proves the codec honest: per dimension, the max absolute
      // reconstruction error must sit within half a quantization step.
      // Scale shape: one posexplode pass; per-dim min/max are partial
      // aggregables over a dims-sized key space; the quantize/dequant/
      // error arithmetic rides a dims-sized broadcast join back onto the
      // exploded stream; the final report is one row per dimension. No
      // window, no driver-side data. Cross-engine exactness: every
      // number is either an integer, a float-derived double (bit-equal
      // casts), or the same left-to-right IEEE double expression both
      // engines evaluate; the ppm figure integer-floors, and max() is
      // order-independent.
      "p88_int8_quant",
      (s, dir) => {
        import s.implicits._
        val el = t(s, dir, "embeddings")
          .select(posexplode($"embedding").as(Seq("dim", "xf")))
          .select($"dim", $"xf".cast("double").as("v"))
        val rng = el.groupBy($"dim")
          .agg(count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
        val step = ($"hi" - $"lo") / lit(255.0)
        el.join(broadcast(rng), Seq("dim"))
          .withColumn("q", when($"hi" === $"lo", lit(0L)).otherwise(
            least(lit(255L), greatest(lit(0L),
              floor(($"v" - $"lo") * lit(255.0) / ($"hi" - $"lo") + lit(0.5))
                .cast("long")))))
          .withColumn("deq",
            $"lo" + $"q".cast("double") * ($"hi" - $"lo") / lit(255.0))
          .withColumn("err", abs($"v" - $"deq"))
          .groupBy($"dim", $"n", $"lo", $"hi")
          .agg(max($"err").as("max_err"))
          .select($"dim", $"n", $"lo", $"hi",
            when($"hi" === $"lo", lit(0L)).otherwise(
              floor($"max_err" * lit(255.0) * lit(1000000.0) /
                ($"hi" - $"lo")).cast("long")).as("max_err_ppm_of_step"),
            ($"max_err" <= step / lit(2.0) + lit(1e-12))
              .as("within_half_step"))
          .orderBy($"dim")
      },
      Some("""WITH el AS (
             |  SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v
             |  FROM embeddings,
             |    unnest(generate_series(1, len(embedding))) AS g(i)),
             |rng AS (
             |  SELECT dim, COUNT(*) AS n, MIN(v) AS lo, MAX(v) AS hi
             |  FROM el GROUP BY dim),
             |qe AS (
             |  SELECT el.dim, n, lo, hi,
             |    CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
             |      ELSE LEAST(255, GREATEST(0,
             |        CAST(floor((v - lo) * 255.0 / (hi - lo) + 0.5)
             |          AS BIGINT))) END AS q,
             |    v
             |  FROM el JOIN rng ON el.dim = rng.dim),
             |er AS (
             |  SELECT dim, n, lo, hi,
             |    MAX(abs(v - (lo + CAST(q AS DOUBLE) * (hi - lo) / 255.0)))
             |      AS max_err
             |  FROM qe GROUP BY dim, n, lo, hi)
             |SELECT CAST(dim AS INT) AS dim, CAST(n AS BIGINT) AS n,
             |  lo, hi,
             |  CASE WHEN hi = lo THEN CAST(0 AS BIGINT)
             |    ELSE CAST(floor(max_err * 255.0 * 1000000.0 / (hi - lo))
             |      AS BIGINT) END AS max_err_ppm_of_step,
             |  max_err <= (hi - lo) / 255.0 / 2.0 + 1e-12
             |    AS within_half_step
             |FROM er
             |ORDER BY dim""".stripMargin)),

    QueryDef(
      // TEMPERATURE-WEIGHTED SOURCE MIXING — the multilingual/multi-
      // source rebalance rule (sample share proportional to token-mass ^
      // alpha, alpha = 1/2): big sources are down-weighted, small ones
      // up-weighted, toward a half-total-token budget. Selection is a
      // deterministic per-document Bernoulli: keep iff the first six hex
      // digits of md5(doc_id) fall below a per-source threshold — no RNG
      // state, stable across runs, engines and partitionings. EVERYTHING
      // is integer arithmetic: sqrt(token-mass) is an exact integer
      // square root (floor(sqrt) double seed + a +-1 fixup, identical in
      // both engines), thresholds come from 128-bit integer division
      // (DECIMAL(38,0) here, HUGEINT in the oracle), and the hex
      // comparison is a same-length lowercase string compare — so the
      // hash gate is bit-identical cross-engine with no float anywhere.
      // Scale shape: per-source token mass is one partial-aggregable
      // pass; weights/thresholds live on a sources-sized dictionary
      // (broadcast); the keep decision is per-row map-side work.
      "p89_temperature_mix",
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
          .select($"source", $"doc_id",
            TextAnalysis.tokenCount($"text").as("n_tokens"))
        val bySrc = docs.groupBy($"source")
          .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("toks"))
        // exact integer sqrt of toks * 10^8 (= 10^4 * sqrt(toks)),
        // engine-portable by construction (MathColsSpec pins exactness).
        // The 2^53 exactness contract of MathCols.isqrt binds x, so it
        // binds toks <= 2^53/10^8 ~ 9.0e7 per source — ENFORCED in-plan
        // (the +-1 fixup cannot repair a seed off by more than 1, and
        // the oracle replays the same double seed, so silent drift
        // would be invisible to the hash gate)
        val seeded = bySrc
          .withColumn("x",
            when($"toks" <= lit(90071992L), $"toks" * lit(100000000L))
              .otherwise(expr("raise_error(concat('p89: per-source token " +
                "mass ', toks, ' exceeds the isqrt 2^53 exactness bound " +
                "(9.0e7) — reduce the fixed-point factor'))").cast("long")))
          .withColumn("ws", graft.functions.MathCols.isqrt($"x"))
        val totals = seeded.agg(
          sum($"ws").as("total_ws"), sum($"toks").as("total_toks"))
        val thr = seeded.crossJoin(broadcast(totals))
          .withColumn("budget", expr("total_toks DIV 2"))
          .withColumn("thr", expr(
            """least(16777216L,
              |  CAST(16777216 AS DECIMAL(38,0)) * budget * ws
              |    div (CAST(toks AS DECIMAL(38,0)) * total_ws))""".stripMargin))
          .select($"source", $"n_docs", $"toks", $"ws", $"thr")
        val kept = docs
          .join(broadcast(thr.select($"source", $"thr")), Seq("source"))
          .filter($"thr" >= lit(16777216L) ||
            substring(md5($"doc_id".cast("string")), 1, 6) <
              lower(lpad(hex($"thr"), 6, "0")))
          .groupBy($"source")
          .agg(count(lit(1)).as("n_kept"), sum($"n_tokens").as("kept_toks"))
        thr.join(kept, Seq("source"), "left")
          .select($"source", $"n_docs", $"toks", $"ws", $"thr",
            coalesce($"n_kept", lit(0L)).as("n_kept"),
            coalesce($"kept_toks", lit(0L)).as("kept_toks"))
          .orderBy($"source")
      },
      Some("""WITH docs AS (
             |  SELECT source, doc_id,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
             |  FROM documents),
             |by_src AS (
             |  SELECT source, COUNT(*) AS n_docs, SUM(n_tokens) AS toks
             |  FROM docs GROUP BY source),
             |seeded AS (
             |  SELECT *, toks * 100000000 AS x,
             |    CAST(floor(sqrt(CAST(toks * 100000000 AS DOUBLE)))
             |      AS BIGINT) AS s0
             |  FROM by_src),
             |fix1 AS (
             |  SELECT *, s0 - CASE WHEN s0 * s0 > x THEN 1 ELSE 0 END AS w0
             |  FROM seeded),
             |ws AS (
             |  SELECT source, n_docs, toks,
             |    w0 + CASE WHEN (w0 + 1) * (w0 + 1) <= x THEN 1 ELSE 0 END
             |      AS ws
             |  FROM fix1),
             |thr AS (
             |  SELECT source, n_docs, toks, ws,
             |    LEAST(16777216, CAST(
             |      (16777216::HUGEINT * ((SELECT SUM(toks) FROM ws) // 2)
             |        * ws)
             |      // (toks::HUGEINT * (SELECT SUM(ws) FROM ws))
             |      AS BIGINT)) AS thr
             |  FROM ws),
             |kept AS (
             |  SELECT d.source, COUNT(*) AS n_kept,
             |    SUM(d.n_tokens) AS kept_toks
             |  FROM docs d JOIN thr t ON d.source = t.source
             |  WHERE t.thr >= 16777216
             |     OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)
             |        < printf('%06x', t.thr)
             |  GROUP BY d.source)
             |SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs,
             |  CAST(t.toks AS BIGINT) AS toks, CAST(t.ws AS BIGINT) AS ws,
             |  CAST(t.thr AS BIGINT) AS thr,
             |  CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
             |  CAST(COALESCE(k.kept_toks, 0) AS BIGINT) AS kept_toks
             |FROM thr t LEFT JOIN kept k ON t.source = k.source
             |ORDER BY t.source""".stripMargin)),

    QueryDef(
      // RAW-FILE CORPUS INGEST via the binaryFile source — the pattern a
      // 100-TB image corpus actually arrives in: one opaque file per
      // asset on the object store, loaded with spark.read.format(
      // "binaryFile") (+ pathGlobFilter), identity recovered from the
      // path, bytes decoded in-executor. The entry materializes one REAL
      // .bmp file per document (distributed foreachPartition write),
      // ingests them back through binaryFile, runs the same real BMP
      // decode -> 9x8 grid -> dHash path as p84, and must land on the
      // IDENTICAL dedup report — proving the file round-trip (write,
      // listing, glob filter, path parse, content read) is lossless
      // against the in-frame path. Scale shape: the scan distributes by
      // files (maxPartitionBytes batching), payloads never shuffle (hash
      // extracted map-side), and the report is a hash-keyed aggregation.
      "p90_binaryfile_ingest",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Multimodal
        val root = new java.io.File(scratchRoot,
          "binimg_" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
        root.mkdirs()
        graft.plans.FanOut.byKey( // r15: single-split scan -> serial payload stage (guide 2.5)
            t(s, dir, "documents").select($"doc_id"), $"doc_id").as[Long]
          .foreachPartition { it: Iterator[Long] =>
            it.foreach { id =>
              val f = new java.io.File(root, f"img_$id%08d.bmp")
              val out = new java.io.FileOutputStream(f)
              try out.write(Multimodal.syntheticBmpPattern(id % 50))
              finally out.close()
            }
          }
        val files = s.read.format("binaryFile")
          .option("pathGlobFilter", "*.bmp").load(root.getPath)
          .select(
            regexp_extract(col("path"), "img_(\\d+)\\.bmp", 1)
              .cast("long").as("doc_id"),
            col("content").as("payload"))
        Multimodal.dHash(files)
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
      // FUZZY ENTITY MATCHING (record linkage) — link a DIRTY registry
      // (every 4th customer name with one deterministically-deleted
      // character) back to the canonical customer table: trigram
      // inverted-index blocking with a DF cap (grams shared by too many
      // canonical rows are non-discriminative and would hot-key the
      // index), ids-only candidates, exact codegen'd levenshtein
      // confirm, composite-integer-key min_by for the unique best match.
      // The oracle replays gramming, cap, candidates and distance in
      // SQL (DuckDB's levenshtein is the same unit-cost metric), so
      // blocking-recall behavior is hash-pinned too — a candidate the
      // index misses is missed identically by both engines, and the
      // measured recall itself is gated in EntityMatchSpec.
      "p91_fuzzy_entity_match",
      (s, dir) => {
        import s.implicits._
        import graft.operators.EntityMatch
        val canon = t(s, dir, "customer").select($"c_custkey", $"c_name")
        val dirty = canon.filter($"c_custkey" % 4 === 0)
          .withColumn("pos",
            ($"c_custkey" % (length($"c_name") - 2) + 2).cast("int"))
          .select($"c_custkey".as("dirty_id"),
            concat(expr("substring(c_name, 1, pos - 1)"),
              expr("substring(c_name, pos + 1, 1000)")).as("dirty_name"))
        EntityMatch.bestMatches(dirty, "dirty_id", "dirty_name",
            canon, "c_custkey", "c_name", maxDist = 2, maxGramDf = 50)
          .orderBy($"dirty_id")
      },
      Some("""WITH canon AS (
             |  SELECT c_custkey, c_name FROM customer),
             |dirty AS (
             |  SELECT c_custkey AS dirty_id,
             |    substring(c_name, 1, CAST(c_custkey % (len(c_name) - 2)
             |        + 2 AS INT) - 1) ||
             |    substring(c_name, CAST(c_custkey % (len(c_name) - 2)
             |        + 2 AS INT) + 1, 1000) AS dirty_name
             |  FROM canon WHERE c_custkey % 4 = 0),
             |cg AS (
             |  SELECT DISTINCT c_custkey AS cid,
             |    substring(c_name, i, 3) AS g
             |  FROM canon,
             |    unnest(generate_series(1, len(c_name) - 2)) AS s(i)),
             |kept AS (
             |  SELECT g FROM cg GROUP BY g HAVING COUNT(*) <= 50),
             |idx AS (SELECT cg.g, cg.cid FROM cg JOIN kept USING (g)),
             |dg AS (
             |  SELECT DISTINCT dirty_id AS did,
             |    substring(dirty_name, i, 3) AS g
             |  FROM dirty,
             |    unnest(generate_series(1, len(dirty_name) - 2)) AS s(i)),
             |cand AS (
             |  SELECT DISTINCT did, cid FROM dg JOIN idx USING (g)),
             |conf AS (
             |  SELECT did, cid,
             |    levenshtein(d.dirty_name, c.c_name) AS dist
             |  FROM cand
             |  JOIN dirty d ON d.dirty_id = did
             |  JOIN canon c ON c.c_custkey = cid
             |  WHERE levenshtein(d.dirty_name, c.c_name) <= 2)
             |SELECT dirty_id, matched_id, dist FROM (
             |  SELECT did AS dirty_id, cid AS matched_id,
             |    CAST(dist AS INT) AS dist,
             |    row_number() OVER (PARTITION BY did
             |      ORDER BY dist, cid) AS rk
             |  FROM conf) r
             |WHERE rk = 1
             |ORDER BY dirty_id""".stripMargin)),

    QueryDef(
      // WILSON LOWER-BOUND QUALITY RANKING — rank sources by their
      // quality-pass rate with small-sample shrinkage (the z=2 Wilson
      // score interval's lower bound), so a source with 4/5 passing
      // never outranks one with 700/1000: the mixture-planning decision
      // rule naive pass-rate sorting gets wrong. EXACT integer pipeline
      // end to end: a = (k(n-k)+n) div n, s = isqrt(a * 10^6) via the
      // spec-pinned MathCols.isqrt fixup (good to per-source n ~ 3.6e10
      // under the 2^53 contract), lb_ppm = ((k+2)*10^6 - 2000*s) div
      // (n+4) clamped at 0 — every step replayed verbatim by the
      // oracle, so no engine's sqrt/floor corner can drift the ranking.
      // One partial-aggregable pass over the corpus; the ranking frame
      // is sources-sized.
      "p92_wilson_quality_rank",
      (s, dir) => {
        import s.implicits._
        val stats = t(s, dir, "documents")
          .groupBy($"source")
          .agg(count(lit(1)).as("n"),
            sum(when($"n_chars" >= 400, 1L).otherwise(0L)).as("k"))
        stats
          .withColumn("a", expr("(k * (n - k) + n) DIV n"))
          .withColumn("sq",
            graft.functions.MathCols.isqrt($"a" * lit(1000000L)))
          .select($"source", $"n", $"k",
            expr("k * 1000000 DIV n").as("pass_ppm"),
            greatest(lit(0L),
              expr("((k + 2) * 1000000 - 2000 * sq) DIV (n + 4)"))
              .as("wilson_lb_ppm"))
          .orderBy($"wilson_lb_ppm".desc, $"source")
      },
      Some("""WITH st AS (
             |  SELECT source, COUNT(*) AS n,
             |    SUM(CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END) AS k
             |  FROM documents GROUP BY source),
             |aa AS (
             |  SELECT source, n, k,
             |    ((k * (n - k) + n) // n) * 1000000 AS x
             |  FROM st),
             |seed AS (
             |  SELECT *, CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT)
             |    AS s0
             |  FROM aa),
             |fix1 AS (
             |  SELECT *, s0 - CASE WHEN s0 * s0 > x THEN 1 ELSE 0 END
             |    AS w0
             |  FROM seed),
             |sq AS (
             |  SELECT source, n, k,
             |    w0 + CASE WHEN (w0 + 1) * (w0 + 1) <= x THEN 1 ELSE 0
             |      END AS s
             |  FROM fix1)
             |SELECT source, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT)
             |    AS k,
             |  CAST(k * 1000000 // n AS BIGINT) AS pass_ppm,
             |  CAST(GREATEST(0, ((k + 2) * 1000000 - 2000 * s) // (n + 4))
             |    AS BIGINT) AS wilson_lb_ppm
             |FROM sq
             |ORDER BY wilson_lb_ppm DESC, source""".stripMargin)),

    QueryDef(
      // EXTENDED PII SCRUB — p20's email/URL pass plus the phone / IPv4 /
      // card-number classes a production redaction carries, with class
      // order pinned (cards before phones so the longer digit run wins;
      // emails/URLs first so their digits are already gone). Synthetic
      // PII of every class is appended per row from doc_id so each
      // pattern provably fires, and the oracle replays the whole regex
      // chain byte-for-byte (all patterns are RE2-safe: no lookaround,
      // no backreferences — portable across engines). Per-row codegen'd
      // work, zero shuffle beyond the final sort.
      "p93_pii_extended",
      (s, dir) => {
        import s.implicits._
        val aug = concat($"text",
          lit(" mail u"), $"doc_id", lit("@ex.com via https://ex.com/d/"),
          $"doc_id",
          lit(" Call +1 ("), lit(100) + $"doc_id" % 900,
          lit(") 555-01"), lpad(($"doc_id" % 100).cast("string"), 2, "0"),
          lit(" from 10."), $"doc_id" % 256,
          lit(".0.1 pay 4111 1111 1111 1111"))
        t(s, dir, "documents")
          .select($"doc_id",
            graft.operators.TextAnalysis.redactPiiExtended(aug).as("clean"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  regexp_replace(
             |    regexp_replace(
             |      regexp_replace(
             |        regexp_replace(
             |          regexp_replace(
             |            text || ' mail u' || CAST(doc_id AS VARCHAR) ||
             |              '@ex.com via https://ex.com/d/' ||
             |              CAST(doc_id AS VARCHAR) || ' Call +1 (' ||
             |              CAST(100 + doc_id % 900 AS VARCHAR) ||
             |              ') 555-01' ||
             |              lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
             |              ' from 10.' || CAST(doc_id % 256 AS VARCHAR) ||
             |              '.0.1 pay 4111 1111 1111 1111',
             |            '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
             |            '<EMAIL>', 'g'),
             |          'https?://[^ ]+', '<URL>', 'g'),
             |        '\b(?:\d[ -]?){13,16}\b', '<CARD>', 'g'),
             |      '\+?\d{1,3}[ -]\(?\d{2,4}\)?[ -]\d{3}[ -]?\d{2,4}\b',
             |      '<PHONE>', 'g'),
             |    '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS clean
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    QueryDef(
      // DEDUP THRESHOLD OPERATING CURVE — how many pairs and how many
      // documents a near-dup pass would touch at each Jaccard cutoff
      // from 0.35 to 0.95: the tuning table an operator reads before
      // committing a threshold to a 100-TB dedup run (too low deletes
      // real content, too high leaves boilerplate). Rides the SAME
      // memoized capped-Jaccard pair stage as p07/p24/p28 — the sweep
      // costs one broadcast cross of the pair frame with a 13-row
      // threshold dictionary, not thirteen recomputations. Thresholds
      // are k/20.0 (bit-identical doubles in both engines, like p07's
      // own gate); counts are integers.
      "p94_dedup_threshold_sweep",
      (s, dir) => {
        import s.implicits._
        val pairs = Pipeline.jaccardPairs(s, dir)
          .select($"id_a", $"id_b", $"jaccard")
        val tf = (7 to 19).map(k => (k * 5, k / 20.0))
          .toDF("thr_pct", "thr")
        val hits = pairs.crossJoin(broadcast(tf))
          .filter($"jaccard" >= $"thr")
        val nP = hits.groupBy($"thr_pct")
          .agg(count(lit(1)).as("n_pairs"))
        val nD = hits
          .select($"thr_pct", explode(array($"id_a", $"id_b")).as("id"))
          .distinct()
          .groupBy($"thr_pct").agg(count(lit(1)).as("n_docs"))
        tf.select($"thr_pct")
          .join(nP, Seq("thr_pct"), "left")
          .join(nD, Seq("thr_pct"), "left")
          .select($"thr_pct",
            coalesce($"n_pairs", lit(0L)).as("n_pairs"),
            coalesce($"n_docs", lit(0L)).as("n_docs"))
          .orderBy($"thr_pct")
      },
      Some(s"""WITH ${Pipeline.jaccardCommonCtes},
             |j AS (
             |  SELECT id_a, id_b,
             |    CAST(n_common AS DOUBLE)
             |      / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) AS jac
             |  FROM common
             |  JOIN nsh na ON na.id = id_a
             |  JOIN nsh nb ON nb.id = id_b),
             |tf AS (
             |  SELECT k * 5 AS thr_pct, k / 20.0 AS thr
             |  FROM unnest(generate_series(7, 19)) AS g(k)),
             |hits AS (
             |  SELECT thr_pct, id_a, id_b FROM j, tf WHERE jac >= thr),
             |np AS (
             |  SELECT thr_pct, COUNT(*) AS n_pairs FROM hits
             |  GROUP BY thr_pct),
             |nd AS (
             |  SELECT thr_pct, COUNT(*) AS n_docs FROM (
             |    SELECT DISTINCT thr_pct, id FROM (
             |      SELECT thr_pct, unnest([id_a, id_b]) AS id FROM hits))
             |  GROUP BY thr_pct)
             |SELECT CAST(tf.thr_pct AS INT) AS thr_pct,
             |  CAST(COALESCE(np.n_pairs, 0) AS BIGINT) AS n_pairs,
             |  CAST(COALESCE(nd.n_docs, 0) AS BIGINT) AS n_docs
             |FROM tf
             |LEFT JOIN np ON np.thr_pct = tf.thr_pct
             |LEFT JOIN nd ON nd.thr_pct = tf.thr_pct
             |ORDER BY thr_pct""".stripMargin)),

    QueryDef(
      // KMV BOTTOM-K SKETCH + PAIRWISE SET OVERLAP — the mergeable
      // sketch family HLL cannot provide: per-source bottom-256 sets of
      // 48-bit gram hashes support UNION and INTERSECTION estimates
      // (here: pairwise gram-Jaccard between crawl sources, the "same
      // content, different domain" mixture signal), and every estimate
      // is audited in-frame against the EXACT Jaccard so the sketch
      // error is visible, not trusted. Scale shape: the sketch build is
      // the bounded TopKByOrd aggregator (k rows per partition per key,
      // map-side partial — never a per-source window over the gram
      // dictionary); pair evaluation runs on the sources^2 x 2k SKETCH
      // dictionary (the whole point of sketching), where a bounded
      // window is legal; the exact audit is one gram-keyed aggregation
      // (p39's shape). Deterministic cross-engine: md5 order is
      // engine-portable, 12 hex chars -> BIGINT in both, integer-ppm
      // everywhere.
      // r14 cost audit (r13 ask #5, the 5.69→6.95 s stamped drift):
      // re-measured 6.1 s ISOLATED at ext_cpu 0.0 — the in-suite 6.95
      // was cache/JIT pressure, not a plan change. The suggested
      // p07-pair-memo share does NOT apply: p07's memo is the
      // DOC-pair capped-Jaccard stage over 3-gram shingle ids, while
      // this audit is SOURCE-pair gram overlap — different key space,
      // and the exact audit here is already a sum over the tiny
      // (mask, cnt) rollup of the single cached 48-bit-hash frame (the
      // corpus is touched exactly once; there is no shingle-overlap
      // recomputation left to share).
      "p95_kmv_source_overlap",
      (s, dir) => {
        import s.implicits._
        import graft.operators.TextAnalysis.wordGrams
        val K = 256
        // ONE wide aggregation over the exploded corpus: every gram is
        // hashed to its 48-bit md5 prefix IN THE SCAN PROJECTION, so
        // the only fact-table shuffle carries 8-byte keys — never gram
        // strings — and folds straight to a (h, source-bitmask) frame
        // via bit_or (idempotent: no pre-distinct pass needed). Sketch
        // build, per-source sizes AND the exact audit all derive from
        // this one cached frame plus its tiny (mask, cnt) rollup;
        // round 6 instead cached the distinct gram STRINGS and ran a
        // gram-keyed string self-join for the audit — same output,
        // 34s -> target <8s at sf0.1.
        val srcDict0 = t(s, dir, "documents")
          .filter($"text".isNotNull && $"text" =!= "")
          .select($"source").distinct()
          .withColumn("sid", (row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy($"source"))
            - 1).cast("int"))
        // sources are a dictionary (the window above is sources-sized);
        // the bitmask bound is explicit — >62 sources must fail loudly
        // in-plan, not silently corrupt the audit
        // The dictionary is broadcast at SIX places below (masks
        // build, bySrc, kmv, pairsKeys x2, exact); r15 persisted it so
        // each broadcast build skips the scan -> distinct -> window
        // chain. r16 REVERTED the persist: the clean suite stamp had
        // the persisted form at 7.33 s vs the r14 unpersisted 6.61 s,
        // and isolated interleaved A/Bs washed (6.1/6.3 unpersisted vs
        // 5.9/6.6/6.9 persisted) — the six rebuilt chains are
        // sources-sized serial stages that overlap other work, while
        // the persist's materialization barrier gates ALL six
        // broadcast builds behind one synchronous cache write.
        val srcDict = srcDict0.select($"source",
          when($"sid" < 62, $"sid")
            .otherwise(expr(
              "raise_error('p95: source bitmask supports at most 62 sources')"))
            .as("sid"))
        // r15: fan the single-split local scan out across cores before
        // the per-gram md5 work — serial 3.5-4s single-task stage in
        // the profile, the guide §2.5 unsplittable-input case; no-op at
        // scale (FanOut.byKey is conditional on input splits < cores)
        val masks = graft.plans.FanOut.byKey(
            t(s, dir, "documents")
              .filter($"text".isNotNull && $"text" =!= ""), $"doc_id")
          .select($"source",
            explode(wordGrams(split($"text", " "), $"text", 3)).as("gram"))
          .select($"source",
            expr("CAST(conv(substring(md5(gram), 1, 12), 16, 10) AS BIGINT)")
              .as("h"))
          .join(broadcast(srcDict), Seq("source"))
          .groupBy($"h")
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), sid))").as("mask"))
          .cache()
        // (mask, cnt) rollup: <= 2^n_src rows in the worst case, in
        // practice a handful — every count below is a sum over it
        val mcnt = masks.groupBy($"mask").agg(count(lit(1)).as("cnt"))
        val bySrc = mcnt.crossJoin(broadcast(srcDict))
          .filter(expr("(shiftright(mask, sid) & 1) = 1"))
          .groupBy($"source").agg(sum($"cnt").as("ng"))
        // threshold-prune before the bottom-k build: hashes are uniform
        // in [0, 2^48), so a cutoff at ~4x the expected 256th order
        // statistic ((2^48 DIV ng) * 4K) passes ~4K rows per source to
        // the aggregator instead of the full gram dictionary — and the
        // oracle applies the SAME cutoff, so even the (astronomically
        // unlikely) under-fill would be identical on both engines
        val topk = udaf(new graft.functions.Aggregators.TopKByOrd(K))
        val kmv = masks.crossJoin(broadcast(srcDict))
          .filter(expr("(shiftright(mask, sid) & 1) = 1"))
          .join(broadcast(bySrc), Seq("source"))
          .filter($"h" <= expr(s"(281474976710656L DIV ng) * ${4 * K}"))
          .groupBy($"source")
          .agg(topk(lpad(hex($"h"), 12, "0"), $"h").as("kmv"))
          .cache() // sources-sized sketch dictionary, read three times
        val pairsKeys = srcDict.as("x").crossJoin(srcDict.as("y"))
          .filter(col("x.source") < col("y.source"))
          .select(col("x.source").as("sa"), col("y.source").as("sb"),
            col("x.sid").as("sida"), col("y.sid").as("sidb"))
        val ex = kmv.select($"source", explode($"kmv").as("h"))
        val tagged = broadcast(pairsKeys).join(ex, $"source" === $"sa")
          .select($"sa", $"sb", $"h", lit(1).as("ina"), lit(0).as("inb"))
          .unionAll(broadcast(pairsKeys).join(ex, $"source" === $"sb")
            .select($"sa", $"sb", $"h", lit(0).as("ina"), lit(1).as("inb")))
        // union the two sketches, keep THEIR k smallest — a window over
        // <= 2k rows per (sa, sb) pair key: sketch-dictionary bounded
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"sa", $"sb").orderBy($"h")
        val est = tagged.groupBy($"sa", $"sb", $"h")
          .agg(max($"ina").as("ina"), max($"inb").as("inb"))
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= K)
          .groupBy($"sa", $"sb")
          .agg(count(lit(1)).as("ku"),
            sum($"ina" * $"inb").as("shared"))
          .select($"sa", $"sb",
            expr("shared * 1000000 DIV ku").as("est_ppm"))
        // exact audit without a self-join: a gram is shared by a pair
        // iff both bits are set in its mask, so ncommon is a sum over
        // the tiny (mask, cnt) rollup — the corpus is never touched
        // again
        val common = mcnt.crossJoin(broadcast(pairsKeys))
          .filter(expr("(shiftright(mask, sida) & 1) = 1" +
            " AND (shiftright(mask, sidb) & 1) = 1"))
          .groupBy($"sa", $"sb")
          .agg(sum($"cnt").as("ncommon"))
        val exact = pairsKeys.select($"sa", $"sb")
          .join(common, Seq("sa", "sb"), "left")
          .join(bySrc.select($"source".as("sa"), $"ng".as("na")), Seq("sa"))
          .join(bySrc.select($"source".as("sb"), $"ng".as("nb")), Seq("sb"))
          .select($"sa", $"sb",
            expr("coalesce(ncommon, 0) * 1000000 DIV (na + nb - coalesce(ncommon, 0))")
              .as("exact_ppm"))
        est.join(exact, Seq("sa", "sb"))
          .select($"sa".as("source_a"), $"sb".as("source_b"),
            $"est_ppm", $"exact_ppm",
            abs($"est_ppm" - $"exact_ppm").as("err_ppm"))
          .orderBy($"source_a", $"source_b")
      },
      Some("""WITH grams AS (
             |  SELECT source,
             |    unnest(CASE WHEN len(toks) >= 3
             |      THEN list_transform(generate_series(1, len(toks) - 2),
             |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
             |      ELSE [text] END) AS gram
             |  FROM (SELECT source, text, string_split(text, ' ') AS toks
             |        FROM documents WHERE text IS NOT NULL AND text <> '')),
             |srcdict AS (
             |  SELECT source,
             |    CAST(row_number() OVER (ORDER BY source) - 1 AS INT) AS sid
             |  FROM (SELECT DISTINCT source FROM grams)),
             |masks AS (
             |  SELECT h, bit_or(CAST(1 AS BIGINT) << sid) AS mask
             |  FROM (SELECT source,
             |          ('0x' || substring(md5(gram), 1, 12))::BIGINT AS h
             |        FROM grams) g
             |  JOIN srcdict USING (source)
             |  GROUP BY h),
             |mcnt AS (
             |  SELECT mask, COUNT(*) AS cnt FROM masks GROUP BY mask),
             |bysrc AS (
             |  SELECT source, sid, SUM(cnt) AS ng
             |  FROM srcdict, mcnt WHERE ((mask >> sid) & 1) = 1
             |  GROUP BY source, sid),
             |kmv AS (
             |  SELECT source, h FROM (
             |    SELECT s.source, m.h,
             |      row_number() OVER (PARTITION BY s.source
             |        ORDER BY m.h) AS rk
             |    FROM masks m
             |    JOIN srcdict s ON ((m.mask >> s.sid) & 1) = 1
             |    JOIN bysrc b ON b.source = s.source
             |    WHERE m.h <= (281474976710656 // b.ng) * 1024)
             |  WHERE rk <= 256),
             |pk AS (
             |  SELECT x.source AS sa, x.sid AS sida,
             |         y.source AS sb, y.sid AS sidb
             |  FROM srcdict x, srcdict y
             |  WHERE x.source < y.source),
             |tagged AS (
             |  SELECT pk.sa, pk.sb, k.h,
             |    MAX(CASE WHEN k.source = pk.sa THEN 1 ELSE 0 END) AS ina,
             |    MAX(CASE WHEN k.source = pk.sb THEN 1 ELSE 0 END) AS inb
             |  FROM pk JOIN kmv k ON k.source = pk.sa OR k.source = pk.sb
             |  GROUP BY pk.sa, pk.sb, k.h),
             |est AS (
             |  SELECT sa, sb, COUNT(*) AS ku,
             |    SUM(ina * inb) AS shared
             |  FROM (
             |    SELECT *, row_number()
             |      OVER (PARTITION BY sa, sb ORDER BY h) AS rk
             |    FROM tagged) u
             |  WHERE rk <= 256
             |  GROUP BY sa, sb),
             |common AS (
             |  SELECT sa, sb, SUM(cnt) AS ncommon
             |  FROM pk, mcnt
             |  WHERE ((mask >> sida) & 1) = 1 AND ((mask >> sidb) & 1) = 1
             |  GROUP BY sa, sb)
             |SELECT pk.sa AS source_a, pk.sb AS source_b,
             |  CAST(est.shared * 1000000 // est.ku AS BIGINT) AS est_ppm,
             |  CAST(COALESCE(c.ncommon, 0) * 1000000
             |    // (na.ng + nb.ng - COALESCE(c.ncommon, 0)) AS BIGINT)
             |    AS exact_ppm,
             |  CAST(abs(est.shared * 1000000 // est.ku
             |    - COALESCE(c.ncommon, 0) * 1000000
             |      // (na.ng + nb.ng - COALESCE(c.ncommon, 0))) AS BIGINT)
             |    AS err_ppm
             |FROM pk
             |JOIN est ON est.sa = pk.sa AND est.sb = pk.sb
             |LEFT JOIN common c ON c.sa = pk.sa AND c.sb = pk.sb
             |JOIN bysrc na ON na.source = pk.sa
             |JOIN bysrc nb ON nb.source = pk.sb
             |ORDER BY source_a, source_b""".stripMargin)),

    QueryDef(
      // PADDING-WASTE OPERATING CURVE for length-bucketed batching — the
      // training-economics table behind "how many sequence-length
      // buckets do we need": padding every sequence to the batch max
      // burns compute proportional to (bucket_max - len); more buckets
      // cut the waste but fragment batches. For B in {1,2,4,8}
      // equal-count buckets (EXACT quantile boundaries via the q95
      // cumulative-dictionary shape — no sampled partitioner), report
      // total padding tokens and waste ppm of the padded volume. All
      // integer; the per-B branch rides ONE cached (length, count)
      // dictionary, so four curves cost four dictionary passes, not four
      // corpus scans.
      "p97_padding_waste_curve",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val lens = t(s, dir, "documents")
          .select(TextAnalysis.tokenCount($"text").as("len"))
        val dict = lens.groupBy($"len").agg(count(lit(1)).as("c")).cache()
        // token-length dictionary cardinality grows with document size
        // — cumsum via the range-partitioned prefix sum, not a global
        // window (q95 discipline)
        // r15: persisted — the prefix-sum machinery was re-executed by
        // each of the FOUR bucket curves (plan showed the subtree x4);
        // the frame is length-dictionary-sized at any scale
        val cum = graft.operators.RankOps.prefixSum(
          dict, Seq($"len"), $"c", "cum").persist()
        val tot = dict.agg(sum($"c").as("n"),
          sum($"len" * $"c").as("tok"))
        val curves = Seq(1, 2, 4, 8).map { b =>
          val shardOf = (1 until b).map(k =>
            when($"cum" >= expr(s"(n * $k + ${b - 1}) DIV $b"), 1)
              .otherwise(0)).foldLeft(lit(0))(_ + _)
          cum.crossJoin(broadcast(tot))
            .select($"len", $"c", $"tok", shardOf.as("shard"))
            .groupBy($"shard", $"tok")
            .agg(max($"len").as("mx"), sum($"c").as("nrows"),
              sum($"len" * $"c").as("stok"))
            .groupBy($"tok")
            .agg(sum($"mx" * $"nrows" - $"stok").as("padding"))
            .select(lit(b).as("n_buckets"), $"padding",
              expr("padding * 1000000 DIV (padding + tok)")
                .as("waste_ppm"))
        }
        curves.reduce(_ unionAll _).orderBy($"n_buckets")
      },
      Some {
        val branches = Seq(1, 2, 4, 8).map { b =>
          val shard = if (b == 1) "0"
          else (1 until b).map(k =>
            s"CASE WHEN cum >= (n * $k + ${b - 1}) // $b THEN 1 ELSE 0 END")
            .mkString(" + ")
          s"""SELECT $b AS n_buckets, padding,
             |  CAST(padding * 1000000 // (padding + tok) AS BIGINT)
             |    AS waste_ppm
             |FROM (
             |  SELECT tok, SUM(mx * nrows - stok) AS padding FROM (
             |    SELECT shard, tok, MAX(len) AS mx, SUM(c) AS nrows,
             |      SUM(len * c) AS stok
             |    FROM (SELECT len, c, tok, $shard AS shard
             |          FROM cum, tot)
             |    GROUP BY shard, tok)
             |  GROUP BY tok)""".stripMargin
        }
        s"""WITH lens AS (
           |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS len
           |  FROM documents),
           |dict AS (SELECT len, COUNT(*) AS c FROM lens GROUP BY len),
           |cum AS (
           |  SELECT len, c, SUM(c) OVER (ORDER BY len
           |    ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM dict),
           |tot AS (SELECT SUM(c) AS n, SUM(len * c) AS tok FROM dict)
           |SELECT CAST(n_buckets AS INT) AS n_buckets,
           |  CAST(padding AS BIGINT) AS padding, waste_ppm
           |FROM (${branches.mkString("\nUNION ALL\n")})
           |ORDER BY n_buckets""".stripMargin
      }),

    QueryDef(
      // BM25 RETRIEVAL — the lexical ranking function behind corpus
      // search, decontamination lookup and retrieval-based curation,
      // EXACT cross-engine: k1=1.2, b=0.75 fold into the rational form
      // score = idf * 22*T*f / (10*T*f + 3*T + 9*N*dl) (multiply
      // numerator and denominator by 10*T; T = corpus tokens, N = docs,
      // dl = doc length), evaluated in DECIMAL(38,0)/HUGEINT with an
      // integer floor division per term — no float in the score path.
      // The idf is the Robertson odds ratio quantized to 2^-20 and
      // log2-floored: floor(log2(k)) of an INTEGER is deterministic in
      // double arithmetic on both engines (an integer cannot sit within
      // 1 ulp of a non-attained power of two), so even the logarithm is
      // bit-exact. Query terms are data-derived (df ranks 10..13, the
      // mid-frequency band), not magic literals. Scale shape: one
      // corpus explode -> (doc, term) partial aggregation carrying dl;
      // df/idf live on broadcast dictionaries; the score join touches
      // only docs containing a query term; top-20 is TakeOrdered.
      "p98_bm25_retrieval",
      (s, dir) => bm25Top20(s, dir),
      Some(s"""WITH $bm25OracleCtes
             |SELECT doc_id, score, n_terms FROM bm
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin)),

    QueryDef(
      // SEMANTIC DEDUP (the SemDeDup recipe, Abbas et al. 2023, public):
      // cluster embeddings with the oracle-exact k-means, then drop
      // every vector that has a LOWER-id near-duplicate (exact integer
      // micro-cosine >= 0.45) in the SAME cluster — keep-lowest-id, the p05
      // keep-first discipline applied semantically. ORACLE-EXACT end to
      // end: the cluster labels replay through KMeansOp.assignCtes (the
      // p47 chained-CTE machinery, here COMPOSED downstream), and the
      // cosine is decimal sums with one final double division. Scale
      // shape: the cluster id is the blocking key, and the quadratic it
      // bounds is now ENFORCED — the entry routes through
      // Similarity.semanticDedupBounded, whose in-plan guard
      // raise_errors if any (possibly re-split) cell exceeds 2*cellCap,
      // capping candidate pairs at N*cellCap (linear in N). At fixture
      // scale the cap (65536) never fires and the oversized-cell
      // re-split is the identity, so the oracle below replays the plain
      // within-cluster join; p107 exercises the LIVE re-split path
      // hash-gated, and SemanticDedupBoundedSpec the guard.
      "p99_semantic_dedup",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Similarity
        val emb = t(s, dir, "embeddings")
        // shared (k=4, iters=3) fit AND assignment frame with p47/p107
        // via the Pipeline memos — one driver-loop fit and one decimal
        // assignment pass serve all three entries
        val model = Pipeline.fittedKmeans(s, dir, 4, 3)
        Similarity.semanticDedupBounded(emb, "vec_id", "embedding",
            model, 0.45, cellCap = 65536L,
            preAssigned = Some(Pipeline.fittedKmeansAssigned(s, dir, 4, 3)))
          .select($"cluster", $"n_vectors", $"n_dropped", $"n_kept")
      },
      Some {
        val (ctes, asg) = graft.operators.KMeansOp.assignCtes(4, 3)
        s"""WITH $ctes,
           |pr AS (
           |  SELECT a.vec_id AS ida, b.vec_id AS idb
           |  FROM $asg a JOIN $asg b
           |    ON a.cell = b.cell AND a.vec_id < b.vec_id),
           |elq9 AS (
           |  SELECT vec_id,
           |    CAST(generate_subscripts(embedding, 1) AS INT) - 1 AS d,
           |    ${Pipeline.quantE9("unnest(embedding)")} AS xq
           |  FROM embeddings WHERE embedding IS NOT NULL),
           |cs AS (
           |  SELECT pr.ida, pr.idb,
           |    SUM(CAST(x.xq AS HUGEINT) * y.xq) AS dot18,
           |    SUM(CAST(x.xq AS HUGEINT) * x.xq) AS nx18,
           |    SUM(CAST(y.xq AS HUGEINT) * y.xq) AS ny18
           |  FROM pr JOIN elq9 x ON x.vec_id = pr.ida
           |          JOIN elq9 y ON y.vec_id = pr.idb AND y.d = x.d
           |  GROUP BY pr.ida, pr.idb),
           |${Pipeline.exactC6Ctes("sc6", "cs", Seq("ida", "idb"))},
           |drp AS (
           |  SELECT DISTINCT idb AS id FROM sc6 WHERE c6 >= 450000)
           |SELECT a.cell AS cluster,
           |  CAST(COUNT(*) AS BIGINT) AS n_vectors,
           |  CAST(COUNT(d.id) AS BIGINT) AS n_dropped,
           |  CAST(COUNT(*) - COUNT(d.id) AS BIGINT) AS n_kept
           |FROM $asg a LEFT JOIN drp d ON d.id = a.vec_id
           |GROUP BY a.cell ORDER BY cluster""".stripMargin
      })
  )

  /** p98's full BM25 pipeline ending in the top-20 (doc_id, score,
    * n_terms) — shared with p100's hybrid fusion (Pipeline6), which
    * needs the lexical ranking as one of its two fused systems. The
    * 20-row result is memoized the annExactTop10 way (keyed by
    * (applicationId, sfDir), executor-resident localCheckpoint):
    * whichever of p98/p100 runs first pays the corpus scan; an
    * isolated-timing harness would otherwise run the identical
    * explode+aggregate twice back to back where a production retrieval
    * stack computes its lexical index once.
    */
  @volatile private var bm25Memo
      : Option[((String, String), org.apache.spark.sql.DataFrame)] = None

  private[queries] def bm25Top20(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = synchronized {
    val key = (s.sparkContext.applicationId, dir)
    bm25Memo match {
      case Some((k, df)) if k == key =>
        graft.MemoLedger.recordHit("bm25"); df
      case _ =>
        graft.MemoLedger.recordBuild("bm25")
        val top = bm25Top20Plan(s, dir).localCheckpoint(true)
        bm25Memo = Some((key, top))
        top
    }
  }

  /** The un-memoized BM25 plan — what the memo materializes. Exposed
    * package-wide so PlanAuditSpec can pin the REAL plan (the memoized
    * entry plans as a checkpoint scan, like the ANN family).
    */
  private[graft] def bm25Top20Plan(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
        import s.implicits._
        val tf = t(s, dir, "documents")
          .select($"doc_id",
            expr("filter(split(text, ' '), t -> t <> '')").as("tk"))
          .select($"doc_id", size($"tk").cast("long").as("dl"),
            explode($"tk").as("term"))
          .groupBy($"doc_id", $"term")
          .agg(count(lit(1)).as("f"), max($"dl").as("dl"))
        val dfr = tf.groupBy($"term").agg(count(lit(1)).as("df"))
        val tot = tf.groupBy($"doc_id").agg(max($"dl").as("dl"))
          .agg(count(lit(1)).as("nd"), sum($"dl").as("tt"))
        val qterms = dfr.orderBy($"df".desc, $"term").limit(13)
          .orderBy($"df".asc, $"term".desc).limit(4)
          .crossJoin(broadcast(tot))
          .select($"term", expr(
            "CAST(floor(log2(greatest(CAST(1 AS BIGINT), " +
              "((nd - df) * 2 + 1) * 1048576 DIV (2 * df + 1)))) AS BIGINT)")
            .as("idf"))
        val top = tf.join(broadcast(qterms), Seq("term"))
          .crossJoin(broadcast(tot))
          .withColumn("s", expr(
            """CAST(CAST(idf AS DECIMAL(38,0)) * 22
              |  * CAST(tt AS DECIMAL(38,0)) * f * 1000000
              |  DIV (10 * CAST(tt AS DECIMAL(38,0)) * f
              |    + 3 * CAST(tt AS DECIMAL(38,0))
              |    + 9 * CAST(nd AS DECIMAL(38,0)) * dl) AS BIGINT)"""
              .stripMargin))
          .groupBy($"doc_id")
          .agg(sum($"s").as("score"), count(lit(1)).as("n_terms"))
          .orderBy($"score".desc, $"doc_id").limit(20)
        top
  }

  /** The BM25 oracle CTE chain, ending in `bm` (doc_id, score, n_terms
    * — the full scored frame, unordered/unlimited). p98 ranks and
    * limits it; p100 ranks it inside its fusion — one text, two
    * consumers, so an arithmetic fix cannot desynchronize them.
    */
  private[queries] val bm25OracleCtes: String =
    """tf AS (
      |  SELECT doc_id, term, COUNT(*) AS f, MAX(dl) AS dl FROM (
      |    SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
      |      unnest(tk) AS term
      |    FROM (SELECT doc_id,
      |            list_filter(string_split(text, ' '),
      |              t -> t <> '') AS tk
      |          FROM documents))
      |  GROUP BY doc_id, term),
      |dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      |tot AS (
      |  SELECT COUNT(*) AS nd, SUM(dl) AS tt FROM
      |    (SELECT doc_id, MAX(dl) AS dl FROM tf GROUP BY doc_id)),
      |q13 AS (
      |  SELECT term, df FROM dfr ORDER BY df DESC, term LIMIT 13),
      |qt AS (SELECT term, df FROM q13
      |       ORDER BY df ASC, term DESC LIMIT 4),
      |qi AS (
      |  SELECT term,
      |    CAST(floor(log2(greatest(CAST(1 AS BIGINT),
      |      ((nd - df) * 2 + 1) * 1048576 // (2 * df + 1))))
      |      AS BIGINT) AS idf
      |  FROM qt, tot),
      |sc AS (
      |  SELECT tf.doc_id,
      |    CAST(CAST(idf AS HUGEINT) * 22 * tt * f * 1000000
      |      // (10 * CAST(tt AS HUGEINT) * f + 3 * tt
      |         + 9 * CAST(nd AS HUGEINT) * dl)
      |      AS BIGINT) AS s
      |  FROM tf JOIN qi USING (term), tot),
      |bm AS (
      |  SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score,
      |    CAST(COUNT(*) AS BIGINT) AS n_terms
      |  FROM sc GROUP BY doc_id)""".stripMargin

  /** Per-process scratch root (pid-keyed, cleaned on JVM exit). */
  private lazy val scratchRoot: String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_p5_scratch_${ProcessHandle.current().pid()}")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(d)
    }
    d.getPath
  }
}
