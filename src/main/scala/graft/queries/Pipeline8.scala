package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Eighth pipeline batch — tokenizer-fit and privacy-audit primitives:
  * per-source fertility/compression of the unigram tokenizer (the
  * "does this tokenizer fit this corpus slice" signal a mixture
  * planner reads before committing a vocabulary), and a k-anonymity
  * audit over the document metadata quasi-identifiers (the release
  * gate a curated corpus passes before metadata ships with it).
  */
object Pipeline8 {
  import graft.Tables.t

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // TOKENIZER FERTILITY PER SOURCE (pieces-per-token and
      // chars-per-piece of the p120 unigram tokenizer, sliced by
      // source): fertility is THE tokenizer-fit metric — a source
      // whose text segments into many short pieces (or UNKs) pays more
      // sequence length per character, and a mixture planner
      // re-weights or re-trains before ingesting it at scale. The
      // encode runs ONCE over the DISTINCT word dictionary (the
      // p114/p120 discipline) producing per-word (n_pieces, is_unk);
      // per-(source, word) counts join back on the word key — the
      // corpus-sized frame never meets the DP. All ratios are integer
      // (centi-pieces-per-token, chars-per-piece ppm), floored
      // identically by both engines. Scale shape: one (source, word)
      // count shuffle, one dictionary join, one per-source aggregate —
      // all partial-aggregable.
      "p123_tokenizer_fertility",
      (s, dir) => {
        import s.implicits._
        import graft.functions.UnigramFunctions.unigram_pieces
        val bySrc = t(s, dir, "documents")
          .select($"source", explode(split($"text", " ")).as("word"))
          .groupBy($"source", $"word").agg(count(lit(1)).as("cnt"))
        val dict = bySrc.select($"word").distinct()
          .select($"word",
            unigram_pieces($"word", Pipeline7.UgVocab).as("pieces"))
          .select($"word", size($"pieces").as("np"),
            ($"pieces" === array(lit("[UNK]"))).as("unk"))
        bySrc.join(dict, "word")
          .groupBy($"source")
          .agg(
            sum($"cnt").as("n_tokens"),
            sum($"cnt" * $"np").as("n_pieces"),
            sum(when($"unk", $"cnt").otherwise(0L)).as("n_unk_tokens"),
            sum($"cnt" * length($"word")).as("n_chars"))
          .select($"source", $"n_tokens", $"n_pieces", $"n_unk_tokens",
            expr("n_pieces * 100 DIV n_tokens").as("fertility_centi"),
            expr("n_chars * 1000000 DIV n_pieces").as("chars_per_piece_ppm"),
            expr("n_unk_tokens * 1000000 DIV n_tokens").as("unk_ppm"))
          .orderBy($"source")
      },
      Some(s"""WITH RECURSIVE vocab(piece, cost) AS
              |  (VALUES ${Pipeline7.ugVocabValues}),
              |ws AS MATERIALIZED (
              |  SELECT source, word, COUNT(*) AS cnt
              |  FROM (SELECT source,
              |          unnest(string_split(text, ' ')) AS word
              |        FROM documents)
              |  GROUP BY 1, 2),
              |wc AS MATERIALIZED (
              |  SELECT word, CAST(SUM(cnt) AS BIGINT) AS cnt
              |  FROM ws GROUP BY 1),
              |pos AS MATERIALIZED (
              |  SELECT word, CAST(unnest(generate_series(1, length(word))) AS INT) AS p
              |  FROM wc),
              |${Pipeline7.ugEncodeCtes("vocab", "a")},
              |pw AS MATERIALIZED (
              |  SELECT word, CAST(len(pieces) AS BIGINT) AS np,
              |    (pieces = ['[UNK]']) AS unk
              |  FROM aenc)
              |SELECT ws.source,
              |  CAST(SUM(ws.cnt) AS BIGINT) AS n_tokens,
              |  CAST(SUM(ws.cnt * pw.np) AS BIGINT) AS n_pieces,
              |  CAST(SUM(CASE WHEN pw.unk THEN ws.cnt ELSE 0 END)
              |    AS BIGINT) AS n_unk_tokens,
              |  CAST(SUM(ws.cnt * pw.np) * 100
              |    // SUM(ws.cnt) AS BIGINT) AS fertility_centi,
              |  CAST(SUM(ws.cnt * length(ws.word)) * 1000000
              |    // SUM(ws.cnt * pw.np) AS BIGINT) AS chars_per_piece_ppm,
              |  CAST(SUM(CASE WHEN pw.unk THEN ws.cnt ELSE 0 END) * 1000000
              |    // SUM(ws.cnt) AS BIGINT) AS unk_ppm
              |FROM ws JOIN pw ON pw.word = ws.word
              |GROUP BY ws.source
              |ORDER BY ws.source""".stripMargin)),

    QueryDef(
      // K-ANONYMITY AUDIT over metadata quasi-identifiers (Sweeney
      // 2002, public): before a curated corpus ships with per-document
      // metadata, every combination of quasi-identifiers (source,
      // lang, length bucket of 100 chars) must be shared by at least
      // k=5 documents, or the rare combination re-identifies its
      // members. Reports, per source: equivalence classes, rows,
      // risky classes/rows (class size < 5), the minimum class size,
      // and the risky-row fraction in ppm — the audit a release gate
      // reads. Scale shape: ONE partial-aggregable (source, lang,
      // bucket) count shuffle; everything after is dictionary-sized.
      // At 100 TB the class dictionary is bounded by the
      // quasi-identifier domain, not the corpus.
      "p124_k_anonymity",
      (s, dir) => {
        import s.implicits._
        val classes = t(s, dir, "documents")
          .select($"source", $"lang",
            expr("n_chars DIV 100").as("bucket"))
          .groupBy($"source", $"lang", $"bucket")
          .agg(count(lit(1)).as("c"))
        classes.groupBy($"source")
          .agg(
            count(lit(1)).as("n_classes"),
            sum($"c").as("n_rows"),
            sum(when($"c" < 5, 1L).otherwise(0L)).as("n_risky_classes"),
            sum(when($"c" < 5, $"c").otherwise(0L)).as("n_risky_rows"),
            min($"c").as("min_class_size"))
          .select($"source", $"n_classes", $"n_rows",
            $"n_risky_classes", $"n_risky_rows", $"min_class_size",
            expr("n_risky_rows * 1000000 DIV n_rows").as("risk_ppm"))
          .orderBy($"source")
      },
      Some("""WITH cls AS (
             |  SELECT source, lang, n_chars // 100 AS bucket,
             |    COUNT(*) AS c
             |  FROM documents
             |  GROUP BY 1, 2, 3)
             |SELECT source,
             |  CAST(COUNT(*) AS BIGINT) AS n_classes,
             |  CAST(SUM(c) AS BIGINT) AS n_rows,
             |  CAST(SUM(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_risky_classes,
             |  CAST(SUM(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT)
             |    AS n_risky_rows,
             |  CAST(MIN(c) AS BIGINT) AS min_class_size,
             |  CAST(SUM(CASE WHEN c < 5 THEN c ELSE 0 END) * 1000000
             |    // SUM(c) AS BIGINT) AS risk_ppm
             |FROM cls GROUP BY source
             |ORDER BY source""".stripMargin)),

    QueryDef(
      // CLASSIFIER CALIBRATION / ECE (reliability binning — Naeini et
      // al. 2015's ECE, public): the metric that tells a filtering
      // pipeline whether its quality classifier's CONFIDENCES mean
      // anything (an AUC-strong but miscalibrated classifier
      // mis-budgets every threshold cut). The classifier under audit:
      // "is this document English?", confidence from an integer
      // feature (count of the word 'the' plus a length term, clamped
      // to [0, 999999] ppm) — genuinely correlated with the label, so
      // bins spread and the gaps are real. EXACT arithmetic end to
      // end: bin = conf DIV 100000 (ten bins), per-bin accuracy and
      // mean confidence are integer ppm, the per-bin gap is
      // |n_pos·10⁶ − Σconf| DIV n, and ECE·10⁶ = Σ_b |n_pos_b·10⁶ −
      // Σconf_b| DIV N — no float anywhere, both engines floor
      // identically. Scale shape: one map-side confidence expression,
      // one 10-bin partial-aggregable groupBy; everything after is
      // bin-dictionary-sized.
      "p125_calibration_ece",
      (s, dir) => {
        import s.implicits._
        val scored = t(s, dir, "documents")
          .select(
            least(lit(999999L),
              expr("size(filter(split(text, ' '), w -> w = 'the'))")
                * 250000L + expr("n_chars DIV 2")).as("conf"),
            when($"lang" === "en", 1L).otherwise(0L).as("pos"))
          .select(expr("conf DIV 100000").as("bin"), $"conf", $"pos")
        val bins = scored.groupBy($"bin")
          .agg(count(lit(1)).as("n"), sum($"pos").as("n_pos"),
            sum($"conf").as("sum_conf"))
        val ece = bins.agg(
          expr("sum(abs(n_pos * 1000000 - sum_conf)) DIV sum(n)")
            .as("ece_ppm"))
        bins.crossJoin(broadcast(ece))
          .select($"bin", $"n", $"n_pos",
            expr("n_pos * 1000000 DIV n").as("acc_ppm"),
            expr("sum_conf DIV n").as("mean_conf_ppm"),
            expr("abs(n_pos * 1000000 - sum_conf) DIV n").as("gap_ppm"),
            $"ece_ppm")
          .orderBy($"bin")
      },
      Some("""WITH scored AS (
             |  SELECT LEAST(999999,
             |      len(list_filter(string_split(text, ' '),
             |        w -> w = 'the')) * 250000 + n_chars // 2) AS conf,
             |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
             |  FROM documents),
             |bins AS (
             |  SELECT conf // 100000 AS bin, COUNT(*) AS n,
             |    SUM(pos) AS n_pos, SUM(conf) AS sum_conf
             |  FROM scored GROUP BY 1),
             |ece AS (
             |  SELECT CAST(SUM(ABS(n_pos * 1000000 - sum_conf))
             |    // SUM(n) AS BIGINT) AS ece_ppm
             |  FROM bins)
             |SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
             |  CAST(n_pos AS BIGINT) AS n_pos,
             |  CAST(n_pos * 1000000 // n AS BIGINT) AS acc_ppm,
             |  CAST(sum_conf // n AS BIGINT) AS mean_conf_ppm,
             |  CAST(ABS(n_pos * 1000000 - sum_conf) // n AS BIGINT)
             |    AS gap_ppm,
             |  ece.ece_ppm
             |FROM bins, ece
             |ORDER BY bin""".stripMargin)),

    QueryDef(
      // TOKENIZER FERTILITY DRIFT PER INGEST HOUR — the batch form of
      // streaming.TokenStreams.fertilityStream (stream == batch pinned
      // by TokenStreamsSpec under ragged micro-batch splits; the
      // windowed sums carry no dedup state, so batch placement cannot
      // matter): fertility and UNK rate of each hour's arrivals — a
      // crawl whose fertility spikes is changing register/language and
      // the ingest router should notice BEFORE the tokens are bought.
      // Event time derives from doc_id (the p110/p116 epoch recipe).
      // Batch side keeps the dictionary discipline: the DP runs once
      // per distinct word, per-(hour, word) counts join back on the
      // word key. Integer centi/ppm ratios as p123.
      "p126_fertility_drift",
      (s, dir) => {
        import s.implicits._
        import graft.functions.UnigramFunctions.unigram_pieces
        val byHour = t(s, dir, "documents")
          .withColumn("ts", expr(
            "timestamp_seconds(1767225600 + (doc_id * 97) % 172800)"))
          .select(date_trunc("hour", $"ts").as("w"),
            explode(split($"text", " ")).as("word"))
          .groupBy($"w", $"word").agg(count(lit(1)).as("cnt"))
        val dict = byHour.select($"word").distinct()
          .select($"word",
            unigram_pieces($"word", Pipeline7.UgVocab).as("pieces"))
          .select($"word", size($"pieces").as("np"),
            ($"pieces" === array(lit("[UNK]"))).as("unk"))
        byHour.join(dict, "word")
          .groupBy($"w")
          .agg(
            sum($"cnt").as("n_tokens"),
            sum($"cnt" * $"np").as("n_pieces"),
            sum(when($"unk", $"cnt").otherwise(0L)).as("n_unk_tokens"))
          .select($"w", $"n_tokens", $"n_pieces", $"n_unk_tokens",
            expr("n_pieces * 100 DIV n_tokens").as("fertility_centi"),
            expr("n_unk_tokens * 1000000 DIV n_tokens").as("unk_ppm"))
          .orderBy($"w")
      },
      Some(s"""WITH RECURSIVE vocab(piece, cost) AS
              |  (VALUES ${Pipeline7.ugVocabValues}),
              |wh AS MATERIALIZED (
              |  SELECT date_trunc('hour',
              |      to_timestamp(1767225600 + (doc_id * 97) % 172800)
              |        ::TIMESTAMP) AS w,
              |    unnest(string_split(text, ' ')) AS word
              |  FROM documents),
              |ws AS MATERIALIZED (
              |  SELECT w, word, COUNT(*) AS cnt FROM wh GROUP BY 1, 2),
              |wc AS MATERIALIZED (
              |  SELECT word, CAST(SUM(cnt) AS BIGINT) AS cnt
              |  FROM ws GROUP BY 1),
              |pos AS MATERIALIZED (
              |  SELECT word, CAST(unnest(generate_series(1, length(word))) AS INT) AS p
              |  FROM wc),
              |${Pipeline7.ugEncodeCtes("vocab", "a")},
              |pw AS MATERIALIZED (
              |  SELECT word, CAST(len(pieces) AS BIGINT) AS np,
              |    (pieces = ['[UNK]']) AS unk
              |  FROM aenc)
              |SELECT ws.w,
              |  CAST(SUM(ws.cnt) AS BIGINT) AS n_tokens,
              |  CAST(SUM(ws.cnt * pw.np) AS BIGINT) AS n_pieces,
              |  CAST(SUM(CASE WHEN pw.unk THEN ws.cnt ELSE 0 END)
              |    AS BIGINT) AS n_unk_tokens,
              |  CAST(SUM(ws.cnt * pw.np) * 100
              |    // SUM(ws.cnt) AS BIGINT) AS fertility_centi,
              |  CAST(SUM(CASE WHEN pw.unk THEN ws.cnt ELSE 0 END) * 1000000
              |    // SUM(ws.cnt) AS BIGINT) AS unk_ppm
              |FROM ws JOIN pw ON pw.word = ws.word
              |GROUP BY ws.w
              |ORDER BY ws.w""".stripMargin)),

    QueryDef(
      // ROUGE-L EVAL-SET DECONTAMINATION (token-LCS against held-out
      // references — Lin 2004, public): the decontam signal n-gram
      // matching misses: a paraphrased or token-dropped copy of an
      // eval prompt shares a long COMMON SUBSEQUENCE with it even when
      // every contiguous n-gram is broken (p96's Bloom decontam and
      // the containment entries are exact-n-gram; this catches the
      // reordering-robust leak class). ROUGE-L's F at beta=1 reduces
      // to 2*LCS/(m+n), so the whole metric is integer ppm — both
      // engines floor identically. Per reference probe: documents over
      // the 150000-ppm flag line, the worst offender's score, and
      // total LCS mass. Scale shape: the probes are plan literals, the
      // LCS runs map-side per document (O(doc_tokens * ref_tokens),
      // native codegen expression), ONE partial-aggregable probe-keyed
      // aggregate — nothing corpus-sized survives the map stage. The
      // oracle replays the 2-D DP relationally: a windowed prefix-max
      // CTE ladder over the row-sparse LCS recurrence
      // L[j][i] = max(L[j-1][i], max_{i'<=i, tok=ref_j} L[j-1][i'-1]+1)
      // — one ladder step per reference token position, each step one
      // LEFT JOIN + running max (validated against an independent
      // full-table LCS before shipping).
      "p128_rougel_decontam",
      (s, dir) => {
        import s.implicits._
        import graft.functions.LcsFunctions.lcs_tokens
        val lcsCols = EvalRefs.zipWithIndex.map { case ((_, toks), rid) =>
          struct(lit(rid).as("rid"), lit(toks.size).as("rlen"),
            lcs_tokens($"text", toks).cast("long").as("lcs")).as(s"r$rid")
        }
        t(s, dir, "documents")
          .select($"doc_id",
            size(split($"text", " ")).cast("long").as("n"),
            explode(array(lcsCols: _*)).as("r"))
          .select($"doc_id", $"n", $"r.rid".as("rid"),
            $"r.rlen".as("rlen"), $"r.lcs".as("lcs"))
          .select($"rid", $"lcs",
            expr("2 * lcs * 1000000 DIV (n + rlen)").as("f_ppm"))
          .groupBy($"rid")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"f_ppm" >= 150000L, 1L).otherwise(0L))
              .as("n_flagged"),
            max($"f_ppm").as("max_f_ppm"),
            sum($"lcs").as("sum_lcs"))
          .withColumn("ref",
            element_at(array(EvalRefs.map(r => lit(r._1)): _*), $"rid" + 1))
          .select($"rid".cast("long").as("rid"), $"ref", $"n_docs",
            $"n_flagged", $"max_f_ppm", $"sum_lcs")
          .orderBy($"rid")
      },
      Some(s"""WITH refs(rid, j, rtok, rlen) AS (VALUES $evalRefValues),
              |dt AS MATERIALIZED (
              |  SELECT doc_id,
              |    CAST(unnest(generate_series(1, len(toks))) AS INT) AS i,
              |    unnest(toks) AS tok, len(toks) AS n
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
              |        FROM documents)),
              |dn AS MATERIALIZED (
              |  SELECT doc_id, MAX(n) AS n FROM dt GROUP BY 1),
              |row0 AS MATERIALIZED (
              |  SELECT dn.doc_id, r.rid,
              |    CAST(unnest(generate_series(0, dn.n)) AS INT) AS i,
              |    CAST(0 AS BIGINT) AS dp
              |  FROM dn CROSS JOIN (SELECT DISTINCT rid FROM refs) r),
              |${lcsLadder(EvalRefs.map(_._2.size).max)},
              |lcs AS (
              |  SELECT doc_id, rid, MAX(dp) AS lcs
              |  FROM row${EvalRefs.map(_._2.size).max} GROUP BY 1, 2),
              |f AS (
              |  SELECT l.doc_id, l.rid, l.lcs,
              |    CAST(2 * l.lcs * 1000000 // (dn.n + r.rlen) AS BIGINT)
              |      AS f_ppm
              |  FROM lcs l JOIN dn ON dn.doc_id = l.doc_id
              |  JOIN (SELECT DISTINCT rid, rlen FROM refs) r
              |    ON r.rid = l.rid),
              |rn(rid, ref) AS (VALUES $evalRefNames)
              |SELECT CAST(f.rid AS BIGINT) AS rid, rn.ref,
              |  COUNT(*) AS n_docs,
              |  CAST(SUM(CASE WHEN f_ppm >= 150000 THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_flagged,
              |  CAST(MAX(f_ppm) AS BIGINT) AS max_f_ppm,
              |  CAST(SUM(lcs) AS BIGINT) AS sum_lcs
              |FROM f JOIN rn ON rn.rid = f.rid
              |GROUP BY f.rid, rn.ref
              |ORDER BY rid""".stripMargin)),

    QueryDef(
      // LOCAL-ALIGNMENT QUOTE DETECTION (token Smith-Waterman vs the
      // same held-out probes — Smith & Waterman 1981, public): the
      // CONTIGUITY-weighted companion to p128's ROUGE-L. LCS scores a
      // verbatim 4-token quote and 4 scattered tokens identically;
      // local alignment (match +2, mismatch -1, gap -1, floor 0)
      // scores the quote 8 and lets scatter decay — the verbatim-leak
      // detector. Flag line sw >= 6 (a clean 3-token run, or 4 tokens
      // with one gap). Scale shape identical to p128: probes are plan
      // literals, the DP runs map-side, one probe-keyed aggregate.
      // The oracle replays the 2-D DP as a ladder whose within-row
      // left-gap chain TELESCOPES (linear gap cost): per reference
      // row, core = max(0, diag, up) then
      // S[i] = max_{i'<=i}(core[i'] + i') - i — one running max per
      // step, the floor-at-0 free because core >= 0. The best cell can
      // sit mid-table, so the final max scans ALL ladder rows, not the
      // last (validated against an independent full-table SW before
      // shipping).
      "p129_local_align",
      (s, dir) => {
        import s.implicits._
        import graft.functions.LcsFunctions.sw_tokens
        val swCols = EvalRefs.zipWithIndex.map { case ((_, toks), rid) =>
          struct(lit(rid).as("rid"),
            sw_tokens($"text", toks).cast("long").as("sw")).as(s"r$rid")
        }
        t(s, dir, "documents")
          .select($"doc_id", explode(array(swCols: _*)).as("r"))
          .select($"r.rid".as("rid"), $"r.sw".as("sw"))
          .groupBy($"rid")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"sw" >= 6L, 1L).otherwise(0L)).as("n_flagged"),
            max($"sw").as("max_sw"),
            sum($"sw").as("sum_sw"))
          .withColumn("ref",
            element_at(array(EvalRefs.map(r => lit(r._1)): _*), $"rid" + 1))
          .select($"rid".cast("long").as("rid"), $"ref", $"n_docs",
            $"n_flagged", $"max_sw", $"sum_sw")
          .orderBy($"rid")
      },
      Some(s"""WITH refs(rid, j, rtok, rlen) AS (VALUES $evalRefValues),
              |dt AS MATERIALIZED (
              |  SELECT doc_id,
              |    CAST(unnest(generate_series(1, len(toks))) AS INT) AS i,
              |    unnest(toks) AS tok, len(toks) AS n
              |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
              |        FROM documents)),
              |dn AS MATERIALIZED (
              |  SELECT doc_id, MAX(n) AS n FROM dt GROUP BY 1),
              |row0 AS MATERIALIZED (
              |  SELECT dn.doc_id, r.rid,
              |    CAST(unnest(generate_series(0, dn.n)) AS INT) AS i,
              |    CAST(0 AS BIGINT) AS dp
              |  FROM dn CROSS JOIN (SELECT DISTINCT rid FROM refs) r),
              |${swLadder(EvalRefs.map(_._2.size).max)},
              |allrows AS (${(1 to EvalRefs.map(_._2.size).max)
                .map(j => s"SELECT * FROM row$j").mkString(" UNION ALL ")}),
              |sw AS (
              |  SELECT doc_id, rid, MAX(dp) AS sw FROM allrows GROUP BY 1, 2),
              |rn(rid, ref) AS (VALUES $evalRefNames)
              |SELECT CAST(sw.rid AS BIGINT) AS rid, rn.ref,
              |  COUNT(*) AS n_docs,
              |  CAST(SUM(CASE WHEN sw >= 6 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_flagged,
              |  CAST(MAX(sw) AS BIGINT) AS max_sw,
              |  CAST(SUM(sw) AS BIGINT) AS sum_sw
              |FROM sw JOIN rn ON rn.rid = sw.rid
              |GROUP BY sw.rid, rn.ref
              |ORDER BY rid""".stripMargin))
  )

  /** p128's held-out reference probes — fixture-vocabulary token
    * sequences so real (partial, reordered) overlaps exist at every
    * scale. A production pass loads these from the eval registry; the
    * plan shape is identical.
    */
  private val EvalRefs: Seq[(String, Seq[String])] = Seq(
    "the query scan merge data",
    "spark stream join order group",
    "small batch fast hash table row",
    "window filter sort key value vector column"
  ).map(s => s -> s.split(" ").toSeq)

  /** `(0, 1, 'the', 5), (0, 2, 'query', 5), ...` for the p128 oracle. */
  private val evalRefValues: String =
    EvalRefs.zipWithIndex.flatMap { case ((_, toks), rid) =>
      toks.zipWithIndex.map { case (t, j) =>
        s"($rid, ${j + 1}, '$t', ${toks.size})" }
    }.mkString(", ")

  /** `(0, 'the query ...'), ...` for the p128 oracle's name join. */
  private val evalRefNames: String =
    EvalRefs.zipWithIndex.map { case ((name, _), rid) =>
      s"($rid, '$name')" }.mkString(", ")

  /** The p128 oracle's LCS DP as a CTE ladder: step j lifts the DP one
    * reference-token row via the row-sparse recurrence — candidates
    * (match positions against ref token j) LEFT JOIN onto the previous
    * row, then ONE running max over doc positions. MATERIALIZED for
    * the same reason as the p120 ladder (DuckDB CTE re-inlining).
    */
  private def lcsLadder(steps: Int): String =
    (1 to steps).map { j =>
      s"""cand$j AS MATERIALIZED (
         |  SELECT d.doc_id, r.rid, d.i, p.dp + 1 AS v
         |  FROM dt d JOIN refs r ON r.j = $j AND d.tok = r.rtok
         |  JOIN row${j - 1} p ON p.doc_id = d.doc_id AND p.rid = r.rid
         |    AND p.i = d.i - 1),
         |row$j AS MATERIALIZED (
         |  SELECT p.doc_id, p.rid, p.i,
         |    GREATEST(p.dp, COALESCE(MAX(c.v) OVER (
         |      PARTITION BY p.doc_id, p.rid ORDER BY p.i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)) AS dp
         |  FROM row${j - 1} p
         |  LEFT JOIN cand$j c ON c.doc_id = p.doc_id AND c.rid = p.rid
         |    AND c.i = p.i)"""
        .stripMargin
    }.mkString(",\n")

  /** The p129 oracle's Smith-Waterman ladder: per reference row, core
    * = max(0, diag + w, up - 1) from the previous row, then the
    * within-row left-gap chain telescopes (linear gap) into ONE
    * running max of (core + i) - i. Rows past a probe's length only
    * decay (core = max(0, prev - 1)) and can never raise the max, so
    * a shared Jmax ladder serves every probe. MATERIALIZED as always.
    */
  private def swLadder(steps: Int): String =
    (1 to steps).map { j =>
      s"""core$j AS MATERIALIZED (
         |  SELECT p.doc_id, p.rid, p.i,
         |    GREATEST(0,
         |      COALESCE(pd.dp +
         |        CASE WHEN d.tok = r.rtok THEN 2 ELSE -1 END, 0),
         |      p.dp - 1) AS core
         |  FROM row${j - 1} p
         |  LEFT JOIN dt d ON d.doc_id = p.doc_id AND d.i = p.i
         |  LEFT JOIN refs r ON r.rid = p.rid AND r.j = $j
         |  LEFT JOIN row${j - 1} pd ON pd.doc_id = p.doc_id
         |    AND pd.rid = p.rid AND pd.i = p.i - 1),
         |row$j AS MATERIALIZED (
         |  SELECT doc_id, rid, i,
         |    MAX(core + i) OVER (PARTITION BY doc_id, rid ORDER BY i
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - i AS dp
         |  FROM core$j)"""
        .stripMargin
    }.mkString(",\n")
}
