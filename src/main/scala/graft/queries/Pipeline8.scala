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
              |ORDER BY ws.w""".stripMargin))
  )
}
