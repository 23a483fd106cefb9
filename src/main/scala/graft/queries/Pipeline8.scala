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
             |ORDER BY source""".stripMargin))
  )
}
