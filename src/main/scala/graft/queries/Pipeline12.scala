package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Twelfth pipeline batch — the round-12 exact-integer audit
  * completions built on the [[graft.functions.DecVecCosineE6]] /
  * quantE9 discipline (no float anywhere on a rendered or compared
  * value):
  *
  *  - cross-fold semantic contamination: p166 gives deterministic
  *    folds and p12 the exact near-dup pair set; a split is only
  *    trustworthy when the two COMPOSE cleanly — a semantic duplicate
  *    straddling train/validation folds leaks the answer key even
  *    when every fold is size- and label-balanced.
  *  - linear-kernel MMD drift (Gretton et al. JMLR 2012, public):
  *    MMD² under the linear kernel is ||mean_P − mean_Q||², which
  *    over quantized integer embeddings is integer arithmetic on
  *    e12-quantized per-dim means (sign-safe trunc division; the
  *    quantization unit is the documented price for an overflow
  *    bound independent of group size) — the embedding-space
  *    complement of the token-space drift monitors (p62 L2, p146 KS,
  *    p157 PSI).
  */
object Pipeline12 {
  import graft.Tables.t

  /** The p166 fold convention applied to vec_id: arithmetic on the
    * first two md5 hex chars, mod 5 — engine-portable where a 64-bit
    * multiplicative hash is not.
    */
  private def foldOf(idSql: String): String =
    s"pmod(ascii(substring(md5(CAST($idSql AS STRING)), 1, 1)) * 16" +
      s" + ascii(substring(md5(CAST($idSql AS STRING)), 2, 1)), 5)"

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // CROSS-FOLD SEMANTIC CONTAMINATION AUDIT: the check that p166's
      // balance audit is NOT — balanced folds can still leak when a
      // near-duplicate pair straddles two folds (the eval half answers
      // the train half). Folds are the deterministic md5-arithmetic
      // assignment (the p166/p19 portability convention, on vec_id);
      // pairs are the EXACT integer micro-cosine near-dups at
      // sim_e6 >= 400000 (p12's set — scale-exact since round 12, so
      // this composition hash-gates at every SF). Output: one row per
      // unordered fold pair with its pair count plus each pair class's
      // share of all near-dup pairs in ppm; off-diagonal rows ARE the
      // contamination. Scale shape: the pair set comes from the
      // near-dup family — p172 (Pipeline13) is the LSH-banded DEFAULT
      // a 100 TB user reaches first; this exact companion is the
      // broadcast-capped fixture path; fold assignment is
      // one map-side expression per pair side, and everything after is
      // a 15-row fold-pair dictionary.
      "p167_crossfold_contamination",
      (s, dir) => {
        import s.implicits._
        val pairs = graft.operators.Similarity.nearDupPairsExact(
          t(s, dir, "embeddings"), "vec_id", "embedding", minSim = 0.4)
        val withFolds = pairs.select(
          expr(foldOf("id_a")).as("fa"),
          expr(foldOf("id_b")).as("fb"))
          .select(least($"fa", $"fb").as("fold_a"),
            greatest($"fa", $"fb").as("fold_b"))
        val counts = withFolds.groupBy($"fold_a", $"fold_b")
          .agg(count(lit(1)).as("n_pairs"))
        val tot = counts.agg(sum($"n_pairs").as("nn"))
        counts.crossJoin(broadcast(tot))
          .select($"fold_a", $"fold_b", $"n_pairs",
            expr("n_pairs * 1000000 DIV nn").as("share_ppm"),
            ($"fold_a" =!= $"fold_b").as("cross_fold"))
          .orderBy($"fold_a", $"fold_b")
      },
      Some {
        // DuckDB % matches Spark pmod on nonnegative operands; the md5
        // char arithmetic is nonnegative by construction
        def fold(id: String) =
          s"((ascii(substr(md5(CAST($id AS VARCHAR)), 1, 1)) * 16" +
            s" + ascii(substr(md5(CAST($id AS VARCHAR)), 2, 1))) % 5)"
        s"""WITH el AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |         ${Pipeline.quantE9("unnest(a.embedding)")} AS x,
           |         ${Pipeline.quantE9("unnest(b.embedding)")} AS y
           |       FROM embeddings a JOIN embeddings b
           |         ON a.vec_id < b.vec_id),
           |s AS (SELECT id_a, id_b, SUM(CAST(x AS HUGEINT) * y) AS dot18,
           |             SUM(CAST(x AS HUGEINT) * x) AS nx18,
           |             SUM(CAST(y AS HUGEINT) * y) AS ny18
           |      FROM el GROUP BY id_a, id_b),
           |${Pipeline.exactC6Ctes("pc6", "s", Seq("id_a", "id_b"))},
           |pf AS (
           |  SELECT LEAST(${fold("id_a")}, ${fold("id_b")}) AS fold_a,
           |    GREATEST(${fold("id_a")}, ${fold("id_b")}) AS fold_b
           |  FROM pc6 WHERE c6 >= 400000),
           |cnt AS (SELECT fold_a, fold_b, COUNT(*) AS n_pairs
           |        FROM pf GROUP BY 1, 2),
           |tt AS (SELECT SUM(n_pairs) AS nn FROM cnt)
           |SELECT fold_a, fold_b, CAST(n_pairs AS BIGINT) AS n_pairs,
           |  CAST(n_pairs * 1000000 // nn AS BIGINT) AS share_ppm,
           |  fold_a <> fold_b AS cross_fold
           |FROM cnt, tt
           |ORDER BY fold_a, fold_b""".stripMargin
      }),

    QueryDef(
      // EMBEDDING-SPACE MMD DRIFT (linear kernel): for every unordered
      // label pair, MMD² = ||mean_a − mean_b||² — the embedding-space
      // drift score next to the token-space monitors (p62/p146/p157):
      // two sources can match every token statistic and still embed
      // into different regions. Integer arithmetic over quantE9
      // elements with per-dim means QUANTIZED to e12 units before the
      // square: m_e12 = trunc(S_e9·10³ / n) via the sign-safe
      // negate-divide-negate (the p162/q54 form — Spark DIV truncates,
      // DuckDB // floors, so a negative sum never reaches either
      // operator directly), then MMD²_e12 = Σ_d (m_ad − m_bd)² DIV
      // 10¹². The mean quantization unit is 10⁻¹² per coordinate — the
      // documented, bounded price for an overflow shape INDEPENDENT of
      // group size: the old cross-multiplied form (S_a·n_b − S_b·n_a)²
      // scales as (n_a·n_b·Δ_e9)² and blows past DECIMAL(38,0)/HUGEINT
      // at ~10⁶ vectors per group under real drift, while here every
      // squared term is ≤ (2·A·10¹²)² for element bound A, so V ≤
      // dims·4·A²·10²⁴ — under 10³⁸ for any dims·A² ≤ 2.5·10¹², i.e.
      // every real embedding table at ANY corpus size (the scaled
      // sums S·10³ stay linear in n and fit DECIMAL(38,0) to n·A ≤
      // 10²⁶ vectors).
      // Scale shape: ONE corpus pass folds to the (label × dim) sum
      // dictionary (partial-aggregable longs then decimal — the p162
      // two-level discipline is unnecessary here: per-dim sums are
      // linear, not squared); the pair expansion is an equi-join of
      // that dictionary with itself on dim; nothing corpus-sized
      // shuffles and no window exists.
      "p168_embedding_mmd_drift",
      (s, dir) => {
        import s.implicits._
        val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val base = t(s, dir, "embeddings").filter($"embedding".isNotNull)
        val cells = base
          .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
          .select($"label", $"dim",
            floor($"v".cast("double") * lit(1e9)).cast("long").as("xe9"))
          .groupBy($"label", $"dim")
          // cast BEFORE aggregating (the KMeansOp.fit discipline): a
          // LongType sum wraps silently at n·A ~ 9.2e18 while the
          // oracle's SUM(BIGINT) widens to HUGEINT — the decimal sum
          // keeps both engines exact to the documented n·A ≤ 1e26
          .agg(sum($"xe9".cast(D38)).as("sx"), count(lit(1)).as("n"))
        val means = cells.select($"label", $"dim", $"n",
          expr("CASE WHEN sx >= 0 THEN (sx * 1000) DIV n" +
            " ELSE -(((-sx) * 1000) DIV n) END").as("m"))
        val a = means.select($"label".as("label_a"), $"dim",
          $"m".as("ma"), $"n".as("na"))
        val b = means.select($"label".as("label_b"), $"dim",
          $"m".as("mb"), $"n".as("nb"))
        a.join(b, Seq("dim")).filter($"label_a" < $"label_b")
          .groupBy($"label_a", $"label_b")
          .agg(max($"na").as("n_a"), max($"nb").as("n_b"),
            sum(($"ma".cast(D38) - $"mb") *
              ($"ma".cast(D38) - $"mb")).as("v"))
          .select($"label_a", $"label_b", $"n_a", $"n_b",
            expr("v DIV 1000000000000").as("mmd2_e12"))
          .orderBy($"label_a", $"label_b")
      },
      Some(s"""WITH cells AS (
             |  SELECT label,
             |    CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
             |    ${Pipeline.quantE9("unnest(embedding)")} AS xe9
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |sums AS (
             |  SELECT label, dim, CAST(SUM(xe9) AS HUGEINT) AS sx,
             |    CAST(COUNT(*) AS HUGEINT) AS n
             |  FROM cells GROUP BY 1, 2),
             |means AS (
             |  SELECT label, dim, n,
             |    CASE WHEN sx >= 0 THEN (sx * 1000) // n
             |         ELSE -(((-sx) * 1000) // n) END AS m
             |  FROM sums),
             |pairs AS (
             |  SELECT a.label AS label_a, b.label AS label_b,
             |    MAX(a.n) AS na, MAX(b.n) AS nb,
             |    SUM((a.m - b.m) * (a.m - b.m)) AS v
             |  FROM means a JOIN means b
             |    ON a.dim = b.dim AND a.label < b.label
             |  GROUP BY 1, 2)
             |SELECT label_a, label_b,
             |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
             |  CAST(v // 1000000000000 AS BIGINT)
             |    AS mmd2_e12
             |FROM pairs
             |ORDER BY label_a, label_b""".stripMargin)),

    QueryDef(
      // HOURLY MMD DRIFT (p168 run as a MONITOR — the p154/p163
      // convention applied to embedding space): baseline mean from the
      // even-vec split ("yesterday's corpus"), per synthetic ingest
      // hour the linear-kernel MMD² of that hour's arrivals (odd vecs,
      // the p110/p163 deterministic timestamp convention) against it —
      // the alarm that a crawl started embedding somewhere new even
      // when every token statistic holds. Same e12-quantized integer
      // means as p168 (the n-independent overflow shape): per dim
      // m_e12 = trunc(S_e9·10³/n) sign-safely, then
      // MMD²_e12 = Σ_d (m_wd − m_bd)² DIV 10¹² over quantE9
      // elements. The streaming twin
      // (EmbedStreams.mmdDriftStream, pinned stream == batch against
      // THIS entry) computes the identical score inside one
      // watermarked windowed aggregation — the fixed embedding width
      // is the closed domain that pivots the per-dim sums into
      // columns. Scale shape: one (hour × dim) sum shuffle
      // (partial-aggregable longs; the hour × 64 spine is
      // dictionary-sized), the baseline a 64-row broadcast.
      "p169_mmd_drift_hourly",
      (s, dir) => {
        import s.implicits._
        val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val emb = t(s, dir, "embeddings").filter($"embedding".isNotNull)
        def quant = transform($"embedding",
          x => floor(x.cast("double") * lit(1e9)).cast("long"))
        val bcells = emb.filter($"vec_id" % 2 === 0)
          .select(posexplode(quant).as(Seq("dim", "xe9")))
          .groupBy($"dim")
          // decimal-sum before aggregate — same wraparound note as p168
          .agg(sum($"xe9".cast(D38)).as("b"), count(lit(1)).as("bn0"))
        val bmeans = bcells.select($"dim",
          expr("CASE WHEN b >= 0 THEN (b * 1000) DIV bn0" +
            " ELSE -(((-b) * 1000) DIV bn0) END").as("mb"))
        val cells = emb.filter($"vec_id" % 2 === 1)
          .withColumn("w", expr(
            "date_trunc('hour', timestamp_seconds(" +
              "1767225600 + (vec_id * 97) % 172800))"))
          .select($"w", posexplode(quant).as(Seq("dim", "xe9")))
          .groupBy($"w", $"dim")
          // decimal-sum before aggregate — same wraparound note as p168
          .agg(sum($"xe9".cast(D38)).as("sx"), count(lit(1)).as("n"))
        val wmeans = cells.select($"w", $"n", $"dim",
          expr("CASE WHEN sx >= 0 THEN (sx * 1000) DIV n" +
            " ELSE -(((-sx) * 1000) DIV n) END").as("mw"))
        wmeans.join(broadcast(bmeans), Seq("dim"))
          .select($"w", $"n",
            (($"mw".cast(D38) - $"mb") *
              ($"mw".cast(D38) - $"mb")).as("term"))
          .groupBy($"w")
          .agg(max($"n").as("n_vecs"), sum($"term").as("v"))
          .select($"w".as("w_start"), $"n_vecs",
            expr("v DIV 1000000000000").as("mmd2_e12"))
          .orderBy($"w_start")
      },
      Some(s"""WITH cells0 AS (
             |  SELECT vec_id,
             |    CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
             |    ${Pipeline.quantE9("unnest(embedding)")} AS xe9
             |  FROM embeddings WHERE embedding IS NOT NULL),
             |bl AS (
             |  SELECT dim, CAST(SUM(xe9) AS HUGEINT) AS b,
             |    CAST(COUNT(*) AS HUGEINT) AS bn
             |  FROM cells0 WHERE vec_id % 2 = 0 GROUP BY 1),
             |blm AS (
             |  SELECT dim, CASE WHEN b >= 0 THEN (b * 1000) // bn
             |       ELSE -(((-b) * 1000) // bn) END AS mb
             |  FROM bl),
             |cells AS (
             |  SELECT date_trunc('hour',
             |      to_timestamp(1767225600 + (vec_id * 97) % 172800)
             |        ::TIMESTAMP) AS w,
             |    dim, CAST(SUM(xe9) AS HUGEINT) AS sx,
             |    CAST(COUNT(*) AS HUGEINT) AS n
             |  FROM cells0 WHERE vec_id % 2 = 1 GROUP BY 1, 2),
             |cm AS (
             |  SELECT w, n, dim,
             |    CASE WHEN sx >= 0 THEN (sx * 1000) // n
             |         ELSE -(((-sx) * 1000) // n) END AS mw
             |  FROM cells),
             |hh AS (
             |  SELECT cm.w, MAX(cm.n) AS n,
             |    SUM((cm.mw - blm.mb) * (cm.mw - blm.mb)) AS v
             |  FROM cm JOIN blm USING (dim)
             |  GROUP BY cm.w)
             |SELECT w AS w_start, CAST(n AS BIGINT) AS n_vecs,
             |  CAST(v // 1000000000000 AS BIGINT)
             |    AS mmd2_e12
             |FROM hh
             |ORDER BY w_start""".stripMargin)),

    QueryDef(
      // SEMANTIC DUP CLUSTER INVENTORY: the p24 pairs->clusters
      // composition run on the EMBEDDING near-dup graph — transitive
      // closure over the exact sim_e6 >= 400000 pair set (p12's,
      // scale-exact), one row per non-trivial cluster with its size
      // and LABEL mix. Clusters spanning labels are the actionable
      // rows: a near-identical vector pair with different labels is
      // either a labeling error or a leak, and neither pairwise lists
      // (p12) nor per-label stats (p168) surface the transitive case.
      // Scale shape: the pair graph is id-only (the CC operator's
      // pointer-doubling machinery, checkpointed — the p24/p96 path);
      // the label join-back touches only clustered ids; output is
      // cluster-count-sized. Oracle: recursive min-reachable-id CTE
      // over the same exact pair set. The pair SOURCE here is the
      // broadcast-capped exact companion — p171 (Pipeline13) is the
      // LSH-banded DEFAULT a 100 TB user reaches first, gated against
      // the same exact twin.
      "p170_semantic_clusters",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val pairs = graft.operators.Similarity.nearDupPairsExact(
          emb, "vec_id", "embedding", minSim = 0.4)
        val labels = graft.operators.Dedup.connectedComponents(pairs)
        labels.join(emb.select($"vec_id".as("id"), $"label"), Seq("id"))
          .groupBy($"cluster_id")
          .agg(count(lit(1)).as("n_members"),
            countDistinct($"label").as("n_labels"),
            min($"id").as("min_id"), max($"id").as("max_id"))
          .select($"cluster_id", $"n_members", $"n_labels",
            ($"n_labels" > 1).as("cross_label"), $"min_id", $"max_id")
          .orderBy($"cluster_id")
      },
      Some(s"""WITH RECURSIVE el AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |         ${Pipeline.quantE9("unnest(a.embedding)")} AS x,
           |         ${Pipeline.quantE9("unnest(b.embedding)")} AS y
           |       FROM embeddings a JOIN embeddings b
           |         ON a.vec_id < b.vec_id),
           |s AS (SELECT id_a, id_b, SUM(CAST(x AS HUGEINT) * y) AS dot18,
           |             SUM(CAST(x AS HUGEINT) * x) AS nx18,
           |             SUM(CAST(y AS HUGEINT) * y) AS ny18
           |      FROM el GROUP BY id_a, id_b),
           |${Pipeline.exactC6Ctes("pc6", "s", Seq("id_a", "id_b"))},
           |pp AS MATERIALIZED (
           |  SELECT id_a, id_b FROM pc6 WHERE c6 >= 400000),
           |edges AS MATERIALIZED (
           |  SELECT id_a AS src, id_b AS dst FROM pp
           |  UNION ALL SELECT id_b, id_a FROM pp),
           |reach AS (
           |  SELECT src AS id, src AS lbl FROM edges
           |  UNION
           |  SELECT e.dst AS id, r.lbl AS lbl
           |  FROM reach r JOIN edges e ON e.src = r.id),
           |cl AS (SELECT id, MIN(lbl) AS cluster_id
           |       FROM reach GROUP BY id)
           |SELECT cl.cluster_id, COUNT(*) AS n_members,
           |  CAST(COUNT(DISTINCT e.label) AS BIGINT) AS n_labels,
           |  COUNT(DISTINCT e.label) > 1 AS cross_label,
           |  MIN(cl.id) AS min_id, MAX(cl.id) AS max_id
           |FROM cl JOIN embeddings e ON e.vec_id = cl.id
           |GROUP BY cl.cluster_id
           |ORDER BY cl.cluster_id""".stripMargin))
  )
}
