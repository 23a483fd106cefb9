package graft.queries

import graft.QueryDef
import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** Third pipeline batch: video scene-cut detection and contrastive
  * hard-negative mining.
  */
object Pipeline3 {
  import graft.Tables.t

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // VIDEO SCENE-CUT DETECTION, oracle-checked end-to-end through a
      // real Y4M decode: payloads are deterministic synthetic clips
      // whose per-frame luma is (doc_id*7 + frame*13) mod 256, so a cut
      // (mean luma jump >= 0.5) occurs EXACTLY at the mod-256
      // wraparound frames — (doc_id*7 + f*13) % 256 < 13 — and DuckDB
      // replays the full parse->thumb->diff->flag path in closed form
      // without owning a video decoder. The luma step between adjacent
      // frames is either 13 (0.051) or 243 (0.953), both far from the
      // 0.5 threshold, so float-ulp noise in the thumbnail average can
      // never flip a flag. Frame diffs ride a doc-keyed window (bounded
      // per doc), the report is one partial-aggregable groupBy, and
      // payloads never shuffle.
      "p71_scene_cuts",
      (s, dir) => {
        import s.implicits._
        val vids = t(s, dir, "documents").select($"doc_id").as[Long]
          .mapPartitions(_.map(id =>
            (id, Multimodal.syntheticY4m(id, (3 + id % 5).toInt))))
          .toDF("doc_id", "payload")
        Multimodal.sceneCutReport(vids, threshold = 0.5, maxFrames = 16)
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(3 + doc_id % 5 AS BIGINT) AS n_frames,
             |  CAST(SUM(CASE WHEN f >= 1
             |        AND (doc_id*7 + f*13) % 256 < 13
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
             |  COALESCE(string_agg(CASE WHEN f >= 1
             |        AND (doc_id*7 + f*13) % 256 < 13
             |      THEN CAST(f AS VARCHAR) END, ',' ORDER BY f), '')
             |    AS cut_frames
             |FROM documents,
             |  unnest(generate_series(0, 2 + doc_id % 5)) AS g(f)
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    QueryDef(
      // CONTRASTIVE HARD-NEGATIVE MINING — for each anchor vector, the
      // single most-similar vector carrying a DIFFERENT label: the pair
      // an embedding-training pipeline feeds the loss as its hardest
      // negative. The anchor batch (20 vectors) broadcasts, the
      // label-mismatch scan is pure map-side over the corpus, and the
      // per-anchor argmax is a partial-aggregable max(struct(sim,
      // -vec_id)) — deterministic under similarity ties, and NEVER a
      // per-anchor window over corpus-sized partitions.
      //
      // Two-kernel discipline (prune cheap, decide exact): the full
      // corpus x anchor scan ranks with the native codegen'd float
      // vec_dot (one fused primitive loop per pair); only candidates
      // within 1e-3 of each anchor's float maximum are re-scored with
      // the decimal-exact kernel + round(6) that the DuckDB oracle
      // replays. The float kernel's error on unit-normalized dims is
      // ~1e-6, three orders under the margin, so the exact winner is
      // provably inside the pruned set — bit-stable selection at ~1/20
      // of the all-decimal cost (measured 15s -> ~2s at sf0.1).
      "p72_hard_negatives",
      (s, dir) => {
        import s.implicits._
        import graft.functions.VectorFunctions.vec_dot
        val emb = t(s, dir, "embeddings")
        val anchors = emb.filter($"vec_id" < 20)
          // a zero-norm anchor has no defined similarity to anything
          .filter(vec_dot($"embedding", $"embedding") > 0)
          .select($"vec_id".as("a_id"), $"embedding".as("a_vec"),
            $"label".as("a_label"))
        // slim float-scored frame, persisted so the heavy corpus x
        // anchor scan runs ONCE (it feeds both the per-anchor max and
        // the margin prune — unpersisted, Spark evaluates the subtree
        // twice inside the same action). Embeddings are dropped before
        // the persist: candidates re-fetch them by key, so the cached
        // frame is 4 narrow columns, not the vector corpus x 20. The
        // zero-vector guard matters: 0/0 = NaN, which Spark's max
        // treats as LARGEST (DuckDB yields NULL) — without it a single
        // zero vector becomes every anchor's "hardest negative".
        val scored = emb
          .filter(vec_dot($"embedding", $"embedding") > 0)
          .join(broadcast(anchors), $"label" =!= $"a_label")
          .select($"a_id", $"a_label", $"vec_id",
            (vec_dot($"embedding", $"a_vec") /
              (sqrt(vec_dot($"embedding", $"embedding")) *
                sqrt(vec_dot($"a_vec", $"a_vec")))).as("fsim"))
          .filter($"fsim".isNotNull && !isnan($"fsim"))
          .persist()
        val fmax = scored.groupBy($"a_id".as("m_id"))
          .agg(max($"fsim").as("fmax"))
        val cands = scored.join(broadcast(fmax), $"a_id" === $"m_id")
          .filter($"fsim" >= $"fmax" - lit(1e-3))
          .select($"a_id", $"a_label", $"vec_id")
        // tiny candidate set -> broadcast; the vector fetch is one
        // map-side pass over the corpus + the 20-row anchor table
        cands
          .join(emb.select($"vec_id", $"embedding"), Seq("vec_id"))
          .join(broadcast(anchors.select($"a_id", $"a_vec")), Seq("a_id"))
          .select($"a_id", $"a_label", $"vec_id",
            round(Similarity.cosine($"embedding", $"a_vec"), 6).as("sim"))
          .groupBy($"a_id", $"a_label")
          .agg(max(struct($"sim", (-$"vec_id").as("nid"))).as("b"))
          .select($"a_id", $"a_label", (-$"b.nid").as("neg_id"),
            $"b.sim".as("neg_sim"))
          .orderBy($"a_id")
      },
      Some("""WITH a AS (
             |  SELECT vec_id AS a_id, label AS a_label,
             |         embedding AS a_vec
             |  FROM embeddings WHERE vec_id < 20),
             |el AS (
             |  SELECT a.a_id, a.a_label, e.vec_id,
             |    CAST(unnest(e.embedding) AS DECIMAL(18,9)) AS x,
             |    CAST(unnest(a.a_vec) AS DECIMAL(18,9)) AS y
             |  FROM embeddings e CROSS JOIN a
             |  WHERE e.label <> a.a_label),
             |s AS (
             |  SELECT a_id, a_label, vec_id,
             |    CAST(SUM(x*y) AS DOUBLE) AS dot,
             |    CAST(SUM(x*x) AS DOUBLE) AS nx,
             |    CAST(SUM(y*y) AS DOUBLE) AS ny
             |  FROM el GROUP BY a_id, a_label, vec_id
             |  HAVING SUM(x*x) > 0 AND SUM(y*y) > 0),
             |r AS (
             |  SELECT a_id, a_label, vec_id,
             |    round(dot / (sqrt(nx) * sqrt(ny)), 6) AS sim,
             |    row_number() OVER (PARTITION BY a_id
             |      ORDER BY round(dot / (sqrt(nx) * sqrt(ny)), 6) DESC,
             |               vec_id) AS rn
             |  FROM s)
             |SELECT a_id, a_label, vec_id AS neg_id, sim AS neg_sim
             |FROM r WHERE rn = 1
             |ORDER BY a_id""".stripMargin)),

    QueryDef(
      // EXACT-DUPLICATE PROVENANCE MATRIX — which sources copy which:
      // for every unordered source pair (a <= b), the number of exact
      // duplicate document PAIRS with one side in each source (within a
      // source: C(c,2); across: ca*cb). The combinatorics run on the
      // per-(hash, source) COUNT frame, never on document pairs —
      // join fan-out per content hash is bounded by the number of
      // sources holding it (<= |sources|, a dictionary), so a
      // 10^6-copy boilerplate doc costs one count row per source, not
      // 10^12 pairs. Pure integer arithmetic; the oracle replays it.
      "p73_dup_provenance",
      (s, dir) => {
        import s.implicits._
        val perSrc = t(s, dir, "documents")
          .select(md5($"text").as("h"), $"source")
          .groupBy($"h", $"source").agg(count(lit(1)).as("c"))
        val a = perSrc.select($"h", $"source".as("src_a"), $"c".as("ca"))
        val b = perSrc.select($"h", $"source".as("src_b"), $"c".as("cb"))
        a.join(b, Seq("h")).filter($"src_a" <= $"src_b")
          .select($"src_a", $"src_b",
            when($"src_a" === $"src_b", expr("ca * (ca - 1) DIV 2"))
              .otherwise($"ca" * $"cb").as("np"))
          .groupBy($"src_a", $"src_b").agg(sum($"np").as("dup_pairs"))
          .filter($"dup_pairs" > 0)
          .orderBy($"src_a", $"src_b")
      },
      Some("""WITH ps AS (
             |  SELECT md5(text) AS h, source, COUNT(*) AS c
             |  FROM documents GROUP BY 1, 2)
             |SELECT a.source AS src_a, b.source AS src_b,
             |  CAST(SUM(CASE WHEN a.source = b.source
             |      THEN a.c * (a.c - 1) // 2
             |      ELSE a.c * b.c END) AS BIGINT) AS dup_pairs
             |FROM ps a JOIN ps b
             |  ON a.h = b.h AND a.source <= b.source
             |GROUP BY 1, 2
             |HAVING SUM(CASE WHEN a.source = b.source
             |    THEN a.c * (a.c - 1) // 2
             |    ELSE a.c * b.c END) > 0
             |ORDER BY src_a, src_b""".stripMargin))
  )
}
