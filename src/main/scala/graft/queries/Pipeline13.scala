package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Thirteenth pipeline batch — the SCALE-FIRST defaults for the
  * round-12 pair-graph compositions: p170 (semantic dup cluster
  * inventory) and p167 (cross-fold contamination) were landed over
  * [[graft.operators.Similarity.nearDupPairsExact]] — correct, but
  * capped at 1M vectors by its broadcast-corpus contract, so at
  * production scale they are the documented-alternative path. These
  * entries are the compositions a 100 TB user reaches FIRST: the
  * SAME downstream frames fed by the LSH-banded pair graph
  * ([[graft.operators.Similarity.nearDupPairsLsh]] at the p12/p170
  * decide sim_e6 ≥ 400000, with 4 deterministic hyperplanes × 48
  * OR-amplified tables — measured candidate recall 1.0 against the
  * exact ≥0.4 pair set at sf0.001 (66/66), sf0.01 (59/59) AND sf0.1
  * (920/920), where 40 tables is the measured edge (36 drops one
  * sf0.1 pair) and 48 keeps margin; p17's 5×24 config misses ~6% of
  * the [0.4,0.5) band this threshold admits), whose exact-integer
  * verify stage makes
  * every surviving pair bit-identical to an all-pairs exact pass.
  * The DuckDB oracle IS the exact twin — the all-pairs recursive
  * ladder — so a hash-green row proves end to end that the banded
  * candidate generation lost no pair of this corpus at any tested SF
  * (the p17 arrangement, extended through the downstream
  * composition).
  *
  * Operating-point note, for the record: 0.4 is a HARD threshold for
  * sign-LSH — the per-plane collision gap between a boundary pair
  * (p=0.63) and an unrelated pair (p=0.5) is narrow, so the
  * OR-amplification wide enough for lossless candidates also admits
  * ~3 collisions per unrelated pair at 4 planes (candidates ≈
  * n²/2⁴ per table). That is the price of hash-exactness against the
  * exact twin at the fixture's similarity mass ([0.4,0.5)). At the
  * production near-dup thresholds (≥0.7) the gap widens and the same
  * operator prunes aggressively with more planes per table — the
  * planes/tables knobs ARE the recall/cost dial, and the
  * recall-measurement recipe above (left-semi count against an exact
  * sample) is how a 100 TB deployment re-tunes them per corpus.
  *
  * Since round 14 the knobs are DERIVED, not hand-tuned:
  * [[graft.operators.Similarity.derivedLshKnobs]] maps (threshold,
  * recall target, tables budget) → (planes, tables); the 0.4 entries
  * read (4, 48) from it (identical to the measured-recall-1.0 config
  * they shipped with), and p173 pins the production point —
  * derivedLshKnobs(0.7, budget=256) = (12, 232) — with an IN-FRAME
  * measured candidate-to-pair-space ratio (~0.078, vs ~0.95 here)
  * gated by literal-TRUE booleans in its oracle.
  */
object Pipeline13 {
  import graft.Tables.t

  /** Cross-entry memo for the banded pair graph (the
    * kmeansAsgMemo/fittedKmeansAssigned discipline): p171 and p172
    * read the IDENTICAL deterministic pair set, and at production
    * scale the pair graph is computed once and feeds every consumer
    * (cluster inventory, contamination audit, keep-lists) — so one
    * executor-resident localCheckpoint replaces two back-to-back
    * LSH candidate joins in an isolated-timing harness. The frame is
    * ids+sim only (pair-count-sized, never corpus-sized). Key
    * replacement on (appId, sfDir) change.
    */
  @volatile private var lshPairsMemo
      : Option[((String, String), org.apache.spark.sql.DataFrame, Set[Int])] =
    None

  /** The 0.4-threshold knobs, READ FROM the derivation (r13 ask #1)
    * rather than hard-coded: derivedLshKnobs(0.4) = (4, 48) — the
    * analytic minimum is 41 tables, the measured recall edge 40, the
    * rounded margin 48, so the derived config IS the config whose
    * candidate recall was measured 1.0 at all three SFs.
    */
  private val legacyKnobs: (Int, Int) =
    graft.operators.Similarity.derivedLshKnobs(0.4)

  private def bandedPairs(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = synchronized {
    val key = (s.sparkContext.applicationId, dir)
    lshPairsMemo match {
      case Some((k, df, _)) if k == key =>
        graft.MemoLedger.recordHit("lshPairs"); df
      case prev =>
        graft.MemoLedger.recordBuild("lshPairs")
        // ADVICE r15 (the commercePairs fix applied here too): release
        // the superseded key's checkpoint blocks eagerly on replacement
        // instead of waiting on the GC-driven ContextCleaner.
        prev.foreach { case ((app, _), _, ids) =>
          if (app == s.sparkContext.applicationId)
            graft.operators.Dedup.releasePersisted(s, ids)
        }
        val before = s.sparkContext.getPersistentRDDs.keySet
        val df = graft.operators.Similarity.nearDupPairsLsh(
            t(s, dir, "embeddings"), "vec_id", "embedding", minSim = 0.4,
            planes = legacyKnobs._1, tables = legacyKnobs._2)
          .localCheckpoint(true)
        val added = s.sparkContext.getPersistentRDDs.keySet.diff(before)
        lshPairsMemo = Some((key, df, added.toSet))
        df
    }
  }

  /** p173's production operating point: minSim 0.7 (a real near-dup
    * threshold) at a 256-table budget → (12, 232). Derived ONCE here —
    * the Spark plan and the oracle SQL both interpolate these values,
    * so the two sides cannot drift.
    */
  private val prodMinSim = 0.7
  private val prodKnobs: (Int, Int) =
    graft.operators.Similarity.derivedLshKnobs(prodMinSim,
      tablesBudget = 256)

  /** Planted boundary-duplicate fixture for p174 (ADVICE r14): the
    * corpus has NO pair at cosine ≥ 0.7 (max 0.48/0.51/0.60 by SF), so
    * p173's production-point gate exercises candidate selectivity but
    * never a TRUE POSITIVE through the banded path. These 4 pairs sit
    * at cosine exactly (64 − 2·9)/64 = 0.71875 — just above the
    * threshold, where a sketch/verify regression would first lose
    * pairs. Construction is closed-form integer ±1 so both engines
    * replay it bit-identically (quantE9(±1.0) = ±1e9 exact, the
    * cross-engine float discipline): pair i's base vector is Hadamard
    * row rᵢ of H₆₄ — sign(r, d) = (−1)^popcount(r AND d) — distinct
    * rows are exactly orthogonal, so cross-pair cosines stay ≤ 18/64 ≈
    * 0.28 (the negated-prefix overlap bound), far below the threshold;
    * the partner negates the first 9 dims. Planted ids start at 10⁶,
    * disjoint from every SF's id range.
    */
  private[graft] val plantedBase = 1000000L
  private val plantedNegDims = 9
  private val plantedHadamardRows = Seq(1, 2, 4, 8)
  private[graft] def plantedVectors: Seq[(Long, Array[Float], Int)] = {
    def sign(r: Int, d: Int): Int =
      if (Integer.bitCount(r & d) % 2 == 0) 1 else -1
    plantedHadamardRows.zipWithIndex.flatMap { case (r, i) =>
      val a = Array.tabulate(64)(d => sign(r, d).toFloat)
      val b = Array.tabulate(64)(d =>
        (if (d < plantedNegDims) -sign(r, d) else sign(r, d)).toFloat)
      Seq((plantedBase + 2 * i, a, 0), (plantedBase + 2 * i + 1, b, 0))
    }
  }
  /** The same 8 vectors as a DuckDB VALUES literal — generated from
    * [[plantedVectors]] so the two sides cannot drift.
    */
  private def plantedValuesSql: String =
    plantedVectors.map { case (id, arr, lbl) =>
      arr.map(v => if (v > 0f) "1" else "-1")
        .mkString(s"($id, [", ",", s"]::FLOAT[], $lbl)")
    }.mkString(",\n")

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // SEMANTIC DUP CLUSTER INVENTORY, BANDED (the 100 TB default for
      // p170): LSH-banded near-dup pairs at sim_e6 >= 400000 ->
      // pointer-doubling connected components -> one row per
      // non-trivial cluster with size + label mix. Identical output
      // frame to p170; the pair source is the one that survives a
      // 1000-executor corpus — candidate generation is a bucket
      // self-equi-join on (table, sketch), ids-only, and the exact
      // integer verify decides membership with no double on the value
      // path. The oracle below is the EXACT all-pairs twin, so the
      // hash gate proves the banded composition lossless on this
      // corpus at every tested SF. Scale shape: sketches are
      // payload-free (id + 48 ints per vector), CC shuffles id pairs
      // only (checkpointed pointer doubling), the label join-back
      // touches only clustered ids, output is cluster-count-sized.
      "p171_semantic_clusters_lsh",
      (s, dir) => {
        import s.implicits._
        val emb = t(s, dir, "embeddings")
        val pairs = bandedPairs(s, dir)
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
           |ORDER BY cl.cluster_id""".stripMargin)),

    QueryDef(
      // CROSS-FOLD SEMANTIC CONTAMINATION, BANDED (the 100 TB default
      // for p167): the same fold-pair contamination frame, fed by the
      // LSH-banded pair graph instead of the broadcast-capped exact
      // one. Folds stay the deterministic md5-arithmetic assignment
      // (engine-portable); everything after the pair set is a 15-row
      // fold-pair dictionary. The oracle is the exact all-pairs twin
      // at the same sim_e6 >= 400000 decide — hash-green proves the
      // banded pair source surfaced every contaminating pair.
      "p172_crossfold_contamination_lsh",
      (s, dir) => {
        import s.implicits._
        def foldOf(idSql: String): String =
          s"pmod(ascii(substring(md5(CAST($idSql AS STRING)), 1, 1)) * 16" +
            s" + ascii(substring(md5(CAST($idSql AS STRING)), 2, 1)), 5)"
        val pairs = bandedPairs(s, dir)
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
      // BANDED PAIR GRAPH AT THE PRODUCTION OPERATING POINT (r13 ask
      // #1): the same LSH-banded near-dup machinery at a REAL near-dup
      // threshold (0.7) with knobs READ FROM derivedLshKnobs(0.7,
      // budget=256) = (12, 232) — and, unlike p171's hash-exactness
      // demonstration at the hard 0.4 point (which admits ~95% of the
      // pair space as candidates, documented in the header), this entry
      // PINS the sub-quadratic claim with an in-frame measurement: the
      // candidate count (the ids-only bucket-join output BEFORE the
      // exact verify) against the n(n−1)/2 pair space. Measured on the
      // fixture corpus: ratio 0.0778 / 0.0786 / 0.0774 at
      // sf0.001/0.01/0.1 — deterministic (fixed hyperplanes), so the
      // two boolean pins (< 10%, ≥ 1%) are exact replayable facts, not
      // a flaky sample; the lower pin also proves the measurement is
      // live (a silently-empty candidate generator would pass the
      // upper pin vacuously). The decimal compare forms 20·cand <
      // n(n−1) without dividing, so the pin survives corpora whose
      // pair space overflows a BIGINT.
      // Oracle: the exact all-pairs twin at c6 >= 700000 supplies
      // n_vectors / n_pairs / max_sim_e6 (the fixture has NO pair at
      // 0.7 — max cosine is 0.48/0.51/0.60 by SF — so n_pairs = 0 is
      // itself an oracle-checked fact: boundary recall at this point is
      // exercised by p174's PLANTED pairs through this same banded
      // pipeline, and by the derivation's measured-recall recipe on
      // the 0.4 entries, not here); knobs and threshold are interpolated from
      // the SAME derivation call on both sides; the two ratio pins are
      // literal TRUE on the oracle side and measured on the Spark side,
      // so a knob regression that degrades candidate selectivity past
      // 10% of the pair space flips the Spark boolean and the hash gate
      // goes red.
      // Scale shape: sketch cost is planes × tables = 2784 native dot
      // products per vector — LINEAR in the corpus, the cost that
      // SHOULD grow to keep the quadratic candidate cost down; the
      // bucket join carries (tbl, sketch, id) only; the exact verify
      // touches 7.8% of the pair space instead of 95%.
      "p173_banded_production_point",
      (s, dir) => {
        import s.implicits._
        val (planes, tables) = prodKnobs
        val minSimE6 = Math.round(prodMinSim * 1e6)
        val emb = t(s, dir, "embeddings").filter($"embedding".isNotNull)
        // candidate frame is read twice (measure + verify): persist —
        // ids-only, candidate-count-sized (lazy cache contract; Verify/
        // Bench clearCache per query)
        val cand = graft.operators.Similarity.lshCandidatePairs(
            emb, "vec_id", "embedding", planes, tables)
          .persist()
        val pairs = graft.operators.Similarity.verifyCandidatePairs(
          cand, emb, "vec_id", "embedding", prodMinSim)
        val nVec = emb.agg(count(lit(1)).as("n_vectors"))
        val nCand = cand.agg(count(lit(1)).as("__n_cand"))
        pairs.agg(count(lit(1)).as("n_pairs"),
            coalesce(max($"sim_e6"), lit(-1L)).as("max_sim_e6"))
          .crossJoin(broadcast(nVec)).crossJoin(broadcast(nCand))
          .select(
            $"n_vectors",
            lit(planes.toLong).as("planes"),
            lit(tables.toLong).as("tables"),
            lit(minSimE6).as("min_sim_e6"),
            $"n_pairs",
            $"max_sim_e6",
            expr("CAST(__n_cand AS DECIMAL(38,0)) * 20 < " +
              "CAST(n_vectors AS DECIMAL(38,0)) * (n_vectors - 1)")
              .as("candidate_ratio_lt_10pct"),
            expr("CAST(__n_cand AS DECIMAL(38,0)) * 200 >= " +
              "CAST(n_vectors AS DECIMAL(38,0)) * (n_vectors - 1)")
              .as("candidates_nonvacuous_ge_1pct"))
      },
      Some {
        val (planes, tables) = prodKnobs
        val minSimE6 = Math.round(prodMinSim * 1e6)
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
           |sel AS (SELECT c6 FROM pc6 WHERE c6 >= $minSimE6)
           |SELECT
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings
           |     WHERE embedding IS NOT NULL) AS n_vectors,
           |  CAST($planes AS BIGINT) AS planes,
           |  CAST($tables AS BIGINT) AS tables,
           |  CAST($minSimE6 AS BIGINT) AS min_sim_e6,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sel) AS n_pairs,
           |  (SELECT CAST(COALESCE(MAX(c6), -1) AS BIGINT) FROM sel)
           |    AS max_sim_e6,
           |  TRUE AS candidate_ratio_lt_10pct,
           |  TRUE AS candidates_nonvacuous_ge_1pct""".stripMargin
      }),

    QueryDef(
      // PLANTED BOUNDARY RECALL AT THE PRODUCTION POINT (ADVICE r14):
      // p173 proved the production config's candidate SELECTIVITY but
      // the fixture's zero ≥0.7 pairs meant no true positive ever
      // crossed the banded path — a sketch/verify regression that only
      // LOSES pairs above 0.7 was invisible. This entry augments the
      // corpus with the closed-form planted fixture (4 pairs at cosine
      // exactly 0.71875, see plantedVectors) and runs the FULL banded
      // pipeline — SignLshSketches candidates at the derived (12, 232)
      // knobs, exact-integer verify at 0.7 — while the oracle is the
      // exact all-pairs twin over the SAME augmented corpus. A banded
      // miss of any planted pair shows as n_pairs/min_sim mismatch →
      // hash red; n_pairs_planted pins that the recovered pairs are
      // the planted ones (the base corpus contributes zero). min_sim_e6
      // = 718750 on both sides is the boundary fact: the recovered
      // pairs sit 18750 e6-units above the cut, so the gate fails if
      // either the sketch stage drops a boundary pair or the verify
      // threshold drifts.
      // Scale shape: identical to p173 (sketch cost linear, ids-only
      // bucket join, exact verify on candidates only); the planted
      // union is 8 literal rows — a broadcast-free localRelation.
      "p174_planted_boundary_recall",
      (s, dir) => {
        import s.implicits._
        val (planes, tables) = prodKnobs
        val base = t(s, dir, "embeddings")
          .filter($"embedding".isNotNull)
          .select($"vec_id", $"embedding", $"label")
        val aug = base.unionByName(
          plantedVectors.toDF("vec_id", "embedding", "label"))
        val pairs = graft.operators.Similarity.nearDupPairsLsh(
          aug, "vec_id", "embedding", minSim = prodMinSim,
          planes = planes, tables = tables)
        val nVec = aug.agg(count(lit(1)).as("n_vectors"))
        pairs.agg(
            count(lit(1)).as("n_pairs"),
            coalesce(sum(when($"id_a" >= plantedBase &&
                $"id_b" >= plantedBase, 1L).otherwise(0L)), lit(0L))
              .as("n_pairs_planted"),
            coalesce(min($"sim_e6"), lit(-1L)).as("min_sim_e6"),
            coalesce(max($"sim_e6"), lit(-1L)).as("max_sim_e6"))
          .crossJoin(broadcast(nVec))
          .select($"n_vectors",
            lit(planes.toLong).as("planes"),
            lit(tables.toLong).as("tables"),
            $"n_pairs", $"n_pairs_planted",
            $"min_sim_e6", $"max_sim_e6")
      },
      Some {
        val (planes, tables) = prodKnobs
        val minSimE6 = Math.round(prodMinSim * 1e6)
        s"""WITH pl(vec_id, embedding, label) AS (VALUES
           |$plantedValuesSql),
           |aug AS (SELECT vec_id, embedding FROM embeddings
           |        WHERE embedding IS NOT NULL
           |        UNION ALL SELECT vec_id, embedding FROM pl),
           |el AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |         ${Pipeline.quantE9("unnest(a.embedding)")} AS x,
           |         ${Pipeline.quantE9("unnest(b.embedding)")} AS y
           |       FROM aug a JOIN aug b ON a.vec_id < b.vec_id),
           |s AS (SELECT id_a, id_b, SUM(CAST(x AS HUGEINT) * y) AS dot18,
           |             SUM(CAST(x AS HUGEINT) * x) AS nx18,
           |             SUM(CAST(y AS HUGEINT) * y) AS ny18
           |      FROM el GROUP BY id_a, id_b),
           |${Pipeline.exactC6Ctes("pc6", "s", Seq("id_a", "id_b"))},
           |sel AS (SELECT id_a, id_b, c6 FROM pc6 WHERE c6 >= $minSimE6)
           |SELECT
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM aug) AS n_vectors,
           |  CAST($planes AS BIGINT) AS planes,
           |  CAST($tables AS BIGINT) AS tables,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM sel) AS n_pairs,
           |  (SELECT CAST(COALESCE(SUM(CASE WHEN id_a >= $plantedBase
           |     AND id_b >= $plantedBase THEN 1 ELSE 0 END), 0) AS BIGINT)
           |     FROM sel) AS n_pairs_planted,
           |  (SELECT CAST(COALESCE(MIN(c6), -1) AS BIGINT) FROM sel)
           |    AS min_sim_e6,
           |  (SELECT CAST(COALESCE(MAX(c6), -1) AS BIGINT) FROM sel)
           |    AS max_sim_e6""".stripMargin
      })
  )
}
