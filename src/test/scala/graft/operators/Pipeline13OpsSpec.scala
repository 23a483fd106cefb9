package graft.operators

import graft.{SparkTestSession, SparkEntry}
import graft.queries.Pipeline13
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 batch: the LSH-banded scale-first compositions must equal
  * the SAME composition run over the exact broadcast-capped pair
  * source — the in-frame exact twin, independent of the DuckDB
  * oracle's all-pairs recursive ladder. A banded candidate miss shows
  * up here as a missing/smaller cluster or a shifted fold-pair count.
  */
class Pipeline13OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def exactPairs: DataFrame =
    Similarity.nearDupPairsExact(
      graft.Tables.t(spark, sf, "embeddings"), "vec_id", "embedding",
      minSim = 0.4)

  test("p171 banded cluster inventory == the exact-pair composition") {
    import spark.implicits._
    val emb = graft.Tables.t(spark, sf, "embeddings")
    val labels = Dedup.connectedComponents(exactPairs)
    val want = labels
      .join(emb.select($"vec_id".as("id"), $"label"), Seq("id"))
      .groupBy($"cluster_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_members"),
        org.apache.spark.sql.functions.countDistinct($"label")
          .as("n_labels"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(want.nonEmpty, "fixture must contain >=0.4 near-dup clusters")
    val got = SparkEntry.queries("p171_semantic_clusters_lsh")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, s"banded != exact composition:\n got $got\nwant $want")
    spark.catalog.clearCache()
  }

  test("p172 banded fold-pair contamination == the exact-pair composition") {
    import spark.implicits._
    def fold(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      (hex.charAt(0).toInt * 16 + hex.charAt(1).toInt) % 5
    }
    val want = exactPairs.select($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy { case (a, b) =>
        val (fa, fb) = (fold(a), fold(b))
        (math.min(fa, fb), math.max(fa, fb))
      }.view.mapValues(_.length.toLong).toMap
    assert(want.nonEmpty, "fixture must contain >=0.4 near-dup pairs")
    val got = SparkEntry.queries("p172_crossfold_contamination_lsh")(spark, sf)
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(got == want, s"banded != exact composition:\n got $got\nwant $want")
    spark.catalog.clearCache()
  }

  test("derivedLshKnobs: derivation reproduces the validated operating points") {
    // 0.4 at the default budget must equal the config whose candidate
    // recall was MEASURED 1.0 at all three SFs (analytic minimum 41
    // tables, measured edge 40, margin rounds to 48) — p171/p172 read
    // their knobs from this call, so this pin is what keeps their
    // hash-gated outputs stable across derivation refactors.
    assert(Similarity.derivedLshKnobs(0.4) == (4, 48))
    // the p173 production point: 12 planes × 232 tables at 0.7/256
    assert(Similarity.derivedLshKnobs(0.7, tablesBudget = 256) == (12, 232))
    // selectivity grows with the threshold (the whole point of the
    // derivation): at a fixed budget a wider collision gap buys planes
    val b04 = Similarity.derivedLshKnobs(0.4, tablesBudget = 256)._1
    val b07 = Similarity.derivedLshKnobs(0.7, tablesBudget = 256)._1
    val b09 = Similarity.derivedLshKnobs(0.9, tablesBudget = 256)._1
    assert(b04 < b07 && b07 < b09, s"not monotone: $b04 $b07 $b09")
    // an infeasible (threshold, budget) pair must raise, not silently
    // ship a config that can't reach the recall target
    assertThrows[IllegalArgumentException](
      Similarity.derivedLshKnobs(-0.9, tablesBudget = 8))
    // ADVICE r14: the search domain is the kernel's full planes range
    // (≤ 63), not the former silent cap of 24 — at (0.9, 1024) the cap
    // WAS binding (it returned 24 planes where the budget admits 32)
    assert(Similarity.derivedLshKnobs(0.9, tablesBudget = 1024) ==
      (32, 984))
    assert(Similarity.derivedLshKnobs(0.95, tablesBudget = 4096) ==
      (59, 3712))
  }

  test("derivedLshKnobs: every derived config meets its recall target " +
      "analytically and fits its budget") {
    // the derivation's own model, checked as an identity over a sweep:
    // boundary recall 1 − (1 − p^planes)^tables ≥ target, tables within
    // budget, and the rounding margin never less than the analytic
    // minimum — so a future refactor cannot silently ship a config
    // below the recall contract
    for {
      minSim <- Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)
      budget <- Seq(64, 256, 1024, 4096)
      target <- Seq(0.99, 0.999)
    } {
      val (b, tbl) = Similarity.derivedLshKnobs(minSim, target, budget)
      assert(tbl <= budget && tbl % 8 == 0, s"($minSim,$budget,$target)")
      val p = 1.0 - math.acos(minSim) / math.Pi
      val recall = 1.0 - math.pow(1.0 - math.pow(p, b), tbl)
      assert(recall >= target,
        s"($minSim,$budget,$target) -> ($b,$tbl): recall $recall")
    }
  }

  test("derivedMinhashKnobs: derivation reproduces p08's operating " +
      "point and meets its recall contract over a sweep") {
    // the unified knob-derivation surface (VERDICT r14 ask #3): the
    // MinHash family gets the same analytic treatment as sign-LSH.
    // p08's contract point — the config it READS, so this pin is what
    // keeps its recall boolean stable across derivation refactors
    assert(Dedup.derivedMinhashKnobs(0.5, 0.9, 64) == (54, 18))
    // identity sweep: numHashes tiles exactly into bands (the
    // minhashLshPairs require), the hash budget holds, and the
    // analytic boundary recall 1 − (1 − j^r)^b meets the target
    for {
      j <- Seq(0.3, 0.5, 0.7, 0.8, 0.9)
      budget <- Seq(16, 64, 256, 1024)
      target <- Seq(0.9, 0.99)
    } {
      val (nh, b) = Dedup.derivedMinhashKnobs(j, target, budget)
      assert(nh % b == 0 && nh <= budget, s"($j,$budget,$target)")
      val r = nh / b
      val recall = 1.0 - math.pow(1.0 - math.pow(j, r), b)
      assert(recall >= target,
        s"($j,$budget,$target) -> ($nh,$b): recall $recall")
    }
    // selectivity grows with the threshold at a fixed budget: higher
    // Jaccard thresholds buy more rows per band
    val rOf = (j: Double) => {
      val (nh, b) = Dedup.derivedMinhashKnobs(j, 0.9, 256); nh / b
    }
    assert(rOf(0.3) < rOf(0.6) && rOf(0.6) < rOf(0.9))
    // an infeasible contract raises instead of shipping a config that
    // cannot reach the recall target
    assertThrows[IllegalArgumentException](
      Dedup.derivedMinhashKnobs(0.05, 0.99, 4))
  }

  test("p173 production point: zero 0.7-pairs, ratio pins TRUE, knobs derived") {
    val rows = SparkEntry.queries("p173_banded_production_point")(spark, sf)
      .collect()
    assert(rows.length == 1)
    val r = rows.head
    def l(name: String): Long = r.getLong(r.fieldIndex(name))
    def b(name: String): Boolean = r.getBoolean(r.fieldIndex(name))
    assert(l("n_vectors") == 500L)
    assert((l("planes"), l("tables")) == (12L, 232L))
    assert(l("min_sim_e6") == 700000L)
    // the fixture's max pairwise cosine is ~0.48 at sf0.001 — the
    // exact twin (the DuckDB oracle) agrees these are zero/-1
    assert(l("n_pairs") == 0L && l("max_sim_e6") == -1L)
    // the in-frame candidate-ratio pins: measured ~0.078 of the pair
    // space (deterministic hyperplanes — this is a fact, not a sample)
    assert(b("candidate_ratio_lt_10pct"),
      "candidate ratio crossed 10% of the pair space")
    assert(b("candidates_nonvacuous_ge_1pct"),
      "candidate frame near-empty: the measurement is vacuous")
    spark.catalog.clearCache()
  }

  test("p174: the banded path recovers every planted boundary pair at " +
      "the production point") {
    // ADVICE r14: p173's gate never saw a true positive (the fixture
    // has no ≥0.7 pair) — p174 plants 4 pairs at cosine exactly
    // 0.71875 and the full sketch→candidate→exact-verify pipeline must
    // recover all 4, none of them from the base corpus, at precisely
    // the closed-form similarity
    val r = SparkEntry.queries("p174_planted_boundary_recall")(spark, sf)
      .collect().head
    def l(name: String): Long = r.getLong(r.fieldIndex(name))
    assert(l("n_vectors") == 508L)
    assert((l("planes"), l("tables")) == (12L, 232L))
    assert(l("n_pairs") == 4L, "banded path lost a planted boundary pair")
    assert(l("n_pairs_planted") == 4L,
      "a recovered pair came from the base corpus — fixture drifted")
    assert(l("min_sim_e6") == 718750L && l("max_sim_e6") == 718750L,
      s"boundary cosine drifted: ${l("min_sim_e6")}..${l("max_sim_e6")}")
    spark.catalog.clearCache()
  }

  test("planted fixture invariants: ids disjoint, cross-pair cosines " +
      "below threshold, within-pair cosine just above it") {
    // the closed-form claims the fixture rests on, checked directly:
    // Hadamard-row orthogonality bounds every cross-pair cosine ≤
    // 18/64, each within-pair cosine is exactly 46/64, and ids start
    // past every SF's vec_id range
    val vs = Pipeline13.plantedVectors
    assert(vs.size == 8 && vs.map(_._1).distinct.size == 8)
    assert(vs.forall(_._1 >= Pipeline13.plantedBase))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / 64.0 // every vector has norm² = 64
    }
    for (i <- vs.indices; j <- vs.indices if i < j) {
      val c = cos(vs(i)._2, vs(j)._2)
      if (j == i + 1 && i % 2 == 0)
        assert(c == 46.0 / 64.0, s"within-pair $i: $c")
      else assert(math.abs(c) <= 18.0 / 64.0, s"cross-pair $i,$j: $c")
    }
  }
}
