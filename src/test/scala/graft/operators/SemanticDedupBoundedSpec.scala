package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity.semanticDedupBounded's scale contract (the p99/p107
  * machinery): candidate-pair work is bounded by an ENFORCED in-plan
  * guard (any refined cell past 2*cellCap raise_errors, so pairs <=
  * N*cellCap — linear in N), and the oversized-cell re-split is a pure
  * refinement of the cluster blocking: it can only REMOVE candidate
  * pairs, never invent drops.
  */
class SemanticDedupBoundedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def emb = graft.Tables.t(spark, sf, "embeddings")
  private lazy val model =
    KMeansOp.fit(emb, "vec_id", "embedding", 4, 3)

  test("inert cap: one sub-cell per cluster, vectors conserved") {
    val rows = Similarity.semanticDedupBounded(emb, "vec_id", "embedding",
        model, 0.45, cellCap = 65536L)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) == 1L),
      "a cap above every cluster size must leave the blocking unrefined")
    val n = emb.filter(col("embedding").isNotNull).count()
    assert(rows.map(_.getLong(2)).sum == n,
      "per-cluster n_vectors must partition the corpus")
    spark.catalog.clearCache()
  }

  test("re-split fires on oversized cells and only removes drops") {
    val base = Similarity.semanticDedupBounded(emb, "vec_id", "embedding",
        model, 0.45, cellCap = 65536L)
      .collect().map(r => r.getInt(0) -> r).toMap
    spark.catalog.clearCache()
    val split = Similarity.semanticDedupBounded(emb, "vec_id", "embedding",
        model, 0.45, cellCap = 64L)
      .collect().map(r => r.getInt(0) -> r).toMap
    spark.catalog.clearCache()
    assert(split.keySet == base.keySet)
    // every fixture cluster exceeds 64 members, so refinement must fire
    assert(split.values.forall(_.getLong(1) > 1L),
      s"cap=64 must refine every cluster: ${split.values.map(_.getLong(1))}")
    split.foreach { case (c, r) =>
      assert(r.getLong(2) == base(c).getLong(2),
        s"cluster $c: refinement must not move vectors across clusters")
      // refined pairs are a subset of the cluster's pairs, so refined
      // drops are a subset of unrefined drops
      assert(r.getLong(3) <= base(c).getLong(3),
        s"cluster $c: refined drops ${r.getLong(3)} exceed unrefined " +
          s"${base(c).getLong(3)}")
      assert(r.getLong(4) == r.getLong(2) - r.getLong(3))
    }
  }

  test("in-plan guard raises when a refined cell exceeds the budget") {
    // maxBits = 0 disables the re-split, so the refined cells ARE the
    // clusters (each > 2 members at every fixture scale) and a
    // cellCap of 1 makes the 2*cellCap guard unsatisfiable — the
    // raise_error must fire no matter how the caller consumes the frame
    val e = intercept[Exception] {
      Similarity.semanticDedupBounded(emb, "vec_id", "embedding",
          model, 0.45, cellCap = 1L, maxBits = 0)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("refined cell size")),
      s"expected the pair-budget raise_error, got: ${messages(e)}")
    spark.catalog.clearCache()
  }

  test("guard bound: refined cells within 2*cellCap at the p107 cap") {
    // the contract p107 relies on: at cellCap=64 the sign-split must
    // actually spread the fixture clusters under the 128 guard — if the
    // data drifts skewed, this fails here before the driver sees it
    val ok = Similarity.semanticDedupBounded(emb, "vec_id", "embedding",
        model, 0.45, cellCap = 64L)
      .agg(sum(col("n_vectors"))).collect().head.getLong(0)
    assert(ok == emb.filter(col("embedding").isNotNull).count())
    spark.catalog.clearCache()
  }

  test("derivedCellCap: base floor, exact ceiling, balanced-data no-guard bound") {
    import Similarity.derivedCellCap
    // base dominates at every fixture scale (N = 500 / 500 / 2000, k=4)
    assert(derivedCellCap(500, 4) == 64L)
    assert(derivedCellCap(2000, 4) == 64L)
    // base stops dominating exactly past N = base * k * 2^maxBits
    assert(derivedCellCap(64L * 256, 4) == 64L)
    assert(derivedCellCap(64L * 256 + 1, 4) == 65L)
    // exact integer ceiling, never the floor
    assert(derivedCellCap(257, 4, base = 1) == 2L)
    assert(derivedCellCap(256, 4, base = 1) == 1L)
    assert(derivedCellCap(512, 4, base = 1) == 2L)
    // the property the derivation exists for: on perfectly balanced
    // data (every cluster N/k, every sign-split even) the refined cell
    // is N / (k * 2^maxBits) <= cap < 2*cap — the guard cannot fire
    for (n <- Seq(10000L, 1000000L, 123456789L); k <- Seq(4, 16)) {
      val cap = derivedCellCap(n, k)
      val balancedRefined = (n + (k.toLong << 6) - 1) / (k.toLong << 6)
      assert(balancedRefined <= cap, s"n=$n k=$k")
    }
    // and the pair budget stays linear: pairs <= N * cap with cap
    // growing only as N/(k*2^maxBits) — the documented Σc² bound
    assert(derivedCellCap(1L << 40, 4) == (1L << 40) / 256)
  }
}
