package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the sixth pipeline batch, independent of the DuckDB
  * oracle. Division of labor: the oracle proves the decimal cosine
  * KERNEL exact cross-engine; these tests prove the parts the oracle
  * cannot see — that p101's two-kernel float prune is LOSSLESS (a full
  * brute-force replay with no pruning must produce identical mates and
  * scores), and that p100's fused scores are exactly the integer RRF
  * arithmetic over its two input systems' ranks.
  */
class Pipeline6Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("p100 equals a Scala replay of integer RRF over p98 + p10 ranks") {
    val lex = SparkEntry.queries("p98_bm25_retrieval")(spark, sf)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val dense = SparkEntry.queries("p10_ann_bruteforce")(spark, sf)
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    assert(lex.size == 20 && dense.size == 10)
    val expected = (lex.keySet ++ dense.keySet).toSeq
      .map { id =>
        val rrf = lex.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L) +
          dense.get(id).map(r => 1000000000L / (60 + r)).getOrElse(0L)
        (id, rrf, lex.getOrElse(id, 0L), dense.getOrElse(id, 0L))
      }
      .sortBy { case (id, rrf, _, _) => (-rrf, id) }
      .take(10)
    val got = SparkEntry.queries("p100_hybrid_rrf")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected,
      s"fusion mismatch:\n got      $got\n expected $expected")
    // both systems must actually contribute to the fused top-10
    assert(got.exists(_._3 > 0) && got.exists(_._4 > 0),
      s"one system contributed nothing: $got")
  }

  test("p101 equals an unpruned brute-force replay (prune is lossless)") {
    import spark.implicits._
    import graft.operators.Similarity
    val emb = Tables.t(spark, sf, "embeddings")
    val aSide = emb.filter($"label" % 2 === 0)
      .select($"vec_id", $"embedding")
    val bSide = emb.filter($"label" % 2 === 1)
      .select($"vec_id", $"embedding")
    val probes = aSide.orderBy($"vec_id").limit(16)
      .select($"vec_id".as("pid"), $"embedding".as("pvec"))
    // full decimal kernel on EVERY pair — no float prune, no TopKByOrd
    def knnBrute(p: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame) = {
      val all = c.crossJoin(broadcast(p))
        .select($"pid", $"cid",
          floor(Similarity.cosine($"cvec", $"pvec") * 1000000)
            .cast("long").as("c6"))
        .filter($"c6".isNotNull)
      all.withColumn("rk", row_number().over(
          Window.partitionBy($"pid").orderBy($"c6".desc, $"cid")))
        .filter($"rk" <= 4).select($"pid", $"cid", $"c6")
    }
    val xknn = knnBrute(probes,
      bSide.select($"vec_id".as("cid"), $"embedding".as("cvec"))).cache()
    val yprobes = emb.join(
        broadcast(xknn.select($"cid").distinct()), $"vec_id" === $"cid")
      .select($"cid".as("pid"), $"embedding".as("pvec"))
    val yknn = knnBrute(yprobes,
      aSide.select($"vec_id".as("cid"), $"embedding".as("cvec")))
    val sx = xknn.collect().groupBy(_.getLong(0)).map { case (p, rs) =>
      p -> (rs.map(_.getLong(2) + 1000000L).sum, rs.length.toLong)
    }
    val sy = yknn.collect().groupBy(_.getLong(0)).map { case (p, rs) =>
      p -> (rs.map(_.getLong(2) + 1000000L).sum, rs.length.toLong)
    }
    val expected = xknn.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .map { case (pid, cid, c6) =>
        val (sxp, nx) = sx(pid)
        val (syp, ny) = sy(cid)
        val score = (c6 + 1000000L) * 2 * nx * ny * 1000000000L /
          math.max(sxp * ny + syp * nx, 1L)
        (pid, cid, c6, score)
      }
      .groupBy(_._1).map { case (pid, cands) =>
        val best = cands.maxBy { case (_, cid, _, s) => (s, -cid) }
        (pid, best._2, best._4, best._3)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("p101_bitext_mining")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected,
      s"two-kernel result diverged from brute force:\n got      $got\n" +
        s" expected $expected")
    // mates must come from the opposite parity side
    val labels = emb.select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { case (a, m, _, _) =>
      assert(labels(a) % 2 == 0 && labels(m) % 2 == 1,
        s"pair ($a, $m) is not cross-side")
    }
    spark.catalog.clearCache()
  }

  test("p102 totals reconcile with a raw-text replay; merges compress") {
    import spark.implicits._
    val raw = Tables.t(spark, sf, "documents")
      .select($"source", explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_words"), sum(length($"w")).as("n_chars"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = SparkEntry.queries("p102_bpe_encode")(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (src, nw, nt, nc, ppm) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(4), r.getLong(5))
      val (rawW, rawC) = raw(src)
      // merges only concatenate: words and chars are conserved
      assert(nw == rawW, s"$src words $nw != raw $rawW")
      assert(nc == rawC, s"$src chars $nc != raw $rawC")
      // each word >= 1 token, each token >= 1 char, and 12 learned
      // merges must actually compress (strictly fewer tokens than
      // chars on natural text)
      assert(nt >= nw && nt < nc, s"$src tokens $nt vs words $nw chars $nc")
      assert(ppm == nc * 1000000L / nt, s"$src ppm $ppm")
    }
    spark.catalog.clearCache()
  }

  test("p104 metrics equal a Scala replay over the p10 ranking") {
    import spark.implicits._
    val labels = Tables.t(spark, sf, "embeddings")
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ranking = SparkEntry.queries("p10_ann_bruteforce")(spark, sf)
      .collect().map(_.getLong(0)).toSeq // already (sim desc, id) order
    val rels = ranking.map(id => labels(id) == labels(0L))
    val mrr = rels.indexWhere(identity) match {
      case -1 => 0L
      case i  => 1000000000L / (i + 1)
    }
    val expected = Seq(1, 5, 10).map { k =>
      val n = rels.take(k).count(identity).toLong
      (k.toLong, n, n * 1000000L / k, mrr)
    }
    val got = SparkEntry.queries("p104_retrieval_metrics")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected, s"\n got      $got\n expected $expected")
    spark.catalog.clearCache()
  }

  test("p105 triplets: sides carry the right labels, margin is exact") {
    import spark.implicits._
    val labels = Tables.t(spark, sf, "embeddings")
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = SparkEntry.queries("p105_triplet_mining")(spark, sf).collect()
    assert(got.length == 20, s"expected one triplet per anchor, got ${got.length}")
    got.foreach { r =>
      val (a, pos, posC6, neg, negC6, margin) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(pos != a && neg != a, s"self-pairing on anchor $a")
      assert(labels(pos) == labels(a), s"positive $pos label mismatch for $a")
      assert(labels(neg) != labels(a), s"negative $neg shares label with $a")
      assert(margin == posC6 - negC6)
    }
    spark.catalog.clearCache()
  }

  test("p106: exact mates are cross-side, IVF recall gate holds") {
    import spark.implicits._
    val labels = Tables.t(spark, sf, "embeddings")
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = SparkEntry.queries("p106_ivf_bitext_recall")(spark, sf)
      .collect()
    assert(got.length == 16)
    got.foreach { r =>
      val (a, mate, ok) = (r.getLong(0), r.getLong(1), r.getBoolean(3))
      assert(labels(a) % 2 == 0 && labels(mate) % 2 == 1,
        s"mate ($a, $mate) is not cross-side")
      assert(ok, "IVF recall gate must hold at fixture scale")
    }
    // the exact side must agree with p101's x-side: each probe's mate
    // is its top-4 list's rank-1 (same floored micro-cosine ordering)
    spark.catalog.clearCache()
  }

  test("p100/p101 plans: fusion broadcasts, pair scans never sort-merge") {
    val p100 = SparkEntry.queries("p100_hybrid_rrf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p100.contains("SortMergeJoin"), s"25-row fusion SMJ:\n$p100")
    assert(!p100.contains("CartesianProduct"), p100)
    val p101 = SparkEntry.queries("p101_bitext_mining")(spark, sf)
      .queryExecution.executedPlan.toString
    // probe x corpus scans must ride broadcast (BNLJ on the deliberate
    // cross join), never a corpus shuffle or an unhinted product
    assert(!p101.contains("SortMergeJoin"), s"corpus shuffle:\n$p101")
    assert(!p101.contains("CartesianProduct"), s"unhinted product:\n$p101")
    spark.catalog.clearCache()
  }
}
