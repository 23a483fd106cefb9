package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression: the rank primitives' stamped partition id must mean the
  * same thing in every subtree that reads it.
  *
  * Round-8 find: `repartitionByRange` samples its bounds with a seed
  * derived from the exchange's RDD id, so two physical instantiations
  * of the "same" exchange draw different bounds. The operators read the
  * stamped frame from two subtrees (per-partition totals, final
  * join-back); before `rangedWithPid` materialized the frame, the plan
  * silently produced WRONG prefix sums whenever ReuseExchange failed to
  * collapse the two exchanges — which it demonstrably does over an
  * InMemoryTableScan input (observed: cumulative sums SMALLER than the
  * running row count, diverging mid-dictionary). These tests pin the
  * structural fix: results over a persisted input are internally
  * consistent and identical to the unpersisted path.
  */
class RankOpsConsistencySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("prefixSum: persisted and unpersisted inputs agree, totals exact") {
    import spark.implicits._
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select($"l_extendedprice".cast("double").as("v"))
    val total = li.count()
    val dictU = li.groupBy($"v").agg(count(lit(1)).as("c"))
    val dictP = li.groupBy($"v").agg(count(lit(1)).as("c")).persist()
    dictP.count() // materialize the cache the regression needs
    val u = RankOps.prefixSum(dictU, Seq(col("v")), col("c"), "cum")
      .orderBy($"v").collect().map(r => (r.getDouble(0), r.getLong(2)))
    val p = RankOps.prefixSum(dictP, Seq(col("v")), col("c"), "cum")
      .orderBy($"v").collect().map(r => (r.getDouble(0), r.getLong(2)))
    assert(u.sameElements(p),
      s"persisted input diverged: ${u.zip(p).filter(x => x._1 != x._2).take(3).mkString(", ")}")
    assert(u.last._2 == total,
      s"inclusive prefix sum must end at the row count $total, got ${u.last._2}")
    assert(u.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "prefix sum over positive counts must be strictly increasing")
    spark.catalog.clearCache()
  }

  test("prefixSumWithinKey: per-key totals exact over a cached input") {
    import spark.implicits._
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select($"l_returnflag".as("k"), $"l_quantity".cast("double").as("v"))
      .persist()
    val expect = li.groupBy($"k", $"v").agg(count(lit(1)).as("c"))
      .groupBy($"k").agg(sum($"c").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dict = li.groupBy($"k", $"v").agg(count(lit(1)).as("c"))
    val cum = RankOps.prefixSumWithinKey(dict, Seq("k"), Seq(col("v")),
        col("c"), "cum")
      .groupBy($"k").agg(max($"cum").as("last"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cum == expect,
      s"per-key inclusive prefix sums must end at the key row counts: $cum vs $expect")
    spark.catalog.clearCache()
  }

  test("rankWithinKey: ranks are a permutation of 1..n over a cached input") {
    import spark.implicits._
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select($"l_returnflag".as("k"), $"l_orderkey", $"l_linenumber")
      .persist()
    li.count()
    val ranked = RankOps.rankWithinKey(li, "k",
      Seq(col("l_orderkey"), col("l_linenumber")))
    val bad = ranked.groupBy($"k")
      .agg(count(lit(1)).as("n"), max($"rank_in_key").as("mx"),
        min($"rank_in_key").as("mn"),
        countDistinct($"rank_in_key").as("d"))
      .filter($"mx" =!= $"n" || $"mn" =!= 1 || $"d" =!= $"n")
      .collect()
    assert(bad.isEmpty,
      s"ranks must be exactly 1..n per key: ${bad.mkString(", ")}")
    spark.catalog.clearCache()
  }
}
