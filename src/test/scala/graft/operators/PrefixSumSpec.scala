package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

/** RankOps.prefixSum is the bounded replacement for the global-window
  * cumsum over data-dependent value dictionaries (q95 cents, p97 token
  * lengths): same exact values, no single-task window in the plan.
  */
class PrefixSumSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def dict = {
    import spark.implicits._
    t(spark, sf, "orders")
      .select(round($"o_totalprice" * 100, 0).cast("long").as("cents"))
      .groupBy($"cents").agg(count(lit(1)).as("c"))
  }

  test("prefix-sum path equals the global-window path value for value") {
    import spark.implicits._
    val viaWindow = dict.withColumn("cum",
      sum($"c").over(Window.orderBy($"cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val viaPrefix = RankOps.prefixSum(dict, Seq($"cents"), $"c", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(viaPrefix == viaWindow)
  }

  test("prefix sum is deterministic across partition-count choices") {
    import spark.implicits._
    val a = RankOps.prefixSum(dict, Seq($"cents"), $"c", "cum",
      numPartitions = Some(3)).orderBy($"cents").collect().toSeq
    val b = RankOps.prefixSum(dict, Seq($"cents"), $"c", "cum",
      numPartitions = Some(17)).orderBy($"cents").collect().toSeq
    assert(a == b)
  }

  test("plan pin: every window partitions; the data is range-partitioned") {
    import spark.implicits._
    val p = RankOps.prefixSum(dict, Seq($"cents"), $"c", "cum")
      .queryExecution.executedPlan.toString
    // the only WindowExec runs INSIDE the range partitions: its spec
    // must carry the __pid partition key — a partition-less Window
    // (the single-task funnel this operator exists to avoid) would
    // print "Window [...], [cents ASC..." with no partition columns
    val winLines = p.linesIterator.filter(_.contains("Window ")).toSeq
    assert(winLines.nonEmpty, p)
    winLines.foreach(l =>
      assert(l.contains("__pid"), s"partition-less window in plan:\n$l"))
    assert(p.contains("REPARTITION_BY_RANGE") || p.contains("rangepartitioning"),
      s"expected a range repartition:\n$p")
  }
}
