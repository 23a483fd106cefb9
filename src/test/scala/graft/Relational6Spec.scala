package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property gates for the sixth relational batch — semantic claims the
  * oracle hash can't isolate: order/partitioning invariance of the
  * table fingerprint, weighted-median agreement with a naive reference,
  * histogram mass conservation, and mode tie-break determinism.
  */
class Relational6Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("q87 checksum is invariant under row order and partitioning") {
    // the design claim: sum-of-md5-prefixes is commutative, so any
    // partitioning/shuffle of the same rows fingerprints identically
    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(conv(substring(md5(
        concat_ws("|", $"n_nationkey", $"n_name", $"n_regionkey")),
        1, 8), 16, 10).cast("long").as("h"))
        .agg(sum($"h")).head().getLong(0)
    val nation = spark.read.parquet(s"$sf/nation.parquet")
    val base = checksum(nation)
    assert(checksum(nation.orderBy($"n_name".desc)) == base)
    assert(checksum(nation.repartition(13)) == base)
    assert(checksum(nation.repartition(1)) == base)
    // and it DETECTS a one-row change
    assert(checksum(nation.limit(20)) != base)
  }

  test("q85 weighted median matches a naive in-memory computation") {
    val rows = SparkEntry.queries("q85_weighted_median")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", $"l_quantity".cast("long"),
        round($"l_extendedprice" * 100, 0).cast("long"))
      .as[(String, Long, Long)].collect()
    val naive = li.groupBy(_._1).map { case (f, rs) =>
      val total = rs.map(_._3).sum
      val byQty = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      f -> byQty.collectFirst {
        case (q, w) if { cum += w; cum * 2 >= total } => q
      }.get
    }
    assert(rows == naive, s"got $rows want $naive")
  }

  test("q84 histogram conserves mass and stays inside the bounds") {
    val h = SparkEntry.queries("q84_histogram")(spark, sf).collect()
    val nOrders = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(h.map(_.getLong(2)).sum == nOrders, "bucket mass must sum to rows")
    val buckets = h.map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b <= 9))
    assert(buckets.distinct.length == buckets.length)
  }

  test("q83 mode tie-break picks the smallest value deterministically") {
    // crafted ties: two values with equal counts in one group
    val ev = Seq(("g", "beta"), ("g", "beta"), ("g", "alpha"), ("g", "alpha"),
      ("h", "zeta")).toDF("dow", "event_type")
    val counts = ev.groupBy($"dow", $"event_type").agg(count(lit(1)).as("c"))
    val tops = counts.groupBy($"dow")
      .agg(max($"c").as("mc"), sum($"c").as("total"))
    val got = counts.join(tops, Seq("dow"))
      .filter($"c" === $"mc")
      .groupBy($"dow").agg(min($"event_type").as("mode_event"))
      .as[(String, String)].collect().toMap
    assert(got == Map("g" -> "alpha", "h" -> "zeta"))
  }
}
