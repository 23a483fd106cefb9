package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.timeType.enabled", "true") // q103; set at bootstrap, never mid-run
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("query names are unique and every oracle key has a query") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (d <- queries.Relational.defs) {
    test(s"${d.name} executes at sf0.001") {
      val df = d.fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // materializes the whole plan
    }
  }

  test("q01 groups by returnflag x linestatus") {
    val rows = SparkEntry.queries("q01_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getAs[String]("l_returnflag")).toSet == Set("A", "N", "R"))
  }

  test("q03 returns exactly top 10 by revenue desc") {
    val rows = SparkEntry.queries("q03_topk_revenue")(spark, sf).collect()
    assert(rows.length <= 10)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-(_: Double))))
  }

  test("q34 approx distinct is within HLL++ error bounds of exact") {
    val rows = SparkEntry.queries("q34_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_parts_ok"), r.toString)
      assert(r.getAs[Boolean]("approx_orders_ok"), r.toString)
    }
    // the raw estimate itself (not just the in-query bound): HLL++ at
    // default rsd lands within 10% of exact on this data
    import org.apache.spark.sql.functions._
    val li = Tables.t(spark, sf, "lineitem")
    val a = li.agg(approx_count_distinct(col("l_partkey")),
      countDistinct(col("l_partkey"))).collect().head
    assert(math.abs(a.getLong(0) - a.getLong(1)).toDouble / a.getLong(1) < 0.1)
  }

  test("partitioned parquet sink round-trips with partition pruning") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("part-sink").toString
    val li = Tables.t(spark, sf, "lineitem")
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    val pruned = back.filter(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    assert(pruned.count() ==
      li.filter(col("l_returnflag") === "R").count())
  }

  test("q56 pivot round-trips through stack (unpivot) to the long form") {
    import org.apache.spark.sql.functions._
    val wide = SparkEntry.queries("q56_pivot_wide")(spark, sf)
    val years = 1995 to 2001
    // stack is Spark's unpivot kernel: wide (priority, y1995..y2001)
    // back to long (priority, year, n); zero rows survive as zeros in
    // the wide frame, so drop them to compare against the plain groupBy
    val long = wide.select(col("o_orderpriority"),
        expr(s"stack(${years.size}, " +
          years.map(y => s"'$y', y$y").mkString(", ") + ") AS (yr, n)"))
      .filter(col("n") > 0)
    val direct = Tables.t(spark, sf, "orders")
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("string").as("yr"))
      .agg(count(lit(1)).as("n"))
    assert(long.count() == direct.count())
    assert(long.except(direct).isEmpty && direct.except(long).isEmpty)
  }

  test("q57 array HOFs agree with the explode-based recomputation") {
    import org.apache.spark.sql.functions._
    val hof = SparkEntry.queries("q57_array_hof")(spark, sf)
      .select(col("l_orderkey"), col("n_items"), col("total_qty"),
        col("n_heavy"), col("sum_sq"))
    val direct = Tables.t(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).cast("int").as("n_items"),
        sum(col("q")).as("total_qty"),
        sum(when(col("q") > 30, 1).otherwise(0)).cast("int").as("n_heavy"),
        sum(col("q") * col("q")).as("sum_sq"),
        max(when(col("q") === 1, 1)).as("has_one"))
      .filter(col("has_one") === 1).drop("has_one")
    assert(hof.join(direct,
      Seq("l_orderkey", "n_items", "total_qty", "n_heavy", "sum_sq"))
      .count() == hof.count())
  }

  test("q58 point-in-time join matches every order to exactly one version") {
    import org.apache.spark.sql.functions._
    val total = SparkEntry.queries("q58_scd2_pointintime")(spark, sf)
      .agg(sum(col("n_orders"))).collect().head.getLong(0)
    assert(total == Tables.t(spark, sf, "orders").count(),
      "validity ranges must tile time: no order lost or double-matched")
  }

  test("session_window gap boundary: a gap of exactly 30min MERGES") {
    // session_window extends a session while the next event is within
    // OR AT the gap boundary (inclusive — measured, not assumed; the
    // q69 oracle's islands rule is therefore strict >, matching q33).
    // The fixture has no exact-gap pair at micro precision, so pin the
    // boundary with crafted timestamps: exactly 30m merges, one
    // microsecond past splits, and the session end is last + gap.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gapUs = 30L * 60 * 1000000
    val t0 = 1700000000000000L
    val ev = Seq(
      (1L, t0), (1L, t0 + gapUs),                  // exactly 30m: merges
      (2L, t0), (2L, t0 + gapUs + 1)               // 30m + 1us: splits
    ).toDF("user_id", "us").withColumn("ts", timestamp_micros($"us"))
    val got = ev.groupBy($"user_id",
        session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_micros($"sw.start").as("s"),
        unix_micros($"sw.end").as("e"), $"n")
      .orderBy($"user_id", $"s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, t0, t0 + 2 * gapUs, 2L),
      (2L, t0, t0 + gapUs, 1L),
      (2L, t0 + gapUs + 1, t0 + 2 * gapUs + 1, 1L)))
  }

  test("q09 running sum is monotone per user for positive values") {
    val rows = SparkEntry.queries("q09_running_user_spend")(spark, sf)
      .collect().groupBy(_.getAs[Long]("user_id"))
    rows.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      val run = sorted.map(_.getAs[Double]("running_value"))
      assert(run.zip(run.drop(1)).forall { case (a, b) => b >= a || b.isNaN })
    }
  }
}
