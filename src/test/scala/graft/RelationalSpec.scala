package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
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
