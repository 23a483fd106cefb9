package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Vectorized dense-node scan path: same results as the row path, batches
  * confirmed by the ColumnarToRow transition in the physical plan.
  */
class OsmPbfColumnarSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val fixture = "/root/reference/src/test/java/resources/temp.dat"

  private def nodes = spark.read.format("osmpbf")
    .option("parseType", "node").load(fixture)

  test("pruned id/lat/lon scan goes columnar") {
    val df = nodes.select("id", "lat", "lon")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)
    assert(df.count() == 9720)
  }

  test("columnar and row paths produce identical aggregates") {
    val cols = nodes.select("id", "lat", "lon")
      .agg(sum("id"), sum("lat"), sum("lon"), count(lit(1))).collect()(0)
    val rows = nodes.select("id", "lat", "lon", "tags") // tags forces row path
      .agg(sum("id"), sum("lat"), sum("lon"), count(lit(1))).collect()(0)
    assert(cols.getLong(0) == rows.getLong(0))
    assert(cols.getDouble(1) == rows.getDouble(1))
    assert(cols.getDouble(2) == rows.getDouble(2))
    assert(cols.getLong(3) == rows.getLong(3))
  }

  test("golden first node survives the columnar path") {
    val r = nodes.select("id", "lat", "lon")
      .filter(col("id") === 108424353L).collect()(0)
    assert(math.abs(r.getDouble(1) - 10.4769503) < 1e-9)
    assert(math.abs(r.getDouble(2) - -64.1847472) < 1e-9)
  }

  test("tags projection falls back to the row reader") {
    val plan = nodes.select("id", "tags").queryExecution.executedPlan.toString
    assert(!plan.contains("ColumnarToRow"), plan)
  }

  test("README tile query runs on the columnar path with exact totals") {
    val s = 2048
    val df = nodes
      .withColumn("tile",
        (floor((col("lat") + 90) * s / 180) * s +
          floor((col("lon") + 180) * s / 360)).cast("long"))
      .groupBy("tile").count()
    // AQE hides the ColumnarToRow transition in the pre-execution plan
    // string (asserted in the non-agg test above); here assert exactness
    assert(df.agg(sum("count")).collect()(0).getLong(0) == 9720)
    assert(df.count() == 4)
  }
}
