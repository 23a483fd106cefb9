package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Salting must be answer-invisible: under a pathological hot key the
  * salted join returns exactly the plain join's rows.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val (big, small) = {
    import spark.implicits._
    // 10k rows, 90% on key 1 (the hot key), the rest spread over 2..11
    val b = spark.range(10000)
      .select(col("id").as("row_id"),
        when(pmod(col("id"), lit(10)) < lit(9), lit(1L))
          .otherwise(pmod(col("id"), lit(10)) + lit(2)).as("k"))
    val s = (1L to 11L).map(k => (k, s"dim_$k")).toDF("dk", "label")
    (b: org.apache.spark.sql.DataFrame, s: org.apache.spark.sql.DataFrame)
  }

  test("salted join equals the plain join under a 90% hot key") {
    val plain = big.join(small, col("k") === col("dk"))
      .select("row_id", "k", "label")
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", "dk", "row_id", salts = 8)
      .select("row_id", "k", "label")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("salts=1 degenerates to the plain join") {
    val plain = big.join(small, col("k") === col("dk")).count()
    assert(SkewJoin.saltedEquiJoin(big, small, "k", "dk", "row_id", salts = 1)
      .count() == plain)
  }

  test("rows without a match are dropped on both paths (inner-join semantics)") {
    import spark.implicits._
    val lonely = Seq((1L, 999L)).toDF("row_id", "k") // key matches no dim
    assert(SkewJoin.saltedEquiJoin(lonely, small, "k", "dk", "row_id").count() == 0)
  }

  test("AQE splits the hot partition of a skewed SMJ (OptimizeSkewedJoin fires)") {
    // The runtime counterpart of manual salting: AQE detects the
    // oversized post-shuffle partition from map output statistics and
    // splits it into parallel sub-joins. Thresholds are production-sized
    // (256 MB), so pin them down to fixture scale; broadcast is disabled
    // to force the sort-merge join AQE's skew handling applies to.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // 200k rows, 95% on one key: the hot key's post-shuffle partition
      // is far beyond factor x median AND the byte threshold
      val left = spark.range(200000)
        .select(col("id").as("row_id"),
          when(pmod(col("id"), lit(20)) < lit(19), lit(1L))
            .otherwise(pmod(col("id"), lit(20)) + lit(2)).as("k"))
      val right = spark.range(200)
        .select(col("id").as("dk"), concat(lit("d"), col("id")).as("label"))
      val joined = left.join(right, col("k") === col("dk"))
      // execute THIS queryExecution (count() would plan a separate one
      // and the inspected AdaptiveSparkPlan would never finalize)
      val n = joined.collect().length
      assert(n == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the SMJ:\n${finalPlan.take(4000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
