package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Probabilistic sketch surface: Spark's built-in CountMinSketch and
  * BloomFilter (DataFrameStatFunctions) — mergeable, distributed,
  * bounded-error structures a 100 TB profile pass uses instead of exact
  * global counts. Accuracy-gated here (no oracle: sketch internals are
  * engine-specific).
  */
class SketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("count-min sketch overestimates-only within eps * N") {
    val events = Tables.t(spark, sf, "events")
    val cms = events.stat.countMinSketch(
      col("event_type"), eps = 0.001, confidence = 0.99, seed = 42)
    val exact = events.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    exact.foreach { case (k, c) =>
      val est = cms.estimateCount(k)
      assert(est >= c, s"CMS must never underestimate: $k est=$est exact=$c")
      assert(est <= c + (0.001 * n).toLong + 1,
        s"CMS overshoot beyond eps*N for $k: est=$est exact=$c n=$n")
    }
  }

  test("bloom filter has no false negatives and bounded false positives") {
    val orders = Tables.t(spark, sf, "orders")
    val bloom = orders.stat.bloomFilter(col("o_custkey"), 2000, 0.03)
    val present = orders.select("o_custkey").distinct().collect().map(_.getLong(0))
    assert(present.forall(bloom.mightContain), "bloom must have no false negatives")
    // keys far outside the customer key space: FPR should be near target
    val absentHits = (1000000L until 1002000L).count(bloom.mightContain)
    assert(absentHits <= 2000 * 0.1,
      s"false-positive rate implausibly high: $absentHits/2000")
  }

  test("runtime bloom filter injects a might_contain prune on the fact side") {
    // Catalyst's InjectRuntimeFilter: a selective dim filter on the
    // creation side of a shuffle join seeds a bloom filter that prunes
    // the fact scan BEFORE the shuffle — the runtime form of the manual
    // probe-filter p23 applies. Thresholds are sized for production
    // (10 GB application side), so pin them down for the fixture scale.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val ord = Tables.t(spark, sf, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter"),
        s"expected an injected runtime bloom filter:\n${p.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
