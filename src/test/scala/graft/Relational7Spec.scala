package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q91/q92 behavior pins: the runtime bloom filter must actually fire
  * (a conf typo or a Spark default change would silently degrade q91 to
  * a plain shuffle join while staying value-correct), and dynamic
  * partition overwrite must rewrite ONLY the touched partitions.
  */
class Relational7Spec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q91 injects bloom_filter_might_contain on the fact side") {
    val s = spark
    val prev = graft.queries.Relational7.bloomConfs
      .map { case (k, _) => k -> s.conf.getOption(k) }
    graft.queries.Relational7.bloomConfs
      .foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val df = graft.queries.Relational7.bloomJoinFrame(s, sf)
      val plan = df.queryExecution.executedPlan.toString
      // the injected filter prints as might_contain(Subquery ...,
      // xxhash64(l_orderkey, ...)) on the fact side, BELOW lineitem's
      // exchange — i.e. the pruning happens before the shuffle
      assert(plan.contains("might_contain"),
        s"runtime bloom filter did not inject:\n$plan")
      val factFilter = plan.linesIterator
        .find(_.contains("might_contain")).getOrElse("")
      assert(factFilter.contains("l_orderkey"),
        s"bloom must probe the fact-side key:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("q91 values are identical with and without the bloom filter") {
    val withBloom = SparkEntry.queries("q91_runtime_bloom_filter")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val plain = graft.queries.Relational7.bloomJoinFrame(spark, sf)
      .collect().map(_.toSeq).toSeq
    withBloom shouldBe plain
  }

  test("q92 leaves untouched partitions byte-identical") {
    import spark.implicits._
    val out = SparkEntry.queries("q92_dynamic_partition_overwrite")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSeq
    val base = Tables.t(spark, sf, "orders")
      .groupBy($"o_orderpriority")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // untouched partitions keep ALL their rows and their full year range
    out.filter(r => !Set("1-URGENT", "2-HIGH").contains(r._1))
      .foreach { case (prio, n, minYear) =>
        n shouldBe base(prio)
        minYear should be < 1997
      }
    // rewritten partitions hold only the 1997+ slice
    out.filter(r => Set("1-URGENT", "2-HIGH").contains(r._1))
      .foreach { case (_, _, minYear) => minYear should be >= 1997 }
  }

  test("q101 recursion matches the closed form: depth = digits(key) - 1") {
    import spark.implicits._
    val out = SparkEntry.queries("q101_recursive_hierarchy")(spark, sf)
      .select($"depth", $"n_nodes")
      .as[(Long, Long)].collect().toMap
    // independent non-recursive formulation of the decimal trie: a key
    // sits at depth len(digits) - 1, so the per-depth counts must equal
    // a plain GROUP BY over the string length of the key
    val byLen = Tables.t(spark, sf, "customer")
      .select(org.apache.spark.sql.functions
        .length($"c_custkey".cast("string")).cast("long").as("d"))
      .groupBy($"d").count()
      .as[(Long, Long)].collect().map { case (d, n) => (d - 1, n) }.toMap
    out shouldBe byLen
    // conservation: every customer lands at exactly one depth
    out.values.sum shouldBe Tables.t(spark, sf, "customer").count()
  }
}
