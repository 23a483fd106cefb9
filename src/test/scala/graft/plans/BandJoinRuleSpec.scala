package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BandJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BandJoinRewrite
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  private def bandQuery(l: DataFrame, r: DataFrame): DataFrame =
    l.join(r, r("y") >= l("x") - 2 && r("y") <= l("x") + 3)
      .select(l("lid"), r("rid"), l("x"), r("y"))

  test("band join rewrites to a bucket equi-join with identical results") {
    import spark.implicits._
    val l = (0L until 200L).map(i => (i, i * 7 % 101)).toDF("lid", "x")
    val r = (0L until 300L).map(i => (i, i * 11 % 103)).toDF("rid", "y")
    val naive = bandQuery(l, r).collect().map(_.toString).sorted
    withRule {
      val q = bandQuery(l, r)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("Generate") || optimized.contains("explode"),
        s"rule did not fire:\n$optimized")
      val physical = q.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"),
        s"band join must not plan as a nested loop:\n$physical")
      assert(q.collect().map(_.toString).sorted.toSeq == naive.toSeq)
    }
  }

  test("strict bounds and negative values stay exact") {
    import spark.implicits._
    val l = Seq((1L, -5L), (2L, 0L), (3L, 7L)).toDF("lid", "x")
    val r = Seq((10L, -7L), (11L, -4L), (12L, 1L), (13L, 7L)).toDF("rid", "y")
    def q(ldf: DataFrame, rdf: DataFrame): DataFrame =
      ldf.join(rdf, rdf("y") > ldf("x") - 3 && rdf("y") < ldf("x") + 2)
        .select(ldf("lid"), rdf("rid"))
    val naive = q(l, r).collect().map(_.toString).sorted
    withRule {
      val got = q(l, r)
      assert(got.queryExecution.optimizedPlan.toString.contains("Generate"))
      assert(got.collect().map(_.toString).sorted.toSeq == naive.toSeq)
    }
  }

  test("null band keys are dropped, matching the naive inner join") {
    import spark.implicits._
    val l = Seq((1L, Some(5L)), (2L, None)).toDF("lid", "x")
    val r = Seq((10L, Some(6L)), (11L, None)).toDF("rid", "y")
    def q(ldf: DataFrame, rdf: DataFrame): DataFrame =
      ldf.join(rdf, rdf("y") >= ldf("x") - 1 && rdf("y") <= ldf("x") + 1)
        .select(ldf("lid"), rdf("rid"))
    val naive = q(l, r).collect().map(_.toString).sorted
    withRule {
      assert(q(l, r).collect().map(_.toString).sorted.toSeq == naive.toSeq)
      assert(naive.length == 1) // only (1, 10)
    }
  }

  test("exact-offset band (lo == hi) becomes a shifted equi-join") {
    import spark.implicits._
    val l = (0L until 60L).map(i => (i, i % 17)).toDF("lid", "x")
    val r = (0L until 60L).map(i => (i, i % 19)).toDF("rid", "y")
    def q(ldf: DataFrame, rdf: DataFrame): DataFrame =
      ldf.join(rdf, rdf("y") >= ldf("x") + 5 && rdf("y") <= ldf("x") + 5)
        .select(ldf("lid"), rdf("rid"))
    val naive = q(l, r).collect().map(_.toString).sorted
    withRule {
      val got = q(l, r)
      val physical = got.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"),
        s"x - y = c must plan as an equi-join:\n$physical")
      assert(got.collect().map(_.toString).sorted.toSeq == naive.toSeq)
      assert(naive.nonEmpty)
    }
  }

  test("joins with an equality conjunct are left alone") {
    import spark.implicits._
    val l = (0L until 50L).map(i => (i, i % 5, i % 20)).toDF("lid", "k", "x")
    val r = (0L until 50L).map(i => (i, i % 5, i % 23)).toDF("rid", "k2", "y")
    withRule {
      val q = l.join(r, l("k") === r("k2") &&
        r("y") >= l("x") - 2 && r("y") <= l("x") + 2)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("__band_bin"),
        s"equi-band joins already hash-join; rule must not fire:\n$optimized")
      assert(q.count() > 0)
    }
  }

  test("null-safe equality conjuncts also disable the rewrite") {
    import spark.implicits._
    val l = (0L until 50L).map(i => (i, i % 5, i % 20)).toDF("lid", "k", "x")
    val r = (0L until 50L).map(i => (i, i % 5, i % 23)).toDF("rid", "k2", "y")
    withRule {
      // a <=> b is just as hash-joinable as a = b; expanding the band on
      // top would double the left side for nothing
      val q = l.join(r, l("k") <=> r("k2") &&
        r("y") >= l("x") - 2 && r("y") <= l("x") + 2)
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("__band_bin"),
        s"null-safe equi-band joins already hash-join; rule must not fire:\n$optimized")
      val physical = q.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
        !physical.contains("CartesianProduct"), physical)
      assert(q.count() > 0)
    }
  }

  test("double-typed bands are out of scope (no silent float bucketing)") {
    import spark.implicits._
    val l = Seq((1L, 1.5)).toDF("lid", "x")
    val r = Seq((10L, 2.0)).toDF("rid", "y")
    withRule {
      val q = l.join(r, r("y") >= l("x") - 1.0 && r("y") <= l("x") + 1.0)
      assert(!q.queryExecution.optimizedPlan.toString.contains("__band_bin"))
      assert(q.count() == 1)
    }
  }

  test("GraftSparkExtensions injects the rule via the extensions API") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSparkExtensions().apply(ext) // must register without throwing
  }

  test("property: random bands and values match the naive join exactly") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    val genCase = for {
      xs <- Gen.listOfN(40, Gen.chooseNum(-1000L, 1000L))
      ys <- Gen.listOfN(40, Gen.chooseNum(-1000L, 1000L))
      lo <- Gen.chooseNum(-50L, 50L)
      width <- Gen.chooseNum(0L, 60L)
      strictLo <- Gen.oneOf(true, false)
      strictHi <- Gen.oneOf(true, false)
    } yield (xs, ys, lo, lo + width, strictLo, strictHi)
    val prop = forAll(genCase) { case (xs, ys, lo, hi, sLo, sHi) =>
      val l = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("lid", "x")
      val r = ys.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("rid", "y")
      def q(ldf: DataFrame, rdf: DataFrame): DataFrame = {
        // the rule matches attr-vs-attr+lit shapes, so spell the bounds
        // that way: x >/>= y + lo  AND  x </<= y + hi
        val low2 = if (sLo) ldf("x") > rdf("y") + lo else ldf("x") >= rdf("y") + lo
        val up2 = if (sHi) ldf("x") < rdf("y") + hi else ldf("x") <= rdf("y") + hi
        ldf.join(rdf, low2 && up2).select(ldf("lid"), rdf("rid"))
      }
      val naive = q(l, r).collect().map(_.toString).sorted.toSeq
      val ruled = withRule { q(l, r).collect().map(_.toString).sorted.toSeq }
      Prop(ruled == naive).label(s"lo=$lo hi=$hi sLo=$sLo sHi=$sHi " +
        s"naive=${naive.size} ruled=${ruled.size}")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(result.passed, result.toString)
  }
}
