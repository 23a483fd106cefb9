package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RankOps.exactQuantiles must be BITWISE-equal to Spark's exact
  * `percentile` aggregator — the swap replaces the aggregator's
  * collect-all buffer with dictionary rank arithmetic, and the oracle
  * gate (quantile_cont) only stays green if the interpolated doubles
  * are identical, not merely close.
  */
class ExactQuantilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("keyless: bitwise equal to percentile() on lineitem prices") {
    import spark.implicits._
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select($"l_extendedprice".cast("double").as("v"))
    val agg = li.agg(percentile($"v", typedLit(ps)).as("qs"))
      .select(posexplode($"qs").as(Seq("i", "expect")))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // smallDictLimit = 0 forces the rank path even on this fixture-
    // sized dictionary; the default exercises the fast path below
    val got = RankOps.exactQuantiles(li, Nil, $"v", ps,
        smallDictLimit = 0L)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(got.size == ps.size)
    ps.zipWithIndex.foreach { case (p, i) =>
      assert(java.lang.Double.doubleToLongBits(got(p)) ==
        java.lang.Double.doubleToLongBits(agg(i)),
        s"p=$p: got ${got(p)}, aggregator ${agg(i)}")
    }
    spark.catalog.clearCache()
  }

  test("grouped: bitwise equal to percentile() per return flag") {
    import spark.implicits._
    val ps = Seq(0.25, 0.5, 0.9)
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select($"l_returnflag", $"l_quantity")
    val agg = li.groupBy($"l_returnflag")
      .agg(percentile($"l_quantity", typedLit(ps)).as("qs"))
      .select($"l_returnflag", posexplode($"qs").as(Seq("i", "expect")))
      .collect()
      .map(r => (r.getString(0), ps(r.getInt(1))) -> r.getDouble(2)).toMap
    val got = RankOps.exactQuantiles(li, Seq("l_returnflag"),
        $"l_quantity", ps, smallDictLimit = 0L)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == agg.keySet)
    got.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(agg(k)),
        s"$k: got $v, aggregator ${agg(k)}")
    }
    spark.catalog.clearCache()
  }

  test("adversarial: ties, single-row groups, exact-integer positions") {
    import spark.implicits._
    // heavy ties (rank brackets collapse onto one dictionary row),
    // a single-row group (position 0 everywhere), and n chosen so
    // p*(n-1) lands exactly on integers for p = 0.25/0.5/0.75
    val rows = Seq.tabulate(9)(i => ("ties", (i / 3).toDouble)) ++
      Seq(("single", 42.0)) ++
      Seq.tabulate(5)(i => ("spread", math.pow(10.0, i - 2)))
    val df = rows.toDF("k", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val agg = df.groupBy($"k").agg(percentile($"v", typedLit(ps)).as("qs"))
      .select($"k", posexplode($"qs").as(Seq("i", "expect")))
      .collect()
      .map(r => (r.getString(0), ps(r.getInt(1))) -> r.getDouble(2)).toMap
    val got = RankOps.exactQuantiles(df, Seq("k"), $"v", ps,
        smallDictLimit = 0L)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == agg.keySet)
    got.foreach { case (k, v) =>
      assert(java.lang.Double.doubleToLongBits(v) ==
        java.lang.Double.doubleToLongBits(agg(k)),
        s"$k: got $v, aggregator ${agg(k)}")
    }
    spark.catalog.clearCache()
  }

  test("threshold boundary: fast and rank paths bitwise-equal at D / D-1") {
    import spark.implicits._
    // dictionary size D is exactly the distinct (k, v) count; limit = D
    // takes the percentile-over-dictionary fast path, limit = D - 1 the
    // three-level rank path. Both must match the aggregator bitwise —
    // the switch is invisible to any oracle.
    val rows = Seq.tabulate(9)(i => ("a", (i / 3).toDouble)) ++   // ties
      Seq.tabulate(7)(i => ("b", i * 1.75 - 3.0)) ++
      Seq(("c", 42.0))
    val df = rows.toDF("k", "v")
    val d = df.select($"k", $"v").distinct().count()
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val agg = df.groupBy($"k").agg(percentile($"v", typedLit(ps)).as("qs"))
      .select($"k", posexplode($"qs").as(Seq("i", "e")))
      .collect()
      .map(r => (r.getString(0), ps(r.getInt(1))) -> r.getDouble(2)).toMap
    for (limit <- Seq(d, d - 1)) {
      val got = RankOps.exactQuantiles(df, Seq("k"), $"v", ps,
          smallDictLimit = limit)
        .collect()
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      assert(got.keySet == agg.keySet, s"limit=$limit")
      got.foreach { case (k, v) =>
        assert(java.lang.Double.doubleToLongBits(v) ==
          java.lang.Double.doubleToLongBits(agg(k)),
          s"limit=$limit $k: got $v, aggregator ${agg(k)}")
      }
      spark.catalog.clearCache()
    }
  }

  test("contract: NULL grouping keys dropped, all-NULL group emits no row") {
    import spark.implicits._
    val df = Seq(
      (Option("a"), Option(1.0)), (Option("a"), Option(3.0)),
      (Option.empty[String], Option(9.0)),     // NULL key: dropped
      (Option("b"), Option.empty[Double]),     // all-NULL values: no row
      (Option("b"), Option.empty[Double])
    ).toDF("k", "v")
    for (limit <- Seq(0L, 1000L)) {            // both paths, same contract
      val got = RankOps.exactQuantiles(df, Seq("k"), $"v", Seq(0.5),
          smallDictLimit = limit)
        .collect().map(r => (r.getString(0), r.getDouble(2)))
      assert(got.toSeq == Seq(("a", 2.0)),
        s"limit=$limit: only the non-null 'a' group survives, got " +
          got.mkString(", "))
      spark.catalog.clearCache()
    }
  }

  test("property: bitwise equal to percentile() on random groups") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    // small random grouped datasets with deliberate tie mass and mixed
    // magnitudes; random quantile targets including the 0/1 edges
    val genVal = Gen.oneOf(
      Gen.chooseNum(0, 5).map(_.toDouble),           // heavy ties
      Gen.chooseNum(-1000.0, 1000.0),                // spread
      Gen.oneOf(0.5, -0.5, 1e-9, 1e9))               // fixed landmarks
    val genRows = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("g1", "g2", "g3"), genVal)))
    val genPs = Gen.chooseNum(1, 4).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0))
        .map(_.distinct))
    val prop = forAll(Gen.zip(genRows, genPs)) { case (rows, ps0) =>
      val ps = if (ps0.isEmpty) Seq(0.5) else ps0
      val df = rows.toDF("k", "v")
      val agg = df.groupBy($"k")
        .agg(percentile($"v", typedLit(ps)).as("qs"))
        .select($"k", posexplode($"qs").as(Seq("i", "e")))
        .collect()
        .map(r => (r.getString(0), ps(r.getInt(1))) -> r.getDouble(2)).toMap
      // both paths against the aggregator: limit 0 = rank arithmetic,
      // the huge limit = percentile-over-dictionary fast path
      val both = Seq(0L, 1L << 40).map { limit =>
        val got = RankOps.exactQuantiles(df, Seq("k"), $"v", ps,
            smallDictLimit = limit)
          .collect()
          .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
        spark.catalog.clearCache()
        got
      }
      Prop(both.forall(got =>
        got.keySet == agg.keySet && got.forall { case (k, v) =>
          java.lang.Double.doubleToLongBits(v) ==
            java.lang.Double.doubleToLongBits(agg(k))
        })).label(s"rows=$rows ps=$ps got=$both agg=$agg")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.toString)
  }

  test("plan: no collect-all percentile buffer, windows all keyed") {
    import spark.implicits._
    val li = graft.Tables.t(spark, sf, "lineitem")
      .select($"l_extendedprice".cast("double").as("v"))
    val plan = RankOps.exactQuantiles(li, Nil, $"v", Seq(0.5),
        smallDictLimit = 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains(" percentile("),
      s"rank path must not use the buffering aggregator:\n$plan")
    spark.catalog.clearCache()
    // fast path DOES use the aggregator — but over the deduplicated
    // dictionary (bounded by the limit), never the raw rows: its scan
    // feeds a (v, count) hash aggregate below the percentile
    val fast = RankOps.exactQuantiles(li, Nil, $"v", Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(fast.contains("percentile("),
      s"small dictionary must take the aggregator fast path:\n$fast")
    assert(fast.contains("InMemoryTableScan") || fast.contains("count(1)"),
      s"fast-path percentile must read the dictionary, not raw rows:\n$fast")
    spark.catalog.clearCache()
  }
}
