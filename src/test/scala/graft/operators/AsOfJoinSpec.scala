package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Unit semantics of the as-of join (q26 pins the oracle equivalence at
  * scale; these pin the NULL edges a star-schema corpus never hits).
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a matched right row with a NULL payload yields NULL, not a stale value") {
    import spark.implicits._
    val right = Seq(
      (1L, 1L, Option(10.0)), // older row, non-null payload
      (1L, 2L, Option.empty[Double]) // latest row, NULL payload
    ).toDF("k", "ts", "v")
    val left = Seq((1L, 3L)).toDF("k", "ts")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("v")).collect()
    assert(got.length == 1)
    // DuckDB ASOF semantics: the LATEST right row at ts=2 matches, and
    // its payload is genuinely NULL — carrying 10.0 forward would be a
    // stale-row bug
    assert(got.head.isNullAt(got.head.fieldIndex("asof_v")),
      s"expected NULL payload from the matched ts=2 row, got ${got.head}")
  }

  test("non-orderable payload types (MapType) join via the surrogate tie-break") {
    import spark.implicits._
    // a MapType payload cannot join the window ORDER BY directly (maps
    // are not orderable in Spark): the tie-break must fall back to the
    // JSON surrogate instead of failing analysis
    val right = Seq(
      (1L, 1L, Map("a" -> 1)),
      (1L, 2L, Map("b" -> 2))
    ).toDF("k", "ts", "m")
    val left = Seq((1L, 3L), (1L, 1L)).toDF("k", "ts")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("m"))
      .orderBy("ts").collect()
    assert(got(0).getMap[String, Int](got(0).fieldIndex("asof_m")) ==
      Map("a" -> 1)) // ts=1 matches the ts=1 right row inclusively
    assert(got(1).getMap[String, Int](got(1).fieldIndex("asof_m")) ==
      Map("b" -> 2)) // ts=3 carries the latest (ts=2) map forward
  }

  test("left rows before any right row get NULL; inclusive match at equal ts") {
    import spark.implicits._
    val right = Seq((1L, 5L, 42.0)).toDF("k", "ts", "v")
    val left = Seq((1L, 4L), (1L, 5L), (1L, 6L)).toDF("k", "ts")
    val got = AsOfJoin.asOf(left, right, "k", "ts", Seq("v"))
      .orderBy("ts").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("asof_v"))) // ts=4: no match
    assert(got(1).getDouble(got(1).fieldIndex("asof_v")) == 42.0) // ts=5: inclusive
    assert(got(2).getDouble(got(2).fieldIndex("asof_v")) == 42.0) // ts=6
  }

  test("directional: forward and nearest semantics, equal-ts inclusive both ways") {
    import spark.implicits._
    val right = Seq(
      (1L, 10L, 1.0), (1L, 20L, 2.0),
      (2L, 10L, 1.0), (2L, 30L, 3.0)
    ).toDF("k", "ts", "v")
    // k=1 left at 20: equal-ts right must match inclusively in BOTH
    // directions; k=2 left at 20: backward->10, forward->30, nearest is
    // a 10-vs-10 distance TIE -> backward (pandas' rule); k=2 left at
    // 25: nearest -> forward (5 < 15)
    val left = Seq((1L, 20L), (2L, 20L), (2L, 25L)).toDF("k", "ts")
    def run(dir: String, tol: Option[Long] = None) =
      AsOfJoin.asOfDirectional(left, right, "k", "ts", Seq("v"), dir, tol)
        .orderBy("k", "ts").collect()
        .map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2))).toSeq
    assert(run("backward") == Seq(Some(2.0), Some(1.0), Some(1.0)))
    assert(run("forward") == Seq(Some(2.0), Some(3.0), Some(3.0)))
    assert(run("nearest") == Seq(Some(2.0), Some(1.0), Some(3.0)))
    // tolerance nulls a direction BEFORE the nearest pick: with tol=5,
    // k=2@20 loses both (dist 10 both ways) while k=2@25 keeps only the
    // forward match (5 <= 5 but backward is 15 away)
    assert(run("nearest", Some(5L)) == Seq(Some(2.0), None, Some(3.0)))
    assert(run("backward", Some(5L)) == Seq(Some(2.0), None, None))
  }

  test("NULL timestamps match nothing: left gets NULL, right rows are dropped") {
    import spark.implicits._
    // a NULL-ts left row would otherwise see the WHOLE partition in its
    // forward frame (nulls sort first), and a NULL-ts right row would
    // pose as the "earliest" backward match for everyone
    val right = Seq((1L, Option(10L), 1.0), (1L, Option.empty[Long], 9.0))
      .toDF("k", "ts", "v")
    val left = Seq((1L, Option(5L)), (1L, Option.empty[Long]))
      .toDF("k", "ts")
    for (d <- Seq("backward", "forward", "nearest")) {
      val got = AsOfJoin.asOfDirectional(left, right, "k", "ts", Seq("v"), d)
        .orderBy($"ts".asc_nulls_last).collect()
      val expect5 = if (d == "backward") None else Some(1.0)
      assert((if (got(0).isNullAt(2)) None else Some(got(0).getDouble(2)))
        == expect5, s"$d: left ts=5 must see only the real ts=10 row")
      assert(got(1).isNullAt(2), s"$d: NULL-ts left row must match nothing")
    }
  }

  test("directional: one Exchange, two doc-ordered windows (no range product)") {
    import spark.implicits._
    val right = Seq((1L, 10L, 1.0)).toDF("k", "ts", "v")
    val left = Seq((1L, 20L)).toDF("k", "ts")
    val p = AsOfJoin.asOfDirectional(left, right, "k", "ts", Seq("v"),
      "nearest").queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"directional as-of must never plan a range product:\n$p")
    // both direction frames must reuse ONE key shuffle: a second
    // Exchange would mean the forward sort re-partitioned
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nEx == 1, s"expected exactly one key Exchange, got $nEx:\n$p")
  }
}
