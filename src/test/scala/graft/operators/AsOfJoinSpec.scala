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
}
