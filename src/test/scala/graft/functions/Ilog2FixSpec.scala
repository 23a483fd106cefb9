package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** The ilog2_fix column's contract: codegen == interpreted == the
  * direct IntLog call, null propagation, and the bigint-only input
  * type check. (ilog2f's numeric pins live in UnigramEStepSpec.)
  */
class Ilog2FixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("codegen, interpreted, and direct calls agree; null propagates") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val xs = (1 to 300).map(_ => 1L + (rnd.nextLong() & ((1L << 50) - 1)))
    val rows = xs.map(x => (x, Option(x))) :+ (1L, None: Option[Long])
    val got = rows.toDF("x", "xn")
      .select($"x", UnigramFunctions.ilog2_fix($"x").as("y"),
        UnigramFunctions.ilog2_fix($"xn").as("yn"))
      .collect()
    got.dropRight(1).foreach { r =>
      assert(r.getLong(1) == IntLog.ilog2f(r.getLong(0)))
      assert(r.getLong(2) == r.getLong(1))
    }
    assert(got.last.isNullAt(2), "null input must yield null")
  }

  test("non-bigint input fails analysis") {
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("s")
        .select(UnigramFunctions.ilog2_fix($"s")).collect()
    }
    assert(e.getMessage.contains("ilog2_fix") ||
      e.getMessage.toLowerCase.contains("data type"))
  }
}
