package graft.functions

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** MathCols.isqrt must be EXACT (s*s <= x < (s+1)*(s+1)) on the full
  * contract range, including the adversarial inputs a double-only floor
  * gets wrong: perfect squares, squares +- 1, and values near 2^53 where
  * the double grid is coarser than the integers.
  */
class MathColsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def sparkIsqrt(xs: Seq[Long]): Seq[(Long, Long)] =
    xs.toDF("x").select(col("x"), MathCols.isqrt(col("x")).as("s"))
      .as[(Long, Long)].collect().toSeq

  private def exact(x: Long): Long = {
    var s = BigInt(java.math.BigInteger.valueOf(x).sqrt())
    while (s * s > x) s -= 1
    while ((s + 1) * (s + 1) <= x) s += 1
    s.toLong
  }

  test("isqrt is exact on perfect squares and their neighbors") {
    val roots = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 65536L,
      94906265L /* floor(sqrt(2^53)) */, 10000000L)
    val xs = roots.flatMap(r => Seq(r * r - 1, r * r, r * r + 1))
      .filter(x => x >= 0 && x < (1L << 53))
    sparkIsqrt(xs).foreach { case (x, s) =>
      withClue(s"x=$x") { s shouldBe exact(x) }
    }
  }

  test("isqrt matches BigInt sqrt on random 53-bit inputs") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(200)(math.abs(rnd.nextLong()) % (1L << 53))
    sparkIsqrt(xs).foreach { case (x, s) =>
      withClue(s"x=$x") { s shouldBe exact(x) }
    }
  }
}
