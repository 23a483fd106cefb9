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
}
