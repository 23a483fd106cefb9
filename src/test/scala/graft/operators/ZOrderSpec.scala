package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** The z-order layout must earn its keep: chunks of a z-sorted layout
  * cover small bounding boxes in BOTH dimensions, so min/max statistics
  * prune multi-dimensional predicates that a single-column layout
  * cannot.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("interleave16 matches a reference bit-interleave") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (1999L, 99L), (12345L, 54321L), (70000L, 3L)) // 70000 wraps to low 16
    val got = cases.toDF("a", "b")
      .select(ZOrder.interleave16(col("a"), col("b"))).collect().map(_.getLong(0))
    val want = cases.map { case (a, b) => ref(a % 65536, b % 65536) }
    assert(got.toSeq == want)
  }

  test("z-order chunks cover far smaller bboxes than an orderkey layout") {
    import spark.implicits._
    val li = Tables.t(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    val n = li.count()
    val chunks = 16
    val rowsPerChunk = (n + chunks - 1) / chunks
    // area(chunking by column expr c) = mean over chunks of bbox area
    def meanArea(c: org.apache.spark.sql.Column): Double = {
      import org.apache.spark.sql.expressions.Window
      li.withColumn("__rn", row_number().over(Window.orderBy(c)))
        .groupBy((($"__rn" - 1) / rowsPerChunk).cast("long").as("chunk"))
        .agg(((max($"l_partkey") - min($"l_partkey") + 1) *
          (max($"l_suppkey") - min($"l_suppkey") + 1)).as("area"))
        .agg(avg($"area")).collect().head.getDouble(0)
    }
    // (the unpartitioned row_number window is TEST-ONLY bucketing, to
    // hold chunk sizes identical across layouts; production writes sort
    // by the key and chunk by file size)
    val zArea = meanArea(ZOrder.interleave16($"l_partkey", $"l_suppkey"))
    val naiveArea = meanArea($"l_orderkey")
    assert(zArea * 4 < naiveArea,
      s"z-order mean bbox area $zArea not << orderkey layout $naiveArea")
  }
}
