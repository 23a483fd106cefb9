package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def events(ts: String*) = {
    import spark.implicits._
    ts.toSeq.toDF("s").select(to_timestamp(col("s")).as("ts"))
  }

  test("peakConcurrencyByDay counts overlap with half-open semantics") {
    // three overlapping 10-min sessions peak at 3; the 00:10 start
    // coincides with the 00:00 session's END — half-open intervals do
    // not overlap, so the peak stays 3 (closed semantics would see 4)
    val df = events(
      "2024-01-01 00:00:00", "2024-01-01 00:05:00",
      "2024-01-01 00:09:00", "2024-01-01 00:10:00")
    val got = Intervals.peakConcurrencyByDay(df, "ts").collect()
    assert(got.length == 1)
    assert(got.head.getLong(1) == 3L, s"half-open peak must be 3: ${got.head}")
    assert(got.head.getLong(2) == 4L)
  }

  test("peakConcurrencyByDay carries open sessions across midnight") {
    // day-1 session 23:55-00:05 is still open when day-2's 00:01
    // session starts: day 2 peaks at 2 although it has one start
    val df = events("2024-01-01 23:55:00", "2024-01-02 00:01:00")
    val got = Intervals.peakConcurrencyByDay(df, "ts")
      .orderBy(col("day")).collect()
    assert(got.map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("2024-01-01", 1L, 1L), ("2024-01-02", 2L, 1L)))
  }

  test("two-level sweep equals the naive single-window running sum") {
    import spark.implicits._
    // pseudo-random events across several hours and a day boundary
    val ts = (0 until 300).map { i =>
      val m = (i * 37) % (36 * 60) // minutes over 36h
      f"2024-01-01 ${m / 60}%02d:${m % 60}%02d:${(i * 13) % 60}%02d"
    }.map(s => {
      // hours 24..35 roll into day 2
      val h = s.substring(11, 13).toInt
      if (h >= 24) "2024-01-02 " + f"${h - 24}%02d" + s.substring(13) else s
    })
    val df = events(ts: _*)
    val naive = {
      val pts = df.select(col("ts").as("t"), lit(1).as("d"))
        .unionAll(df.select((col("ts") + expr("INTERVAL 10 MINUTES")).as("t"),
          lit(-1).as("d")))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("t"), col("d"))
        .rowsBetween(Long.MinValue, 0)
      pts.withColumn("c", sum(col("d")).over(w))
        .filter(col("d") === 1)
        .groupBy(to_date(col("t")).as("day"))
        .agg(max(col("c")).as("peak_concurrent"), count(lit(1)).as("n_starts"))
    }
    val got = Intervals.peakConcurrencyByDay(df, "ts")
      .orderBy(col("day")).collect().map(_.toSeq).toSeq
    val want = naive.orderBy(col("day")).collect().map(_.toSeq).toSeq
    assert(got == want)
  }
}
