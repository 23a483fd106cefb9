package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics over event streams: sweep-line computations
  * expressed as declarative plans. The classic formulation (one global
  * running sum over every interval endpoint) is a single-task funnel at
  * scale; here the accumulation is two-level — bucket totals by a time
  * chunk (map-side partial aggregation), a cumulative offset over the
  * bucket DICTIONARY (rows = buckets in the timeline, not events: ten
  * years of hourly buckets is ~87k rows — metadata-sized, the packedBins
  * super-group discipline), then a bucket-partitioned window whose
  * partitions are bounded by one bucket's events. Shrink the bucket to
  * minutes and the per-task bound tightens 60x with the same plan.
  */
object Intervals {

  /** Peak concurrent sessions per day: each event opens a session
    * interval `[ts, ts + durMinutes)`; the result is, for each day, the
    * maximum number of simultaneously-open sessions and the number of
    * sessions started. Half-open semantics: a session ending at instant
    * `t` does not overlap one starting at `t` (the −1 endpoint orders
    * before the +1 at equal timestamps). Peaks are attained at session
    * starts, so the per-day max scans only +1 endpoints; sessions
    * crossing midnight carry into the next day's baseline because the
    * running sum is global over the timeline, never reset per day.
    */
  def peakConcurrencyByDay(
      df: DataFrame,
      tsCol: String,
      durMinutes: Int = 10): DataFrame = {
    require(durMinutes >= 1, "durMinutes must be >= 1")
    val pts = df
      .select(explode(array(
        struct(col(tsCol).as("__t"), lit(1).as("__delta")),
        struct((col(tsCol) + expr(s"INTERVAL $durMinutes MINUTES")).as("__t"),
          lit(-1).as("__delta")))).as("__p"))
      .select(col("__p.__t").as("__t"), col("__p.__delta").as("__delta"),
        date_trunc("hour", col("__p.__t")).as("__h"))
    val hourTotals = pts.groupBy(col("__h"))
      .agg(sum(col("__delta")).as("__ht"))
    // cumulative concurrency entering each hour: an unpartitioned window
    // over the HOUR dictionary (one row per timeline hour), not events
    val hourW = Window.orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hourTotals
      .withColumn("__before", coalesce(sum(col("__ht")).over(hourW), lit(0L)))
      .select(col("__h"), col("__before"))
    // within-hour running sum; the (−1 before +1) tie order encodes the
    // half-open interval semantics
    val inHourW = Window.partitionBy(col("__h"))
      .orderBy(col("__t"), col("__delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.join(offsets, Seq("__h"))
      .withColumn("__conc", col("__before") + sum(col("__delta")).over(inHourW))
      .filter(col("__delta") === 1)
      .groupBy(to_date(col("__t")).as("day"))
      .agg(max(col("__conc")).as("peak_concurrent"),
        count(lit(1)).as("n_starts"))
  }
}
