package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-range (band) join: pair left rows with right rows whose
  * timestamp falls in [left.ts, left.ts + window).
  *
  * Naively this is a non-equi join — Spark plans it as a broadcast
  * nested loop (quadratic work, no partition pruning). The scale shape
  * used here is bucket expansion: quantize time into `window`-sized bins,
  * emit each left row into its bin AND the next (a right match within
  * the window lives in one of the two), join on (key, bin) as a plain
  * equi-join — hash-partitioned, AQE-skew-handled — then apply the exact
  * range predicate. Work is proportional to true match density, not
  * |L| x |R|.
  */
object RangeJoin {

  /** @param left      rows anchoring the window
    * @param right     rows probed within [ts, ts + windowMicros)
    * @param key       equality key column name on both sides
    * @param tsCol     timestamp column name on both sides
    * @param windowMicros window length in microseconds
    */
  def bandJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      windowMicros: Long): DataFrame = {
    def us(c: Column): Column = unix_micros(c)
    val l = left.withColumn("__bin",
      explode(array((us(col(tsCol)) / windowMicros).cast("long"),
        (us(col(tsCol)) / windowMicros).cast("long") + 1)))
    val rCols = Seq(col(key), col("__bin"), col(tsCol).as("__r_ts")) ++
      right.columns.filterNot(c => c == key || c == tsCol)
        .map(c => col(c).as(s"r_$c"))
    val r = right
      .withColumn("__bin", (us(col(tsCol)) / windowMicros).cast("long"))
      .select(rCols: _*)
    l.join(r, Seq(key, "__bin"))
      .filter(us(col("__r_ts")) >= us(col(tsCol)) &&
        us(col("__r_ts")) < us(col(tsCol)) + windowMicros)
      .drop("__bin")
  }
}
