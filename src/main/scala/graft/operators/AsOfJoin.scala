package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-prior) join — an operator Spark lacks natively.
  *
  * Composed from built-ins per the preference order (SURVEY §"custom
  * operators" (a)): tag both sides, union, and carry the right side's
  * payload forward with `last_value(ignoreNulls)` over a per-key window
  * ordered by (ts, side). This costs exactly ONE shuffle (the window
  * partition) regardless of time-range density — unlike the naive range
  * join, which explodes to |left| x |right-rows-in-range| before picking
  * the max. At equal timestamps the right row sorts first, so `>=`
  * (inclusive) semantics match DuckDB's ASOF JOIN.
  */
object AsOfJoin {

  /** For each left row, attach the payload of the latest right row with
    * `right.tsCol <= left.tsCol` within the same `key`.
    *
    * @param payload right-side columns to carry; emitted as `asof_<name>`
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // Each payload is carried inside a single-field STRUCT: the struct is
    // non-null for every right row even when the payload VALUE is null,
    // so ignoreNulls skips only the left rows' filler — a matched right
    // row with a genuinely-NULL payload yields NULL (DuckDB ASOF
    // semantics), not a stale older row's value.
    def structType(p: String) =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", right.schema(p).dataType)))
    val l = left
      .withColumn("__side", lit(1))
      .withColumns(payload.map(p =>
        s"__p_$p" -> lit(null).cast(structType(p))).toMap)
    val r = right
      .withColumn("__side", lit(0))
      .select((Seq(col(key), col(tsCol), col("__side")) ++
        payload.map(p => struct(col(p).as("v")).as(s"__p_$p")) ++
        leftCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val unioned = l.select((leftCols ++ Seq("__side") ++ payload.map(p => s"__p_$p"))
        .map(col): _*)
      .unionByName(r.select((leftCols ++ Seq("__side") ++ payload.map(p => s"__p_$p"))
        .map(col): _*))
    // the payload structs join the ORDER BY as a deterministic tie-break:
    // duplicate right rows at the same (key, ts) would otherwise make
    // "last" partition-order dependent (flaky across runs); with the tie
    // ordered by payload value, the greatest payload wins, always. A
    // payload of a NON-ORDERABLE type (MapType, variant) cannot sort
    // directly, so it tie-breaks on an orderable surrogate instead —
    // its JSON rendering — keeping the determinism without narrowing
    // the accepted payload types.
    def tieBreak(p: String): Column = {
      val c = col(s"__p_$p")
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(right.schema(p).dataType)) c
      else to_json(c)
    }
    val w = Window.partitionBy(col(key))
      .orderBy((Seq(col(tsCol), col("__side")) ++
        payload.map(tieBreak)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(s"asof_$p",
        last(col(s"__p_$p"), ignoreNulls = true).over(w).getField("v"))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ payload.map(p => col(s"asof_$p"))): _*)
  }
}
