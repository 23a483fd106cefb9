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
      payload: Seq[String]): DataFrame =
    asOfDirectional(left, right, key, tsCol, payload, "backward", None)

  /** Directional as-of — the full pandas-`merge_asof` surface over the
    * same one-shuffle union+window core as [[asOf]]:
    *
    *  - `"backward"`: latest right row with `right.ts <= left.ts` (what
    *    [[asOf]] computes);
    *  - `"forward"`: earliest right row with `right.ts >= left.ts`;
    *  - `"nearest"`: whichever of the two is closer in time (tie →
    *    backward, pandas' rule);
    *  - `toleranceUs`: matches farther than this many microseconds from
    *    the left timestamp are nulled out (applied per direction BEFORE
    *    the nearest selection, so an out-of-tolerance backward match
    *    never shadows an in-tolerance forward one).
    *
    * Both directions ride ONE hash shuffle on the key: the union is
    * sorted twice within partitions (ts asc with right-before-left for
    * the backward frame; ts asc with left-before-right for the forward
    * frame, so an equal-timestamp right row is inclusive in BOTH
    * directions) — two WindowExecs, one Exchange, never a range
    * product. Ties among equal (ts, side) resolve to the greatest
    * payload in both directions ("last" would otherwise be
    * partition-order dependent — flaky across runs); a NON-ORDERABLE
    * payload type (MapType, variant) tie-breaks on its JSON rendering
    * instead of failing analysis.
    *
    * Each payload is carried inside a single-field STRUCT: the struct
    * is non-null for every right row even when the payload VALUE is
    * null, so ignoreNulls skips only the left rows' filler — a matched
    * right row with a genuinely-NULL payload yields NULL (DuckDB ASOF
    * semantics), not a stale older row's value.
    *
    * NULL timestamps match nothing: right rows with a NULL `tsCol` are
    * dropped (they are not "earliest", they are unordered), and a left
    * row with a NULL `tsCol` gets NULL payloads in every direction —
    * the three-valued-logic answer of the SQL comparisons a range
    * formulation would run.
    */
  def asOfDirectional(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      payload: Seq[String],
      direction: String = "backward",
      toleranceUs: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    require(!payload.contains(tsCol),
      "the timestamp column is carried implicitly; list payloads only")
    val leftCols = left.columns.toSeq
    // carry the matched right timestamp alongside the payloads — the
    // tolerance filter and the nearest selection both need it
    val pls = payload :+ tsCol
    def structType(p: String) =
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", right.schema(p).dataType)))
    val l = left
      .withColumn("__side", lit(1))
      .withColumns(pls.map(p =>
        s"__p_$p" -> lit(null).cast(structType(p))).toMap)
    val r = right
      .filter(col(tsCol).isNotNull) // unordered rows can never match
      .withColumn("__side", lit(0))
      .select((Seq(col(key), col(tsCol), col("__side")) ++
        pls.map(p => struct(col(p).as("v")).as(s"__p_$p")) ++
        leftCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val outCols = leftCols ++ Seq("__side") ++ pls.map(p => s"__p_$p")
    val unioned = l.select(outCols.map(col): _*)
      .unionByName(r.select(outCols.map(col): _*))
    def tieBreak(p: String): Column = {
      val c = col(s"__p_$p")
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(right.schema(p).dataType)) c
      else to_json(c)
    }
    // backward frame: right-at-equal-ts sorts BEFORE the left row (side
    // 0 < 1) so inclusive <= holds; forward frame flips the side order
    // so right-at-equal-ts lands AFTER the left row and inclusive >=
    // holds. Payloads order desc in the forward frame because first()
    // picks the head where last() picks the tail.
    val wb = Window.partitionBy(col(key))
      .orderBy((Seq(col(tsCol).asc, col("__side").asc) ++
        payload.map(tieBreak(_).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col(key))
      .orderBy((Seq(col(tsCol).asc, col("__side").desc) ++
        payload.map(tieBreak(_).desc)): _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val needBack = direction != "forward"
    val needFwd = direction != "backward"
    val carried = pls.foldLeft(unioned) { (df, p) =>
      val withB = if (needBack)
        df.withColumn(s"__b_$p",
          last(col(s"__p_$p"), ignoreNulls = true).over(wb).getField("v"))
      else df
      if (needFwd)
        withB.withColumn(s"__f_$p",
          first(col(s"__p_$p"), ignoreNulls = true).over(wf).getField("v"))
      else withB
    }
    def us(c: Column): Column = left.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast("timestamp"))
      case _ => c.cast("long")
    }
    val onLeft = carried.filter(col("__side") === 1)
    val backDist = us(col(tsCol)) - us(col(s"__b_$tsCol"))
    val fwdDist = us(col(s"__f_$tsCol")) - us(col(tsCol))
    // a NULL left timestamp matches nothing in EITHER direction (with
    // nulls-first ordering its forward frame would otherwise contain
    // the whole partition)
    val backOk = col(tsCol).isNotNull && toleranceUs
      .fold(col(s"__b_$tsCol").isNotNull)(t =>
        col(s"__b_$tsCol").isNotNull && backDist <= t)
    val fwdOk = col(tsCol).isNotNull && toleranceUs
      .fold(col(s"__f_$tsCol").isNotNull)(t =>
        col(s"__f_$tsCol").isNotNull && fwdDist <= t)
    val asofCols = payload.map { p =>
      val out = direction match {
        case "backward" => when(backOk, col(s"__b_$p"))
        case "forward"  => when(fwdOk, col(s"__f_$p"))
        case "nearest"  =>
          when(backOk && (!fwdOk || backDist <= fwdDist), col(s"__b_$p"))
            .otherwise(when(fwdOk, col(s"__f_$p")))
      }
      out.as(s"asof_$p")
    }
    onLeft.select((leftCols.map(col) ++ asofCols): _*)
  }
}
