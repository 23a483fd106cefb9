package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact evaluation metrics over integer counts — the family p104
  * (precision@k / MRR) started, extended with the rank statistics a
  * classifier stack reports. Everything here is an integer rational
  * both engines floor identically; no float sweep, no approximation.
  */
object Metrics {

  /** One-vs-rest Mann–Whitney AUC per label: for each distinct label L,
    * the probability that a random L-row scores above a random
    * non-L-row, ties counting ½ (midranks) — computed EXACTLY as
    * 2U = Σ_s n1(s)·(2·N0_below(s) + n0(s)) over the score dictionary.
    *
    * Scale shape: ONE partial-aggregable (score, label) count shuffle;
    * the label grid, per-label prefix sums and final fold are all
    * dictionary-sized (distinct scores x labels). The prefix window
    * partitions by label over that dictionary — the documented
    * dictionary-window class; a high-cardinality score domain would
    * swap in RankOps.prefixSumWithinKey unchanged. The 2U SUM itself
    * accumulates in DECIMAL(38,0) — per-row terms reach ~N² (past 2^63
    * at ~3e9 rows, where a long sum would wrap silently while the
    * oracle's HUGEINT keeps going) — and the ppm division stays in
    * DECIMAL(38,0), so neither the aggregate nor 2U·10⁶ can overflow
    * at any corpus size. Output: (label, n1, n0, auc_ppm), one row per
    * label with both classes non-empty.
    */
  def aucOneVsRest(df: DataFrame, score: Column, label: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = df.select(score.as("score"), label.as("lang"))
    val cnt = d.groupBy($"score", $"lang").agg(count(lit(1)).as("c"))
    val tot = d.groupBy($"score").agg(count(lit(1)).as("nt"))
    val labels = d.select($"lang").distinct()
    val grid = tot.crossJoin(broadcast(labels))
      .join(cnt, Seq("score", "lang"), "left")
      .select($"lang", $"score",
        coalesce($"c", lit(0L)).as("n1"),
        ($"nt" - coalesce($"c", lit(0L))).as("n0"))
    val w = Window.partitionBy($"lang").orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    grid
      .withColumn("n0b", coalesce(sum($"n0").over(w), lit(0L)))
      .groupBy($"lang")
      .agg(sum($"n1").as("n1"), sum($"n0").as("n0"),
        // cast ONE factor before the multiply so the product itself is
        // decimal — a long*long product wraps BEFORE any outer cast
        sum($"n1".cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
          (lit(2) * $"n0b" + $"n0")).as("u2"))
      .filter($"n1" > 0 && $"n0" > 0)
      .select($"lang".as("label"), $"n1", $"n0",
        expr("CAST(u2 AS DECIMAL(38,0)) * 1000000 DIV " +
          "(2 * CAST(n1 AS DECIMAL(38,0)) * n0)").as("auc_ppm"))
  }
}
