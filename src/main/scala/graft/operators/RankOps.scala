package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking primitives that never funnel a whole key into
  * one window task.
  *
  * `Window.partitionBy(key).orderBy(ord)` is the idiomatic per-key
  * rank, and it is the right plan when keys are plentiful and small —
  * but a corpus-scale key (one source holding 10^9 documents) becomes a
  * SINGLE window partition = a single task. [[rankWithinKey]] is the
  * scale path: the same exact rank, computed with the distributed-sort
  * discipline Spark itself uses for global sorts (range partition,
  * per-partition offsets, local finish).
  */
object RankOps {

  /** Exact per-key row_number (1-based, dense over rows, deterministic)
    * scalable to arbitrarily large keys.
    *
    * Mechanics — the zipWithIndex shape expressed declaratively:
    *  1. range-repartition by (key, order...): ties on the order prefix
    *     are split across partitions by the required unique tie-break
    *     column, so every partition is bounded at ~n/P rows even when
    *     one (key, value) pair dominates;
    *  2. per-(partition, key) counts — a partial-aggregated frame of at
    *     most P * |keys-crossing-partitions| rows;
    *  3. running offset per key over partition ids — a window over <= P
    *     rows per key;
    *  4. join offsets back and finish with a window INSIDE
    *     (partition, key) — bounded by the range partition size, never
    *     by key size.
    *
    * The rank VALUE is independent of the partitioning (offsets are
    * computed from actual counts), so results are deterministic even
    * though range bounds come from sampling.
    *
    * `order` columns must make rows unique within a key (pass the
    * primary key last) — the same contract as any deterministic rank.
    * Emits `rankCol` alongside the input columns.
    */
  def rankWithinKey(
      df: DataFrame,
      keyCol: String,
      order: Seq[Column],
      rankCol: String = "rank_in_key",
      numPartitions: Option[Int] = None): DataFrame = {
    val parts = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val ranged = df
      .repartitionByRange(parts, (col(keyCol) +: order): _*)
      .withColumn("__pid", spark_partition_id())
    val counts = ranged.groupBy(col("__pid"), col(keyCol))
      .agg(count(lit(1)).as("__n"))
    val offsetW = Window.partitionBy(col(keyCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("__off",
      coalesce(sum(col("__n")).over(offsetW), lit(0L)))
      .drop("__n")
    val localW = Window.partitionBy(col("__pid"), col(keyCol))
      .orderBy(order: _*)
    ranged.join(offsets, Seq("__pid", keyCol))
      .withColumn(rankCol, col("__off") + row_number().over(localW))
      .drop("__pid", "__off")
  }

  /** Exact INCLUSIVE prefix sum of `value` over the global `order` —
    * the bounded replacement for `sum(v).over(Window.orderBy(...))`,
    * which moves ALL rows into one task. A cents or token-length
    * dictionary is "dictionary-sized" only at fixture scale; at 100x it
    * is 10^6-10^7 rows, survivable in one task but the wrong plan. This
    * is the same three-level shape as [[rankWithinKey]] without a key:
    *
    *  1. range-repartition by `order` (bounded ~n/P rows per task);
    *  2. per-partition value totals (P rows);
    *  3. exclusive running offset per partition id — a triangular
    *     self-join over the P-row totals (P^2 pairs, P = shuffle
    *     parallelism), deliberately NOT a global window so the plan
    *     carries no single-partition WindowExec at all;
    *  4. broadcast offsets back; finish with a window INSIDE each
    *     range partition.
    *
    * The sum is partitioning-independent (offsets come from actual
    * totals), so the result is deterministic even though range bounds
    * come from sampling — required for oracle-gated queries. `order`
    * must be unique per row (a dictionary's value column is); `value`
    * must be integral/decimal (float addition would be association-
    * order dependent, breaking exactness across layouts).
    */
  def prefixSum(
      df: DataFrame,
      order: Seq[Column],
      value: Column,
      outCol: String,
      numPartitions: Option[Int] = None): DataFrame = {
    val parts = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val ranged = df
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val totals = ranged.groupBy(col("__pid")).agg(sum(value).as("__n"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__n")), lit(0L)).as("__off"))
    val localW = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__off") + sum(value).over(localW))
      .drop("__pid", "__off")
  }
}
