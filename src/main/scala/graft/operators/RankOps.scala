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
}
