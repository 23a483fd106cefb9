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

  /** Range-partition `df` by `exprs`, stamp the physical partition id,
    * and MATERIALIZE the result before anyone consumes it twice.
    *
    * The materialization is load-bearing, not a cache hint. Every
    * operator below reads the stamped frame from two subtrees (the
    * per-partition totals and the final join-back), and the stamped pid
    * is only meaningful if both subtrees see the SAME range bounds.
    * Spark samples range-exchange bounds with a seed derived from the
    * exchange's RDD id, so two physical instantiations of "the same"
    * repartitionByRange draw DIFFERENT bounds; normally ReuseExchange
    * collapses them into one, but that is an optimization, not a
    * contract — it demonstrably fails to fire over e.g. an
    * InMemoryTableScan input, and then per-partition offsets computed
    * under one set of bounds are joined onto rows bucketed under
    * another (observed: cumulative sums smaller than the row count).
    * Persisting the stamped frame and forcing it with one count() pins
    * membership: later consumers read cached blocks, and a block lost
    * to eviction recomputes from the SAME materialized shuffle output,
    * so pid assignment stays frozen. One extra pass over the operator's
    * working set — the price of making consistency structural instead
    * of reuse-dependent.
    */
  private def rangedWithPid(df: DataFrame, parts: Int,
      exprs: Seq[Column]): DataFrame = {
    val ranged = df.repartitionByRange(parts, exprs: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    ranged.count()
    ranged
  }

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
    val ranged = rangedWithPid(df, parts, col(keyCol) +: order)
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
    val ranged = rangedWithPid(df, parts, order)
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

  /** [[prefixSum]] with a grouping key — exact inclusive per-key prefix
    * sum of `value` over `order`, scalable to arbitrarily large keys
    * (the [[rankWithinKey]] three-level shape, summing a value column
    * instead of counting rows). The per-key offset window runs over at
    * most P rows per key (P = shuffle parallelism), and the local
    * finish window is bounded by the range partition size — no task
    * ever holds a whole key. `value` must be integral/decimal (float
    * addition is association-order dependent); `order` must be unique
    * per (key, row).
    */
  def prefixSumWithinKey(
      df: DataFrame,
      keyCols: Seq[String],
      order: Seq[Column],
      value: Column,
      outCol: String,
      numPartitions: Option[Int] = None): DataFrame = {
    val parts = numPartitions.getOrElse(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
    val keys = keyCols.map(col)
    val ranged = rangedWithPid(df, parts, keys ++ order)
    val counts = ranged.groupBy((col("__pid") +: keys): _*)
      .agg(sum(value).as("__n"))
    val offsetW = Window.partitionBy(keys: _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts.withColumn("__off",
      coalesce(sum(col("__n")).over(offsetW), lit(0L)))
      .drop("__n")
    val localW = Window.partitionBy((col("__pid") +: keys): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(offsets, "__pid" +: keyCols)
      .withColumn(outCol, col("__off") + sum(value).over(localW))
      .drop("__pid", "__off")
  }

  /** Exact interpolated quantiles — `percentile` / `quantile_cont`
    * semantics — computed from the VALUE DICTIONARY with bounded-task
    * rank arithmetic. Spark's exact `percentile` aggregator buffers
    * every value of a group inside ONE aggregation buffer (per-group
    * memory grows with group size — an executor OOM at 100 TB); this
    * shape aggregates the input to a (key, value, count) dictionary,
    * prefix-sums the counts with the three-level discipline, and joins
    * the two bracketing ranks per requested p. Interpolation applies
    * the same formula Spark's aggregator evaluates — for
    * position = p * (n-1), lower = floor, higher = ceil:
    * (higher - position) * v_lo + (position - lower) * v_hi — pinned
    * bitwise-equal to the aggregator by ExactQuantilesSpec, so swaps
    * are invisible to an oracle that uses quantile_cont.
    *
    * Small-dictionary fast path: the three-level rank arithmetic costs
    * ~6 stages of fixed latency, which dominates at fixture scale
    * (seconds for a 100-row dictionary). When the deduplicated
    * (keys, value) dictionary holds at most `smallDictLimit` rows, the
    * quantiles come instead from ONE `percentile(value, ps, count)`
    * aggregation over that dictionary — the aggregator buffers only
    * dictionary rows (bounded by the limit, not by group size), so the
    * 100 TB OOM class this operator exists to remove stays removed.
    * ExactQuantilesSpec pins the two paths bitwise-equal at the
    * threshold boundary; picking the path costs one count() job over
    * the persisted dictionary.
    *
    * Returns one row per (keys..., p): (keys..., "p", outCol) with
    * outCol double. NULL values are ignored, like the aggregator.
    * NULL GROUPING KEYS ARE DROPPED (explicitly, on both paths): the
    * rank path's equality joins cannot carry them, so the contract is
    * enforced up front rather than diverging between paths. This
    * differs from Spark's aggregator, which emits a NULL-keyed row —
    * callers needing that row must coalesce keys first. An all-NULL
    * value group likewise emits no row (the aggregator emits NULL).
    */
  def exactQuantiles(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: Column,
      ps: Seq[Double],
      outCol: String = "q",
      smallDictLimit: Long = 65536L): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile targets must sit in [0, 1]: $ps")
    val keyed = keyCols.nonEmpty
    // keyless inputs ride a constant key: every window below then
    // carries a partition spec (bounded by P or the range partition),
    // and one code path serves both shapes
    val keys = if (keyed) keyCols else Seq("__k")
    val base = df.filter(valueCol.isNotNull &&
        (if (keyed) keyCols.map(col(_).isNotNull).reduce(_ && _)
         else lit(true)))
      .select(
        (if (keyed) keyCols.map(col) else Seq(lit(0L).as("__k"))) :+
          valueCol.as("__v"): _*)
    val dict = base.groupBy((keys.map(col) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__c"))
      .persist() // consumers: the path-choosing count + either path
    if (dict.count() <= smallDictLimit) {
      // Double.toString round-trips exactly (shortest-repr contract),
      // so the SQL literal re-parses to the identical double
      val psSql = ps.map(_.toString).mkString(", ")
      val agg = dict.groupBy(keys.map(col): _*)
        .agg(expr(s"percentile(__v, array($psSql), __c)").as("__qs"))
        .select((keys.map(col) :+
          posexplode(col("__qs")).as(Seq("__i", outCol))): _*)
        .withColumn("p", typedLit(ps).getItem(col("__i")))
      return agg.select(((if (keyed) keyCols.map(col) else Nil) :+
        col("p") :+ col(outCol)): _*)
    }
    val cum = prefixSumWithinKey(dict, keys, Seq(col("__v")), col("__c"),
        "__cum")
      .persist() // three consumers: totals + both bracket lookups
    val totals = cum.groupBy(keys.map(col): _*).agg(max(col("__cum")).as("__n"))
    val pFrame = totals
      .select((keys.map(col) :+ col("__n") :+
        explode(typedLit(ps)).as("__p")): _*)
      .withColumn("__pos", col("__p") * (col("__n") - 1).cast("double"))
      .withColumn("__lo", floor(col("__pos")).cast("long"))
      .withColumn("__hi", ceil(col("__pos")).cast("long"))
    // the dictionary row holding rank r is the one whose inclusive
    // cumulative count first reaches it: cum - c < r <= cum
    def bracket(rank: Column, as: String) =
      cum.as("d").join(broadcast(pFrame.as("r")),
        keys.map(k => col(s"d.$k") === col(s"r.$k")).reduce(_ && _) &&
          (col("d.__cum") - col("d.__c") < rank + 1) &&
          (rank + 1 <= col("d.__cum")))
        .select((keys.map(k => col(s"r.$k").as(k)) ++ Seq(
          col("r.__p").as("__p"), col("r.__pos").as("__pos"),
          col("r.__lo").as("__lo"), col("r.__hi").as("__hi"),
          col("d.__v").cast("double").as(s"__$as"))): _*)
    val lo = bracket(col("r.__lo"), "vlo")
    val hi = bracket(col("r.__hi"), "vhi")
      .select((keys.map(col) :+ col("__p") :+ col("__vhi")): _*)
    val out = lo.join(hi, keys :+ "__p")
      .withColumn(outCol,
        when(col("__lo") === col("__hi"), col("__vlo"))
          .otherwise(
            (col("__hi").cast("double") - col("__pos")) * col("__vlo") +
              (col("__pos") - col("__lo").cast("double")) * col("__vhi")))
    out.select(((if (keyed) keyCols.map(col) else Nil) :+
      col("__p").as("p") :+ col(outCol)): _*)
  }
}
