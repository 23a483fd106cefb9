package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Aggregators
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second relational batch: pivot/unpivot, exact percentiles, custom
  * typed UDAF, metadata columns.
  */
object Relational2 {
  import Tables.t

  private val D18 = DecimalType(18, 2)

  def defs: Seq[QueryDef] = Seq(

    // ---- q21: custom typed Aggregator (UDAF surface) ---------------------
    QueryDef(
      "q21_custom_udaf",
      (s, dir) => {
        import s.implicits._
        val exactMean = udaf(new Aggregators.ExactMeanCents)
        val rangeAgg = udaf(new Aggregators.RangeAgg)
        t(s, dir, "lineitem")
          .withColumn("cents",
            (col("l_extendedprice").cast(D18) * 100).cast("bigint"))
          .groupBy($"l_returnflag")
          .agg(
            exactMean($"cents").as("mean_price"),
            rangeAgg($"l_quantity").as("qty_range"),
            count(lit(1)).as("n"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS DOUBLE)
             |    / (100.0 * COUNT(*)) AS mean_price,
             |  MAX(l_quantity) - MIN(l_quantity) AS qty_range,
             |  COUNT(*) AS n
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- q22: pivot --------------------------------------------------------
    QueryDef(
      "q22_pivot",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ---- q23: unpivot (wide -> long) --------------------------------------
    QueryDef(
      "q23_unpivot",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_returnflag")
          .agg(
            sum($"l_quantity").as("qty"),
            sum($"l_discount".cast(D18)).cast("double").as("disc"),
            sum($"l_tax".cast(D18)).cast("double").as("tax"))
          .unpivot(Array($"l_returnflag"), Array($"qty", $"disc", $"tax"),
            "measure", "value")
          .orderBy($"l_returnflag", $"measure")
      },
      Some("""WITH w AS (SELECT l_returnflag,
             |    SUM(l_quantity) AS qty,
             |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS disc,
             |    CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, 'qty' AS measure, qty AS value FROM w
             |UNION ALL SELECT l_returnflag, 'disc', disc FROM w
             |UNION ALL SELECT l_returnflag, 'tax', tax FROM w
             |ORDER BY l_returnflag, measure""".stripMargin)),

    // ---- q24: exact percentiles -------------------------------------------
    QueryDef(
      // Exact grouped percentiles via RankOps.exactQuantiles: the
      // (key, value, count) dictionary + bounded prefix sum, NOT the
      // `percentile` aggregator, whose collect-all buffer grows with
      // group size (an executor OOM at 100 TB). ExactQuantilesSpec
      // pins the swap bitwise-equal to the aggregator, so the
      // quantile_cont oracle is untouched.
      "q24_percentiles",
      (s, dir) => {
        import s.implicits._
        val q = graft.operators.RankOps.exactQuantiles(
          t(s, dir, "lineitem"), Seq("l_returnflag"), $"l_quantity",
          Seq(0.25, 0.5, 0.9))
        q.groupBy($"l_returnflag")
          .agg(
            max(when($"p" === 0.5, $"q")).as("median_qty"),
            max(when($"p" === 0.9, $"q")).as("p90_qty"),
            max(when($"p" === 0.25, $"q")).as("p25_qty"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.5) AS median_qty,
             |  quantile_cont(l_quantity, 0.9) AS p90_qty,
             |  quantile_cont(l_quantity, 0.25) AS p25_qty
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- q26: as-of join (composed operator; oracle = DuckDB ASOF JOIN) --
    QueryDef(
      "q26_asof_join",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"ts", $"user_id")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"))
        graft.operators.AsOfJoin.asOf(purchases, clicks, "user_id", "ts",
            Seq("click_id"))
          .select($"event_id", $"user_id", $"asof_click_id",
            (unix_micros($"ts")).as("ts_us"))
          .orderBy($"event_id")
      },
      Some("""WITH p AS (SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, c.click_id AS asof_click_id,
             |       epoch_us(p.ts) AS ts_us
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |ORDER BY p.event_id""".stripMargin)),

    // ---- q25: metadata columns (SURVEY §2.2 "metadata columns") ----------
    QueryDef(
      "q25_metadata",
      (s, dir) => {
        import s.implicits._
        // project the stable BASENAME (the absolute path is engine-local)
        // so the metadata surface is hash-proven: the name pins which
        // file each row came from, n_rows pins the grouping, and the
        // size predicate pins that file_size was actually read
        t(s, dir, "lineitem")
          .select(
            element_at(split($"_metadata.file_path", "/"), -1).as("file_name"),
            $"_metadata.file_size".as("file_size"))
          .groupBy($"file_name", $"file_size")
          .agg(count(lit(1)).as("n_rows"))
          .select($"file_name", ($"file_size" > 0).as("size_positive"), $"n_rows")
          .orderBy($"file_name")
      },
      Some("""SELECT 'lineitem.parquet' AS file_name,
             |  TRUE AS size_positive,
             |  COUNT(*) AS n_rows
             |FROM lineitem""".stripMargin))
  )
}
