package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Third relational batch: scalar/correlated subqueries, LIKE/IN
  * predicates, ordered string aggregation.
  */
object Relational3 {
  import Tables.t

  private val D18 = DecimalType(18, 2)

  /** SQL-surface queries keep ONE text: the engine runs it via s.sql and
    * the oracle replays the identical string in DuckDB, so the two can
    * never de-synchronize; q36 reuses q29's text as its oracle, which is
    * exactly its equivalence claim.
    */
  private val q27Sql = """SELECT c_nationkey, COUNT(*) AS n_rich,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM customer
             |WHERE CAST(c_acctbal AS DECIMAL(18,2)) >
             |  (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,10))
             |     / COUNT(*) FROM customer)
             |GROUP BY c_nationkey
             |ORDER BY c_nationkey""".stripMargin

  private val q29Sql = """SELECT s_name, COUNT(*) AS n_waiting
             |FROM supplier
             |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
             |JOIN orders ON o_orderkey = l1.l_orderkey
             |WHERE o_orderstatus = 'F'
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > l1.l_shipdate)
             |GROUP BY s_name
             |ORDER BY n_waiting DESC, s_name""".stripMargin

  def defs: Seq[QueryDef] = Seq(

    // ---- q27: scalar subquery (global aggregate as predicate) ------------
    QueryDef(
      "q27_scalar_subquery",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(q27Sql)
      },
      Some(q27Sql)),

    // ---- q28: LIKE / IN predicate pushdown -------------------------------
    QueryDef(
      "q28_like_in_filters",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .filter($"p_type".like("%ECO%") &&
            !$"p_name".like("%bolt%") &&
            $"p_brand".isin("Brand#13", "Brand#19", "Brand#5"))
          .groupBy($"p_brand")
          .agg(count(lit(1)).as("n"), max($"p_size").as("max_size"))
          .orderBy($"p_brand")
      },
      Some("""SELECT p_brand, COUNT(*) AS n, MAX(p_size) AS max_size
             |FROM part
             |WHERE p_type LIKE '%ECO%' AND p_name NOT LIKE '%bolt%'
             |  AND p_brand IN ('Brand#13', 'Brand#19', 'Brand#5')
             |GROUP BY p_brand
             |ORDER BY p_brand""".stripMargin)),

    // ---- q29: double correlated EXISTS / NOT EXISTS (TPC-H Q21 shape) ----
    QueryDef(
      "q29_multi_exists",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql(q29Sql)
      },
      Some(q29Sql)),

    // ---- q36: q29's semantics re-planned by hand -------------------------
    // Catalyst decorrelates the double EXISTS into three full lineitem
    // scans with three lineitem-wide shuffles; this version shuffles the
    // three needed lineitem columns ONCE (repartition by orderkey) and
    // answers both subqueries with window functions at raw-row grain:
    // HashPartitioning(o) satisfies both the (o) and (o,s) window
    // families, so the second family only re-sorts in place. No
    // pre-aggregation — (order, supplier, date) is nearly unique in
    // lineitem, so a groupBy would pay a full extra exchange to remove
    // almost nothing. The oracle SQL is q29's verbatim, so the hash gate
    // proves the rewrite equivalent.
    QueryDef(
      "q36_multi_exists_window",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        // ALL lineitem — the subqueries are not restricted to F orders
        val li = t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
          .repartition($"l_orderkey")
        val wOS = Window.partitionBy($"l_orderkey", $"l_suppkey")
        val wO = Window.partitionBy($"l_orderkey")
        val qualified = li
          // this supplier's latest ship date in the order
          .withColumn("s_max", max($"l_shipdate").over(wOS))
          // order-level: latest supplier max, #distinct suppliers, how
          // many suppliers attain the max, and the runner-up max
          .withColumn("top1", max($"s_max").over(wO))
          .withColumn("n_supp", size(collect_set($"l_suppkey").over(wO)))
          .withColumn("n_top1", size(collect_set(
            when($"s_max" === $"top1", $"l_suppkey")).over(wO)))
          .withColumn("top2",
            max(when($"s_max" =!= $"top1", $"s_max")).over(wO))
          // latest ship date among OTHER suppliers of this order
          .withColumn("other_max",
            when($"s_max" =!= $"top1" || $"n_top1" > 1, $"top1")
              .otherwise($"top2"))
          .filter($"n_supp" > 1 && // EXISTS other supplier
            $"l_shipdate" >= $"other_max") // NOT EXISTS a later one
        val ordF = t(s, dir, "orders").filter($"o_orderstatus" === "F")
          .select($"o_orderkey")
        val supp = t(s, dir, "supplier")
        // no broadcast hint on ordF: it is fact-derived and would not
        // broadcast at 100x scale; AQE picks broadcast when it fits
        qualified.join(ordF, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_name")
          .agg(count(lit(1)).as("n_waiting"))
          .orderBy($"n_waiting".desc, $"s_name")
      },
      Some(q29Sql)),

    // ---- q31: ranking-function breadth (ntile, percent_rank, cume_dist,
    //           dense_rank) + range frame ----------------------------------
    QueryDef(
      "q31_ranking_functions",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"c_mktsegment")
          .orderBy($"c_acctbal", $"c_custkey")
        t(s, dir, "customer")
          .select(
            $"c_custkey", $"c_mktsegment",
            ntile(4).over(w).as("quartile"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            dense_rank().over(w).as("drank"))
          .orderBy($"c_mktsegment", $"c_custkey")
      },
      Some("""SELECT c_custkey, c_mktsegment,
             |  ntile(4) OVER w AS quartile,
             |  percent_rank() OVER w AS pct_rank,
             |  cume_dist() OVER w AS cume,
             |  dense_rank() OVER w AS drank
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
             |ORDER BY c_mktsegment, c_custkey""".stripMargin)),

    // ---- q32: band (range) join via bucket expansion ---------------------
    QueryDef(
      "q32_band_join",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"ts")
        val clicks = ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_id"))
        graft.operators.RangeJoin.bandJoin(purchases, clicks,
            "user_id", "ts", windowMicros = 4L * 3600 * 1000000)
          .groupBy($"event_id")
          .agg(count(lit(1)).as("n_clicks_4h"))
          .orderBy($"event_id")
      },
      Some("""SELECT p.event_id, COUNT(*) AS n_clicks_4h
             |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             | AND epoch_us(c.ts) >= epoch_us(p.ts)
             | AND epoch_us(c.ts) < epoch_us(p.ts) + 14400000000
             |GROUP BY p.event_id
             |ORDER BY p.event_id""".stripMargin)),

    // ---- q33: batch sessionization (gap-based, window composition) -------
    // the SQL twin of graft.streaming.EventStreams.sessionize; consistency
    // between the two is asserted in EventStreamsSpec
    QueryDef(
      "q33_sessionization",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val gapUs = 30L * 60 * 1000000
        t(s, dir, "events")
          .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
          .withColumn("new_s",
            when($"prev_us".isNull ||
              unix_micros($"ts") - $"prev_us" > gapUs, 1).otherwise(0))
          .withColumn("session_id",
            sum($"new_s").over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy($"user_id", $"session_id")
          .agg(
            count(lit(1)).as("n_events"),
            (max(unix_micros($"ts")) - min(unix_micros($"ts")))
              .as("duration_us"),
            sum($"value".cast(D18)).cast("double").as("session_value"))
          .orderBy($"user_id", $"session_id")
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id, value,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (
             |  SELECT user_id, ts, value,
             |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM g)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  COUNT(*) AS n_events,
             |  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
             |FROM s
             |GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // ---- q34: approximate distinct (HLL++) --------------------------------
    // HLL++ register values are engine-specific, so the raw estimates
    // can't hash-match DuckDB — but the EXACT companions and the error
    // BOUNDS can: the output carries exact counts plus booleans pinning
    // the estimates inside their configured rsd envelopes (5x headroom:
    // default rsd 5% -> 10% gate, rsd 1% -> 5% gate), and the oracle
    // asserts those booleans as literal TRUE over DuckDB's exact counts.
    // Tighter point-accuracy is additionally gated in RelationalSpec.
    QueryDef(
      "q34_approx_distinct",
      (s, dir) => {
        import s.implicits._
        // SEPARATE aggregation passes joined on the 3-row group key:
        // mixing two countDistincts with two HLL sketches in ONE agg
        // makes Catalyst Expand-multiply the fact table per distinct
        // group and drags the HLL buffers through it (measured 46s vs
        // ~1s per pass at sf0.1) — and at 100 TB the Expand is a
        // fact-table x3 shuffle. Exact counts use the two-level
        // distinct-then-count shape (map-side dedup, no Expand).
        val li = t(s, dir, "lineitem")
        def exactDistinct(c: String, as: String) =
          li.select($"l_returnflag", col(c)).distinct()
            .groupBy($"l_returnflag").agg(count(lit(1)).as(as))
        val approx = li.groupBy($"l_returnflag").agg(
          approx_count_distinct($"l_partkey").as("ap"),
          approx_count_distinct($"l_orderkey", 0.01).as("ao"))
        exactDistinct("l_partkey", "exact_parts")
          .join(exactDistinct("l_orderkey", "exact_orders"), Seq("l_returnflag"))
          .join(approx, Seq("l_returnflag"))
          .select($"l_returnflag", $"exact_parts", $"exact_orders",
            (abs($"ap" - $"exact_parts").cast("double") /
              $"exact_parts" <= 0.10).as("approx_parts_ok"),
            (abs($"ao" - $"exact_orders").cast("double") /
              $"exact_orders" <= 0.05).as("approx_orders_ok"))
          .orderBy($"l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  COUNT(DISTINCT l_partkey) AS exact_parts,
             |  COUNT(DISTINCT l_orderkey) AS exact_orders,
             |  TRUE AS approx_parts_ok,
             |  TRUE AS approx_orders_ok
             |FROM lineitem
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---- q35: multiset set operations (ALL variants) ----------------------
    QueryDef(
      "q35_set_ops_all",
      (s, dir) => {
        import s.implicits._
        val a = t(s, dir, "lineitem").select($"l_partkey".as("k"))
        val b = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
          .select($"l_partkey".as("k"))
        val ex = a.exceptAll(b).groupBy($"k").agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except_all"))
        val in = a.intersectAll(b).groupBy($"k").agg(count(lit(1)).as("n"))
          .withColumn("op", lit("intersect_all"))
        ex.union(in).select($"op", $"k", $"n").orderBy($"op", $"k")
      },
      Some("""WITH a AS (SELECT l_partkey AS k FROM lineitem),
             |     b AS (SELECT l_partkey AS k FROM lineitem WHERE l_returnflag = 'R')
             |SELECT 'except_all' AS op, k, COUNT(*) AS n
             |FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
             |UNION ALL
             |SELECT 'intersect_all' AS op, k, COUNT(*) AS n
             |FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
             |ORDER BY op, k""".stripMargin)),

    // ---- q30: ordered string aggregation ---------------------------------
    QueryDef(
      "q30_string_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")),
            $"n_regionkey" === $"r_regionkey")
          .groupBy($"r_name")
          .agg(
            array_join(sort_array(collect_list($"n_name")), ",").as("nations"),
            count(lit(1)).as("n"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |  COUNT(*) AS n
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name
             |ORDER BY r_name""".stripMargin))
  )
}
