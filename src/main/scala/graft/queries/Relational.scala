package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage over the driver's TPC-H-ish tables.
  *
  * Design notes for DuckDB-oracle hash parity:
  *   - All money arithmetic is done in DECIMAL (exact, order-independent)
  *     and cast to DOUBLE only at the very end, mirrored in the oracle SQL.
  *     Summing doubles directly would be partition-order dependent.
  *   - Every query ends in a fully deterministic ORDER BY (unique tie-break).
  *   - Every computed column is aliased identically in Spark and SQL.
  *
  * At 100 TB these plans rely on: parquet filter/column pushdown, partial
  * aggregation (map-side combine, automatic for all hash aggs here),
  * broadcast joins for the dimension tables (region/nation/customer/
  * supplier/part are tiny relative to fact tables), and AQE for runtime
  * shuffle-partition coalescing + skew handling.
  */
object Relational {
  import Tables.t

  private val D18 = DecimalType(18, 2)
  /** Exact decimal view of a money/ratio column. */
  private def dec(c: Column): Column = c.cast(D18)
  /** SUM in exact decimal, surfaced as double (order-independent). */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  def defs: Seq[QueryDef] = Seq(
    // ---- q01: scan + filter + hash aggregate (TPC-H Q1 pattern) ----------
    QueryDef(
      "q01_pricing_summary",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" <= lit("2000-06-30").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            sum($"l_quantity").as("sum_qty"),
            dsum($"l_extendedprice").as("sum_base_price"),
            sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
              .cast("double").as("sum_disc_price"),
            sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount"))
              * (lit(1) + dec($"l_tax"))).cast("double").as("sum_charge"),
            (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  SUM(l_quantity) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
             |  SUM(l_quantity) / COUNT(*) AS avg_qty,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-06-30'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- q06: tight filter + single-row aggregate (TPC-H Q6 pattern) -----
    QueryDef(
      "q06_forecast_revenue",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1998-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1999-01-01").cast("timestamp") &&
            dec($"l_discount").between(BigDecimal("0.05"), BigDecimal("0.07")) &&
            $"l_quantity" < 24)
          .agg(sum(dec($"l_extendedprice") * dec($"l_discount"))
            .cast("double").as("revenue"))
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
             |  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // ---- q03: broadcast dim join + shuffle fact join + top-k -------------
    QueryDef(
      "q03_topk_revenue",
      (s, dir) => {
        import s.implicits._
        val cust = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
        val ord = t(s, dir, "orders")
          .filter($"o_orderdate" < lit("2000-01-01").cast("timestamp"))
        val li = t(s, dir, "lineitem")
          .filter($"l_shipdate" > lit("1998-06-30").cast("timestamp"))
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .groupBy($"o_orderkey", $"o_orderdate")
          .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"o_orderkey")
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_orderdate,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '2000-01-01'
             |  AND l_shipdate > TIMESTAMP '1998-06-30'
             |GROUP BY o_orderkey, o_orderdate
             |ORDER BY revenue DESC, o_orderkey
             |LIMIT 10""".stripMargin)),

    // ---- q04: semi join (EXISTS) with non-equi conjunct ------------------
    QueryDef(
      "q04_order_priority",
      (s, dir) => {
        import s.implicits._
        val ord = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        ord.join(li, $"o_orderkey" === $"l_orderkey" &&
            $"l_shipdate" > $"o_orderdate", "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ---- q05: 6-table join chain, dims broadcast (TPC-H Q5 pattern) ------
    QueryDef(
      "q05_nation_revenue",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val ord = t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("2000-01-01").cast("timestamp"))
        val cust = t(s, dir, "customer")
        val supp = t(s, dir, "supplier")
        val nat = t(s, dir, "nation")
        val reg = t(s, dir, "region").filter($"r_name" === "ASIA")
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .join(broadcast(supp), $"l_suppkey" === $"s_suppkey" &&
            $"c_nationkey" === $"s_nationkey")
          .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double").as("revenue"))
          .orderBy($"revenue".desc, $"n_name")
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '2000-01-01'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    // ---- q07: anti join (NOT EXISTS) ------------------------------------
    QueryDef(
      "q07_customers_without_orders",
      (s, dir) => {
        import s.implicits._
        val cust = t(s, dir, "customer")
        val ord = t(s, dir, "orders").filter($"o_totalprice" > 300000)
        val nat = t(s, dir, "nation")
        cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
          .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(count(lit(1)).as("n_lonely"),
            dsum($"c_acctbal").as("total_bal"))
          .orderBy($"n_name")
      },
      Some("""SELECT n_name, COUNT(*) AS n_lonely,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    // ---- q08: window rank, top-3 per group -------------------------------
    QueryDef(
      "q08_top_customers_per_nation",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"c_nationkey")
          .orderBy($"c_acctbal".desc, $"c_custkey")
        t(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" <= 3)
          .select($"c_nationkey", $"c_custkey", $"c_acctbal", $"rn")
          .orderBy($"c_nationkey", $"rn")
      },
      Some("""SELECT c_nationkey, c_custkey, c_acctbal, rn
             |FROM (SELECT c_nationkey, c_custkey, c_acctbal,
             |        row_number() OVER (PARTITION BY c_nationkey
             |                           ORDER BY c_acctbal DESC, c_custkey) AS rn
             |      FROM customer)
             |WHERE rn <= 3
             |ORDER BY c_nationkey, rn""".stripMargin)),

    // ---- q09: running window aggregate + lag over event stream ----------
    QueryDef(
      "q09_running_user_spend",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        t(s, dir, "events")
          .withColumn("running_value",
            sum(dec($"value")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double"))
          .withColumn("prev_type", lag($"event_type", 1).over(w))
          .withColumn("rn", row_number().over(w))
          .select($"event_id", $"user_id", $"running_value", $"prev_type", $"rn")
          .orderBy($"user_id", $"rn")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
             |  lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |FROM events
             |ORDER BY user_id, rn""".stripMargin)),

    // ---- q10: distinct aggregate ----------------------------------------
    QueryDef(
      "q10_segment_reach",
      (s, dir) => {
        import s.implicits._
        val ord = t(s, dir, "orders")
        val cust = t(s, dir, "customer")
        ord.join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment")
          .agg(
            countDistinct($"o_custkey").as("n_cust"),
            count(lit(1)).as("n_orders"),
            dsum($"o_totalprice").as("total_spend"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  COUNT(DISTINCT o_custkey) AS n_cust,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin)),

    // ---- q11: rollup ------------------------------------------------------
    QueryDef(
      "q11_rollup_balance",
      (s, dir) => {
        import s.implicits._
        val cust = t(s, dir, "customer")
        val nat = t(s, dir, "nation")
        cust.join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
          .rollup($"n_name", $"c_mktsegment")
          .agg(count(lit(1)).as("n"), dsum($"c_acctbal").as("total_bal"))
          .select(
            coalesce($"n_name", lit("ALL")).as("nation"),
            coalesce($"c_mktsegment", lit("ALL")).as("segment"),
            $"n", $"total_bal")
          .orderBy($"nation", $"segment")
      },
      Some("""SELECT coalesce(n_name, 'ALL') AS nation,
             |  coalesce(c_mktsegment, 'ALL') AS segment,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, c_mktsegment)
             |ORDER BY nation, segment""".stripMargin)),

    // ---- q12: cube --------------------------------------------------------
    QueryDef(
      "q12_cube_orders",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
          .select(
            coalesce($"o_orderstatus", lit("ALL")).as("status"),
            coalesce($"o_orderpriority", lit("ALL")).as("priority"),
            $"n", $"total")
          .orderBy($"status", $"priority")
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(o_orderpriority, 'ALL') AS priority,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |FROM orders
             |GROUP BY CUBE(o_orderstatus, o_orderpriority)
             |ORDER BY status, priority""".stripMargin)),

    // ---- q13: set operations ---------------------------------------------
    QueryDef(
      "q13_set_ops",
      (s, dir) => {
        import s.implicits._
        val rich = t(s, dir, "customer").filter($"c_acctbal" > 5000)
          .select($"c_custkey".as("k"))
        val big = t(s, dir, "orders").filter($"o_totalprice" > 200000)
          .select($"o_custkey".as("k"))
        val both = rich.intersect(big).withColumn("op", lit("intersect"))
        val onlyRich = rich.except(big).withColumn("op", lit("except"))
        val all = rich.union(big).distinct().withColumn("op", lit("union"))
        both.union(onlyRich).union(all)
          .select($"op", $"k")
          .orderBy($"op", $"k")
      },
      Some("""WITH rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
             |     big AS (SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000)
             |SELECT 'intersect' AS op, k FROM (SELECT k FROM rich INTERSECT SELECT k FROM big)
             |UNION ALL
             |SELECT 'except' AS op, k FROM (SELECT k FROM rich EXCEPT SELECT k FROM big)
             |UNION ALL
             |SELECT 'union' AS op, k FROM (SELECT k FROM rich UNION SELECT k FROM big)
             |ORDER BY op, k""".stripMargin)),

    // ---- q14: scalar function surface (string/math) ----------------------
    QueryDef(
      "q14_scalar_functions",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part").select(
            $"p_partkey",
            upper($"p_name").as("name_up"),
            lower($"p_brand").as("brand_lo"),
            length($"p_name").as("name_len"),
            substring($"p_type", 1, 3).as("type_pfx"),
            concat($"p_brand", lit("-"), $"p_type").as("brand_type"),
            regexp_replace($"p_name", "widget", "gadget").as("renamed"),
            reverse($"p_name").as("name_rev"),
            ($"p_size" % 5).as("size_mod"),
            abs($"p_size" - 25).as("size_dist"),
            sqrt($"p_size".cast("double")).as("size_sqrt"),
            greatest($"p_size", lit(10)).as("size_floor10"),
            (dec($"p_retailprice") * lit(BigDecimal("1.10")))
              .cast("double").as("price_with_tax"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  upper(p_name) AS name_up,
             |  lower(p_brand) AS brand_lo,
             |  length(p_name) AS name_len,
             |  substring(p_type, 1, 3) AS type_pfx,
             |  concat(p_brand, '-', p_type) AS brand_type,
             |  regexp_replace(p_name, 'widget', 'gadget', 'g') AS renamed,
             |  reverse(p_name) AS name_rev,
             |  p_size % 5 AS size_mod,
             |  abs(p_size - 25) AS size_dist,
             |  sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
             |  greatest(p_size, 10) AS size_floor10,
             |  CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(1.10 AS DECIMAL(18,2)) AS DOUBLE) AS price_with_tax
             |FROM part
             |ORDER BY p_partkey""".stripMargin)),

    // ---- q15: json extraction over event props ---------------------------
    QueryDef(
      "q15_json_props",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "events")
          .withColumn("k_val",
            get_json_object($"props", "$.k").cast("int"))
          .groupBy($"event_type")
          .agg(
            count(lit(1)).as("n"),
            sum($"k_val").as("sum_k"),
            min($"k_val").as("min_k"),
            max($"k_val").as("max_k"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
             |  CAST(SUM(k_val) AS BIGINT) AS sum_k, MIN(k_val) AS min_k, MAX(k_val) AS max_k
             |FROM (SELECT event_type,
             |        CAST(json_extract_string(props, '$.k') AS INT) AS k_val
             |      FROM events)
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ---- q16: having clause ----------------------------------------------
    QueryDef(
      "q16_brand_having",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "part")
          .groupBy($"p_brand", $"p_type")
          .agg(count(lit(1)).as("n_parts"),
            dsum($"p_retailprice").as("total_price"))
          .filter($"n_parts" >= 2)
          .orderBy($"p_brand", $"p_type")
      },
      Some("""SELECT p_brand, p_type, COUNT(*) AS n_parts,
             |  CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
             |FROM part
             |GROUP BY p_brand, p_type
             |HAVING COUNT(*) >= 2
             |ORDER BY p_brand, p_type""".stripMargin)),

    // ---- q17: aggregate subquery / self-join on per-group avg ------------
    QueryDef(
      "q17_small_quantity_revenue",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val avgQty = li.groupBy($"l_partkey".as("pk"))
          .agg(((sum($"l_quantity") / count(lit(1))) * 0.5).as("thresh"))
        // avgQty is keyed by the fact table's partkey — NOT broadcastable at
        // scale; the shuffle join re-uses l_partkey partitioning on both sides.
        li.join(avgQty, $"l_partkey" === $"pk")
          .filter($"l_quantity" < $"thresh")
          .agg((sum(dec($"l_extendedprice")).cast("double") / 7.0)
            .as("avg_yearly"))
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
             |FROM lineitem JOIN (
             |  SELECT l_partkey AS pk, (SUM(l_quantity) / COUNT(*)) * 0.5 AS thresh
             |  FROM lineitem GROUP BY l_partkey
             |) ON l_partkey = pk
             |WHERE l_quantity < thresh""".stripMargin)),

    // ---- q18: conditional (pivot-style) aggregation ----------------------
    QueryDef(
      "q18_conditional_agg",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "lineitem")
          .groupBy($"l_linestatus")
          .agg(
            sum(when($"l_returnflag" === "R", $"l_quantity").otherwise(0))
              .as("qty_returned"),
            sum(when($"l_returnflag" === "A", $"l_quantity").otherwise(0))
              .as("qty_a"),
            sum(when($"l_returnflag" === "N", $"l_quantity").otherwise(0))
              .as("qty_n"),
            count(lit(1)).as("n"))
          .orderBy($"l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS qty_returned,
             |  SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0 END) AS qty_a,
             |  SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END) AS qty_n,
             |  COUNT(*) AS n
             |FROM lineitem
             |GROUP BY l_linestatus
             |ORDER BY l_linestatus""".stripMargin)),

    // ---- q19: date bucketing ---------------------------------------------
    QueryDef(
      "q19_quarterly_orders",
      (s, dir) => {
        import s.implicits._
        t(s, dir, "orders")
          .withColumn("quarter", date_trunc("quarter", $"o_orderdate"))
          .groupBy($"quarter")
          .agg(count(lit(1)).as("n_orders"),
            dsum($"o_totalprice").as("revenue"))
          .orderBy($"quarter")
      },
      Some("""SELECT date_trunc('quarter', o_orderdate) AS quarter,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders
             |GROUP BY 1
             |ORDER BY quarter""".stripMargin)),

    // ---- q20: grouping sets via SQL surface ------------------------------
    QueryDef(
      "q20_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                |  coalesce(CAST(year(o_orderdate) AS STRING), 'ALL') AS yr,
                |  COUNT(*) AS n
                |FROM orders
                |GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
                |ORDER BY status, yr""".stripMargin)
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
             |  coalesce(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS yr,
             |  COUNT(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (year(o_orderdate)), ())
             |ORDER BY status, yr""".stripMargin))
  )
}
