package graft.queries

import graft.QueryDef
import org.apache.spark.sql.functions._

/** Sixth relational batch: grouped statistical mode, equi-width
  * histogramming, weighted median over pre-aggregated weight mass, and a
  * referential-integrity audit.
  */
object Relational6 {
  import graft.Tables.t

  /** Per-process scratch root for q88's two schema snapshots (cleaned
    * on JVM exit; pid-keyed so concurrent runs never collide). */
  private lazy val scratchRoot: String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_r6_scratch_${ProcessHandle.current().pid()}")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(d)
    }
    d.getPath
  }

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // GROUPED MODE with deterministic tie-break — the most frequent
      // event_type per day-of-week, plus its frequency and integer-ppm
      // share. The scale shape is counts -> per-group max -> join-back
      // -> min over ties: every step is a partial-aggregable hash
      // aggregate over (group, value) pairs, so a group with 10^9 rows
      // contributes one count row per distinct value — no window, no
      // per-group funnel, and the tie-break (smallest value string) is
      // engine-independent.
      "q83_mode_per_group",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .select(dayofweek($"ts").as("dow"), $"event_type")
        val counts = ev.groupBy($"dow", $"event_type")
          .agg(count(lit(1)).as("c"))
        val tops = counts.groupBy($"dow")
          .agg(max($"c").as("mc"), sum($"c").as("total"))
        counts.join(broadcast(tops), Seq("dow"))
          .filter($"c" === $"mc")
          .groupBy($"dow", $"mc", $"total")
          .agg(min($"event_type").as("mode_event"))
          .select($"dow", $"mode_event", $"mc".as("mode_count"),
            expr("mc * 1000000 DIV total").as("share_ppm"))
          .orderBy($"dow")
      },
      Some("""WITH ev AS (
             |  SELECT dayofweek(ts) + 1 AS dow, event_type
             |  FROM events),
             |c AS (
             |  SELECT dow, event_type, COUNT(*) AS c
             |  FROM ev GROUP BY 1, 2),
             |tp AS (
             |  SELECT dow, MAX(c) AS mc, SUM(c) AS total
             |  FROM c GROUP BY 1)
             |SELECT c.dow, MIN(c.event_type) AS mode_event,
             |  CAST(tp.mc AS BIGINT) AS mode_count,
             |  CAST(tp.mc * 1000000 // tp.total AS BIGINT) AS share_ppm
             |FROM c JOIN tp USING (dow)
             |WHERE c.c = tp.mc
             |GROUP BY c.dow, tp.mc, tp.total
             |ORDER BY c.dow""".stripMargin)),

    QueryDef(
      // EQUI-WIDTH HISTOGRAM of order value in integer cents: 10 buckets
      // between the global min and max. The bounds come from ONE scalar
      // aggregate broadcast to the bucketing pass (two scans total —
      // the unavoidable minimum for data-dependent bounds); bucket
      // assignment is pure integer arithmetic replayed by the oracle,
      // and the bucket aggregation partial-combines map-side. Empty
      // buckets are absent by construction in both engines.
      "q84_histogram",
      (s, dir) => {
        import s.implicits._
        val cents = t(s, dir, "orders")
          .select(round($"o_totalprice" * 100, 0).cast("long").as("cents"))
        val bounds = cents.agg(min($"cents").as("mn"), max($"cents").as("mx"))
        cents.crossJoin(broadcast(bounds))
          .select(least(lit(9L),
            expr("(cents - mn) * 10 DIV (mx - mn + 1)")).as("bucket"),
            $"mn", $"mx")
          .groupBy($"bucket", $"mn", $"mx")
          .agg(count(lit(1)).as("n"))
          .select($"bucket",
            ($"mn" + $"bucket" * expr("(mx - mn + 1) DIV 10")).as("lo_cents"),
            $"n")
          .orderBy($"bucket")
      },
      Some("""WITH cents AS (
             |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |b AS (SELECT MIN(cents) AS mn, MAX(cents) AS mx FROM cents),
             |h AS (
             |  SELECT LEAST(9, (cents - mn) * 10 // (mx - mn + 1))
             |      AS bucket, mn, mx
             |  FROM cents CROSS JOIN b)
             |SELECT bucket,
             |  CAST(mn + bucket * ((mx - mn + 1) // 10) AS BIGINT)
             |    AS lo_cents,
             |  COUNT(*) AS n
             |FROM h GROUP BY bucket, mn, mx
             |ORDER BY bucket""".stripMargin)),

    QueryDef(
      // WEIGHTED MEDIAN — the revenue-weighted median order quantity per
      // return flag: the quantity q where half the price mass sits at or
      // below q. The scale discipline: ALL the mass folds into a
      // (flag, quantity) pre-aggregate first — integer cents, partial
      // aggregation, at most |flags| x |quantities| rows (a dictionary)
      // — and only that tiny frame rides the cumulative-sum window. A
      // window over raw lineitem would funnel a flag's 10^9 rows into
      // one task; this one never sees more than the value domain.
      "q85_weighted_median",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val wa = t(s, dir, "lineitem")
          .select($"l_returnflag".as("flag"),
            $"l_quantity".cast("long").as("qty"),
            round($"l_extendedprice" * 100, 0).cast("long").as("cents"))
          .groupBy($"flag", $"qty")
          .agg(sum($"cents").as("w"))
        val cum = wa.withColumn("cw",
          sum($"w").over(Window.partitionBy($"flag").orderBy($"qty")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val tot = wa.groupBy($"flag").agg(sum($"w").as("total"))
        cum.join(broadcast(tot), Seq("flag"))
          .filter($"cw" * 2 >= $"total")
          .groupBy($"flag")
          .agg(min($"qty").as("wmedian_qty"), min($"total").as("total_cents"))
          .orderBy($"flag")
      },
      Some("""WITH wa AS (
             |  SELECT l_returnflag AS flag,
             |    CAST(l_quantity AS BIGINT) AS qty,
             |    SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS w
             |  FROM lineitem GROUP BY 1, 2),
             |cum AS (
             |  SELECT flag, qty, w,
             |    SUM(w) OVER (PARTITION BY flag ORDER BY qty
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             |    SUM(w) OVER (PARTITION BY flag) AS total
             |  FROM wa)
             |SELECT flag, CAST(MIN(qty) AS BIGINT) AS wmedian_qty,
             |  CAST(MIN(total) AS BIGINT) AS total_cents
             |FROM cum WHERE cw * 2 >= total
             |GROUP BY flag
             |ORDER BY flag""".stripMargin)),

    QueryDef(
      // REFERENTIAL-INTEGRITY AUDIT — the ingest gate a 100 TB lakehouse
      // runs before publishing a snapshot: for every FK edge of the star
      // schema, child volume, orphan rows (child keys with no parent)
      // and distinct orphan keys, all from ONE left-outer probe per
      // edge against the deduplicated parent keys (dimension parents
      // broadcast; the fact-fact edge shuffles on its join key like any
      // hash join). NULL FKs are excluded on both engines (a NULL key
      // is unknown, not an orphan). The one-row frames union into the
      // report.
      "q86_fk_integrity",
      (s, dir) => {
        import s.implicits._
        def edge(fk: String, parent: String,
            child: org.apache.spark.sql.DataFrame, childKey: String,
            par: org.apache.spark.sql.DataFrame, parKey: String) = {
          // ONE child scan per edge: a left-outer probe against the
          // deduplicated parent keys yields volume, orphan rows and
          // orphan keys in the same aggregate (the anti-join + count
          // formulation scanned every child twice)
          val c = child.select(col(childKey).as("k")).filter($"k".isNotNull)
          val p = par.select(col(parKey).as("k")).filter($"k".isNotNull)
            .distinct().withColumn("__hit", lit(1))
          // count(when(...)), not sum(when().otherwise(0)): over an
          // EMPTY child frame sum yields NULL where the oracle's
          // COUNT(*) yields 0
          c.join(p, Seq("k"), "left_outer")
            .agg(count(lit(1)).as("child_rows"),
              count(when($"__hit".isNull, lit(1))).as("orphan_rows"),
              countDistinct(when($"__hit".isNull, $"k")).as("orphan_keys"))
            .select(lit(fk).as("fk"), lit(parent).as("parent"),
              $"child_rows", $"orphan_rows", $"orphan_keys")
        }
        val li = t(s, dir, "lineitem"); val od = t(s, dir, "orders")
        val cu = t(s, dir, "customer"); val su = t(s, dir, "supplier")
        val pa = t(s, dir, "part"); val na = t(s, dir, "nation")
        val re = t(s, dir, "region")
        edge("lineitem.l_orderkey", "orders", li, "l_orderkey", od,
            "o_orderkey")
          .unionAll(edge("lineitem.l_partkey", "part", li, "l_partkey", pa,
            "p_partkey"))
          .unionAll(edge("lineitem.l_suppkey", "supplier", li, "l_suppkey",
            su, "s_suppkey"))
          .unionAll(edge("orders.o_custkey", "customer", od, "o_custkey",
            cu, "c_custkey"))
          .unionAll(edge("customer.c_nationkey", "nation", cu,
            "c_nationkey", na, "n_nationkey"))
          .unionAll(edge("supplier.s_nationkey", "nation", su,
            "s_nationkey", na, "n_nationkey"))
          .unionAll(edge("nation.n_regionkey", "region", na, "n_regionkey",
            re, "r_regionkey"))
          // detection proof: a dirty staging frame with three fabricated
          // rows (keys -1, -2, -2 — impossible as real order keys) must
          // report orphan_rows=3 / orphan_keys=2; without it a clean
          // dataset shows all-zero audits and the detector is untested
          .unionAll(edge("staging.l_orderkey", "orders",
            li.select($"l_orderkey")
              .unionAll(Seq(-1L, -2L, -2L).toDF("l_orderkey")),
            "l_orderkey", od, "o_orderkey"))
          .orderBy($"fk")
      },
      Some("""WITH staging AS (
             |  SELECT l_orderkey AS k FROM lineitem
             |  UNION ALL SELECT * FROM (VALUES (-1), (-2), (-2)) AS v(k)),
             |edges AS (
             |  SELECT 'lineitem.l_orderkey' AS fk, 'orders' AS parent,
             |    (SELECT COUNT(*) FROM lineitem
             |      WHERE l_orderkey IS NOT NULL) AS child_rows,
             |    (SELECT COUNT(*) FROM lineitem
             |      WHERE l_orderkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM orders WHERE o_orderkey = l_orderkey))
             |      AS orphan_rows,
             |    (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem
             |      WHERE l_orderkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM orders WHERE o_orderkey = l_orderkey))
             |      AS orphan_keys
             |  UNION ALL SELECT 'lineitem.l_partkey', 'part',
             |    (SELECT COUNT(*) FROM lineitem
             |      WHERE l_partkey IS NOT NULL),
             |    (SELECT COUNT(*) FROM lineitem
             |      WHERE l_partkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM part WHERE p_partkey = l_partkey)),
             |    (SELECT COUNT(DISTINCT l_partkey) FROM lineitem
             |      WHERE l_partkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM part WHERE p_partkey = l_partkey))
             |  UNION ALL SELECT 'lineitem.l_suppkey', 'supplier',
             |    (SELECT COUNT(*) FROM lineitem
             |      WHERE l_suppkey IS NOT NULL),
             |    (SELECT COUNT(*) FROM lineitem
             |      WHERE l_suppkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM supplier WHERE s_suppkey = l_suppkey)),
             |    (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem
             |      WHERE l_suppkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM supplier WHERE s_suppkey = l_suppkey))
             |  UNION ALL SELECT 'orders.o_custkey', 'customer',
             |    (SELECT COUNT(*) FROM orders
             |      WHERE o_custkey IS NOT NULL),
             |    (SELECT COUNT(*) FROM orders
             |      WHERE o_custkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM customer WHERE c_custkey = o_custkey)),
             |    (SELECT COUNT(DISTINCT o_custkey) FROM orders
             |      WHERE o_custkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM customer WHERE c_custkey = o_custkey))
             |  UNION ALL SELECT 'customer.c_nationkey', 'nation',
             |    (SELECT COUNT(*) FROM customer
             |      WHERE c_nationkey IS NOT NULL),
             |    (SELECT COUNT(*) FROM customer
             |      WHERE c_nationkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM nation WHERE n_nationkey = c_nationkey)),
             |    (SELECT COUNT(DISTINCT c_nationkey) FROM customer
             |      WHERE c_nationkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM nation WHERE n_nationkey = c_nationkey))
             |  UNION ALL SELECT 'supplier.s_nationkey', 'nation',
             |    (SELECT COUNT(*) FROM supplier
             |      WHERE s_nationkey IS NOT NULL),
             |    (SELECT COUNT(*) FROM supplier
             |      WHERE s_nationkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM nation WHERE n_nationkey = s_nationkey)),
             |    (SELECT COUNT(DISTINCT s_nationkey) FROM supplier
             |      WHERE s_nationkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM nation WHERE n_nationkey = s_nationkey))
             |  UNION ALL SELECT 'nation.n_regionkey', 'region',
             |    (SELECT COUNT(*) FROM nation
             |      WHERE n_regionkey IS NOT NULL),
             |    (SELECT COUNT(*) FROM nation
             |      WHERE n_regionkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM region WHERE r_regionkey = n_regionkey)),
             |    (SELECT COUNT(DISTINCT n_regionkey) FROM nation
             |      WHERE n_regionkey IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM region WHERE r_regionkey = n_regionkey))
             |  UNION ALL SELECT 'staging.l_orderkey', 'orders',
             |    (SELECT COUNT(*) FROM staging WHERE k IS NOT NULL),
             |    (SELECT COUNT(*) FROM staging
             |      WHERE k IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM orders WHERE o_orderkey = k)),
             |    (SELECT COUNT(DISTINCT k) FROM staging
             |      WHERE k IS NOT NULL AND NOT EXISTS (SELECT 1
             |        FROM orders WHERE o_orderkey = k)))
             |SELECT fk, parent, child_rows, orphan_rows, orphan_keys
             |FROM edges
             |ORDER BY fk""".stripMargin)),

    QueryDef(
      // ORDER-INDEPENDENT TABLE FINGERPRINT — the snapshot-equality
      // primitive for 100 TB replication checks: per table, a checksum
      // that any engine computes from a canonical row serialization
      // (integer cents for money, '|' field separator) via
      // sum-of-md5-prefixes — commutative, so partial aggregation and
      // any partitioning give the same value, and two snapshots compare
      // by five numbers instead of a row diff. One map-side pass per
      // table; no shuffle beyond the final one-row aggregates.
      "q87_table_fingerprint",
      (s, dir) => {
        import s.implicits._
        def fp(name: String, repr: org.apache.spark.sql.Column,
            df: org.apache.spark.sql.DataFrame) =
          df.select(conv(substring(md5(repr), 1, 8), 16, 10)
            .cast("long").as("h"))
            .agg(count(lit(1)).as("n_rows"), sum($"h").as("checksum"))
            .select(lit(name).as("table_name"), $"n_rows", $"checksum")
        fp("region",
          concat_ws("|", $"r_regionkey", $"r_name"), t(s, dir, "region"))
          .unionAll(fp("nation",
            concat_ws("|", $"n_nationkey", $"n_name", $"n_regionkey"),
            t(s, dir, "nation")))
          .unionAll(fp("customer",
            concat_ws("|", $"c_custkey", $"c_name", $"c_nationkey",
              round($"c_acctbal" * 100, 0).cast("long"), $"c_mktsegment"),
            t(s, dir, "customer")))
          .unionAll(fp("supplier",
            concat_ws("|", $"s_suppkey", $"s_name", $"s_nationkey",
              round($"s_acctbal" * 100, 0).cast("long")),
            t(s, dir, "supplier")))
          .unionAll(fp("part",
            concat_ws("|", $"p_partkey", $"p_name", $"p_brand", $"p_type",
              $"p_size", round($"p_retailprice" * 100, 0).cast("long")),
            t(s, dir, "part")))
          .orderBy($"table_name")
      },
      Some("""WITH f AS (
             |  SELECT 'region' AS table_name, COUNT(*) AS n_rows,
             |    SUM(CAST(concat('0x', substr(md5(
             |      concat_ws('|', r_regionkey, r_name)), 1, 8)) AS BIGINT))
             |      AS checksum
             |  FROM region
             |  UNION ALL SELECT 'nation', COUNT(*),
             |    SUM(CAST(concat('0x', substr(md5(
             |      concat_ws('|', n_nationkey, n_name, n_regionkey)),
             |      1, 8)) AS BIGINT))
             |  FROM nation
             |  UNION ALL SELECT 'customer', COUNT(*),
             |    SUM(CAST(concat('0x', substr(md5(
             |      concat_ws('|', c_custkey, c_name, c_nationkey,
             |        CAST(round(c_acctbal * 100, 0) AS BIGINT),
             |        c_mktsegment)), 1, 8)) AS BIGINT))
             |  FROM customer
             |  UNION ALL SELECT 'supplier', COUNT(*),
             |    SUM(CAST(concat('0x', substr(md5(
             |      concat_ws('|', s_suppkey, s_name, s_nationkey,
             |        CAST(round(s_acctbal * 100, 0) AS BIGINT))),
             |      1, 8)) AS BIGINT))
             |  FROM supplier
             |  UNION ALL SELECT 'part', COUNT(*),
             |    SUM(CAST(concat('0x', substr(md5(
             |      concat_ws('|', p_partkey, p_name, p_brand, p_type,
             |        p_size, CAST(round(p_retailprice * 100, 0)
             |          AS BIGINT))), 1, 8)) AS BIGINT))
             |  FROM part)
             |SELECT table_name, n_rows, CAST(checksum AS BIGINT)
             |  AS checksum
             |FROM f
             |ORDER BY table_name""".stripMargin)),

    QueryDef(
      // SCHEMA-EVOLUTION READ — the lakehouse reality that a 100 TB
      // table's early files predate its later columns: snapshot v1
      // (orders before 1998: key, year, cents) and snapshot v2 (1998+:
      // + priority) are written as real parquet and read back in ONE
      // scan with mergeSchema — v1 rows surface the evolved column as
      // NULL, and the per-year report proves both the union and the
      // NULL semantics. The oracle replays from the source table. At
      // scale this is a metadata-only merge (footer schemas), not a
      // data rewrite — which is the point of the pattern.
      "q88_schema_evolution",
      (s, dir) => {
        import s.implicits._
        val root = new java.io.File(scratchRoot, "schema_evo").getPath
        val base = t(s, dir, "orders").select($"o_orderkey",
          year($"o_orderdate").as("o_year"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"),
          $"o_orderpriority")
        base.filter($"o_year" < 1998)
          .select($"o_orderkey", $"o_year", $"cents")
          .write.mode("overwrite").parquet(s"$root/v1")
        base.filter($"o_year" >= 1998)
          .write.mode("overwrite").parquet(s"$root/v2")
        s.read.option("mergeSchema", "true")
          .parquet(s"$root/v1", s"$root/v2")
          .groupBy($"o_year")
          .agg(count(lit(1)).as("n_orders"),
            sum($"cents").as("total_cents"),
            sum(when($"o_orderpriority".isNotNull, 1L).otherwise(0L))
              .as("with_priority"))
          .orderBy($"o_year")
      },
      Some("""SELECT year(o_orderdate) AS o_year,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |    AS BIGINT) AS total_cents,
             |  CAST(SUM(CASE WHEN year(o_orderdate) >= 1998
             |    THEN 1 ELSE 0 END) AS BIGINT) AS with_priority
             |FROM orders
             |GROUP BY 1
             |ORDER BY o_year""".stripMargin)),

    QueryDef(
      // CACHED SHARED INTERMEDIATE — the explicit-materialization twin
      // of q81's automatic exchange reuse: a monthly revenue rollup is
      // computed ONCE, `.cache()`d, and two reports derive from it (the
      // top-3 months and every month-over-month delta). The plan pin
      // asserts BOTH consumers read `InMemoryTableScan` — without the
      // cache each report re-scans and re-shuffles the fact table; with
      // it the fact table is read once and the reports run over an
      // 84-row columnar cache. Money stays in integer cents end-to-end;
      // both derivations ride the dictionary-sized rollup (windows over
      // <=84 rows), never the facts.
      "q89_cached_two_pass",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val monthly = t(s, dir, "lineitem")
          .select(year($"l_shipdate").as("y"), month($"l_shipdate").as("m"),
            round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100, 0)
              .cast("long").as("cents"))
          .groupBy($"y", $"m").agg(sum($"cents").as("cents"))
          .cache()
        val top3 = monthly
          .orderBy($"cents".desc, $"y", $"m").limit(3)
          .select(lit("top3").as("report"), $"y", $"m", $"cents",
            lit(null).cast("long").as("delta"))
        val mom = monthly
          .withColumn("delta", $"cents" - lag($"cents", 1)
            .over(Window.orderBy($"y", $"m")))
          .select(lit("mom_delta").as("report"), $"y", $"m", $"cents",
            $"delta")
        top3.unionAll(mom).orderBy($"report", $"y", $"m")
      },
      Some("""WITH monthly AS (
             |  SELECT year(l_shipdate) AS y, month(l_shipdate) AS m,
             |    CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount)
             |      * 100, 0) AS BIGINT)) AS BIGINT) AS cents
             |  FROM lineitem GROUP BY 1, 2),
             |top3 AS (
             |  SELECT 'top3' AS report, y, m, cents,
             |    CAST(NULL AS BIGINT) AS delta
             |  FROM monthly ORDER BY cents DESC, y, m LIMIT 3),
             |mom AS (
             |  SELECT 'mom_delta' AS report, y, m, cents,
             |    cents - lag(cents, 1) OVER (ORDER BY y, m) AS delta
             |  FROM monthly)
             |SELECT * FROM top3
             |UNION ALL SELECT * FROM mom
             |ORDER BY report, y, m""".stripMargin)),

    QueryDef(
      // PARAMETERIZED SQL — the injection-safe `spark.sql(text, args)`
      // binding surface (named parameter markers, Spark 3.4+): the
      // revenue cut and segment list arrive as PARAMETERS, not spliced
      // strings. Semantically identical to the literal form the oracle
      // runs; what this entry locks in is the API — a library user
      // drives every graft view through bound parameters without
      // string-escaping concerns.
      "q90_parameterized_sql",
      (s, dir) => {
        graft.Tables.registerAll(s, dir)
        s.sql(
          """SELECT c_mktsegment,
            |  COUNT(*) AS n_customers,
            |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT))
            |    AS BIGINT) AS balance_cents
            |FROM customer
            |WHERE c_acctbal >= :minBal
            |  AND c_mktsegment IN (:seg1, :seg2)
            |GROUP BY c_mktsegment
            |ORDER BY c_mktsegment""".stripMargin,
          Map("minBal" -> 1000.0, "seg1" -> "BUILDING",
            "seg2" -> "MACHINERY"))
      },
      Some("""SELECT c_mktsegment,
             |  COUNT(*) AS n_customers,
             |  CAST(SUM(CAST(round(c_acctbal * 100, 0) AS BIGINT))
             |    AS BIGINT) AS balance_cents
             |FROM customer
             |WHERE c_acctbal >= 1000.0
             |  AND c_mktsegment IN ('BUILDING', 'MACHINERY')
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin))
  )
}
