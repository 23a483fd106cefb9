package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fifth relational batch: spatial grid-bucketed radius join, incremental
  * rollup maintenance (mergeable aggregate state), and grouped OLS trend
  * fitting from decimal-exact sufficient statistics.
  */
object Relational5 {
  import Tables.t

  /** One-shot guard for q76's year-partitioned sink, keyed by
    * (applicationId, sfDir) — same amortization discipline as q38's
    * bucketed tables: a production date-partitioned fact table is
    * written once and queried forever, so later runs skip straight to
    * the pruned join.
    */
  @volatile private var partitionedFor: Option[(String, String)] = None

  private def buildPartitionedOrders(
      s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    synchronized {
      val key = (s.sparkContext.applicationId, dir)
      if (partitionedFor.contains(key) &&
        s.catalog.tableExists("graft_ord_by_year")) return
      import s.implicits._
      s.sql("DROP TABLE IF EXISTS graft_ord_by_year")
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), "graft_ord_by_year")
      val fs = wh.getFileSystem(s.sessionState.newHadoopConf())
      if (fs.exists(wh)) fs.delete(wh, true)
      t(s, dir, "orders")
        .select($"o_orderkey",
          round($"o_totalprice" * 100, 0).cast("long").as("cents"),
          year($"o_orderdate").as("o_year"))
        .repartition($"o_year")
        .write.partitionBy("o_year")
        .mode("overwrite").saveAsTable("graft_ord_by_year")
      partitionedFor = Some(key)
    }

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // SPATIAL RADIUS JOIN via grid bucketing — the distributed-join
      // answer to "find every point of B within distance r of each point
      // of A" without a cartesian product. Both point sets live on a
      // 100k x 100k integer plane (coordinates derived from the keys by
      // multiplicative-congruential scatter, identical arithmetic in both
      // engines, so the oracle needs no float or hash portability). Each
      // customer lands in exactly ONE r-sized grid cell; each supplier
      // probes its own cell plus the 8 neighbors (a map-side 9x fan-out
      // of the SMALL side). Cell size == r guarantees every point within
      // Euclidean r is in one of those 9 cells, and since a customer has
      // one home cell no pair can match twice — no dedup pass needed.
      // The join is a plain EQUI-join on the cell key: it shuffles both
      // sides by cell, partial-aggregates map-side, and at 100 TB scales
      // like any hash join (cell key cardinality ~ area/r^2; skew from a
      // hot cell is AQE's ordinary skew-split case). Plan-pinned in
      // PlanAuditSpec: no CartesianProduct / BroadcastNestedLoopJoin.
      // The oracle replays the naive O(|A|x|B|) distance filter.
      "q73_spatial_grid_join",
      (s, dir) => {
        import s.implicits._
        val r = 5000L // radius == cell size, micro-units
        val cust = t(s, dir, "customer").select(
          $"c_custkey",
          (($"c_custkey" * 48271L) % 100000L).as("cx"),
          (($"c_custkey" * 69621L) % 100000L).as("cy"))
        val supp = t(s, dir, "supplier").select(
          $"s_suppkey",
          (($"s_suppkey" * 16807L) % 100000L).as("sx"),
          (($"s_suppkey" * 282475249L) % 100000L).as("sy"))
        val cCells = cust.select($"*",
          expr(s"cx DIV $r").as("gx"), expr(s"cy DIV $r").as("gy"))
        val offsets = for (dx <- -1 to 1; dy <- -1 to 1)
          yield struct(lit(dx).as("dx"), lit(dy).as("dy"))
        val sCells = supp
          .select($"*", explode(array(offsets: _*)).as("d"))
          .select($"s_suppkey", $"sx", $"sy",
            (expr(s"sx DIV $r") + $"d.dx").as("gx"),
            (expr(s"sy DIV $r") + $"d.dy").as("gy"))
        val d2 = ($"cx" - $"sx") * ($"cx" - $"sx") +
          ($"cy" - $"sy") * ($"cy" - $"sy")
        sCells.join(cCells, Seq("gx", "gy"))
          .filter(d2 <= lit(r * r))
          .groupBy($"s_suppkey")
          .agg(count(lit(1)).as("n_in_radius"),
            min(d2).as("nearest_d2"))
          .orderBy($"s_suppkey")
      },
      Some("""WITH c AS (
             |  SELECT c_custkey,
             |         (c_custkey * 48271) % 100000 AS cx,
             |         (c_custkey * 69621) % 100000 AS cy
             |  FROM customer),
             |s AS (
             |  SELECT s_suppkey,
             |         (s_suppkey * 16807) % 100000 AS sx,
             |         (s_suppkey * 282475249) % 100000 AS sy
             |  FROM supplier)
             |SELECT s_suppkey,
             |  COUNT(*) AS n_in_radius,
             |  MIN((cx-sx)*(cx-sx) + (cy-sy)*(cy-sy)) AS nearest_d2
             |FROM s JOIN c
             |  ON (cx-sx)*(cx-sx) + (cy-sy)*(cy-sy) <= 25000000
             |GROUP BY s_suppkey
             |ORDER BY s_suppkey""".stripMargin)),

    QueryDef(
      // INCREMENTAL ROLLUP MAINTENANCE — the mergeable-aggregate-state
      // pattern every 100 TB warehouse lives on: yesterday's rollup is
      // never recomputed; today's delta produces the SAME partial state
      // shape and the two merge algebraically (sum+sum, min+min,
      // max+max). COUNT DISTINCT is not algebraic, so its state is the
      // deduped (group, custkey) key set — union'd then re-deduped,
      // which is exactly how a production incremental pipeline carries
      // it. Here the "stored" state is computed from a date-split of the
      // same table so the whole maintenance cycle is visible in one
      // plan; the oracle is the direct full recompute, so the hash match
      // PROVES merge == recompute. Both state frames are group-keyed
      // partial aggregates — at scale each is a fraction of the fact
      // table and the merge shuffles only state rows, never facts.
      "q74_incremental_rollup",
      (s, dir) => {
        import s.implicits._
        val cents = round($"o_totalprice" * 100, 0).cast("long")
        val withG = t(s, dir, "orders").select(
          to_date(date_trunc("month", $"o_orderdate")).as("month"),
          $"o_orderpriority".as("priority"), $"o_custkey",
          cents.as("cents"),
          ($"o_orderdate" < lit("1997-01-01").cast("timestamp"))
            .as("is_base"))
        def state(base: Boolean) = {
          val part = withG.filter($"is_base" === base)
          (part.groupBy($"month", $"priority")
            .agg(count(lit(1)).as("cnt"), sum($"cents").as("rev"),
              min($"cents").as("mn"), max($"cents").as("mx")),
            part.select($"month", $"priority", $"o_custkey").distinct())
        }
        val (baseAgg, baseKeys) = state(base = true)
        val (deltaAgg, deltaKeys) = state(base = false)
        val merged = baseAgg.unionAll(deltaAgg)
          .groupBy($"month", $"priority")
          .agg(sum($"cnt").as("n_orders"), sum($"rev").as("revenue_cents"),
            min($"mn").as("min_cents"), max($"mx").as("max_cents"))
        val custs = baseKeys.unionAll(deltaKeys).distinct()
          .groupBy($"month", $"priority")
          .agg(count(lit(1)).as("n_customers"))
        merged.join(custs, Seq("month", "priority"))
          .orderBy($"month", $"priority")
      },
      Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             |  o_orderpriority AS priority,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
             |    AS BIGINT) AS revenue_cents,
             |  MIN(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_cents,
             |  MAX(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents,
             |  COUNT(DISTINCT o_custkey) AS n_customers
             |FROM orders
             |GROUP BY 1, 2
             |ORDER BY month, priority""".stripMargin)),

    QueryDef(
      // GROUPED OLS TREND — least-squares slope of monthly revenue per
      // nation, computed ENTIRELY in integer/decimal arithmetic: the
      // sufficient statistics (n, Sx, Sy, Sxx, Sxy) are decimal sums of
      // integers, and the result is reported as the exact rational
      // (slope_num / slope_den, intercept_num / slope_den) rather than a
      // lossy float division — so the oracle match is bit-exact with no
      // round() epsilon. Two-level shape: facts partial-aggregate to one
      // row per (nation, month) FIRST (the only fact-table shuffle),
      // then the regression runs over the dictionary-sized monthly
      // series. x is the month index (months since 1992-01), y is
      // monthly revenue in cents.
      "q75_grouped_ols",
      (s, dir) => {
        import s.implicits._
        val D = DecimalType(38, 0)
        val monthly = t(s, dir, "orders")
          .join(t(s, dir, "customer"),
            $"o_custkey" === $"c_custkey")
          .join(broadcast(t(s, dir, "nation")),
            $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name",
            ((year($"o_orderdate") - 1992) * 12 +
              month($"o_orderdate") - 1).as("x"))
          .agg(sum(round($"o_totalprice" * 100, 0).cast("long")).as("y"))
        val st = monthly.groupBy($"n_name").agg(
          count(lit(1)).cast(D).as("n"),
          sum($"x").cast(D).as("sx"),
          sum($"y").cast(D).as("sy"),
          sum(($"x" * $"x").cast("long")).cast(D).as("sxx"),
          sum(($"x".cast(D) * $"y".cast(D)).cast(D)).as("sxy"))
        // The three wide statistics are rendered as STRINGS, not
        // DECIMAL(38,0): a decimal cell survives Spark→parquet→reader as
        // java/python Decimal but DuckDB's pandas bridge degrades
        // DECIMAL(38,0) to float64, so a value-hash over the two readers
        // diverges on rendering ('1.23e+22' vs '123…') even when the
        // numbers are identical. An integer-string is read back
        // byte-identically by every reader.
        st.select($"n_name", $"n".cast("long").as("n_months"),
            ($"n" * $"sxy" - $"sx" * $"sy").cast(D).cast("string").as("slope_num"),
            ($"n" * $"sxx" - $"sx" * $"sx").cast(D).cast("string").as("slope_den"),
            ($"sy" * $"sxx" - $"sx" * $"sxy").cast(D).cast("string").as("intercept_num"))
          .orderBy($"n_name")
      },
      Some("""WITH monthly AS (
             |  SELECT n_name,
             |    (year(o_orderdate) - 1992) * 12
             |      + month(o_orderdate) - 1 AS x,
             |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
             |  FROM orders
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1, 2),
             |st AS (
             |  SELECT n_name,
             |    CAST(COUNT(*) AS HUGEINT) AS n,
             |    CAST(SUM(x) AS HUGEINT) AS sx,
             |    CAST(SUM(y) AS HUGEINT) AS sy,
             |    CAST(SUM(CAST(x AS BIGINT) * x) AS HUGEINT) AS sxx,
             |    CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
             |  FROM monthly GROUP BY n_name)
             |SELECT n_name,
             |  CAST(n AS BIGINT) AS n_months,
             |  CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num,
             |  CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den,
             |  CAST(sy * sxx - sx * sxy AS VARCHAR) AS intercept_num
             |FROM st ORDER BY n_name""".stripMargin)),

    QueryDef(
      // DYNAMIC PARTITION PRUNING — the mechanism that makes a
      // date-partitioned 100 TB fact table queryable: the fact side is
      // a year-partitioned table, the dim side (region mapped to a
      // year) carries a selective filter, and Catalyst inserts a
      // runtime partition filter (SubqueryBroadcast) so the fact scan
      // READS ONLY the years the filtered dim produces — partitions
      // are pruned at execution time, not just planning time.
      // Plan-pinned in PlanAuditSpec: the fact scan must carry a
      // `dynamicpruning` partition filter. The partitioned sink builds
      // once per (session, SF) — the q38 amortization discipline.
      "q76_dynamic_partition_pruning",
      (s, dir) => {
        import s.implicits._
        buildPartitionedOrders(s, dir)
        val dim = t(s, dir, "region")
          .select(($"r_regionkey" + 1995).cast("int").as("o_year"),
            $"r_name")
          .filter($"r_name".isin("ASIA", "EUROPE"))
        s.table("graft_ord_by_year")
          .join(broadcast(dim), Seq("o_year"))
          .groupBy($"o_year")
          .agg(count(lit(1)).as("n_orders"), sum($"cents").as("revenue_cents"))
          .orderBy($"o_year")
      },
      Some("""SELECT CAST(r_regionkey + 1995 AS INT) AS o_year,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
             |    AS BIGINT) AS revenue_cents
             |FROM orders
             |JOIN region ON year(o_orderdate) = r_regionkey + 1995
             |WHERE r_name IN ('ASIA', 'EUROPE')
             |GROUP BY 1
             |ORDER BY o_year""".stripMargin)),

    QueryDef(
      // ROBUST OUTLIER DETECTION (median + MAD) — the heavy-tail-safe
      // alternative to z-scores, in EXACT integer arithmetic end to
      // end: balances become cents, medians are carried doubled
      // (med2 = 2*median, always an integer even when the even-count
      // median interpolates to .5) and the flag |x-med| > 3*MAD
      // becomes the pure-integer comparison 2*d2 > 3*mad2. Exact
      // per-group medians come from RankOps.rankWithinKey — range
      // partition + offset arithmetic, so NO per-nation window funnel
      // and no per-group buffering percentile: the same rank machinery
      // is exact at any group size. (The sketch path for quantiles at
      // 100 TB is q53; this entry is the exact-selection path.) Two
      // rank passes (median, then MAD), each a bounded-partition
      // shuffle; every join-back is against the 25-row nation
      // dictionary, broadcast.
      "q77_mad_outliers",
      (s, dir) => {
        import s.implicits._
        import graft.operators.RankOps
        val cust = t(s, dir, "customer").select($"c_nationkey", $"c_custkey",
          round($"c_acctbal" * 100, 0).cast("long").as("cents"))
        def med2Of(df: org.apache.spark.sql.DataFrame, valueCol: String) = {
          val ranked = RankOps.rankWithinKey(df, "c_nationkey",
            Seq(col(valueCol), $"c_custkey"), "r")
          val n = df.groupBy($"c_nationkey").agg(count(lit(1)).as("n"))
          ranked.join(broadcast(n), Seq("c_nationkey"))
            .filter($"r" === expr("(n + 1) DIV 2") ||
              $"r" === expr("(n + 2) DIV 2"))
            .groupBy($"c_nationkey")
            .agg(expr(s"CAST(sum($valueCol) * 2 DIV count(1) AS BIGINT)")
              .as("m2"))
        }
        val med = med2Of(cust, "cents")
          .withColumnRenamed("m2", "med2")
        // r15: persisted — consumed TWICE (the MAD rank phase and the
        // final outlier rollup); unpersisted the whole customer-scan ->
        // rank -> median chain re-executed per consumer (plan showed the
        // subtree duplicated; 90 Exchange nodes -> 49 after the persist)
        val dev = cust.join(broadcast(med), Seq("c_nationkey"))
          .withColumn("d2", abs($"cents" * 2 - $"med2"))
          .persist()
        val mad = med2Of(dev.select($"c_nationkey", $"c_custkey", $"d2"), "d2")
          .withColumnRenamed("m2", "mad2")
        dev.join(broadcast(mad), Seq("c_nationkey"))
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_customers"),
            min($"med2").as("median_x2_cents"),
            min($"mad2").as("mad_x4_cents"),
            sum(when($"d2" * 2 > $"mad2" * 3, 1L).otherwise(0L))
              .as("n_outliers"))
          .join(broadcast(t(s, dir, "nation")),
            $"c_nationkey" === $"n_nationkey")
          .select($"n_name", $"n_customers", $"median_x2_cents",
            $"mad_x4_cents", $"n_outliers")
          .orderBy($"n_name")
      },
      Some("""WITH c AS (
             |  SELECT c_nationkey, c_custkey,
             |         CAST(round(c_acctbal * 100) AS BIGINT) AS cents
             |  FROM customer),
             |rk AS (
             |  SELECT *, row_number() OVER (PARTITION BY c_nationkey
             |      ORDER BY cents, c_custkey) AS r,
             |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n
             |  FROM c),
             |med AS (
             |  SELECT c_nationkey,
             |    CAST(SUM(cents) * 2 // COUNT(*) AS BIGINT) AS med2
             |  FROM rk WHERE r = (n+1)//2 OR r = (n+2)//2
             |  GROUP BY c_nationkey),
             |d AS (
             |  SELECT c.c_nationkey, c.c_custkey,
             |         abs(2*c.cents - m.med2) AS d2, m.med2
             |  FROM c JOIN med m USING (c_nationkey)),
             |rk2 AS (
             |  SELECT *, row_number() OVER (PARTITION BY c_nationkey
             |      ORDER BY d2, c_custkey) AS r,
             |    COUNT(*) OVER (PARTITION BY c_nationkey) AS n
             |  FROM d),
             |mad AS (
             |  SELECT c_nationkey,
             |    CAST(SUM(d2) * 2 // COUNT(*) AS BIGINT) AS mad2
             |  FROM rk2 WHERE r = (n+1)//2 OR r = (n+2)//2
             |  GROUP BY c_nationkey)
             |SELECT n_name,
             |  CAST(COUNT(*) AS BIGINT) AS n_customers,
             |  CAST(MIN(d.med2) AS BIGINT) AS median_x2_cents,
             |  CAST(MIN(mad.mad2) AS BIGINT) AS mad_x4_cents,
             |  CAST(SUM(CASE WHEN 2*d.d2 > 3*mad.mad2
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
             |FROM d JOIN mad USING (c_nationkey)
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    QueryDef(
      // SKETCH-STATE ROLLUP ACROSS TIME GRAINS — the distinct-count
      // analogue of q74's algebraic state: per-day HLL sketches
      // (DataSketches binary state) are the STORED partial, and coarser
      // grains come from hll_union_agg over the stored sketches — the
      // fact table is scanned once for the finest grain and NEVER
      // rescanned for month-level distincts. Register-merge is
      // commutative/associative (max per register), so the union is
      // deterministic under any partitioning. Sketch registers are
      // engine-specific, so the oracle follows the q34 discipline:
      // exact weekly distincts plus a literal-TRUE envelope boolean
      // (default lgConfigK=12 ~ 1.6% rsd; 10% gate = 6x headroom)
      // computed in-frame against the exact companion. Week grain
      // (ISO Monday truncation agrees across both engines) because the
      // fixture spans one month of events.
      "q78_sketch_grain_rollup",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .select(to_date($"ts").as("day"), $"user_id")
        val daily = ev.groupBy($"day")
          .agg(expr("hll_sketch_agg(user_id)").as("sk"))
        val weeklyEst = daily
          .groupBy(trunc($"day", "week").as("week"))
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
        val weeklyExact = ev
          .select(trunc($"day", "week").as("week"), $"user_id").distinct()
          .groupBy($"week").agg(count(lit(1)).as("exact_users"))
        weeklyExact.join(weeklyEst, Seq("week"))
          .select($"week", $"exact_users",
            (abs($"est" - $"exact_users").cast("double") /
              $"exact_users" <= 0.10).as("rollup_est_ok"))
          .orderBy($"week")
      },
      Some("""SELECT CAST(date_trunc('week', ts) AS DATE) AS week,
             |  COUNT(DISTINCT user_id) AS exact_users,
             |  TRUE AS rollup_est_ok
             |FROM events
             |GROUP BY 1
             |ORDER BY week""".stripMargin)),

    QueryDef(
      // JOIN STRATEGY HINTS — explicit physical-strategy control, the
      // knob a 100 TB deployment reaches for when the optimizer's
      // default is wrong for its data: broadcast (small dim), merge
      // (forced SMJ — the big-big sorted path), and shuffle_hash
      // (skew-resistant build-side hashing that skips BOTH sorts).
      // All three variants compute the identical aggregate; the oracle
      // proves strategy choice never changes results, and PlanAuditSpec
      // pins that all three physical operators actually appear (a hint
      // that silently degrades to the default is a no-op, not control).
      "q79_join_strategy_hints",
      (s, dir) => {
        import s.implicits._
        def joined(strategy: String) =
          t(s, dir, "orders")
            .join(t(s, dir, "customer").hint(strategy),
              $"o_custkey" === $"c_custkey")
            .groupBy($"c_mktsegment")
            .agg(count(lit(1)).as("n_orders"),
              sum(round($"o_totalprice" * 100, 0).cast("long"))
                .as("revenue_cents"))
            .withColumn("strategy", lit(strategy))
        joined("broadcast")
          .unionByName(joined("merge"))
          .unionByName(joined("shuffle_hash"))
          .select($"strategy", $"c_mktsegment", $"n_orders",
            $"revenue_cents")
          .orderBy($"strategy", $"c_mktsegment")
      },
      Some("""SELECT s.strategy, c_mktsegment,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
             |    AS BIGINT) AS revenue_cents
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |CROSS JOIN (SELECT unnest(['broadcast', 'merge',
             |  'shuffle_hash']) AS strategy) s
             |GROUP BY 1, 2
             |ORDER BY strategy, c_mktsegment""".stripMargin)),

    QueryDef(
      // COHORT RETENTION MATRIX — users grouped by first-activity week,
      // tracked across subsequent weeks: the product-analytics staple.
      // Scale shape: one distinct pass collapses events to (user, week)
      // — the only fact-table shuffle — then cohorts are a user-keyed
      // min aggregate and the matrix a partial-aggregable count over
      // (cohort_week, offset). No window, no self-join over events;
      // everything after the first distinct is user-dictionary-sized.
      "q80_cohort_retention",
      (s, dir) => {
        import s.implicits._
        val uw = t(s, dir, "events")
          .select(trunc(to_date($"ts"), "week").as("week"), $"user_id")
          .distinct()
        val cohort = uw.groupBy($"user_id")
          .agg(min($"week").as("cohort_week"))
        uw.join(cohort, Seq("user_id"))
          .groupBy($"cohort_week",
            expr("datediff(week, cohort_week) DIV 7").as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy($"cohort_week", $"week_offset")
      },
      Some("""WITH du AS (
             |  SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE)
             |      AS week, user_id
             |  FROM events),
             |cohort AS (
             |  SELECT user_id, MIN(week) AS cohort_week
             |  FROM du GROUP BY user_id)
             |SELECT cohort_week,
             |  CAST((week - cohort_week) // 7 AS BIGINT) AS week_offset,
             |  COUNT(*) AS n_users
             |FROM du JOIN cohort USING (user_id)
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    QueryDef(
      // EXCHANGE REUSE — when one query references the same aggregate
      // twice (here: per-priority counts, and the max over them),
      // Spark must NOT scan and shuffle the fact table twice: the
      // identical shuffle subtree is planned once and the second
      // consumer reads a ReusedExchange. At 100 TB the difference is a
      // second full fact-table scan+shuffle vs a free pointer — worth
      // pinning so a refactor that breaks subtree identity (and thus
      // silently doubles the IO) fails CI. Plan-pinned in
      // PlanAuditSpec: `ReusedExchange` present.
      "q81_exchange_reuse",
      (s, dir) => {
        import s.implicits._
        val agg = t(s, dir, "orders")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
        val top = agg.agg(max($"n_orders").as("max_n"))
        agg.crossJoin(broadcast(top))
          .select($"o_orderpriority", $"n_orders", $"max_n",
            ($"n_orders" === $"max_n").as("is_top"))
          .orderBy($"o_orderpriority")
      },
      Some("""WITH a AS (
             |  SELECT o_orderpriority, COUNT(*) AS n_orders
             |  FROM orders GROUP BY 1),
             |m AS (SELECT MAX(n_orders) AS max_n FROM a)
             |SELECT o_orderpriority, n_orders, max_n,
             |  n_orders = max_n AS is_top
             |FROM a CROSS JOIN m
             |ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      // NULL-SAFE JOIN (<=>) — NULL keys MATCH each other instead of
      // silently dropping, the semantics a dimension join needs when
      // "unknown" is itself a category. EqualNullSafe is still an
      // equi-key for the planner, so this hashes/shuffles like any
      // equi-join (pinned: no nested loop) — the trap implementation
      // is coalesce-to-sentinel, which corrupts real sentinel values.
      // Rows whose key nulls out (1-URGENT here) must land in the
      // NULL dim bucket, proven by the oracle's IS NOT DISTINCT FROM.
      "q82_null_safe_join",
      (s, dir) => {
        import s.implicits._
        val facts = t(s, dir, "orders")
          .select(nullif($"o_orderpriority", lit("1-URGENT")).as("nk"),
            round($"o_totalprice" * 100, 0).cast("long").as("cents"))
        val dim = t(s, dir, "orders")
          .select(nullif($"o_orderpriority", lit("1-URGENT")).as("nk"))
          .distinct()
          .select($"nk", coalesce($"nk", lit("UNKNOWN")).as("bucket"))
        facts.join(dim, facts("nk") <=> dim("nk"))
          .groupBy($"bucket")
          .agg(count(lit(1)).as("n_orders"),
            sum($"cents").as("revenue_cents"))
          .orderBy($"bucket")
      },
      Some("""WITH facts AS (
             |  SELECT nullif(o_orderpriority, '1-URGENT') AS nk,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |dim AS (
             |  SELECT nk, COALESCE(nk, 'UNKNOWN') AS bucket
             |  FROM (SELECT DISTINCT nullif(o_orderpriority, '1-URGENT')
             |          AS nk FROM orders))
             |SELECT bucket, COUNT(*) AS n_orders,
             |  CAST(SUM(cents) AS BIGINT) AS revenue_cents
             |FROM facts JOIN dim ON facts.nk IS NOT DISTINCT FROM dim.nk
             |GROUP BY 1
             |ORDER BY bucket""".stripMargin))
  )
}
