package graft.queries

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seventh relational batch — scan/write/SQL-surface levers: runtime
  * bloom-filter join pruning (q91), dynamic partition overwrite (q92),
  * SQL-scripting bisection search (q93), behavioral-twin trajectory
  * similarity (q94), range-sharded total-order layout (q95), session
  * variables + EXECUTE IMMEDIATE (q96), the ANALYZE TABLE catalog-stats
  * audit (q97), and IDENTIFIER-parameterized SQL (q98).
  */
object Relational7 {
  import graft.Tables.t

  /** Set session confs for the duration of `body`, restoring the prior
    * value (or unsetting) afterwards — conf toggles inside a query fn
    * must never leak into the next query's planning.
    */
  private def withConfs[A](s: SparkSession, kv: (String, String)*)(
      body: => A): A = {
    val prev = kv.map { case (k, _) => k -> s.conf.getOption(k) }
    kv.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** The lazy join q91 measures, exposed for the plan pin: lineitem
    * (application side) x a selectively-filtered orders slice (creation
    * side). Under the runtime-bloom confs Spark builds a bloom filter
    * from the filtered orderkeys and applies `bloom_filter_might_contain`
    * on lineitem BEFORE its shuffle — at 100 TB that turns a full
    * fact-table shuffle into a ~1%-of-rows shuffle, which is the entire
    * point of the feature.
    */
  private[graft] def bloomJoinFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urgent97 = t(s, dir, "orders")
      .filter($"o_orderpriority" === "1-URGENT" &&
        year($"o_orderdate") === 1997)
      .select($"o_orderkey", month($"o_orderdate").as("o_month"))
    t(s, dir, "lineitem")
      .select($"l_orderkey",
        round($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100, 0)
          .cast("long").as("cents"))
      .join(urgent97, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_month")
      .agg(count(lit(1)).as("n_items"), sum($"cents").as("revenue_cents"))
      .orderBy($"o_month")
  }

  private[graft] val bloomConfs: Seq[(String, String)] = Seq(
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // the default 10GB application-side floor assumes a warehouse-sized
    // fact scan; at fixture scale it must come down for the rule to see
    // the same shape it would at 100 TB
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
      -> "1KB",
    // force the shuffle join the filter exists to prune (broadcast would
    // make the bloom redundant, and the rule correctly skips it)
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  def defs: Seq[QueryDef] = Seq(

    QueryDef(
      // RUNTIME BLOOM-FILTER JOIN PRUNING — Spark's InjectRuntimeFilter:
      // a selective dimension-side filter becomes a bloom filter over the
      // join keys, applied to the fact side BEFORE its shuffle. The fn
      // executes the join eagerly under the confs (so Verify and Bench
      // both time the bloom-pruned plan) and returns the <=12-row result
      // as a local frame — bounded metadata, the q89-style eager pattern.
      // The plan pin (Relational7Spec) asserts bloom_filter_might_contain
      // actually fires; the oracle replays the plain join, proving the
      // filter is a pure no-false-negative optimization.
      "q91_runtime_bloom_filter",
      (s, dir) => {
        val rows = withConfs(s, bloomConfs: _*) {
          bloomJoinFrame(s, dir).collect()
        }
        s.createDataFrame(
          java.util.Arrays.asList(rows: _*),
          bloomJoinFrame(s, dir).schema)
      },
      Some("""SELECT CAST(month(o_orderdate) AS INT) AS o_month,
             |  COUNT(*) AS n_items,
             |  CAST(SUM(CAST(round(
             |    l_extendedprice * (1.0 - l_discount) * 100, 0)
             |    AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE o_orderpriority = '1-URGENT'
             |  AND year(o_orderdate) = 1997
             |GROUP BY 1
             |ORDER BY o_month""".stripMargin)),

    QueryDef(
      // DYNAMIC PARTITION OVERWRITE — the lakehouse rewrite contract: a
      // second overwrite-mode write touching only SOME partitions must
      // replace exactly those and leave every other partition intact
      // (static mode would truncate the whole table). Here the full
      // orders table lands partitioned by priority, then a dynamic
      // overwrite rewrites just the URGENT and HIGH partitions down to
      // their 1997+ slice; the read-back report proves 3-MEDIUM..5-LOW
      // survived untouched. At 100 TB this is the daily idempotent
      // backfill primitive: rewrite the partitions a late upstream
      // touched, never the table. The oracle replays the expected final
      // state from the source table.
      "q92_dynamic_partition_overwrite",
      (s, dir) => {
        import s.implicits._
        val root = new java.io.File(scratchRoot, "dpo").getPath
        val base = t(s, dir, "orders").select($"o_orderkey",
          year($"o_orderdate").as("o_year"),
          round($"o_totalprice" * 100, 0).cast("long").as("cents"),
          $"o_orderpriority")
        base.write.partitionBy("o_orderpriority")
          .mode("overwrite").parquet(root)
        withConfs(s,
          "spark.sql.sources.partitionOverwriteMode" -> "dynamic") {
          base.filter($"o_orderpriority".isin("1-URGENT", "2-HIGH") &&
              $"o_year" >= 1997)
            .write.partitionBy("o_orderpriority")
            .mode("overwrite").parquet(root)
        }
        s.read.parquet(root)
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n_orders"),
            sum($"cents").as("total_cents"),
            min($"o_year").as("min_year"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |    AS BIGINT) AS total_cents,
             |  CAST(MIN(year(o_orderdate)) AS INT) AS min_year
             |FROM orders
             |WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |   OR year(o_orderdate) >= 1997
             |GROUP BY 1
             |ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      // SQL SCRIPTING (Spark 4 BEGIN..END, SQL/PSM): a DECLARE + WHILE
      // bisection finds the smallest whole-dollar threshold whose
      // at-or-above order count fits a 10%-of-table budget — the
      // parameter-search shape (alert thresholds, retention cutoffs)
      // that otherwise leaves SQL for a driver-side loop. Scale
      // discipline inside the script: the fact table folds ONCE into a
      // (dollars, cnt) value dictionary temp view; every loop iteration
      // aggregates the dictionary, never the facts: ~20 bisection probes
      // cost ~20 single-partition cached-dictionary scans (the entry's
      // wall time is per-statement Catalyst latency — invariant in data
      // size). The oracle computes the same threshold analytically (the
      // (target+1)-th largest value + 1), proving the iterative search
      // lands on the closed-form answer.
      "q93_sql_scripting",
      (s, dir) => {
        graft.Tables.t(s, dir, "orders").createOrReplaceTempView("orders")
        withConfs(s, "spark.sql.scripting.enabled" -> "true") {
          s.sql(
            """BEGIN
              |  DECLARE total BIGINT;
              |  DECLARE target BIGINT;
              |  DECLARE lo BIGINT DEFAULT 0;
              |  DECLARE hi BIGINT;
              |  CREATE OR REPLACE TEMPORARY VIEW dollar_dict AS
              |    SELECT /*+ COALESCE(1) */
              |           CAST(round(o_totalprice * 100, 0) AS BIGINT)
              |             DIV 100 AS dollars,
              |           COUNT(*) AS cnt
              |    FROM orders GROUP BY 1;
              |  CACHE TABLE dollar_dict;
              |  SET total = (SELECT SUM(cnt) FROM dollar_dict);
              |  SET target = total DIV 10;
              |  SET hi = (SELECT MAX(dollars) + 1 FROM dollar_dict);
              |  WHILE hi - lo > 1 DO
              |    -- ONE statement per probe (r16): each scripted
              |    -- statement is a full Catalyst execution (~60-130 ms
              |    -- data-size-invariant, profile in plans/r16/
              |    -- q93_profile_jobs_before.txt), so the probe + both
              |    -- updates ride a single multi-assignment SET instead
              |    -- of SET mid / SET n_ge / IF-SET (3 executions): the
              |    -- bisection invariant (n_ge(lo) > target >= n_ge(hi))
              |    -- and every iterate are unchanged
              |    SET (lo, hi) = (
              |      SELECT IF(n_ge > target, mid, lo),
              |             IF(n_ge > target, hi, mid)
              |      FROM (SELECT (lo + hi) DIV 2 AS mid,
              |              (SELECT COALESCE(SUM(cnt), 0) FROM dollar_dict
              |               WHERE dollars >= (lo + hi) DIV 2) AS n_ge));
              |  END WHILE;
              |  SELECT total, target, hi AS threshold_dollars,
              |    (SELECT COALESCE(SUM(cnt), 0) FROM dollar_dict
              |     WHERE dollars >= hi) AS n_above;
              |END""".stripMargin)
        }
      },
      Some("""WITH cents AS (
             |  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) // 100
             |    AS c
             |  FROM orders),
             |t AS (
             |  SELECT COUNT(*) AS total, COUNT(*) // 10 AS target
             |  FROM cents),
             |kth AS (
             |  SELECT c AS boundary FROM (
             |    SELECT c, row_number() OVER (ORDER BY c DESC) AS rn
             |    FROM cents)
             |  WHERE rn = (SELECT target + 1 FROM t))
             |SELECT t.total, t.target,
             |  kth.boundary + 1 AS threshold_dollars,
             |  (SELECT COUNT(*) FROM cents
             |   WHERE c >= kth.boundary + 1) AS n_above
             |FROM t, kth""".stripMargin)),

    QueryDef(
      // BEHAVIORAL-TWIN SEARCH (trajectory similarity, cf. REPOSE/ICDE'21
      // in PAPERS.md): each user's event stream folds to a 7-dim weekday
      // spending profile in integer ppm; the nearest neighbor under
      // exact integer L2 is found WITHIN the user's quantized profile
      // cell — the trie/reference-point discipline: candidates come from
      // an equi-join on the coarse cell signature, never an all-pairs
      // scan, and cells above a population cap are excluded by
      // AGGREGATION (the p08 bucket-cap shape) so no hot cell can funnel
      // a task. Everything is integer (ppm shares, squared distances),
      // the argmin is the counts->min->join-back->min-tie-break ladder
      // (q83's shape, no window), and the oracle replays cell blocking,
      // cap and distances verbatim — including which neighbors blocking
      // cannot see.
      "q94_behavior_twins",
      (s, dir) => {
        import s.implicits._
        val ev = t(s, dir, "events")
          .select($"user_id", dayofweek($"ts").as("dow"),
            round($"value" * 100, 0).cast("long").as("cents"))
        val aggs = sum($"cents").as("tot") +:
          (1 to 7).map(d =>
            sum(when($"dow" === d, $"cents").otherwise(0L)).as(s"c$d"))
        val prof = ev.groupBy($"user_id")
          .agg(aggs.head, aggs.tail: _*)
          .filter($"tot" > 0)
          .select($"user_id" +:
            (1 to 7).map(d => expr(s"c$d * 1000000 DIV tot").as(s"p$d")): _*)
        val cell = concat_ws(",",
          (1 to 7).map(d => expr(s"p$d DIV 100000")): _*)
        // users-sized profile dictionary feeds three consumers (cell
        // census, pair build x2, argmin join-back): cache it so the
        // 600k-row fact aggregation runs once, not per consumer — the
        // q89 explicit-materialization discipline (Bench/Verify clear
        // the cache after every query)
        val sig = prof.withColumn("cell", cell).cache()
        val keptCells = sig.groupBy($"cell")
          .agg(count(lit(1)).as("m"))
          .filter($"m" >= 2 && $"m" <= 100)
          .select($"cell")
        val kept = sig.join(keptCells, Seq("cell"))
        val a = kept.select($"cell" +: $"user_id".as("ua") +:
          (1 to 7).map(d => col(s"p$d").as(s"a$d")): _*)
        val b = kept.select($"cell" +: $"user_id".as("ub") +:
          (1 to 7).map(d => col(s"p$d").as(s"b$d")): _*)
        val dist2 = (1 to 7).map(d =>
          (col(s"a$d") - col(s"b$d")) * (col(s"a$d") - col(s"b$d")))
          .reduce(_ + _)
        val pairs = a.join(b, Seq("cell"))
          .filter($"ua" =!= $"ub")
          .select($"ua", $"ub", dist2.as("d2"))
        val best = pairs.groupBy($"ua").agg(min($"d2").as("best_d2"))
        pairs.join(best, Seq("ua"))
          .filter($"d2" === $"best_d2")
          .groupBy($"ua".as("user_id"), $"best_d2".as("dist2"))
          .agg(min($"ub").as("twin_id"))
          .select($"user_id", $"twin_id", $"dist2")
          .orderBy($"user_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, dayofweek(ts) + 1 AS dow,
             |    CAST(round(value * 100, 0) AS BIGINT) AS cents
             |  FROM events),
             |prof AS (
             |  SELECT user_id, SUM(cents) AS tot,
             |    SUM(CASE WHEN dow = 1 THEN cents ELSE 0 END) AS c1,
             |    SUM(CASE WHEN dow = 2 THEN cents ELSE 0 END) AS c2,
             |    SUM(CASE WHEN dow = 3 THEN cents ELSE 0 END) AS c3,
             |    SUM(CASE WHEN dow = 4 THEN cents ELSE 0 END) AS c4,
             |    SUM(CASE WHEN dow = 5 THEN cents ELSE 0 END) AS c5,
             |    SUM(CASE WHEN dow = 6 THEN cents ELSE 0 END) AS c6,
             |    SUM(CASE WHEN dow = 7 THEN cents ELSE 0 END) AS c7
             |  FROM ev GROUP BY user_id HAVING SUM(cents) > 0),
             |pp AS (
             |  SELECT user_id,
             |    c1 * 1000000 // tot AS p1, c2 * 1000000 // tot AS p2,
             |    c3 * 1000000 // tot AS p3, c4 * 1000000 // tot AS p4,
             |    c5 * 1000000 // tot AS p5, c6 * 1000000 // tot AS p6,
             |    c7 * 1000000 // tot AS p7
             |  FROM prof),
             |sig AS (
             |  SELECT *,
             |    CAST(p1 // 100000 AS VARCHAR) || ',' ||
             |    CAST(p2 // 100000 AS VARCHAR) || ',' ||
             |    CAST(p3 // 100000 AS VARCHAR) || ',' ||
             |    CAST(p4 // 100000 AS VARCHAR) || ',' ||
             |    CAST(p5 // 100000 AS VARCHAR) || ',' ||
             |    CAST(p6 // 100000 AS VARCHAR) || ',' ||
             |    CAST(p7 // 100000 AS VARCHAR) AS cell
             |  FROM pp),
             |kept AS (
             |  SELECT s.* FROM sig s JOIN (
             |    SELECT cell FROM sig GROUP BY cell
             |    HAVING COUNT(*) BETWEEN 2 AND 100) kc USING (cell)),
             |pairs AS (
             |  SELECT a.user_id AS ua, b.user_id AS ub,
             |    (a.p1-b.p1)*(a.p1-b.p1) + (a.p2-b.p2)*(a.p2-b.p2) +
             |    (a.p3-b.p3)*(a.p3-b.p3) + (a.p4-b.p4)*(a.p4-b.p4) +
             |    (a.p5-b.p5)*(a.p5-b.p5) + (a.p6-b.p6)*(a.p6-b.p6) +
             |    (a.p7-b.p7)*(a.p7-b.p7) AS d2
             |  FROM kept a JOIN kept b USING (cell)
             |  WHERE a.user_id <> b.user_id),
             |best AS (
             |  SELECT ua, MIN(d2) AS best_d2 FROM pairs GROUP BY ua)
             |SELECT p.ua AS user_id, MIN(p.ub) AS twin_id,
             |  CAST(p.d2 AS BIGINT) AS dist2
             |FROM pairs p JOIN best ON p.ua = best.ua
             |  AND p.d2 = best.best_d2
             |GROUP BY p.ua, p.d2
             |ORDER BY user_id""".stripMargin)),

    QueryDef(
      // RANGE-SHARDED TOTAL-ORDER LAYOUT — the third physical-layout
      // primitive next to hash buckets (q38) and Z-order (q52): shard
      // the fact table into B contiguous, near-equal value ranges whose
      // boundaries are EXACT quantiles (no sampled RangePartitioner —
      // sampling is nondeterministic and un-oracle-able), sort within
      // each shard, land it as real partitioned parquet, and emit the
      // manifest (per-shard count/min/max + a contiguity proof) a
      // range-pruned reader needs. Scale shape: boundaries come from the
      // value DICTIONARY (cumulative window over distinct values only —
      // the q85/p83 bounded-window discipline), the shard id is a pure
      // expression on the dictionary joined back on the value key, and
      // the manifest window runs over B rows. The oracle replays
      // boundary arithmetic, shard assignment and the manifest verbatim.
      "q95_range_sharded_layout",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val B = 8
        val root = new java.io.File(scratchRoot, "rangeshard").getPath
        val o = t(s, dir, "orders").select($"o_orderkey",
          round($"o_totalprice" * 100, 0).cast("long").as("cents"))
        val dict = o.groupBy($"cents").agg(count(lit(1)).as("c"))
        // cumulative count over the VALUE DOMAIN — a cents dictionary
        // is ~10^6-10^7 distinct values at 100x scale, so the cumsum
        // runs as RankOps.prefixSum (range-partitioned three-level, no
        // single-task global window), not Window.orderBy
        val cum = graft.operators.RankOps.prefixSum(
          dict, Seq($"cents"), $"c", "cum")
        val tot = dict.agg(sum($"c").as("n"))
        // shard(v) = #boundaries at or below v; boundary k is the
        // smallest value whose cumulative count reaches ceil(n*k/B),
        // so the membership test needs only cum(v)
        val shardOf = (1 until B).map(k =>
          when($"cum" >= expr(s"(n * $k + ${B - 1}) DIV $B"), 1)
            .otherwise(0)).reduce(_ + _)
        val shardMap = cum.crossJoin(broadcast(tot))
          .select($"cents", shardOf.as("shard"))
        o.join(shardMap, Seq("cents"))
          .repartition($"shard")
          .sortWithinPartitions($"shard", $"cents", $"o_orderkey")
          .write.partitionBy("shard").mode("overwrite").parquet(root)
        val manifest = s.read.parquet(root)
          .groupBy($"shard".cast("int").as("shard"))
          .agg(count(lit(1)).as("n_rows"),
            min($"cents").as("min_cents"), max($"cents").as("max_cents"))
        manifest
          .withColumn("prev_max", lag($"max_cents", 1)
            .over(Window.orderBy($"shard"))) // B-row manifest window
          .select($"shard", $"n_rows", $"min_cents", $"max_cents",
            coalesce($"min_cents" >= $"prev_max", lit(true))
              .as("contiguous"))
          .orderBy($"shard")
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey,
             |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
             |  FROM orders),
             |dict AS (
             |  SELECT cents, COUNT(*) AS c FROM o GROUP BY cents),
             |cum AS (
             |  SELECT cents, c,
             |    SUM(c) OVER (ORDER BY cents
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM dict),
             |tot AS (SELECT SUM(c) AS n FROM dict),
             |sm AS (
             |  SELECT cents,
             |    (CASE WHEN cum >= (n * 1 + 7) // 8 THEN 1 ELSE 0 END +
             |     CASE WHEN cum >= (n * 2 + 7) // 8 THEN 1 ELSE 0 END +
             |     CASE WHEN cum >= (n * 3 + 7) // 8 THEN 1 ELSE 0 END +
             |     CASE WHEN cum >= (n * 4 + 7) // 8 THEN 1 ELSE 0 END +
             |     CASE WHEN cum >= (n * 5 + 7) // 8 THEN 1 ELSE 0 END +
             |     CASE WHEN cum >= (n * 6 + 7) // 8 THEN 1 ELSE 0 END +
             |     CASE WHEN cum >= (n * 7 + 7) // 8 THEN 1 ELSE 0 END)
             |      AS shard
             |  FROM cum, tot),
             |sharded AS (
             |  SELECT o.cents, sm.shard FROM o JOIN sm USING (cents)),
             |mf AS (
             |  SELECT CAST(shard AS INT) AS shard, COUNT(*) AS n_rows,
             |    MIN(cents) AS min_cents, MAX(cents) AS max_cents
             |  FROM sharded GROUP BY shard)
             |SELECT shard, n_rows, min_cents, max_cents,
             |  COALESCE(min_cents >= lag(max_cents)
             |    OVER (ORDER BY shard), TRUE) AS contiguous
             |FROM mf
             |ORDER BY shard""".stripMargin)),

    QueryDef(
      // SESSION VARIABLES + DYNAMIC SQL (Spark 4 DECLARE / SET VAR /
      // EXECUTE IMMEDIATE ... USING): a data-derived threshold lands in
      // a typed session variable (exact integer mean — SUM DIV COUNT,
      // no float), and a parameterized report template executes against
      // it — the governed-SQL shape (audited templates + bound
      // parameters, injection-safe by construction) that q90's literal
      // binding started. The oracle replays the threshold as a scalar
      // subquery, proving the variable indirection changes nothing.
      "q96_session_vars_dynamic_sql",
      (s, dir) => {
        graft.Tables.t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("DECLARE OR REPLACE graft_thr_cents BIGINT")
        s.sql("""SET VAR graft_thr_cents =
                |  (SELECT SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                |     DIV COUNT(*) FROM orders)""".stripMargin)
        s.sql("""EXECUTE IMMEDIATE
                |  'SELECT o_orderpriority,
                |     COUNT(*) AS n_above,
                |     CAST(MIN(o_orderkey) AS BIGINT) AS first_key
                |   FROM orders
                |   WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) > ?
                |   GROUP BY o_orderpriority
                |   ORDER BY o_orderpriority'
                |  USING graft_thr_cents""".stripMargin)
      },
      Some("""SELECT o_orderpriority,
             |  COUNT(*) AS n_above,
             |  CAST(MIN(o_orderkey) AS BIGINT) AS first_key
             |FROM orders
             |WHERE CAST(round(o_totalprice * 100, 0) AS BIGINT) >
             |  (SELECT SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |     // COUNT(*) FROM orders)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    QueryDef(
      // CATALOG STATISTICS / CBO FEEDSTOCK — ANALYZE TABLE ... COMPUTE
      // STATISTICS (table row count) FOR COLUMNS (ndv / nulls / min /
      // max): the numbers the cost-based optimizer reorders joins and
      // sizes broadcasts with at 100 TB, here read back from the catalog
      // and HASH-CHECKED against the data they claim to describe — a
      // stats pipeline that lies to the optimizer is worse than none.
      // (The ndv is HLL-estimated; at this cardinality — 5 priorities —
      // the sketch is exact, and the oracle asserts the true count.)
      // Bounded metadata only: the result is one catalog row.
      "q97_catalog_stats",
      (s, dir) => {
        import s.implicits._
        s.sql("DROP TABLE IF EXISTS graft_stats_orders")
        // a previous JVM's warehouse directory survives the in-memory
        // catalog; clear it or saveAsTable refuses the location
        locally {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles).foreach(_.foreach(rm))
            f.delete(): Unit
          }
          rm(new java.io.File(
            new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath,
            "graft_stats_orders"))
        }
        t(s, dir, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
          .write.mode("overwrite").saveAsTable("graft_stats_orders")
        s.sql("ANALYZE TABLE graft_stats_orders COMPUTE STATISTICS")
        s.sql("ANALYZE TABLE graft_stats_orders COMPUTE STATISTICS " +
          "FOR COLUMNS o_orderpriority, o_custkey")
        val meta = s.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier("graft_stats_orders"))
        val st = meta.stats.get
        val prio = st.colStats("o_orderpriority")
        val cust = st.colStats("o_custkey")
        Seq((st.rowCount.get.toLong,
          prio.distinctCount.get.toLong,
          prio.nullCount.get.toLong,
          cust.min.get.toString.toLong,
          cust.max.get.toString.toLong))
          .toDF("n_rows", "ndv_priority", "null_priority",
            "min_custkey", "max_custkey")
      },
      Some("""SELECT COUNT(*) AS n_rows,
             |  COUNT(DISTINCT o_orderpriority) AS ndv_priority,
             |  CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT)
             |    AS null_priority,
             |  MIN(o_custkey) AS min_custkey,
             |  MAX(o_custkey) AS max_custkey
             |FROM orders""".stripMargin)),

    QueryDef(
      // IDENTIFIER-PARAMETERIZED SQL — q90 bound VALUES, q96 bound them
      // through variables; IDENTIFIER(:p) binds NAMES (table, grouping
      // column) without string interpolation, closing the last SQL-
      // injection surface a templated report has. The oracle replays the
      // resolved literal query.
      "q98_identifier_binding",
      (s, dir) => {
        graft.Tables.t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT IDENTIFIER(:grp) AS grp, COUNT(*) AS n,
            |  CAST(MIN(IDENTIFIER(:key)) AS BIGINT) AS min_key
            |FROM IDENTIFIER(:tbl)
            |GROUP BY IDENTIFIER(:grp)
            |ORDER BY grp""".stripMargin,
          Map("grp" -> "o_orderpriority", "key" -> "o_orderkey",
            "tbl" -> "orders"))
      },
      Some("""SELECT o_orderpriority AS grp, COUNT(*) AS n,
             |  MIN(o_orderkey) AS min_key
             |FROM orders
             |GROUP BY o_orderpriority
             |ORDER BY grp""".stripMargin)),

    QueryDef(
      // SQL-STANDARD UNPIVOT — q23 melts wide->long with the stack()
      // table function; this is the declarative clause form (column
      // list -> (metric, value) rows, NULLs excluded per the standard),
      // over a per-priority aggregate so the unpivot is dictionary-
      // sized. DuckDB speaks the same clause, so the oracle is nearly
      // the identical statement — the point: a user's standard-SQL
      // UNPIVOT report ports verbatim.
      "q99_sql_unpivot",
      (s, dir) => {
        graft.Tables.t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderpriority, metric, val
            |FROM (
            |  SELECT o_orderpriority,
            |    COUNT(*) AS n_orders,
            |    CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
            |      AS BIGINT) AS total_cents,
            |    CAST(MIN(o_orderkey) AS BIGINT) AS first_key
            |  FROM orders GROUP BY o_orderpriority)
            |UNPIVOT (val FOR metric IN (n_orders, total_cents, first_key))
            |ORDER BY o_orderpriority, metric""".stripMargin)
      },
      Some("""SELECT o_orderpriority, metric, val
             |FROM (
             |  SELECT o_orderpriority,
             |    COUNT(*) AS n_orders,
             |    CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |      AS BIGINT) AS total_cents,
             |    CAST(MIN(o_orderkey) AS BIGINT) AS first_key
             |  FROM orders GROUP BY o_orderpriority)
             |UNPIVOT (val FOR metric IN (n_orders, total_cents, first_key))
             |ORDER BY o_orderpriority, metric""".stripMargin)),

    QueryDef(
      // GROUP BY ALL / ORDER BY ALL (SQL-standard-adjacent shorthand
      // both engines implement identically): every non-aggregate select
      // item becomes a grouping key by position — the ergonomic form
      // analysts reach for first, and an easy place for engines to
      // disagree on which items are "non-aggregate" (the expression
      // o_orderstatus || '/' || o_orderpriority must group, the CASE
      // inside SUM must not). Money stays in integer cents.
      "q100_group_by_all",
      (s, dir) => {
        graft.Tables.t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(
          """SELECT o_orderstatus || '/' || o_orderpriority AS grp,
            |  year(o_orderdate) AS y,
            |  COUNT(*) AS n,
            |  CAST(SUM(CASE WHEN o_totalprice > 100000
            |    THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
            |    ELSE 0 END) AS BIGINT) AS big_cents
            |FROM orders
            |WHERE year(o_orderdate) = 1995
            |GROUP BY ALL
            |ORDER BY ALL""".stripMargin)
      },
      Some("""SELECT o_orderstatus || '/' || o_orderpriority AS grp,
             |  year(o_orderdate) AS y,
             |  COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN o_totalprice > 100000
             |    THEN CAST(round(o_totalprice * 100, 0) AS BIGINT)
             |    ELSE 0 END) AS BIGINT) AS big_cents
             |FROM orders
             |WHERE year(o_orderdate) = 1995
             |GROUP BY ALL
             |ORDER BY ALL""".stripMargin)),

    QueryDef(
      // RECURSIVE CTE (WITH RECURSIVE, new SQL surface in Spark 4.1):
      // iterative graph traversal stated declaratively — the hierarchy
      // rollup (org charts, BOM explosions, category trees) that
      // previously needed a driver-side loop of joins. The tree is the
      // decimal trie over customer keys (parent = key DIV 10): depth
      // log10(N), so 100 TB of keys still terminates in ~10 rounds —
      // each round is ONE equi-join of the frontier against the edge
      // table on the parent key (partitioned join, no driver state;
      // spark.sql.cteRecursionLevelLimit=100 default bounds runaway
      // recursion). Both engines run the IDENTICAL statement: a user's
      // standard recursive SQL ports verbatim. Money folds as integer
      // cents; floor(k/10) is used for portability of the STATEMENT
      // (both engines define floor identically; note p118's measured
      // fact that DuckDB's integer // actually TRUNCATES like Spark's
      // DIV — the floor-vs-truncate divergence exists only against
      // DuckDB's DOUBLE //). Roots are the
      // single-digit keys and the recursive member EXCLUDES them: keys
      // start at 0 and parent(0)=0 is a fixpoint — without the ck>=10
      // guard both engines loop to their recursion limit (found live;
      // the termination proof for any recursive CTE must name the
      // strictly-shrinking quantity, here digits(ck)).
      "q101_recursive_hierarchy",
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        s.sql(recursiveHierarchySql)
      },
      Some(recursiveHierarchySql)),

    QueryDef(
      // SQL PIPE SYNTAX (|>, new surface in Spark 4.x; GoogleSQL
      // pipe-operator lineage, public): the same logical plan a nested
      // SELECT states, but written as a top-to-bottom operator chain —
      // scan |> filter |> aggregate |> extend |> filter-on-aggregate
      // |> project |> order. Semantically load-bearing details pinned
      // here: AGGREGATE ... GROUP BY emits grouping keys THEN
      // aggregates; a WHERE after AGGREGATE filters aggregate output
      // (HAVING without the keyword); EXTEND appends a computed column
      // referencing aggregate aliases. The oracle is the equivalent
      // classic SELECT — proving the pipe chain compiles to the SAME
      // result, which is exactly what a user migrating between the two
      // spellings needs to trust. Money folds as integer cents; the
      // revenue ratio is scaled-integer DIV (floor == truncate on
      // non-negatives).
      "q102_pipe_syntax",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql(
          """FROM orders
            ||> WHERE year(o_orderdate) BETWEEN 1994 AND 1996
            ||> AGGREGATE COUNT(*) AS n_orders,
            |     SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS cents
            |     GROUP BY o_orderpriority,
            |       CAST(year(o_orderdate) AS BIGINT) AS y
            ||> EXTEND cents DIV n_orders AS avg_cents
            ||> WHERE n_orders >= 5
            ||> SELECT o_orderpriority, y, n_orders, cents, avg_cents
            ||> ORDER BY o_orderpriority, y""".stripMargin)
      },
      Some("""SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS y,
             |  COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             |    AS cents,
             |  CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT))
             |    // COUNT(*) AS BIGINT) AS avg_cents
             |FROM orders
             |WHERE year(o_orderdate) BETWEEN 1994 AND 1996
             |GROUP BY o_orderpriority, year(o_orderdate)
             |HAVING COUNT(*) >= 5
             |ORDER BY o_orderpriority, y""".stripMargin)),

    QueryDef(
      // TIME data type (new in Spark 4.1, behind spark.sql.timeType
      // .enabled; cast-from-timestamp is NOT wired as of 4.1.2 —
      // re-probed each round on the shipped jars, last in round 12
      // (2026-08-16, spark-sql 4.1.2/Scala 2.13.17): CAST(TIMESTAMP
      // AS TIME) still fails analysis with
      // DATATYPE_MISMATCH.CAST_WITHOUT_SUGGESTION — so the
      // time-of-day derives via make_time over the extracted
      // h/m/s, whole seconds on both engines, since the two truncate
      // fractional seconds differently. Revisit when the runtime
      // moves past 4.1.2). Exercises TIME construction,
      // literals, ordering (min/max), and range comparison — the
      // wall-clock-of-day analytics (business-hours windows, shift
      // buckets) that timestamps answer awkwardly across days. TIME
      // round-trips Spark -> parquet (TIME_MICROS) -> DuckDB natively;
      // both render whole-second times identically for the hash gate.
      "q103_time_type",
      (s, dir) => {
        import s.implicits._
        // the TIME gate is consulted at parse time AND again at
        // execution (measured: restoring the conf after eager plan
        // construction fails the run with UNSUPPORTED_TIME_TYPE), so a
        // per-query set-and-restore cannot work — the flag must be on
        // for the session. It is set ONCE at bootstrap (Bench, Verify,
        // SparkTestSession all do), never mutated mid-run, so no query
        // silently changes its neighbors' type-resolution behavior.
        require(s.conf.get("spark.sql.timeType.enabled", "false") == "true",
          "q103 needs spark.sql.timeType.enabled=true, set at session " +
            "bootstrap (see Bench/Verify) — never mid-run")
        t(s, dir, "events")
          .withColumn("t", expr(
            "make_time(hour(ts), minute(ts), CAST(second(ts) AS DECIMAL(16,6)))"))
          .groupBy($"event_type")
          .agg(
            min($"t").as("first_time"),
            max($"t").as("last_time"),
            count(when(
              expr("t >= TIME'09:00:00' AND t < TIME'17:00:00'"), 1))
              .as("business_hits"),
            count(lit(1)).as("n"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
             |  MIN(t) AS first_time, MAX(t) AS last_time,
             |  CAST(COUNT(CASE WHEN t >= TIME '09:00:00'
             |    AND t < TIME '17:00:00' THEN 1 END) AS BIGINT)
             |    AS business_hits,
             |  COUNT(*) AS n
             |FROM (
             |  SELECT event_type,
             |    make_time(date_part('hour', ts), date_part('minute', ts),
             |      CAST(date_part('second', ts) AS DOUBLE)) AS t
             |  FROM events)
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    QueryDef(
      // BENFORD FIRST-DIGIT AUDIT (Benford 1938 / Newcomb 1881,
      // public — the data-forensics screen for fabricated or
      // double-counted financial columns): order totals spanning two+
      // orders of magnitude should lead with digit d at frequency
      // log10(1 + 1/d); a synthetic or corrupted feed drifts.
      // Exactness: the first digit comes from INTEGER CENTS (the q01
      // money discipline — double routes through DECIMAL(18,2) once)
      // rendered via integer→string, which both engines print
      // identically (a double→string leading digit would be at the
      // mercy of each engine's float formatter); multiplying by 100
      // cannot change a leading digit. The Benford expectations ride
      // as round(10^6·log10(1+1/d)) LITERALS (the p121 discount-table
      // discipline — no runtime log in either plan), and the
      // total-variation distance Σ|obs−exp| DIV 2 rides every row.
      // Scale shape: one partial-aggregable digit count (9 groups),
      // then digit-dictionary arithmetic.
      "q104_benford_audit",
      (s, dir) => {
        import s.implicits._
        val benford = (1 to 9).map(d =>
          (d.toLong, math.round(1e6 * math.log10(1.0 + 1.0 / d))))
        val obs = t(s, dir, "orders")
          .select(substring(
            expr("CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100" +
              " AS BIGINT) AS STRING)"), 1, 1).cast("long").as("digit"))
          .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
        val withExp = benford.toDF("digit", "benford_ppm")
          .join(obs, Seq("digit"), "left")
          .select($"digit",
            coalesce($"n_obs", lit(0L)).as("n_obs"), $"benford_ppm")
        val tot = withExp.agg(sum($"n_obs").as("n"))
        val rows = withExp.crossJoin(broadcast(tot))
          .select($"digit", $"n_obs",
            expr("n_obs * 1000000 DIV n").as("obs_ppm"), $"benford_ppm",
            expr("abs(n_obs * 1000000 DIV n - benford_ppm)").as("gap_ppm"))
          .persist() // output + the tvd summary
        val tvd = rows.agg(
          expr("sum(gap_ppm) DIV 2").as("tvd_ppm"))
        rows.crossJoin(broadcast(tvd))
          .orderBy($"digit")
      },
      Some {
        val benfordVals = (1 to 9).map(d =>
          s"($d, ${math.round(1e6 * math.log10(1.0 + 1.0 / d))})")
          .mkString(", ")
        s"""WITH benford(digit, benford_ppm) AS (VALUES $benfordVals),
           |obs AS (
           |  SELECT CAST(substr(CAST(CAST(
           |      CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
           |      AS VARCHAR), 1, 1) AS BIGINT) AS digit,
           |    CAST(COUNT(*) AS BIGINT) AS n_obs
           |  FROM orders GROUP BY 1),
           |w AS (
           |  SELECT b.digit, COALESCE(o.n_obs, 0) AS n_obs, b.benford_ppm
           |  FROM benford b LEFT JOIN obs o USING (digit)),
           |tot AS (SELECT SUM(n_obs) AS n FROM w),
           |rows_ AS (
           |  SELECT w.digit, w.n_obs,
           |    CAST(w.n_obs * 1000000 // tot.n AS BIGINT) AS obs_ppm,
           |    CAST(w.benford_ppm AS BIGINT) AS benford_ppm,
           |    CAST(ABS(w.n_obs * 1000000 // tot.n - w.benford_ppm)
           |      AS BIGINT) AS gap_ppm
           |  FROM w CROSS JOIN tot),
           |tvd AS (SELECT CAST(SUM(gap_ppm) // 2 AS BIGINT) AS tvd_ppm
           |        FROM rows_)
           |SELECT digit, n_obs, obs_ppm, benford_ppm, gap_ppm, tvd.tvd_ppm
           |FROM rows_ CROSS JOIN tvd
           |ORDER BY digit""".stripMargin
      })
  )

  /** Shared verbatim by the Spark entry and the DuckDB oracle — the
    * portability IS the point (see q101).
    */
  private val recursiveHierarchySql: String =
    """WITH RECURSIVE cust AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS ck,
      |    CAST(floor(c_custkey / 10) AS BIGINT) AS parent,
      |    CAST(round(c_acctbal * 100, 0) AS BIGINT) AS cents
      |  FROM customer),
      |chain(ck, root, depth, cents) AS (
      |  SELECT ck, ck, 0, cents FROM cust WHERE ck < 10
      |  UNION ALL
      |  SELECT c.ck, ch.root, ch.depth + 1, c.cents
      |  FROM cust c JOIN chain ch ON c.parent = ch.ck
      |  WHERE c.ck >= 10)
      |SELECT CAST(depth AS BIGINT) AS depth,
      |  CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |  CAST(COUNT(DISTINCT root) AS BIGINT) AS n_trees,
      |  CAST(SUM(cents) AS BIGINT) AS cents,
      |  CAST(MAX(ck) AS BIGINT) AS max_key
      |FROM chain
      |GROUP BY depth
      |ORDER BY depth""".stripMargin

  /** Per-process scratch root (pid-keyed, cleaned on JVM exit). */
  private lazy val scratchRoot: String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_r7_scratch_${ProcessHandle.current().pid()}")
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(d)
    }
    d.getPath
  }
}
