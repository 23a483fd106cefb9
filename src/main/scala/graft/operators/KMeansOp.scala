package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed Lloyd's k-means over an embedding column — the semantic
  * clustering pass of a training-data pipeline (topic balancing, corpus
  * mixture auditing) — built to be ORACLE-EXACT, not merely
  * self-gated: every quantity that crosses an engine boundary is exact
  * INTEGER arithmetic over quantE9-quantized elements, so DuckDB
  * replays the identical iterations and the hash gate applies to an
  * ITERATIVE ML op.
  *
  * The trick that makes iterations bit-reproducible: centroids never
  * materialize as rounded means. Each element quantizes ONCE as
  * x9 = floor(double(x)·1e9) (the dec_cosine_e6 quantization — the one
  * IEEE multiply both engines evaluate bit-identically, with tie-free
  * floor); a cluster is the exact pair (S = integer sums of x9,
  * n = member count), and the squared-distance comparison multiplies
  * through by n^2:
  *   argmin_c  sum_d (x_d9 - S_cd/n_c)^2
  *     = argmin_c  [ sum_d (n_c x_d9 - S_cd)^2 ] / n_c^2
  * The bracket is EXACT integer (e18 units); only the final ratio is a
  * double — ONE cast and ONE IEEE division from IDENTICAL integers,
  * deterministic in both engines even at an exact tie (ties break to
  * the lowest cluster id on both sides).
  *
  * Round-13 rework, retiring the last documented float-portability
  * class: through round 12 this operator quantized via
  * `CAST(float AS DECIMAL(18,9))` on both sides — which is NOT
  * engine-portable (DuckDB rounds the float's shortest ~9-digit repr
  * where Spark rounds the exact double; ~75% of fixture elements
  * differed in the last digit, energies by ~1e-8 — absorbed only
  * because argmin margins and the rounded render sat far above it).
  * With integer e9 energies the entry and its oracle compute the SAME
  * integers, so no near-tie can split the engines at any scale.
  *
  * Scale shape: assignment is a pure map against k*(dims) literals
  * (same bounded-codebook discipline as IVF/PQ); the update is ONE
  * (cluster, dim) partial aggregation collecting k*dims rows per round.
  * Bounds, all loud: per-cluster energies hold DECIMAL(38,0)/HUGEINT
  * to dims·(2·n·A·1e9)² < 1e38 — for 64-dim unit-scale embeddings
  * that is ~2.6e8 members per cluster; the driver-side Long sums hold
  * to n·A ≤ 9.2e9 (longValueExact raises past it). Past those, switch
  * the update to double means and drop the oracle — the mechanism is
  * unchanged.
  *
  * Seeds are the k lowest-id vectors (deterministic, no RNG — the
  * ivfBuild/pqBuild discipline). All vectors must share one
  * dimensionality: a ragged vector nulls its energies here but
  * inner-joins per-dim in the oracle — ragged corpora are out of
  * contract (the embeddings table is uniformly 64-dim).
  */
object KMeansOp {

  private val D38 = DecimalType(38, 0)

  /** Exact cluster state: per-dim e9 integer sums + counts. */
  case class Model(sums: Array[Array[Long]], counts: Array[Long]) {
    def k: Int = sums.length
  }

  /** (id, vec, cluster, ee, n): nearest cluster by the cross-multiplied
    * ratio, ties to the lowest cluster id; `ee` is the chosen cluster's
    * exact E value (e18 integer units, DECIMAL(38,0)) and `n` its
    * model count (both feed the final stats).
    *
    * The energy array E_c = sum_d (n_c x_d9 - S_cd)^2 comes from the
    * native [[graft.functions.KMeansEnergies]] kernel — exact
    * BigInteger arithmetic over quantE9 elements, bit-identical to the
    * declarative integer chain (pinned by KMeansEnergiesSpec) and to
    * the HUGEINT oracle CTEs.
    */
  def assign(emb: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val es = graft.functions.KMeansFunctions.kmeans_energies(
      col(vecCol),
      model.sums.map(_.toSeq).toSeq,
      model.counts.toSeq)
    val ratios = array(model.counts.indices.map { c =>
      element_at(col("__es"), c + 1).cast("double") /
        lit(model.counts(c) * model.counts(c))
    }: _*)
    val chosen = (array_position(col("__r"), array_min(col("__r"))) - 1).cast("int")
    emb.filter(col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol), es.as("__es"))
      .withColumn("__r", ratios)
      .withColumn("cluster", chosen)
      .select(col(idCol), col(vecCol), col("cluster"),
        element_at(col("__es"), col("cluster") + 1).as("ee"),
        element_at(typedLit(model.counts.toSeq), col("cluster") + 1).as("n"))
  }

  /** `iters` Lloyd rounds from the lowest-id seeds. Each round collects
    * exactly k*dims (sum, count) rows — bounded metadata, never data.
    * An empty cluster keeps its previous (S, n), same as the oracle's
    * COALESCE arm.
    */
  def fit(emb: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): Model = {
    require(k >= 1 && iters >= 0, "k/iters must be >= 1/0")
    val seeds = emb.filter(col(vecCol).isNotNull)
      .orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(seeds.nonEmpty, "kmeans: no non-null vectors")
    // float -> e9 integer via the quantE9 discipline (tie-free floor
    // of the identical IEEE multiply — both engines and this driver
    // compute the same Long)
    def quantSeed(f: Float): Long = {
      val q = math.floor(f.toDouble * 1e9)
      require(q < 9.223372036854776e18 && q >= -9.223372036854776e18,
        s"kmeans seed element out of the e9 Long range: $f")
      q.toLong
    }
    var model = Model(
      seeds.map(_.map(quantSeed)),
      Array.fill(seeds.length)(1L))
    for (_ <- 1 to iters) {
      val rows = assign(emb, idCol, vecCol, model)
        .select(col("cluster"),
          posexplode(transform(col(vecCol),
            x => floor(x.cast("double") * lit(1e9)).cast("long")))
            .as(Seq("d", "x")))
        .groupBy(col("cluster"), col("d"))
        // sums ride DECIMAL(38,0) through the shuffle (no Long
        // wraparound mid-aggregation); the driver-side Long conversion
        // raises loudly past the documented n*A <= 9.2e9 bound
        .agg(sum(col("x").cast(D38)).as("sx"), count(lit(1)).as("n"))
        .collect()
      val sums = model.sums.map(_.clone())
      val counts = model.counts.clone()
      rows.groupBy(_.getInt(0)).foreach { case (c, rs) =>
        counts(c) = rs.head.getLong(3)
        rs.foreach(r => sums(c)(r.getInt(1)) =
          r.getDecimal(2).toBigInteger.longValueExact())
      }
      model = Model(sums, counts)
    }
    model
  }

  /** Per-cluster summary after `iters` rounds: size and mean squared
    * distance to the (exact) centroid in e6 integer units —
    * `mean_dist2_e6 = sum(E) DIV (n²·n_points·10¹²)` (E is e18, so the
    * divisor's 10¹² leaves e6) — pure integer floor division on
    * identical operands, no double anywhere on the rendered value.
    */
  def clusterStats(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 4,
      iters: Int = 3): DataFrame =
    clusterStats(emb, idCol, vecCol, fit(emb, idCol, vecCol, k, iters))

  /** [[clusterStats]] over an already-fitted model — lets callers share
    * one fit across entries (the model is plain data, safe to memoize).
    */
  def clusterStats(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      model: Model): DataFrame =
    clusterStatsAssigned(assign(emb, idCol, vecCol, model))

  /** The stats aggregation over an ALREADY-ASSIGNED frame (columns
    * cluster, ee, n — [[assign]]'s output): lets callers share one
    * materialized assignment across every consumer of the same labels
    * (the integer E kernel is the expensive pass, not this groupBy).
    *
    * BOUND — one factor of n_points TIGHTER than the per-energy
    * envelope: Σee over a cluster is ≤ n_points · max(ee), and each ee
    * is itself ~ n²·dist² in e18 units, so the sum scales as
    * n³·dims·4A²·10¹⁸ and crosses DECIMAL(38,0) at roughly 7·10⁵
    * members per cluster at A = 1 — far inside the per-row kernel's
    * own envelope. Past it Spark's non-ANSI decimal sum yields NULL
    * where the oracle's HUGEINT keeps going (HUGEINT holds to
    * ~1.7e38), so the overflow is made LOUD in-plan rather than left
    * as a silent NULL mean: the remedy at that scale is sharding the
    * stats aggregation (sum ee DIV n² per shard) or coarser quant.
    */
  def clusterStatsAssigned(assigned: DataFrame): DataFrame = {
    assigned
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"), count(col("ee")).as("__nE"),
        sum(col("ee")).as("__sumE"), first(col("n")).as("__n"))
      // nonnegative operands, so Spark DIV (trunc) == DuckDB // (floor)
      .select(col("cluster"), col("n_points"),
        // TWO distinct overflow causes produce a NULL sum, attributed
        // separately (ADVICE r14): (a) KMeansEnergies' per-row
        // DECIMAL(38,0) cast nulled some ee (count ee < n_points) —
        // the PER-ROW n²·dims·4A² envelope broke, report that, not a
        // phantom Σ overflow; (b) every ee non-null but their sum
        // wrapped the 38-digit cap — the n³ stats bound documented
        // above. Both stay LOUD: a NULL mean silently diverging from
        // the oracle's HUGEINT is the failure mode this guard exists
        // to prevent, and per-row overflow is the same class.
        when(col("__nE") < col("n_points"),
          raise_error(concat(
            lit("clusterStats: per-row energy overflowed DECIMAL(38,0)"),
            lit(" in cluster "), col("cluster").cast("string"),
            lit(" ("), (col("n_points") - col("__nE")).cast("string"),
            lit(" of "), col("n_points").cast("string"),
            lit(" rows NULLed by KMeansEnergies' n²·dims·4A² per-row "),
            lit("envelope) — coarsen the quantization or shrink A"))))
        .when(col("n_points") > 0 && col("__sumE").isNull,
          raise_error(concat(
            lit("clusterStats: Σ energy overflowed DECIMAL(38,0) for "),
            lit("cluster "), col("cluster").cast("string"),
            lit(" (n³ stats bound, ~7e5 members at A=1) — shard the "),
            lit("stats aggregation or coarsen the quantization"))))
          .otherwise(expr("__sumE DIV (CAST(__n AS DECIMAL(38,0)) * __n" +
            " * n_points * 1000000000000)"))
          .as("mean_dist2_e6"))
      .orderBy(col("cluster"))
  }

  /** The WITH-body of the DuckDB k-means replay up to (and including)
    * the final assignment CTE, plus that CTE's name — reused by both
    * [[oracleSql]] (p47's cluster stats) and downstream compositions
    * that need per-vector cluster labels (p99 semantic dedup). The
    * exposed CTEs: `el` (vec_id, d, x decimal), `asg<fin>` (vec_id,
    * cell, n, ee).
    */
  def assignCtes(k: Int, iters: Int): (String, String) = {
    def eCte(i: Int): String =
      s"""e$i AS (
         |  SELECT e.vec_id, c.cell, MIN(c.n) AS n,
         |    SUM((CAST(c.n AS HUGEINT) * e.x - c.sx)
         |      * (CAST(c.n AS HUGEINT) * e.x - c.sx)) AS ee
         |  FROM el e JOIN c${i - 1} c USING (d)
         |  GROUP BY e.vec_id, c.cell),
         |asg$i AS (
         |  SELECT vec_id, cell, n, ee FROM (
         |    SELECT vec_id, cell, n, ee,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY CAST(ee AS DOUBLE) / (n * n), cell) AS rn
         |    FROM e$i) WHERE rn = 1)""".stripMargin
    def uCte(i: Int): String =
      s"""u$i AS (
         |  SELECT a.cell, e.d, CAST(SUM(e.x) AS HUGEINT) AS sx,
         |         COUNT(*) AS n
         |  FROM asg$i a JOIN el e USING (vec_id) GROUP BY a.cell, e.d),
         |c$i AS (
         |  SELECT o.cell, o.d, COALESCE(u.sx, o.sx) AS sx,
         |         COALESCE(u.n, o.n) AS n
         |  FROM c${i - 1} o LEFT JOIN u$i u USING (cell, d))""".stripMargin
    val rounds = (1 to iters).map(i => s"${eCte(i)},\n${uCte(i)}")
    val fin = iters + 1
    // el.x is the quantE9 integer — the same floor(double·1e9) the
    // kernel computes, the one cross-engine-safe float quantization
    val ctes = s"""el AS (
       |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) - 1 AS d,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE)
       |           * 1000000000.0) AS BIGINT) AS x
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |seeds AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cell
       |  FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT $k),
       |c0 AS (
       |  SELECT s.cell, e.d, CAST(e.x AS HUGEINT) AS sx,
       |         CAST(1 AS BIGINT) AS n
       |  FROM seeds s JOIN el e USING (vec_id)),
       |${rounds.mkString(",\n")},
       |${eCte(fin)}""".stripMargin
    (ctes, s"asg$fin")
  }

  /** The DuckDB replay of [[clusterStats]]: the same seeds, the same
    * exact-integer iterations (unrolled), the same floor division.
    */
  def oracleSql(k: Int = 4, iters: Int = 3): String = {
    val (ctes, asg) = assignCtes(k, iters)
    s"""WITH $ctes
       |SELECT cell AS cluster, COUNT(*) AS n_points,
       |  CAST(SUM(ee) // (CAST(MIN(n) AS HUGEINT) * MIN(n) * COUNT(*)
       |      * CAST(1000000000000 AS HUGEINT)) AS BIGINT)
       |    AS mean_dist2_e6
       |FROM $asg GROUP BY cell
       |ORDER BY cluster""".stripMargin
  }
}
