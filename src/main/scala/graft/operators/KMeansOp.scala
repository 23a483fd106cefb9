package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed Lloyd's k-means over an embedding column — the semantic
  * clustering pass of a training-data pipeline (topic balancing, corpus
  * mixture auditing) — built to be ORACLE-EXACT, not merely
  * self-gated: every quantity that crosses an engine boundary is exact
  * decimal arithmetic, so DuckDB replays the identical iterations and
  * the hash gate applies to an ITERATIVE ML op.
  *
  * The trick that makes iterations bit-reproducible: centroids never
  * materialize as rounded means. A cluster is the exact pair
  * (S = decimal coordinate sums, n = member count), and the
  * squared-distance comparison multiplies through by n^2:
  *   argmin_c  sum_d (x_d - S_cd/n_c)^2
  *     = argmin_c  [ sum_d (n_c x_d - S_cd)^2 ] / n_c^2
  * The bracket is EXACT decimal; only the final ratio is a double — ONE
  * cast and ONE IEEE division from identical operands, deterministic in
  * both engines (a rounded-mean centroid would ride on divison/rounding
  * rules that differ between engines; a double-mean would ride on
  * summation order).
  *
  * Scale shape: assignment is a pure map against k*(dims) literals
  * (same bounded-codebook discipline as IVF/PQ); the update is ONE
  * (cluster, dim) partial aggregation collecting k*dims rows per round.
  * Bounds: the exact-decimal path holds to ~1e8 members per cluster
  * (diff < 1e9 at scale 9); past that, switch the update to double
  * means and drop the oracle — the mechanism is unchanged.
  *
  * Seeds are the k lowest-id vectors (deterministic, no RNG — the
  * ivfBuild/pqBuild discipline). All vectors must share one
  * dimensionality: a short vector NULL-pads the zip_with here but
  * inner-joins per-dim in the oracle — ragged corpora are out of
  * contract (the embeddings table is uniformly 64-dim).
  *
  * KNOWN LATENT CLASS (documented round 13, found during the round-12
  * dec_cosine_e6 investigation): the element quantization here —
  * `CAST(float AS DECIMAL(18,9))` on both sides — is NOT
  * engine-portable (DuckDB rounds the float's shortest ~9-digit repr
  * where Spark rounds the exact double; ~75% of fixture elements
  * differ in the last digit, so energies differ ~1e-8 between
  * engines). The gate stays green because ASSIGNMENT argmin margins
  * are orders of magnitude above 1e-8 and every rendered statistic is
  * rounded far coarser — but a pathological near-tie vector could in
  * principle assign differently per engine. If a
  * p47/p99/p107/p161 hash mismatch ever appears at a new scale, look
  * here first; the remedy is the quantE9 discipline
  * (floor(double·1e9) — tie-free, bit-identical on both engines)
  * threaded through the energy kernel, the oracle CTEs and this
  * driver arithmetic, exactly as dec_cosine_e6 did for the cosine
  * family.
  */
object KMeansOp {

  private val D = DecimalType(18, 9)
  private val D30 = DecimalType(30, 9)
  private val DS = DecimalType(38, 9)
  private val DSum = DecimalType(38, 18)

  /** Exact cluster state: coordinate sums (scale-9 decimals) + counts. */
  case class Model(sums: Array[Array[java.math.BigDecimal]], counts: Array[Long]) {
    def k: Int = sums.length
  }

  /** (id, vec, cluster, ee, n): nearest cluster by the cross-multiplied
    * ratio, ties to the lowest cluster id; `ee` is the chosen cluster's
    * exact E value and `n` its model count (both feed the final stats).
    *
    * The energy array E_c = sum_d (n_c x_d - S_cd)^2 comes from the
    * native [[graft.functions.KMeansEnergies]] kernel — bit-identical
    * to the declarative aggregate(zip_with) chain it replaced (pinned
    * by KMeansEnergiesSpec), which ran on Catalyst's HigherOrderFunction
    * interpreter and dominated every Lloyd round. The cast ladder
    * ((12,0)*(18,9) -> (30,9); minus the (38,9) sum -> (38,8) result
    * rounding -> (18,9), |diff| < 1e9 by the documented bound;
    * square -> (38,18); merge at (38,17) -> (38,18)) is reproduced
    * rounding point for rounding point inside the kernel.
    */
  def assign(emb: DataFrame, idCol: String, vecCol: String, model: Model): DataFrame = {
    val es = graft.functions.KMeansFunctions.kmeans_energies(
      col(vecCol),
      model.sums.map(_.map(scala.math.BigDecimal(_)).toSeq).toSeq,
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
    // float -> scale-9 decimal, matching both engines' CAST semantics
    var model = Model(
      seeds.map(_.map(f => new java.math.BigDecimal(f.toDouble)
        .setScale(9, java.math.RoundingMode.HALF_UP))),
      Array.fill(seeds.length)(1L))
    for (_ <- 1 to iters) {
      val rows = assign(emb, idCol, vecCol, model)
        .select(col("cluster"),
          posexplode(transform(col(vecCol), x => x.cast(D))).as(Seq("d", "x")))
        .groupBy(col("cluster"), col("d"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val sums = model.sums.map(_.clone())
      val counts = model.counts.clone()
      rows.groupBy(_.getInt(0)).foreach { case (c, rs) =>
        counts(c) = rs.head.getLong(3)
        rs.foreach(r => sums(c)(r.getInt(1)) = r.getDecimal(2))
      }
      model = Model(sums, counts)
    }
    model
  }

  /** Per-cluster summary after `iters` rounds: size and mean squared
    * distance to the (exact) centroid — `round(cast(sum(E) as double)
    * / n^2 / n_points, 6)`, the one place doubles appear, computed from
    * identical operands in both engines.
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
    * (the decimal E kernel is the expensive pass, not this groupBy).
    */
  def clusterStatsAssigned(assigned: DataFrame): DataFrame = {
    assigned
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("ee")).as("__sumE"), first(col("n")).as("__n"))
      .select(col("cluster"), col("n_points"),
        round(col("__sumE").cast("double") / (col("__n") * col("__n")) /
          col("n_points"), 6).as("mean_dist2"))
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
         |    SUM(CAST(CAST(CAST(CAST(c.n AS DECIMAL(12,0)) * e.x AS DECIMAL(30,9))
         |               - c.sx AS DECIMAL(18,9))
         |         * CAST(CAST(CAST(c.n AS DECIMAL(12,0)) * e.x AS DECIMAL(30,9))
         |               - c.sx AS DECIMAL(18,9)) AS DECIMAL(38,18))) AS ee
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
         |  SELECT a.cell, e.d, CAST(SUM(e.x) AS DECIMAL(38,9)) AS sx,
         |         COUNT(*) AS n
         |  FROM asg$i a JOIN el e USING (vec_id) GROUP BY a.cell, e.d),
         |c$i AS (
         |  SELECT o.cell, o.d, COALESCE(u.sx, o.sx) AS sx,
         |         COALESCE(u.n, o.n) AS n
         |  FROM c${i - 1} o LEFT JOIN u$i u USING (cell, d))""".stripMargin
    val rounds = (1 to iters).map(i => s"${eCte(i)},\n${uCte(i)}")
    val fin = iters + 1
    val ctes = s"""el AS (
       |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) AS INT) - 1 AS d,
       |         CAST(unnest(embedding) AS DECIMAL(18,9)) AS x
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |seeds AS (
       |  SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) AS INT) - 1 AS cell
       |  FROM embeddings WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT $k),
       |c0 AS (
       |  SELECT s.cell, e.d, CAST(e.x AS DECIMAL(38,9)) AS sx,
       |         CAST(1 AS BIGINT) AS n
       |  FROM seeds s JOIN el e USING (vec_id)),
       |${rounds.mkString(",\n")},
       |${eCte(fin)}""".stripMargin
    (ctes, s"asg$fin")
  }

  /** The DuckDB replay of [[clusterStats]]: the same seeds, the same
    * exact-decimal iterations (unrolled), the same final double ratio.
    */
  def oracleSql(k: Int = 4, iters: Int = 3): String = {
    val (ctes, asg) = assignCtes(k, iters)
    s"""WITH $ctes
       |SELECT cell AS cluster, COUNT(*) AS n_points,
       |  ROUND(CAST(SUM(ee) AS DOUBLE) / (MIN(n) * MIN(n)) / COUNT(*), 6)
       |    AS mean_dist2
       |FROM $asg GROUP BY cell
       |ORDER BY cluster""".stripMargin
  }
}
