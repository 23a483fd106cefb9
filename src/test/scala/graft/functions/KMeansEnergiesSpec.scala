package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** The native k-means energy kernel must be BIT-IDENTICAL to the
  * declarative integer chain — quantE9 elements, exact DECIMAL(38,0)
  * sums — that the DuckDB oracles replay as HUGEINT CTEs, so any
  * divergence (quantization, overflow band, null propagation) is an
  * oracle red waiting to happen. Compared as exact java BigDecimals
  * (value AND scale). NaN/Inf elements and |x·1e9| past Long range are
  * the kernel's documented all-null bands (the declarative cast of a
  * NaN is engine/mode-dependent, which is exactly why the kernel owns
  * that contract) — pinned directly, not via the declarative twin.
  */
class KMeansEnergiesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val D38 = DecimalType(38, 0)

  /** The declarative integer form the oracle CTEs mirror. */
  private def declarative(
      vec: Column,
      sums: Seq[Seq[Long]],
      counts: Seq[Long]): Column =
    array(sums.indices.map { c =>
      val nLit = lit(counts(c)).cast(D38)
      val sLit = typedLit(sums(c))
      aggregate(
        zip_with(
          transform(vec, x => floor(x.cast("double") * lit(1e9)).cast("long")),
          sLit, (x, sv) => {
            val diff = nLit * x.cast(D38) - sv.cast(D38)
            (diff * diff).cast(D38)
          }),
        lit(BigDecimal(0)).cast(D38),
        (acc, v) => (acc + v).cast(D38))
    }: _*)

  private def compare(df: org.apache.spark.sql.DataFrame,
      vec: Column, sums: Seq[Seq[Long]], counts: Seq[Long]): Unit = {
    val rows = df.select(
        declarative(vec, sums, counts).as("a"),
        KMeansFunctions.kmeans_energies(vec, sums, counts).as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      val a = r.getSeq[java.math.BigDecimal](0)
      val b = r.getSeq[java.math.BigDecimal](1)
      assert(a.length == b.length, s"row $i arity")
      a.zip(b).zipWithIndex.foreach { case ((x, y), c) =>
        if (x == null || y == null)
          assert(x == null && y == null, s"row $i cluster $c: $x vs $y")
        else
          assert(x.compareTo(y) == 0 && x.scale == y.scale,
            s"row $i cluster $c: declarative $x vs native $y")
      }
    }
  }

  private lazy val model = {
    val emb = graft.Tables.t(spark, sf, "embeddings")
    graft.operators.KMeansOp.fit(emb, "vec_id", "embedding", 4, 3)
  }
  private def modelSums: Seq[Seq[Long]] =
    model.sums.map(_.toSeq).toSeq

  test("bitwise equal to the declarative chain on the embeddings fixture") {
    val emb = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("embedding").isNotNull)
    compare(emb, col("embedding"), modelSums, model.counts.toSeq)
    spark.catalog.clearCache()
  }

  test("null-element and ragged vectors null every cluster energy") {
    import spark.implicits._
    val sums = Seq(Seq(1500000000L, -2250000000L),
      Seq(0L, 4125000000L))
    val counts = Seq(3L, 7L)
    val df = Seq(
      Seq(Some(1.0f), Some(2.0f)),          // clean
      Seq(Some(1.0f), None),                // null element
      Seq(Some(1.0f)),                      // short
      Seq(Some(1.0f), Some(2.0f), Some(3f)) // long
    ).toDF("v").select(col("v").cast("array<float>").as("v"))
    compare(df, col("v"), sums, counts)
  }

  test("quantization parity on adversarial float values") {
    import spark.implicits._
    // values whose double expansion disagrees with the shortest repr
    // past digit 9 — the class that split the engines under the old
    // DECIMAL(18,9) cast; floor(double*1e9) quantizes them identically
    val vals = Seq(0.1f, 0.3f, 1e-9f, 123456.78f, -0.0f, Float.MinPositiveValue,
      3.4e2f, -7.7777777f)
    val df = Seq(vals.map(Option(_))).toDF("v")
      .select(col("v").cast("array<float>").as("v"))
    val sums = Seq(Seq.fill(vals.length)(1L),
      Seq.fill(vals.length)(99999999999999999L))
    compare(df, col("v"), sums, Seq(1L, 997L))
  }

  test("NaN/Inf and |x*1e9| past Long range null every cluster (kernel " +
      "contract — DuckDB's BIGINT cast raises where toLong would saturate)") {
    import spark.implicits._
    val sums = Seq(Seq(1000000000L, 1000000000L))
    val counts = Seq(2L)
    val df = Seq(
      Seq(Option(Float.NaN), Option(1.0f)),
      Seq(Option(Float.PositiveInfinity), Option(1.0f)),
      Seq(Option(1e10f), Option(1.0f)),   // 1e19 > Long.MaxValue
      Seq(Option(-1e10f), Option(1.0f)))
      .toDF("v").select(col("v").cast("array<float>").as("v"))
    val got = df.select(
        KMeansFunctions.kmeans_energies(col("v"), sums, counts).as("e"))
      .collect().map(_.getSeq[java.math.BigDecimal](0))
    got.zipWithIndex.foreach { case (es, i) =>
      assert(es.forall(_ == null), s"row $i must null all clusters: $es")
    }
  }

  test("codegen and interpreted paths agree") {
    val emb = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("embedding").isNotNull).limit(50)
    val viaDf = emb.select(
        KMeansFunctions.kmeans_energies(col("embedding"), modelSums,
          model.counts.toSeq).as("e"))
      .collect().map(_.getSeq[java.math.BigDecimal](0))
    val viaEval = emb.select(col("embedding")).collect().map { r =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        r.getSeq[Float](0).toArray)
      val out = KMeansEnergies(
        org.apache.spark.sql.catalyst.expressions.Literal(arr,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        modelSums, model.counts.toSeq).compute(arr)
      (0 until out.numElements()).map(i =>
        if (out.isNullAt(i)) null
        else out.get(i, D38).asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal)
    }
    viaDf.zip(viaEval).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
    spark.catalog.clearCache()
  }
}
