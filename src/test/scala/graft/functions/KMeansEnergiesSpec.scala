package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** The native k-means energy kernel must be BIT-IDENTICAL to the
  * declarative aggregate(zip_with(...)) chain it replaces — the DuckDB
  * oracles replay the declarative semantics, so any divergence (scale,
  * rounding point, null propagation) is an oracle red waiting to
  * happen. Compared as exact java BigDecimals (value AND scale).
  */
class KMeansEnergiesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val D = DecimalType(18, 9)
  private val D30 = DecimalType(30, 9)
  private val DS = DecimalType(38, 9)
  private val DSum = DecimalType(38, 18)

  /** The declarative form, verbatim from the pre-round-8 KMeansOp. */
  private def declarative(
      vec: Column,
      sums: Seq[Seq[BigDecimal]],
      counts: Seq[Long]): Column =
    array(sums.indices.map { c =>
      val nLit = lit(counts(c)).cast(DecimalType(12, 0))
      val sLit = typedLit(sums(c))
      aggregate(
        zip_with(vec, sLit, (x, sv) => {
          val diff = ((nLit * x.cast(D)).cast(D30) - sv.cast(DS)).cast(D)
          (diff * diff).cast(DSum)
        }),
        lit(BigDecimal(0)).cast(DSum),
        (acc, v) => (acc + v).cast(DSum))
    }: _*)

  private def compare(df: org.apache.spark.sql.DataFrame,
      vec: Column, sums: Seq[Seq[BigDecimal]], counts: Seq[Long]): Unit = {
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
          assert(x == y, // java BigDecimal equals: value AND scale
            s"row $i cluster $c: declarative $x vs native $y")
      }
    }
  }

  private lazy val model = {
    val emb = graft.Tables.t(spark, sf, "embeddings")
    graft.operators.KMeansOp.fit(emb, "vec_id", "embedding", 4, 3)
  }
  private def modelSums: Seq[Seq[BigDecimal]] =
    model.sums.map(_.map(BigDecimal(_)).toSeq).toSeq

  test("bitwise equal to the declarative chain on the embeddings fixture") {
    val emb = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("embedding").isNotNull)
    compare(emb, col("embedding"), modelSums, model.counts.toSeq)
    spark.catalog.clearCache()
  }

  test("null-element and ragged vectors null every cluster energy") {
    import spark.implicits._
    val sums = Seq(Seq(BigDecimal("1.5"), BigDecimal("-2.25")),
      Seq(BigDecimal("0"), BigDecimal("4.125")))
    val counts = Seq(3L, 7L)
    val df = Seq(
      Seq(Some(1.0f), Some(2.0f)),          // clean
      Seq(Some(1.0f), None),                // null element
      Seq(Some(1.0f)),                      // short
      Seq(Some(1.0f), Some(2.0f), Some(3f)) // long
    ).toDF("v").select(col("v").cast("array<float>").as("v"))
    compare(df, col("v"), sums, counts)
  }

  test("float-cast rounding parity on adversarial values") {
    import spark.implicits._
    // values whose double expansion disagrees with the shortest repr
    // past digit 9 — the cast rounding point the kernel must share
    // stays inside the operator's documented |n*x - S| < 1e9 envelope —
    // outside it the declarative chain itself errors under ANSI
    val vals = Seq(0.1f, 0.3f, 1e-9f, 123456.78f, -0.0f, Float.MinPositiveValue,
      3.4e2f, -7.7777777f)
    val df = Seq(vals.map(Option(_))).toDF("v")
      .select(col("v").cast("array<float>").as("v"))
    val sums = Seq(Seq.fill(vals.length)(BigDecimal("0.000000001")),
      Seq.fill(vals.length)(BigDecimal("99999999.999999999")))
    compare(df, col("v"), sums, Seq(1L, 997L))
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
        else out.get(i, DSum).asInstanceOf[org.apache.spark.sql.types.Decimal]
          .toJavaBigDecimal)
    }
    viaDf.zip(viaEval).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
    spark.catalog.clearCache()
  }
}
