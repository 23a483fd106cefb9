package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** The native exact-cosine kernel must be BIT-IDENTICAL (at the Double
  * level) to the declarative decVec/dotExact/normExact chain it
  * replaced — every oracle that replays micro-cosines (p99/p101/p105..
  * p109) hashes values built from this double.
  */
class DecCosineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val D = DecimalType(18, 9)
  private val DSum = DecimalType(38, 18)

  /** The declarative chain, verbatim from the pre-round-8 Similarity. */
  private def declarative(a: Column, b: Column): Column = {
    def decVec(c: Column): Column = transform(c, x => x.cast(D))
    def dotExact(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => (p * q).cast(DSum)),
        lit(BigDecimal(0)).cast(DSum),
        (acc, v) => (acc + v).cast(DSum)).cast("double")
    val da = decVec(a)
    val db = decVec(b)
    dotExact(da, db) / (sqrt(dotExact(da, da)) * sqrt(dotExact(db, db)))
  }

  private def compare(df: org.apache.spark.sql.DataFrame,
      a: Column, b: Column): Unit = {
    val rows = df.select(declarative(a, b).as("x"),
        KMeansFunctions.dec_cosine(a, b).as("y"))
      .collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      val xn = r.isNullAt(0)
      val yn = r.isNullAt(1)
      assert(xn == yn, s"row $i null mismatch: declarative null=$xn native null=$yn")
      if (!xn) {
        val x = r.getDouble(0)
        val y = r.getDouble(1)
        assert(java.lang.Double.doubleToLongBits(x) ==
          java.lang.Double.doubleToLongBits(y),
          s"row $i: declarative $x vs native $y")
      }
    }
  }

  test("bitwise equal on all embedding pairs against one probe") {
    import spark.implicits._
    val emb = graft.Tables.t(spark, sf, "embeddings")
      .filter($"embedding".isNotNull)
    val q = emb.orderBy($"vec_id").limit(1)
      .select($"embedding".as("qv")).collect().head.getSeq[Float](0)
    compare(emb, col("embedding"), typedLit(q))
    spark.catalog.clearCache()
  }

  test("null, ragged and adversarial-float parity") {
    import spark.implicits._
    // -0.0f and 1e-9f both widen to decimal zero, so the b side of row
    // 4 is a DECIMAL zero norm — covered in the dedicated test below,
    // not here (the declarative chain raises DIVIDE_BY_ZERO under ANSI)
    val rows = Seq(
      (Seq(Option(1.0f), Option(2.0f)), Seq(Option(3.0f), Option(4.0f))),
      (Seq(Option(1.0f), None), Seq(Option(3.0f), Option(4.0f))),   // null elem
      (Seq(Option(1.0f)), Seq(Option(3.0f), Option(4.0f))),         // ragged
      (Seq(Option(0.1f), Option(0.3f)), Seq(Option(-2.0f), Option(1e-3f))),
      (Seq(Option(123456.78f), Option(-7.7777777f)),
        Seq(Option(3.4e2f), Option(1.25f))))
    val df = rows.toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
    compare(df, col("a"), col("b"))
  }

  test("zero norm returns NULL (the one documented divergence)") {
    import spark.implicits._
    // the declarative chain raised DIVIDE_BY_ZERO under ANSI here; the
    // kernel returns NULL so zero-norm rows drop through the call
    // sites' sim IS NOT NULL filters uniformly with null embeddings
    // (a NaN would sort FIRST under descending rank — worse than both)
    val df = Seq(
      (Seq(0.0f, 0.0f), Seq(1.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(0.0f, 0.0f)),
      (Seq(1e-10f, -1e-10f), Seq(1.0f, 1.0f))) // casts to decimal zero
      .toDF("a", "b")
    val got = df.select(KMeansFunctions.dec_cosine(col("a"), col("b")))
      .collect()
    assert(got.forall(_.isNullAt(0)), got.mkString(", "))
  }

  test("property: bitwise equal on random float vectors") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    val genVec = Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e4f, 1e4f)))
    // a vector whose every element rounds to decimal zero at scale 9
    // has a DECIMAL zero norm: that branch is the documented divergence
    // (declarative raises DIVIDE_BY_ZERO under ANSI, kernel -> NULL),
    // so the property routes it to the NULL contract instead of
    // calling the declarative chain. chooseNum generates 0.0 as a
    // favored special case, so this branch IS exercised.
    def decZeroNorm(v: List[Float]): Boolean = v.forall(x =>
      BigDecimal(x.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).signum == 0)
    val prop = forAll(Gen.zip(genVec, genVec)) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
        .select(col("a").cast("array<float>").as("a"),
          col("b").cast("array<float>").as("b"))
      if (decZeroNorm(a) || decZeroNorm(b)) {
        val r = df.select(
          KMeansFunctions.dec_cosine(col("a"), col("b")).as("y"))
          .collect().head
        Prop(r.isNullAt(0)).label(s"zero-norm NULL a=$a b=$b")
      } else {
        val r = df.select(declarative(col("a"), col("b")).as("x"),
          KMeansFunctions.dec_cosine(col("a"), col("b")).as("y"))
          .collect().head
        val ok =
          if (r.isNullAt(0) || r.isNullAt(1)) r.isNullAt(0) == r.isNullAt(1)
          else java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(1))
        Prop(ok).label(s"a=$a b=$b")
      }
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.toString)
  }
}
