package graft.functions

import java.math.{BigInteger => JBI}

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The EXACT micro-cosine kernel (`dec_cosine_e6` = floor(1e6 cos))
  * must agree with an INDEPENDENT exact algorithm — the double-guess +
  * sign-aware squared-predicate fix-up ladder that the DuckDB oracles
  * replay ([[graft.queries.Pipeline.exactC6Ctes]]) — on every input,
  * and must sit within one unit of floor(1e6 * dec_cosine) (the double
  * kernel it replaces, whose last-ulp drift is exactly why this kernel
  * exists). The two implementations share no code path: the kernel
  * computes isqrt(floor(A^2/B)); the ladder fixes up a double floor
  * guess with exact integer comparisons.
  */
class DecCosineE6Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Independent exact floor(1e6 * dot / sqrt(nx*ny)) — the SQL
    * ladder's algorithm (guess + monotone predicate fix-up), on the
    * kernel's tie-free element quantization xe9 = floor(double * 1e9)
    * and floor-divided e9 sums.
    */
  private def ladderE6(a: Seq[Float], b: Seq[Float]): Option[Long] = {
    if (a.length != b.length) return None
    def q(f: Float): JBI = JBI.valueOf(math.floor(f.toDouble * 1e9).toLong)
    var dot = JBI.ZERO; var na = JBI.ZERO; var nb = JBI.ZERO
    a.indices.foreach { i =>
      val ja = q(a(i)); val jb = q(b(i))
      dot = dot.add(ja.multiply(jb))
      na = na.add(ja.multiply(ja))
      nb = nb.add(jb.multiply(jb))
    }
    val e9 = JBI.valueOf(1000000000L)
    def fdiv(v: JBI): JBI = {
      val Array(qq, r) = v.divideAndRemainder(e9)
      if (v.signum() < 0 && r.signum() != 0) qq.subtract(JBI.ONE) else qq
    }
    val x = fdiv(dot)
    val n = fdiv(na)
    val m = fdiv(nb)
    if (n.signum() == 0 || m.signum() == 0) return None
    val e12x2 = JBI.valueOf(1000000000000L).multiply(x).multiply(x)
    val nm = n.multiply(m)
    def le(k: Long): Boolean = {
      val kb = JBI.valueOf(k)
      if (k <= 0 && x.signum() >= 0) true
      else if (k > 0 && x.signum() < 0) false
      else if (k > 0) kb.multiply(kb).multiply(nm).compareTo(e12x2) <= 0
      else kb.multiply(kb).multiply(nm).compareTo(e12x2) >= 0
    }
    val g = math.floor(1e6 * x.doubleValue() /
      math.sqrt(n.doubleValue() * m.doubleValue())).toLong
    Some(g - 1 + (if (le(g)) 1 else 0) + (if (le(g + 1)) 1 else 0))
  }

  private def kernelRows(df: org.apache.spark.sql.DataFrame,
      a: Column, b: Column): Array[(Option[Long], Option[Double])] =
    df.select(KMeansFunctions.dec_cosine_e6(a, b).as("k"),
        KMeansFunctions.dec_cosine(a, b).as("d"))
      .collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1))))

  test("golden: exact rational cosines land exactly (3-4-5 family)") {
    import spark.implicits._
    val df = Seq(
      (Seq(3.0f, 4.0f), Seq(5.0f, 0.0f)),   // cos = 3/5  -> 600000
      (Seq(-3.0f, 4.0f), Seq(5.0f, 0.0f)),  // cos = -3/5 -> -600000
      (Seq(2.0f, 0.0f), Seq(7.0f, 0.0f)),   // cos = 1    -> 1000000
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f)),  // cos = -1   -> -1000000
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)))   // cos = 0    -> 0
      .toDF("a", "b")
    val got = df.select(
      KMeansFunctions.dec_cosine_e6(col("a"), col("b"))).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(600000L, -600000L, 1000000L, -1000000L, 0L))
  }

  test("golden: irrational floors (1/sqrt(2) both signs — ceil-vs-floor " +
      "asymmetry of the negative branch)") {
    import spark.implicits._
    // cos = +-1/sqrt(2) = +-0.70710678118...: floor is 707106 on the
    // positive side but -707107 on the negative (floor, not truncate)
    val df = Seq(
      (Seq(1.0f, 1.0f), Seq(1.0f, 0.0f)),
      (Seq(-1.0f, -1.0f), Seq(1.0f, 0.0f)))
      .toDF("a", "b")
    val got = df.select(
      KMeansFunctions.dec_cosine_e6(col("a"), col("b"))).collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(707106L, -707107L))
  }

  test("null contract: ragged, null element, zero norm -> NULL") {
    import spark.implicits._
    val rows = Seq(
      (Seq(Option(1.0f)), Seq(Option(3.0f), Option(4.0f))),        // ragged
      (Seq(Option(1.0f), None), Seq(Option(3.0f), Option(4.0f))),  // null elem
      (Seq(Option(0.0f), Option(0.0f)), Seq(Option(1.0f), Option(1.0f))),
      // quantizes to (0, -1) e9 units -> e18 norm sum 1 floor-divides
      // to a ZERO e9 norm: still the null band
      (Seq(Option(1e-10f), Option(-1e-10f)), Seq(Option(1.0f), Option(1.0f))),
      // |x·1e9| past Long range: .toLong would saturate silently while
      // the DuckDB replay's BIGINT cast raises — the kernel nulls so
      // both engines agree on out-of-spec magnitudes (both signs)
      (Seq(Option(1e10f), Option(1.0f)), Seq(Option(1.0f), Option(1.0f))),
      (Seq(Option(1.0f), Option(1.0f)), Seq(Option(-1e10f), Option(1.0f))))
    val df = rows.toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
    val got = df.select(
      KMeansFunctions.dec_cosine_e6(col("a"), col("b"))).collect()
    assert(got.forall(_.isNullAt(0)), got.mkString(", "))
  }

  test("fixture pairs: kernel == independent ladder, and within 1 unit " +
      "of the double floor") {
    import spark.implicits._
    val emb = graft.Tables.t(spark, sf, "embeddings")
      .filter($"embedding".isNotNull)
    val q = emb.orderBy($"vec_id").limit(1)
      .select($"embedding".as("qv")).collect().head.getSeq[Float](0)
    val vecs = emb.select($"embedding").collect()
      .map(_.getSeq[Float](0))
    val rows = kernelRows(emb, col("embedding"), typedLit(q))
    assert(rows.nonEmpty)
    rows.zip(vecs).foreach { case ((k, d), v) =>
      val want = ladderE6(v, q)
      assert(k == want, s"kernel $k vs ladder $want")
      (k, d) match {
        case (Some(kv), Some(dv)) =>
          assert(math.abs(kv - math.floor(dv * 1e6).toLong) <= 1,
            s"kernel $kv vs double floor ${math.floor(dv * 1e6)}")
        case (kk, dd) => assert(kk.isEmpty == dd.isEmpty)
      }
    }
    spark.catalog.clearCache()
  }

  test("property: kernel == independent ladder on random float vectors") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    val genVec = Gen.chooseNum(1, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e4f, 1e4f)))
    val prop = forAll(Gen.zip(genVec, genVec)) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
        .select(col("a").cast("array<float>").as("a"),
          col("b").cast("array<float>").as("b"))
      val r = df.select(
        KMeansFunctions.dec_cosine_e6(col("a"), col("b")).as("k"))
        .collect().head
      val got = if (r.isNullAt(0)) None else Some(r.getLong(0))
      val want = ladderE6(a, b)
      Prop(got == want).label(s"a=$a b=$b got=$got want=$want")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.toString)
  }
}
