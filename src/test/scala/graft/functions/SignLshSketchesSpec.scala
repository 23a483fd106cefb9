package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The batched sign-LSH kernel must be BIT-IDENTICAL to the typedLit
  * construction it replaced (planes × tables `when(vec_dot_fd(v, w) >
  * 0, bit)` columns): every banded pair set, candidate count, and hash
  * gate in the p171-p173 family is keyed to those sketch bits, so any
  * divergence — weight derivation, accumulation order, the NaN decide,
  * the null-vector zeros contract — is a silent candidate-set change.
  */
class SignLshSketchesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** The pre-r14 declarative construction, rebuilt verbatim. */
  private def declarative(
      vec: Column, planes: Int, tables: Int, dims: Int): Column = {
    import graft.functions.VectorFunctions.vec_dot_fd
    val w = SignLshSketches.weights(tables, planes, dims)
    val sketches = array((0 until tables).map { t =>
      (0 until planes).map { p =>
        when(vec_dot_fd(vec, typedLit(w(t)(p).toSeq)) > 0, lit(1L << p))
          .otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }: _*)
    when(vec.isNull || size(vec) <= dims, sketches)
  }

  private def compare(df: org.apache.spark.sql.DataFrame, vec: Column,
      planes: Int, tables: Int, dims: Int = 64): Unit = {
    val rows = df.select(
        declarative(vec, planes, tables, dims).as("a"),
        VectorFunctions.sign_lsh_sketches(vec, planes, tables, dims)
          .as("b"))
      .collect()
    assert(rows.nonEmpty)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"row $i: declarative ${r.getSeq[Long](0)} vs " +
          s"kernel ${r.getSeq[Long](1)}")
    }
  }

  test("bit-identical to the typedLit construction at the p171 knobs (4, 48)") {
    val emb = graft.Tables.t(spark, sf, "embeddings")
    compare(emb, col("embedding"), planes = 4, tables = 48)
    spark.catalog.clearCache()
  }

  test("bit-identical at a small odd config and on adversarial floats") {
    import spark.implicits._
    val df = Seq(
      Seq(Option(0.1f), Option(-0.3f), Option(1e-9f)),
      Seq(Option(Float.NaN), Option(1.0f), Option(2.0f)), // NaN dot: bit SET
      Seq(Option(-0.0f), Option(0.0f), Option(0.0f)),     // zero dot: bit clear
      Seq(Option(123456.78f), Option(-7.7777777f), Option(3.4e2f)))
      .toDF("v").select(col("v").cast("array<float>").as("v"))
    compare(df, col("v"), planes = 3, tables = 5, dims = 3)
    // shorter-than-dims vectors: both forms sum over the vector length
    compare(df, col("v"), planes = 2, tables = 3, dims = 8)
  }

  test("NULL vector sketches to all-zero bits, never a null array") {
    import spark.implicits._
    val df = Seq(Option(Seq(1.0f, 2.0f)), None).toDF("v")
      .select(col("v").cast("array<float>").as("v"))
    val got = df.select(
        VectorFunctions.sign_lsh_sketches(col("v"), 4, 6, 2).as("s"))
      .collect()
    assert(got.forall(!_.isNullAt(0)))
    assert(got(1).getSeq[Long](0) == Seq.fill(6)(0L))
  }

  test("vector longer than dims raises the lshSketches contract error") {
    import spark.implicits._
    val df = Seq(Seq(1.0f, 2.0f, 3.0f)).toDF("v")
    val e = intercept[Exception] {
      df.select(VectorFunctions.sign_lsh_sketches(col("v"), 2, 2, 2))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exceeds dims=2")), msgs(e).mkString("|"))
  }

  test("codegen and interpreted paths agree") {
    val emb = graft.Tables.t(spark, sf, "embeddings")
      .filter(col("embedding").isNotNull).limit(50)
    val viaDf = emb.select(
        VectorFunctions.sign_lsh_sketches(col("embedding"), 4, 48, 64)
          .as("s"))
      .collect().map(_.getSeq[Long](0))
    val viaEval = emb.select(col("embedding")).collect().map { r =>
      val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        r.getSeq[Float](0).toArray)
      val out = SignLshSketches(
        org.apache.spark.sql.catalyst.expressions.Literal(arr,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)),
        4, 48, 64).compute(arr)
      (0 until out.numElements()).map(out.getLong).toSeq
    }
    viaDf.zip(viaEval).foreach { case (a, b) => assert(a.toSeq == b) }
    spark.catalog.clearCache()
  }
}
