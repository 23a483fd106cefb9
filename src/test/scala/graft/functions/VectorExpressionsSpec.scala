package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables.t

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("vec_dot matches the declarative HOF dot product exactly") {
    val emb = t(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 1).select(col("embedding").as("qv"))
    val joined = emb.crossJoin(broadcast(q))
    val native = joined.select(col("vec_id"),
      VectorFunctions.vec_dot(col("embedding"), col("qv")).as("d")).collect()
    val hof = joined.select(col("vec_id"),
      aggregate(zip_with(col("embedding"), col("qv"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("d")).collect()
    val nm = native.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    hof.foreach { r =>
      // both are strict left-to-right double sums -> bit-identical
      assert(nm(r.getLong(0)) == r.getDouble(1))
    }
  }

  test("vec_dot participates in WholeStageCodegen") {
    val emb = t(spark, sf, "embeddings")
    val plan = emb
      .select(VectorFunctions.vec_dot(col("embedding"), col("embedding")).as("n2"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in the simple
    // plan string; the expression must sit inside a codegen'd Project
    assert(plan.contains("*(1) Project [floatvecdot"), plan)
  }

  test("vec_dot is registered for SQL use") {
    VectorFunctions.register(spark)
    import spark.implicits._
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    try {
      val got = spark.sql("SELECT vec_dot(a, b) AS d FROM vecs").collect()
      assert(got.head.getDouble(0) == 11.0)
      // the full function surface registers, not just vec_dot
      val h = spark.sql("SELECT bits_hamming('0101', '1101') AS h").collect()
      assert(h.head.getInt(0) == 1)
    } finally spark.catalog.dropTempView("vecs")
  }

  test("vec_match_count counts equal positions, codegen'd") {
    import spark.implicits._
    val df = Seq(
      (Array(1L, 2L, 3L, 4L), Array(1L, 9L, 3L, 4L)),
      (Array(5L), Array(5L, 6L)), // length mismatch: shorter wins
      (Array.empty[Long], Array(1L)))
      .toDF("a", "b")
    val got = df.select(VectorFunctions.vec_match_count(col("a"), col("b")))
      .collect().map(_.getInt(0))
    assert(got.toSeq == Seq(3, 1, 0))
    // codegen assertion needs a non-foldable source (literals collapse
    // to a LocalTableScan)
    val plan = spark.range(10)
      .select(array(col("id"), col("id") + 1).as("a"),
        array(col("id"), col("id")).as("b"))
      .select(VectorFunctions.vec_match_count(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("longvecmatchcount") && plan.contains("*(1)"), plan)
  }

  test("vec_dot_fd is bit-identical to the HOF cast-multiply form") {
    val emb = t(spark, sf, "embeddings")
    val w = (0 until 64).map(i => (i * 37 % 200) / 100.0 - 1.0)
    val native = emb.select(col("vec_id"),
      VectorFunctions.vec_dot_fd(col("embedding"), typedLit(w)).as("d")).collect()
    val hof = emb.select(col("vec_id"),
      aggregate(zip_with(col("embedding"), typedLit(w),
        (x, wd) => x.cast("double") * wd), lit(0.0), (acc, v) => acc + v)
        .as("d")).collect()
    val nm = native.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    hof.foreach(r => assert(nm(r.getLong(0)) == r.getDouble(1)))
  }

  test("text_shingles matches the declarative HOF form exactly") {
    import spark.implicits._
    def hof(text: org.apache.spark.sql.Column, k: Int) = {
      val toks = split(text, " ")
      when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - (k - 1)),
          i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array(text))
    }
    val real = t(spark, sf, "documents").select(col("text"))
    val edges = Seq("", "one", "a b", "a b c", "a  b c", " lead", "trail ")
      .toDF("text")
    for (k <- Seq(2, 3, 5); df <- Seq(real, edges)) {
      val diff = df.select(
          VectorFunctions.text_shingles(col("text"), k).as("a"),
          hof(col("text"), k).as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(diff == 0, s"k=$k diverged from the HOF form")
    }
    // documented null contract: NULL text -> NULL array (no shingles),
    // matching SQL split semantics, NOT the old HOF quirk [NULL]
    val nullRow = Seq(Option.empty[String]).toDF("text")
      .select(VectorFunctions.text_shingles(col("text"), 3)).collect().head
    assert(nullRow.isNullAt(0))
  }

  test("vec_dot rejects wrong types with a named error") {
    val emb = t(spark, sf, "embeddings")
    val e = intercept[Exception] {
      emb.select(VectorFunctions.vec_dot(col("vec_id"), col("embedding"))).collect()
    }
    assert(e.getMessage.contains("vec_dot") ||
      e.getMessage.toLowerCase.contains("type"))
  }

  test("null vector yields null dot") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    val got = df.select(VectorFunctions.vec_dot(col("a"), col("b"))).collect()
    assert(got.head.isNullAt(0))
  }

  test("text_normalize: NFC composes, NFKC folds compatibility forms") {
    import spark.implicits._
    // decomposed accent (e + U+0301), the fi ligature (U+FB01), a
    // superscript two (U+00B2), and a fullwidth A (U+FF21); NULL rides
    // through. The non-foldable source keeps codegen honest (literals
    // collapse at analysis), and p68 pins the NFC path against DuckDB.
    val df = Seq(Some("Cafe\u0301 \ufb01n A\u00b2 \uff21"),
      Option.empty[String]).toDF("s").repartition(2)
    val got = df.select(
      VectorFunctions.text_normalize($"s", "NFC").as("nfc"),
      VectorFunctions.text_normalize($"s", "NFKC").as("nfkc")).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    assert(got == Set(
      (Some("Caf\u00e9 \ufb01n A\u00b2 \uff21"), // NFC: compose only
        Some("Caf\u00e9 fin A2 A")),             // NFKC: + compat folds
      (None, None)))
    // already-normalized ASCII survives the fast path byte-identical,
    // and the plan stays inside WholeStageCodegen
    val ascii = Seq("plain ascii").toDF("s").repartition(2)
      .select(VectorFunctions.text_normalize($"s", "NFC").as("n"))
    assert(ascii.collect().head.getString(0) == "plain ascii")
    // `*(n)` is the WholeStageCodegen marker in the simple plan string
    val plan = ascii.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [textnormalize"), plan)
    // unknown form fails fast at construction
    val e = intercept[IllegalArgumentException] {
      VectorFunctions.text_normalize($"s", "NFX")
    }
    assert(e.getMessage.contains("NFX"))
  }

  test("bits_hamming matches the HOF position count and stays codegen'd") {
    import spark.implicits._
    val rows = Seq(
      ("0101", "0101", 0), ("0101", "1101", 1), ("0000", "1111", 4),
      ("0101", "01", 2),   // length difference counts as different
      ("", "", 0))
      .toDF("a", "b", "want")
    val got = rows.select($"want",
      VectorFunctions.bits_hamming($"a", $"b").as("h")).collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(0), r.toString))
    // NULL propagates like any binary expression
    val n = Seq((Some("01"), Option.empty[String])).toDF("a", "b")
      .select(VectorFunctions.bits_hamming($"a", $"b")).collect()
    assert(n.head.isNullAt(0))
    // equal-length random bit strings agree with the declarative HOF
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 50).map { _ =>
      (Seq.fill(64)(rnd.nextInt(2)).mkString, Seq.fill(64)(rnd.nextInt(2)).mkString)
    }.toDF("a", "b").repartition(3)
    val both = pairs.select(
      VectorFunctions.bits_hamming($"a", $"b").as("native"),
      expr("""aggregate(sequence(1, 64), 0, (acc, i) ->
             |  acc + IF(substring(a, i, 1) = substring(b, i, 1), 0, 1))"""
        .stripMargin).as("hof")).collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // and the native form runs inside WholeStageCodegen
    val plan = pairs.select(VectorFunctions.bits_hamming($"a", $"b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [stringhamming") ||
      plan.contains("Project [stringhamming"), plan)
  }
}
