package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Operator-level pins for the round-11 audit surface, independent of
  * the DuckDB oracle gate: hand-computed goldens for containment
  * orientation, HITS normalization, t-closeness arithmetic and the
  * readability formula, plus the PSI sign property the cross-engine
  * floor-division argument rests on.
  */
class Pipeline11OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("containmentPairs: a fully-contained doc scores 1.0 toward its " +
      "container and the orientation puts the contained side first") {
    import spark.implicits._
    // doc 1 = 5 tokens -> 3 distinct shingles, all present in doc 2
    // (11 tokens); doc 3 shares nothing
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x a b c d e y z w q r"),
      (3L, "k l m n o p")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        minContainmentPpm = 500000L, maxShingleDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // doc1: n_sh = 3; doc2: n_sh = 9; common = 3
    // containment(1 in 2) = 3/3 = 1.0; jaccard = 3/9
    assert(got.toSeq == Seq((1L, 2L, 3L, 9L, 1000000L, 333333L)))
    spark.catalog.clearCache()
  }

  test("containmentPairs: equal-size ties orient by id order and the " +
      "threshold excludes weak overlaps") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),   // 3 shingles, identical sets
      (2L, "a b c d e"),
      (4L, "a b c q w e")) // shares only "a b c" with 1/2
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        minContainmentPpm = 900000L, maxShingleDf = 50)
      .orderBy(col("id_in"), col("id_of"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    // only the identical pair survives 0.9; tie -> (1, 2), not (2, 1)
    assert(got.toSeq == Seq((1L, 2L, 1000000L)))
    spark.catalog.clearCache()
  }

  test("p159 HITS golden: hand-computed two-round scores on a fixed " +
      "bipartite graph") {
    import spark.implicits._
    // edges c->s: c1->{s1,s2}, c2->{s1}, c3->{s1,s3}
    // a1 = 1000*indeg: s1=3000, s2=1000, s3=1000; max 3000
    // a1n: s1=1000, s2=333, s3=333
    // h1: c1=1333, c2=1000, c3=1333; max 1333 -> h1n: c1=1000, c2=750, c3=1000
    // a2: s1=2750, s2=1000, s3=1000; max 2750 -> a2n: s1=1000, s2=363, s3=363
    val eu = Seq((1L, 10L), (1L, 20L), (2L, 10L), (3L, 10L), (3L, 30L))
      .toDF("c", "sp")
    // the PRODUCTION normalizer, not an inline copy — drift in the
    // shared operator must fail this golden, not only the oracle gate
    def normalized(scores0: org.apache.spark.sql.DataFrame,
        valCol: String): org.apache.spark.sql.DataFrame =
      GraphOps.maxNormalizedMilli(scores0, valCol)
    val a1 = normalized(
      eu.groupBy(col("sp")).agg((count(lit(1)) * 1000L).as("a")), "a")
    val h1 = normalized(
      eu.join(a1, Seq("sp")).groupBy(col("c")).agg(sum(col("a")).as("h")),
      "h")
    val a2 = normalized(
      eu.join(h1, Seq("c")).groupBy(col("sp")).agg(sum(col("h")).as("a")),
      "a")
    val got = a2.orderBy(col("sp")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((10L, 1000L), (20L, 363L), (30L, 363L)))
    spark.catalog.clearCache()
  }

  test("PSI terms are non-negative: the quantizer is monotone, so " +
      "(p-q) and (lg p - lg q) never disagree in sign") {
    // exhaustive monotonicity sweep near every power of two plus a
    // random sweep — the property the p157 DIV-floor argument rests on
    import graft.functions.IntLog.ilog2f
    for (e <- 0 to 19; d <- -2 to 2) {
      val x = (1L << e) + d
      if (x >= 1 && x + 1 <= 1000000) {
        assert(ilog2f(x) <= ilog2f(x + 1), s"non-monotone at $x")
      }
    }
    val rnd = new scala.util.Random(1161)
    for (_ <- 0 until 5000) {
      val p = 1L + rnd.nextInt(1000000)
      val q = 1L + rnd.nextInt(1000000)
      val term = (p - q) * (ilog2f(p) - ilog2f(q))
      assert(term >= 0L, s"negative PSI term at p=$p q=$q")
    }
  }

  test("t-closeness arithmetic golden: a one-lang class in a uniform " +
      "two-lang corpus sits at tv = 1/2") {
    // corpus: 4 docs, 2 en + 2 de; class A = {en, en}, class B = {de, de}
    // global shares 1/2 each; each class is pure -> tv = (|2*4-2*2| +
    // |0*4-2*2|) / (2*2*4) = (4+4)/16 = 1/2 -> 500000 ppm
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "w1", 10L), (2L, "en", "w1", 15L),
      (3L, "de", "w2", 10L), (4L, "de", "w2", 15L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("tclose").toString
    docs.withColumn("text", lit("a b c"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      val got = graft.SparkEntry.queries("p156_t_closeness")(spark, dir)
        .orderBy($"source").collect()
        .map(r => (r.getString(0), r.getLong(3))).toSeq
      assert(got == Seq(("w1", 500000L), ("w2", 500000L)))
    } finally {
      spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("readability formula golden: known token/syllable counts map to " +
      "the documented milli-grade") {
    import spark.implicits._
    // "data table scan" -> w=3, vowel runs: a-a, a-e, a = 2+2+1 = 5
    // sents = ceil(3/16) = 1; raw = 390*3 + 11800*5 DIV 3 = 1170+19666
    // fk = 20836 - 15590 = 5246
    val dir = java.nio.file.Files.createTempDirectory("fk").toString
    Seq((1L, "data table scan", "en", "w", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      val got = graft.SparkEntry.queries("p158_readability")(spark, dir)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == Seq(("w", 1L, 5246L)))
    } finally {
      spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
