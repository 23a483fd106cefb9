package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reusable in-plan cardinality guard (the p112 prefix-bucket
  * pattern generalized): identity under budget, fail-fast with the
  * remedy named past it, and impossible to bypass — the check rides
  * the guarded frame's plan via a broadcast crossJoin, so EVERY
  * consumer action trips it.
  */
class ScaleGuardsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("identity under budget: same rows, same schema, no guard columns") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
    val g = ScaleGuards.cardinalityGuard(df, "spec-frame", 10L, "unused")
    assert(g.columns.toSeq == df.columns.toSeq)
    assert(g.orderBy($"k").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("boundary: count == budget passes; count == budget + 1 raises " +
      "with the remedy in the message") {
    import spark.implicits._
    val at = (1 to 5).map(i => (s"k$i", i.toLong)).toDF("k", "v")
    assert(ScaleGuards.cardinalityGuard(at, "x", 5L, "r").count() == 5L)
    val over = (1 to 6).map(i => (s"k$i", i.toLong)).toDF("k", "v")
    val e = intercept[Exception] {
      ScaleGuards.cardinalityGuard(over, "p136 gram persist", 5L,
        "drop the persist and re-scan").count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("p136 gram persist"), msg.take(300))
    assert(msg.contains("exceeds budget=5"), msg.take(300))
    assert(msg.contains("drop the persist and re-scan"), msg.take(300))
  }

  test("the guard rides every consumer: an aggregate over the guarded " +
      "frame trips it too, not just a row scan") {
    import spark.implicits._
    val over = (1 to 8).map(i => (s"k${i % 2}", i.toLong)).toDF("k", "v")
    intercept[Exception] {
      ScaleGuards.cardinalityGuard(over, "agg-consumer", 3L, "shard it")
        .groupBy($"k").agg(sum($"v")).collect()
    }
  }

  test("witnessGuard: identity while the witness fits; raises with the " +
      "remedy when it doesn't — and the witness never joins the data") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val okW = Seq("s1", "s2").toDF("src")
    val g = ScaleGuards.witnessGuard(df, okW, "dict", 2L, "roll up")
    assert(g.columns.toSeq == df.columns.toSeq)
    assert(g.count() == 2L)
    val badW = Seq("s1", "s2", "s3").toDF("src")
    val e = intercept[Exception] {
      ScaleGuards.witnessGuard(df, badW, "p39 source dict", 2L,
        "roll sources up to a bounded family").count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("p39 source dict"), msg.take(300))
    assert(msg.contains("exceeds budget=2"), msg.take(300))
    assert(msg.contains("bounded family"), msg.take(300))
  }

  test("p39's source-dictionary guard: corpus-order source labels " +
      "fail fast instead of forming a sources^2 matrix") {
    import spark.implicits._
    // every doc its own source: 5 > the tiny budget
    val docs = (1 to 5).map(i =>
      (i.toLong, s"src$i", "w1 w2 w3 w4 w5 w6 w7 w8 w9"))
      .toDF("doc_id", "source", "text")
    val e = intercept[Exception] {
      TextAnalysis.crossSourceNgramLeak(docs, "doc_id", "source", "text",
        n = 8, maxDocDf = 50, maxSources = 3L).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("crossSourceNgramLeak"), msg.take(300))
    assert(msg.contains("roll corpus-order"), msg.take(300))
    // under budget: identical output to the unguarded shape
    val ok = TextAnalysis.crossSourceNgramLeak(docs, "doc_id", "source",
      "text", n = 8, maxDocDf = 50, maxSources = 5L)
      .orderBy($"src_a", $"src_b").collect()
    // 9 tokens -> two 8-gram windows per doc, both shared by all pairs
    assert(ok.length == 10 && ok.forall(_.getLong(2) == 2L))
  }

  test("p48's doc-length guard: an over-long document fails fast " +
      "instead of funneling one span-merge window") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, "web", long), (2L, "book", long))
      .toDF("doc_id", "source", "text")
    val e = intercept[Exception] {
      TextAnalysis.crossSourceLeakSpans(docs, "doc_id", "source", "text",
        k = 8, maxDocTokens = 30L).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("crossSourceLeakSpans"), msg.take(300))
    assert(msg.contains("pre-chunk the outliers"), msg.take(300))
    // within the bound the full-leak fixture reports full-depth spans
    val ok = TextAnalysis.crossSourceLeakSpans(docs, "doc_id", "source",
      "text", k = 8, maxDocTokens = 40L)
      .orderBy($"doc_id").collect()
    assert(ok.length == 2 && ok.forall(_.getLong(3) == 40L))
  }

  test("p61's winnowing doc-length guard: an over-long document fails " +
      "fast instead of funneling one selection window") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, long), (2L, long)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.winnowedFingerprints(docs, "doc_id", "text",
        k = 4, w = 4, maxDocTokens = 30L).count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("winnowedFingerprints"), msg.take(300))
    assert(msg.contains("w+k-1 overlap"), msg.take(300))
    // within the bound: identical output to the unguarded shape — two
    // identical docs share every selected fingerprint
    val ok = Dedup.winnowedPairs(docs, "doc_id", "text",
      k = 4, w = 4, minShared = 2).collect()
    assert(ok.length == 1 && ok.head.getLong(0) == 1L &&
      ok.head.getLong(1) == 2L)
  }

  test("p82's eval posting-list guard: a corpus-order eval gram fails " +
      "fast instead of fanning out eval_df x train_df pairs") {
    import spark.implicits._
    // the guard sits inline in the p82 entry; drive it through the
    // same witnessGuard shape the entry builds (budget 0, df witness)
    val eval = Seq((1L, "g1"), (2L, "g1"), (3L, "g2"))
      .toDF("e_id", "gram")
    val guarded = ScaleGuards.witnessGuard(
      eval,
      eval.groupBy($"gram").agg(count(lit(1)).as("df"))
        .filter($"df" > 1L),
      what = "p82 eval posting lists", budget = 0L,
      remedy = "stop-list benchmark boilerplate grams")
    val e = intercept[Exception] { guarded.count() }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("p82 eval posting lists"), msg.take(300))
    assert(msg.contains("stop-list"), msg.take(300))
    // under the bound the guard is the identity
    val ok = ScaleGuards.witnessGuard(
      eval,
      eval.groupBy($"gram").agg(count(lit(1)).as("df"))
        .filter($"df" > 2L),
      what = "p82 eval posting lists", budget = 0L, remedy = "unused")
    assert(ok.count() == 3L)
  }
}
