package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Golden BPE merges on a hand-computed corpus (the algorithm is
  * iterative, so no SQL oracle exists — this spec IS the correctness
  * gate for p42's rows-only entry).
  */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("learnMerges reproduces the hand-computed merge sequence") {
    import spark.implicits._
    // dictionary: aaab x2, ab x1
    //  round 1: (a,a) weighted 4 beats (a,b) 3        -> aa
    //  round 2: (a,b) 3 beats (aa,a) 2                -> ab
    //  round 3: (aa,ab) 2                             -> aaab
    //  round 4: no pairs left -> stop
    val df = Seq("aaab aaab ab").toDF("text")
    val got = BpeTrainer.learnMerges(df, "text", numMerges = 10)
      .orderBy($"rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (0, "a", "a", "aa", 4L),
      (1, "a", "b", "ab", 3L),
      (2, "aa", "ab", "aaab", 2L)))
    // the pair-count-delta mode must learn the IDENTICAL table
    val inc = BpeTrainer.learnMerges(df, "text", numMerges = 10,
        incremental = true)
      .orderBy($"rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(inc.toSeq == got.toSeq)
  }

  test("greedy left-to-right overlap: aaa merges to [aa, a], not [aa, aa]") {
    import spark.implicits._
    val df = Seq("aaa aaa aaa").toDF("text")
    val merges = BpeTrainer.learnMerges(df, "text", numMerges = 1)
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(merges.toSeq == Seq(("a", "a")))
    val toks = BpeTrainer.applyMerges(df.limit(1), "text", merges.toSeq)
      .select("bpe_tokens").collect()
      .map(_.getSeq[String](0).toList)
    assert(toks.forall(_ == List("aa", "a")))
  }

  test("applyMerges enforces the expression-tree merge ceiling") {
    import spark.implicits._
    val df = Seq("ab").toDF("text")
    val tooMany = (0 until BpeTrainer.MaxExpressionMerges + 1)
      .map(i => (s"x$i", s"y$i"))
    val e = intercept[IllegalArgumentException] {
      BpeTrainer.applyMerges(df, "text", tooMany)
    }
    assert(e.getMessage.contains("applyMergesIterative"))
  }

  test("applyMergesIterative matches applyMerges, and scales past the ceiling") {
    import spark.implicits._
    val df = Seq((1L, "aaab banana aab"), (2L, "aaa")).toDF("id", "text")
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"), ("a", "n"))
    val expr = BpeTrainer.applyMerges(df, "text", merges)
      .select($"id", $"bpe_tokens").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).sortBy(_.toString)
    val iter = BpeTrainer.applyMergesIterative(df, "text", merges)
      .select($"id", $"bpe_tokens").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).sortBy(_.toString)
    assert(expr.toSeq == iter.toSeq)
    // a merge table far past the expression ceiling runs fine here: the
    // table rides a broadcast, the plan stays constant-size
    val big = (0 until 1000).map(i => (s"q$i", s"z$i")) ++ merges
    val bigToks = BpeTrainer.applyMergesIterative(df, "text", big)
      .select($"id", $"bpe_tokens").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).sortBy(_.toString)
    assert(bigToks.toSeq == iter.toSeq) // unused merges change nothing
  }

  test("property: full-recount and incremental modes learn identical tables") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    // random small corpora over a 3-letter alphabet: word shapes that
    // exercise overlap merges ("aaa"), cross-word frequency ties, and
    // the minPairCount floor
    val genWord = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val genCorpus = Gen.chooseNum(3, 12).flatMap(n =>
      Gen.listOfN(n, genWord).map(_.mkString(" ")))
    val prop = forAll(genCorpus) { corpus =>
      val df = Seq(corpus).toDF("text")
      def table(inc: Boolean) =
        BpeTrainer.learnMerges(df, "text", numMerges = 4, incremental = inc)
          .orderBy($"rank").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2),
            r.getLong(4))).toSeq
      val full = table(inc = false)
      val delta = table(inc = true)
      Prop(full == delta).label(s"corpus='$corpus' full=$full delta=$delta")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.toString)
  }

  test("property: applyMergesIterative matches applyMerges on random input") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    val genWord = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b")).map(_.mkString))
    val genCase = for {
      words <- Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, genWord))
      merges <- Gen.someOf(Seq(("a", "a"), ("a", "b"), ("b", "a"),
        ("b", "b"), ("aa", "b"), ("ab", "a")))
    } yield (words.mkString(" "), merges.toSeq)
    val prop = forAll(genCase) { case (text, merges) =>
      val df = Seq(text).toDF("text")
      def toks(d: org.apache.spark.sql.DataFrame) =
        d.select($"bpe_tokens").collect().map(_.getSeq[String](0).toList).toSeq
      val expr = toks(BpeTrainer.applyMerges(df, "text", merges))
      val iter = toks(BpeTrainer.applyMergesIterative(df, "text", merges))
      Prop(expr == iter).label(s"text='$text' merges=$merges")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.toString)
  }

  test("minPairCount floor stops the loop; ties break lexicographically") {
    import spark.implicits._
    // every pair occurs once -> below the default floor of 2 after the
    // first (tie-broken) merge consumes them
    val df = Seq("xy").toDF("text")
    val got = BpeTrainer.learnMerges(df, "text", numMerges = 5,
      minPairCount = 1L).collect()
    assert(got.length == 1) // (x,y) -> xy, then no pairs remain
    // lexicographic tie-break: "ab" and "ba" pairs both count 2; (a,b) wins
    val tie = Seq("ab ab ba ba").toDF("text")
    val first = BpeTrainer.learnMerges(tie, "text", numMerges = 1)
      .collect().head
    assert((first.getString(1), first.getString(2)) == ("a", "b"))
  }
}
