package graft.functions

import graft.SparkTestSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The token-LCS kernel's contract: exact longest common subsequence
  * over space-split tokens vs a fixed reference — pinned golden
  * (order-sensitivity, non-contiguity, repeats), fuzzed against the
  * independent full-table DP, and pinned codegen == interpreted.
  */
class LcsTokensSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def lcs(ref: Seq[String], text: String): Int =
    LcsTokens.lcs(ref.toArray, UTF8String.fromString(text))

  test("golden: subsequence not substring, order-sensitive") {
    assert(lcs(Seq("a", "b", "c"), "a x b y c") == 3) // gaps allowed
    assert(lcs(Seq("a", "b", "c"), "c b a") == 1)     // order matters
    assert(lcs(Seq("a", "b", "c"), "a c b c") == 3)   // a .. b .. c
    assert(lcs(Seq("x"), "a b c") == 0)
  }

  test("golden: repeated tokens count once per pairing") {
    assert(lcs(Seq("a", "a"), "a") == 1)
    assert(lcs(Seq("a"), "a a a") == 1)
    assert(lcs(Seq("a", "a"), "a b a") == 2)
  }

  test("golden: empty text is one empty token, never a match") {
    assert(lcs(Seq("a"), "") == 0)
  }

  test("golden: ROUGE-L F identity 2*lcs/(m+n) on a known pair") {
    // doc of 5 tokens sharing a 3-token subsequence with a 4-token ref
    val ref = Seq("the", "query", "scan", "merge")
    val doc = "the big query fast scan"
    assert(lcs(ref, doc) == 3)
    assert(2 * 3 * 1000000 / (5 + 4) == 666666)
  }

  test("fuzz: agrees with the independent full-table DP") {
    val rnd = new scala.util.Random(71)
    for (round <- 0 until 500) {
      val alpha = Seq("a", "b", "c", "d")
      def seq(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.size)))
      val ref = seq(1 + rnd.nextInt(8))
      val toks = seq(rnd.nextInt(20) match { case 0 => 1; case n => n })
      val text = toks.mkString(" ")
      assert(lcs(ref, text) == LcsTokens.naiveLcs(ref, toks),
        s"round $round ref=$ref text=$text")
    }
  }

  test("codegen and interpreted paths agree through a DataFrame") {
    import spark.implicits._
    val ref = Seq("a", "b", "a", "c")
    val rnd = new scala.util.Random(3)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(12))(
        Seq("a", "b", "c", "d")(rnd.nextInt(4))).mkString(" "))
    }
    val viaDf = rows.toDF("id", "text")
      .select($"id", LcsFunctions.lcs_tokens($"text", ref).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, text) =>
      assert(viaDf(id) == lcs(ref, text), s"row $id: $text")
    }
  }
}
