package graft.functions

import graft.SparkTestSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The local-alignment kernel's contract: Smith–Waterman over tokens
  * (+2 match / −1 mismatch / −1 gap / floor 0), best cell anywhere —
  * pinned golden (contiguity beats scatter — the property that
  * distinguishes it from LCS), fuzzed against the independent
  * full-table DP, and pinned codegen == interpreted.
  */
class SwTokensSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def sw(ref: Seq[String], text: String): Int =
    SwTokens.sw(ref.toArray, UTF8String.fromString(text))

  test("golden: verbatim quote scores 2k; scatter decays — LCS cannot tell") {
    val ref = Seq("a", "b", "c", "d")
    val quote = "x a b c d y"
    val scatter = "a x x b x x c x x d"
    assert(sw(ref, quote) == 8)
    assert(sw(ref, scatter) < 8)
    // ...but LCS scores both 4 — the two kernels answer different
    // questions, which is why p128 AND p129 both exist
    assert(LcsTokens.lcs(ref.toArray, UTF8String.fromString(quote)) == 4)
    assert(LcsTokens.lcs(ref.toArray, UTF8String.fromString(scatter)) == 4)
  }

  test("golden: one gap costs 1, one mismatch costs 1, floor is 0") {
    val ref = Seq("a", "b", "c")
    assert(sw(ref, "a b c") == 6)
    assert(sw(ref, "a b x c") == 5)  // gap in doc
    assert(sw(ref, "a c") == 3)      // gap in ref: 2 - 1 + 2
    assert(sw(ref, "a x c") == 3)    // mismatch aligned: 2 - 1 + 2
    assert(sw(ref, "z z z") == 0)    // floor, never negative
  }

  test("golden: best LOCAL span wins even mid-document") {
    val ref = Seq("p", "q")
    assert(sw(ref, "z z p q z z") == 4)
    // separated by 3: bridging costs 2 - 3 + 2 = 1, a lone match wins
    assert(sw(ref, "p z z z q") == 2)
  }

  test("golden: empty text is one empty token, scores 0") {
    assert(sw(Seq("a"), "") == 0)
  }

  test("fuzz: agrees with the independent full-table DP") {
    val rnd = new scala.util.Random(113)
    for (round <- 0 until 500) {
      val alpha = Seq("a", "b", "c", "d")
      def seq(n: Int) = Seq.fill(n)(alpha(rnd.nextInt(alpha.size)))
      val ref = seq(1 + rnd.nextInt(8))
      val toks = seq(1 + rnd.nextInt(18))
      val text = toks.mkString(" ")
      assert(sw(ref, text) == SwTokens.naiveSw(ref, toks),
        s"round $round ref=$ref text=$text")
    }
  }

  test("codegen and interpreted paths agree through a DataFrame") {
    import spark.implicits._
    val ref = Seq("a", "b", "a", "c")
    val rnd = new scala.util.Random(9)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(12))(
        Seq("a", "b", "c", "d")(rnd.nextInt(4))).mkString(" "))
    }
    val viaDf = rows.toDF("id", "text")
      .select($"id", LcsFunctions.sw_tokens($"text", ref).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (id, text) =>
      assert(viaDf(id) == sw(ref, text), s"row $id: $text")
    }
  }
}
