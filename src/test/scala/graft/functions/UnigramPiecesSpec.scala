package graft.functions

import graft.SparkTestSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The unigram-LM (SentencePiece-style) tokenizer's contract: Viterbi
  * min-cost segmentation with longest-among-optimal tie-break, whole
  * word [UNK] when no segmentation exists — pinned golden (including
  * the greedy-vs-Viterbi divergence that motivates the family), fuzzed
  * against an independent exhaustive-enumeration reference, and pinned
  * codegen == interpreted through a DataFrame.
  */
class UnigramPiecesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def enc(vocab: Seq[(String, Int)], w: String): Seq[String] = {
    val arr = UnigramTable.encode(
      UnigramTable.build(vocab), UTF8String.fromString(w))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  test("golden: Viterbi beats greedy longest-match — the family's point") {
    // greedy MaxMatch takes "dat" (390 total); the optimum is da+ta
    // (230). A WordPiece-style tokenizer would return the 390 path.
    val v = Seq("a" -> 100, "d" -> 100, "t" -> 100,
      "da" -> 120, "ta" -> 110, "dat" -> 290)
    assert(enc(v, "data") == Seq("da", "ta"))
    // and greedy can strand entirely where Viterbi succeeds:
    // longest-first takes "abc", leaves 'd' uncovered in {abc, a, bcd}
    val v2 = Seq("abc" -> 50, "a" -> 10, "bcd" -> 15)
    assert(enc(v2, "abcd") == Seq("a", "bcd"))
  }

  test("golden: equal-cost tie takes the LONGEST piece at the cursor") {
    // li (200) vs l+i (100+100=200): same total, longest-first => li
    val v = Seq("l" -> 100, "i" -> 100, "n" -> 100, "e" -> 100,
      "li" -> 200, "ne" -> 200)
    assert(enc(v, "line") == Seq("li", "ne"))
    // tie broken at EVERY cursor independently, left to right
    assert(enc(v, "lien") == Seq("li", "e", "n"))
  }

  test("golden: uncoverable word is exactly [UNK]; empty word is empty") {
    val v = Seq("a" -> 100, "b" -> 100)
    assert(enc(v, "axb") == Seq(UnigramTable.Unk))
    assert(enc(v, "") == Nil)
    assert(enc(v, "ab") == Seq("a", "b"))
  }

  test("golden: cheaper many-piece path beats an expensive whole-word piece") {
    val v = Seq("order" -> 600, "ord" -> 250, "er" -> 130, "o" -> 100,
      "r" -> 100, "d" -> 100, "e" -> 100)
    // ord+er = 380 < order = 600 < o+r+d+e+r = 500
    assert(enc(v, "order") == Seq("ord", "er"))
  }

  test("fuzz: agrees with the exhaustive-enumeration reference") {
    val rnd = new scala.util.Random(41)
    for (round <- 0 until 400) {
      val alpha = "abc"
      def rs(maxLen: Int) =
        Seq.fill(1 + rnd.nextInt(maxLen))(
          alpha(rnd.nextInt(alpha.length))).mkString
      val pieces = (Seq.fill(6)(rs(3)) ++
        // singles with prob ~1/2 each, so UNK paths occur
        alpha.map(_.toString).filter(_ => rnd.nextBoolean())).distinct
      val vocab = pieces.map(p => p -> (1 + rnd.nextInt(500)))
      val word = rs(9)
      assert(enc(vocab, word) == UnigramTable.naiveEncode(vocab, word),
        s"round $round vocab=$vocab word=$word")
    }
  }

  test("fuzz: ties everywhere — all-equal costs reduce to greedy-compatible optima") {
    // with every piece cost 1, min cost = fewest pieces; tie-break =
    // longest at each cursor. Still must match the naive enumerator.
    val rnd = new scala.util.Random(97)
    for (round <- 0 until 200) {
      val alpha = "ab"
      def rs(maxLen: Int) =
        Seq.fill(1 + rnd.nextInt(maxLen))(
          alpha(rnd.nextInt(alpha.length))).mkString
      val vocab = (Seq.fill(5)(rs(3)) ++ alpha.map(_.toString))
        .distinct.map(_ -> 1)
      val word = rs(8)
      assert(enc(vocab, word) == UnigramTable.naiveEncode(vocab, word),
        s"round $round vocab=$vocab word=$word")
    }
  }

  test("codegen and interpreted paths agree through a DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(13)
    val vocab = Seq("a" -> 100, "b" -> 100, "c" -> 100, "ab" -> 150,
      "bc" -> 150, "abc" -> 240, "cab" -> 180)
    val words = (0 until 150).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(8))(
        "abcd".charAt(rnd.nextInt(4))).mkString))
    val viaDf = words.toDF("id", "word")
      .select($"id", UnigramFunctions.unigram_pieces($"word", vocab).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    words.foreach { case (id, w) =>
      val direct = {
        val arr = UnigramTable.encode(
          UnigramTable.build(vocab), UTF8String.fromString(w))
        (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      }
      assert(viaDf(id) == direct, s"word=$w")
    }
  }
}
