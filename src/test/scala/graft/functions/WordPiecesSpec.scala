package graft.functions

import graft.SparkTestSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The greedy longest-match tokenizer's contract: MaxMatch semantics
  * (longest piece at the cursor wins, start vs ## continuation piece
  * classes, whole-word [UNK] on any uncovered cursor) — pinned golden,
  * fuzzed against the naive whole-vocabulary scan, and pinned
  * codegen == interpreted through a DataFrame.
  */
class WordPiecesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def enc(vocab: Seq[String], w: String): Seq[String] = {
    val arr = WordPieceTable.encode(
      WordPieceTable.build(vocab), UTF8String.fromString(w))
    (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
  }

  private val V = Seq("a", "b", "c", "d", "##a", "##b", "##c", "##d",
    "ab", "abc", "##bc", "##cd", "##bcd")

  test("golden: longest match wins at every cursor") {
    assert(enc(V, "abc") == Seq("abc"))
    assert(enc(V, "abcd") == Seq("abc", "##d"))
    // after 'a', the continuation class is consulted: ##bcd beats ##bc
    assert(enc(V, "abcda") == Seq("abc", "##d", "##a"))
    assert(enc(V, "aabcd") == Seq("a", "##a", "##bcd"))
  }

  test("golden: greedy is NOT optimal and that is the contract") {
    // greedy takes ab then has no piece for the bare 'e'; an optimal
    // segmentation (a, ##b, ...) does not exist either here — but the
    // classic case: vocab {ab, ##x, a, ##bx} on "abx": greedy takes
    // "ab" then needs ##x and succeeds; on vocab {ab, a, ##bx} greedy
    // takes "ab", fails at 'x', and the word is [UNK] even though
    // (a, ##bx) covers it — MaxMatch, not search
    assert(enc(Seq("ab", "##x", "a", "##bx"), "abx") == Seq("ab", "##x"))
    assert(enc(Seq("ab", "a", "##bx"), "abx") == Seq(WordPieceTable.Unk))
  }

  test("golden: start pieces never match mid-word, ## never at start") {
    // 'ab' exists only as a START piece; at cursor 2 of "aab" the
    // continuation class has no 'ab', so single ##a then ##b
    assert(enc(Seq("a", "ab", "##a", "##b"), "aab") ==
      Seq("a", "##a", "##b"))
    // '##a' alone cannot start a word
    assert(enc(Seq("##a"), "a") == Seq(WordPieceTable.Unk))
  }

  test("golden: empty word encodes to no pieces") {
    assert(enc(V, "").isEmpty)
  }

  test("fuzz: agrees with the naive whole-vocabulary scan") {
    val rnd = new scala.util.Random(23)
    for (round <- 0 until 300) {
      val alpha = "abc"
      def rs(maxLen: Int) =
        Seq.fill(1 + rnd.nextInt(maxLen))(
          alpha(rnd.nextInt(alpha.length))).mkString
      val starts = Seq.fill(4)(rs(3)).distinct
      val conts = Seq.fill(4)("##" + rs(3)).distinct
      val vocab = (starts ++ conts).distinct
      val word = rs(10)
      assert(enc(vocab, word) == WordPieceTable.naiveEncode(vocab, word),
        s"round $round vocab=$vocab word=$word")
    }
  }

  test("codegen and interpreted paths agree through a DataFrame") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(5)
    val words = (0 until 150).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(8))(
        "abcd".charAt(rnd.nextInt(4))).mkString))
    val viaDf = words.toDF("id", "word")
      .select($"id", MatchFunctions.wordpieces($"word", V).as("p"))
      .as[(Long, Seq[String])].collect().toMap
    words.foreach { case (id, w) =>
      assert(viaDf(id) == enc(V, w), s"word $w")
    }
  }
}
