package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The multi-pattern matcher's contract: ALL occurrences of ALL terms
  * (overlapping, nested, and failure-link cases included), 1-based
  * positions, deterministic (end asc, tid asc) order — pinned golden,
  * then fuzzed against the naive O(terms x chars) scan, then pinned
  * codegen == interpreted (the automaton rides the codegen references
  * array; both paths must traverse the same automaton).
  */
class MultiMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def matchesOf(terms: Seq[String], s: String): Seq[(Int, Int)] = {
    val arr = AhoCorasick.findAll(
      AhoCorasick.build(terms), UTF8String.fromString(s))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getInt(0), r.getInt(1))
    }
  }

  test("golden: suffix-term emission — every 'spark' also fires 'park'") {
    val terms = Seq("spark", "park")
    assert(matchesOf(terms, "sparkpark") ==
      // "spark" ends at 5 -> (tid 0, pos 1) and (tid 1, pos 2);
      // the literal "park" at pos 6 ends at 9
      Seq((0, 1), (1, 2), (1, 6)))
  }

  test("golden: overlapping self-matches — 'aa' in 'aaaa' fires 3 times") {
    assert(matchesOf(Seq("aa"), "aaaa") == Seq((0, 1), (0, 2), (0, 3)))
  }

  test("golden: nested terms at one end position emit in tid order") {
    // both terms end at position 3 of "abc": "abc" (tid 0) and "bc"
    // (tid 1) -> documented tie-break is tid asc
    assert(matchesOf(Seq("abc", "bc"), "xabcx") == Seq((0, 2), (1, 3)))
    assert(matchesOf(Seq("bc", "abc"), "xabcx") == Seq((0, 3), (1, 2)))
  }

  test("golden: no match, empty text, term longer than text") {
    assert(matchesOf(Seq("zz"), "aaaa").isEmpty)
    assert(matchesOf(Seq("a"), "").isEmpty)
    assert(matchesOf(Seq("aaaaa"), "aaa").isEmpty)
  }

  test("fuzz: automaton agrees with the naive scan on random dictionaries") {
    val rnd = new scala.util.Random(42)
    for (round <- 0 until 300) {
      val alpha = "ab" + (if (round % 3 == 0) "c" else "")
      val text = Seq.fill(rnd.nextInt(60))(
        alpha(rnd.nextInt(alpha.length))).mkString
      val terms = rnd.shuffle(
        (1 to 3).flatMap(len => Seq.fill(4)(Seq.fill(len)(
          alpha(rnd.nextInt(alpha.length))).mkString)).distinct.toList)
        .take(1 + rnd.nextInt(6))
      val got = matchesOf(terms, text)
      val want = AhoCorasick.naiveFindAll(terms, text)
      assert(got == want,
        s"round $round terms=$terms text=$text\n got=$got\nwant=$want")
    }
  }

  test("fuzz: non-ASCII fallback — mixed ASCII/BMP dictionaries and text") {
    // the dense-ASCII fast path (ascii array) shadows the boxed-map
    // fallback in every ASCII test; this round forces the fallback
    // branch with BMP code units IN the terms AND in the text, mixed
    // with ASCII so a single traversal crosses both branches (the
    // failure-link walk must be consistent across the branch boundary)
    val rnd = new scala.util.Random(163)
    val alpha = "abé中ж" // é, 中, ж — Latin-1, CJK, Cyrillic
    for (round <- 0 until 400) {
      val text = Seq.fill(rnd.nextInt(60))(
        alpha(rnd.nextInt(alpha.length))).mkString
      val terms = rnd.shuffle(
        (1 to 3).flatMap(len => Seq.fill(4)(Seq.fill(len)(
          alpha(rnd.nextInt(alpha.length))).mkString)).distinct.toList)
        .take(1 + rnd.nextInt(6))
      val got = matchesOf(terms, text)
      val want = AhoCorasick.naiveFindAll(terms, text)
      assert(got == want,
        s"round $round terms=$terms text=$text\n got=$got\nwant=$want")
    }
  }

  test("golden: pure-BMP term inside mixed text, positions in UTF-16 units") {
    // "中中" overlapping like the ASCII "aa" case, and a mixed-script
    // term whose interior characters hop between branches
    assert(matchesOf(Seq("中中"), "中中中") ==
      Seq((0, 1), (0, 2)))
    assert(matchesOf(Seq("a中b"), "xa中bx") == Seq((0, 2)))
    // suffix-emission across the branch boundary: every "s中" also
    // fires "中"
    assert(matchesOf(Seq("s中", "中"), "s中") ==
      Seq((0, 1), (1, 2)))
  }

  test("p111's query shape is exact on a non-ASCII corpus (stream of rows)") {
    // the blocklist-scan entry's shape (explode(multi_match) -> per-tid
    // aggregate) over rows the fixture cannot supply: BMP text, BMP and
    // mixed terms — cross-checked against the naive scan per row
    import spark.implicits._
    val terms = Seq("中文", "ch ba", "été", "a中")
    val rows = Seq(
      (1L, "中文 ch ba 中文中文"),
      (2L, "un été très chaud a中"),
      (3L, "plain ascii ch ba only"),
      (4L, "中中文a中文"))
    val got = rows.toDF("doc_id", "text")
      .select($"doc_id",
        explode(MatchFunctions.multi_match($"text", terms)).as("m"))
      .select($"doc_id", $"m.tid".as("tid"), $"m.pos".as("pos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val want = rows.flatMap { case (id, text) =>
      AhoCorasick.naiveFindAll(terms, text).map { case (tid, pos) =>
        (id, tid, pos) }
    }.toSet
    assert(got == want)
    assert(want.exists(_._2 == 0) && want.exists(_._2 == 3),
      "fixture must actually exercise BMP and mixed terms")
  }

  test("codegen and interpreted paths agree through a DataFrame") {
    import spark.implicits._
    val terms = Seq("spark", "park", "aa", "ch ba")
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(50))(
        "spark park aach b".charAt(rnd.nextInt(17))).mkString)
    }
    val viaDf = rows.toDF("id", "text")
      .select($"id", MatchFunctions.multi_match($"text", terms).as("m"))
      .selectExpr("id", "transform(m, x -> struct(x.tid, x.pos)) AS m")
      .as[(Long, Seq[(Int, Int)])].collect().toMap
    rows.foreach { case (id, text) =>
      assert(viaDf(id) == matchesOf(terms, text), s"row $id: $text")
    }
  }

  test("null text yields null, not a crash") {
    import spark.implicits._
    val n = Seq((1L, Option.empty[String]), (2L, Some("spark")))
      .toDF("id", "text")
      .select($"id", MatchFunctions.multi_match($"text", Seq("spark")).as("m"))
      .filter($"m".isNull).count()
    assert(n == 1L)
  }
}
