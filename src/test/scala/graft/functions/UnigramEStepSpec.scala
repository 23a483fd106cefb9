package graft.functions

import graft.SparkTestSession
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The unigram E-step's contract: exact-integer expected piece counts
  * (forward-backward over integer lattice weights, eppm =
  * floor(10^6·num/Z)) — pinned golden, fuzzed against the independent
  * exhaustive-enumeration reference, validated against an independent
  * RATIONAL-arithmetic probability computation (the homogenization
  * argument made executable), and pinned codegen == interpreted. Plus
  * the M-step quantizer's ([[IntLog]]) exactness pins.
  */
class UnigramEStepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def estep(w: Seq[(String, Long)], word: String,
      cap: Int = 10): Seq[(String, Long)] = {
    val arr = UnigramLattice.estep(
      UnigramLattice.build(w, cap), UTF8String.fromString(word))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getLong(1))
    }
  }

  test("golden: hand-computed two-path lattice") {
    // "ab" under {a:2, b:3, ab:5}: segs a+b (weight 6) and ab (5),
    // Z = 11. E[a] = E[b] = 6/11, E[ab] = 5/11.
    val w = Seq("a" -> 2L, "b" -> 3L, "ab" -> 5L)
    assert(estep(w, "ab") == Seq(
      ("a", 6L * 1000000 / 11),
      ("ab", 5L * 1000000 / 11),
      ("b", 6L * 1000000 / 11)))
    // single-path word: probability 1 on each used piece
    assert(estep(w, "a") == Seq(("a", 1000000L)))
  }

  test("empty, over-cap, and uncoverable words yield an empty array") {
    val w = Seq("a" -> 2L, "b" -> 3L)
    assert(estep(w, "") == Nil)
    assert(estep(w, "axb") == Nil)
    assert(estep(w, "a" * 11) == Nil)
    assert(estep(w, "a" * 11, cap = 10) == Nil)
    // exactly at the cap still computes
    assert(estep(w, "a" * 10).nonEmpty)
  }

  test("fuzz: agrees with the exhaustive-enumeration reference") {
    val rnd = new scala.util.Random(53)
    for (round <- 0 until 400) {
      val alpha = "abc"
      def rs(maxLen: Int) =
        Seq.fill(1 + rnd.nextInt(maxLen))(
          alpha(rnd.nextInt(alpha.length))).mkString
      val pieces = (Seq.fill(6)(rs(3)) ++
        alpha.map(_.toString).filter(_ => rnd.nextBoolean())).distinct
      val w = pieces.map(p => p -> (1L + rnd.nextInt(500)))
      val word = rs(9)
      assert(estep(w, word) == UnigramLattice.naiveEStep(w, word),
        s"round $round w=$w word=$word")
    }
  }

  test("homogenized weights reproduce the rational probability measure") {
    // The p130 construction: per-piece probability W/256, lattice
    // weight V = W·256^(len−1). Expected counts under the TRUE
    // rational measure P(seg) = Π (W/256) — computed here with exact
    // BigInt fractions over the common denominator 256^maxPieces,
    // weighting each segmentation independently of the lattice — must
    // equal the integer lattice's output exactly.
    val rnd = new scala.util.Random(71)
    for (round <- 0 until 100) {
      val alpha = "ab"
      def rs(maxLen: Int) =
        Seq.fill(1 + rnd.nextInt(maxLen))(
          alpha(rnd.nextInt(alpha.length))).mkString
      val pieces = (Seq.fill(4)(rs(3)) ++ alpha.map(_.toString)).distinct
      val probs = pieces.map(p => p -> (1L + rnd.nextInt(255)))
      val lattice = probs.map { case (p, w) =>
        p -> w * math.pow(256.0, (p.length - 1).toDouble).toLong }
      val word = rs(7)
      // independent rational path: enumerate segmentations, weight by
      // Π W scaled to the common denominator 256^n via 256^(n−k)
      val wm = probs.toMap
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to s.length).flatMap { l =>
          val p = s.substring(0, l)
          if (wm.contains(p)) segs(s.substring(l)).map(p :: _) else Nil
        }
      val all = segs(word)
      val expected =
        if (all.isEmpty) Nil
        else {
          val n = word.length
          val weighted = all.map { seg =>
            val scale = BigInt(256).pow(n - seg.size)
            (seg, seg.map(p => BigInt(wm(p))).product * scale)
          }
          val z = weighted.map(_._2).sum
          weighted.flatMap { case (seg, wt) => seg.map(p => (p, wt)) }
            .groupBy(_._1)
            .map { case (p, ts) =>
              p -> ((ts.map(_._2).sum * 1000000) / z).toLong }
            .toSeq.sortBy(_._1)
        }
      assert(estep(lattice, word) == expected,
        s"round $round probs=$probs word=$word")
    }
  }

  test("per-word expected piece mass is bounded by the word length") {
    val rnd = new scala.util.Random(29)
    for (_ <- 0 until 100) {
      val w = Seq("a" -> (1L + rnd.nextInt(100)),
        "b" -> (1L + rnd.nextInt(100)), "ab" -> (1L + rnd.nextInt(100)),
        "ba" -> (1L + rnd.nextInt(100)))
      val word = Seq.fill(1 + rnd.nextInt(8))(
        "ab"(rnd.nextInt(2))).mkString
      val tot = estep(w, word).map(_._2).sum
      // between 1 piece (whole word) and n pieces (all singles), with
      // floor loss of at most one ppm unit per emitted piece
      assert(tot <= word.length.toLong * 1000000)
      assert(tot >= 1000000L - estep(w, word).size)
    }
  }

  test("codegen and interpreted paths agree through a DataFrame") {
    import spark.implicits._
    val w = Seq("a" -> 161L, "b" -> 161L, "c" -> 161L,
      "ab" -> 150L * 256, "bc" -> 150L * 256, "abc" -> 90L * 65536)
    val rnd = new scala.util.Random(17)
    val words = (0 until 150).map(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(8))(
        "abcd".charAt(rnd.nextInt(4))).mkString))
    val viaDf = words.toDF("id", "word")
      .select($"id",
        UnigramFunctions.unigram_estep($"word", w, 10).as("pe"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(x => (x.getString(0), x.getLong(1))))
      .toMap
    words.foreach { case (id, word) =>
      assert(viaDf(id) == estep(w, word), s"word=$word")
    }
  }

  test("ilog2f: exact on powers of two, close to log2 everywhere") {
    for (k <- 0 to 62)
      assert(IntLog.ilog2f(1L << k) == k.toLong * 65536, s"2^$k")
    val rnd = new scala.util.Random(83)
    for (_ <- 0 until 2000) {
      val x = 1L + (rnd.nextLong() & ((1L << 50) - 1))
      val got = IntLog.ilog2f(x) / 65536.0
      val want = math.log(x.toDouble) / math.log(2.0)
      // truncation in the square-and-extract steps only ever UNDERshoots
      assert(got <= want + 1e-9 && want - got < 0.001, s"x=$x got=$got")
    }
    intercept[IllegalArgumentException](IntLog.ilog2f(0L))
    intercept[IllegalArgumentException](IntLog.ilog2f((1L << 62) + 1))
  }

  test("estep input contract: weight and cap bounds enforced") {
    import graft.functions.{UnigramEStep => E}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val lit = Literal.create("x",
      org.apache.spark.sql.types.StringType)
    intercept[IllegalArgumentException](E(lit, Seq("a" -> 0L), 10))
    intercept[IllegalArgumentException](E(lit, Seq("a" -> (1L << 33)), 10))
    intercept[IllegalArgumentException](E(lit, Seq("a" -> 1L), 11))
    intercept[IllegalArgumentException](E(lit, Seq.empty, 10))
    intercept[IllegalArgumentException](
      E(lit, Seq("a" -> 1L, "a" -> 2L), 10))
  }
}
