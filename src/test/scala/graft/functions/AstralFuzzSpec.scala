package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Supplementary-plane (astral) coverage for the tokenizer/matcher
  * expression family. The family's documented contract is UTF-16 code
  * units (MatchExpressions.scala's MultiMatch Scaladoc — "the
  * GearChunks/p42 precedent"), and until this suite nothing fed it text
  * outside the BMP, where a unit is a code point and the question never
  * arises. Astral characters are surrogate PAIRS: the risks are (a) a
  * matcher/segmenter disagreeing with its independent naive reference
  * once pair-halves enter the automaton/DP, and (b) an output piece
  * splitting a pair — an ill-formed UTF-16 string leaking into a
  * DataFrame.
  *
  * The well-formedness theorem this suite pins: a vocabulary/term match
  * is an exact substring equality, so a match boundary can fall inside
  * a surrogate pair ONLY if some vocabulary entry itself ends with a
  * lone high surrogate (or starts with a lone low one) — with a
  * well-formed vocabulary, every emitted piece is well-formed, astral
  * input or not. [UNK] fallbacks are trivially well-formed.
  *
  * Unit boundaries: the matcher/Viterbi members keep the family's
  * UTF-16 convention (positions are offsets INTO the string), while
  * UnigramEStep counts CODE POINTS — its oracle is a length-indexed
  * CTE ladder, so its unit must be the SQL engines' `length()`/
  * `substr()` unit or astral text diverges cross-engine (it did,
  * pre-r11; the lenCap test below pins the fixed semantics).
  */
class AstralFuzzSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // code-point alphabet spanning the three regimes a traversal can mix:
  // ASCII (dense-array fast paths), BMP non-ASCII (boxed-map fallback),
  // astral (surrogate pairs: emoji, CJK Ext-B, a musical symbol)
  private val cps: IndexedSeq[String] = IndexedSeq(
    "a", "b", "z", "中", "ж",
    new String(Character.toChars(0x1F600)), // 😀
    new String(Character.toChars(0x20000)), // CJK Ext-B first char
    new String(Character.toChars(0x1D11E))) // 𝄞

  private def randStr(rnd: scala.util.Random, nCps: Int): String =
    Seq.fill(nCps)(cps(rnd.nextInt(cps.length))).mkString

  /** No lone surrogates: every high surrogate is followed by a low one
    * and no low surrogate stands alone. */
  private def wellFormed(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1)))
          return false
        i += 2
      } else if (Character.isLowSurrogate(c)) return false
      else i += 1
    }
    true
  }

  test("multi_match fuzz: automaton == naive on astral-mixed text, and " +
      "positions are UTF-16 offsets landing on code-point boundaries") {
    val rnd = new scala.util.Random(2026)
    for (round <- 0 until 400) {
      val text = randStr(rnd, rnd.nextInt(40))
      val terms = rnd.shuffle(
        (1 to 3).flatMap(len => Seq.fill(4)(randStr(rnd, len)))
          .distinct.toList).take(1 + rnd.nextInt(6))
      val ac = AhoCorasick.build(terms)
      val arr = AhoCorasick.findAll(ac, UTF8String.fromString(text))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2); (r.getInt(0), r.getInt(1))
      }
      val want = AhoCorasick.naiveFindAll(terms, text)
      assert(got == want,
        s"round $round terms=$terms text=$text\n got=$got\nwant=$want")
      // pos is a 1-based UTF-16 offset; because terms are well-formed,
      // the matched span covers whole code points: both boundaries land
      // outside any surrogate pair
      got.foreach { case (tid, pos) =>
        val start = pos - 1
        val end = start + terms(tid).length
        assert(text.substring(start, end) == terms(tid))
        assert(!Character.isLowSurrogate(text.charAt(start)),
          s"match start splits a pair: $text @ $pos")
        assert(end == text.length || !Character.isLowSurrogate(text.charAt(end)),
          s"match end splits a pair: $text @ $pos len=${terms(tid).length}")
      }
    }
  }

  test("wordpieces fuzz: encode == naive on astral words; pieces " +
      "well-formed; non-UNK pieces reassemble the word") {
    val rnd = new scala.util.Random(777)
    for (round <- 0 until 400) {
      val word = randStr(rnd, rnd.nextInt(10))
      // vocab: random code-point pieces, each as start and continuation
      val bases = (1 to 2).flatMap(len => Seq.fill(5)(randStr(rnd, len)))
        .distinct.toList
      val vocab = rnd.shuffle(bases.flatMap(p => Seq(p, "##" + p)))
        .take(4 + rnd.nextInt(10)).distinct
      val arr = WordPieceTable.encode(
        WordPieceTable.build(vocab), UTF8String.fromString(word))
      val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      val want = WordPieceTable.naiveEncode(vocab, word)
      assert(got == want, s"round $round vocab=$vocab word=$word")
      got.foreach(p => assert(wellFormed(p), s"ill-formed piece in $got"))
      if (got != Seq(WordPieceTable.Unk))
        assert(got.map(_.stripPrefix("##")).mkString == word)
    }
  }

  test("unigram_pieces fuzz: Viterbi == naive on astral words; pieces " +
      "well-formed; coverage reassembles the word") {
    val rnd = new scala.util.Random(31337)
    for (round <- 0 until 300) {
      val word = randStr(rnd, rnd.nextInt(8))
      val vocab = rnd.shuffle(
        (1 to 2).flatMap(len => Seq.fill(5)(randStr(rnd, len))).distinct
          .toList).take(3 + rnd.nextInt(8))
        .map(p => p -> (50 + rnd.nextInt(300)))
      val arr = UnigramTable.encode(
        UnigramTable.build(vocab), UTF8String.fromString(word))
      val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
      val want = UnigramTable.naiveEncode(vocab, word)
      assert(got == want, s"round $round vocab=$vocab word=$word")
      got.foreach(p => assert(wellFormed(p), s"ill-formed piece in $got"))
      if (got.nonEmpty && got != Seq(UnigramTable.Unk))
        assert(got.mkString == word)
    }
  }

  test("unigram_estep fuzz: lattice == exhaustive on astral words under " +
      "the code-point lenCap; emitted pieces well-formed") {
    val rnd = new scala.util.Random(60902)
    val lenCap = 10
    for (round <- 0 until 300) {
      // the gate counts CODE POINTS: up to 9 astral chars (18 UTF-16
      // units) all pass lenCap 10 — no unit-trimming needed
      val word = randStr(rnd, rnd.nextInt(10))
      val weights = rnd.shuffle(
        (1 to 2).flatMap(len => Seq.fill(5)(randStr(rnd, len))).distinct
          .toList).take(3 + rnd.nextInt(8))
        // length-homogenized bound: V_p <= 256^min(cps,4) with length
        // in code points — a 1-codepoint astral piece caps at 256
        .map(p => p -> (1L + rnd.nextInt(255)))
      val arr = UnigramLattice.estep(
        UnigramLattice.build(weights, lenCap), UTF8String.fromString(word))
      val got = (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2)
        (r.getUTF8String(0).toString, r.getLong(1))
      }
      val want = UnigramLattice.naiveEStep(weights, word)
        .sortBy(_._1)
      assert(got == want, s"round $round weights=$weights word=$word")
      got.foreach { case (p, _) =>
        assert(wellFormed(p), s"ill-formed piece in $got") }
    }
  }

  test("the lenCap gate counts CODE POINTS — the unit Spark length() " +
      "and the DuckDB ladder count, pinned on astral text") {
    val g = new String(Character.toChars(0x1F600))
    val e6 = Seq.fill(6)(g).mkString
    assert(e6.length == 12 && e6.codePointCount(0, e6.length) == 6)
    val weights = Seq(g -> 100L)
    // 6 code points <= lenCap 10 → COMPUTED (pre-r11 the UTF-16 gate
    // saw 12 units and returned empty while both SQL engines called
    // this word 6 characters long — the divergence class this unit
    // change closes): one piece, used 6 times in the single coverable
    // segmentation, eppm = 6 · 10^6
    val out = UnigramLattice.estep(
      UnigramLattice.build(weights, 10), UTF8String.fromString(e6))
    assert(out.numElements() == 1)
    assert(out.getStruct(0, 2).getLong(1) == 6000000L)
    // 11 code points > lenCap 10 → gated out, same as 11 BMP chars
    val e11 = Seq.fill(11)(g).mkString
    val out11 = UnigramLattice.estep(
      UnigramLattice.build(weights, 10), UTF8String.fromString(e11))
    assert(out11.numElements() == 0)
    // a 2-codepoint astral piece indexes at lattice length 2, and a
    // mixed word walks the boundaries exactly
    val w2 = Seq(g + g -> 200L, g -> 16L, "a" -> 10L)
    val outm = UnigramLattice.estep(
      UnigramLattice.build(w2, 10), UTF8String.fromString(s"a$g$g"))
    // segs: a+😀+😀 (10·16·16=2560) and a+😀😀 (10·200=2000), Z=4560
    val got = (0 until outm.numElements()).map { i =>
      val r = outm.getStruct(i, 2)
      (r.getUTF8String(0).toString, r.getLong(1))
    }
    assert(got == Seq(
      ("a", 1000000L),
      (g, 2L * 2560 * 1000000 / 4560),
      (g + g, 2000L * 1000000 / 4560)))
  }

  test("codegen path through a DataFrame handles astral text (matches " +
      "the interpreted naive references row by row)") {
    import spark.implicits._
    val g = new String(Character.toChars(0x1F600))
    val x = new String(Character.toChars(0x20000))
    val terms = Seq(g, x + "a", "a" + g, "中" + x)
    val vocab = Seq("a", "b", "中", g, x, g + g, "##a", "##b", "##中",
      "##" + g, "##" + x)
    val ugv = vocab.filterNot(_.startsWith("##")).map(_ -> 100)
    val rows = Seq(
      (1L, s"a${g}b", s"a$g"),
      (2L, s"$x${g}中$x", s"$x$g$g"),
      (3L, "plain", "plain"),
      (4L, s"中$x${x}a${g}a$g", s"${g}中b"))
    val df = rows.toDF("id", "text", "word")
    val got = df.select($"id",
        MatchFunctions.multi_match($"text", terms).as("m"),
        MatchFunctions.wordpieces($"word", vocab).as("wp"),
        UnigramFunctions.unigram_pieces($"word", ugv).as("ug"))
      .collect()
    got.foreach { r =>
      val id = r.getLong(0)
      val (_, text, word) = rows.find(_._1 == id).get
      val m = r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getInt(0), s.getInt(1)))
      assert(m == AhoCorasick.naiveFindAll(terms, text), s"id=$id")
      val wp = r.getSeq[String](2)
      assert(wp == WordPieceTable.naiveEncode(vocab, word), s"id=$id")
      val ug = r.getSeq[String](3)
      assert(ug == UnigramTable.naiveEncode(ugv, word), s"id=$id")
      (wp ++ ug).foreach(p => assert(wellFormed(p), s"id=$id piece=$p"))
    }
    // the astral terms must actually fire somewhere or this test
    // proves nothing
    val allHits = rows.flatMap(r => AhoCorasick.naiveFindAll(terms, r._2))
    assert(allHits.map(_._1).distinct.size == terms.size,
      s"every astral term must match at least once: $allHits")
  }

  test("p111/p114/p120 query machinery end-to-end over an astral-bearing " +
      "documents table") {
    import spark.implicits._
    val g = new String(Character.toChars(0x1F600))
    val x = new String(Character.toChars(0x20000))
    val dir = java.nio.file.Files.createTempDirectory("astral_docs").toString
    // schema mirrors /root/testdata documents.parquet; texts mix plain
    // fixture-style words (so the ASCII vocabularies fire), astral
    // words ([UNK] path), and astral-ADJACENT matches (boundary walk)
    val docs = Seq(
      (1L, s"spark $g$g the data line", "en", "web", 24L),
      (2L, s"$x${g} spark$g batch ${x}park", "en", "web", 30L),
      (3L, "plain join order window window", "en", "book", 30L),
      (4L, s"$g$x$g $g$x$g stream", "zz", "web", 18L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      // p111: full aggregate equality vs the naive scan over the same
      // rows — the astral-adjacent "spark$g"/"${x}park" rows must not
      // shift or drop any (tid, pos)
      val p111 = graft.SparkEntry.queries("p111_blocklist_spans")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
      val hits = docs.flatMap { case (id, text, _, _, _) =>
        AhoCorasick.naiveFindAll(
          graft.queries.Pipeline7.BlockTerms, text)
          .map { case (tid, pos) => (id, tid, pos) } }
      val want111 = hits.groupBy(_._2).toSeq.map { case (tid, hs) =>
        (tid.toLong, graft.queries.Pipeline7.BlockTerms(tid),
          hs.size.toLong, hs.map(_._1).distinct.size.toLong,
          hs.map(_._3).min.toLong, hs.map(_._3).max.toLong,
          hs.map(_._3.toLong).sum)
      }.sortBy(_._1)
      assert(p111 == want111)
      assert(hits.nonEmpty, "fixture must produce hits")
      // p114/p120: aggregate equality vs the naive encoders over the
      // same word multiset, and no ill-formed piece reaches the output
      val words = docs.flatMap(_._2.split(" "))
      def agg(encoded: Seq[(String, Seq[String])]): Seq[(String, Long, Long)] =
        encoded.flatMap { case (w, ps) => ps.map(p => (p, w)) }
          .groupBy(_._1).toSeq
          .map { case (p, us) =>
            (p, us.size.toLong, us.map(_._2).distinct.size.toLong) }
          .sortBy(_._1)
      val p114 = graft.SparkEntry.queries("p114_wordpiece_encode")(spark, dir)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val want114 = agg(words.map(w => w ->
        WordPieceTable.naiveEncode(graft.queries.Pipeline7.WpVocab, w)))
      assert(p114 == want114)
      val p120 = graft.SparkEntry.queries("p120_unigram_encode")(spark, dir)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      val want120 = agg(words.map(w => w ->
        UnigramTable.naiveEncode(graft.queries.Pipeline7.UgVocab, w)))
      assert(p120 == want120)
      (p114 ++ p120).foreach { case (p, _, _) =>
        assert(wellFormed(p), s"ill-formed piece: $p") }
      // the astral rows must flow through as [UNK]s, not vanish
      assert(p114.exists(_._1 == WordPieceTable.Unk))
      assert(p120.exists(_._1 == UnigramTable.Unk))
    } finally {
      spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
