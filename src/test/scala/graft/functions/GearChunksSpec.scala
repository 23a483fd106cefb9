package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The content-defined chunker's contract: lossless splitting, purely
  * content-local boundaries (the property CDC exists for), and the
  * documented rolling-hash semantics — plus codegen/interpreted
  * agreement, since the oracle replays the interpreted definition.
  */
class GearChunksSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def chunksOf(s: String, maskBits: Int = 6): Seq[String] = {
    val arr = GearChunks.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), maskBits)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("chunks concatenate back to the input (lossless), none empty") {
    val samples = Seq("", "a", "hello world",
      "the quick brown fox jumps over the lazy dog " * 20,
      (0 until 500).map(i => ('a' + i % 26).toChar).mkString)
    samples.foreach { s =>
      val ch = chunksOf(s)
      assert(ch.mkString == s, s"lossless failed for len ${s.length}")
      assert(ch.forall(_.nonEmpty), "empty chunk emitted")
    }
    assert(chunksOf("").isEmpty)
  }

  test("boundaries are content-local: a prefix edit re-synchronizes") {
    // the CDC property fixed-size blocks lack: after an insertion,
    // boundaries more than 32 chars past the edit are unchanged, so
    // the trailing chunk stream re-aligns verbatim
    val rnd = new scala.util.Random(1)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val base = Seq.fill(400)(words(rnd.nextInt(words.size))).mkString(" ")
    val edited = "INSERTED-PREFIX-" + base
    val a = chunksOf(base)
    val b = chunksOf(edited)
    assert(a.size > 10, s"fixture too small: ${a.size} chunks")
    val tailA = a.drop(2)
    val setB = b.groupBy(identity).map { case (k, v) => k -> v.size }
    val resynced = tailA.count(c => setB.getOrElse(c, 0) > 0)
    assert(resynced >= tailA.size - 1,
      s"only $resynced/${tailA.size} trailing chunks re-aligned")
  }

  test("rolling hash matches the documented recurrence") {
    // independent replay: h_i = (2 h_{i-1} + (c_i * 2654435761)) mod 2^32,
    // boundary when the top 6 bits are zero (h < 2^26)
    val s = "abcdefgh " * 40
    var h = 0L
    val bounds = scala.collection.mutable.ArrayBuffer[Int]()
    s.zipWithIndex.foreach { case (c, i) =>
      h = ((h << 1) + ((c.toLong * 2654435761L) & 0xFFFFFFFFL)) & 0xFFFFFFFFL
      if (h < (1L << 26)) bounds += (i + 1)
    }
    val expected = (0 +: bounds.toSeq :+ s.length).distinct.sliding(2)
      .collect { case Seq(a, b) if b > a => s.substring(a, b) }.toSeq
    assert(chunksOf(s) == expected)
  }

  test("periodic text may legitimately produce no cut points") {
    // a repeating phrase yields a fixed cycle of trailing-32 windows;
    // if none hashes under the threshold the whole text is one chunk —
    // the documented CDC pathology that production chunkers cap with a
    // max-length clamp (scoped out here to keep the boundary set a
    // pure per-position predicate)
    val periodic =
      "lorem ipsum dolor sit amet, consectetur adipiscing elit " * 30
    val ch = chunksOf(periodic)
    assert(ch.mkString == periodic)
    assert(ch.size < 5, s"expected few cuts on this periodic phrase")
  }

  test("codegen and interpreted paths agree on the documents table") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").limit(50)
    val viaExpr = docs
      .select($"doc_id", explode(CdcFunctions.gear_chunks($"text", 6)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val viaEval = docs.collect().toSeq.flatMap { r =>
      chunksOf(r.getString(1)).map(c => (r.getLong(0), c))
    }.sorted
    assert(viaExpr == viaEval)
  }

  test("property: lossless non-empty chunking on random strings") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    // printable ASCII plus spaces/newlines, lengths 0..400, and every
    // maskBits extreme — concatenation must always reproduce the input
    val genStr = Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.choose(32.toChar, 126.toChar),
        1 -> Gen.const(' '),
        1 -> Gen.const('\n'))).map(_.mkString))
    val prop = forAll(Gen.zip(genStr, Gen.oneOf(1, 6, 12, 20))) {
      case (s, bits) =>
        val ch = chunksOf(s, bits)
        Prop(ch.mkString == s && ch.forall(_.nonEmpty))
          .label(s"len=${s.length} bits=$bits chunks=${ch.size}")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, result.toString)
  }

  test("maskBits contract") {
    intercept[IllegalArgumentException] {
      GearChunks(org.apache.spark.sql.catalyst.expressions.Literal("x"), 0)
    }
    intercept[IllegalArgumentException] {
      GearChunks(org.apache.spark.sql.catalyst.expressions.Literal("x"), 21)
    }
  }
}
