package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The FastCDC-shaped clamp's contract: every chunk except the trailing
  * partial sits in [minLen, maxLen], the split stays lossless, the
  * degenerate clamp reduces to the plain gear cut, the max clamp cuts
  * text the plain chunker leaves whole — and the documented price: the
  * clamp can DISABLE the plain cut's re-synchronization after an edit.
  */
class GearChunksClampedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def clamped(s: String, bits: Int, mn: Int, mx: Int): Seq[String] = {
    val arr = GearChunks.computeClamped(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), bits, mn, mx)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }
  private def plain(s: String, bits: Int = 6): Seq[String] = {
    val arr = GearChunks.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), bits)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  private def fixture(seed: Int, words: Int = 400): String = {
    val rnd = new scala.util.Random(seed)
    val ws = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    Seq.fill(words)(ws(rnd.nextInt(ws.size))).mkString(" ")
  }

  test("lossless; every chunk but the trailing partial in [min, max]") {
    val s = fixture(7)
    for ((mn, mx) <- Seq((16, 256), (1, 64), (100, 120), (32, 32))) {
      val ch = clamped(s, 6, mn, mx)
      assert(ch.mkString == s, s"lossless failed at [$mn,$mx]")
      assert(ch.forall(_.nonEmpty))
      assert(ch.dropRight(1).forall(c => c.length >= mn && c.length <= mx),
        s"body chunk out of [$mn,$mx]: ${ch.dropRight(1).map(_.length)}")
      assert(ch.isEmpty || ch.last.length <= mx)
    }
  }

  test("minLen above the mean chunk size merges cuts, never splits them") {
    // mean gear chunk at maskBits=6 is ~64 chars; a 128-char floor must
    // yield strictly fewer chunks, each a concatenation of plain ones
    val s = fixture(11)
    val p = plain(s)
    val c = clamped(s, 6, 128, 1 << 20)
    assert(p.size > c.size, s"floor did not merge: ${p.size} vs ${c.size}")
    assert(c.mkString == s)
    // with no max in play, every clamped boundary is also a plain
    // boundary (acceptance only SKIPS hits, the hash is shared)
    val pb = p.scanLeft(0)(_ + _.length).toSet
    val cb = c.scanLeft(0)(_ + _.length).toSet
    assert(cb.subsetOf(pb),
      s"clamped-only boundary without a max cut: ${cb.diff(pb)}")
  }

  test("maxLen below the mean forces cuts on text the plain cut leaves whole") {
    // the periodic phrase from GearChunksSpec: almost no gear hits, so
    // the plain chunker emits one giant chunk — the documented CDC
    // pathology the max clamp exists to cap
    val periodic =
      "lorem ipsum dolor sit amet, consectetur adipiscing elit " * 30
    val p = plain(periodic)
    val c = clamped(periodic, 6, 16, 48)
    assert(p.exists(_.length > 48), "fixture lost its pathology")
    assert(c.forall(_.length <= 48))
    assert(c.mkString == periodic)
  }

  test("degenerate clamp [1, huge] equals the plain gear cut") {
    for (seed <- 1 to 5; bits <- Seq(4, 6, 10)) {
      val s = fixture(seed, 150)
      assert(clamped(s, bits, 1, 1 << 20) == plain(s, bits),
        s"seed=$seed bits=$bits")
    }
  }

  test("the clamp can disable re-synchronization after a prefix edit") {
    // plain gear boundaries re-align 32 chars past an edit (pinned in
    // GearChunksSpec); clamped acceptance also depends on the PREVIOUS
    // boundary, which the edit moved — so some seed must exist where a
    // trailing plain chunk survives the edit but the clamped stream
    // diverges. Seeded search, deterministic: assert such a seed shows
    // up quickly, pinning that the caveat is real, not hypothetical.
    val found = (1 to 50).exists { seed =>
      val base = fixture(seed)
      val edited = "INSERTED-PREFIX-" + base
      def tailMultiset(ch: Seq[String]) =
        ch.drop(2).groupBy(identity).map { case (k, v) => k -> v.size }
      val plainResync = {
        val a = plain(base).drop(2)
        val b = tailMultiset(plain(edited))
        a.nonEmpty && a.count(c => b.getOrElse(c, 0) > 0) >= a.size - 1
      }
      val clampedDiverged = {
        val a = clamped(base, 6, 64, 128).drop(2)
        val b = tailMultiset(clamped(edited, 6, 64, 128))
        a.count(c => b.getOrElse(c, 0) == 0) >= 2
      }
      plainResync && clampedDiverged
    }
    assert(found,
      "no seed in 1..50 shows clamp-broken resync alongside plain resync")
  }

  test("codegen and interpreted paths agree on the documents table") {
    import spark.implicits._
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text").limit(50)
    val viaExpr = docs
      .select($"doc_id",
        explode(CdcFunctions.gear_chunks_clamped($"text", 6, 16, 256)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val viaEval = docs.collect().toSeq.flatMap { r =>
      clamped(r.getString(1), 6, 16, 256).map(c => (r.getLong(0), c))
    }.sorted
    assert(viaExpr == viaEval)
  }

  test("property: lossless and length-bounded on random strings") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val genStr = Gen.chooseNum(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.choose(32.toChar, 126.toChar),
        1 -> Gen.const(' '),
        1 -> Gen.const('\n'))).map(_.mkString))
    val genClamp = for {
      mn <- Gen.chooseNum(1, 64)
      mx <- Gen.chooseNum(mn, mn + 200)
    } yield (mn, mx)
    val prop = forAll(Gen.zip(genStr, genClamp, Gen.oneOf(1, 6, 12, 20))) {
      case (s, (mn, mx), bits) =>
        val ch = clamped(s, bits, mn, mx)
        Prop(ch.mkString == s && ch.forall(_.nonEmpty) &&
            ch.dropRight(1).forall(c => c.length >= mn && c.length <= mx) &&
            ch.forall(_.length <= mx))
          .label(s"len=${s.length} clamp=[$mn,$mx] bits=$bits")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, result.toString)
  }

  test("clamp contract") {
    val lit = org.apache.spark.sql.catalyst.expressions.Literal("x")
    intercept[IllegalArgumentException] { GearChunksClamped(lit, 6, 0, 10) }
    intercept[IllegalArgumentException] { GearChunksClamped(lit, 6, 10, 9) }
    intercept[IllegalArgumentException] { GearChunksClamped(lit, 0, 1, 10) }
  }
}
