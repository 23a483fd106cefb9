package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The M-step quantizer's contract on driver-side soft counts (the
  * E-step itself is pinned in UnigramEStepSpec; the end-to-end round
  * is hash-gated by p130/p137 and the GB smoke).
  */
class UnigramEmSpec extends AnyFunSuite {

  test("fitVocab2: zero-mass pieces drop, order follows the seed vocab") {
    val seed = Seq("a" -> 100, "b" -> 100, "ab" -> 150)
    val soft = Map("a" -> 600L, "ab" -> 400L) // "b" has no mass
    val v2 = UnigramEm.fitVocab2(seed, soft)
    assert(v2.map(_._1) == Seq("a", "ab"))
    assert(v2.forall(_._2 >= 1))
  }

  test("fitVocab2: more soft mass never costs more") {
    // cost2 = (lg(T) − lg(E))·100/2^16 is antitone in E up to the
    // quantizer's sub-ulp wobble; with E doubling per piece the gaps
    // dwarf any wobble, and a full 2x step prices at ~100·log2(2)=100
    val seed = (1 to 12).map(i => s"p$i" -> 100)
    val soft = (1 to 12).map(i => s"p$i" -> (1L << i)).toMap
    val v2 = UnigramEm.fitVocab2(seed, soft)
    val costs = v2.map(_._2)
    assert(costs == costs.sorted.reverse,
      s"costs must fall as mass rises: $costs")
    // successive doublings differ by ~100 (the λ=100 log2 scale)
    costs.sliding(2).foreach { case Seq(hi, lo) =>
      assert(math.abs((hi - lo) - 100) <= 1, s"doubling step: $hi -> $lo")
    }
  }

  test("fitVocab2: all-zero soft counts yield the empty vocabulary") {
    assert(UnigramEm.fitVocab2(Seq("a" -> 100), Map.empty).isEmpty)
    assert(UnigramEm.fitVocab2(Seq("a" -> 100), Map("a" -> 0L)).isEmpty)
  }
}
