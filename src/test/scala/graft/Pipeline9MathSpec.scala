package graft

import org.scalatest.funsuite.AnyFunSuite

/** The mathematical claims the Pipeline9 oracles lean on, pinned
  * against independent implementations — p140's closed-form isotonic
  * fit in particular: the query computes
  * iso(i) = max_{j≤i} min_{k≥i} floor(10^6 · pos(j..k) / n(j..k)),
  * and its comment claims this IS weighted PAV up to the ppm floor.
  * Because floor is monotone, max/min commute with it, so the claim
  * is exactly iso(i) = floor(10^6 · PAV_i) — verified here against a
  * classic stack-based pool-adjacent-violators run in exact BigInt
  * rationals, with no shared code path.
  */
class Pipeline9MathSpec extends AnyFunSuite {

  /** The query's arithmetic, mirrored: interval means floored to ppm,
    * then max over left ends of min over right ends.
    */
  private def isoMaxMin(bins: Seq[(Long, Long)]): Seq[Long] = {
    val b = bins.toIndexedSeq
    b.indices.map { i =>
      (0 to i).map { j =>
        (i until b.size).map { k =>
          val (n, pos) = b.slice(j, k + 1)
            .foldLeft((0L, 0L)) { case ((an, ap), (xn, xp)) =>
              (an + xn, ap + xp) }
          pos * 1000000L / n
        }.min
      }.max
    }
  }

  /** Independent reference: textbook stack PAV over exact rationals
    * (BigInt numerator/denominator pairs, compared by
    * cross-multiplication), floored to ppm at the very end.
    */
  private def pavExact(bins: Seq[(Long, Long)]): Seq[Long] = {
    // each block: (n, pos, width) — merge while the previous block's
    // mean exceeds the next's
    val stack = scala.collection.mutable.ArrayBuffer[(BigInt, BigInt, Int)]()
    bins.foreach { case (n, pos) =>
      stack += ((BigInt(n), BigInt(pos), 1))
      var merged = true
      while (merged && stack.size >= 2) {
        val (n2, p2, w2) = stack(stack.size - 1)
        val (n1, p1, w1) = stack(stack.size - 2)
        // violation: mean1 > mean2  <=>  p1·n2 > p2·n1
        if (p1 * n2 > p2 * n1) {
          stack.remove(stack.size - 1)
          stack(stack.size - 1) = (n1 + n2, p1 + p2, w1 + w2)
        } else merged = false
      }
    }
    stack.toSeq.flatMap { case (n, p, w) =>
      Seq.fill(w)((p * 1000000 / n).toLong)
    }
  }

  test("golden: the p140 fixture pooling") {
    // the sf0.001 reliability table: bins 2-4 violate and pool, 6-7
    // violate and pool — the shape the query's output showed
    val bins = Seq((11L, 3L), (126L, 23L), (82L, 14L), (20L, 6L),
      (9L, 4L), (2L, 0L))
    val iso = isoMaxMin(bins)
    assert(iso == pavExact(bins))
    assert(iso(0) == iso(1) && iso(1) == iso(2), s"2-4 must pool: $iso")
    assert(iso(4) == iso(5), s"6-7 must pool: $iso")
    assert(iso == iso.sorted, s"fit must be monotone: $iso")
  }

  test("fuzz: max-min formula == exact PAV floored to ppm") {
    val rnd = new scala.util.Random(67)
    for (round <- 0 until 500) {
      val size = 1 + rnd.nextInt(10)
      val bins = Seq.fill(size) {
        val n = 1L + rnd.nextInt(200)
        (n, rnd.nextLong(n + 1))
      }
      val got = isoMaxMin(bins)
      val want = pavExact(bins)
      assert(got == want, s"round $round bins=$bins")
      assert(got == got.sorted, s"round $round not monotone: $got")
    }
  }
}
