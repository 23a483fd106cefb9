package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form pins for the exact AUC: perfect separation = 10⁶,
  * identical distributions (all ties) = exactly 500000 (the midrank ½
  * contract), reversal = 0, and agreement with a brute-force pair count
  * on random data.
  */
class MetricsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def auc(rows: Seq[(Long, String)]): Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    Metrics.aucOneVsRest(rows.toDF("score", "label"), $"score", $"label")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("perfect separation scores 1000000, reversal 0") {
    val rows = (1L to 10L).map(s => (s, if (s > 5) "pos" else "neg"))
    val got = auc(rows)
    assert(got("pos") == ((5L, 5L, 1000000L)))
    assert(got("neg") == ((5L, 5L, 0L)))
  }

  test("identical score distributions pin the midrank half: exactly 500000") {
    val rows = Seq.fill(7)((42L, "a")) ++ Seq.fill(13)((42L, "b"))
    val got = auc(rows)
    assert(got("a") == ((7L, 13L, 500000L)))
    assert(got("b") == ((13L, 7L, 500000L)))
  }

  test("fuzz: matches the brute-force pair count with half-ties") {
    val rnd = new scala.util.Random(31)
    for (round <- 0 until 10) {
      val rows = (0 until 60).map(_ =>
        (rnd.nextInt(8).toLong, if (rnd.nextBoolean()) "x" else "y"))
      val got = auc(rows)
      for (l <- Seq("x", "y")) {
        val pos = rows.filter(_._2 == l).map(_._1)
        val neg = rows.filter(_._2 != l).map(_._1)
        if (pos.nonEmpty && neg.nonEmpty) {
          val u2 = (for (p <- pos; n <- neg) yield
            if (p > n) 2L else if (p == n) 1L else 0L).sum
          val want = u2 * 1000000L / (2L * pos.size * neg.size)
          assert(got(l) == ((pos.size.toLong, neg.size.toLong, want)),
            s"round $round label $l")
        }
      }
    }
  }

  test("a label with no negatives (or no positives) emits no row") {
    val got = auc(Seq((1L, "only")))
    assert(got.isEmpty)
  }
}
