package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The prefix-filter join's contract is EXACTNESS: identical pair set to
  * a brute-force all-pairs Jaccard scan (the prune must be lossless —
  * that is the property that separates it from the MinHash-LSH path),
  * inclusive threshold boundary, and a physical plan with no cartesian
  * fallback.
  */
class SetSimJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def bruteForce(
      docs: Seq[(Long, Set[String])], num: Int, den: Int)
      : Set[(Long, Long, Int, Int, Int)] =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      inter = (ta & tb).size
      if inter * den >= (ta.size + tb.size - inter) * num
    } yield (ia, ib, inter, ta.size, tb.size)).toSet

  private def run(docs: Seq[(Long, Set[String])], num: Int, den: Int)
      : Set[(Long, Long, Int, Int, Int)] = {
    import spark.implicits._
    val df = docs.map { case (id, ts) => (id, ts.toSeq) }.toDF("id", "toks")
    SetSimJoin.jaccardJoin(df, num, den)
      .select($"id_a", $"id_b", $"inter", $"size_a", $"size_b")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3.toInt, r._4.toInt, r._5.toInt)).toSet
  }

  test("fuzz: pair set identical to brute force (the prune is lossless)") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 14).map(i => s"w$i")
    for (round <- 0 until 20) {
      val docs = (0L until 40L).map { id =>
        val n = 3 + rnd.nextInt(10)
        id -> rnd.shuffle(vocab.toList).take(n).toSet
      }
      val (num, den) = Seq((9, 10), (7, 10), (1, 2))(round % 3)
      assert(run(docs, num, den) == bruteForce(docs, num, den),
        s"round $round at $num/$den")
    }
  }

  test("threshold boundary is inclusive: J exactly 9/10 is kept") {
    val a = (0 until 9).map(i => s"t$i").toSet // 9 of b's 10 -> J = 9/10
    val b = (0 until 10).map(i => s"t$i").toSet
    val c = (0 until 8).map(i => s"t$i").toSet // J(c,b) = 8/10 -> dropped
    val got = run(Seq(1L -> a, 2L -> b, 3L -> c), 9, 10)
    assert(got == Set((1L, 2L, 9, 9, 10)))
  }

  test("identical sets report jaccard_ppm = 1000000") {
    import spark.implicits._
    val df = Seq((1L, Seq("x", "y")), (2L, Seq("y", "x"))).toDF("id", "toks")
    val row = SetSimJoin.jaccardJoin(df, 9, 10)
      .select($"id_a", $"id_b", $"jaccard_ppm")
      .as[(Long, Long, Long)].collect().toSeq
    assert(row == Seq((1L, 2L, 1000000L)))
  }

  test("prefix-bucket budget guard raises with the remedy named") {
    import spark.implicits._
    // every doc shares token "hot" and (at t=1/2, n=2) every prefix
    // includes it -> one bucket of size 20 > cap 4
    val df = (0L until 20L).map(i => (i, Seq("hot", s"u$i"))).toDF("id", "toks")
    val e = intercept[Exception] {
      SetSimJoin.jaccardJoin(df, 1, 2, prefixBucketCap = 4).collect()
    }
    assert(e.getMessage.contains("prefixBucketCap"), e.getMessage)
    // same data under the default cap completes (guard inert)
    SetSimJoin.jaccardJoin(df, 1, 2).collect()
  }

  test("plan has no cartesian product; the only nested-loop is the guard") {
    import spark.implicits._
    val df = (0L until 20L).map(i => (i, Seq("a", s"b$i"))).toDF("id", "toks")
    val p = SetSimJoin.jaccardJoin(df, 9, 10)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in plan:\n$p")
    // the budget guard is a broadcast crossJoin of a 1-ROW aggregate —
    // physically a BroadcastNestedLoopJoin, once per candidate-join
    // side (the guarded prefix frame feeds both): exactly two, and the
    // candidate join itself must stay an equi-join
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(nlj == 2, s"expected the two guard nested-loops only, got $nlj:\n$p")
    assert(p.contains("raise_error"), s"guard missing from plan:\n$p")
  }
}
