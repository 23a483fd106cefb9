package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** p144's interpolated Kneser-Ney bigram model, pinned against an
  * independent in-memory reference on handcrafted corpora — the
  * fixture's generator vocabulary is CLOSED (odd and even docs share
  * it), so the OOV branch (Nw = 0) and the unseen-context branch
  * (c(v) = 0) can never fire there; this spec builds corpora where
  * they must.
  */
class KneserNeySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Independent reference: the documented p144 model, computed with
    * plain Scala maps and BigInt — no Spark, no SQL, no shared code.
    *   seen v:   p = [max(4c(vw)−3,0)·B' + 3·N1(v)·(Nw+1)] / (4c(v)·B')
    *   unseen v: p = (Nw+1) / B'
    * Returns per-source (n, Σk·(lgden−lgnum), n_oov) using the same
    * ilog2 quantizer as the query.
    */
  private def reference(train: Seq[String], test: Seq[(String, String)])
      : Map[String, (Long, Long, Long)] = {
    import graft.functions.IntLog.ilog2f
    def bigrams(s: String): Seq[(String, String)] = {
      val w = s.split(" ").toSeq
      if (w.size < 2) Nil else w.zip(w.tail)
    }
    val trb = train.flatMap(bigrams)
    val bc = trb.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cv = trb.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1v = bc.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nw = bc.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val vocab = train.flatMap(_.split(" ")).distinct.size.toLong
    val bp = bc.size.toLong + vocab
    val bySrc = scala.collection.mutable.Map[String, (Long, Long, Long)]()
    for ((src, text) <- test; (p, c) <- bigrams(text)) {
      val nwv = nw.getOrElse(c, 0L)
      val (num, den) =
        if (cv.getOrElse(p, 0L) > 0L)
          (math.max(4L * bc.getOrElse((p, c), 0L) - 3L, 0L) * bp +
            3L * n1v(p) * (nwv + 1L),
            4L * cv(p) * bp)
        else (nwv + 1L, bp)
      val bits = ilog2f(den) - ilog2f(num)
      val (n0, b0, o0) = bySrc.getOrElse(src, (0L, 0L, 0L))
      bySrc(src) = (n0 + 1, b0 + bits, o0 + (if (nwv == 0) 1L else 0L))
    }
    bySrc.toMap
  }

  test("OOV and unseen-context branches against the independent " +
      "reference (the fixture's closed vocabulary cannot reach them)") {
    import spark.implicits._
    // even doc_ids train, odd evaluate (the p144 split):
    //  - "zomg" never occurs in training (Nw = 0 -> OOV branch),
    //  - "tail" occurs in training ONLY as a final word, so it is an
    //    unseen CONTEXT (c(v) = 0) when held-out "tail gate" arrives
    val docs = Seq(
      (0L, "the cat sat on the mat tail", "en", "a", 7L),
      (2L, "the dog sat on a log", "en", "a", 6L),
      (4L, "a cat and the dog ran", "en", "b", 6L),
      (1L, "the cat ran on zomg mat", "en", "a", 6L),
      (3L, "tail gate the dog sat", "en", "b", 5L),
      (5L, "zomg zomg the cat sat on the mat", "en", "b", 8L))
    val dir = java.nio.file.Files.createTempDirectory("kn_docs").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try {
      val got = graft.SparkEntry.queries("p144_kneser_ney")(spark, dir)
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val ref = reference(
        docs.filter(_._1 % 2 == 0).map(_._2),
        docs.filter(_._1 % 2 == 1).map(d => (d._4, d._2)))
      assert(got.keySet == ref.keySet)
      for ((src, (n, bsum, noov)) <- ref) {
        val (gn, gx, goov) = got(src)
        assert(gn == n, s"$src n")
        assert(gx == bsum * 1000L / (65536L * n), s"$src xent")
        assert(goov == noov * 1000000L / n, s"$src oov")
      }
      // the corpora must actually exercise both rare branches
      assert(ref.values.map(_._3).sum > 0, "no OOV bigram was scored")
      val trainCtx = docs.filter(_._1 % 2 == 0)
        .flatMap(_._2.split(" ").dropRight(1)).toSet
      assert(docs.filter(_._1 % 2 == 1)
        .flatMap(_._2.split(" ").dropRight(1))
        .exists(w => !trainCtx.contains(w)),
        "no unseen-context bigram was scored")
    } finally {
      spark.catalog.clearCache()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("the model is exactly normalized over the train vocabulary " +
      "(the add-1 continuation telescopes to B')") {
    // Σ_{w∈V} p(w|v) == 1 for every seen context v, verified in exact
    // rationals — the property that makes xent a real cross-entropy
    val train = Seq("a b a c a b d", "b c a b")
    def bigrams(s: String) = { val w = s.split(" ").toSeq; w.zip(w.tail) }
    val trb = train.flatMap(bigrams)
    val bc = trb.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cv = trb.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1v = bc.keys.toSeq.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nw = bc.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val vocab = train.flatMap(_.split(" ")).distinct
    val bp = BigInt(bc.size + vocab.size)
    for (v <- cv.keys) {
      val den = BigInt(4) * cv(v) * bp
      val num = vocab.map { w =>
        BigInt(math.max(4L * bc.getOrElse((v, w), 0L) - 3L, 0L)) * bp +
          BigInt(3) * n1v(v) * (nw.getOrElse(w, 0L) + 1L)
      }.sum
      assert(num == den, s"context $v: sum ${num} != ${den}")
    }
  }
}
