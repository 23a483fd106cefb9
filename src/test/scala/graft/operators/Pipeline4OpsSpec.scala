package graft.operators

import graft.SparkTestSession
import graft.functions.Aggregators
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-6 batch-4 mechanisms: the bounded
  * top-k aggregator behind p78 and the degree-ordered triangle count
  * behind p81 — each checked against a naive reference on randomized
  * inputs, under shuffled partitionings (merge-order independence is
  * the property that makes partial aggregation safe).
  */
class Pipeline4OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("TopKByOrd equals sorted-take(k) regardless of partitioning") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 500L).map(id =>
      (s"k${rnd.nextInt(4)}", f"${rnd.nextInt(1000)}%04d", id))
    val expected = rows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.map(r => (r._2, r._3)).sorted.take(7).map(_._2)
    }
    for (parts <- Seq(1, 3, 13)) {
      val topk = udaf(new Aggregators.TopKByOrd(7))
      val got = rows.toDF("key", "ord", "id").repartition(parts)
        .groupBy($"key").agg(topk($"ord", $"id").as("ids"))
        .as[(String, Seq[Long])].collect().toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("TopKByOrd keeps fewer than k when the key has fewer rows") {
    val topk = udaf(new Aggregators.TopKByOrd(5))
    val got = Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "z", 3L))
      .toDF("key", "ord", "id")
      .groupBy($"key").agg(topk($"ord", $"id").as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got == Map("a" -> Seq(1L, 2L), "b" -> Seq(3L)))
  }

  test("TopKByOrd rejects out-of-contract k") {
    intercept[IllegalArgumentException](new Aggregators.TopKByOrd(0))
    intercept[IllegalArgumentException](new Aggregators.TopKByOrd(2000))
  }

  test("TopKByOrd skips NULL sort keys like a SQL aggregate") {
    val topk = udaf(new Aggregators.TopKByOrd(3))
    val got = Seq(("a", "b", 1L), ("a", null, 2L), ("a", "a", 3L))
      .toDF("key", "ord", "id")
      .groupBy($"key").agg(topk($"ord", $"id").as("ids"))
      .as[(String, Seq[Long])].collect().toMap
    assert(got == Map("a" -> Seq(3L, 1L)), got.toString)
  }

  test("degree-oriented triangle count equals the naive enumeration") {
    val rnd = new scala.util.Random(7)
    // random graph incl. a deliberate hub (node 0 connects widely) to
    // exercise the orientation's hub-bounding path
    val raw = ((1 to 160).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)) ++
      (1 to 25).map(i => (0L, i.toLong)))
    val edges = raw.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val eset = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var naive = 0L
    for {
      i <- nodes.indices; j <- i + 1 until nodes.size
      if eset((nodes(i), nodes(j)))
      k <- j + 1 until nodes.size
      if eset((nodes(i), nodes(k))) && eset((nodes(j), nodes(k)))
    } naive += 1
    // the SAME operator p81 calls — editing the orientation or wedge
    // ordering in GraphOps is caught here, not just by the oracle
    val got = graft.operators.GraphOps.triangleCount(edges.toDF("a", "b"))
      .head().getLong(0)
    assert(got == naive, s"oriented=$got naive=$naive")
  }

  test("dHash is stable under area-average upscaling (the resize grid path)") {
    // the oracle only exercises 9x8 inputs (grid = identity); this
    // drives the resizeBox path: an 18x16 image whose 2x2 blocks
    // replicate the 9x8 pattern must hash identically, because the
    // box average of a constant block is the block value
    import graft.operators.Multimodal
    def patternBmp(seed: Long, scale: Int): Array[Byte] = {
      if (scale == 1) Multimodal.syntheticBmpPattern(seed)
      else {
        // scale-replicated raster as a PPM (P6 header + raw RGB)
        val w = 9 * scale; val h = 8 * scale
        val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
        val body = new Array[Byte](3 * w * h)
        var i = 0
        for (y <- 0 until h; x <- 0 until w) {
          val v = math.floorMod(seed * 31 + (x / scale) * 7 +
            (y / scale) * 13, 256).toByte
          body(i) = v; body(i + 1) = v; body(i + 2) = v
          i += 3
        }
        header ++ body
      }
    }
    // seeds 4 and 8 wrap the mod-256 ramp inside the grid (seed*31 mod
    // 256 = 124 / 248), so their hashes carry 1-bits and differ; a
    // wrap-free seed (e.g. 3 -> base 93, max 240) hashes all-zero —
    // dHash is brightness-shift invariant by design
    val base = Seq((1L, patternBmp(4, 1)), (2L, patternBmp(4, 2)),
      (3L, patternBmp(8, 1)), (4L, patternBmp(8, 2)))
      .toDF("doc_id", "payload")
    val got = Multimodal.dHash(base)
      .select($"doc_id", $"dhash").as[(Long, String)].collect().toMap
    assert(got(1L) == got(2L), "seed 4: scaled hash must match")
    assert(got(3L) == got(4L), "seed 8: scaled hash must match")
    assert(got(1L) != got(3L), "different wrap patterns must differ")
    assert(got(1L).contains('1'), "seed 4 must wrap inside the grid")
    assert(got(1L).length == 64 && got(1L).forall(c => c == '0' || c == '1'))
  }

  test("audioFingerprint matches the closed-form contour, incl. uneven windows") {
    import graft.operators.Multimodal
    val clips = Seq((1L, Multimodal.syntheticWavPattern(5)),
      (2L, Multimodal.syntheticWavPattern(9)))
      .toDF("doc_id", "payload")
    def amp(seed: Long, w: Int): Long =
      math.floorMod(seed * 37 + w * 11, 100) * 300
    // aligned windows (17 over 17 blocks): contour = amplitude compares
    val got = Multimodal.audioFingerprint(clips, 17)
      .select($"doc_id", $"afp").as[(Long, String)].collect().toMap
    def fp(seed: Long): String = (0 until 16)
      .map(w => if (amp(seed, w) > amp(seed, w + 1)) '1' else '0').mkString
    assert(got(1L) == fp(5))
    assert(got(2L) == fp(9))
    // uneven windows (5 over 1088 frames -> 217/218-sample slices): the
    // cross-multiplied compare must agree with an exact reference
    def ref(seed: Long, bigW: Int): String = {
      val n = 17 * 64
      val sums = new Array[Long](bigW)
      val lens = new Array[Long](bigW)
      for (f <- 0 until n) {
        val w = (f.toLong * bigW / n).toInt
        sums(w) += amp(seed, f / 64)
        lens(w) += 1
      }
      (0 until bigW - 1).map(w =>
        if (sums(w) * lens(w + 1) > sums(w + 1) * lens(w)) '1' else '0')
        .mkString
    }
    val g5 = Multimodal.audioFingerprint(clips, 5)
      .select($"doc_id", $"afp").as[(Long, String)].collect().toMap
    assert(g5(1L) == ref(5, 5))
    assert(g5(2L) == ref(9, 5))
  }

  test("one-cell perturbation moves dHash by at most 2 bits (p86 premise)") {
    import graft.operators.Multimodal
    val rows = (0L until 30L).flatMap(seed => Seq(
      (seed * 2, Multimodal.syntheticBmpPattern(seed)),
      (seed * 2 + 1, Multimodal.syntheticBmpPattern(seed, 3, 4, 64))))
    val got = Multimodal.dHash(rows.toDF("doc_id", "payload"))
      .select($"doc_id", $"dhash").as[(Long, String)].collect().toMap
    for (seed <- 0L until 30L) {
      val (a, b) = (got(seed * 2), got(seed * 2 + 1))
      val ham = a.zip(b).count { case (x, y) => x != y }
      assert(ham <= 2, s"seed=$seed hamming=$ham")
    }
    // and the perturbation is visible somewhere (not a universal no-op)
    assert((0L until 30L).exists(s => got(s * 2) != got(s * 2 + 1)))
  }
}
