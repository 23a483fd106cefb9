package graft

import org.scalatest.funsuite.AnyFunSuite

/** Direct invariants for the fifth pipeline batch, independent of the
  * DuckDB oracle: the quantization audit must actually certify itself,
  * the temperature mix must respect its own caps, and the padding-waste
  * curve must equal a from-scratch brute-force replay (boundary
  * arithmetic included) computed with plain Scala collections.
  */
class Pipeline5OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("p88: every dimension certifies within half a quantization step") {
    val rows = SparkEntry.queries("p88_int8_quant")(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getBoolean(5), s"dim ${r.getInt(0)} failed its own audit")
      assert(r.getLong(4) <= 500000L,
        s"dim ${r.getInt(0)} err ${r.getLong(4)} ppm > half a step")
    }
  }

  test("p89: kept counts and thresholds respect the caps") {
    val rows = SparkEntry.queries("p89_temperature_mix")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, thr, nKept) = (r.getLong(1), r.getLong(4), r.getLong(5))
      assert(thr <= 16777216L)
      assert(nKept <= nDocs)
    }
    // temperature < 1 must up-weight small sources: the keep THRESHOLD
    // (the deterministic quantity — realized rates are a 25-doc
    // Bernoulli sample at this sf) of the smallest-token source is >=
    // that of the largest
    val byToks = rows.sortBy(_.getLong(2))
    assert(byToks.head.getLong(4) >= byToks.last.getLong(4),
      s"smallest source must carry the larger keep threshold: " +
        s"${byToks.head.getLong(4)} vs ${byToks.last.getLong(4)}")
  }

  test("p97 equals a brute-force Scala replay of the padding arithmetic") {
    import spark.implicits._
    val lens = graft.Tables.t(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"text", " ")).as("len"))
      .as[Int].collect().map(_.toLong).sorted
    val n = lens.length.toLong
    val tok = lens.sum
    def brute(b: Int): (Long, Long) = {
      // VALUE-dictionary semantics, exactly like the query: all rows of
      // one length share their value's cumulative count, so ties land in
      // ONE shard (a per-row rank replay would split them)
      val dict = lens.groupBy(identity).map { case (l, a) =>
        (l, a.length.toLong)
      }.toSeq.sortBy(_._1)
      var cum = 0L
      val shards = dict.map { case (len, c) =>
        cum += c
        val s = (1 until b).count(k => cum >= (n * k + b - 1) / b)
        (s, len, c)
      }
      val padding = shards.groupBy(_._1).values.map { grp =>
        val mx = grp.map(_._2).max
        grp.map { case (_, len, c) => (mx - len) * c }.sum
      }.sum
      (padding, padding * 1000000L / (padding + tok))
    }
    val got = SparkEntry.queries("p97_padding_waste_curve")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    got.foreach { case (b, padding, waste) =>
      val (bp, bw) = brute(b)
      assert(padding == bp, s"B=$b padding $padding != brute $bp")
      assert(waste == bw, s"B=$b waste $waste != brute $bw")
    }
  }
}
