package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The batch bitext-mining operator's scale contract (p109's machinery):
  * mining the WHOLE probe side must be a cell-keyed equi-join — probe
  * vectors route to the cells they probe — never a per-probe broadcast
  * loop, never a cartesian.
  */
class IvfMineMatesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sides = {
    import spark.implicits._
    val emb = graft.Tables.t(spark, sf, "embeddings")
    (emb.filter($"label" % 2 === 0)
       .select($"vec_id".as("aid"), $"embedding".as("avec")),
     emb.filter($"label" % 2 === 1)
       .select($"vec_id".as("cid"), $"embedding".as("cvec")))
  }

  test("plan: cell equi-join, no cartesian, no nested loop") {
    val (a, b) = sides
    val idx = Similarity.ivfBuild(
      b.select(col("cid").as("vec_id"), col("cvec").as("embedding")),
      "vec_id", "embedding", 16, 0) // unrefined: deterministic build
    val p = Similarity.ivfMineMates(a, b, idx, 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian in mining plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested loop in mining plan:\n$p")
    assert("Join \\[cell#\\d+\\]".r.findFirstIn(p).isDefined ||
        "Join \\[cell".r.findFirstIn(p).isDefined,
      s"candidate join must key on the cell:\n$p")
    spark.catalog.clearCache()
  }

  test("one mate per probe; mates score no worse than 4-probe ground truth") {
    import spark.implicits._
    val (a, b) = sides
    val idx = Similarity.ivfBuild(
      b.select(col("cid").as("vec_id"), col("cvec").as("embedding")),
      "vec_id", "embedding", 16, 0)
    val mined = Similarity.ivfMineMates(a, b, idx, 4).persist()
    val perProbe = mined.groupBy($"aid").count().filter($"count" =!= 1).count()
    assert(perProbe == 0, "every mined probe must carry exactly one mate")
    // the mined mate IS the exact-decimal argmax within the candidate
    // cells: re-run with the same deterministic index — bit-identical
    val again = Similarity.ivfMineMates(a, b, idx, 4)
    assert(mined.except(again).count() == 0 && again.except(mined).count() == 0,
      "mining must be deterministic for a fixed codebook")
    spark.catalog.clearCache()
  }

  test("nProbe widening is monotone: more cells never worse mates") {
    import spark.implicits._
    val (a, b) = sides
    val idx = Similarity.ivfBuild(
      b.select(col("cid").as("vec_id"), col("cvec").as("embedding")),
      "vec_id", "embedding", 16, 0)
    val m4 = Similarity.ivfMineMates(a, b, idx, 4)
      .select($"aid", $"c6".as("c4")).persist()
    val m16 = Similarity.ivfMineMates(a, b, idx, 16)
      .select($"aid", $"c6".as("c16")).persist()
    // nProbe = nCells scans every cell: the mate is the global argmax,
    // so each probe's micro-cosine must dominate the 4-probe one
    val worse = m4.join(m16, Seq("aid")).filter($"c16" < $"c4").count()
    assert(worse == 0, s"$worse probes lost quality when widening probes")
    spark.catalog.clearCache()
  }

  test("nProbe contract") {
    val (a, b) = sides
    val idx = Similarity.ivfBuild(
      b.select(col("cid").as("vec_id"), col("cvec").as("embedding")),
      "vec_id", "embedding", 16, 0)
    intercept[IllegalArgumentException] {
      Similarity.ivfMineMates(a, b, idx, 0)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfMineMates(a, b, idx, 17)
    }
  }
}
