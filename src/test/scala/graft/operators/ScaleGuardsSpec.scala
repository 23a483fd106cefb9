package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reusable in-plan cardinality guard (the p112 prefix-bucket
  * pattern generalized): identity under budget, fail-fast with the
  * remedy named past it, and impossible to bypass — the check rides
  * the guarded frame's plan via a broadcast crossJoin, so EVERY
  * consumer action trips it.
  */
class ScaleGuardsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("identity under budget: same rows, same schema, no guard columns") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("k", "v")
    val g = ScaleGuards.cardinalityGuard(df, "spec-frame", 10L, "unused")
    assert(g.columns.toSeq == df.columns.toSeq)
    assert(g.orderBy($"k").collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("boundary: count == budget passes; count == budget + 1 raises " +
      "with the remedy in the message") {
    import spark.implicits._
    val at = (1 to 5).map(i => (s"k$i", i.toLong)).toDF("k", "v")
    assert(ScaleGuards.cardinalityGuard(at, "x", 5L, "r").count() == 5L)
    val over = (1 to 6).map(i => (s"k$i", i.toLong)).toDF("k", "v")
    val e = intercept[Exception] {
      ScaleGuards.cardinalityGuard(over, "p136 gram persist", 5L,
        "drop the persist and re-scan").count()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("p136 gram persist"), msg.take(300))
    assert(msg.contains("exceeds budget=5"), msg.take(300))
    assert(msg.contains("drop the persist and re-scan"), msg.take(300))
  }

  test("the guard rides every consumer: an aggregate over the guarded " +
      "frame trips it too, not just a row scan") {
    import spark.implicits._
    val over = (1 to 8).map(i => (s"k${i % 2}", i.toLong)).toDF("k", "v")
    intercept[Exception] {
      ScaleGuards.cardinalityGuard(over, "agg-consumer", 3L, "shard it")
        .groupBy($"k").agg(sum($"v")).collect()
    }
  }
}
