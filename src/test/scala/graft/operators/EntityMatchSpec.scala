package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** EntityMatch blocking recall + confirm exactness on the deterministic
  * single-deletion corpus (the p91 shape): a deletion leaves the true
  * counterpart at distance 1, so the gated properties are (a) nearly
  * every dirty row finds SOME match at distance <= 1, and (b) the match
  * is the true source row unless another canonical row is genuinely
  * also at distance 1 (dense numeric keyspaces make that legal —
  * deleting a digit of #000000120 can land one insertion from
  * #000000012's neighborhood), in which case the reported distance must
  * still be 1 and the tie broken by the smallest canonical id.
  */
class EntityMatchSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  test("single-deletion corpus: high recall, distance-1 matches, exact ids") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val canon = (0L until 400L).map(i => (i, f"Customer#$i%09d"))
      .toDF("cid", "name")
    val dirty = canon.filter($"cid" % 4 === 0)
      .withColumn("pos", ($"cid" %
        (org.apache.spark.sql.functions.length($"name") - 2) + 2).cast("int"))
      .select($"cid".as("did"),
        concat(expr("substring(name, 1, pos - 1)"),
          expr("substring(name, pos + 1, 1000)")).as("dname"))
    val m = EntityMatch.bestMatches(dirty, "did", "dname",
      canon, "cid", "name", maxDist = 2, maxGramDf = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

    val nDirty = dirty.count()
    assert(m.size >= (nDirty * 9) / 10,
      s"blocking recall too low: ${m.size}/$nDirty")
    // a deletion is distance 1 from its source, so the best match can
    // never be worse than 1
    m.foreach { case (did, _, dist) =>
      withClue(s"did=$did") { dist shouldBe 1 }
    }
    // and the overwhelming majority must link back to the true source
    val self = m.count { case (did, mid, _) => did == mid }
    assert(self >= (m.size * 8) / 10,
      s"too few true-source links: $self/${m.size}")
  }

  test("substitution, insertion and double-typo corpora also link back") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val canon = (0L until 400L).map(i => (i, f"Customer#$i%09d"))
      .toDF("cid", "name")
    val len = org.apache.spark.sql.functions.length($"name")
    def gate(dirty: org.apache.spark.sql.DataFrame, maxBest: Int,
        minPct: Int): Unit = {
      val m = EntityMatch.bestMatches(dirty, "did", "dname",
        canon, "cid", "name", maxDist = 2, maxGramDf = 50)
        .collect().map(r => (r.getLong(0), r.getInt(2)))
      assert(m.length * 100 >= dirty.count() * minPct,
        s"recall too low: ${m.length}/${dirty.count()}")
      m.foreach { case (did, dist) =>
        assert(dist <= maxBest, s"did=$did dist=$dist > $maxBest")
      }
    }
    // substitution: one character replaced -> distance 1. On THIS
    // keyspace ('Customer#' + mostly-zeros) substitution is the
    // hardest blocking case: the only discriminative grams are the few
    // tail digits, and replacing one destroys all three grams that
    // cover it, where a deletion merely shifts them — measured recall
    // ~75% here vs >=90% on deletions; real-world (higher-entropy)
    // names block far better, which is why the operator's docstring
    // states the recall contract in terms of surviving sub-cap grams
    gate(canon.filter($"cid" % 4 === 1)
      .withColumn("pos", ($"cid" % (len - 2) + 2).cast("int"))
      .select($"cid".as("did"),
        concat(expr("substring(name, 1, pos - 1)"), lit("Z"),
          expr("substring(name, pos + 1, 1000)")).as("dname")), 1, 70)
    // insertion: one character added -> distance 1 (an insertion INSIDE
    // the short discriminative tail splits it just like a substitution,
    // so the same ~75% templated-keyspace bound applies)
    gate(canon.filter($"cid" % 4 === 2)
      .withColumn("pos", ($"cid" % (len - 2) + 2).cast("int"))
      .select($"cid".as("did"),
        concat(expr("substring(name, 1, pos)"), lit("Q"),
          expr("substring(name, pos + 1, 1000)")).as("dname")), 1, 70)
    // double typo at FIXED positions (prefix zone), so the tail's
    // discriminative grams all survive -> distance 2, full recall
    gate(canon.filter($"cid" % 4 === 3)
      .select($"cid".as("did"),
        concat(expr("substring(name, 1, 2)"),
          expr("substring(name, 4, 8)"), lit("Z"),
          expr("substring(name, 13, 1000)")).as("dname")), 2, 90)
  }

  test("symmetric-delete blocking: 100% recall on every single-typo corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val canon = (0L until 400L).map(i => (i, f"Customer#$i%09d"))
      .toDF("cid", "name")
    val len = org.apache.spark.sql.functions.length($"name")
    def gate(dirty: org.apache.spark.sql.DataFrame): Unit = {
      val m = EntityMatch.bestMatchesSymDelete(dirty, "did", "dname",
        canon, "cid", "name", maxDist = 2, maxKeyDf = 50)
        .collect().map(r => (r.getLong(0), r.getInt(2)))
      // by construction: strings within edit distance 1 share a
      // 1-deletion variant, so EVERY dirty row must match at dist 1 —
      // including the substitutions trigram blocking loses ~25% of
      assert(m.length == dirty.count(),
        s"symmetric-delete recall must be total: ${m.length}/${dirty.count()}")
      m.foreach { case (did, dist) =>
        assert(dist <= 1, s"did=$did dist=$dist")
      }
    }
    gate(canon.filter($"cid" % 4 === 0) // deletion
      .withColumn("pos", ($"cid" % (len - 2) + 2).cast("int"))
      .select($"cid".as("did"),
        concat(expr("substring(name, 1, pos - 1)"),
          expr("substring(name, pos + 1, 1000)")).as("dname")))
    gate(canon.filter($"cid" % 4 === 1) // substitution (the hard case)
      .withColumn("pos", ($"cid" % (len - 2) + 2).cast("int"))
      .select($"cid".as("did"),
        concat(expr("substring(name, 1, pos - 1)"), lit("Z"),
          expr("substring(name, pos + 1, 1000)")).as("dname")))
    gate(canon.filter($"cid" % 4 === 2) // insertion
      .withColumn("pos", ($"cid" % (len - 2) + 2).cast("int"))
      .select($"cid".as("did"),
        concat(expr("substring(name, 1, pos)"), lit("Q"),
          expr("substring(name, pos + 1, 1000)")).as("dname")))
  }

  test("no candidate within maxDist means the dirty row is absent") {
    import spark.implicits._
    val canon = Seq((1L, "alpha-beta-gamma")).toDF("cid", "name")
    val dirty = Seq((9L, "zzzzzzzzzzzzzzz")).toDF("did", "dname")
    val m = EntityMatch.bestMatches(dirty, "did", "dname",
      canon, "cid", "name", maxDist = 2, maxGramDf = 50)
    assert(m.count() == 0)
  }
}
