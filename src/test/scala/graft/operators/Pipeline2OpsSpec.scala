package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Unit gates for the second pipeline wave: cluster assignment, stratified
  * sampling, chunking, repetition stats. (Their end-to-end equivalence to
  * DuckDB runs through the p24-p27 oracle entries.)
  */
class Pipeline2OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("connectedComponents merges chains and keeps components separate") {
    import spark.implicits._
    // component A: 1-2-3-4 (a chain: forces multi-round propagation);
    // component B: 10-11; pair (20,21) makes a third trivial component
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (21L, 20L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents handles a long chain and releases loop state") {
    import spark.implicits._
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val pairs = (1L to 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
    // a 31-node chain converges via pointer doubling within maxIter rounds
    assert(cc.collect().map(_.getLong(1)).distinct.toSeq == Seq(1L))
    // round checkpoints are released by the ContextCleaner once their
    // frames go unreferenced; only the live result's checkpoint may stay.
    // The cleaner is async — poll briefly.
    val sc = spark.sparkContext
    val deadline = System.currentTimeMillis() + 30000
    var n = sc.getPersistentRDDs.size
    while (n > 1 && System.currentTimeMillis() < deadline) {
      System.gc(); Thread.sleep(250); n = sc.getPersistentRDDs.size
    }
    assert(n <= 1, s"loop intermediates must be released, $n RDDs still persisted")
  }

  test("scoped dedup variants unpersist their internal caches on exit") {
    import spark.implicits._
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z w q v")
    ).toDF("doc_id", "text")
    val nj = Dedup.ngramJaccardPairsScoped(docs, "doc_id", "text",
      minJaccard = 0.5)(_.count())
    assert(nj == 1)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "ngramJaccardPairsScoped must release the shingle cache")
    val nm = Dedup.minhashLshPairsScoped(docs, "doc_id", "text")(_.count())
    assert(nm >= 1)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "minhashLshPairsScoped must release the signature cache")
  }

  test("dupNgramCoverage counts grams shared with OTHER docs only") {
    import spark.implicits._
    // n=2 bigrams: doc1 "a b c" -> {a b, b c}; doc2 "a b x" -> {a b, b x};
    // doc3 "z z" -> {z z} (no overlap); doc4 short "q" -> whole-text gram
    val df = Seq(
      (1L, "a b c"), (2L, "a b x"), (3L, "z z"), (4L, "q")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramCoverage(df, "doc_id", "text", n = 2)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 0.5), // "a b" shared with doc2
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 0L, 0.0), // repeated-within-doc does not count as shared
      (4L, 1L, 0L, 0.0)))
    // a doc's gram repeated INSIDE the same doc is not "shared": distinct
    // per doc first, so "z z z" (bigrams {z z, z z}) stays 0-coverage
    val solo = TextAnalysis.dupNgramCoverage(
      Seq((1L, "z z z")).toDF("doc_id", "text"), "doc_id", "text", n = 2)
      .collect().head
    assert(solo.getLong(1) == 1 && solo.getLong(2) == 0)
    // NULL/empty text is dropped up front (both engines then agree on
    // the NULL edge), never emitted as a NULL gram group
    val withNulls = TextAnalysis.dupNgramCoverage(
      Seq((1L, "a b"), (2L, null), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text", n = 2).collect()
    assert(withNulls.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("dupSpans merges duplicated windows into maximal per-doc spans") {
    import spark.implicits._
    // k=4 windows. doc1/doc2 share "a b c d" at the head and "w x y z"
    // at a far offset (gap > k) -> TWO disjoint spans each; doc3 is one
    // token repeated (within-doc duplication counts) -> one full span;
    // doc4 is below the k floor; doc5 is all-unique.
    val df = Seq(
      (1L, "a b c d m1 m2 m3 m4 m5 w x y z"),
      (2L, "a b c d n1 n2 n3 n4 n5 w x y z"),
      (3L, "r r r r r r"),
      (4L, "p q"),
      (5L, "u1 u2 u3 u4 u5 u6")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.dupSpans(df, "doc_id", "text", k = 4)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 13L, 2L, 8L, 0.615385), // spans [1,4] and [10,13]
      (2L, 13L, 2L, 8L, 0.615385),
      (3L, 6L, 1L, 6L, 1.0),       // 3 overlapping windows merge to [1,6]
      (4L, 2L, 0L, 0L, 0.0),       // shorter than k: below the match floor
      (5L, 6L, 0L, 0L, 0.0)))
    // adjacent-but-not-overlapping windows (p2 - p1 == k exactly) merge:
    // doc1 shares "a b c d" with doc2 and "e f g h" with doc3, nothing
    // in between -> dup positions {1, 5} fuse into ONE 8-token span
    val adj = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x2 x3 x4 x5"),
      (3L, "w1 w2 w3 w4 e f g h")
    ).toDF("doc_id", "text")
    val spans = TextAnalysis.dupSpans(adj, "doc_id", "text", k = 4)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq == Seq((1L, 1L, 8L), (2L, 1L, 4L), (3L, 1L, 4L)))
    // NULL/empty text is dropped up front, same contract as the
    // coverage/leak operators
    val withNulls = TextAnalysis.dupSpans(
      Seq((1L, "a b c d"), (2L, null), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text", k = 4).collect()
    assert(withNulls.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("stripDupSpans cuts exactly the reported spans and keeps order") {
    import spark.implicits._
    // same fixture as the dupSpans test: the strip must remove exactly
    // the tokens the report counts (report/apply pair consistency)
    val df = Seq(
      (1L, "a b c d m1 m2 m3 m4 m5 w x y z"),
      (2L, "a b c d n1 n2 n3 n4 n5 w x y z"),
      (3L, "r r r r r r"),
      (4L, "p q"),
      (5L, "u1 u2 u3 u4 u5 u6")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.stripDupSpans(df, "doc_id", "text", k = 4)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 13L, 8L, "m1 m2 m3 m4 m5"),
      (2L, 13L, 8L, "n1 n2 n3 n4 n5"),
      (3L, 6L, 6L, ""),              // fully-duplicated doc strips to empty
      (4L, 2L, 0L, "p q"),           // below the k floor: untouched
      (5L, 6L, 0L, "u1 u2 u3 u4 u5 u6")))
    // n_removed must equal dupSpans' dup_tokens on any frame
    val report = TextAnalysis.dupSpans(df, "doc_id", "text", k = 4)
      .select($"doc_id", $"dup_tokens").as[(Long, Long)].collect().toMap
    got.foreach { case (id, _, removed, _) =>
      assert(removed == report(id), s"doc $id: strip/report disagree")
    }
    // NULL/empty text dropped up front, same contract as the report
    val withNulls = TextAnalysis.stripDupSpans(
      Seq((1L, "a b c d"), (2L, null), (3L, "")).toDF("doc_id", "text"),
      "doc_id", "text", k = 4).collect()
    assert(withNulls.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("property: stripDupSpans matches the naive positional reference") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    // tiny vocab + short docs force heavy cross- and within-doc gram
    // duplication, partial-window tails, and fully-stripped documents
    val genDocs = for {
      n <- Gen.chooseNum(1, 10)
      docs <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(1, 15)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def naive(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
      val gramCount = scala.collection.mutable.Map.empty[String, Int]
      toks.foreach { case (_, ts) =>
        if (ts.size >= k) ts.sliding(k).foreach { g =>
          val s = g.mkString(" ")
          gramCount(s) = gramCount.getOrElse(s, 0) + 1
        }
      }
      toks.map { case (id, ts) =>
        val covered = scala.collection.mutable.Set.empty[Int]
        if (ts.size >= k) ts.sliding(k).zipWithIndex.foreach { case (g, i0) =>
          if (gramCount(g.mkString(" ")) > 1) (i0 until i0 + k).foreach(covered += _)
        }
        val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        id -> (ts.size.toLong, covered.size.toLong, kept.mkString(" "))
      }.toMap
    }
    val prop = forAll(genDocs) { docs =>
      val got = TextAnalysis.stripDupSpans(
          docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
        .toMap
      Prop(got == naive(docs, 3)).label(s"${docs.size} docs")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.toString)
  }

  test("stripMarkup: script-first order, entity decode order, whitespace") {
    import spark.implicits._
    val cases = Seq(
      // script body with naked '<' must strip wholesale, not mangle
      ("<script>if (a < b) { x() }</script>hi", "hi"),
      ("<style>p > span { }</style>ok", "ok"),   // '>' inside style body
      ("<p class=\"x\">a</p><br/>b", "a b"),
      // &amp;lt; is the LITERAL text "&lt;" - must not double-decode
      ("&amp;lt;kept&amp;gt; &lt;real&gt;", "&lt;kept&gt; <real>"),
      ("&quot;q&quot; &#39;a&#39; x &amp; y", "\"q\" 'a' x & y"),
      ("  a\n\n<b>  b  </b>\tc ", "a b c"),
      ("plain", "plain"))
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.stripMarkup($"h")).collect().map(_.getString(0))
    got.zip(cases.map(_._2)).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"case $i: got '$g', want '$e'")
    }
  }

  test("linkDensity: nested anchor markup, all-anchor and no-text pages") {
    import spark.implicits._
    val cases = Seq(
      // tags become spaces, so the anchor "a<b>b</b>" strips to "a b"
      // (3 chars) over the full "a b cd" (6 chars)
      ("<a href=x>a<b>b</b></a> cd", 0.5),
      ("<a>only anchor</a>", 1.0),
      // link farm: the collapsed separator space between the two
      // anchors counts as page text ("x yz" = 4) but not anchor text
      // ("x"+"yz" = 3) — char-based density tops out just under 1
      ("<nav><a>x</a><a>yz</a></nav>", 0.75),
      ("plain prose only", 0.0),
      ("<script>var a;</script>", 0.0))        // strips to empty: 0, not NaN
    val got = cases.map(_._1).toDF("h")
      .select(TextAnalysis.linkDensity($"h")).collect().map(_.getDouble(0))
    got.zip(cases.map(_._2)).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"case $i: got $g, want $e")
    }
  }

  test("crossSourceLeakSpans measures contamination depth, not breadth") {
    import spark.implicits._
    // k=4. docs 1 (train) and 2 (eval) share a DEEP 8-token run; docs 3
    // (train) and 4 (eval) share two SHALLOW far-apart 4-token runs.
    // Same-source sharing (docs 5,6) must NOT count as leakage.
    val df = Seq(
      (1L, "train", "a b c d e f g h x1 x2"),
      (2L, "eval", "y1 a b c d e f g h y2"),
      (3L, "train", "p q r s m1 m2 m3 m4 m5 w x y z"),
      (4L, "eval", "p q r s n1 n2 n3 n4 n5 w x y z"),
      (5L, "train", "s1 s2 s3 s4 t1 t2"),
      (6L, "train", "s1 s2 s3 s4 t3 t4")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.crossSourceLeakSpans(df, "doc_id", "source",
        "text", k = 4)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "train", 10L, 8L), // deep: the whole shared run, merged
      (2L, "eval", 10L, 8L),
      (3L, "train", 13L, 4L), // shallow: two disjoint spans, max is 4
      (4L, "eval", 13L, 4L),
      (5L, "train", 6L, 0L),  // same-source duplication is not leakage
      (6L, "train", 6L, 0L)))
  }

  test("editDistancePairs finds typo-level dups via either anchor") {
    import spark.implicits._
    val longPad = "z" * 30
    val df = Seq(
      // pair via PREFIX anchor: shared 24-char head, one char changed
      // deep in the tail
      (1L, s"the quick brown fox jumps over $longPad A"),
      (2L, s"the quick brown fox jumps over $longPad B"),
      // pair via SUFFIX anchor only: heads differ in the first 24 chars
      (3L, s"AAAA different head here $longPad common tail stays same"),
      (4L, s"BBBB different head here $longPad common tail stays same"),
      // near-miss: same prefix but FAR in edit distance (long random tail)
      (5L, s"the quick brown fox jumps over " + ("q r s t u v w " * 8)),
      // short docs below keyLen: the whole text is the anchor, so a
      // typo breaks BOTH anchors — not found at keyLen=24 (the honest
      // recall limit of anchor bucketing), found at keyLen=4
      (6L, "tiny doc"), (7L, "tiny dog")
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(df, "doc_id", "text",
        maxDist = 16, keyLen = 24, maxBucket = 50)
      .orderBy($"id_a", $"id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1L), (3L, 4L, 4L)), got.mkString(","))
    val shortAnchors = Dedup.editDistancePairs(df, "doc_id", "text",
        maxDist = 16, keyLen = 4, maxBucket = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(shortAnchors.contains((6L, 7L, 1L)), shortAnchors.toString)
    // the bucket cap drops a boilerplate-prefix flood entirely
    val flood = (1L to 60L).map(i => (i, s"boilerplate header text!! v$i"))
      .toDF("doc_id", "text")
    assert(Dedup.editDistancePairs(flood, "doc_id", "text",
      maxDist = 16, keyLen = 24, maxBucket = 50).count() == 0)
  }

  test("crossSourceNgramLeak counts shared grams per source pair, capped") {
    import spark.implicits._
    // n=2: s1 doc1 {a b, b c}, s1 doc2 {a b}; s2 doc3 {a b, b c, c q};
    // s3 doc4 {z z}. With maxDocDf=2, "a b" (df=3) is capped out, so
    // (s1,s2) share only "b c"; s3 shares nothing.
    val df = Seq(
      (1L, "s1", "a b c"), (2L, "s1", "a b"),
      (3L, "s2", "a b c q"), (4L, "s3", "z z")
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.crossSourceNgramLeak(
        df, "doc_id", "source", "text", n = 2, maxDocDf = 2)
      .orderBy($"src_a", $"src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("s1", "s2", 1L)))
    // without the cap, "a b" counts too
    val uncapped = TextAnalysis.crossSourceNgramLeak(
        df, "doc_id", "source", "text", n = 2, maxDocDf = 1000)
      .orderBy($"src_a", $"src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(uncapped.toSeq == Seq(("s1", "s2", 2L)))
  }

  test("rareTokenRatio counts occurrences against corpus-wide counts") {
    import spark.implicits._
    // corpus counts: a=3, b=2, q=1 -> rare (<=2): b, q
    val df = Seq((1L, "a a b"), (2L, "a b q")).toDF("doc_id", "text")
    val got = TextAnalysis.rareTokenRatio(df, "doc_id", "text", maxCount = 2L)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, 0.333333), // b
      (2L, 3L, 2L, 0.666667))) // b, q
  }

  test("chunked covers every token; no chunk is a pure suffix of the last") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h i"), // 9 tokens: starts 1,5 (start 9 would re-emit "i")
      (2L, "x y"),               // shorter than size: one chunk
      (3L, "solo"),              // single token
      (4L, "a b c d e f g h i j k l m") // 13 tokens: starts 1,5,9
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.chunked(df, "doc_id", "text", size = 8, stride = 4)
      .orderBy($"doc_id", $"chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (1L, 0, 8, "a b c d e f g h"),
      (1L, 1, 5, "e f g h i"),
      (2L, 0, 2, "x y"),
      (3L, 0, 1, "solo"),
      (4L, 0, 8, "a b c d e f g h"),
      (4L, 1, 8, "e f g h i j k l"),
      (4L, 2, 5, "i j k l m")))
  }

  test("chunked tolerates inputs named toks/pos/col (internals don't shadow)") {
    import spark.implicits._
    // round-4 ADVICE: hardcoded internal names made an input column named
    // toks/pos/col ambiguous. The id column itself using one of those
    // names is the worst case — it must survive and come back unchanged.
    for (evil <- Seq("toks", "pos", "col")) {
      val df = Seq((1L, "a b c d e f g h i")).toDF(evil, "text")
      val rows = TextAnalysis.chunked(df, evil, "text", size = 8, stride = 4)
        .orderBy(col("chunk_idx")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
      assert(rows.toSeq == Seq(
        (1L, 0, "a b c d e f g h"),
        (1L, 1, "e f g h i")), s"idCol=$evil")
    }
  }

  test("chunked with stride > size keeps gap-sampled tails") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    // size 2, stride 4: starts 1,5,9 — the last window is a real tail,
    // not a suffix of a previous window
    val rows = TextAnalysis.chunked(df, "doc_id", "text", size = 2, stride = 4)
      .orderBy($"chunk_idx").collect().map(r => r.getString(3))
    assert(rows.toSeq == Seq("a b", "e f", "i"))
  }

  test("hashSampledBy matches hashSampled at a uniform rate; 16 keeps all, 0 drops all") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("id")
    val uniform = ids.filter(TextAnalysis.hashSampledBy($"id", lit(4))).count()
    val fixed = ids.filter(TextAnalysis.hashSampled($"id", 4)).count()
    assert(uniform == fixed)
    assert(ids.filter(TextAnalysis.hashSampledBy($"id", lit(16))).count() == 500)
    assert(ids.filter(TextAnalysis.hashSampledBy($"id", lit(0))).count() == 0)
    // rates 10..15 hit the letter range of the hex alphabet
    val ten = ids.filter(TextAnalysis.hashSampledBy($"id", lit(10))).count()
    val fifteen = ids.filter(TextAnalysis.hashSampledBy($"id", lit(15))).count()
    assert(ten == ids.filter(TextAnalysis.hashSampled($"id", 10)).count())
    assert(ten < fifteen && fifteen < 500)
  }

  test("packedBins assigns concat-and-chunk bins across group boundaries") {
    import spark.implicits._
    val docs = Seq((1L, 3L), (2L, 4L), (3L, 5L), (4L, 2L), (5L, 6L), (6L, 1L))
      .toDF("doc_id", "n_tokens")
    // groupSize 2 forces the two-level prefix sum through several groups
    val got = TextAnalysis.packedBins(docs, "doc_id", "n_tokens",
        budget = 5L, groupSize = 2L)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("start_offset"), r.getAs[Long]("bin")))
    // starts: 0,3,7,12,14,20 -> bins 0,0,1,2,2,4
    assert(got.toSeq == Seq(
      (1L, 0L, 0L), (2L, 3L, 0L), (3L, 7L, 1L),
      (4L, 12L, 2L), (5L, 14L, 2L), (6L, 20L, 4L)))
  }

  test("property: connectedComponents matches brute-force union-find") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    val genEdges = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong - 1)
        b <- Gen.chooseNum(0L, n.toLong - 1) if b != a
      } yield (a, b))
    } yield edges
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val prop = forAll(genEdges) { edges =>
      val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // min-label canonical form on both sides: the union-find root is
      // already the component minimum (smaller root wins each union)
      Prop(got == unionFind(edges))
        .label(s"${edges.size} edges, expected ${unionFind(edges).size} nodes")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.toString)
  }

  test("property: packedBins equals the naive global cumulative sum") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    val genCase = for {
      n <- Gen.chooseNum(1, 50)
      toks <- Gen.listOfN(n, Gen.chooseNum(0L, 30L))
      budget <- Gen.chooseNum(1L, 40L)
      groupSize <- Gen.chooseNum(1L, 8L)
      // sparse, unordered ids exercise the id-derived grouping
      ids <- Gen.pick(n, 1L to 200L)
    } yield (ids.toSeq.sorted.zip(toks), budget, groupSize)
    val prop = forAll(genCase) { case (docs, budget, groupSize) =>
      val got = TextAnalysis.packedBins(
          docs.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens",
          budget, groupSize)
        .orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("start_offset"), r.getAs[Long]("bin")))
      var acc = 0L
      val expected = docs.map { case (id, t) =>
        val start = acc; acc += t; (id, start, start / budget)
      }
      Prop(got.toSeq == expected)
        .label(s"${docs.size} docs budget=$budget groups=$groupSize")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.toString)
  }

  test("corpusMetrics observes quality counters inside the existing action") {
    import spark.implicits._
    val docs = Seq(
      (Some(1L), "a b c"), (Some(2L), ""), (None, "x y")
    ).toDF("doc_id", "text")
    val (observed, obs) = TextAnalysis.corpusMetrics(docs, "doc_id", "text")
    // one action; metrics ride along with it — no second scan
    assert(observed.count() == 3)
    val m = obs.get
    assert(m("n_rows") == 3L)
    assert(m("null_ids") == 1L)
    assert(m("empty_docs") == 1L)
    assert(m("total_tokens") == 6L) // "a b c"=3, ""=1 (split yields [""]), "x y"=2
  }

  test("repetitionStats counts duplicates and the dominant token") {
    import spark.implicits._
    val df = Seq((1L, "a a a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 5L, 3L, 0.4, 3L),
      (2L, 3L, 3L, 0.0, 1L)))
  }

  test("bloomDecontaminatePairs equals the exact join (no false negatives)") {
    import spark.implicits._
    val bench = Seq((0L, "a b c d")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "x y a b c d"), // shares shingles "a b c" and "b c d"
      (11L, "q r s"),       // shares nothing
      (12L, "b c d e")      // shares "b c d"
    ).toDF("doc_id", "text")
    val benchShingles = Dedup.explodedShingles(bench, "doc_id", "text")
      .select($"shingle").distinct()
    val got = Dedup.bloomDecontaminatePairs(corpus, benchShingles,
        "doc_id", "text")
      .orderBy($"id", $"shingle").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (10L, "a b c"), (10L, "b c d"), (12L, "b c d")))
  }

  test("dsirScore matches the hand-computed likelihood ratios") {
    import spark.implicits._
    // target corpus: "a a b" -> tc_t(a)=2, tc_t(b)=1
    // raw corpus: doc 10 "a b", doc 11 "c c"; tc_r(a)=1, tc_r(b)=1,
    // tc_r(c)=2; scale 1e6:
    //   r(a) = 3e6 // 2 = 1500000, r(b) = 2e6 // 2 = 1000000,
    //   r(c) = 1e6 // 3 = 333333
    //   doc 10: (1500000 + 1000000) // 2 = 1250000  (target-like)
    //   doc 11: (333333 + 333333) // 2 = 333333     (not)
    // the target doc itself is never scored; NULL text absent.
    val df = Seq(
      (1L, "a a b", "tgt"), (10L, "a b", "raw"), (11L, "c c", "raw"),
      (12L, null.asInstanceOf[String], "raw")
    ).toDF("doc_id", "text", "src")
    val got = TextAnalysis.dsirScore(df, "doc_id", "text",
        col("src") === "tgt")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (10L, 2L, 1250000L),
      (11L, 2L, 333333L)))
  }

  test("classifyByTokens matches hand-computed scores incl. the tie-break") {
    import spark.implicits._
    // train: en={cat,dog}, fr={chat,chien}; V=4, nc=2 each, scale 1e6:
    //   seen l = 2e6//6 = 333333, unseen l0 = 1e6//6 = 166666
    // doc 3 "cat cat" -> en 333333 vs fr 166666 -> en
    // doc 4 "chien"   -> en 166666 vs fr 333333 -> fr
    // doc 5 "dog chat" -> both (333333+166666)//2 = 249999: exact tie,
    //   deterministic tie-break picks the smaller class name ("en")
    val df = Seq(
      (0L, "cat dog", "en"), (2L, "chat chien", "fr"),
      (3L, "cat cat", "en"), (5L, "chien", "fr"), (7L, "dog chat", "fr")
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.classifyByTokens(df, "doc_id", "text", "lang",
        $"doc_id" % 2 === 0)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (3L, "en", "en"), (5L, "fr", "fr"), (7L, "fr", "en")))
  }

  test("rankWithinKey equals the naive per-key window at any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // one dominant key (40 rows) + tiny keys, ranked at 1, 3 and 7
    // partitions: the range split slices the hot key across partitions
    // and the offsets must stitch the exact same ranks back together
    val rows = (1 to 40).map(i => ("hot", 1000L - i, i.toLong)) ++
      Seq(("a", 5L, 100L), ("a", 5L, 101L), ("b", 9L, 200L))
    val df = rows.toDF("k", "v", "id")
    val naive = df.withColumn("r", row_number().over(
        Window.partitionBy($"k").orderBy($"v", $"id")))
      .select($"k", $"id", $"r").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2).toLong)).toSet
    for (p <- Seq(1, 3, 7)) {
      val got = RankOps.rankWithinKey(df, "k", Seq($"v", $"id"),
          rankCol = "r", numPartitions = Some(p))
        .select($"k", $"id", $"r").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == naive, s"mismatch at numPartitions=$p")
    }
  }

  test("tokenBudgetCut two-level prefix sum equals a naive window across chunks") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // chunkSize=2 forces chunk boundaries INSIDE each source's stream;
    // budget 7 cuts mid-chunk for s1 (3+3 kept, +3 would pass 7) and
    // exactly at a boundary for s2 (2+2+2+1 -> all 7 kept)
    val df = Seq(
      (0L, "a b c", "s1"), (1L, "a b c", "s1"), (2L, "a b c", "s1"),
      (3L, "a b c", "s1"),
      (10L, "a b", "s2"), (11L, "a b", "s2"), (12L, "a b", "s2"),
      (13L, "a", "s2"),
      (20L, null.asInstanceOf[String], "s3")
    ).toDF("doc_id", "text", "src")
    val got = TextAnalysis.tokenBudgetCut(df, "doc_id", "text", "src",
        budget = 7L, chunkSize = 2L)
      .orderBy($"src", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("s1", 0L, 3L), ("s1", 1L, 6L),
      ("s2", 10L, 2L), ("s2", 11L, 4L), ("s2", 12L, 6L), ("s2", 13L, 7L)))
    // and the naive single-window cumsum agrees row for row
    val naive = df.filter($"text".isNotNull)
      .select($"src", $"doc_id",
        size(split($"text", " ")).cast("long").as("t"))
      .withColumn("cum", sum($"t").over(
        Window.partitionBy($"src").orderBy($"doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter($"cum" <= 7)
      .orderBy($"src", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == naive.toSeq)
  }

  test("bigramLmScore matches the hand-computed integer arithmetic") {
    import spark.implicits._
    // corpus: bigrams (a,b)x3 (two in doc 1, one in doc 2), (b,a)x1;
    // contexts cc(a)=3, cc(b)=1; V = |{a,b,x}| = 3; scale 1e9:
    //   p(a,b) = 4e9 // 6 = 666666666,  p(b,a) = 2e9 // 4 = 500000000
    //   doc 1: (666666666+500000000+666666666) // 3 = 611111110
    //   doc 2: 666666666 // 1
    // doc 3 has one token (no bigrams), doc 4 is NULL: both absent.
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLmScore(df, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 3L, 611111110L),
      (2L, 1L, 666666666L)))
  }

  test("segmentDedup keeps first occurrences and reassembles in order") {
    import spark.implicits._
    // doc 1 owns both full segments and the short tail; doc 2 repeats
    // doc 1's first segment (cross-doc dup); doc 3 is entirely built
    // from doc 1's first segment (drops to empty, within-doc dup too);
    // doc 10 repeats its own first segment (within-doc keep-first);
    // empty and NULL docs are dropped up front.
    val df = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c x y z"),
      (3L, "a b c a b c"),
      (10L, "p q r p q r"),
      (11L, ""),
      (12L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(df, "doc_id", "text", k = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 3L, 7L, "a b c d e f g"),
      (2L, 2L, 1L, 3L, "x y z"),
      (3L, 2L, 0L, 0L, ""),
      (10L, 2L, 1L, 3L, "p q r")))
  }

  test("segmentDedup fails loudly when a doc exceeds the packing stride") {
    import spark.implicits._
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.segmentDedup(df, "doc_id", "text", k = 2, maxSegsPerDoc = 3)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("exceeds maxSegsPerDoc")), ex.getMessage)
  }

  test("winnowing guarantees a shared fingerprint for runs >= w+k-1") {
    import spark.implicits._
    // k=4, w=4: any shared run of >= 7 tokens must yield at least one
    // shared selected hash (Schleimer et al. theorem 1), regardless of
    // the surrounding context. The shared run here is exactly 7 tokens,
    // embedded at different positions in otherwise-disjoint documents.
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val df = Seq(
      (1L, s"one two three $shared four five six seven"),
      (2L, s"red green blue cyan magenta $shared yellow")
    ).toDF("doc_id", "text")
    val fps = Dedup.winnowedFingerprints(df, "doc_id", "text", k = 4, w = 4)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(2)).toSet }
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "a 7-token shared run must select at least one common fingerprint")
    // selection positions are valid gram positions and the sketch is
    // smaller than the gram stream (winnowing's density is ~2/(w+1))
    val rows = fps.collect()
    assert(rows.forall { r =>
      val pos = r.getLong(1); pos >= 1 && pos <= 1000000000L
    })
    val nGramsDoc1 = 14 - 3 // 14 tokens
    assert(byDoc(1L).size < nGramsDoc1)
  }

  test("winnowedPairs finds heavy overlap and respects minShared") {
    import spark.implicits._
    // docs 1/2 share a long run (many shared fingerprints); doc 3 is
    // disjoint; docs 4/5 share only a 4-token gram (at most one shared
    // fingerprint, filtered by minShared=2)
    val longRun = (1 to 20).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, s"aa bb cc $longRun dd ee"),
      (2L, s"ff gg $longRun hh ii jj"),
      (3L, "completely different words entirely here now"),
      (4L, "pp qq rr ss unique tail one"),
      (5L, "zz yy pp qq rr ss other end")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowedPairs(df, "doc_id", "text",
      k = 4, w = 4, minShared = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length == 1)
    assert(pairs.head._1 == 1L && pairs.head._2 == 2L && pairs.head._3 >= 2L)
  }

  test("property: segmentDedup matches the naive global keep-first") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    // small vocab forces heavy cross-doc segment collisions
    val genDocs = for {
      n <- Gen.chooseNum(1, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(1, 17)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def naive(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, Long, String)] = {
      val seen = scala.collection.mutable.Set.empty[String]
      docs.sortBy(_._1).map { case (id, text) =>
        val segs = text.split(" ").grouped(k).map(_.mkString(" ")).toSeq
        val kept = segs.filter(s => seen.add(s))
        id -> (segs.size.toLong, kept.size.toLong,
          kept.map(_.split(" ").length.toLong).sum, kept.mkString(" "))
      }.toMap
    }
    val prop = forAll(genDocs) { docs =>
      val got = Dedup.segmentDedup(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4))).toMap
      Prop(got == naive(docs, 3)).label(s"${docs.size} docs")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.toString)
  }

  test("property: winnowedFingerprints matches the naive selection") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val k = 3
    val w = 3
    def naive(text: String): Set[(Long, String)] = {
      val toks = text.split(" ")
      if (toks.length < k) Set.empty
      else {
        val grams = (0 to toks.length - k)
          .map(i => md5hex(toks.slice(i, i + k).mkString(" ")))
        val nGrams = grams.length
        val lastStart = math.max(1, nGrams - w + 1)
        (1 to lastStart).map { p =>
          // min hash in window, rightmost on ties
          val win = grams.slice(p - 1, math.min(p - 1 + w, nGrams))
          val minH = win.min
          val sel = (p - 1 + win.lastIndexOf(minH)) + 1
          (sel.toLong, minH)
        }.toSet
      }
    }
    val genDocs = for {
      n <- Gen.chooseNum(1, 8)
      docs <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(1, 20)
        toks <- Gen.listOfN(len, Gen.oneOf("x", "y", "z"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val prop = forAll(genDocs) { docs =>
      val got = Dedup.winnowedFingerprints(
          docs.toDF("doc_id", "text"), "doc_id", "text", k = k, w = w)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
        .groupBy(_._1).map { case (id, rs) => id -> rs.map(_._2).toSet }
      val want = docs.map { case (id, t) => id -> naive(t) }
        .filter(_._2.nonEmpty).toMap
      Prop(got == want).label(s"${docs.size} docs")
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.toString)
  }

  test("sourceDriftMatrix matches the hand-computed integer identity") {
    import spark.implicits._
    // A: "a a b" -> p(a)=2e6//3=666666, p(b)=333333
    // B: "a c"   -> p(a)=500000, p(c)=500000; shared = {a}
    // l2 = (666666-500000)^2 + 333333^2 + 500000^2 = 388888444445
    //    -> DIV 1e6 = 388888; identity: sqA + sqB - 2*x with
    //    sqA=555554444445, sqB=500000000000, x=333333000000
    val df = Seq(("A", "a a b"), ("B", "a c")).toDF("source", "text")
    val got = TextAnalysis.sourceDriftMatrix(df, "text", "source").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("A", "B", 1L, 388888L)))
  }

  test("snapshotDiff labels all four statuses and carries columns from either side") {
    import spark.implicits._
    val oldSnap = Seq((1L, "s1", "same"), (2L, "s1", "before"),
      (3L, "s2", "gone")).toDF("doc_id", "source", "text")
    val newSnap = Seq((1L, "s1", "same"), (2L, "s1", "after"),
      (4L, "s2", "fresh")).toDF("doc_id", "source", "text")
    val got = Dedup.snapshotDiff(oldSnap, newSnap, "doc_id", "text",
        carryCols = Seq("source"))
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, "s1", "unchanged"), (2L, "s1", "modified"),
      (3L, "s2", "removed"), (4L, "s2", "added")))
  }
}
