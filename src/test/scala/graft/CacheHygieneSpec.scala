package graft

import org.scalatest.funsuite.AnyFunSuite

/** Operators that persist() intermediates (the LSH dedup family) must
  * not leak cached frames across queries: Verify and Bench clear the
  * session cache after each query's action, and that has to actually
  * drop every block — a long-running session otherwise accumulates
  * MEMORY_AND_DISK frames until executors spill or OOM.
  */
class CacheHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("cache-using queries leave no persisted RDDs after the per-query clear") {
    // compare against a BEFORE snapshot, not absolute emptiness: earlier
    // suites in the same shared session may have final CC checkpoints
    // still awaiting the GC-driven ContextCleaner — p17 must simply add
    // nothing of its own
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("p17_neardup_lsh")(spark, sf).count()
    spark.catalog.clearCache()
    val leaked = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !before.contains(id)
    }
    assert(leaked.isEmpty,
      s"p17 left ${leaked.size} persisted RDDs: ${leaked.values.map(_.name)}")
    // p08's exact-companion gate reads the shared Jaccard pairs memo, so
    // ONE bounded checkpoint (the memoized pair frame) may survive the
    // clear — but nothing else, and re-running must not accumulate
    SparkEntry.queries("p08_minhash_lsh")(spark, sf).count()
    spark.catalog.clearCache()
    val afterP08 = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !before.contains(id)
    }
    assert(afterP08.size <= 1,
      s"p08 may keep only the pairs memo: ${afterP08.values.map(_.name)}")
    SparkEntry.queries("p08_minhash_lsh")(spark, sf).count()
    spark.catalog.clearCache()
    val repeat = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !before.contains(id)
    }
    assert(repeat.size <= afterP08.size,
      "repeated p08 must hit the pairs memo, not accumulate")
  }

  test("p72's scored-frame persist is dropped by the per-query clear") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("p72_hard_negatives")(spark, sf).count()
    spark.catalog.clearCache()
    val leaked = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !before.contains(id)
    }
    assert(leaked.isEmpty,
      s"p72 left ${leaked.size} persisted RDDs: ${leaked.values.map(_.name)}")
  }

  test("batch-6 persists (p101/p103) are dropped by the per-query clear") {
    // p101 populates the bitext-kNN memo (one executor-resident
    // localCheckpoint, the p08-pairs-memo precedent) on a COLD session,
    // so it may retain exactly that one entry — but a re-run must hit
    // the memo, not accumulate. p103 and q53 (which rides
    // exactQuantiles' internal dictionary persist) must leak nothing.
    val beforeP101 = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("p101_bitext_mining")(spark, sf).count()
    spark.catalog.clearCache()
    val afterP101 = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !beforeP101.contains(id)
    }
    assert(afterP101.size <= 1,
      s"p101 may keep only the xknn memo: ${afterP101.values.map(_.name)}")
    SparkEntry.queries("p101_bitext_mining")(spark, sf).count()
    spark.catalog.clearCache()
    val repeatP101 = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !beforeP101.contains(id)
    }
    assert(repeatP101.size <= afterP101.size,
      "repeated p101 must hit the xknn memo, not accumulate")
    for (q <- Seq("p103_cdc_chunk_dedup", "q53_approx_quantiles")) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(q)(spark, sf).count()
      spark.catalog.clearCache()
      val leaked = spark.sparkContext.getPersistentRDDs.filter {
        case (id, _) => !before.contains(id)
      }
      assert(leaked.isEmpty,
        s"$q left ${leaked.size} persisted RDDs: ${leaked.values.map(_.name)}")
    }
    // p102's merge table is PLAIN driver data (the learnedBpe memo):
    // a repeat must hit it — no second fit, no checkpoint accumulation
    SparkEntry.queries("p102_bpe_encode")(spark, sf).count()
    spark.catalog.clearCache()
    val afterP102 = spark.sparkContext.getPersistentRDDs.size
    SparkEntry.queries("p102_bpe_encode")(spark, sf).count()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.size <= afterP102,
      "repeated p102 must hit the learnedBpe memo, not re-fit")
  }

  test("p07/p24/p28 share BOUNDED stage memos (no accumulation)") {
    // p07 computes the shared pair stage; the memoized checkpoint is the
    // one allowed persistent entry (the shingle index used to build it
    // must still have been released by the scoped form)
    SparkEntry.queries("p07_ngram_jaccard")(spark, sf).count()
    spark.catalog.clearCache()
    val afterP07 = spark.sparkContext.getPersistentRDDs.size
    SparkEntry.queries("p07_ngram_jaccard")(spark, sf).count()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.size <= afterP07,
      "repeated p07 must hit the pairs memo, not accumulate checkpoints")
    // p24 derives clusters from the memoized pairs (CC rounds may add
    // checkpoints the ContextCleaner reclaims on GC)...
    SparkEntry.queries("p24_dup_clusters")(spark, sf).count()
    spark.catalog.clearCache()
    val afterP24 = spark.sparkContext.getPersistentRDDs.size
    // ...then p28 and a repeated p24 REUSE it: zero new persisted blocks
    SparkEntry.queries("p28_dedup_survivors")(spark, sf).count()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.size <= afterP24,
      "p28 must reuse p24's pairs->clusters stage, not recompute it")
    SparkEntry.queries("p24_dup_clusters")(spark, sf).count()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.size <= afterP24,
      "repeated p24 must hit the memo, not accumulate checkpoints")
  }

  test("batch-8 persists (p107/p108/p109) are dropped by the per-query clear") {
    // p107 populates the shared k-means ASSIGNMENT memo (one
    // executor-resident localCheckpoint p47/p99 also read) on a cold
    // session, so it may retain exactly that one entry — but a re-run
    // must hit the memo, not accumulate. p108 (chunk-frame persist) and
    // p109 (knn4's + ivfMineMates' scored persists) must leak nothing.
    val beforeP107 = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("p107_semdedup_resplit")(spark, sf).count()
    spark.catalog.clearCache()
    val afterP107 = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !beforeP107.contains(id)
    }
    assert(afterP107.size <= 1,
      s"p107 may keep only the assignment memo: ${afterP107.values.map(_.name)}")
    SparkEntry.queries("p107_semdedup_resplit")(spark, sf).count()
    spark.catalog.clearCache()
    val repeatP107 = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !beforeP107.contains(id)
    }
    assert(repeatP107.size <= afterP107.size,
      "repeated p107 must hit the assignment memo, not accumulate")
    for (q <- Seq("p108_cdc_clamped_dedup", "p109_ivf_batch_bitext",
        "p110_chunk_ingest_monitor")) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(q)(spark, sf).count()
      spark.catalog.clearCache()
      val leaked = spark.sparkContext.getPersistentRDDs.filter {
        case (id, _) => !before.contains(id)
      }
      assert(leaked.isEmpty,
        s"$q left ${leaked.size} persisted RDDs: ${leaked.values.map(_.name)}")
    }
  }

  test("round-9 entries (p122 word-dict persist included) leak nothing") {
    // p122 persists its distinct-word dictionary for the two encode
    // passes (a plain persist, NOT a localCheckpoint, precisely so the
    // per-query clear drops it); p113/p120/p121/p123-p125/p126 carry no
    // persist at all. Repeat p122 to prove no per-invocation growth.
    for (q <- Seq("p113_chi2_features", "p120_unigram_encode",
        "p121_ndcg", "p122_unigram_prune", "p122_unigram_prune",
        "p123_tokenizer_fertility", "p124_k_anonymity",
        "p125_calibration_ece", "p126_fertility_drift",
        "p128_rougel_decontam", "p129_local_align")) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(q)(spark, sf).count()
      spark.catalog.clearCache()
      val leaked = spark.sparkContext.getPersistentRDDs.filter {
        case (id, _) => !before.contains(id)
      }
      // p121 reads the annExactTop10 memo (ONE bounded cross-query
      // localCheckpoint, the p101/xknn precedent) on a cold session
      val allow = if (q == "p121_ndcg") 1 else 0
      assert(leaked.size <= allow,
        s"$q left ${leaked.size} persisted RDDs: ${leaked.values.map(_.name)}")
    }
  }

  test("p130/p137 word-dict persists are dropped by the per-query clear") {
    // both persist the distinct-word dictionary across the E-step
    // collect and the encode passes (the p122 pattern: a plain persist,
    // NOT a localCheckpoint). Repeat p130 to prove no per-invocation
    // growth.
    for (q <- Seq("p130_unigram_em", "p130_unigram_em",
        "p137_em_fertility_shift", "p141_em_second_iteration",
        "p136_source_kl", "p143_em_convergence")) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(q)(spark, sf).count()
      spark.catalog.clearCache()
      val leaked = spark.sparkContext.getPersistentRDDs.filter {
        case (id, _) => !before.contains(id)
      }
      assert(leaked.isEmpty,
        s"$q left ${leaked.size} persisted RDDs: ${leaked.values.map(_.name)}")
    }
  }

  test("round-10 persists (calibration bins, KN bc, sample/cell frames) " +
      "are dropped by the per-query clear") {
    // p131/p133/p140 gained bin/explode persists this round; p144
    // persists the train bigram counts; p150/p151/p152 persist sample,
    // cell and class frames. Every one is scoped to the query — the
    // Verify/Bench per-query clearCache must drop them all.
    for (q <- Seq("p131_calibration_real", "p133_heaps_law",
        "p140_isotonic_calibration", "p144_kneser_ney",
        "p148_signal_agreement", "p150_self_bleu", "p151_hubness_audit",
        "p152_class_separability", "p149_kcenter_coreset",
        "p153_l_diversity", "p154_perplexity_drift",
        "q104_benford_audit")) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(q)(spark, sf).count()
      spark.catalog.clearCache()
      val leaked = spark.sparkContext.getPersistentRDDs.filter {
        case (id, _) => !before.contains(id)
      }
      assert(leaked.isEmpty,
        s"$q left ${leaked.size} persisted RDDs: ${leaked.values.map(_.name)}")
    }
  }

  test("round-11/12 persists (Jaccard cap-join frame, HITS score " +
      "frames, containment index, leak-span tokenization) are dropped " +
      "by the per-query clear") {
    // p37/p07 gained the DF-capped shingle persist in round 11; p159
    // persists one frame per normalized half-iteration (its edge frame
    // moved to the commercePairs memo in r15 — covered below); p160's
    // containmentPairs persists the exploded shingles and the DF-capped
    // frame it rides; p48 persists the tokenized frame its witness
    // guard + gram pass + length projection share (round 12)
    for (q <- Seq("p37_incremental_dedup", "p07_ngram_jaccard",
        "p162_principal_direction",
        "p165_vocab_gini", "p17_neardup_lsh", "p09_simhash",
        "p160_containment_dedup", "p48_leak_spans")) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      SparkEntry.queries(q)(spark, sf).count()
      spark.catalog.clearCache()
      val leaked = spark.sparkContext.getPersistentRDDs.filter {
        case (id, _) => !before.contains(id)
      }
      assert(leaked.isEmpty,
        s"$q left ${leaked.size} persisted RDDs: ${leaked.values.map(_.name)}")
    }
  }

  test("r15 commercePairs memo: p159 keeps exactly the one pair frame, " +
      "p49 and repeats hit it without rebuilding") {
    // Both graph entries read the shared (cust, supp) pair memo (one
    // bounded localCheckpoint — the p08-pairs / p101-xknn / p107-
    // assignment precedent). The accessor contract: at most one
    // persisted frame ever, repeats return the SAME frame with zero new
    // blocks. (p49 itself legitimately retains pageRank's final-round
    // checkpoints until the ContextCleaner GCs them, so the entry-level
    // leak bound is asserted on p159 and the memo contract directly.)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("p159_hits_authorities")(spark, sf).count()
    spark.catalog.clearCache()
    val afterP159 = spark.sparkContext.getPersistentRDDs.filter {
      case (id, _) => !before.contains(id)
    }
    assert(afterP159.size <= 1,
      s"p159 may keep only the commercePairs memo: ${afterP159.values.map(_.name)}")
    // direct accessor contract: same frame back, no new persisted blocks
    val mid = spark.sparkContext.getPersistentRDDs.keySet
    val df1 = graft.operators.PageRankOp.commercePairs(spark, sf)
    val df2 = graft.operators.PageRankOp.commercePairs(spark, sf)
    assert(df1 eq df2, "repeated commercePairs must return the memoized frame")
    assert(spark.sparkContext.getPersistentRDDs.keySet == mid,
      "a memo hit must add no persisted blocks")
    // and p49 consuming it must register as a HIT in the ledger (the
    // bench line's memo marker rides exactly this)
    MemoLedger.drainForeignHits()
    SparkEntry.queries("p49_pagerank")(spark, sf).count()
    spark.catalog.clearCache()
    assert(MemoLedger.drainForeignHits().contains("commercePairs"),
      "p49 must consume the memo p159 built (hit without build)")
  }
}
