package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.Tables

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Stage events (nanos-normalized) into a stream-source directory. */
  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("events-stream").toString
    Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    dir
  }


  /** Run `body` on the RocksDB state store provider (what a real
    * deployment sets, and a hard requirement for transformWithState),
    * restoring the previous provider afterwards.
    */
  private def withRocksDB[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("streaming windowed counts equal the batch computation") {
    val streamed = EventStreams.runToMemory(spark, srcDir, "win_counts",
      df => EventStreams.windowedCounts(df))
    val batch = EventStreams.windowedCounts(spark.read.parquet(srcDir))
    val s = streamed.orderBy("w_start", "event_type").collect()
    val b = batch.orderBy("w_start", "event_type").collect()
    // append mode emits only watermark-closed windows; every emitted row
    // must match the batch result exactly
    assert(s.nonEmpty)
    val bSet = b.map(_.toString).toSet
    assert(s.forall(r => bSet(r.toString)))
  }

  test("streaming session_window equals the batch computation") {
    val streamed = EventStreams.runToMemory(spark, srcDir, "sess_win",
      df => EventStreams.sessionWindowAgg(df, gap = "10 minutes",
        watermark = Some("15 minutes")))
    val batch = EventStreams.sessionWindowAgg(
      spark.read.parquet(srcDir), gap = "10 minutes")
    // append mode emits only watermark-finalized sessions; every emitted
    // row must match the batch result exactly (the built-in session
    // store's cross-batch merge must converge on the batch answer)
    val s = streamed.collect()
    assert(s.nonEmpty)
    val bSet = batch.collect().map(_.toString).toSet
    assert(s.forall(r => bSet(r.toString)))
  }

  test("streaming dedup keeps one event per content key") {
    val keys = Seq("user_id", "event_type")
    val deduped = EventStreams.runToMemory(spark, srcDir, "dedup_stream",
      df => EventStreams.dedupStream(df, keys, watermark = "10 days"))
    val batchDistinct = spark.read.parquet(srcDir)
      .select(keys.map(col): _*).distinct().count()
    assert(deduped.count() == batchDistinct)
    // and the output itself is duplicate-free on the key
    assert(deduped.select(keys.map(col): _*).distinct().count() ==
      deduped.count())
  }

  test("dedup content key keeps nulls distinct") {
    import spark.implicits._
    val df = Seq(
      (Some("a"), Option.empty[String]),
      (Option.empty[String], Some("a")),
      (Some("a"), Some("a")))
      .toDF("x", "y")
      .select(EventStreams.contentKey(Seq("x", "y")).as("k"))
    assert(df.distinct().count() == 3,
      "(a,null), (null,a) and (a,a) must produce three distinct keys")
  }

  test("stream-static enrichment join matches the batch computation") {
    import spark.implicits._
    val dim = spark.read.parquet(srcDir).select($"user_id").distinct()
      .withColumn("tier", concat(lit("t"), ($"user_id" % 3).cast("string")))
    dim.persist()
    try {
      val streamed = EventStreams.runToMemory(spark, srcDir, "enriched_win",
        df => EventStreams.enrichedWindowedTotals(df, dim))
      val batch = EventStreams.enrichedWindowedTotals(
        spark.read.parquet(srcDir), dim)
      val s = streamed.collect()
      assert(s.nonEmpty)
      val bSet = batch.collect().map(_.toString).toSet
      // append emits only closed windows; each must equal batch exactly
      assert(s.forall(r => bSet(r.toString)))
    } finally dim.unpersist()
  }

  test("stream-stream interval join equals the batch interval join") {
    val views = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("event_type") === "view")
    val clicks = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("event_type") === "click")
    val streamed = EventStreams.runToMemory(spark, srcDir, "interval_join",
      df => EventStreams.intervalJoin(views(df), clicks(df)))
    val batchDf = spark.read.parquet(srcDir)
    val batch = EventStreams.intervalJoin(views(batchDf), clicks(batchDf))
    val s = streamed.collect().map(_.toString).sorted
    val b = batch.collect().map(_.toString).sorted
    assert(s.nonEmpty, "the sf0.001 events must produce view->click pairs")
    // inner stream-stream joins emit every match once drained: exact equality
    assert(s.toSeq == b.toSeq)
  }

  test("left-outer interval join: matches equal batch; nulls only past the horizon") {
    import spark.implicits._
    val views = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("event_type") === "view")
    val clicks = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("event_type") === "click")
    val streamed = EventStreams.runToMemory(spark, srcDir, "loj_interval",
      df => EventStreams.intervalJoin(views(df), clicks(df),
        joinType = "left_outer")).collect()
    val batchDf = spark.read.parquet(srcDir)
    val batch = EventStreams.intervalJoin(views(batchDf), clicks(batchDf),
      joinType = "left_outer").collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("l_event_id"),
        Option(r.getAs[Any]("r_event_id")).map(_.toString))
    val s = streamed.map(key).toSet
    val bMatched = batch.filter(!_.isNullAt(2)).map(key).toSet
    val bNull = batch.filter(_.isNullAt(2))
    // every batch MATCH must stream; streamed matches must equal them
    assert(bMatched.subsetOf(s), s"missing ${(bMatched -- s).take(3)}")
    // null rows may only exist for batch-unmatched left rows, and any
    // unmatched left row whose join horizon lies strictly before the
    // final watermark MUST have emitted its null (state-clean "never
    // converted", not "hasn't yet")
    val wmkMs = 15 * 60 * 1000L
    val horizonMs = 10 * 60 * 1000L
    // the GLOBAL watermark is the MIN across both sides' watermark
    // nodes, and each node only sees its own filtered rows — the click
    // stream ends hours before the view stream here, so the click-side
    // max is the binding one (using the overall max ts would overclaim
    // the eviction frontier by exactly that gap)
    val maxSideTs = Seq("view", "click").map(t =>
      batchDf.filter($"event_type" === t).agg(max($"ts")).collect()
        .head.getTimestamp(0).getTime).min
    val bNullKeys = bNull.map(key).toSet
    val mustNull = bNull.filter(r =>
      r.getAs[java.sql.Timestamp]("l_ts").getTime + horizonMs <
        maxSideTs - wmkMs).map(key).toSet
    val streamedNulls = streamed.filter(_.isNullAt(2)).map(key).toSet
    assert(mustNull.nonEmpty, "fixture must have provably-unmatched views")
    assert(mustNull.subsetOf(streamedNulls),
      s"missing nulls ${(mustNull -- streamedNulls).take(3)}")
    assert(streamedNulls.subsetOf(bNullKeys),
      s"spurious nulls ${(streamedNulls -- bNullKeys).take(3)}")
  }

  test("full-outer interval join: matches equal batch; nulls on BOTH sides") {
    import spark.implicits._
    val views = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("event_type") === "view")
    val clicks = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("event_type") === "click")
    val streamed = EventStreams.runToMemory(spark, srcDir, "foj_interval",
      df => EventStreams.intervalJoin(views(df), clicks(df),
        joinType = "full_outer")).collect()
    val batchDf = spark.read.parquet(srcDir)
    val batch = EventStreams.intervalJoin(views(batchDf), clicks(batchDf),
      joinType = "full_outer").collect()
    def key(r: org.apache.spark.sql.Row) =
      (Option(r.getAs[Any]("l_event_id")).map(_.toString),
        Option(r.getAs[Any]("r_event_id")).map(_.toString))
    val s = streamed.map(key).toSet
    val bMatched = batch.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(key).toSet
    assert(bMatched.subsetOf(s), s"missing ${(bMatched -- s).take(3)}")
    val wmkMs = 15 * 60 * 1000L
    val horizonMs = 10 * 60 * 1000L
    // the binding global watermark is the min across both sides
    val maxSideTs = Seq("view", "click").map(t =>
      batchDf.filter($"event_type" === t).agg(max($"ts")).collect()
        .head.getTimestamp(0).getTime).min
    // LEFT nulls: unmatched views whose horizon closed before the
    // final watermark MUST have emitted
    val bLeftNull = batch.filter(_.isNullAt(2))
    val mustLeftNull = bLeftNull.filter(r =>
      r.getAs[java.sql.Timestamp]("l_ts").getTime + horizonMs <
        maxSideTs - wmkMs).map(key).toSet
    // RIGHT nulls: unmatched clicks; a click's candidate views lie in
    // [r_ts - horizon, r_ts], so once the watermark passes r_ts no
    // match can arrive — same margin, conservatively
    val bRightNull = batch.filter(_.isNullAt(1))
    val mustRightNull = bRightNull.filter(r =>
      r.getAs[java.sql.Timestamp]("r_ts").getTime + horizonMs <
        maxSideTs - wmkMs).map(key).toSet
    val streamedNulls = streamed
      .filter(r => r.isNullAt(1) || r.isNullAt(2)).map(key).toSet
    val bNullKeys = (bLeftNull ++ bRightNull).map(key).toSet
    assert(mustLeftNull.nonEmpty && mustRightNull.nonEmpty,
      "fixture must have provably-unmatched rows on both sides")
    assert(mustLeftNull.subsetOf(streamedNulls),
      s"missing left nulls ${(mustLeftNull -- streamedNulls).take(3)}")
    assert(mustRightNull.subsetOf(streamedNulls),
      s"missing right nulls ${(mustRightNull -- streamedNulls).take(3)}")
    assert(streamedNulls.subsetOf(bNullKeys),
      s"spurious nulls ${(streamedNulls -- bNullKeys).take(3)}")
  }

  test("idempotent foreachBatch sink: commit-marker loss replays without dupes") {
    val out = Files.createTempDirectory("fb-out").toString
    val ckpt = Files.createTempDirectory("fb-ckpt").toString
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
      val q = EventStreams.idempotentParquetSink(
        stream.filter(col("event_type") === "view"), out, ckpt).start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce()
    val expected = spark.read.parquet(out).drop("_batch_id")
      .collect().map(_.toString).sorted
    assert(expected.nonEmpty)
    // simulate a crash between sink write and offset commit: delete the
    // newest commit marker so restart re-delivers the last batch
    val commitsDir = new java.io.File(ckpt, "commits")
    val commits = commitsDir.listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    // the local ChecksumFs keeps a .N.crc sidecar; it must go too or the
    // replayed commit write fails its rename. Files.delete THROWS on
    // failure — a delete that silently fails would make this test pass
    // without ever exercising a replay.
    val crc = new java.io.File(commitsDir, s".${commits.last.getName}.crc")
    if (crc.exists()) java.nio.file.Files.delete(crc.toPath)
    java.nio.file.Files.delete(commits.last.toPath)
    runOnce()
    val replayed = spark.read.parquet(out).drop("_batch_id")
      .collect().map(_.toString).sorted
    assert(replayed.toSeq == expected.toSeq,
      "replayed batch must overwrite its own partition, not append duplicates")
  }

  test("rollup maintenance sink: state == batch recompute; replay is a no-op") {
    val stateDir = Files.createTempDirectory("rollup-state").toString
    val ckpt = Files.createTempDirectory("rollup-ckpt").toString
    // stage a 4-file copy: one file per trigger => four micro-batches
    // => three real cross-batch merges + retention pruning of v=0
    val src4 = Files.createTempDirectory("rollup-src").toString
    spark.read.parquet(srcDir).repartition(4)
      .write.mode("overwrite").parquet(src4)
    val schema = spark.read.parquet(src4).schema
    def runOnce(ckptDir: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src4)
      val q = EventStreams.rollupMaintenanceSink(stream, stateDir, ckptDir)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(ckpt)
    def stateRows() = EventStreams.latestRollupState(spark, stateDir)
      .get.orderBy("event_type").collect().map(_.toString).toSeq
    val expected = spark.read.parquet(src4)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .orderBy("event_type").collect().map(_.toString).toSeq
    val got = stateRows()
    // integer cents: merged incremental state must EQUAL the full
    // recompute, not approximately
    assert(got == expected, s"state $got != recompute $expected")
    // several versions must have merged (multi-file source); retention
    // keeps at most keepVersions complete versions around
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val versions = fs.listStatus(root)
      .filter(_.getPath.getName.startsWith("v=")).map(_.getPath.getName)
    assert(versions.length <= 3, versions.mkString(","))
    // crash between state write and offset commit: drop the newest
    // commit marker; the restart re-delivers that batch and must find
    // its version already complete — a pure no-op
    val commitsDir = new java.io.File(ckpt, "commits")
    val commits = commitsDir.listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val crc = new java.io.File(commitsDir, s".${commits.last.getName}.crc")
    if (crc.exists()) java.nio.file.Files.delete(crc.toPath)
    java.nio.file.Files.delete(commits.last.toPath)
    runOnce(ckpt)
    assert(stateRows() == expected,
      "a replayed batch must not re-merge into the state table")
    // checkpoint reset against a KEPT state table: batch ids restart at
    // 0 below the existing versions — merging would pin readers to the
    // stale lineage and retention would delete the fresh writes, so the
    // sink must fail fast instead of going silently stale
    val ckpt2 = Files.createTempDirectory("rollup-ckpt2").toString
    val stream2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src4)
    val q2 = EventStreams.rollupMaintenanceSink(stream2, stateDir, ckpt2)
      .start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(err).exists(c =>
      Option(c.getMessage).exists(_.contains("different checkpoint lineage"))),
      s"expected the lineage guard, got: $err")
    assert(stateRows() == expected, "the stale-lineage run must not touch state")
  }

  test("sessionization emits gap-separated sessions (batch-mode check)") {
    import spark.implicits._
    val events = spark.read.parquet(srcDir)
      .as[EventStreams.Event]
    // batch Dataset runs the same flatMapGroupsWithState logic path's
    // grouping; emulate by running sorted-per-user fold directly
    val sessions = EventStreams.sessionize(events, gapMs = 10 * 60 * 1000L)
    // on a batch Dataset, flatMapGroupsWithState executes once per group
    val got = sessions.collect()
    assert(got.nonEmpty)
    // sessions must be internally consistent
    got.foreach { s =>
      assert(!s.session_end.before(s.session_start))
      assert(s.n_events >= 1)
    }
    // per-user event counts are preserved across closed sessions + the
    // open tail session (which batch mode never closes)
    val emitted = got.groupBy(_.user_id).view.mapValues(_.map(_.n_events).sum)
    val total = events.groupByKey(_.user_id).count().collect().toMap
    emitted.foreach { case (u, n) => assert(n <= total(u)) }
  }

  test("a late cross-batch event extends the session backwards, never splits it") {
    import spark.implicits._
    val gapMs = 60 * 1000L
    def ev(id: Long, tMs: Long) =
      EventStreams.Event(id, new java.sql.Timestamp(tMs), 1L, "t", 1.0)
    // batch 1 carries state last=100s; batch 2 delivers a LATE t=70s event
    // (within gap of the carried session) followed by t=150s (within gap
    // of 100s but NOT of 70s): rewinding `last` to 70s would wrongly
    // split and emit session_end < session_start
    val dir = java.nio.file.Files.createTempDirectory("late-ev").toString
    val ckpt = java.nio.file.Files.createTempDirectory("late-ck").toString
    val schema = implicitly[org.apache.spark.sql.Encoder[EventStreams.Event]].schema
    // one file per arrival so maxFilesPerTrigger=1 delivers them as two
    // ordered micro-batches with batch 2's events TOGETHER (sorted 70,150)
    def writeBatch(events: Seq[EventStreams.Event]): Unit =
      events.toDF().coalesce(1).write.mode("append").parquet(dir)
    writeBatch(Seq(ev(1, 100000L)))
    val out = new java.util.concurrent.ConcurrentLinkedQueue[EventStreams.UserSession]()
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(dir).as[EventStreams.Event]
    val q = EventStreams.sessionize(stream, gapMs)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[EventStreams.UserSession], _: Long) =>
        b.collect().foreach(out.add)
      }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      writeBatch(Seq(ev(2, 70000L), ev(3, 150000L)))
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val closed = out.asScala.toList
    // nothing may close: 70s merges backwards (start=70s), 150s is within
    // gap of last=100s — one open session [70s, 150s] with 3 events
    assert(closed.isEmpty,
      s"late event must not split the session: $closed")
  }

  test("windowed counts run unchanged on the RocksDB state store") {
    // at 100 TB/day the default HDFS-backed in-memory state store OOMs
    // on state size; RocksDB spills to local disk and is the provider a
    // real deployment sets. Same query, same results, different backend
    // — pinned here so the operators never grow a hidden dependency on
    // the default provider's semantics (e.g. its looser key ordering)
    withRocksDB {
      val streamed = EventStreams.runToMemory(spark, srcDir, "win_rocks",
        df => EventStreams.windowedCounts(df))
      val batch = EventStreams.windowedCounts(spark.read.parquet(srcDir))
      val bSet = batch.collect().map(_.toString).toSet
      val s = streamed.collect()
      assert(s.nonEmpty, "append-mode output must be non-empty")
      assert(s.forall(r => bSet(r.toString)),
        "RocksDB-backed results must equal the batch computation")
    }
  }

  test("too-late events are dropped AND the drop is accounted in progress") {
    import spark.implicits._
    // the operational contract at 100 TB/day: a watermark is a data-loss
    // policy, so the loss must be observable — stateOperators'
    // numRowsDroppedByWatermark is where ingest monitoring reads it
    val dir = Files.createTempDirectory("late-drop-ev").toString
    val ckpt = Files.createTempDirectory("late-drop-ck").toString
    def ev(id: Long, mins: Int) = EventStreams.Event(id,
      new java.sql.Timestamp(1767225600000L + mins * 60000L), 1L, "t", 1.0)
    def writeBatch(events: Seq[EventStreams.Event]): Unit =
      events.toDF().coalesce(1).write.mode("append").parquet(dir)
    val schema = implicitly[org.apache.spark.sql.Encoder[EventStreams.Event]].schema
    // batch 1 advances the watermark to 120 - 15 = 105min
    writeBatch(Seq(ev(1, 0), ev(2, 120)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("late_drop")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      // batch 2: a 30min event is far below the 105min watermark -> its
      // window [25,35) is long closed; the row must die at the state op
      writeBatch(Seq(ev(3, 30), ev(4, 130)))
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
      // the count is POST-Expand: a 10min/5min sliding window fans each
      // event into 2 window rows, so one late event = 2 dropped state
      // rows — monitoring math must use the fan-out, not raw events
      assert(dropped == 2L,
        s"expected the late event's 2 window rows accounted, got $dropped")
    } finally q.stop()
    // and the late row's window truly never surfaced
    val emitted = spark.table("late_drop")
      .select(col("w_start")).distinct().collect()
      .map(_.getTimestamp(0).getTime)
    assert(!emitted.contains(1767225600000L + 25 * 60000L) &&
      !emitted.contains(1767225600000L + 30 * 60000L))
  }

  test("flatMapGroupsWithState sessions match the SQL window sessionization") {
    import spark.implicits._
    // q33 (window composition) with the same 30-min gap
    val sql = graft.SparkEntry.queries("q33_sessionization")(
        spark, "/root/testdata/sf0.001")
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("session_id"))
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Long]("duration_us"))))
      .toMap
    // stateful operator on the same data; batch mode closes all but the
    // final (open) session per user
    val events = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    val stateful = EventStreams.sessionize(events, gapMs = 30 * 60 * 1000L)
      .collect()
      .groupBy(_.user_id)
      .view.mapValues(_.sortBy(_.session_start.getTime)
        .map(s => (s.n_events.toLong,
          (s.session_end.getTime - s.session_start.getTime) * 1000L)))
      .toMap
    sql.foreach { case (user, sessions) =>
      val closed = sessions.dropRight(1).toSeq // stateful never closes the tail
      val got: Seq[(Long, Long)] =
        stateful.get(user).map(_.toSeq).getOrElse(Seq.empty)
      assert(got.length == closed.length, s"user $user session count")
      got.zip(closed).foreach { case ((n1, d1), (n2, d2)) =>
        assert(n1 == n2, s"user $user n_events")
        // the stateful op tracks Timestamp millis; SQL tracks exact micros
        assert(math.abs(d1 - d2) < 1000L, s"user $user duration $d1 vs $d2")
      }
    }
  }

  test("transformWithState sessions equal the flatMapGroupsWithState sessions") {
    import spark.implicits._
    // the two arbitrary-state APIs must never drift: same closed
    // sessions, bit-identical tuples, over a multi-batch replay on the
    // RocksDB provider (a TWS streaming constraint)
    withRocksDB {
      def run(name: String,
          f: org.apache.spark.sql.Dataset[EventStreams.Event] =>
            org.apache.spark.sql.Dataset[EventStreams.UserSession]) = {
        val schema = spark.read.parquet(srcDir).schema
        val stream = spark.readStream.schema(schema).parquet(srcDir)
          .as[EventStreams.Event]
        val q = f(stream).writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
        spark.table(name).collect().map(_.toString).sorted.toSeq
      }
      val gap = 10 * 60 * 1000L
      val tws = run("sess_tws", ds => EventStreams.sessionizeTws(ds, gap))
      val fmgws = run("sess_fmgws", ds => EventStreams.sessionize(ds, gap))
      assert(tws.nonEmpty, "closed sessions must emit")
      assert(tws == fmgws, "TWS and fMGWS sessions must be identical")
    }
  }

  test("TWS event-time timers flush tail sessions deterministically") {
    import spark.implicits._
    // with a 0s watermark delay, the final watermark W = max(ts); every
    // open tail whose gap horizon (last + gap) lies strictly before W
    // MUST flush via its event-time timer, horizons past W must stay
    // open, and a horizon exactly AT W may land either way (boundary
    // band, not a flake)
    withRocksDB {
      val gap = 10 * 60 * 1000L
      val all = spark.read.parquet(srcDir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[EventStreams.Event].collect().toSeq
      val maxTs = all.map(_.ts.getTime).max
      def sessKey(u: Long, startMs: Long, lastMs: Long, n: Int) =
        (u, startMs, lastMs, n)
      val (closed, tails) = all.groupBy(_.user_id).toSeq.map {
        case (u, evs) =>
          val (c, tail) = EventStreams.sessionFold(
            u, None, evs.sortBy(_.ts.getTime).iterator, gap)
          (c.map(s => sessKey(u, s.session_start.getTime,
            s.session_end.getTime, s.n_events)),
            tail.map(s => sessKey(u, s.start, s.last, s.n)))
      }.unzip
      val mustFlush = tails.flatten.filter { case (_, _, last, _) =>
        last + gap < maxTs }
      val mayFlush = tails.flatten.filter { case (_, _, last, _) =>
        last + gap == maxTs }
      val schema = spark.read.parquet(srcDir).schema
      val stream = spark.readStream.schema(schema).parquet(srcDir)
        .as[EventStreams.Event]
      val q = EventStreams.sessionizeTws(stream, gap,
          tailWatermark = Some("0 seconds"))
        .writeStream.format("memory").queryName("sess_tws_timers")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val emitted = spark.table("sess_tws_timers").collect().map(r =>
        sessKey(r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start").getTime,
          r.getAs[java.sql.Timestamp]("session_end").getTime,
          r.getAs[Int]("n_events"))).toSet
      val floor = closed.flatten.toSet ++ mustFlush
      val ceiling = floor ++ mayFlush
      assert(mustFlush.nonEmpty, "fixture must have flushable tails")
      assert(floor.subsetOf(emitted),
        s"missing ${(floor -- emitted).take(3)} of ${floor.size} expected")
      assert(emitted.subsetOf(ceiling),
        s"unexpected ${(emitted -- ceiling).take(3)}")
    }
  }

  test("TWS timer re-arm: an extended session flushes at its NEW horizon only") {
    import spark.implicits._
    withRocksDB {
      val gapMs = 60 * 1000L
      def ev(id: Long, u: Long, tMs: Long) =
        EventStreams.Event(id, new java.sql.Timestamp(tMs), u, "t", 1.0)
      // batch 1: user 1 @100s -> timer armed at 160s. batch 2: user 1
      // @150s extends the session (re-arm: delete 160s, register 210s)
      // and user 2 @400s pushes the watermark past 210s -> user 1's
      // tail [100s,150s] must flush exactly once with n=2, while user
      // 2's horizon (460s) stays open. This pins the REGISTRATION half
      // of the re-arm (a missing registerTimer emits nothing); a leaked
      // 160s timer is invisible here by design — handleExpiredTimer's
      // horizon guard absorbs stale timers, which is itself the
      // correctness property (a stale fire must never emit n=1).
      val dir = java.nio.file.Files.createTempDirectory("tws-rearm").toString
      val ckpt = java.nio.file.Files.createTempDirectory("tws-rck").toString
      val schema =
        implicitly[org.apache.spark.sql.Encoder[EventStreams.Event]].schema
      def writeBatch(events: Seq[EventStreams.Event]): Unit =
        events.toDF().coalesce(1).write.mode("append").parquet(dir)
      writeBatch(Seq(ev(1, 1L, 100000L)))
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .as[EventStreams.Event]
      val q = EventStreams.sessionizeTws(stream, gapMs,
          tailWatermark = Some("0 seconds"))
        .writeStream.format("memory").queryName("tws_rearm")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
      try {
        q.processAllAvailable()
        writeBatch(Seq(ev(2, 1L, 150000L), ev(3, 2L, 400000L)))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_rearm").collect().map(r =>
        (r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start").getTime,
          r.getAs[java.sql.Timestamp]("session_end").getTime,
          r.getAs[Int]("n_events"))).toSeq
      assert(got == Seq((1L, 100000L, 150000L, 2)),
        s"expected one re-armed flush of user 1's extended tail, got $got")
    }
  }

  test("streaming sessionization over the real stream emits on timeout-free path") {
    import spark.implicits._
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
      .as[EventStreams.Event]
    val q = EventStreams.sessionize(stream, gapMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sessions").collect()
    // closed sessions only (open tails wait for timeout) — emitted ones
    // must have positive counts and ordered bounds
    got.foreach { r =>
      assert(r.getAs[Int]("n_events") >= 1)
    }
  }

  test("token drift signals match the hand-computed integer arithmetic") {
    import spark.implicits._
    // baseline: p(a)=600000, p(b)=400000 (scale 1e6)
    // window [00:00,00:10) s1 "a a c": n=3, oov mass 1 -> 1e6 DIV 3 =
    //   333333; mass = 2*600000 DIV 3 = 400000
    // window [00:10,00:20) s1 "b b b b": n=4, oov 0, mass = 400000
    val baseline = Seq(("a", 600000L), ("b", 400000L)).toDF("token", "p")
    val docs = Seq(
      ("2024-01-01 00:01:00", "s1", "a a c"),
      ("2024-01-01 00:12:00", "s1", "b b b b"))
      .toDF("s", "source", "text")
      .select(to_timestamp($"s").as("ts"), $"source", $"text")
    // batch replay of the same expressions (withWatermark is a no-op)
    val got = EventStreams.tokenDriftStream(docs, baseline)
      .orderBy($"w_start").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("2024-01-01 00:00:00.0", "s1", 3L, 333333L, 400000L),
      ("2024-01-01 00:10:00.0", "s1", 4L, 0L, 400000L)))
  }

  test("streaming token drift (chained stateful aggs) equals the batch replay") {
    import spark.implicits._
    // documents over several windows and two sources, baseline from the
    // first source's early slice — drift emerges in later windows
    val rows = (0 until 120).map { i =>
      val src = if (i % 2 == 0) "s1" else "s2"
      val tok = if (i < 60) s"w${i % 7}" else s"new${i % 11}"
      (f"2024-01-01 ${i / 30}%02d:${(i * 2) % 60}%02d:00", src,
        s"$tok w0 w${i % 5}")
    }
    val docsDir = Files.createTempDirectory("drift-docs").toString
    rows.toDF("s", "source", "text")
      .select(to_timestamp($"s").as("ts"), $"source", $"text")
      .write.mode("overwrite").parquet(docsDir)
    val baseline = EventStreams.tokenBaseline(
      spark.read.parquet(docsDir).filter($"ts" < "2024-01-01 01:00:00"))
    val streamed = EventStreams.runToMemory(spark, docsDir, "tok_drift",
      df => EventStreams.tokenDriftStream(df, baseline,
        windowDur = "30 minutes", watermark = "1 minute"))
    val batch = EventStreams.tokenDriftStream(
      spark.read.parquet(docsDir), baseline, windowDur = "30 minutes")
    assert(streamed.count() > 0,
      "watermark-closed windows must emit through the chained aggregations")
    val bSet = batch.collect().map(_.toString).toSet
    val s = streamed.collect()
    assert(s.forall(r => bSet(r.toString)),
      "every streamed row must equal its batch twin")
  }
}
