package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` table shape.
  *
  * The reference is batch-only (SURVEY §2.2: "streaming — none"), so this
  * is a capability extension, not parity work: the same event schema can
  * be processed incrementally with watermark-bounded state. Each query
  * here also runs identically on a batch DataFrame — the tests exploit
  * that equivalence.
  */
object EventStreams {

  /** Sliding-window event counts with late-data tolerance. State size is
    * bounded by (watermark horizon / slide) x |event_type| — safe at any
    * input rate.
    */
  def windowedCounts(
      events: DataFrame,
      windowDur: String = "10 minutes",
      slide: String = "5 minutes",
      watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("total_value"))

  /** Native session_window aggregation — the DECLARATIVE sessionization
    * (vs [[sessionize]]'s explicit fMGWS state), identical over a batch
    * frame and a watermarked stream. The session extends while the next
    * event is within OR AT the gap boundary (inclusive — pinned in
    * RelationalSpec); q69 is the batch/oracle gate and the streaming
    * spec pins stream-emitted rows == the batch computation. In
    * streaming, state is one in-flight session per active user inside
    * the watermark horizon — bounded by arrival rate x horizon, the
    * same property that makes [[dedupStream]] viable at 100 TB/day; the
    * built-in session store also merges cross-batch (late events land
    * in their session without custom backwards-extension code).
    */
  def sessionWindowAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"),
        col("session_value"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(start: Long, last: Long, n: Int, total: Double)

  final case class UserSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  /** Gap-based sessionization with explicit state — the
    * `flatMapGroupsWithState` pattern for custom state the built-in
    * windows can't express. Emits a session when a gap larger than
    * `gapMs` is observed, or when the state timer expires.
    *
    * `timeoutConf` defaults to NoTimeout (open tail sessions never close),
    * which is the right mode for a synchronous drain
    * (`processAllAvailable`): with ProcessingTimeTimeout, Spark keeps
    * scheduling "cleaning up state" no-data microbatches until the timer
    * horizon, so a drain call never returns. Pass ProcessingTimeTimeout
    * for a continuously-running deployment where tails must flush.
    */
  def sessionize(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      timeoutConf: GroupStateTimeout = GroupStateTimeout.NoTimeout())
      : Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, timeoutConf) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s =>
              UserSession(userId, new Timestamp(s.start), new Timestamp(s.last),
                s.n, s.total)).toList
            state.remove()
            out.iterator
          } else {
            val (closed, cur) =
              sessionFold(userId, state.getOption, rows, gapMs)
            cur.foreach(state.update)
            if (timeoutConf != GroupStateTimeout.NoTimeout())
              state.setTimeoutDuration(gapMs)
            closed.iterator
          }
      }
  }

  /** Pure per-batch session fold shared by [[sessionize]] (fMGWS) and
    * [[SessionizeProcessor]] (TWS) — single-sourced so the two state
    * APIs cannot drift on merge/close rules. A LATE cross-batch event
    * (t before the carried state) extends the session backwards, never
    * rewinds `last` — rewinding would make the next in-order event see
    * a false gap and wrongly split the session (and emit session_end <
    * session_start).
    */
  private[streaming] def sessionFold(
      userId: Long,
      prior: Option[SessionState],
      rows: Iterator[Event],
      gapMs: Long): (List[UserSession], Option[SessionState]) = {
    val sorted = rows.toSeq.sortBy(_.ts.getTime)
    var cur = prior
    val closed = List.newBuilder[UserSession]
    for (e <- sorted) {
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last <= gapMs =>
          cur = Some(s.copy(start = math.min(s.start, t),
            last = math.max(s.last, t), n = s.n + 1,
            total = s.total + e.value))
        case Some(s) =>
          closed += UserSession(userId, new Timestamp(s.start),
            new Timestamp(s.last), s.n, s.total)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    (closed.result(), cur)
  }

  /** [[sessionize]] on Spark 4's `transformWithState` — the
    * arbitrary-state API that replaces `flatMapGroupsWithState` going
    * forward (typed per-key state handles, timers, TTL, and state
    * evolution the old API lacks). Same session semantics, same
    * late-event backwards-extension rule; the spec pins its output
    * EQUAL to the fMGWS path so the two state APIs can never drift.
    * Requires the RocksDB state store provider in streaming mode (a
    * TWS constraint — and the provider a 100 TB/day deployment sets
    * anyway).
    */
  final class SessionizeProcessor(gapMs: Long, useTimers: Boolean = false)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserSession] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[SessionState] = _
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserSession] = {
      val prior = if (state.exists()) Option(state.get()) else None
      val (closed, cur) = sessionFold(userId, prior, rows, gapMs)
      cur.foreach { s =>
        state.update(s)
        if (useTimers) {
          // one live timer per key: re-arm at the new gap horizon
          prior.filter(_.last != s.last)
            .foreach(p => getHandle.deleteTimer(p.last + gapMs))
          getHandle.registerTimer(s.last + gapMs)
        }
      }
      closed.iterator
    }
    // event-time timer: the watermark passed last+gap with no new rows
    // for this key — the open tail can never extend again; flush it
    override def handleExpiredTimer(userId: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[UserSession] =
      if (state.exists() &&
          state.get().last + gapMs == expiredTimerInfo.getExpiryTimeInMs) {
        val s = state.get()
        state.clear()
        Iterator.single(UserSession(userId, new Timestamp(s.start),
          new Timestamp(s.last), s.n, s.total))
      } else Iterator.empty // stale timer from a superseded session
  }

  /** @param tailWatermark when set, the input is watermarked on `ts`
    *   and an EVENT-TIME TIMER per key flushes the open tail session
    *   once the watermark passes its gap horizon — the piece fMGWS
    *   could only approximate with processing-time timeouts (which
    *   never fire on a synchronous drain and are wall-clock dependent);
    *   TWS timers are event-time deterministic: same data, same flushed
    *   tails, on any machine at any speed. The watermark is also a
    *   LATENESS BOUND: events arriving more than this delay behind the
    *   stream's max timestamp are dropped BEFORE the processor (the
    *   standard EventTime contract), so the unbounded backwards
    *   extension the unwatermarked path performs only applies within
    *   the delay — pick it as the out-of-orderness you must absorb.
    */
  def sessionizeTws(
      events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      tailWatermark: Option[String] = None): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val src = tailWatermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionizeProcessor(gapMs, useTimers = tailWatermark.isDefined),
        if (tailWatermark.isDefined)
          org.apache.spark.sql.streaming.TimeMode.EventTime()
        else org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Streaming exact deduplication — the incremental form of
    * [[graft.operators.Dedup.keepFirst]]: the first event per content
    * key wins, duplicates arriving later are dropped. State holds one
    * entry per distinct key inside the watermark horizon
    * (`dropDuplicatesWithinWatermark`), so memory is bounded by
    * arrival-rate x horizon, not by stream lifetime — the property that
    * makes streaming ingest dedup viable at 100 TB/day. The content key
    * is an md5 over a JSON encoding of the key columns (never the
    * payload) with nulls kept explicit, so (a, NULL) and (NULL, a) are
    * distinct keys — the same null semantics as the batch operator's
    * distinct().
    */
  /** Null-faithful content key: JSON keeps nulls explicit and field
    * positions named, so (a, NULL) vs (NULL, a) hash apart.
    */
  def contentKey(keyCols: Seq[String]): org.apache.spark.sql.Column =
    md5(to_json(struct(keyCols.map(col): _*),
      Map("ignoreNullFields" -> "false")))

  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .withColumn("_content_key", contentKey(keyCols))
      .dropDuplicatesWithinWatermark("_content_key")
      .drop("_content_key")

  /** Stream-static enrichment join + windowed rollup: the standard
    * "attach dimension attributes at ingest" shape. The static side is
    * broadcast — a stream-static join keeps NO join state (the dimension
    * is re-planned per microbatch, so slowly-changing dims pick up
    * changes on the next batch), and the only stateful operator is the
    * watermarked window aggregate. At 100 TB/day the stream side never
    * shuffles for the join; only the (window, dimension-key) aggregate
    * rows do.
    */
  def enrichedWindowedTotals(
      events: DataFrame,
      dim: DataFrame,
      joinKey: String = "user_id",
      dimCol: String = "tier",
      windowDur: String = "10 minutes",
      watermark: String = "15 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim.select(col(joinKey), col(dimCol))), Seq(joinKey))
      .groupBy(window(col("ts"), windowDur), col(dimCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col(dimCol), col("n"), col("total_value"))

  /** Stream-stream interval join: pair each left event with right-side
    * events for the same user within `[ts, ts + horizon]` — the
    * view-to-click attribution shape. Both sides carry watermarks and
    * the join condition bounds event time in BOTH directions, so Spark
    * can expire join state: memory is (rate x (watermark + horizon)),
    * not stream lifetime. Inner join in append mode — rows emit once
    * both sides' watermarks pass the match window.
    */
  /** @param joinType "inner" emits matches as they arrive;
    *   "left_outer" additionally emits each unmatched left row with
    *   NULL right columns — but only once the watermark proves no
    *   in-horizon right row can still arrive (state-clean null
    *   emission, the semantics a 100 TB/day attribution pipeline
    *   needs: "this view NEVER converted", not "hasn't yet");
    *   "full_outer" emits watermark-proven unmatched rows from BOTH
    *   sides (views that never converted AND clicks with no
    *   attributable view — the orphan-click audit), under the same
    *   bounded-state discipline: both sides' state still expires at
    *   (rate x (watermark + horizon)).
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      userCol: String = "user_id",
      horizon: String = "10 minutes",
      watermark: String = "15 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(col(userCol).as("l_user"), col("ts").as("l_ts"),
        col("event_id").as("l_event_id"))
    val r = right.withWatermark("ts", watermark)
      .select(col(userCol).as("r_user"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"), col("value").as("r_value"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"),
      joinType)
      // full_outer rows unmatched on the left carry the user only in
      // r_user; coalesce so user_id is total for every join type
      .select(coalesce(col("l_user"), col("r_user")).as("user_id"),
        col("l_event_id"),
        col("r_event_id"), col("l_ts"), col("r_ts"), col("r_value"))
  }

  /** Exactly-once parquet sink via foreachBatch: each micro-batch lands
    * in its own `_batch_id=` partition with DYNAMIC partition overwrite,
    * so a replayed batch (checkpoint recovery re-delivers the last
    * uncommitted batch at-least-once) overwrites its own partition
    * instead of appending duplicates — idempotent writes on top of
    * replayed delivery is the standard exactly-once recipe for sinks
    * without transactions. The spec proves it by deleting the commit
    * marker and restarting.
    */
  def idempotentParquetSink(
      df: DataFrame,
      outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // per-write option, NOT a session conf set: scoping dynamic
        // overwrite to this write leaves every other overwrite in the
        // session with the static semantics it expects
        batch.withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id")
          .parquet(outDir)
      }

  /** Streaming INCREMENTAL ROLLUP MAINTENANCE via foreachBatch — the
    * q74 mergeable-aggregate-state pattern run continuously: each
    * micro-batch partial-aggregates (event_type -> count, cents total)
    * and merges into a versioned state table, so the rollup is always
    * current WITHOUT ever rescanning history — per batch the work is
    * (batch partial + state-table merge), state-table-sized, not
    * stream-lifetime-sized. Exactly-once without transactions, by
    * high-water mark: state version v=N is a pure function of version
    * N-1 plus batch N, written under its own `v=<batchId>` directory;
    * a replayed batch (commit-marker loss re-delivers at-least-once)
    * finds its version already committed and SKIPS the merge. The
    * commit marker is the sink's OWN `_GRAFT_COMMIT` file written
    * after the parquet job returns — never the committer's optional
    * _SUCCESS, which marksuccessfuljobs=false (standard on object
    * stores) silently disables, and with it the whole idempotence
    * story. Readers take the highest committed version, so a crash
    * mid-write leaves the previous version intact and readable. Old
    * versions are pruned past a small retention window. Values
    * aggregate as integer cents — replay equality is exact, never
    * float-sum-order luck.
    *
    * Version ids are the CHECKPOINT's batch ids: a stateDir carrying
    * versions newer than the current batch means the checkpoint was
    * reset against a kept state table — merging would silently pin
    * readers to the stale lineage (and retention would delete the new
    * writes), so the sink fails fast instead.
    */
  def rollupMaintenanceSink(
      events: DataFrame,
      stateDir: String,
      checkpointDir: String,
      keepVersions: Int = 3): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(stateDir)
        val fs = root.getFileSystem(
          spark.sessionState.newHadoopConf())
        val vDir = new org.apache.hadoop.fs.Path(root, s"v=$batchId")
        val done = new org.apache.hadoop.fs.Path(vDir, commitMarker)
        if (!fs.exists(done)) {
          val stale = rollupVersions(fs, root).filter(_._1 > batchId)
          require(stale.isEmpty,
            s"rollup stateDir $stateDir holds versions " +
              s"${stale.map(_._1).mkString(",")} newer than batch $batchId " +
              "— it belongs to a different checkpoint lineage. Point the " +
              "sink at a fresh stateDir or restore the matching checkpoint.")
          val partial = batch
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(round(col("value") * 100, 0).cast("long")).as("cents"))
          val merged = latestRollupState(spark, stateDir, batchId) match {
            case Some(prev) => prev.unionByName(partial)
              .groupBy(col("event_type"))
              .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
            case None => partial
          }
          // state tables are dictionary-sized; one file keeps the
          // version listing cheap
          merged.coalesce(1).write.mode("overwrite").parquet(vDir.toString)
          fs.create(done, true).close() // commit AFTER the data is down
          rollupVersions(fs, root).dropRight(keepVersions)
            .foreach { case (_, p) => fs.delete(p, true) }
        }
      }

  private val commitMarker = "_GRAFT_COMMIT"

  private def rollupVersions(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .flatMap { s =>
        val id = s.getPath.getName.stripPrefix("v=").toLongOption
        id.filter(_ => fs.exists(
          new org.apache.hadoop.fs.Path(s.getPath, commitMarker)))
          .map(_ -> s.getPath)
      }
      .sortBy(_._1)

  /** The newest complete rollup state strictly before `beforeBatch`
    * (None => all versions; Some(id) bounds recovery reads so a replay
    * of batch N merges from N-1's state, never its own half-written
    * output).
    */
  def latestRollupState(
      spark: SparkSession,
      stateDir: String,
      beforeBatch: Long = Long.MaxValue): Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(stateDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    rollupVersions(fs, root).filter(_._1 < beforeBatch).lastOption
      .map { case (_, p) => spark.read.parquet(p.toString) }
  }

  /** Static token baseline for [[tokenDriftStream]]: scaled floor-quotient
    * probabilities `p(t) = count(t) * scale DIV total` over a reference
    * corpus — the [[graft.operators.TextAnalysis.sourceDriftMatrix]]
    * integer discipline, as a (token, p) dictionary frame.
    */
  def tokenBaseline(
      docs: DataFrame,
      textCol: String = "text",
      scale: Long = 1000000L): DataFrame = {
    val toks = docs
      .filter(col(textCol).isNotNull && col(textCol) =!= "")
      .select(explode(split(col(textCol), " ")).as("token"))
    toks.groupBy(col("token")).agg(count(lit(1)).as("__c"))
      .crossJoin(broadcast(toks.agg(count(lit(1)).as("__n"))))
      .select(col("token"), expr(s"(__c * ${scale}L) DIV __n").as("p"))
  }

  /** Streaming corpus-quality monitor — per (event-time window, source),
    * two integer-exact drift signals against a static baseline
    * dictionary:
    *   - `oov_ppm`: mass (parts-per-`scale`) of tokens absent from the
    *     baseline vocabulary — THE crawler-drift/spam canary;
    *   - `baseline_mass`: mean baseline probability of the observed
    *     tokens — drops when the stream's distribution shifts even
    *     inside the known vocabulary.
    * Both are sums of per-row terms with one final floor division, so a
    * batch replay of the same expressions is bit-identical
    * (spec-pinned).
    *
    * Plan shape — CHAINED STATEFUL AGGREGATIONS (Spark 3.5+): stateful
    * agg #1 counts (window, source, token); a stateless broadcast join
    * attaches baseline probabilities (no join state, dimension re-reads
    * per micro-batch); stateful agg #2 re-windows via `window_time` and
    * collapses to one row per (window, source). State is bounded by
    * (windows in watermark) x vocabulary, and the output emits once the
    * watermark closes the window — the monitoring dashboard shape. At
    * 100 TB/day the token stream shuffles once for the count and the
    * rollup moves dictionary-sized rows only.
    */
  def tokenDriftStream(
      docs: DataFrame,
      baseline: DataFrame,
      scale: Long = 1000000L,
      windowDur: String = "10 minutes",
      watermark: String = "15 minutes"): DataFrame = {
    val toks = docs
      .filter(col("text").isNotNull && col("text") =!= "")
      .withWatermark("ts", watermark)
      .select(col("ts"), col("source"),
        explode(split(col("text"), " ")).as("__t"))
    val counts = toks
      .groupBy(window(col("ts"), windowDur), col("source"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    counts
      .join(broadcast(baseline.select(col("token").as("__t"),
        col("p").as("__pb"))), Seq("__t"), "left")
      .groupBy(window(window_time(col("window")), windowDur), col("source"))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(when(col("__pb").isNull, col("__c")).otherwise(lit(0L)))
          .as("__oov"),
        sum(col("__c") * coalesce(col("__pb"), lit(0L))).as("__mass"))
      .select(col("window.start").as("w_start"),
        col("window.end").as("w_end"), col("source"), col("n_tokens"),
        expr(s"(__oov * ${scale}L) DIV n_tokens").as("oov_ppm"),
        expr("__mass DIV n_tokens").as("baseline_mass"))
  }

  /** Run a streaming query over a parquet directory and collect the final
    * result via the memory sink (synchronous, for tests/demos).
    */
  def runToMemory(
      spark: SparkSession,
      srcDir: String,
      name: String,
      transform: DataFrame => DataFrame,
      outputMode: String = "append"): DataFrame = {
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = transform(stream).writeStream
      .format("memory").queryName(name).outputMode(outputMode).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
