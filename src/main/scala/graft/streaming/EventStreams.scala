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
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = List.newBuilder[UserSession]
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  closed += UserSession(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach(state.update)
            if (timeoutConf != GroupStateTimeout.NoTimeout())
              state.setTimeoutDuration(gapMs)
            closed.result().iterator
          }
      }
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
