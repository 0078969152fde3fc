package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Structured Streaming over the `events` table (north-star extension;
  * the reference has no streaming — SURVEY.md §2.4).
  *
  * Every pipeline here is the streaming twin of a batch operator in
  * `graft.operators.Events`, so the DuckDB-verified batch results define
  * the expected output (checked in StreamingSpec by running the stream to
  * completion over the same fixture files).
  *
  * Scale design: watermark + windowed aggregation is incremental state,
  * partitioned by group key across the cluster; sessionization keeps one
  * GroupState per user, partitioned by user_id — the same shuffle key as
  * the batch window, so state stays local once partitioned. File-source
  * streaming reads new parquet files per micro-batch — at 100 TB this is
  * the standard "streaming backfill" pattern over an append-only lake.
  */
object EventStreams {

  /** File-source stream over the fixture events dir with ts normalized to
    * µs TimestampType (same nanosAsLong handling as Tables.events).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val raw = StreamStaging.readFileStream(spark, s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case TimestampType => raw
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Tumbling 1-day window per event type with a 1-hour watermark —
    * streaming twin of the `e_daily_by_type` batch query.
    */
  def dailyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("day"), col("event_type"), col("n"), col("sum_value"))

  /** Stream-static join: the event stream enriched against a static
    * dimension snapshot (per micro-batch, the standard lookup-enrichment
    * pattern; the static side is broadcast when small). Aggregates events
    * per dimension attribute.
    */
  def enrichedCounts(events: DataFrame, userDim: DataFrame): DataFrame =
    events
      .join(org.apache.spark.sql.functions.broadcast(userDim), Seq("user_id"))
      .groupBy(col("cohort"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /** Sliding 1-day window, 12-hour slide, per event type — each event
    * lands in two overlapping windows (streaming and batch use the same
    * `window()` semantics, so the batch run of this function is the spec).
    */
  def slidingByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "12 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"))

  /** Stream-stream interval join — the streaming twin of the batch
    * `e_range_join`: (purchase, click) pairs of the same user where the
    * click happened within the 30 minutes before the purchase. Both sides
    * carry watermarks and the join condition bounds event time on both
    * ends, so Spark can expire join state: each side retains only the
    * watermark-delay + interval window, partitioned by user — the
    * standard bounded-state stream-stream join layout.
    */
  def purchaseClicks30m(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicks,
      expr("""p_user = c_user AND
              c_ts <= p_ts AND c_ts > p_ts - interval 30 minutes"""))
  }

  /** Watermarked exact-once dedup of an at-least-once event source:
    * duplicate `event_id` deliveries are dropped as long as they arrive
    * within the watermark horizon of the first copy, and state per id is
    * EVICTED once the watermark passes — bounded state on an unbounded
    * stream, which the unbounded `DocumentStreams.firstSeen` variant
    * (no event time on documents) cannot have. This is the standard
    * ingest-front dedup for replayed/acked sources (Kafka at-least-once,
    * file redelivery).
    */
  def dedupEvents(events: DataFrame, horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("event_id")

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long)
  final case class SessionAgg(user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long)
  final case class SessState(sessionId: Long, nEvents: Long,
      startUs: Long, lastUs: Long)

  val GapUs: Long = 30L * 60 * 1000 * 1000 // 30-minute inactivity gap

  final case class EvT(user_id: Long, ts: java.sql.Timestamp, event_id: Long)
  final case class TState(sessionId: Long, nEvents: Long,
      startUs: Long, lastUs: Long, open: Boolean)

  /** Production sessionization: emit each session EXACTLY ONCE — when a
    * successor event closes it, or when the event-time watermark passes
    * `lastUs + gap` (EventTimeTimeout flush, fired by Spark's no-data
    * micro-batch once the watermark advances). Unlike [[sessionize]]
    * (which re-emits the open session every trigger so a finite fixture
    * test can see it), this is the shape a downstream consumer wants:
    * append-only, one final row per session, no retractions.
    *
    * A timed-out user keeps its session COUNTER in state (open=false)
    * instead of dropping state entirely, so a user who returns after a
    * long absence continues session numbering exactly like the batch
    * window — at the cost of one tiny record per ever-seen user, the
    * same state class every keyed sessionizer carries.
    */
  def sessionizeFinal(events: Dataset[EvT], gapUs: Long = GapUs,
      horizon: String = "0 seconds"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    // EventTimeTimeout requires a watermark on the input; apply it here
    // (mirroring dedupEvents) so a caller without one doesn't hit an
    // AnalysisException at runtime. `horizon` = allowed event lateness —
    // but a caller that already set its own (possibly longer) lateness
    // window keeps it; overriding with the 0-second default would
    // silently drop late events the caller asked to wait for.
    val hasWatermark = events.queryExecution.analyzed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => true
      case _ => false
    }
    val marked = if (hasWatermark) events else events.withWatermark("ts", horizon)
    marked.groupByKey(_.user_id)
      .flatMapGroupsWithState[TState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev2], state: GroupState[TState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap: flush the open session, keep
            // the counter for correct numbering if the user returns
            val t = state.get
            state.update(t.copy(open = false))
            Iterator.single(SessionAgg(userId, t.sessionId, t.nEvents, t.startUs, t.lastUs))
          } else {
            val sorted = evs.map(e => (unixMicros(e.ts), e.event_id))
              .toSeq.sortBy(identity).map(_._1)
            val closed = List.newBuilder[SessionAgg]
            var cur = state.getOption.getOrElse(TState(0, 0, 0, 0, open = false))
            sorted.foreach { us =>
              if (cur.open && us - cur.lastUs <= gapUs)
                cur = cur.copy(nEvents = cur.nEvents + 1, lastUs = us)
              else {
                if (cur.open)
                  closed += SessionAgg(userId, cur.sessionId, cur.nEvents,
                    cur.startUs, cur.lastUs)
                cur = TState(cur.sessionId + 1, 1, us, us, open = true)
              }
            }
            state.update(cur)
            // flush when the watermark passes the inactivity gap
            state.setTimeoutTimestamp((cur.lastUs + gapUs) / 1000L)
            closed.result().iterator
          }
      }
  }

  private type Ev2 = EvT
  private def unixMicros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Stateful sessionization with flatMapGroupsWithState — streaming twin
    * of the `e_session_stats` batch query (30-minute gap). Emits a session
    * whenever a new event closes it; flushes the open session on timeout.
    *
    * State is one small record per user; the shuffle key (user_id) matches
    * the batch window partitioning.
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessState], SessionAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[List[SessState]]) =>
          // fixture streams arrive as one file-batch per user group, so we
          // sort within the group; a production stream would rely on
          // watermarked event-time ordering instead. (ts_us, event_id) is
          // the same total order the batch sessionize windows use.
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var sessions = state.getOption.getOrElse(Nil)
          var cur = sessions.headOption
          val closed = List.newBuilder[SessionAgg]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts_us - s.lastUs <= GapUs =>
                cur = Some(s.copy(nEvents = s.nEvents + 1, lastUs = e.ts_us))
              case Some(s) =>
                closed += SessionAgg(userId, s.sessionId, s.nEvents, s.startUs, s.lastUs)
                cur = Some(SessState(s.sessionId + 1, 1, e.ts_us, e.ts_us))
              case None =>
                cur = Some(SessState(1, 1, e.ts_us, e.ts_us))
            }
          }
          // keep the open session in state; emit it too (fixture streams
          // end, so the trailing session must be visible to the test)
          sessions = cur.toList
          state.update(sessions)
          closed.result().iterator ++ cur.map(s =>
            SessionAgg(userId, s.sessionId, s.nEvents, s.startUs, s.lastUs)).iterator
      }
  }
}
