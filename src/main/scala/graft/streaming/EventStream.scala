package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming forms of the event operators. The reference is
  * batch-only (SURVEY §2.9) — batch is the parity surface — but the engine's
  * scale path for a continuously-arriving event feed is `readStream` over
  * the same transforms: identical logical plans, incremental execution.
  */
object EventStream {

  /** Event row as read from the events table (ts already converted from
    * nanos — see graft.operators.EventQueries). */
  final case class Event(event_id: Long, user_id: Long, ts_us: Long,
                         event_type: String, value: Double)

  final case class SessionizedEvent(user_id: Long, event_id: Long,
                                    session_seq: Long)

  // public: the state encoder's generated code instantiates it reflectively
  final case class SessionState(sessionSeq: Long, lastTsUs: Long)

  /** Watermarked tumbling-hour aggregation — the streaming twin of
    * EventQueries.eventsHourly. Works unchanged on a batch frame (the
    * watermark is a no-op there), which is how the spec cross-checks it. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(28, 6))).cast(DoubleType).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: md5-fingerprint, first arrival of each distinct
    * payload kept. `dropDuplicatesWithinWatermark` is the load-bearing
    * choice: plain `dropDuplicates("fingerprint")` NEVER evicts state when
    * the event-time column is not part of the key set, so at 100 TB/day the
    * state store grows without bound. The within-watermark variant expires
    * each fingerprint once it falls behind the watermark horizon — the
    * horizon IS the dedup-memory design decision. Works identically on a
    * batch frame modulo state expiry. */
  def streamingDedup(docs: DataFrame, idCol: String, textCol: String,
                     tsCol: String, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("fingerprint", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("fingerprint")
      .select(col(idCol), col("fingerprint"))

  /** Event row with the derived event-time column the watermark rides on. */
  final case class EventTs(event_id: Long, user_id: Long, ts_us: Long,
                           event_type: String, value: Double,
                           event_ts: java.sql.Timestamp)

  /** Stateful sessionization with `flatMapGroupsWithState`: per-user state
    * carries (current session seq, last event time); a >`gapMinutes` gap
    * opens a new session.
    *
    * State is EVICTED via `EventTimeTimeout`: a user's state expires once
    * the watermark passes their last event + session gap (the session can
    * never continue past the gap anyway, so eviction is lossless for
    * in-watermark data; a user returning later simply restarts session
    * numbering — the same bounded-memory contract as streamingDedup's
    * horizon). Without this, idle users' state grows without bound at
    * stream scale. `horizon` is the watermark lateness allowance — NOTE
    * the watermark also means streaming events arriving more than
    * `horizon` behind the max seen event time are dropped as late before
    * the session function runs (the earlier NoTimeout version had no
    * watermark and sessionized every event, at unbounded state cost);
    * batch execution is unaffected. */
  def sessionize(events: Dataset[Event], gapMinutes: Long = 30,
                 horizon: String = "1 hour")
                (implicit spark: SparkSession): Dataset[SessionizedEvent] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L
    // Timeouts never fire in batch execution, and batch GroupState has no
    // watermark to read — only register them on a real stream.
    val streaming = events.isStreaming
    val withTs = events
      .withColumn("event_ts", timestamp_micros(col("ts_us")))
      .as[EventTs]
      .withWatermark("event_ts", horizon)
    withTs.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionizedEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[EventTs], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // Idle past watermark + gap: nothing can join this session any
            // more — drop the state, emit nothing.
            state.remove()
            Iterator.empty
          } else {
            // Micro-batch iterators are unordered within the group: sort by
            // event time before applying the gap rule.
            val batch = it.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
            val out = batch.map { e =>
              val newSession = st.sessionSeq == 0L || e.ts_us - st.lastTsUs > gapUs
              st = SessionState(if (newSession) st.sessionSeq + 1 else st.sessionSeq,
                e.ts_us)
              SessionizedEvent(userId, e.event_id, st.sessionSeq)
            }
            state.update(st)
            if (streaming) {
              // Expire when the gap closes; a timeout must sit strictly
              // ahead of the current watermark (late groups otherwise throw).
              state.setTimeoutTimestamp(
                math.max(st.lastTsUs / 1000L + gapMs,
                  state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }
}
