package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization over the events stream: a session ends after a 30-min
  * inactivity gap.
  *
  * Batch form: lag + running-sum-of-new-session-flags window — one
  * shuffle on user_id, SQL-oracle-checkable.
  *
  * Streaming form: `flatMapGroupsWithState` holding one open session per
  * user — the custom-state operator pattern for unbounded streams where
  * the window trick is impossible (state is bounded by active users, not
  * history).
  */
object Sessionize {

  val GapSeconds = 1800L

  /** Batch sessionization: (user_id, session_id, n_events, session_start,
    * session_end). Deterministic: events are totally ordered per user by
    * (ts, event_id). */
  def batch(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // integer micros via the shared helper — no double round-trip
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          graft.functions.Scalars.epochMicros(col("ts")) -
            graft.functions.Scalars.epochMicros(col("prev_ts")) >
            GapSeconds * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  final case class Event(user_id: Long, ts: Timestamp)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(user_id: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp)

  /** Streaming sessionization: buffers one open session per user in
    * state; emits a session when a later event arrives past the gap (or
    * on state timeout in a continuous deployment). */
  def sessionizeStream(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var cur = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.end > GapSeconds * 1000 =>
                closed += Session(user, s.n, new Timestamp(s.start), new Timestamp(s.end))
                cur = Some(SessionState(t, t, 1))
              case Some(s) =>
                cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
