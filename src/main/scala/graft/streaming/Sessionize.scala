package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization (beyond-reference streaming operator: the
  * reference has no session windows — SURVEY §2.9 end note — but a
  * training-data event pipeline needs them).
  *
  * Two implementations with identical semantics:
  *  - batch: lag-window new-session flags + running sum of flags as the
  *    session id — two window passes over (user_id, ts), shuffle keyed on
  *    user_id, no state store; SQL-expressible, so the DuckDB oracle can
  *    verify it exactly.
  *  - streaming: flatMapGroupsWithState with event-time timeout — open
  *    sessions live in the state store keyed by user, close when the
  *    watermark passes last_event + gap. State per key is O(1).
  */
object Sessionize {

  /** Batch sessionization: session = run of events per user with gaps
    * < `gapMinutes` between consecutive events. */
  def sessionsBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val flagged = events
      .withColumn("_prev_ts", lag("ts", 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("_prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum("_new_session").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("user_id", "session_seq")
      .agg(
        min("ts").as("session_start"),
        max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
  }

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(start: Long, last: Long, n: Int, total: Double)
  final case class ClosedSession(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Streaming sessionization: requires a watermark on `ts` upstream.
    * Sessions are emitted when the event-time watermark passes
    * last-event + gap (the open session stays in the state store). */
  def sessionsStreaming(events: Dataset[SessionEvent], gapMinutes: Int)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def update(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[OpenSession]): Iterator[ClosedSession] = {
      def close(s: OpenSession) = ClosedSession(
        userId, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
        s.n, s.total)
      if (state.hasTimedOut) {
        val out = state.getOption.map(close).iterator
        state.remove()
        out
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var open = state.getOption
        val closed = Seq.newBuilder[ClosedSession]
        sorted.foreach { e =>
          val t = e.ts.getTime
          open match {
            case Some(s) if t - s.last <= gapMs =>
              open = Some(s.copy(last = math.max(s.last, t), n = s.n + 1,
                total = s.total + e.value))
            case Some(s) =>
              closed += close(s)
              open = Some(OpenSession(t, t, 1, e.value))
            case None =>
              open = Some(OpenSession(t, t, 1, e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last + gapMs)
        }
        closed.result().iterator
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
