package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Continuously-maintained per-user lifetime mart on the Spark 4
  * arbitrary-state API (`transformWithState` + `StatefulProcessor`) —
  * the streaming twin of `Medallion.goldUserStats`, kept incrementally
  * instead of recomputed per batch.
  *
  * Why TWS rather than `flatMapGroupsWithState` (which Sessionize uses):
  * typed per-key `ValueState` with schema evolution, state TTL, and
  * RocksDB-backed stores — the API Spark points streaming state work at
  * going forward; this operator exercises it alongside the FMGWS path so
  * both state surfaces are covered.
  *
  * Money is accumulated in integer CENTS: a double accumulator drifts
  * under re-association across batches, a long cannot (the same reason
  * the batch marts sum DECIMAL(18,2)). State per key is O(1); the
  * emitted row after each batch is the current lifetime aggregate
  * (OutputMode.Update — downstream upserts by user_id).
  */
object StatefulMart {

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserStats(
      user_id: Long, n_events: Long, total_cents: Long,
      first_seen: java.sql.Timestamp, last_seen: java.sql.Timestamp)

  class UserStatsProcessor
      extends StatefulProcessor[Long, UserEvent, UserStats] {

    @transient private var state: ValueState[UserStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserStats](
        "stats", Encoders.product[UserStats], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[UserEvent],
        timerValues: TimerValues): Iterator[UserStats] = {
      var cur =
        if (state.exists()) state.get()
        else UserStats(key, 0L, 0L, null, null)
      rows.foreach { e =>
        cur = UserStats(
          key,
          cur.n_events + 1,
          cur.total_cents + math.round(e.value * 100),
          if (cur.first_seen == null || e.ts.before(cur.first_seen)) e.ts
          else cur.first_seen,
          if (cur.last_seen == null || e.ts.after(cur.last_seen)) e.ts
          else cur.last_seen)
      }
      state.update(cur)
      Iterator.single(cur)
    }
  }

  /** events(user_id, ts, value) stream → per-user lifetime stats stream.
    * Requires the RocksDB state store provider (TWS precondition):
    * set `spark.sql.streaming.stateStore.providerClass` to
    * `...state.RocksDBStateStoreProvider` before starting the query. */
  def userStats(events: DataFrame): Dataset[UserStats] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Dollars view of the cents accumulator (exact: cents/100 in double). */
  def asDollars(stats: DataFrame): DataFrame =
    stats.withColumn("total_value", col("total_cents") / 100.0)
      .drop("total_cents")
}
