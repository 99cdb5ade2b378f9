package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val fixture = Seq(
    // user 1: two sessions split by a 40-minute gap (gap = 30 min)
    (1L, ts("2024-01-01 10:00:00"), 1.0),
    (1L, ts("2024-01-01 10:10:00"), 2.0),
    (1L, ts("2024-01-01 10:50:00"), 3.0),
    // user 2: one session
    (2L, ts("2024-01-01 09:00:00"), 5.0))

  test("batch sessionization splits on gaps > threshold") {
    val out = Sessionize.sessionsBatch(
      fixture.toDF("user_id", "ts", "value").withColumn("event_id", lit(0L)),
      gapMinutes = 30)
    val byUser = out.orderBy("user_id", "session_start")
      .select("user_id", "n_events", "total_value")
      .as[(Long, Long, Double)].collect().toSeq
    assert(byUser === Seq((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 5.0)))
  }

  test("streaming sessionization closes sessions once the watermark passes the gap") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    // Two files processed as separate micro-batches: the second file's
    // late-hour event advances the watermark far past user 1's sessions.
    val dir = Files.createTempDirectory("graft-sess").toString
    fixture.toDF("user_id", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((9L, ts("2024-01-01 23:00:00"), 0.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/b2")

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*")
      .withWatermark("ts", "1 second")
      .as[Sessionize.SessionEvent]

    val q = Sessionize.sessionsStreaming(src, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val closed = spark.table("sessions")
      .select("user_id", "n_events", "total_value")
      .as[(Long, Int, Double)].collect().toSet
    // All of user 1/2's sessions closed (watermark reached 23:00); user
    // 9's session is still open in state — append mode never emitted it.
    assert(closed.contains((1L, 2, 3.0)))
    assert(closed.contains((1L, 1, 3.0)))
    assert(closed.contains((2L, 1, 5.0)))
    assert(!closed.exists(_._1 == 9L))
  }

  test("built-in session_window agrees with the custom sessionizer on a fixture") {
    // Two independent implementations of the same semantics must agree
    // (timestamps chosen away from exact-gap boundaries, where the
    // built-in's sub-second precision and the custom path's whole-second
    // diff legitimately differ — documented trade).
    import org.apache.spark.sql.functions._
    val t0 = 1704067200000L // 2024-01-01 00:00:00 UTC
    def ts(minutes: Long) = new java.sql.Timestamp(t0 + minutes * 60000L)
    val df = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 1.0), (1L, ts(45), 2.0), // gap>30 splits
      (2L, ts(5), 5.0),                                        // singleton
      (3L, ts(0), 1.0), (3L, ts(29), 1.0), (3L, ts(58), 1.0)  // chained <30
    ).toDF("user_id", "ts", "value")

    val custom = Sessionize.sessionsBatch(df, gapMinutes = 30)
      .select("user_id", "session_start", "n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val builtin = df
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(custom === builtin)
    assert(custom.map(_._1) === Set(1L, 2L, 3L))
    assert(custom.count(_._1 == 1L) === 2) // the >30-minute gap split
  }
}
