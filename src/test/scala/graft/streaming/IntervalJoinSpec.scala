package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Stream-stream interval join must produce the same matches as the
  * equivalent batch interval join over the same bounded data. */
class IntervalJoinSpec extends SparkSpec {

  test("streamed purchase←click interval join equals the batch join") {
    val dir = Files.createTempDirectory("graft-ssj").toString
    Tables.t(spark, sfDir, "events").coalesce(2)
      .write.mode("overwrite").parquet(dir)

    def sourceOf(t: String) =
      Streams.fileSource(spark, dir).filter(col("event_type") === t)

    val joined = Streams.intervalJoin(
      sourceOf("purchase"), sourceOf("click"), "user_id",
      windowSeconds = 3600)
    Streams.runToMemory(joined, "ssj")
    val streamed = spark.table("ssj")
      .select("l_event_id", "r_event_id")

    val ev = Tables.t(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_event_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"))
    val batch = p.join(c,
      col("user_id") === col("r_key") &&
        col("r_ts") >= col("l_ts") - expr("interval 3600 seconds") &&
        col("r_ts") <= col("l_ts"))
      .select("l_event_id", "r_event_id")

    // Streamed output ⊆ batch (append mode may hold back tail rows near
    // the final watermark) and must contain the vast majority.
    assert(streamed.except(batch).count() === 0, "streamed rows not in batch join")
    val batchN = batch.count()
    val streamedN = streamed.count()
    assert(streamedN > 0)
    assert(batchN - streamedN <= batchN / 10,
      s"too many held-back rows: batch=$batchN streamed=$streamedN")
  }

  test("left-outer interval join emits null-match rows only for truly unmatched purchases") {
    val dir = Files.createTempDirectory("graft-ssjo").toString
    Tables.t(spark, sfDir, "events").coalesce(2)
      .write.mode("overwrite").parquet(dir)

    def sourceOf(t: String) =
      Streams.fileSource(spark, dir).filter(col("event_type") === t)

    val joined = Streams.intervalJoin(
      sourceOf("purchase"), sourceOf("click"), "user_id",
      windowSeconds = 3600, joinType = "left_outer")
    Streams.runToMemory(joined, "ssjo")
    val streamed = spark.table("ssjo")

    val ev = Tables.t(spark, sfDir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("l_ts"), col("event_id").as("l_event_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("r_event_id"))
    val batchPairs = p.join(c,
        col("user_id") === col("r_key") &&
          col("r_ts") >= col("l_ts") - expr("interval 3600 seconds") &&
          col("r_ts") <= col("l_ts"))
      .select("l_event_id", "r_event_id")
    val matchedIds = batchPairs.select("l_event_id").distinct()

    // matched stream rows must be real batch matches
    val streamedMatched = streamed.filter(col("r_event_id").isNotNull)
      .select("l_event_id", "r_event_id")
    assert(streamedMatched.except(batchPairs).count() === 0)
    // null-match rows may only appear for purchases with NO in-window click
    val streamedNulls = streamed.filter(col("r_event_id").isNull)
      .select("l_event_id")
    assert(streamedNulls.join(matchedIds, Seq("l_event_id"), "semi").count() === 0,
      "outer join emitted a null row for a purchase that has matches")
    assert(streamedNulls.count() > 0,
      "corpus has unmatched purchases; none were emitted")
  }
}
