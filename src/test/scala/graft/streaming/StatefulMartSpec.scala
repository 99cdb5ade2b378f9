package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.Tables

/** The TWS lifetime mart must converge to the batch aggregation — same
  * counts, exact cent totals, same first/last timestamps — after the
  * stream drains, including across multiple micro-batches (state
  * carried in RocksDB between batches is the thing under test).
  */
class StatefulMartSpec extends SparkSpec {

  test("transformWithState user stats converge to the batch aggregate") {
    val src = Files.createTempDirectory("graft-tws-src").toString
    // 4 files × maxFilesPerTrigger=1 ⇒ ≥4 micro-batches through state.
    Tables.t(spark, sfDir, "events")
      .select("user_id", "ts", "value")
      .repartition(4).write.mode("overwrite").parquet(src)

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
      val q = StatefulMart.userStats(stream).toDF()
        .writeStream.format("memory").queryName("tws_user_stats")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-tws-ck").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()

      // Update mode emits one row per touched user per batch — the row
      // with the highest n_events is each user's final state.
      val last = spark.table("tws_user_stats")
        .groupBy("user_id").agg(max(struct(col("n_events"), col("total_cents"),
          col("first_seen"), col("last_seen"))).as("s"))
        .select(col("user_id"), col("s.*"))

      val batch = Tables.t(spark, sfDir, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("b_n"),
          sum(round(col("value") * 100).cast("long")).as("b_cents"),
          min("ts").as("b_first"), max("ts").as("b_last"))

      val joined = last.join(batch, "user_id")
      assert(joined.count() === batch.count(), "user set mismatch")
      val bad = joined.filter(
        col("n_events") =!= col("b_n") ||
          col("total_cents") =!= col("b_cents") ||
          col("first_seen") =!= col("b_first") ||
          col("last_seen") =!= col("b_last")).count()
      assert(bad === 0, "streamed lifetime stats diverge from batch")

      // Dollars view: exact cents/100, matches the batch money sum.
      val dollars = StatefulMart.asDollars(last)
      val badD = dollars.join(
          Tables.t(spark, sfDir, "events").groupBy("user_id")
            .agg((sum(round(col("value") * 100).cast("long")) / 100.0).as("b_val")),
          "user_id")
        .filter(col("total_value") =!= col("b_val")).count()
      assert(badD === 0, "dollars view diverges")
    } finally {
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
