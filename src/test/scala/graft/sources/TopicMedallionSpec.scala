package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.Tables
import graft.streaming.Streams

/** The reference's ingestion spine — generator → topic → bronze —
  * end-to-end through the DSv2 connector: events are produced into the
  * topic log as JSON envelopes (key = user id, Kafka-style), consumed
  * with `readStream.format("graft-topic")`, parsed against the declared
  * schema, and landed as checkpointed bronze. The exactly-once restart
  * property must hold across the WHOLE pipeline, not just the source. */
class TopicMedallionSpec extends SparkSpec {
  import spark.implicits._

  test("events flow producer → topic → JSON decode → bronze exactly once") {
    val root = Files.createTempDirectory("graft-spine").toString
    val topic = root + "/events_topic"
    val bronze = root + "/bronze"
    val ck = root + "/ck"

    // produce: each event as (key = user_id, value = JSON envelope)
    val events = Tables.t(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    val n = events.count()
    TopicLog.append(spark,
      events.select(
        $"user_id".cast("string").as("key"),
        to_json(struct(events.columns.map(col): _*)).as("value"),
        $"ts"),
      topic, nPartitions = 4)

    // consume through the connector, decode, land bronze
    def drain(): Unit = {
      val parsed = spark.readStream.format(TopicLogSource.Name)
        .option("path", topic).load()
        .select(from_json($"value", Streams.eventSchema).as("e"))
        .select("e.*")
      val q = graft.operators.Medallion.bronze(parsed)
        .writeStream.format("parquet")
        .option("path", bronze).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    val landed = spark.read.parquet(bronze)
    assert(landed.count() === n)
    assert(landed.columns.contains("ingestion_ts"))
    // decode really round-tripped typed columns
    val orig = events.select("event_id", "event_type", "value")
      .as[(Long, String, Double)].collect().toSet
    val got = landed.select("event_id", "event_type", "value")
      .as[(Long, String, Double)].collect().toSet
    assert(got === orig)
    // restart: committed offsets ⇒ no duplicates through the full spine
    drain()
    assert(spark.read.parquet(bronze).count() === n)
  }
}
