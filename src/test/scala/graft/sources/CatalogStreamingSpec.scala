package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Versioned

/** Streaming through the DSv2 catalog (the reference's bronze shape —
  * a streaming write addressed by TABLE NAME, `bronze_ingest.py:
  * 173-183`): `writeStream…toTable("cat.ns.t")` lands exactly-once
  * micro-batch commits through the V1-fallback sink, and
  * `readStream.table("cat.ns.t")` is the table's change feed,
  * row-equal to `changesSince` — no path addressing anywhere. */
class CatalogStreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-catstream-wh").toString
    spark.conf.set("spark.sql.catalog.grafts",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.grafts.warehouse", w)
    w
  }

  private def sql(s: String) = { warehouse; spark.sql(s) }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("writeStream.toTable is exactly-once across checkpoint restarts " +
      "and equals the batch result") {
    sql("CREATE NAMESPACE IF NOT EXISTS grafts.st")
    sql("CREATE TABLE grafts.st.bronze (id BIGINT, tag STRING)")
    val root = s"$warehouse/st/bronze"
    val src = tmp("graft-cats-src")
    val ck = tmp("graft-cats-ck")
    val rows = (1 to 8).map(i => (i.toLong, s"r$i"))
    rows.toDF("id", "tag").coalesce(2)
      .write.mode("overwrite").parquet(src)
    def drain(): Unit = {
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema).parquet(src)
        .writeStream.format(VersionedSource.Name)
        .option("checkpointLocation", ck)
        .option("statsCols", "id")
        .trigger(Trigger.AvailableNow())
        .toTable("grafts.st.bronze")
      q.processAllAvailable(); q.stop()
    }
    drain()
    assert(sql("SELECT id, tag FROM grafts.st.bronze").as[(Long, String)]
      .collect().toSet === rows.toSet)
    val versionsAfterFirst = Versioned.versions(root).size
    // restart on the same checkpoint: the in-manifest replay guard must
    // recognize the batch — no new commits, no duplicate rows
    drain()
    assert(Versioned.versions(root).size === versionsAfterFirst)
    assert(sql("SELECT count(*) AS n FROM grafts.st.bronze")
      .as[Long].head() === 8L)
    // streamed ≡ batch: the same input committed directly agrees
    val batchRoot = tmp("graft-cats-batch") + "/t"
    Versioned.commit(spark, batchRoot, rows.toDF("id", "tag"))
    assert(sql("SELECT id, tag FROM grafts.st.bronze").as[(Long, String)]
      .collect().toSet ===
      Versioned.read(spark, batchRoot).as[(Long, String)].collect().toSet)
  }

  test("readStream.table follows the table and equals changesSince") {
    sql("CREATE NAMESPACE IF NOT EXISTS grafts.st")
    sql("CREATE TABLE grafts.st.feed (id BIGINT, v STRING)")
    val root = s"$warehouse/st/feed"
    sql("INSERT INTO grafts.st.feed VALUES (1, 'a'), (2, 'b')")
    Versioned.mergeUpsert(spark, root,
      Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), "id",
      statsCols = Seq("id"), cdf = true)
    val ck = tmp("graft-catr-ck")
    val sink = tmp("graft-catr-out") + "/t"
    def follow(): Unit = {
      val q = spark.readStream.table("grafts.st.feed")
        .writeStream.format(VersionedSource.Name)
        .option("path", sink).option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    follow()
    val streamed = Versioned.read(spark, sink)
      .as[(Long, String, String, Long)].collect().toSet
    val feed = Versioned.changeFeed(spark, root, 0)
      .select("id", "v", "_change_type", "_commit_version")
      .as[(Long, String, String, Long)].collect().toSet
    assert(streamed === feed, "readStream.table must be the change feed")
    // a later commit flows through exactly once; replays are no-ops
    sql("INSERT INTO grafts.st.feed VALUES (9, 'z')")
    follow(); follow()
    val after = Versioned.read(spark, sink)
      .as[(Long, String, String, Long)].collect().toSet
    assert(after === feed + ((9L, "z", "insert", 4L)))
    // reader options pass through the catalog resolution: a pinned
    // startingVersion admits only later versions
    val ck2 = tmp("graft-catr-ck2")
    val sink2 = tmp("graft-catr-out2") + "/t"
    val q2 = spark.readStream.option("startingVersion", 3)
      .table("grafts.st.feed")
      .writeStream.format(VersionedSource.Name)
      .option("path", sink2).option("checkpointLocation", ck2)
      .trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    assert(Versioned.read(spark, sink2)
      .select("_commit_version").as[Long].collect().toSet === Set(4L))
  }
}
