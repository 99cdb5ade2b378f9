package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.Versioned

/** The versioned streaming sink must land every source row exactly once
  * — across micro-batches, a checkpointed restart, AND a simulated
  * foreachBatch redelivery — with each micro-batch becoming a
  * time-travelable table version. */
class VersionedSinkSpec extends SparkSpec {

  test("stream lands exactly once; replays are recognized by the manifest") {
    val src = Files.createTempDirectory("graft-vsink-src").toString
    val root = Files.createTempDirectory("graft-vsink").toString + "/t"
    val ck = Files.createTempDirectory("graft-vsink-ck").toString
    Tables.t(spark, sfDir, "events").repartition(8)
      .write.mode("overwrite").parquet(src)
    val expected = spark.read.parquet(src).count()

    Streams.versionedSink(Streams.fileSource(spark, src), root, ck, "app1")
      .awaitTermination()
    assert(Versioned.read(spark, root).count() === expected)
    // 8 files at maxFilesPerTrigger=4 → 2 micro-batches → 2 versions,
    // each one time-travelable
    val vs = Versioned.versions(root)
    assert(vs.size === 2, s"expected one version per micro-batch: $vs")
    assert(Versioned.readVersion(spark, root, vs.head).count() < expected)
    assert(Versioned.lastCommittedBatch(root, "app1") === Some(1L))

    // restart on the same checkpoint, no new data: nothing re-lands
    Streams.versionedSink(Streams.fileSource(spark, src), root, ck, "app1")
      .awaitTermination()
    assert(Versioned.read(spark, root).count() === expected)

    // simulated foreachBatch redelivery (crash after commit, before the
    // checkpoint offset write): same (app, batchId) must no-op
    val replay = spark.read.parquet(src).limit(5)
    assert(!Versioned.commitIfNew(spark, root, replay, "app1", 1L))
    assert(Versioned.read(spark, root).count() === expected)
    // a NEW batch id commits, and an independent app is not blocked
    assert(Versioned.commitIfNew(spark, root, replay, "app1", 2L))
    assert(Versioned.commitIfNew(spark, root, replay, "app2", 0L))
    assert(Versioned.read(spark, root).count() === expected + 10)
    assert(Versioned.lastCommittedBatch(root, "app2") === Some(0L))
  }

  test("streamed table equals the batch write of the same source") {
    val src = Files.createTempDirectory("graft-vsink-src2").toString
    val root = Files.createTempDirectory("graft-vsink2").toString + "/t"
    val ck = Files.createTempDirectory("graft-vsink-ck2").toString
    Tables.t(spark, sfDir, "events").filter(col("event_type") === "purchase")
      .repartition(5).write.mode("overwrite").parquet(src)

    Streams.versionedSink(Streams.fileSource(spark, src), root, ck, "app")
      .awaitTermination()
    val streamed = Versioned.read(spark, root)
      .select("event_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    val batch = spark.read.parquet(src)
      .select("event_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq
    assert(streamed === batch)
  }
}
