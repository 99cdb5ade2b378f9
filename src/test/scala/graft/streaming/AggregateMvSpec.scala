package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** The streamed aggregate MV must converge to the batch aggregate over
  * the same data — across multiple micro-batches and a checkpointed
  * restart. */
class AggregateMvSpec extends SparkSpec {

  test("foreachBatch-MERGE aggregate MV equals the batch aggregate") {
    val src = Files.createTempDirectory("graft-mv-src").toString
    val target = Files.createTempDirectory("graft-mv").resolve("mv").toString
    val ck = Files.createTempDirectory("graft-mv-ck").toString
    // 4 files → multiple micro-batches (maxFilesPerTrigger=4 → 1 batch;
    // write 8 to get 2 batches).
    Tables.t(spark, sfDir, "events").repartition(8)
      .write.mode("overwrite").parquet(src)

    Streams.aggregateMv(Streams.fileSource(spark, src), target, ck).awaitTermination()

    val mv = spark.read.parquet(target)
    val batch = Tables.t(spark, sfDir, "events")
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(mv.count() === batch.count())
    val joined = mv.join(batch.withColumnRenamed("n", "expect_n"),
      Seq("event_date", "event_type"))
    assert(joined.filter(col("n") =!= col("expect_n")).count() === 0)
    assert(joined.count() === batch.count())

    // Restart with no new data: checkpoint prevents double-counting.
    Streams.aggregateMv(Streams.fileSource(spark, src), target, ck).awaitTermination()
    val mv2 = spark.read.parquet(target)
    assert(mv2.join(batch.withColumnRenamed("n", "expect_n"),
      Seq("event_date", "event_type"))
      .filter(col("n") =!= col("expect_n")).count() === 0)
  }
}
