package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.Medallion

/** Plan-level proof that the Silver layout supports partition pruning:
  * a date filter over the partitioned table must reach the scan as a
  * PartitionFilter (pruned directories), not a post-scan filter. */
class PartitionPruningSpec extends SparkSpec {

  test("date filter on partitioned silver prunes partitions in the plan") {
    val dir = Files.createTempDirectory("graft-part").resolve("silver").toString
    val silver = Medallion.silver(Medallion.bronze(
      Tables.t(spark, sfDir, "events"),
      lit("2024-02-01 00:00:00").cast("timestamp")))
    silver.write.partitionBy("event_date").mode("overwrite").parquet(dir)

    val q = spark.read.parquet(dir)
      .filter(col("event_date") === "2024-01-05")
      .select("event_sk", "value")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_date"),
      s"expected partition filter on event_date in:\n$plan")
    // The pruned read touches exactly the one day.
    assert(q.count() ===
      silver.filter(col("event_date") === "2024-01-05").count())
  }
}
