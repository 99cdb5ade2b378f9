package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffling a table into N buckets on its
  * join/agg key lets every later join or aggregation on that key skip the
  * exchange entirely — the single biggest shuffle saver for repeatedly
  * co-joined 100 TB fact tables (SURVEY §4 "Shuffle/exchange planning").
  *
  * Bucketed tables need the session catalog (saveAsTable), so callers
  * manage a warehouse dir; at deploy this is the metastore.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner elides
    * both shuffles (verify: no ShuffleExchange under the SortMergeJoin). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True when the physical plan contains no shuffle exchange.
    * (ShuffleExchangeExec prints as "Exchange <partitioning>";
    * BroadcastExchange is NOT a shuffle and must not match.) */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
      "Exchange SinglePartition", "Exchange RoundRobinPartitioning")
      .exists(plan.contains)
  }
}
