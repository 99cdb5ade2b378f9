package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ColFns._

/** Bronze → Silver → Gold medallion transforms over the `events` stream
  * table (the reference's canonical pipeline shape, SURVEY §3.2, mapped
  * onto the driver's schema).
  *
  * Scale: Bronze is append-only with ingest metadata; Silver dedups on a
  * high-cardinality natural key (W1 window partitions scale out) and is
  * partitioned by event_date on write; Gold aggregates are partial+final
  * hash aggs. No collect(), no cross joins, no global windows on raw data.
  */
object Medallion {

  /** Bronze: raw + ingest metadata (reference S5/S6). `ingestTs` is a
    * parameter so batch runs are reproducible; production passes
    * current_timestamp(). */
  def bronze(raw: DataFrame, ingestTs: Column = current_timestamp()): DataFrame =
    raw.withColumn("ingestion_ts", ingestTs)
      .withColumn("ingest_date", to_date(col("ingestion_ts")))

  /** Natural key of an event (the analog of the reference's 7-column
    * trip natural key, F1/W1). */
  val naturalKey: Seq[String] = Seq("user_id", "event_type", "ts")

  /** Quality filter (P2) + date-range filter (P3). */
  def silverFilter(bronze: DataFrame): DataFrame =
    bronze
      .filter(col("ts").isNotNull && col("user_id").isNotNull
        && col("value") >= 0)
      .filter(col("ts") >= lit("2024-01-01 00:00:00").cast("timestamp")
        && col("ts") < lit("2024-02-01 00:00:00").cast("timestamp"))

  /** Batch dedup: keep latest ingest per natural key (W1; event_id
    * tie-break for determinism). Streaming uses withWatermark +
    * dropDuplicates instead (ST5) — row_number isn't streamable. */
  def dedupLatest(filtered: DataFrame): DataFrame = {
    val w = Window.partitionBy(naturalKey.map(col): _*)
      .orderBy(col("ingestion_ts").desc, col("event_id").desc)
    filtered.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Canonical Silver projection with surrogate key (P1/F1) + derived
    * time dims — stateless, shared by batch and streaming paths. */
  def silverProject(deduped: DataFrame): DataFrame =
    deduped
      .select(
        surrogateKey(col("user_id"), col("event_type"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"), col("event_id")).as("event_sk"),
        col("event_id"), col("user_id"), col("event_type"),
        col("ts").as("event_ts"),
        col("ts").cast("date").as("event_date"),
        hour(col("ts")).as("event_hour"),
        dow(col("ts")).as("event_dow"),
        isWeekend(col("ts")).as("is_weekend"),
        dec2(col("value")).cast("double").as("value"),
        col("props"))

  /** Full batch Silver: filter → dedup → project (SURVEY §3.2 step 3). */
  def silver(bronze: DataFrame): DataFrame =
    silverProject(dedupLatest(silverFilter(bronze)))

  /** Gold mart: daily summary (A1 — counts, exact sums, conditional
    * counts per type, 2-dp averages). */
  def goldDailySummary(silver: DataFrame): DataFrame =
    silver.groupBy("event_date", "event_dow", "is_weekend")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        moneySum(col("value")).as("total_value"),
        round(moneySum(col("value")) / count(lit(1)), 2).as("avg_value"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"),
        count(when(col("event_type") === "error", 1)).as("n_errors"))

  /** Gold mart: per-user lifetime rollup with value share (W4-style).
    * The global total comes from a broadcast one-row aggregate
    * (ScalableWindow) — at fact scale the per-user frame is millions of
    * rows, far too large for an unpartitioned window. Decimal-cast sum:
    * exact and order-independent.
    */
  def goldUserStats(silver: DataFrame): DataFrame = {
    val perUser = silver.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        moneySum(col("value")).as("total_value"),
        min("event_ts").as("first_seen"),
        max("event_ts").as("last_seen"))
    ScalableWindow.withGlobalShare(
      perUser, sum(dec2(col("total_value"))), "value_share_pct",
      (_, total) =>
        round(col("total_value") * 100.0 / total.cast("double"), 2))
  }
}
