package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.ColFns._
import graft.operators.Mix

/** Second-tier analytics surface: multi-level aggregation (ROLLUP),
  * pivoting, exact quantiles, and rolling-window marts — the OLAP-serving
  * query shapes the reference exposes through its Pinot/Druid copies
  * (SURVEY §2.5 A10, §2.6), re-expressed as Catalyst-native plans.
  */
object AnalyticsQueries {

  private def li(s: SparkSession, d: String) = t(s, d, "lineitem")
  private def ev(s: SparkSession, d: String) = t(s, d, "events")

  private val SUMD = "CAST(SUM(CAST(%s AS DECIMAL(18,2))) AS DOUBLE)"
  private def sumd(c: String) = SUMD.format(c)

  // ---------------------------------------------------------------- q23
  // ROLLUP over (returnflag, linestatus): detail + subtotal + grand-total
  // rows in ONE aggregation pass (partial+final hash agg per grouping
  // set; Spark expands grouping sets before the shuffle, so no re-scan
  // per level — the two-pass q19 form re-reads, this doesn't).
  val q23Rollup: Q = Q(
    "q23_rollup",
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       |  ${sumd("l_extendedprice")} AS revenue,
       |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin) { (s, d) =>
    li(s, d).rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        moneySum(col("l_extendedprice")).as("revenue"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  // ---------------------------------------------------------------- q24
  // Pivot: day × event_type revenue matrix. Explicit pivot values keep
  // the schema static (a dynamic pivot needs a driver-side distinct —
  // fine for bounded vocabularies, but declared here so the plan is one
  // pass and the columns match the oracle's conditional aggregates).
  val q24Pivot: Q = Q(
    "q24_pivot",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |  CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
      |  CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup,
      |  CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "view"
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
    ev(s, d)
      .groupBy(date_trunc("DAY", col("ts")).cast("date").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(moneySum(col("value")))
      .orderBy("day")
  }

  // ---------------------------------------------------------------- q25
  // Exact interpolated quantiles per type (percentile ≡ DuckDB
  // quantile_cont; q20 established the parity for the interpolation).
  // At 100 TB the exact form needs a per-group sort — swap in
  // approx_percentile's sketch when 4-dp exactness stops mattering.
  val q25Quantiles: Q = Q(
    "q25_quantiles",
    """SELECT event_type, COUNT(*) AS n,
      |  ROUND(quantile_cont(value, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(value, 0.9), 4) AS p90,
      |  ROUND(quantile_cont(value, 0.99), 4) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
    ev(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.9)"), 4).as("p90"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q26
  // 7-day rolling revenue via bounded-fanout self-join on the daily
  // frame (Mix.rollingDays) — a RANGE-frame window needs one global
  // ordering; the join form scales with days × 7 and stays partitioned.
  val q26Rolling7d: Q = Q(
    "q26_rolling_7day",
    s"""WITH daily AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |         ${sumd("value")} AS revenue
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
       |SELECT a.day AS day, COUNT(*) AS n_days,
       |  ${sumd("b.revenue")} AS win_total,
       |  ROUND(${sumd("b.revenue")} / COUNT(*), 2) AS win_avg
       |FROM daily a JOIN daily b
       |  ON b.day >= a.day - 6 AND b.day <= a.day
       |GROUP BY 1 ORDER BY day""".stripMargin) { (s, d) =>
    val daily = ev(s, d).filter(col("event_type") === "purchase")
      .groupBy(date_trunc("DAY", col("ts")).cast("date").as("day"))
      .agg(moneySum(col("value")).as("revenue"))
    Mix.rollingDays(daily, "day", "revenue", windowDays = 7)
      .select("day", "n_days", "win_total", "win_avg")
      .orderBy("day")
  }

  val all: Seq[Q] = Seq(q23Rollup, q24Pivot, q25Quantiles, q26Rolling7d)
}
