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

  // ---------------------------------------------------------------- q29
  // Per-user rolling 3-event average: a ROWS-frame window PARTITIONED on
  // the high-cardinality user key — the scalable window shape (state per
  // partition is 3 rows; contrast q26's date-grain join and the
  // forbidden unpartitioned frame). Deterministic intra-user order needs
  // the event_id tiebreak: ts values repeat.
  // The average is computed in integer CENTS with an explicit half-up
  // division — ROUND(sum/count, 2) on doubles diverges between engines
  // exactly at the .xx5 boundaries a 100k-row window inevitably hits
  // (Spark rounds the shortest decimal rendering, DuckDB the binary
  // value). Integer math has no boundary.
  val q29UserRolling: Q = Q(
    "q29_user_rolling",
    """WITH w AS (
      |  SELECT event_id, user_id,
      |    SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS s,
      |    COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n
      |  FROM events)
      |SELECT event_id, user_id,
      |  CAST((2 * s + n) // (2 * n) AS DOUBLE) / 100 AS rolling_avg
      |FROM w ORDER BY event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-2, Window.currentRow)
    t(s, d, "events")
      .select(col("event_id"), col("user_id"),
        sum(cents(col("value"))).over(w).as("s"),
        count(lit(1)).over(w).as("n"))
      .withColumn("rolling_avg",
        graft.functions.ColFns.halfUpDiv("s", "n").cast("double") / 100)
      .drop("s", "n")
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q30
  // Array aggregation: per nation, the sorted distinct market segments
  // of its customers, surfaced as a joined string (set-valued columns
  // hash identically across engines only in a canonical rendering).
  val q30ArrayAgg: Q = Q(
    "q30_array_agg",
    """SELECT c_nationkey AS nationkey,
      |  COUNT(DISTINCT c_mktsegment) AS n_segments,
      |  string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
      |    AS segments
      |FROM customer GROUP BY 1 ORDER BY nationkey""".stripMargin) { (s, d) =>
    t(s, d, "customer")
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(countDistinct(col("c_mktsegment")).as("n_segments"),
        // string_agg(DISTINCT ...) is NULL when every input is NULL;
        // concat_ws over the empty collect_set would be '' — align.
        nullif(concat_ws("|", array_sort(collect_set(col("c_mktsegment")))),
          lit("")).as("segments"))
      .orderBy("nationkey")
  }

  // ---------------------------------------------------------------- q31
  // Set operations beyond UNION: INTERSECT and EXCEPT (Catalyst plans
  // both as distinct-preserving semi/anti joins — no materialized
  // temp sets). Cohort algebra: high-value purchasers who also signed
  // up high-value, minus anyone with a high-value error.
  val q31SetOps: Q = Q(
    "q31_set_ops",
    """(SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 95
      | INTERSECT
      | SELECT user_id FROM events WHERE event_type = 'signup' AND value > 95)
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'error' AND value > 96
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val ev = t(s, d, "events")
    def cohort(tpe: String, cut: Double) =
      ev.filter(col("event_type") === tpe && col("value") > cut)
        .select("user_id")
    cohort("purchase", 95).intersect(cohort("signup", 95))
      .except(cohort("error", 96))
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q32
  // first_value / last_value over a user-partitioned window (full frame
  // for last_value — the default frame stops at CURRENT ROW and silently
  // returns the current row's value, a classic window-frame trap). The
  // (ts, event_id) ordering is unique, so both engines pick identical
  // rows without an engine-defined tie-break.
  val q32FirstLast: Q = Q(
    "q32_first_last",
    """SELECT DISTINCT user_id,
      |  first_value(event_type) OVER w AS first_type,
      |  last_value(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, d, "events")
      .select(col("user_id"),
        first("event_type").over(w).as("first_type"),
        last("event_type").over(full).as("last_type"))
      .distinct()
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q33
  // Unpivot (melt): q24's wide day × type matrix back to long form. The
  // oracle is the DIRECT per-(day, type) aggregate — hash-matching it
  // proves the pivot → unpivot round trip is the identity (absent-cell
  // NULLs dropped, as melt semantics prescribe).
  val q33Unpivot: Q = Q(
    "q33_unpivot",
    s"""SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |  event_type, ${sumd("value")} AS revenue
       |FROM events
       |GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin) { (s, d) =>
    val wide = ev(s, d)
      .groupBy(date_trunc("DAY", col("ts")).cast("date").as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(moneySum(col("value")))
    wide.unpivot(
        ids = Array(col("day")),
        values = Array(col("click"), col("error"), col("purchase"),
          col("signup"), col("view")),
        variableColumnName = "event_type",
        valueColumnName = "revenue")
      .filter(col("revenue").isNotNull)
      .orderBy("day", "event_type")
  }

  // ---------------------------------------------------------------- q34
  // CUBE over (segment, nation): all four grouping sets in one expanded
  // aggregation pass (q23 covers ROLLUP's three); gid disambiguates the
  // NULLs that are subtotal markers from NULLs in the data.
  val q34Cube: Q = Q(
    "q34_cube",
    s"""SELECT c_mktsegment AS segment, c_nationkey AS nationkey,
       |  COUNT(*) AS n, ${sumd("c_acctbal")} AS balance,
       |  CAST(GROUPING(c_mktsegment, c_nationkey) AS BIGINT) AS gid
       |FROM customer
       |GROUP BY CUBE(c_mktsegment, c_nationkey)
       |ORDER BY gid, segment NULLS FIRST, nationkey NULLS FIRST"""
      .stripMargin) { (s, d) =>
    t(s, d, "customer").cube("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n"),
        moneySum(col("c_acctbal")).as("balance"),
        grouping_id().as("gid"))
      .select(col("c_mktsegment").as("segment"),
        col("c_nationkey").as("nationkey"), col("n"), col("balance"),
        col("gid"))
      .orderBy(col("gid"), col("segment").asc_nulls_first,
        col("nationkey").asc_nulls_first)
  }

  // ---------------------------------------------------------------- q35
  // Multiple DISTINCT aggregates over different columns in ONE GROUP BY
  // (q30 has a single distinct): Catalyst plans this with Expand — one
  // input row per distinct group — then a two-phase aggregation, so it
  // still shuffles keyed and partial-aggregates; no per-group set
  // materialization on a single node.
  val q35MultiDistinct: Q = Q(
    "q35_multi_distinct",
    s"""SELECT event_type, COUNT(*) AS n_events,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE)) AS n_days,
       |  ${sumd("value")} AS revenue
       |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, d) =>
    ev(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(date_trunc("DAY", col("ts")).cast("date")).as("n_days"),
        moneySum(col("value")).as("revenue"))
      .orderBy("event_type")
  }

  // ---------------------------------------------------------------- q36
  // Ranking-window family: rank / dense_rank / percent_rank / ntile in
  // one PARTITIONED window (days ranked by revenue within event_type —
  // the window key keeps every frame small and distributed; the (revenue,
  // day) order is total, so ranks and quartiles are deterministic).
  val q36RankSuite: Q = Q(
    "q36_rank_suite",
    s"""WITH daily AS (
       |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       |    ${sumd("value")} AS revenue
       |  FROM events GROUP BY 1, 2)
       |SELECT event_type, day, revenue,
       |  RANK() OVER w AS rnk,
       |  DENSE_RANK() OVER w AS drnk,
       |  ROUND(PERCENT_RANK() OVER w, 4) AS prnk,
       |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile
       |FROM daily
       |WINDOW w AS (PARTITION BY event_type ORDER BY revenue DESC, day)
       |ORDER BY event_type, rnk, day""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val daily = ev(s, d)
      .groupBy(col("event_type"),
        date_trunc("DAY", col("ts")).cast("date").as("day"))
      .agg(moneySum(col("value")).as("revenue"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("revenue").desc, col("day"))
    daily.select(col("event_type"), col("day"), col("revenue"),
        rank().over(w).cast("bigint").as("rnk"),
        dense_rank().over(w).cast("bigint").as("drnk"),
        round(percent_rank().over(w), 4).as("prnk"),
        ntile(4).over(w).cast("bigint").as("quartile"))
      .orderBy("event_type", "rnk", "day")
  }

  // ---------------------------------------------------------------- q37
  // FULL OUTER join: reconcile two independently-aggregated daily frames
  // (purchases vs errors) keeping days present on either side — the
  // reconciliation shape (closes the join family: inner/left/semi/anti/
  // asof/range are covered elsewhere). COALESCE merges the key; null
  // measures mark which side was absent.
  val q37FullOuter: Q = Q(
    "q37_full_outer",
    s"""WITH p AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |    COUNT(*) AS n_purch, ${sumd("value")} AS purch_rev
       |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
       |e AS (
       |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       |    COUNT(*) AS n_err
       |  FROM events WHERE event_type = 'error' GROUP BY 1)
       |SELECT COALESCE(p.day, e.day) AS day, n_purch, purch_rev, n_err
       |FROM p FULL OUTER JOIN e ON p.day = e.day
       |ORDER BY day""".stripMargin) { (s, d) =>
    def daily(tpe: String) = ev(s, d).filter(col("event_type") === tpe)
      .groupBy(date_trunc("DAY", col("ts")).cast("date").as("day"))
    val p = daily("purchase")
      .agg(count(lit(1)).as("n_purch"), moneySum(col("value")).as("purch_rev"))
    val e = daily("error").agg(count(lit(1)).as("n_err"))
    p.join(e, p("day") === e("day"), "full_outer")
      .select(coalesce(p("day"), e("day")).as("day"),
        col("n_purch"), col("purch_rev"), col("n_err"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------- q38
  // RANGE window frame (value-based, vs q29's ROWS and q26's join form):
  // per user, activity in the trailing hour of EVENT TIME — rows with
  // equal timestamps share a frame regardless of physical order, which
  // is exactly what ROWS frames get wrong on ties. Ordered by epoch
  // seconds (both engines make the interval arithmetic integer-exact);
  // partitioned by the high-cardinality user key, so frames distribute.
  val q38RangeFrame: Q = Q(
    "q38_range_frame",
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_trailing_hour,
      |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
      |       OVER w AS BIGINT) AS cents_trailing_hour
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |             ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(unix_timestamp(col("ts")))
      .rangeBetween(-3600, Window.currentRow)
    ev(s, d).select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_trailing_hour"),
        sum(cents(col("value"))).over(w).as("cents_trailing_hour"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q40
  // Explicit GROUPING SETS: the two single-dimension marginals WITHOUT
  // the detail or grand-total rows — the arbitrary-set form neither
  // ROLLUP (q23) nor CUBE (q34) can express, still one Expand + one
  // aggregation pass.
  val q40GroupingSets: Q = Q(
    "q40_grouping_sets",
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       |  ${sumd("l_extendedprice")} AS revenue,
       |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
       |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin) { (s, d) =>
    li(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        moneySum(col("l_extendedprice")).as("revenue"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  // ---------------------------------------------------------------- q42
  // Retention cohorts: users grouped by first-seen week, tracked by
  // weeks-since-cohort — the canonical product-analytics mart. Scale
  // shape: one distinct (user, week) pass, then keyed joins on
  // user_id and cohort; the retention denominator arrives as a
  // cohort-keyed aggregate, never a global collect.
  val q42RetentionCohorts: Q = Q(
    "q42_retention_cohorts",
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(DATE_TRUNC('week', ts) AS DATE) AS wk
      |  FROM events),
      |firstw AS (
      |  SELECT user_id, MIN(wk) AS cohort FROM act GROUP BY 1),
      |sizes AS (
      |  SELECT cohort, COUNT(*) AS cohort_users FROM firstw GROUP BY 1)
      |SELECT f.cohort, CAST((a.wk - f.cohort) // 7 AS BIGINT) AS week_n,
      |  COUNT(*) AS active_users,
      |  ROUND(COUNT(*) * 1.0 / MIN(z.cohort_users), 4) AS retention
      |FROM act a JOIN firstw f USING (user_id) JOIN sizes z USING (cohort)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
    val act = ev(s, d).select(col("user_id"),
      expr("cast(date_trunc('week', ts) as date)").as("wk")).distinct()
    val firstw = act.groupBy("user_id").agg(min("wk").as("cohort"))
    val sizes = firstw.groupBy("cohort").agg(count(lit(1)).as("cohort_users"))
    act.join(firstw, "user_id").join(sizes, "cohort")
      .groupBy(col("cohort"),
        expr("datediff(wk, cohort) div 7").cast("long").as("week_n"))
      .agg(count(lit(1)).as("active_users"),
        round(count(lit(1)) * lit(1.0) / min("cohort_users"), 4)
          .as("retention"))
      .orderBy("cohort", "week_n")
  }

  // ---------------------------------------------------------------- q43
  // Ordered conversion funnel: view → click-after-view →
  // purchase-after-click, each step gated on happening strictly AFTER
  // the user's entry into the previous one (a same-user click before
  // their first view does not convert). Step frames are keyed
  // user-grain aggregates chained by keyed joins; the three step
  // counts land as one broadcastable row.
  val q43Funnel: Q = Q(
    "q43_funnel",
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY 1),
      |n AS (SELECT (SELECT COUNT(*) FROM v) AS nv,
      |             (SELECT COUNT(*) FROM c) AS nc,
      |             (SELECT COUNT(*) FROM p) AS np)
      |SELECT * FROM (
      |  SELECT CAST(1 AS BIGINT) AS step_n, 'view' AS step, nv AS users,
      |         CAST(1.0 AS DOUBLE) AS conversion FROM n
      |  UNION ALL SELECT CAST(2 AS BIGINT), 'click', nc,
      |         ROUND(nc * 1.0 / NULLIF(nv, 0), 4) FROM n
      |  UNION ALL SELECT CAST(3 AS BIGINT), 'purchase', np,
      |         ROUND(np * 1.0 / NULLIF(nc, 0), 4) FROM n)
      |ORDER BY step_n""".stripMargin) { (s, d) =>
    val e = ev(s, d)
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("vt"))
    val c = e.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("vt"))
      .groupBy("user_id").agg(min("ts").as("ct"))
    val p = e.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("ct"))
      .groupBy("user_id").agg(min("ts").as("pt"))
    val n = v.agg(count(lit(1)).as("nv"))
      .crossJoin(c.agg(count(lit(1)).as("nc")))
      .crossJoin(p.agg(count(lit(1)).as("np")))
    n.select(lit(1L).as("step_n"), lit("view").as("step"),
        col("nv").as("users"), lit(1.0).as("conversion"))
      .unionByName(n.select(lit(2L).as("step_n"), lit("click").as("step"),
        col("nc").as("users"),
        round(col("nc") * lit(1.0) / nullif(col("nv"), lit(0)), 4)
          .as("conversion")))
      .unionByName(n.select(lit(3L).as("step_n"), lit("purchase").as("step"),
        col("np").as("users"),
        round(col("np") * lit(1.0) / nullif(col("nc"), lit(0)), 4)
          .as("conversion")))
      .orderBy("step_n")
  }

  val all: Seq[Q] = Seq(q23Rollup, q24Pivot, q25Quantiles, q26Rolling7d,
    q29UserRolling, q30ArrayAgg, q31SetOps, q32FirstLast, q33Unpivot,
    q34Cube, q35MultiDistinct, q36RankSuite, q37FullOuter, q38RangeFrame,
    q40GroupingSets, q42RetentionCohorts, q43Funnel)
}
