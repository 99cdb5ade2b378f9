package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftExtensions
import graft.operators.AsOfJoin

/** RewriteAsOfWindow must swap the union-sort-backfill idiom for the
  * custom one-pass operator AUTOMATICALLY (the RewriteGlobalWindowTotals
  * precedent applied to J7) — with results identical to the genuine
  * window form on every fixture INCLUDING null keys/timestamps (the
  * node's nullParity mode), and must stand down on shapes whose
  * semantics it cannot preserve. */
class RewriteAsOfWindowSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-asof-rewrite-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val sfDir = "/root/testdata/sf0.001"

  private def trades = {
    import spark.implicits._
    Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 30L, "t3"),
      (2L, 15L, "t4"), (3L, 5L, "t5")).toDF("k", "ts", "trade")
  }
  private def quotes = {
    import spark.implicits._
    Seq((1L, 8L, 100.0), (1L, 20L, 101.0), (1L, 25L, 102.0),
      (2L, 16L, 200.0), (9L, 1L, 900.0)).toDF("k", "ts", "px")
  }

  private def collect(df: DataFrame) = {
    import spark.implicits._
    df.select("trade", "asof_px").as[(String, Option[Double])].collect().toSet
  }
  private def planOf(df: DataFrame) = df.queryExecution.executedPlan.toString

  test("backward union-window form plans the custom exec automatically") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
    val plan = planOf(out)
    assert(plan.contains("AsOfJoin "), s"exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window machinery left behind:\n$plan")
    val got = collect(out)
    // the genuine window form (rule disabled end-to-end) agrees
    val win = RewriteAsOfWindow.disabled(spark) {
      val w = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
      assert(planOf(w).contains("Window"), "disabled() must yield the raw form")
      collect(w)
    }
    assert(got === win)
    assert(got === Set(
      ("t1", Some(100.0)), ("t2", Some(101.0)), ("t3", Some(102.0)),
      ("t4", None), ("t5", None)))
  }

  test("forward union-window form plans the custom exec automatically") {
    val out = AsOfJoin.forward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
    val plan = planOf(out)
    assert(plan.contains("AsOfJoin ") && !plan.contains("Window"), plan)
    val win = RewriteAsOfWindow.disabled(spark) {
      collect(AsOfJoin.forward(trades, quotes, Seq("k"), "ts", "ts", Seq("px")))
    }
    assert(collect(out) === win)
    assert(win === Set(
      ("t1", Some(101.0)), ("t2", Some(101.0)), ("t3", None),
      ("t4", Some(200.0)), ("t5", None)))
  }

  test("null keys and timestamps: rewritten plan has EXACT window parity") {
    import spark.implicits._
    val l = Seq(
      (Option(1L), Option(10L), "a"), (Option.empty[Long], Option(10L), "b"),
      (Option(1L), Option.empty[Long], "c"),
      (Option.empty[Long], Option.empty[Long], "d")).toDF("k", "ts", "trade")
    val r = Seq(
      (Option(1L), Option.empty[Long], 50.0), (Option(1L), Option(5L), 99.0),
      (Option.empty[Long], Option(1L), 42.0),
      (Option.empty[Long], Option.empty[Long], 7.0)).toDF("k", "ts", "px")

    val back = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("px"))
    assert(planOf(back).contains("AsOfJoin "), planOf(back))
    val gotB = collect(back)
    val winB = RewriteAsOfWindow.disabled(spark) {
      collect(AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("px")))
    }
    assert(gotB === winB, "backward null parity broken")
    // window semantics, hand-walked: null keys group; null ts = -inf
    assert(gotB === Set(
      ("a", Some(99.0)),  // null-ts quote is -inf, ts=5 supersedes it
      ("b", Some(42.0)),  // null-key probe matches null-key quotes
      ("c", Some(50.0)),  // null-ts probe sees only null-ts quotes
      ("d", Some(7.0))))  // both null

    val fwd = AsOfJoin.forward(l, r, Seq("k"), "ts", "ts", Seq("px"))
    assert(planOf(fwd).contains("AsOfJoin "), planOf(fwd))
    val gotF = collect(fwd)
    val winF = RewriteAsOfWindow.disabled(spark) {
      collect(AsOfJoin.forward(l, r, Seq("k"), "ts", "ts", Seq("px")))
    }
    assert(gotF === winF, "forward null parity broken")
    assert(gotF === Set(
      ("a", None),        // no k=1 quote at ts >= 10
      ("b", None),        // no null-key quote at ts >= 10
      ("c", Some(50.0)),  // null-ts probe: first following is the null-ts quote
      ("d", Some(7.0))))

    // parity must hold on BOTH physical paths: the broadcast-sized
    // fixtures above exercised BroadcastAsOfJoinExec; pin the threshold
    // off and replay through the co-partitioned merge exec
    val prev = spark.conf.getOption(AsOfJoinStrategy.ThresholdKey)
    try {
      spark.conf.set(AsOfJoinStrategy.ThresholdKey, "-1")
      val mergeB = AsOfJoin.backward(l, r, Seq("k"), "ts", "ts", Seq("px"))
      assert(planOf(mergeB).contains("AsOfJoin ") &&
        !planOf(mergeB).contains("BroadcastAsOfJoin"), planOf(mergeB))
      assert(collect(mergeB) === gotB, "merge-path backward null parity broken")
      val mergeF = AsOfJoin.forward(l, r, Seq("k"), "ts", "ts", Seq("px"))
      assert(collect(mergeF) === gotF, "merge-path forward null parity broken")
    } finally prev match {
      case Some(v) => spark.conf.set(AsOfJoinStrategy.ThresholdKey, v)
      case None => spark.conf.unset(AsOfJoinStrategy.ThresholdKey)
    }
  }

  test("TTL'd (maxGap) shape rewrites too, gap guard preserved") {
    def back(ttl: Long) = AsOfJoin.backward(
      trades, quotes, Seq("k"), "ts", "ts", Seq("px"), maxGap = Some(ttl))
    assert(planOf(back(2L)).contains("AsOfJoin ") &&
      !planOf(back(2L)).contains("Window"), planOf(back(2L)))
    assert(collect(back(2L)).contains(("t1", Some(100.0)))) // gap == TTL matches
    assert(collect(back(1L)).contains(("t1", None)))        // gap > TTL nulls
    val win = RewriteAsOfWindow.disabled(spark) { collect(back(1L)) }
    assert(collect(back(1L)) === win)
  }

  test("conf kill-switch restores the window form") {
    RewriteAsOfWindow.disabled(spark) {
      val df = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
      val plan = planOf(df)
      assert(plan.contains("Window") && !plan.contains("AsOfJoin "), plan)
    }
  }

  test("shapes the rewrite cannot preserve stand down") {
    import org.apache.spark.sql.expressions.{Window => W}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val l = trades.withColumn("_ts", $"ts").withColumn("_side", lit(1))
    val r = quotes.select($"k", $"ts".as("_ts"), lit(0).as("_side"),
      struct($"px").as("_r"))
    val u = l.unionByName(r, allowMissingColumns = true)
    // (a) missing the _r tiebreak → nondeterministic on ties, no rewrite
    val w1 = W.partitionBy($"k").orderBy($"_ts", $"_side")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val noTie = u.withColumn("_asof", last($"_r", ignoreNulls = true).over(w1))
      .filter($"_side" === 1)
      .select($"k", $"trade", $"_asof.px".as("asof_px"))
    assert(planOf(noTie).contains("Window") &&
      !planOf(noTie).contains("AsOfJoin "), planOf(noTie))
    // (b) ignoreNulls=false changes the backfill contract, no rewrite
    val w2 = W.partitionBy($"k").orderBy($"_ts", $"_side", $"_r")
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val keepNulls = u.withColumn("_asof", last($"_r", ignoreNulls = false).over(w2))
      .filter($"_side" === 1)
      .select($"k", $"trade", $"_asof.px".as("asof_px"))
    assert(planOf(keepNulls).contains("Window") &&
      !planOf(keepNulls).contains("AsOfJoin "), planOf(keepNulls))
    // (c) consuming the whole _asof struct (not field accesses) → no rewrite
    val wholeStruct = u.withColumn("_asof", last($"_r", ignoreNulls = true).over(w2))
      .filter($"_side" === 1).select($"k", $"trade", $"_asof")
    assert(planOf(wholeStruct).contains("Window") &&
      !planOf(wholeStruct).contains("AsOfJoin "), planOf(wholeStruct))
  }

  test("hand-written SQL (WITH CTEs) gets the exec through the optimizer pass") {
    // parquet-backed views: literal fixtures would be constant-folded
    // into LocalRelations before the optimizer pass sees the idiom's
    // side markers (at which point the rule rightly stands down) — real
    // tables keep the structure, which is the case that matters
    val dir = java.nio.file.Files.createTempDirectory("graft-rw-sql").toString
    trades.write.mode("overwrite").parquet(s"$dir/trades")
    quotes.write.mode("overwrite").parquet(s"$dir/quotes")
    spark.read.parquet(s"$dir/trades").createOrReplaceTempView("rw_trades")
    spark.read.parquet(s"$dir/quotes").createOrReplaceTempView("rw_quotes")
    val sql = spark.sql(
      """WITH l AS (
        |  SELECT k, trade, ts AS _ts, 1 AS _side,
        |         CAST(NULL AS STRUCT<px: DOUBLE>) AS _r
        |  FROM rw_trades),
        |r AS (
        |  SELECT k, CAST(NULL AS STRING) AS trade, ts AS _ts, 0 AS _side,
        |         named_struct('px', px) AS _r
        |  FROM rw_quotes),
        |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
        |w AS (
        |  SELECT *, last(_r, true) OVER (
        |    PARTITION BY k ORDER BY _ts, _side, _r
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _asof
        |  FROM u)
        |SELECT k, trade, _asof.px AS asof_px FROM w WHERE _side = 1
        |""".stripMargin)
    val plan = planOf(sql)
    assert(plan.contains("AsOfJoin ") && !plan.contains("Window"),
      s"SQL idiom did not plan the exec:\n$plan")
    // the broadcast physical path must be reachable from REWRITTEN SQL
    // too (not just the DataFrame API): the reference side here is
    // tiny, so the strategy must pick BroadcastAsOfJoinExec — zero
    // exchanges, zero sorts
    assert(plan.contains("BroadcastAsOfJoin"),
      s"small reference side must take the broadcast exec from SQL:\n$plan")
    assert(!plan.toLowerCase.contains("sort "),
      s"broadcast as-of must not sort:\n$plan")
    import spark.implicits._
    val expected = Set(
      (1L, "t1", Some(100.0)), (1L, "t2", Some(101.0)),
      (1L, "t3", Some(102.0)), (2L, "t4", None), (3L, "t5", None))
    val got = sql.as[(Long, String, Option[Double])].collect().toSet
    assert(got === expected)
    // same SQL through the co-partitioned merge exec (threshold off)
    val prev = spark.conf.getOption(AsOfJoinStrategy.ThresholdKey)
    try {
      spark.conf.set(AsOfJoinStrategy.ThresholdKey, "-1")
      val replay = spark.sql(
        """WITH l AS (
          |  SELECT k, trade, ts AS _ts, 1 AS _side,
          |         CAST(NULL AS STRUCT<px: DOUBLE>) AS _r
          |  FROM rw_trades),
          |r AS (
          |  SELECT k, CAST(NULL AS STRING) AS trade, ts AS _ts, 0 AS _side,
          |         named_struct('px', px) AS _r
          |  FROM rw_quotes),
          |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
          |w AS (
          |  SELECT *, last(_r, true) OVER (
          |    PARTITION BY k ORDER BY _ts, _side, _r
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _asof
          |  FROM u)
          |SELECT k, trade, _asof.px AS asof_px FROM w WHERE _side = 1
          |""".stripMargin)
      val mPlan = planOf(replay)
      assert(mPlan.contains("AsOfJoin ") &&
        !mPlan.contains("BroadcastAsOfJoin"), mPlan)
      assert(replay.as[(Long, String, Option[Double])].collect().toSet
        === expected, "merge-path SQL rows must agree")
    } finally prev match {
      case Some(v) => spark.conf.set(AsOfJoinStrategy.ThresholdKey, v)
      case None => spark.conf.unset(AsOfJoinStrategy.ThresholdKey)
    }
  }

  test("x02/x08's declared window-form queries plan the exec automatically") {
    val x02 = graft.SparkEntry.queries("x02_asof_join")(spark, sfDir)
    val p02 = planOf(x02)
    assert(p02.contains("AsOfJoin ") && !p02.contains("Window"),
      s"x02 did not auto-plan the exec:\n$p02")
    val x08 = graft.SparkEntry.queries("x08_asof_forward")(spark, sfDir)
    val p08 = planOf(x08)
    assert(p08.contains("AsOfJoin ") && !p08.contains("Window"),
      s"x08 did not auto-plan the exec:\n$p08")
    // and x02's rows are unchanged vs the raw window form
    val got = x02.collect().map(_.toSeq).toSeq
    val win = RewriteAsOfWindow.disabled(spark) {
      graft.SparkEntry.queries("x02_asof_join")(spark, sfDir)
        .collect().map(_.toSeq).toSeq
    }
    assert(got === win)
  }
}
