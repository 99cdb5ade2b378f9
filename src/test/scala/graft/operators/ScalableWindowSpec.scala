package graft.operators

import java.sql.Date

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ScalableWindow must equal the plain unpartitioned-window results —
  * same values, no single-partition WindowExec. The boundary cases are
  * the first row of each bucket (lag must reach into the previous
  * bucket) and the offset fold (cumulative must carry across buckets).
  */
class ScalableWindowSpec extends SparkSpec {

  private def daysAcrossMonths = {
    import spark.implicits._
    // 40 consecutive days spanning a Jan→Feb boundary, varied values.
    (0 until 40).map { i =>
      (Date.valueOf(java.time.LocalDate.of(2024, 1, 10).plusDays(i)),
        (i * 37 % 19) + 0.25 * (i % 4))
    }.toDF("day", "revenue")
  }

  test("runningTotal matches the global-window cumulative and lag") {
    val df = daysAcrossMonths
    val got = ScalableWindow.runningTotal(
        df, "day", "revenue", date_trunc("MONTH", col("day")).cast("date"),
        cumCol = "cum", lagCol = "prev")
      .orderBy("day")
      .select("day", "cum", "prev")
      .collect()

    val w = Window.orderBy("day")
    val want = df
      .withColumn("cum", round(sum(graft.functions.ColFns.dec2(col("revenue")))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double"), 2))
      .withColumn("prev", lag("revenue", 1).over(w))
      .orderBy("day")
      .select("day", "cum", "prev")
      .collect()

    assert(got.length === 40)
    got.zip(want).foreach { case (g, e) => assert(g === e) }
  }

  test("runningTotal: first row overall has NULL lag, Feb 1 lags Jan 31") {
    val rows = ScalableWindow.runningTotal(
        daysAcrossMonths, "day", "revenue",
        date_trunc("MONTH", col("day")).cast("date"), "cum", "prev")
      .orderBy("day").collect()
    assert(rows.head.isNullAt(rows.head.fieldIndex("prev")))
    val feb1 = rows.find(_.getDate(0) == Date.valueOf("2024-02-01")).get
    val jan31Rev = rows.find(_.getDate(0) == Date.valueOf("2024-01-31")).get
      .getDouble(1)
    assert(feb1.getDouble(feb1.fieldIndex("prev")) === jan31Rev)
  }

  test("withGlobalShare: shares sum to ~100 and match manual total") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("b", 30L), ("c", 60L)).toDF("k", "n")
    val got = ScalableWindow.withGlobalShare(
        df, sum(col("n")), "pct",
        (_, total) => round(col("n") * lit(100.0) / total, 2))
      .orderBy("k").collect()
    assert(got.map(_.getDouble(2)).toSeq === Seq(10.0, 30.0, 60.0))
  }

  test("runningTotal: a NULL previous VALUE stays NULL (not replaced by prev bucket)") {
    import spark.implicits._
    // Feb 2 has a NULL revenue; Feb 3's lag must be NULL (Feb 2's value),
    // not fall back to Jan 31's value. Only Feb 1 takes the Jan boundary.
    val df = Seq(
      (Date.valueOf("2024-01-31"), Some(10.0)),
      (Date.valueOf("2024-02-01"), Some(5.0)),
      (Date.valueOf("2024-02-02"), Option.empty[Double]),
      (Date.valueOf("2024-02-03"), Some(7.0))
    ).toDF("day", "revenue")
    val rows = ScalableWindow.runningTotal(
        df, "day", "revenue", date_trunc("MONTH", col("day")).cast("date"),
        "cum", "prev")
      .orderBy("day").collect()
    val byDay = rows.map(r => r.getDate(0).toString -> r).toMap
    assert(byDay("2024-02-01").getDouble(byDay("2024-02-01").fieldIndex("prev")) === 10.0)
    assert(byDay("2024-02-02").getDouble(byDay("2024-02-02").fieldIndex("prev")) === 5.0)
    assert(byDay("2024-02-03").isNullAt(byDay("2024-02-03").fieldIndex("prev")),
      "NULL previous value must not be replaced by the prior bucket's last")
  }

  test("globalRank equals the global window row_number, any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // collisions across buckets + duplicate order values inside buckets
    val df = (1 to 500).map(i => ((i * 37) % 211, i.toLong))
      .toDF("score", "id")
    val expect = df
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score"), col("id"))))
      .as[(Int, Long, Int)].collect().toSet
    for (p <- Seq(1, 7)) {
      val got = ScalableWindow.globalRank(
          df.repartition(p), expr("score div 20"),
          Seq(col("score"), col("id")), "rank")
        .select(col("score"), col("id"), col("rank").cast("int"))
        .as[(Int, Long, Int)].collect().toSet
      assert(got === expect, s"p=$p: distributed rank diverged")
    }
  }

  test("globalRank ranks are a permutation and bucket-monotone") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i % 13, i.toLong)).toDF("score", "id")
    val ranks = ScalableWindow.globalRank(
        df, col("score"), Seq(col("score"), col("id")), "rank")
      .select("rank").as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 300L).toSeq,
      "ranks must be exactly 1..N with no gaps or duplicates")
  }

  test("globalRank plans no unpartitioned window") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = (1 to 50).map(i => (i % 7, i.toLong)).toDF("score", "id")
    val plan = ScalableWindow.globalRank(
        df, col("score"), Seq(col("score"), col("id")), "rank")
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, plan.toString))
  }

  test("runningTotal plans no unpartitioned window") {
    // Every Window node must carry partition keys: the unpartitioned
    // form funnels the whole frame through one task (and WARNs at
    // runtime). Checked on the optimized logical plan — AQE wraps the
    // physical WindowExec out of reach of a plain collect.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val plan = ScalableWindow.runningTotal(
        daysAcrossMonths, "day", "revenue",
        date_trunc("MONTH", col("day")).cast("date"), "cum", "prev")
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, plan.toString))
  }
}
