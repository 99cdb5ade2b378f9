package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOfJoin

/** BroadcastAsOfJoinExec must be output-identical to the merge exec and
  * the union-window form on every fixture — ties, nulls, TTL, both
  * directions — while moving ZERO probe-side data (no Exchange, no Sort
  * in the plan). Also covers the strategy's hint/threshold decision. */
class BroadcastAsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val withStrategy: Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  private def trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 30L, "t3"),
    (2L, 15L, "t4"), (3L, 5L, "t5")
  ).toDF("k", "ts", "trade")

  private def quotes = Seq(
    (1L, 8L, 100.0), (1L, 20L, 101.0), (1L, 25L, 102.0),
    (2L, 16L, 200.0), (9L, 1L, 900.0)
  ).toDF("k", "ts", "px")

  private def collect(df: DataFrame) =
    df.select("k", "ts", "trade", "asof_px")
      .as[(Long, Long, String, Option[Double])].collect().toSet
  private def planOf(df: DataFrame) = df.queryExecution.executedPlan.toString

  test("broadcast plan moves no probe-side data: no exchange, no sort") {
    withStrategy
    val df = AsOfJoinNode.backward(trades, quotes, Seq("k"),
      "ts", "ts", Seq("px"), broadcast = Some(true))
    df.write.format("noop").mode("overwrite").save()
    val plan = planOf(df)
    assert(plan.contains("BroadcastAsOfJoin"), s"broadcast exec missing:\n$plan")
    assert(!plan.contains("Exchange"), s"probe side must not move:\n$plan")
    assert(!plan.contains("Sort"), s"probe side must not sort:\n$plan")
  }

  test("matches the merge exec and the window form on fixtures") {
    withStrategy
    val bc = AsOfJoinNode.backward(trades, quotes, Seq("k"), "ts", "ts",
      Seq("px"), broadcast = Some(true))
    val merge = AsOfJoinNode.backward(trades, quotes, Seq("k"), "ts", "ts",
      Seq("px"), broadcast = Some(false))
    val win = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
    assert(planOf(merge).contains("AsOfJoin ") &&
      !planOf(merge).contains("BroadcastAsOfJoin"), planOf(merge))
    val got = collect(bc)
    assert(got === collect(merge))
    assert(got === collect(win))
    assert(got === Set(
      (1L, 10L, "t1", Some(100.0)), (1L, 20L, "t2", Some(101.0)),
      (1L, 30L, "t3", Some(102.0)), (2L, 15L, "t4", None),
      (3L, 5L, "t5", None)))
  }

  test("forward direction matches the merge exec (incl. equal-ts)") {
    withStrategy
    val bc = AsOfJoinNode.forward(trades, quotes, Seq("k"), "ts", "ts",
      Seq("px"), broadcast = Some(true))
    val merge = AsOfJoinNode.forward(trades, quotes, Seq("k"), "ts", "ts",
      Seq("px"), broadcast = Some(false))
    val got = collect(bc)
    assert(got === collect(merge))
    assert(got === Set(
      (1L, 10L, "t1", Some(101.0)), (1L, 20L, "t2", Some(101.0)),
      (1L, 30L, "t3", None), (2L, 15L, "t4", Some(200.0)),
      (3L, 5L, "t5", None)))
  }

  test("equal-(key,ts) ties pick the same row as the merge exec's sort") {
    withStrategy
    // backward must attach the GREATEST value tuple among ties, forward
    // the LEAST — the boundary pick over the (ts, vals) sort
    val probes = Seq((1L, 10L, "p")).toDF("k", "ts", "trade")
    val tied = Seq((1L, 10L, 5.0), (1L, 10L, 9.0), (1L, 10L, 1.0))
      .toDF("k", "ts", "px")
    def run(dir: Boolean, bcast: Boolean) = {
      val f = if (dir) AsOfJoinNode.forward _ else AsOfJoinNode.backward _
      collect(f(probes, tied, Seq("k"), "ts", "ts", Seq("px"), None,
        Some(bcast)))
    }
    assert(run(false, true) === Set((1L, 10L, "p", Some(9.0))))
    assert(run(false, true) === run(false, false))
    assert(run(true, true) === Set((1L, 10L, "p", Some(1.0))))
    assert(run(true, true) === run(true, false))
  }

  test("null keys and timestamps never match (SQL mode), like the merge exec") {
    withStrategy
    val l = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c")).toDF("k", "ts", "trade")
    val r = Seq((Some(1L), None, 50.0), (Some(1L), Some(5L), 99.0),
      (None, Some(1L), 42.0)).toDF("k", "ts", "px")
    def run(bcast: Boolean) =
      AsOfJoinNode.backward(l, r, Seq("k"), "ts", "ts", Seq("px"),
          broadcast = Some(bcast))
        .select("trade", "asof_px").as[(String, Option[Double])]
        .collect().toMap
    val bc = run(true)
    assert(bc === run(false))
    assert(bc("a") === Some(99.0)) // null-ts quote skipped, not indexed
    assert(bc("b") === None)       // null left key
    assert(bc("c") === None)       // null left ts
  }

  test("maxGap TTL draws the same inclusive boundary as the merge exec") {
    withStrategy
    def back(ttl: Long, bcast: Boolean) = collect(AsOfJoinNode.backward(
      trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
      maxGap = Some(ttl), broadcast = Some(bcast)))
    assert(back(2L, bcast = true).contains((1L, 10L, "t1", Some(100.0))))
    assert(back(1L, bcast = true).contains((1L, 10L, "t1", None)))
    assert(back(2L, bcast = true) === back(2L, bcast = false))
    assert(back(1L, bcast = true) === back(1L, bcast = false))
    def fwd(ttl: Long, bcast: Boolean) = collect(AsOfJoinNode.forward(
      trades, quotes, Seq("k"), "ts", "ts", Seq("px"),
      maxGap = Some(ttl), broadcast = Some(bcast)))
    assert(fwd(1L, bcast = true).contains((2L, 15L, "t4", Some(200.0))))
    assert(fwd(0L, bcast = true).contains((2L, 15L, "t4", None)))
    assert(fwd(1L, bcast = true) === fwd(1L, bcast = false))
  }

  test("property: equals the merge exec on randomized string-keyed data") {
    withStrategy
    val rng = new scala.util.Random(31)
    (1 to 3).foreach { round =>
      val l = (1 to 400).map(_ => (s"key-${rng.nextInt(9)}",
        rng.nextInt(500).toLong, rng.nextInt(1000).toString))
      val r = (1 to 300).map(_ => (s"key-${rng.nextInt(11)}",
        rng.nextInt(500).toLong, rng.nextDouble()))
      val lDf = l.toDF("k", "ts", "trade").repartition(7)
      val rDf = r.toDF("k", "ts", "px").repartition(3)
      for (dir <- Seq(false, true)) {
        val f = if (dir) AsOfJoinNode.forward _ else AsOfJoinNode.backward _
        val bc = f(lDf, rDf, Seq("k"), "ts", "ts", Seq("px"), None, Some(true))
          .select("k", "ts", "trade", "asof_px")
          .as[(String, Long, String, Option[Double])].collect().sorted.toSeq
        val merge = f(lDf, rDf, Seq("k"), "ts", "ts", Seq("px"), None, Some(false))
          .select("k", "ts", "trade", "asof_px")
          .as[(String, Long, String, Option[Double])].collect().sorted.toSeq
        assert(bc === merge, s"round $round dir=$dir diverged")
      }
    }
  }

  test("strategy auto-picks broadcast under the threshold, merge above") {
    withStrategy
    val prev = spark.conf.getOption(AsOfJoinStrategy.ThresholdKey)
    try {
      spark.conf.set(AsOfJoinStrategy.ThresholdKey, (10 * 1024 * 1024).toString)
      val auto = AsOfJoinNode.backward(trades, quotes, Seq("k"), "ts", "ts",
        Seq("px")) // tiny reference → broadcast
      assert(planOf(auto).contains("BroadcastAsOfJoin"), planOf(auto))
      spark.conf.set(AsOfJoinStrategy.ThresholdKey, "-1")
      val off = AsOfJoinNode.backward(trades, quotes, Seq("k"), "ts", "ts",
        Seq("px"))
      assert(!planOf(off).contains("BroadcastAsOfJoin"), planOf(off))
    } finally prev match {
      case Some(v) => spark.conf.set(AsOfJoinStrategy.ThresholdKey, v)
      case None => spark.conf.unset(AsOfJoinStrategy.ThresholdKey)
    }
  }
}
