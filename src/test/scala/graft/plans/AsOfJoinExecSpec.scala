package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOfJoin

/** The custom AsOfJoinExec physical operator must be output-identical to
  * the proven union-window form (AsOfJoin.backward) and plan exactly one
  * exchange per side with the merge running in a single pass.
  */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  // strategy available on the shared session without rebuilding it
  private lazy val withStrategy: Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  // every node in this suite pins the MERGE exec via the hint: the suite
  // gates the co-partitioned path's physics, and the fixtures are
  // broadcast-sized so the auto decision would otherwise always pick
  // BroadcastAsOfJoinExec (which has its own suite). A session-wide
  // threshold pin would leak config into suites that run later.
  private def backward(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame,
      maxGap: Option[Long] = None): org.apache.spark.sql.DataFrame =
    AsOfJoinNode.backward(l, r, Seq("k"), "ts", "ts", Seq("px"), maxGap,
      broadcast = Some(false))
  private def forward(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame,
      maxGap: Option[Long] = None): org.apache.spark.sql.DataFrame =
    AsOfJoinNode.forward(l, r, Seq("k"), "ts", "ts", Seq("px"), maxGap,
      broadcast = Some(false))

  private def trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 30L, "t3"),
    (2L, 15L, "t4"), (3L, 5L, "t5")
  ).toDF("k", "ts", "trade")

  private def quotes = Seq(
    (1L, 8L, 100.0), (1L, 20L, 101.0), (1L, 25L, 102.0),
    (2L, 16L, 200.0), (9L, 1L, 900.0)
  ).toDF("k", "ts", "px")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "ts", "trade", "asof_px")
      .as[(Long, Long, String, Option[Double])].collect().toSet

  test("matches the union-window form on fixtures (incl. equal-ts inclusivity)") {
    withStrategy
    val exec = backward(trades, quotes)
    val win = AsOfJoin.backward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
    val got = collect(exec)
    assert(got === collect(win))
    // hand-checked: t2 at ts=20 sees the EQUAL-ts quote 101 (inclusive);
    // t4 at 15 predates its key's only quote (16) → null; t5 key 3 → null
    assert(got === Set(
      (1L, 10L, "t1", Some(100.0)),
      (1L, 20L, "t2", Some(101.0)),
      (1L, 30L, "t3", Some(102.0)),
      (2L, 15L, "t4", None),
      (3L, 5L, "t5", None)))
  }

  test("plans AsOfJoinExec with exactly one exchange per side") {
    withStrategy
    val df = backward(trades, quotes)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix → renders as "AsOfJoin"
    assert(plan.contains("AsOfJoin "), s"custom exec missing:\n$plan")
    assert("Exchange".r.findAllIn(plan).size === 2,
      s"expected exactly 2 exchanges:\n$plan")
    assert(!plan.contains("Window"), s"no window machinery expected:\n$plan")
  }

  test("null keys and timestamps never match and never block the merge") {
    withStrategy
    val l = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "b"),
      (Some(1L), None, "c")).toDF("k", "ts", "trade")
    val r = Seq((Some(1L), None, 50.0), (Some(1L), Some(5L), 99.0),
      (None, Some(1L), 42.0)).toDF("k", "ts", "px")
    withStrategy
    val got = backward(l, r)
      .select("trade", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(got("a") === Some(99.0)) // the null-ts quote is skipped, not held
    assert(got("b") === None)       // null left key
    assert(got("c") === None)       // null left ts
  }

  test("string-keyed join matches the window form (held key is deep-copied)") {
    withStrategy
    val l = (1 to 500).map(i => (s"key-${i % 7}", i.toLong, s"t$i"))
      .toDF("k", "ts", "trade").repartition(5)
    val r = (1 to 400).map(i => (s"key-${i % 9}", (i * 2).toLong, i * 1.0))
      .toDF("k", "ts", "px").repartition(3)
    val exec = backward(l, r)
      .select("k", "ts", "trade", "asof_px")
      .as[(String, Long, String, Option[Double])].collect().toSet
    val win = graft.operators.AsOfJoin
      .backward(l, r, Seq("k"), "ts", "ts", Seq("px"))
      .select("k", "ts", "trade", "asof_px")
      .as[(String, Long, String, Option[Double])].collect().toSet
    assert(exec === win)
  }

  test("forward direction matches the union-window form (incl. equal-ts)") {
    withStrategy
    val exec = forward(trades, quotes)
    val win = AsOfJoin.forward(trades, quotes, Seq("k"), "ts", "ts", Seq("px"))
    val got = collect(exec)
    assert(got === collect(win))
    // hand-checked: t2 at 20 sees the EQUAL-ts quote 101; t3 at 30 has
    // no later quote → null; t4 at 15 sees 200 at 16
    assert(got === Set(
      (1L, 10L, "t1", Some(101.0)),
      (1L, 20L, "t2", Some(101.0)),
      (1L, 30L, "t3", None),
      (2L, 15L, "t4", Some(200.0)),
      (3L, 5L, "t5", None)))
  }

  test("property: forward equals the window form on randomized data") {
    withStrategy
    val rng = new scala.util.Random(13)
    val l = (1 to 200).map(_ =>
      (rng.nextInt(8).toLong, rng.nextInt(300).toLong, rng.nextInt(1000).toString))
    val r = scala.util.Random.shuffle(
      (for (k <- 0 until 8; t <- 0 until 300) yield (k.toLong, t.toLong)).toList)
      .take(250).map { case (k, t) => (k, t, rng.nextDouble()) }
    val lDf = l.toDF("k", "ts", "trade").repartition(6)
    val rDf = r.toDF("k", "ts", "px").repartition(4)
    val exec = forward(lDf, rDf)
    val win = AsOfJoin.forward(lDf, rDf, Seq("k"), "ts", "ts", Seq("px"))
    assert(collect(exec) === collect(win))
  }

  test("maxGap TTL boundary is inclusive, backward and forward") {
    withStrategy
    // backward: t1 at ts=10 vs quote at ts=8 → gap 2
    def back(ttl: Long) = collect(backward(trades, quotes, maxGap = Some(ttl)))
    assert(back(2L).contains((1L, 10L, "t1", Some(100.0)))) // gap == TTL matches
    assert(back(1L).contains((1L, 10L, "t1", None)))        // gap > TTL nulls
    // forward: t4 at ts=15 vs quote at ts=16 → gap 1
    def fwd(ttl: Long) = collect(forward(trades, quotes, maxGap = Some(ttl)))
    assert(fwd(1L).contains((2L, 15L, "t4", Some(200.0))))
    assert(fwd(0L).contains((2L, 15L, "t4", None)))
    // the window form draws the same boundary
    assert(back(2L) === collect(AsOfJoin.backward(
      trades, quotes, Seq("k"), "ts", "ts", Seq("px"), maxGap = Some(2L))))
    assert(back(1L) === collect(AsOfJoin.backward(
      trades, quotes, Seq("k"), "ts", "ts", Seq("px"), maxGap = Some(1L))))
  }

  test("property: TTL'd exec equals the TTL'd window form, both directions") {
    withStrategy
    val rng = new scala.util.Random(29)
    val l = (1 to 300).map(_ =>
      (rng.nextInt(10).toLong, rng.nextInt(400).toLong, rng.nextInt(1000).toString))
    val rKeys = scala.util.Random.shuffle(
      (for (k <- 0 until 10; t <- 0 until 400) yield (k.toLong, t.toLong))
        .toList).take(300)
    val r = rKeys.map { case (k, t) => (k, t, rng.nextDouble()) }
    val lDf = l.toDF("k", "ts", "trade").repartition(6)
    val rDf = r.toDF("k", "ts", "px").repartition(4)
    for (ttl <- Seq(0L, 7L, 50L)) {
      assert(collect(backward(lDf, rDf, maxGap = Some(ttl))) ===
        collect(AsOfJoin.backward(lDf, rDf, Seq("k"), "ts", "ts",
          Seq("px"), maxGap = Some(ttl))), s"backward ttl=$ttl")
      assert(collect(forward(lDf, rDf, maxGap = Some(ttl))) ===
        collect(AsOfJoin.forward(lDf, rDf, Seq("k"), "ts", "ts",
          Seq("px"), maxGap = Some(ttl))), s"forward ttl=$ttl")
    }
  }

  test("unsupported or mismatched key/ts types fail at node build, not mid-job") {
    val boolKeyed = Seq((true, 10L, "a")).toDF("k", "ts", "trade")
    val boolQuotes = Seq((true, 8L, 1.0)).toDF("k", "ts", "px")
    val e1 = intercept[IllegalArgumentException] {
      backward(boolKeyed, boolQuotes)
    }
    assert(e1.getMessage.contains("key type not supported"))
    // a TTL over a non-integer timestamp type is rejected up front
    val dblTs = Seq((1L, 10.5, "a")).toDF("k", "ts", "trade")
    val dblQs = Seq((1L, 8.5, 1.0)).toDF("k", "ts", "px")
    val e2 = intercept[IllegalArgumentException] {
      backward(dblTs, dblQs,
        maxGap = Some(1L))
    }
    assert(e2.getMessage.contains("maxGap"))
  }

  test("duplicate column names on a side raise an ambiguity error") {
    val dup = trades.select(col("k"), col("k"), col("ts"), col("trade"))
    val e = intercept[IllegalArgumentException] {
      backward(dup, quotes)
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("property: equals the window form on randomized multi-partition data") {
    withStrategy
    val rng = new scala.util.Random(7)
    // 3 rounds of random corpora; unique (k, ts) on the right so the
    // tie rule can't differ between forms
    (1 to 3).foreach { round =>
      val l = (1 to 300).map(_ =>
        (rng.nextInt(12).toLong, rng.nextInt(500).toLong,
          rng.nextInt(1000).toString))
      val rKeys = scala.util.Random.shuffle(
        (for (k <- 0 until 12; t <- 0 until 500) yield (k.toLong, t.toLong))
          .toList).take(400)
      val r = rKeys.map { case (k, t) => (k, t, rng.nextDouble()) }
      val lDf = l.toDF("k", "ts", "trade").repartition(7)
      val rDf = r.toDF("k", "ts", "px").repartition(5)
      val exec = backward(lDf, rDf)
      val win = AsOfJoin.backward(lDf, rDf, Seq("k"), "ts", "ts", Seq("px"))
      assert(exec.select("k", "ts", "trade", "asof_px")
        .as[(Long, Long, String, Option[Double])].collect().sorted.toSeq ===
        win.select("k", "ts", "trade", "asof_px")
          .as[(Long, Long, String, Option[Double])].collect().sorted.toSeq,
        s"round $round diverged")
    }
  }
}
