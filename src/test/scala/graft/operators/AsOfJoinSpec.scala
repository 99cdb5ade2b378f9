package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("backward as-of picks the latest at-or-before row per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "T1"),
      (1L, ts("2024-01-01 10:00:20"), "T2"),
      (2L, ts("2024-01-01 10:00:10"), "T3")
    ).toDF("k", "t", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (1L, ts("2024-01-01 10:00:20"), 102.0), // equal ts → visible to T2
      (2L, ts("2024-01-01 10:00:30"), 200.0)  // after T3 → null
    ).toDF("k", "t", "px")

    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "t", "t", Seq("px"))
      .select("trade", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out("T1") === Some(100.0))
    assert(out("T2") === Some(102.0)) // equal timestamp counts (>=)
    assert(out("T3") === None)        // no quote at or before
  }

  test("forward as-of picks the earliest at-or-after row per key") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "T1"),
      (1L, ts("2024-01-01 10:00:20"), "T2"),
      (2L, ts("2024-01-01 10:00:10"), "T3")
    ).toDF("k", "t", "trade")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:10"), 101.0),
      (1L, ts("2024-01-01 10:00:20"), 102.0), // equal ts → visible to T2
      (2L, ts("2024-01-01 10:00:00"), 200.0)  // before T3 → null
    ).toDF("k", "t", "px")

    val out = AsOfJoin.forward(trades, quotes, Seq("k"), "t", "t", Seq("px"))
      .select("trade", "asof_px").as[(String, Option[Double])]
      .collect().toMap
    assert(out("T1") === Some(101.0)) // earliest at-or-after, not latest
    assert(out("T2") === Some(102.0)) // equal timestamp counts (<=)
    assert(out("T3") === None)        // no quote at or after
  }

  test("reference rows tied on (key, ts) resolve deterministically") {
    val probes = Seq((1L, ts("2024-01-01 10:00:10"), "P")).toDF("k", "t", "tag")
    // three reference rows at the SAME (key, ts): without the value
    // tiebreaker, which one attaches would depend on shuffle order
    val tied = Seq(
      (1L, ts("2024-01-01 10:00:00"), 30.0),
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 10:00:00"), 20.0)
    ).toDF("k", "t", "v")
    // run against several physical layouts of the same data — the
    // result must be identical (greatest struct for backward, least
    // for forward), not whichever row happened to sort last
    (1 to 4).foreach { p =>
      val shuffled = tied.repartition(p)
      val b = AsOfJoin.backward(probes, shuffled, Seq("k"), "t", "t", Seq("v"))
        .select("asof_v").as[Double].head()
      assert(b === 30.0, s"backward tie must pick the greatest value (p=$p)")
      val earlyProbe = Seq((1L, ts("2024-01-01 09:00:00"), "P"))
        .toDF("k", "t", "tag")
      val f = AsOfJoin.forward(earlyProbe, shuffled, Seq("k"), "t", "t", Seq("v"))
        .select("asof_v").as[Double].head()
      assert(f === 10.0, s"forward tie must pick the least value (p=$p)")
    }
  }

  test("as-of keeps every probe row exactly once") {
    val probes = Seq((1L, ts("2024-01-01 00:00:01"), "a"),
      (1L, ts("2024-01-01 00:00:01"), "b")).toDF("k", "t", "tag")
    val refs = Seq((1L, ts("2024-01-01 00:00:00"), 1.0)).toDF("k", "t", "v")
    val out = AsOfJoin.backward(probes, refs, Seq("k"), "t", "t", Seq("v"))
    assert(out.count() === 2)
  }
}
