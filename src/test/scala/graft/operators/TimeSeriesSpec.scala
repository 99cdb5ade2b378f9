package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gap-fill must emit one row per key per day across each key's own
  * span, pass observed values through untouched, back-fill leading
  * gaps, carry trailing gaps forward, and linearly interpolate
  * interior gaps in the documented IEEE order. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("all four arms: observed, leading, interior, trailing") {
    val obs = Seq(
      ("a", d("2024-01-03"), 10.0),
      ("a", d("2024-01-06"), 40.0), // 2-day interior gap: 20, 30
      ("a", d("2024-01-08"), 0.0),  // 1-day interior gap: 20
      ("b", d("2024-02-01"), 5.0)   // single-point key: one row, no gaps
    ).toDF("k", "day", "v")
    val got = TimeSeries.gapFillInterpolate(obs, "k", "day", "v")
      .orderBy("k", "day")
      .as[(String, Date, Boolean, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      ("a", d("2024-01-03"), true, Some(10.0), Some(10.0)),
      ("a", d("2024-01-04"), false, Some(10.0), Some(20.0)),
      ("a", d("2024-01-05"), false, Some(10.0), Some(30.0)),
      ("a", d("2024-01-06"), true, Some(40.0), Some(40.0)),
      ("a", d("2024-01-07"), false, Some(40.0), Some(20.0)),
      ("a", d("2024-01-08"), true, Some(0.0), Some(0.0)),
      ("b", d("2024-02-01"), true, Some(5.0), Some(5.0))))
  }

  test("spans are PER KEY: no key bleeds into another's calendar") {
    val obs = Seq(
      ("x", d("2024-01-01"), 1.0), ("x", d("2024-01-02"), 2.0),
      ("y", d("2024-06-10"), 9.0), ("y", d("2024-06-12"), 11.0)
    ).toDF("k", "day", "v")
    val got = TimeSeries.gapFillInterpolate(obs, "k", "day", "v")
    assert(got.count() === 5) // x: 2 days; y: 3 days — never Jan..Jun
    assert(got.filter(col("k") === "y" && !col("observed"))
      .select("interp").as[Double].head() === 10.0)
  }

  test("x27's declared query runs and exercises real gaps at sf0.001") {
    val out = graft.SparkEntry.queries("x27_gapfill_interp")(
      spark, "/root/testdata/sf0.001")
    val (observed, filled) = (out.filter(col("observed")).count(),
      out.filter(!col("observed")).count())
    assert(observed > 0 && filled > 0,
      s"fixture must contain real gaps (observed=$observed filled=$filled)")
  }

  test("resampleOhlc: hand-computed weekly bars, ties broken by event id") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // week of 2024-01-01 (Mon): open = 5.0 (earliest ts, 01-02),
      // close = 7.0 (latest ts 01-05 23:00; the eid tiebreak picks
      // id 5 over id 3 — same value here, so the bar is tie-stable)
      ("u1", ts("2024-01-03 10:00:00"), 2L, 5.0),
      ("u1", ts("2024-01-02 09:00:00"), 9L, 5.0),
      ("u1", ts("2024-01-03 10:00:00"), 1L, 100.0), // intraweek high
      ("u1", ts("2024-01-05 23:00:00"), 3L, 7.0),
      ("u1", ts("2024-01-05 23:00:00"), 5L, 7.0),
      // next week
      ("u1", ts("2024-01-09 08:00:00"), 6L, 1.0),
      ("u2", ts("2024-01-04 12:00:00"), 7L, 3.0)
    ).toDF("k", "ts", "eid", "v")
    val got = TimeSeries.resampleOhlc(events, "k", "ts", "v", "eid")
      .orderBy("k", "bucket")
      .as[(String, Date, Double, Double, Double, Double, Double, Long)]
      .collect().toSeq
    assert(got === Seq(
      ("u1", d("2024-01-01"), 5.0, 100.0, 5.0, 7.0, 124.0, 5L),
      ("u1", d("2024-01-08"), 1.0, 1.0, 1.0, 1.0, 1.0, 1L),
      ("u2", d("2024-01-01"), 3.0, 3.0, 3.0, 3.0, 3.0, 1L)))
  }

  test("ewmaDaily: hand-computed exact fractions within one block") {
    val obs = Seq(
      ("a", d("2024-01-01"), 10.0),
      ("a", d("2024-01-02"), 20.0),
      ("a", d("2024-01-04"), 0.0), // gap day: weight doubles twice
      ("b", d("2024-03-01"), 7.0)  // independent anchor
    ).toDF("k", "day", "v")
    val got = TimeSeries.ewmaDaily(obs, "k", "day", "v")
      .orderBy("k", "day").select("ewma").as[Double].collect().toSeq
    // a@d1: 10; a@d2: (10·1+20·2)/(1+2); a@d4: (10·1+20·2+0·8)/(1+2+8)
    assert(got === Seq(10.0, 50.0 / 3.0, 50.0 / 11.0, 7.0))
  }

  test("ewmaDaily: block re-anchoring matches the direct definition on " +
      "a 200-day span (the old 62-day limit is gone)") {
    // daily observations over 201 days — crosses three 62-day blocks
    val days = (0 until 201 by 3) :+ 200
    val obs = days.map(i =>
      ("a", Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(i)),
        (1 + i % 17) * 1.0)).toDF("k", "day", "v")
    val got = TimeSeries.ewmaDaily(obs, "k", "day", "v")
      .orderBy("day").select("ewma").as[Double].collect().toSeq
    // direct (untruncated) reference in double: s_t = Σ v_j 2^(d_j−d_t)
    // / Σ 2^(d_j−d_t) — the operator folds blocks ≥ 2 back as zero,
    // which is below 1 ulp for nonnegative values, so a 1e-12 relative
    // tolerance is generous
    val ds = days.toIndexedSeq
    val vs = ds.map(i => (1 + i % 17).toDouble)
    val ref = ds.indices.map { t =>
      val num = (0 to t).map(j => vs(j) * math.pow(2.0, ds(j) - ds(t))).sum
      val den = (0 to t).map(j => math.pow(2.0, ds(j) - ds(t))).sum
      num / den
    }
    assert(got.size === ref.size)
    got.zip(ref).zipWithIndex.foreach { case ((g, r), i) =>
      assert(math.abs(g - r) <= 1e-12 * math.abs(r),
        s"row $i (day ${ds(i)}): got $g, ref $r")
    }
    // boundary sanity: the first row of block 1 (day 63 here) must
    // still see block 0's mass (carry ≠ truncation to the block)
    val day63Idx = ds.indexOf(63)
    assert(math.abs(got(day63Idx) - ref(day63Idx)) <=
      1e-12 * ref(day63Idx))
  }

  test("ewmaDaily: an empty gap block drops sub-ulp history, stays finite") {
    // two clusters 130 days apart: block 0 and block 2, block 1 empty —
    // the older cluster's weight is ≤ 2^-130, folded as zero
    val obs = Seq(
      ("a", d("2024-01-01"), 100.0),
      ("a", d("2024-01-02"), 100.0),
      ("a", d("2024-05-11"), 3.0), // day 131: block 2
      ("a", d("2024-05-12"), 5.0)
    ).toDF("k", "day", "v")
    val got = TimeSeries.ewmaDaily(obs, "k", "day", "v")
      .orderBy("day").select("ewma").as[Double].collect().toSeq
    assert(got(0) === 100.0 && got(1) === 100.0)
    assert(got(2) === 3.0, "fresh block after a gap re-anchors cleanly")
    assert(got(3) === (3.0 + 2 * 5.0) / 3.0)
  }

  test("resampleOhlc is invariant under repartitioning (total order, " +
      "not partition order)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val events = (1 to 500).map { i =>
      ("u" + (i % 7), ts(f"2024-01-${1 + i % 28}%02d 0${i % 9}:00:00"),
        i.toLong, (i % 13) * 1.0)
    }.toDF("k", "ts", "eid", "v")
    val a = TimeSeries.resampleOhlc(events.coalesce(1), "k", "ts", "v", "eid")
      .orderBy("k", "bucket").collect().toSeq
    val b = TimeSeries.resampleOhlc(events.repartition(13), "k", "ts", "v", "eid")
      .orderBy("k", "bucket").collect().toSeq
    assert(a === b)
  }
}
