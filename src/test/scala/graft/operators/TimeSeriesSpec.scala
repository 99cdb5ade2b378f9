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
}
