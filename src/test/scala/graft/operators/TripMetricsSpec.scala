package graft.operators

import graft.SparkSpec

/** The reference's dbt unit-test fixtures, ported verbatim (SURVEY §5(3),
  * `nyc_taxi_dbt/models/intermediate/_unit_tests.yml:1-86`): exact input
  * rows → exact expected outputs.
  */
class TripMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def trips(rows: (Long, String, String, Double, Double, Double)*) =
    rows.toDF("id", "p", "d", "trip_distance", "fare_amount", "tip_amount")
      .selectExpr("id", "CAST(p AS TIMESTAMP) AS pickup_ts",
        "CAST(d AS TIMESTAMP) AS dropoff_ts",
        "trip_distance", "fare_amount", "tip_amount")

  test("golden row: 30 min / 10 mi / $25 fare / $5 tip (Monday 10am)") {
    // Expected (fixture): duration 30, speed 20.0, cost/mile 2.5,
    // tip% 20.0, Monday, hour 10, weekend=false.
    val row = TripMetrics.withMetrics(trips(
      (1L, "2024-01-15 10:00:00", "2024-01-15 10:30:00", 10.0, 25.0, 5.0))).head()
    assert(row.getAs[Long]("trip_duration_minutes") === 30L)
    assert(row.getAs[Double]("avg_speed_mph") === 20.0)
    assert(row.getAs[Double]("cost_per_mile") === 2.5)
    assert(row.getAs[Double]("tip_percentage") === 20.0)
    assert(row.getAs[String]("pickup_day_of_week") === "Monday")
    assert(row.getAs[Int]("pickup_hour") === 10)
    assert(!row.getAs[Boolean]("is_weekend"))
  }

  test("weekend flags: Saturday and Sunday true, Friday false") {
    val rows = TripMetrics.withMetrics(trips(
      (1L, "2024-01-05 12:00:00", "2024-01-05 12:10:00", 1.0, 5.0, 0.0), // Fri
      (2L, "2024-01-06 12:00:00", "2024-01-06 12:10:00", 1.0, 5.0, 0.0), // Sat
      (3L, "2024-01-07 12:00:00", "2024-01-07 12:10:00", 1.0, 5.0, 0.0)  // Sun
    )).orderBy("id").collect()
    assert(rows.map(_.getAs[Boolean]("is_weekend")).toSeq === Seq(false, true, true))
  }

  test("impossible trips are dropped: 0 min, 780 min, 200 mph") {
    val all = TripMetrics.withMetrics(trips(
      (1L, "2024-01-15 10:00:00", "2024-01-15 10:00:00", 1.0, 5.0, 0.0),  // 0 min
      (2L, "2024-01-15 10:00:00", "2024-01-15 23:00:00", 1.0, 5.0, 0.0),  // 780 min
      (3L, "2024-01-15 10:00:00", "2024-01-15 10:30:00", 100.0, 5.0, 0.0), // 200 mph
      (4L, "2024-01-15 10:00:00", "2024-01-15 10:30:00", 10.0, 25.0, 5.0)  // valid
    ))
    val kept = TripMetrics.plausible(all).select("id").as[Long].collect().toSeq
    assert(kept === Seq(4L))
  }

  test("null on zero divisor: zero distance, zero fare, zero duration") {
    val row = TripMetrics.withMetrics(trips(
      (1L, "2024-01-15 10:00:00", "2024-01-15 10:30:00", 0.0, 0.0, 5.0))).head()
    assert(row.isNullAt(row.fieldIndex("cost_per_mile")))
    assert(row.isNullAt(row.fieldIndex("tip_percentage")))
    val zeroDur = TripMetrics.withMetrics(trips(
      (2L, "2024-01-15 10:00:00", "2024-01-15 10:00:00", 5.0, 10.0, 0.0))).head()
    assert(zeroDur.isNullAt(zeroDur.fieldIndex("avg_speed_mph")))
  }

  test("money canonicalization: decimal(10,2) round") {
    import org.apache.spark.sql.functions._
    val v = Seq((12.345, 0.005)).toDF("a", "b")
      .select(TripMetrics.money(col("a")).as("a"), TripMetrics.money(col("b")).as("b"))
      .head()
    assert(v.getAs[java.math.BigDecimal]("a").doubleValue() === 12.35)
    assert(v.getAs[java.math.BigDecimal]("b").doubleValue() === 0.01)
  }
}
