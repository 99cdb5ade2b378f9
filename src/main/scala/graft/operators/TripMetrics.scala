package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.ColFns._

/** The reference's trip-metric derivations, ported 1:1 from
  * `shared/dbt-models/models/intermediate/int_trip_metrics.sql:27-77`
  * and unit-tested against its exact dbt fixtures
  * (`nyc_taxi_dbt/models/intermediate/_unit_tests.yml:1-86`):
  *
  *  - duration_minutes  = unix-delta / 60 (F7)
  *  - avg_speed_mph     = distance / (duration/60), NULL if duration ≤ 0 (P5)
  *  - cost_per_mile     = fare / distance, NULL if distance ≤ 0 (P5)
  *  - tip_percentage    = tip / fare * 100, NULL if fare ≤ 0 (P5/F10)
  *  - time dims: date, hour, dow (0=Sun), day name, weekend flag (F3–F6)
  *  - plausibility: 1 ≤ duration ≤ 720 AND (speed IS NULL OR speed < 100) (P4)
  *
  * Inputs: pickup_ts, dropoff_ts, trip_distance (miles), fare_amount,
  * tip_amount.
  */
object TripMetrics {

  def withMetrics(trips: DataFrame): DataFrame = {
    val duration = durationMinutes(col("pickup_ts"), col("dropoff_ts"))
    val speed = when(duration > 0,
      round(col("trip_distance") / (duration.cast("double") / 60.0), 2))
    val costPerMile = when(col("trip_distance") > 0,
      round(col("fare_amount") / col("trip_distance"), 2))
    val tipPct = when(col("fare_amount") > 0,
      round(col("tip_amount") / col("fare_amount") * 100.0, 2))
    trips
      .withColumn("trip_duration_minutes", duration)
      .withColumn("avg_speed_mph", speed)
      .withColumn("cost_per_mile", costPerMile)
      .withColumn("tip_percentage", tipPct)
      .withColumn("pickup_date", col("pickup_ts").cast("date"))
      .withColumn("pickup_hour", hour(col("pickup_ts")))
      .withColumn("pickup_day_of_week", dayName(col("pickup_ts")))
      .withColumn("is_weekend", isWeekend(col("pickup_ts")))
  }

  /** P4 plausibility filter: drops impossible trips. */
  def plausible(withMetricsDf: DataFrame): DataFrame =
    withMetricsDf.filter(
      col("trip_duration_minutes").between(1, 720) &&
        (col("avg_speed_mph").isNull || col("avg_speed_mph") < 100))

  /** P1 money canonicalization: round(cast(x as decimal(10,2)), 2). */
  def money(c: Column): Column = round(c.cast(DecimalType(10, 2)), 2)
}
