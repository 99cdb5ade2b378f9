package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per-key daily gap-fill with
  * last-observation-carried-forward AND linear interpolation — the
  * feature-engineering primitive every training pipeline over
  * irregular event data needs (sensor feeds, sparse user activity,
  * market data between quotes).
  *
  * Scale shape: the spine generates per key from that key's own
  * [min, max] span (`sequence` + `explode` — rows never leave their
  * key's partition), the join is keyed, and both backfill windows
  * partition by key — no unpartitioned window, no cross-key data
  * movement beyond the one keyed shuffle. A key's span bounds its
  * blow-up, so a 100 TB corpus of short-lived keys stays linear; one
  * pathological decade-long key costs that key alone.
  *
  * Interpolation contract (the DuckDB-parity shape): an observed day
  * keeps its value; a gap between two observations takes
  * `prev + (next − prev) · Δdays/span` evaluated in that exact IEEE
  * order; leading gaps take the next observation (back-fill), trailing
  * gaps carry the last one forward (LOCF). `locf` is also exposed
  * directly — the step-function variant.
  */
object TimeSeries {

  /** @param df       observations
    * @param keyCol   series key column name
    * @param dayCol   DATE-typed observation day (one row per key+day)
    * @param valueCol DOUBLE-typed observed value
    * @return one row per key per day across the key's span:
    *         (key, day, observed, locf, interp) */
  def gapFillInterpolate(df: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val spans = df.groupBy(keyCol)
      .agg(min(col(dayCol)).as("__mn"), max(col(dayCol)).as("__mx"))
    val spine = spans.select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"),
          expr("interval 1 day"))).as(dayCol))
    val joined = spine.join(df.select(col(keyCol), col(dayCol),
        col(valueCol).as("__v")),
      Seq(keyCol, dayCol), "left")
    val back = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay: Column =
      when(col("__v").isNotNull, col(dayCol))
    val marked = joined
      .withColumn("__locf", last(col("__v"), ignoreNulls = true).over(back))
      .withColumn("__pday", last(obsDay, ignoreNulls = true).over(back))
      .withColumn("__nxt", first(col("__v"), ignoreNulls = true).over(fwd))
      .withColumn("__nday", first(obsDay, ignoreNulls = true).over(fwd))
    marked.select(
      col(keyCol), col(dayCol),
      col("__v").isNotNull.as("observed"),
      col("__locf").as("locf"),
      when(col("__v").isNotNull, col("__v"))
        .when(col("__locf").isNull, col("__nxt"))
        .when(col("__nxt").isNull, col("__locf"))
        .otherwise(col("__locf") + (col("__nxt") - col("__locf")) *
          (datediff(col(dayCol), col("__pday")).cast("double") /
            datediff(col("__nday"), col("__pday")).cast("double")))
        .as("interp"))
  }

  /** Exponentially weighted moving average with a one-day half-life —
    * the adjusted (normalized) EWMA every feature pipeline smooths
    * with: `s_t = Σ_{i≤t} v_i·2^(d_i−d_t) / Σ_{i≤t} 2^(d_i−d_t)`.
    *
    * Exact cross-engine parity by construction: anchoring each key at
    * its own first day turns every weight into an INTEGER power of two
    * (`1L << Δdays`), the numerator/denominator prefix sums run in
    * DECIMAL (exact, ORDER-FREE — a float prefix sum would round
    * differently under DuckDB's segment-tree window evaluation), the
    * shared `2^(−d_t)` factor cancels in the ratio, and only the final
    * division rounds — once, identically, on both engines.
    *
    * Scale shape: one per-key anchor window + two cumulative windows,
    * all partitioned by key — never unpartitioned. The shift bound
    * (span ≤ 62 days per key) is enforced loudly; longer spans belong
    * to a block-re-anchored variant (the weights below 2^-62 are zero
    * in double anyway — the window is effectively 62 half-lives). */
  def ewmaDaily(df: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val perKey = Window.partitionBy(keyCol)
    val prefix = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val di = datediff(col(dayCol), min(col(dayCol)).over(perKey))
    val wt = expr("shiftleft(cast(1 as bigint), cast(case when __di > 62 " +
      "then raise_error('ewmaDaily: key span exceeds 62 days — " +
      "re-anchor in blocks') else __di end as int))")
    df.withColumn("__di", di)
      .withColumn("__wt", wt)
      .withColumn("__num",
        sum(col(valueCol).cast("decimal(18,2)") * col("__wt")).over(prefix))
      .withColumn("__den", sum(col("__wt")).over(prefix))
      .select(col(keyCol), col(dayCol), col(valueCol),
        (col("__num").cast("double") / col("__den").cast("double"))
          .as("ewma"))
  }

  /** Downsample an irregular event series into fixed calendar bars —
    * the OHLC/volume resample (`resample().ohlc()` in dataframe
    * libraries, candlestick bars in market data): per key per
    * `date_trunc(unit)` bucket, the FIRST and LAST value in strict
    * (ts, tieCol) event order plus min/max/sum/count.
    *
    * Scale shape: both rank windows partition by (key, bucket) — the
    * natural grain, never unpartitioned — and the final aggregate
    * reuses the same keys, so the whole resample is ONE keyed shuffle
    * (windows and groupBy share the partitioning). First/last are
    * exact under the total (ts, tieCol) order, not `first()`'s
    * partition-order nondeterminism.
    *
    * @param tieCol total-order tiebreak for equal timestamps (an event
    *               id) — without it, open/close of a bucket with tied
    *               timestamps would be nondeterministic */
  def resampleOhlc(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, tieCol: String, unit: String = "week"): DataFrame = {
    val bucket = date_trunc(unit, col(tsCol)).cast("date")
    val asc = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val desc = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.select(col(keyCol), bucket.as("__bucket"), col(tsCol), col(tieCol),
        col(valueCol).as("__v"))
      .withColumn("__ra", row_number().over(asc))
      .withColumn("__rd", row_number().over(desc))
      .groupBy(col(keyCol), col("__bucket").as("bucket"))
      .agg(
        min(when(col("__ra") === 1, col("__v"))).as("open"),
        max(col("__v")).as("high"),
        min(col("__v")).as("low"),
        min(when(col("__rd") === 1, col("__v"))).as("close"),
        sum(col("__v")).as("volume"),
        count(lit(1)).as("n_events"))
  }
}
