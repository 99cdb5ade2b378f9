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
    * with: `s_t = Σ_{i≤t} v_i·2^(d_i−d_t) / Σ_{i≤t} 2^(d_i−d_t)` —
    * at ANY key span (block-re-anchored; no 62-day limit).
    *
    * Exact cross-engine parity by construction: each key's days split
    * into 62-day BLOCKS anchored at the key's first day; within a
    * block every weight is an INTEGER power of two (`1L << (Δdays mod
    * 62)`), and the numerator/denominator prefix sums run in DECIMAL
    * (exact, ORDER-FREE — a float prefix sum would round differently
    * under DuckDB's segment-tree window evaluation). The previous
    * block's exact (num, den) totals carry across the boundary scaled
    * by the block shift — a division by 2^62, EXACT in double (a
    * power-of-two rescale never rounds) — and only the two additions
    * and the final division round, in a fixed shape, identically on
    * both engines.
    *
    * Blocks two or more back (≥ 63 days old under the 1-day
    * half-life) are folded as zero: their relative weight is ≤ 2^-63,
    * below the 2^-53 ulp of the double result — for nonnegative
    * values the returned EWMA is within 1 ulp of the untruncated
    * definition, and the truncation itself is part of the definition
    * both engines replay (parity is exact regardless of sign).
    *
    * Value contract: `valueCol` is evaluated at DECIMAL(18,2) — more
    * than 2 decimal places quantize (half-up), and |Σ v·2^61| must fit
    * decimal(38,2) (values to ~1e3 with 62 daily rows are fine;
    * ≥ 1e16 inputs overflow to NULL under non-ANSI semantics). This
    * is the price of order-free exact prefix sums; a looser float
    * variant would not hash-match across engines.
    *
    * Scale shape: one per-key anchor window, two cumulative windows
    * and one block aggregate, all partitioned by key (or key+block) —
    * never unpartitioned; the carry join is a per-(key, block)
    * broadcast-sized frame. */
  def ewmaDaily(df: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val B = 62
    val twoB = lit(4611686018427387904L).cast("double") // 2^62, exact
    val perKey = Window.partitionBy(keyCol)
    val prefix = Window.partitionBy(keyCol, "__b").orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // persisted (scope-aware): feeds both the per-row prefixes and the
    // block-total carry build — one upstream evaluation, two consumers
    val rows = graft.CacheScope.persist(df
      .withColumn("__di", datediff(col(dayCol), min(col(dayCol)).over(perKey)))
      .withColumn("__b", floor(col("__di") / B))
      .withColumn("__wt",
        expr(s"shiftleft(cast(1 as bigint), cast(__di % $B as int))"))
      .withColumn("__wv", col(valueCol).cast("decimal(18,2)") * col("__wt"))
      .withColumn("__pnum", sum(col("__wv")).over(prefix))
      .withColumn("__pden",
        sum(col("__wt").cast("decimal(20,0)")).over(prefix)))
    // previous block's exact totals (only an ADJACENT block carries:
    // a gap block means everything older is ≥ 63 days back — folded
    // as zero, see above)
    val wb = Window.partitionBy(keyCol).orderBy("__b")
    val carries = rows.groupBy(col(keyCol), col("__b"))
      .agg(sum(col("__wv")).as("__bnum"),
        sum(col("__wt").cast("decimal(20,0)")).as("__bden"))
      .select(col(keyCol), col("__b"),
        when(lag(col("__b"), 1).over(wb) === col("__b") - 1,
          lag(col("__bnum"), 1).over(wb)).as("__cnum"),
        when(lag(col("__b"), 1).over(wb) === col("__b") - 1,
          lag(col("__bden"), 1).over(wb)).as("__cden"))
    rows.join(carries, Seq(keyCol, "__b"))
      .select(col(keyCol), col(dayCol), col(valueCol),
        ((col("__pnum").cast("double") +
            coalesce(col("__cnum").cast("double") / twoB, lit(0.0))) /
          (col("__pden").cast("double") +
            coalesce(col("__cden").cast("double") / twoB, lit(0.0))))
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
