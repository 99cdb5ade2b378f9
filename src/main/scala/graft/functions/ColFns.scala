package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column helpers shared by the query surface.
  *
  * Numeric-parity rules (SURVEY §7.4 items 1/3/5): every money-ish sum is
  * computed over DECIMAL-cast inputs so the aggregate is exact and
  * order-independent (a raw double sum differs between Spark and the DuckDB
  * oracle in the last bits because addition order differs); the final value
  * is cast back to DOUBLE so both engines hand the driver the same type.
  * Averages divide that exact double by the count — a single deterministic
  * IEEE-754 op — rather than averaging doubles.
  *
  * Datetime conventions mirror the reference (SURVEY §2.3 F3–F8):
  * day-of-week is 0=Sunday..6=Saturday (Postgres/DuckDB `extract(dow)`;
  * Spark `dayofweek` is 1-based, hence the -1 — the reference's own Spark
  * dialect block documents this exact adjustment,
  * `shared/benchmarks/queries/q3_hourly_demand.sql` Spark block).
  */
object ColFns {

  /** Cast to DECIMAL(18,2) for exact, order-independent aggregation. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Money as exact integer cents — the window/rolling-aggregate form
    * that sidesteps double .xx5-boundary rounding entirely (q29 lesson). */
  def cents(c: Column): Column = (dec2(c) * 100).cast("long")

  /** Exact money sum surfaced as DOUBLE (same expression the oracle uses). */
  def moneySum(c: Column): Column = sum(dec2(c)).cast("double")

  /** round(exactSum / count, scale) — deterministic cross-engine average. */
  def moneyAvg(c: Column, scale: Int = 2): Column =
    round(moneySum(c) / count(lit(1)), scale)

  /** Half-up integer division of non-negative longs: ⌊(2s + n) / 2n⌋.
    * ROUND on a double quotient diverges between engines at the .5
    * boundaries a large row count reliably hits (Spark rounds the
    * shortest decimal rendering, DuckDB the binary value); integer math
    * has no boundary. Oracle twin: `(2 * s + n) // (2 * n)` (DuckDB).
    * Both inputs must be column NAMES already materialized (the expr
    * parser resolves them). */
  def halfUpDiv(sumCol: String, countCol: String): Column =
    org.apache.spark.sql.functions.expr(
      s"(2 * $sumCol + $countCol) DIV (2 * $countCol)")

  /** 0=Sun..6=Sat day-of-week (reference convention, SURVEY F5). */
  def dow(c: Column): Column = dayofweek(c) - lit(1)

  /** English day name, e.g. 'Monday' (reference `dayname_compat`, F6). */
  def dayName(c: Column): Column = date_format(c, "EEEE")

  /** English month name, e.g. 'January' (F6). */
  def monthName(c: Column): Column = date_format(c, "MMMM")

  /** Weekend flag from the 0=Sun..6=Sat convention (dim_dates.sql:24-27). */
  def isWeekend(c: Column): Column = dow(c).isin(0, 6)

  /** Whole-minute duration via unix-timestamp delta — the reference's own
    * Spark macro (`shared/dbt-models/macros/duration_minutes.sql:19-21`). */
  def durationMinutes(a: Column, b: Column): Column =
    ((unix_timestamp(b) - unix_timestamp(a)) / 60).cast("bigint")

  /** md5 surrogate key over a canonical '|'-joined string rendering of the
    * natural key (reference F1, `stg_yellow_trips.sql:15-23`). Callers must
    * pass columns whose string form is engine-stable (ints, strings,
    * already-formatted timestamps) — never raw doubles. */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("|", cols.map(_.cast("string")): _*))

  /** NULL-on-zero-divisor division (reference P5/F10). */
  def safeDiv(num: Column, den: Column): Column = num / nullif(den, lit(0))
}
