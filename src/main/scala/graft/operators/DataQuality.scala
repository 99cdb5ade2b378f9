package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality assertion library mirroring the reference's 91-test dbt
  * suite (SURVEY §5): each check returns the VIOLATING rows (dbt
  * convention — a passing check returns an empty frame), and
  * `summarize` rolls a suite into one (check_name, violations) table.
  *
  * Checks are plain filters/aggregations — Catalyst pushes them into the
  * scan, and a suite over one table can share the scan via one pass.
  */
object DataQuality {

  final case class Check(name: String, violations: DataFrame)

  def notNull(df: DataFrame, c: String): DataFrame =
    df.filter(col(c).isNull)

  def unique(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)

  def acceptedValues(df: DataFrame, c: String, values: Seq[Any]): DataFrame =
    df.filter(!col(c).isin(values: _*) || col(c).isNull)

  def acceptedRange(df: DataFrame, c: String, lo: Any, hi: Any): DataFrame =
    df.filter(col(c) < lit(lo) || col(c) > lit(hi))

  def positiveValue(df: DataFrame, c: String): DataFrame =
    df.filter(col(c) < 0)

  /** FK `relationships` test: child keys with no parent (anti-join). */
  def relationships(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent, col(childKey) === col(parentKey), "left_anti")

  /** Contract check: schema equality by (name, dataType) in order. */
  def schemaMatches(df: DataFrame, expected: Seq[(String, String)]): Boolean =
    df.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq == expected

  /** Roll a suite into one summary frame, ordered by check name. */
  def summarize(checks: Seq[Check]): DataFrame = {
    val counted = checks.map { c =>
      c.violations.agg(count(lit(1)).cast("bigint").as("violations"))
        .select(lit(c.name).as("check_name"), col("violations"))
    }
    counted.reduce(_ unionAll _).orderBy("check_name")
  }

  /** Unpivot a one-row frame of per-check counts into the summarize
    * schema (check_name, violations) — one row per (name, count column). */
  def countsToSummary(counted: DataFrame,
      checks: Seq[(String, String)]): DataFrame =
    counted.select(explode(array(checks.map { case (name, c) =>
        struct(lit(name).as("check_name"),
          col(c).cast("bigint").as("violations"))
      }: _*)).as("kv"))
      .select(col("kv.check_name").as("check_name"),
        col("kv.violations").as("violations"))

  /** One-pass predicate suite: every check is a row predicate over the
    * SAME source, counted in a single conditional aggregate — one scan
    * instead of one per check. A `summarize` over per-check
    * filter+count frames reads the table once per check, which at
    * 100 TB is |checks|−1 redundant full passes; here the scan runs
    * once and each check rides along as `sum(when(cond, 1))`.
    * Output-identical to
    * `summarize(checks.map { case (n, c) => Check(n, df.filter(c)) })`
    * for checks over this source: a filter keeps exactly the rows the
    * predicate evaluates to true on (null ⇒ dropped ⇒ not counted). */
  def summarizeConditions(df: DataFrame,
      checks: Seq[(String, Column)]): DataFrame = {
    val aggs = checks.zipWithIndex.map { case ((_, cond), i) =>
      coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(s"c$i")
    }
    countsToSummary(df.agg(aggs.head, aggs.tail: _*),
      checks.zipWithIndex.map { case ((name, _), i) => name -> s"c$i" })
  }
}
