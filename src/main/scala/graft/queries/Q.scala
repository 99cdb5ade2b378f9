package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness oracle.
  * `oracle == None` → the driver records a weaker rows-only check (used for
  * operators whose semantics aren't SQL-expressible, e.g. LSH bucketing with
  * engine-native hashing).
  */
final case class Q(
    name: String,
    oracle: Option[String])(
    val fn: (SparkSession, String) => DataFrame)

object Q {
  /** Entry with a DuckDB oracle. */
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle))(fn)

  /** Rows-only entry (no SQL equivalent). */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, None)(fn)
}
