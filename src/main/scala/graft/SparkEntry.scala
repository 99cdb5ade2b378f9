package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is assembled from per-module catalogs (graft.queries.*); each
  * entry pairs a Spark DataFrame program with the ANSI-SQL oracle the
  * driver runs in DuckDB over the same parquet tables. Entries without an
  * oracle get the driver's weaker rows-only check.
  */
object SparkEntry {

  /** Every declared query, in catalog order. */
  def catalog: Seq[Q] =
    CoreQueries.all ++ AnalyticsQueries.all ++ PipelineQueries.all ++
      ExtraQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      VectorQueries.all ++ MultimodalQueries.all ++ MixQueries.all ++
      SqlQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q01PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
