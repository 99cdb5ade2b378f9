package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
import org.apache.spark.sql.types.StructType

import graft.operators.Versioned

/** Write-side distribution and ordering for catalog-table writes — the
  * Iceberg `write.distribution-mode` / Delta optimized-write economics,
  * expressed through Spark's own `RequiresDistributionAndOrdering`
  * contract so the SHUFFLE that enforces it is planned by Catalyst
  * (and, because the requirement is declared advisory, executed as an
  * AQE rebalance: small partitions coalesce, skewed partitions split).
  *
  * Why this exists: without a clustered write distribution, every task
  * that sees rows of a partition opens a file in it — an append with T
  * tasks into a table with P live partition tuples emits up to T×P
  * files. At 100 TB (thousands of tasks, thousands of partitions) that
  * is the small-files failure mode that kills both the object store
  * (LIST/PUT amplification) and every later scan (footer reads ≫ data
  * reads). One rebalance by partition value before the write caps the
  * file count at O(partitions), and the skew-aware rebalance keeps one
  * hot partition from serializing into one giant task — the exact
  * trade Iceberg's `hash` distribution mode and Delta's optimized
  * writes make.
  *
  * Knobs (session confs, consistent with the engine's other write
  * knobs; TBLPROPERTIES are deliberately not a surface here):
  *
  *  - `spark.graft.write.distribution` = `none` (default) | `hash`.
  *    `hash` clusters the write by the table's partition columns; on
  *    an unpartitioned table with a sort order it falls back to a
  *    RANGE distribution over the sort columns (the "clustered write"
  *    that gives files disjoint min/max ranges, which is what makes
  *    footer-stats skipping effective on unpartitioned tables).
  *  - `spark.graft.write.sortBy` = CSV of columns: rows are sorted
  *    within each write task, so every file's row groups carry narrow
  *    min/max ranges for those columns — the reader-level row-group /
  *    page skipping gets real selectivity instead of file-wide spans.
  *
  * Misconfiguration is loud: a sortBy column missing from the write
  * schema throws (a silently ignored sort order would quietly write
  * unclustered files forever).
  */
private[sources] object GraftWriteLayout {

  private def mode(spark: SparkSession): String = {
    val m = spark.conf.getOption("spark.graft.write.distribution")
      .getOrElse("none")
    require(m == "none" || m == "hash",
      s"spark.graft.write.distribution must be none|hash, got: $m")
    m
  }

  private def sortCols(spark: SparkSession,
      schema: StructType): Seq[String] =
    spark.conf.getOption("spark.graft.write.sortBy").toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
      .map { n =>
        schema.fieldNames.find(_.equalsIgnoreCase(n)).getOrElse(
          throw new IllegalArgumentException(
            s"spark.graft.write.sortBy column '$n' is not in the " +
              s"write schema (${schema.fieldNames.mkString(", ")})"))
      }

  /** Partition columns that are actually present in the write schema —
    * a write that omits one fails later with the writer's own loud
    * error; the distribution just stands down rather than asking Spark
    * to cluster on an unresolvable reference. */
  private def clusterCols(root: String, schema: StructType): Seq[String] =
    Versioned.partitionByOf(root).flatMap(pc =>
      schema.fieldNames.find(_.equalsIgnoreCase(pc)))

  def distribution(spark: SparkSession, root: String,
      schema: StructType): Distribution =
    if (mode(spark) != "hash") Distributions.unspecified()
    else {
      val parts = clusterCols(root, schema)
      if (parts.nonEmpty)
        Distributions.clustered(
          parts.map(p => Expressions.column(p)
            : org.apache.spark.sql.connector.expressions.Expression)
            .toArray)
      else {
        val s = sortCols(spark, schema)
        if (s.nonEmpty) Distributions.ordered(orderingOf(s))
        else Distributions.unspecified()
      }
    }

  def ordering(spark: SparkSession, root: String,
      schema: StructType): Array[SortOrder] =
    orderingOf(sortCols(spark, schema))

  private def orderingOf(cols: Seq[String]): Array[SortOrder] =
    cols.map(c => Expressions.sort(Expressions.column(c),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
      .toArray

  /** The same layout applied DataFrame-side for the V1 bridge writes
    * (plain INSERT INTO / INSERT OVERWRITE / replaceWhere): Spark's
    * V2Writes only rewrites the query for genuine V2 writes, so the
    * bridge enforces the distribution itself — a REBALANCE hint by
    * partition value (AQE splits skewed partitions and coalesces tiny
    * ones, same as the advisory V2 requirement), range-partitioned by
    * the sort columns when the table is unpartitioned, and a
    * task-local sort so every file's row groups carry narrow stats. */
  def applyV1(spark: SparkSession, root: String,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val s = sortCols(spark, df.schema)
    val hash = mode(spark) == "hash"
    val parts = if (hash) clusterCols(root, df.schema) else Nil
    val clustered =
      if (parts.nonEmpty) df.hint("rebalance", parts: _*)
      else if (hash && s.nonEmpty)
        df.repartitionByRange(s.map(org.apache.spark.sql.functions.col): _*)
      else df
    if (s.isEmpty) clustered
    else clustered.sortWithinPartitions(
      s.map(org.apache.spark.sql.functions.col): _*)
  }
}
