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

  /** Conf reads go through `SQLConf.get` — the thread-local view of
    * the conf of the query BEING PLANNED — never a captured session:
    * a catalog plugin's `SparkSession.active` can name a different
    * session on another thread (observed: a suite-ordering flake where
    * a streaming write read a stale session and silently planned
    * unclustered), and streaming micro-batches plan on a cloned
    * session whose conf is the one that must win. */
  private def conf(key: String): Option[String] =
    Option(org.apache.spark.sql.internal.SQLConf.get
      .getConfString(key, null))

  /** `spark.graft.write.targetFileSize` (bytes) → the advisory
    * partition size the write's AQE rebalance aims for; 0 = Spark's
    * default. Under a clustered distribution this is the file-size
    * control: a skewed partition splits into ~target-size files, tiny
    * partitions coalesce. */
  def targetFileSize: Long =
    conf("spark.graft.write.targetFileSize").map { v =>
      val n = v.toLong
      require(n > 0, s"spark.graft.write.targetFileSize must be " +
        s"positive bytes, got $v")
      n
    }.getOrElse(0L)

  private def mode(spark: SparkSession): String = {
    val m = conf("spark.graft.write.distribution").getOrElse("none")
    require(m == "none" || m == "hash",
      s"spark.graft.write.distribution must be none|hash, got: $m")
    m
  }

  private def sortCols(spark: SparkSession,
      schema: StructType): Seq[String] =
    conf("spark.graft.write.sortBy").toSeq
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
    * to cluster on an unresolvable reference. A HIDDEN transform
    * clusters by the transform EXPRESSION over its (present) source —
    * resolved through the catalog's FunctionCatalog like the SPJ
    * clustering. */
  private def clusterExprs(root: String, schema: StructType)
      : Option[Seq[org.apache.spark.sql.connector.expressions.Expression]] = {
    val tx = Versioned.transformsOf(root).map(t => t.hidden -> t).toMap
    val resolved = Versioned.partitionByOf(root).map { pc =>
      tx.get(pc) match {
        case Some(t) =>
          schema.fieldNames.find(_.equalsIgnoreCase(t.src)).map { f =>
            if (t.fn == "bucket") Expressions.bucket(t.n, f)
              : org.apache.spark.sql.connector.expressions.Expression
            else if (t.fn == "truncate")
              Expressions.apply(t.fn,
                Expressions.literal(java.lang.Integer.valueOf(t.n)),
                Expressions.column(f))
              : org.apache.spark.sql.connector.expressions.Expression
            else Expressions.apply(t.fn, Expressions.column(f))
              : org.apache.spark.sql.connector.expressions.Expression
          }
        case None =>
          schema.fieldNames.find(_.equalsIgnoreCase(pc)).map(f =>
            Expressions.column(f)
              : org.apache.spark.sql.connector.expressions.Expression)
      }
    }
    if (resolved.isEmpty || resolved.exists(_.isEmpty)) None
    else Some(resolved.flatten)
  }

  def distribution(spark: SparkSession, root: String,
      schema: StructType): Distribution =
    if (mode(spark) != "hash") Distributions.unspecified()
    else clusterExprs(root, schema) match {
      case Some(parts) => Distributions.clustered(parts.toArray)
      case None =>
        val s = sortCols(spark, schema)
        if (s.nonEmpty) Distributions.ordered(orderingOf(s))
        else Distributions.unspecified()
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
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    applyV1Declared(spark, df, Versioned.partitionByOf(root),
      Versioned.transformsOf(root))

  /** The V1 layout against a DECLARED spec instead of a manifest —
    * what a staged CTAS/RTAS write uses (the table it is creating has
    * no manifest to read the layout from yet): a partitioned CREATE
    * TABLE … AS SELECT of a wide query still lands O(partitions)
    * files, not O(tasks × partitions). */
  def applyV1Declared(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, partitionBy: Seq[String],
      transforms: Seq[Versioned.PartTransform])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val s = sortCols(spark, df.schema)
    val hash = mode(spark) == "hash"
    // hidden transforms cluster by their derivation expression — the
    // REBALANCE hint only accepts plain column refs, so each transform
    // materializes as a temp column (dropped right after the hint: the
    // rebalance references it, so pruning can't push the drop below),
    // making the shuffle grain and the file-split grain agree exactly
    val tx = transforms.map(t => t.hidden -> t).toMap
    val have = df.schema.fieldNames.map(
      _.toLowerCase(java.util.Locale.ROOT)).toSet
    // temp names dodge user columns (a collision would silently
    // REPLACE the user's column and then drop it)
    def freeName(base: String): String = {
      var n = base
      while (have(n.toLowerCase(java.util.Locale.ROOT))) n = n + "_"
      n
    }
    val parts: Seq[(String, Option[String])] =
      if (!hash) Nil
      else partitionBy.flatMap { pc =>
        tx.get(pc) match {
          case Some(t) if have(t.src.toLowerCase(java.util.Locale.ROOT)) =>
            Some((freeName(s"__graft_rb_${t.hidden}"),
              Some(t.sql(t.srcTypeIn(df.schema)))))
          case Some(_) => None
          case None if have(pc.toLowerCase(java.util.Locale.ROOT)) =>
            Some((pc, None))
          case None => None
        }
      }
    val clustered =
      if (parts.nonEmpty) {
        val temps = parts.collect { case (n, Some(sqlText)) => n -> sqlText }
        val withTemps = temps.foldLeft(df) { case (d, (n, sqlText)) =>
          d.withColumn(n, expr(sqlText)) }
        temps.map(_._1).foldLeft(
          withTemps.hint("rebalance", parts.map(_._1): _*))(_.drop(_))
      }
      else if (hash && s.nonEmpty)
        df.repartitionByRange(s.map(col): _*)
      else df
    if (s.isEmpty) clustered
    else clustered.sortWithinPartitions(s.map(col): _*)
  }
}
