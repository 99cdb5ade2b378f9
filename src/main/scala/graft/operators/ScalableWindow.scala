package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ColFns.dec2

/** Scale-safe replacements for unpartitioned windows.
  *
  * `SUM(x) OVER ()` and friends plan a WindowExec with no partition keys:
  * Spark moves EVERY row to a single partition (the "No Partition Defined
  * for Window operation" warning). Fine on a 5-row frame, fatal on a
  * 100 TB fact table — one task, one executor, full-table spill.
  *
  * Two patterns restore scale:
  *  - [[withGlobalShare]]: the global aggregate is ONE row — compute it
  *    with a partial-aggregating `agg` (map-side combine, tree reduce)
  *    and broadcast-cross-join it back. Every row stays in its original
  *    partition; the only data movement is the one-row broadcast.
  *  - [[runningTotal]]: a running total is inherently sequential, but
  *    only *across* bucket boundaries. Partition the window by a coarse
  *    time bucket (e.g. month), run the window inside each bucket in
  *    parallel, then add per-bucket prefix offsets. The offsets come
  *    from a driver-side fold over the per-bucket totals — bounded by
  *    the number of buckets (months, not rows), the same trick
  *    `zipWithIndex` uses for partition offsets.
  *
  * Reference behavior mirrored: percent-of-total marts
  * (`models/gold/mart_revenue_share.sql`-style) and running-revenue marts
  * (`shared/benchmarks/queries/q1_daily_revenue.sql`) — reimplemented
  * Spark-first rather than as window-function translations.
  */
object ScalableWindow {

  /** Append `outCol` = rowValue / globalTotal-style share without a
    * global window. `totalAgg` is the one-row global aggregate (e.g.
    * `sum(dec2(col("v")))`); `share` builds the output column from the
    * broadcast total.
    */
  def withGlobalShare(
      df: DataFrame,
      totalAgg: Column,
      outCol: String,
      share: (DataFrame, Column) => Column): DataFrame = {
    // Persist the (group-grain, small-by-construction) input: it feeds
    // BOTH the one-row total and the probe side, and without this the
    // caller's whole upstream aggregation evaluates twice. MEMORY_AND_DISK
    // keeps the contract safe if a caller passes a larger frame.
    val shared = graft.CacheScope.persist(df)
    val total = shared.agg(totalAgg.as("__global_total"))
    val joined = shared.crossJoin(broadcast(total))
    joined.withColumn(outCol, share(joined, col("__global_total")))
      .drop("__global_total")
  }

  /** Exact (decimal) running total of `valueCol` in `orderCol` order,
    * parallel across `bucketCol` partitions. Returns the input plus
    * `cumCol` (DOUBLE, rounded to `scale`) and `lagCol` (previous row's
    * value in global order, NULL for the first row overall).
    *
    * The per-bucket offset fold collects one row per bucket — for a
    * day-grain frame bucketed by month that is 12 rows/year regardless
    * of fact-table size.
    */
  def runningTotal(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      bucketCol: Column,
      cumCol: String,
      lagCol: String,
      scale: Int = 2): DataFrame = {
    // Persist: the bucketed frame feeds BOTH the in-bucket window and
    // the per-bucket offset collect below — without it a
    // nondeterministic upstream (sample, repartition-race) could make
    // the offsets diverge from the ranked rows.
    val bucketed = graft.CacheScope.persist(
      df.withColumn("__bucket", bucketCol))
    val w = Window.partitionBy("__bucket").orderBy(orderCol)
    val inBucket = bucketed
      .withColumn("__cum_in_bucket",
        sum(dec2(col(valueCol)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__lag_in_bucket", lag(col(valueCol), 1).over(w))
      // Identify each bucket's first row explicitly: a NULL in-bucket lag
      // can also mean "previous value IS NULL", and only the true first
      // row may take the previous bucket's last value.
      .withColumn("__rn_in_bucket", row_number().over(w))

    // One row per bucket: (bucket, total, last value in bucket order).
    val perBucket = bucketed.groupBy("__bucket")
      .agg(sum(dec2(col(valueCol))).as("__tot"),
        max_by(col(valueCol), col(orderCol)).as("__last"))
      .orderBy("__bucket")
      .collect() // bounded by bucket count (months), not data size

    var running = BigDecimal(0)
    var prevLast: Option[Any] = None
    val offsets = perBucket.map { r =>
      val off = running
      // an all-NULL bucket sums to NULL: contributes 0 to the offsets
      if (r.getDecimal(1) != null) running += BigDecimal(r.getDecimal(1))
      val boundary = prevLast
      prevLast = Some(r.get(2))
      (r.get(0), off, boundary.orNull)
    }.toSeq
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val offDf = spark.createDataFrame(
      offsets.map { case (b, off, bl) =>
        org.apache.spark.sql.Row(b, off.bigDecimal, bl)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        bucketed.schema("__bucket").copy(name = "__obucket", nullable = true),
        org.apache.spark.sql.types.StructField("__offset",
          // widened: the window's own sum type is DECIMAL(28,2); a
          // cross-bucket cumulative in (18,2) overflows to NULL first
          org.apache.spark.sql.types.DecimalType(38, 2)),
        // nullable: the first bucket has no previous-last value, even
        // when the value column itself is non-nullable.
        df.schema(valueCol).copy(name = "__prev_last", nullable = true))))

    // Null-safe bucket equality: a NULL bucket key must still find its
    // offset row, not be dropped by the join.
    inBucket.join(broadcast(offDf), col("__bucket") <=> col("__obucket"))
      .withColumn(cumCol,
        round((col("__cum_in_bucket") + col("__offset")).cast("double"), scale))
      // Only a bucket's true FIRST row takes the previous bucket's last
      // value; later rows keep their in-bucket lag even when it is NULL
      // (a legitimately NULL previous value).
      .withColumn(lagCol, when(col("__rn_in_bucket") === 1, col("__prev_last"))
        .otherwise(col("__lag_in_bucket")))
      .drop("__bucket", "__cum_in_bucket", "__lag_in_bucket",
        "__rn_in_bucket", "__obucket", "__offset", "__prev_last")
  }

  /** Exact global `ROW_NUMBER() OVER (ORDER BY orderCols…)` (ascending)
    * without an unpartitioned window: rank inside coarse buckets in
    * parallel, then add per-bucket COUNT prefix offsets — the
    * [[runningTotal]] trick applied to ranking. The driver fold
    * collects one (bucket, count) row per bucket, bounded by bucket
    * cardinality, never rows.
    *
    * Contract: `bucketCol` must be MONOTONE NON-DECREASING in the
    * global order — every row of a lesser bucket precedes every row of
    * a greater bucket (e.g. the leading order expression coarsened:
    * `score div 100` for `ORDER BY score, id`). Buckets compare by
    * their natural Scala ordering in the driver fold; a NULL bucket is
    * rejected (order its rows explicitly instead). */
  def globalRank(
      df: DataFrame,
      bucketCol: Column,
      orderCols: Seq[Column],
      rankCol: String): DataFrame = {
    // Same double-evaluation persist as runningTotal/withGlobalShare:
    // the local ranks and the per-bucket counts must see ONE snapshot.
    val bucketed = graft.CacheScope.persist(
      df.withColumn("__bucket", bucketCol))
    val w = Window.partitionBy("__bucket").orderBy(orderCols: _*)
    val local = bucketed.withColumn("__rn", row_number().over(w))
    val perBucket = bucketed.groupBy("__bucket")
      .agg(count(lit(1)).as("__cnt"))
      .orderBy("__bucket")
      .collect() // one row per bucket — bucket cardinality, not data
    require(!perBucket.exists(_.isNullAt(0)),
      "globalRank: NULL bucket key — bucketCol must be total on the data")
    var running = 0L
    val offsets = perBucket.map { r =>
      val off = running
      running += r.getLong(1)
      (r.get(0), off)
    }.toSeq
    import scala.jdk.CollectionConverters._
    val offDf = df.sparkSession.createDataFrame(
      offsets.map { case (b, off) =>
        org.apache.spark.sql.Row(b, java.lang.Long.valueOf(off))
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        bucketed.schema("__bucket").copy(name = "__obucket"),
        org.apache.spark.sql.types.StructField("__offset",
          org.apache.spark.sql.types.LongType, nullable = false))))
    local.join(broadcast(offDf), col("__bucket") === col("__obucket"))
      .withColumn(rankCol, (col("__rn") + col("__offset")).cast("long"))
      .drop("__bucket", "__rn", "__obucket", "__offset")
  }
}
