package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join: match each point row to the interval
  * rows [start, end] that contain it, per key.
  *
  * The naive formulation — `points.join(intervals, pt >= start && pt <=
  * end)` — plans a nested-loop join: |points| × |intervals-per-key|
  * comparisons, the classic 100 TB killer for temporal joins. The
  * bucketed formulation quantizes time into `bucket`-second cells: an
  * interval registers in every cell it overlaps, a point looks up only
  * its own cell, and the equi-join on (key, cell) is a plain hash join;
  * the exact containment predicate runs as a post-filter on the tiny
  * per-cell candidate set. Pick `bucket` ≈ typical interval length so
  * interval replication stays O(1).
  */
object RangeJoin {

  /** @param points     rows with a timestamp column `ptCol`
    * @param intervals  rows with [startCol, endCol] timestamp bounds
    * @param key        equi-key columns on both sides
    * @param bucketSeconds  cell width for the quantization
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: Seq[String],
      ptCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 3600): DataFrame = {
    val cellOf: Column => Column = c => (unix_timestamp(c) / bucketSeconds).cast("long")
    val iv = intervals.withColumn("_cell",
      explode(sequence(cellOf(col(startCol)), cellOf(col(endCol)))))
    val pt = points.withColumn("_cell", cellOf(col(ptCol)))
    pt.join(iv, key :+ "_cell")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_cell")
  }
}
