package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Backward as-of join: for each left row, attach the latest right row
  * whose timestamp is ≤ the left row's timestamp, per key (the
  * point-in-time feature lookup of the reference's Feast variant, J7).
  *
  * Implementation is the union-sort-backfill pattern, not a join: both
  * sides are unioned, sorted by (key, ts) once, and right-side attributes
  * are carried forward with last_value(ignoreNulls) over a window ending
  * at the current row. ONE shuffle on the key, state bounded by the
  * window machinery — where a naive inequality join explodes into
  * |left| × |right-per-key| intermediate rows, this stays linear in
  * |left| + |right| per key, which is what survives a 100 TB fact side.
  *
  * Optional `maxGap` bounds the lookback/lookahead the way a feature
  * store's TTL does (the reference's Feast point-in-time join,
  * pipelines/21-feast-feature-store/feast/features.py:25-62): a match
  * whose time gap exceeds `maxGap` yields nulls instead. Exactness is
  * free — the as-of match is by definition the nearest-in-time candidate,
  * so if IT violates the TTL every other candidate does too; the check
  * is a per-row post-filter, no second window. Units are the timestamp
  * type's natural integer units: MICROSECONDS for timestamp columns,
  * DAYS for dates, the raw value for integer columns. The boundary is
  * inclusive (`gap == maxGap` still matches), mirroring Feast.
  */
object AsOfJoin {

  /** Time gap in natural integer units (micros / days / raw). */
  private def gap(later: Column, earlier: Column, dt: DataType): Column =
    dt match {
      case TimestampType | TimestampNTZType =>
        unix_micros(later) - unix_micros(earlier)
      case DateType => datediff(later, earlier).cast("long")
      case _ => later.cast("long") - earlier.cast("long")
    }

  /** @param left       probe side (keeps all rows)
    * @param right      reference side whose latest-at-or-before row is attached
    * @param key        equi-key columns present on both sides
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param rightVals  right columns to attach (null when no prior row)
    * @param maxGap     optional TTL: null out matches older than this many
    *                   natural units (micros for timestamps, inclusive)
    */
  def backward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      maxGap: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tsType = left.schema(leftTs).dataType
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1)) // probe sorts after reference at equal ts
    // Reference values travel as ONE struct so a probe row always sees a
    // consistent snapshot of a single reference row (per-column backfill
    // could mix rows when individual attributes are null). Under a TTL
    // the reference ts rides along as the struct's FIRST field — it
    // equals `_ts` on every reference row, so rows tied on (key, ts)
    // still compare on the value fields and the tie rule is unchanged.
    val rStruct =
      if (maxGap.isDefined)
        struct((col(rightTs).as("__gap_ts") +: rightVals.map(col)): _*)
      else struct(rightVals.map(col): _*)
    val r = right.select(
      (key.map(col) ++ Seq(col(rightTs).as("_ts"), lit(0).as("_side"),
        rStruct.as("_r"))): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // Carry the most recent reference struct forward; at equal ts the
    // reference row sorts first (_side 0 < 1) so it's visible to the
    // probe. `_r` is the final sort key: among reference rows that tie
    // on (key, ts), the GREATEST value struct deterministically wins
    // (struct ordering is field-wise) — without it, last() would return
    // whichever tied row the shuffle happened to order last, an output
    // that differs between runs. Probe rows all have `_r` null, so the
    // extra key never reorders across sides.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val backfilled = unioned
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    val attach = maxGap match {
      case Some(ttl) =>
        // null gap (no match) short-circuits `when` to null already
        val ok = gap(col(leftTs), col("_asof.__gap_ts"), tsType) <= lit(ttl)
        rightVals.map(c => when(ok, col(s"_asof.$c")).as(s"asof_$c"))
      case None => rightVals.map(c => col(s"_asof.$c").as(s"asof_$c"))
    }
    backfilled.select((leftCols.map(col) ++ attach): _*)
  }

  /** Forward as-of join: the EARLIEST right row whose timestamp is ≥ the
    * left row's (the "next scheduled event" lookup). Mirror of
    * [[backward]]: probe sorts BEFORE reference at equal ts (so an
    * equal-timestamp reference row qualifies) and the first reference
    * struct is pulled from the forward-looking frame. Same single
    * shuffle, same linear state, same inclusive TTL (gap measured as
    * reference-ts minus probe-ts). */
  def forward(left: DataFrame, right: DataFrame, key: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String],
      maxGap: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val tsType = left.schema(leftTs).dataType
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(0)) // probe sorts before reference at equal ts
    val rStruct =
      if (maxGap.isDefined)
        struct((col(rightTs).as("__gap_ts") +: rightVals.map(col)): _*)
      else struct(rightVals.map(col): _*)
    val r = right.select(
      (key.map(col) ++ Seq(col(rightTs).as("_ts"), lit(1).as("_side"),
        rStruct.as("_r"))): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // `_r` as the final sort key mirrors [[backward]]: among reference
    // rows tied on (key, ts), first() deterministically attaches the
    // LEAST value struct instead of a shuffle-order-dependent one.
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_r"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val backfilled = unioned
      .withColumn("_asof", first(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 0)
    val attach = maxGap match {
      case Some(ttl) =>
        val ok = gap(col("_asof.__gap_ts"), col(leftTs), tsType) <= lit(ttl)
        rightVals.map(c => when(ok, col(s"_asof.$c")).as(s"asof_$c"))
      case None => rightVals.map(c => col(s"_asof.$c").as(s"asof_$c"))
    }
    backfilled.select((leftCols.map(col) ++ attach): _*)
  }
}
