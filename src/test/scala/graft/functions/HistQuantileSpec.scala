package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.functions.expressions.HistQuantile.hist_quantile

/** The histogram sketch must be (a) partition-order independent — the
  * merge path over many partitions gives the SAME answer as one
  * partition (the mergeability that makes it a 100 TB sketch), (b)
  * value-accurate within one bucket width of the exact interpolated
  * percentile, and (c) reachable from SQL via the registered function.
  */
class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val pcts = Seq(0.5, 0.95, 0.99)

  private def sketch(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("event_type")
      .agg(hist_quantile(col("value"), 0.0, 1.0, 1024, pcts).as("qs"))
      .orderBy("event_type")
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1))
      .toMap

  test("merge across many partitions equals the single-partition answer") {
    val ev = Tables.t(spark, sfDir, "events").select("event_type", "value")
    assert(sketch(ev.repartition(13)) === sketch(ev.coalesce(1)))
  }

  test("estimates land within one bucket width of the rank-target value") {
    // The sketch's guarantee is in ITS rank convention: the estimate sits
    // in the bucket containing the order statistic at rank ceil(pct*n),
    // so it is within one bucket width of THAT value. (The interpolated
    // `percentile` uses rank pct*(n-1)+1 — up to one rank away, which in
    // a sparse tail can be several buckets; not the sketch's contract.)
    val ev = Tables.t(spark, sfDir, "events")
    val byType = ev.select("event_type", "value").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    sketch(ev).foreach { case (et, vs) =>
      val sortedVals = byType(et)
      val n = sortedVals.length
      vs.zip(pcts).foreach { case (approx, p) =>
        val target = sortedVals(math.ceil(p * n).toInt - 1)
        assert(math.abs(approx - target) <= 1.0,
          s"$et p$p: sketch $approx vs rank-target $target exceeds bucket width")
      }
    }
  }

  test("values outside [lo, lo + width*n) clamp into the edge buckets") {
    val df = Seq(-5.0, -1.0, 0.5, 1.5, 9.7, 12.0, 99.0).toDF("value")
      .withColumn("event_type", lit("g"))
    // 10 buckets of width 1 over [0, 10): -5/-1 land in bucket 0,
    // 12/99 in bucket 9. p=1.0 must sit inside the last bucket.
    val r = df.groupBy("event_type")
      .agg(hist_quantile(col("value"), 0.0, 1.0, 10, Seq(1.0)).as("qs"))
      .head().getSeq[Double](1)
    assert(r.head >= 9.0 && r.head <= 10.0)
  }

  test("is registered as a SQL function") {
    graft.GraftExtensions.registerFunctions(spark)
    Tables.t(spark, sfDir, "events").createOrReplaceTempView("hq_events")
    val viaSql = spark.sql(
      """SELECT event_type,
        |  hist_quantile(value, CAST(0 AS DOUBLE), CAST(1 AS DOUBLE), 1024,
        |                array(0.5D, 0.95D, 0.99D)) AS qs
        |FROM hq_events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(viaSql === sketch(Tables.t(spark, sfDir, "events")))
  }
}
