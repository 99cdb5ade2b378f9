package graft

import graft.queries._

/** Smoke + golden checks over the full declared catalog at sf0.001. */
class CatalogSpec extends SparkSpec {

  test("catalog names are unique and every oracle key has a query") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size === names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.catalog) {
    test(s"${q.name} executes and returns rows at sf0.001") {
      val df = q.fn(spark, sfDir)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q01 golden: six returnflag/linestatus groups with exact counts") {
    val rows = CoreQueries.q01PricingSummary.fn(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "count_order")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows.size === 6)
  }

  test("q08 dedup keeps exactly one row per (user_id, event_type)") {
    val df = CoreQueries.q08DedupRownum.fn(spark, sfDir)
    assert(df.groupBy("user_id", "event_type").count()
      .filter("count > 1").count() === 0)
  }

  test("q12 date spine is 31 days with correct weekend flags") {
    val rows = CoreQueries.q12DateSpine.fn(spark, sfDir).collect()
    assert(rows.length === 31)
    // 2024-01-01 is a Monday: dow=1, not weekend, holiday.
    val jan1 = rows.head
    assert(jan1.getAs[Int]("dow") === 1)
    assert(!jan1.getAs[Boolean]("is_weekend"))
    assert(jan1.getAs[Boolean]("is_holiday"))
    // 2024-01-06 is a Saturday.
    assert(rows(5).getAs[Boolean]("is_weekend"))
  }

  test("x05 sketch distinct count is within 5% of exact") {
    val rows = queries.ExtraQueries.x05ApproxDistinct.fn(spark, sfDir).collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val approx = r.getAs[Long]("approx_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"sketch error too large: exact=$exact approx=$approx")
    }
  }

  test("x09 quantile sketch honors its RANK-error guarantee") {
    // percentile_approx(accuracy = A) guarantees rank error ≤ n/A; the
    // value-relative gap to the interpolated exact percentile is NOT
    // bounded (on small groups nearest-rank vs interpolation differ
    // freely), so the assertion checks what the sketch promises: the
    // returned value's rank sits within the tolerance of q·n.
    val rows = queries.ExtraQueries.x09ApproxQuantiles.fn(spark, sfDir).collect()
    // 5 event types × 3 pcts, every column scalar (the round-4 array
    // shape crashed the driver's pandas compare; this guards the shape).
    assert(rows.length === 15)
    val values = graft.Tables.t(spark, sfDir, "events")
      .select("event_type", "value")
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    rows.foreach { r =>
      val vs = values(r.getString(r.fieldIndex("event_type")))
      val n = vs.length
      assert(r.getAs[Long]("n") === n)
      val q = r.getAs[Double]("pct")
      val tol = math.max(1.0, n / 10000.0 * 2) // 2× slack on ceil effects
      val a = r.getAs[Double]("approx_val")
      val rank = vs.count(_ <= a)
      assert(math.abs(rank - q * n) <= tol + 1,
        s"rank of $a = $rank vs target ${q * n} (n=$n)")
      // exact_val is the interpolated percentile — rank-bounded too.
      val e = r.getAs[Double]("exact_val")
      val erank = vs.count(_ <= e)
      assert(math.abs(erank - q * n) <= tol + 1,
        s"exact rank of $e = $erank vs target ${q * n} (n=$n)")
    }
  }

  test("q07 topk returns exactly 10 in non-increasing spend order") {
    val spends = CoreQueries.q07TopK.fn(spark, sfDir)
      .collect().map(_.getAs[Double]("spend"))
    assert(spends.length === 10)
    assert(spends.sliding(2).forall(p => p(0) >= p(1)))
  }
}
