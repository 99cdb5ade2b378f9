package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Versioned

/** Metadata-only aggregate pushdown (`SupportsPushDownAggregates` →
  * `LocalScan`): COUNT/MIN/MAX and GROUP-BY-partition queries answer
  * from the manifest as a `LocalTableScan` — zero tasks, zero data IO
  * — and REFUSE (falling back to the ordinary scan, same answer)
  * whenever the manifest cannot prove exactness. */
class GraftMetaAggSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-metaagg-wh").toString
    spark.conf.set("spark.sql.catalog.graftma",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftma.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftma.m")
    w
  }

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  private def isMetaOnly(df: DataFrame): Boolean = {
    val p = df.queryExecution.executedPlan.toString
    p.contains("LocalTableScan") && !p.contains("BatchScan")
  }

  /** The pushed and fallback plans must agree cell-for-cell. */
  private def assertPushed(q: String): Unit = {
    val df = sql(q)
    assert(isMetaOnly(df), s"expected metadata-only plan for: $q\n" +
      df.queryExecution.executedPlan.toString)
  }

  private def assertFallback(q: String): Unit = {
    val df = sql(q)
    assert(!isMetaOnly(df), s"expected ordinary-scan fallback for: $q")
  }

  /** The shared base table: partitioned by `day`, stats on id/s/d/v. */
  private lazy val baseReady: Unit = {
    sql("CREATE TABLE graftma.m.t (id BIGINT, v DOUBLE, s STRING, " +
      "d DATE) PARTITIONED BY (day STRING)")
    val root = s"$warehouse/m/t"
    val df = (0 until 500).map { i =>
      (i.toLong, i * 1.5, if (i % 7 == 0) null else s"s$i",
        java.sql.Date.valueOf(s"2024-01-${i % 9 + 1}"),
        s"d${i % 3}")
    }.toDF("id", "v", "s", "d", "day").repartition(3)
    Versioned.commit(spark, root, df, partitionBy = Seq("day"),
      statsCols = Seq("id", "s", "d", "v"))
    ()
  }

  test("COUNT(*), COUNT(col), MIN/MAX answer from the manifest as a " +
      "LocalTableScan, matching the scan answer exactly") {
    baseReady

    val pushed = sql("SELECT count(*) AS n, count(s) AS ns, " +
      "min(id) AS mni, max(id) AS mxi, min(s) AS mns, max(s) AS mxs, " +
      "min(d) AS mnd, max(d) AS mxd, min(day) AS mnp, max(day) AS mxp " +
      "FROM graftma.m.t")
    assert(isMetaOnly(pushed), pushed.queryExecution.executedPlan.toString)
    val r = pushed.head()
    assert(r.getLong(0) === 500L)
    assert(r.getLong(1) === 500L - (0 until 500).count(_ % 7 == 0))
    assert((r.getLong(2), r.getLong(3)) === ((0L, 499L)))
    assert(r.getString(4) === (0 until 500).filter(_ % 7 != 0)
      .map(i => s"s$i").min)
    assert(r.getString(5) === (0 until 500).filter(_ % 7 != 0)
      .map(i => s"s$i").max)
    assert(r.getDate(6).toString === "2024-01-01")
    assert(r.getDate(7).toString === "2024-01-09")
    assert((r.getString(8), r.getString(9)) === (("d0", "d2")))
  }

  test("GROUP BY the partition column answers per-partition counts " +
      "and bounds from per-file single-valued stats") {
    baseReady
    val pushed = sql("SELECT day, count(*) AS n, count(s) AS ns, " +
      "max(id) AS mx FROM graftma.m.t GROUP BY day")
    assert(isMetaOnly(pushed), pushed.queryExecution.executedPlan.toString)
    val got = pushed.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val want = (0 until 500).groupBy(i => s"d${i % 3}").toSeq.map {
      case (day, is) => (day, is.size.toLong,
        is.count(_ % 7 != 0).toLong, is.max.toLong)
    }.sorted
    assert(got.toSeq === want)
  }

  test("refusal cases fall back to the ordinary scan: WHERE clause, " +
      "double MIN/MAX, timestamp bounds (INT96 footers), DISTINCT, " +
      "expression aggregates, GROUP BY a non-single-valued column") {
    baseReady
    assertFallback("SELECT count(*) AS n FROM graftma.m.t WHERE id > 10")
    assert(sql("SELECT count(*) AS n FROM graftma.m.t WHERE id > 10")
      .as[Long].head() === 489L)
    assertFallback("SELECT min(v) AS m FROM graftma.m.t") // double: NaN
    assert(sql("SELECT min(v) AS m FROM graftma.m.t")
      .as[Double].head() === 0.0)
    assertFallback("SELECT count(DISTINCT day) AS n FROM graftma.m.t")
    assertFallback("SELECT max(id + 1) AS m FROM graftma.m.t")
    assertFallback("SELECT id, count(*) AS n FROM graftma.m.t GROUP BY id")
    // a column with NO recorded stats refuses MIN/MAX but not COUNT(*)
    sql("CREATE TABLE graftma.m.nostats (a BIGINT, b STRING)")
    sql("INSERT INTO graftma.m.nostats VALUES (1, 'x'), (2, NULL)")
    assertFallback("SELECT max(a) AS m FROM graftma.m.nostats")
    assertFallback("SELECT count(b) AS n FROM graftma.m.nostats")
    assertPushed("SELECT count(*) AS n FROM graftma.m.nostats")
    assert(sql("SELECT count(*) AS n FROM graftma.m.nostats")
      .as[Long].head() === 2L)
  }

  test("an empty table answers count 0 / NULL bounds globally and " +
      "zero rows grouped") {
    sql("CREATE TABLE graftma.m.empty (id BIGINT) PARTITIONED BY (p STRING)")
    val g = sql("SELECT count(*) AS n, max(p) AS mx FROM graftma.m.empty")
    assert(isMetaOnly(g))
    val r = g.head()
    assert(r.getLong(0) === 0L && r.isNullAt(1))
    val grouped = sql(
      "SELECT p, count(*) AS n FROM graftma.m.empty GROUP BY p")
    assert(isMetaOnly(grouped) && grouped.count() === 0L)
  }

  test("column mapping: RENAME COLUMN keeps answering through the " +
      "physical stats key") {
    sql("CREATE TABLE graftma.m.ren (id BIGINT) PARTITIONED BY (day STRING)")
    val root = s"$warehouse/m/ren"
    Versioned.commit(spark, root,
      Seq((1L, "a"), (2L, "b")).toDF("id", "day"),
      partitionBy = Seq("day"), statsCols = Seq("id"))
    // partition columns cannot rename (the layout derives from them);
    // the mapping test is the DATA column, whose stats stay keyed
    // under the original physical name
    sql("ALTER TABLE graftma.m.ren RENAME COLUMN id TO event_id")
    assertPushed("SELECT max(day) AS m, max(event_id) AS i " +
      "FROM graftma.m.ren")
    val r = sql("SELECT max(day) AS m, max(event_id) AS i " +
      "FROM graftma.m.ren").head()
    assert((r.getString(0), r.getLong(1)) === (("b", 2L)))
    assertPushed("SELECT day, count(*) AS n, min(event_id) AS mn " +
      "FROM graftma.m.ren GROUP BY day")
    assert(sql("SELECT day, count(*) AS n, min(event_id) AS mn " +
      "FROM graftma.m.ren GROUP BY day").collect().map(x =>
      (x.getString(0), x.getLong(1), x.getLong(2))).sorted.toSeq ===
      Seq(("a", 1L, 1L), ("b", 1L, 2L)))
  }

  test("pending merge-on-read state: COUNT(*) answers metadata-only " +
      "from exact DV cardinality; min/max still refuse") {
    sql("CREATE TABLE graftma.m.mor (id BIGINT, v DOUBLE)")
    val root = s"$warehouse/m/mor"
    Versioned.commit(spark, root,
      (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .coalesce(1), statsCols = Seq("id"))
    assertPushed("SELECT count(*) AS n FROM graftma.m.mor")
    // a DV delete leaves the data file in place; deletion vectors are
    // EXACT, so COUNT(*) stays metadata-only (rows − deleted) — MoR's
    // steady state keeps its count/watermark probes zero-task
    Versioned.deleteRows(spark, root, col("id").isin(5L, 6L))
    assertPushed("SELECT count(*) AS n FROM graftma.m.mor")
    assert(sql("SELECT count(*) AS n FROM graftma.m.mor")
      .as[Long].head() === 98L)
    // a deleted row may carry the extremum / shift null counts:
    // anything but COUNT(*) refuses into the anti-filtered scan
    assertFallback("SELECT max(id) AS m FROM graftma.m.mor")
    assertFallback("SELECT count(v) AS n FROM graftma.m.mor")
    assertFallback("SELECT count(*) AS n, max(id) AS m FROM graftma.m.mor")
    assert(sql("SELECT max(id) AS m FROM graftma.m.mor")
      .as[Long].head() === 99L)
    // compaction materializes the vectors AND inherits the manifest's
    // skipping index (a maintenance rewrite must not drop it), so the
    // whole metadata surface resumes — including MIN/MAX on `id`
    Versioned.compact(spark, root)
    assertPushed("SELECT count(*) AS n FROM graftma.m.mor")
    assert(sql("SELECT count(*) AS n FROM graftma.m.mor")
      .as[Long].head() === 98L)
    assertPushed("SELECT max(id) AS m, min(id) AS mn FROM graftma.m.mor")
    val rc = sql("SELECT max(id) AS m, min(id) AS mn FROM graftma.m.mor")
      .head()
    assert((rc.getLong(0), rc.getLong(1)) === ((99L, 0L)))
  }

  test("sidecar-spilled DVs: COUNT(*) answers with ZERO Spark jobs — " +
      "the manifest's recorded cardinality replaces the sidecar scan") {
    sql("CREATE TABLE graftma.m.morsc (id BIGINT)")
    val root = s"$warehouse/m/morsc"
    Versioned.commit(spark, root,
      (0 until 200).map(_.toLong).toDF("id").coalesce(2))
    // threshold 0 forces executor-written position sidecars; the
    // publish records each file's exact spilled count in the manifest
    Versioned.deleteRows(spark, root, col("id") % 4 === 0L,
      inlineThreshold = 0)
    val v = Versioned.latestVersion(root).get
    assert(Versioned.dvDeletedCountsExact(root, v)
      .exists(_.values.sum === 50L))
    // a job group makes the count synchronous (statusTracker, no
    // listener race): PLANNING runs on this thread, so the old
    // sidecar-counting parquet scan would land a job in the group.
    // (Collecting the final LocalTableScan later runs one driver-local
    // job with no data IO — that's Spark's collect machinery, not a
    // scan; only the planning window must be job-free.)
    spark.sparkContext.setJobGroup("magg-dv-zero", "zero-job probe")
    val df = try {
      val df = sql("SELECT count(*) AS n FROM graftma.m.morsc")
      assert(isMetaOnly(df)) // forces the executed plan — planning done
      val jobs = spark.sparkContext.statusTracker
        .getJobIdsForGroup("magg-dv-zero")
      assert(jobs.isEmpty,
        s"planning metadata COUNT(*) under sidecar DVs launched " +
          s"${jobs.length} job(s) — the cardinality must come from " +
          "the manifest, not a sidecar scan")
      df
    } finally spark.sparkContext.clearJobGroup()
    assert(df.as[Long].head() === 150L)
  }

  test("schema evolution: COUNT(col) refuses while any live file " +
      "predates the column; COUNT(*) keeps answering") {
    sql("CREATE TABLE graftma.m.evo (id BIGINT)")
    sql("INSERT INTO graftma.m.evo VALUES (1), (2)")
    sql("ALTER TABLE graftma.m.evo ADD COLUMNS (tag STRING)")
    assertPushed("SELECT count(*) AS n FROM graftma.m.evo")
    assertFallback("SELECT count(tag) AS n FROM graftma.m.evo")
    assert(sql("SELECT count(tag) AS n FROM graftma.m.evo")
      .as[Long].head() === 0L)
  }

  test("all-null files contribute nothing to MIN/MAX (null-count " +
      "proof) and NULL results surface when every row is null") {
    sql("CREATE TABLE graftma.m.nulls (id BIGINT, s STRING)")
    val root = s"$warehouse/m/nulls"
    Versioned.commit(spark, root,
      Seq((1L, null: String), (2L, null: String)).toDF("id", "s")
        .coalesce(1), statsCols = Seq("s"))
    val r0 = sql("SELECT min(s) AS m, count(s) AS n FROM graftma.m.nulls")
    assert(isMetaOnly(r0))
    assert(r0.head().isNullAt(0) && r0.head().getLong(1) === 0L)
    Versioned.commit(spark, root,
      Seq((3L, "zz"), (4L, null: String)).toDF("id", "s").coalesce(1),
      statsCols = Seq("s"), mode = "append")
    val r1 = sql("SELECT min(s) AS mn, max(s) AS mx, count(s) AS n " +
      "FROM graftma.m.nulls")
    assert(isMetaOnly(r1))
    assert(r1.head().getString(0) === "zz" &&
      r1.head().getString(1) === "zz" && r1.head().getLong(2) === 1L)
  }

  test("non-ASCII string bounds refuse (footer bounds merge in " +
      "UTF-16 order; exactness is only provable in ASCII)") {
    sql("CREATE TABLE graftma.m.uni (s STRING)")
    val root = s"$warehouse/m/uni"
    Versioned.commit(spark, root,
      Seq("héllo", "wörld").toDF("s").coalesce(1), statsCols = Seq("s"))
    assertFallback("SELECT max(s) AS m FROM graftma.m.uni")
    assert(sql("SELECT max(s) AS m FROM graftma.m.uni")
      .as[String].head() === "wörld")
    assertPushed("SELECT count(s) AS n FROM graftma.m.uni")
  }

  test("exact partition filters are CONSUMED: a WHERE on the " +
      "partition column still answers metadata-only, over exactly " +
      "the matching files") {
    baseReady
    val pushed = sql("SELECT count(*) AS n, count(s) AS ns, " +
      "min(id) AS mn, max(id) AS mx FROM graftma.m.t WHERE day = 'd1'")
    assert(isMetaOnly(pushed), pushed.queryExecution.executedPlan.toString)
    val r = pushed.head()
    val want = (0 until 500).filter(i => s"d${i % 3}" == "d1")
    assert(r.getLong(0) === want.size.toLong)
    assert(r.getLong(1) === want.count(_ % 7 != 0).toLong)
    assert((r.getLong(2), r.getLong(3)) ===
      ((want.min.toLong, want.max.toLong)))
    // IN-lists consume too, grouped answers narrow to matching tuples
    val grouped = sql("SELECT day, count(*) AS n FROM graftma.m.t " +
      "WHERE day IN ('d0', 'd2') GROUP BY day")
    assert(isMetaOnly(grouped))
    assert(grouped.collect().map(x => (x.getString(0), x.getLong(1)))
      .sorted.toSeq ===
      Seq("d0", "d2").map(dy =>
        (dy, (0 until 500).count(i => s"d${i % 3}" == dy).toLong)))
    // a filter on a NON-partition column refuses (stays residual);
    // answers stay exact through the scan
    assertFallback(
      "SELECT count(*) AS n FROM graftma.m.t WHERE id < 100")
    // mixed: partition filter consumed + data filter residual →
    // no aggregate pushdown, but the consumed predicate must still
    // hold on the scan output (file-exact pruning, never re-applied)
    val mixed = sql("SELECT count(*) AS n FROM graftma.m.t " +
      "WHERE day = 'd1' AND id < 100")
    assert(!isMetaOnly(mixed))
    assert(mixed.head().getLong(0) ===
      (0 until 100).count(i => s"d${i % 3}" == "d1").toLong)
    // plain row reads under a consumed filter: exact rows, no leakage
    assert(sql("SELECT id FROM graftma.m.t WHERE day = 'd1'")
      .collect().map(_.getLong(0)).sorted.toSeq ===
      want.map(_.toLong).sorted.toSeq)
  }

  test("consumed filters decode exactly across partition types: DATE " +
      "(epoch-day footers) and INT partitions, point and IN lookups") {
    sql("CREATE TABLE graftma.m.typed (id BIGINT, d DATE, nk INT) " +
      "PARTITIONED BY (d, nk)")
    val root = s"$warehouse/m/typed"
    Versioned.commit(spark, root,
      (0 until 120).map { i =>
        (i.toLong, java.sql.Date.valueOf(s"2024-02-0${i % 4 + 1}"),
          (i / 4) % 2)
      }.toDF("id", "d", "nk"),
      partitionBy = Seq("d", "nk"), statsCols = Seq("id"))
    val q = "SELECT count(*) AS n, min(id) AS mn FROM graftma.m.typed " +
      "WHERE d = DATE'2024-02-03' AND nk = 1"
    assertPushed(q)
    val want = (0 until 120).filter(i => i % 4 + 1 == 3 && (i / 4) % 2 == 1)
    val r = sql(q).head()
    assert((r.getLong(0), r.getLong(1)) ===
      ((want.size.toLong, want.min.toLong)))
    val qIn = "SELECT count(*) AS n FROM graftma.m.typed " +
      "WHERE d IN (DATE'2024-02-01', DATE'2024-02-04') AND nk IN (0)"
    assertPushed(qIn)
    assert(sql(qIn).as[Long].head() ===
      (0 until 120).count(i =>
        Seq(1, 4).contains(i % 4 + 1) && (i / 4) % 2 == 0).toLong)
    // row reads under typed consumed filters: exact rows, no leakage
    assert(sql("SELECT id FROM graftma.m.typed " +
      "WHERE d = DATE'2024-02-03' AND nk = 1").collect()
      .map(_.getLong(0)).sorted.toSeq === want.map(_.toLong).sorted.toSeq)
  }

  test("consumption refuses on an unpartitioned table and on " +
      "non-exact literal kinds — those filters stay residual") {
    sql("CREATE TABLE graftma.m.unpart (a BIGINT, b STRING)")
    sql("INSERT INTO graftma.m.unpart VALUES (1, 'x'), (2, NULL)")
    assertFallback(
      "SELECT count(*) AS n FROM graftma.m.unpart WHERE a = 1")
    assert(sql("SELECT count(*) AS n FROM graftma.m.unpart WHERE a = 1")
      .as[Long].head() === 1L)
  }

  test("time travel pins the answered manifest: VERSION AS OF counts " +
      "the historical snapshot") {
    sql("CREATE TABLE graftma.m.tt (id BIGINT)")
    sql("INSERT INTO graftma.m.tt VALUES (1), (2)")
    sql("INSERT INTO graftma.m.tt VALUES (3)")
    val v = Versioned.latestVersion(s"$warehouse/m/tt").get
    val old = sql(s"SELECT count(*) AS n FROM graftma.m.tt " +
      s"VERSION AS OF ${v - 1}")
    assert(isMetaOnly(old) && old.as[Long].head() === 2L)
    assertPushed("SELECT count(*) AS n FROM graftma.m.tt")
    assert(sql("SELECT count(*) AS n FROM graftma.m.tt")
      .as[Long].head() === 3L)
  }
}
