package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.{Versioned, VersionedSql}

/** ANALYZE → cost-based optimization: one aggregate pass stores
  * NDV/nulls/min/max/lengths in the manifest (metadata-only commit);
  * the DSv2 scan reports them via `Statistics.columnStats`, and
  * Catalyst's CBO estimates selectivity and join orders from
  * commit-time truth. */
class GraftAnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-an-wh").toString
    spark.conf.set("spark.sql.catalog.graftan",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftan.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftan.ns")
    w
  }

  private def sql(s: String) = { warehouse; spark.sql(s) }

  private def withCbo[A](f: => A): A = {
    // `optimizedPlan.stats` picks its visitor from the THREAD's active
    // conf (SQLConf.get) — a previously-run suite may have left a
    // different session active on this thread, so pin ours first
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      keys.foreach(spark.conf.set(_, "true")); f
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE stores manifest column stats; the scan reports them " +
      "and CBO filter selectivity uses the NDV") {
    sql("CREATE TABLE graftan.ns.t (k BIGINT, v STRING)")
    val root = s"$warehouse/ns/t"
    // 1000 rows, k has exactly 100 distinct values, 10 rows each
    spark.range(1000).selectExpr("id % 100 AS k", "repeat('x', 8) AS v")
      .createOrReplaceTempView("an_src")
    sql("INSERT INTO graftan.ns.t SELECT * FROM an_src")
    val vBefore = Versioned.versions(root).last
    VersionedSql(spark,
      "ANALYZE TABLE graftan.ns.t COMPUTE STATISTICS FOR ALL COLUMNS")
    // metadata-only: the analyze commit carries the same files
    assert(Versioned.files(root, vBefore).toSet ===
      Versioned.files(root, Versioned.versions(root).last).toSet)
    val st = Versioned.colStatsOf(root, Versioned.versions(root).last)
    assert(st("k").rows === 1000L && st("k").nulls === 0L)
    assert(math.abs(st("k").ndv - 100L) <= 5,
      s"HLL NDV should be ~100, got ${st("k").ndv}")
    assert(st("k").min === Some("0") && st("k").max === Some("99"))
    assert(st("v").avgLen === Some(8L) && st("v").maxLen === Some(8L))
    withCbo {
      // attributeStats reach the plan
      val df = sql("SELECT k FROM graftan.ns.t WHERE k = 5")
      val rel = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r
      }.getOrElse(fail("expected a V2 scan relation"))
      val attr = rel.stats.attributeStats.toSeq
        .find(_._1.name.equalsIgnoreCase("k"))
        .getOrElse(fail("k must carry column stats in the plan"))._2
      assert(attr.distinctCount.exists(n =>
        math.abs(n.toLong - 100L) <= 5))
      // selectivity: ~1000/ndv rows estimated for the point filter
      val est = df.queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("CBO must estimate a row count")).toLong
      assert(est >= 5 && est <= 20,
        s"point-filter estimate should be ~10 rows from NDV, got $est")
    }
  }

  test("stats survive appends (stale-but-useful), drop on overwrite, " +
      "follow rename, trim on drop column") {
    sql("CREATE TABLE graftan.ns.evo (a BIGINT, b BIGINT)")
    val root = s"$warehouse/ns/evo"
    sql("INSERT INTO graftan.ns.evo SELECT id, id FROM range(100)")
    Versioned.analyze(spark, root)
    sql("INSERT INTO graftan.ns.evo SELECT id, id FROM range(5)")
    assert(Versioned.colStatsOf(root,
      Versioned.versions(root).last).contains("a"), "appends carry stats")
    sql("ALTER TABLE graftan.ns.evo RENAME COLUMN a TO a2")
    val renamed = Versioned.colStatsOf(root, Versioned.versions(root).last)
    assert(renamed.contains("a2") && !renamed.contains("a"))
    sql("ALTER TABLE graftan.ns.evo DROP COLUMN b")
    val trimmed = Versioned.colStatsOf(root, Versioned.versions(root).last)
    assert(trimmed.contains("a2") && !trimmed.contains("b"))
    sql("INSERT OVERWRITE graftan.ns.evo SELECT id AS a2 FROM range(3)")
    assert(Versioned.colStatsOf(root,
      Versioned.versions(root).last).isEmpty,
      "an overwrite replaces the data the stats describe — they drop")
  }

  test("staleness discipline: a table whose live rows doubled since " +
      "ANALYZE stops feeding CBO the stale column stats; re-ANALYZE " +
      "re-arms; moderate drift keeps serving") {
    sql("CREATE TABLE graftan.ns.stale (k BIGINT)")
    val root = s"$warehouse/ns/stale"
    sql("INSERT INTO graftan.ns.stale SELECT id % 50 FROM range(1000)")
    Versioned.analyze(spark, root)
    def attrStats(): Option[
        org.apache.spark.sql.catalyst.plans.logical.ColumnStat] = {
      val df = sql("SELECT k FROM graftan.ns.stale WHERE k = 5")
      val rel = df.queryExecution.optimizedPlan.collectFirst {
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2ScanRelation => r
      }.getOrElse(fail("expected a V2 scan relation"))
      rel.stats.attributeStats.toSeq
        .find(_._1.name.equalsIgnoreCase("k")).map(_._2)
    }
    withCbo {
      assert(attrStats().isDefined, "fresh stats must serve")
      // +20% drift: within the 2x default factor — still serving
      sql("INSERT INTO graftan.ns.stale SELECT id % 50 FROM range(200)")
      assert(attrStats().isDefined,
        "moderate drift must keep the stale-but-useful stats")
      // rows more than double the analyzed count: the stale NDV/bounds
      // must NOT feed CBO (the exact live numRows still reports)
      sql("INSERT INTO graftan.ns.stale SELECT id % 999 FROM range(1300)")
      assert(attrStats().isEmpty,
        "a 2.5x-drifted table must not estimate from stale column stats")
      // the exact row count still reaches the plan (it never goes
      // stale — it's manifest arithmetic, not an ANALYZE artifact)
      val rel = sql("SELECT k FROM graftan.ns.stale").queryExecution
        .optimizedPlan.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2ScanRelation => r
        }.get
      assert(rel.stats.rowCount.exists(_.toLong === 2500L))
      // re-ANALYZE re-arms the column stats at the new cardinality
      Versioned.analyze(spark, root)
      val rearmed = attrStats().getOrElse(
        fail("re-ANALYZE must re-arm the column stats"))
      assert(rearmed.distinctCount.exists(n =>
        n.toLong > 500L && n.toLong < 1200L),
        s"re-armed NDV must reflect the new data, got " +
          s"${rearmed.distinctCount}")
      // shrink drift: a MoR delete below 1/2 of analyzed rows also
      // stands the stats down (exact DV cardinality feeds the check)
      Versioned.deleteRows(spark, root,
        org.apache.spark.sql.functions.col("k") >= 5L)
      assert(attrStats().isEmpty,
        "a table shrunk past the factor must not serve stale stats")
    }
  }

  test("CBO join reorder: the selective dimension joins first") {
    sql("CREATE TABLE graftan.ns.fact (k BIGINT, d BIGINT)")
    sql("CREATE TABLE graftan.ns.dims (d BIGINT, tag STRING)")
    val rootF = s"$warehouse/ns/fact"
    val rootD = s"$warehouse/ns/dims"
    spark.range(20000).selectExpr("id % 500 AS k", "id % 40 AS d")
      .createOrReplaceTempView("an_fact")
    sql("INSERT INTO graftan.ns.fact SELECT * FROM an_fact")
    spark.range(40).selectExpr("id AS d", "concat('t', id) AS tag")
      .createOrReplaceTempView("an_dims")
    sql("INSERT INTO graftan.ns.dims SELECT * FROM an_dims")
    Versioned.analyze(spark, rootF)
    Versioned.analyze(spark, rootD)
    withCbo {
      // a highly selective dim filter: CBO should see ~1 row out of
      // the dim via NDV and keep the plan tiny — and the answer exact
      val df = sql("""SELECT count(*) FROM graftan.ns.fact f
        |JOIN graftan.ns.dims dd ON f.d = dd.d WHERE dd.tag = 't7'
        |""".stripMargin)
      assert(df.as[Long].head() === 500L)
      val joined = df.queryExecution.optimizedPlan.stats
      assert(joined.sizeInBytes > 0)
    }
  }

  test("histograms: skewed-range selectivity beats the uniformity " +
      "assumption") {
    sql("CREATE TABLE graftan.ns.hist (k BIGINT)")
    val root = s"$warehouse/ns/hist"
    // 90% of the mass in [0, 10), a thin tail to 999: under the
    // uniformity assumption `k < 10` estimates ~1% of rows; the
    // histogram sees ~90%
    spark.range(10000)
      .selectExpr("CASE WHEN id % 10 < 9 THEN id % 10 " +
        "ELSE 10 + (id % 990) END AS k")
      .createOrReplaceTempView("an_hist")
    sql("INSERT INTO graftan.ns.hist SELECT * FROM an_hist")
    spark.conf.set("spark.graft.analyze.histogramBins", "10")
    try Versioned.analyze(spark, root)
    finally spark.conf.unset("spark.graft.analyze.histogramBins")
    val st = Versioned.colStatsOf(root, Versioned.versions(root).last)
    val h = st("k").hist.getOrElse(fail("histogram must be stored"))
    assert(h.bins.size === 10 && h.height === 1000.0)
    withCbo {
      val df = sql("SELECT k FROM graftan.ns.hist WHERE k < 10")
      val est = df.queryExecution.optimizedPlan.stats.rowCount
        .getOrElse(fail("CBO must estimate")).toLong
      val actual = df.count()
      assert(actual === 9000L)
      assert(est > 5000L,
        s"the histogram must see the skew (~9000 rows), got $est — " +
          "the uniformity estimate would be ~100")
    }
  }

  private def attrStatsOf(table: String): Option[
      org.apache.spark.sql.catalyst.plans.logical.ColumnStat] = {
    val df = sql(s"SELECT k FROM $table WHERE k = 5")
    val rel = df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r
    }.getOrElse(fail("expected a V2 scan relation"))
    rel.stats.attributeStats.toSeq
      .find(_._1.name.equalsIgnoreCase("k")).map(_._2)
  }

  test("OPTIMIZE … REANALYZE re-arms stale column stats in the same " +
      "maintenance tick; no-op packs and never-analyzed tables skip " +
      "the stats pass") {
    sql("CREATE TABLE graftan.ns.ra (k BIGINT)")
    val root = s"$warehouse/ns/ra"
    sql("INSERT INTO graftan.ns.ra SELECT id % 50 FROM range(1000)")
    Versioned.analyze(spark, root)
    // drift past the 2x staleness factor with small appends — which
    // also bank exactly the small-file debt OPTIMIZE packs
    (1 to 3).foreach(_ =>
      sql("INSERT INTO graftan.ns.ra SELECT id % 999 FROM range(500)"))
    withCbo {
      assert(attrStatsOf("graftan.ns.ra").isEmpty,
        "2.5x drift must stand the stale stats down")
      VersionedSql(spark, s"OPTIMIZE `$root` REANALYZE")
      val last = Versioned.versions(root).last
      val st = Versioned.colStatsOf(root, last)
      assert(st("k").rows === 2500L,
        "re-armed stats must reflect the post-maintenance live count")
      assert(attrStatsOf("graftan.ns.ra").isDefined,
        "OPTIMIZE … REANALYZE must leave columnStats fresh")
      // everything is packed and analyzed now: a second reanalyzing
      // OPTIMIZE is a no-op — no compact AND no stats commit
      assert(Versioned.optimize(spark, root, reanalyze = true) === last)
      assert(Versioned.versions(root).last === last)
    }
    // never-analyzed table: REANALYZE has nothing to re-arm — the
    // pack publishes, the stats pass is skipped
    sql("CREATE TABLE graftan.ns.ra2 (k BIGINT)")
    val root2 = s"$warehouse/ns/ra2"
    (1 to 2).foreach(_ =>
      sql("INSERT INTO graftan.ns.ra2 SELECT id FROM range(100)"))
    val v = Versioned.optimize(spark, root2, reanalyze = true)
    assert(Versioned.versions(root2).last === v,
      "the pack must be the head commit (no analyze followed)")
    assert(Versioned.colStatsOf(root2, v).isEmpty)
  }

  test("REORG … APPLY (PURGE) REANALYZE re-arms stats over the " +
      "purged live rows") {
    sql("CREATE TABLE graftan.ns.rg (k BIGINT)")
    val root = s"$warehouse/ns/rg"
    sql("INSERT INTO graftan.ns.rg SELECT id FROM range(1000)")
    Versioned.analyze(spark, root)
    // MoR-delete 60%: live shrinks 2.5x past the staleness factor
    Versioned.deleteRows(spark, root,
      org.apache.spark.sql.functions.col("k") >= 400L)
    withCbo {
      assert(attrStatsOf("graftan.ns.rg").isEmpty,
        "the shrunk table must not serve stale stats")
      VersionedSql(spark, s"REORG `$root` APPLY (PURGE) REANALYZE")
      val st = Versioned.colStatsOf(root, Versioned.versions(root).last)
      assert(st("k").rows === 400L,
        "re-armed stats must reflect the purged live count")
      assert(st("k").max === Some("399"))
      assert(attrStatsOf("graftan.ns.rg").isDefined)
    }
  }

  test("ANALYZE FOR COLUMNS subset merges over prior stats; unknown " +
      "column refuses") {
    sql("CREATE TABLE graftan.ns.sub (x BIGINT, y BIGINT)")
    val root = s"$warehouse/ns/sub"
    sql("INSERT INTO graftan.ns.sub SELECT id, id * 2 FROM range(50)")
    VersionedSql(spark,
      "ANALYZE TABLE graftan.ns.sub COMPUTE STATISTICS FOR COLUMNS x")
    val s1 = Versioned.colStatsOf(root, Versioned.versions(root).last)
    assert(s1.contains("x") && !s1.contains("y"))
    VersionedSql(spark,
      "ANALYZE TABLE graftan.ns.sub COMPUTE STATISTICS FOR COLUMNS y")
    val s2 = Versioned.colStatsOf(root, Versioned.versions(root).last)
    assert(s2.contains("x") && s2.contains("y"), "subset analyze merges")
    val e = intercept[Exception] {
      VersionedSql(spark,
        "ANALYZE TABLE graftan.ns.sub COMPUTE STATISTICS FOR COLUMNS nope")
    }
    assert(e.getMessage.contains("nope"))
  }
}
