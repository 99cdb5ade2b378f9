package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Versioned

/** LIMIT file cap (`SupportsPushDownLimit`, partial pushdown): the
  * scan plans just enough files to cover the limit from exact manifest
  * row counts — Spark's own Limit stays above, so the cap only ever
  * has to yield at least `limit` rows. */
class GraftLimitPushdownSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("graft-limit-wh").toString
    spark.conf.set("spark.sql.catalog.graftlim",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftlim.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftlim.l")
    w
  }

  private def sql(s: String): DataFrame = { warehouse; spark.sql(s) }

  /** Distinct data files the built scan plans. */
  private def plannedFiles(root: String, limit: Option[Int],
      pushedLimitViaBuilder: Boolean = true): Int = {
    val version = Versioned.latestVersion(root).get
    val schema = Versioned.tableSchema(spark, root, Some(version))
    val b = new GraftScanBuilder(spark, root, version, schema)
    limit.foreach(n => assert(b.pushLimit(n) && b.isPartiallyPushed()))
    val scan = b.build().asInstanceOf[GraftRowLevelScan]
    scan.planInputPartitions().flatMap(
      _.asInstanceOf[GraftScanPartition].chunks.map(_.relPath))
      .distinct.length
  }

  test("the scan plans only enough files to cover the limit; results " +
      "stay exact through Spark's own Limit above") {
    sql("CREATE TABLE graftlim.l.t (id BIGINT, v DOUBLE)")
    val root = s"$warehouse/l/t"
    (0 until 4).foreach { k =>
      Versioned.commit(spark, root,
        (k * 100 until (k + 1) * 100).map(i => (i.toLong, i * 1.0))
          .toDF("id", "v").coalesce(1))
    }
    assert(plannedFiles(root, None) === 4)
    assert(plannedFiles(root, Some(150)) === 2)
    assert(plannedFiles(root, Some(1)) === 1)
    assert(plannedFiles(root, Some(5000)) === 4) // past the table: all
    // end-to-end: the limit yields exactly n rows, all real table rows
    val got = sql("SELECT id FROM graftlim.l.t LIMIT 150")
      .collect().map(_.getLong(0))
    assert(got.length === 150)
    assert(got.forall(id => id >= 0 && id < 400))
    assert(got.distinct.length === 150)
  }

  test("pending deletion vectors keep the cap ARMED: live rows = " +
      "rows − recorded DV cardinality, so MoR plans LIMIT like CoW") {
    sql("CREATE TABLE graftlim.l.dv (id BIGINT)")
    val root = s"$warehouse/l/dv"
    (0 until 3).foreach { k =>
      Versioned.commit(spark, root,
        (k * 10 until (k + 1) * 10).map(_.toLong).toDF("id").coalesce(1))
    }
    // kill most of the first file: raw counts say 10 rows there, the
    // manifest's recorded DV cardinality says 1 live. A cap trusting
    // raw counts would plan ONE file for LIMIT 10 and come up short;
    // the live-count cap plans two (1 + 10 ≥ 10) and stops there.
    Versioned.deleteRows(spark, root, col("id") < 9)
    val version = Versioned.latestVersion(root).get
    assert(Versioned.dvDeletedCountsExact(root, version)
      .exists(_.values.sum === 9L),
      "inline DV cardinality must be exact manifest arithmetic")
    val schema = Versioned.tableSchema(spark, root, Some(version))
    val b = new GraftScanBuilder(spark, root, version, schema)
    assert(b.pushLimit(10))
    val capped = b.build().asInstanceOf[GraftRowLevelScan]
    assert(capped.planInputPartitions().flatMap(
      _.asInstanceOf[GraftScanPartition].chunks.map(_.relPath))
      .distinct.length === 2,
      "recorded DV cardinalities must keep the LIMIT file cap armed")
    // end-to-end exactness through Spark's Limit above
    assert(sql("SELECT id FROM graftlim.l.dv LIMIT 10").count() === 10L)
    assert(sql("SELECT id FROM graftlim.l.dv LIMIT 15").count() === 15L)
  }

  test("sidecar-spilled deletes record exact cardinalities too — the " +
      "cap plans by live counts with zero sidecar reads") {
    sql("CREATE TABLE graftlim.l.sc (id BIGINT)")
    val root = s"$warehouse/l/sc"
    (0 until 3).foreach { k =>
      Versioned.commit(spark, root,
        (k * 100 until (k + 1) * 100).map(_.toLong).toDF("id").coalesce(1))
    }
    // threshold 0 forces the wide path: executors write position
    // sidecars, the manifest records per-file counts alongside
    Versioned.deleteRows(spark, root, col("id") < 90,
      inlineThreshold = 0)
    val version = Versioned.latestVersion(root).get
    val exact = Versioned.dvDeletedCountsExact(root, version)
    assert(exact.exists(_.values.sum === 90L),
      s"sidecar cardinality must ride the manifest, got $exact")
    // file lives: 10, 100, 100 — LIMIT 100 needs two files (10+100)
    val schema = Versioned.tableSchema(spark, root, Some(version))
    val b = new GraftScanBuilder(spark, root, version, schema)
    assert(b.pushLimit(100))
    val capped = b.build().asInstanceOf[GraftRowLevelScan]
    assert(capped.planInputPartitions().flatMap(
      _.asInstanceOf[GraftScanPartition].chunks.map(_.relPath))
      .distinct.length === 2,
      "sidecar-spilled DV cardinalities must keep the cap armed")
    val got = sql("SELECT id FROM graftlim.l.sc LIMIT 100")
      .collect().map(_.getLong(0))
    assert(got.length === 100)
    assert(got.forall(_ >= 90L), "a deleted row resurfaced under LIMIT")
    assert(got.distinct.length === 100)
  }

  test("a second delete MERGES cardinalities (inline over sidecar), " +
      "and a legacy entry without counts stands the cap down") {
    sql("CREATE TABLE graftlim.l.m (id BIGINT)")
    val root = s"$warehouse/l/m"
    (0 until 2).foreach { k =>
      Versioned.commit(spark, root,
        (k * 50 until (k + 1) * 50).map(_.toLong).toDF("id").coalesce(1))
    }
    Versioned.deleteRows(spark, root, col("id") < 30,
      inlineThreshold = 0) // sidecar: 30 positions in file 1
    Versioned.deleteRows(spark, root, col("id") >= 30 && col("id") < 40)
    val version = Versioned.latestVersion(root).get
    assert(Versioned.dvDeletedCountsExact(root, version)
      .exists(_.values.sum === 40L),
      "merged inline+sidecar cardinality must stay exact")
    // legacy shape: an entry with sidecars but NO recorded count —
    // exact counts must refuse (None), never guess
    val legacy = Versioned.pendingDvEntries(root, version).map(d =>
      if (d.sidecars.nonEmpty) d.copy(scRows = None) else d)
    assert(legacy.exists(d => d.sidecars.nonEmpty && d.deletedExact.isEmpty),
      "an uncounted sidecar entry must report unknown, not a guess")
  }
}
