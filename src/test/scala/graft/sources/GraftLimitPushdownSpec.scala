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

  test("pending deletion vectors disable the cap (per-file counts " +
      "over-count) and the limit still answers exactly") {
    sql("CREATE TABLE graftlim.l.dv (id BIGINT)")
    val root = s"$warehouse/l/dv"
    (0 until 3).foreach { k =>
      Versioned.commit(spark, root,
        (k * 10 until (k + 1) * 10).map(_.toLong).toDF("id").coalesce(1))
    }
    // kill most of the first file: a capped scan trusting raw counts
    // would plan 2 files and come up short of LIMIT 15. The pending-DV
    // snapshot stays on the NATIVE DV-aware scan (columnar live-row
    // mapping), whose dvActive guard skips the cap — all 3 files plan.
    Versioned.deleteRows(spark, root, col("id") < 9)
    val version = Versioned.latestVersion(root).get
    val schema = Versioned.tableSchema(spark, root, Some(version))
    val b = new GraftScanBuilder(spark, root, version, schema)
    assert(b.pushLimit(15))
    val plain = b.build().asInstanceOf[GraftRowLevelScan]
    assert(plain.planInputPartitions().flatMap(
      _.asInstanceOf[GraftScanPartition].chunks.map(_.relPath))
      .distinct.length === 3,
      "pending DVs must disable the LIMIT file cap (inexact counts)")
    val bm = new GraftScanBuilder(spark, root, version,
      schema, org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
    assert(bm.pushLimit(15))
    bm.pruneColumns(org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField("_file",
        org.apache.spark.sql.types.StringType, nullable = false)))
    val native = bm.build().asInstanceOf[GraftRowLevelScan]
    assert(native.planInputPartitions().flatMap(
      _.asInstanceOf[GraftScanPartition].chunks.map(_.relPath))
      .distinct.length === 3)
    assert(sql("SELECT id FROM graftlim.l.dv LIMIT 15").count() === 15L)
  }
}
